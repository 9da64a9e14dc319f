"""BASI heads: saliency branch, unified mask features, instance mechanism.

SURVEY.md §2.8 flags the reference's instance mechanism as the largest open
question (the reference mount was empty; candidates were (a) saliency +
embedding, (b) proposals + ROI head, (c) connected components). We therefore
design the TPU-native mechanism from first principles and keep it behind this
module's narrow interface so it can be swapped when the reference becomes
readable:

  * A **dynamic-kernel cell grid** (SOLO-flavoured): a fixed S x S grid of
    cells; each cell predicts an objectness score and an E-dim dynamic 1x1
    conv kernel over a unified mask-feature map. Candidate masks for ALL
    cells are one einsum on the MXU — fully static shapes, no ROI gather, no
    dynamic control flow. This subsumes candidate (a) (it *is* an embedding
    clustering with learned cluster queries at fixed grid positions) and has
    strictly better TPU characteristics than (b)/(c).

  * A **boundary-aware saliency branch** (BASNet-flavoured, per the "BASI"
    name): deeply-supervised per-level saliency logits plus a fused final
    map; its union-saliency signal trains jointly with the instance branch.

All shapes are static; instance capacity is the fixed-slot contract
(SURVEY §7 hard part #2).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from basi_tpu.ops.resize import resize_bilinear

# Detection-style head init: final prediction convs start near zero so
# initial logits are ~0 (BCE ~0.69) instead of exploding (random 32-dim
# embedding dot-products reach |logit|~10 and diverge under SGD+momentum);
# the objectness conv bias starts at the focal prior -log((1-pi)/pi),
# pi=0.01, so the score branch begins predicting "background everywhere".
_pred_kernel_init = nn.initializers.normal(stddev=0.01)
_focal_prior_bias = nn.initializers.constant(-4.595)  # pi = 0.01


def coord_features(n: int, h: int, w: int, dtype: Any) -> jnp.ndarray:
    """Normalized (-1..1) x/y coordinate maps, (N, H, W, 2) — CoordConv."""
    ys = jnp.linspace(-1.0, 1.0, h, dtype=jnp.float32)
    xs = jnp.linspace(-1.0, 1.0, w, dtype=jnp.float32)
    yy = jnp.broadcast_to(ys[:, None], (h, w))
    xx = jnp.broadcast_to(xs[None, :], (h, w))
    grid = jnp.stack([xx, yy], axis=-1)[None]
    return jnp.broadcast_to(grid, (n, h, w, 2)).astype(dtype)


class SaliencyHead(nn.Module):
    """Deeply-supervised saliency branch over FPN levels.

    Per level: 3x3 conv -> 1-channel logits (supervised at that level's
    resolution, all reported at /4). Final: concat upsampled per-level
    features -> 3x3 conv -> fused logits at /4.
    """

    channels: int = 64
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pyramid: Sequence[jnp.ndarray],
                 with_aux: bool = True) -> tuple[jnp.ndarray, list[jnp.ndarray]]:
        """``with_aux=False`` skips the per-level deep-supervision outputs —
        they only feed the training loss, so inference saves 4 convs + 4
        resizes. Params are created regardless (init with the default) so
        both modes share one checkpoint structure."""
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        base_hw = pyramid[0].shape[1:3]  # /4 resolution
        level_logits = []
        fused_feats = []
        for i, p in enumerate(pyramid):
            f = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                        name=f"tower{i}", **kw)(p)
            f = nn.relu(f)
            # 1x1 prediction convs (HED/DSS-style side outputs): spatial
            # mixing already happened in the 3x3 towers, and a 1-channel
            # 3x3 output conv is MXU-pathological — its runtime scales with
            # the K=9*C contraction regardless of the single output lane
            # (measured 1.5 TFLOP/s, ~0.4 ms/batch-8 on v5e for the fuse).
            out_conv = nn.Conv(1, (1, 1), kernel_init=_pred_kernel_init,
                               name=f"out{i}", **kw)
            if with_aux:
                level_logits.append(resize_bilinear(out_conv(f), base_hw))
            else:
                # call on a 1x1 slice so the params exist (flax creates
                # params only on call) at negligible compute
                _ = out_conv(f[:, :1, :1, :])
            fused_feats.append(resize_bilinear(f, base_hw))
        fused = jnp.concatenate(fused_feats, axis=-1)
        fused_logits = nn.Conv(1, (1, 1), kernel_init=_pred_kernel_init,
                               name="fuse", **kw)(fused)
        return fused_logits, level_logits


class MaskFeatureHead(nn.Module):
    """Unified mask-feature map at /4 with E channels.

    Each pyramid level: 3x3 conv + GroupNorm + ReLU, bilinear-resized to /4,
    summed; CoordConv features are appended at the coarsest level so masks
    can be position-sensitive. Final 1x1 conv -> E channels.
    """

    channels: int = 128
    embed_dim: int = 64
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pyramid: Sequence[jnp.ndarray]) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        base_hw = pyramid[0].shape[1:3]
        acc = None
        for i, p in enumerate(pyramid):
            if i == len(pyramid) - 1:
                n, h, w, _ = p.shape
                p = jnp.concatenate([p, coord_features(n, h, w, p.dtype)], axis=-1)
            f = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                        name=f"level{i}", **kw)(p)
            f = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                             param_dtype=self.param_dtype, name=f"gn{i}")(f)
            f = nn.relu(f)
            f = resize_bilinear(f, base_hw)
            acc = f if acc is None else acc + f
        out = nn.Conv(self.embed_dim, (1, 1), name="embed", **kw)(acc)
        return out  # (N, H/4, W/4, E)


class InstanceKernelHead(nn.Module):
    """Cell-grid instance mechanism: per-cell score + dynamic mask kernel.

    Input: a mid-level pyramid feature (P3) with CoordConv, resized to the
    S x S cell grid; a small conv tower; two 3x3 conv outputs:
      * score logits  (N, S, S, 1)
      * kernels       (N, S, S, E)
    Candidate masks are produced by the caller as a single einsum between
    kernels and the unified mask features.
    """

    grid_size: int = 16
    embed_dim: int = 64
    channels: int = 128
    tower_depth: int = 3
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        n, h, w, _ = feat.shape
        x = jnp.concatenate([feat, coord_features(n, h, w, feat.dtype)], axis=-1)
        x = resize_bilinear(x, (self.grid_size, self.grid_size))
        for i in range(self.tower_depth):
            x = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                        name=f"tower{i}", **kw)(x)
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                             param_dtype=self.param_dtype, name=f"gn{i}")(x)
            x = nn.relu(x)
        scores = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                         kernel_init=_pred_kernel_init,
                         bias_init=_focal_prior_bias, name="score", **kw)(x)
        kernels = nn.Conv(self.embed_dim, (3, 3), padding=[(1, 1), (1, 1)],
                          kernel_init=_pred_kernel_init,
                          name="kernel", **kw)(x)
        return scores, kernels


class RoiBoxHead(nn.Module):
    """Cell-grid proposal head for the ROI instance mechanism (§2.8 (b)).

    Same fixed S x S cell grid and conv tower as InstanceKernelHead, but
    each cell predicts an objectness score and an UNCONSTRAINED (l, t, r, b)
    box-distance tensor instead of a dynamic mask kernel (FCOS-style,
    anchor-free; decode via ops.roi.decode_cell_boxes). Static shapes: the
    grid IS the proposal set, top-k replaces dynamic proposal counts.
    """

    grid_size: int = 16
    channels: int = 128
    tower_depth: int = 3
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        n, h, w, _ = feat.shape
        x = jnp.concatenate([feat, coord_features(n, h, w, feat.dtype)], axis=-1)
        x = resize_bilinear(x, (self.grid_size, self.grid_size))
        for i in range(self.tower_depth):
            x = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                        name=f"tower{i}", **kw)(x)
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                             param_dtype=self.param_dtype, name=f"gn{i}")(x)
            x = nn.relu(x)
        scores = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                         kernel_init=_pred_kernel_init,
                         bias_init=_focal_prior_bias, name="score", **kw)(x)
        # near-zero init -> softplus decode starts every cell at a small
        # centered box (a stable anchor-free init; exp-decode explodes).
        boxes = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                        kernel_init=_pred_kernel_init, name="box", **kw)(x)
        return scores, boxes


class RoiMaskHead(nn.Module):
    """Per-ROI mask FCN over cropped unified mask features (§2.8 (b)).

    Boxes crop the (N, H/4, W/4, E) mask features to R x R via the
    separable-matmul roi_align (ops/roi.py — the torchvision-roi_align
    native-op equivalent, SURVEY §2.16), then a small conv tower + 1x1
    predicts one mask logit map per ROI in the ROI frame. K is static.
    """

    resolution: int = 28
    channels: int = 64
    tower_depth: int = 2
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mask_feats: jnp.ndarray,
                 boxes: jnp.ndarray) -> jnp.ndarray:
        """mask_feats: (N, H, W, E); boxes: (N, K, 4) normalized
        (y0, x0, y1, x1). Returns (N, K, R, R) mask logits."""
        from basi_tpu.ops.roi import roi_align

        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        n, k, _ = boxes.shape
        r = self.resolution
        # Boxes are selection/GT coordinates, not a gradient path: the mask
        # loss should shape the features and the tower, box geometry is
        # supervised by its own IoU loss.
        crops = jax.vmap(lambda f, b: roi_align(f, b, r))(
            mask_feats, jax.lax.stop_gradient(boxes))
        x = crops.reshape(n * k, r, r, crops.shape[-1])
        for i in range(self.tower_depth):
            x = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                        name=f"tower{i}", **kw)(x)
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                             param_dtype=self.param_dtype, name=f"gn{i}")(x)
            x = nn.relu(x)
        out = nn.Conv(1, (1, 1), kernel_init=_pred_kernel_init,
                      name="out", **kw)(x)
        return out.reshape(n, k, r, r)


class RefineHead(nn.Module):
    """BASNet-style residual refinement module (RRM) for the saliency map.

    The "BASI" name points at BASNet (boundary-aware saliency), whose
    signature block is a small encoder-decoder over the COARSE prediction
    that emits a residual: refined = coarse + RRM(sigmoid(coarse)). This is
    that module at the /4 map resolution: conv-in, ``depth`` strided
    encoder levels (2x2 maxpool), a bridge, and a symmetric decoder with
    concat skips and exact-semantics 2x bilinear upsamples, closed by a
    near-zero-init 1-channel residual conv (so an untrained RRM is ~the
    identity on logits). GroupNorm instead of BN keeps the module
    batch-statistics-free (it refines per-image structure). Opt-in via
    ``model.refine``.
    """

    channels: int = 64
    depth: int = 3
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, prob: jnp.ndarray) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        def block(x, name):
            x = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                        name=name, **kw)(x)
            x = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=self.dtype,
                             param_dtype=self.param_dtype, name=f"gn_{name}")(x)
            return nn.relu(x)

        x = block(prob, "in")
        skips = []
        for i in range(self.depth):
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = block(x, f"down{i}")
        x = block(x, "bridge")
        for i in reversed(range(self.depth)):
            hw = skips[i].shape[1:3]
            x = resize_bilinear(x, hw)
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = block(x, f"up{i}")
        return nn.Conv(1, (1, 1), kernel_init=_pred_kernel_init,
                       name="out", **kw)(x)


def candidate_masks(mask_feats: jnp.ndarray, kernels: jnp.ndarray) -> jnp.ndarray:
    """Apply per-cell dynamic kernels to the unified mask features.

    mask_feats: (N, H, W, E); kernels: (N, S, S, E)
    returns mask logits (N, S*S, H, W) — one MXU einsum for all cells.
    """
    n, s1, s2, e = kernels.shape
    k = kernels.reshape(n, s1 * s2, e)
    return jnp.einsum("nhwe,nke->nkhw", mask_feats, k,
                      preferred_element_type=jnp.float32).astype(mask_feats.dtype)

"""ResNet-50 backbone, NHWC, exposing the C2-C5 feature pyramid.

Re-designed TPU-first (SURVEY.md §2.6): NHWC layout so XLA tiles convs onto
the MXU without transposes; BatchNorm uses frozen running statistics during
inference and batch stats during training, matching torch semantics so the
torch->JAX weight importer (basi_tpu.convert) reproduces reference-pretrained
backbones bit-for-bit (eps 1e-5).

Strides: C2 /4, C3 /8, C4 /16, C5 /32 with channels 256/512/1024/2048.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp



# Block-count presets, torchvision numbering. All depths reuse the same
# stem/ConvBN modules, so torch imports work for every family member
# (convert.torch_import is stage-size-parameterized and block-kind aware).
STAGE_SIZES = {
    "resnet18": (2, 2, 2, 2),
    "resnet34": (3, 4, 6, 3),
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
    "resnet_tiny": (1, 1, 1, 1),  # 1-block stages, for fast tests
}

# 18/34 use the two-conv BasicBlock (C2..C5 = 64/128/256/512 channels);
# everything else the 4x-expanding Bottleneck (256/512/1024/2048).
BLOCK_KIND = {
    "resnet18": "basic",
    "resnet34": "basic",
}


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm, torch-compatible hyperparameters."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis: str | None = None  # cross-replica sync-BN axis under shard_map
    bn_impl: str = "xla"  # xla | fused (models/norm.py)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        from basi_tpu.models.norm import make_batch_norm

        x = make_batch_norm(
            self.bn_impl,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            axis_name=self.bn_axis,
            name="bn",
        )(x)
        return x


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with identity/projection shortcut."""

    features: int  # bottleneck width; output is 4x this
    stride: int = 1
    project: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis: str | None = None
    bn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  bn_axis=self.bn_axis, bn_impl=self.bn_impl)
        residual = x
        y = ConvBN(self.features, 1, 1, name="a", **kw)(x, train)
        y = nn.relu(y)
        # torch puts the stride on the 3x3 (ResNet v1.5), reproduce that.
        y = ConvBN(self.features, 3, self.stride, name="b", **kw)(y, train)
        y = nn.relu(y)
        y = ConvBN(self.features * 4, 1, 1, name="c", **kw)(y, train)
        if self.project:
            residual = ConvBN(self.features * 4, 1, self.stride, name="proj", **kw)(
                x, train
            )
        return nn.relu(y + residual)


class BasicBlock(nn.Module):
    """3x3 -> 3x3 residual block (ResNet-18/34), torchvision semantics.

    Sub-module names match Bottleneck's ("a"/"b"/"proj") so the torch
    importer/exporter share one layer-walk for both block kinds
    (torchvision conv1/bn1 -> a, conv2/bn2 -> b, downsample -> proj)."""

    features: int  # output channels (no expansion)
    stride: int = 1
    project: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis: str | None = None
    bn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  bn_axis=self.bn_axis, bn_impl=self.bn_impl)
        residual = x
        y = ConvBN(self.features, 3, self.stride, name="a", **kw)(x, train)
        y = nn.relu(y)
        y = ConvBN(self.features, 3, 1, name="b", **kw)(y, train)
        if self.project:
            residual = ConvBN(self.features, 1, self.stride, name="proj",
                              **kw)(x, train)
        return nn.relu(y + residual)


class _StemKernel(nn.Module):
    """Holds the canonical (7, 7, C, O) stem kernel under the name ConvBN
    uses ('conv'/'kernel') so StemS2D is checkpoint-compatible with the
    plain conv7 stem."""

    features: int = 64
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, in_ch: int) -> jnp.ndarray:
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (7, 7, in_ch, self.features), self.param_dtype,
        )


class StemS2D(nn.Module):
    """Space-to-depth stem: ConvBN(64, 7, 2)-equivalent, MXU-friendly.

    Accepts either a raw RGB image (C=3; space-to-depth applied here) or an
    input that was ALREADY space-to-depth'd at ingest (C=12). The ingest
    variant is the fast path: round-1 profiles showed the on-device s2d of
    the normalized bf16 tensor cost ~0.8 ms of layout copies per batch-8,
    while s2d on the raw uint8 bytes (4x fewer) before normalize is nearly
    free and the stem conv then runs dense on the MXU.
    """

    features: int = 64
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis: str | None = None
    bn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        import jax

        c = x.shape[-1]
        if c % 4 == 0:  # pre-s2d input from the ingest path
            in_ch = c // 4
        else:
            in_ch = c
            x = space_to_depth(x, 2)
        k7 = _StemKernel(self.features, self.param_dtype, name="conv")(in_ch)
        k = s2d_stem_kernel(k7).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k,
            window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        from basi_tpu.models.norm import make_batch_norm

        y = make_batch_norm(
            self.bn_impl,
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype,
            axis_name=self.bn_axis, name="bn",
        )(y)
        return y


class StemConv7Pad(nn.Module):
    """conv7 stem with the 3-channel contraction zero-padded to 8 lanes.

    Round-4 roofline: the stem's dW runs at 17 TF/s — a (7, 7, 3, 64)
    weight gradient contracts over only 3 input channels, wasting the
    MXU's contraction depth. Padding BOTH the image and the kernel with 5
    zero channels is bit-equivalent in the forward (zero channels
    contribute 0) and gives the dW contraction 8 lanes; the kernel
    gradient flows back through the jnp.pad transpose (a slice) onto the
    canonical (7, 7, 3, 64) parameter, so checkpoints and the torch
    importer are unaffected. Opt-in via model.stem_mode='conv7p8' until
    measured faster EMBEDDED on hardware (round-3 rule)."""

    features: int = 64
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis: str | None = None
    bn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        import jax

        c = x.shape[-1]
        k7 = _StemKernel(self.features, self.param_dtype, name="conv")(c)
        pad_c = (-c) % 8
        k = jnp.pad(k7, ((0, 0), (0, 0), (0, pad_c), (0, 0))).astype(
            self.dtype)
        xp = jnp.pad(x.astype(self.dtype),
                     ((0, 0), (0, 0), (0, 0), (0, pad_c)))
        y = jax.lax.conv_general_dilated(
            xp, k, window_strides=(2, 2), padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        from basi_tpu.models.norm import make_batch_norm

        y = make_batch_norm(
            self.bn_impl,
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype,
            axis_name=self.bn_axis, name="bn",
        )(y)
        return y


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/b, W/b, b*b*C), channel order (a*b + bb)*C + c."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // block, w // block, block * block * c)


def depth_to_space(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """Exact inverse of ``space_to_depth``: (N, H/b, W/b, b*b*C) -> (N, H, W, C).

    Used by TTA inference to recover the raw image from a host-packed s2d
    feed before building flipped/scaled views (the packed fast path only
    covers the identity view)."""
    n, h, w, cb = x.shape
    c = cb // (block * block)
    x = x.reshape(n, h, w, block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * block, w * block, c)


def s2d_stem_kernel(k7: jnp.ndarray) -> jnp.ndarray:
    """Rewrite a (7, 7, C, O) stride-2 stem kernel for space-to-depth input.

    The 7x7/2 conv on (H, W, C) is EXACTLY equivalent to a 4x4/1 conv on
    the 2x2 space-to-depth input (H/2, W/2, 4C) with this kernel layout
    (the MLPerf TPU ResNet trick): the 3-channel stride-2 stem is the most
    MXU-unfriendly op in the network; the rewrite quadruples the
    contraction depth and removes the strided window reads. Derivation:
    out row r taps input rows 2r + dy - 3; writing dy - 3 = 2m + a with
    a in {0,1} gives 4 kernel rows m and the s2d sub-row a. Padding the
    kernel front by one zero makes the (m, a) unrolling rectangular.
    """
    k8 = jnp.pad(k7, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (8, 8, C, O)
    _, _, c, o = k7.shape
    k = k8.reshape(4, 2, 4, 2, c, o)  # (mi, a, ni, b, C, O)
    k = k.transpose(0, 2, 1, 3, 4, 5)  # (mi, ni, a, b, C, O)
    return k.reshape(4, 4, 4 * c, o)


class ResNet50(nn.Module):
    """ResNet-50 trunk returning (C2, C3, C4, C5).

    ``stem_mode='s2d'`` runs the stem as a space-to-depth conv (bit-exact
    rewrite, see s2d_stem_kernel); the stored parameter stays the
    canonical (7, 7, 3, 64) kernel so checkpoints and the torch importer
    are unaffected.
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    block: str = "bottleneck"  # bottleneck | basic (resnet18/34)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis: str | None = None
    bn_impl: str = "xla"  # xla | fused (models/norm.py)
    stem_mode: str = "conv7"  # conv7 | s2d | conv7p8

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> tuple[jnp.ndarray, ...]:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  bn_axis=self.bn_axis, bn_impl=self.bn_impl)
        if self.stem_mode == "s2d":
            x = StemS2D(name="stem", **kw)(x, train)
        elif self.stem_mode == "conv7p8":
            x = StemConv7Pad(name="stem", **kw)(x, train)
        else:
            x = ConvBN(64, 7, 2, name="stem", **kw)(x, train)
        x = nn.relu(x)
        # Plain reduce_window pool (select-and-scatter backward, 1.05 ms
        # of the bf16 batch-16 train step on v5e). The custom-VJP
        # alternative (ops.pool.max_pool) measured +50 ms/step EMBEDDED in
        # the f32 train program on-chip (157.8 vs 107.9 ms/step A/B): its
        # 9-way sequential slice-compare/pad/add chain at (16,256,256,64)
        # does not fuse. It remains available as an opt-in op; do not
        # route it here without re-measuring embedded.
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        feats = []
        widths = (64, 128, 256, 512)
        for stage, (blocks, width) in enumerate(zip(self.stage_sizes, widths)):
            stride = 1 if stage == 0 else 2
            # torchvision projects iff the shortcut shape changes: always
            # for Bottleneck (4x expansion), but BasicBlock's layer1 is
            # identity (64 -> 64, stride 1).
            project = self.block != "basic" or stage != 0
            x = block_cls(
                width, stride=stride, project=project,
                name=f"layer{stage + 1}_0", **kw
            )(x, train)
            for blk in range(1, blocks):
                x = block_cls(width, name=f"layer{stage + 1}_{blk}", **kw)(x, train)
            feats.append(x)
        return tuple(feats)  # C2, C3, C4, C5

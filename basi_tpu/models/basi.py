"""BASINet: the assembled salient-instance-segmentation flagship model.

backbone (ResNet-50 / VGG16, SURVEY §2.6) -> FPN decoder (§2.7) ->
{saliency branch, unified mask features, cell-grid instance head} (§2.8/2.9).

Forward is a pure function of (params, batch_stats, image) and is always
called under jit; all output shapes are static.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from basi_tpu.models.fpn import FPNDecoder
from basi_tpu.models.heads import (
    InstanceKernelHead,
    MaskFeatureHead,
    RefineHead,
    SaliencyHead,
    candidate_masks,
)
from basi_tpu.models.resnet import ResNet50
from basi_tpu.models.vgg import VGG16


class BASIOutputs(NamedTuple):
    """Raw model outputs (all logits, NHWC / cell-major, static shapes)."""

    saliency_logits: jnp.ndarray  # (N, H/4, W/4, 1) fused saliency
    saliency_aux: tuple[jnp.ndarray, ...]  # per-level deep supervision at /4
    cell_scores: jnp.ndarray  # (N, S, S, 1) objectness logits
    cell_kernels: jnp.ndarray | None  # (N, S, S, E) dynamic mask kernels
    mask_feats: jnp.ndarray  # (N, H/4, W/4, E) unified mask features
    mask_logits: jnp.ndarray | None  # (N, S*S, H/4, W/4) candidates (None when skipped)
    # ROI mechanism outputs (model.instance_mechanism="roi"; None otherwise)
    cell_boxes: jnp.ndarray | None = None  # (N, S, S, 4) decoded (y0,x0,y1,x1)
    roi_boxes: jnp.ndarray | None = None  # (N, K, 4) top-k boxes (inference)
    roi_scores: jnp.ndarray | None = None  # (N, K) top-k score logits (inference)
    roi_mask_logits: jnp.ndarray | None = None  # (N, K, R, R) ROI-frame masks


class BASINet(nn.Module):
    backbone: str = "resnet50"
    fpn_channels: int = 256
    mask_channels: int = 64
    grid_size: int = 16
    remat: bool = False
    bn_axis: str | None = None  # sync-BN axis under shard_map DP
    # Frozen-BatchNorm fine-tuning (torch-classic detection recipe: BN
    # modules in eval mode while their affine params stay trainable): the
    # trunk normalizes with RUNNING statistics even when train=True and
    # emits no batch_stats updates. Also drops BN's batch-reduce work (and
    # its backward) from the train step. Set via train.freeze_bn.
    bn_frozen: bool = False
    bn_impl: str = "xla"  # xla | fused (models/norm.py FusedBatchNorm)
    stem_mode: str = "conv7"  # conv7 | s2d (bit-exact MXU-friendly stem)
    # BASNet-style residual refinement of the fused saliency map (RRM):
    # refined = coarse + RefineHead(sigmoid(coarse)). The coarse map joins
    # the deep-supervision aux list in training.
    refine: bool = False
    # SURVEY §2.8 swap interface: "kernels" (cell-grid dynamic kernels,
    # default), "roi" (S4Net-style proposals + ROI mask head — candidate
    # (b)). "connected" needs no model changes (postproc-only hedge).
    instance_mechanism: str = "kernels"
    roi_resolution: int = 28  # ROI-frame mask size R (roi mechanism)
    roi_top_k: int = 64  # proposals kept at inference (roi mechanism)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False,
                 with_candidates: bool = True,
                 roi_boxes: jnp.ndarray | None = None) -> BASIOutputs:
        """``with_candidates=False`` skips materializing the (N, S*S, H, W)
        candidate-mask tensor — the dominant HBM traffic — for inference
        paths that apply only the top-k kernels after selection
        (ops.nms.select_instances_from_kernels).

        ``roi_boxes`` (roi mechanism, training): (N, P, 4) normalized boxes
        — the loss's assigned GT boxes — at which the ROI mask head
        predicts; at inference the model selects its own top-k proposal
        boxes from the box head instead."""
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        trunk_kwargs = dict(name="backbone", bn_axis=self.bn_axis,
                            bn_impl=self.bn_impl, **kw)
        from basi_tpu.models.resnet import BLOCK_KIND, STAGE_SIZES

        if self.backbone in STAGE_SIZES:  # resnet18/34/50/101/152/_tiny
            trunk_cls = ResNet50
            trunk_kwargs["stage_sizes"] = STAGE_SIZES[self.backbone]
            trunk_kwargs["block"] = BLOCK_KIND.get(self.backbone, "bottleneck")
            trunk_kwargs["stem_mode"] = self.stem_mode
        elif self.backbone in ("vgg16", "vgg19"):
            from basi_tpu.models.vgg import VGG_DEPTHS

            trunk_cls = VGG16
            trunk_kwargs["depths"] = VGG_DEPTHS[self.backbone]
        else:
            raise ValueError(f"unknown backbone {self.backbone!r}")
        if self.remat:
            # Rematerialize the trunk in backward: trades ~30% more FLOPs
            # for dropping all trunk activations from HBM (SURVEY: HBM is
            # the scaling bottleneck at 512^2 batch 16).
            trunk_cls = nn.remat(trunk_cls, static_argnums=(2,))
        # BN lives only in the trunk; its train flag controls nothing else.
        feats = trunk_cls(**trunk_kwargs)(image, train and not self.bn_frozen)

        pyramid = FPNDecoder(self.fpn_channels, name="fpn", **kw)(feats)

        # Aux deep-supervision outputs feed ONLY the training loss — don't
        # couple them to with_candidates (a dense-candidate inference call
        # would compute and discard 4 out-convs + full-res resizes).
        sal_logits, sal_aux = SaliencyHead(name="saliency", **kw)(
            pyramid, with_aux=train)
        if self.refine:
            coarse = sal_logits
            prob = jax.nn.sigmoid(coarse.astype(jnp.float32)).astype(
                coarse.dtype)
            sal_logits = coarse + RefineHead(name="refine", **kw)(prob)
            if train:
                # Supervise the coarse map alongside the per-level aux so
                # the RRM refines a signal that is itself trained.
                sal_aux = list(sal_aux) + [coarse]
        mask_feats = MaskFeatureHead(
            embed_dim=self.mask_channels, name="maskfeat", **kw
        )(pyramid)

        if self.instance_mechanism == "roi":
            from basi_tpu.models.heads import RoiBoxHead, RoiMaskHead
            from basi_tpu.ops.roi import decode_cell_boxes

            cell_scores, box_raw = RoiBoxHead(
                grid_size=self.grid_size, name="roi_box", **kw,
            )(pyramid[1])
            cell_boxes = decode_cell_boxes(box_raw, self.grid_size)
            roi_head = RoiMaskHead(
                resolution=self.roi_resolution,
                channels=self.mask_channels, name="roi_mask", **kw)
            top_boxes = top_scores = None
            if roi_boxes is None:
                # Inference (and init): the model proposes — top-k cells by
                # objectness, their decoded boxes feed the ROI mask head.
                n = cell_scores.shape[0]
                ss = self.grid_size * self.grid_size
                k = min(self.roi_top_k, ss)
                flat_scores = cell_scores.reshape(n, ss).astype(jnp.float32)
                top_scores, top_idx = jax.lax.top_k(flat_scores, k)
                roi_boxes = jnp.take_along_axis(
                    cell_boxes.reshape(n, ss, 4), top_idx[..., None], axis=1)
                top_boxes = roi_boxes
            roi_logits = roi_head(mask_feats, roi_boxes)
            return BASIOutputs(
                saliency_logits=sal_logits,
                saliency_aux=tuple(sal_aux),
                cell_scores=cell_scores,
                cell_kernels=None,
                mask_feats=mask_feats,
                mask_logits=None,
                cell_boxes=cell_boxes,
                roi_boxes=top_boxes,
                roi_scores=top_scores,
                roi_mask_logits=roi_logits,
            )

        cell_scores, cell_kernels = InstanceKernelHead(
            grid_size=self.grid_size, embed_dim=self.mask_channels,
            name="instance", **kw,
        )(pyramid[1])  # P3 (stride 8) — mid-level context for cell scoring

        mask_logits = (candidate_masks(mask_feats, cell_kernels)
                       if with_candidates else None)
        return BASIOutputs(
            saliency_logits=sal_logits,
            saliency_aux=tuple(sal_aux),
            cell_scores=cell_scores,
            cell_kernels=cell_kernels,
            mask_feats=mask_feats,
            mask_logits=mask_logits,
        )


def create_model(cfg) -> BASINet:
    """Build a BASINet from a ModelConfig."""
    return BASINet(
        backbone=cfg.backbone,
        fpn_channels=cfg.fpn_channels,
        mask_channels=cfg.mask_channels,
        grid_size=cfg.grid_size,
        remat=getattr(cfg, "remat", False),
        bn_impl=getattr(cfg, "bn_impl", "xla"),
        stem_mode=getattr(cfg, "stem_mode", "conv7"),
        refine=getattr(cfg, "refine", False),
        instance_mechanism=getattr(cfg, "instance_mechanism", "kernels"),
        roi_resolution=getattr(cfg, "roi_resolution", 28),
        roi_top_k=getattr(cfg, "roi_top_k", 64),
        dtype=jnp.dtype(cfg.dtype),
        param_dtype=jnp.dtype(cfg.param_dtype),
    )


def init_model(model: BASINet, image_size: int, seed: int = 0):
    """Initialize variables with a dummy batch; returns (params, batch_stats)."""
    rng = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((1, image_size, image_size, 3), model.dtype)
    variables = model.init(rng, dummy, train=False)
    return variables["params"], variables.get("batch_stats", {})

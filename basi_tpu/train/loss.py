"""Combined BASI training loss (SURVEY §2.10): instance + saliency terms.

  * instance mask loss: Dice (+BCE) on positive cells' predicted masks
  * instance score loss: focal loss on the S x S objectness grid
  * saliency loss: BCE+Dice (or BASNet hybrid BCE+SSIM+IoU) on the fused
    map and each deep-supervision level, target = union of GT instance masks
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

import jax

from basi_tpu.models.basi import BASIOutputs
from basi_tpu.ops.losses import dice_loss, focal_loss, saliency_loss, sigmoid_bce
from basi_tpu.train.targets import assign_targets_batch, assign_targets_sparse


def basi_loss(
    outputs: BASIOutputs,
    gt_masks: jnp.ndarray,
    gt_valid: jnp.ndarray,
    *,
    loss_kind: str = "bce_dice",
    mask_weight: float = 3.0,
    score_weight: float = 1.0,
    saliency_weight: float = 1.0,
    center_sigma: float = 0.2,
    axis_name: str | None = None,
    max_pos_cells: int = 64,
    gt_stats: dict | None = None,
) -> tuple[jnp.ndarray, dict[str, Any]]:
    """Total loss for a batch. gt_masks: (N, M, H, W); gt_valid: (N, M).
    gt_masks may arrive at any integer multiple of the mask-feature
    resolution — the train step pre-downsamples to /4 (maxpool, exactly
    matching the downsample below) so the full-res tensor never exists.

    With ``axis_name`` set (shard_map DP), every term is normalized by
    GLOBAL counts via psum so the loss equals the single-device full-batch
    loss exactly (see basi_tpu.ops.losses).

    When ``outputs.mask_logits is None`` (model called with
    ``with_candidates=False`` — the default train step), the instance mask
    loss is computed on POSITIVE CELLS ONLY: targets select at most
    ``max_pos_cells`` cells per image and only those cells' dynamic
    kernels are applied, so the (S*S, h, w) candidate tensor — the
    dominant HBM traffic of the dense step — is never materialized.
    Identical loss value/gradient to the dense path while
    #positives <= max_pos_cells (tested).
    """
    s = outputs.cell_scores.shape[1]
    n, mh, mw, e = outputs.mask_feats.shape

    if outputs.mask_logits is None:
        if gt_stats is None:
            sel_idx, tgt_masks, pos_sel, score_tgt, num_pos = jax.vmap(
                lambda gm, gv: assign_targets_sparse(
                    gm, gv, grid_size=s, mask_hw=(mh, mw),
                    center_sigma=center_sigma, max_pos_cells=max_pos_cells,
                )
            )(gt_masks, gt_valid)
        else:
            # Precomputed full-resolution stats: assignment stays invariant
            # to the step's /4 GT pre-downsample (see targets module doc).
            sel_idx, tgt_masks, pos_sel, score_tgt, num_pos = jax.vmap(
                lambda gm, gv, st: assign_targets_sparse(
                    gm, gv, grid_size=s, mask_hw=(mh, mw),
                    center_sigma=center_sigma, max_pos_cells=max_pos_cells,
                    stats=st,
                )
            )(gt_masks, gt_valid, gt_stats)
        kernels = outputs.cell_kernels.reshape(n, s * s, e)
        sel_kernels = jnp.take_along_axis(
            kernels, sel_idx[..., None].astype(jnp.int32), axis=1)
        sel_logits = jnp.einsum(
            "nhwe,npe->nphw", outputs.mask_feats, sel_kernels,
            preferred_element_type=jnp.float32)
        inst_dice = dice_loss(sel_logits, tgt_masks, valid=pos_sel,
                              axis_name=axis_name)
        inst_bce = sigmoid_bce(
            sel_logits, tgt_masks,
            weights=jnp.broadcast_to(
                pos_sel[..., None, None], sel_logits.shape),
            axis_name=axis_name,
        )
        total_pos = jnp.sum(num_pos)
    else:
        tgt_masks, cell_pos, score_tgt = assign_targets_batch(
            gt_masks, gt_valid, grid_size=s, mask_hw=(mh, mw),
            center_sigma=center_sigma, stats=gt_stats,
        )
        # Instance masks: Dice over positive cells (+BCE, matching the
        # reference's BCE+Dice recipe applied per instance).
        inst_dice = dice_loss(outputs.mask_logits, tgt_masks, valid=cell_pos,
                              axis_name=axis_name)
        inst_bce = sigmoid_bce(
            outputs.mask_logits, tgt_masks,
            weights=jnp.broadcast_to(
                cell_pos[..., None, None], outputs.mask_logits.shape
            ),
            axis_name=axis_name,
        )
        total_pos = jnp.sum(cell_pos)
    mask_loss = inst_dice + inst_bce

    # Cell objectness: focal loss.
    score_loss = focal_loss(outputs.cell_scores, score_tgt, axis_name=axis_name)

    # Saliency: union of valid GT masks, at /4 resolution via maxpool.
    union = jnp.max(
        gt_masks * gt_valid[..., None, None].astype(gt_masks.dtype), axis=1
    )  # (N, H, W)
    gh, gw = union.shape[1:]
    sh, sw = outputs.saliency_logits.shape[1:3]
    fh, fw = gh // sh, gw // sw
    from basi_tpu.ops.resize import maxpool_hw
    union_small = maxpool_hw(union, fh, fw).astype(jnp.float32)
    sal = saliency_loss(outputs.saliency_logits, union_small, kind=loss_kind,
                        axis_name=axis_name)
    for aux in outputs.saliency_aux:
        sal = sal + saliency_loss(aux, union_small, kind=loss_kind,
                                  axis_name=axis_name)
    sal = sal / (1 + len(outputs.saliency_aux))

    total = (
        mask_weight * mask_loss
        + score_weight * score_loss
        + saliency_weight * sal
    )
    pos_per_img = total_pos / n
    if axis_name:
        pos_per_img = jax.lax.pmean(pos_per_img, axis_name)
    metrics = {
        "loss": total,
        "mask_dice": inst_dice,
        "mask_bce": inst_bce,
        "score_focal": score_loss,
        "saliency": sal,
        "num_pos_cells": pos_per_img,
    }
    return total, metrics

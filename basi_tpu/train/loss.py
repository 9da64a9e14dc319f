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


def saliency_branch_loss(
    outputs: BASIOutputs,
    gt_masks: jnp.ndarray,
    gt_valid: jnp.ndarray,
    *,
    loss_kind: str = "bce_dice",
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Saliency term shared by every instance mechanism: fused map + each
    deep-supervision level vs the union of valid GT masks (maxpooled to
    the /4 saliency resolution), averaged over the heads."""
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
    return sal / (1 + len(outputs.saliency_aux))


def basi_roi_loss(
    outputs: BASIOutputs,
    targets: dict[str, jnp.ndarray],
    gt_masks: jnp.ndarray,
    gt_valid: jnp.ndarray,
    *,
    loss_kind: str = "bce_dice",
    mask_weight: float = 3.0,
    score_weight: float = 1.0,
    box_weight: float = 1.0,
    saliency_weight: float = 1.0,
    axis_name: str | None = None,
) -> tuple[jnp.ndarray, dict[str, Any]]:
    """Loss for the ROI instance mechanism (§2.8 candidate (b)).

    ``targets`` is the batched ``assign_targets_roi`` output (computed by
    the train step BEFORE model.apply — the ROI mask head predicts at the
    assigned GT boxes, so the boxes must exist first): sel_idx (N, P),
    tgt_masks (N, P, h, w), pos_sel (N, P), score_tgt (N, S, S, 1),
    num_pos (N,), sel_boxes (N, P, 4). ``outputs.roi_mask_logits`` is the
    (N, P, R, R) prediction at those boxes.

    Terms (all globally normalized under DP, like basi_loss):
      * ROI mask BCE+Dice in the ROI frame, targets = GT /4 masks cropped
        to the same boxes with the same separable sampler, binarized
      * focal objectness on the cell grid (shared with kernels)
      * box regression: (1 - IoU) of decoded cell boxes vs GT boxes at
        positive cells
      * the shared saliency branch
    """
    from basi_tpu.ops.roi import box_iou, roi_align

    n, p = targets["pos_sel"].shape
    roi_logits = outputs.roi_mask_logits  # (N, P, R, R)
    r = roi_logits.shape[-1]

    # ROI-frame mask targets: crop each selected cell's /4 GT mask to its
    # GT box with the same sampler the head used on the features, then
    # binarize (bilinear blending only touches box-edge pixels).
    def crop_one(masks_p, boxes_p):
        return jax.vmap(
            lambda m, b: roi_align(m[..., None], b[None], r)[0, ..., 0]
        )(masks_p, boxes_p)

    tgt_roi = jax.vmap(crop_one)(
        targets["tgt_masks"].astype(jnp.float32), targets["sel_boxes"])
    tgt_roi = (tgt_roi > 0.5).astype(jnp.float32)

    pos = targets["pos_sel"]
    inst_dice = dice_loss(roi_logits, tgt_roi, valid=pos, axis_name=axis_name)
    inst_bce = sigmoid_bce(
        roi_logits, tgt_roi,
        weights=jnp.broadcast_to(pos[..., None, None], roi_logits.shape),
        axis_name=axis_name)
    mask_loss = inst_dice + inst_bce

    score_loss = focal_loss(outputs.cell_scores, targets["score_tgt"],
                            axis_name=axis_name)

    # Box regression at positive cells: gather the decoded box grid at the
    # selected flat cell indices, IoU against the GT boxes.
    s = outputs.cell_scores.shape[1]
    cell_boxes = outputs.cell_boxes.reshape(n, s * s, 4)
    pred_boxes = jnp.take_along_axis(
        cell_boxes, targets["sel_idx"][..., None].astype(jnp.int32), axis=1)
    iou = box_iou(pred_boxes.astype(jnp.float32),
                  targets["sel_boxes"].astype(jnp.float32))
    box_num = jnp.sum((1.0 - iou) * pos)
    box_den = jnp.sum(pos)
    if axis_name:
        # psum the VALUE, keep the GRADIENT local (ops.losses doc: psum's
        # shard_map transpose would scale every grad by the axis size).
        from basi_tpu.ops.losses import _psum_value_local_grad
        box_num = _psum_value_local_grad(box_num, axis_name)
        box_den = jax.lax.psum(box_den, axis_name)  # counts: param-free
    box_loss = box_num / jnp.maximum(box_den, 1.0)

    sal = saliency_branch_loss(outputs, gt_masks, gt_valid,
                               loss_kind=loss_kind, axis_name=axis_name)

    total = (mask_weight * mask_loss + score_weight * score_loss
             + box_weight * box_loss + saliency_weight * sal)
    pos_per_img = jnp.sum(targets["num_pos"]) / n
    if axis_name:
        pos_per_img = jax.lax.pmean(pos_per_img, axis_name)
    metrics = {
        "loss": total,
        "mask_dice": inst_dice,
        "mask_bce": inst_bce,
        "score_focal": score_loss,
        "box_iou": box_loss,
        "saliency": sal,
        "num_pos_cells": pos_per_img,
    }
    return total, metrics


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

    sal = saliency_branch_loss(outputs, gt_masks, gt_valid,
                               loss_kind=loss_kind, axis_name=axis_name)

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

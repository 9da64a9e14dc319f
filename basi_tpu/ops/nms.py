"""On-device mask NMS over fixed-capacity candidate sets (SURVEY.md §2.13).

The reference does greedy mask-NMS in CPU numpy loops over a dynamic number
of candidates — the documented inference bottleneck. TPU-native redesign:

  * ``matrix_nms`` — SOLO-style Matrix NMS: the entire pairwise mask-IoU
    matrix is one (K, HW) x (HW, K) matmul on the MXU, and suppression is a
    closed-form decay — no sequential loop at all. Default path.
  * ``greedy_nms`` — exact greedy suppress-by-IoU as a ``lax.fori_loop`` over
    the K fixed slots (data-independent trip count), for parity with the
    reference's algorithm when exactness matters.

Both take binarized/probability masks of shape (K, H, W) plus scores (K,)
and return per-candidate keep/decay information with static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-6


def mask_iou_matrix(masks_a: jnp.ndarray, masks_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between two stacks of soft/binary masks.

    masks_a: (A, H, W), masks_b: (B, H, W) -> (A, B). One MXU matmul.
    """
    # Matmul/sums run in the input dtype with f32 ACCUMULATION: for bf16
    # inference this halves the HBM reads of the (K, HW) operands (the
    # dominant cost — the FLOPs are trivial for the MXU) and is exact for
    # binary masks; the IoU itself is computed in f32.
    a = masks_a.reshape(masks_a.shape[0], -1)
    b = masks_b.reshape(masks_b.shape[0], -1)
    inter = jnp.matmul(a, b.T, preferred_element_type=jnp.float32)
    area_a = jnp.sum(a, axis=1, keepdims=True, dtype=jnp.float32)
    area_b = jnp.sum(b, axis=1, keepdims=True, dtype=jnp.float32).T
    union = area_a + area_b - inter
    return inter / jnp.maximum(union, _EPS)


def matrix_nms(
    masks: jnp.ndarray,
    scores: jnp.ndarray,
    sigma: float = 2.0,
    kind: str = "gauss",
) -> jnp.ndarray:
    """Matrix NMS decay factors (SOLOv2-style), fully parallel.

    masks: (K, H, W) binary masks; scores: (K,). Returns decayed scores (K,).
    Candidates need NOT be pre-sorted — ordering is handled via score
    comparisons, so this composes with top-k selection in any order.
    """
    iou = mask_iou_matrix(masks, masks)  # (K, K)
    # For candidate j, suppression comes from any higher-scoring candidate i.
    # Index tiebreak: exactly-tied scores (e.g. duplicated kernels in
    # adjacent cells producing bit-identical masks) must still suppress one
    # another — strict > alone keeps BOTH duplicates at full score, unlike
    # the sorted upper-triangular SOLOv2 formulation.
    k = scores.shape[0]
    idx = jnp.arange(k)
    higher = (
        (scores[:, None] > scores[None, :])
        | ((scores[:, None] == scores[None, :]) & (idx[:, None] < idx[None, :]))
    ).astype(jnp.float32)  # i beats j
    sup_iou = iou * higher  # iou with higher-scored candidates only
    # Max IoU each *suppressor* i suffers from its own suppressors.
    comp_iou = jnp.max(sup_iou, axis=0)  # (K,) per candidate as target
    if kind == "gauss":
        decay = jnp.exp(-(sup_iou ** 2 - comp_iou[:, None] ** 2) * sigma)
    else:  # linear
        decay = (1.0 - sup_iou) / jnp.maximum(1.0 - comp_iou[:, None], _EPS)
    decay = jnp.min(jnp.where(higher > 0, decay, 1.0), axis=0)
    return scores * decay


def greedy_nms(
    masks: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.5,
) -> jnp.ndarray:
    """Exact greedy mask-NMS with a static trip count.

    Returns keep mask (K,) of 0/1. Matches the reference's sequential
    algorithm (highest score first, suppress IoU > threshold) but runs
    on-device: the IoU matrix is one matmul, the greedy scan is a
    ``fori_loop`` over K slots.
    """
    k = scores.shape[0]
    order = jnp.argsort(-scores)  # high to low
    iou = mask_iou_matrix(masks, masks)
    iou_sorted = iou[order][:, order]  # (K, K) in score order

    def body(i, keep):
        # Suppressed if any kept earlier candidate overlaps > threshold.
        earlier = jnp.arange(k) < i
        overlap = jnp.any(earlier & (keep > 0) & (iou_sorted[i] > iou_threshold))
        return keep.at[i].set(jnp.where(overlap, 0, 1))

    keep_sorted = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), jnp.int32))
    # Scatter back to original order.
    keep = jnp.zeros((k,), jnp.int32).at[order].set(keep_sorted)
    return keep


@functools.partial(jax.jit, static_argnames=("num_slots", "nms", "pre_top_k"))
def select_instances_from_kernels(
    mask_feats: jnp.ndarray,
    kernels: jnp.ndarray,
    cell_scores: jnp.ndarray,
    num_slots: int = 20,
    score_threshold: float = 0.1,
    mask_threshold: float = 0.5,
    nms: str = "matrix",
    nms_sigma: float = 2.0,
    nms_iou_threshold: float = 0.5,
    pre_top_k: int = 64,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Bandwidth-lean instance selection for ONE image.

    Instead of materializing all C candidate masks (C x H x W — the
    dominant HBM traffic of the inference program), select the pre_top_k
    cells by objectness FIRST and apply only THOSE dynamic kernels:
    mask_feats (H, W, E), kernels (C, E), cell_scores (C,). Semantics match
    ``select_instances`` with objectness prefiltering.
    """
    probs = jax.nn.sigmoid(cell_scores.astype(jnp.float32))
    # Clamp: small grids (C < pre_top_k) would crash lax.top_k at trace time.
    obj_scores, top_idx = jax.lax.top_k(probs, min(pre_top_k, probs.shape[0]))
    # Einsum in the model's compute dtype (f32 accumulation on the MXU);
    # the (K, H, W) candidate tensor stays bf16 under bf16 inference —
    # halving the dominant HBM traffic of the selection path.
    top_logits = jnp.einsum(
        "hwe,ke->khw", mask_feats, kernels[top_idx],
        preferred_element_type=jnp.float32,
    ).astype(mask_feats.dtype)
    return _select_from_logits(
        top_logits, obj_scores, num_slots, score_threshold, mask_threshold,
        nms, nms_sigma, nms_iou_threshold,
    )


def select_instances_from_kernel_views(
    mask_feats_views,
    kernels_views,
    cell_scores_views,
    base_hw: tuple,
    num_slots: int = 20,
    score_threshold: float = 0.1,
    mask_threshold: float = 0.5,
    nms: str = "matrix",
    nms_sigma: float = 2.0,
    nms_iou_threshold: float = 0.5,
    pre_top_k: int = 64,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Test-time-augmentation variant of ``select_instances_from_kernels``.

    Each "view" is one forward pass (original / hflip / scale), with its
    outputs already REALIGNED to the original geometry by the caller
    (mask features W-flipped back, kernels/scores re-indexed to mirrored
    cells — the cell grid is a fixed S x S partition of the image, so the
    same cell index refers to the same image region in every view; scale
    views keep their native /4 resolution and are resized here). Views are
    ensembled in probability space: mean objectness ranks the cells, each
    surviving cell's mask probability is the mean of its per-view sigmoid
    masks. A single-view call is exactly ``select_instances_from_kernels``.

    mask_feats_views: sequence of (Hv, Wv, E); kernels_views: sequence of
    (C, E); cell_scores_views: sequence of (C,); base_hw: output (H, W).
    """
    from basi_tpu.ops.resize import resize_bilinear

    obj = sum(jax.nn.sigmoid(s.astype(jnp.float32))
              for s in cell_scores_views) / len(cell_scores_views)
    obj_scores, top_idx = jax.lax.top_k(obj, min(pre_top_k, obj.shape[0]))
    probs = None
    for feats, kernels in zip(mask_feats_views, kernels_views):
        logits = jnp.einsum(
            "hwe,ke->khw", feats, kernels[top_idx],
            preferred_element_type=jnp.float32,
        ).astype(feats.dtype)
        p = jax.nn.sigmoid(logits)
        if p.shape[1:] != tuple(base_hw):
            p = resize_bilinear(p[..., None], tuple(base_hw))[..., 0]
        probs = p if probs is None else probs + p
    probs = probs / len(mask_feats_views)
    return _select_from_probs(
        probs, obj_scores, num_slots, score_threshold, mask_threshold,
        nms, nms_sigma, nms_iou_threshold,
    )


def _select_from_logits(top_logits, obj_scores, num_slots, score_threshold,
                        mask_threshold, nms, nms_sigma, nms_iou_threshold):
    return _select_from_probs(
        jax.nn.sigmoid(top_logits), obj_scores, num_slots, score_threshold,
        mask_threshold, nms, nms_sigma, nms_iou_threshold,
    )


def _select_from_probs(top_probs, obj_scores, num_slots, score_threshold,
                       mask_threshold, nms, nms_sigma, nms_iou_threshold):
    """Shared tail: quality rescoring + NMS + slot packing (static shapes).

    Per-pixel tensors stay in the incoming compute dtype (bf16 under bf16
    inference — bandwidth, not precision, dominates here); all reductions
    and the scores accumulate/compare in f32.
    """
    top_binary = (top_probs > mask_threshold).astype(top_probs.dtype)
    area = jnp.sum(top_binary, axis=(-2, -1), dtype=jnp.float32)
    quality = jnp.sum(top_probs * top_binary, axis=(-2, -1),
                      dtype=jnp.float32) / jnp.maximum(area, _EPS)
    top_scores = obj_scores * quality * (area > 0)
    top_scores = jnp.where(top_scores >= score_threshold, top_scores, 0.0)

    if nms in ("matrix", "matrix_linear"):
        final_scores = matrix_nms(
            top_binary, top_scores, sigma=nms_sigma,
            kind="linear" if nms == "matrix_linear" else "gauss")
    elif nms == "greedy":
        keep = greedy_nms(top_binary, top_scores, iou_threshold=nms_iou_threshold)
        final_scores = keep * top_scores
    else:
        raise ValueError(f"unknown nms {nms!r}")
    final_scores = jnp.where(final_scores >= score_threshold, final_scores, 0.0)

    kk = final_scores.shape[0]
    if kk >= num_slots:
        slot_scores, slot_pos = jax.lax.top_k(final_scores, num_slots)
        slot_masks = top_probs[slot_pos]
    else:  # tiny grids: fewer candidates than slots — pad with empties
        order = jnp.argsort(-final_scores)
        slot_scores = jnp.zeros((num_slots,), final_scores.dtype
                                ).at[:kk].set(final_scores[order])
        slot_masks = jnp.zeros((num_slots,) + top_probs.shape[1:],
                               top_probs.dtype).at[:kk].set(top_probs[order])
    slot_masks = slot_masks * (slot_scores[:, None, None] > 0)
    return slot_masks, slot_scores


@functools.partial(jax.jit, static_argnames=("num_slots", "nms"))
def select_instances_from_probs(
    mask_probs: jnp.ndarray,
    obj_scores: jnp.ndarray,
    num_slots: int = 20,
    score_threshold: float = 0.1,
    mask_threshold: float = 0.5,
    nms: str = "matrix",
    nms_sigma: float = 2.0,
    nms_iou_threshold: float = 0.5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Selection tail for mechanisms that already hold per-candidate
    probability masks in the model frame (the ROI mechanism pastes its
    ROI-frame sigmoid masks to /4 first): quality rescoring + NMS + slot
    packing, ONE image. mask_probs: (C, H, W) probs; obj_scores: (C,)
    probabilities. Returns the standard (num_slots, H, W) / (num_slots,)
    slot contract; vmap over the batch."""
    return _select_from_probs(
        mask_probs, obj_scores.astype(jnp.float32), num_slots,
        score_threshold, mask_threshold, nms, nms_sigma, nms_iou_threshold,
    )


@functools.partial(jax.jit, static_argnames=("num_slots", "nms", "pre_top_k"))
def select_instances(
    mask_logits: jnp.ndarray,
    cell_scores: jnp.ndarray,
    num_slots: int = 20,
    score_threshold: float = 0.1,
    mask_threshold: float = 0.5,
    nms: str = "matrix",
    nms_sigma: float = 2.0,
    nms_iou_threshold: float = 0.5,
    pre_top_k: int = 64,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full instance selection for ONE image, static shapes throughout.

    mask_logits: (C, H, W) candidate mask logits (C = S*S cells)
    cell_scores: (C,) objectness logits
    Returns (slot_masks (num_slots, H, W) sigmoid probs, slot_scores (num_slots,)).
    Empty slots have score 0. vmap over the batch dimension for batched use.
    """
    probs = jax.nn.sigmoid(cell_scores.astype(jnp.float32))
    # Prefilter by objectness FIRST (top-k over C cheap scalars), then do
    # the expensive per-pixel work (sigmoid/binarize/quality) on only the
    # pre_top_k survivors — C/pre_top_k less VPU traffic on the hot path.
    obj_scores, top_idx = jax.lax.top_k(probs, min(pre_top_k, probs.shape[0]))
    top_logits = mask_logits[top_idx].astype(jnp.float32)
    return _select_from_logits(
        top_logits, obj_scores, num_slots, score_threshold, mask_threshold,
        nms, nms_sigma, nms_iou_threshold,
    )

"""GT -> cell-grid target assignment (static shapes, vmappable).

The reference supervises per-instance masks directly (SURVEY §2.10); our
cell-grid instance mechanism needs each GT instance routed to the cells
responsible for it. Assignment rule (center-region, SOLO-flavoured): a cell
is positive for an instance if the cell's center falls inside the instance's
scaled center box (center +/- sigma * bbox extent). Everything is computed
from the padded GT mask tensor with masked arithmetic — no dynamic shapes,
no host round-trip; it runs inside the jitted train step.

Inputs per image:
  gt_masks: (M, H, W) float 0/1, padded with empty masks
  gt_valid: (M,) 0/1 slot validity
Outputs per image (for an S x S grid):
  cell_target_mask: (S*S, h, w) the mask each cell must predict (at /4 res)
  cell_pos:         (S*S,) 0/1 positive-cell indicator
  cell_score_tgt:   (S, S, 1) objectness target
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-6


def instance_stats(gt_masks: jnp.ndarray, gt_valid: jnp.ndarray):
    """Per-instance center-of-mass and bbox extents from padded masks.

    gt_masks: (M, H, W); returns dict of (M,) arrays in normalized [0,1]
    image coordinates: cy, cx, eh, ew (extents), area.
    """
    m, h, w = gt_masks.shape
    g = gt_masks.astype(jnp.float32)
    area = jnp.sum(g, axis=(1, 2))
    safe_area = jnp.maximum(area, _EPS)
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    row_mass = jnp.sum(g, axis=2)  # (M, H)
    col_mass = jnp.sum(g, axis=1)  # (M, W)
    cy = jnp.sum(row_mass * ys, axis=1) / safe_area
    cx = jnp.sum(col_mass * xs, axis=1) / safe_area
    row_any = row_mass > 0
    col_any = col_mass > 0
    y_idx = jnp.broadcast_to(ys, (m, h))
    x_idx = jnp.broadcast_to(xs, (m, w))
    big = jnp.float32(2.0)
    y_min = jnp.min(jnp.where(row_any, y_idx, big), axis=1)
    y_max = jnp.max(jnp.where(row_any, y_idx, -big), axis=1)
    x_min = jnp.min(jnp.where(col_any, x_idx, big), axis=1)
    x_max = jnp.max(jnp.where(col_any, x_idx, -big), axis=1)
    valid = gt_valid.astype(jnp.float32) * (area > 0)
    # Tight bbox corners in normalized coords (used as ROI box-regression
    # targets, §2.8 candidate (b)): pixel-center extrema widened by the
    # half-pixel so the box covers full pixels. Invalid slots clamp to an
    # empty box at the origin.
    hp_y = 0.5 / h
    hp_x = 0.5 / w
    return {
        "cy": cy, "cx": cx,
        "eh": jnp.maximum(y_max - y_min, 0.0),
        "ew": jnp.maximum(x_max - x_min, 0.0),
        "y0": jnp.where(valid > 0, jnp.maximum(y_min - hp_y, 0.0), 0.0),
        "x0": jnp.where(valid > 0, jnp.maximum(x_min - hp_x, 0.0), 0.0),
        "y1": jnp.where(valid > 0, jnp.minimum(y_max + hp_y, 1.0), 0.0),
        "x1": jnp.where(valid > 0, jnp.minimum(x_max + hp_x, 1.0), 0.0),
        "area": area, "valid": valid,
    }


def _assignment_core(
    gt_masks: jnp.ndarray,
    gt_valid: jnp.ndarray,
    grid_size: int,
    mask_hw: tuple[int, int],
    center_sigma: float,
    stats: dict | None = None,
):
    """Shared assignment: returns (small (M, h, w) downsampled GT,
    flat_winner (S*S,), cell_pos (S*S,), cell_score_tgt (S, S, 1)).

    ``stats``: optional precomputed ``instance_stats`` (normalized coords,
    so resolution-free). The train step passes FULL-RESOLUTION stats while
    feeding pre-downsampled /4 masks — maxpool dilates thin structures,
    which would otherwise shift centroids/extents/areas and flip
    smallest-area conflict tiebreaks vs the full-res assignment.
    """
    s = grid_size
    if stats is None:
        stats = instance_stats(gt_masks, gt_valid)

    # Cell centers in normalized coords: (S,) each.
    cc = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    cyc = cc[:, None]  # rows
    cxc = cc[None, :]  # cols

    half_h = jnp.maximum(center_sigma * stats["eh"] * 0.5, 0.5 / s)
    half_w = jnp.maximum(center_sigma * stats["ew"] * 0.5, 0.5 / s)

    # (M, S, S): is cell (i,j) inside instance m's center region?
    in_y = jnp.abs(cyc[None] - stats["cy"][:, None, None]) <= half_h[:, None, None]
    in_x = jnp.abs(cxc[None] - stats["cx"][:, None, None]) <= half_w[:, None, None]
    hit = (in_y & in_x) & (stats["valid"][:, None, None] > 0)

    # Resolve conflicts: the SMALLEST instance wins a contested cell
    # (finer objects need their own cells; big ones have many).
    area_rank = jnp.where(
        hit, stats["area"][:, None, None], jnp.float32(jnp.inf)
    )
    winner = jnp.argmin(area_rank, axis=0)  # (S, S) instance index
    any_hit = jnp.any(hit, axis=0)  # (S, S)

    # Downsample GT masks to the mask-feature resolution (/4) with a
    # max-pool-style resize: a cell of the low-res mask is on if the
    # corresponding region contains foreground (preserves thin structures
    # better than bilinear for binary masks).
    mh, mw = mask_hw
    m, gh, gw = gt_masks.shape
    fh, fw = gh // mh, gw // mw
    if fh * mh == gh and fw * mw == gw and fh >= 1:
        from basi_tpu.ops.resize import maxpool_hw
        small = maxpool_hw(gt_masks, fh, fw).astype(jnp.float32)
    else:  # non-integer factor fallback: bilinear + threshold
        from basi_tpu.ops.resize import resize_bilinear
        small = (
            resize_bilinear(
                gt_masks.astype(jnp.float32).transpose(1, 2, 0), (mh, mw)
            ).transpose(2, 0, 1)
            > 0.5
        ).astype(jnp.float32)

    flat_winner = winner.reshape(-1)  # (S*S,)
    cell_pos = any_hit.reshape(-1).astype(jnp.float32)
    cell_score_tgt = any_hit.astype(jnp.float32)[..., None]
    return small, flat_winner, cell_pos, cell_score_tgt


@functools.partial(jax.jit, static_argnames=("grid_size", "mask_hw"))
def assign_targets(
    gt_masks: jnp.ndarray,
    gt_valid: jnp.ndarray,
    grid_size: int = 16,
    mask_hw: tuple[int, int] = (128, 128),
    center_sigma: float = 0.2,
    stats: dict | None = None,
):
    """Build DENSE cell-grid training targets for one image (module doc)."""
    small, flat_winner, cell_pos, cell_score_tgt = _assignment_core(
        gt_masks, gt_valid, grid_size, mask_hw, center_sigma, stats)
    cell_target_mask = small[flat_winner] * cell_pos[:, None, None]
    return cell_target_mask, cell_pos, cell_score_tgt


@functools.partial(jax.jit,
                   static_argnames=("grid_size", "mask_hw", "max_pos_cells"))
def assign_targets_sparse(
    gt_masks: jnp.ndarray,
    gt_valid: jnp.ndarray,
    grid_size: int = 16,
    mask_hw: tuple[int, int] = (128, 128),
    center_sigma: float = 0.2,
    max_pos_cells: int = 64,
    stats: dict | None = None,
):
    """Targets for the POSITIVE-CELLS-ONLY loss path (one image).

    The dense path materializes (S*S, h, w) target masks and the model's
    (S*S, h, w) candidate masks although typical images mark <10% of cells
    positive — the dominant HBM traffic of the train step. Here we select
    the (stable-sorted) top ``max_pos_cells`` cells by positivity and
    return only their targets + flat cell indices; the step applies only
    those cells' dynamic kernels. Exactly equivalent to the dense loss
    whenever #positives <= max_pos_cells (all loss terms normalize by the
    sum of kept weights); beyond that, lowest-index positives win.

    Returns (sel_idx (P,) int32, tgt_masks (P, h, w), pos_sel (P,),
    cell_score_tgt (S, S, 1), num_pos ()).
    """
    small, flat_winner, cell_pos, cell_score_tgt = _assignment_core(
        gt_masks, gt_valid, grid_size, mask_hw, center_sigma, stats)
    # stable argsort: positives (1.0) first, each group in index order
    order = jnp.argsort(-cell_pos, stable=True)
    sel_idx = order[:max_pos_cells].astype(jnp.int32)
    pos_sel = cell_pos[sel_idx]
    tgt_sel = small[flat_winner[sel_idx]] * pos_sel[:, None, None]
    return sel_idx, tgt_sel, pos_sel, cell_score_tgt, jnp.sum(cell_pos)


@functools.partial(jax.jit,
                   static_argnames=("grid_size", "mask_hw", "max_pos_cells"))
def assign_targets_roi(
    gt_masks: jnp.ndarray,
    gt_valid: jnp.ndarray,
    grid_size: int = 16,
    mask_hw: tuple[int, int] = (128, 128),
    center_sigma: float = 0.2,
    max_pos_cells: int = 64,
    stats: dict | None = None,
):
    """Targets for the ROI mechanism (§2.8 candidate (b)), one image.

    Same center-region cell assignment as the kernel mechanism (the cell
    grid doubles as the anchor-free proposal grid), plus each selected
    cell's GT BOX — the ROI mask head trains at GT boxes (the Mask-R-CNN
    recipe: mask supervision at sampled GT geometry, box regression
    supervised separately).

    Returns (sel_idx (P,), tgt_masks (P, h, w) /4-res winner masks,
    pos_sel (P,), cell_score_tgt (S, S, 1), num_pos (),
    sel_boxes (P, 4) normalized (y0, x0, y1, x1)).
    """
    if stats is None:
        stats = instance_stats(gt_masks, gt_valid)
    small, flat_winner, cell_pos, cell_score_tgt = _assignment_core(
        gt_masks, gt_valid, grid_size, mask_hw, center_sigma, stats)
    order = jnp.argsort(-cell_pos, stable=True)
    sel_idx = order[:max_pos_cells].astype(jnp.int32)
    pos_sel = cell_pos[sel_idx]
    win = flat_winner[sel_idx]
    tgt_sel = small[win] * pos_sel[:, None, None]
    boxes = jnp.stack(
        [stats["y0"], stats["x0"], stats["y1"], stats["x1"]], axis=-1)
    sel_boxes = boxes[win] * pos_sel[:, None]
    return sel_idx, tgt_sel, pos_sel, cell_score_tgt, jnp.sum(cell_pos), sel_boxes


def assign_targets_batch(gt_masks, gt_valid, grid_size, mask_hw,
                         center_sigma=0.2, stats=None):
    """vmapped assignment over the batch dimension."""
    if stats is None:
        return jax.vmap(
            lambda gm, gv: assign_targets(gm, gv, grid_size, mask_hw,
                                          center_sigma)
        )(gt_masks, gt_valid)
    return jax.vmap(
        lambda gm, gv, st: assign_targets(gm, gv, grid_size, mask_hw,
                                          center_sigma, stats=st)
    )(gt_masks, gt_valid, stats)

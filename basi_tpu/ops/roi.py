"""ROI crop/paste as separable MXU matmuls (SURVEY §2.8 candidate (b)).

The reference's instance mechanism is unverified (empty mount, SURVEY §0);
candidate (b) is an S4Net-style proposal + ROI mask head. Its native-CUDA
ingredient — torchvision ``roi_align`` (SURVEY §2.16) — becomes two small
matmuls per ROI here: bilinear sampling along an axis is a linear map, so
cropping a box to an R x R grid is ``W_y @ F @ W_x^T`` with dynamically
built banded hat-weight matrices (the same structure the Pallas integer
upsample uses, with traced box coordinates instead of static factors).
No gathers with dynamic indices, no dynamic shapes — everything jits,
vmaps over a static ROI count, and differentiates (gradients flow to the
features AND to the box coordinates).

Conventions: boxes are (y0, x0, y1, x1) in NORMALIZED [0, 1] image
coordinates; sampling uses half-pixel centers (align_corners=False,
matching ops/resize.py and torchvision roi_align's default sampling
geometry with one sample per bin).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6


def _crop_axis_weights(c0: jnp.ndarray, c1: jnp.ndarray, out_size: int,
                       in_size: int) -> jnp.ndarray:
    """(out_size, in_size) bilinear sampling matrix for one box axis.

    Output bin r (half-pixel center within the box) samples source
    coordinate (c0 + (r+.5)/R * (c1-c0)) * in_size - 0.5, clipped to the
    grid; the hat function over the source index axis gives each row the
    two-tap bilinear weights (rows sum to 1).
    """
    r = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size
    src = (c0 + r * (c1 - c0)) * in_size - 0.5
    src = jnp.clip(src, 0.0, in_size - 1.0)
    idx = jnp.arange(in_size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - idx[None, :]))


def _paste_axis_weights(c0: jnp.ndarray, c1: jnp.ndarray, out_size: int,
                        roi_size: int) -> jnp.ndarray:
    """(out_size, roi_size) inverse map: canvas pixels <- ROI grid.

    Canvas pixel p (half-pixel center, normalized) lands at ROI coordinate
    (p - c0) / (c1 - c0) * R - 0.5; pixels outside [c0, c1) get all-zero
    rows (the paste leaves them at 0). Edge ROI cells extend to the box
    border (clip), matching the crop's clipped sampling.
    """
    p = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size
    u = (p - c0) / jnp.maximum(c1 - c0, _EPS) * roi_size - 0.5
    inside = (p >= c0) & (p < c1)
    u = jnp.clip(u, 0.0, roi_size - 1.0)
    idx = jnp.arange(roi_size, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(u[:, None] - idx[None, :]))
    return w * inside[:, None].astype(w.dtype)


def roi_align(feats: jnp.ndarray, boxes: jnp.ndarray,
              resolution: int) -> jnp.ndarray:
    """Crop+resample K boxes from one feature map.

    feats: (H, W, E); boxes: (K, 4) normalized (y0, x0, y1, x1).
    Returns (K, R, R, E), R = ``resolution``. Degenerate boxes (y1 <= y0)
    sample a single clipped line — no NaNs, no special cases.
    """
    h, w, _ = feats.shape
    f32 = feats.astype(jnp.float32)

    def one(box):
        wy = _crop_axis_weights(box[0], box[2], resolution, h)  # (R, H)
        wx = _crop_axis_weights(box[1], box[3], resolution, w)  # (R, W)
        rows = jnp.einsum("rh,hwe->rwe", wy, f32)
        return jnp.einsum("rwe,qw->rqe", rows, wx)

    return jax.vmap(one)(boxes.astype(jnp.float32)).astype(feats.dtype)


def paste_rois(patches: jnp.ndarray, boxes: jnp.ndarray,
               out_hw: tuple[int, int]) -> jnp.ndarray:
    """Paste K ROI-frame patches back onto zero canvases (inverse crop).

    patches: (K, R, R) values (typically sigmoid probs — outside-box canvas
    is 0, which is "background" in probability space); boxes: (K, 4)
    normalized. Returns (K, out_h, out_w).
    """
    oh, ow = out_hw
    r = patches.shape[-1]
    p32 = patches.astype(jnp.float32)

    def one(patch, box):
        wy = _paste_axis_weights(box[0], box[2], oh, r)  # (oh, R)
        wx = _paste_axis_weights(box[1], box[3], ow, r)  # (ow, R)
        return wy @ patch @ wx.T

    return jax.vmap(one)(p32, boxes.astype(jnp.float32)).astype(patches.dtype)


def decode_cell_boxes(raw: jnp.ndarray, grid_size: int) -> jnp.ndarray:
    """FCOS-style box decode on the cell grid.

    raw: (..., S, S, 4) unconstrained (l, t, r, b) distance logits; each
    cell's center is the anchor. softplus keeps distances positive with
    smooth gradients (exp explodes under SGD at init); the 0.05 scale puts
    the softplus(0) ~ 0.035 init at a plausible small-object extent.
    Returns (..., S, S, 4) normalized (y0, x0, y1, x1) clipped to [0, 1].
    """
    s = grid_size
    cc = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    cy = cc[:, None]
    cx = cc[None, :]
    d = jax.nn.softplus(raw.astype(jnp.float32)) * 0.05 / jax.nn.softplus(0.0)
    left, top, right, bottom = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    y0 = jnp.clip(cy - top, 0.0, 1.0)
    x0 = jnp.clip(cx - left, 0.0, 1.0)
    y1 = jnp.clip(cy + bottom, 0.0, 1.0)
    x1 = jnp.clip(cx + right, 0.0, 1.0)
    return jnp.stack([y0, x0, y1, x1], axis=-1)


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of (..., 4) normalized (y0, x0, y1, x1) boxes."""
    ay0, ax0, ay1, ax1 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    by0, bx0, by1, bx1 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    iy = jnp.maximum(
        0.0, jnp.minimum(ay1, by1) - jnp.maximum(ay0, by0))
    ix = jnp.maximum(
        0.0, jnp.minimum(ax1, bx1) - jnp.maximum(ax0, bx0))
    inter = iy * ix
    area_a = jnp.maximum(ay1 - ay0, 0.0) * jnp.maximum(ax1 - ax0, 0.0)
    area_b = jnp.maximum(by1 - by0, 0.0) * jnp.maximum(bx1 - bx0, 0.0)
    return inter / jnp.maximum(area_a + area_b - inter, _EPS)

"""On-device full-resolution mask pasting (SURVEY.md §2.13).

The reference resizes each predicted mask back to the original image size in
CPU numpy. TPU-native version: a scale-and-translate bilinear sampler with a
FIXED output canvas (static shapes) whose per-image source extent is a traced
value — so one jitted program handles every original resolution. Images are
assumed letterboxed into the model input (aspect-preserving resize + top-left
padding, matching the ingest path); pasting inverts that mapping.

For saving PNGs at exact original resolution the host crops the canvas to
(orig_h, orig_w) — a pure memory view, no resampling on host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def paste_mask(
    mask: jnp.ndarray,
    valid_hw: jnp.ndarray,
    canvas_hw: tuple[int, int],
    orig_hw: jnp.ndarray,
) -> jnp.ndarray:
    """Paste one mask to a fixed canvas at its original resolution.

    mask: (h, w) probabilities over the model grid; the content occupies the
      top-left ``valid_hw`` (traced ints) region (letterbox).
    canvas_hw: static output canvas (must cover the max original size).
    orig_hw: traced (2,) original image size; output content fills the
      top-left orig_hw region of the canvas, rest is 0.
    """
    ch, cw = canvas_hw
    h, w = mask.shape
    oh = orig_hw[0].astype(jnp.float32)
    ow = orig_hw[1].astype(jnp.float32)
    vh = valid_hw[0].astype(jnp.float32)
    vw = valid_hw[1].astype(jnp.float32)

    # Output row r in [0, oh) maps to source row r * vh/oh (half-pixel).
    # Sample taps clamp to the VALID letterbox region (vh/vw), not the full
    # mask grid: clamping to h-1/w-1 let the bottom/right border rows blend
    # in the model's garbage predictions from the letterbox padding area
    # (measured: 0.625 instead of 0.5 on a constant-content mask).
    ry = jnp.arange(ch, dtype=jnp.float32)
    rx = jnp.arange(cw, dtype=jnp.float32)
    sy = jnp.clip((ry + 0.5) * (vh / jnp.maximum(oh, 1.0)) - 0.5,
                  0.0, jnp.maximum(vh - 1.0, 0.0))
    sx = jnp.clip((rx + 0.5) * (vw / jnp.maximum(ow, 1.0)) - 0.5,
                  0.0, jnp.maximum(vw - 1.0, 0.0))
    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, valid_hw[0].astype(jnp.int32) - 1)
    x1 = jnp.minimum(x0 + 1, valid_hw[1].astype(jnp.int32) - 1)
    y1 = jnp.clip(y1, 0, h - 1)
    x1 = jnp.clip(x1, 0, w - 1)
    fy = (sy - y0)[:, None]
    fx = (sx - x0)[None, :]

    m = mask.astype(jnp.float32)
    top = m[y0][:, x0] * (1 - fx) + m[y0][:, x1] * fx
    bot = m[y1][:, x0] * (1 - fx) + m[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy

    row_valid = ry < oh
    col_valid = rx < ow
    return out * row_valid[:, None] * col_valid[None, :]


@functools.partial(jax.jit, static_argnames=("canvas_hw",))
def paste_masks(
    masks: jnp.ndarray,
    valid_hw: jnp.ndarray,
    canvas_hw: tuple[int, int],
    orig_hw: jnp.ndarray,
) -> jnp.ndarray:
    """vmapped paste over instance slots: (K, h, w) -> (K, ch, cw)."""
    return jax.vmap(lambda m: paste_mask(m, valid_hw, canvas_hw, orig_hw))(masks)


@functools.partial(jax.jit, static_argnames=("canvas_hw",))
def paste_masks_batch(
    masks: jnp.ndarray,
    valid_hw: jnp.ndarray,
    canvas_hw: tuple[int, int],
    orig_hw: jnp.ndarray,
) -> jnp.ndarray:
    """Batched paste: masks (N, K, h, w), valid_hw/orig_hw (N, 2)."""
    return jax.vmap(
        lambda m, v, o: paste_masks(m, v, canvas_hw, o)
    )(masks, valid_hw, orig_hw)

"""Exact-semantics bilinear resize as separable matmuls (MXU-friendly).

SURVEY.md §7 "hard parts" #1: PIL vs torch ``align_corners`` vs
``jax.image.resize`` all differ, and the ≤1e-3 per-pixel parity target dies
here first. We therefore implement resize ourselves with explicit control of
the coordinate convention, as two dense 1-D interpolation matmuls:

    out[n, i, j, c] = sum_{h, w} Wh[i, h] * x[n, h, w, c] * Ww[j, w]

Bilinear interpolation is separable, each row of W has at most two non-zeros,
and on TPU a dense (out, in) x (in, ...) matmul rides the MXU — far faster
than gather-based resize and bit-reproducible across backends.

Conventions supported:
  * ``align_corners=False`` (torch ``F.interpolate(mode='bilinear')`` default,
    half-pixel centers):  src = (dst + 0.5) * in/out - 0.5, clamped.
  * ``align_corners=True`` (torch align_corners=True):
    src = dst * (in-1)/(out-1).

The interpolation matrices are built with NumPy at trace time (static shapes)
and closed over as constants, so XLA folds them into the compiled graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) row-stochastic linear-interpolation matrix."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    if align_corners:
        # out_size == 1: torch samples index 0 (NOT the input center, which
        # the half-pixel fallback would give — verified vs F.interpolate).
        src = (np.zeros(1, dtype=np.float64) if out_size == 1 else
               np.arange(out_size, dtype=np.float64) * (in_size - 1)
               / (out_size - 1))
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float64)
    w = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    np.add.at(w, (rows, lo), 1.0 - frac)
    np.add.at(w, (rows, hi), frac)
    return w.astype(np.float32)


def resize_bilinear(
    x: jnp.ndarray,
    out_hw: tuple[int, int],
    align_corners: bool = False,
) -> jnp.ndarray:
    """Bilinear-resize NHWC (or HWC / HW) ``x`` to spatial size ``out_hw``.

    Matches torch ``F.interpolate(mode='bilinear', align_corners=...)``
    semantics (verified by golden tests vs the torch CPU oracle).
    """
    squeeze = []
    if x.ndim == 2:
        x = x[None, :, :, None]
        squeeze = [0, -1]
    elif x.ndim == 3:
        x = x[None]
        squeeze = [0]
    elif x.ndim != 4:
        raise ValueError(f"expected 2-4D input, got shape {x.shape}")

    n, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):  # identity: skip two full matmuls
        return x if not squeeze else (
            x[0, :, :, 0] if squeeze == [0, -1] else x[0]
        )
    if _use_pallas_upsample(x, oh, ow, align_corners):
        from basi_tpu.ops.pallas.upsample_int import upsample_int

        y = upsample_int(x, oh // h)
    else:
        y = _resize_einsum(x, (oh, ow), align_corners)

    if squeeze == [0, -1]:
        y = y[0, :, :, 0]
    elif squeeze == [0]:
        y = y[0]
    return y


# Tri-state override for the Pallas integer-factor upsample fast path:
# None = auto (TPU backend only), True/False force it (debug/bisection).
pallas_upsample: bool | None = None


def _use_pallas_upsample(x, oh: int, ow: int, align_corners: bool) -> bool:
    """bf16 NHWC integer-factor (2/4/8) upsamples ride the Pallas kernel
    (ops.pallas.upsample_int): one VMEM pass at HBM bandwidth vs the
    einsum path's 65-290 GB/s + layout copies (xplane, v5e r3)."""
    if align_corners or x.dtype != jnp.bfloat16 or x.ndim != 4:
        return False
    _, h, w, c = x.shape
    if h == 0 or w == 0 or oh % h or ow % w:
        return False
    f = oh // h
    if f != ow // w or f not in (2, 4, 8) or c % 8:
        return False
    if pallas_upsample is not None:
        return pallas_upsample
    return jax.default_backend() == "tpu"


def _resize_einsum(x, out_hw, align_corners):
    """Separable-matmul resize (the general path; exact semantics)."""
    n, h, w, c = x.shape
    oh, ow = out_hw
    dtype = x.dtype
    # Precision policy follows the input dtype:
    #  * f32 inputs (parity/eval paths): HIGHEST — the TPU default bf16
    #    matmul pass costs ~4e-3 per-pixel vs torch, over the 1e-3 budget.
    #  * bf16 inputs (production perf mode): single-pass bf16 MXU — the
    #    caller already accepted bf16 noise; HIGHEST here would 6x the cost
    #    of every FPN/head resize.
    if dtype == jnp.bfloat16:
        prec = jax.lax.Precision.DEFAULT
        wdtype = jnp.bfloat16
    else:
        prec = jax.lax.Precision.HIGHEST
        wdtype = jnp.float32
    wh = jnp.asarray(_interp_matrix(h, oh, align_corners), dtype=wdtype)
    ww = jnp.asarray(_interp_matrix(w, ow, align_corners), dtype=wdtype)

    xf = x if dtype == jnp.bfloat16 else x.astype(jnp.float32)
    # NOTE: an all-bf16 intermediate (preferred_element_type=bf16) was
    # measured SLOWER on v5e (780 vs 871 imgs/s end to end) — f32 MXU
    # accumulation is free and XLA fuses the final cast; keep f32 here.
    # (oh, h) x (n, h, w, c) -> (n, oh, w, c); contract along H.
    y = jnp.einsum("oh,nhwc->nowc", wh, xf, precision=prec,
                   preferred_element_type=jnp.float32)
    # (ow, w) x (n, oh, w, c) -> (n, oh, ow, c); contract along W.
    y = jnp.einsum("pw,nowc->nopc", ww, y, precision=prec,
                   preferred_element_type=jnp.float32)
    return y.astype(dtype)


def upsample2x(x: jnp.ndarray, align_corners: bool = False) -> jnp.ndarray:
    """2x bilinear upsample of NHWC ``x`` (FPN top-down path)."""
    _, h, w, _ = x.shape
    return resize_bilinear(x, (2 * h, 2 * w), align_corners=align_corners)


def maxpool_hw(x, fh: int, fw: int):
    """Exact integer-factor maxpool over the trailing (H, W) dims.

    Single source of truth for GT-mask downsampling: the train step's /4
    ingest downsample, targets._assignment_core, and the loss's saliency
    union MUST agree exactly for the sparse/dense loss equivalence and the
    "downsample-then-flip commutes" claims to hold (review r2)."""
    import jax.numpy as jnp

    *lead, h, w = x.shape
    return jnp.max(x.reshape(*lead, h // fh, fh, w // fw, fw), axis=(-3, -1))

"""Fused bilinear-upsample + sigmoid Pallas kernel (mask output path).

The reference ends its mask head with bilinear upsample + sigmoid (SURVEY
§2.9); done naively that is two HBM round-trips over the LARGEST tensors in
the whole pipeline (full-resolution masks). This kernel exploits that
bilinear resize is separable — ``out = sigmoid(Wh @ x @ Ww)`` — so the
upsample becomes two MXU matmuls per mask with the sigmoid fused on the
final write, and the /4-resolution logits are read from HBM exactly once.

Weight matrices use the same half-pixel (align_corners=False) convention as
basi_tpu.ops.resize, so the kernel is bit-consistent with the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from basi_tpu.ops.resize import _interp_matrix


def _kernel(x_ref, wh_ref, ww_ref, out_ref):
    # x: (1, h, w) logits; wh: (H, h); ww: (w, W); out: (1, H, W)
    x = x_ref[0].astype(jnp.float32)
    # HIGHEST precision: the default bf16 MXU pass costs ~2.4e-3 on the
    # sigmoid output (measured on v5e), over the 1e-3 parity budget.
    prec = jax.lax.Precision.HIGHEST
    y = jnp.dot(wh_ref[:], x, precision=prec,
                preferred_element_type=jnp.float32)  # (H, w)
    y = jnp.dot(y, ww_ref[:], precision=prec,
                preferred_element_type=jnp.float32)  # (H, W)
    out_ref[0] = jax.nn.sigmoid(y).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_hw", "align_corners", "interpret", "out_dtype")
)
def upsample_sigmoid(
    mask_logits: jnp.ndarray,
    out_hw: tuple[int, int],
    align_corners: bool = False,
    interpret: bool = False,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """sigmoid(bilinear_resize(mask_logits, out_hw)) fused in one kernel.

    mask_logits: (..., h, w) — any leading dims (batch, instance slots) are
    flattened into the kernel grid. Returns (..., *out_hw) probabilities.
    """
    lead = mask_logits.shape[:-2]
    h, w = mask_logits.shape[-2:]
    oh, ow = out_hw
    if (h, w) == (oh, ow):  # identity resize: skip two dense MXU matmuls
        return jax.nn.sigmoid(
            mask_logits.astype(jnp.float32)).astype(out_dtype)
    x = mask_logits.reshape((-1, h, w))
    b = x.shape[0]

    wh = jnp.asarray(_interp_matrix(h, oh, align_corners))  # (oh, h)
    ww = jnp.asarray(_interp_matrix(w, ow, align_corners)).T  # (w, ow)

    out = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((oh, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, ow), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, oh, ow), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (oh * h * w + oh * w * ow),
            bytes_accessed=4 * b * (h * w + oh * ow) + 4 * (oh * h + w * ow),
            transcendentals=b * oh * ow,
        ),
        interpret=interpret,
    )(x, wh, ww)
    return out.reshape(*lead, oh, ow)


def upsample_sigmoid_reference(
    mask_logits: jnp.ndarray,
    out_hw: tuple[int, int],
    align_corners: bool = False,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Unfused XLA reference implementation (for tests / non-TPU backends).

    Mirrors the kernel's numerics exactly: f32 interpolation at HIGHEST
    precision and an ``out_dtype`` (default f32) output — a bf16 input must
    NOT select resize_bilinear's bf16 DEFAULT-precision path (~2.4e-3
    error, over the 1e-3 parity budget) or eval output would depend on
    which backend ran it."""
    from basi_tpu.ops.resize import resize_bilinear

    lead = mask_logits.shape[:-2]
    h, w = mask_logits.shape[-2:]
    x = mask_logits.reshape((-1, h, w, 1)).astype(jnp.float32)
    y = resize_bilinear(x, out_hw, align_corners=align_corners)
    return jax.nn.sigmoid(y[..., 0]).reshape(*lead, *out_hw).astype(out_dtype)

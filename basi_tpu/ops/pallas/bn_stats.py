"""Pallas per-channel reduction kernels for fused BatchNorm (round 5).

The round-4 per-op roofline of the BN-training step (docs/DESIGN.md) shows
~4.5 ms of BN-stat reduce fusions running at 20-40% of HBM roofline:
XLA's layout assignment welds the (N, H, W)->C reduces to layout
transposes between the conv-preferred activation layout ({3,0,2,1}, i.e.
(h, w, n, c) physically) and the default {3,2,1,0}. These kernels read the
activations through the SAME hwnc relabel trick as ops/pallas/
upsample_int.py: a logical transpose to (h, w, n, c) whose row-major
default layout physically MATCHES the conv layout, so the custom call's
forced-default-layout boundary becomes a relabel instead of a copy, and
the reduce itself is a straight streaming pass at HBM bandwidth.

Two kernels, both emitting f32 (1, C) rows:

* ``channel_moments(x)``      -> (sum_x, sum_x2): BN forward batch stats.
* ``channel_dual_sums(g, x)`` -> (sum_g, sum_gx): the two reduces of the
  hand-written BN backward (models/norm.py), one streaming pass over
  (g, x) instead of XLA's separate autodiff reduce fusions.

Grid steps on TPU run sequentially, so partial sums accumulate into the
same output block across steps (init at step 0). Shapes that do not block
cleanly (rows not divisible by a >=8 block) fall back to the jnp
reference — identical math, f32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_rows_block(rows: int, c: int, itemsize: int, n_inputs: int,
                     budget: int = 4 * 1024 * 1024) -> int | None:
    """Largest row block dividing ``rows``, multiple of 8, within VMEM
    budget for ``n_inputs`` double-buffered input blocks. None = no clean
    blocking (caller falls back to the jnp reference)."""
    unit = max(c, 128) * itemsize * n_inputs
    cap = max(8, budget // max(unit, 1))
    for rb in range(min(rows, cap) - min(rows, cap) % 8, 7, -8):
        if rows % rb == 0:
            return rb
    return None


def _flatten_hwnc(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (H*W*N, C): a free relabel when the producer conv
    laid ``x`` out {3,0,2,1} (physical h, w, n, c)."""
    n, h, w, c = x.shape
    return jnp.transpose(x, (1, 2, 0, 3)).reshape(h * w * n, c)


def channel_moments_reference(x: jnp.ndarray):
    """(sum, sumsq) over (N, H, W) per channel, f32 accumulation."""
    xf = x.astype(jnp.float32)
    return jnp.sum(xf, axis=(0, 1, 2)), jnp.sum(xf * xf, axis=(0, 1, 2))


def channel_dual_sums_reference(g: jnp.ndarray, x: jnp.ndarray):
    """(sum g, sum g*x) over (N, H, W) per channel, f32 accumulation."""
    gf = g.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    return jnp.sum(gf, axis=(0, 1, 2)), jnp.sum(gf * xf, axis=(0, 1, 2))


@functools.partial(jax.jit, static_argnums=(1,))
def channel_moments(x: jnp.ndarray, interpret: bool = False):
    """Per-channel (sum, sum of squares) of an NHWC tensor, f32."""
    n, h, w, c = x.shape
    rows = h * w * n
    rb = _pick_rows_block(rows, c, x.dtype.itemsize, n_inputs=1)
    if rb is None:
        return channel_moments_reference(x)
    xt = _flatten_hwnc(x)

    def kernel(x_ref, s1_ref, s2_ref):
        i = pl.program_id(0)
        xs = x_ref[...].astype(jnp.float32)
        p1 = jnp.sum(xs, axis=0, keepdims=True)
        p2 = jnp.sum(xs * xs, axis=0, keepdims=True)

        @pl.when(i == 0)
        def _():
            s1_ref[...] = p1
            s2_ref[...] = p2

        @pl.when(i > 0)
        def _():
            s1_ref[...] += p1
            s2_ref[...] += p2

    s1, s2 = pl.pallas_call(
        kernel,
        grid=(rows // rb,),
        in_specs=[pl.BlockSpec((rb, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)],
        interpret=interpret,
    )(xt)
    return s1[0], s2[0]


@functools.partial(jax.jit, static_argnums=(2,))
def channel_dual_sums(g: jnp.ndarray, x: jnp.ndarray,
                      interpret: bool = False):
    """Per-channel (sum g, sum g*x) of two NHWC tensors, f32 — the BN
    backward's two reduces in one streaming pass."""
    n, h, w, c = x.shape
    rows = h * w * n
    rb = _pick_rows_block(rows, c, max(g.dtype.itemsize, x.dtype.itemsize),
                          n_inputs=2)
    if rb is None or g.shape != x.shape:
        return channel_dual_sums_reference(g, x)
    gt = _flatten_hwnc(g)
    xt = _flatten_hwnc(x)

    def kernel(g_ref, x_ref, s1_ref, s2_ref):
        i = pl.program_id(0)
        gs = g_ref[...].astype(jnp.float32)
        xs = x_ref[...].astype(jnp.float32)
        p1 = jnp.sum(gs, axis=0, keepdims=True)
        p2 = jnp.sum(gs * xs, axis=0, keepdims=True)

        @pl.when(i == 0)
        def _():
            s1_ref[...] = p1
            s2_ref[...] = p2

        @pl.when(i > 0)
        def _():
            s1_ref[...] += p1
            s2_ref[...] += p2

    s1, s2 = pl.pallas_call(
        kernel,
        grid=(rows // rb,),
        in_specs=[pl.BlockSpec((rb, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rb, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)],
        interpret=interpret,
    )(gt, xt)
    return s1[0], s2[0]

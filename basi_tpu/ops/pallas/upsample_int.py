"""Pallas integer-factor bilinear upsample (half-pixel convention, bf16).

The FPN top-down path and the saliency/mask-feature heads upsample NHWC
features by exact integer factors (2x/4x/8x) dozens of times per forward.
The separable-matmul resize (ops.resize) is semantically exact but runs at
65-290 GB/s on v5e: XLA lays the two einsums out as generic matmuls and
surrounds them with layout copies (xplane r3: copy.476/477/488 plus the
resize fusions ~= 1 ms of a 6.2 ms batch-8 inference program). An integer-
factor upsample is pure bandwidth — every output pixel is a 2-tap weighted
sum of neighbouring input pixels with one of ``f`` static weight pairs — so
this kernel does the whole resize in ONE pass: read the image into VMEM,
run the column pass as one batched MXU matmul against a banded
interpolation matrix, the row pass as per-phase static slices + FMAs, and
write the upsampled block.

Indexing (per axis, factor ``f``, half-pixel ``align_corners=False``):
  src(o)  = (o + 0.5)/f - 0.5          lo(o) = floor(src) = (o + h)//f - 1
  frac(o) = src - lo  (phase-periodic) with h = f//2, f even.
Edge clamping is folded into a 1-pixel ``mode='edge'`` pad OUTSIDE the
kernel: out-of-range taps then read the replicated border pixel, and since
w_lo + w_hi = 1 the clamped result is exact without any in-kernel selects.
With the pad, each of the ``f`` output phases is two STATIC slices of the
input window weighted by Python-float constants, and the phases interleave
with one stack+reshape (no rolls, no gathers, no repeated intermediate).

Backward: the exact adjoint is the transposed interpolation matrices, which
contract the LARGE dimension — MXU-friendly — so the custom_vjp backward
uses the einsum path with W^T (ops.resize builds the identical matrices;
gradient parity vs the einsum forward is tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FACTORS = (2, 4, 8)


def _row_block(fh: int, fw: int, c: int, f: int,
               budget_bytes: int = 1024 * 1024) -> int:
    """Largest output-row block: multiple of f, divides fh, ~budget VMEM."""
    c_eff = max(c, 128)  # lane dim pads to 128
    cap = max(f, budget_bytes // max(1, fw * c_eff * 2))
    for rb in range(min(fh, cap), f - 1, -1):
        if rb % f == 0 and fh % rb == 0:
            return rb
    return f


# Kernel data layout: "nhwc" blocks per image in row-major NHWC; "hwnc"
# transposes to (h, w, n, c) first, whose DEFAULT layout physically matches
# the {3,0,2,1} activation layout XLA picks for batched convs — making the
# custom call's boundary layout conversions free relabelings instead of
# real copies (xplane r3: the nhwc kernel's savings were eaten by exactly
# those copies).
layout_mode: str = "hwnc"


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def upsample_int(x: jnp.ndarray, f: int, interpret: bool = False) -> jnp.ndarray:
    """Bilinear-upsample NHWC ``x`` by integer factor ``f`` (2/4/8), bf16.

    Semantics match ``ops.resize.resize_bilinear(x, (f*h, f*w))`` for bf16
    inputs (half-pixel centers) to bf16 rounding of the between-axis
    intermediate; weights are identical.
    """
    return _dispatch(x, f, interpret)


def _dispatch(x, f, interpret):
    n, hh, ww, c = x.shape
    # The hwnc variant holds the WHOLE padded batch as one VMEM block
    # (that is what makes its boundary transposes free); cap it so large
    # train batches fall back to the per-image nhwc blocking instead of
    # exhausting the 128 MB VMEM with double-buffered input blocks.
    in_block = (hh + 2) * (ww + 2) * n * c * x.dtype.itemsize
    # Scoped-stack floor at the minimum row block (rows_in=1): the f32
    # column intermediate + phase/stack buffers must fit under the 16 MB
    # scoped-vmem limit even before blocking can shrink them further.
    scoped_floor = f * ww * n * max(c, 128) * 4 * (3 + 2 * f)
    # n <= 8: the batch-16 inference program OOMs vmem on a (64,64,2048)
    # hwnc call whose IDENTICAL kernel shape compiles fine inside the
    # batch-8 program ((8,64,64,256) vs (16,64,64,128)) — the failure is
    # program-level VMEM pressure around the custom call, not kernel
    # arithmetic, so shape-local budgets cannot gate it. Larger batches
    # take the per-image-grid nhwc kernel.
    if (layout_mode == "hwnc" and n <= 8
            and in_block <= 24 * 1024 * 1024
            and scoped_floor <= 14 * 1024 * 1024):
        return _upsample_int_impl_hwnc(x, f, interpret)
    return _upsample_int_impl(x, f, interpret)


def _col_matrix(f: int, fw: int, ww2: int, dtype):
    """Banded (fw, ww2) column-interpolation matrix from iota compares
    (built INSIDE kernels — they cannot close over traced arrays)."""
    h = f // 2
    lg = f.bit_length() - 1
    p = jax.lax.broadcasted_iota(jnp.int32, (fw, ww2), 0)
    w = jax.lax.broadcasted_iota(jnp.int32, (fw, ww2), 1)
    a = jnp.bitwise_and(p, f - 1)
    lo = jax.lax.shift_right_logical(p + h, lg)  # lo tap (padded coords)
    fr = ((a.astype(jnp.float32) + 0.5) * (1.0 / f) + 0.5
          - jax.lax.shift_right_logical(a + h, lg).astype(jnp.float32))
    return (jnp.where(w == lo, 1.0 - fr, 0.0)
            + jnp.where(w == lo + 1, fr, 0.0)).astype(dtype)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _upsample_int_impl(x, f, interpret):
    if f not in _FACTORS:
        raise ValueError(f"factor must be one of {_FACTORS}, got {f}")
    n, hh, ww, c = x.shape
    fh, fw = f * hh, f * ww
    h = f // 2

    # 1-pixel replicate pad: folds all edge clamping into the input (see
    # module docstring); costs one cheap XLA pad over the SMALL input.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")

    rb = _row_block(fh, fw, c, f)  # output rows per grid step
    s_rows = rb // f + 2        # input rows needed (1 halo each side)

    # Per-phase static taps and scalar weights: output index o = m*f + a has
    # lo(o) = (o + h)//f - 1 and frac depending only on the phase a, so each
    # phase is two STATIC slices weighted by Python-float constants, and the
    # f phase results interleave via stack+reshape. No f-times-larger
    # repeated intermediate ever exists (the first version materialized an
    # f32 (rb, f*(W+2), C) repeat and blew the 16 MB VMEM stack at rb=32).
    def _frac(a: int) -> float:
        return (a + 0.5) / f + 0.5 - (a + h) // f

    def _off(a: int) -> int:  # lo-tap offset into the 1-padded window
        return (a + h) // f

    def kernel(xp_ref, out_ref):
        j = pl.program_id(1)
        rows_in = rb // f
        xs = xp_ref[0, pl.ds(j * rows_in, s_rows), :, :]  # (S, W+2, C) bf16
        # Column pass as one batched MXU matmul with the banded (fw, W+2)
        # interpolation matrix. dot_general with the matrix as LHS yields
        # (S, fw, C) DIRECTLY — a VPU stack+reshape interleave here was
        # 2-4x slower than the einsum path (sublane shuffles); the MXU
        # does it for free (~2 GFLOP/batch).
        mc = _col_matrix(f, fw, ww + 2, xs.dtype)
        mcb = jnp.broadcast_to(mc[None], (s_rows, fw, ww + 2))
        ycol = jax.lax.dot_general(
            mcb, xs, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (S, fw, C) f32
        # Row pass: per-phase static row slices; the interleave stacks on a
        # new OUTER axis (tile bookkeeping, no sublane movement).
        phases = []
        for a_i in range(f):
            o, frr = _off(a_i), _frac(a_i)
            phases.append((1.0 - frr) * ycol[o:o + rows_in]
                          + frr * ycol[o + 1:o + 1 + rows_in])
        y = jnp.stack(phases, axis=1).reshape(rb, fw, c)
        out_ref[0] = y.astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(n, fh // rb),
        in_specs=[
            pl.BlockSpec((1, hh + 2, ww + 2, c), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, fw, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, fh, fw, c), x.dtype),
        interpret=interpret,
    )(xp)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _upsample_int_impl_hwnc(x, f, interpret):
    """(h, w, n, c)-major kernel variant (see ``layout_mode``).

    The transposes below are physical no-ops in the surrounding program:
    (n,h,w,c) in XLA's conv-preferred {3,0,2,1} layout IS (h,w,n,c) in
    default row-major, so layout assignment folds them into relabelings.
    The whole batch rides in one block; the grid walks output-row groups.
    """
    if f not in _FACTORS:
        raise ValueError(f"factor must be one of {_FACTORS}, got {f}")
    n, hh, ww, c = x.shape
    fh, fw = f * hh, f * ww
    h = f // 2

    # (h, w, n*c): the n/c flatten is a free row-major reshape, and it keeps
    # the in-kernel dot_general a plain batched matmul with ONE rhs free
    # dim — two free minor dims made Mosaic flatten internally, which dies
    # with "unsupported shape cast" when c < 128 (the c=64 saliency tower).
    xt = jnp.transpose(x, (1, 2, 0, 3)).reshape(hh, ww, n * c)
    xp = jnp.pad(xt, ((1, 1), (1, 1), (0, 0)), mode="edge")

    # Output-row block sized against the kernel's f32 scoped-VMEM stack:
    # column-pass intermediate (rows_in+2 rows) + f phase buffers + the
    # stacked result (2*f*rows_in rows), all of (fw, n, c) f32 rows.
    budget = 10 * 1024 * 1024
    unit = fw * n * max(c, 128) * 4  # one (fw, n, c) f32 row
    cap_rows_in = max(1, (budget // max(1, unit) - 2) // (1 + 2 * f))
    rb = f
    for cand in range(min(fh, cap_rows_in * f), f - 1, -1):
        if cand % f == 0 and fh % cand == 0:
            rb = cand
            break
    rows_in = rb // f
    s_rows = rows_in + 2

    def _frac(a: int) -> float:
        return (a + 0.5) / f + 0.5 - (a + h) // f

    def _off(a: int) -> int:
        return (a + h) // f

    def kernel(xp_ref, out_ref):
        j = pl.program_id(0)
        xs = xp_ref[pl.ds(j * rows_in, s_rows), :, :]  # (S, W+2, n*c)
        mc = _col_matrix(f, fw, ww + 2, xs.dtype)
        mcb = jnp.broadcast_to(mc[None], (s_rows, fw, ww + 2))
        ycol = jax.lax.dot_general(
            mcb, xs, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (S, fw, n*c)
        phases = []
        for a_i in range(f):
            o, frr = _off(a_i), _frac(a_i)
            phases.append((1.0 - frr) * ycol[o:o + rows_in]
                          + frr * ycol[o + 1:o + 1 + rows_in])
        y = jnp.stack(phases, axis=1).reshape(rb, fw, n * c)
        out_ref[...] = y.astype(out_ref.dtype)

    yt = pl.pallas_call(
        kernel,
        grid=(fh // rb,),
        in_specs=[
            pl.BlockSpec((hh + 2, ww + 2, n * c), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, fw, n * c), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((fh, fw, n * c), x.dtype),
        interpret=interpret,
    )(xp)
    return jnp.transpose(yt.reshape(fh, fw, n, c), (2, 0, 1, 3))


def upsample_int_reference(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """Separable-einsum reference (the pre-kernel production path)."""
    from basi_tpu.ops import resize as _resize

    _, hh, ww, _ = x.shape
    return _resize._resize_einsum(x, (f * hh, f * ww), False)


def _fwd(x, f, interpret):
    return _dispatch(x, f, interpret), None


def _bwd(f, interpret, _res, g):
    # Exact adjoint: transposed interpolation matrices. Contracts the LARGE
    # (upsampled) dims — MXU-friendly — so the einsum path is the right
    # tool here; bf16 operands with f32 accumulation mirror the forward.
    from basi_tpu.ops import resize as _resize

    n, fh, fw, c = g.shape
    hh, ww = fh // f, fw // f
    wh = jnp.asarray(_resize._interp_matrix(hh, fh, False), g.dtype)
    wc = jnp.asarray(_resize._interp_matrix(ww, fw, False), g.dtype)
    gx = jnp.einsum("oh,nopc->nhpc", wh, g,
                    preferred_element_type=jnp.float32)
    gx = jnp.einsum("pw,nhpc->nhwc", wc, gx,
                    preferred_element_type=jnp.float32)
    return (gx.astype(g.dtype),)


upsample_int.defvjp(_fwd, _bwd)

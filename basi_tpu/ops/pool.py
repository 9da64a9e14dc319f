"""Max-pool with a select-and-scatter-free backward. OPT-IN ONLY — slower
embedded on v5e; see the measurement below before routing it anywhere.

``jax.grad`` of ``lax.reduce_window``-max lowers to XLA SelectAndScatter,
which TPU executes as a serialized window scan — the single stem 3x3/s2
pool's backward was 1.05 ms of the 66 ms bf16 batch-16 train step (xplane,
round 3). The same gradient is computed here as ``kh*kw`` strided
slice-compares at OUTPUT resolution plus ``kh*kw`` interior-padded adds at
input resolution — pure elementwise/layout work intended for the XLA fuser.

**On-chip verdict (v5e, measured 2026-08-18, A/B embedded in the f32
batch-16 512² train program): 157.8 ms/step with this VJP vs 107.9 with
plain ``nn.max_pool`` — +50 ms, i.e. ~50x worse than the 1.05 ms scatter
it replaces.** The ``seen``-chained 9-way slice-compare/pad/add sequence
does not fuse: each interior-padded add materializes the full
(N, H+pad, W+pad, C) accumulator. The op was landed during a TPU outage
with interpret-mode/CPU verification only — exactness held, performance
did not. It stays available (and exactness-tested) for backends where
SelectAndScatter is pathological, but the model stems use
``nn.max_pool``.

Routing semantics match XLA SelectAndScatter exactly: the gradient of each
window goes to the FIRST element equal to the window max, in row-major
window order (GE-select keeps the earlier element on ties) — verified
against ``jax.grad`` of the reduce_window reference on engineered ties
(tests/test_pool.py; bitwise-equal routing and exact-arithmetic values;
when one pixel accumulates several overlapping windows' grads the SUM may
differ from XLA's in the last ulp — summation order).

The forward IS ``lax.reduce_window`` (same op ``nn.max_pool`` uses), so
outputs are bit-identical to flax; only the VJP rule changes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def max_pool(x: jnp.ndarray,
             window: tuple[int, int] = (3, 3),
             strides: tuple[int, int] = (2, 2),
             padding: tuple[tuple[int, int], tuple[int, int]] = ((1, 1), (1, 1))
             ) -> jnp.ndarray:
    """NHWC max pool, forward-identical to ``nn.max_pool``."""
    return _forward(x, window, strides, padding)


def _forward(x, window, strides, padding):
    return lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else
        jnp.iinfo(x.dtype).min,
        lax.max,
        (1, window[0], window[1], 1),
        (1, strides[0], strides[1], 1),
        ((0, 0), padding[0], padding[1], (0, 0)),
    )


def _fwd(x, window, strides, padding):
    y = _forward(x, window, strides, padding)
    return y, (x, y)


def _bwd(window, strides, padding, res, g):
    x, y = res
    kh, kw = window
    sh, sw = strides
    (ph0, ph1), (pw0, pw1) = padding
    n, h, w, c = x.shape
    ho, wo = y.shape[1], y.shape[2]

    neg = (jnp.array(-jnp.inf, x.dtype)
           if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.array(jnp.iinfo(x.dtype).min, x.dtype))
    # Pad so every (dy, dx) strided slice below is in-bounds; padded lanes
    # hold -inf and can never win the equality against the window max.
    hp_need = (ho - 1) * sh + kh
    wp_need = (wo - 1) * sw + kw
    xp = lax.pad(x, neg, ((0, 0, 0),
                          (ph0, max(0, hp_need - h - ph0), 0),
                          (pw0, max(0, wp_need - w - pw0), 0),
                          (0, 0, 0)))
    hp, wp = xp.shape[1], xp.shape[2]

    acc = jnp.zeros((n, hp, wp, c), g.dtype)
    seen = jnp.zeros(y.shape, bool)
    for dy in range(kh):          # row-major window order = XLA's GE-select
        for dx in range(kw):      # tie routing (first max wins)
            sl = lax.slice(
                xp, (0, dy, dx, 0),
                (n, dy + (ho - 1) * sh + 1, dx + (wo - 1) * sw + 1, c),
                (1, sh, sw, 1))
            eq = (sl == y) & ~seen
            seen = seen | eq
            gi = jnp.where(eq, g, jnp.zeros((), g.dtype))
            # Interior padding dilates back to the strided input grid; the
            # (kh*kw) pads + adds fuse into one output pass.
            acc = acc + lax.pad(
                gi, jnp.zeros((), g.dtype),
                ((0, 0, 0),
                 (dy, hp - dy - ((ho - 1) * sh + 1), sh - 1),
                 (dx, wp - dx - ((wo - 1) * sw + 1), sw - 1),
                 (0, 0, 0)))
    gx = lax.slice(acc, (0, ph0, pw0, 0), (n, ph0 + h, pw0 + w, c))
    return (gx,)


max_pool.defvjp(_fwd, _bwd)

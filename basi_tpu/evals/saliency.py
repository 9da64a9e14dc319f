"""Saliency-map metrics: MAE and F-measure (device-side).

The salient-object-detection literature the reference belongs to (BASNet,
ILSO papers) reports MAE and max/mean F-beta alongside instance AP; the
instance part is covered by evals.ap — these complete the eval surface for
the saliency branch. All reductions run on device; only scalars return.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-8


@jax.jit
def mae(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error between prob maps (N, H, W)."""
    return jnp.mean(jnp.abs(pred.astype(jnp.float32)
                            - target.astype(jnp.float32)))


@functools.partial(jax.jit, static_argnames=("num_thresholds",))
def f_measure(pred: jnp.ndarray, target: jnp.ndarray,
              beta2: float = 0.3, num_thresholds: int = 255):
    """(max-F, mean-F) over a threshold sweep, vectorized on device.

    pred/target: (N, H, W) in [0, 1]. The sweep is one broadcasted
    comparison — (T, N, H, W) reductions, no Python loop.
    """
    p = pred.astype(jnp.float32)
    t = (target.astype(jnp.float32) > 0.5).astype(jnp.float32)
    thr = (jnp.arange(num_thresholds, dtype=jnp.float32) + 0.5) / num_thresholds
    binp = (p[None] >= thr[:, None, None, None]).astype(jnp.float32)
    tp = jnp.sum(binp * t[None], axis=(-2, -1))  # (T, N)
    precision = tp / jnp.maximum(jnp.sum(binp, axis=(-2, -1)), _EPS)
    recall = tp / jnp.maximum(jnp.sum(t, axis=(-2, -1))[None], _EPS)
    f = ((1 + beta2) * precision * recall
         / jnp.maximum(beta2 * precision + recall, _EPS))
    f_per_thr = jnp.mean(f, axis=1)  # average over images
    return jnp.max(f_per_thr), jnp.mean(f_per_thr)

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


@functools.partial(jax.jit, static_argnames=("num_thresholds",))
def f_measure_hist(pred: jnp.ndarray, target: jnp.ndarray,
                   beta2: float = 0.3, num_thresholds: int = 64,
                   valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-image F-beta curve over thresholds k/T, k=1..T-1 — O(N*H*W) mem.

    The broadcasted sweep in :func:`f_measure` materializes (T, N, H, W);
    at full 512^2 eval resolution that is ~270 MB per batch. This version
    histograms each prediction into T bins (one scatter-add pass), then
    reverse-cumsums the per-bin counts: tp(k) = #(pred >= k/T & gt),
    pp(k) = #(pred >= k/T). Threshold 0 is EXCLUDED: its row (every pixel
    positive) gives a degenerate F equal to the GT prior, which would put
    a false floor under the reported max-F. Returns the (T-1, N) F matrix
    so a streaming evaluator can average per-image F over the dataset
    before taking the max (the SOD dataset-level max-F convention).

    ``valid``: optional (N, H, W) 0/1 mask restricting the metric to the
    letterbox content region (padding pixels otherwise count as trivially
    correct negatives, deflating the metric for non-square images).
    """
    t_count = num_thresholds
    n = pred.shape[0]
    p = pred.astype(jnp.float32).reshape(n, -1)
    t = (target.astype(jnp.float32) > 0.5).astype(jnp.float32)
    t = t.reshape(n, -1)
    w = (jnp.ones_like(p) if valid is None
         else valid.reshape(n, -1).astype(jnp.float32))
    t = t * w
    # bin b means p in [b/T, (b+1)/T); pred >= k/T <=> bin >= k
    bins = jnp.clip((p * t_count).astype(jnp.int32), 0, t_count - 1)

    def hists(b, tw, ww):
        all_h = jnp.zeros((t_count,), jnp.float32).at[b].add(ww)
        pos_h = jnp.zeros((t_count,), jnp.float32).at[b].add(tw)
        return all_h, pos_h

    all_h, pos_h = jax.vmap(hists)(bins, t, w)  # (N, T) each
    pp = jnp.cumsum(all_h[:, ::-1], axis=1)[:, ::-1]  # (N, T): #(bin >= k)
    tp = jnp.cumsum(pos_h[:, ::-1], axis=1)[:, ::-1]
    gt_area = jnp.sum(t, axis=1, keepdims=True)
    precision = tp / jnp.maximum(pp, _EPS)
    recall = tp / jnp.maximum(gt_area, _EPS)
    f = ((1 + beta2) * precision * recall
         / jnp.maximum(beta2 * precision + recall, _EPS))
    return f[:, 1:].T  # (T-1, N): thresholds k/T, k=1..T-1

"""Losses: BCE, Dice, focal, SSIM, soft-IoU (SURVEY.md §2.10).

The reference trains with BCE + Dice (BASELINE north star); the BASNet-hybrid
(BCE + SSIM + IoU) is provided as a config option since "BASI" is
BASNet-flavoured and SURVEY §0 item 3 flags the composition as unverified.

Every loss accepts an optional ``axis_name``: under ``shard_map`` data
parallelism, numerators and denominators are ``psum``-ed across the axis
BEFORE dividing, so the per-shard value (and its gradient contribution) is
the exact global-batch loss — the 8-device step bit-matches the 1-device
step instead of approximating it with mean-of-ratios. All losses upcast to
f32 internally and are safe under bf16 inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_EPS = 1e-6


def _psum_value_local_grad(num: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """psum for the VALUE, local term for the GRADIENT.

    Never differentiate through ``lax.psum``: under ``shard_map`` with
    check_vma=False its transpose is another psum, so the (replicated)
    loss cotangent reaching each shard's numerator is multiplied by the
    axis size — measured as an EXACT Nx gradient overcount on the N-device
    mesh (uniform across every loss term, so saturated grad-clipping in
    the early parity tests normalized it away; unclipped DP training had
    an effective lr scaled by N vs the single-device run). Routing the
    gradient through the local numerator and adding the cross-shard
    remainder under stop_gradient keeps the exact global VALUE while each
    shard's gradient is exactly its local CONTRIBUTION (what the train
    step's grads-psum assumes), independent of psum transpose semantics.
    """
    total = lax.psum(num, axis_name)
    return num + lax.stop_gradient(total - num)


def _ratio(num: jnp.ndarray, den: jnp.ndarray, axis_name: str | None) -> jnp.ndarray:
    """num/den, both sides globally summed over the data axis first
    (value = exact global-batch ratio; gradient = local contribution)."""
    if axis_name:
        num = _psum_value_local_grad(num, axis_name)
        den = lax.psum(den, axis_name)  # weights/counts: param-free
    return num / jnp.maximum(den, _EPS)


def _bce_elems(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    return (jnp.maximum(logits, 0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def sigmoid_bce(logits: jnp.ndarray, targets: jnp.ndarray,
                weights: jnp.ndarray | None = None,
                axis_name: str | None = None) -> jnp.ndarray:
    """Mean binary cross-entropy from logits (numerically stable)."""
    per = _bce_elems(logits, targets)
    if weights is None:
        return _ratio(jnp.sum(per), jnp.float32(per.size), axis_name)
    w = weights.astype(jnp.float32)
    return _ratio(jnp.sum(per * w), jnp.sum(w), axis_name)


def dice_loss(logits: jnp.ndarray, targets: jnp.ndarray,
              valid: jnp.ndarray | None = None,
              spatial_axes: tuple[int, ...] = (-2, -1),
              axis_name: str | None = None) -> jnp.ndarray:
    """Soft Dice loss per mask, averaged over valid masks.

    logits/targets: (..., H, W); valid: broadcastable (...,) 0/1 weights.
    """
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    inter = jnp.sum(p * t, axis=spatial_axes)
    denom = jnp.sum(p * p, axis=spatial_axes) + jnp.sum(t * t, axis=spatial_axes)
    dice = 1.0 - (2.0 * inter + _EPS) / (denom + _EPS)
    if valid is None:
        return _ratio(jnp.sum(dice), jnp.float32(dice.size), axis_name)
    v = valid.astype(jnp.float32)
    return _ratio(jnp.sum(dice * v), jnp.sum(v), axis_name)


def focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
               alpha: float = 0.25, gamma: float = 2.0,
               axis_name: str | None = None) -> jnp.ndarray:
    """Sigmoid focal loss, summed over cells / normalized by #positives."""
    logits = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    ce = _bce_elems(logits, t)
    p_t = p * t + (1.0 - p) * (1.0 - t)
    alpha_t = alpha * t + (1.0 - alpha) * (1.0 - t)
    loss = alpha_t * (1.0 - p_t) ** gamma * ce
    num = jnp.sum(loss)
    num_pos = jnp.sum(t)
    if axis_name:
        num = _psum_value_local_grad(num, axis_name)
        num_pos = lax.psum(num_pos, axis_name)  # targets: param-free
    return num / jnp.maximum(num_pos, 1.0)


def soft_iou_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                  axis_name: str | None = None) -> jnp.ndarray:
    """1 - soft IoU (BASNet hybrid component)."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    inter = jnp.sum(p * t, axis=(-2, -1))
    union = jnp.sum(p + t - p * t, axis=(-2, -1))
    per = 1.0 - (inter + _EPS) / (union + _EPS)
    return _ratio(jnp.sum(per), jnp.float32(per.size), axis_name)


def ssim_loss(logits: jnp.ndarray, targets: jnp.ndarray,
              window: int = 11, c1: float = 0.01 ** 2, c2: float = 0.03 ** 2,
              axis_name: str | None = None) -> jnp.ndarray:
    """1 - mean SSIM between sigmoid(logits) and targets (BASNet hybrid).

    Uses a uniform window (box filter) via reduce_window — identical
    structure to Gaussian-window SSIM up to the window choice, and far
    cheaper on the VPU.
    """
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    if p.ndim == 3:
        p, t = p[..., None], t[..., None]
    if p.ndim != 4:
        raise ValueError(f"ssim expects (N,H,W[,1]) got {p.shape}")

    def box(x):
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add,
            (1, window, window, 1), (1, 1, 1, 1), "SAME",
        ) / (window * window)

    mu_p, mu_t = box(p), box(t)
    var_p = box(p * p) - mu_p ** 2
    var_t = box(t * t) - mu_t ** 2
    cov = box(p * t) - mu_p * mu_t
    ssim = ((2 * mu_p * mu_t + c1) * (2 * cov + c2)) / (
        (mu_p ** 2 + mu_t ** 2 + c1) * (var_p + var_t + c2)
    )
    per = 1.0 - ssim
    return _ratio(jnp.sum(per), jnp.float32(per.size), axis_name)


def saliency_loss(logits: jnp.ndarray, target: jnp.ndarray,
                  kind: str = "bce_dice",
                  axis_name: str | None = None) -> jnp.ndarray:
    """Loss for one saliency map: (N, H, W, 1) logits vs (N, H, W) target."""
    lg = logits[..., 0]
    if kind == "bce_dice":
        return (sigmoid_bce(lg, target, axis_name=axis_name)
                + dice_loss(lg, target, axis_name=axis_name))
    if kind == "basnet_hybrid":
        return (sigmoid_bce(lg, target, axis_name=axis_name)
                + ssim_loss(lg, target, axis_name=axis_name)
                + soft_iou_loss(lg, target, axis_name=axis_name))
    raise ValueError(f"unknown loss kind {kind!r}")

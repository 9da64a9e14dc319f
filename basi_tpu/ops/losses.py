"""Losses: BCE, Dice, focal, SSIM, soft-IoU (SURVEY.md §2.10).

The reference trains with BCE + Dice (BASELINE north star); the BASNet-hybrid
(BCE + SSIM + IoU) is provided as a config option since "BASI" is
BASNet-flavoured and SURVEY §0 item 3 flags the composition as unverified.

All losses are pure jnp, reduce to scalars, and are safe under bf16 inputs
(they upcast to f32 internally).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6


def sigmoid_bce(logits: jnp.ndarray, targets: jnp.ndarray,
                weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean binary cross-entropy from logits (numerically stable)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    per = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if weights is None:
        return jnp.mean(per)
    w = weights.astype(jnp.float32)
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), _EPS)


def dice_loss(logits: jnp.ndarray, targets: jnp.ndarray,
              valid: jnp.ndarray | None = None,
              spatial_axes: tuple[int, ...] = (-2, -1)) -> jnp.ndarray:
    """Soft Dice loss per mask, averaged over valid masks.

    logits/targets: (..., H, W); valid: broadcastable (...,) 0/1 weights.
    """
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    inter = jnp.sum(p * t, axis=spatial_axes)
    denom = jnp.sum(p * p, axis=spatial_axes) + jnp.sum(t * t, axis=spatial_axes)
    dice = 1.0 - (2.0 * inter + _EPS) / (denom + _EPS)
    if valid is None:
        return jnp.mean(dice)
    v = valid.astype(jnp.float32)
    return jnp.sum(dice * v) / jnp.maximum(jnp.sum(v), _EPS)


def focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
               alpha: float = 0.25, gamma: float = 2.0) -> jnp.ndarray:
    """Sigmoid focal loss, summed over cells / normalized by #positives."""
    logits = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * t + (1.0 - p) * (1.0 - t)
    alpha_t = alpha * t + (1.0 - alpha) * (1.0 - t)
    loss = alpha_t * (1.0 - p_t) ** gamma * ce
    num_pos = jnp.maximum(jnp.sum(t), 1.0)
    return jnp.sum(loss) / num_pos


def soft_iou_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """1 - soft IoU (BASNet hybrid component)."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    inter = jnp.sum(p * t, axis=(-2, -1))
    union = jnp.sum(p + t - p * t, axis=(-2, -1))
    return jnp.mean(1.0 - (inter + _EPS) / (union + _EPS))


def ssim_loss(logits: jnp.ndarray, targets: jnp.ndarray,
              window: int = 11, c1: float = 0.01 ** 2, c2: float = 0.03 ** 2) -> jnp.ndarray:
    """1 - mean SSIM between sigmoid(logits) and targets (BASNet hybrid).

    Uses a uniform window (box filter) via depthwise avg-pooling — identical
    structure to the Gaussian-window SSIM up to the window choice, and far
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
    return 1.0 - jnp.mean(ssim)


def saliency_loss(logits: jnp.ndarray, target: jnp.ndarray, kind: str = "bce_dice") -> jnp.ndarray:
    """Loss for one saliency map: (N, H, W, 1) logits vs (N, H, W) target."""
    lg = logits[..., 0]
    if kind == "bce_dice":
        return sigmoid_bce(lg, target) + dice_loss(lg, target)
    if kind == "basnet_hybrid":
        return sigmoid_bce(lg, target) + ssim_loss(lg, target) + soft_iou_loss(lg, target)
    raise ValueError(f"unknown loss kind {kind!r}")

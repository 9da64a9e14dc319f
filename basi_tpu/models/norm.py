"""Fused BatchNorm with a hand-written backward (round 5, VERDICT r4 #2).

``nn.BatchNorm`` under autodiff leaves BOTH reduce directions to XLA: the
forward batch-stat reduces and the backward's d-scale/d-bias/d-x reduces.
The round-4 xplane trace shows those reduces welded to layout transposes
between conv-preferred layouts, running at 20-40% of HBM roofline (~4.5 ms
of the 67.8 ms BN-training step). ``FusedBatchNorm`` replaces both with
the streaming Pallas per-channel reductions in ops/pallas/bn_stats.py
(hwnc-relabeled reads — the boundary layout conversions become
relabelings) and a closed-form elementwise apply/backward that XLA fuses
into the surrounding conv epilogues:

forward:   mu = Sx/M, var = Sx2/M - mu^2 (one pass), inv = rsqrt(var+eps)
           y  = x*a + b with a = scale*inv, b = bias - mu*a  (elementwise)
backward:  (Sg, Sgx) in one pass;  m_g = Sg/M,  m_gxn = (Sgx - mu*Sg)*inv/M
           dx     = scale*inv*(g - m_g - (x - mu)*inv*m_gxn)  (elementwise)
           dscale = (Sgx - mu*Sg)*inv,  dbias = Sg            (local; the
           DP step's gradient psum completes the cross-replica sums, same
           as nn.BatchNorm's autodiff grads)

Sync-BN: with ``axis_name`` the (C,)-sized stats are ``lax.pmean``-ed
(pmean's transpose is exact for replicated cotangents — see the round-3
psum-transpose postmortem in docs/DESIGN.md; here the backward is
hand-written anyway and uses pmean only in the forward-value sense).

Variable layout, init values and eval-mode math replicate ``nn.BatchNorm``
(params ``scale``/``bias``, batch_stats ``mean``/``var`` in f32, momentum
running update), so checkpoints, the torch importer and ``freeze_bn`` are
implementation-agnostic; ``model.bn_impl`` switches per config. Landed
OPT-IN per the round-3 kernel-landing rule: measure EMBEDDED on hardware
before defaulting.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from basi_tpu.ops.pallas.bn_stats import (
    channel_dual_sums,
    channel_dual_sums_reference,
    channel_moments,
    channel_moments_reference,
)


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bn_train_apply(x, scale, bias, axis_name, eps):
    """Train-mode BN normalize: returns (y, mean, var) with batch stats
    over (N, H, W) [pmean-ed over ``axis_name`` if set]. y is in x.dtype;
    mean/var are f32 (for the running-stat update)."""
    y, mean, var, _ = _bn_fwd_math(x, scale, bias, axis_name, eps)
    return y, mean, var


def _bn_fwd_math(x, scale, bias, axis_name, eps):
    moments = channel_moments if _use_pallas() else channel_moments_reference
    sx, sx2 = moments(x)
    m = x.shape[0] * x.shape[1] * x.shape[2]
    mean = sx / m
    mean2 = sx2 / m
    if axis_name:
        mean, mean2 = jax.lax.pmean((mean, mean2), axis_name)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    a = (scale.astype(jnp.float32) * inv)
    b = (bias.astype(jnp.float32) - mean * a)
    y = (x.astype(jnp.float32) * a + b).astype(x.dtype)
    return y, mean, var, inv


def _bn_fwd(x, scale, bias, axis_name, eps):
    y, mean, var, inv = _bn_fwd_math(x, scale, bias, axis_name, eps)
    return (y, mean, var), (x, scale, mean, inv)


def _bn_bwd(axis_name, eps, res, cts):
    gy = cts[0]  # mean/var cotangents are zero: they only feed the
    # (non-differentiated) running-stat update.
    x, scale, mean, inv = res
    dual = channel_dual_sums if _use_pallas() else channel_dual_sums_reference
    sg, sgx = dual(gy, x)
    m = x.shape[0] * x.shape[1] * x.shape[2]
    sgxn = (sgx - mean * sg) * inv  # sum of g * xn (local)
    dscale = sgxn.astype(scale.dtype)
    dbias = sg.astype(scale.dtype)
    m_g = sg / m
    m_gxn = sgxn / m
    if axis_name:
        m_g, m_gxn = jax.lax.pmean((m_g, m_gxn), axis_name)
    a = scale.astype(jnp.float32) * inv
    gyf = gy.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    dx = (a * gyf - a * m_g - (a * inv * m_gxn) * (xf - mean)).astype(x.dtype)
    return dx, dscale, dbias


bn_train_apply.defvjp(_bn_fwd, _bn_bwd)


@jax.custom_vjp
def batch_moments(x):
    """(mean, mean-of-squares) over (N, H, W) per channel, f32 — the
    Pallas streaming reduce with an analytic ELEMENTWISE backward
    (dmean/dx = g/M, dmeansq/dx = 2x g/M), so autodiff never materializes
    reduce ops for the forward stats. Used by bn_impl="stats": only the
    forward stat reduces leave XLA; the normalize apply stays a plain
    expression whose backward reduces XLA fuses as before."""
    moments = channel_moments if _use_pallas() else channel_moments_reference
    sx, sx2 = moments(x)
    m = x.shape[0] * x.shape[1] * x.shape[2]
    return sx / m, sx2 / m


def _moments_fwd(x):
    return batch_moments(x), x


def _moments_bwd(x, cts):
    g_mean, g_msq = cts
    m = x.shape[0] * x.shape[1] * x.shape[2]
    dx = (g_mean / m + 2.0 * x.astype(jnp.float32) * (g_msq / m))
    return (dx.astype(x.dtype),)


batch_moments.defvjp(_moments_fwd, _moments_bwd)


class FusedBatchNorm(nn.Module):
    """Drop-in ``nn.BatchNorm`` twin (same variables/semantics) with the
    fused Pallas train-mode forward/backward. Eval mode reproduces flax's
    running-average normalize exactly (same op order and dtype promotion),
    so eval programs are bitwise-unchanged by the swap."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None
    param_dtype: Any = jnp.float32
    axis_name: str | None = None
    # "full": hand-written backward for the whole normalize (bn_train_
    # apply). "stats": only the forward stat reduces go through the
    # Pallas op (batch_moments, elementwise backward); the apply is a
    # plain expression whose backward reduces stay XLA-fused.
    mode: str = "full"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,),
                          self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if self.use_running_average:
            # flax _normalize op order/dtype promotion, reproduced exactly.
            from flax.linen import dtypes as _dtypes

            xc, mean, var, sc, bi = _dtypes.promote_dtype(
                x, ra_mean.value, ra_var.value, scale, bias,
                dtype=self.dtype)
            y = xc - mean
            mul = jax.lax.rsqrt(var + jnp.asarray(self.epsilon, mean.dtype))
            y = y * (mul * sc)
            return y + bi
        if self.mode == "stats":
            mean, mean2 = batch_moments(x)
            if self.axis_name:
                mean, mean2 = jax.lax.pmean((mean, mean2), self.axis_name)
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            inv = jax.lax.rsqrt(var + float(self.epsilon))
            a = scale.astype(jnp.float32) * inv
            b = bias.astype(jnp.float32) - mean * a
            y = (x.astype(jnp.float32) * a + b).astype(x.dtype)
        else:
            y, mean, var = bn_train_apply(x, scale, bias, self.axis_name,
                                          float(self.epsilon))
        if not self.is_initializing():
            mom = jnp.asarray(self.momentum, jnp.float32)
            ra_mean.value = mom * ra_mean.value + (1.0 - mom) * mean
            ra_var.value = mom * ra_var.value + (1.0 - mom) * var
        return y


def make_batch_norm(impl: str, *, use_running_average: bool,
                    momentum: float = 0.9, epsilon: float = 1e-5,
                    dtype=None, param_dtype=jnp.float32,
                    axis_name: str | None = None, name: str = "bn"):
    """BN factory: ``impl`` "xla" -> nn.BatchNorm (status quo), "fused" ->
    FusedBatchNorm. One switch point for every BN site in the trunk."""
    if impl in ("fused", "stats"):
        return FusedBatchNorm(
            use_running_average=use_running_average, momentum=momentum,
            epsilon=epsilon, dtype=dtype, param_dtype=param_dtype,
            axis_name=axis_name, name=name,
            mode="stats" if impl == "stats" else "full")
    if impl != "xla":
        raise ValueError(f"model.bn_impl={impl!r} (expected 'xla', "
                         f"'fused' or 'stats')")
    return nn.BatchNorm(
        use_running_average=use_running_average, momentum=momentum,
        epsilon=epsilon, dtype=dtype, param_dtype=param_dtype,
        axis_name=axis_name, name=name)

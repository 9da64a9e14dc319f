"""Dynamic post-training int8 quantization for inference.

Beyond-reference deployment capability (the reference is f32-only;
SURVEY.md §2.16 maps its cuDNN convs to XLA:TPU convs — v5e's MXU runs
s8xs8->s32 at 2x the bf16 rate, so quantized serving is the TPU-native
analogue of TensorRT int8 deployment).

Mechanism: a flax *method interceptor* (``nn.intercept_methods``) rewrites
every bound ``nn.Conv`` call inside the forward into a symmetric int8
convolution:

* weights: per-OUTPUT-CHANNEL symmetric scales (absmax/127) computed from
  the checkpoint values — the param tree is untouched, so any existing
  checkpoint loads unchanged. The quantization ops are staged into the
  compiled program and EXECUTE per program run: O(params) fused
  elementwise work (~100 MB of f32 kernel reads for ResNet-50, ~2% of a
  batch-8 program; XLA hoists it out of scanned multi-batch programs as
  loop-invariant). If int8 becomes the serving default, pre-quantizing
  into a transformed param tree removes even that;
* activations: per-TENSOR dynamic symmetric scale (absmax/127) computed on
  device each call — no calibration dataset needed;
* accumulation: ``s8 x s8 -> s32`` via ``preferred_element_type``, then one
  fused dequant multiply-add back to the module dtype (bias stays in
  floating point).

No model-code changes: the interceptor sees the same ``nn.Conv`` modules
the full-precision path runs, and non-conv ops (BN affine, resizes, NMS,
the Pallas kernels) keep their original dtype. Inference-only by
construction — training never runs under the interceptor.

Unsupported conv variants (grouped/dilated, non-4D inputs) and init-time
calls (no params yet) fall through to the original implementation, so the
context manager is safe to wrap around ANY forward.
"""

from __future__ import annotations

import contextlib

import flax.linen as nn
import jax
import jax.numpy as jnp


def _as_pair(v) -> tuple:
    if v is None:
        return (1, 1)  # flax: None means 1
    if isinstance(v, int):
        return (v, v)
    return tuple(v)


def _norm_padding(padding):
    """nn.Conv padding -> lax.conv padding, or None if unsupported."""
    if isinstance(padding, str):
        # CIRCULAR/CAUSAL are flax-level transforms lax.conv rejects.
        return padding if padding in ("SAME", "VALID") else None
    if isinstance(padding, int):
        return [(padding, padding)] * 2
    try:
        pairs = [(p, p) if isinstance(p, int) else tuple(p)
                 for p in padding]
    except TypeError:
        return None
    if len(pairs) == 2 and all(len(p) == 2 for p in pairs):
        return pairs
    return None


def _supported(m: nn.Conv, args, kwargs) -> bool:
    """True only for the plain-NHWC-conv subset the int8 twin reproduces
    EXACTLY (modulo quantization noise). Anything else — including configs
    that would merely crash lax.conv, masked convs, or custom conv
    implementations — falls through to the original f32 path; this
    function must never raise (the context manager promises it is safe
    around ANY forward)."""
    try:
        if kwargs:
            return False
        if len(args) != 1 or getattr(args[0], "ndim", 0) != 4:
            return False
        if _as_pair(m.kernel_dilation) != (1, 1):
            return False
        if _as_pair(m.input_dilation) != (1, 1):
            return False
        if m.feature_group_count != 1:
            return False
        if getattr(m, "mask", None) is not None:
            return False  # masked conv: quantizing p['kernel'] alone is wrong
        if _norm_padding(m.padding) is None:
            return False
        m.variables["params"]["kernel"]
    except Exception:
        return False  # incl. init-time calls: let nn.Conv create its params
    return True


def quantized_conv(m: nn.Conv, x: jnp.ndarray) -> jnp.ndarray:
    """The int8 twin of one bound ``nn.Conv.__call__`` (NHWC, 4D)."""
    p = m.variables["params"]
    kernel = jnp.asarray(p["kernel"], jnp.float32)  # (kh, kw, cin, cout)
    sw = jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0  # per-cout
    sw = jnp.maximum(sw, 1e-12)
    wq = jnp.clip(jnp.round(kernel / sw), -127, 127).astype(jnp.int8)

    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)

    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        xq, wq, _as_pair(m.strides), _norm_padding(m.padding),
        dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    out_dtype = m.dtype or x.dtype
    y = y.astype(jnp.float32) * (sx * sw)  # dequant, broadcast over cout
    if m.use_bias:
        y = y + jnp.asarray(p["bias"], jnp.float32)
    return y.astype(out_dtype)


def quantized_conv_interceptor(next_fn, args, kwargs, context):
    m = context.module
    if (type(m) is nn.Conv and context.method_name == "__call__"
            and _supported(m, args, kwargs)):
        return quantized_conv(m, args[0])
    return next_fn(*args, **kwargs)


@contextlib.contextmanager
def quantized_convs():
    """Context manager: every ``nn.Conv`` applied (or traced) inside runs
    as a dynamic-int8 convolution. Wrap the ``model.apply`` call itself —
    under ``jax.jit`` the interceptor must be active during TRACING."""
    with nn.intercept_methods(quantized_conv_interceptor):
        yield

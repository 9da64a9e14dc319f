"""Dynamic post-training int8 quantization for inference.

Beyond-reference deployment capability (the reference is f32-only;
SURVEY.md §2.16 maps its cuDNN convs to XLA:TPU convs — v5e's MXU runs
s8xs8->s32 at 2x the bf16 rate, so quantized serving is the TPU-native
analogue of TensorRT int8 deployment).

Mechanism: a flax *method interceptor* (``nn.intercept_methods``) rewrites
every bound ``nn.Conv`` call inside the forward into a symmetric int8
convolution:

* weights: per-OUTPUT-CHANNEL symmetric scales (absmax/127) computed from
  the checkpoint values — the CHECKPOINT is untouched, so any existing
  checkpoint loads unchanged. The Inferencer pre-quantizes the loaded
  tree ONCE (``prequantize_params``: each 4D conv ``kernel`` becomes an
  int8 array with a ``kernel_scale`` sibling — flax ignores extra param
  leaves), so the compiled program reads int8 weights directly: no
  per-run O(params) quantization work and 4x less kernel HBM traffic.
  A raw f32 tree still works (the interceptor quantizes in-program,
  ~2% of a batch-8 run) — pre-quantization is the default fast path;
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


def _quantize_kernel(kernel: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(kh, kw, cin, cout) f32 -> (int8 kernel, per-cout f32 scale)."""
    kernel = jnp.asarray(kernel, jnp.float32)
    sw = jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0  # per-cout
    sw = jnp.maximum(sw, 1e-12)
    wq = jnp.clip(jnp.round(kernel / sw), -127, 127).astype(jnp.int8)
    return wq, sw


def prequantize_params(params):
    """Transform a param tree for int8 serving, ONCE, outside the program.

    Every 4D conv ``kernel`` leaf is replaced by its int8 symmetric
    quantization with a ``kernel_scale`` sibling (identical values to the
    in-program path — same jnp ops, run eagerly). Biases, norms and
    non-conv params are untouched; flax ignores the extra leaf on modules
    that never read it. Idempotent (already-int8 kernels pass through).
    Returns a plain-dict tree with the same module paths, so jitted
    programs see the same pytree structure across ``set_weights`` swaps.
    """
    import collections.abc

    def rec(node):
        if isinstance(node, collections.abc.Mapping):
            out = {}
            for k, v in node.items():
                if (k == "kernel" and getattr(v, "ndim", 0) == 4
                        and v.dtype != jnp.int8):
                    out["kernel"], out["kernel_scale"] = _quantize_kernel(v)
                else:
                    out[k] = rec(v)
            return out
        return node

    return rec(params)


def quantized_conv(m: nn.Conv, x: jnp.ndarray) -> jnp.ndarray:
    """The int8 twin of one bound ``nn.Conv.__call__`` (NHWC, 4D)."""
    p = m.variables["params"]
    kernel = p["kernel"]  # (kh, kw, cin, cout)
    if kernel.dtype == jnp.int8:  # prequantize_params fast path
        wq = kernel
        sw = jnp.asarray(p["kernel_scale"], jnp.float32)
    else:
        wq, sw = _quantize_kernel(kernel)

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
    if context.method_name == "__call__":
        if type(m) is nn.Conv:
            if _supported(m, args, kwargs):
                return quantized_conv(m, args[0])
            prequantized = _owns_int8_kernel(m)
            if prequantized:
                # Falling through would run the ORIGINAL conv on the raw
                # int8 codes (unscaled) — silently garbage. A pre-quantized
                # tree must only meet convs the int8 twin fully reproduces.
                raise ValueError(
                    f"pre-quantized int8 kernel on an unsupported conv "
                    f"variant at {m.path!r}; prequantize_params is only "
                    f"valid for plain NHWC convs")
        elif _owns_int8_kernel(m):
            # prequantize_params rewrites EVERY 4D Mapping leaf named
            # 'kernel'; if a module the interceptor does not handle (e.g.
            # a future nn.ConvTranspose) owns one, its original __call__
            # would consume the raw int8 codes — fail loudly instead so
            # the transform's scope and this guard's scope stay matched.
            raise ValueError(
                f"pre-quantized int8 'kernel' on unsupported module type "
                f"{type(m).__name__} at {m.path!r}; int8 serving only "
                f"quantizes plain nn.Conv kernels")
    return next_fn(*args, **kwargs)


def _owns_int8_kernel(m) -> bool:
    """True iff THIS module (not a child) holds a 4D int8 'kernel'."""
    try:
        k = m.variables["params"]["kernel"]
        return getattr(k, "ndim", 0) == 4 and k.dtype == jnp.int8
    except Exception:
        return False


@contextlib.contextmanager
def quantized_convs():
    """Context manager: every ``nn.Conv`` applied (or traced) inside runs
    as a dynamic-int8 convolution. Wrap the ``model.apply`` call itself —
    under ``jax.jit`` the interceptor must be active during TRACING."""
    with nn.intercept_methods(quantized_conv_interceptor):
        yield

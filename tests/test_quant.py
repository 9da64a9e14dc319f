"""Dynamic int8 quantized inference (ops/quant.py): numerics of the conv
twin, init-time safety, and the end-to-end Inferencer path."""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basi_tpu.ops.quant import quantized_convs

from helpers import tiny_batch, tiny_config


def test_quantized_conv_matches_f32_within_int8_error():
    """Per-channel weight + per-tensor activation int8: relative error on a
    single conv stays at the quantization noise floor (~1%)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 24).astype(np.float32))
    conv = nn.Conv(32, (3, 3), padding="SAME")
    params = conv.init(jax.random.PRNGKey(0), x)

    y_ref = conv.apply(params, x)
    with quantized_convs():
        y_q = conv.apply(params, x)
    err = float(jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
    assert err < 0.02, err
    # and it is actually quantized, not a pass-through
    assert float(jnp.max(jnp.abs(y_q - y_ref))) > 0.0


def test_quantized_conv_strided_padded_bias():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 17, 13, 8).astype(np.float32))
    conv = nn.Conv(16, (5, 5), strides=(2, 2),
                   padding=[(2, 2), (2, 2)], use_bias=True)
    params = conv.init(jax.random.PRNGKey(1), x)
    y_ref = conv.apply(params, x)
    with quantized_convs():
        y_q = conv.apply(params, x)
    assert y_q.shape == y_ref.shape
    err = float(jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
    assert err < 0.03, err


def test_quantized_unsupported_falls_through():
    """Grouped convs (and non-4D inputs) keep the exact f32 path."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 8).astype(np.float32))
    conv = nn.Conv(8, (3, 3), feature_group_count=8)
    params = conv.init(jax.random.PRNGKey(2), x)
    y_ref = conv.apply(params, x)
    with quantized_convs():
        y_q = conv.apply(params, x)
    np.testing.assert_array_equal(np.asarray(y_q), np.asarray(y_ref))


def test_quantized_init_is_safe():
    """Interceptor active during module INIT (no params yet) must fall
    through to param creation, not crash."""
    x = jnp.zeros((1, 8, 8, 3))
    conv = nn.Conv(4, (3, 3))
    with quantized_convs():
        params = conv.init(jax.random.PRNGKey(0), x)
    assert params["params"]["kernel"].shape == (3, 3, 3, 4)


def test_inferencer_int8_end_to_end_close_to_f32():
    """infer.dtype=int8 runs the full forward+NMS program and the selected
    instances stay close to the f32 run: same model, same weights."""
    from basi_tpu.infer import Inferencer

    cfg = tiny_config()
    rng = np.random.RandomState(3)
    batch = tiny_batch(rng, n=cfg.infer.batch_size)
    # train-free check: random weights, fixed seed via Inferencer init
    inf32 = Inferencer(cfg)
    cfg8 = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, dtype="int8"))
    inf8 = Inferencer(cfg8, params=inf32.params,
                      batch_stats=inf32.batch_stats)

    m32, s32, sal32 = inf32.predict_batch(jnp.asarray(batch["image"]))
    m8, s8, sal8 = inf8.predict_batch(jnp.asarray(batch["image"]))
    assert m8.shape == m32.shape and s8.shape == s32.shape
    # saliency logits strongly correlated (int8 noise, same structure)
    a = np.asarray(sal32, np.float32).ravel()
    b = np.asarray(sal8, np.float32).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.98, corr
    # binarized selected masks overlap: compare the union footprints
    u32 = (np.asarray(m32, np.float32) > 0.5).any(axis=1)
    u8 = (np.asarray(m8, np.float32) > 0.5).any(axis=1)
    inter = (u32 & u8).sum()
    union = (u32 | u8).sum()
    if union:
        assert inter / union > 0.8, (inter, union)


def test_int8_uses_bf16_for_nonconv():
    from basi_tpu.infer import Inferencer

    cfg = tiny_config()
    cfg8 = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, dtype="int8"))
    inf8 = Inferencer(cfg8)
    assert inf8._compute_dtype == jnp.bfloat16
    assert inf8._quant


def test_quantized_conv_int_padding_and_circular_fallthrough():
    """padding=1 (int) quantizes with matching semantics; CIRCULAR (a
    flax-level transform lax.conv rejects) falls through to exact f32."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 9, 9, 4).astype(np.float32))

    conv_i = nn.Conv(8, (3, 3), padding=1)
    p_i = conv_i.init(jax.random.PRNGKey(3), x)
    y_ref = conv_i.apply(p_i, x)
    with quantized_convs():
        y_q = conv_i.apply(p_i, x)
    assert y_q.shape == y_ref.shape
    err = float(jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
    assert 0 < err < 0.03, err

    conv_c = nn.Conv(8, (3, 3), padding="CIRCULAR")
    p_c = conv_c.init(jax.random.PRNGKey(4), x)
    y_ref = conv_c.apply(p_c, x)
    with quantized_convs():
        y_q = conv_c.apply(p_c, x)
    np.testing.assert_array_equal(np.asarray(y_q), np.asarray(y_ref))

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


def test_prequantized_matches_dynamic_bitwise():
    """prequantize_params runs the SAME quantization ops eagerly that the
    dynamic path stages in-program, so a prequantized tree must reproduce
    the dynamic int8 outputs exactly."""
    from basi_tpu.ops.quant import prequantize_params

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16, 24).astype(np.float32))
    conv = nn.Conv(32, (3, 3), padding="SAME")
    params = conv.init(jax.random.PRNGKey(0), x)

    with quantized_convs():
        y_dyn = conv.apply(params, x)
    qp = {"params": prequantize_params(params["params"])}
    assert qp["params"]["kernel"].dtype == jnp.int8
    assert "kernel_scale" in qp["params"]
    with quantized_convs():
        y_pre = conv.apply(qp, x)
    np.testing.assert_array_equal(np.asarray(y_dyn), np.asarray(y_pre))
    # idempotent
    qp2 = prequantize_params(qp["params"])
    assert qp2["kernel"].dtype == jnp.int8


def test_prequantize_skips_non_conv_leaves():
    from basi_tpu.ops.quant import prequantize_params

    tree = {
        "dense": {"kernel": jnp.ones((8, 4)), "bias": jnp.zeros((4,))},
        "norm": {"scale": jnp.ones((4,)), "bias": jnp.zeros((4,))},
    }
    out = prequantize_params(tree)
    assert out["dense"]["kernel"].dtype == jnp.float32  # 2D: untouched
    assert "kernel_scale" not in out["dense"]
    assert out["norm"]["scale"].dtype == jnp.float32


def test_inferencer_int8_is_prequantized():
    """The Inferencer's int8 path ships int8 kernels into the program (no
    per-run weight quantization) and still matches shapes/finiteness."""
    from basi_tpu.infer import Inferencer

    cfg = tiny_config()
    cfg8 = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, dtype="int8"))
    inf8 = Inferencer(cfg8)
    kernels = [
        v for p, v in jax.tree_util.tree_flatten_with_path(inf8.params)[0]
        if getattr(p[-1], "key", "") == "kernel" and v.ndim == 4
    ]
    assert kernels and all(k.dtype == jnp.int8 for k in kernels)
    rng = np.random.RandomState(3)
    batch = tiny_batch(rng, n=cfg.infer.batch_size)
    m8, s8, sal8 = inf8.predict_batch(jnp.asarray(batch["image"]))
    assert np.isfinite(np.asarray(s8, np.float32)).all()
    assert np.isfinite(np.asarray(sal8, np.float32)).all()

    # set_weights re-quantizes: same structure, program reuse works.
    inf32 = Inferencer(cfg)
    inf8.set_weights(inf32.params, inf32.batch_stats)
    m8b, s8b, _ = inf8.predict_batch(jnp.asarray(batch["image"]))
    assert m8b.shape == m8.shape


def test_prequantized_unsupported_conv_raises():
    """A pre-quantized kernel reaching a conv variant the int8 twin cannot
    reproduce must fail loudly, not fall through to garbage."""
    from basi_tpu.ops.quant import prequantize_params

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 8).astype(np.float32))
    conv = nn.Conv(8, (3, 3), feature_group_count=2, padding="SAME")
    params = conv.init(jax.random.PRNGKey(0), x)
    qp = {"params": prequantize_params(params["params"])}
    with pytest.raises(ValueError, match="unsupported conv"):
        with quantized_convs():
            conv.apply(qp, x)

"""On-device color jitter (data.color_jitter): exactness vs a pixel-space
numpy oracle of torch-ColorJitter semantics, packed-s2d equivalence, and
train-step integration."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from basi_tpu.data.transforms import (
    _LUMA,
    color_jitter,
    space_to_depth_host,
)

from helpers import tiny_batch, tiny_config

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def _norm(pix):
    return (pix - np.asarray(MEAN)) / np.asarray(STD)


def _factors(key, n, strengths):
    """The exact factor draws the implementation makes (same key tree)."""
    kb, kc, ks = jax.random.split(key, 3)
    out = []
    for k, x in zip((kb, kc, ks), strengths):
        lo = max(0.0, 1.0 - x)
        out.append(np.asarray(jax.random.uniform(
            k, (n, 1, 1, 1), jnp.float32, minval=lo, maxval=1.0 + x)))
    return out


def _oracle(pix, key, b, c, s):
    """Pixel-space torch-ColorJitter (functional formulas), fixed order
    brightness -> contrast -> saturation, luma = BT.601."""
    n = pix.shape[0]
    fb, fc, fs = _factors(key, n, (b, c, s))
    x = pix.astype(np.float64)
    w = np.asarray(_LUMA)
    if b > 0:
        x = x * fb
    if c > 0:
        g0 = (x * w).sum(-1).mean(axis=(1, 2)).reshape(n, 1, 1, 1)
        x = g0 + (x - g0) * fc
    if s > 0:
        g = (x * w).sum(-1, keepdims=True)
        x = g + (x - g) * fs
    return x


def test_matches_pixel_space_oracle():
    rng = np.random.RandomState(0)
    pix = rng.rand(3, 16, 16, 3).astype(np.float32)
    key = jax.random.PRNGKey(7)
    got = color_jitter(key, jnp.asarray(_norm(pix), jnp.float32), MEAN, STD,
                       brightness=0.4, contrast=0.3, saturation=0.5)
    want = _norm(_oracle(pix, key, 0.4, 0.3, 0.5))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


def test_single_ops_match_oracle():
    rng = np.random.RandomState(1)
    pix = rng.rand(2, 8, 8, 3).astype(np.float32)
    key = jax.random.PRNGKey(3)
    for kw in ({"brightness": 0.5}, {"contrast": 0.5}, {"saturation": 0.5}):
        got = color_jitter(key, jnp.asarray(_norm(pix), jnp.float32),
                           MEAN, STD, **kw)
        want = _norm(_oracle(pix, key, kw.get("brightness", 0),
                             kw.get("contrast", 0), kw.get("saturation", 0)))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5,
                                   rtol=1e-5, err_msg=str(kw))


def test_off_is_identity_and_same_object():
    x = jnp.ones((1, 4, 4, 3))
    assert color_jitter(jax.random.PRNGKey(0), x, MEAN, STD) is x


def test_packed_s2d_equivalence():
    """jitter(pack(x)) == pack(jitter(x)): the tiled-constant path treats
    each packed lane as the real pixel it is."""
    rng = np.random.RandomState(2)
    pix = rng.rand(2, 8, 8, 3).astype(np.float32)
    key = jax.random.PRNGKey(11)
    norm = _norm(pix).astype(np.float32)
    a = color_jitter(key, jnp.asarray(space_to_depth_host(norm)), MEAN, STD,
                     brightness=0.3, contrast=0.4, saturation=0.2)
    b = space_to_depth_host(np.asarray(color_jitter(
        key, jnp.asarray(norm), MEAN, STD,
        brightness=0.3, contrast=0.4, saturation=0.2)))
    np.testing.assert_allclose(np.asarray(a), b, atol=1e-6, rtol=1e-6)


def test_bad_channel_count_rejected():
    import pytest

    with pytest.raises(ValueError, match="C % 3"):
        color_jitter(jax.random.PRNGKey(0), jnp.ones((1, 4, 4, 4)),
                     MEAN, STD, brightness=0.1)


def test_train_step_runs_with_jitter():
    from basi_tpu.models.basi import create_model
    from basi_tpu.train.state import create_train_state, make_optimizer
    from basi_tpu.train.step import make_train_step

    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, color_jitter=(0.4, 0.4, 0.4)))
    model = create_model(cfg.model)
    tx, _ = make_optimizer(cfg.train, 10)
    state = create_train_state(model, cfg.model, cfg.train, 10, tx=tx)
    step = make_train_step(model, tx, cfg.train, cfg.data, mesh=None,
                           donate=False)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(
        np.random.RandomState(0)).items()}
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

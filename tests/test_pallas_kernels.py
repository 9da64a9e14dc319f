"""Tests: Pallas kernels (interpret mode on CPU) vs XLA reference impls."""

import jax
import jax.numpy as jnp
import numpy as np

from basi_tpu.ops.pallas.normalize_aug import (
    normalize_and_flip,
    normalize_and_flip_reference,
)
from basi_tpu.ops.pallas.upsample_sigmoid import (
    upsample_sigmoid,
    upsample_sigmoid_reference,
)


def test_upsample_sigmoid_interpret(rng):
    x = jnp.asarray(rng.randn(3, 16, 16).astype(np.float32) * 4)
    got = np.asarray(upsample_sigmoid(x, (64, 64), interpret=True))
    want = np.asarray(upsample_sigmoid_reference(x, (64, 64)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_upsample_sigmoid_leading_dims(rng):
    x = jnp.asarray(rng.randn(2, 4, 8, 8).astype(np.float32))
    got = np.asarray(upsample_sigmoid(x, (32, 32), interpret=True))
    assert got.shape == (2, 4, 32, 32)
    want = np.asarray(upsample_sigmoid_reference(x, (32, 32)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_normalize_and_flip_interpret(rng):
    imgs = (rng.rand(4, 24, 32, 3) * 255).astype(np.uint8)
    flip = np.array([0, 1, 0, 1], np.int32)
    got = np.asarray(normalize_and_flip(
        jnp.asarray(imgs), jnp.asarray(flip), interpret=True))
    want = np.asarray(normalize_and_flip_reference(
        jnp.asarray(imgs), jnp.asarray(flip)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

"""ops.pool custom-VJP max pool: forward bitwise vs nn.max_pool, backward
bitwise vs jax.grad of the XLA select-and-scatter reference — including
engineered ties (routing must match XLA's first-max-in-window-order)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basi_tpu.ops.pool import max_pool

CASES = [
    ((3, 3), (2, 2), ((1, 1), (1, 1))),   # ResNet stem pool
    ((2, 2), (2, 2), ((0, 0), (0, 0))),   # VGG pools
    ((3, 3), (1, 1), ((1, 1), (1, 1))),   # stride-1 overlap
]


def _ref(x, window, strides, padding):
    return nn.max_pool(x, window, strides=strides,
                       padding=[padding[0], padding[1]])


@pytest.mark.parametrize("window,strides,padding", CASES)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_bitwise(window, strides, padding, dtype):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 13, 17, 8), dtype)
    got = max_pool(x, window, strides, padding)
    want = _ref(x, window, strides, padding)
    assert got.dtype == want.dtype and got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


@pytest.mark.parametrize("window,strides,padding", CASES)
def test_backward_bitwise_random(window, strides, padding):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 12, 16, 4), jnp.float32)

    def loss_new(x):
        y = max_pool(x, window, strides, padding)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))

    def loss_ref(x):
        y = _ref(x, window, strides, padding)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))

    g_new = np.asarray(jax.jit(jax.grad(loss_new))(x))
    g_ref = np.asarray(jax.jit(jax.grad(loss_ref))(x))
    # Routing must be identical (same pixels receive gradient); the VALUES
    # may differ by summation order in the last ulp when one pixel
    # accumulates grads from several overlapping windows.
    np.testing.assert_array_equal(g_new != 0, g_ref != 0)
    # atol covers cancellation when a near-zero sum accumulates in a
    # different order (stride-1 case: up to 9 contributions per pixel).
    np.testing.assert_allclose(g_new, g_ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("window,strides,padding", CASES)
def test_backward_bitwise_ties(window, strides, padding):
    # Quantized values force many exact ties inside windows: the custom
    # backward must route to the SAME element XLA's select-and-scatter
    # picks, or gradients diverge here.
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randint(0, 3, (3, 12, 16, 2)), jnp.float32)
    g_new = jax.jit(jax.grad(
        lambda x: jnp.sum(max_pool(x, window, strides, padding) ** 2)))(x)
    g_ref = jax.jit(jax.grad(
        lambda x: jnp.sum(_ref(x, window, strides, padding) ** 2)))(x)
    np.testing.assert_array_equal(np.asarray(g_new), np.asarray(g_ref))


def test_backward_bf16_ties():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randint(0, 3, (2, 8, 8, 4)), jnp.bfloat16)
    w, s, p = (3, 3), (2, 2), ((1, 1), (1, 1))
    g_new = jax.grad(lambda x: jnp.sum(
        max_pool(x, w, s, p).astype(jnp.float32) ** 2))(x)
    g_ref = jax.grad(lambda x: jnp.sum(
        _ref(x, w, s, p).astype(jnp.float32) ** 2))(x)
    np.testing.assert_array_equal(np.asarray(g_new, np.float32),
                                  np.asarray(g_ref, np.float32))

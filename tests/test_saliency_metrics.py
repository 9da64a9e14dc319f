"""Saliency metric tests vs hand-computed values."""

import jax.numpy as jnp
import numpy as np

from basi_tpu.evals.saliency import f_measure, mae


def test_mae_simple():
    p = jnp.asarray(np.full((1, 4, 4), 0.25, np.float32))
    t = jnp.asarray(np.zeros((1, 4, 4), np.float32))
    assert abs(float(mae(p, t)) - 0.25) < 1e-6


def test_f_measure_perfect():
    t = np.zeros((2, 8, 8), np.float32)
    t[:, 2:6, 2:6] = 1.0
    maxf, meanf = f_measure(jnp.asarray(t), jnp.asarray(t))
    assert float(maxf) > 0.999
    assert 0 < float(meanf) <= 1.0


def test_f_measure_inverted_is_poor(rng):
    t = np.zeros((1, 8, 8), np.float32)
    t[:, :4] = 1.0
    maxf, _ = f_measure(jnp.asarray(1.0 - t), jnp.asarray(t))
    # inverted prediction: best threshold still catches everything-at-0
    assert float(maxf) < 0.75

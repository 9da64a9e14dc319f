"""Remat (activation checkpointing) must not change results."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from basi_tpu.models.basi import BASINet, init_model


def test_remat_forward_matches(rng):
    kw = dict(backbone="resnet_tiny", fpn_channels=32, mask_channels=32,
              grid_size=8)
    m = BASINet(**kw)
    mr = BASINet(remat=True, **kw)
    params, bs = init_model(m, 64)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    a = m.apply({"params": params, "batch_stats": bs}, x, False)
    b = mr.apply({"params": params, "batch_stats": bs}, x, False)
    np.testing.assert_allclose(np.asarray(a.mask_logits),
                               np.asarray(b.mask_logits), atol=1e-6)


@pytest.mark.slow
def test_remat_grad_matches(rng):
    kw = dict(backbone="resnet_tiny", fpn_channels=32, mask_channels=32,
              grid_size=8)
    m = BASINet(**kw)
    mr = BASINet(remat=True, **kw)
    params, bs = init_model(m, 64)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))

    def loss(model):
        def f(p):
            out = model.apply({"params": p, "batch_stats": bs}, x, False)
            return jnp.sum(out.saliency_logits ** 2)
        return f

    g1 = jax.grad(loss(m))(params)
    g2 = jax.grad(loss(mr))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)

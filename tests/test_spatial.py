"""Spatial-sharding parity: (2 data x 4 spatial) mesh forward must match
the unsharded forward (XLA SPMD inserts conv halo exchange)."""

import pytest

import jax.numpy as jnp
import numpy as np

from basi_tpu.models.basi import BASINet, init_model
from basi_tpu.parallel.mesh import make_mesh
from basi_tpu.parallel.spatial import spatial_forward_fn


def test_spatial_shard_matches_unsharded(rng):
    model = BASINet(backbone="resnet_tiny", fpn_channels=32,
                    mask_channels=32, grid_size=8)
    params, bs = init_model(model, 64)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))

    want = model.apply({"params": params, "batch_stats": bs}, x, False)

    mesh = make_mesh(8, "data", spatial_axis="spatial", spatial_shards=4)
    run = spatial_forward_fn(model, mesh)
    got = run(params, bs, x)

    np.testing.assert_allclose(
        np.asarray(got.mask_logits), np.asarray(want.mask_logits),
        atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got.saliency_logits), np.asarray(want.saliency_logits),
        atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_spatial_train_step_matches_single_device(rng):
    """(2 data x 4 spatial) GSPMD train step == unsharded train step on the
    same global batch. Partitioned reductions reassociate float sums, so
    this matches to numerical tolerance, not bitwise (the shard_map DP
    path in test_train_step.py is the bitwise one)."""
    import jax

    from basi_tpu.models.basi import create_model
    from basi_tpu.parallel.spatial import make_spatial_train_step
    from basi_tpu.train.state import create_train_state, make_optimizer
    from basi_tpu.train.step import make_train_step

    from helpers import tiny_batch, tiny_config

    cfg = tiny_config()
    model = create_model(cfg.model)
    tx, _ = make_optimizer(cfg.train, max_steps=4)
    state = create_train_state(model, cfg.model, cfg.train, max_steps=4)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(rng).items()}

    ref_step = make_train_step(model, tx, cfg.train, cfg.data, mesh=None,
                               donate=False)
    want_state, want_metrics = ref_step(state, batch)

    mesh = make_mesh(8, "data", spatial_axis="spatial", spatial_shards=4)
    sp_step = make_spatial_train_step(model, tx, cfg.train, cfg.data, mesh,
                                      donate=False)
    sharded = {k: jax.device_put(v, sp_step.batch_shardings[k])
               for k, v in batch.items()}
    got_state, got_metrics = sp_step(state, sharded)

    np.testing.assert_allclose(
        float(got_metrics["loss"]), float(want_metrics["loss"]),
        rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(want_state.params),
                    jax.tree.leaves(got_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

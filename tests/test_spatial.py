"""Spatial-sharding parity: (2 data x 4 spatial) mesh forward must match
the unsharded forward (XLA SPMD inserts conv halo exchange)."""

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

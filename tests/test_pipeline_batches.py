"""Real pipeline batches (with host-side keys: orig_hw/valid_hw/num_real)
must flow through every multi-device path. Round-2 regression: the rank-0
``num_real`` scalar crashed the DeviceFeed/Trainer sharding lambda
(P('data') is invalid for rank-0) and the spatial step's jit in_shardings
rejected the 6-key dict before the in-body subselect could run."""

import jax
import numpy as np

from basi_tpu.data.datasets import make_dataset, iter_epoch
from basi_tpu.data.pipeline import DeviceFeed
from basi_tpu.parallel.mesh import make_mesh
from basi_tpu.train.step import shard_batch

from helpers import tiny_config


def _real_batch(cfg):
    ds = make_dataset(cfg.data, split="train")
    return next(iter_epoch(ds, cfg.data.batch_size, shuffle=False, seed=0,
                           drop_last=False))


def test_device_feed_shards_pipeline_batch_on_mesh():
    cfg = tiny_config()
    mesh = make_mesh(8, "data")
    from jax.sharding import NamedSharding, PartitionSpec as P

    def sharding(v):  # mirrors Trainer's lambda (train/loop.py)
        if v.ndim == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P("data", *([None] * (v.ndim - 1))))

    ds = make_dataset(cfg.data, split="train")
    feed = DeviceFeed(ds, cfg.data.batch_size, shuffle=True, seed=0,
                      sharding=sharding, debug_sync=True)
    batch = next(iter(feed.epoch(0)))
    assert "num_real" in batch  # the key that crashed round 2
    assert int(jax.device_get(batch["num_real"])) == cfg.data.batch_size
    assert batch["image"].shape[0] == cfg.data.batch_size


def test_shard_batch_handles_scalars():
    cfg = tiny_config()
    mesh = make_mesh(8, "data")
    put = shard_batch(_real_batch(cfg), mesh)
    assert int(jax.device_get(put["num_real"])) == cfg.data.batch_size


def test_trainer_multi_device_runs_pipeline_batches(tmp_path):
    """Trainer with num_devices>1 must survive real feed batches."""
    import dataclasses

    from basi_tpu.train.loop import Trainer

    cfg = tiny_config(batch_size=4)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, synthetic_n=4, batch_size=4),
        train=dataclasses.replace(cfg.train, epochs=1,
                                  checkpoint_dir=str(tmp_path / "ckpt")),
        parallel=dataclasses.replace(cfg.parallel, num_devices=2),
    )
    tr = Trainer(cfg)
    metrics = tr.train()
    assert np.isfinite(metrics["loss"])


def test_spatial_step_accepts_pipeline_batch(rng):
    from basi_tpu.models.basi import create_model
    from basi_tpu.parallel.spatial import make_spatial_train_step
    from basi_tpu.train.state import create_train_state, make_optimizer

    cfg = tiny_config(batch_size=2)
    model = create_model(cfg.model)
    tx, _ = make_optimizer(cfg.train, max_steps=2)
    state = create_train_state(model, cfg.model, cfg.train, max_steps=2)
    mesh = make_mesh(8, "data", spatial_axis="spatial", spatial_shards=4)
    step = make_spatial_train_step(model, tx, cfg.train, cfg.data, mesh,
                                   donate=False)

    cfg2 = dataclasses_replace_batch(cfg, 2)
    batch = _real_batch(cfg2)  # 6 keys incl. num_real
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(jax.device_get(metrics["loss"])))


def dataclasses_replace_batch(cfg, n):
    import dataclasses
    return dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, batch_size=n, synthetic_n=8))

"""Checkpoint IO: params export/load round trip and Inferencer loading
from BOTH checkpoint formats (Trainer step dirs and bare exports)."""

import dataclasses

import jax
import numpy as np

from basi_tpu.infer import Inferencer
from basi_tpu.models.basi import create_model, init_model
from basi_tpu.utils.checkpoint import export_params, load_params

from helpers import tiny_config


def test_export_load_roundtrip(tmp_path):
    cfg = tiny_config()
    model = create_model(cfg.model)
    params, stats = init_model(model, cfg.model.image_size, seed=3)
    path = str(tmp_path / "export")
    export_params(path, params, stats)
    restored = load_params(path, {"params": params, "batch_stats": stats})
    for a, b in zip(jax.tree.leaves(restored["params"]),
                    jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_inferencer_loads_both_formats(tmp_path):
    from basi_tpu.train.state import create_train_state
    from basi_tpu.utils.checkpoint import CheckpointManager

    cfg = tiny_config()
    model = create_model(cfg.model)

    # format 1: bare export
    params, stats = init_model(model, cfg.model.image_size, seed=4)
    export_dir = str(tmp_path / "export")
    export_params(export_dir, params, stats)
    inf1 = Inferencer(cfg, checkpoint=export_dir)
    for a, b in zip(jax.tree.leaves(inf1.params), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # format 2: Trainer step checkpoints
    state = create_train_state(model, cfg.model, cfg.train, 4)
    state = dataclasses.replace(state, step=state.step + 3)
    mgr = CheckpointManager(str(tmp_path / "train"))
    mgr.save(state)
    inf2 = Inferencer(cfg, checkpoint=str(tmp_path / "train"))
    for a, b in zip(jax.tree.leaves(inf2.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

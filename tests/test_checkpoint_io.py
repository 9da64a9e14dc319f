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


def test_async_save_restore_bitwise(tmp_path):
    """async_save: overlapped writes, identical visible semantics —
    back-to-back saves then restore-latest returns the LAST state bitwise;
    reads barrier on in-flight writes."""
    import jax.numpy as jnp
    import numpy as np

    from basi_tpu.models.basi import create_model
    from basi_tpu.train.state import create_train_state
    from basi_tpu.utils.checkpoint import CheckpointManager

    from helpers import tiny_config

    cfg = tiny_config()
    model = create_model(cfg.model)
    s0 = create_train_state(model, cfg.model, cfg.train, 10)
    s1 = s0.replace(
        step=s0.step + 1,
        params=jax.tree.map(lambda p: p + 1.0, s0.params))

    mgr = CheckpointManager(str(tmp_path), async_save=True)
    mgr.save(s0)
    mgr.save(s1)  # queued behind the first write
    assert mgr.latest_step() == 1  # barrier surfaced both
    restored = mgr.restore(s0)
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(s1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 1
    mgr.close()

    # a fresh SYNC manager reads the async-written checkpoint
    mgr2 = CheckpointManager(str(tmp_path))
    assert mgr2.latest_step() == 1
    mgr2.close()


def test_async_trainer_epoch_saves(tmp_path):
    """Trainer with train.async_checkpoint=true completes train() and the
    final checkpoint restores bitwise (close() barriers the last write)."""
    import dataclasses

    import numpy as np

    from basi_tpu.models.basi import create_model
    from basi_tpu.train.loop import Trainer
    from basi_tpu.train.state import create_train_state
    from basi_tpu.utils.checkpoint import CheckpointManager

    from helpers import tiny_config

    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, checkpoint_dir=str(tmp_path / "ck"), epochs=1,
        steps_per_epoch=2, async_checkpoint=True))
    tr = Trainer(cfg)
    tr.train()
    final = tr.state
    tr.close()
    mgr = CheckpointManager(str(tmp_path / "ck"))
    restored = mgr.restore(create_train_state(
        create_model(cfg.model), cfg.model, cfg.train, 2))
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(final.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()

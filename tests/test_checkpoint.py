"""Fault tolerance (SURVEY §5.3/5.4): checkpoint between steps, restart,
assert BITWISE-identical continuation."""

import pytest

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from basi_tpu.models.basi import create_model
from basi_tpu.train.state import create_train_state, make_optimizer
from basi_tpu.train.step import make_train_step
from basi_tpu.utils.checkpoint import CheckpointManager

from helpers import tiny_batch, tiny_config


@pytest.mark.slow
def test_bitwise_resume(tmp_path):
    cfg = tiny_config()
    model = create_model(cfg.model)
    tx, _ = make_optimizer(cfg.train, max_steps=8)
    state = create_train_state(model, cfg.model, cfg.train, max_steps=8)
    step_fn = make_train_step(model, tx, cfg.train, cfg.data, mesh=None,
                              donate=False)
    batches = [
        {k: jnp.asarray(v) for k, v in tiny_batch(np.random.RandomState(s)).items()}
        for s in range(4)
    ]

    # Continuous run: 4 steps, snapshot after step 2.
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    s = state
    for i, b in enumerate(batches):
        s, _ = step_fn(s, b)
        if i == 1:
            mgr.save(s)
    final_continuous = s

    # Simulated crash: restore the snapshot ("new process"), redo steps 3-4.
    template = create_train_state(model, cfg.model, cfg.train, max_steps=8)
    restored = mgr.restore(template)
    assert int(jax.device_get(restored.step)) == 2
    s2 = restored
    for b in batches[2:]:
        s2, _ = step_fn(s2, b)

    for a, b in zip(jax.tree.leaves(final_continuous.params),
                    jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(final_continuous.opt_state),
                    jax.tree.leaves(s2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_maybe_resume_from_path(tmp_path):
    """TrainConfig.resume documents 'auto | none | <path-or-step>'; a
    directory path must restore that directory's newest step (round-1
    ADVICE: int(resume) raised ValueError on paths)."""
    cfg = tiny_config()
    model = create_model(cfg.model)
    tx, _ = make_optimizer(cfg.train, max_steps=8)
    state = create_train_state(model, cfg.model, cfg.train, max_steps=8)
    step_fn = make_train_step(model, tx, cfg.train, cfg.data, mesh=None,
                              donate=False)
    b = {k: jnp.asarray(v)
         for k, v in tiny_batch(np.random.RandomState(0)).items()}
    s, _ = step_fn(state, b)
    src = CheckpointManager(str(tmp_path / "src"))
    src.save(s)

    template = create_train_state(model, cfg.model, cfg.train, max_steps=8)
    dst = CheckpointManager(str(tmp_path / "dst"))  # empty manager
    restored = dst.maybe_resume(template, str(tmp_path / "src"))
    assert int(jax.device_get(restored.step)) == 1
    for a, c in zip(jax.tree.leaves(s.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    # 'none' and digit strings still behave
    same = dst.maybe_resume(template, "none")
    assert same is template


def test_resume_missing_path_fails_fast(tmp_path):
    """A typo'd resume path must raise (and NOT mkdir an empty orbax dir)."""
    import pytest

    from basi_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    missing = tmp_path / "nope"
    with pytest.raises(FileNotFoundError):
        mgr.maybe_resume(None, resume=str(missing))
    assert not missing.exists()
    mgr.close()


def test_in_loop_and_epoch_save_no_duplicate_step(tmp_path):
    """checkpoint_every_steps dividing steps_per_epoch: the per-epoch save
    must skip the already-saved step (orbax raises StepAlreadyExistsError
    on duplicates, which killed training at the first epoch end)."""
    from basi_tpu.train.loop import Trainer

    from helpers import tiny_config

    cfg = tiny_config(batch_size=4)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, synthetic_n=16, batch_size=4),
        train=dataclasses.replace(
            cfg.train, epochs=1, checkpoint_every_steps=4,
            checkpoint_dir=str(tmp_path / "ckpt")),
        parallel=dataclasses.replace(cfg.parallel, num_devices=1),
    )
    tr = Trainer(cfg)  # 4 steps/epoch -> in-loop save lands on step 4 too
    tr.train()
    assert tr.ckpt.latest_step() == 4


def test_mid_epoch_resume_skips_trained_batches(tmp_path):
    """Resume from a mid-epoch checkpoint must continue at that batch, not
    replay the whole epoch (which double-trained batches and overshot
    max_steps, driving the poly LR schedule past its end)."""
    import jax

    from basi_tpu.train.loop import Trainer

    from helpers import tiny_config

    cfg = tiny_config(batch_size=4)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, synthetic_n=16, batch_size=4),
        train=dataclasses.replace(
            cfg.train, epochs=1, checkpoint_every_steps=2,
            checkpoint_dir=str(tmp_path / "ckpt")),
        parallel=dataclasses.replace(cfg.parallel, num_devices=1),
    )
    Trainer(cfg).train()  # saves steps 2 and 4

    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, resume="none",
                                       checkpoint_every_steps=2,
                                       checkpoint_dir=str(tmp_path / "ckpt2")))
    # restore step 2 from the first run's manager into a fresh trainer
    t2 = Trainer(cfg2)
    from basi_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    t2.state = mgr.restore(t2.state, 2)
    mgr.close()
    assert int(jax.device_get(t2.state.step)) == 2
    t2.train()
    # 4 steps/epoch, resumed at 2 -> exactly 2 more steps, never 2+4
    assert int(jax.device_get(t2.state.step)) == 4

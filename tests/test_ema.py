"""EMA weights (train.ema_decay): update math vs a numpy reference,
DP replication, checkpoint structure toggling, and eval-weight selection."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from basi_tpu.models.basi import create_model
from basi_tpu.parallel.mesh import make_mesh
from basi_tpu.train.state import create_train_state, make_optimizer
from basi_tpu.train.step import make_train_step

from helpers import tiny_batch, tiny_config


def _ema_cfg(decay=0.5):
    cfg = tiny_config()
    return dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=decay))


def _leaves(tree):
    return [np.asarray(x, np.float64) for x in jax.tree.leaves(tree)]


def test_ema_matches_numpy_reference():
    cfg = _ema_cfg(decay=0.5)
    model = create_model(cfg.model)
    tx, _ = make_optimizer(cfg.train, max_steps=10)
    state = create_train_state(model, cfg.model, cfg.train, 10, tx=tx)
    assert state.ema_params is not None
    # init: EMA == params
    for e, p in zip(_leaves(state.ema_params), _leaves(state.params)):
        np.testing.assert_array_equal(e, p)

    step_fn = make_train_step(model, tx, cfg.train, cfg.data, mesh=None,
                              donate=False)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(
        np.random.RandomState(0)).items()}

    ema_ref = _leaves(state.params)
    for t in range(1, 4):
        state, _ = step_fn(state, batch)
        d = min(cfg.train.ema_decay, (1.0 + t) / (10.0 + t))
        ema_ref = [e * d + p * (1.0 - d)
                   for e, p in zip(ema_ref, _leaves(state.params))]
        for e_got, e_want in zip(_leaves(state.ema_params), ema_ref):
            np.testing.assert_allclose(e_got, e_want, rtol=1e-5, atol=1e-7)
    # the average must actually lag the raw params (they moved)
    diffs = [np.abs(e - p).max() for e, p in zip(
        _leaves(state.ema_params), _leaves(state.params))]
    assert max(diffs) > 0


def test_ema_off_stays_none():
    cfg = tiny_config()
    model = create_model(cfg.model)
    tx, _ = make_optimizer(cfg.train, max_steps=10)
    state = create_train_state(model, cfg.model, cfg.train, 10, tx=tx)
    assert state.ema_params is None
    step_fn = make_train_step(model, tx, cfg.train, cfg.data, mesh=None,
                              donate=False)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(
        np.random.RandomState(0)).items()}
    state, _ = step_fn(state, batch)
    assert state.ema_params is None


def test_ema_dp_matches_single_device():
    cfg = _ema_cfg(decay=0.9)
    # disable per-shard randomness so 1-dev and 8-dev see identical aug
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, hflip_prob=0.0))
    model = create_model(cfg.model)
    tx, _ = make_optimizer(cfg.train, max_steps=10)
    state0 = create_train_state(model, cfg.model, cfg.train, 10, tx=tx)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(
        np.random.RandomState(1)).items()}

    single = make_train_step(model, tx, cfg.train, cfg.data, mesh=None,
                             donate=False)
    sharded = make_train_step(model, tx, cfg.train, cfg.data,
                              mesh=make_mesh(8, "data"), donate=False)
    s1, _ = single(state0, batch)
    s8, _ = sharded(state0, batch)
    for a, b in zip(_leaves(s1.ema_params), _leaves(s8.ema_params)):
        np.testing.assert_allclose(a, b, atol=5e-6, rtol=1e-4)


def test_checkpoint_toggle_ema(tmp_path):
    """Resume across an ema_decay config flip must work both directions."""
    from basi_tpu.utils.checkpoint import CheckpointManager

    cfg_off = tiny_config()
    cfg_on = _ema_cfg(decay=0.5)
    model = create_model(cfg_off.model)
    s_off = create_train_state(model, cfg_off.model, cfg_off.train, 10)
    s_on = create_train_state(model, cfg_on.model, cfg_on.train, 10)

    # old checkpoint (no EMA) -> resume with EMA on: seeded from params
    mgr = CheckpointManager(str(tmp_path / "a"))
    mgr.save(s_off)
    restored = mgr.restore(s_on)
    assert restored.ema_params is not None
    for e, p in zip(_leaves(restored.ema_params), _leaves(restored.params)):
        np.testing.assert_array_equal(e, p)
    mgr.close()

    # EMA checkpoint -> resume with EMA off: average dropped, params kept
    mgr = CheckpointManager(str(tmp_path / "b"))
    mgr.save(s_on)
    restored = mgr.restore(s_off)
    assert restored.ema_params is None
    for a, b in zip(_leaves(restored.params), _leaves(s_on.params)):
        np.testing.assert_array_equal(a, b)
    mgr.close()

    # same-structure roundtrip stays exact
    mgr = CheckpointManager(str(tmp_path / "c"))
    mgr.save(s_on)
    rt = mgr.restore(s_on)
    for a, b in zip(_leaves(rt.ema_params), _leaves(s_on.ema_params)):
        np.testing.assert_array_equal(a, b)
    mgr.close()


def test_trainer_eval_uses_ema_weights():
    """Trainer.evaluate must hand the EMA params (not the raw ones) to the
    Inferencer when train.ema_decay > 0, and the raw ones on request."""
    from basi_tpu.train.loop import Trainer

    cfg = _ema_cfg(decay=0.5)
    tr = Trainer(cfg)
    try:
        # make the two weight sets visibly different
        ema = jax.tree.map(lambda p: p + 1.0, tr.state.params)
        tr.state = tr.state.replace(ema_params=ema)
        tr.evaluate(max_batches=1)
        got = _leaves(tr._inferencer.params)
        want = _leaves(ema)
        for a, b in zip(got, want):
            np.testing.assert_array_equal(a, b)
        tr.evaluate(max_batches=1, use_ema=False)
        for a, b in zip(_leaves(tr._inferencer.params),
                        _leaves(tr.state.params)):
            np.testing.assert_array_equal(a, b)
    finally:
        tr.close()


def test_restore_weights_template_free(tmp_path):
    """restore_weights needs no TrainState template (an AdamW/EMA-trained
    checkpoint must load in a default-config eval) and prefers EMA."""
    from basi_tpu.utils.checkpoint import CheckpointManager

    cfg = _ema_cfg(decay=0.5)
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, optimizer="adamw", schedule="cosine"))
    model = create_model(cfg.model)
    state = create_train_state(model, cfg.model, cfg.train, 10)
    # make EMA distinguishable from params
    state = state.replace(ema_params=jax.tree.map(
        lambda p: p + 1.0, state.params))
    mgr = CheckpointManager(str(tmp_path / "a"))
    mgr.save(state)
    params, stats = mgr.restore_weights()
    for a, b in zip(_leaves(params), _leaves(state.ema_params)):
        np.testing.assert_array_equal(a, b)
    assert jax.tree.structure(stats) == jax.tree.structure(
        jax.device_get(state.batch_stats))
    mgr.close()

    # no EMA in the checkpoint -> raw params come back
    cfg_off = tiny_config()
    s_off = create_train_state(model, cfg_off.model, cfg_off.train, 10)
    mgr = CheckpointManager(str(tmp_path / "b"))
    mgr.save(s_off)
    params, _ = mgr.restore_weights()
    for a, b in zip(_leaves(params), _leaves(s_off.params)):
        np.testing.assert_array_equal(a, b)
    mgr.close()

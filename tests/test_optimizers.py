"""Optimizer/schedule choices (train.optimizer, train.schedule): schedule
math vs closed forms, AdamW parity vs a direct optax reference, and a
train-step smoke for the non-default combination."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from basi_tpu.models.basi import create_model
from basi_tpu.train.state import create_train_state, make_optimizer, make_schedule
from basi_tpu.train.step import make_train_step

from helpers import tiny_batch, tiny_config


def _train_cfg(**kw):
    cfg = tiny_config()
    return dataclasses.replace(cfg.train, **kw)


def test_poly_schedule_closed_form():
    cfg = _train_cfg(lr=0.1, poly_power=0.9)
    sched = make_schedule(cfg, max_steps=100)
    for s in (0, 25, 50, 99, 100, 150):
        want = 0.1 * (1.0 - min(s / 100, 1.0)) ** 0.9
        np.testing.assert_allclose(float(sched(s)), want, rtol=1e-6)


def test_cosine_schedule_closed_form():
    cfg = _train_cfg(lr=0.1, schedule="cosine")
    sched = make_schedule(cfg, max_steps=100)
    for s in (0, 25, 50, 100, 150):
        want = 0.1 * 0.5 * (1.0 + np.cos(np.pi * min(s / 100, 1.0)))
        np.testing.assert_allclose(float(sched(s)), want, rtol=1e-6,
                                   atol=1e-9)


def test_constant_schedule_with_warmup():
    cfg = _train_cfg(lr=0.2, schedule="constant", warmup_steps=10)
    sched = make_schedule(cfg, max_steps=100)
    np.testing.assert_allclose(float(sched(5)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10)), 0.2, rtol=1e-6)
    np.testing.assert_allclose(float(sched(80)), 0.2, rtol=1e-6)


def test_unknown_choices_fail_at_build():
    with pytest.raises(ValueError, match="train.schedule"):
        make_schedule(_train_cfg(schedule="nope"), 10)
    with pytest.raises(ValueError, match="train.optimizer"):
        make_optimizer(_train_cfg(optimizer="nope"), 10)


def test_adamw_matches_optax_reference():
    """Our chain (clip off, wd on) must reproduce a bare optax.adamw."""
    cfg = _train_cfg(optimizer="adamw", schedule="constant", lr=1e-3,
                     weight_decay=0.01, grad_clip_norm=0.0)
    tx, _ = make_optimizer(cfg, max_steps=10)
    ref = optax.adamw(learning_rate=1e-3, weight_decay=0.01)

    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3) / 7.0}
    grads = {"w": jnp.ones((2, 3), jnp.float32) * 0.3}
    st, st_ref = tx.init(params), ref.init(params)
    p, p_ref = params, params
    for _ in range(3):
        u, st = tx.update(grads, st, p)
        p = optax.apply_updates(p, u)
        u_ref, st_ref = ref.update(grads, st_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u_ref)
    np.testing.assert_allclose(np.asarray(p["w"]), np.asarray(p_ref["w"]),
                               rtol=1e-6)


@pytest.mark.slow
def test_adamw_cosine_train_step_decreases_loss():
    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, optimizer="adamw", schedule="cosine", lr=1e-3))
    model = create_model(cfg.model)
    tx, _ = make_optimizer(cfg.train, max_steps=10)
    state = create_train_state(model, cfg.model, cfg.train, 10, tx=tx)
    step_fn = make_train_step(model, tx, cfg.train, cfg.data, mesh=None,
                              donate=False)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(
        np.random.RandomState(0)).items()}
    losses = []
    for _ in range(4):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses


def test_flatten_optimizer_fallback_is_off_for_ducktyped_cfg():
    """A cfg object LACKING flatten_optimizer (older serialized config,
    duck-typed test cfg) must get the per-leaf chain — the dataclass
    default and the measured-faster path. A True fallback silently
    switched such configs to optax.flatten, whose opt_state layout also
    breaks checkpoint-restore compatibility (ADVICE r4 medium)."""

    class Duck:
        # every field make_optimizer reads EXCEPT flatten_optimizer
        grad_clip_norm = 0.0
        optimizer = "sgd"
        weight_decay = 0.0
        momentum = 0.9
        lr = 1e-2
        schedule = "constant"
        warmup_steps = 0

    tx, _ = make_optimizer(Duck(), max_steps=10)
    params = {"a": jnp.zeros((2,), jnp.float32),
              "b": jnp.zeros((3,), jnp.float32)}
    st = tx.init(params)
    # optax.flatten's init state carries flattened vectors; the per-leaf
    # chain keeps the params' pytree structure inside the momentum state.
    leaves = jax.tree_util.tree_leaves(st)
    assert all(leaf.shape in ((2,), (3,), ()) for leaf in leaves), [
        leaf.shape for leaf in leaves]

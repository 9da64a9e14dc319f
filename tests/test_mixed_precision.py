"""Mixed-precision training: bf16 compute, f32 params/optimizer state."""

import pytest

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from basi_tpu.models.basi import create_model
from basi_tpu.train.state import create_train_state, make_optimizer
from basi_tpu.train.step import make_train_step

from helpers import tiny_batch, tiny_config


@pytest.mark.slow
def test_bf16_train_step_runs_and_keeps_f32_state():
    cfg = tiny_config()
    model_cfg = dataclasses.replace(cfg.model, dtype="bfloat16")
    model = create_model(model_cfg)
    tx, _ = make_optimizer(cfg.train, max_steps=4)
    state = create_train_state(model, model_cfg, cfg.train, max_steps=4)
    step = make_train_step(model, tx, cfg.train, cfg.data, mesh=None,
                           donate=False)
    batch = {k: jnp.asarray(v)
             for k, v in tiny_batch(np.random.RandomState(0)).items()}
    s1, m1 = step(state, batch)
    s2, m2 = step(s1, batch)
    assert np.isfinite(float(m2["loss"]))
    # params and optimizer state stay f32 (master weights)
    for leaf in jax.tree.leaves(s2.params):
        assert leaf.dtype == jnp.float32, leaf.dtype
    # state dtype structure is stable across steps (donation safety)
    for a, b in zip(jax.tree.leaves(s1.batch_stats),
                    jax.tree.leaves(s2.batch_stats)):
        assert a.dtype == b.dtype
    assert float(m2["loss"]) < float(m1["loss"]) * 2  # sane magnitude

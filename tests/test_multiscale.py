"""Multiscale-train config: the fused on-device scale aug must run inside
the jitted step (train_multiscale_fused driver config)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from basi_tpu.models.basi import create_model
from basi_tpu.train.state import create_train_state, make_optimizer
from basi_tpu.train.step import make_train_step

from helpers import tiny_batch, tiny_config


def test_multiscale_train_step_runs():
    cfg = tiny_config()
    data = dataclasses.replace(cfg.data, multiscale=True)
    model = create_model(cfg.model)
    tx, _ = make_optimizer(cfg.train, max_steps=4)
    state = create_train_state(model, cfg.model, cfg.train, max_steps=4)
    step = make_train_step(model, tx, cfg.train, data, mesh=None, donate=False)
    batch = {k: jnp.asarray(v)
             for k, v in tiny_batch(np.random.RandomState(0)).items()}
    for _ in range(2):
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

"""Train state + optimizer (SURVEY §2.11/§2.12): SGD momentum, poly LR.

The schedule reproduces the reference's ``lr * (1 - iter/max_iter)^0.9``
poly decay; weight decay is decoupled SGD weight decay (torch ``SGD(...,
weight_decay=...)`` adds wd*param to the gradient — we match that exactly
with ``optax.add_decayed_weights`` BEFORE the momentum/LR transform, which
is the same composition torch uses).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # scalar int32
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array  # PRNG key driving augmentation


def poly_schedule(base_lr: float, max_steps: int, power: float = 0.9,
                  warmup_steps: int = 0) -> optax.Schedule:
    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        frac = jnp.clip(s / max(max_steps, 1), 0.0, 1.0)
        lr = base_lr * (1.0 - frac) ** power
        if warmup_steps > 0:
            lr = lr * jnp.clip(s / warmup_steps, 0.0, 1.0)
        return lr

    return schedule


def make_optimizer(cfg, max_steps: int) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """SGD + momentum + wd + poly LR from a TrainConfig."""
    sched = poly_schedule(cfg.lr, max_steps, cfg.poly_power, cfg.warmup_steps)
    chain = []
    if cfg.grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    if cfg.weight_decay > 0:
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    chain.append(optax.sgd(learning_rate=sched, momentum=cfg.momentum))
    return optax.chain(*chain), sched


def create_train_state(model, cfg_model, cfg_train, max_steps: int,
                       tx=None) -> TrainState:
    """``tx``: pass the caller's optimizer so opt_state is initialized by
    the SAME transformation object that will consume it (falls back to
    constructing an identical one from the config)."""
    from basi_tpu.models.basi import init_model

    params, batch_stats = init_model(model, cfg_model.image_size, cfg_train.seed)
    if tx is None:
        tx, _ = make_optimizer(cfg_train, max_steps)
    opt_state = tx.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        rng=jax.random.PRNGKey(cfg_train.seed),
    )

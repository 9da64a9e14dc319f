"""Distributed-parity tests (SURVEY §4 item 2): the 8-device CPU mesh
``shard_map`` train step must match the single-device step on the same
global batch, and loss must decrease over a few steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basi_tpu.models.basi import create_model
from basi_tpu.parallel.mesh import make_mesh
from basi_tpu.train.state import create_train_state, make_optimizer
from basi_tpu.train.step import make_train_step

from helpers import tiny_batch, tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = create_model(cfg.model)
    tx, _ = make_optimizer(cfg.train, max_steps=10)
    state = create_train_state(model, cfg.model, cfg.train, max_steps=10)
    return cfg, model, tx, state


@pytest.mark.slow
def test_single_device_loss_decreases(setup):
    cfg, model, tx, state = setup
    step_fn = make_train_step(model, tx, cfg.train, cfg.data, mesh=None,
                              donate=False)
    batch = tiny_batch(np.random.RandomState(0))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = []
    for _ in range(4):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses


def test_shard_map_matches_single_device(setup):
    cfg, model, tx, state0 = setup
    mesh = make_mesh(8, "data")
    batch = tiny_batch(np.random.RandomState(1))
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}

    single = make_train_step(model, tx, cfg.train, cfg.data, mesh=None,
                             donate=False)
    sharded = make_train_step(model, tx, cfg.train, cfg.data, mesh=mesh,
                              donate=False)

    # NOTE: per-shard aug PRNG folds in the shard index, so augmentation
    # would differ between 1-dev and 8-dev. Disable randomness for the
    # parity check by zeroing hflip prob and scale aug.
    import dataclasses
    data_cfg = dataclasses.replace(cfg.data, hflip_prob=0.0, multiscale=False)
    single = make_train_step(model, tx, cfg.train, data_cfg, mesh=None,
                             donate=False)
    sharded = make_train_step(model, tx, cfg.train, data_cfg, mesh=mesh,
                              donate=False)

    s1, m1 = single(state0, batch_j)
    s8, m8 = sharded(state0, batch_j)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=2e-5
    )
    # parameters after one step agree (DP grad-mean == full-batch grad)
    flat1 = jax.tree.leaves(s1.params)
    flat8 = jax.tree.leaves(s8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=1e-4)


def test_shard_map_matches_single_device_unclipped(setup):
    """Parity WITHOUT grad clipping / weight decay / momentum — the update
    IS the raw gradient, so any uniform mis-scaling of the DP gradient is
    visible. The clipped variant above once masked an EXACT 8x overcount:
    differentiating through the loss's psum under shard_map
    (check_vma=False) multiplies every cotangent by the axis size, and
    saturated clip-by-global-norm normalizes a uniform factor away
    (ops/losses.py ``_psum_value_local_grad``). This test pins the fix."""
    import dataclasses

    cfg, model, _, _ = setup
    train_cfg = dataclasses.replace(
        cfg.train, grad_clip_norm=0.0, weight_decay=0.0, momentum=0.0)
    data_cfg = dataclasses.replace(cfg.data, hflip_prob=0.0, multiscale=False)
    tx, _ = make_optimizer(train_cfg, max_steps=10)
    # fresh state: the optax chain differs from the fixture's (no clip)
    state0 = create_train_state(model, cfg.model, train_cfg, max_steps=10)
    mesh = make_mesh(8, "data")
    batch = {k: jnp.asarray(v)
             for k, v in tiny_batch(np.random.RandomState(3)).items()}

    single = make_train_step(model, tx, train_cfg, data_cfg, mesh=None,
                             donate=False)
    sharded = make_train_step(model, tx, train_cfg, data_cfg, mesh=mesh,
                              donate=False)
    s1, _ = single(state0, batch)
    s8, _ = sharded(state0, batch)
    # raw-gradient updates: compare the UPDATE (new - old), so a uniform
    # grad scale factor cannot hide behind big param values. The NORM
    # equality is the scale pin (an Nx overcount shifts it by exactly N);
    # per-element tolerance must absorb f32 cancellation noise through the
    # sync-BN backward (per-shard stats + psum vs one fused batch reduce:
    # measured up to ~1.3e-5 abs on near-cancelling 1e-4 updates).
    n1 = n8 = 0.0
    for a, b, p in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params),
                       jax.tree.leaves(state0.params)):
        da = np.asarray(a) - np.asarray(p)
        db = np.asarray(b) - np.asarray(p)
        n1 += float(np.sum(da * da))
        n8 += float(np.sum(db * db))
        np.testing.assert_allclose(da, db, atol=5e-5, rtol=0.15)
    np.testing.assert_allclose(np.sqrt(n8), np.sqrt(n1), rtol=1e-4)


def test_batch_stats_pmean_synced(setup):
    cfg, model, tx, state0 = setup
    mesh = make_mesh(8, "data")
    import dataclasses
    data_cfg = dataclasses.replace(cfg.data, hflip_prob=0.0, multiscale=False)
    sharded = make_train_step(model, tx, cfg.train, data_cfg, mesh=mesh,
                              donate=False)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(np.random.RandomState(2)).items()}
    s8, _ = sharded(state0, batch)
    # batch_stats must be identical across... (replicated output) — just
    # check finite and changed from init.
    leaves0 = jax.tree.leaves(state0.batch_stats)
    leaves1 = jax.tree.leaves(s8.batch_stats)
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves0, leaves1)
    )
    assert changed
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves1)


def test_steps_per_dispatch_matches_per_step_training(tmp_path):
    """train.steps_per_dispatch groups K steps into one scan program; the
    resulting training trajectory must match per-step dispatch exactly
    (same batch order, same per-step RNG folding) — including the epoch
    tail that forms a smaller group (4 steps at group 3 -> 3+1)."""
    import dataclasses

    from basi_tpu.train.loop import Trainer
    from helpers import tiny_config

    def run(spd):
        cfg = tiny_config(batch_size=4)
        cfg = dataclasses.replace(
            cfg,
            data=dataclasses.replace(cfg.data, synthetic_n=16, batch_size=4),
            train=dataclasses.replace(
                cfg.train, epochs=1, log_every=2, checkpoint_dir="",
                steps_per_dispatch=spd),
            parallel=dataclasses.replace(cfg.parallel, num_devices=1),
        )
        tr = Trainer(cfg)
        tr.train()
        return jax.device_get(tr.state)

    s1 = run(1)
    s3 = run(3)
    assert int(s1.step) == int(s3.step) == 4
    # Same trajectory modulo fusion-order float differences between the
    # stacked-scan and single-step programs (measured ~2e-7 abs after 4
    # f32 SGD steps) — NOT a semantic divergence.
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat3 = jax.tree_util.tree_leaves(s3.params)
    for a, b in zip(flat1, flat3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(s3.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=1e-3)


def test_packed_s2d_feed_matches_raw_bitwise(setup):
    """Host-packed s2d train feed (data pipeline pack_s2d): the step must
    produce the same loss/params from the packed (N,H/2,W/2,12) uint8
    batch as from the raw (N,H,W,3) batch — the packed flip + period-3
    normalize commute with the relayout exactly; the two PROGRAMS differ
    by one transpose, so XLA fusion may reassociate within the last ulp
    (measured 1-ulp loss delta on CPU), hence near-exact tolerances."""
    import dataclasses

    from basi_tpu.data.transforms import space_to_depth_host
    from basi_tpu.train.state import create_train_state, make_optimizer

    cfg, *_ = setup
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, stem_mode="s2d"))
    model = create_model(cfg.model)
    tx, _ = make_optimizer(cfg.train, max_steps=10)
    state = create_train_state(model, cfg.model, cfg.train, max_steps=10)
    step = make_train_step(model, tx, cfg.train, cfg.data, mesh=None,
                           donate=False)
    batch = tiny_batch(np.random.RandomState(7))
    raw = {k: jnp.asarray(v) for k, v in batch.items()}
    packed = dict(raw)
    packed["image"] = jnp.asarray(space_to_depth_host(batch["image"]))

    s_raw, m_raw = step(state, raw)
    s_pk, m_pk = step(state, packed)
    np.testing.assert_allclose(np.asarray(m_raw["loss"]),
                               np.asarray(m_pk["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_raw.params),
                    jax.tree.leaves(s_pk.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_packed_feed_rejected_for_conv7_and_multiscale(setup):
    import dataclasses

    from basi_tpu.data.transforms import space_to_depth_host
    from basi_tpu.train.state import make_optimizer

    cfg, model, tx, state = setup  # conv7 stem
    step = make_train_step(model, tx, cfg.train, cfg.data, mesh=None,
                           donate=False)
    batch = tiny_batch(np.random.RandomState(8))
    packed = {k: jnp.asarray(v) for k, v in batch.items()}
    packed["image"] = jnp.asarray(space_to_depth_host(batch["image"]))
    with pytest.raises(ValueError, match="s2d-packed"):
        step(state, packed)

    cfg2 = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, stem_mode="s2d"),
        data=dataclasses.replace(cfg.data, multiscale=True),
    )
    model2 = create_model(cfg2.model)
    tx2, _ = make_optimizer(cfg2.train, max_steps=10)
    from basi_tpu.train.state import create_train_state

    state2 = create_train_state(model2, cfg2.model, cfg2.train, max_steps=10)
    step2 = make_train_step(model2, tx2, cfg2.train, cfg2.data, mesh=None,
                            donate=False)
    with pytest.raises(ValueError, match="multiscale"):
        step2(state2, packed)


def test_grad_accum_matches_single_on_duplicated_micros(setup):
    """grad_accum=2 with the micro-batch DUPLICATED must produce the same
    parameter update as grad_accum=1 on the micro-batch: BN normalizes with
    current batch statistics in train mode, so both micros yield identical
    gradients, whose mean is that gradient. Running stats apply the EMA
    twice (torch accumulation semantics) — checked against the closed form
    s2 = m*s1 + (1-m)*sigma = (1+m)*s1 - m*s0 with flax momentum m=0.9."""
    import dataclasses

    from basi_tpu.train.state import create_train_state, make_optimizer

    cfg, *_ = setup
    data_cfg = dataclasses.replace(cfg.data, hflip_prob=0.0, multiscale=False)
    train2 = dataclasses.replace(cfg.train, grad_accum=2)

    model = create_model(cfg.model)
    tx, _ = make_optimizer(cfg.train, max_steps=10)
    state = create_train_state(model, cfg.model, cfg.train, max_steps=10)

    half = tiny_batch(np.random.RandomState(3), n=4)
    dup = {k: np.concatenate([v, v], axis=0) for k, v in half.items()}
    half = {k: jnp.asarray(v) for k, v in half.items()}
    dup = {k: jnp.asarray(v) for k, v in dup.items()}

    step1 = make_train_step(model, tx, cfg.train, data_cfg, mesh=None,
                            donate=False)
    step2 = make_train_step(model, tx, train2, data_cfg, mesh=None,
                            donate=False)

    s1, m1 = step1(state, half)
    s2, m2 = step2(state, dup)

    np.testing.assert_allclose(np.asarray(m1["loss"]), np.asarray(m2["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    mom = 0.9  # flax BatchNorm momentum in every ConvBN
    for s0_l, s1_l, s2_l in zip(jax.tree.leaves(state.batch_stats),
                                jax.tree.leaves(s1.batch_stats),
                                jax.tree.leaves(s2.batch_stats)):
        want = (1.0 + mom) * np.asarray(s1_l) - mom * np.asarray(s0_l)
        np.testing.assert_allclose(np.asarray(s2_l), want,
                                   rtol=1e-4, atol=1e-6)


def test_grad_accum_rejects_indivisible_batch(setup):
    import dataclasses

    cfg, model, tx, state = setup
    train3 = dataclasses.replace(cfg.train, grad_accum=3)
    step = make_train_step(model, tx, train3, cfg.data, mesh=None,
                           donate=False)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(
        np.random.RandomState(4)).items()}  # n=8, 3 does not divide it
    with pytest.raises(ValueError, match="grad_accum"):
        step(state, batch)


def test_freeze_bn_stats_fixed_affine_trains(setup):
    """train.freeze_bn: running BN statistics are bitwise untouched by a
    step, BN scale/bias still receive gradients (torch-classic frozen-BN
    fine-tuning), and the frozen forward normalizes with RUNNING stats —
    i.e. the loss equals the unfrozen step's loss only if the running
    stats happen to equal the batch stats (they don't here)."""
    import dataclasses

    cfg, model, tx, state = setup
    # Non-trivial running stats so frozen (running) vs unfrozen (batch)
    # normalization actually differ. Keep the perturbation gentle: a large
    # negative shift of the normalized activations kills this tiny random
    # net's top-stage ReLUs outright (zero grads -> biases can't move).
    state = dataclasses.replace(
        state,
        batch_stats=jax.tree.map(lambda x: 1.1 * x + 0.01,
                                 state.batch_stats))
    train_cfg = dataclasses.replace(cfg.train, freeze_bn=True)
    data_cfg = dataclasses.replace(cfg.data, hflip_prob=0.0)
    step_frozen = make_train_step(model, tx, train_cfg, data_cfg, mesh=None,
                                  donate=False)
    step_plain = make_train_step(model, tx, cfg.train, data_cfg, mesh=None,
                                 donate=False)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(
        np.random.RandomState(3)).items()}

    new_state, metrics = step_frozen(state, batch)
    # 1. running stats bitwise unchanged
    for a, b in zip(jax.tree.leaves(state.batch_stats),
                    jax.tree.leaves(new_state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # 2. BN affine params still train
    flat0 = jax.tree_util.tree_flatten_with_path(state.params)[0]
    flat1 = jax.tree_util.tree_flatten_with_path(new_state.params)[0]
    bn_moved = [
        not np.array_equal(np.asarray(v0), np.asarray(v1))
        for (p0, v0), (p1, v1) in zip(flat0, flat1)
        if any(getattr(k, "key", None) == "bn" for k in p0)
    ]
    assert bn_moved and all(bn_moved), "BN affine params did not update"
    # 3. frozen normalization uses running stats -> different loss than
    #    the unfrozen (batch-stats) step on identical data
    _, metrics_plain = step_plain(state, batch)
    assert not np.isclose(float(metrics["loss"]),
                          float(metrics_plain["loss"]))


def test_freeze_bn_shard_map_matches_single_device(setup):
    """Frozen BN under DP: no stats sync needed; the sharded step still
    bit-matches the single-device step on the same global batch."""
    import dataclasses

    cfg, model, tx, state = setup
    mesh = make_mesh(8, "data")
    train_cfg = dataclasses.replace(cfg.train, freeze_bn=True)
    data_cfg = dataclasses.replace(cfg.data, hflip_prob=0.0,
                                   multiscale=False)
    single = make_train_step(model, tx, train_cfg, data_cfg, mesh=None,
                             donate=False)
    sharded = make_train_step(model, tx, train_cfg, data_cfg, mesh=mesh,
                              donate=False)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(
        np.random.RandomState(4)).items()}
    s1, m1 = single(state, batch)
    s2, m2 = sharded(state, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)

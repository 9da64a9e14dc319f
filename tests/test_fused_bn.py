"""FusedBatchNorm (models/norm.py, VERDICT r4 item 2): the Pallas-reduce
BN twin must match nn.BatchNorm — outputs, gradients (x, scale, bias),
running-stat updates, eval mode, sync-BN under shard_map — before any
on-chip A/B can flip model.bn_impl."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basi_tpu.models.norm import FusedBatchNorm, bn_train_apply
from basi_tpu.ops.pallas.bn_stats import (
    channel_dual_sums,
    channel_dual_sums_reference,
    channel_moments,
    channel_moments_reference,
)

import flax.linen as nn

from helpers import tiny_batch, tiny_config


def test_channel_moments_reference_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 16).astype(np.float32)
    s, s2 = channel_moments_reference(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(s), x.sum((0, 1, 2)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s2), (x * x).sum((0, 1, 2)),
                               rtol=1e-5)


def test_channel_moments_kernel_interpret_matches_reference():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16, 128).astype(np.float32))
    s_ref, s2_ref = channel_moments_reference(x)
    s, s2 = channel_moments(x, True)  # interpret mode
    # blocked vs flat accumulation order: last-ulp-scale drift only
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=5e-5,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2_ref),
                               rtol=5e-5, atol=1e-4)


def test_channel_dual_sums_kernel_interpret_matches_reference():
    rng = np.random.RandomState(2)
    g = jnp.asarray(rng.randn(2, 16, 16, 128).astype(np.float32))
    x = jnp.asarray(rng.randn(2, 16, 16, 128).astype(np.float32))
    a_ref, b_ref = channel_dual_sums_reference(g, x)
    a, b = channel_dual_sums(g, x, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_ref), rtol=5e-5,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(b), np.asarray(b_ref), rtol=5e-5,
                               atol=1e-4)


def _bn_pair(use_running_average: bool):
    kw = dict(use_running_average=use_running_average, momentum=0.9,
              epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32)
    return nn.BatchNorm(**kw), FusedBatchNorm(**kw)


def test_train_forward_and_running_stats_match_flax():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 8, 8, 32).astype(np.float32) * 3 + 1)
    ref, fused = _bn_pair(use_running_average=False)
    v_ref = ref.init(jax.random.PRNGKey(0), x)
    v_f = fused.init(jax.random.PRNGKey(0), x)
    y_ref, m_ref = ref.apply(v_ref, x, mutable=["batch_stats"])
    y_f, m_f = fused.apply(v_f, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(m_f["batch_stats"][k]),
            np.asarray(m_ref["batch_stats"][k]), rtol=2e-5, atol=1e-6)


def test_eval_forward_is_bitwise_flax():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    ref, fused = _bn_pair(use_running_average=True)
    vars_ = {"params": {"scale": jnp.asarray(rng.rand(16), jnp.float32),
                        "bias": jnp.asarray(rng.randn(16), jnp.float32)},
             "batch_stats": {"mean": jnp.asarray(rng.randn(16), jnp.float32),
                             "var": jnp.asarray(rng.rand(16) + 0.5,
                                                jnp.float32)}}
    y_ref = ref.apply(vars_, x)
    y_f = fused.apply(vars_, x)
    np.testing.assert_array_equal(np.asarray(y_f), np.asarray(y_ref))


def test_train_gradients_match_flax():
    """d loss/d {x, scale, bias} of the hand-written backward vs flax
    autodiff, through a non-trivial downstream loss."""
    rng = np.random.RandomState(5)
    x0 = jnp.asarray(rng.randn(4, 8, 8, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(4, 8, 8, 32).astype(np.float32))
    ref, fused = _bn_pair(use_running_average=False)
    params = {"scale": jnp.asarray(rng.rand(32) + 0.5, jnp.float32),
              "bias": jnp.asarray(rng.randn(32), jnp.float32)}
    stats = {"mean": jnp.zeros((32,)), "var": jnp.ones((32,))}

    def loss(module, x, p):
        y, _ = module.apply({"params": p, "batch_stats": stats}, x,
                            mutable=["batch_stats"])
        return jnp.sum(jnp.tanh(y) * w)

    g_ref = jax.grad(functools.partial(loss, ref), argnums=(0, 1))(x0, params)
    g_f = jax.grad(functools.partial(loss, fused), argnums=(0, 1))(x0, params)
    np.testing.assert_allclose(np.asarray(g_f[0]), np.asarray(g_ref[0]),
                               rtol=3e-4, atol=3e-5)
    for k in ("scale", "bias"):
        np.testing.assert_allclose(np.asarray(g_f[1][k]),
                                   np.asarray(g_ref[1][k]),
                                   rtol=3e-4, atol=3e-5)


def test_sync_bn_matches_flax_under_shard_map():
    """axis_name path: fused pmean-ed stats + backward vs flax sync-BN on
    a shard_map over the test mesh's devices."""
    from jax.sharding import Mesh, PartitionSpec as P

    n_dev = min(4, jax.device_count())
    if n_dev < 2:
        pytest.skip("needs >= 2 devices")
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("d",))
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2 * n_dev, 4, 4, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(2 * n_dev, 4, 4, 32).astype(np.float32))
    params = {"scale": jnp.asarray(rng.rand(32) + 0.5, jnp.float32),
              "bias": jnp.asarray(rng.randn(32), jnp.float32)}
    stats = {"mean": jnp.zeros((32,)), "var": jnp.ones((32,))}
    kw = dict(use_running_average=False, momentum=0.9, epsilon=1e-5,
              dtype=jnp.float32, param_dtype=jnp.float32, axis_name="d")

    def run(module):
        def body(x, w, p):
            def loss_fn(p):
                y, _ = module.apply({"params": p, "batch_stats": stats}, x,
                                    mutable=["batch_stats"])
                return jnp.sum(jnp.tanh(y) * w)

            l, g = jax.value_and_grad(loss_fn)(p)
            return jax.lax.psum(l, "d"), jax.tree.map(
                lambda v: jax.lax.psum(v, "d"), g)

        fn = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(P("d"), P("d"), P()),
            out_specs=(P(), P()), check_vma=False))
        return fn(x, w, params)

    l_ref, g_ref = run(nn.BatchNorm(**kw))
    l_f, g_f = run(FusedBatchNorm(**kw))
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)
    for k in ("scale", "bias"):
        np.testing.assert_allclose(np.asarray(g_f[k]), np.asarray(g_ref[k]),
                                   rtol=3e-4, atol=3e-5)


def test_train_step_parity_fused_vs_xla_bn():
    """Full train step with model.bn_impl=fused: loss/gradient trajectory
    close to the xla-BN step on identical data (same init, 2 steps)."""
    from basi_tpu.models.basi import create_model
    from basi_tpu.train.state import create_train_state, make_optimizer
    from basi_tpu.train.step import make_train_step

    losses = {}
    for impl in ("xla", "fused"):
        cfg = tiny_config(batch_size=4)
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, bn_impl=impl))
        model = create_model(cfg.model)
        tx, _ = make_optimizer(cfg.train, max_steps=4)
        state = create_train_state(model, cfg.model, cfg.train, 4, tx=tx)
        step = make_train_step(model, tx, cfg.train, cfg.data, mesh=None,
                               donate=False)
        batch = {k: jnp.asarray(v) for k, v in tiny_batch(
            np.random.RandomState(7), n=4).items()}
        ls = []
        for _ in range(2):
            state, metrics = step(state, batch)
            ls.append(float(metrics["loss"]))
        losses[impl] = ls
    np.testing.assert_allclose(losses["fused"], losses["xla"], rtol=1e-4)


def test_stats_mode_matches_flax_values_and_grads():
    """bn_impl='stats' hybrid: Pallas forward moments with elementwise
    backward, XLA apply — values and grads vs nn.BatchNorm."""
    rng = np.random.RandomState(8)
    x0 = jnp.asarray(rng.randn(4, 8, 8, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(4, 8, 8, 32).astype(np.float32))
    kw = dict(use_running_average=False, momentum=0.9, epsilon=1e-5,
              dtype=jnp.float32, param_dtype=jnp.float32)
    ref = nn.BatchNorm(**kw)
    hyb = FusedBatchNorm(mode="stats", **kw)
    params = {"scale": jnp.asarray(rng.rand(32) + 0.5, jnp.float32),
              "bias": jnp.asarray(rng.randn(32), jnp.float32)}
    stats = {"mean": jnp.zeros((32,)), "var": jnp.ones((32,))}

    def loss(module, x, p):
        y, _ = module.apply({"params": p, "batch_stats": stats}, x,
                            mutable=["batch_stats"])
        return jnp.sum(jnp.tanh(y) * w)

    l_ref = loss(ref, x0, params)
    l_h = loss(hyb, x0, params)
    np.testing.assert_allclose(float(l_h), float(l_ref), rtol=1e-5)
    g_ref = jax.grad(functools.partial(loss, ref), argnums=(0, 1))(x0, params)
    g_h = jax.grad(functools.partial(loss, hyb), argnums=(0, 1))(x0, params)
    np.testing.assert_allclose(np.asarray(g_h[0]), np.asarray(g_ref[0]),
                               rtol=3e-4, atol=3e-5)
    for k in ("scale", "bias"):
        np.testing.assert_allclose(np.asarray(g_h[1][k]),
                                   np.asarray(g_ref[1][k]),
                                   rtol=3e-4, atol=3e-5)

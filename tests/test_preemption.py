"""Preemption-safe training (train.save_on_preemption).

TPU pods are evicted with SIGTERM; the Trainer must commit a checkpoint at
the exact current step and return cleanly so `--resume auto` continues
mid-epoch. Tested both via the graceful-stop flag (the polled surface) and
via a real SIGTERM delivered to the process (the installed handler).
"""

import dataclasses
import os
import signal

import jax
import numpy as np
import pytest

from basi_tpu.train.loop import Trainer
from tests.helpers import tiny_config


def _cfg(tmp_path, epochs: int = 2):
    cfg = tiny_config(batch_size=8)
    return dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, synthetic_n=32),
        train=dataclasses.replace(
            cfg.train, epochs=epochs, checkpoint_dir=str(tmp_path / "ckpt"),
            resume="auto", log_every=100,
        ),
    )


def _stop_after(trainer: Trainer, n: int, action):
    """Wrap the jitted step so ``action`` fires after the n-th dispatch."""
    orig = trainer.train_step
    calls = []

    def wrapped(state, batch):
        out = orig(state, batch)
        calls.append(1)
        if len(calls) == n:
            action()
        return out

    trainer.train_step = wrapped


def test_graceful_stop_saves_and_resumes(tmp_path):
    cfg = _cfg(tmp_path)  # 4 steps/epoch x 2 epochs = 8 total
    tr = Trainer(cfg)
    _stop_after(tr, 3, lambda: tr._preempt.set())
    res = tr.train()
    tr.close()
    assert res["preempted_at_step"] == 3
    assert res["checkpoint_saved"] is True

    # Resume continues from the exact step and completes the run.
    tr2 = Trainer(cfg)
    assert int(jax.device_get(tr2.state.step)) == 3
    res2 = tr2.train()
    tr2.close()
    assert "preempted_at_step" not in res2
    assert int(jax.device_get(tr2.state.step)) == tr2.max_steps


def test_sigterm_handler_commits_checkpoint(tmp_path):
    cfg = _cfg(tmp_path)
    tr = Trainer(cfg)
    # A real SIGTERM to ourselves: the handler train() installed sets the
    # flag; the loop commits and returns instead of the process dying.
    _stop_after(tr, 2, lambda: os.kill(os.getpid(), signal.SIGTERM))
    prev = signal.getsignal(signal.SIGTERM)
    res = tr.train()
    tr.close()
    assert res["preempted_at_step"] == 2
    # The previous handler is restored after train().
    assert signal.getsignal(signal.SIGTERM) == prev

    from basi_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(cfg.train.checkpoint_dir)
    assert mgr.latest_step() == 2
    mgr.close()


def test_preempted_state_matches_uninterrupted_prefix(tmp_path):
    """The committed weights equal an uninterrupted run stopped at the
    same step (the preemption path adds no extra update)."""
    cfg = _cfg(tmp_path)
    tr = Trainer(cfg)
    _stop_after(tr, 3, lambda: tr._preempt.set())
    tr.train()
    preempted = jax.device_get(tr.state.params)
    tr.close()

    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, checkpoint_dir=str(tmp_path / "ckpt2")))
    tr2 = Trainer(cfg2)
    _stop_after(tr2, 3, lambda: tr2._preempt.set())
    tr2.train()
    ref = jax.device_get(tr2.state.params)
    tr2.close()
    jax.tree.map(np.testing.assert_array_equal, preempted, ref)


def test_opt_out_ignores_flag_installs_no_handler(tmp_path):
    cfg = _cfg(tmp_path, epochs=1)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, save_on_preemption=False))
    tr = Trainer(cfg)
    seen = []
    _stop_after(tr, 1, lambda: seen.append(signal.getsignal(signal.SIGTERM)))
    res = tr.train()
    tr.close()
    assert "preempted_at_step" not in res
    assert int(jax.device_get(tr.state.step)) == tr.max_steps
    # No handler was installed during the run.
    assert seen[0] == signal.getsignal(signal.SIGTERM)
    assert not callable(seen[0]) or seen[0] in (
        signal.SIG_DFL, signal.SIG_IGN, signal.default_int_handler)


@pytest.mark.parametrize("group", [2])
def test_preempt_with_grouped_dispatch(tmp_path, group):
    """steps_per_dispatch > 1: preemption is answered at the next group
    boundary (never a partial-arity dispatch — that would be a fresh XLA
    compile under the SIGTERM grace deadline), and the checkpoint lands
    at the exact dispatched step."""
    cfg = _cfg(tmp_path)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, steps_per_dispatch=group))
    tr = Trainer(cfg)
    # group dispatch path: wrap the group-step factory's product instead.
    orig_group = tr._group_step()
    calls = []

    def wrapped(state, *bufs):
        out = orig_group(state, *bufs)
        calls.append(len(bufs))
        if sum(calls) >= 2:
            tr._preempt.set()
        return out

    tr._group_step_fn = wrapped
    res = tr.train()
    tr.close()
    assert res["preempted_at_step"] == sum(calls)

    from basi_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(cfg.train.checkpoint_dir)
    assert mgr.latest_step() == sum(calls)
    mgr.close()

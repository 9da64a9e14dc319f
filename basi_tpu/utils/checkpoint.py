"""Checkpoint/resume via orbax (SURVEY §5.3/§5.4).

Beyond the reference's per-epoch ``torch.save(state_dict)`` (which drops
optimizer state and step, restarting the schedule on resume), we save the
FULL train state — params, batch stats, optimizer state, step, PRNG key —
with atomic commit, ``--resume auto`` picking the newest valid step, and
bounded retention. Fault tolerance is fail-stop + bitwise resume (tested by
killing between steps and asserting identical continuation).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from basi_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3,
                 async_save: bool = False):
        """``async_save``: orbax async checkpointing — ``save`` returns as
        soon as the state is snapshotted to host memory and the write
        happens on a background thread, so a per-epoch save overlaps the
        next epoch's steps instead of stalling them. Reads (latest_step /
        restore) and close() barrier on any in-flight write first, so the
        visible semantics match the sync mode."""
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._async = bool(async_save)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True,
                enable_async_checkpointing=self._async,
            ),
        )

    def save(self, state: TrainState):
        step = int(jax.device_get(state.step))
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if not self._async:
            self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        self._mgr.wait_until_finished()  # surface in-flight async writes
        return self._mgr.latest_step()

    def restore(self, template: TrainState, step: int | None = None) -> TrainState:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        self._mgr.wait_until_finished()  # never read a half-written step
        try:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        except Exception as first_err:
            # Toggling train.ema_decay across a resume changes the state
            # tree structure (ema_params subtree present/absent), which the
            # structure-matched restore rejects. Retry with the other
            # structure and reconcile:
            if getattr(template, "ema_params", None) is not None:
                # EMA enabled mid-run, checkpoint predates it: restore the
                # pre-EMA tree and seed the average from the restored
                # params (the warmup ramp re-converges within a few steps).
                base = template.replace(ema_params=None)
                restored = self._mgr.restore(
                    step, args=ocp.args.StandardRestore(base))
                return restored.replace(
                    ema_params=jax.tree.map(lambda p: p.copy(),
                                            restored.params))
            # EMA disabled mid-run, checkpoint carries it: restore with a
            # params-shaped ema template, then drop the average.
            with_ema = template.replace(
                ema_params=jax.tree.map(lambda p: p.copy(), template.params))
            try:
                restored = self._mgr.restore(
                    step, args=ocp.args.StandardRestore(with_ema))
            except Exception:
                raise first_err
            return restored.replace(ema_params=None)

    def restore_weights(self, step: int | None = None):
        """Template-free restore of just the eval weights: (params,
        batch_stats), preferring the EMA params when the checkpoint
        carries them. Unlike ``restore`` this needs NO TrainState template,
        so loading a checkpoint for inference does not require knowing the
        optimizer/schedule/EMA configuration it was trained with (an
        AdamW-trained checkpoint must be loadable by a default-config
        ``basi eval``)."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        self._mgr.wait_until_finished()
        raw = self._mgr.restore(step, args=ocp.args.StandardRestore(None))
        ema = raw.get("ema_params")
        params = ema if ema else raw["params"]
        return params, raw.get("batch_stats") or {}

    def maybe_resume(self, state: TrainState, resume: str = "auto") -> TrainState:
        """resume: 'auto' (newest valid step, fresh start if none) | 'none'
        | a digit string (explicit step in this manager's directory) | a
        checkpoint directory path (restore its newest step)."""
        if resume == "none":
            return state
        if resume == "auto":
            if self.latest_step() is None:
                return state
            return self.restore(state)
        if resume.isdigit():
            return self.restore(state, int(resume))
        if not os.path.isdir(resume):
            # CheckpointManager would mkdir the path; a typo'd resume value
            # must fail fast instead of leaving an empty orbax dir behind.
            raise FileNotFoundError(
                f"resume: no checkpoint directory at {resume!r}")
        other = CheckpointManager(resume)
        try:
            return other.restore(state)
        finally:
            other.close()

    def wait(self):
        """Barrier on in-flight async writes (no-op for sync saves). The
        preemption path calls this so the final save is durably committed
        before the process exits."""
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def export_params(path: str, params: Any, batch_stats: Any):
    """Standalone inference export (params only), orbax StandardCheckpointer."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), {"params": params, "batch_stats": batch_stats})
    ckptr.wait_until_finished()


def load_params(path: str, template: Any | None = None):
    ckptr = ocp.StandardCheckpointer()
    if template is None:
        return ckptr.restore(os.path.abspath(path))
    return ckptr.restore(os.path.abspath(path), template)

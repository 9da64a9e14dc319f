"""Training runner (SURVEY §2.12/§3.1): epoch loop, eval, checkpointing.

The hot loop is ONE jitted ``train_step`` (shard_map DP over the mesh when
more than one device is present); the host only feeds double-buffered uint8
batches and logs metrics. Per-epoch: val AP + checkpoint save, mirroring
the reference's per-epoch eval + ``torch.save``.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from basi_tpu.config import Config
from basi_tpu.data.datasets import make_dataset
from basi_tpu.data.pipeline import DeviceFeed
from basi_tpu.models.basi import create_model
from basi_tpu.parallel.mesh import make_mesh
from basi_tpu.train.state import create_train_state, make_optimizer
from basi_tpu.train.step import make_train_step
from basi_tpu.utils.checkpoint import CheckpointManager
from basi_tpu.utils.logging import MetricLogger
from basi_tpu.utils.profiling import StepTimer, maybe_trace


class Trainer:
    def __init__(self, cfg: Config):
        from basi_tpu.parallel.distributed import process_info

        self.cfg = cfg
        self.process_index, self.process_count = process_info()
        self.model = create_model(cfg.model)
        if cfg.train.remat:
            self.model = self.model.clone(remat=True)
        n_dev = cfg.parallel.num_devices or len(jax.devices())
        # Spatial (H-dim) sharding (SURVEY §5.7): parallel.spatial_axis +
        # spatial_shards build a 2D (data, spatial) mesh and route the
        # train step through the GSPMD spatial path (parallel/spatial.py —
        # XLA inserts the conv halo exchanges). make_mesh validates the
        # two knobs are set together.
        self.spatial = cfg.parallel.spatial_shards > 1
        self.mesh = (
            make_mesh(n_dev, cfg.parallel.data_axis,
                      spatial_axis=cfg.parallel.spatial_axis,
                      spatial_shards=cfg.parallel.spatial_shards)
            if n_dev > 1 or self.spatial else None
        )
        if self.spatial:
            if self.process_count > 1:
                raise ValueError(
                    "spatial sharding is single-host only (the feed's "
                    "process-row assembly assumes a 1D data mesh)")
            if cfg.data.multiscale:
                raise ValueError(
                    "parallel.spatial_shards > 1 is incompatible with "
                    "data.multiscale (per-step resolution changes re-tile "
                    "the spatial partition every scale)")
            if cfg.train.steps_per_dispatch > 1:
                raise ValueError(
                    "parallel.spatial_shards > 1 is incompatible with "
                    "train.steps_per_dispatch > 1 (the grouped-dispatch "
                    "scan wraps the shard_map step body; the spatial path "
                    "is a GSPMD program with its own input shardings)")
        if self.process_count > 1 and self.mesh is None:
            raise ValueError(
                "multi-process training needs a device mesh: "
                "parallel.num_devices must cover every process's devices")
        self.dataset = make_dataset(cfg.data, split="train")
        self.val_dataset = make_dataset(cfg.data, split="val")

        sharding = None
        if self.mesh is not None:
            mesh = self.mesh
            sp_axis = cfg.parallel.spatial_axis if self.spatial else None

            def sharding(v):  # noqa: F811 - batch-dim sharding per array
                if v.ndim == 0:  # scalars (e.g. num_real): replicate
                    return NamedSharding(mesh, P())
                if sp_axis and v.ndim == 4:
                    # The two 4D batch arrays shard their H dim spatially:
                    # image is NHWC (H at axis 1, C==3 — pack_s2d is off
                    # under spatial), masks are (N, M, H, W) (H at axis 2).
                    if v.shape[-1] == 3:
                        return NamedSharding(
                            mesh, P(cfg.parallel.data_axis, sp_axis))
                    return NamedSharding(
                        mesh, P(cfg.parallel.data_axis, None, sp_axis))
                return NamedSharding(
                    mesh, P(cfg.parallel.data_axis, *([None] * (v.ndim - 1)))
                )

        from basi_tpu.data.transforms import wants_s2d_feed

        self.feed = DeviceFeed(
            self.dataset, cfg.data.batch_size, shuffle=True,
            seed=cfg.train.seed, sharding=sharding,
            depth=cfg.data.prefetch_depth,
            # pack_s2d off under spatial: the GSPMD step takes the raw
            # NHWC image (its body runs the XLA reference ingest — a
            # Pallas custom call is opaque to the SPMD partitioner).
            pack_s2d=(wants_s2d_feed(self.model) and not cfg.data.multiscale
                      and not self.spatial),
            pack_masks=getattr(cfg.data, "pack_masks", False),
        )
        steps_per_epoch = self.feed.steps_per_epoch()
        if steps_per_epoch <= 0:
            # A dataset smaller than the batch yields ZERO batches with
            # drop_last — "training" would silently run 0 steps per epoch
            # and still write checkpoints of untouched weights.
            raise ValueError(
                f"dataset ({len(self.dataset)} samples) yields no full "
                f"batch of {cfg.data.batch_size}; shrink data.batch_size "
                f"or point data.root at the right split")
        self.max_steps = steps_per_epoch * cfg.train.epochs
        self.steps_per_epoch = steps_per_epoch

        self.tx, self.schedule = make_optimizer(cfg.train, self.max_steps)
        self.state = create_train_state(
            self.model, cfg.model, cfg.train, self.max_steps, tx=self.tx
        )
        if self.process_count > 1:
            # Replicate the (identically-seeded, hence identical) state
            # onto the GLOBAL mesh: jit can reshard a process-local array
            # onto a single-host mesh automatically, but a multi-host mesh
            # needs explicit global arrays (host value -> every device).
            from basi_tpu.parallel.dist_data import make_replicated_array

            rep = NamedSharding(self.mesh, P())
            host_state = jax.device_get(self.state)
            self.state = jax.tree.map(
                lambda x: make_replicated_array(x, rep), host_state)
            self._collective_barrier()
        if self.spatial:
            from basi_tpu.parallel.spatial import make_spatial_train_step

            self.train_step = make_spatial_train_step(
                self.model, self.tx, cfg.train, cfg.data, self.mesh,
                data_axis=cfg.parallel.data_axis,
                spatial_axis=cfg.parallel.spatial_axis,
            )
        else:
            self.train_step = make_train_step(
                self.model, self.tx, cfg.train, cfg.data,
                mesh=self.mesh, data_axis=cfg.parallel.data_axis,
            )
        self.ckpt = (
            CheckpointManager(
                cfg.train.checkpoint_dir,
                keep=cfg.train.keep_checkpoints,
                async_save=getattr(cfg.train, "async_checkpoint", False))
            if cfg.train.checkpoint_dir else None
        )
        if self.ckpt is not None:
            self.state = self.ckpt.maybe_resume(self.state, cfg.train.resume)
            if self.mesh is not None and self.process_count == 1:
                # Orbax restores arrays COMMITTED to one device (the
                # template's placement), while the feed's batches are
                # sharded over the mesh — jit refuses mixed committed
                # device sets, so a single-host multi-device resume would
                # crash on the first step. Re-place the restored state
                # replicated on the mesh (fresh-init state is uncommitted,
                # so the non-resume path auto-reshards and never hits
                # this). Multi-process restore already comes back global:
                # its template was replicated above.
                rep = NamedSharding(self.mesh, P())
                self.state = jax.device_put(self.state, rep)
        # Multi-process: metrics are identical on every process (replicated
        # step outputs); only process 0 writes the console/JSONL stream.
        log_here = self.process_index == 0
        self.logger = MetricLogger(cfg.metrics_path if log_here else "",
                                   console=log_here,
                                   tensorboard_dir=(cfg.tensorboard_dir
                                                    if log_here else ""))
        self.timer = StepTimer()
        import threading

        # Graceful-stop flag (train.save_on_preemption): polled by the
        # step loop; train() rebinds a fresh Event per run.
        self._preempt = threading.Event()

    def _group_step(self):
        """Lazily-built multi-step dispatch program (see step.py
        make_group_step); one function object, jit re-specializes per
        group arity so the epoch-tail size compiles separately."""
        fn = getattr(self, "_group_step_fn", None)
        if fn is None:
            from basi_tpu.train.step import make_group_step

            fn = self._group_step_fn = make_group_step(self.train_step)
        return fn

    def _sync_flag(self, flag: float) -> float:
        """psum a per-process scalar over the global mesh (every local
        device contributes ``flag``); returns the global sum. One tiny
        cached program — the collective agreement primitive behind both
        the startup barrier and the preemption-stop decision."""
        import numpy as np

        from basi_tpu.parallel.dist_data import (
            local_rows,
            make_global_batch_array,
        )

        axis = self.cfg.parallel.data_axis
        n = self.mesh.shape[axis]
        bsh = NamedSharding(self.mesh, P(axis))
        rows = local_rows(bsh, n)
        arr = make_global_batch_array(
            np.full((len(rows),), flag, np.float32), bsh, n, rows)
        fn = getattr(self, "_sync_flag_fn", None)
        if fn is None:
            fn = self._sync_flag_fn = jax.jit(
                jax.shard_map(lambda x: jax.lax.psum(x, axis),
                              mesh=self.mesh,
                              in_specs=P(axis), out_specs=P()),
                out_shardings=NamedSharding(self.mesh, P()),
            )
        return float(jax.device_get(fn(arr)))

    def _collective_barrier(self):
        """Form the global collective clique on a TRIVIAL psum before any
        heavyweight program runs. Collective-context rendezvous has a hard
        deadline (Gloo: 30 s) — if one process reaches the first train-step
        collective while a peer is still deep in XLA compilation, the
        rendezvous times out. A subsecond-compile barrier program brings
        every process to the rendezvous within seconds; the established
        clique is cached and reused by the real step. Doubles as a mesh
        health check: the psum must equal the data-axis size."""
        axis = self.cfg.parallel.data_axis
        n = self.mesh.shape[axis]
        total = self._sync_flag(1.0)
        if total != float(n):
            raise RuntimeError(
                f"mesh health check failed: psum of ones over {axis!r} "
                f"returned {total}, expected {n}")

    def _should_stop(self, boundary: int = -1) -> bool:
        """The preemption-stop decision, agreed across processes.

        The SIGTERM flag is per-process (a cluster may deliver eviction to
        one host first); acting on the LOCAL flag alone would have
        processes enter the collective checkpoint save at different
        host_steps — a deadlock during the grace window. Multi-process
        runs therefore psum the flag at dispatch boundaries (every process
        polls at the same loop points, so the collectives line up) and ALL
        stop iff ANY process was signalled, at the same step.
        Single-process keeps the free local check.

        ``boundary``: the in-epoch dispatch-boundary index. The psum fetch
        is a blocking device sync (device queues are FIFO, so the host
        waits for the just-dispatched group — ~30 ms on the axon relay);
        to keep the dispatch runahead, multi-process runs only poll the
        collective every ``train.stop_poll_steps`` steps' worth of
        boundaries and answer False in between (NOT the local flag: a
        one-process-local True would diverge the loops). -1 forces a poll
        (the per-epoch tail check)."""
        if self.process_count == 1 or self.mesh is None:
            return self._preempt.is_set()
        if boundary >= 0:
            group = max(1, self.cfg.train.steps_per_dispatch)
            every = max(1, -(-getattr(self.cfg.train, "stop_poll_steps", 16)
                             // group))
            if (boundary + 1) % every:
                return False
        return self._sync_flag(1.0 if self._preempt.is_set() else 0.0) > 0.0

    def close(self):
        """Release observability sinks (JSONL handle, TB writer thread)
        and barrier + close the checkpoint manager (an async in-flight
        save must commit before the owner's process exits, or the last
        epoch's checkpoint is silently lost). train() only FLUSHES so a
        Trainer stays reusable; the owner calls close() when done with it
        (cli cmd_train does). Idempotent."""
        self.logger.close()
        if self.ckpt is not None:
            self.ckpt.close()
            self.ckpt = None

    def train(self) -> dict:
        cfg = self.cfg
        start_step = int(jax.device_get(self.state.step))
        start_epoch = start_step // self.steps_per_epoch
        last_metrics: dict = {}
        host_step = start_step
        last_saved_step = start_step if start_step else -1
        steps_since_mark = 0
        restore_sigs = self._install_preempt_handler()
        try:
            return self._train_loop(
                cfg, start_epoch, host_step, last_saved_step,
                steps_since_mark, last_metrics)
        finally:
            restore_sigs()
            # Flush observability sinks: torch's SummaryWriter flushes on
            # a ~2-min daemon cadence with no atexit hook — without this
            # the final steps' scalars can never reach the event file.
            # flush, NOT close: a reused Trainer (in-process resume, a
            # second train() call) must keep logging.
            self.logger.flush()

    def _install_preempt_handler(self):
        """SIGTERM -> graceful preemption (TPU-pod eviction contract): set
        a flag the step loop polls; the loop then commits a checkpoint at
        the exact current step and train() returns. Installs only on the
        main thread (Python restricts signal.signal to it — a Trainer
        driven from a worker thread simply skips the handler); returns a
        restorer for the previous handler. The flag, not the handler, is
        the tested surface: anything may set ``_preempt`` (a cluster
        health watcher, a test) to request the same graceful stop."""
        import signal
        import threading

        self._preempt = threading.Event()
        if (not getattr(self.cfg.train, "save_on_preemption", True)
                or threading.current_thread() is not threading.main_thread()):
            return lambda: None
        prev = signal.signal(signal.SIGTERM,
                             lambda signum, frame: self._preempt.set())
        return lambda: signal.signal(signal.SIGTERM, prev)

    def _handle_preemption(self, host_step: int, epoch: int,
                           last_saved_step: int, last_metrics: dict) -> dict:
        """Commit state + observability, then hand back metrics with the
        preemption marker; the caller returns them from train()."""
        if self.ckpt is not None:
            if host_step != last_saved_step:
                self.ckpt.save(self.state)
            # Unconditional barrier: even when this exact step was already
            # saved, that save may be an async one still in flight — the
            # "durable before the process exits" guarantee must not depend
            # on the caller remembering close().
            self.ckpt.wait()
        rec = {"preempted_at_step": host_step, "epoch": epoch,
               "checkpoint_saved": self.ckpt is not None}
        self.logger.log(rec, prefix="[preempt]")
        return {**last_metrics, **rec}

    def _train_loop(self, cfg, start_epoch, host_step, last_saved_step,
                    steps_since_mark, last_metrics) -> dict:
        with maybe_trace(cfg.profile, cfg.profile_dir):
            for epoch in range(start_epoch, cfg.train.epochs):
                # Mid-epoch resume: batch order is (seed, epoch)-pure, so
                # skipping the first ``already`` batches reproduces the
                # exact remaining schedule instead of retraining them (and
                # overshooting max_steps / the poly LR schedule). The skip
                # happens at INDEX level inside the feed — skipped batches
                # are never decoded or uploaded.
                already = host_step - epoch * self.steps_per_epoch
                self.timer.mark()  # reset the window (eval/ckpt time out)
                steps_since_mark = 0
                group = max(1, cfg.train.steps_per_dispatch)
                buf: list = []

                def dispatch():
                    nonlocal host_step, steps_since_mark, last_metrics
                    nonlocal last_saved_step
                    if not buf:
                        return
                    prev_step = host_step
                    if len(buf) == 1:
                        self.state, metrics = self.train_step(
                            self.state, buf[0])
                    else:
                        # One program runs the whole group as a scan:
                        # per-dispatch overhead (relay/launch) is paid once
                        # per group. The epoch tail may be a smaller group
                        # (jit re-specializes per arity, compiled once).
                        self.state, metrics = self._group_step()(
                            self.state, *buf)
                        metrics = {k: v[-1] for k, v in metrics.items()}
                    # Track steps on the host: fetching state.step would
                    # force a device sync EVERY dispatch (~30 ms on the
                    # axon relay), serializing the pipeline.
                    host_step += len(buf)
                    steps_since_mark += len(buf)
                    buf.clear()
                    step = host_step
                    every = cfg.train.log_every
                    if (step // every != prev_step // every
                            or step == self.max_steps):
                        # fetch BEFORE marking time: device_get is the only
                        # reliable sync on this backend (see bench.py note)
                        fetched = {k: float(jax.device_get(v))
                                   for k, v in metrics.items()}
                        ms = self.timer.mark()
                        nsteps = max(1, steps_since_mark)
                        steps_since_mark = 0
                        lr = float(self.schedule(step))
                        rec = {
                            "step": step, "epoch": epoch,
                            "lr": round(lr, 6),
                            "step_ms": round(ms / nsteps, 2),
                            "imgs_per_s": round(
                                cfg.data.batch_size * nsteps
                                / max(ms / 1000.0, 1e-9), 1)
                            if ms > 0 else 0.0,
                        }
                        rec.update(fetched)
                        self.logger.log(rec, prefix="[train]")
                        last_metrics = rec
                    ckpt_every = cfg.train.checkpoint_every_steps
                    if (self.ckpt is not None and ckpt_every
                            and step // ckpt_every != prev_step // ckpt_every):
                        self.ckpt.save(self.state)
                        last_saved_step = step

                # Preemption is polled ONLY at dispatch boundaries (right
                # after a group ran): (i) multi-process polling is a
                # collective (_should_stop), so every process must poll at
                # identical loop points; (ii) a flag raised mid-buffer is
                # answered at the NEXT boundary, so the preempt path never
                # dispatches a partial group — an arbitrary arity would be
                # a fresh XLA compile under the SIGTERM grace deadline.
                # Latency cost: at most one group (<1 s) before the stop.
                boundary = 0
                for batch in self.feed.epoch(epoch, skip=already):
                    buf.append(batch)
                    if len(buf) == group:
                        dispatch()
                        if self._should_stop(boundary):
                            return self._handle_preemption(
                                host_step, epoch, last_saved_step,
                                last_metrics)
                        boundary += 1
                dispatch()  # epoch tail (its arity compiles once, reused
                # every epoch — not a preempt-path-only compile)
                if self._should_stop():
                    return self._handle_preemption(
                        host_step, epoch, last_saved_step, last_metrics)
                # per-epoch: eval + checkpoint (reference behavior); skip if
                # the in-loop save already wrote this step (orbax raises
                # StepAlreadyExistsError on a duplicate step).
                eval_metrics = self.evaluate()
                self.logger.log({"epoch": epoch, **eval_metrics}, prefix="[val]")
                if self.ckpt is not None and host_step != last_saved_step:
                    self.ckpt.save(self.state)
                    last_saved_step = host_step
                last_metrics.update(eval_metrics)
        return last_metrics

    def evaluate(self, max_batches: int = 0, use_ema: bool | None = None) -> dict:
        from basi_tpu.infer import Inferencer

        # EMA weights (train.ema_decay > 0) are the eval weights by
        # default — keeping a smoothed copy and then evaluating the raw
        # one would defeat its purpose. Batch stats stay the live running
        # statistics (they are already an EMA by construction).
        if use_ema is None:
            use_ema = self.state.ema_params is not None
        params = self.state.ema_params if use_ema else self.state.params
        # Build the Inferencer ONCE and swap weights per epoch: jax.jit
        # caches per function object, so a fresh Inferencer every epoch
        # would retrace + recompile the whole eval program each time.
        inf = getattr(self, "_inferencer", None)
        if inf is None:
            inf = self._inferencer = Inferencer(
                self.cfg, model=self.model,
                params=params, batch_stats=self.state.batch_stats,
                mesh=self.mesh, data_axis=self.cfg.parallel.data_axis,
                spatial_axis=(self.cfg.parallel.spatial_axis
                              if self.spatial else ""),
            )
        else:
            inf.set_weights(params, self.state.batch_stats)
        return inf.evaluate(self.val_dataset, max_batches=max_batches)

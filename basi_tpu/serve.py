"""Production serving: fixed-batch, scan-amortized predictor.

The reference has no serving story (research scripts); this module is the
deployment-facing API the north star's "production serving" goal implies:

  * fixed batch + fixed shapes -> one compiled program, reused forever
  * requests queue on the host; a worker thread packs them into batches
    (padding the tail) and runs the jitted pipeline
  * per-dispatch relay/driver overhead amortizes over the whole batch; for
    bulk/offline scoring, ``predict_many`` scans multiple batches inside
    ONE program execution (see bench.py methodology notes)
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from basi_tpu.config import Config
from basi_tpu.infer import Inferencer


@dataclass
class Prediction:
    masks: np.ndarray  # (K, H/4, W/4) probabilities
    scores: np.ndarray  # (K,)


class _AotBackend:
    """Inferencer-shaped adapter over a loaded AOT artifact (convert/aot.py).

    ``run_fn``/``predict_batch`` invoke the deserialized program — an
    ``Exported.call`` is traceable, so it composes into the predictor's
    scan programs exactly like a live forward. Weights live INSIDE the
    artifact; params/batch_stats are empty sentinels to satisfy the shared
    calling convention. ``full_res_masks`` reuses the library's fused
    upsample (weight-free, not part of the artifact's contract)."""

    def __init__(self, model):
        import jax

        from basi_tpu.ops.pallas.upsample_sigmoid import (
            upsample_sigmoid,
            upsample_sigmoid_reference,
        )

        self._model = model
        self.meta = model.meta
        self.params = {}
        self.batch_stats = {}
        size = int(model.meta["model_size"])

        def run_fn(params, batch_stats, images_u8):
            return model.exported.call(images_u8)

        self.run_fn = run_fn
        up = (upsample_sigmoid if jax.default_backend() == "tpu"
              else upsample_sigmoid_reference)

        @jax.jit
        def full(probs):
            p32 = jnp.clip(probs.astype(jnp.float32), 1e-6, 1 - 1e-6)
            logits = (jnp.log(p32) - jnp.log1p(-p32)).astype(probs.dtype)
            return up(logits, (size, size))

        self.full_res_masks = full

    def predict_batch(self, images_u8):
        return self._model.exported.call(images_u8)


class BatchedPredictor:
    """Thread-safe request batcher over a compiled BASI pipeline."""

    def __init__(self, cfg: Config, checkpoint: str = "",
                 max_wait_ms: float = 5.0, max_pending: int = 256,
                 aot_path: str = ""):
        """``aot_path``: serve a ``basi export --aot`` artifact instead of
        a checkpoint — batch size and model size come from the artifact's
        sidecar (they are baked into the program's static shapes); the
        host feed stays raw 3-channel uint8 per the AOT contract."""
        if aot_path:
            from basi_tpu.convert.aot import load_serving

            self.inf = _AotBackend(load_serving(aot_path))
            self.batch = int(self.inf.meta["batch_size"])
            self.size = int(self.inf.meta["model_size"])
            self._pack_s2d = False
        else:
            self.inf = Inferencer(cfg, checkpoint=checkpoint)
            self.batch = cfg.infer.batch_size
            self.size = cfg.model.image_size
            # s2d models take the host-packed feed format: same bytes, zero
            # device-side reorder copies (transforms.space_to_depth_host).
            from basi_tpu.data.transforms import wants_s2d_feed

            self._pack_s2d = wants_s2d_feed(cfg.model)
        self.max_wait = max_wait_ms / 1000.0
        self._scan_cache: dict = {}
        # Bounded: an unbounded queue would buffer a caller burst into
        # unbounded host memory while the device falls behind; callers past
        # ``max_pending`` block (up to their timeout) — backpressure, not
        # OOM. The lock closes the check-then-act race between predict's
        # _stop check + enqueue and close's drain: without it a request
        # could slip into the queue after the drain and hang forever.
        self._q: queue.Queue = queue.Queue(maxsize=max_pending)
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def predict(self, image_u8: np.ndarray,
                timeout: float | None = None) -> Prediction:
        """Blocking single-image API; batching happens transparently.

        ``timeout`` (seconds) bounds the WHOLE call — enqueue backpressure
        plus device execution. On expiry raises TimeoutError (a still-
        queued request may later be served and discarded; nothing leaks).
        A dead worker raises RuntimeError instead of hanging the caller.
        """
        import time

        if image_u8.shape != (self.size, self.size, 3):
            raise ValueError(f"expected ({self.size},{self.size},3) uint8")
        if image_u8.dtype != np.uint8:
            # a float image would be silently value-truncated by the uint8
            # batch buffer and produce confident garbage
            raise ValueError(f"expected uint8 pixels, got {image_u8.dtype}")
        deadline = None if timeout is None else time.perf_counter() + timeout
        done = threading.Event()
        slot: list = [None]
        item = (image_u8, slot, done)
        while True:  # enqueue with backpressure
            with self._lock:
                if self._stop.is_set():
                    raise RuntimeError("predictor is closed")
                try:
                    self._q.put_nowait(item)
                    break
                except queue.Full:
                    pass
            if not self._worker.is_alive():
                raise RuntimeError("predictor worker died")
            if deadline is not None and time.perf_counter() >= deadline:
                raise TimeoutError(
                    f"predict: request queue full ({self._q.maxsize} "
                    f"pending) for {timeout}s")
            time.sleep(0.002)
        while not done.wait(0.1):  # await result, noticing a dead worker
            if not self._worker.is_alive() and not done.is_set():
                raise RuntimeError(
                    "predictor worker died with this request pending")
            if deadline is not None and time.perf_counter() >= deadline:
                raise TimeoutError(f"predict: no result within {timeout}s")
        if isinstance(slot[0], BaseException):
            raise slot[0]
        return slot[0]

    def _run_scan_fn(self, scan_batches: int):
        """One compiled scan program per scan width, built once and reused
        (a per-call @jax.jit closure would retrace + recompile every
        predict_many invocation — jit caches by function identity)."""
        cached = self._scan_cache.get(scan_batches)
        if cached is not None:
            return cached
        run = self.inf.run_fn

        @jax.jit
        def run_scan(params, stats, group_batches):
            def body(_, b):
                masks, scores, _ = run(params, stats, b)
                return 0.0, (masks, scores)
            _, out = jax.lax.scan(body, 0.0, group_batches)
            return out

        self._scan_cache[scan_batches] = run_scan
        return run_scan

    def predict_many(self, images_u8: np.ndarray, scan_batches: int = 32):
        """Bulk scoring: (N, H, W, 3) -> list[Prediction]. N is padded up to
        a multiple of batch*scan_batches and processed with one program
        execution per scan group. Only one GROUP is resident on device at a
        time, so bulk size is bounded by host RAM, not HBM. The default
        scan width amortizes the ~25-30 ms per-dispatch relay round trip
        to <0.1 ms/batch (measured: 32-batch scans still paid ~0.9 ms/batch
        — see basi_tpu.benchmark)."""
        n = len(images_u8)
        group = self.batch * scan_batches
        padded = -(-n // group) * group
        buf = np.zeros((padded, self.size, self.size, 3), np.uint8)
        buf[:n] = images_u8
        if self._pack_s2d:
            from basi_tpu.data.transforms import space_to_depth_host

            buf = space_to_depth_host(buf)
        host_batches = buf.reshape(-1, self.batch, *buf.shape[1:])

        run_scan = self._run_scan_fn(scan_batches)
        preds = []
        for g in range(padded // group):
            dev = jnp.asarray(
                host_batches[g * scan_batches:(g + 1) * scan_batches])
            masks, scores = run_scan(self.inf.params, self.inf.batch_stats, dev)
            masks = np.asarray(jax.device_get(masks)).reshape(
                group, *masks.shape[2:])
            scores = np.asarray(jax.device_get(scores)).reshape(group, -1)
            preds.extend(Prediction(m, s) for m, s in zip(masks, scores))
        return preds[:n]

    def _loop(self):
        try:
            self._loop_inner()
        finally:
            # The worker is exiting — orderly (close) or by a bug escaping
            # _loop_inner. Either way nothing will ever serve the queue
            # again: fail the stragglers instead of hanging their callers.
            self._drain_fail("predictor worker exited")

    def _loop_inner(self):
        while not self._stop.is_set():
            items = []
            try:
                items.append(self._q.get(timeout=0.1))
            except queue.Empty:
                continue
            # Opportunistically fill the batch within the latency budget.
            import time

            deadline = time.perf_counter() + self.max_wait
            while len(items) < self.batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    items.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            try:
                # packing inside the try too: a packing error must fail
                # these requests, not kill the worker and hang the callers
                buf = np.zeros((self.batch, self.size, self.size, 3),
                               np.uint8)
                for i, (img, _, _) in enumerate(items):
                    buf[i] = img
                if self._pack_s2d:
                    from basi_tpu.data.transforms import space_to_depth_host

                    buf = space_to_depth_host(buf)
                masks, scores, _ = self.inf.predict_batch(jnp.asarray(buf))
                masks = np.asarray(jax.device_get(masks))
                scores = np.asarray(jax.device_get(scores))
                for i, (_, slot, done) in enumerate(items):
                    slot[0] = Prediction(masks[i], scores[i])
                    done.set()
            except BaseException as e:  # propagate to callers
                for _, slot, done in items:
                    slot[0] = e
                    done.set()

    def close(self):
        with self._lock:
            # Under the same lock as predict's check+enqueue: once set, no
            # new request can slip into the queue behind the drain.
            self._stop.set()
        self._worker.join(timeout=2)
        self._drain_fail("predictor closed")

    def _drain_fail(self, reason: str):
        """Fail every queued request — its caller is blocked on done.wait()
        and nothing will ever serve it. Idempotent (worker-exit + close
        may both drain)."""
        while True:
            try:
                _, slot, done = self._q.get_nowait()
            except queue.Empty:
                break
            slot[0] = RuntimeError(reason)
            done.set()

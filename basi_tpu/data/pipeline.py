"""Overlapped host ingest -> double-buffered device feed (SURVEY §3.1).

The reference's DataLoader worker *processes* become a host thread pool
(the native decoder releases the GIL) plus a bounded queue of device-side
batches: while the TPU runs step N, the host decodes N+1 and the transfer
engine uploads it. Raw uint8 ships to the device; normalization and
augmentation happen on-device in the jitted step (fused Pallas kernel).

Determinism (SURVEY §5.2): batch order is a pure function of (seed, epoch);
``debug_sync=True`` runs ingest single-threaded on the caller's thread to
bisect nondeterminism.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax
import numpy as np

from basi_tpu.data.datasets import iter_epoch


class DeviceFeed:
    """Background-thread prefetcher producing device-resident batches."""

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = True,
                 seed: int = 0, sharding=None, depth: int = 2,
                 drop_last: bool = True, debug_sync: bool = False,
                 pack_s2d: bool = False, pack_masks: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.sharding = sharding
        self.depth = max(1, depth)
        self.drop_last = drop_last
        self.debug_sync = debug_sync
        # Ship images pre-packed in the s2d stem's (N, H/2, W/2, 12) uint8
        # layout: same bytes, zero device-side reorder copies (the train
        # twin of the inference host-packed feed; the fused ingest kernel
        # flips packed batches analytically).
        self.pack_s2d = pack_s2d
        # Bit-pack GT masks along W before upload (data.pack_masks): 8x
        # fewer host->device bytes — the dominant train-batch traffic —
        # unpacked on-device by the step (transforms.maybe_unpack_masks).
        self.pack_masks = pack_masks
        # Multi-host feed (SURVEY §5.8): with >1 process, this process
        # decodes only the global-batch rows that land on its own devices
        # and assembles global jax.Arrays from per-device shards. Rows are
        # derived from the sharding itself, so any mesh device order works.
        self._rows = None
        if sharding is not None and jax.process_count() > 1:
            from basi_tpu.parallel.dist_data import local_rows

            row_sh = sharding(np.zeros((batch_size,), np.int32))
            self._rows = local_rows(row_sh, batch_size)

    def _put_device(self, batch: dict[str, np.ndarray]):
        if self.pack_s2d and batch["image"].shape[-1] == 3:
            from basi_tpu.data.transforms import space_to_depth_host

            batch = dict(batch)
            batch["image"] = space_to_depth_host(batch["image"])
        if self.pack_masks and "masks" in batch:
            from basi_tpu.data.transforms import pack_masks_host

            batch = dict(batch)
            batch["masks"] = pack_masks_host(batch["masks"])
        if self.sharding is None:
            return {k: jax.device_put(v) for k, v in batch.items()}
        if self._rows is not None:
            from basi_tpu.parallel.dist_data import (
                make_global_batch_array,
                make_replicated_array,
            )

            put = {}
            for k, v in batch.items():
                sh = self.sharding(v)
                if getattr(v, "ndim", 0) == 0:
                    put[k] = make_replicated_array(v, sh)
                else:
                    put[k] = make_global_batch_array(
                        v, sh, self.batch_size, self._rows)
            return put
        put = {}
        for k, v in batch.items():
            put[k] = jax.device_put(v, self.sharding(v))
        return put

    def epoch(self, epoch_idx: int, skip: int = 0) -> Iterator[dict]:
        host_iter = iter_epoch(
            self.dataset, self.batch_size, self.shuffle,
            seed=self.seed + epoch_idx, drop_last=self.drop_last,
            skip=skip, rows=self._rows,
        )
        if self.debug_sync:
            for hb in host_iter:
                yield self._put_device(hb)
            return

        q: queue.Queue = queue.Queue(maxsize=self.depth)
        _SENTINEL = object()
        abandoned = threading.Event()

        def _put(item) -> bool:
            # Bounded put that notices an abandoned consumer: if the
            # consumer stops iterating (train-step exception, interrupt),
            # a plain q.put would block this thread forever, pinning
            # depth+1 device batches of HBM per abandoned epoch.
            while not abandoned.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for hb in host_iter:
                    # device_put is async; the transfer overlaps compute and
                    # the bounded queue enforces the double-buffer depth.
                    if not _put(self._put_device(hb)):
                        return
            except BaseException as e:  # surface worker errors to consumer
                _put(e)
                return
            _put(_SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            abandoned.set()
            while not q.empty():  # release device references promptly
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=5)

    def steps_per_epoch(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

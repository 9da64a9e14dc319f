"""Disk-backed native-resolution GT cache for original-frame eval.

The reference's eval protocol pastes predictions to ORIGINAL resolution and
matches against native GT (SURVEY §3.2/§3.5). Round 4 measured that path at
2-3.5 imgs/s: ``dataset.get_orig_masks`` regenerates the procedural scene
(SyntheticDataset, ~4 imgs/s) or re-decodes mask PNGs (FolderDataset) on
the host PER IMAGE, inside the eval dispatch loop (VERDICT r4 weak #2).

This cache materializes every val image's native GT ONCE — bit-packed
along W (np.packbits, 8x smaller; same scheme as data.pack_masks) — into a
single uncompressed ``.npz`` keyed by the dataset's identity, then serves
``get_packed(i)`` at mmap/page-cache speed. The eval path assembles a
bit-packed GT canvas per batch (8x less host memcpy AND 8x less
host->device upload) and unpacks on device (transforms.unpack_masks —
elementwise shifts, ~free).

Lossless: masks are binary by contract, so pack/unpack round-trips
bitwise (tests pin the cached eval against the regeneration path).
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np


def dataset_cache_key(dataset) -> str | None:
    """Stable identity string for a dataset's native GT, or None when no
    safe key exists (-> caching disabled for that dataset)."""
    # Match by MRO name so subclasses inherit their base's key scheme
    # (and so this module needs no imports from datasets.py).
    names = [c.__name__ for c in type(dataset).__mro__]
    name = next((n for n in names
                 if n in ("SyntheticDataset", "FolderDataset",
                          "CocoDataset")), None)
    if name == "SyntheticDataset":
        return json.dumps([name, dataset.n, dataset.size,
                           dataset.max_instances, dataset.seed,
                           dataset.orig_max_scale])
    if name == "CocoDataset":
        # GT comes entirely from the annotation JSON; its path + mtime +
        # the assembly knobs identify it.
        ann = getattr(dataset, "ann_path", "")
        try:
            mtime = os.path.getmtime(ann) if ann else -1.0
        except OSError:
            mtime = -1.0
        return json.dumps([name, dataset.size, dataset.max_instances,
                           getattr(dataset, "include_crowd", False),
                           ann, mtime, len(dataset)])
    if name == "FolderDataset":
        # Mask files define the GT; key on their paths + mtimes + the
        # assembly knobs so edited annotations invalidate the cache.
        sig = []
        for i in range(len(dataset.names)):
            stem = os.path.splitext(dataset.names[i])[0]
            kind, paths = dataset._mask_jobs(stem)
            for p in paths:
                try:
                    sig.append((p, os.path.getmtime(p)))
                except OSError:
                    sig.append((p, -1.0))
        return json.dumps([name, dataset.size, dataset.max_instances, sig])
    if hasattr(dataset, "native_gt_key"):
        return json.dumps([name, dataset.native_gt_key()])
    return None


class NativeGTCache:
    """Per-image bit-packed native GT, built once and read lazily.

    File layout: ``<dir>/<sha1(key)>.npz`` (uncompressed — np.load reads
    entries lazily) with per-index arrays ``m<i>`` (M, H, ceil(W/8)) u8 and
    ``v<i>`` (M,) u8, plus ``hw`` (n, 2) i32 native dims, plus a sidecar
    ``.json`` carrying the full key for collision honesty.
    """

    def __init__(self, dataset, cache_dir: str):
        self.dataset = dataset
        key = dataset_cache_key(dataset)
        self._npz = None
        self._mem: dict[int, tuple] = {}
        if key is None or not cache_dir:
            self.path = ""
            return
        digest = hashlib.sha1(key.encode()).hexdigest()[:16]
        os.makedirs(cache_dir, exist_ok=True)
        self.path = os.path.join(cache_dir, f"native_gt_{digest}.npz")
        meta = self.path + ".json"
        if os.path.isfile(self.path) and os.path.isfile(meta):
            with open(meta) as f:
                if f.read() == key:
                    self._npz = np.load(self.path)
                    return
        self._build(key)

    def _build(self, key: str):
        n = len(self.dataset)
        arrays: dict[str, np.ndarray] = {}
        hw = np.zeros((n, 2), np.int32)
        for i in range(n):
            masks, valid = self.dataset.get_orig_masks(i)
            hw[i] = masks.shape[1], masks.shape[2]
            arrays[f"m{i}"] = np.packbits(masks > 0, axis=-1)
            arrays[f"v{i}"] = np.asarray(valid, np.uint8)
        arrays["hw"] = hw
        tmp = self.path + ".tmp.npz"
        np.savez(tmp, **arrays)  # uncompressed: lazy per-entry reads
        os.replace(tmp, self.path)
        with open(self.path + ".json", "w") as f:
            f.write(key)
        self._npz = np.load(self.path)

    def get_packed(self, i: int):
        """(packed (M, H, ceil(W/8)) u8, valid (M,) u8, (oh, ow))."""
        if self._npz is not None:
            hw = self._npz["hw"][i]
            return (self._npz[f"m{i}"], self._npz[f"v{i}"],
                    (int(hw[0]), int(hw[1])))
        # No disk key: memoize in RAM so repeated evals in one process
        # still skip the regeneration (bounded by the val-set size).
        hit = self._mem.get(i)
        if hit is None:
            masks, valid = self.dataset.get_orig_masks(i)
            hit = (np.packbits(masks > 0, axis=-1),
                   np.asarray(valid, np.uint8),
                   (masks.shape[1], masks.shape[2]))
            self._mem[i] = hit
        return hit

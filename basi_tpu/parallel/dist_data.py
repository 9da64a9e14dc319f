"""Process-aware global-batch assembly (SURVEY §5.8: multi-host feed).

On a multi-host slice each process sees only its addressable devices, so
the host pipeline must (a) decode ONLY the batch rows that land on this
process's devices and (b) stitch those local rows into global
batch-sharded ``jax.Array``s. The row->process mapping is derived from
the sharding itself (``addressable_devices_indices_map``), so any mesh
device order — including topology-permuted meshes from
``mesh_utils.create_device_mesh`` — feeds correctly; nothing assumes
process-contiguous device ids.

Single-process meshes degenerate cleanly: ``local_rows`` returns every
row and assembly is equivalent to a sharded ``device_put``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding


def _slice_bounds(sl: slice, size: int) -> tuple[int, int]:
    return (0 if sl.start is None else int(sl.start),
            size if sl.stop is None else int(sl.stop))


def local_rows(row_sharding: NamedSharding, global_batch: int) -> np.ndarray:
    """Sorted global batch-row indices owned by THIS process.

    ``row_sharding``: the batch-dim sharding as applied to a 1-D (B,)
    array (i.e. ``NamedSharding(mesh, P(data_axis))``).
    """
    imap = row_sharding.addressable_devices_indices_map((global_batch,))
    segs = [np.arange(*_slice_bounds(idx[0], global_batch))
            for idx in imap.values()]
    if not segs:
        return np.zeros((0,), np.int64)
    return np.unique(np.concatenate(segs))


def make_global_batch_array(local: np.ndarray, sharding: NamedSharding,
                            global_batch: int, rows: np.ndarray) -> jax.Array:
    """Assemble a global batch-sharded array from this process's rows.

    ``local``: (len(rows), ...) host data for the (sorted) global rows in
    ``rows``. Each addressable device's shard is a contiguous run of the
    global batch dim, hence a contiguous run of ``rows`` — located with
    searchsorted, uploaded per device, and bound into one global Array.
    """
    if len(local) != len(rows):
        raise ValueError(f"local rows {len(local)} != row map {len(rows)}")
    gshape = (global_batch,) + tuple(local.shape[1:])
    imap = sharding.addressable_devices_indices_map(gshape)
    shards = []
    for dev, idx in imap.items():
        start, stop = _slice_bounds(idx[0], global_batch)
        lo = int(np.searchsorted(rows, start))
        hi = int(np.searchsorted(rows, stop))
        if hi - lo != stop - start:
            raise ValueError(
                f"process rows {rows} do not cover shard [{start}:{stop}) "
                f"of device {dev} — feed rows and mesh sharding disagree")
        shards.append(jax.device_put(local[lo:hi], dev))
    return jax.make_array_from_single_device_arrays(gshape, sharding, shards)


def make_replicated_array(value, sharding: NamedSharding) -> jax.Array:
    """Fully-replicated global array from a host value every process holds
    (e.g. the ``num_real`` scalar): one copy per addressable device."""
    value = np.asarray(value)
    shards = [jax.device_put(value, d)
              for d in sorted(sharding.addressable_devices, key=lambda d: d.id)]
    return jax.make_array_from_single_device_arrays(
        value.shape, sharding, shards)

"""Mesh construction and sharding helpers (SURVEY §5.8).

Primary axis: ``data`` (batch DP; gradients psum over ICI). Optional
``spatial`` axis shards the image H dimension for very-large-image
inference (the honest analogue of sequence parallelism for a CNN — SURVEY
§5.7); convolution halo exchange is handled by XLA's SPMD partitioner when
we annotate shardings, so no hand-written halo pass is needed.

Multi-host (v4-32-style) runs call ``jax.distributed.initialize`` first;
``jax.devices()`` then spans all hosts and DCN is used between slices
automatically by the PJRT runtime.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: int = 0,
    data_axis: str = "data",
    spatial_axis: str = "",
    spatial_shards: int = 1,
) -> Mesh:
    """Build a (data[, spatial]) mesh over the available devices."""
    devices = jax.devices()
    if num_devices:
        if len(devices) < num_devices:
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devices)} devices are visible: {devices}. For a "
                f"virtual multi-device test mesh set jax_platforms=cpu and "
                f"jax_num_cpu_devices={num_devices} before backend init."
            )
        devices = devices[:num_devices]
    n = len(devices)
    if spatial_axis and spatial_shards > 1:
        if n % spatial_shards:
            raise ValueError(f"{n} devices not divisible by {spatial_shards}")
        arr = np.asarray(devices).reshape(n // spatial_shards, spatial_shards)
        return Mesh(arr, (data_axis, spatial_axis))
    return Mesh(np.asarray(devices), (data_axis,))


def local_batch_size(global_batch: int, mesh: Mesh, data_axis: str = "data") -> int:
    n = mesh.shape[data_axis]
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} devices")
    return global_batch // n


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

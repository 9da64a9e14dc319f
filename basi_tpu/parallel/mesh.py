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
    if bool(spatial_axis) != (spatial_shards > 1):
        # A named-but-unsharded (or sharded-but-unnamed) spatial axis would
        # silently build a data-only mesh; downstream P(data, spatial)
        # specs then fail far from the misconfiguration.
        raise ValueError(
            f"inconsistent spatial config: spatial_axis={spatial_axis!r}, "
            f"spatial_shards={spatial_shards} (set both or neither)")
    if spatial_axis:
        if n % spatial_shards:
            raise ValueError(f"{n} devices not divisible by {spatial_shards}")
        shape = (n // spatial_shards, spatial_shards)
        axes = (data_axis, spatial_axis)
    else:
        shape = (n,)
        axes = (data_axis,)
    try:
        # ICI-topology-aware assignment: spatial-neighbor shards exchange
        # conv halos every layer, so they should be physically adjacent.
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception:  # virtual/odd device sets: plain enumeration order
        arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axes)


def local_batch_size(global_batch: int, mesh: Mesh, data_axis: str = "data") -> int:
    n = mesh.shape[data_axis]
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by the {n}-shard "
            f"{data_axis!r} mesh axis")
    return global_batch // n


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

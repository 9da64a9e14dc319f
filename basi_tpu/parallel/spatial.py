"""Spatial (H-dim) sharding — the CNN analogue of sequence parallelism.

SURVEY §5.7: this model has no sequence axis; the honest way to "scale the
context" is sharding the image plane of very large inputs across chips. We
annotate the image H dimension with a mesh axis and let XLA's SPMD
partitioner insert the convolution halo exchanges over ICI — no manual
ppermute needed (hand-written halos only win for custom kernels; XLA
already emits the minimal collective-permute pattern for conv).

Use a (data, spatial) mesh: batch shards over ``data``, rows over
``spatial``. BatchNorm in inference mode is per-pixel, GroupNorm reduces
over the full image — XLA inserts the cross-shard reductions automatically
because the shardings are declared, not hand-implemented.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_forward_fn(model, mesh: Mesh, data_axis: str = "data",
                       spatial_axis: str = "spatial"):
    """Jitted inference forward with batch+row sharding.

    Returns fn(params, batch_stats, images_NHWC) -> BASIOutputs with inputs
    constrained to P(data, spatial) over (N, H) and replicated params.
    """
    img_sharding = NamedSharding(mesh, P(data_axis, spatial_axis, None, None))
    rep = NamedSharding(mesh, P())

    @jax.jit
    def fwd(params, batch_stats, images):
        images = jax.lax.with_sharding_constraint(images, img_sharding)
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, images, False
        )

    def run(params, batch_stats, images):
        params = jax.device_put(params, rep)
        batch_stats = jax.device_put(batch_stats, rep)
        images = jax.device_put(images, img_sharding)
        return fwd(params, batch_stats, images)

    return run

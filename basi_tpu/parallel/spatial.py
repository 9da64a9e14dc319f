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


def make_spatial_train_step(model, tx, cfg_train, cfg_data, mesh: Mesh,
                            data_axis: str = "data",
                            spatial_axis: str = "spatial",
                            donate: bool = True):
    """Jitted train step over a 2D (data, spatial) mesh — GSPMD style.

    Unlike the shard_map DP step (train/step.py), this uses global-array
    semantics: images shard as P(data, spatial) over (N, H), params stay
    replicated, and the partitioner derives every collective — conv halo
    exchanges over the row boundary, BatchNorm's cross-shard (N, H, W)
    moment reductions, and the replicated-gradient all-reduce. The loss is
    the mesh=None path's global normalization, which under global semantics
    IS the global loss, so results match the unsharded step exactly
    (tested on the 8-device CPU mesh at (2, 4)).

    The Pallas ingest kernel is forced off: a custom call is an opaque
    unit to the SPMD partitioner and would force a full re-gather of the
    sharded image; the XLA reference ingest partitions elementwise.
    """
    import functools

    from basi_tpu.train.step import make_train_step

    body = make_train_step(model, tx, cfg_train, cfg_data, mesh=None,
                           donate=False, use_pallas=False).body
    rep = NamedSharding(mesh, P())
    batch_shardings = {
        # masks are (N, M, H, W): rows shard on axis 2
        "image": NamedSharding(mesh, P(data_axis, spatial_axis, None, None)),
        "masks": NamedSharding(mesh, P(data_axis, None, spatial_axis, None)),
        "valid": NamedSharding(mesh, P(data_axis, None)),
    }

    @functools.partial(
        jax.jit,
        in_shardings=(rep, batch_shardings),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else (),
    )
    def _jit_step(state, batch):
        return body(state, batch)

    def train_step(state, batch):
        # Subselect OUTSIDE the jit: in_shardings is matched against the
        # input pytree before the body runs, so pipeline batches carrying
        # extra host-side keys (orig_hw/valid_hw/num_real) would otherwise
        # fail the pytree-structure check.
        return _jit_step(state, {k: batch[k] for k in ("image", "masks", "valid")})

    train_step.batch_shardings = batch_shardings  # for callers' device_put
    return train_step


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

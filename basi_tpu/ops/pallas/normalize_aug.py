"""Fused uint8 -> normalized-float ingest kernel with on-device flip aug.

The reference normalizes and augments on the host inside DataLoader workers
(SURVEY §2.5/§3.3). TPU-native redesign: the host ships raw uint8 RGB
batches (4x less PCIe/HBM traffic than float32) and this kernel fuses
  uint8 -> f32/255 -> (x - mean) / std -> optional horizontal flip
in a single VMEM pass per image. The flip decision is a per-image scalar
prefetched to SMEM, so augmentation is deterministic given the PRNG-derived
flags computed in the jitted train step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def normalize_and_flip(
    images_u8: jnp.ndarray,
    flip: jnp.ndarray,
    mean: tuple[float, float, float] = (0.485, 0.456, 0.406),
    std: tuple[float, float, float] = (0.229, 0.224, 0.225),
    interpret: bool = False,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Normalize a uint8 NHWC batch and flip images where ``flip`` is set.

    images_u8: (N, H, W, 3) uint8; flip: (N,) int32 0/1.
    Returns (N, H, W, 3) in ``out_dtype``.
    """
    n, h, w, c = images_u8.shape
    mean_a = jnp.asarray(mean, jnp.float32)
    std_a = jnp.asarray(std, jnp.float32)
    inv_std = (1.0 / std_a).reshape(1, 1, 1, c)
    neg_mean = (-mean_a / std_a).reshape(1, 1, 1, c)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i, flip: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, c), lambda i, flip: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, c), lambda i, flip: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i, flip: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    def kernel(flip_pref, img_ref, inv_std_ref, neg_mean_ref, out_ref):
        i = pl.program_id(0)
        x = img_ref[0].astype(jnp.float32) * (1.0 / 255.0)
        x = x * inv_std_ref[0, 0] + neg_mean_ref[0, 0]
        flipped = jax.lax.rev(x, dimensions=(1,))
        x = jnp.where(flip_pref[i] > 0, flipped, x)
        out_ref[0] = x.astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), out_dtype),
        interpret=interpret,
    )(flip.astype(jnp.int32), images_u8, inv_std, neg_mean)


def normalize_and_flip_reference(
    images_u8: jnp.ndarray,
    flip: jnp.ndarray,
    mean: tuple[float, float, float] = (0.485, 0.456, 0.406),
    std: tuple[float, float, float] = (0.229, 0.224, 0.225),
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Unfused XLA reference (for tests / non-TPU backends)."""
    x = images_u8.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    flipped = jnp.flip(x, axis=2)
    sel = (flip > 0).reshape(-1, 1, 1, 1)
    return jnp.where(sel, flipped, x).astype(out_dtype)

"""Compute ops: exact-semantics resize, losses, NMS, paste, Pallas kernels."""

from basi_tpu.ops.resize import resize_bilinear, upsample2x  # noqa: F401

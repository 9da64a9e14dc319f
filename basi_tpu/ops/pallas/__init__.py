"""Pallas TPU kernels for the hot non-matmul paths.

XLA already fuses elementwise chains into convs; these kernels cover the
spots where hand-fusion still wins (SURVEY.md §2.16):
  * fused bilinear-upsample + sigmoid mask output
  * fused uint8 decode-normalize-flip ingest
"""

from basi_tpu.ops.pallas.upsample_sigmoid import upsample_sigmoid  # noqa: F401
from basi_tpu.ops.pallas.normalize_aug import normalize_and_flip  # noqa: F401

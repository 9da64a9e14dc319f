"""BASI-TPU: TPU-native salient-instance-segmentation framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
`alisure-ml/Instance-Segment-BASI` (PyTorch, single-GPU research code; see
SURVEY.md for the full reconstructed component inventory — the reference mount
was empty this round, so citations are to SURVEY.md sections rather than
reference file:line).

Layout: NHWC everywhere (TPU-native), static shapes, fixed-capacity instance
slots, jit-compiled training/inference, shard_map data parallelism over ICI.
"""

__version__ = "0.1.0"

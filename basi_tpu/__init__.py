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


def __getattr__(name):  # lazy: keep `import basi_tpu` free of jax init
    if name == "Trainer":
        from basi_tpu.train.loop import Trainer
        return Trainer
    if name == "Inferencer":
        from basi_tpu.infer import Inferencer
        return Inferencer
    if name == "BatchedPredictor":
        from basi_tpu.serve import BatchedPredictor
        return BatchedPredictor
    if name in ("BASINet", "create_model", "init_model"):
        import basi_tpu.models.basi as _b
        return getattr(_b, name)
    if name in ("Config", "get_config", "PRESETS"):
        import basi_tpu.config as _c
        return getattr(_c, name)
    raise AttributeError(name)


__all__ = [
    "Trainer", "Inferencer", "BatchedPredictor", "BASINet",
    "create_model", "init_model", "Config", "get_config", "PRESETS",
]

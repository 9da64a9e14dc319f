"""Evaluation: device-side mask IoU matching + mask AP (SURVEY §2.14)."""

from basi_tpu.evals.ap import APAccumulator, match_image  # noqa: F401

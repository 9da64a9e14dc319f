"""Ahead-of-time serving artifacts via ``jax.export`` (deployment path).

The reference has no deployment story beyond ``torch.save`` of a
state_dict that only its own source tree can re-animate (SURVEY §2.15).
Here a trained model exports to ONE self-contained file: the full
inference program — ingest normalize, backbone/FPN/heads forward,
instance selection and mask NMS — serialized as versioned StableHLO with
the weights baked in as constants. Loading needs jax/jaxlib only (no
basi_tpu, no model code, no checkpoint tree), and the artifact is stable
across library versions per jax.export's compatibility guarantees —
the TPU-native equivalent of a TorchScript/ONNX bundle.

Contract of the exported function (matches ``Inferencer.run_fn``):

  images_u8 (N, S, S, 3) uint8  ->  (slot_masks (N, K, S/4, S/4) probs,
                                     scores (N, K) f32,
                                     saliency_logits (N, S/4, S/4, 1))

Raw 3-channel bytes in: the packed-s2d host fast path is a feed
OPTIMIZATION, not part of the serving contract — an s2d-stem model
reshapes on device inside the exported program.

File format (single file, ``.basiaot``):

  b"BASIAOT1" | u64le meta_len | meta JSON (utf-8) | jax.export blob

The JSON sidecar carries the model/infer config echo a serving fleet
needs for routing and pre/post-processing (image size, slot count,
thresholds, dtype, mechanism, platforms) without deserializing the blob.
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass
from typing import Any, Sequence

_MAGIC = b"BASIAOT1"

# Custom-call targets our TPU programs may legitimately embed. Pallas
# kernels lower to "tpu_custom_call" (Mosaic); jax.export refuses
# non-allowlisted custom calls unless explicitly waived, because their
# forward compatibility is the kernel author's responsibility — ours are
# in-tree and versioned with the artifact consumer's jaxlib.
_TPU_CUSTOM_CALLS = ("tpu_custom_call", "Sharding", "annotate_device_placement")


def export_serving(cfg, *, params=None, batch_stats=None, checkpoint: str = "",
                   batch_size: int = 0,
                   platforms: Sequence[str] | None = None) -> tuple[bytes, dict]:
    """Export the full inference program to a serialized artifact.

    Returns ``(blob, meta)``. Weights come from ``params``/``batch_stats``
    or a ``checkpoint`` (Trainer dir or bare params export — same
    resolution rules as ``Inferencer``); they are pre-cast to the
    ``cfg.infer.dtype`` compute precision and baked into the program as
    constants. ``platforms``: lowering targets (default: the current
    backend); pass ``("tpu", "cpu")`` for one artifact that runs on both.
    """
    import jax
    import jax.export as jex
    import jax.numpy as jnp

    from basi_tpu.infer import Inferencer

    inf = Inferencer(cfg, params=params, batch_stats=batch_stats,
                     checkpoint=checkpoint)
    run = inf.run_fn
    weights = (inf.params, inf.batch_stats)
    n = int(batch_size or cfg.infer.batch_size)
    size = int(cfg.model.image_size)
    spec = jax.ShapeDtypeStruct((n, size, size, 3), jnp.uint8)

    plats = tuple(platforms) if platforms else (jax.default_backend(),)
    disabled = tuple(
        jex.DisabledSafetyCheck.custom_call(t) for t in _TPU_CUSTOM_CALLS
    ) if "tpu" in plats else ()

    def serve_fn(images_u8):
        return run(weights[0], weights[1], images_u8)

    exported = jex.export(
        jax.jit(serve_fn), platforms=plats, disabled_checks=list(disabled),
    )(spec)
    blob = exported.serialize()
    meta = {
        "format": "basiaot/1",
        "model_size": size,
        "batch_size": n,
        "num_slots": int(cfg.model.num_slots),
        "backbone": cfg.model.backbone,
        "instance_mechanism": getattr(cfg.model, "instance_mechanism",
                                      "kernels"),
        "infer_dtype": cfg.infer.dtype,
        "score_threshold": float(cfg.infer.score_threshold),
        "mask_threshold": float(cfg.infer.mask_threshold),
        "nms": cfg.infer.nms,
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "calling_convention_version": exported.calling_convention_version,
        "input": {"shape": [n, size, size, 3], "dtype": "uint8"},
        "outputs": ["slot_mask_probs", "scores", "saliency_logits"],
    }
    return blob, meta


def save_serving(path: str, cfg, **kwargs) -> dict:
    """``export_serving`` straight to ``path``; returns the meta dict."""
    blob, meta = export_serving(cfg, **kwargs)
    payload = json.dumps(meta).encode("utf-8")
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(payload)))
        f.write(payload)
        f.write(blob)
    return meta


def read_meta(path: str) -> dict:
    """Read only the JSON sidecar (cheap — no deserialization, no device)."""
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(
                f"{path!r} is not a basi AOT artifact (bad magic {magic!r})")
        (meta_len,) = struct.unpack("<Q", f.read(8))
        return json.loads(f.read(meta_len).decode("utf-8"))


@dataclass
class ServingModel:
    """A loaded AOT artifact: ``model(images_u8) -> (masks, scores, sal)``.

    ``exported.call`` builds the XLA program from the serialized StableHLO
    on first invocation (per-process compile, then cached by jit).
    """

    meta: dict
    exported: Any

    def __call__(self, images_u8):
        return self.exported.call(images_u8)


def load_serving(path: str) -> ServingModel:
    import jax.export as jex

    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(
                f"{path!r} is not a basi AOT artifact (bad magic {magic!r})")
        (meta_len,) = struct.unpack("<Q", f.read(8))
        meta = json.loads(f.read(meta_len).decode("utf-8"))
        blob = f.read()
    return ServingModel(meta=meta, exported=jex.deserialize(bytearray(blob)))

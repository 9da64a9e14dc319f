"""flax BASINet -> torch state_dict exporter (the inverse of
convert/full_import.py): gives users a way BACK to the reference's
ecosystem — export a TPU-trained checkpoint and load it into a torch
BASINet (the tests' mirror, or the reference once readable) for
independent verification or deployment.

Outputs a plain dict of numpy arrays in torch naming/layout (conv HWIO ->
OIHW, BN scale/bias + batch_stats -> weight/bias/running_mean/running_var,
plus zeroed ``num_batches_tracked`` so ``load_state_dict(strict=True)``
passes). Round-trip ``import_basinet(export_basinet(p, s)) == (p, s)`` is
exact (transposes only); tested bitwise.
"""

from __future__ import annotations

import numpy as np


def _conv_t(w) -> np.ndarray:
    """flax conv kernel (kH, kW, I, O) -> torch (O, I, kH, kW)."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (3, 2, 0, 1)))


def _put_conv(out: dict, tname: str, entry: dict):
    out[f"{tname}.weight"] = _conv_t(entry["kernel"])
    if "bias" in entry:
        out[f"{tname}.bias"] = np.asarray(entry["bias"])


def _put_norm(out: dict, tname: str, entry: dict, stats: dict | None = None):
    out[f"{tname}.weight"] = np.asarray(entry["scale"])
    out[f"{tname}.bias"] = np.asarray(entry["bias"])
    if stats is not None:  # BatchNorm (GroupNorm has no running stats)
        out[f"{tname}.running_mean"] = np.asarray(stats["mean"])
        out[f"{tname}.running_var"] = np.asarray(stats["var"])
        out[f"{tname}.num_batches_tracked"] = np.asarray(0, np.int64)


def export_resnet50_backbone(params: dict, stats: dict,
                             stage_sizes=(3, 4, 6, 3)) -> dict:
    """ResNet50 params/batch_stats trees -> torchvision-style state_dict
    entries (no 'backbone.' prefix)."""
    out: dict = {}
    _put_conv(out, "conv1", params["stem"]["conv"])
    _put_norm(out, "bn1", params["stem"]["bn"], stats["stem"]["bn"])
    # BasicBlock (resnet18/34) has no "c" conv — walk what the tree holds.
    sub = {"a": "1", "b": "2", "c": "3"}
    if "c" not in params["layer1_0"]:
        sub = {"a": "1", "b": "2"}
    for stage, blocks in enumerate(stage_sizes, start=1):
        for b in range(blocks):
            mod = f"layer{stage}_{b}"
            base = f"layer{stage}.{b}"
            for ours, k in sub.items():
                _put_conv(out, f"{base}.conv{k}", params[mod][ours]["conv"])
                _put_norm(out, f"{base}.bn{k}", params[mod][ours]["bn"],
                          stats[mod][ours]["bn"])
            if "proj" in params[mod]:
                _put_conv(out, f"{base}.downsample.0",
                          params[mod]["proj"]["conv"])
                _put_norm(out, f"{base}.downsample.1",
                          params[mod]["proj"]["bn"],
                          stats[mod]["proj"]["bn"])
    return out


def export_vgg16_backbone(params: dict, depths=(2, 2, 3, 3, 3)) -> dict:
    """VGG16/19 trunk params -> torchvision-style ``features.{idx}.*``
    entries (no 'backbone.' prefix; classic VGG carries no running stats)."""
    from basi_tpu.convert.torch_import import vgg_layout

    out: dict = {}
    for idx, name in vgg_layout(depths):
        _put_conv(out, f"features.{idx}", params[name])
    return out


def export_basinet(params: dict, batch_stats: dict,
                   stage_sizes=(3, 4, 6, 3),
                   backbone: str = "resnet50") -> dict:
    """Full BASINet variables -> torch state_dict (reference-style module
    names, the exact inverse of full_import.import_basinet)."""
    if "instance" not in params:
        raise ValueError(
            "torch export maps the reference's (kernel-mechanism) module "
            "names; this checkpoint has no 'instance' head — models built "
            "with model.instance_mechanism='roi' have no torch counterpart")
    out: dict = {}
    if backbone.startswith("vgg"):
        from basi_tpu.models.vgg import VGG_DEPTHS

        bb = export_vgg16_backbone(params["backbone"], VGG_DEPTHS[backbone])
    else:
        bb = export_resnet50_backbone(params["backbone"],
                                      batch_stats["backbone"], stage_sizes)
    out.update({f"backbone.{k}": v for k, v in bb.items()})

    fpn = params["fpn"]
    for name, entry in fpn.items():  # lateral{i} / smooth{i}
        _put_conv(out, f"fpn.{name}", entry)

    sal = params["saliency"]
    for name, entry in sal.items():  # tower{i} / out{i} / fuse
        _put_conv(out, f"saliency.{name}", entry)

    mf = params["maskfeat"]
    for name, entry in mf.items():  # level{i} / gn{i} / embed
        if name.startswith("gn"):
            _put_norm(out, f"maskfeat.{name}", entry)
        else:
            _put_conv(out, f"maskfeat.{name}", entry)

    inst = params["instance"]
    for name, entry in inst.items():  # tower{i} / gn{i} / score / kernel
        if name.startswith("gn"):
            _put_norm(out, f"instance.{name}", entry)
        else:
            _put_conv(out, f"instance.{name}", entry)

    if "refine" in params:  # optional BASNet-style RRM (model.refine)
        for name, entry in params["refine"].items():
            if name.startswith("gn_"):
                _put_norm(out, f"refine.{name}", entry)
            elif name == "out":
                _put_conv(out, "refine.out", entry)
            else:  # in / down{i} / bridge / up{i} -> conv_<name>
                _put_conv(out, f"refine.conv_{name}", entry)
    return out

"""Full-model torch -> flax BASINet importer.

Extends the backbone importer to every head so a complete torch checkpoint
(reference-released or torch-mirror) loads into BASINet. Layer-name mapping
assumes the reference-style module naming used by the tests' torch mirror
(the ``f"{tname}.*"`` prefixes below); if the real reference uses different
attribute names, remap the incoming ``state_dict`` keys before calling
``import_basinet`` (SURVEY §0: reference unreadable this round).

Handled conversions: Conv2d OIHW->HWIO (+bias), GroupNorm/BatchNorm
weight/bias -> scale/bias (+BN running stats -> batch_stats).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from basi_tpu.convert.torch_import import (
    _conv,
    import_resnet50_backbone,
    import_vgg16_backbone,
)


def _conv_entry(sd, tname):
    out = {"kernel": _conv(sd[f"{tname}.weight"])}
    if f"{tname}.bias" in sd:
        out["bias"] = sd[f"{tname}.bias"]
    return out


def _gn_entry(sd, tname):
    return {"scale": sd[f"{tname}.weight"], "bias": sd[f"{tname}.bias"]}


def import_basinet(
    state_dict: Mapping[str, np.ndarray],
    stage_sizes=(3, 4, 6, 3),
    fpn_levels: int = 4,
    saliency_levels: int = 4,
    maskfeat_levels: int = 4,
    instance_depth: int = 3,
    backbone: str = "resnet50",
) -> tuple[dict, dict]:
    """torch BASINet state_dict -> (params, batch_stats) for flax BASINet.

    ``backbone`` picks the trunk mapping: any ResNet family member uses
    ``stage_sizes``; ``"vgg16"`` maps torchvision ``features.*`` indices
    (and returns empty batch_stats — classic VGG16 has no BatchNorm, so
    the flax model's variables carry none either).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    bb_sd = {k[len("backbone."):]: v for k, v in sd.items()
             if k.startswith("backbone.")}
    if backbone.startswith("vgg"):
        from basi_tpu.models.vgg import VGG_DEPTHS

        bb_params, bb_stats = import_vgg16_backbone(bb_sd,
                                                    VGG_DEPTHS[backbone])
    else:
        bb_params, bb_stats = import_resnet50_backbone(bb_sd, stage_sizes)

    params: dict = {"backbone": bb_params}
    stats: dict = {"backbone": bb_stats} if bb_stats else {}

    fpn = {}
    for i in range(fpn_levels):
        fpn[f"lateral{i}"] = _conv_entry(sd, f"fpn.lateral{i}")
        fpn[f"smooth{i}"] = _conv_entry(sd, f"fpn.smooth{i}")
    params["fpn"] = fpn

    sal = {}
    for i in range(saliency_levels):
        sal[f"tower{i}"] = _conv_entry(sd, f"saliency.tower{i}")
        sal[f"out{i}"] = _conv_entry(sd, f"saliency.out{i}")
    sal["fuse"] = _conv_entry(sd, "saliency.fuse")
    params["saliency"] = sal

    mf = {}
    for i in range(maskfeat_levels):
        mf[f"level{i}"] = _conv_entry(sd, f"maskfeat.level{i}")
        mf[f"gn{i}"] = _gn_entry(sd, f"maskfeat.gn{i}")
    mf["embed"] = _conv_entry(sd, "maskfeat.embed")
    params["maskfeat"] = mf

    inst = {}
    for i in range(instance_depth):
        inst[f"tower{i}"] = _conv_entry(sd, f"instance.tower{i}")
        inst[f"gn{i}"] = _gn_entry(sd, f"instance.gn{i}")
    inst["score"] = _conv_entry(sd, "instance.score")
    inst["kernel"] = _conv_entry(sd, "instance.kernel")
    params["instance"] = inst

    if any(k.startswith("refine.") for k in sd):  # optional RRM
        ref: dict = {}
        for key in sd:
            if not key.startswith("refine.") or not key.endswith(".weight"):
                continue
            tname = key[len("refine."):-len(".weight")]
            if tname.startswith("gn_"):
                ref[tname] = _gn_entry(sd, f"refine.{tname}")
            elif tname.startswith("conv_"):
                ref[tname[len("conv_"):]] = _conv_entry(sd, f"refine.{tname}")
            else:  # out
                ref[tname] = _conv_entry(sd, f"refine.{tname}")
        params["refine"] = ref

    return params, stats

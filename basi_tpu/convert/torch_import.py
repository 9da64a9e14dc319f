"""torch state_dict -> flax params/batch_stats importer.

Without this there is no parity story (SURVEY §7 step 2): the reference's
torchvision-pretrained backbones and released checkpoints load through
here. Handles the layout transposes (conv OIHW -> HWIO, linear OI -> IO)
and BatchNorm split (weight/bias -> params.scale/bias, running_mean/var ->
batch_stats.mean/var).

Input is a plain dict of numpy arrays (load a ``.pth`` with
``torch.load(..., map_location='cpu')`` and call ``{k: v.numpy()}``), so
this module itself does not import torch.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    """torch conv weight (O, I, kH, kW) -> flax (kH, kW, I, O)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _set(tree: dict, path: list[str], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def import_convbn(sd: Mapping[str, np.ndarray], torch_prefix_conv: str,
                  torch_prefix_bn: str, params: dict, stats: dict,
                  path: list[str]):
    """Map a torch conv+bn pair onto a basi ConvBN module at ``path``."""
    _set(params, path + ["conv", "kernel"], _conv(sd[torch_prefix_conv + ".weight"]))
    _set(params, path + ["bn", "scale"], sd[torch_prefix_bn + ".weight"])
    _set(params, path + ["bn", "bias"], sd[torch_prefix_bn + ".bias"])
    _set(stats, path + ["bn", "mean"], sd[torch_prefix_bn + ".running_mean"])
    _set(stats, path + ["bn", "var"], sd[torch_prefix_bn + ".running_var"])


def import_resnet50_backbone(
    state_dict: Mapping[str, Any],
    stage_sizes=(3, 4, 6, 3),
) -> tuple[dict, dict]:
    """torchvision-style resnet50 state_dict -> (params, batch_stats) trees
    matching basi_tpu.models.resnet.ResNet50 (module name 'backbone' NOT
    included — merge under your model's params['backbone'] yourself).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}
    import_convbn(sd, "conv1", "bn1", params, stats, ["stem"])
    # Block kind is self-describing: BasicBlock (resnet18/34) has no conv3.
    if "layer1.0.conv3.weight" in sd:
        sub = {"conv1": "a", "conv2": "b", "conv3": "c"}
    else:
        sub = {"conv1": "a", "conv2": "b"}
    for stage, blocks in enumerate(stage_sizes, start=1):
        for b in range(blocks):
            base = f"layer{stage}.{b}"
            mod = f"layer{stage}_{b}"
            for tconv, ours in sub.items():
                import_convbn(sd, f"{base}.{tconv}", f"{base}.{tconv.replace('conv', 'bn')}",
                              params, stats, [mod, ours])
            if f"{base}.downsample.0.weight" in sd:
                import_convbn(sd, f"{base}.downsample.0", f"{base}.downsample.1",
                              params, stats, [mod, "proj"])
    return params, stats


def vgg_layout(depths=(2, 2, 3, 3, 3)) -> list[tuple[int, str]]:
    """torchvision ``features.*`` index -> our conv name, for any VGG
    depth: each conv occupies (Conv, ReLU) = 2 module slots, each block
    ends with one MaxPool slot. For vgg16 this reproduces indices
    0,2 / 5,7 / 10,12,14 / 17,19,21 / 24,26,28 (tested)."""
    layout, idx = [], 0
    for block, n in enumerate(depths, start=1):
        for i in range(n):
            layout.append((idx, f"conv{block}_{i + 1}"))
            idx += 2
        idx += 1  # the block's MaxPool
    return layout


def import_vgg16_backbone(state_dict: Mapping[str, Any],
                          depths=(2, 2, 3, 3, 3)) -> tuple[dict, dict]:
    """torchvision vgg16/19 'features.*' state_dict -> (params, {})."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    for idx, name in vgg_layout(depths):
        params[name] = {
            "kernel": _conv(sd[f"features.{idx}.weight"]),
            "bias": sd[f"features.{idx}.bias"],
        }
    return params, {}


def merge_backbone(model_params: dict, model_stats: dict,
                   bb_params: dict, bb_stats: dict,
                   name: str = "backbone") -> tuple[dict, dict]:
    """Replace the backbone subtree of a full model's variables."""
    import jax

    new_params = dict(model_params)
    new_params[name] = bb_params
    new_stats = dict(model_stats)
    if bb_stats:
        new_stats[name] = bb_stats
    # sanity: structures must match what the model initialized
    ref = jax.tree.structure(model_params[name])
    got = jax.tree.structure(new_params[name])
    if ref != got:
        raise ValueError(
            f"backbone structure mismatch:\n ref={ref}\n got={got}")
    return new_params, new_stats

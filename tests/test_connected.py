"""Connected-components op vs a host union-find-style reference."""

import jax.numpy as jnp
import numpy as np

from basi_tpu.ops.connected import extract_instances, label_components


def _np_components(binary):
    """Simple BFS labeling for the oracle."""
    h, w = binary.shape
    labels = -np.ones((h, w), np.int64)
    cur = 0
    for sy in range(h):
        for sx in range(w):
            if binary[sy, sx] and labels[sy, sx] < 0:
                stack = [(sy, sx)]
                labels[sy, sx] = cur
                while stack:
                    y, x = stack.pop()
                    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        ny, nx = y + dy, x + dx
                        if (0 <= ny < h and 0 <= nx < w and binary[ny, nx]
                                and labels[ny, nx] < 0):
                            labels[ny, nx] = cur
                            stack.append((ny, nx))
                cur += 1
    return labels, cur


def test_labels_match_bfs(rng):
    binary = (rng.rand(40, 40) > 0.7).astype(np.float32)
    got = np.asarray(label_components(jnp.asarray(binary)))
    want, n = _np_components(binary > 0.5)
    # same partition: bijection between label sets
    assert (got >= 0).sum() == (want >= 0).sum()
    mapping = {}
    for g, w_ in zip(got.ravel(), want.ravel()):
        if w_ < 0:
            assert g < 0
            continue
        if w_ in mapping:
            assert mapping[w_] == g
        else:
            mapping[w_] = g
    assert len(mapping) == n
    assert len(set(mapping.values())) == n


def test_extract_instances_blobs():
    sal = np.zeros((64, 64), np.float32)
    sal[5:20, 5:20] = 0.9    # area 225
    sal[40:60, 40:60] = 0.8  # area 400
    sal[30, 2] = 0.99        # speck below min_area
    masks, scores = extract_instances(jnp.asarray(sal), num_slots=4,
                                      min_area=16)
    masks = np.asarray(masks)
    scores = np.asarray(scores)
    assert (scores > 0).sum() == 2
    # biggest first
    assert masks[0].sum() == 400 and abs(scores[0] - 0.8) < 1e-5
    assert masks[1].sum() == 225 and abs(scores[1] - 0.9) < 1e-5
    assert masks[2].sum() == 0


def test_snake_component():
    """A long snake needs many propagation iterations — must still converge."""
    b = np.zeros((32, 32), np.float32)
    for i in range(0, 32, 2):
        b[i, :] = 1
        if (i // 2) % 2 == 0:
            b[min(i + 1, 31), -1] = 1
        else:
            b[min(i + 1, 31), 0] = 1
    got = np.asarray(label_components(jnp.asarray(b)))
    want, n = _np_components(b > 0.5)
    assert n == 1
    labs = set(got[got >= 0].ravel().tolist())
    assert len(labs) == 1


def test_instance_mechanism_swap_is_cli_reachable(capsys):
    """SURVEY §2.8 / VERDICT r2 item 6: `basi eval` must run BOTH instance
    mechanisms behind the same slot contract and report AP for each —
    proving the narrow-interface swap actually swaps end-to-end."""
    import json

    from basi_tpu.cli import main

    args = [
        "eval",
        "--set", "model.backbone=resnet_tiny",
        "--set", "model.image_size=64",
        "--set", "model.grid_size=8",
        "--set", "model.fpn_channels=32",
        "--set", "model.mask_channels=32",
        "--set", "model.num_slots=8",
        "--set", "data.image_size=64",
        "--set", "data.dataset=synthetic",
        "--set", "data.synthetic_n=16",
        "--set", "data.max_instances=4",
        "--set", "infer.batch_size=4",
        "--set", "infer.dtype=float32",
        "--set", "parallel.num_devices=1",
        "--max-batches", "1",
    ]
    results = {}
    for mech in ("kernels", "connected"):
        rc = main(args + ["--set", f"model.instance_mechanism={mech}"])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()[-1]
        results[mech] = json.loads(out)
    for mech, metrics in results.items():
        for key in ("AP@0.5", "AP@0.7", "mAP", "saliency_mae"):
            assert key in metrics, (mech, metrics)
            assert np.isfinite(metrics[key])


def test_instance_mechanism_unknown_rejected():
    import dataclasses

    import pytest

    from basi_tpu.config import Config, ModelConfig
    from basi_tpu.infer import Inferencer

    cfg = Config(model=ModelConfig(
        backbone="resnet_tiny", fpn_channels=32, mask_channels=32,
        grid_size=8, num_slots=8, image_size=64,
        instance_mechanism="voronoi"))
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, image_size=64))
    with pytest.raises(ValueError, match="instance_mechanism"):
        Inferencer(cfg)

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


def test_split_labels_separates_touching_blobs():
    """Two circles joined by a thin neck: plain labeling yields ONE
    component; erode-split separates them at the neck and the frozen-front
    re-dilation recovers (almost) the full pixels of each side."""
    import numpy as np

    from basi_tpu.ops.connected import label_components, split_labels

    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w]
    c1 = (yy - 32) ** 2 + (xx - 18) ** 2 <= 100
    c2 = (yy - 32) ** 2 + (xx - 46) ** 2 <= 100
    neck = (np.abs(yy - 32) <= 1) & (xx >= 18) & (xx <= 46)
    blob = c1 | c2 | neck
    import jax.numpy as jnp

    plain = np.asarray(label_components(jnp.asarray(blob, jnp.float32)))
    assert len(np.unique(plain[plain >= 0])) == 1  # merged

    lab = np.asarray(split_labels(jnp.asarray(blob), erode_steps=2))
    ids = np.unique(lab[lab >= 0])
    assert len(ids) == 2, ids
    # every foreground pixel is assigned (re-dilation covers the mask)
    assert (lab[blob] >= 0).all()
    # each circle's core is one label, and they differ
    assert lab[32, 18] != lab[32, 46]
    # the split line falls inside the neck, not inside a circle body
    left = lab == lab[32, 18]
    right = lab == lab[32, 46]
    assert left[c1 & ~neck].mean() > 0.95
    assert right[c2 & ~neck].mean() > 0.95


def test_split_labels_rescues_small_components():
    """A component smaller than the erosion footprint must not vanish:
    the residual pass labels it (VERDICT r4 item 4 slot contract)."""
    import numpy as np
    import jax.numpy as jnp

    from basi_tpu.ops.connected import split_labels

    blob = np.zeros((32, 32), bool)
    blob[4:6, 4:6] = True  # 2x2: gone after one 3x3 erosion
    blob[20:30, 20:30] = True  # big: survives
    lab = np.asarray(split_labels(jnp.asarray(blob), erode_steps=2))
    assert (lab[blob] >= 0).all()
    assert lab[4, 4] != lab[25, 25]
    assert len(np.unique(lab[lab >= 0])) == 2


def test_split_none_matches_plain_extraction():
    """split='none' must reproduce the original extract_instances
    outputs bitwise (the default changed; the old behavior is pinned)."""
    import numpy as np
    import jax.numpy as jnp

    from basi_tpu.ops.connected import extract_instances, label_components

    rng = np.random.RandomState(0)
    p = rng.rand(48, 48).astype(np.float32)
    m0, s0 = extract_instances(jnp.asarray(p), num_slots=8, split="none")
    # direct reconstruction through the plain path
    m1, s1 = extract_instances(jnp.asarray(p), num_slots=8)
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))


def test_split_separated_blobs_unchanged_vs_plain():
    """Non-touching blobs: erode-split and plain labeling pack identical
    instances (same pixels per slot)."""
    import numpy as np
    import jax.numpy as jnp

    from basi_tpu.ops.connected import extract_instances

    p = np.zeros((64, 64), np.float32)
    p[8:20, 8:20] = 0.9
    p[40:60, 30:55] = 0.8
    a_m, a_s = extract_instances(jnp.asarray(p), num_slots=4, split="none")
    b_m, b_s = extract_instances(jnp.asarray(p), num_slots=4, split="erode",
                                 erode_steps=2)
    np.testing.assert_array_equal(np.asarray(a_m), np.asarray(b_m))
    np.testing.assert_allclose(np.asarray(a_s), np.asarray(b_s), rtol=1e-6)


def test_split_edt_separates_smooth_occlusion_union():
    """Two overlapping circles form a SMOOTH union (no neck): erode-split
    cannot separate them, EDT-watershed must (one distance maximum per
    body, labels meet at the saddle)."""
    import numpy as np
    import jax.numpy as jnp

    from basi_tpu.ops.connected import split_labels, split_labels_edt

    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w]
    c1 = (yy - 32) ** 2 + (xx - 22) ** 2 <= 144  # r=12
    c2 = (yy - 32) ** 2 + (xx - 42) ** 2 <= 144  # r=12, overlapping
    blob = c1 | c2

    ero = np.asarray(split_labels(jnp.asarray(blob), erode_steps=2))
    assert len(np.unique(ero[ero >= 0])) == 1  # smooth union: no split

    lab = np.asarray(split_labels_edt(jnp.asarray(blob)))
    assert (lab[blob] >= 0).all()
    assert lab[32, 22] != lab[32, 42]
    assert len(np.unique(lab[lab >= 0])) == 2
    # each center's region covers most of its exclusive pixels
    left = lab == lab[32, 22]
    right = lab == lab[32, 42]
    assert left[c1 & ~c2].mean() > 0.9
    assert right[c2 & ~c1].mean() > 0.9


def test_split_edt_does_not_oversplit_single_ellipse():
    """One elongated ellipse: the integer-rounded ridge plateau must stay
    ONE seed component (no oversplit from discretization dips)."""
    import numpy as np
    import jax.numpy as jnp

    from basi_tpu.ops.connected import split_labels_edt

    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w]
    ell = ((yy - 32) / 8.0) ** 2 + ((xx - 32) / 24.0) ** 2 <= 1.0
    lab = np.asarray(split_labels_edt(jnp.asarray(ell)))
    assert (lab[ell] >= 0).all()
    assert len(np.unique(lab[lab >= 0])) == 1

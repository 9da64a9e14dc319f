"""ROI instance mechanism (SURVEY §2.8 candidate (b)): the separable
matmul roi_align / paste_rois ops, box decode/IoU, target assignment, the
roi-mode model forward, train step, and Inferencer end-to-end."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basi_tpu.ops.roi import (
    box_iou,
    decode_cell_boxes,
    paste_rois,
    roi_align,
)

from helpers import tiny_batch, tiny_config


def _roi_config(batch_size: int = 8, image_size: int = 64):
    cfg = tiny_config(batch_size=batch_size, image_size=image_size)
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, instance_mechanism="roi", roi_resolution=8,
            roi_top_k=16),
    )


def _np_roi_align(feats, box, r):
    """Brute-force bilinear oracle: sample (r x r) half-pixel bin centers."""
    h, w, e = feats.shape
    y0, x0, y1, x1 = box
    out = np.zeros((r, r, e), np.float32)
    for i in range(r):
        for j in range(r):
            sy = (y0 + (i + 0.5) / r * (y1 - y0)) * h - 0.5
            sx = (x0 + (j + 0.5) / r * (x1 - x0)) * w - 0.5
            sy = min(max(sy, 0.0), h - 1.0)
            sx = min(max(sx, 0.0), w - 1.0)
            iy, ix = int(np.floor(sy)), int(np.floor(sx))
            fy, fx = sy - iy, sx - ix
            iy2, ix2 = min(iy + 1, h - 1), min(ix + 1, w - 1)
            out[i, j] = (
                feats[iy, ix] * (1 - fy) * (1 - fx)
                + feats[iy, ix2] * (1 - fy) * fx
                + feats[iy2, ix] * fy * (1 - fx)
                + feats[iy2, ix2] * fy * fx
            )
    return out


def test_roi_align_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    feats = rng.rand(12, 10, 3).astype(np.float32)
    boxes = np.array(
        [
            [0.1, 0.2, 0.8, 0.9],
            [0.0, 0.0, 1.0, 1.0],
            [0.45, 0.3, 0.55, 0.35],  # tiny box
            [0.7, 0.6, 0.7, 0.6],  # degenerate (y1 == y0)
        ],
        np.float32,
    )
    got = np.asarray(roi_align(jnp.asarray(feats), jnp.asarray(boxes), 6))
    for k, box in enumerate(boxes):
        want = _np_roi_align(feats, box, 6)
        np.testing.assert_allclose(got[k], want, rtol=1e-5, atol=1e-5)


def test_roi_align_full_box_identity():
    """Full-image box at resolution == grid size is the identity sample."""
    rng = np.random.RandomState(1)
    feats = rng.rand(8, 8, 2).astype(np.float32)
    box = jnp.asarray([[0.0, 0.0, 1.0, 1.0]], jnp.float32)
    got = np.asarray(roi_align(jnp.asarray(feats), box, 8))[0]
    np.testing.assert_allclose(got, feats, rtol=1e-6, atol=1e-6)


def test_paste_full_box_identity():
    rng = np.random.RandomState(2)
    patch = rng.rand(1, 8, 8).astype(np.float32)
    box = jnp.asarray([[0.0, 0.0, 1.0, 1.0]], jnp.float32)
    got = np.asarray(paste_rois(jnp.asarray(patch), box, (8, 8)))[0]
    np.testing.assert_allclose(got, patch[0], rtol=1e-6, atol=1e-6)


def test_paste_outside_box_is_zero_and_inside_positive():
    patch = jnp.ones((1, 4, 4), jnp.float32)
    box = jnp.asarray([[0.25, 0.25, 0.75, 0.75]], jnp.float32)
    out = np.asarray(paste_rois(patch, box, (16, 16)))[0]
    # strictly outside the box: zero
    assert out[0, 0] == 0.0 and out[15, 15] == 0.0
    assert out[2, 8] == 0.0  # above the box, inside columns
    # well inside: the pasted constant
    np.testing.assert_allclose(out[6:10, 6:10], 1.0, atol=1e-6)


def test_crop_paste_roundtrip():
    """paste(crop(m)) approximates m inside the box for a smooth mask."""
    h = w = 32
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    m = np.exp(-(((yy - 16) / 8) ** 2 + ((xx - 18) / 6) ** 2))
    box = jnp.asarray([[0.15, 0.2, 0.85, 0.95]], jnp.float32)
    crop = roi_align(jnp.asarray(m)[..., None], box, 24)[..., 0]
    back = np.asarray(paste_rois(crop, box, (h, w)))[0]
    inside = (yy / h >= 0.22) & (yy / h <= 0.78) & (xx / w >= 0.27) & (
        xx / w <= 0.88)
    err = np.abs(back - m)[inside]
    assert err.max() < 0.05, err.max()


def test_decode_cell_boxes_geometry():
    s = 4
    raw = jnp.zeros((2, s, s, 4), jnp.float32)
    boxes = np.asarray(decode_cell_boxes(raw, s))
    assert boxes.shape == (2, s, s, 4)
    cc = (np.arange(s) + 0.5) / s
    # each cell's box contains its center and stays in [0, 1]
    assert (boxes >= 0).all() and (boxes <= 1).all()
    for i in range(s):
        for j in range(s):
            y0, x0, y1, x1 = boxes[0, i, j]
            assert y0 < cc[i] < y1 and x0 < cc[j] < x1
    # larger raw -> larger box (softplus monotone)
    big = np.asarray(decode_cell_boxes(raw + 3.0, s))
    assert ((big[..., 2] - big[..., 0]) > (boxes[..., 2] - boxes[..., 0])).all()


def test_box_iou_golden():
    a = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    b = jnp.asarray([0.0, 0.5, 1.0, 1.5])
    np.testing.assert_allclose(float(box_iou(a, b)), 1.0 / 3.0, rtol=1e-6)
    np.testing.assert_allclose(float(box_iou(a, a)), 1.0, rtol=1e-6)
    c = jnp.asarray([2.0, 2.0, 3.0, 3.0])
    assert float(box_iou(a, c)) == 0.0


def test_assign_targets_roi_boxes_match_gt():
    from basi_tpu.train.targets import assign_targets_roi

    h = w = 32
    masks = np.zeros((2, h, w), np.uint8)
    masks[0, 4:12, 6:18] = 1
    masks[1, 20:30, 2:10] = 1
    valid = np.array([1, 1], np.uint8)
    sel_idx, tgt, pos, score_tgt, num_pos, boxes = assign_targets_roi(
        jnp.asarray(masks), jnp.asarray(valid), grid_size=8,
        mask_hw=(16, 16), max_pos_cells=16)
    assert float(num_pos) > 0
    pos = np.asarray(pos)
    boxes = np.asarray(boxes)
    # every positive cell's box must be one of the two GT boxes
    # (pixel-center extrema +- half pixel, normalized)
    want0 = np.array([(4 + 0.5 - 0.5) / h, (6 + 0.5 - 0.5) / w,
                      (11 + 0.5 + 0.5) / h, (17 + 0.5 + 0.5) / w])
    want1 = np.array([(20 + 0.5 - 0.5) / h, (2 + 0.5 - 0.5) / w,
                      (29 + 0.5 + 0.5) / h, (9 + 0.5 + 0.5) / w])
    hit0 = hit1 = False
    for p, b in zip(pos, boxes):
        if p == 0:
            continue
        if np.allclose(b, want0, atol=1e-6):
            hit0 = True
        elif np.allclose(b, want1, atol=1e-6):
            hit1 = True
        else:
            raise AssertionError(f"unexpected box {b}")
    assert hit0 and hit1


def test_instance_stats_flip_mirrors_box():
    """Analytic x-mirroring of the bbox (train step) == stats of the
    flipped masks."""
    from basi_tpu.train.targets import instance_stats

    rng = np.random.RandomState(3)
    masks = (rng.rand(3, 16, 24) > 0.7).astype(np.float32)
    valid = np.ones((3,), np.float32)
    st = instance_stats(jnp.asarray(masks), jnp.asarray(valid))
    st_f = instance_stats(jnp.asarray(masks[:, :, ::-1].copy()),
                          jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(st_f["x0"]),
                               1.0 - np.asarray(st["x1"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_f["x1"]),
                               1.0 - np.asarray(st["x0"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_f["y0"]),
                               np.asarray(st["y0"]), atol=1e-6)


def test_roi_model_forward_shapes():
    from basi_tpu.models.basi import create_model, init_model

    cfg = _roi_config()
    model = create_model(cfg.model)
    params, stats = init_model(model, cfg.model.image_size)
    assert "roi_box" in params and "roi_mask" in params
    assert "instance" not in params

    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    out = model.apply({"params": params, "batch_stats": stats}, x,
                      train=False)
    s = cfg.model.grid_size
    k = min(cfg.model.roi_top_k, s * s)
    r = cfg.model.roi_resolution
    assert out.cell_scores.shape == (2, s, s, 1)
    assert out.cell_boxes.shape == (2, s, s, 4)
    assert out.roi_boxes.shape == (2, k, 4)
    assert out.roi_scores.shape == (2, k)
    assert out.roi_mask_logits.shape == (2, k, r, r)
    assert out.cell_kernels is None and out.mask_logits is None

    # training: ROI masks at supplied boxes
    boxes = jnp.tile(jnp.asarray([[0.2, 0.2, 0.8, 0.8]]), (2, 5, 1))
    out_t = model.apply({"params": params, "batch_stats": stats}, x,
                        train=True, roi_boxes=boxes,
                        mutable=["batch_stats"])[0]
    assert out_t.roi_mask_logits.shape == (2, 5, r, r)
    assert out_t.roi_boxes is None and out_t.roi_scores is None


@pytest.mark.slow
def test_roi_train_loss_decreases():
    from basi_tpu.models.basi import create_model
    from basi_tpu.train.state import create_train_state, make_optimizer
    from basi_tpu.train.step import make_train_step

    cfg = _roi_config()
    model = create_model(cfg.model)
    tx, _ = make_optimizer(cfg.train, max_steps=10)
    state = create_train_state(model, cfg.model, cfg.train, max_steps=10)
    step_fn = make_train_step(model, tx, cfg.train, cfg.data, mesh=None,
                              donate=False)
    batch = tiny_batch(np.random.RandomState(0))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses, boxes = [], []
    for _ in range(4):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
        boxes.append(float(metrics["box_iou"]))
        assert float(metrics["num_pos_cells"]) > 0
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses
    assert boxes[-1] < boxes[0], boxes  # box regression is learning


def test_roi_shard_map_matches_single_device():
    from basi_tpu.models.basi import create_model
    from basi_tpu.parallel.mesh import make_mesh
    from basi_tpu.train.state import create_train_state, make_optimizer
    from basi_tpu.train.step import make_train_step

    cfg = _roi_config()
    data_cfg = dataclasses.replace(cfg.data, hflip_prob=0.0,
                                   multiscale=False)
    model = create_model(cfg.model)
    tx, _ = make_optimizer(cfg.train, max_steps=10)
    state = create_train_state(model, cfg.model, cfg.train, max_steps=10)
    mesh = make_mesh(8, "data")
    batch = tiny_batch(np.random.RandomState(1))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    single = make_train_step(model, tx, cfg.train, data_cfg, mesh=None,
                             donate=False)
    sharded = make_train_step(model, tx, cfg.train, data_cfg, mesh=mesh,
                              donate=False)
    s1, m1 = single(state, batch)
    s8, m8 = sharded(state, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=2e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_roi_inferencer_end_to_end(tmp_path):
    """Inferencer with the roi mechanism fills the standard slot contract
    and the eval harness reports metrics on synthetic data."""
    from basi_tpu.infer import Inferencer

    cfg = _roi_config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, split="val"))
    inf = Inferencer(cfg)
    batch = tiny_batch(np.random.RandomState(5))
    masks, scores, sal = inf.run_fn(
        inf.params, inf.batch_stats, jnp.asarray(batch["image"]))
    k = cfg.model.num_slots
    n, size = batch["image"].shape[0], cfg.model.image_size
    assert masks.shape == (n, k, size // 4, size // 4)
    assert scores.shape == (n, k)
    m = np.asarray(masks)
    assert np.isfinite(m).all() and (m >= 0).all() and (m <= 1).all()

    metrics = inf.evaluate()
    assert "mAP" in metrics and np.isfinite(metrics["mAP"])


def test_roi_tta_supported():
    """ROI TTA (round 4): flipped views' boxes mirror analytically and the
    per-view detections union before one NMS pass — building the ensemble
    Inferencer must work and produce the slot contract (involution and
    duplicate-scale exactness live in test_tta.py)."""
    from basi_tpu.infer import Inferencer

    cfg = _roi_config()
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, tta="hflip"))
    inf = Inferencer(cfg)
    rng = np.random.RandomState(0)
    s = cfg.model.image_size
    imgs = (rng.rand(cfg.infer.batch_size, s, s, 3) * 255).astype(np.uint8)
    masks, scores, _ = jax.device_get(
        inf.run_fn(inf.params, inf.batch_stats, jnp.asarray(imgs)))
    assert masks.shape[:2] == (cfg.infer.batch_size, cfg.model.num_slots)
    assert np.isfinite(np.asarray(scores, np.float32)).all()

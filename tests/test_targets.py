"""Tests: GT -> cell-grid target assignment."""

import jax.numpy as jnp
import numpy as np

from basi_tpu.train.targets import assign_targets, instance_stats


def _blob(size, cy, cx, r):
    yy, xx = np.mgrid[0:size, 0:size]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.float32)


def test_instance_stats_center(rng):
    size = 64
    gm = np.stack([_blob(size, 20, 40, 8), np.zeros((size, size), np.float32)])
    valid = np.array([1, 0], np.float32)
    st = instance_stats(jnp.asarray(gm), jnp.asarray(valid))
    np.testing.assert_allclose(float(st["cy"][0]), 20.5 / size, atol=0.02)
    np.testing.assert_allclose(float(st["cx"][0]), 40.5 / size, atol=0.02)
    assert float(st["valid"][1]) == 0.0


def test_assign_positive_cell_location():
    size = 64
    s = 8
    gm = np.zeros((2, size, size), np.float32)
    gm[0] = _blob(size, 12, 12, 6)   # center in cell (1, 1) of 8x8 grid
    valid = np.array([1, 0], np.float32)
    tgt, pos, score = assign_targets(
        jnp.asarray(gm), jnp.asarray(valid), grid_size=s, mask_hw=(16, 16)
    )
    pos2d = np.asarray(pos).reshape(s, s)
    assert pos2d[1, 1] == 1.0
    assert pos2d[6, 6] == 0.0
    # target mask for the positive cell is the downsampled instance
    cell = 1 * s + 1
    m = np.asarray(tgt[cell])
    assert m.sum() > 0
    assert np.asarray(score)[1, 1, 0] == 1.0


def test_conflict_smallest_wins():
    size = 64
    s = 8
    big = _blob(size, 32, 32, 28)
    small = _blob(size, 32, 32, 5)
    gm = np.stack([big, small])
    valid = np.array([1, 1], np.float32)
    tgt, pos, _ = assign_targets(
        jnp.asarray(gm), jnp.asarray(valid), grid_size=s, mask_hw=(16, 16)
    )
    center_cell = (s // 2) * s + (s // 2)
    m = np.asarray(tgt[center_cell])
    # the contested center cell should carry the SMALL instance's mask
    assert m.sum() <= np.asarray(
        jnp.max(jnp.asarray(small).reshape(16, 4, 16, 4), axis=(1, 3))
    ).sum() + 1


def test_no_instances_no_positives():
    gm = np.zeros((3, 64, 64), np.float32)
    valid = np.zeros((3,), np.float32)
    _, pos, score = assign_targets(
        jnp.asarray(gm), jnp.asarray(valid), grid_size=8, mask_hw=(16, 16)
    )
    assert float(jnp.sum(pos)) == 0.0
    assert float(jnp.sum(score)) == 0.0

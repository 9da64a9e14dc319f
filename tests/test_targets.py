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


def test_assignment_invariant_to_mask_resolution():
    """ADVICE r2: feeding /4-downsampled masks with FULL-RES stats must
    reproduce the full-res assignment exactly; stats recomputed from the
    maxpooled masks must NOT (thin structures dilate, shifting extents and
    area tiebreaks) — proving the stats pass-through is load-bearing."""
    import jax

    from basi_tpu.ops.resize import maxpool_hw
    from basi_tpu.train.targets import assign_targets_sparse

    size, s = 64, 8
    gm = np.zeros((2, size, size), np.float32)
    # 2px-thin bar STRADDLING a /4 boundary (rows 31-32): area 112 at full
    # res but maxpool dilates it to 2 whole /4 rows (area 28 in /4 cells),
    # while the blob (area 149 full) shrinks to ~15 — the smallest-area
    # conflict winner flips between resolutions.
    gm[0, 31:33, 4:60] = 1.0
    gm[1] = _blob(size, 28, 32, 7)  # contests cell (3,4) with the bar
    valid = np.array([1, 1], np.float32)
    small = np.asarray(maxpool_hw(jnp.asarray(gm), 4, 4))

    full_stats = instance_stats(jnp.asarray(gm), jnp.asarray(valid))
    a_full = assign_targets_sparse(
        jnp.asarray(gm), jnp.asarray(valid), grid_size=s, mask_hw=(16, 16),
        max_pos_cells=16)
    a_small_with_stats = assign_targets_sparse(
        jnp.asarray(small), jnp.asarray(valid), grid_size=s,
        mask_hw=(16, 16), max_pos_cells=16, stats=full_stats)
    a_small_naive = assign_targets_sparse(
        jnp.asarray(small), jnp.asarray(valid), grid_size=s,
        mask_hw=(16, 16), max_pos_cells=16)

    # sel_idx, tgt_masks, pos_sel, score_tgt identical with the pass-through
    for got, want in zip(a_small_with_stats, a_full):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # ...and the /4-stats assignment genuinely differs on this geometry:
    # at full res the thin bar (area 112) beats the blob (~154) on the
    # contested cell, but maxpool dilation doubles the bar's thickness at
    # /4 scale where the blob shrinks — the smallest-area winner flips,
    # changing that cell's TARGET MASK (the positive-cell set is stable).
    tgt_with, tgt_naive = np.asarray(a_small_with_stats[1]), np.asarray(
        a_small_naive[1])
    assert not np.array_equal(tgt_naive, tgt_with), \
        "expected /4-recomputed stats to change the conflict winner"

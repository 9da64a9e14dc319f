"""Tests: mask IoU, matrix NMS, greedy NMS vs a numpy reference."""

import jax.numpy as jnp
import numpy as np

from basi_tpu.ops.nms import (
    greedy_nms,
    mask_iou_matrix,
    matrix_nms,
    select_instances,
)


def _blob(size, cy, cx, r):
    yy, xx = np.mgrid[0:size, 0:size]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.float32)


def test_iou_matrix(rng):
    a = np.stack([_blob(32, 10, 10, 6), _blob(32, 24, 24, 5)])
    iou = np.asarray(mask_iou_matrix(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(np.diag(iou), 1.0, rtol=1e-5)
    assert iou[0, 1] < 0.05


def _numpy_greedy(masks, scores, thr):
    order = np.argsort(-scores)
    keep = np.zeros(len(scores), bool)
    flat = masks.reshape(len(masks), -1)
    inter = flat @ flat.T
    areas = flat.sum(1)
    union = areas[:, None] + areas[None, :] - inter
    iou = inter / np.maximum(union, 1e-6)
    for idx, i in enumerate(order):
        ok = True
        for j in order[:idx]:
            if keep[j] and iou[i, j] > thr:
                ok = False
                break
        keep[i] = ok
    return keep.astype(np.int32)


def test_greedy_nms_matches_numpy(rng):
    masks = np.stack([
        _blob(48, 16, 16, 10),
        _blob(48, 18, 17, 10),   # heavy overlap with #0
        _blob(48, 36, 36, 8),
        _blob(48, 35, 35, 9),    # heavy overlap with #2
        _blob(48, 16, 40, 6),
    ])
    scores = np.array([0.9, 0.8, 0.6, 0.7, 0.5], np.float32)
    got = np.asarray(greedy_nms(jnp.asarray(masks), jnp.asarray(scores), 0.5))
    want = _numpy_greedy(masks, scores, 0.5)
    np.testing.assert_array_equal(got, want)


def test_matrix_nms_decays_duplicates(rng):
    masks = np.stack([
        _blob(48, 16, 16, 10),
        _blob(48, 16, 16, 10),  # exact duplicate
        _blob(48, 36, 36, 8),
    ])
    scores = np.array([0.9, 0.85, 0.8], np.float32)
    out = np.asarray(matrix_nms(jnp.asarray(masks), jnp.asarray(scores)))
    assert out[0] > 0.85          # top kept
    assert out[1] < 0.2           # duplicate strongly decayed
    assert out[2] > 0.7           # disjoint barely touched


def test_select_instances_shapes_and_empty(rng):
    c, h, w = 16, 32, 32
    logits = jnp.asarray(rng.randn(c, h, w).astype(np.float32) - 5.0)  # all bg
    scores = jnp.asarray(rng.randn(c).astype(np.float32) - 5.0)
    masks, s = select_instances(logits, scores, num_slots=6, pre_top_k=8)
    assert masks.shape == (6, h, w)
    assert s.shape == (6,)
    assert float(s.max()) <= 0.05  # nothing confident

    # one strong instance
    blob = _blob(h, 16, 16, 8)
    logits = jnp.asarray(np.stack([blob * 10 - 5] + [np.zeros((h, w)) - 5] * (c - 1)).astype(np.float32))
    scores = jnp.asarray(np.array([3.0] + [-5.0] * (c - 1), np.float32))
    masks, s = select_instances(logits, scores, num_slots=6, pre_top_k=8)
    assert float(s[0]) > 0.5
    got_mask = np.asarray(masks[0]) > 0.5
    np.testing.assert_array_equal(got_mask, blob.astype(bool))


def test_select_from_kernels_matches_select_instances(rng):
    """The bandwidth-lean inference path must agree with the full path."""
    import jax.numpy as jnp
    from basi_tpu.ops.nms import select_instances_from_kernels

    h = w = 24
    e, c = 8, 12
    mask_feats = jnp.asarray(rng.randn(h, w, e).astype(np.float32))
    kernels = jnp.asarray(rng.randn(c, e).astype(np.float32))
    scores = jnp.asarray(rng.randn(c).astype(np.float32))
    mask_logits = jnp.einsum("hwe,ke->khw", mask_feats, kernels)

    m1, s1 = select_instances(mask_logits, scores, num_slots=4,
                              score_threshold=0.0, pre_top_k=6)
    m2, s2 = select_instances_from_kernels(mask_feats, kernels, scores,
                                           num_slots=4, score_threshold=0.0,
                                           pre_top_k=6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-5)


def test_matrix_nms_suppresses_exact_ties():
    """Bit-identical duplicate candidates (tied scores) must suppress each
    other — strict > comparison alone kept both at full score."""
    import jax.numpy as jnp
    import numpy as np

    from basi_tpu.ops.nms import matrix_nms

    m = np.zeros((2, 16, 16), np.float32)
    m[:, 4:12, 4:12] = 1.0  # identical masks
    scores = jnp.asarray([0.9, 0.9])
    out = np.asarray(matrix_nms(jnp.asarray(m), scores, sigma=2.0))
    assert out[0] == 0.9          # index tiebreak: first keeps full score
    assert out[1] < 0.9 * np.exp(-0.9)  # second heavily decayed (IoU 1)


def test_select_small_grid_fewer_candidates_than_slots():
    """grid C < pre_top_k AND C < num_slots must not crash lax.top_k and
    must pad empty slots with zero scores."""
    import jax.numpy as jnp
    import numpy as np

    from basi_tpu.ops.nms import select_instances_from_kernels

    rng = np.random.RandomState(0)
    mf = jnp.asarray(rng.rand(16, 16, 8).astype(np.float32))
    kernels = jnp.asarray(rng.rand(9, 8).astype(np.float32))  # 3x3 grid
    cell_scores = jnp.asarray(rng.rand(9).astype(np.float32) * 4 - 2)
    masks, scores = select_instances_from_kernels(
        mf, kernels, cell_scores, num_slots=20, pre_top_k=64)
    assert masks.shape == (20, 16, 16) and scores.shape == (20,)
    assert np.all(np.asarray(scores)[9:] == 0.0)


def test_matrix_linear_nms_reachable():
    import jax.numpy as jnp
    import numpy as np

    from basi_tpu.ops.nms import select_instances_from_kernels

    rng = np.random.RandomState(1)
    mf = jnp.asarray(rng.rand(16, 16, 8).astype(np.float32))
    kernels = jnp.asarray(rng.rand(16, 8).astype(np.float32))
    cell_scores = jnp.asarray(rng.rand(16).astype(np.float32))
    masks, scores = select_instances_from_kernels(
        mf, kernels, cell_scores, num_slots=4, nms="matrix_linear")
    assert masks.shape[0] == 4

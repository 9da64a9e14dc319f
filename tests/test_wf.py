"""Weighted F-measure (Margolin et al. CVPR 2014) — device implementation
vs an independent scipy transcription of the original MATLAB algorithm,
plus an exact brute-force check of the two-stage EDT decomposition."""

import jax.numpy as jnp
import numpy as np
import pytest

from basi_tpu.evals.saliency import _edt_payload, weighted_f_measure


def _wf_oracle(pred, gt, beta2=1.0):
    """Direct numpy/scipy transcription of WFb.m (Margolin et al.)."""
    from scipy.ndimage import distance_transform_edt
    from scipy.ndimage import convolve as nd_convolve

    pred = pred.astype(np.float64)
    gt = (gt > 0.5)
    e = np.abs(pred - gt.astype(np.float64))
    dst, idx = distance_transform_edt(~gt, return_indices=True)
    et = e.copy()
    et[~gt] = e[idx[0][~gt], idx[1][~gt]]
    i = np.arange(7) - 3.0
    k1 = np.exp(-(i ** 2) / 50.0)
    k = np.outer(k1, k1)
    k /= k.sum()
    ea = nd_convolve(et, k, mode="constant", cval=0.0)
    min_e_ea = e.copy()
    sel = gt & (ea < e)
    min_e_ea[sel] = ea[sel]
    b = np.ones_like(e)
    b[~gt] = 2.0 - np.exp(np.log(0.5) / 5.0 * dst[~gt])
    ew = min_e_ea * b
    tpw = gt.sum() - ew[gt].sum()
    fpw = ew[~gt].sum()
    r = 1.0 - ew[gt].mean() if gt.any() else 0.0
    p = tpw / (tpw + fpw + 1e-8)
    return (1 + beta2) * r * p / (beta2 * p + r + 1e-8)


def _blobs(rng, h, w, k=2):
    gt = np.zeros((h, w), np.float32)
    for _ in range(k):
        cy, cx = rng.randint(5, h - 5), rng.randint(5, w - 5)
        r = rng.randint(3, min(h, w) // 4)
        yy, xx = np.mgrid[0:h, 0:w]
        gt[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 1.0
    return gt


def test_edt_distances_exact_brute_force():
    rng = np.random.RandomState(0)
    for _ in range(3):
        h, w = 20, 28
        fg = (rng.rand(h, w) < 0.05).astype(np.float32)
        fg[3, 7] = 1.0  # never empty
        pay = rng.rand(h, w).astype(np.float32)
        dist2, _ = (np.asarray(x) for x in _edt_payload(
            jnp.asarray(fg), jnp.asarray(pay), chunk=8))
        ys, xs = np.nonzero(fg)
        yy, xx = np.mgrid[0:h, 0:w]
        brute = np.min(
            (yy[..., None] - ys) ** 2 + (xx[..., None] - xs) ** 2, axis=-1)
        np.testing.assert_array_equal(dist2.astype(np.int64), brute)


def test_wf_matches_scipy_oracle():
    rng = np.random.RandomState(1)
    for seed in range(4):
        h, w = 48, 64
        gt = _blobs(rng, h, w)
        # Soft prediction correlated with GT + smooth noise.
        pred = np.clip(
            gt * rng.uniform(0.6, 1.0) + rng.rand(h, w) * 0.3, 0, 1
        ).astype(np.float32)
        got = float(weighted_f_measure(
            jnp.asarray(pred)[None], jnp.asarray(gt)[None])[0])
        want = _wf_oracle(pred, gt)
        # Distance ties can route the payload to a different (equidistant)
        # seed than scipy's bwdist tie-break — tolerance, not equality.
        assert abs(got - want) < 5e-3, (seed, got, want)


def test_wf_perfect_and_inverted():
    rng = np.random.RandomState(2)
    gt = _blobs(rng, 40, 40)
    one = float(weighted_f_measure(jnp.asarray(gt)[None],
                                   jnp.asarray(gt)[None])[0])
    assert one > 0.999
    inv = float(weighted_f_measure(jnp.asarray(1.0 - gt)[None],
                                   jnp.asarray(gt)[None])[0])
    assert inv < 0.05
    # Corruption strictly lowers the score.
    noisy = np.clip(gt + (rng.rand(40, 40) < 0.2) * 0.8 - 0.2, 0, 1)
    mid = float(weighted_f_measure(jnp.asarray(noisy.astype(np.float32))[None],
                                   jnp.asarray(gt)[None])[0])
    assert inv < mid < one


def test_wf_empty_gt_convention():
    z = jnp.zeros((1, 24, 24), jnp.float32)
    assert float(weighted_f_measure(z, z)[0]) == 1.0
    assert float(weighted_f_measure(z + 0.9, z)[0]) == 0.0


def test_wf_valid_mask_equals_crop():
    rng = np.random.RandomState(3)
    h, w, h0, w0 = 40, 48, 28, 30
    gt = np.zeros((h, w), np.float32)
    gt[:h0, :w0] = _blobs(rng, h0, w0, k=1)
    pred = np.zeros((h, w), np.float32)
    pred[:h0, :w0] = np.clip(
        gt[:h0, :w0] + rng.rand(h0, w0) * 0.4, 0, 1)
    # Junk outside the content region must be ignored under the mask.
    pred_dirty = pred.copy()
    pred_dirty[h0:, :] = rng.rand(h - h0, w)
    valid = np.zeros((h, w), np.float32)
    valid[:h0, :w0] = 1.0
    masked = float(weighted_f_measure(
        jnp.asarray(pred_dirty)[None], jnp.asarray(gt)[None],
        valid=jnp.asarray(valid)[None])[0])
    cropped = float(weighted_f_measure(
        jnp.asarray(pred[:h0, :w0])[None], jnp.asarray(gt[:h0, :w0])[None])[0])
    np.testing.assert_allclose(masked, cropped, atol=1e-5)


def test_wf_batched():
    rng = np.random.RandomState(4)
    gts = np.stack([_blobs(rng, 32, 32) for _ in range(3)])
    preds = np.clip(gts + rng.rand(3, 32, 32) * 0.2, 0, 1).astype(np.float32)
    out = np.asarray(weighted_f_measure(jnp.asarray(preds), jnp.asarray(gts)))
    assert out.shape == (3,)
    singles = [float(weighted_f_measure(jnp.asarray(preds[i])[None],
                                        jnp.asarray(gts[i])[None])[0])
               for i in range(3)]
    np.testing.assert_allclose(out, singles, atol=1e-6)

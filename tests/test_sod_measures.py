"""S-measure / E-measure / relaxed boundary-F vs independent numpy oracles.

The oracles below are direct loop/slice ports of the official metric
definitions (Fan et al. ICCV'17 structure measure; Fan et al. IJCAI'18
enhanced-alignment measure; rho-tolerant boundary F). The device versions
under test are algebraically restructured (index-mask quadrants, histogram
threshold sweeps, reduce_window morphology) — these tests pin the
restructuring to the plain definitions.
"""

import jax.numpy as jnp
import numpy as np

from basi_tpu.evals.saliency import (
    boundary_f_measure,
    e_measure_hist,
    s_measure,
)

EPS = 1e-8


# ---------------------------------------------------------------- S oracle
def _oracle_object(pred, ind):
    x = pred[ind].mean() if ind.any() else 0.0
    sigma = pred[ind].std() if ind.any() else 0.0
    return 2.0 * x / (x * x + 1.0 + sigma + EPS)


def _oracle_ssim(pred, gt):
    h, w = pred.shape
    n = h * w
    if n <= 1:
        return 1.0
    x, y = pred.mean(), gt.mean()
    sig_x = ((pred - x) ** 2).sum() / (n - 1)
    sig_y = ((gt - y) ** 2).sum() / (n - 1)
    sig_xy = ((pred - x) * (gt - y)).sum() / (n - 1)
    a = 4.0 * x * y * sig_xy
    b = (x * x + y * y) * (sig_x + sig_y)
    if a != 0:
        return a / (b + EPS)
    return 1.0 if b == 0 else 0.0


def _oracle_s(pred, gt, alpha=0.5):
    gt = (gt > 0.5).astype(np.float64)
    pred = pred.astype(np.float64)
    y = gt.mean()
    if y == 0:
        return 1.0 - pred.mean()
    if y == 1:
        return pred.mean()
    # object term
    s_obj = (y * _oracle_object(pred, gt == 1)
             + (1 - y) * _oracle_object(1.0 - pred, gt == 0))
    # region term: centroid quadrants (official convention: round+1, slice)
    h, w = gt.shape
    arg = np.argwhere(gt == 1)
    cy = int(np.round(arg[:, 0].mean())) + 1
    cx = int(np.round(arg[:, 1].mean())) + 1
    area = h * w
    s_reg = 0.0
    for (rs, cs, pr, gr) in [
        (cy, cx, pred[:cy, :cx], gt[:cy, :cx]),
        (cy, w - cx, pred[:cy, cx:], gt[:cy, cx:]),
        (h - cy, cx, pred[cy:, :cx], gt[cy:, :cx]),
        (h - cy, w - cx, pred[cy:, cx:], gt[cy:, cx:]),
    ]:
        weight = (rs * cs) / area
        if pr.size:
            s_reg += weight * _oracle_ssim(pr, gr)
    return max(alpha * s_obj + (1 - alpha) * s_reg, 0.0)


# ---------------------------------------------------------------- E oracle
def _oracle_e(pred_bin, gt):
    """Enhanced-alignment measure of ONE binarized pred vs binary gt."""
    gt = (gt > 0.5).astype(np.float64)
    p = pred_bin.astype(np.float64)
    n = gt.size
    if gt.sum() == 0:
        enhanced = 1.0 - p
    elif gt.sum() == n:
        enhanced = p
    else:
        phi_p = p - p.mean()
        phi_g = gt - gt.mean()
        align = 2 * phi_p * phi_g / np.maximum(phi_p**2 + phi_g**2, EPS)
        enhanced = (align + 1.0) ** 2 / 4.0
    # match the library's clamp: the official (n-1) normalizer lets a
    # perfect map score n/(n-1); reported E stays in [0, 1]
    return min(enhanced.sum() / (n - 1 + EPS), 1.0)


# ----------------------------------------------------------- boundary oracle
def _oracle_boundary(mask):
    """fg pixel is boundary unless its full 3x3 neighborhood (OOB = bg)
    is foreground."""
    h, w = mask.shape
    out = np.zeros_like(mask)
    for i in range(h):
        for j in range(w):
            if not mask[i, j]:
                continue
            interior = True
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    ii, jj = i + di, j + dj
                    if not (0 <= ii < h and 0 <= jj < w) or not mask[ii, jj]:
                        interior = False
            out[i, j] = 0 if interior else 1
    return out


def _oracle_near(b, rho):
    h, w = b.shape
    out = np.zeros_like(b)
    for i in range(h):
        for j in range(w):
            sl = b[max(0, i - rho):i + rho + 1, max(0, j - rho):j + rho + 1]
            out[i, j] = 1 if sl.any() else 0
    return out


def _oracle_boundary_f(pred, gt, thr=0.5, rho=3, beta2=0.3):
    p = (pred > thr).astype(np.int32)
    t = (gt > 0.5).astype(np.int32)
    pb, tb = _oracle_boundary(p), _oracle_boundary(t)
    if pb.sum() == 0 and tb.sum() == 0:
        return 1.0
    prec = (pb * _oracle_near(tb, rho)).sum() / max(pb.sum(), EPS)
    rec = (tb * _oracle_near(pb, rho)).sum() / max(tb.sum(), EPS)
    return (1 + beta2) * prec * rec / max(beta2 * prec + rec, EPS)


# ------------------------------------------------------------------- tests
def _blobs(rng, n, h, w):
    gt = np.zeros((n, h, w), np.float32)
    for i in range(n):
        for _ in range(rng.randint(1, 4)):
            y0, x0 = rng.randint(0, h - 4), rng.randint(0, w - 4)
            hh, ww = rng.randint(3, h // 2), rng.randint(3, w // 2)
            gt[i, y0:y0 + hh, x0:x0 + ww] = 1.0
    return gt


def test_s_measure_matches_oracle(rng):
    gt = _blobs(rng, 4, 24, 20)
    # noisy-but-correlated prediction keeps all branches non-degenerate
    pred = np.clip(gt * 0.8 + rng.rand(4, 24, 20) * 0.3, 0, 1).astype(
        np.float32)
    got = np.asarray(s_measure(jnp.asarray(pred), jnp.asarray(gt)))
    want = [_oracle_s(pred[i], gt[i]) for i in range(4)]
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_s_measure_edge_cases(rng):
    pred = rng.rand(2, 16, 16).astype(np.float32)
    empty = np.zeros((2, 16, 16), np.float32)
    full = np.ones((2, 16, 16), np.float32)
    got_e = np.asarray(s_measure(jnp.asarray(pred), jnp.asarray(empty)))
    got_f = np.asarray(s_measure(jnp.asarray(pred), jnp.asarray(full)))
    np.testing.assert_allclose(got_e, 1.0 - pred.mean(axis=(1, 2)), atol=1e-5)
    np.testing.assert_allclose(got_f, pred.mean(axis=(1, 2)), atol=1e-5)


def test_s_measure_perfect_prediction(rng):
    gt = _blobs(rng, 3, 20, 20)
    got = np.asarray(s_measure(jnp.asarray(gt), jnp.asarray(gt)))
    assert (got > 0.95).all()


def test_s_measure_valid_mask_equals_cropped(rng):
    """S over the content mask must equal S on the cropped content."""
    gt = _blobs(rng, 2, 12, 16)
    pred = np.clip(gt * 0.7 + rng.rand(2, 12, 16) * 0.3, 0, 1).astype(
        np.float32)
    gt_full = np.zeros((2, 16, 16), np.float32)
    pr_full = np.zeros((2, 16, 16), np.float32)
    gt_full[:, :12] = gt
    pr_full[:, :12] = pred
    valid = np.zeros((2, 16, 16), np.float32)
    valid[:, :12] = 1.0
    got = np.asarray(s_measure(jnp.asarray(pr_full), jnp.asarray(gt_full),
                               valid=jnp.asarray(valid)))
    want = np.asarray(s_measure(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_e_measure_hist_matches_bruteforce(rng):
    t_count = 64
    bins = rng.randint(0, t_count, size=(3, 16, 16))
    pred = ((bins + 0.5) / t_count).astype(np.float32)
    gt = _blobs(rng, 3, 16, 16)
    e_mat = np.asarray(e_measure_hist(jnp.asarray(pred), jnp.asarray(gt)))
    assert e_mat.shape == (t_count - 1, 3)
    for k in [1, 9, 33, 63]:
        want = [_oracle_e((pred[i] >= k / t_count).astype(np.float32), gt[i])
                for i in range(3)]
        np.testing.assert_allclose(e_mat[k - 1], want, atol=1e-4)


def test_e_measure_empty_and_full_gt(rng):
    t_count = 64
    pred = rng.rand(2, 12, 12).astype(np.float32)
    empty = np.zeros((2, 12, 12), np.float32)
    full = np.ones((2, 12, 12), np.float32)
    e_empty = np.asarray(e_measure_hist(jnp.asarray(pred), jnp.asarray(empty)))
    e_full = np.asarray(e_measure_hist(jnp.asarray(pred), jnp.asarray(full)))
    for k in [1, 31, 63]:
        for i in range(2):
            b = (pred[i] >= k / t_count).astype(np.float32)
            np.testing.assert_allclose(
                e_empty[k - 1, i], _oracle_e(b, empty[i]), atol=1e-4)
            np.testing.assert_allclose(
                e_full[k - 1, i], _oracle_e(b, full[i]), atol=1e-4)


def test_e_measure_valid_mask_equals_cropped(rng):
    gt = _blobs(rng, 2, 12, 16)
    pred = rng.rand(2, 12, 16).astype(np.float32)
    gt_full = np.zeros((2, 16, 16), np.float32)
    pr_full = np.zeros((2, 16, 16), np.float32)
    gt_full[:, :12] = gt
    pr_full[:, :12] = pred
    valid = np.zeros((2, 16, 16), np.float32)
    valid[:, :12] = 1.0
    got = np.asarray(e_measure_hist(jnp.asarray(pr_full),
                                    jnp.asarray(gt_full),
                                    valid=jnp.asarray(valid)))
    want = np.asarray(e_measure_hist(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_boundary_f_matches_oracle(rng):
    gt = _blobs(rng, 3, 20, 24)
    pred = np.clip(gt + (rng.rand(3, 20, 24) - 0.5) * 0.6, 0, 1).astype(
        np.float32)
    got = np.asarray(boundary_f_measure(jnp.asarray(pred), jnp.asarray(gt)))
    want = [_oracle_boundary_f(pred[i], gt[i]) for i in range(3)]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_boundary_f_perfect_and_empty():
    gt = np.zeros((2, 16, 16), np.float32)
    gt[0, 4:12, 4:12] = 1.0  # image 1: empty GT and empty pred
    got = np.asarray(boundary_f_measure(jnp.asarray(gt), jnp.asarray(gt)))
    np.testing.assert_allclose(got, [1.0, 1.0], atol=1e-6)
    # empty pred vs non-empty GT: no boundary agreement at all
    zero = np.zeros_like(gt)
    got2 = np.asarray(boundary_f_measure(jnp.asarray(zero), jnp.asarray(gt)))
    assert got2[0] < 1e-6 and got2[1] == 1.0


def test_boundary_f_rewards_tight_boundaries(rng):
    """A mask dilated by 1px keeps high relaxed-F (within rho); a mask
    shifted by far more than rho scores poorly."""
    gt = np.zeros((1, 32, 32), np.float32)
    gt[0, 8:24, 8:24] = 1.0
    near = np.zeros_like(gt)
    near[0, 7:25, 7:25] = 1.0  # 1-px dilation: inside rho=3
    far = np.zeros_like(gt)
    far[0, 18:34, 18:34] = 1.0  # 10-px shift: mostly outside rho
    f_near = float(boundary_f_measure(jnp.asarray(near), jnp.asarray(gt))[0])
    f_far = float(boundary_f_measure(jnp.asarray(far), jnp.asarray(gt))[0])
    assert f_near > 0.99
    assert f_far < 0.5

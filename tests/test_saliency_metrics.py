"""Saliency metric tests vs hand-computed values."""

import jax.numpy as jnp
import numpy as np

from basi_tpu.evals.saliency import f_measure, mae


def test_mae_simple():
    p = jnp.asarray(np.full((1, 4, 4), 0.25, np.float32))
    t = jnp.asarray(np.zeros((1, 4, 4), np.float32))
    assert abs(float(mae(p, t)) - 0.25) < 1e-6


def test_f_measure_perfect():
    t = np.zeros((2, 8, 8), np.float32)
    t[:, 2:6, 2:6] = 1.0
    maxf, meanf = f_measure(jnp.asarray(t), jnp.asarray(t))
    assert float(maxf) > 0.999
    assert 0 < float(meanf) <= 1.0


def test_f_measure_inverted_is_poor(rng):
    t = np.zeros((1, 8, 8), np.float32)
    t[:, :4] = 1.0
    maxf, _ = f_measure(jnp.asarray(1.0 - t), jnp.asarray(t))
    # inverted prediction: best threshold still catches everything-at-0
    assert float(maxf) < 0.75


def test_f_measure_hist_matches_bruteforce(rng):
    """Histogram F-curve must agree with the broadcast sweep when every
    prediction value sits strictly inside a bin (no edge ambiguity)."""
    from basi_tpu.evals.saliency import f_measure_hist

    t_count = 64
    # values at bin centers (k + 0.5)/T so >= comparisons are unambiguous
    bins = rng.randint(0, t_count, size=(2, 16, 16))
    p = (bins + 0.5) / t_count
    t = (rng.rand(2, 16, 16) > 0.5).astype(np.float32)
    f_mat = np.asarray(f_measure_hist(jnp.asarray(p, jnp.float32),
                                      jnp.asarray(t)))  # (T-1, N), k=1..T-1
    assert f_mat.shape[0] == t_count - 1  # threshold 0 row is excluded
    # brute force per threshold k/T
    for k in [1, 17, 40, 63]:
        binp = (p >= k / t_count).astype(np.float32)
        tp = (binp * t).sum(axis=(1, 2))
        prec = tp / np.maximum(binp.sum(axis=(1, 2)), 1e-8)
        rec = tp / np.maximum(t.sum(axis=(1, 2)), 1e-8)
        f = 1.3 * prec * rec / np.maximum(0.3 * prec + rec, 1e-8)
        np.testing.assert_allclose(f_mat[k - 1], f, atol=1e-5)


def test_f_measure_hist_excludes_degenerate_threshold_zero(rng):
    """An all-ones prediction at threshold 0 would give F == GT-prior; the
    returned curve must not contain that false max-F floor."""
    from basi_tpu.evals.saliency import f_measure_hist

    t = (rng.rand(1, 16, 16) > 0.8).astype(np.float32)  # sparse GT
    p = np.zeros((1, 16, 16), np.float32)  # model predicts nothing
    f_mat = np.asarray(f_measure_hist(jnp.asarray(p), jnp.asarray(t)))
    assert float(f_mat.max()) < 1e-6  # no degenerate all-positive row


def test_f_measure_hist_valid_mask_restricts_to_content(rng):
    """Padding pixels must not contribute: metrics over the masked region
    must equal metrics on the cropped content."""
    from basi_tpu.evals.saliency import f_measure_hist

    full = np.zeros((1, 16, 16), np.float32)
    gt = (rng.rand(1, 12, 16) > 0.5).astype(np.float32)
    pr = rng.rand(1, 12, 16).astype(np.float32)
    gt_full = full.copy(); gt_full[:, :12] = gt
    pr_full = full.copy(); pr_full[:, :12] = pr
    valid = np.zeros((1, 16, 16), np.float32); valid[:, :12] = 1.0
    got = np.asarray(f_measure_hist(jnp.asarray(pr_full),
                                    jnp.asarray(gt_full),
                                    valid=jnp.asarray(valid)))
    want = np.asarray(f_measure_hist(jnp.asarray(pr), jnp.asarray(gt)))
    np.testing.assert_allclose(got, want, atol=1e-5)

"""Golden AP values, hand-computed per COCO 101-point interpolation
(SURVEY §3.5): greedy score-ordered matching, precision envelope, mean
precision over the 0:0.01:1 recall grid."""

import numpy as np

from basi_tpu.evals.ap import APAccumulator


def test_ap_golden_tp_fp_mix():
    """2 GT, preds by score: TP(iou .8), FP, TP(iou .6).

    tau=0.5: tps=[1,0,1] -> recall [.5,.5,1], prec [1,.5,2/3];
      envelope 1.0 on r<=0.5 (51 grid pts), 2/3 above (50 pts)
      -> AP = (51 + 50*2/3)/101
    tau=0.7: only the .8-IoU pred matches -> envelope 1.0 on r<=0.5, 0 above
      -> AP = 51/101
    """
    acc = APAccumulator(thresholds=(0.5, 0.7))
    iou = np.array([
        [0.8, 0.0],
        [0.0, 0.0],
        [0.0, 0.6],
    ])
    acc.add(np.array([0.9, 0.8, 0.7]), iou, np.ones(2))
    ap = acc.ap()
    np.testing.assert_allclose(ap["AP@0.5"], (51 + 50 * 2 / 3) / 101, atol=1e-9)
    np.testing.assert_allclose(ap["AP@0.7"], 51 / 101, atol=1e-9)


def test_ap_greedy_uses_best_iou_gt_and_no_double_match():
    """One GT, two preds both over threshold: the higher-score pred takes
    the GT; the second becomes FP (no double-matching)."""
    acc = APAccumulator(thresholds=(0.5,))
    iou = np.array([[0.9], [0.8]])
    acc.add(np.array([0.9, 0.8]), iou, np.ones(1))
    ap = acc.ap()
    # recall [1,1], prec [1,.5] -> envelope 1.0 everywhere covered at r<=1
    np.testing.assert_allclose(ap["AP@0.5"], 1.0, atol=1e-9)


def test_ap_streams_across_images():
    """Accumulating two images must equal the same data as one stream:
    entries are globally re-sorted by score at ap() time."""
    a1 = APAccumulator(thresholds=(0.5,))
    a1.add(np.array([0.9]), np.array([[0.8]]), np.ones(1))
    a1.add(np.array([0.95, 0.2]), np.array([[0.0], [0.9]]), np.ones(1))

    a2 = APAccumulator(thresholds=(0.5,))
    # identical content, different image split order
    a2.add(np.array([0.95, 0.2]), np.array([[0.0], [0.9]]), np.ones(1))
    a2.add(np.array([0.9]), np.array([[0.8]]), np.ones(1))
    np.testing.assert_allclose(a1.ap()["AP@0.5"], a2.ap()["AP@0.5"], atol=1e-12)


def _naive_ap(images, thresholds=(0.5, 0.7)):
    """Straight-line per-threshold COCO matching + 101-pt AP (the spec the
    vectorized accumulator must reproduce bit-for-bit)."""
    ladder = tuple(np.round(np.arange(0.5, 1.0, 0.05), 2))
    all_thr = sorted(set(thresholds) | set(ladder))
    entries, num_gt = [], 0
    for scores, iou, gt_valid in images:
        gt_valid = gt_valid.astype(bool)
        num_gt += int(gt_valid.sum())
        matched = {t: np.zeros(iou.shape[1], bool) for t in all_thr}
        for k in np.argsort(-scores, kind="stable"):
            if scores[k] <= 0:
                continue
            tp = {}
            for t in all_thr:
                cand = np.where(gt_valid & ~matched[t] & (iou[k] >= t))[0]
                if cand.size:
                    matched[t][cand[np.argmax(iou[k][cand])]] = True
                    tp[t] = True
                else:
                    tp[t] = False
            entries.append((float(scores[k]), tp))
    entries.sort(key=lambda e: -e[0])
    ap_by_thr = {}
    for t in all_thr:
        tps = np.array([e[1][t] for e in entries], bool)
        tp_cum, fp_cum = np.cumsum(tps), np.cumsum(~tps)
        recall = tp_cum / num_gt
        precision = tp_cum / np.maximum(tp_cum + fp_cum, 1)
        prec_interp = np.maximum.accumulate(precision[::-1])[::-1]
        idx = np.searchsorted(recall, np.linspace(0, 1, 101), side="left")
        p = np.where(idx < len(prec_interp),
                     prec_interp[np.minimum(idx, len(prec_interp) - 1)], 0.0)
        ap_by_thr[t] = float(p.mean())
    out = {f"AP@{t}": ap_by_thr[t] for t in thresholds}
    out["mAP"] = float(np.mean([ap_by_thr[t] for t in ladder]))
    return out


def test_ap_vectorized_matches_naive_reference():
    """Randomized equivalence: the threshold-vectorized add()/ap() must
    reproduce the per-threshold greedy loop exactly (incl. score ties and
    padded GT slots)."""
    rng = np.random.RandomState(7)
    images = []
    acc = APAccumulator(thresholds=(0.5, 0.7))
    for _ in range(120):
        k, m = rng.randint(1, 20), rng.randint(1, 8)
        # Quantized scores force ties; zero scores exercise pad skipping.
        scores = np.round(rng.rand(k) * 4) / 4
        iou = np.round(rng.rand(k, m) * 20) / 20
        gt_valid = (rng.rand(m) > 0.2).astype(np.uint8)
        images.append((scores, iou, gt_valid))
        acc.add(scores, iou, gt_valid)
    want = _naive_ap(images)
    got = acc.ap()
    assert set(got) == set(want)
    for key in want:
        np.testing.assert_allclose(got[key], want[key], atol=1e-12, err_msg=key)


def test_ap_ignores_zero_score_and_invalid_gt():
    acc = APAccumulator(thresholds=(0.5,))
    # second GT slot invalid; zero-score preds are padding and skipped
    acc.add(np.array([0.9, 0.0, 0.0]),
            np.array([[0.8, 0.9], [0.9, 0.9], [0.9, 0.9]]),
            np.array([1, 0]))
    ap = acc.ap()
    assert acc._num_gt == 1
    np.testing.assert_allclose(ap["AP@0.5"], 1.0, atol=1e-9)


def test_ar_at_k_golden():
    """AR@K: GT matched at detection rank >= K does not count.

    One image, 2 GT. Det ranks (by score): det0 matches gt0 (iou .99),
    det1 is FP, ... det10 matches gt1 (iou .99) at rank 10. All ladder
    thresholds match identically (iou .99 > every tau <= .95):
      AR@1   = 1/2 (only gt0 within top-1)
      AR@10  = 1/2 (rank 10 is the 11th detection)
      AR@100 = 1
    """
    acc = APAccumulator()
    k = 11
    iou = np.zeros((k, 2))
    iou[0, 0] = 0.99
    iou[10, 1] = 0.99
    scores = np.linspace(0.9, 0.3, k)
    acc.add(scores, iou, np.ones(2))
    ar = acc.ar()
    np.testing.assert_allclose(ar["AR@1"], 0.5, atol=1e-9)
    np.testing.assert_allclose(ar["AR@10"], 0.5, atol=1e-9)
    np.testing.assert_allclose(ar["AR@100"], 1.0, atol=1e-9)


def test_ar_ladder_averaging():
    """A GT matched at IoU .6 counts for ladder taus {.5,.55,.6} only:
    AR@100 = 3/10."""
    acc = APAccumulator()
    acc.add(np.array([0.9]), np.array([[0.6]]), np.ones(1))
    ar = acc.ar()
    np.testing.assert_allclose(ar["AR@100"], 3 / 10, atol=1e-9)


def test_ar_size_bins():
    """Two GT: one small (100 px), one large (10000 px). Only the small
    one is matched -> AR_small=1, AR_large=0, AR_medium=-1 (no GT)."""
    acc = APAccumulator()
    acc.add(np.array([0.9]), np.array([[0.95, 0.0]]), np.ones(2),
            gt_areas=np.array([100.0, 10000.0]))
    ar = acc.ar()
    np.testing.assert_allclose(ar["AR@100_small"], 1.0, atol=1e-9)
    np.testing.assert_allclose(ar["AR@100_large"], 0.0, atol=1e-9)
    assert ar["AR@100_medium"] == -1.0
    # a mixed stream where one image lacks areas -> bins unavailable
    acc.add(np.array([0.5]), np.array([[0.9, 0.0]]), np.ones(2))
    assert acc.ar()["AR@100_small"] == -1.0


def test_ar_empty_and_invalid_gt():
    acc = APAccumulator()
    assert acc.ar()["AR@100"] == 0.0
    # invalid GT slots are excluded from both numerator and denominator
    acc.add(np.array([0.9]), np.array([[0.0, 0.9]]), np.array([1, 0]))
    assert acc.ar()["AR@100"] == 0.0

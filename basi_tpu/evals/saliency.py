"""Saliency-map metrics: MAE, F-measure, S-measure, E-measure and relaxed
boundary-F (device-side).

The salient-object-detection literature the reference belongs to (BASNet,
ILSO papers) reports MAE and max/mean F-beta alongside instance AP, and the
modern SOD benchmark suite adds the structure measure S (Fan et al.,
ICCV 2017), the enhanced-alignment measure E (Fan et al., IJCAI 2018) and —
for boundary-aware models like BASNet — the relaxed boundary F-measure
(rho-tolerant boundary precision/recall). The instance part is covered by
evals.ap — these complete the eval surface for the saliency branch. All
reductions run on device; only small per-image tensors return.

TPU-native notes:
  * max-E over a threshold sweep reuses the SAME per-image histograms as
    max-F: for a binarized prediction the E alignment map takes only four
    values (one per (pred,gt) cell), each a function of the scalar means —
    so the sweep is O(T) scalar math after one histogram pass instead of a
    (T, N, H, W) broadcast.
  * S-measure's centroid quadrant split uses index masks (i < cy) instead
    of dynamic slicing, keeping every shape static under jit/vmap.
  * boundary extraction/dilation are ``lax.reduce_window`` min/max pools.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-8


@jax.jit
def mae(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error between prob maps (N, H, W)."""
    return jnp.mean(jnp.abs(pred.astype(jnp.float32)
                            - target.astype(jnp.float32)))


@functools.partial(jax.jit, static_argnames=("num_thresholds",))
def f_measure(pred: jnp.ndarray, target: jnp.ndarray,
              beta2: float = 0.3, num_thresholds: int = 255):
    """(max-F, mean-F) over a threshold sweep, vectorized on device.

    pred/target: (N, H, W) in [0, 1]. The sweep is one broadcasted
    comparison — (T, N, H, W) reductions, no Python loop.
    """
    p = pred.astype(jnp.float32)
    t = (target.astype(jnp.float32) > 0.5).astype(jnp.float32)
    thr = (jnp.arange(num_thresholds, dtype=jnp.float32) + 0.5) / num_thresholds
    binp = (p[None] >= thr[:, None, None, None]).astype(jnp.float32)
    tp = jnp.sum(binp * t[None], axis=(-2, -1))  # (T, N)
    precision = tp / jnp.maximum(jnp.sum(binp, axis=(-2, -1)), _EPS)
    recall = tp / jnp.maximum(jnp.sum(t, axis=(-2, -1))[None], _EPS)
    f = ((1 + beta2) * precision * recall
         / jnp.maximum(beta2 * precision + recall, _EPS))
    f_per_thr = jnp.mean(f, axis=1)  # average over images
    return jnp.max(f_per_thr), jnp.mean(f_per_thr)


@functools.partial(jax.jit, static_argnames=("num_thresholds",))
def f_measure_hist(pred: jnp.ndarray, target: jnp.ndarray,
                   beta2: float = 0.3, num_thresholds: int = 64,
                   valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-image F-beta curve over thresholds k/T, k=1..T-1 — O(N*H*W) mem.

    The broadcasted sweep in :func:`f_measure` materializes (T, N, H, W);
    at full 512^2 eval resolution that is ~270 MB per batch. This version
    histograms each prediction into T bins (one scatter-add pass), then
    reverse-cumsums the per-bin counts: tp(k) = #(pred >= k/T & gt),
    pp(k) = #(pred >= k/T). Threshold 0 is EXCLUDED: its row (every pixel
    positive) gives a degenerate F equal to the GT prior, which would put
    a false floor under the reported max-F. Returns the (T-1, N) F matrix
    so a streaming evaluator can average per-image F over the dataset
    before taking the max (the SOD dataset-level max-F convention).

    ``valid``: optional (N, H, W) 0/1 mask restricting the metric to the
    letterbox content region (padding pixels otherwise count as trivially
    correct negatives, deflating the metric for non-square images).
    """
    tp, pp, gt_area, _ = _threshold_hist_counts(pred, target, num_thresholds,
                                                valid)
    precision = tp / jnp.maximum(pp, _EPS)
    recall = tp / jnp.maximum(gt_area, _EPS)
    f = ((1 + beta2) * precision * recall
         / jnp.maximum(beta2 * precision + recall, _EPS))
    return f[:, 1:].T  # (T-1, N): thresholds k/T, k=1..T-1


def _threshold_hist_counts(pred, target, num_thresholds, valid):
    """Shared histogram pass for the threshold-sweep metrics.

    Returns (tp, pp, gt_area, n_valid): tp/pp are (N, T) counts of
    (pred >= k/T & gt) / (pred >= k/T) for k = 0..T-1; gt_area is (N, 1)
    and n_valid (N, 1) the content-pixel count.
    """
    t_count = num_thresholds
    n = pred.shape[0]
    p = pred.astype(jnp.float32).reshape(n, -1)
    t = (target.astype(jnp.float32) > 0.5).astype(jnp.float32)
    t = t.reshape(n, -1)
    w = (jnp.ones_like(p) if valid is None
         else valid.reshape(n, -1).astype(jnp.float32))
    t = t * w
    # bin b means p in [b/T, (b+1)/T); pred >= k/T <=> bin >= k
    bins = jnp.clip((p * t_count).astype(jnp.int32), 0, t_count - 1)

    def hists(b, tw, ww):
        all_h = jnp.zeros((t_count,), jnp.float32).at[b].add(ww)
        pos_h = jnp.zeros((t_count,), jnp.float32).at[b].add(tw)
        return all_h, pos_h

    all_h, pos_h = jax.vmap(hists)(bins, t, w)  # (N, T) each
    pp = jnp.cumsum(all_h[:, ::-1], axis=1)[:, ::-1]  # (N, T): #(bin >= k)
    tp = jnp.cumsum(pos_h[:, ::-1], axis=1)[:, ::-1]
    gt_area = jnp.sum(t, axis=1, keepdims=True)
    n_valid = jnp.sum(w, axis=1, keepdims=True)
    return tp, pp, gt_area, n_valid


@functools.partial(jax.jit, static_argnames=("num_thresholds",))
def e_measure_hist(pred: jnp.ndarray, target: jnp.ndarray,
                   num_thresholds: int = 64,
                   valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-image E-measure curve over thresholds k/T, k=1..T-1 — (T-1, N).

    Enhanced-alignment measure (Fan et al., IJCAI 2018): for binarized
    pred B and gt G, phi = x - mean(x); align = 2*phi_B*phi_G /
    (phi_B^2 + phi_G^2); enhanced = (align+1)^2/4; E = mean over the
    (H*W - 1)-normalized sum. Because B and G are binary, the alignment
    map takes exactly four values — functions of the scalar means — so the
    whole sweep reduces to the tp/pp histogram counts (see module note).

    Edge cases follow the official implementation: empty GT scores the
    fraction of predicted-background pixels; full-frame GT the fraction of
    predicted-foreground pixels. Returns the curve so a streaming
    evaluator can average per-image E over the dataset before taking the
    max (dataset-level max-E convention, like max-F).
    """
    tp, pp, gt_area, n = _threshold_hist_counts(pred, target, num_thresholds,
                                                valid)
    fp = pp - tp
    fn = gt_area - tp
    tn = n - pp - fn
    mu_p = pp / jnp.maximum(n, 1.0)
    mu_g = gt_area / jnp.maximum(n, 1.0)

    def enhanced(phi_p, phi_g):
        align = (2.0 * phi_p * phi_g
                 / jnp.maximum(phi_p ** 2 + phi_g ** 2, _EPS))
        return (align + 1.0) ** 2 / 4.0

    total = (tp * enhanced(1.0 - mu_p, 1.0 - mu_g)
             + fp * enhanced(1.0 - mu_p, -mu_g)
             + fn * enhanced(-mu_p, 1.0 - mu_g)
             + tn * enhanced(-mu_p, -mu_g))
    e = total / jnp.maximum(n - 1.0, _EPS)
    # Official edge cases: GT empty -> enhanced map is 1-B; GT full -> B.
    e = jnp.where(gt_area <= 0.0, (n - pp) / jnp.maximum(n - 1.0, _EPS), e)
    e = jnp.where(gt_area >= n, pp / jnp.maximum(n - 1.0, _EPS), e)
    # The official (H*W - 1) normalizer lets a perfect map score
    # n/(n-1) — marginally above 1. Clamp so reported E stays in [0, 1]
    # (divergence from the official value is at most 1/(n-1)).
    return jnp.minimum(e, 1.0)[:, 1:].T  # (T-1, N): thresholds k/T


def _masked_moments(x: jnp.ndarray, w: jnp.ndarray, ddof: int = 0):
    """(mean, var, count) of ``x`` over the weight/indicator mask ``w``."""
    n = jnp.sum(w)
    mean = jnp.sum(x * w) / jnp.maximum(n, _EPS)
    var = (jnp.sum(((x - mean) ** 2) * w)
           / jnp.maximum(n - float(ddof), _EPS))
    return mean, var, n


def _region_ssim(p: jnp.ndarray, t: jnp.ndarray, w: jnp.ndarray):
    """SSIM-flavoured similarity of one centroid quadrant (weight mask w),
    matching the official S-measure's ``ssim`` (ddof=1 moments)."""
    n = jnp.sum(w)
    safe_n = jnp.maximum(n, _EPS)
    x = jnp.sum(p * w) / safe_n
    y = jnp.sum(t * w) / safe_n
    nm1 = jnp.maximum(n - 1.0, _EPS)
    sig_x = jnp.sum(((p - x) ** 2) * w) / nm1
    sig_y = jnp.sum(((t - y) ** 2) * w) / nm1
    sig_xy = jnp.sum((p - x) * (t - y) * w) / nm1
    a = 4.0 * x * y * sig_xy
    b = (x ** 2 + y ** 2) * (sig_x + sig_y)
    return jnp.where(a != 0.0, a / (b + _EPS),
                     jnp.where(b == 0.0, 1.0, 0.0))


def _s_object_term(p: jnp.ndarray, ind: jnp.ndarray) -> jnp.ndarray:
    """Object-level similarity of pred values over one GT region
    (official ``object``: 2*mean / (mean^2 + 1 + std), ddof=0 std)."""
    x, var, _ = _masked_moments(p, ind)
    return 2.0 * x / (x ** 2 + 1.0 + jnp.sqrt(var) + _EPS)


def _s_measure_single(p: jnp.ndarray, t: jnp.ndarray, w: jnp.ndarray,
                      alpha: float) -> jnp.ndarray:
    """Structure measure of ONE image; p/t/w are (H, W) f32."""
    h, wd = p.shape
    n = jnp.maximum(jnp.sum(w), 1.0)
    y = jnp.sum(t * w) / n  # GT foreground prior over the content region
    mean_p = jnp.sum(p * w) / n

    # --- object term: GT-fg stats of pred, GT-bg stats of (1 - pred) ---
    fg_ind = t * w
    bg_ind = (1.0 - t) * w
    s_obj = (y * _s_object_term(p * fg_ind, fg_ind)
             + (1.0 - y) * _s_object_term((1.0 - p) * bg_ind, bg_ind))

    # --- region term: 4 quadrants at the GT centroid (official rounding:
    # round(mean coordinate) + 1, upper-left block inclusive) ---
    nf = jnp.maximum(jnp.sum(fg_ind), _EPS)
    rows = jnp.arange(h, dtype=jnp.float32)[:, None]
    cols = jnp.arange(wd, dtype=jnp.float32)[None, :]
    cy = jnp.round(jnp.sum(rows * fg_ind) / nf) + 1.0
    cx = jnp.round(jnp.sum(cols * fg_ind) / nf) + 1.0
    top = (rows < cy).astype(jnp.float32)
    left = (cols < cx).astype(jnp.float32)
    quads = (top * left, top * (1 - left), (1 - top) * left,
             (1 - top) * (1 - left))
    s_reg = 0.0
    for q in quads:
        qw = q * w
        weight = jnp.sum(qw) / n  # == official area fraction when w == 1
        s_reg = s_reg + weight * _region_ssim(p, t, qw)

    s = alpha * s_obj + (1.0 - alpha) * s_reg
    s = jnp.maximum(s, 0.0)
    # Official edge cases: empty GT scores 1 - mean(pred); full GT mean(pred).
    s = jnp.where(y <= 0.0, 1.0 - mean_p, s)
    s = jnp.where(y >= 1.0, mean_p, s)
    return s


@functools.partial(jax.jit, static_argnames=("alpha",))
def s_measure(pred: jnp.ndarray, target: jnp.ndarray,
              valid: jnp.ndarray | None = None,
              alpha: float = 0.5) -> jnp.ndarray:
    """Per-image structure measure S (Fan et al., ICCV 2017) — (N,) f32.

    S = alpha * S_object + (1-alpha) * S_region. The region term splits
    pred/GT into four blocks at the GT centroid; here the split is four
    index MASKS (static shapes — no dynamic slicing under jit), with
    weighted moments replacing the official implementation's sliced-array
    moments, which is exactly equivalent. ``valid`` restricts everything
    to the letterbox content region (moments, centroid, block weights).
    """
    p = pred.astype(jnp.float32)
    t = (target.astype(jnp.float32) > 0.5).astype(jnp.float32)
    w = (jnp.ones_like(p) if valid is None else valid.astype(jnp.float32))
    return jax.vmap(lambda pi, ti, wi: _s_measure_single(pi, ti, wi, alpha))(
        p, t, w)


def _pool3(x: jnp.ndarray, size: int, op: str) -> jnp.ndarray:
    """Same-padded (size x size) min/max pool over the trailing 2 dims of
    an (N, H, W) f32 tensor."""
    init = -jnp.inf if op == "max" else jnp.inf
    fn = jax.lax.max if op == "max" else jax.lax.min
    return jax.lax.reduce_window(
        x, init, fn, (1, size, size), (1, 1, 1),
        [(0, 0), (size // 2, size // 2), (size // 2, size // 2)])


@functools.partial(jax.jit, static_argnames=("threshold", "rho", "beta2"))
def boundary_f_measure(pred: jnp.ndarray, target: jnp.ndarray,
                       valid: jnp.ndarray | None = None,
                       threshold: float = 0.5, rho: int = 3,
                       beta2: float = 0.3) -> jnp.ndarray:
    """Per-image relaxed boundary F-measure — (N,) f32.

    The boundary-quality metric of the BASNet line (the model family the
    reference's saliency branch follows): binarize at ``threshold``,
    extract one-pixel boundaries (fg minus its 3x3 erosion, borders count
    as boundary), then relaxed precision = fraction of predicted-boundary
    pixels within ``rho`` of a GT-boundary pixel (maxpool dilation of the
    GT boundary with a (2*rho+1) window) and symmetrically for recall.
    Both-empty boundaries score 1 (nothing to delineate, nothing wrong);
    one-sided-empty scores 0. Reported at the fixed binarization rather
    than a 255-threshold sweep — the sweep's (T, N, H, W) erosions are the
    exact broadcast blowup the histogram metrics avoid.
    """
    p = (pred.astype(jnp.float32) > threshold).astype(jnp.float32)
    t = (target.astype(jnp.float32) > 0.5).astype(jnp.float32)
    if valid is not None:
        w = valid.astype(jnp.float32)
        p = p * w
        t = t * w
    # boundary = fg and not eroded(fg); outside-image counts as background,
    # so foreground touching the border is boundary (oracle convention).
    pb = p * (1.0 - _pool3(p, 3, "min"))
    tb = t * (1.0 - _pool3(t, 3, "min"))
    win = 2 * rho + 1
    tb_near = _pool3(tb, win, "max")  # within rho of a GT boundary pixel
    pb_near = _pool3(pb, win, "max")
    n_pb = jnp.sum(pb, axis=(1, 2))
    n_tb = jnp.sum(tb, axis=(1, 2))
    prec = jnp.sum(pb * tb_near, axis=(1, 2)) / jnp.maximum(n_pb, _EPS)
    rec = jnp.sum(tb * pb_near, axis=(1, 2)) / jnp.maximum(n_tb, _EPS)
    f = ((1 + beta2) * prec * rec
         / jnp.maximum(beta2 * prec + rec, _EPS))
    both_empty = (n_pb == 0) & (n_tb == 0)
    return jnp.where(both_empty, 1.0, f)


# ---------------------------------------------------------------------------
# Weighted F-measure (Margolin, Zelnik-Manor, Tal — "How to Evaluate
# Foreground Maps?", CVPR 2014): the standard SOD metric that weights each
# pixel's error by (a) its dependency on the nearest foreground error and
# (b) an importance map decaying with distance from the foreground.
#
# The original needs bwdist (a Euclidean distance transform WITH nearest-
# seed indices). TPU-native design: EDT over a grid decomposes exactly into
# two 1-D min-plus passes —
#     D^2(y, x) = min_{x'} [ (x - x')^2 + g^2(y, x') ],
#     g^2(y, x') = min_{y' : GT(y', x') = 1} (y - y')^2
# — each pass a masked broadcast-min over one axis (VPU-friendly, static
# shapes, no sequential scan). Instead of materializing nearest-seed
# indices and gathering, each pass carries the PAYLOAD we actually need
# (the error value at the seed) through its argmin, so the whole transform
# is reductions + two take_along_axis. Passes are chunked along the
# non-reduced axis to bound the (H, H, Wc)/(Hc, W, W) broadcast at ~64 MB.
# ---------------------------------------------------------------------------

_WF_BIG = 1e12


def _edt_payload(fg: jnp.ndarray, payload: jnp.ndarray,
                 chunk: int = 64) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact EDT to the nearest ``fg`` pixel, carrying ``payload``.

    fg: (H, W) 0/1; payload: (H, W) f32. Returns (dist2, payload_at_nearest)
    both (H, W) f32. Where fg has no pixel at all, dist2 is ~_WF_BIG and the
    payload is payload[0, 0] — callers must handle the empty-GT case.
    Tie-break: smallest x' then smallest y' (first argmin occurrence).
    """
    h, w = fg.shape
    ii = jnp.arange(h, dtype=jnp.float32)
    d2v = (ii[:, None] - ii[None, :]) ** 2  # (H, H') vertical costs
    block = jnp.where(fg > 0, 0.0, _WF_BIG)  # (H, W)

    def col_pass(args):
        blk, pay = args  # (H, Wc) each
        cost = d2v[:, :, None] + blk[None, :, :]  # (H, H', Wc)
        arg = jnp.argmin(cost, axis=1)  # (H, Wc) -> y' of nearest fg in col
        dist1 = jnp.take_along_axis(cost, arg[:, None, :], axis=1)[:, 0, :]
        pay1 = jnp.take_along_axis(pay, arg, axis=0)
        return dist1, pay1

    wc = min(chunk, w)
    n_chunks = -(-w // wc)
    wp = n_chunks * wc
    blk_p = jnp.pad(block, ((0, 0), (0, wp - w)), constant_values=_WF_BIG)
    pay_p = jnp.pad(payload, ((0, 0), (0, wp - w)))
    blk_c = jnp.moveaxis(blk_p.reshape(h, n_chunks, wc), 1, 0)
    pay_c = jnp.moveaxis(pay_p.reshape(h, n_chunks, wc), 1, 0)
    dist1_c, pay1_c = jax.lax.map(col_pass, (blk_c, pay_c))
    dist1 = jnp.moveaxis(dist1_c, 0, 1).reshape(h, wp)[:, :w]  # (H, W)
    pay1 = jnp.moveaxis(pay1_c, 0, 1).reshape(h, wp)[:, :w]

    jj = jnp.arange(w, dtype=jnp.float32)
    d2h = (jj[:, None] - jj[None, :]) ** 2  # (W, W')

    def row_pass(args):
        d1, p1 = args  # (Hc, W) each
        cost = d2h[None, :, :] + d1[:, None, :]  # (Hc, W, W')
        arg = jnp.argmin(cost, axis=2)  # (Hc, W) -> x' of nearest fg
        dist2 = jnp.take_along_axis(cost, arg[:, :, None], axis=2)[:, :, 0]
        pay2 = jnp.take_along_axis(p1, arg, axis=1)
        return dist2, pay2

    hc = min(chunk, h)
    n_chunks = -(-h // hc)
    hp = n_chunks * hc
    d1_p = jnp.pad(dist1, ((0, hp - h), (0, 0)), constant_values=_WF_BIG)
    p1_p = jnp.pad(pay1, ((0, hp - h), (0, 0)))
    dist2_c, pay2_c = jax.lax.map(
        (row_pass), (d1_p.reshape(n_chunks, hc, w), p1_p.reshape(n_chunks, hc, w)))
    dist2 = dist2_c.reshape(hp, w)[:h]
    pay2 = pay2_c.reshape(hp, w)[:h]
    return dist2, pay2


def _gauss7(x: jnp.ndarray, sigma: float = 5.0) -> jnp.ndarray:
    """7x7 Gaussian filter, zero-padded borders (MATLAB imfilter default),
    separable. x: (H, W) f32."""
    i = jnp.arange(7, dtype=jnp.float32) - 3.0
    k1 = jnp.exp(-(i ** 2) / (2.0 * sigma * sigma))
    k2 = jnp.outer(k1, k1)
    k1 = k1 / jnp.sqrt(jnp.sum(k2))  # outer(k1, k1) sums to 1
    xr = x[None, :, :, None]
    kr = k1.reshape(7, 1, 1, 1)
    y = jax.lax.conv_general_dilated(
        xr, kr, (1, 1), [(3, 3), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    kc = k1.reshape(1, 7, 1, 1)
    y = jax.lax.conv_general_dilated(
        y, kc, (1, 1), [(0, 0), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y[0, :, :, 0]


def _weighted_f_single(pred: jnp.ndarray, gt: jnp.ndarray,
                       valid: jnp.ndarray, beta2: float) -> jnp.ndarray:
    """wF for ONE image (H, W). ``valid`` masking is EXACTLY equivalent to
    evaluating on the content crop zero-padded to (H, W): GT foreground
    lives inside the content region, errors outside are zeroed before the
    (zero-padded) Gaussian, and all sums are content-masked."""
    p = jnp.clip(pred.astype(jnp.float32), 0.0, 1.0) * valid
    t = (gt.astype(jnp.float32) > 0.5).astype(jnp.float32) * valid
    e = jnp.abs(p - t) * valid
    dist2, e_nearest = _edt_payload(t, e)
    et = jnp.where(t > 0, e, e_nearest) * valid
    ea = _gauss7(et)
    min_e_ea = jnp.where((t > 0) & (ea < e), ea, e)
    # Importance: 1 on fg; on bg decays with the distance to the fg.
    dst = jnp.sqrt(jnp.minimum(dist2, _WF_BIG))
    b = jnp.where(t > 0, 1.0, 2.0 - jnp.exp(jnp.log(0.5) / 5.0 * dst))
    ew = min_e_ea * b
    fg_area = jnp.sum(t)
    tpw = fg_area - jnp.sum(ew * t)
    fpw = jnp.sum(ew * (1.0 - t) * valid)
    recall = 1.0 - jnp.sum(ew * t) / jnp.maximum(fg_area, _EPS)
    prec = tpw / jnp.maximum(tpw + fpw, _EPS)
    wf = ((1.0 + beta2) * prec * recall
          / jnp.maximum(beta2 * prec + recall, _EPS))
    # Empty GT: nothing to weight against — score 1 if the prediction is
    # also (binarized-)empty, else 0 (boundary_f_measure convention).
    pred_empty = jnp.sum((p > 0.5) * valid) == 0
    return jnp.where(fg_area > 0, wf,
                     jnp.where(pred_empty, 1.0, 0.0))


@functools.partial(jax.jit, static_argnames=("beta2",))
def weighted_f_measure(pred: jnp.ndarray, target: jnp.ndarray,
                       valid: jnp.ndarray | None = None,
                       beta2: float = 1.0) -> jnp.ndarray:
    """Per-image weighted F-measure (Margolin et al. CVPR 2014) — (N,) f32.

    pred/target: (N, H, W), pred in [0, 1]. beta2 = beta^2 (the paper uses
    beta = 1). Images run sequentially (lax.map): the EDT passes already
    saturate the VPU per image, and mapping keeps the chunked broadcasts'
    footprint batch-size-independent.
    """
    w = (jnp.ones_like(pred, dtype=jnp.float32) if valid is None
         else valid.astype(jnp.float32))
    return jax.lax.map(
        lambda args: _weighted_f_single(args[0], args[1], args[2], beta2),
        (pred.astype(jnp.float32), target.astype(jnp.float32), w))

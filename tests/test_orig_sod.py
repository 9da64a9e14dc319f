"""Original-resolution SOD metrics (SURVEY §3.2/§3.5): with
``infer.ap_at_original`` the WHOLE eval — AP matching and the saliency
metric suite (MAE, max-F, max-E, S, boundary-F) — runs at the reference's
geometry: predictions pasted to native size, GT read at native size.
Letterbox-frame parity when orig == model size is pinned by
tests/test_orig_ap.py::test_orig_ap_parity_when_orig_equals_model_size
(it compares the FULL metrics dict); these tests pin the divergence and
the orig-frame program itself."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from basi_tpu.data.datasets import SyntheticDataset, iter_epoch
from basi_tpu.infer import Inferencer

from helpers import tiny_config

SAL_KEYS = ("saliency_mae", "saliency_maxF", "saliency_maxE",
            "saliency_S", "saliency_boundaryF", "saliency_wF")


def test_orig_sod_metrics_end_to_end_nonsquare():
    """e2e ``evaluate`` with ap_at_original on non-square originals: the
    whole SOD suite must come back from the original-frame program, finite
    and in [0, 1]. (Frame DIVERGENCE is pinned by the direct-program test
    below — a random-init model emits a near-constant ~0.5 saliency map,
    which is frame-insensitive by construction, so an e2e divergence
    assertion would test the init, not the geometry.)"""
    cfg = tiny_config(batch_size=4)
    ds = SyntheticDataset(n=8, image_size=64, max_instances=4, seed=7,
                          orig_max_scale=1.9)
    cfg2 = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, ap_at_original=True))
    inf2 = Inferencer(cfg2)
    m_or = inf2.evaluate(dataset=ds)

    for key in SAL_KEYS:
        assert key in m_or, (key, m_or)
        assert np.isfinite(m_or[key]), (key, m_or[key])
        assert 0.0 <= m_or[key] <= 1.0, (key, m_or[key])


def test_orig_frame_eval_program_direct():
    """Drive the per-bucket jitted program directly: a perfect
    letterbox-frame prob map (== letterboxed GT union) scores MAE 0 in the
    letterbox frame but > 0 against native GT for upscaled originals —
    while staying clearly aligned (S-measure high)."""
    ds = SyntheticDataset(n=4, image_size=64, max_instances=4, seed=5,
                          orig_max_scale=2.0)
    batch = next(iter_epoch(ds, 4, shuffle=False, seed=0, drop_last=False))
    assert int(np.max(batch["orig_hw"])) > 64

    inf = Inferencer(tiny_config(batch_size=4))
    full = jnp.asarray(batch["masks"].astype(np.float32))  # (N, M, h, w)
    union = np.max(
        batch["masks"].astype(np.float32)
        * batch["valid"][:, :, None, None].astype(np.float32), axis=1)
    out = inf._orig_frame_eval(full, jnp.asarray(union), batch, ds)
    iou, mae_per, f_mat, e_mat, s_per, bf_per, wf_per, gt_areas = (
        np.asarray(x) for x in out)

    n = 4
    assert iou.shape[0] == n and mae_per.shape == (n,)
    assert f_mat.shape == e_mat.shape and f_mat.shape[1] == n
    assert s_per.shape == bf_per.shape == wf_per.shape == (n,)
    # gt_areas are NATIVE-frame pixel counts (size-binned AR geometry)
    for j in range(n):
        om, _ = ds.get_orig_masks(int(batch["index"][j]))
        np.testing.assert_array_equal(
            gt_areas[j], om.astype(np.int64).sum(axis=(1, 2)))
    # letterbox-frame MAE of this prob map vs letterbox GT is exactly 0;
    # at native resolution the resample mismatch must show up...
    assert mae_per.max() > 1e-4, mae_per
    # ...but the map is still structurally right (not garbage)
    assert s_per.min() > 0.7, s_per
    assert np.all((s_per >= 0) & (s_per <= 1))
    assert np.all((bf_per >= 0) & (bf_per <= 1))
    assert np.all((e_mat >= 0) & (e_mat <= 1 + 1e-6))


def test_orig_sod_empty_gt_edge_case():
    """An image whose GT slots are all invalid: union is empty at the
    native frame; S/E must take their official empty-GT branches (finite,
    in [0,1]) rather than divide by zero."""
    ds = SyntheticDataset(n=4, image_size=64, max_instances=4, seed=5,
                          orig_max_scale=1.5)
    batch = next(iter_epoch(ds, 4, shuffle=False, seed=0, drop_last=False))
    batch = dict(batch)
    batch["valid"] = np.zeros_like(batch["valid"])  # no valid GT anywhere

    inf = Inferencer(tiny_config(batch_size=4))
    full = jnp.asarray(batch["masks"].astype(np.float32))
    sal = jnp.zeros((4,) + batch["masks"].shape[2:], jnp.float32)
    out = inf._orig_frame_eval(full, sal, batch, ds)
    _, mae_per, f_mat, e_mat, s_per, bf_per, wf_per, _ = (
        np.asarray(x) for x in out)
    for arr in (mae_per, e_mat, s_per, bf_per, wf_per):
        assert np.all(np.isfinite(arr)), arr
        assert np.all((arr >= 0) & (arr <= 1 + 1e-6)), arr

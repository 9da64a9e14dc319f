"""Original-resolution AP protocol (SURVEY §3.2/§3.5, VERDICT r2 item 5):
the reference pastes predictions to the original image size and evaluates
THERE. These tests pin (a) parity with letterbox-frame matching when
orig == model size, (b) genuine divergence on non-square originals, and
(c) the end-to-end eval path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from basi_tpu.data.datasets import SyntheticDataset, iter_epoch
from basi_tpu.infer import Inferencer
from basi_tpu.ops.nms import mask_iou_matrix

from helpers import tiny_config


def _strip_timing(metrics):
    return {k: v for k, v in metrics.items()
            if k not in ("infer_ms_per_batch", "imgs_per_s",
                         "png_ms_per_batch")}


def test_orig_ap_parity_when_orig_equals_model_size():
    """Square originals at model size: paste is the identity on the content
    region and native GT == letterboxed GT, so both protocols must report
    the SAME metrics."""
    cfg = tiny_config(batch_size=4)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, synthetic_n=16))
    inf = Inferencer(cfg)
    m_letterbox = inf.evaluate()

    cfg2 = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, ap_at_original=True))
    inf2 = Inferencer(cfg2, params=inf.params, batch_stats=inf.batch_stats)
    m_orig = inf2.evaluate()
    assert _strip_timing(m_orig) == _strip_timing(m_letterbox)


def test_orig_frame_iou_diverges_on_nonsquare_originals():
    """A PERFECT letterbox-frame prediction (prob mask == letterboxed GT)
    scores IoU 1.0 in the letterbox frame but < 1.0 against native GT:
    nearest-downsample + bilinear paste is not the identity for curved /
    rotated shapes. This is exactly the geometry gap the protocol option
    closes."""
    ds = SyntheticDataset(n=4, image_size=64, max_instances=4, seed=5,
                          orig_max_scale=2.0)
    batch = next(iter_epoch(ds, 4, shuffle=False, seed=0, drop_last=False))
    assert int(np.max(batch["orig_hw"])) > 64  # non-square, above model res

    inf = Inferencer(tiny_config(batch_size=4))
    full = jnp.asarray(batch["masks"].astype(np.float32))  # (N, M, 64, 64)

    lb = np.asarray(jax.vmap(mask_iou_matrix)(
        full, jnp.asarray(batch["masks"], jnp.float32)))
    sal0 = jnp.zeros((4,) + full.shape[2:], jnp.float32)
    orig = np.asarray(inf._orig_frame_eval(full, sal0, batch, ds)[0])
    assert lb.shape == orig.shape

    diag_lb, diag_orig = [], []
    for i in range(4):
        for m in range(4):
            if batch["valid"][i, m]:
                diag_lb.append(lb[i, m, m])
                diag_orig.append(orig[i, m, m])
    diag_lb, diag_orig = np.array(diag_lb), np.array(diag_orig)
    np.testing.assert_allclose(diag_lb, 1.0, atol=1e-6)
    # still clearly the right instance...
    assert diag_orig.min() > 0.5, diag_orig
    # ...but measurably below 1: the frames genuinely differ
    assert diag_orig.max() < 0.999, diag_orig


def test_orig_ap_end_to_end_on_rect_synthetic():
    cfg = tiny_config(batch_size=4)
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, ap_at_original=True))
    inf = Inferencer(cfg)
    ds = SyntheticDataset(n=8, image_size=64, max_instances=4, seed=1,
                          orig_max_scale=1.8)
    metrics = inf.evaluate(dataset=ds)
    for key in ("AP@0.5", "mAP", "saliency_mae"):
        assert key in metrics and np.isfinite(metrics[key]), metrics


def test_orig_ap_requires_native_gt():
    import pytest

    class NoOrig:
        def __len__(self):
            return 4

        def get(self, i):
            raise NotImplementedError

    cfg = tiny_config(batch_size=4)
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, ap_at_original=True))
    inf = Inferencer(cfg)
    with pytest.raises(ValueError, match="get_orig_masks"):
        inf.evaluate(dataset=NoOrig())

"""Test-time augmentation (infer.tta / infer.tta_scales).

Correctness of the geometric realignment is pinned by an involution
property: the TTA(hflip) ensemble of ``flip(x)`` must be exactly the
W-mirror of the ensemble of ``x`` (the two runs see the SAME set of views,
so every averaged probability is bitwise identical up to mirror indexing).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from basi_tpu.infer import Inferencer
from basi_tpu.models.resnet import depth_to_space, space_to_depth

from helpers import tiny_config


def _tta_cfg(tta="hflip", scales=(), stem_mode="conv7"):
    cfg = tiny_config(batch_size=2)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, stem_mode=stem_mode),
        infer=dataclasses.replace(cfg.infer, batch_size=2, tta=tta,
                                  tta_scales=scales),
    )
    return cfg


def _images(seed=0, n=2, size=64):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, size, size, 3) * 255).astype(np.uint8)


def test_depth_to_space_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.rand(2, 16, 16, 3) * 255).astype(np.uint8))
    assert (depth_to_space(space_to_depth(x, 2), 2) == x).all()


def test_hflip_involution():
    cfg = _tta_cfg(tta="hflip")
    inf = Inferencer(cfg)
    imgs = _images()
    m1, s1, sal1 = jax.device_get(
        inf.run_fn(inf.params, inf.batch_stats, jnp.asarray(imgs)))
    m2, s2, sal2 = jax.device_get(
        inf.run_fn(inf.params, inf.batch_stats, jnp.asarray(imgs[:, :, ::-1])))
    # Same view set -> identical ensemble, mirrored geometry.
    np.testing.assert_allclose(s1, s2, atol=1e-6)
    np.testing.assert_allclose(m1, m2[:, :, :, ::-1], atol=1e-6)
    np.testing.assert_allclose(sal1, sal2[:, :, ::-1], atol=1e-5)


def test_tta_duplicate_scale_matches_plain():
    # tta_scales=(1.0,) builds two IDENTICAL views; their mean is bitwise
    # the single-view value, so the ensemble must reproduce the plain path.
    base = Inferencer(_tta_cfg(tta="", scales=()))
    tta = Inferencer(_tta_cfg(tta="", scales=(1.0,)))
    # Same init seed -> identical params.
    imgs = jnp.asarray(_images())
    m0, s0, sal0 = jax.device_get(base.run_fn(base.params, base.batch_stats, imgs))
    m1, s1, sal1 = jax.device_get(tta.run_fn(base.params, base.batch_stats, imgs))
    np.testing.assert_allclose(s0, s1, atol=1e-6)
    np.testing.assert_allclose(m0, m1, atol=1e-6)
    # Saliency goes prob -> logit(mean) under TTA: equal up to roundtrip eps.
    np.testing.assert_allclose(sal0, sal1, atol=1e-4)


def test_tta_packed_s2d_feed_matches_raw():
    cfg = _tta_cfg(tta="hflip", stem_mode="s2d")
    inf = Inferencer(cfg)
    imgs = _images()
    raw = jnp.asarray(imgs)
    packed = space_to_depth(raw, 2)
    out_raw = jax.device_get(inf.run_fn(inf.params, inf.batch_stats, raw))
    out_packed = jax.device_get(inf.run_fn(inf.params, inf.batch_stats, packed))
    for a, b in zip(out_raw, out_packed):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_tta_multiscale_runs_and_is_sane():
    cfg = _tta_cfg(tta="hflip", scales=(0.5,))
    inf = Inferencer(cfg)
    masks, scores, sal = jax.device_get(
        inf.run_fn(inf.params, inf.batch_stats, jnp.asarray(_images())))
    ns = cfg.model.num_slots
    assert masks.shape == (2, ns, 16, 16)  # /4 of 64
    assert scores.shape == (2, ns)
    assert np.isfinite(masks).all() and np.isfinite(scores).all()
    assert (masks >= 0).all() and (masks <= 1).all()
    assert np.isfinite(sal).all()


def test_tta_connected_mechanism():
    cfg = _tta_cfg(tta="hflip")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model,
                                       instance_mechanism="connected"))
    inf = Inferencer(cfg)
    imgs = _images()
    m1, s1, _ = jax.device_get(
        inf.run_fn(inf.params, inf.batch_stats, jnp.asarray(imgs)))
    m2, s2, _ = jax.device_get(
        inf.run_fn(inf.params, inf.batch_stats, jnp.asarray(imgs[:, :, ::-1])))
    # Involution holds modulo component LABEL order (extraction scans in
    # raster order, which mirrors under flip) — compare the score MULTISET
    # and the unioned foreground.
    np.testing.assert_allclose(np.sort(s1, axis=1), np.sort(s2, axis=1),
                               atol=1e-6)
    np.testing.assert_allclose(np.max(m1, axis=1),
                               np.max(m2, axis=1)[:, :, ::-1], atol=1e-6)


def test_tta_bad_value_rejected():
    import pytest

    cfg = _tta_cfg(tta="vflip")
    with pytest.raises(ValueError):
        Inferencer(cfg)


def test_tta_composes_with_int8_quant():
    cfg = _tta_cfg(tta="hflip")
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, tta="hflip", dtype="int8"))
    inf = Inferencer(cfg)
    masks, scores, sal = jax.device_get(
        inf.run_fn(inf.params, inf.batch_stats, jnp.asarray(_images())))
    assert np.isfinite(masks).all() and np.isfinite(scores).all()
    assert np.isfinite(sal).all()


def test_tta_rejects_nonpositive_scale():
    import pytest

    with pytest.raises(ValueError):
        Inferencer(_tta_cfg(tta="", scales=(-0.5,)))


def _roi_cfg(tta="hflip", scales=()):
    cfg = _tta_cfg(tta=tta, scales=scales)
    # score_threshold below the focal-prior init (~0.01): random-init
    # proposals must SURVIVE selection, or the involution checks would
    # compare all-zero slot tensors (vacuously equal).
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, instance_mechanism="roi"),
        infer=dataclasses.replace(cfg.infer, score_threshold=1e-3))


def test_tta_roi_hflip_involution():
    """ROI TTA = detection-style view union (boxes mirrored analytically,
    ROI-frame masks W-flipped). TTA(hflip) of flip(x) sees the SAME view
    set as TTA(hflip) of x, so the candidate union is identical up to
    mirror — detections and scores must match after mirroring."""
    inf = Inferencer(_roi_cfg(tta="hflip"))
    imgs = _images()
    m1, s1, sal1 = jax.device_get(
        inf.run_fn(inf.params, inf.batch_stats, jnp.asarray(imgs)))
    m2, s2, sal2 = jax.device_get(
        inf.run_fn(inf.params, inf.batch_stats, jnp.asarray(imgs[:, :, ::-1])))
    assert (np.asarray(s1) > 0).any()  # non-vacuous: slots survived
    np.testing.assert_allclose(s1, s2, atol=1e-5)
    np.testing.assert_allclose(m1, m2[:, :, :, ::-1], atol=1e-5)
    np.testing.assert_allclose(sal1, sal2[:, :, ::-1], atol=1e-5)


def test_tta_roi_duplicate_scale_matches_plain():
    """tta_scales=(1.0,) duplicates every proposal; NMS sees each
    detection twice at the same score. Matrix NMS would decay duplicates
    (gauss kernel at IoU 1), so the exactness check uses greedy NMS,
    under which a duplicated candidate set selects the same instances."""
    base_cfg = _roi_cfg(tta="", scales=())
    base_cfg = dataclasses.replace(
        base_cfg, infer=dataclasses.replace(base_cfg.infer, nms="greedy"))
    tta_cfg = dataclasses.replace(
        base_cfg, infer=dataclasses.replace(base_cfg.infer, tta="",
                                            tta_scales=(1.0,)))
    base = Inferencer(base_cfg)
    tta = Inferencer(tta_cfg)
    imgs = jnp.asarray(_images())
    m0, s0, _ = jax.device_get(base.run_fn(base.params, base.batch_stats, imgs))
    m1, s1, _ = jax.device_get(tta.run_fn(base.params, base.batch_stats, imgs))
    np.testing.assert_allclose(s0, s1, atol=1e-5)
    np.testing.assert_allclose(m0, m1, atol=1e-5)


def test_tta_roi_multiscale_runs_and_is_sane():
    inf = Inferencer(_roi_cfg(tta="hflip", scales=(0.5,)))
    masks, scores, sal = jax.device_get(
        inf.run_fn(inf.params, inf.batch_stats, jnp.asarray(_images())))
    ns = inf.cfg.model.num_slots
    assert masks.shape == (2, ns, 16, 16)
    assert scores.shape == (2, ns)
    assert np.isfinite(masks).all() and np.isfinite(scores).all()
    assert (masks >= 0).all() and (masks <= 1).all()
    assert np.isfinite(sal).all()

"""Data path tests: synthetic dataset, folder dataset + decoders, the
prefetch pipeline, and on-device joint augmentation."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from basi_tpu.data.datasets import (
    FolderDataset,
    SyntheticDataset,
    iter_epoch,
    letterbox_params,
)
from basi_tpu.data.pipeline import DeviceFeed
from basi_tpu.data.transforms import random_augment, scale_jitter_one

import jax


def test_synthetic_deterministic():
    ds = SyntheticDataset(n=4, image_size=64, max_instances=4, seed=7)
    a = ds.get(2)
    b = ds.get(2)
    np.testing.assert_array_equal(a.image, b.image)
    np.testing.assert_array_equal(a.masks, b.masks)
    assert a.valid.sum() >= 1
    # instances are disjoint (occlusion resolved)
    overlap = (a.masks.astype(int).sum(0) > 1).sum()
    assert overlap == 0


def test_letterbox_params():
    assert letterbox_params(100, 200, 512) == (256, 512)
    assert letterbox_params(512, 512, 512) == (512, 512)
    assert letterbox_params(50, 25, 512) == (512, 256)


def test_folder_dataset_labeled_png(tmp_path):
    from PIL import Image

    os.makedirs(tmp_path / "images")
    os.makedirs(tmp_path / "masks")
    rng = np.random.RandomState(0)
    img = (rng.rand(80, 120, 3) * 255).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "images" / "a.jpg")
    lab = np.zeros((80, 120), np.uint8)
    lab[10:30, 10:40] = 1
    lab[50:70, 60:100] = 2
    Image.fromarray(lab).save(tmp_path / "masks" / "a.png")

    ds = FolderDataset(str(tmp_path), image_size=64, max_instances=4,
                       decode_backend="pil")
    assert len(ds) == 1
    s = ds.get(0)
    assert s.image.shape == (64, 64, 3)
    assert s.valid.tolist() == [1, 1, 0, 0]
    assert s.masks[0].sum() > 0 and s.masks[1].sum() > 0
    assert tuple(s.orig_hw) == (80, 120)
    # masks don't overlap and live inside the letterboxed content region
    vh, vw = s.valid_hw
    assert s.masks[:, vh:, :].sum() == 0
    assert s.masks[:, :, vw:].sum() == 0


def test_device_feed_matches_host_iter():
    ds = SyntheticDataset(n=8, image_size=32, max_instances=2, seed=0)
    feed = DeviceFeed(ds, batch_size=4, shuffle=True, seed=3)
    got = [
        {k: np.asarray(v) for k, v in b.items()} for b in feed.epoch(0)
    ]
    want = list(iter_epoch(ds, 4, shuffle=True, seed=3))
    assert len(got) == len(want) == feed.steps_per_epoch()
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g["image"], w["image"])
        np.testing.assert_array_equal(g["masks"], w["masks"])


def test_device_feed_propagates_errors():
    class Bad(SyntheticDataset):
        def get(self, i):
            raise RuntimeError("boom")

    feed = DeviceFeed(Bad(n=4, image_size=32), batch_size=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(feed.epoch(0))


def test_scale_jitter_identity(rng):
    img = jnp.asarray(rng.rand(32, 32, 3).astype(np.float32))
    masks = jnp.asarray((rng.rand(2, 32, 32) > 0.5).astype(np.float32))
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    img2, masks2 = scale_jitter_one(img, masks, one, zero, zero)
    np.testing.assert_allclose(np.asarray(img2), np.asarray(img), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(masks2), np.asarray(masks))


def test_random_augment_flip_consistency(rng):
    imgs = jnp.asarray(rng.rand(4, 16, 16, 3).astype(np.float32))
    masks = jnp.asarray((rng.rand(4, 2, 16, 16) > 0.5).astype(np.float32))
    key = jax.random.PRNGKey(0)
    out_i, out_m, flip = random_augment(key, imgs, masks, hflip_prob=1.0,
                                        enable_scale=False)
    np.testing.assert_allclose(np.asarray(out_i),
                               np.asarray(jnp.flip(imgs, axis=2)), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_m),
                                  np.asarray(jnp.flip(masks, axis=3)))


def test_scale_jitter_zoom_out_pads(rng):
    img = jnp.ones((32, 32, 3), jnp.float32)
    masks = jnp.ones((1, 32, 32), jnp.float32)
    img2, masks2 = scale_jitter_one(img, masks, jnp.float32(0.5),
                                    jnp.float32(0.0), jnp.float32(0.0))
    # zoomed out to half size: content occupies ~quarter area, rest zero
    frac = float(np.asarray(masks2).mean())
    assert 0.2 < frac < 0.35, frac


def test_folder_dataset_per_instance_pngs(tmp_path):
    from PIL import Image

    os.makedirs(tmp_path / "images")
    os.makedirs(tmp_path / "masks" / "b")
    rng = np.random.RandomState(1)
    img = (rng.rand(60, 60, 3) * 255).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "images" / "b.jpg")
    for k in range(3):
        m = np.zeros((60, 60), np.uint8)
        m[k * 15:k * 15 + 12, 10:50] = 255
        Image.fromarray(m).save(tmp_path / "masks" / "b" / f"{k}.png")

    ds = FolderDataset(str(tmp_path), image_size=64, max_instances=4,
                       decode_backend="pil")
    s = ds.get(0)
    assert s.valid.tolist() == [1, 1, 1, 0]
    assert all(s.masks[k].sum() > 0 for k in range(3))


def _native_available():
    from basi_tpu.data.native import build_native
    return build_native() is not None


@pytest.mark.skipif(not _native_available(), reason="native decoder not built")
def test_batch_decode_matches_sequential(tmp_path):
    """FolderDataset.get_batch (C++ thread-pool decode) must produce byte-
    identical samples to the per-item get() path, for both mask layouts."""
    from PIL import Image

    from basi_tpu.data.datasets import FolderDataset, iter_epoch

    rng = np.random.RandomState(0)
    (tmp_path / "images").mkdir()
    (tmp_path / "masks").mkdir()
    for i in range(5):
        img = (rng.rand(40 + i * 7, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / "images" / f"s{i}.png")
        if i % 2 == 0:  # labeled layout
            lab = np.zeros((40 + i * 7, 64), np.uint8)
            lab[5:20, 5:30] = 1
            lab[25:35, 40:60] = 2
            Image.fromarray(lab).save(tmp_path / "masks" / f"s{i}.png")
        else:  # per-instance layout
            (tmp_path / "masks" / f"s{i}").mkdir()
            m = np.zeros((40 + i * 7, 64), np.uint8)
            m[10:30, 10:50] = 255
            Image.fromarray(m).save(tmp_path / "masks" / f"s{i}" / "0.png")

    ds = FolderDataset(str(tmp_path), image_size=64, max_instances=3,
                       decode_backend="native")
    sequential = [ds.get(i) for i in range(5)]
    batched = ds.get_batch(np.arange(5))
    for a, b in zip(sequential, batched):
        np.testing.assert_array_equal(a.image, b.image)
        np.testing.assert_array_equal(a.masks, b.masks)
        np.testing.assert_array_equal(a.valid, b.valid)
        np.testing.assert_array_equal(a.orig_hw, b.orig_hw)
        np.testing.assert_array_equal(a.valid_hw, b.valid_hw)
        assert a.name == b.name
    # and through iter_epoch (which auto-uses get_batch when present)
    batch = next(iter_epoch(ds, 4, shuffle=False, seed=0, drop_last=False))
    np.testing.assert_array_equal(batch["image"][2], sequential[2].image)
    np.testing.assert_array_equal(batch["masks"][3], sequential[3].masks)


@pytest.mark.skipif(not _native_available(), reason="native decoder not built")
def test_native_png_alpha_and_trns_safe(tmp_path):
    """Palette+tRNS and RGBA PNGs: libpng's palette_to_rgb expands tRNS to
    RGBA, which (pre-fix) overflowed the 3-byte/px row buffers. Both must
    decode safely and match the PIL fallback."""
    from PIL import Image

    from basi_tpu.data.native import get_decoder

    rgb = (np.random.RandomState(0).rand(96, 64, 3) * 255).astype(np.uint8)
    pal = Image.fromarray(rgb).convert("P", palette=Image.ADAPTIVE, colors=16)
    p1 = str(tmp_path / "pal_trns.png")
    pal.save(p1, transparency=0)
    rgba = np.dstack(
        [rgb, (np.random.RandomState(1).rand(96, 64) * 255).astype(np.uint8)])
    p2 = str(tmp_path / "rgba.png")
    Image.fromarray(rgba, "RGBA").save(p2)

    nat = get_decoder("native")
    pil = get_decoder("pil")
    for p in (p1, p2):
        a, hw_a = nat.decode_letterbox(p, 128)
        b, hw_b = pil.decode_letterbox(p, 128)
        assert hw_a == hw_b and a.shape == b.shape == (128, 128, 3)
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_letterbox_params_rounds_half_away_like_native():
    """382.5 must round to 383 (int(x+0.5)), matching the C++ letterbox;
    Python round() would give 382 (banker's rounding) and shift valid_hw
    one pixel off the decoded content."""
    from basi_tpu.data.datasets import letterbox_params

    assert letterbox_params(765, 1024, 512) == (383, 512)
    assert letterbox_params(1024, 765, 512) == (512, 383)


def test_device_feed_abandoned_epoch_releases_producer():
    """Breaking out of an epoch early must not leave the producer thread
    blocked on the full queue (it held device batches pinned forever)."""
    import threading
    import time

    from basi_tpu.data.datasets import SyntheticDataset
    from basi_tpu.data.pipeline import DeviceFeed

    before = threading.active_count()
    ds = SyntheticDataset(n=64, image_size=32, max_instances=2)
    feed = DeviceFeed(ds, 4, shuffle=False, seed=0, depth=2)
    it = feed.epoch(0)
    next(it)
    it.close()  # abandon mid-epoch (same path as an exception in the step)
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_labeled_palette_png_preserves_instance_ids(tmp_path):
    """VOC-style palettized labeled masks: ids live in palette INDICES; an
    RGB conversion would collide ids sharing a channel value (e.g. palette
    colors (0,128,0) and (0,0,128) both have R=0) and merge instances."""
    from PIL import Image

    from basi_tpu.data.datasets import FolderDataset

    root = tmp_path / "ds"
    (root / "images").mkdir(parents=True)
    (root / "masks").mkdir()
    img = np.zeros((64, 64, 3), np.uint8)
    Image.fromarray(img).save(root / "images" / "a.png")

    lab = np.zeros((64, 64), np.uint8)
    lab[8:24, 8:24] = 1
    lab[40:56, 40:56] = 2
    pil = Image.fromarray(lab, mode="P")
    # palette where ids 1 and 2 collide in EVERY RGB channel-0 readout
    pal = [0, 0, 0, 0, 128, 0, 0, 0, 128] + [0] * (768 - 9)
    pil.putpalette(pal)
    pil.save(root / "masks" / "a.png")

    ds = FolderDataset(str(root), image_size=64, max_instances=4)
    s = ds.get(0)
    assert int(s.valid.sum()) == 2  # both instances survive
    assert s.masks[0].sum() > 0 and s.masks[1].sum() > 0
    np.testing.assert_array_equal(s.masks[0], (lab == 1).astype(np.uint8))
    np.testing.assert_array_equal(s.masks[1], (lab == 2).astype(np.uint8))
    # the batch path must agree exactly
    s2 = ds.get_batch([0])[0]
    np.testing.assert_array_equal(s.masks, s2.masks)


@pytest.mark.skipif(not _native_available(), reason="native decoder not built")
def test_nearest_convention_native_matches_pil(tmp_path):
    """Nearest letterbox (GT mask resize) must sample the SAME source
    pixels on both backends (center convention floor((j+0.5)*scale))."""
    from PIL import Image

    from basi_tpu.data.native import get_decoder

    rng = np.random.RandomState(0)
    m = (rng.rand(96, 128) > 0.5).astype(np.uint8) * 255
    p = str(tmp_path / "m.png")
    Image.fromarray(m).save(p)
    a, _ = get_decoder("native").decode_letterbox(p, 64, nearest=True)
    b, _ = get_decoder("pil").decode_letterbox(p, 64, nearest=True)
    np.testing.assert_array_equal(a, b)

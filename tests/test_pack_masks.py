"""Bit-packed GT mask feed (data.pack_masks): the masks are the bulk of
the train batch's host->device bytes (33 of 45 MB at batch-16/512^2/8
slots, and the round-3 e2e bench showed relay hosts are UPLOAD-bound), so
the feed ships them packed 8x and every consumer unpacks on-device.
Exactness is the contract: packed and raw batches must produce BITWISE
the same training step and eval metrics.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from basi_tpu.data.transforms import (
    maybe_unpack_masks,
    pack_masks_host,
    unpack_masks,
)
from tests.helpers import tiny_batch, tiny_config


def test_pack_unpack_roundtrip(rng):
    m = (rng.rand(2, 3, 16, 40) > 0.5).astype(np.uint8)
    packed = pack_masks_host(m)
    assert packed.shape == (2, 3, 16, 5)
    out = np.asarray(unpack_masks(jnp.asarray(packed), 40))
    np.testing.assert_array_equal(out, m)


def test_pack_unpack_non_multiple_of_8(rng):
    m = (rng.rand(1, 2, 4, 13) > 0.5).astype(np.uint8)
    out = np.asarray(unpack_masks(jnp.asarray(pack_masks_host(m)), 13))
    np.testing.assert_array_equal(out, m)


def test_maybe_unpack_dispatch(rng):
    m = (rng.rand(1, 2, 8, 32) > 0.5).astype(np.uint8)
    # raw passes through untouched
    assert maybe_unpack_masks(jnp.asarray(m), 32) is not None
    np.testing.assert_array_equal(
        np.asarray(maybe_unpack_masks(jnp.asarray(m), 32)), m)
    # packed unpacks
    np.testing.assert_array_equal(
        np.asarray(maybe_unpack_masks(jnp.asarray(pack_masks_host(m)), 32)),
        m)
    # anything else is loud
    import pytest

    with pytest.raises(ValueError, match="bit-packed"):
        maybe_unpack_masks(jnp.asarray(m[..., :16]), 32)


def test_train_step_packed_masks_bitwise(rng):
    """One train step on a packed batch == the same step on the raw batch."""
    from basi_tpu.models.basi import create_model
    from basi_tpu.train.state import create_train_state, make_optimizer
    from basi_tpu.train.step import make_train_step

    cfg = tiny_config()
    model = create_model(cfg.model)
    tx, _ = make_optimizer(cfg.train, max_steps=4)
    state = create_train_state(model, cfg.model, cfg.train, max_steps=4,
                               tx=tx)
    step = make_train_step(model, tx, cfg.train, cfg.data, mesh=None,
                           donate=False)
    batch = tiny_batch(rng)
    raw = {k: jnp.asarray(v) for k, v in batch.items()}
    packed = dict(raw, masks=jnp.asarray(pack_masks_host(batch["masks"])))

    s1, m1 = step(state, raw)
    s2, m2 = step(state, packed)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        (s1.params, m1), (s2.params, m2))


def test_eval_packed_masks_matches_raw(rng):
    """Inferencer.evaluate with data.pack_masks on == off, exactly."""
    from basi_tpu.data.datasets import make_dataset
    from basi_tpu.infer import Inferencer

    cfg = tiny_config()
    cfg_off = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, pack_masks=False,
                                      synthetic_n=16))
    cfg_on = dataclasses.replace(
        cfg_off, data=dataclasses.replace(cfg_off.data, pack_masks=True))
    ds = make_dataset(cfg_off.data, split="val")
    m_off = Inferencer(cfg_off).evaluate(ds)
    m_on = Inferencer(cfg_on).evaluate(ds)
    drop = ("infer_ms_per_batch", "imgs_per_s", "png_ms_per_batch")
    assert {k: v for k, v in m_off.items() if k not in drop} == \
           {k: v for k, v in m_on.items() if k not in drop}


def test_device_feed_ships_packed(rng):
    from basi_tpu.data.datasets import make_dataset
    from basi_tpu.data.pipeline import DeviceFeed

    cfg = tiny_config()
    ds = make_dataset(dataclasses.replace(cfg.data, synthetic_n=16),
                      split="train")
    feed = DeviceFeed(ds, 8, shuffle=False, seed=0, pack_masks=True,
                      debug_sync=True)
    batch = next(iter(feed.epoch(0)))
    s = cfg.data.image_size
    assert batch["masks"].shape[-1] == s // 8
    got = np.asarray(maybe_unpack_masks(batch["masks"], s))
    raw = next(iter(DeviceFeed(ds, 8, shuffle=False, seed=0,
                               debug_sync=True).epoch(0)))["masks"]
    np.testing.assert_array_equal(got, np.asarray(raw))

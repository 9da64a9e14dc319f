"""Packed shard cache (data/shards.py): lossless roundtrip, batch parity,
iter_epoch equivalence, geometry validation, corruption detection, config
and CLI wiring."""

import dataclasses
import json
import os

import numpy as np
import pytest

from basi_tpu.data.datasets import SyntheticDataset, iter_epoch, make_dataset
from basi_tpu.data.shards import ShardDataset, pack_dataset

from helpers import tiny_config


def _source(n=10, size=64, m=4, orig_max_scale=1.6):
    # non-square originals so orig_hw/valid_hw carry real information
    return SyntheticDataset(n=n, image_size=size, max_instances=m, seed=3,
                            orig_max_scale=orig_max_scale)


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("shards"))
    src = _source()
    # shard_size=4 over 10 records -> 3 shard files (multi-shard paths on)
    pack_dataset(src, out, shard_size=4, batch_size=3, log=None)
    return src, out


def test_roundtrip_lossless(packed):
    src, out = packed
    ds = ShardDataset(out)
    assert len(ds) == len(src)
    assert len(json.load(open(os.path.join(out, "index.json")))["shards"]) == 3
    for i in range(len(src)):
        a, b = src.get(i), ds.get(i)
        np.testing.assert_array_equal(a.image, b.image)
        np.testing.assert_array_equal(a.masks, b.masks)
        np.testing.assert_array_equal(a.valid, b.valid)
        np.testing.assert_array_equal(a.orig_hw, b.orig_hw)
        np.testing.assert_array_equal(a.valid_hw, b.valid_hw)
        assert a.name == b.name
        assert ds.image_id(i) == src.image_id(i)


def test_get_batch_matches_get(packed):
    _, out = packed
    ds = ShardDataset(out)
    idx = [7, 0, 3, 7]  # out of order + repeat, crossing shard boundaries
    for got, i in zip(ds.get_batch(idx), idx):
        want = ds.get(i)
        np.testing.assert_array_equal(got.image, want.image)
        np.testing.assert_array_equal(got.masks, want.masks)


def test_iter_epoch_equivalent(packed):
    src, out = packed
    ds = ShardDataset(out)
    for ba, bb in zip(iter_epoch(src, 4, shuffle=True, seed=5),
                      iter_epoch(ds, 4, shuffle=True, seed=5)):
        for k in ("image", "masks", "valid", "orig_hw", "valid_hw", "index"):
            np.testing.assert_array_equal(ba[k], bb[k])


def test_geometry_validation(packed):
    _, out = packed
    with pytest.raises(ValueError, match="image_size"):
        ShardDataset(out, image_size=128)
    with pytest.raises(ValueError, match="max_instances"):
        ShardDataset(out, max_instances=8)
    ShardDataset(out, image_size=64, max_instances=4)  # matching is fine


def test_truncation_detected(packed, tmp_path):
    _, out = packed
    import shutil

    bad = tmp_path / "bad"
    shutil.copytree(out, bad)
    shard = bad / "shard-00001.bin"
    shard.write_bytes(shard.read_bytes()[:-1])
    ds = ShardDataset(str(bad))
    ds.get(0)  # shard 0 untouched
    with pytest.raises(ValueError, match="truncated"):
        ds.get(5)


def test_not_a_shard_dir(tmp_path):
    with pytest.raises(FileNotFoundError, match="basi pack"):
        ShardDataset(str(tmp_path))


def test_orig_masks_refuses(packed):
    _, out = packed
    with pytest.raises(ValueError, match="ap_at_original"):
        ShardDataset(out).get_orig_masks(0)


def test_make_dataset_wiring(packed, tmp_path):
    _, out = packed
    cfg = tiny_config()
    dcfg = dataclasses.replace(cfg.data, dataset="shards", root=out,
                               image_size=64, max_instances=4)
    ds = make_dataset(dcfg, split="train")  # no split subdir -> root itself
    assert isinstance(ds, ShardDataset) and len(ds) == 10
    # split subdirectories are honored when present
    os.symlink(out, tmp_path / "val")
    dcfg = dataclasses.replace(dcfg, root=str(tmp_path))
    assert len(make_dataset(dcfg, split="val")) == 10


def test_cli_pack_smoke(tmp_path):
    from basi_tpu.cli import main

    out = str(tmp_path / "packed")
    rc = main(["pack", "--out", out, "--shard-size", "6",
               "--set", "data.dataset=synthetic", "--set", "data.synthetic_n=8",
               "--set", "data.image_size=64", "--set", "model.image_size=64",
               "--set", "data.max_instances=4", "--set", "data.batch_size=4"])
    assert rc == 0
    ds = ShardDataset(out)
    assert len(ds) == 8
    src = SyntheticDataset(n=8, image_size=64, max_instances=4, seed=0)
    a, b = src.get(3), ds.get(3)
    np.testing.assert_array_equal(a.image, b.image)
    np.testing.assert_array_equal(a.masks, b.masks)

"""AOT serving artifacts (convert/aot.py): export -> file -> load parity.

The exported program must reproduce the live Inferencer bit-for-bit (same
HLO, weights baked as constants), survive a disk roundtrip, expose its
sidecar metadata without deserialization, and reject wrong input shapes.
"""

import numpy as np
import pytest

from basi_tpu.convert.aot import (
    export_serving,
    load_serving,
    read_meta,
    save_serving,
)
from basi_tpu.infer import Inferencer
from tests.helpers import tiny_batch, tiny_config


@pytest.fixture(scope="module")
def cfg():
    return tiny_config(batch_size=4)


@pytest.fixture(scope="module")
def artifact(cfg, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("aot") / "model.basiaot")
    inf = Inferencer(cfg)
    meta = save_serving(path, cfg, params=inf.params,
                        batch_stats=inf.batch_stats)
    return path, meta, inf


def test_roundtrip_matches_live_inferencer(artifact, rng):
    path, _, inf = artifact
    model = load_serving(path)
    images = tiny_batch(rng, n=4, size=64)["image"]
    masks, scores, sal = (np.asarray(x) for x in model(images))
    m_ref, s_ref, sal_ref = (np.asarray(x)
                             for x in inf.predict_batch(images))
    np.testing.assert_array_equal(scores, s_ref)
    np.testing.assert_array_equal(masks, m_ref)
    np.testing.assert_array_equal(sal, sal_ref)


def test_meta_sidecar(artifact, cfg):
    path, meta, _ = artifact
    disk = read_meta(path)
    assert disk == meta
    assert disk["model_size"] == cfg.model.image_size
    assert disk["batch_size"] == 4
    assert disk["input"] == {"shape": [4, 64, 64, 3], "dtype": "uint8"}
    assert disk["instance_mechanism"] == "kernels"
    assert "cpu" in disk["platforms"]


def test_wrong_shape_rejected(artifact):
    path, _, _ = artifact
    model = load_serving(path)
    with pytest.raises(ValueError):
        model(np.zeros((2, 64, 64, 3), np.uint8))  # wrong batch
    with pytest.raises(Exception):
        model(np.zeros((4, 64, 64, 3), np.float32))  # wrong dtype


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "junk.basiaot"
    p.write_bytes(b"NOTANART" + b"\x00" * 64)
    with pytest.raises(ValueError, match="bad magic"):
        load_serving(str(p))
    with pytest.raises(ValueError, match="bad magic"):
        read_meta(str(p))


def test_batch_size_override(cfg, tmp_path, rng):
    blob, meta = export_serving(cfg, batch_size=2)
    assert meta["batch_size"] == 2
    assert meta["input"]["shape"][0] == 2
    import jax.export as jex

    exported = jex.deserialize(bytearray(blob))
    images = tiny_batch(rng, n=2, size=64)["image"]
    masks, scores, sal = exported.call(images)
    assert np.asarray(masks).shape[0] == 2
    assert np.asarray(scores).shape == (2, cfg.model.num_slots)


def test_connected_mechanism_exports(cfg, tmp_path, rng):
    import dataclasses

    ccfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model,
                                       instance_mechanism="connected"))
    path = str(tmp_path / "conn.basiaot")
    meta = save_serving(path, ccfg, batch_size=2)
    assert meta["instance_mechanism"] == "connected"
    model = load_serving(path)
    images = tiny_batch(rng, n=2, size=64)["image"]
    masks, scores, _ = model(images)
    assert np.asarray(masks).shape[:2] == (2, ccfg.model.num_slots)

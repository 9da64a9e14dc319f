"""AOT-backed serving: BatchedPredictor/PredictService over a .basiaot
artifact — batch/model size come from the sidecar, results match the
checkpoint-backed path bit-for-bit (same program, serialized)."""

import numpy as np
import pytest

from basi_tpu.convert.aot import save_serving
from basi_tpu.infer import Inferencer
from basi_tpu.serve import BatchedPredictor
from tests.helpers import tiny_batch, tiny_config


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = tiny_config(batch_size=2)
    path = str(tmp_path_factory.mktemp("aot") / "m.basiaot")
    inf = Inferencer(cfg)
    save_serving(path, cfg, params=inf.params, batch_stats=inf.batch_stats)
    return cfg, path, inf


def test_predict_matches_live_path(setup, rng):
    cfg, path, inf = setup
    p = BatchedPredictor(cfg, max_wait_ms=1, aot_path=path)
    try:
        assert p.batch == 2 and p.size == 64
        img = tiny_batch(rng, n=1, size=64)["image"][0]
        pred = p.predict(img, timeout=60)
        batch = np.zeros((2, 64, 64, 3), np.uint8)
        batch[0] = img
        m_ref, s_ref, _ = (np.asarray(x) for x in inf.predict_batch(batch))
        np.testing.assert_array_equal(np.asarray(pred.scores), s_ref[0])
        np.testing.assert_array_equal(np.asarray(pred.masks), m_ref[0])
    finally:
        p.close()


def test_predict_many_and_full_res(setup, rng):
    cfg, path, _ = setup
    p = BatchedPredictor(cfg, max_wait_ms=1, aot_path=path)
    try:
        imgs = tiny_batch(rng, n=5, size=64)["image"][:5]
        preds = p.predict_many(imgs, scan_batches=2)
        assert len(preds) == 5
        full = np.asarray(p.inf.full_res_masks(preds[0].masks[None]))[0]
        assert full.shape == (cfg.model.num_slots, 64, 64)
        assert np.all(full >= 0) and np.all(full <= 1)
    finally:
        p.close()


def test_http_service_over_aot(setup, rng):
    import base64
    import io

    from PIL import Image

    from basi_tpu.server import PredictService

    cfg, path, _ = setup
    svc = PredictService(cfg, aot_path=path, predict_timeout=60)
    try:
        assert svc.size == 64
        img = tiny_batch(rng, n=1, size=64)["image"][0]
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        out = svc.predict_image_bytes(buf.getvalue())
        assert out["model_size"] == 64
        lab = np.asarray(Image.open(
            io.BytesIO(base64.b64decode(out["label_png_b64"]))))
        assert lab.shape == (out["valid_hw"][0], out["valid_hw"][1])
    finally:
        svc.close()

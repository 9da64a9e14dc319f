"""Serving API tests: batcher correctness, bulk path, error propagation."""

import numpy as np
import pytest

from basi_tpu.serve import BatchedPredictor

from helpers import tiny_config


@pytest.fixture(scope="module")
def predictor():
    p = BatchedPredictor(tiny_config(batch_size=4), max_wait_ms=20)
    yield p
    p.close()


def test_single_predict(predictor, rng):
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    pred = predictor.predict(img)
    assert pred.masks.shape[0] == pred.scores.shape[0]
    assert pred.masks.ndim == 3


def test_concurrent_predicts_batch_together(predictor, rng):
    import threading

    out = [None] * 6

    def worker(i):
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        out[i] = predictor.predict(img)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(o is not None for o in out)


def test_predict_many(predictor, rng):
    imgs = (rng.rand(10, 64, 64, 3) * 255).astype(np.uint8)
    preds = predictor.predict_many(imgs, scan_batches=2)
    assert len(preds) == 10


def test_bad_shape_raises(predictor, rng):
    with pytest.raises(ValueError):
        predictor.predict(np.zeros((32, 32, 3), np.uint8))

"""HTTP serving endpoint tests: routes, payloads, failure mapping."""

import base64
import io
import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from basi_tpu.server import _serve_in_thread

from helpers import tiny_config


@pytest.fixture(scope="module")
def server():
    base, httpd, service = _serve_in_thread(tiny_config(batch_size=2))
    yield base, service
    httpd.shutdown()
    service.close()


def _post(url, data, ctype="image/png"):
    req = urllib.request.Request(url, data=data, method="POST",
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read())


def _png_bytes(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_healthz(server):
    base, _ = server
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        payload = json.loads(r.read())
    assert r.status == 200
    assert payload["status"] == "ok"
    assert payload["model_size"] == 64


def test_predict_roundtrip(server, rng):
    """POST a non-square PNG; the JSON must carry letterbox geometry and a
    decodable label map at the letterbox content size."""
    from PIL import Image

    base, _ = server
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)  # oh=48, ow=64
    status, out = _post(base + "/predict", _png_bytes(img))
    assert status == 200
    assert out["orig_hw"] == [48, 64]
    assert out["model_size"] == 64
    vh, vw = out["valid_hw"]
    assert vw == 64 and 0 < vh <= 64
    lab = np.asarray(Image.open(
        io.BytesIO(base64.b64decode(out["label_png_b64"]))))
    assert lab.shape == (vh, vw)
    assert lab.dtype == np.uint8
    # every score listed cleared the threshold, sorted descending
    scores = out["scores"]
    assert scores == sorted(scores, reverse=True)
    assert int(lab.max()) <= len(scores)


def test_predict_bad_body_is_400(server):
    base, _ = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/predict", b"this is not an image")
    assert ei.value.code == 400
    assert "undecodable" in json.loads(ei.value.read())["error"]


def test_unknown_route_is_404(server):
    base, _ = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(base + "/nope", timeout=30)
    assert ei.value.code == 404


def test_closed_predictor_maps_to_503(rng):
    base, httpd, service = _serve_in_thread(tiny_config(batch_size=2))
    try:
        service.predictor.close()
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + "/predict", _png_bytes(img))
        assert ei.value.code == 503
        # healthz agrees
        with pytest.raises(urllib.error.HTTPError) as ei2:
            urllib.request.urlopen(base + "/healthz", timeout=30)
        assert ei2.value.code == 503
    finally:
        httpd.shutdown()
        service.close()

"""HTTP serving endpoint (stdlib-only) over ``BatchedPredictor``.

The reference has no serving story (research scripts); serve.py provides
the batched in-process API and this module puts a minimal production
HTTP front on it — no framework dependencies, one thread per connection
(``ThreadingHTTPServer``), cross-request batching handled by the
predictor's worker:

  POST /predict   body = JPEG/PNG bytes -> JSON:
                  {"scores": [...], "label_png_b64": ..., "valid_hw":
                   [vh, vw], "orig_hw": [oh, ow], "model_size": S}
                  The label PNG is a (vh, vw) uint8 map at MODEL
                  resolution (0 = background, k = instance k, by
                  descending score); clients scale it to orig_hw.
  GET  /healthz   {"status": "ok", ...} | 503 when the predictor died

Failure mapping: undecodable image -> 400, predictor closed/dead -> 503,
device timeout -> 504. Everything else in the pipeline (letterbox decode
conventions, fused upsample, thresholds) is the same code path the eval
stack uses.
"""

from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from basi_tpu.config import Config
from basi_tpu.data.datasets import letterbox_params
from basi_tpu.serve import BatchedPredictor


class PredictService:
    """Decode -> letterbox -> batched predict -> full-res label map."""

    def __init__(self, cfg: Config, checkpoint: str = "",
                 predict_timeout: float = 30.0, aot_path: str = ""):
        self.cfg = cfg
        self.predictor = BatchedPredictor(cfg, checkpoint=checkpoint,
                                          aot_path=aot_path)
        # AOT artifacts carry their own (baked-in) model size; the
        # predictor resolved it, so letterboxing follows the predictor.
        self.size = self.predictor.size
        self.predict_timeout = predict_timeout
        # Thresholds must match the program actually serving: an AOT
        # artifact records the export-time infer thresholds in its sidecar,
        # and the serving cfg may legitimately differ — filtering with the
        # cfg's values would mislabel against what the artifact promises.
        meta = getattr(self.predictor.inf, "meta", None)
        self.score_threshold = (float(meta["score_threshold"]) if meta
                                else cfg.infer.score_threshold)
        self.mask_threshold = (float(meta["mask_threshold"]) if meta
                               else cfg.infer.mask_threshold)

    def close(self):
        self.predictor.close()

    @property
    def alive(self) -> bool:
        return (self.predictor._worker.is_alive()
                and not self.predictor._stop.is_set())

    def predict_image_bytes(self, data: bytes) -> dict:
        from PIL import Image

        try:
            with Image.open(io.BytesIO(data)) as im:
                im = im.convert("RGB")
                ow, oh = im.size
                vh, vw = letterbox_params(oh, ow, self.size)
                content = np.asarray(im.resize((vw, vh), Image.BILINEAR))
        except Exception as e:
            raise ValueError(f"undecodable image: {e}") from e
        canvas = np.zeros((self.size, self.size, 3), np.uint8)
        canvas[:vh, :vw] = content
        pred = self.predictor.predict(canvas, timeout=self.predict_timeout)

        # Slot-mask probs (K, S/4, S/4) -> full-res via the same fused
        # kernel eval uses; label map = best instance above threshold.
        import jax

        full = np.asarray(jax.device_get(
            self.predictor.inf.full_res_masks(pred.masks[None])))[0]
        scores = np.asarray(pred.scores, np.float32)
        order = np.argsort(-scores)
        keep = scores[order] >= self.score_threshold
        order = order[keep]
        lab = np.zeros((self.size, self.size), np.uint8)
        # descending score; earlier (higher-score) instances win overlaps
        for rank in range(len(order) - 1, -1, -1):
            m = full[order[rank]] > self.mask_threshold
            lab[m] = rank + 1
        lab = lab[:vh, :vw]
        buf = io.BytesIO()
        Image.fromarray(lab).save(buf, format="PNG")
        return {
            "scores": [round(float(scores[i]), 4) for i in order],
            "label_png_b64": base64.b64encode(buf.getvalue()).decode(),
            "valid_hw": [vh, vw],
            "orig_hw": [oh, ow],
            "model_size": self.size,
        }


class _Handler(BaseHTTPRequestHandler):
    service: PredictService  # injected via make_server's subclass

    def log_message(self, fmt, *args):  # quiet: metrics go to the logger
        pass

    def _send_json(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path.split("?")[0] == "/healthz":
            if self.service.alive:
                self._send_json(200, {
                    "status": "ok",
                    "batch_size": self.service.predictor.batch,
                    "model_size": self.service.size,
                })
            else:
                self._send_json(503, {"status": "predictor dead"})
            return
        self._send_json(404, {"error": f"no route {self.path!r}"})

    def do_POST(self):
        if self.path.split("?")[0] != "/predict":
            self._send_json(404, {"error": f"no route {self.path!r}"})
            return
        try:
            length = int(self.headers.get("Content-Length", "0"))
        except ValueError:
            length = 0
        if length <= 0:
            self._send_json(400, {"error": "empty body"})
            return
        data = self.rfile.read(length)
        try:
            result = self.service.predict_image_bytes(data)
        except ValueError as e:
            self._send_json(400, {"error": str(e)})
            return
        except TimeoutError as e:
            self._send_json(504, {"error": str(e)})
            return
        except RuntimeError as e:  # predictor closed / worker died
            self._send_json(503, {"error": str(e)})
            return
        self._send_json(200, result)


def make_server(cfg: Config, checkpoint: str = "",
                host: str = "127.0.0.1", port: int = 8000,
                predict_timeout: float = 30.0, aot_path: str = ""):
    """Build (httpd, service). Caller runs ``httpd.serve_forever()`` and
    on shutdown calls ``httpd.shutdown(); service.close()``. ``port=0``
    binds an ephemeral port (tests); read it from
    ``httpd.server_address``. ``aot_path`` serves a ``basi export --aot``
    artifact instead of a checkpoint."""
    service = PredictService(cfg, checkpoint=checkpoint,
                             predict_timeout=predict_timeout,
                             aot_path=aot_path)
    handler = type("BoundHandler", (_Handler,), {"service": service})
    httpd = ThreadingHTTPServer((host, port), handler)
    return httpd, service


def serve_forever(cfg: Config, checkpoint: str = "",
                  host: str = "127.0.0.1", port: int = 8000,
                  aot_path: str = "") -> int:
    httpd, service = make_server(cfg, checkpoint, host, port,
                                 aot_path=aot_path)
    print(json.dumps({"serving": f"http://{host}:{httpd.server_address[1]}",
                      "endpoints": ["/predict", "/healthz"]}), flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        service.close()
    return 0


def _serve_in_thread(cfg: Config, checkpoint: str = "",
                     host: str = "127.0.0.1", port: int = 0):
    """Test helper: server on an ephemeral port, running in a daemon
    thread. Returns (base_url, httpd, service)."""
    httpd, service = make_server(cfg, checkpoint, host, port)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return (f"http://{host}:{httpd.server_address[1]}", httpd, service)

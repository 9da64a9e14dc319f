"""Metrics/observability (SURVEY §5.5).

The reference logs via ``Tools.print`` to stdout and saves mask PNGs. Here:
structured JSONL metric records (one object per line: step, loss, lr,
step_ms, imgs/s, AP...) plus the same human-readable console line; PNG mask
dumps stay available behind ``infer.save_png`` as the de-facto reference
observability.
"""

from __future__ import annotations

import json
import time
from typing import Any, IO


class MetricLogger:
    def __init__(self, path: str = "", console: bool = True):
        self.console = console
        self._fh: IO | None = open(path, "a") if path else None
        self._t0 = time.time()

    def log(self, record: dict[str, Any], prefix: str = ""):
        rec = {"t": round(time.time() - self._t0, 3)}
        for k, v in record.items():
            if hasattr(v, "item"):
                v = v.item()
            if isinstance(v, float):
                v = round(v, 6)
            rec[k] = v
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self.console:
            parts = [f"{k}={v}" for k, v in rec.items() if k != "t"]
            print((prefix + " " if prefix else "") + " ".join(parts), flush=True)

    def close(self):
        if self._fh:
            self._fh.close()


def save_mask_pngs(out_dir: str, name: str, masks, scores,
                   score_threshold: float = 0.1):
    """Debug PNG dump of predicted instance masks (reference behavior)."""
    import os

    import numpy as np

    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    masks = np.asarray(masks)
    scores = np.asarray(scores)
    combined = np.zeros(masks.shape[-2:], np.uint8)
    for i, (m, s) in enumerate(zip(masks, scores)):
        if s < score_threshold:
            continue
        combined[m > 0.5] = (i + 1) * max(1, 255 // max(1, len(masks)))
    Image.fromarray(combined).save(os.path.join(out_dir, f"{name}.png"))

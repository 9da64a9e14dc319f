"""Metrics/observability (SURVEY §5.5).

The reference logs via ``Tools.print`` to stdout and saves mask PNGs. Here:
structured JSONL metric records (one object per line: step, loss, lr,
step_ms, imgs/s, AP...) plus the same human-readable console line; PNG mask
dumps stay available behind ``infer.save_png`` as the de-facto reference
observability. ``tensorboard_dir`` additionally streams every numeric
record into TensorBoard event files (torch's pure-python SummaryWriter —
no TF runtime on the hot path; the writer is created lazily and failures
degrade to a one-time warning, never break training).
"""

from __future__ import annotations

import json
import time
from typing import Any, IO


class MetricLogger:
    def __init__(self, path: str = "", console: bool = True,
                 tensorboard_dir: str = ""):
        self.console = console
        self._fh: IO | None = open(path, "a") if path else None
        self._t0 = time.time()
        self._tb = None
        self._n = 0
        if tensorboard_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=tensorboard_dir)
            except Exception as e:  # pragma: no cover - env-dependent
                import warnings

                warnings.warn(f"tensorboard writer unavailable: {e}")

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
        if self._tb is not None:
            self._n += 1
            step = rec.get("step", self._n)
            tag = prefix.strip("[] ") or "metrics"
            try:
                for k, v in rec.items():
                    if k in ("t", "step") or isinstance(v, bool):
                        continue
                    if isinstance(v, (int, float)):
                        self._tb.add_scalar(f"{tag}/{k}", v, int(step))
            except Exception as e:  # pragma: no cover - env-dependent
                # TB is best-effort observability: a full/unwritable volume
                # mid-run must not abort training. Warn once, disable —
                # but close() first so the writer's background thread/fd
                # don't leak and earlier buffered scalars get a flush try.
                import warnings

                warnings.warn(f"tensorboard writer failed, disabling: {e}")
                tb, self._tb = self._tb, None
                try:
                    tb.close()
                except Exception:
                    pass
        if self.console:
            parts = [f"{k}={v}" for k, v in rec.items() if k != "t"]
            print((prefix + " " if prefix else "") + " ".join(parts), flush=True)

    def flush(self):
        """Push buffered records to disk WITHOUT ending the logger (the
        Trainer flushes after each train() so a reused Trainer keeps
        logging; JSONL already flushes per write)."""
        if self._fh:
            self._fh.flush()
        if self._tb is not None:
            try:
                self._tb.flush()
            except Exception as e:  # pragma: no cover - env-dependent
                import warnings

                warnings.warn(f"tensorboard flush failed, disabling: {e}")
                tb, self._tb = self._tb, None
                try:
                    tb.close()
                except Exception:
                    pass

    def close(self):
        """Idempotent; a log() after close degrades to console-only."""
        if self._fh:
            self._fh.close()
            self._fh = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None


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

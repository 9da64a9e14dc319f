"""Mask AP (COCO-style greedy matching at IoU thresholds) — SURVEY §3.5.

The reference computes mask AP in CPU numpy after inference. TPU-native
split: the O(K*M*H*W) part — the predicted-vs-GT mask IoU matrix — runs on
device as one matmul per image (jit, vmapped over the batch); only the tiny
(K, M) matrices come back to the host, where greedy matching and the PR
curve run in exact float64 numpy (matching COCO semantics, which are
sequential by nature but trivial at K<=20, M<=8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from basi_tpu.ops.nms import mask_iou_matrix


@functools.partial(jax.jit, static_argnames=("mask_threshold",))
def match_image(pred_masks: jnp.ndarray, gt_masks: jnp.ndarray,
                mask_threshold: float = 0.5) -> jnp.ndarray:
    """Device-side IoU matrix for one image: (K, H, W) x (M, H, W) -> (K, M)."""
    pm = (pred_masks > mask_threshold).astype(jnp.float32)
    gm = gt_masks.astype(jnp.float32)
    return mask_iou_matrix(pm, gm)


match_batch = jax.jit(jax.vmap(lambda p, g: match_image(p, g)))


class APAccumulator:
    """Streaming AP over a val split at multiple IoU thresholds.

    add(scores, iou, gt_valid) per image; ap() returns {thr: AP} plus mAP
    over the 0.5:0.95:0.05 COCO ladder.
    """

    def __init__(self, thresholds=(0.5, 0.7)):
        self.thresholds = tuple(thresholds)
        self.coco_ladder = tuple(np.round(np.arange(0.5, 1.0, 0.05), 2))
        self._entries: list[tuple[float, dict[float, bool]]] = []
        self._num_gt = 0

    def add(self, scores: np.ndarray, iou: np.ndarray, gt_valid: np.ndarray):
        """scores (K,), iou (K, M), gt_valid (M,) for one image."""
        scores = np.asarray(scores, np.float64)
        iou = np.asarray(iou, np.float64)
        gt_valid = np.asarray(gt_valid).astype(bool)
        self._num_gt += int(gt_valid.sum())
        order = np.argsort(-scores)
        all_thr = sorted(set(self.thresholds) | set(self.coco_ladder))
        # Greedy match per threshold: highest-score pred takes the best
        # unmatched GT with IoU >= thr (COCO matching).
        per_thr_tp: list[dict[float, bool]] = []
        matched = {t: np.zeros(iou.shape[1], bool) for t in all_thr}
        for k in order:
            if scores[k] <= 0:
                continue
            tp = {}
            for t in all_thr:
                cand = np.where(gt_valid & ~matched[t] & (iou[k] >= t))[0]
                if cand.size:
                    best = cand[np.argmax(iou[k][cand])]
                    matched[t][best] = True
                    tp[t] = True
                else:
                    tp[t] = False
            self._entries.append((float(scores[k]), tp))

    def ap(self) -> dict[str, float]:
        if self._num_gt == 0:
            return {f"AP@{t}": 0.0 for t in self.thresholds} | {"mAP": 0.0}
        entries = sorted(self._entries, key=lambda e: -e[0])
        out = {}
        all_thr = sorted(set(self.thresholds) | set(self.coco_ladder))
        ap_by_thr = {}
        if not entries:
            zero = {f"AP@{t}": 0.0 for t in self.thresholds}
            zero["mAP"] = 0.0
            return zero
        for t in all_thr:
            tps = np.array([e[1][t] for e in entries], bool)
            tp_cum = np.cumsum(tps)
            fp_cum = np.cumsum(~tps)
            recall = tp_cum / self._num_gt
            precision = tp_cum / np.maximum(tp_cum + fp_cum, 1)
            # 101-point interpolated AP (COCO).
            prec_interp = np.maximum.accumulate(precision[::-1])[::-1]
            rec_grid = np.linspace(0, 1, 101)
            idx = np.searchsorted(recall, rec_grid, side="left")
            p = np.where(idx < len(prec_interp), prec_interp[np.minimum(idx, len(prec_interp) - 1)], 0.0)
            ap_by_thr[t] = float(p.mean())
        for t in self.thresholds:
            out[f"AP@{t}"] = ap_by_thr[t]
        out["mAP"] = float(np.mean([ap_by_thr[t] for t in self.coco_ladder]))
        return out

"""Inference/eval runner (SURVEY §3.2): the reference's ``MyTest`` path.

preprocess (device) -> jitted forward -> on-device instance selection
(matrix/greedy mask NMS) -> fused Pallas upsample+sigmoid to full res ->
device IoU vs GT -> host AP accumulation. No D2H of full-resolution masks
unless PNGs are requested — the reference's CPU-numpy postproc bottleneck
is gone entirely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from basi_tpu.config import Config
from basi_tpu.data.datasets import iter_epoch, make_dataset
from basi_tpu.evals.ap import APAccumulator
from basi_tpu.models.basi import create_model, init_model
from basi_tpu.ops.nms import mask_iou_matrix, select_instances_from_kernels
from basi_tpu.ops.pallas.upsample_sigmoid import (
    upsample_sigmoid,
    upsample_sigmoid_reference,
)
from basi_tpu.utils.logging import MetricLogger, save_mask_pngs
from basi_tpu.utils.profiling import maybe_trace


class Inferencer:
    def __init__(self, cfg: Config, model=None, params=None, batch_stats=None,
                 checkpoint: str = ""):
        self.cfg = cfg
        self.model = model or create_model(cfg.model)
        if params is None:
            if checkpoint:
                params, batch_stats = self._load_checkpoint(checkpoint)
            else:
                params, batch_stats = init_model(self.model, cfg.model.image_size)
        self.params = params
        self.batch_stats = batch_stats or {}
        self._use_pallas = jax.default_backend() == "tpu"
        self._build()

    def _load_checkpoint(self, checkpoint: str):
        """Load either a Trainer checkpoint dir (step-numbered TrainState
        saves — the reference's per-epoch train checkpoints) or a bare
        params export (utils.checkpoint.export_params)."""
        import os

        cfg = self.cfg
        has_steps = os.path.isdir(checkpoint) and any(
            d.isdigit() for d in os.listdir(checkpoint))
        if has_steps:
            # create_train_state performs its own init_model — do NOT init
            # a second throwaway template here (it doubles startup cost).
            from basi_tpu.train.state import create_train_state
            from basi_tpu.utils.checkpoint import CheckpointManager

            template = create_train_state(self.model, cfg.model, cfg.train, 1)
            mgr = CheckpointManager(checkpoint)
            state = mgr.restore(template)
            return state.params, state.batch_stats
        from basi_tpu.utils.checkpoint import load_params

        tmpl_p, tmpl_b = init_model(self.model, cfg.model.image_size)
        restored = load_params(
            checkpoint, {"params": tmpl_p, "batch_stats": tmpl_b})
        return restored["params"], restored["batch_stats"]

    def set_weights(self, params, batch_stats):
        """Swap weights WITHOUT rebuilding the jitted programs (applies the
        same dtype pre-cast as _build). The Trainer's per-epoch eval uses
        this so the compiled eval program is reused across epochs."""
        if self._compute_dtype == jnp.bfloat16:
            params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
            batch_stats = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16), batch_stats)
        self.params = params
        self.batch_stats = batch_stats or {}

    def _build(self):
        cfg = self.cfg
        mean = tuple(cfg.data.mean)
        std = tuple(cfg.data.std)
        icfg = cfg.infer
        compute_dtype = jnp.dtype(icfg.dtype) if icfg.dtype else self.model.dtype
        self._compute_dtype = compute_dtype
        # flax modules promote to their own dtype, so bf16 inference needs
        # the MODULE dtype switched, not just the input cast.
        model = (self.model if compute_dtype == self.model.dtype
                 else self.model.clone(dtype=compute_dtype))
        if compute_dtype == jnp.bfloat16:
            # Pre-cast weights ONCE: profiler traces show runtime f32->bf16
            # weight conversion/copy ops on every invocation otherwise
            # (halves weight HBM reads too).
            self.params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16), self.params)
            self.batch_stats = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16), self.batch_stats)

        # Ingest-side space-to-depth: reshaping the raw uint8 bytes is ~4x
        # cheaper than reshaping the normalized bf16/f32 tensor inside the
        # model (round-1 profile: ~0.8 ms of layout copies per batch-8),
        # and the s2d stem conv then runs dense on the MXU instead of the
        # ~1.5 ms MXU-hostile 7x7/s2 conv over 3 channels.
        from basi_tpu.data.transforms import wants_s2d_feed

        stem_s2d = wants_s2d_feed(model)
        from basi_tpu.models.resnet import space_to_depth

        @jax.jit
        def run(params, batch_stats, images_u8):
            x = images_u8
            if stem_s2d and x.shape[-1] == 3:
                # The barrier pins the transpose to the uint8 bytes: without
                # it XLA commutes the (elementwise) normalize before the
                # (linear) s2d and pays the transpose in f32 — measured
                # 1.1 ms of copies per batch-8 vs ~0.1 ms on uint8. Callers
                # that pre-pack on the host (transforms.space_to_depth_host,
                # 12-channel input) skip even the uint8 reorder copies.
                x = jax.lax.optimization_barrier(space_to_depth(x, 2))
            reps = x.shape[-1] // 3
            x = x.astype(jnp.float32) / 255.0
            x = (x - jnp.tile(jnp.asarray(mean), reps)) / jnp.tile(
                jnp.asarray(std), reps)
            x = x.astype(compute_dtype)
            out = model.apply(
                {"params": params, "batch_stats": batch_stats}, x,
                train=False, with_candidates=False,
            )
            n, s1, s2, e = out.cell_kernels.shape
            masks, scores = jax.vmap(
                lambda mf, k, s: select_instances_from_kernels(
                    mf, k.reshape(s1 * s2, e), s.reshape(-1),
                    num_slots=cfg.model.num_slots,
                    score_threshold=icfg.score_threshold,
                    mask_threshold=icfg.mask_threshold,
                    nms=icfg.nms,
                    nms_sigma=icfg.nms_sigma,
                    nms_iou_threshold=icfg.nms_iou_threshold,
                    pre_top_k=icfg.pre_nms_top_k,
                )
            )(out.mask_feats, out.cell_kernels, out.cell_scores)
            return masks, scores, out.saliency_logits

        self._run = run
        self.run_fn = run  # public: composable into callers' jit/scan programs

        size = cfg.model.image_size

        from basi_tpu.evals.saliency import f_measure_hist
        from basi_tpu.ops.resize import resize_bilinear

        @jax.jit
        def eval_batch(params, batch_stats, images_u8, gt_masks, gt_valid,
                       valid_hw):
            """One fused eval program per batch: forward + selection +
            FULL-RESOLUTION matching IoU + saliency metrics. Matching at /4
            with maxpooled GT (round 1) dilates thin GT structures and
            biases IoU; here predictions are upsampled (the same fused
            kernel the PNG path uses) and matched against the native-res GT
            — one (K, HW) x (HW, M) matmul per image."""
            masks, scores, sal = run(params, batch_stats, images_u8)
            full = self._to_full_res(masks)  # (N, K, size, size) probs
            pm = (full > icfg.mask_threshold).astype(full.dtype)
            gm = gt_masks.astype(full.dtype)
            iou = jax.vmap(mask_iou_matrix)(pm, gm)  # (N, K, M) f32
            # saliency branch vs the GT union, at full resolution
            gv = gt_valid.astype(jnp.float32)
            union = jnp.max(
                gt_masks.astype(jnp.float32) * gv[..., None, None], axis=1)
            prob = jax.nn.sigmoid(sal.astype(jnp.float32))  # (N, h, w, 1)
            prob_full = resize_bilinear(prob, (size, size))[..., 0]
            # Restrict saliency metrics to the letterbox CONTENT region:
            # padding pixels (GT trivially 0) would otherwise count as
            # correct negatives, deflating MAE/perturbing precision for any
            # non-square image vs the SOD content-resolution protocol.
            rows = jnp.arange(size)[None, :, None] < valid_hw[:, 0][:, None, None]
            cols = jnp.arange(size)[None, None, :] < valid_hw[:, 1][:, None, None]
            content = (rows & cols).astype(jnp.float32)  # (N, H, W)
            area = jnp.maximum(jnp.sum(content, axis=(1, 2)), 1.0)
            mae_per = jnp.sum(jnp.abs(prob_full - union) * content,
                              axis=(1, 2)) / area
            f_mat = f_measure_hist(prob_full, union, valid=content)  # (T-1, N)
            # The PNG path reuses ``full`` (already computed for the IoU
            # matrix) rather than re-running the upsample — but returning
            # the (N, K, size, size) tensor keeps it live in HBM for up to
            # ``lag`` batches, so only ship it when PNGs are requested.
            full_out = full if icfg.save_png else jnp.zeros((), full.dtype)
            return masks, scores, iou, mae_per, f_mat, full_out

        self._eval_batch = eval_batch

    def _to_full_res(self, probs: jnp.ndarray):
        """Upsample slot-mask PROBS to model input resolution (fused kernel,
        traceable — composes into the jitted eval program)."""
        size = self.cfg.model.image_size
        p32 = jnp.clip(probs.astype(jnp.float32), 1e-6, 1 - 1e-6)
        logits = (jnp.log(p32) - jnp.log1p(-p32)).astype(probs.dtype)
        fn = upsample_sigmoid if self._use_pallas else upsample_sigmoid_reference
        return fn(logits, (size, size))

    def full_res_masks(self, slot_mask_probs: jnp.ndarray):
        """Upsample slot masks to the model input resolution (fused kernel)."""
        return jax.jit(self._to_full_res)(slot_mask_probs)

    def predict_batch(self, images_u8: np.ndarray):
        masks, scores, out = self._run(self.params, self.batch_stats, images_u8)
        return masks, scores, out

    def _save_batch_pngs(self, bi: int, batch: dict, full, scores_h):
        """Paste masks to ORIGINAL resolution and dump PNGs (reference
        behavior). The paste canvas is a static 512-multiple bucket sized
        to the batch's largest original image (one XLA program per bucket),
        so originals larger than the model size are no longer silently
        truncated."""
        import warnings

        from basi_tpu.ops.paste import paste_masks_batch

        cfg = self.cfg
        size = cfg.model.image_size
        max_canvas = 2048
        mh = int(np.max(batch["orig_hw"][:, 0]))
        mw = int(np.max(batch["orig_hw"][:, 1]))
        ch = min(max(size, -(-mh // 512) * 512), max_canvas)
        cw = min(max(size, -(-mw // 512) * 512), max_canvas)
        if mh > max_canvas or mw > max_canvas:
            warnings.warn(
                f"original image {mh}x{mw} exceeds the {max_canvas} paste "
                f"canvas cap; saved masks will be cropped")
        pasted = jax.device_get(paste_masks_batch(
            full, jnp.asarray(batch["valid_hw"]),
            (ch, cw), jnp.asarray(batch["orig_hw"]),
        ))
        for i in range(int(batch["num_real"])):
            oh = min(int(batch["orig_hw"][i][0]), ch)
            ow = min(int(batch["orig_hw"][i][1]), cw)
            save_mask_pngs(
                cfg.infer.output_dir, f"b{bi}_i{i}",
                pasted[i][:, :oh, :ow], scores_h[i],
                cfg.infer.score_threshold,
            )

    def evaluate(self, dataset=None, max_batches: int = 0,
                 logger: MetricLogger | None = None) -> dict:
        cfg = self.cfg
        dataset = dataset or make_dataset(cfg.data, split="val")
        acc = APAccumulator(thresholds=(0.5, 0.7))
        n_img = 0
        n_batches = 0
        sal_mae_sum = 0.0
        f_sum = None  # (T,) running sum of per-image F curves
        # Bounded-lag pipeline: dispatch up to ``lag`` batches ahead of the
        # fetch cursor. Per-batch sync would pay the ~30 ms relay round trip
        # every iteration (bench.py note); unbounded dispatch (round 1) held
        # every batch's device outputs live and grew HBM linearly with the
        # val set. The deque keeps at most ``lag`` result sets in flight.
        import time as _time
        from collections import deque

        lag = max(1, int(cfg.data.prefetch_depth) * 2)
        pending: deque = deque()

        png_ms = 0.0
        t_steady = None  # set after the FIRST batch completes (see below)
        png_at_steady = 0.0

        def drain_one():
            nonlocal n_img, n_batches, sal_mae_sum, f_sum, png_ms
            nonlocal t_steady, png_at_steady
            bi, batch, scores, iou, mae_per, f_mat, full = pending.popleft()
            # ONE batched fetch: each device_get pays a full relay round
            # trip (~25-30 ms on axon, bench.py note) — 4 sequential fetches
            # were 4 round trips on the timed path.
            scores_h, iou_h, mae_h, f_h = (
                np.asarray(x)
                for x in jax.device_get((scores, iou, mae_per, f_mat)))
            nreal = int(batch["num_real"])
            for i in range(nreal):  # padded tail duplicates are skipped
                acc.add(scores_h[i], iou_h[i], batch["valid"][i])
            n_img += nreal
            n_batches += 1
            sal_mae_sum += float(mae_h[:nreal].sum())
            fs = f_h[:, :nreal].sum(axis=1)
            f_sum = fs if f_sum is None else f_sum + fs
            if cfg.infer.save_png:
                # PNG paste/encode is postproc I/O; keep it out of the
                # reported inference latency (timed separately below).
                tp = _time.perf_counter()
                self._save_batch_pngs(bi, batch, full, scores_h)
                png_ms += (_time.perf_counter() - tp) * 1000
            if t_steady is None:
                # The first batch's fetch forced jit trace + XLA compile;
                # start the steady-state throughput clock AFTER it so
                # infer_ms_per_batch measures execution, not compilation
                # (bench.py warms up for the same reason).
                t_steady = _time.perf_counter()
                png_at_steady = png_ms

        with maybe_trace(cfg.profile, cfg.profile_dir):
            t0 = _time.perf_counter()
            for bi, batch in enumerate(iter_epoch(
                dataset, cfg.infer.batch_size, shuffle=False, seed=0,
                drop_last=False,
            )):
                if max_batches and bi >= max_batches:
                    break
                masks, scores, iou, mae_per, f_mat, full = self._eval_batch(
                    self.params, self.batch_stats, batch["image"],
                    jnp.asarray(batch["masks"]), jnp.asarray(batch["valid"]),
                    jnp.asarray(batch["valid_hw"]),
                )
                del masks  # full-res ``full`` supersedes it in the drain
                pending.append((bi, batch, scores, iou, mae_per, f_mat, full))
                while len(pending) > lag:
                    drain_one()
            while pending:
                drain_one()
            total_ms = (_time.perf_counter() - t0) * 1000
            steady_ms = ((_time.perf_counter() - t_steady) * 1000
                         if t_steady is not None else total_ms)

        metrics = acc.ap()
        if n_img:
            metrics["saliency_mae"] = round(sal_mae_sum / n_img, 4)
            metrics["saliency_maxF"] = round(float(np.max(f_sum / n_img)), 4)
        if n_batches > 1:
            per_batch = (steady_ms - (png_ms - png_at_steady)) / (n_batches - 1)
            metrics["infer_ms_per_batch"] = round(per_batch, 2)
            metrics["imgs_per_s"] = round(
                cfg.infer.batch_size / (per_batch / 1000), 1)
            if png_ms:
                # Same steady-state window as infer_ms_per_batch: the
                # compile-inclusive first batch is excluded from BOTH
                # per-batch numbers so they are comparable.
                metrics["png_ms_per_batch"] = round(
                    (png_ms - png_at_steady) / (n_batches - 1), 2)
        elif n_batches:  # single batch: compile-inclusive, best we can do
            metrics["infer_ms_per_batch"] = round(total_ms - png_ms, 2)
            metrics["imgs_per_s"] = round(
                cfg.infer.batch_size / max((total_ms - png_ms) / 1000, 1e-9), 1)
        metrics["num_images"] = n_img
        if logger:
            logger.log(metrics, prefix="[eval]")
        return metrics

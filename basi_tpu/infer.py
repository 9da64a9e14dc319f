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
                 checkpoint: str = "", mesh=None, data_axis: str = "data",
                 spatial_axis: str = ""):
        """``mesh``: optional data-parallel eval mesh (SURVEY §5.8). Eval
        batches shard over ``data_axis``; per-image selection stays vmapped
        per shard; the small metric tensors come back replicated (GSPMD
        inserts the all_gather), so every host computes identical metrics.

        ``spatial_axis``: name of the mesh's spatial (image-H) axis, if it
        has one (SURVEY §5.7) — eval inputs then shard their H dim over it
        and the partitioner inserts the conv halo exchanges. When no mesh
        is passed, both come from ``cfg.parallel``: explicitly-requested
        meshes (num_devices > 1 or spatial_shards > 1) are built here, so
        ``basi eval --set parallel.spatial_shards=2 ...`` works without a
        Trainer.
        """
        self.cfg = cfg
        if mesh is None and (cfg.parallel.num_devices > 1
                             or cfg.parallel.spatial_shards > 1):
            # Auto-build an eval mesh from cfg.parallel — but only when it
            # FITS this host. Export/serving paths construct an Inferencer
            # from a user config that may be a multi-device TRAINING preset
            # (e.g. train_v4-32_dp) on a smaller machine; a training knob
            # must not break single-device eval/export there, so an
            # oversized num_devices quietly falls back to one device.
            # spatial_shards > 1 is always an explicit EVAL-parallel
            # request and stays loud when it cannot be satisfied.
            n_req = max(cfg.parallel.num_devices,
                        cfg.parallel.spatial_shards)
            if (cfg.parallel.spatial_shards > 1
                    or n_req <= len(jax.devices())):
                from basi_tpu.parallel.mesh import make_mesh

                mesh = make_mesh(cfg.parallel.num_devices,
                                 cfg.parallel.data_axis,
                                 spatial_axis=cfg.parallel.spatial_axis,
                                 spatial_shards=cfg.parallel.spatial_shards)
                data_axis = cfg.parallel.data_axis
                spatial_axis = cfg.parallel.spatial_axis
        self.mesh = mesh
        self.data_axis = data_axis
        self.spatial_axis = (spatial_axis if mesh is not None
                             and spatial_axis in mesh.shape else "")
        if mesh is not None and cfg.infer.batch_size % mesh.shape[data_axis]:
            raise ValueError(
                f"infer.batch_size={cfg.infer.batch_size} not divisible by "
                f"the {mesh.shape[data_axis]}-shard {data_axis!r} mesh axis")
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
            # Template-free weights restore: eval must not need to know
            # the optimizer/EMA configuration the checkpoint was trained
            # with (and skipping the TrainState template also skips a
            # throwaway init_model). EMA weights are preferred when the
            # checkpoint carries them (same rule as the Trainer's
            # per-epoch eval).
            from basi_tpu.utils.checkpoint import CheckpointManager

            mgr = CheckpointManager(checkpoint)
            return mgr.restore_weights()
        from basi_tpu.utils.checkpoint import load_params

        tmpl_p, tmpl_b = init_model(self.model, cfg.model.image_size)
        restored = load_params(
            checkpoint, {"params": tmpl_p, "batch_stats": tmpl_b})
        return restored["params"], restored["batch_stats"]

    def set_weights(self, params, batch_stats):
        """Swap weights WITHOUT rebuilding the jitted programs (applies the
        same dtype pre-cast as _build). The Trainer's per-epoch eval uses
        this so the compiled eval program is reused across epochs."""
        if self._compute_dtype == jnp.bfloat16 and not self._quant:
            params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
            batch_stats = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16), batch_stats)
        if self._quant:
            from basi_tpu.ops.quant import prequantize_params

            params = prequantize_params(params)
        self.params = params
        self.batch_stats = batch_stats or {}
        self._replicate_weights()

    def _replicate_weights(self):
        """Pin weights replicated on the eval mesh: done once per weight
        swap instead of per call, and required on multi-host meshes (jit
        cannot auto-globalize a process-local array)."""
        if self.mesh is None:
            return
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(self.mesh, P())

        def put(x):
            if isinstance(x, jax.Array) and x.sharding == rep:
                return x
            host = jax.device_get(x)
            if jax.process_count() > 1:
                # No cross-host transfer: every process holds the same
                # value, so each binds its own addressable replicas.
                from basi_tpu.parallel.dist_data import make_replicated_array

                return make_replicated_array(host, rep)
            return jax.device_put(host, rep)

        self.params = jax.tree.map(put, self.params)
        self.batch_stats = jax.tree.map(put, self.batch_stats)

    def _build(self):
        cfg = self.cfg
        mean = tuple(cfg.data.mean)
        std = tuple(cfg.data.std)
        icfg = cfg.infer
        # infer.dtype=int8: dynamic post-training quantization — convs run
        # s8xs8->s32 on the MXU (ops/quant.py interceptor), everything
        # else (BN affine, resizes, NMS, Pallas kernels) runs bf16.
        self._quant = icfg.dtype == "int8"
        compute_dtype = (jnp.bfloat16 if self._quant
                         else jnp.dtype(icfg.dtype) if icfg.dtype
                         else self.model.dtype)
        self._compute_dtype = compute_dtype
        # flax modules promote to their own dtype, so bf16 inference needs
        # the MODULE dtype switched, not just the input cast.
        model = (self.model if compute_dtype == self.model.dtype
                 else self.model.clone(dtype=compute_dtype))
        if compute_dtype == jnp.bfloat16 and not self._quant:
            # Pre-cast weights ONCE: profiler traces show runtime f32->bf16
            # weight conversion/copy ops on every invocation otherwise
            # (halves weight HBM reads too). int8 mode keeps params f32:
            # conv kernels must quantize from the TRUE checkpoint values,
            # not bf16-rounded ones (compounds the int8 noise floor).
            self.params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16), self.params)
            self.batch_stats = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16), self.batch_stats)
        if self._quant:
            # Pre-quantize ONCE (from the true f32 values): the compiled
            # program reads int8 kernels + per-cout scales directly —
            # no per-run weight-quantization work, 4x less kernel HBM.
            from basi_tpu.ops.quant import prequantize_params

            self.params = prequantize_params(self.params)

        # Ingest-side space-to-depth: reshaping the raw uint8 bytes is ~4x
        # cheaper than reshaping the normalized bf16/f32 tensor inside the
        # model (round-1 profile: ~0.8 ms of layout copies per batch-8),
        # and the s2d stem conv then runs dense on the MXU instead of the
        # ~1.5 ms MXU-hostile 7x7/s2 conv over 3 channels.
        from basi_tpu.data.transforms import wants_s2d_feed

        stem_s2d = wants_s2d_feed(model)
        from basi_tpu.models.resnet import space_to_depth

        mechanism = getattr(cfg.model, "instance_mechanism", "kernels")
        if mechanism not in ("kernels", "connected", "roi"):
            raise ValueError(
                f"model.instance_mechanism={mechanism!r} "
                f"(expected 'kernels', 'connected' or 'roi')")

        tta_flip = icfg.tta == "hflip"
        if icfg.tta not in ("", "hflip"):
            raise ValueError(
                f"infer.tta={icfg.tta!r} (expected '' or 'hflip')")
        tta_scales = tuple(getattr(icfg, "tta_scales", ()) or ())
        if any(s <= 0 for s in tta_scales):
            raise ValueError(f"infer.tta_scales must be positive, got "
                             f"{tta_scales}")
        tta_on = tta_flip or bool(tta_scales)

        def apply_model(variables, x):
            if self._quant:
                from basi_tpu.ops.quant import quantized_convs

                with quantized_convs():  # active during jit TRACING
                    return model.apply(variables, x, train=False,
                                       with_candidates=False)
            return model.apply(variables, x, train=False,
                               with_candidates=False)

        def run_tta(params, batch_stats, images_u8):
            """TTA ensemble (infer.tta / infer.tta_scales): one forward per
            view, outputs realigned to the original geometry, averaged in
            probability space, then ONE selection/NMS pass. The cell grid is
            a fixed S x S partition of the image, so cell (i, j) of an
            hflipped view is cell (i, S-1-j) of the original, and cells of a
            scaled view coincide with the original's — mask features carry
            all the resolution differences (resized inside the selection
            op). Quality mode: the packed-s2d ingest fast path is bypassed
            (views need the raw image) — each view pays the full forward."""
            from basi_tpu.models.resnet import depth_to_space
            from basi_tpu.ops.resize import resize_bilinear

            x = images_u8
            if x.shape[-1] != 3:
                x = depth_to_space(x, 2)  # host-packed feed -> raw bytes
            x = x.astype(jnp.float32) / 255.0
            x = (x - jnp.asarray(mean)) / jnp.asarray(std)
            x = x.astype(compute_dtype)
            base4 = (x.shape[1] // 4, x.shape[2] // 4)
            views = []  # (image, was_flipped)
            for s in (1.0,) + tta_scales:
                if s == 1.0:
                    xs = x
                else:
                    # Multiple of 32 keeps every FPN level and the s2d stem
                    # on even sizes (stride-32 pyramid).
                    hw = (max(32, int(round(x.shape[1] * s / 32)) * 32),
                          max(32, int(round(x.shape[2] * s / 32)) * 32))
                    xs = resize_bilinear(x, hw)
                for flip in (False, True) if tta_flip else (False,):
                    views.append((jnp.flip(xs, axis=2) if flip else xs, flip))

            variables = {"params": params, "batch_stats": batch_stats}

            if mechanism == "roi":
                # ROI TTA = detection-style view union: every view's
                # proposals are realigned to the ORIGINAL frame (boxes are
                # normalized, so a flipped view's box mirrors analytically
                # as x0' = 1-x1, x1' = 1-x0, and its ROI-frame mask flips
                # along the ROI's own W axis; scaled views' normalized
                # boxes carry over unchanged), all V*K candidates paste
                # onto the base /4 canvas, and ONE rescoring/NMS pass
                # dedups detections the views agree on.
                from basi_tpu.ops.nms import select_instances_from_probs
                from basi_tpu.ops.roi import paste_rois

                boxes_v, probs_v, obj_v, sal_sum = [], [], [], None
                for xv, flipped in views:
                    if stem_s2d:
                        xv = space_to_depth(xv, 2)
                    out = apply_model(variables, xv)
                    sal = jax.nn.sigmoid(
                        out.saliency_logits.astype(jnp.float32))
                    bx = out.roi_boxes.astype(jnp.float32)  # (N, K, 4)
                    pr = jax.nn.sigmoid(
                        out.roi_mask_logits.astype(jnp.float32))
                    if flipped:
                        sal = jnp.flip(sal, axis=2)
                        bx = jnp.stack(
                            [bx[..., 0], 1.0 - bx[..., 3],
                             bx[..., 2], 1.0 - bx[..., 1]], axis=-1)
                        pr = jnp.flip(pr, axis=3)  # ROI-frame W
                    if sal.shape[1:3] != base4:
                        sal = resize_bilinear(sal, base4)
                    boxes_v.append(bx)
                    probs_v.append(pr.astype(compute_dtype))
                    obj_v.append(jax.nn.sigmoid(
                        out.roi_scores.astype(jnp.float32)))
                    sal_sum = sal if sal_sum is None else sal_sum + sal
                sal_prob = sal_sum / len(views)
                p = jnp.clip(sal_prob, 1e-6, 1.0 - 1e-6)
                sal_logits = (jnp.log(p) - jnp.log1p(-p)).astype(
                    compute_dtype)
                boxes = jnp.concatenate(boxes_v, axis=1)  # (N, V*K, 4)
                probs = jnp.concatenate(probs_v, axis=1)
                obj = jnp.concatenate(obj_v, axis=1)
                canv = jax.vmap(
                    lambda prr, bxx: paste_rois(prr, bxx, base4)
                )(probs, boxes)
                masks, scores = jax.vmap(
                    lambda m, sc: select_instances_from_probs(
                        m, sc,
                        num_slots=cfg.model.num_slots,
                        score_threshold=icfg.score_threshold,
                        mask_threshold=icfg.mask_threshold,
                        nms=icfg.nms,
                        nms_sigma=icfg.nms_sigma,
                        nms_iou_threshold=icfg.nms_iou_threshold,
                    )
                )(canv, obj)
                return masks, scores, sal_logits

            feats_v, kerns_v, scores_v, sal_sum = [], [], [], None
            for xv, flipped in views:
                if stem_s2d:
                    xv = space_to_depth(xv, 2)
                out = apply_model(variables, xv)
                mf = out.mask_feats
                sal = jax.nn.sigmoid(out.saliency_logits.astype(jnp.float32))
                ck, cs = out.cell_kernels, out.cell_scores
                if flipped:
                    mf = jnp.flip(mf, axis=2)
                    sal = jnp.flip(sal, axis=2)
                    ck = jnp.flip(ck, axis=2)  # mirror the cell grid's W axis
                    cs = jnp.flip(cs, axis=2)
                if sal.shape[1:3] != base4:
                    sal = resize_bilinear(sal, base4)
                n, s1, s2, e = ck.shape
                feats_v.append(mf)
                kerns_v.append(ck.reshape(n, s1 * s2, e))
                scores_v.append(cs.reshape(n, s1 * s2))
                sal_sum = sal if sal_sum is None else sal_sum + sal
            sal_prob = sal_sum / len(views)
            # Downstream consumers take logits (they sigmoid in f32), so
            # hand back logit(mean prob) — monotone in the ensemble prob.
            p = jnp.clip(sal_prob, 1e-6, 1.0 - 1e-6)
            sal_logits = (jnp.log(p) - jnp.log1p(-p)).astype(compute_dtype)

            if mechanism == "connected":
                from basi_tpu.ops.connected import extract_instances

                masks, scores = jax.vmap(
                    lambda sp: extract_instances(
                        sp, num_slots=cfg.model.num_slots,
                        threshold=icfg.mask_threshold,
                        split=getattr(icfg, "connected_split", "none"),
                        erode_steps=getattr(icfg, "connected_erode", 2),
                    )
                )(sal_prob[..., 0])
                keep = scores >= icfg.score_threshold
                scores = jnp.where(keep, scores, 0.0)
                masks = masks * keep[..., None, None].astype(masks.dtype)
                return masks, scores, sal_logits

            from basi_tpu.ops.nms import select_instances_from_kernel_views

            masks, scores = jax.vmap(
                lambda fv, kv, sv: select_instances_from_kernel_views(
                    fv, kv, sv, base_hw=base4,
                    num_slots=cfg.model.num_slots,
                    score_threshold=icfg.score_threshold,
                    mask_threshold=icfg.mask_threshold,
                    nms=icfg.nms,
                    nms_sigma=icfg.nms_sigma,
                    nms_iou_threshold=icfg.nms_iou_threshold,
                    pre_top_k=icfg.pre_nms_top_k,
                )
            )(tuple(feats_v), tuple(kerns_v), tuple(scores_v))
            return masks, scores, sal_logits

        @jax.jit
        def run(params, batch_stats, images_u8):
            if tta_on:
                return run_tta(params, batch_stats, images_u8)
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
            variables = {"params": params, "batch_stats": batch_stats}
            out = apply_model(variables, x)
            if mechanism == "connected":
                # SURVEY §2.8 swap hedge: instances = connected components
                # of the thresholded saliency map, packed into the SAME
                # fixed (num_slots, h, w) contract the kernel head fills —
                # every downstream consumer (upsample, IoU, AP, paste,
                # serving) is mechanism-agnostic.
                from basi_tpu.ops.connected import extract_instances

                sal_prob = jax.nn.sigmoid(
                    out.saliency_logits[..., 0].astype(jnp.float32))
                masks, scores = jax.vmap(
                    lambda sp: extract_instances(
                        sp, num_slots=cfg.model.num_slots,
                        threshold=icfg.mask_threshold,
                        split=getattr(icfg, "connected_split", "none"),
                        erode_steps=getattr(icfg, "connected_erode", 2),
                    )
                )(sal_prob)
                keep = scores >= icfg.score_threshold
                scores = jnp.where(keep, scores, 0.0)
                masks = masks * keep[..., None, None].astype(masks.dtype)
                return masks, scores, out.saliency_logits
            if mechanism == "roi":
                # §2.8 candidate (b): the model proposed top-k boxes and
                # predicted ROI-frame masks; paste their sigmoid probs onto
                # /4 canvases (ops/roi.py inverse sampler) and run the SAME
                # rescoring/NMS/slot tail as the kernel mechanism.
                from basi_tpu.ops.nms import select_instances_from_probs
                from basi_tpu.ops.roi import paste_rois

                h4, w4 = out.mask_feats.shape[1:3]
                probs = jax.nn.sigmoid(
                    out.roi_mask_logits.astype(jnp.float32)
                ).astype(compute_dtype)
                canv = jax.vmap(
                    lambda pr, bx: paste_rois(pr, bx, (h4, w4))
                )(probs, out.roi_boxes)
                obj = jax.nn.sigmoid(out.roi_scores.astype(jnp.float32))
                masks, scores = jax.vmap(
                    lambda m, sc: select_instances_from_probs(
                        m, sc,
                        num_slots=cfg.model.num_slots,
                        score_threshold=icfg.score_threshold,
                        mask_threshold=icfg.mask_threshold,
                        nms=icfg.nms,
                        nms_sigma=icfg.nms_sigma,
                        nms_iou_threshold=icfg.nms_iou_threshold,
                    )
                )(canv, obj)
                return masks, scores, out.saliency_logits
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

        from basi_tpu.evals.saliency import (
            boundary_f_measure,
            e_measure_hist,
            f_measure_hist,
            s_measure,
            weighted_f_measure,
        )
        from basi_tpu.ops.resize import resize_bilinear

        use_wf = getattr(icfg, "wf", True)

        def eval_batch(params, batch_stats, images_u8, gt_masks, gt_valid,
                       valid_hw):
            """One fused eval program per batch: forward + selection +
            FULL-RESOLUTION matching IoU + saliency metrics. Matching at /4
            with maxpooled GT (round 1) dilates thin GT structures and
            biases IoU; here predictions are upsampled (the same fused
            kernel the PNG path uses) and matched against the native-res GT
            — one (K, HW) x (HW, M) matmul per image."""
            from basi_tpu.data.transforms import maybe_unpack_masks

            # GT may arrive bit-packed along W (data.pack_masks): the same
            # 8x host->device traffic cut the train feed gets.
            gt_masks = maybe_unpack_masks(gt_masks, size)
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
            # Full SOD metric suite (BASNet-line papers report S/E/boundary-F
            # next to MAE/max-F): E rides the SAME histogram counts as F,
            # S is the mask-quadrant structure measure, boundary-F the
            # rho-tolerant boundary match — all content-masked, all device.
            e_mat = e_measure_hist(prob_full, union, valid=content)  # (T-1, N)
            s_per = s_measure(prob_full, union, valid=content)  # (N,)
            bf_per = boundary_f_measure(prob_full, union, valid=content)
            # Weighted F (Margolin CVPR'14) costs ~2.5 ms/img at 512^2 (the
            # exact on-device EDT) — infer.wf=false sheds it.
            wf_per = (weighted_f_measure(prob_full, union, valid=content)
                      if use_wf else jnp.zeros_like(s_per))
            # The PNG path reuses ``full`` (already computed for the IoU
            # matrix) rather than re-running the upsample — but returning
            # the (N, K, size, size) tensor keeps it live in HBM for up to
            # ``lag`` batches, so only ship it when PNGs are requested.
            ap_orig = getattr(icfg, "ap_at_original", False)
            want_full = icfg.save_png or ap_orig
            full_out = full if want_full else jnp.zeros((), full.dtype)
            # Original-frame eval pastes the saliency prob map to the
            # native canvas too (the reference's SOD geometry); ship it
            # only for that config — like ``full`` it would otherwise sit
            # in HBM for up to ``lag`` batches for nothing.
            sal_out = prob_full if ap_orig else jnp.zeros((), prob_full.dtype)
            # gt_valid rides back as an output: on a multi-host mesh each
            # process decodes only its own rows, but host AP accumulation
            # needs the GLOBAL validity flags — the replicated output is
            # the all_gather that provides them (and the single-host path
            # uses the same fetch for uniformity). GT pixel areas (for the
            # size-binned AR) ride the same path for the same reason: an
            # out-of-program reduce would come back batch-SHARDED on a
            # mesh, and its shards are not process-addressable.
            gt_areas = jnp.sum(gt_masks.astype(jnp.int32), axis=(2, 3))
            return (masks, scores, iou, mae_per, f_mat, e_mat, s_per,
                    bf_per, wf_per, gt_valid, full_out, sal_out, gt_areas)

        if self.mesh is None:
            self._eval_batch = jax.jit(eval_batch)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            bsh = NamedSharding(self.mesh, P(self.data_axis))
            rep = NamedSharding(self.mesh, P())
            # Batch-sharded inputs, replicated outputs: the forward /
            # selection / IoU work runs data-parallel over the mesh;
            # GSPMD all_gathers only the small metric tensors at the end.
            # With a spatial axis, the image H dim (axis 1 — raw NHWC or
            # packed s2d both keep H there) and GT-mask H dim (axis 2 of
            # (N, M, H, W)) also shard; the partitioner derives the conv
            # halo exchanges and re-gathers for the per-image selection.
            sp = self.spatial_axis or None
            ish = (NamedSharding(self.mesh, P(self.data_axis, sp))
                   if sp else bsh)
            msh = (NamedSharding(self.mesh, P(self.data_axis, None, sp))
                   if sp else bsh)
            self._eval_batch = jax.jit(
                eval_batch,
                in_shardings=(rep, rep, ish, msh, bsh, bsh),
                out_shardings=rep,
            )
            self._replicate_weights()
        self._orig_iou_cache = {}
        # One jitted upsample program reused across predict_paths batches
        # (a fresh jax.jit wrapper per call would re-trace every batch).
        self._full_fn = jax.jit(self._to_full_res)

    def _orig_eval_fn(self, canvas_hw: tuple[int, int], packed: bool = False):
        """One jitted paste+IoU+SOD program per canvas bucket (static
        shapes; reused across batches sharing the bucket, like the PNG
        path). Besides the matching IoU it recomputes the whole saliency
        metric suite at the native frame: the prob map is pasted (K=1
        slot) onto the canvas and scored against the native GT union over
        the per-image original extent — the same content-masking idea as
        the letterbox path, with the extent replacing the letterbox
        region."""
        cached = self._orig_iou_cache.get((canvas_hw, packed))
        if cached is not None:
            return cached
        thr = self.cfg.infer.mask_threshold
        use_wf = getattr(self.cfg.infer, "wf", True)
        from basi_tpu.data.transforms import unpack_masks
        from basi_tpu.evals.saliency import (
            boundary_f_measure,
            e_measure_hist,
            f_measure_hist,
            s_measure,
            weighted_f_measure,
        )
        from basi_tpu.ops.paste import paste_masks_batch

        ch, cw = canvas_hw

        @jax.jit
        def _fn(full, sal, valid_hw, orig_hw, gt_canvas, gt_valid):
            if packed:  # bit-packed along W (NativeGTCache): 8x smaller
                # upload; unpacks to the same 0/1 u8 the raw path gets.
                gt_canvas = unpack_masks(gt_canvas, cw)
            pasted = paste_masks_batch(full, valid_hw, canvas_hw, orig_hw)
            pm = (pasted > thr).astype(jnp.float32)
            gm = gt_canvas.astype(jnp.float32)
            iou = jax.vmap(mask_iou_matrix)(pm, gm)
            gt_areas = jnp.sum(gt_canvas.astype(jnp.int32), axis=(2, 3))
            sal_c = paste_masks_batch(
                sal[:, None], valid_hw, canvas_hw, orig_hw)[:, 0]
            gv = gt_valid.astype(jnp.float32)
            union = jnp.max(gm * gv[..., None, None], axis=1)
            rows = (jnp.arange(ch)[None, :, None]
                    < orig_hw[:, 0][:, None, None])
            cols = (jnp.arange(cw)[None, None, :]
                    < orig_hw[:, 1][:, None, None])
            extent = (rows & cols).astype(jnp.float32)  # (N, ch, cw)
            area = jnp.maximum(jnp.sum(extent, axis=(1, 2)), 1.0)
            mae_per = jnp.sum(jnp.abs(sal_c - union) * extent,
                              axis=(1, 2)) / area
            f_mat = f_measure_hist(sal_c, union, valid=extent)
            e_mat = e_measure_hist(sal_c, union, valid=extent)
            s_per = s_measure(sal_c, union, valid=extent)
            bf_per = boundary_f_measure(sal_c, union, valid=extent)
            wf_per = (weighted_f_measure(sal_c, union, valid=extent)
                      if use_wf else jnp.zeros_like(s_per))
            return iou, mae_per, f_mat, e_mat, s_per, bf_per, wf_per, gt_areas

        self._orig_iou_cache[(canvas_hw, packed)] = _fn
        return _fn

    def _orig_frame_eval(self, full, sal, batch, dataset):
        """Original-resolution eval (SURVEY §3.2/§3.5: the reference
        pastes to original size, THEN evaluates): predictions AND the
        saliency prob map letterbox-inverted onto a static canvas bucket,
        matched/scored against native-resolution GT read from the
        dataset. IoU (or MAE/F/E/S) after bilinear letterboxing != the
        same metric at original resolution for any non-square image —
        this path restores the reference's geometry for the whole metric
        set. Returns (iou, mae, f_mat, e_mat, s, bf, wf, gt_areas) —
        gt_areas in NATIVE-frame pixels so the size-binned AR uses the
        same geometry as the matching."""
        import warnings

        size = self.cfg.model.image_size
        max_canvas = 2048
        mh = int(np.max(batch["orig_hw"][:, 0]))
        mw = int(np.max(batch["orig_hw"][:, 1]))
        ch = min(max(size, -(-mh // 128) * 128), max_canvas)
        cw = min(max(size, -(-mw // 128) * 128), max_canvas)
        if mh > max_canvas or mw > max_canvas:
            warnings.warn(
                f"original image {mh}x{mw} exceeds the {max_canvas} AP "
                f"canvas cap; matching will crop")
        n = len(batch["index"])
        m_slots = batch["masks"].shape[1]
        cache = self._gt_cache(dataset)
        dev = self._device_gt(dataset, cache)
        if dev is not None:
            # Device-resident packed GT: ONE upload for the whole val set
            # (global canvas bucket -> one compiled eval program), then a
            # per-batch device-side row gather — no per-batch host
            # assembly or relay upload at all.
            gt_dev, (dch, dcw) = dev
            gt_p = jnp.take(gt_dev, jnp.asarray(batch["index"]), axis=0)
            return self._orig_eval_fn((dch, dcw), packed=True)(
                full, sal, jnp.asarray(batch["valid_hw"]),
                jnp.asarray(batch["orig_hw"]), gt_p,
                jnp.asarray(batch["valid"]))
        if cache is not None:
            # Bit-packed canvas assembly from the NativeGTCache: 8x less
            # host memcpy and 8x less relay upload than the raw path, and
            # no per-image scene regeneration / PNG re-decode. cw is a
            # 128-multiple, so the byte crop at cw//8 keeps exactly cw
            # bits (packbits pads trailing bits with zeros — canvas zeros).
            gt_p = np.zeros((n, m_slots, ch, cw // 8), np.uint8)
            for j, gi in enumerate(batch["index"]):
                packed, _, (oh, ow) = cache.get_packed(int(gi))
                hh = min(oh, ch)
                wb = min(packed.shape[-1], cw // 8)
                gt_p[j, :, :hh, :wb] = packed[:, :hh, :wb]
            return self._orig_eval_fn((ch, cw), packed=True)(
                full, sal, jnp.asarray(batch["valid_hw"]),
                jnp.asarray(batch["orig_hw"]), jnp.asarray(gt_p),
                jnp.asarray(batch["valid"]))
        gt = np.zeros((n, m_slots, ch, cw), np.uint8)
        for j, gi in enumerate(batch["index"]):
            masks, _ = dataset.get_orig_masks(int(gi))
            hh, ww = min(masks.shape[1], ch), min(masks.shape[2], cw)
            gt[j, :, :hh, :ww] = masks[:, :hh, :ww]
        return self._orig_eval_fn((ch, cw))(
            full, sal, jnp.asarray(batch["valid_hw"]),
            jnp.asarray(batch["orig_hw"]), jnp.asarray(gt),
            jnp.asarray(batch["valid"]))

    def _device_gt(self, dataset, cache):
        """Device-resident bit-packed GT canvas for the WHOLE val set, or
        None. Built once per dataset from the disk NativeGTCache (the
        global canvas bucket comes from the cache's stored native dims);
        capped at 2 GB of device memory, else the per-batch path runs.
        The per-batch bucket path and this global-bucket path compute the
        same metrics (zero padding beyond an image's extent contributes
        nothing; pinned by test)."""
        hit = getattr(self, "_gt_dev_obj", None)
        if hit is not None and hit[0] is dataset:
            return hit[1]
        obj = None
        npz = getattr(cache, "_npz", None) if cache is not None else None
        if npz is not None:
            size = self.cfg.model.image_size
            max_canvas = 2048
            hw = npz["hw"]
            mh, mw = int(hw[:, 0].max()), int(hw[:, 1].max())
            ch = min(max(size, -(-mh // 128) * 128), max_canvas)
            cw = min(max(size, -(-mw // 128) * 128), max_canvas)
            n = len(dataset)
            m = npz["m0"].shape[0]
            if n * m * ch * (cw // 8) <= 2 * 1024 ** 3:
                gt = np.zeros((n, m, ch, cw // 8), np.uint8)
                for i in range(n):
                    packed, _, (oh, ow) = cache.get_packed(i)
                    hh = min(oh, ch)
                    wb = min(packed.shape[-1], cw // 8)
                    gt[i, :, :hh, :wb] = packed[:, :hh, :wb]
                obj = (jax.device_put(jnp.asarray(gt)), (ch, cw))
        self._gt_dev_obj = (dataset, obj)
        return obj

    def _gt_cache(self, dataset):
        """NativeGTCache for this dataset (built/loaded once per dataset
        object), or None when infer.native_gt_cache="" disables caching."""
        cfg_dir = getattr(self.cfg.infer, "native_gt_cache", "auto")
        if not cfg_dir:
            return None
        hit = getattr(self, "_gt_cache_obj", None)
        if hit is not None and hit[0] is dataset:
            return hit[1]
        import os

        from basi_tpu.data.native_gt import NativeGTCache

        cache_dir = (os.path.join(self.cfg.infer.output_dir, "native_gt")
                     if cfg_dir == "auto" else cfg_dir)
        cache = NativeGTCache(dataset, cache_dir)
        self._gt_cache_obj = (dataset, cache)
        return cache

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
        return self._full_fn(slot_mask_probs)

    def predict_batch(self, images_u8: np.ndarray):
        masks, scores, out = self._run(self.params, self.batch_stats, images_u8)
        return masks, scores, out

    def predict_paths(self, paths, out_dir: str = "",
                      results_path: str = "") -> list[dict]:
        """GT-free prediction over raw image FILES (SURVEY §2.1: the
        reference's MyTest usage — images in, mask PNGs out, no labels
        needed). decode+letterbox -> jitted forward+NMS -> fused upsample
        -> paste to original resolution -> one labeled-instance PNG per
        input stem under ``out_dir``. Returns one
        ``{"path", "instances", "scores"}`` summary per input.

        ``results_path``: also write a COCO-format results JSON (one entry
        per kept instance: score + compressed-RLE segmentation at ORIGINAL
        resolution; ``image_id`` is parsed from all-digit file stems per
        the COCO naming convention, else the stem) — loadable by
        pycocotools ``COCO.loadRes`` for official offline evaluation."""
        import os

        from basi_tpu.data.datasets import letterbox_params
        from basi_tpu.data.native import get_decoder
        from basi_tpu.data.transforms import space_to_depth_host, wants_s2d_feed

        cfg = self.cfg
        size = cfg.model.image_size
        bs = cfg.infer.batch_size
        out_dir = out_dir or cfg.infer.output_dir
        backend = cfg.data.decode_backend
        decoder = get_decoder("auto" if backend == "synthetic" else backend)
        pack = wants_s2d_feed(self.model)
        thr = cfg.infer.score_threshold
        # Output names: file stem, deduplicated — inputs from different
        # directories (or .jpg/.png siblings) can share a basename, and a
        # bare-stem collision would silently overwrite the earlier PNG.
        all_names, used = [], set()
        for p in paths:
            base = os.path.splitext(os.path.basename(str(p)))[0]
            name, k = base, 1
            while name in used:
                name, k = f"{base}_{k}", k + 1
            used.add(name)
            all_names.append(name)
        results: list[dict] = []
        coco_results: list[dict] = []
        seen_ids: dict = {}
        if results_path:
            # Fail fast on an unwritable results path BEFORE hours of
            # inference, not after (the JSON is written once at the end).
            # Append-mode probe: must NOT truncate pre-existing results,
            # and must not forge a valid empty '[]' that a mid-run crash
            # would leave looking like a successful zero-detection run.
            parent = os.path.dirname(os.path.abspath(results_path))
            os.makedirs(parent, exist_ok=True)
            with open(results_path, "a"):
                pass
        for start in range(0, len(paths), bs):
            chunk = [str(p) for p in paths[start:start + bs]]
            n_real = len(chunk)
            if hasattr(decoder, "decode_letterbox_batch"):
                imgs, hws = decoder.decode_letterbox_batch(chunk, size)
            else:
                dec = [decoder.decode_letterbox(p, size) for p in chunk]
                imgs, hws = [d[0] for d in dec], [d[1] for d in dec]
            # Static batch shape: pad a short tail by repeating row 0
            # (one compiled program for every batch, incl. the last).
            idx = [i if i < n_real else 0 for i in range(bs)]
            arr = np.stack([np.asarray(imgs[i]) for i in idx])
            orig_hw = np.array(
                [[int(hws[i][0]), int(hws[i][1])] for i in idx], np.int32)
            valid_hw = np.array(
                [letterbox_params(int(hws[i][0]), int(hws[i][1]), size)
                 for i in idx], np.int32)
            feed = space_to_depth_host(arr) if pack else arr
            masks, scores, _ = self._run(
                self.params, self.batch_stats, jnp.asarray(feed))
            full = self._full_fn(masks)
            scores_h = np.asarray(jax.device_get(scores))
            batch = {"orig_hw": orig_hw, "valid_hw": valid_hw,
                     "num_real": np.int32(n_real)}
            names = all_names[start:start + bs]
            pasted = self._paste_batch(batch, full)
            self._save_batch_pngs(start // bs, batch, full, scores_h,
                                  out_dir=out_dir, names=names,
                                  pasted=pasted)
            arr_p, ch, cw = pasted
            for i in range(n_real):
                oh, ow = int(orig_hw[i][0]), int(orig_hw[i][1])
                kept = self._kept_instances(arr_p[i], scores_h[i],
                                            oh, ow, thr)
                results.append({"path": chunk[i], "instances": len(kept),
                                "scores": [s for _, s, _ in kept]})
                if not results_path:
                    continue
                # image_id from the ORIGINAL stem per the COCO all-digit
                # naming convention (isdecimal matches int()'s domain;
                # isdigit accepts e.g. superscripts that int() rejects).
                stem = os.path.splitext(os.path.basename(chunk[i]))[0]
                image_id = int(stem) if stem.isdecimal() else stem
                if image_id in seen_ids and seen_ids[image_id] != chunk[i]:
                    import warnings

                    warnings.warn(
                        f"duplicate COCO image_id {image_id!r}: "
                        f"{chunk[i]!r} and {seen_ids[image_id]!r} — their "
                        f"results merge under one id")
                seen_ids.setdefault(image_id, chunk[i])
                coco_results.extend(
                    self._coco_entry(image_id, s, m, oh, ow)
                    for _, s, m in kept)
        if results_path:
            import json

            with open(results_path, "w") as f:
                json.dump(coco_results, f)
        return results

    @staticmethod
    def _kept_instances(slots: np.ndarray, scores: np.ndarray,
                        oh: int, ow: int, thr: float):
        """ONE keep predicate for every prediction-export consumer
        (summary counts, PNGs are score-gated separately, COCO entries):
        score passes AND the pasted mask is non-empty. Returns
        [(slot, score, bool_mask_cropped_to_canvas)]."""
        kept = []
        ch, cw = slots.shape[-2:]
        for j, s in enumerate(scores):
            if s < thr or s <= 0:
                continue
            m = slots[j, :min(oh, ch), :min(ow, cw)] > 0.5
            if m.any():
                kept.append((j, float(s), m))
        return kept

    @staticmethod
    def _coco_entry(image_id, score: float, m: np.ndarray,
                    oh: int, ow: int) -> dict:
        """One COCO results entry at TRUE original resolution (canvas-cap
        crops are zero-padded back so pycocotools' size-keyed IoU stays
        valid; content beyond the canvas is lost — warned in
        _paste_batch)."""
        from basi_tpu.data.coco import mask_to_rle

        if m.shape != (oh, ow):
            m = np.pad(m, ((0, oh - m.shape[0]), (0, ow - m.shape[1])))
        return {"image_id": image_id, "category_id": 1, "score": score,
                "segmentation": mask_to_rle(m)}

    def _paste_batch(self, batch: dict, full) -> tuple[np.ndarray, int, int]:
        """Paste full-res slot masks to ORIGINAL resolution on device. The
        paste canvas is a static 512-multiple bucket sized to the batch's
        largest original image (one XLA program per bucket), so originals
        larger than the model size are not silently truncated. Returns the
        host (N, K, ch, cw) array plus the canvas dims."""
        import warnings

        from basi_tpu.ops.paste import paste_masks_batch

        size = self.cfg.model.image_size
        max_canvas = 2048
        mh = int(np.max(batch["orig_hw"][:, 0]))
        mw = int(np.max(batch["orig_hw"][:, 1]))
        ch = min(max(size, -(-mh // 512) * 512), max_canvas)
        cw = min(max(size, -(-mw // 512) * 512), max_canvas)
        if mh > max_canvas or mw > max_canvas:
            warnings.warn(
                f"original image {mh}x{mw} exceeds the {max_canvas} paste "
                f"canvas cap; saved mask PNGs are cropped and exported RLE "
                f"masks are zero-padded beyond the canvas")
        pasted = jax.device_get(paste_masks_batch(
            full, jnp.asarray(batch["valid_hw"]),
            (ch, cw), jnp.asarray(batch["orig_hw"]),
        ))
        return np.asarray(pasted), ch, cw

    def _save_batch_pngs(self, bi: int, batch: dict, full, scores_h,
                         out_dir: str = "", names: list[str] | None = None,
                         pasted=None):
        """Dump per-image labeled-instance PNGs at original resolution
        (reference behavior). ``pasted`` reuses an existing _paste_batch
        result instead of pasting again."""
        cfg = self.cfg
        if pasted is None:
            pasted, ch, cw = self._paste_batch(batch, full)
        else:
            pasted, ch, cw = pasted
        for i in range(int(batch["num_real"])):
            oh = min(int(batch["orig_hw"][i][0]), ch)
            ow = min(int(batch["orig_hw"][i][1]), cw)
            save_mask_pngs(
                out_dir or cfg.infer.output_dir,
                names[i] if names else f"b{bi}_i{i}",
                pasted[i][:, :oh, :ow], scores_h[i],
                cfg.infer.score_threshold,
            )

    def evaluate(self, dataset=None, max_batches: int = 0,
                 logger: MetricLogger | None = None,
                 results_path: str = "") -> dict:
        """``results_path``: also export every kept prediction as a
        COCO-format results entry (original-resolution compressed RLE,
        image ids from ``dataset.image_id`` — for CocoDataset these are
        the TRUE annotation-file ids, so the JSON drops straight into
        pycocotools COCOeval for official cross-checking of our AP)."""
        cfg = self.cfg
        dataset = dataset or make_dataset(cfg.data, split="val")
        acc = APAccumulator(thresholds=(0.5, 0.7))
        # Multi-host DP eval: decode only this process's rows of each
        # global batch and stitch them into global batch-sharded arrays;
        # metric outputs come back replicated, so every process runs this
        # same host loop and lands on identical metrics.
        multiproc = self.mesh is not None and jax.process_count() > 1
        rows = None
        if multiproc:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from basi_tpu.parallel.dist_data import (
                local_rows,
                make_global_batch_array,
            )

            bsh = NamedSharding(self.mesh, P(self.data_axis))
            rows = local_rows(bsh, cfg.infer.batch_size)
        ap_orig = getattr(cfg.infer, "ap_at_original", False)
        if ap_orig:
            if multiproc:
                raise ValueError(
                    "infer.ap_at_original needs host-side native-GT reads "
                    "and is single-host only")
            if not hasattr(dataset, "get_orig_masks"):
                raise ValueError(
                    f"{type(dataset).__name__} provides no get_orig_masks; "
                    f"original-resolution AP needs native-resolution GT")
        save_png = cfg.infer.save_png
        if save_png and multiproc:
            import warnings

            warnings.warn("infer.save_png pastes at host-local resolution "
                          "and is single-host only; skipping PNG dump")
            save_png = False
        if results_path and multiproc:
            import warnings

            warnings.warn("results export pastes at host-local resolution "
                          "and is single-host only; skipping results JSON")
            results_path = ""
        coco_results: list[dict] = []
        if results_path:
            import os as _os

            # Fail fast on an unwritable path; append-probe preserves any
            # pre-existing file (see predict_paths).
            _os.makedirs(_os.path.dirname(_os.path.abspath(results_path)),
                         exist_ok=True)
            with open(results_path, "a"):
                pass
            id_of = getattr(dataset, "image_id", lambda i: int(i))

        pack_gt = getattr(cfg.data, "pack_masks", False)
        if pack_gt:
            from basi_tpu.data.transforms import pack_masks_host

        def to_device_args(batch):
            gm = np.asarray(batch["masks"])
            if pack_gt:  # 8x smaller GT upload; eval_batch unpacks
                gm = pack_masks_host(gm)
            arrs = (np.asarray(batch["image"]), gm,
                    np.asarray(batch["valid"]), np.asarray(batch["valid_hw"]))
            if not multiproc:
                return arrs
            return tuple(
                make_global_batch_array(a, bsh, cfg.infer.batch_size, rows)
                for a in arrs)

        n_img = 0
        n_batches = 0
        sal_mae_sum = 0.0
        f_sum = None  # (T,) running sum of per-image F curves
        e_sum = None  # (T,) running sum of per-image E curves
        s_sum = 0.0  # running sum of per-image S-measure
        bf_sum = 0.0  # running sum of per-image boundary-F
        wf_sum = 0.0  # running sum of per-image weighted-F
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
            nonlocal t_steady, png_at_steady, e_sum, s_sum, bf_sum, wf_sum
            (bi, batch, scores, iou, mae_per, f_mat, e_mat, s_per, bf_per,
             wf_per, gt_valid, full, gt_areas) = pending.popleft()
            # ONE batched fetch: each device_get pays a full relay round
            # trip (~25-30 ms on axon, bench.py note) — sequential fetches
            # were as many round trips on the timed path.
            (scores_h, iou_h, mae_h, f_h, e_h, s_h, bf_h, wf_h, valid_h,
             areas_h) = (
                np.asarray(x)
                for x in jax.device_get((scores, iou, mae_per, f_mat,
                                         e_mat, s_per, bf_per, wf_per,
                                         gt_valid, gt_areas)))
            nreal = int(batch["num_real"])
            for i in range(nreal):  # padded tail duplicates are skipped
                acc.add(scores_h[i], iou_h[i], valid_h[i],
                        gt_areas=areas_h[i])
            n_img += nreal
            n_batches += 1
            sal_mae_sum += float(mae_h[:nreal].sum())
            s_sum += float(s_h[:nreal].sum())
            bf_sum += float(bf_h[:nreal].sum())
            wf_sum += float(wf_h[:nreal].sum())
            fs = f_h[:, :nreal].sum(axis=1)
            f_sum = fs if f_sum is None else f_sum + fs
            es = e_h[:, :nreal].sum(axis=1)
            e_sum = es if e_sum is None else e_sum + es
            if save_png or results_path:
                # PNG/RLE paste+encode is postproc I/O; keep it out of the
                # reported inference latency (timed separately below).
                tp = _time.perf_counter()
                pasted = self._paste_batch(batch, full)
                if save_png:
                    self._save_batch_pngs(bi, batch, full, scores_h,
                                          pasted=pasted)
                if results_path:
                    arr_p, _, _ = pasted
                    thr = cfg.infer.score_threshold
                    for i in range(nreal):
                        oh = int(batch["orig_hw"][i][0])
                        ow = int(batch["orig_hw"][i][1])
                        iid = id_of(int(batch["index"][i]))
                        coco_results.extend(
                            self._coco_entry(iid, s, m, oh, ow)
                            for _, s, m in self._kept_instances(
                                arr_p[i], scores_h[i], oh, ow, thr))
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
                drop_last=False, rows=rows,
            )):
                if max_batches and bi >= max_batches:
                    break
                images, gmasks, gvalid, gvalid_hw = to_device_args(batch)
                (masks, scores, iou, mae_per, f_mat, e_mat, s_per, bf_per,
                 wf_per, gt_valid, full, sal_full, gt_areas) = (
                    self._eval_batch(
                        self.params, self.batch_stats, images,
                        gmasks, gvalid, gvalid_hw,
                    ))
                if results_path and full.ndim == 0:
                    # The fused eval program ships full-res masks only for
                    # the PNG/orig-AP configs (HBM: the tensor stays live
                    # for ``lag`` batches); results-only export upsamples
                    # from the returned slot masks instead (same fused
                    # kernel, one extra async dispatch per batch).
                    full = self._full_fn(masks)
                del masks  # full-res ``full`` supersedes it in the drain
                if ap_orig:
                    # Swap the letterbox-frame metrics for original-frame
                    # ones — matching IoU AND the saliency suite — (async
                    # dispatch; joins the same pipelined drain).
                    (iou, mae_per, f_mat, e_mat, s_per, bf_per, wf_per,
                     gt_areas) = self._orig_frame_eval(full, sal_full, batch,
                                                       dataset)
                pending.append((bi, batch, scores, iou, mae_per, f_mat,
                                e_mat, s_per, bf_per, wf_per, gt_valid,
                                full, gt_areas))
                while len(pending) > lag:
                    drain_one()
            while pending:
                drain_one()
            total_ms = (_time.perf_counter() - t0) * 1000
            steady_ms = ((_time.perf_counter() - t_steady) * 1000
                         if t_steady is not None else total_ms)

        metrics = acc.ap() | acc.ar()
        if n_img:
            metrics["saliency_mae"] = round(sal_mae_sum / n_img, 4)
            metrics["saliency_maxF"] = round(float(np.max(f_sum / n_img)), 4)
            # dataset-level max-E: per-image E averaged over the set, then
            # maxed over thresholds (same convention as max-F); S and
            # boundary-F are per-image means.
            metrics["saliency_maxE"] = round(float(np.max(e_sum / n_img)), 4)
            metrics["saliency_S"] = round(s_sum / n_img, 4)
            metrics["saliency_boundaryF"] = round(bf_sum / n_img, 4)
            if getattr(cfg.infer, "wf", True):
                metrics["saliency_wF"] = round(wf_sum / n_img, 4)
        if n_batches > 1:
            per_batch = (steady_ms - (png_ms - png_at_steady)) / (n_batches - 1)
            metrics["infer_ms_per_batch"] = round(per_batch, 2)
            metrics["imgs_per_s"] = round(
                cfg.infer.batch_size / (per_batch / 1000), 1)
            if png_ms and save_png:
                # Same steady-state window as infer_ms_per_batch: the
                # compile-inclusive first batch is excluded from BOTH
                # per-batch numbers so they are comparable. (results-only
                # dump time is excluded from infer timing but not labeled
                # as PNG time.)
                metrics["png_ms_per_batch"] = round(
                    (png_ms - png_at_steady) / (n_batches - 1), 2)
        elif n_batches:  # single batch: compile-inclusive, best we can do
            metrics["infer_ms_per_batch"] = round(total_ms - png_ms, 2)
            metrics["imgs_per_s"] = round(
                cfg.infer.batch_size / max((total_ms - png_ms) / 1000, 1e-9), 1)
        metrics["num_images"] = n_img
        if results_path:
            import json as _json

            with open(results_path, "w") as f:
                _json.dump(coco_results, f)
            metrics["num_results"] = len(coco_results)
        if logger:
            logger.log(metrics, prefix="[eval]")
        return metrics

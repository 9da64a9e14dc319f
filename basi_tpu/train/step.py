"""The jitted data-parallel train step (SURVEY §3.1 TPU translation).

One ``shard_map`` region over the ``data`` mesh axis does, per shard:
on-device augmentation (PRNG-derived, fused normalize+flip) -> forward ->
loss -> backward -> gradient ``psum``-mean over ICI -> SGD update. BatchNorm
batch statistics are also ``pmean``-ed (sync-BN semantics: deterministic
and replica-count-invariant, unlike torch DataParallel's lead-GPU stats).

The whole step is one XLA program: no host round-trips, no Python in the
loop. Input images arrive as raw uint8 NHWC (4x less host->device traffic).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from basi_tpu.data.transforms import random_augment
from basi_tpu.ops.resize import maxpool_hw
from basi_tpu.ops.pallas.normalize_aug import (
    normalize_and_flip,
    normalize_and_flip_reference,
)
from basi_tpu.train.loss import basi_loss
from basi_tpu.train.state import TrainState

_USED_KEYS = ("image", "masks", "valid")


def make_train_step(
    model,
    tx,
    cfg_train,
    cfg_data,
    mesh: Mesh | None = None,
    data_axis: str = "data",
    donate: bool = True,
    use_pallas: bool | None = None,
) -> Callable[[TrainState, dict[str, jnp.ndarray]], tuple[TrainState, dict[str, Any]]]:
    """Build the jitted train step. ``mesh=None`` -> single-device jit.

    ``use_pallas``: None = auto (Pallas ingest kernel on TPU, XLA reference
    elsewhere); pass an explicit bool to override (debug/bisection).
    """

    mean = tuple(cfg_data.mean)
    std = tuple(cfg_data.std)

    axis_name = data_axis if mesh is not None else None
    frozen_bn = bool(getattr(cfg_train, "freeze_bn", False))
    if frozen_bn:
        model = model.clone(bn_frozen=True)
    if mesh is not None and not frozen_bn:
        # Cross-replica (sync) BatchNorm: with local-shard BN stats the
        # sharded step would diverge from the single-device step; syncing
        # makes DP exactly replica-count-invariant. (Frozen BN reads
        # replicated running stats — nothing to sync.)
        model = model.clone(bn_axis=data_axis)

    max_pos = getattr(cfg_train, "max_pos_cells", 64)
    ema_decay = float(getattr(cfg_train, "ema_decay", 0.0))
    roi_mode = getattr(model, "instance_mechanism", "kernels") == "roi"

    def _apply(params, batch_stats, images, **apply_kw):
        if frozen_bn:
            # No collection mutates: running stats pass through the carry.
            out = model.apply(
                {"params": params, "batch_stats": batch_stats}, images,
                **apply_kw)
            return out, batch_stats
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            mutable=["batch_stats"], **apply_kw)
        return out, mutated["batch_stats"]

    def loss_fn(params, batch_stats, images, gt_masks, gt_valid,
                gt_stats=None):
        if roi_mode:
            # ROI mechanism: assignment runs FIRST (it only reads GT) —
            # the model's ROI mask head then predicts at the assigned GT
            # boxes (Mask-R-CNN-style mask supervision at GT geometry).
            from basi_tpu.train.loss import basi_roi_loss
            from basi_tpu.train.targets import assign_targets_roi

            s = model.grid_size
            # mask-feature resolution: /4 of the raw image (s2d-packed
            # input carries H/2 x W/2 x 12, i.e. /2 more to go).
            div = 2 if images.shape[-1] == 12 else 4
            mhw = (images.shape[1] // div, images.shape[2] // div)
            p_cells = max_pos if max_pos > 0 else 64
            if gt_stats is None:
                parts = jax.vmap(
                    lambda gm, gv: assign_targets_roi(
                        gm, gv, grid_size=s, mask_hw=mhw,
                        max_pos_cells=p_cells)
                )(gt_masks, gt_valid)
            else:
                parts = jax.vmap(
                    lambda gm, gv, st: assign_targets_roi(
                        gm, gv, grid_size=s, mask_hw=mhw,
                        max_pos_cells=p_cells, stats=st)
                )(gt_masks, gt_valid, gt_stats)
            tgt = dict(zip(
                ("sel_idx", "tgt_masks", "pos_sel", "score_tgt",
                 "num_pos", "sel_boxes"), parts))
            out, new_stats = _apply(params, batch_stats, images,
                                    train=True, roi_boxes=tgt["sel_boxes"])
            loss, metrics = basi_roi_loss(
                out, tgt, gt_masks, gt_valid,
                loss_kind=cfg_train.loss,
                mask_weight=cfg_train.mask_loss_weight,
                score_weight=cfg_train.score_loss_weight,
                box_weight=getattr(cfg_train, "box_loss_weight", 1.0),
                saliency_weight=cfg_train.saliency_loss_weight,
                axis_name=axis_name,
            )
            return loss, (metrics, new_stats)

        out, new_stats = _apply(
            params, batch_stats, images,
            train=True,
            # Never materialize the (S*S, h, w) candidate tensor in
            # training: the loss applies only the positive cells' kernels
            # (basi_loss sparse path; max_pos_cells=0 restores dense).
            with_candidates=(max_pos <= 0),
        )
        loss, metrics = basi_loss(
            out, gt_masks, gt_valid,
            loss_kind=cfg_train.loss,
            mask_weight=cfg_train.mask_loss_weight,
            score_weight=cfg_train.score_loss_weight,
            saliency_weight=cfg_train.saliency_loss_weight,
            axis_name=axis_name,
            max_pos_cells=max_pos,
            gt_stats=gt_stats,
        )
        return loss, (metrics, new_stats)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    # Auto: Pallas ingest on TPU, XLA reference elsewhere. Round 1 shipped
    # this default-OFF (a (1,H,W,3) block pads the 3-channel lane dim to 128
    # and blew the VMEM stack inside the full train program); the kernel now
    # blocks over flattened (H, W*C) row groups and compiles + runs embedded
    # in the 512x512 batch-16 program on v5e at parity with the XLA-fused
    # path (117.9 ms/step f32 both ways, measured 2026-08-16).
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    accum = max(1, int(getattr(cfg_train, "grad_accum", 1)))

    def micro_grads(params, batch_stats, batch: dict[str, jnp.ndarray], rng):
        """Augment one (micro-)batch and return (loss, metrics, new_stats,
        grads) — the unit both the plain step and gradient accumulation
        share. Unfrozen BN normalizes with CURRENT batch statistics in
        train mode, so grads do not depend on the running-stats carry;
        under freeze_bn they DO (normalization reads the running stats),
        so the stats argument must stay threaded in both modes."""
        n = batch["image"].shape[0]
        k_flip, k_aug = jax.random.split(rng)
        flip = jax.random.bernoulli(
            k_flip, cfg_data.hflip_prob, (n,)).astype(jnp.int32)
        # GT masks may arrive bit-packed along W (data.pack_masks: 8x less
        # host->device traffic); unpack on-device before any consumer. The
        # image may itself be s2d-packed (H/2, W/2, 12), so the full width
        # comes from its geometry, not its shape alone.
        from basi_tpu.data.transforms import maybe_unpack_masks

        full_w = batch["image"].shape[2] * (
            2 if batch["image"].shape[-1] == 12 else 1)
        gt_masks_u8 = maybe_unpack_masks(batch["masks"], full_w)

        # uint8 -> normalize + hflip fused on-device (Pallas on TPU).
        # The image may arrive host-packed in the s2d stem's (N, H/2, W/2,
        # 12) layout (data.pack_s2d): the fused ingest flips it analytically
        # (W' reverse + b-block swap) and the s2d stem consumes it with zero
        # device-side reorder copies — the train-side analogue of the
        # inference host-packed feed (round-2 perf log).
        packed = batch["image"].shape[-1] == 12
        if packed:
            from basi_tpu.data.transforms import wants_s2d_feed

            if cfg_data.multiscale:
                raise ValueError(
                    "multiscale scale-jitter resamples the raw image; "
                    "disable data.pack_s2d for multiscale training")
            if not wants_s2d_feed(model):
                raise ValueError(
                    "got an s2d-packed (C=12) batch but the model stem is "
                    f"{getattr(model, 'stem_mode', 'conv7')!r} on backbone "
                    f"{getattr(model, 'backbone', '?')!r}")
        norm = normalize_and_flip if use_pallas else normalize_and_flip_reference
        imgs = norm(batch["image"], flip, mean=mean, std=std,
                    out_dtype=model.dtype)
        cj = tuple(getattr(cfg_data, "color_jitter", (0.0, 0.0, 0.0)))
        if any(v > 0 for v in cj):
            from basi_tpu.data.transforms import color_jitter

            # fold_in (not split) keeps the flip/scale streams identical
            # to a jitter-off run — turning jitter on must not reshuffle
            # the other augmentations.
            imgs = color_jitter(jax.random.fold_in(k_aug, 1), imgs,
                                mean, std, *cj)
        gt_stats = None
        if cfg_data.multiscale:
            # Scale jitter resamples masks at full resolution; keep the
            # full-res f32 path (flip applied here to match the image).
            masks = gt_masks_u8.astype(jnp.float32)
            masks = jnp.where(flip[:, None, None, None] > 0,
                              jnp.flip(masks, axis=3), masks)
            imgs, masks, _ = random_augment(
                k_aug, imgs, masks,
                hflip_prob=0.0,  # flip already applied in the fused ingest
                scale_range=tuple(cfg_data.scale_range),
                enable_scale=True,
            )
        else:
            # Dice targets / saliency union operate at the /4 mask-feature
            # resolution, so downsample the uint8 masks FIRST: the maxpool
            # commutes exactly with the axis flip (integer factor) and with
            # the loss's own maxpool, and removes the (N, M, H, W) f32
            # tensor + its flips/reduces from the step (measured ~10 ms of
            # the 78 ms bf16 batch-16 step at 512^2 on v5e). Assignment
            # stats, however, are computed from the FULL-RES masks (cheap
            # uint8 reductions, no NMHW f32 tensor): maxpool dilation would
            # shift centroids/extents and flip smallest-area tiebreaks vs
            # the multiscale path on identical data. The hflip only mirrors
            # x, so cx -> 1 - cx applies it analytically (normalized
            # center-coords make that exact); cy/extents/area are
            # flip-invariant.
            from basi_tpu.train.targets import instance_stats

            m_u8 = gt_masks_u8
            gt_stats = jax.vmap(instance_stats)(m_u8, batch["valid"])
            fx = flip[:, None] > 0
            gt_stats["cx"] = jnp.where(fx, 1.0 - gt_stats["cx"],
                                       gt_stats["cx"])
            # Mirror the bbox x-corners too (ROI box targets): the flipped
            # left edge is 1 minus the original right edge.
            x0, x1 = gt_stats["x0"], gt_stats["x1"]
            gt_stats["x0"] = jnp.where(fx, 1.0 - x1, x0)
            gt_stats["x1"] = jnp.where(fx, 1.0 - x0, x1)
            f = 4  # mask-feature stride (BASIOutputs.mask_feats is H/4)
            small = maxpool_hw(m_u8, f, f)
            small = jnp.where(flip[:, None, None, None] > 0,
                              jnp.flip(small, axis=3), small)
            masks = small.astype(jnp.float32)

        (loss, (metrics, new_stats)), grads = grad_fn(
            params, batch_stats, imgs, masks, batch["valid"], gt_stats,
        )
        return loss, metrics, new_stats, grads

    def local_step(state: TrainState, batch: dict[str, jnp.ndarray], shard_idx):
        rng = jax.random.fold_in(state.rng, state.step)
        rng = jax.random.fold_in(rng, shard_idx)

        if accum == 1:
            _, metrics, new_stats, grads = micro_grads(
                state.params, state.batch_stats, batch, rng)
        else:
            # Gradient accumulation: scan micro-batches, thread BN running
            # stats sequentially (torch semantics), accumulate the MEAN
            # gradient in the carry (one grads-sized buffer, not accum of
            # them), apply one optimizer update below. Each micro-batch is
            # loss-normalized within itself, exactly like running torch
            # accumulation steps; metrics are scanned out (tiny scalars)
            # and averaged.
            n = batch["image"].shape[0]
            if n % accum:
                raise ValueError(
                    f"train.grad_accum={accum} does not divide the "
                    f"(per-shard) batch size {n}")
            micro = {
                k: batch[k].reshape(accum, n // accum, *batch[k].shape[1:])
                for k in _USED_KEYS
            }
            zero_g = jax.tree.map(
                lambda p: jnp.zeros(p.shape, p.dtype), state.params)

            def scan_body(carry, xs):
                stats, g_acc = carry
                mb, idx = xs
                _, m, stats, g = micro_grads(
                    state.params, stats, mb, jax.random.fold_in(rng, idx))
                g_acc = jax.tree.map(lambda a, b: a + b / accum, g_acc, g)
                return (stats, g_acc), m

            (new_stats, grads), ms = jax.lax.scan(
                scan_body, (state.batch_stats, zero_g),
                (micro, jnp.arange(accum)))
            metrics = jax.tree.map(lambda x: jnp.mean(x, axis=0), ms)

        if mesh is not None:
            # The loss is GLOBALLY normalized (psum-ed num/den inside the
            # loss), so each shard's gradient is its local CONTRIBUTION to
            # the global gradient: psum (not pmean) completes it exactly.
            grads = jax.lax.psum(grads, data_axis)
            if not frozen_bn:
                # Sync-BN semantics for running stats (frozen BN never
                # changes them — already replicated).
                new_stats = jax.lax.pmean(new_stats, data_axis)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_ema = state.ema_params
        if ema_decay > 0:
            # One EMA update per OPTIMIZER step (grad_accum micro-batches
            # share one), after the param update, with the timm warmup ramp
            # d_t = min(d, (1+t)/(10+t)) so the average leaves the random
            # init quickly. Params are replicated under DP and the update
            # is deterministic, so the EMA stays replicated with no extra
            # collective.
            t = (state.step + 1).astype(jnp.float32)
            d = jnp.minimum(ema_decay, (1.0 + t) / (10.0 + t))
            new_ema = jax.tree.map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                state.ema_params, new_params)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            rng=state.rng,
            ema_params=new_ema,
        )
        return new_state, metrics

    if mesh is None:
        def body(state, batch):
            batch = {k: batch[k] for k in _USED_KEYS}
            return local_step(state, batch, jnp.zeros((), jnp.int32))

        train_step = jax.jit(body, donate_argnums=(0,) if donate else ())
        train_step.body = body  # unjitted: composable into scan programs
        return train_step

    batch_spec = {"image": P(data_axis), "masks": P(data_axis), "valid": P(data_axis)}
    state_spec = P()  # fully replicated params/opt state

    def sharded(state, batch):
        idx = jax.lax.axis_index(data_axis)
        return local_step(state, batch, idx)

    shard_fn = jax.shard_map(
        sharded,
        mesh=mesh,
        in_specs=(state_spec, batch_spec),
        out_specs=(state_spec, P()),
        check_vma=False,
    )

    def body(state, batch):
        # Dataset batches carry extra host-side keys (orig_hw/valid_hw/
        # num_real); subselect so the dict matches shard_map's in_specs.
        batch = {k: batch[k] for k in _USED_KEYS}
        return shard_fn(state, batch)

    train_step = jax.jit(body, donate_argnums=(0,) if donate else ())
    train_step.body = body  # unjitted: composable into scan programs
    return train_step


def make_group_step(train_step, donate: bool = True):
    """Multi-step dispatch: ONE jitted program runs ``len(batches)`` train
    steps as a scan (SURVEY §3.1 "one XLA program" taken across steps).

    Per-dispatch overhead is paid once per GROUP instead of once per
    step. Measured on this v5e/axon setup it is a WASH (67.4 ms/step
    per-step-dispatch vs 68.1 grouped at spd=8): back-to-back async
    dispatches already pipeline through the relay, and the in-program
    batch stack costs ~0.5 ms/step of HBM copies. The knob exists for
    runtimes where per-program launch overhead does NOT pipeline (host-
    side dispatch contention in multi-process loops); trajectory
    equivalence with per-step dispatch is tested. Returns
    ``step_many(state, *batches) -> (state, stacked_metrics)``; jit
    compiles once per distinct group size (the epoch tail may be
    shorter)."""
    body = train_step.body

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step_many(state, *batches):
        batches = [{k: b[k] for k in _USED_KEYS} for b in batches]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)

        def scan_body(st, b):
            st, metrics = body(st, b)
            return st, metrics

        return jax.lax.scan(scan_body, state, stacked)

    return step_many


def shard_batch(batch: dict[str, jnp.ndarray], mesh: Mesh, data_axis: str = "data"):
    """Device-put a host batch with batch-dim sharding (scalars replicate)."""
    def spec(v):
        if getattr(v, "ndim", 0) == 0:
            return P()
        return P(*([data_axis] + [None] * (v.ndim - 1)))
    return {
        k: jax.device_put(v, NamedSharding(mesh, spec(v)))
        for k, v in batch.items()
    }

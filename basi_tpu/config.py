"""Config/flag system (SURVEY.md §5.6).

The reference uses an in-file ``Config`` class per script, edited by hand
(SURVEY.md §2.2). Here: one frozen dataclass tree plus named presets mirroring
the five driver benchmark configs (BASELINE.md), with dotted-path CLI overrides
(``--set train.batch_size=8``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class ModelConfig:
    backbone: str = "resnet50"  # resnet18/34/50/101/152 | vgg16 | vgg19
    fpn_channels: int = 256
    mask_channels: int = 64  # unified mask-feature embedding dim E
    grid_size: int = 16  # SxS instance cell grid (per level group)
    num_slots: int = 20  # fixed instance capacity K after NMS
    image_size: int = 512  # square input resolution (SURVEY §2.2)
    saliency_levels: int = 4  # deep-supervision outputs P2..P5
    # conv7 measured faster END-TO-END on v5e (826 vs 798 imgs/s): the
    # space-to-depth rewrite wins the stem conv but loses more in input
    # layout copies. s2d stays available (bit-exact, tested) — revisit if
    # the ingest step learns to emit s2d layout directly.
    # conv7p8 pads the stem's 3-channel contraction to 8 zero lanes
    # (bit-equivalent forward, canonical (7,7,3,64) param; targets the
    # round-4 trace's 1.15 ms conv7-dW at 17 TF/s). Round-5 on-chip A/B:
    # 68.72 vs 67.69 ms/step — the padded-input materialization eats the
    # dW win; stays opt-in.
    stem_mode: str = "conv7"  # conv7 | s2d | conv7p8
    # BatchNorm implementation for the trunk: "xla" = nn.BatchNorm (XLA
    # autodiff reduces); "fused" = FusedBatchNorm (models/norm.py, Pallas
    # reductions + hand-written backward); "stats" = Pallas forward
    # moments only. Round-5 on-chip A/B (bf16 batch-16 512², best-of-3):
    # xla 67.69 / fused 84.41 / stats 73.11 ms/step — the custom-call
    # boundary re-pays the HBM traffic XLA's welded fusions amortize
    # (docs/DESIGN.md round-5 log), so "xla" stays the default and the
    # alternatives remain correct, tested opt-ins.
    bn_impl: str = "xla"  # xla | fused | stats
    # Instance extraction mechanism (SURVEY §2.8 — all three candidates):
    # "kernels" = cell-grid dynamic-kernel head + mask NMS; "connected" =
    # connected components of the thresholded saliency map (postproc-only,
    # training still supervises the kernel head); "roi" = S4Net-style
    # proposal boxes + ROI mask head (own trainable heads + box loss).
    # All three fill the same (masks, scores) slot contract downstream.
    instance_mechanism: str = "kernels"  # kernels | connected | roi
    roi_resolution: int = 28  # roi mechanism: ROI-frame mask size R
    roi_top_k: int = 64  # roi mechanism: proposals kept at inference
    # BASNet-style residual refinement module on the fused saliency map
    # (models/heads.py RefineHead): refined = coarse + RRM(sigmoid(coarse)).
    refine: bool = False
    dtype: str = "float32"  # compute dtype: float32 | bfloat16
    param_dtype: str = "float32"


@dataclass(frozen=True)
class DataConfig:
    # shards = a `basi pack` decode-once cache of any of the others
    # (data/shards.py; epochs stream at mmap speed instead of decode speed)
    dataset: str = "synthetic"  # synthetic | ilso | soc | folder | coco | shards
    root: str = ""
    split: str = "train"
    # COCO only: explicit annotation JSON (default: root/annotations/
    # instances_<split>*.json) — the config-5 stretch run's format.
    ann_file: str = ""
    batch_size: int = 16
    image_size: int = 512
    max_instances: int = 8  # GT instance slots per image (padded)
    # ImageNet statistics (reference normalizes with these; SURVEY §2.5)
    mean: tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: tuple[float, float, float] = (0.229, 0.224, 0.225)
    hflip_prob: float = 0.5
    scale_range: tuple[float, float] = (0.75, 1.25)
    # beyond-reference: per-image brightness/contrast/saturation jitter
    # strengths (torch-ColorJitter semantics, factors ~ U[1-x, 1+x];
    # (0,0,0) = off). Applied on-device inside the train step.
    color_jitter: tuple[float, float, float] = (0.0, 0.0, 0.0)
    multiscale: bool = False
    # Ship GT masks host->device bit-packed along W (8x fewer bytes; masks
    # are 33 MB of a raw 45 MB batch-16 upload at 512^2 with 8 slots) and
    # unpack on-device (elementwise shifts, ~free). Consumers shape-
    # dispatch (transforms.maybe_unpack_masks), so hand-built raw batches
    # keep working.
    pack_masks: bool = True
    synthetic_n: int = 256  # synthetic train-split size (val = n // 4)
    # synthetic only: scenes generate at per-index NON-SQUARE original
    # resolutions up to this multiple of image_size and letterbox down —
    # exercising the original-resolution eval protocol without files
    # (1.0 = square originals at model size).
    synthetic_orig_scale: float = 1.0
    prefetch_depth: int = 2  # double buffering
    decode_backend: str = "auto"  # auto | native | pil | synthetic


@dataclass(frozen=True)
class TrainConfig:
    epochs: int = 1
    steps_per_epoch: int = 32  # used when dataset is synthetic
    # sgd reproduces the reference recipe (SURVEY §2.11); adamw is the
    # modern fine-tuning alternative (optax.adamw, decoupled wd — momentum
    # is ignored, betas (0.9, 0.999)).
    optimizer: str = "sgd"  # sgd | adamw
    lr: float = 1e-2
    momentum: float = 0.9
    weight_decay: float = 5e-4
    # poly reproduces the reference's lr*(1-iter/max_iter)^power decay;
    # cosine anneals to 0 over max_steps; constant holds lr (all three
    # respect warmup_steps as a linear ramp).
    schedule: str = "poly"  # poly | cosine | constant
    poly_power: float = 0.9  # lr * (1 - iter/max_iter)^0.9 (SURVEY §2.11)
    warmup_steps: int = 0
    loss: str = "bce_dice"  # bce_dice | basnet_hybrid (BCE+SSIM+IoU)
    score_loss_weight: float = 1.0
    mask_loss_weight: float = 3.0
    saliency_loss_weight: float = 1.0
    box_loss_weight: float = 1.0  # roi mechanism: (1 - IoU) box regression
    # Instance mask loss applies only the top-P positive cells' dynamic
    # kernels instead of materializing all S*S candidate masks (identical
    # loss while #positives <= P; 0 restores the dense path).
    max_pos_cells: int = 64
    # The reference trains unclipped (pretrained backbone tolerates it);
    # from random init the cell-grid BCE can spike, so clip by default.
    grad_clip_norm: float = 10.0  # 0 disables
    # Run the optimizer chain on ONE flattened vector (optax.flatten).
    # Measured SLOWER on v5e (71.3 vs 67.8 ms/step bf16 batch-16): the
    # ravel/concat/split passes cost more than the per-leaf update
    # fusions they replace (XLA already overlaps those with backward).
    # Kept opt-in for runtimes where per-op overhead dominates.
    # Elementwise-identical math; opt_state LAYOUT changes with it.
    flatten_optimizer: bool = False
    # Frozen-BatchNorm fine-tuning (torch-classic recipe when starting from
    # a pretrained backbone at detection batch sizes): BN normalizes with
    # running statistics during training and running stats never update;
    # BN scale/bias stay trainable. Also removes BN's batch reduces (and
    # their backward) from the train step.
    freeze_bn: bool = False
    # Exponential moving average of the params (0 = off). Updated once per
    # optimizer step as ema = d*ema + (1-d)*params with the timm-style
    # warmup ramp d_t = min(ema_decay, (1+t)/(10+t)) so early EMA tracks
    # the fast-moving young weights instead of the random init. When on,
    # per-epoch eval and `basi eval/infer` use the EMA weights (the usual
    # reason to keep one); checkpoints carry both so resume is exact.
    ema_decay: float = 0.0
    seed: int = 0
    checkpoint_dir: str = "./ckpt"
    checkpoint_every_steps: int = 0  # 0 -> per epoch
    # Async orbax saves: save() returns after the host snapshot and the
    # write overlaps the next steps; reads/close barrier on in-flight
    # writes, so resume semantics are unchanged.
    async_checkpoint: bool = False
    # Preemption-safe training (TPU pods are routinely preempted with
    # SIGTERM): when on, train() installs a SIGTERM handler that finishes
    # the in-flight dispatch, commits a checkpoint at the current step,
    # flushes metrics, and returns cleanly — `--resume auto` then continues
    # mid-epoch from that exact step. Handler installs on the main thread
    # only (Python signal rule) and the previous handler is restored.
    save_on_preemption: bool = True
    # Multi-process runs agree on the preemption stop with a tiny psum
    # program; that fetch is a device sync (~30 ms on the axon relay), so
    # polling EVERY dispatch boundary would serialize the grouped-dispatch
    # runahead. Poll the collective roughly every this-many train steps
    # instead (preemption latency budget is seconds; 16 steps ≈ 1 s at the
    # measured 68 ms/step). Single-process polling is a free local check
    # and ignores this knob.
    stop_poll_steps: int = 16
    keep_checkpoints: int = 3
    resume: str = "auto"  # auto | none | <path>
    remat: bool = False  # jax.checkpoint the backbone to save HBM
    # Gradient accumulation: split each batch into this many micro-batches,
    # scan them inside the step (BN running stats update sequentially per
    # micro-batch, torch-style), average the micro gradients, and apply ONE
    # optimizer update. Fits a large effective batch in fixed HBM; each
    # micro-batch is loss-normalized within itself (so positives-weighted
    # normalization matches torch accumulation, not one giant batch).
    grad_accum: int = 1
    # Steps executed inside ONE jitted dispatch (lax.scan over stacked
    # batches). Measured a wash on the single-chip axon setup (async
    # dispatches already pipeline; see train/step.py make_group_step) —
    # kept for runtimes where per-program launch overhead does not
    # pipeline. Costs (steps_per_dispatch x batch) of extra uint8 input
    # HBM; log/checkpoint granularity rounds up to the group.
    steps_per_dispatch: int = 1
    log_every: int = 10


@dataclass(frozen=True)
class ParallelConfig:
    data_axis: str = "data"
    num_devices: int = 0  # 0 -> all available
    spatial_axis: str = ""  # optional H-dim sharding axis name ("" = off)
    spatial_shards: int = 1


@dataclass(frozen=True)
class InferConfig:
    batch_size: int = 8
    score_threshold: float = 0.1
    mask_threshold: float = 0.5
    nms: str = "matrix"  # matrix (gauss decay) | matrix_linear | greedy
    nms_sigma: float = 2.0
    nms_iou_threshold: float = 0.5
    pre_nms_top_k: int = 64
    output_dir: str = "./out"
    save_png: bool = False
    # Evaluate at ORIGINAL image resolution (the reference's protocol:
    # paste predictions to original size, then evaluate) instead of inside
    # the 512^2 letterbox frame. Applies to the WHOLE metric set: AP
    # matching IoU and the saliency suite (MAE/max-F/max-E/S/boundary-F)
    # are all recomputed against native-resolution GT on the paste canvas.
    # Needs original-resolution GT from the dataset
    # (FolderDataset/SyntheticDataset provide get_orig_masks).
    ap_at_original: bool = False
    # Native-GT cache dir for the original-resolution eval (data/
    # native_gt.py): per-image native GT is materialized ONCE, bit-packed,
    # instead of regenerated/re-decoded per image inside the eval loop
    # (round-4 measured that path ~100x slower than letterbox eval).
    # "auto" = <infer.output_dir>/native_gt; "" disables (per-image reads).
    native_gt_cache: str = "auto"
    # bfloat16 | float32 | int8. int8 = dynamic post-training quantization
    # (ops/quant.py): convs run s8xs8->s32 on the MXU (per-channel weight
    # scales, per-tensor dynamic activation scales, no calibration set),
    # everything else runs bf16. Checkpoints load unchanged.
    dtype: str = "bfloat16"
    # connected mechanism only: boundary-aware splitting of merged
    # components (ops/connected.py). "none" = plain labeling; "erode" =
    # erosion cores + frozen-front re-dilation (splits necked unions
    # only); "edt" = EDT-watershed (h-maxima of the exact distance
    # transform as seeds — also splits SMOOTH occlusion unions). Round-5
    # on-chip bench_accuracy (kernels ckpt, orig-res eval): none 0.181 /
    # erode 0.187 / edt 0.320 mAP -> edt is the default.
    connected_split: str = "edt"  # none | erode | edt
    # erode: erosion steps; edt: minimum seed distance (both at the /4
    # mask resolution).
    connected_erode: int = 2
    # Weighted F-measure (Margolin et al. CVPR 2014) on the eval path:
    # the exact on-device distance transform costs ~2.5 ms/img at 512^2;
    # false sheds it from the fused eval program.
    wf: bool = True
    # Test-time augmentation (quality-over-speed eval mode): "" = off,
    # "hflip" = ensemble the horizontally-flipped view of every scale.
    # Outputs are realigned analytically (mask features W-flipped back,
    # cell grid mirror-indexed, saliency flipped) and averaged in
    # probability space; selection/NMS then runs ONCE on the ensemble.
    tta: str = ""
    # Extra TTA scales ensembled alongside 1.0, as fractions of
    # model.image_size (rounded to a multiple of 32), e.g. (0.75, 1.25).
    # Each scale adds one forward pass at that resolution (x2 with hflip).
    tta_scales: tuple = ()


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    infer: InferConfig = field(default_factory=InferConfig)
    profile: bool = False
    profile_dir: str = "./profile"
    metrics_path: str = ""  # "" -> stdout only; else JSONL file
    tensorboard_dir: str = ""  # "" -> off; else TB event files (scalars)


def _replace_path(cfg: Any, dotted: str, value: str) -> Any:
    """Immutable update of ``cfg`` at a dotted path with a parsed value."""
    head, _, rest = dotted.partition(".")
    if not hasattr(cfg, head):
        raise KeyError(f"no config field {head!r} on {type(cfg).__name__}")
    cur = getattr(cfg, head)
    if rest:
        new = _replace_path(cur, rest, value)
    else:
        new = _parse_like(cur, value)
    return dataclasses.replace(cfg, **{head: new})


def _parse_like(template: Any, value: str) -> Any:
    if isinstance(template, bool):
        return value.lower() in ("1", "true", "yes", "on")
    if isinstance(template, int):
        return int(value)
    if isinstance(template, float):
        return float(value)
    if isinstance(template, tuple):
        parts = [p for p in value.replace("(", "").replace(")", "").split(",") if p]
        elem = template[0] if template else 0.0
        return tuple(_parse_like(elem, p.strip()) for p in parts)
    return value


def apply_overrides(cfg: Config, overrides: list[str]) -> Config:
    """Apply ``key.path=value`` overrides to a Config."""
    for ov in overrides:
        key, _, val = ov.partition("=")
        if not _ or not key:
            raise ValueError(f"override must be key.path=value, got {ov!r}")
        cfg = _replace_path(cfg, key.strip(), val.strip())
    return cfg


# ---------------------------------------------------------------------------
# Presets: the five driver benchmark configs (BASELINE.md / SURVEY §5.6).
# ---------------------------------------------------------------------------

def _preset_pr1_cpu_infer() -> Config:
    """Single 512x512 image: backbone forward + mask head, CPU/1-chip infer."""
    return Config(
        data=DataConfig(batch_size=1, dataset="synthetic"),
        infer=InferConfig(batch_size=1, dtype="float32"),
    )


def _preset_val_ap() -> Config:
    """Batch-8 inference over ILSO/SOC val split, AP parity check.

    stem_mode='s2d': inference does space-to-depth on the raw uint8 bytes
    at ingest (bit-exact vs conv7, same checkpoint params; measured +16%
    imgs/s on v5e). Training presets keep conv7 — the augmentation
    pipeline needs the raw 3-channel image.
    """
    return Config(
        model=ModelConfig(stem_mode="s2d"),
        data=DataConfig(batch_size=8, dataset="ilso", split="val"),
        infer=InferConfig(batch_size=8),
    )


def _preset_train_ilso_1ep() -> Config:
    """Full train loop: batch 16, 1 epoch ILSO, BCE/Dice."""
    return Config(
        data=DataConfig(batch_size=16, dataset="ilso"),
        train=TrainConfig(epochs=1, loss="bce_dice"),
    )


def _preset_train_multiscale_fused() -> Config:
    """Multi-scale train with on-device fused aug + device-side NMS/paste.

    Mixed precision (bf16 compute, f32 master weights): measured 1.48x
    step speedup on v5e vs f32 (82 vs 122 ms at batch 16, 512^2)."""
    return Config(
        model=ModelConfig(dtype="bfloat16"),
        data=DataConfig(batch_size=16, dataset="ilso", multiscale=True),
        train=TrainConfig(epochs=1),
    )


def _preset_train_v4_32_dp() -> Config:
    """Data-parallel multi-host training with overlapped host decode."""
    return Config(
        model=ModelConfig(dtype="bfloat16"),
        data=DataConfig(batch_size=16, dataset="ilso"),
        train=TrainConfig(epochs=30),
        parallel=ParallelConfig(num_devices=0),
    )


def _preset_bench_accuracy() -> Config:
    """Converged-accuracy benchmark (VERDICT r3 item 3): ONE pinned recipe
    driving all three §2.8 instance mechanisms through identical data,
    schedule and budget (tools/bench_accuracy.py runs the comparison and
    records the winner in BASELINE.md). 1,024 procedural scenes with
    non-square originals, 24 epochs, SGD + cosine + EMA, bf16 batch 16."""
    return Config(
        model=ModelConfig(dtype="bfloat16"),
        data=DataConfig(batch_size=16, dataset="synthetic",
                        synthetic_n=1024, synthetic_orig_scale=1.5),
        train=TrainConfig(
            epochs=24, optimizer="sgd", lr=0.01, schedule="cosine",
            warmup_steps=100, ema_decay=0.999, loss="bce_dice",
            checkpoint_dir="", log_every=64,
        ),
        # Per-epoch eval stays at the letterbox frame for speed; the final
        # eval (the recorded numbers) runs ap_at_original + the full SOD
        # suite — tools/bench_accuracy.py flips the flag.
        infer=InferConfig(batch_size=16),
    )


PRESETS = {
    "pr1_cpu_infer": _preset_pr1_cpu_infer,
    "val_v4-8_ap": _preset_val_ap,
    "train_ilso_1ep": _preset_train_ilso_1ep,
    "train_multiscale_fused": _preset_train_multiscale_fused,
    "train_v4-32_dp": _preset_train_v4_32_dp,
    "bench_accuracy": _preset_bench_accuracy,
}


def get_config(preset: str = "", overrides: list[str] | None = None) -> Config:
    cfg = PRESETS[preset]() if preset else Config()
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    if cfg.model.image_size != cfg.data.image_size:
        # The ingest letterbox target and the model resolution are separate
        # knobs (SURVEY §2.2 keeps the reference's config shape) but MUST
        # agree, or eval's full-resolution matching dies with an opaque
        # dot_general shape error far from the cause (seen driving the CLI
        # with only model.image_size overridden).
        raise ValueError(
            f"model.image_size ({cfg.model.image_size}) != data.image_size "
            f"({cfg.data.image_size}): override both together "
            "(--set model.image_size=N --set data.image_size=N)")
    return cfg

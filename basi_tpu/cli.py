"""CLI entrypoints mirroring the reference's two public scripts (SURVEY §2.1).

  basi train  --preset train_ilso_1ep  [--set key.path=value ...]
  basi infer  --preset val_v4-8_ap --checkpoint ./ckpt [--set ...]
  basi eval   (alias of infer, AP only)
  basi bench  --mode infer|train      (single-line JSON, BASELINE metric)

``--set`` takes dotted-path overrides (e.g. ``--set data.batch_size=8``),
replacing the reference's edit-the-Config-class-in-the-file workflow.
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--preset", default="", help="named config preset")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY.PATH=VALUE", help="config override")
    p.add_argument("--profile", action="store_true")
    p.add_argument("--metrics", default="", help="JSONL metrics output path")


def _build_cfg(args):
    import dataclasses

    from basi_tpu.config import get_config

    cfg = get_config(args.preset, args.overrides)
    if args.profile:
        cfg = dataclasses.replace(cfg, profile=True)
    if args.metrics:
        cfg = dataclasses.replace(cfg, metrics_path=args.metrics)
    return cfg


def cmd_train(args) -> int:
    from basi_tpu.parallel.distributed import maybe_initialize
    from basi_tpu.train.loop import Trainer

    maybe_initialize()
    cfg = _build_cfg(args)
    trainer = Trainer(cfg)
    try:
        metrics = trainer.train()
    finally:
        trainer.close()
    print(json.dumps({"final": metrics}))
    return 0


def cmd_infer(args) -> int:
    from basi_tpu.infer import Inferencer
    from basi_tpu.utils.logging import MetricLogger

    cfg = _build_cfg(args)
    inf = Inferencer(cfg, checkpoint=args.checkpoint)
    logger = MetricLogger(cfg.metrics_path)
    metrics = inf.evaluate(max_batches=args.max_batches, logger=logger,
                           results_path=args.results)
    print(json.dumps(metrics))
    return 0


def cmd_predict(args) -> int:
    """GT-free prediction (the reference MyTest UX): raw image files or
    directories in, one labeled-instance mask PNG per image out."""
    import os

    from basi_tpu.data.datasets import FolderDataset
    from basi_tpu.infer import Inferencer

    cfg = _build_cfg(args)
    paths: list[str] = []
    for p in args.images:
        if os.path.isdir(p):
            paths.extend(sorted(
                os.path.join(p, f) for f in os.listdir(p)
                if f.lower().endswith(FolderDataset.IMG_EXTS)))
        elif os.path.isfile(p):
            paths.append(p)
        else:
            raise FileNotFoundError(f"no such image or directory: {p}")
    if not paths:
        raise SystemExit(f"no images found under {args.images}")
    inf = Inferencer(cfg, checkpoint=args.checkpoint)
    out_dir = args.out or cfg.infer.output_dir
    results = inf.predict_paths(paths, out_dir=out_dir,
                                results_path=args.results)
    print(json.dumps({"images": len(results), "out": out_dir,
                      "results": results}))
    return 0


def cmd_export(args) -> int:
    """Convert a Trainer checkpoint to a bare params export for serving,
    (``--torch out.pth``) to a torch state_dict — the inverse of
    ``basi import``, so TPU-trained weights load back into a torch
    BASINet for independent verification — or (``--aot out.basiaot``) to
    a self-contained jax.export AOT serving artifact (convert/aot.py)."""
    import dataclasses

    from basi_tpu.infer import Inferencer
    from basi_tpu.utils.checkpoint import export_params

    cfg = _build_cfg(args)
    if args.aot:
        # The AOT artifact IS the serving program: it bakes weights at the
        # configured infer.dtype (bf16 default — the deployment precision),
        # unlike the orbax/torch exports below which must stay f32 masters.
        if not args.checkpoint:
            # Without a checkpoint the Inferencer falls back to random
            # init — and the artifact ships alone, so a random-weights
            # export is undetectable downstream.
            raise SystemExit("basi export --aot requires --checkpoint "
                             "(the artifact bakes the weights in; exporting "
                             "random init would be silent)")
        from basi_tpu.convert.aot import save_serving

        plats = tuple(p for p in args.platforms.split(",") if p)
        meta = save_serving(
            args.aot, cfg, checkpoint=args.checkpoint,
            batch_size=args.aot_batch, platforms=plats or None)
        print(json.dumps({"exported_aot": args.aot, **{
            k: meta[k] for k in ("batch_size", "model_size", "platforms",
                                 "infer_dtype", "instance_mechanism")}}))
        return 0
    # Export must carry full-precision weights: Inferencer casts params to
    # infer.dtype (default bfloat16) in place for its compute path, which
    # would silently bake a precision-degraded checkpoint. Force f32 here;
    # serving re-casts to its own compute dtype at load.
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, dtype="float32"))
    if not args.torch and not args.out:
        raise SystemExit("export needs --out (orbax), --torch (.pth) "
                         "or --aot (.basiaot)")
    if args.torch:
        from basi_tpu.models.resnet import STAGE_SIZES

        if (cfg.model.backbone not in STAGE_SIZES
                and not cfg.model.backbone.startswith("vgg")):
            raise ValueError(
                f"torch export unsupported for backbone "
                f"{cfg.model.backbone!r} (ResNet family or vgg16/19, "
                f"like import)")
    inf = Inferencer(cfg, checkpoint=args.checkpoint)
    if args.torch:
        import jax
        import numpy as np
        import torch

        from basi_tpu.convert.torch_export import export_basinet
        from basi_tpu.models.resnet import STAGE_SIZES

        params = jax.tree.map(lambda x: np.asarray(jax.device_get(x)),
                              inf.params)
        stats = jax.tree.map(lambda x: np.asarray(jax.device_get(x)),
                             inf.batch_stats)
        sd = export_basinet(params, stats,
                            STAGE_SIZES.get(cfg.model.backbone, (3, 4, 6, 3)),
                            backbone=cfg.model.backbone)
        torch.save({k: torch.from_numpy(np.asarray(v).copy())
                    for k, v in sd.items()}, args.torch)
        print(json.dumps({"exported_torch": args.torch,
                          "tensors": len(sd)}))
        return 0
    export_params(args.out, inf.params, inf.batch_stats)
    print(json.dumps({"exported": args.out}))
    return 0


def cmd_import(args) -> int:
    """torch ``.pth`` checkpoint -> orbax params export (SURVEY §5.4: the
    one-way importer that lets reference-released checkpoints run here).

    ``--what full``: a complete reference-style BASINet state_dict.
    ``--what backbone``: a torchvision(-style) ResNet-50 state_dict; the
    backbone params/stats are grafted onto a fresh model init (the standard
    "pretrained backbone, random heads" training start).
    """
    from basi_tpu.utils.checkpoint import export_params

    from basi_tpu.models.resnet import STAGE_SIZES

    cfg = _build_cfg(args)
    if (args.what == "full"
            and getattr(cfg.model, "instance_mechanism", "kernels") == "roi"):
        # The reference-style state_dict maps the kernel-mechanism heads;
        # a roi model has roi_box/roi_mask heads with no torch counterpart.
        raise ValueError(
            "full import unsupported for model.instance_mechanism='roi' "
            "(reference checkpoints carry kernel-mechanism heads); import "
            "with --what backbone instead")
    if (args.what == "full" and cfg.model.backbone not in STAGE_SIZES
            and cfg.model.backbone not in ("vgg16", "vgg19")):
        # Fail BEFORE loading the torch file: import_basinet only maps
        # ResNet-family and vgg state_dicts; letting an unknown backbone
        # fall through used to die with an opaque missing-key error deep
        # in the converter.
        raise ValueError(
            f"full import unsupported for backbone {cfg.model.backbone!r} "
            f"(ResNet family or vgg16/19 state_dicts only)")
    sd = _load_torch_state_dict(args.torch)
    stage_sizes = STAGE_SIZES.get(cfg.model.backbone, (3, 4, 6, 3))
    if args.what == "full":
        from basi_tpu.convert.full_import import import_basinet

        has_refine = any(k.startswith("refine.") for k in sd)
        if getattr(cfg.model, "refine", False) and not has_refine:
            # Fail with the cause, not a missing-subtree error later when
            # the refine=true model tries to load the exported params.
            raise ValueError(
                "model.refine=true but the torch checkpoint has no "
                "refine.* keys — import with model.refine=false or use a "
                "refine-trained checkpoint")
        params, stats = import_basinet(sd, stage_sizes,
                                       backbone=cfg.model.backbone)
    else:
        from basi_tpu.convert.torch_import import (
            import_resnet50_backbone,
            import_vgg16_backbone,
            merge_backbone,
        )
        from basi_tpu.models.basi import create_model, init_model

        model = create_model(cfg.model)
        params, stats = init_model(model, cfg.model.image_size)
        if cfg.model.backbone in ("vgg16", "vgg19"):
            from basi_tpu.models.vgg import VGG_DEPTHS

            bb_params, bb_stats = import_vgg16_backbone(
                sd, VGG_DEPTHS[cfg.model.backbone])
        elif cfg.model.backbone in STAGE_SIZES:
            bb_params, bb_stats = import_resnet50_backbone(sd, stage_sizes)
        else:
            raise ValueError(
                f"backbone import unsupported for {cfg.model.backbone!r}")
        params, stats = merge_backbone(params, stats, bb_params, bb_stats)

    _check_against_template(cfg, params, stats)
    export_params(args.out, params, stats)
    print(json.dumps({"imported": args.torch, "exported": args.out,
                      "what": args.what}))
    return 0


def _load_torch_state_dict(path: str) -> dict:
    import numpy as np
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v) for k, v in sd.items()}


def _check_against_template(cfg, params, stats):
    """Fail fast with a readable diff if the converted trees don't match the
    model structure — silent mismatches surface only as AP drift
    (SURVEY §7 hard part #5)."""
    import jax

    from basi_tpu.models.basi import create_model, init_model

    model = create_model(cfg.model)
    tmpl_p, tmpl_b = init_model(model, cfg.model.image_size)
    for name, got, want in (("params", params, tmpl_p),
                            ("batch_stats", stats, tmpl_b)):
        got_shapes = {jax.tree_util.keystr(k): v.shape for k, v in
                      jax.tree_util.tree_flatten_with_path(got)[0]}
        want_shapes = {jax.tree_util.keystr(k): v.shape for k, v in
                       jax.tree_util.tree_flatten_with_path(want)[0]}
        if got_shapes != want_shapes:
            missing = sorted(set(want_shapes) - set(got_shapes))
            extra = sorted(set(got_shapes) - set(want_shapes))
            wrong = sorted(k for k in set(got_shapes) & set(want_shapes)
                           if got_shapes[k] != want_shapes[k])
            raise ValueError(
                f"converted {name} do not match the model: "
                f"missing={missing[:8]} extra={extra[:8]} "
                f"shape-mismatch={[(k, got_shapes[k], want_shapes[k]) for k in wrong[:8]]}")


def cmd_serve(args) -> int:
    """HTTP serving endpoint over the batched predictor (server.py)."""
    from basi_tpu.server import serve_forever

    cfg = _build_cfg(args)
    return serve_forever(cfg, checkpoint=args.checkpoint,
                         host=args.host, port=args.port,
                         aot_path=args.aot)


def cmd_bench(args) -> int:
    from basi_tpu.benchmark import run  # packaged: works installed too

    return run(mode=args.mode, overrides=getattr(args, "overrides", []))


def cmd_pack(args) -> int:
    """Decode the configured dataset once into a packed shard cache
    (data/shards.py) — subsequent `--set data.dataset=shards
    data.root=<out>` runs stream it at mmap speed."""
    from basi_tpu.data.datasets import make_dataset
    from basi_tpu.data.shards import pack_dataset
    from basi_tpu.utils.tools import Tools

    cfg = _build_cfg(args)
    ds = make_dataset(cfg.data, split=args.split or cfg.data.split)
    pack_dataset(ds, args.out, shard_size=args.shard_size,
                 batch_size=cfg.data.batch_size, log=Tools.print)
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="basi", description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_train = sub.add_parser("train", help="train a BASI model")
    _add_common(p_train)
    p_train.set_defaults(fn=cmd_train)

    for name in ("infer", "eval"):
        p_inf = sub.add_parser(name, help="run inference / eval AP")
        _add_common(p_inf)
        p_inf.add_argument("--checkpoint", default="", help="orbax params dir")
        p_inf.add_argument("--max-batches", type=int, default=0)
        p_inf.add_argument("--results", default="",
                           help="also write a COCO-format results JSON "
                                "(true annotation ids on COCO datasets — "
                                "drops into pycocotools COCOeval)")
        p_inf.set_defaults(fn=cmd_infer)

    p_pred = sub.add_parser(
        "predict", help="images in, instance-mask PNGs out (no labels)")
    _add_common(p_pred)
    p_pred.add_argument("--images", nargs="+", required=True,
                        help="image files and/or directories")
    # Required: predicting from randomly-initialized weights writes
    # plausible-looking garbage PNGs with exit code 0 — fail fast instead.
    p_pred.add_argument("--checkpoint", required=True,
                        help="orbax params dir")
    p_pred.add_argument("--out", default="", help="PNG output dir")
    p_pred.add_argument("--results", default="",
                        help="also write a COCO-format results JSON "
                             "(compressed-RLE segmentations at original "
                             "resolution, pycocotools-loadable)")
    p_pred.set_defaults(fn=cmd_predict)

    p_exp = sub.add_parser(
        "export", help="trainer ckpt -> serving params (or torch .pth)")
    _add_common(p_exp)
    p_exp.add_argument("--checkpoint", required=True)
    p_exp.add_argument("--out", default="",
                       help="orbax params export dir")
    p_exp.add_argument("--torch", default="",
                       help="write a torch state_dict .pth instead "
                            "(inverse of `basi import`)")
    p_exp.add_argument("--aot", default="",
                       help="write a self-contained jax.export AOT serving "
                            "artifact (.basiaot): full inference program + "
                            "weights, loadable with jax alone")
    p_exp.add_argument("--aot-batch", type=int, default=0,
                       help="serving batch size baked into the AOT program "
                            "(default: infer.batch_size)")
    p_exp.add_argument("--platforms", default="",
                       help="comma-separated AOT lowering targets, e.g. "
                            "tpu,cpu (default: current backend)")
    p_exp.set_defaults(fn=cmd_export)

    p_imp = sub.add_parser(
        "import", help="torch .pth -> orbax params export")
    _add_common(p_imp)
    p_imp.add_argument("--torch", required=True, help="torch .pth path")
    p_imp.add_argument("--out", required=True, help="orbax export dir")
    p_imp.add_argument("--what", default="full",
                       choices=["full", "backbone"])
    p_imp.set_defaults(fn=cmd_import)

    p_srv = sub.add_parser("serve", help="HTTP serving endpoint")
    _add_common(p_srv)
    p_srv.add_argument("--checkpoint", default="", help="orbax params dir")
    p_srv.add_argument("--aot", default="",
                       help="serve a `basi export --aot` artifact instead "
                            "of a checkpoint")
    p_srv.add_argument("--host", default="127.0.0.1")
    p_srv.add_argument("--port", type=int, default=8000)
    p_srv.set_defaults(fn=cmd_serve)

    p_bench = sub.add_parser("bench", help="run the benchmark")
    p_bench.add_argument("--mode", default="infer", choices=["infer", "train", "e2e"])
    p_bench.add_argument("--set", dest="overrides", action="append",
                         default=[], metavar="KEY.PATH=VALUE",
                         help="config override (train/e2e modes)")
    p_bench.set_defaults(fn=cmd_bench)

    p_pack = sub.add_parser(
        "pack", help="decode the configured dataset once into a packed "
                     "shard cache (then: --set data.dataset=shards "
                     "data.root=<out>)")
    _add_common(p_pack)
    p_pack.add_argument("--out", required=True, help="output shard dir")
    p_pack.add_argument("--split", default="",
                        help="dataset split to pack (default: config's)")
    p_pack.add_argument("--shard-size", type=int, default=1024,
                        help="records per shard file")
    p_pack.set_defaults(fn=cmd_pack)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

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
    metrics = trainer.train()
    print(json.dumps({"final": metrics}))
    return 0


def cmd_infer(args) -> int:
    from basi_tpu.infer import Inferencer
    from basi_tpu.utils.logging import MetricLogger

    cfg = _build_cfg(args)
    inf = Inferencer(cfg, checkpoint=args.checkpoint)
    logger = MetricLogger(cfg.metrics_path)
    metrics = inf.evaluate(max_batches=args.max_batches, logger=logger)
    print(json.dumps(metrics))
    return 0


def cmd_export(args) -> int:
    """Convert a Trainer checkpoint to a bare params export for serving."""
    import dataclasses

    from basi_tpu.infer import Inferencer
    from basi_tpu.utils.checkpoint import export_params

    cfg = _build_cfg(args)
    # Export must carry full-precision weights: Inferencer casts params to
    # infer.dtype (default bfloat16) in place for its compute path, which
    # would silently bake a precision-degraded checkpoint. Force f32 here;
    # serving re-casts to its own compute dtype at load.
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, dtype="float32"))
    inf = Inferencer(cfg, checkpoint=args.checkpoint)
    export_params(args.out, inf.params, inf.batch_stats)
    print(json.dumps({"exported": args.out}))
    return 0


def cmd_bench(args) -> int:
    import bench as bench_mod  # repo-root bench.py

    return bench_mod.run(mode=args.mode)


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
        p_inf.set_defaults(fn=cmd_infer)

    p_exp = sub.add_parser("export", help="trainer ckpt -> serving params")
    _add_common(p_exp)
    p_exp.add_argument("--checkpoint", required=True)
    p_exp.add_argument("--out", required=True)
    p_exp.set_defaults(fn=cmd_export)

    p_bench = sub.add_parser("bench", help="run the benchmark")
    p_bench.add_argument("--mode", default="infer", choices=["infer", "train"])
    p_bench.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

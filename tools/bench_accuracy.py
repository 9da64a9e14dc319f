"""Converged-accuracy benchmark: the three §2.8 instance mechanisms under
ONE pinned recipe (VERDICT r3 item 3).

Runs the ``bench_accuracy`` preset (1,024 synthetic scenes with non-square
originals, 24 epochs, SGD + cosine + EMA, bf16 batch 16) through:

  * kernels    — cell-grid dynamic-kernel head (trains its own heads)
  * roi        — S4Net-style proposal grid + ROI mask FCN (own heads)
  * connected  — connected components of the saliency map; postproc-only,
                 so it EVALUATES the kernels checkpoint (its training path
                 IS the kernels training path — documented, not hidden)

and records the full metric suite (AP/AR ladder + SOD measures) at
ORIGINAL resolution for each, plus the flagship pick by mAP.

Usage (on the TPU host):
    python tools/bench_accuracy.py --out bench_accuracy.json \
        [--epochs N] [--synthetic-n N] [--ckpt-root DIR]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_training(preset_overrides: list[str], ckpt_dir: str) -> dict:
    from basi_tpu.config import get_config
    from basi_tpu.train.loop import Trainer

    cfg = get_config("bench_accuracy",
                     preset_overrides + [f"train.checkpoint_dir={ckpt_dir}"])
    t0 = time.perf_counter()
    tr = Trainer(cfg)
    metrics = tr.train()
    tr.close()
    # numbers.Number catches numpy scalars too (np.float32 registers as
    # Number); a plain (int, float) isinstance dropped every device-fetched
    # metric and left this dict empty (VERDICT r4 item 9).
    import numbers

    return {"train_wall_s": round(time.perf_counter() - t0, 1),
            "last_train_metrics": {k: float(v) for k, v in metrics.items()
                                   if isinstance(v, numbers.Number)
                                   and not isinstance(v, bool)}}


def run_final_eval(mechanism: str, ckpt_dir: str,
                   overrides: list[str] | None = None) -> dict:
    """Original-resolution eval with the FULL suite from the checkpoint
    (EMA weights preferred by restore_weights — same rule as training)."""
    from basi_tpu.config import get_config
    from basi_tpu.data.datasets import make_dataset
    from basi_tpu.infer import Inferencer

    cfg = get_config("bench_accuracy",
                     (overrides or []) +
                     [f"model.instance_mechanism={mechanism}"])
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, ap_at_original=True))
    inf = Inferencer(cfg, checkpoint=ckpt_dir)
    ds = make_dataset(cfg.data, split="val")
    t0 = time.perf_counter()
    metrics = inf.evaluate(ds)
    metrics["eval_wall_s"] = round(time.perf_counter() - t0, 1)
    return metrics


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_accuracy.json")
    ap.add_argument("--ckpt-root", default="./ckpt_bench_accuracy")
    ap.add_argument("--epochs", type=int, default=0,
                    help="override preset epochs (smoke runs)")
    ap.add_argument("--synthetic-n", type=int, default=0)
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse existing checkpoints, eval only")
    ap.add_argument("--seed", type=int, default=0,
                    help="train.seed (init + batch order + aug); run a "
                         "second seed so the flagship call rests on more "
                         "than one draw (VERDICT r4 item 9)")
    ap.add_argument("--mechanisms", default="kernels,roi,connected",
                    help="comma list of mechanisms to run")
    ap.add_argument("--eval-overrides", default="",
                    help="comma list of extra dotted overrides applied to "
                         "the FINAL evals only (e.g. infer.dtype=int8)")
    args = ap.parse_args()

    overrides = []
    if args.epochs:
        overrides.append(f"train.epochs={args.epochs}")
    if args.synthetic_n:
        overrides.append(f"data.synthetic_n={args.synthetic_n}")
    if args.seed:
        overrides.append(f"train.seed={args.seed}")
    eval_overrides = [o for o in args.eval_overrides.split(",") if o]
    mechs = [m for m in args.mechanisms.split(",") if m]

    # Decode-once shard cache (SURVEY §7 hard part 4): procedural scene
    # generation runs at ~4 imgs/s on this 1-core host — two orders below
    # the chip's appetite — so TRAINING streams from a `basi pack`-style
    # cache (~1,160 imgs/s host-side). The final original-resolution eval
    # reads the raw synthetic val split (native GT via get_orig_masks).
    from basi_tpu.config import get_config
    from basi_tpu.data.datasets import make_dataset
    from basi_tpu.data.shards import pack_dataset

    shard_root = os.path.join(args.ckpt_root, "shards")
    pack_cfg = get_config("bench_accuracy", overrides)
    for split in ("train", "val"):
        out_dir = os.path.join(shard_root, split)
        if not os.path.isdir(out_dir):
            print(f"[bench_accuracy] packing {split} shards ...", flush=True)
            pack_dataset(make_dataset(pack_cfg.data, split=split), out_dir,
                         batch_size=pack_cfg.data.batch_size)
    train_overrides = overrides + [
        "data.dataset=shards", f"data.root={shard_root}"]

    results: dict = {"recipe": "bench_accuracy", "overrides": overrides,
                     "seed": args.seed,
                     "eval_overrides": eval_overrides}
    # kernels and roi train their own heads; connected reuses the kernels
    # checkpoint (it is a postproc-only mechanism by construction).
    for mech in [m for m in mechs if m in ("kernels", "roi")]:
        ckpt = os.path.join(args.ckpt_root, mech)
        rec: dict = {}
        if not args.skip_train:
            print(f"[bench_accuracy] training {mech} ...", flush=True)
            rec.update(run_training(
                train_overrides + [f"model.instance_mechanism={mech}"],
                ckpt))
        print(f"[bench_accuracy] final eval {mech} ...", flush=True)
        rec["final_eval"] = run_final_eval(mech, ckpt,
                                           overrides + eval_overrides)
        results[mech] = rec
    if "connected" in mechs:
        print("[bench_accuracy] final eval connected (kernels ckpt) ...",
              flush=True)
        results["connected"] = {
            "trained_as": "kernels",
            "final_eval": run_final_eval(
                "connected", os.path.join(args.ckpt_root, "kernels"),
                overrides + eval_overrides),
        }

    by_map = {m: results[m]["final_eval"].get("mAP", 0.0)
              for m in mechs if m in results}
    results["flagship"] = max(by_map, key=by_map.get)
    results["mAP"] = by_map
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"flagship": results["flagship"], "mAP": by_map}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

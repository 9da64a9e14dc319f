"""Profile the train or inference program on the attached TPU and print
the top ops by device time (xplane fusion-level view).

Usage:
  python tools/profile_step.py --mode train [--set model.dtype=bfloat16 ...]
  python tools/profile_step.py --mode infer [--top 40]

The tensorboard-plugin converter in this image is version-broken (round-2
note); the xplane proto parses fine via
``tensorflow.tsl.profiler.protobuf.xplane_pb2``, which is what this uses.
Device time is summed per op-name over the TPU device plane's op lines;
the step count divides it into per-step ms.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import tempfile

# Runnable as `python tools/profile_step.py` from anywhere: sys.path[0] is
# tools/, so put the repo root ahead of it for the basi_tpu import.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _trace_train(cfg, steps: int, trace_dir: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from basi_tpu.data.transforms import space_to_depth_host, wants_s2d_feed
    from basi_tpu.models.basi import create_model
    from basi_tpu.train.state import create_train_state, make_optimizer
    from basi_tpu.train.step import make_train_step

    model = create_model(cfg.model)
    tx, _ = make_optimizer(cfg.train, max_steps=1000)
    state = create_train_state(model, cfg.model, cfg.train, max_steps=1000)
    step = make_train_step(model, tx, cfg.train, cfg.data, mesh=None,
                           donate=False)
    rng = np.random.RandomState(0)
    bs, size, m = (cfg.data.batch_size, cfg.model.image_size,
                   cfg.data.max_instances)
    raw = (rng.rand(steps, bs, size, size, 3) * 255).astype(np.uint8)
    if wants_s2d_feed(cfg.model) and not cfg.data.multiscale:
        raw = np.stack([space_to_depth_host(b) for b in raw])
    gt = (rng.rand(steps, bs, m, size, size) > 0.8).astype(np.uint8)
    if getattr(cfg.data, "pack_masks", False):
        from basi_tpu.data.transforms import pack_masks_host

        gt = pack_masks_host(gt)  # match the product feed (data.pack_masks)
    batches = {
        "image": jnp.asarray(raw),
        "masks": jnp.asarray(gt),
        "valid": jnp.asarray(np.ones((steps, bs, m), np.uint8)),
    }

    import functools

    @jax.jit
    def run_many(state, batches):
        def body(st, b):
            st, metrics = step.body(st, b)
            return st, metrics["loss"]
        return jax.lax.scan(body, state, batches)

    _, losses = run_many(state, batches)
    float(jax.device_get(losses[-1]))  # compile + warm
    with jax.profiler.trace(trace_dir):
        _, losses = run_many(state, batches)
        float(jax.device_get(jnp.sum(losses)))
    return steps


def _trace_infer(cfg, steps: int, trace_dir: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from basi_tpu.data.transforms import space_to_depth_host, wants_s2d_feed
    from basi_tpu.infer import Inferencer

    inf = Inferencer(cfg)
    rng = np.random.RandomState(0)
    bs, size = cfg.infer.batch_size, cfg.model.image_size
    raw = (rng.rand(steps, bs, size, size, 3) * 255).astype(np.uint8)
    if wants_s2d_feed(cfg.model):
        raw = np.stack([space_to_depth_host(b) for b in raw])
    batches = jnp.asarray(raw)

    @jax.jit
    def run_many(params, batch_stats, all_batches):
        def body(carry, batch):
            masks, scores, _ = inf.run_fn(params, batch_stats, batch)
            return carry + jnp.sum(scores), ()
        total, _ = jax.lax.scan(body, jnp.float32(0.0), all_batches)
        return total

    float(jax.device_get(run_many(inf.params, inf.batch_stats, batches)))
    with jax.profiler.trace(trace_dir):
        float(jax.device_get(run_many(inf.params, inf.batch_stats, batches)))
    return steps


def summarize(trace_dir: str, steps: int, top: int = 30):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        space.ParseFromString(f.read())

    rows = []
    for plane in space.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        meta = plane.event_metadata
        # Events on ONE line are serialized; different lines overlap (compute
        # vs async copy engines). Summing across lines double-counts copy
        # windows that hide under compute, so report each line separately.
        for line in plane.lines:
            lname = line.name.lower()
            # op-level lines only; skip step/module aggregates
            if "step" in lname or "module" in lname:
                continue
            per_op = collections.Counter()
            occur = collections.Counter()
            total_ps = 0
            for ev in line.events:
                name = meta[ev.metadata_id].name
                per_op[name] += ev.duration_ps
                occur[name] += 1
                total_ps += ev.duration_ps
            if not per_op:
                continue
            print(f"\n== plane {plane.name} / line '{line.name}': "
                  f"{total_ps / 1e9 / steps:.3f} ms/step over {steps} steps "
                  f"({len(line.events)} events) ==")
            for name, ps in per_op.most_common(top):
                print(f"  {ps / 1e9 / steps:8.4f} ms/step  x{occur[name]:<5d} "
                      f"{name[:110]}")
            rows.append((f"{plane.name}/{line.name}", total_ps))
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="train", choices=["train", "infer"])
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--set", dest="overrides", action="append", default=[])
    p.add_argument("--keep", default="", help="keep trace under this dir")
    args = p.parse_args()

    from basi_tpu.config import get_config

    preset = "train_ilso_1ep" if args.mode == "train" else "val_v4-8_ap"
    over = list(args.overrides)
    if args.mode == "infer" and not any(o.startswith("data.dataset")
                                        for o in over):
        over.append("data.dataset=synthetic")
    cfg = get_config(preset, over)

    trace_dir = args.keep or tempfile.mkdtemp(prefix="basi_xplane_")
    steps = (_trace_train if args.mode == "train" else _trace_infer)(
        cfg, args.steps, trace_dir)
    summarize(trace_dir, steps, args.top)
    if not args.keep:
        import shutil

        shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

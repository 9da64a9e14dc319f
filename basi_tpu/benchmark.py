"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline (BASELINE.md): 512x512 images/sec/chip for batched inference
through the full pipeline — normalize -> BASINet forward -> on-device
instance selection (matrix NMS) — in bf16, batch 8, steady state.
``vs_baseline`` is measured / 1000 (the >=1k imgs/s/chip target).

  python bench.py            # inference benchmark (headline)
  python bench.py --mode train   # train-step benchmark (tracked metric)
"""

from __future__ import annotations

import argparse
import json
import time


def _bench_infer(batch_size: int = 8, iters: int = 256, warmup: int = 5,
                 extra_overrides: list | None = None) -> dict:
    """``extra_overrides`` is for experimentation from Python (e.g. the
    int8 path); the CLI keeps the headline config pinned (see run())."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from basi_tpu.config import get_config
    from basi_tpu.infer import Inferencer

    cfg = get_config(
        "val_v4-8_ap",
        [f"infer.batch_size={batch_size}", "data.dataset=synthetic",
         *(extra_overrides or [])],
    )
    inf = Inferencer(cfg)
    rng = np.random.RandomState(0)
    size = cfg.model.image_size

    # Measurement methodology (both quirks measured on this setup):
    #  * block_until_ready is unreliable on the axon PJRT tunnel — fetch a
    #    scalar via device_get to force completion.
    #  * EVERY program dispatch pays a ~25-30 ms relay round trip, dwarfing
    #    the ~5 ms of device compute per batch. Sustained throughput (the
    #    production serving pattern) therefore scans K batches inside ONE
    #    program so the round trip amortizes to noise. Measured on v5e:
    #    K=32 still paid ~0.9 ms/batch of relay tax (1111 imgs/s); K=64 ->
    #    1187, K=128 -> 1238, K=256 -> 1261 (diminishing; device-only
    #    asymptote ~1280).
    k = iters
    raw = (rng.rand(k, batch_size, size, size, 3) * 255).astype(np.uint8)
    from basi_tpu.data.transforms import space_to_depth_host, wants_s2d_feed

    if wants_s2d_feed(cfg.model):
        # Feed in the stem's native pre-packed s2d format (the data
        # pipeline's feed layout for s2d models): same bytes, arranged on
        # the host, so the device program pays zero reorder copies.
        raw = np.stack([space_to_depth_host(b) for b in raw])
    batches = jnp.asarray(raw)

    @jax.jit
    def run_many(params, batch_stats, all_batches):
        def body(carry, batch):
            masks, scores, _ = inf.run_fn(params, batch_stats, batch)
            s = jnp.sum(masks) + jnp.sum(scores)
            return carry + s, s
        total, _ = jax.lax.scan(body, jnp.float32(0.0), all_batches)
        return total

    float(jax.device_get(run_many(inf.params, inf.batch_stats, batches)))
    dts = []
    for _ in range(4):  # best-of-4: the relay adds ±5-10% run-to-run noise
        t0 = time.perf_counter()
        float(jax.device_get(run_many(inf.params, inf.batch_stats, batches)))
        dts.append(time.perf_counter() - t0)
    dt = min(dts)

    # Methodology pin: a refactor that quietly shrinks the scan width (or
    # reverts to per-dispatch timing) would re-pay the ~25-30 ms relay
    # round trip per batch and read ~25% low. Measure one single-batch
    # dispatch and require it to be <= 10% of a full timed run — i.e. the
    # scan must amortize the dispatch overhead to noise (t_single/k per
    # batch against dt/k derived ms/batch).
    m0, s0, _ = inf.predict_batch(batches[0])
    float(jax.device_get(jnp.sum(s0)))  # compile + warm the 1-batch program
    singles = []
    for _ in range(3):
        t0 = time.perf_counter()
        m0, s0, _ = inf.predict_batch(batches[0])
        float(jax.device_get(jnp.sum(s0)))
        singles.append(time.perf_counter() - t0)
    t_single = min(singles)
    if t_single > 0.10 * dt:
        raise RuntimeError(
            f"bench methodology violated: single-dispatch time "
            f"{t_single * 1e3:.1f} ms is {t_single / dt:.1%} of the "
            f"{k}-batch scan ({dt * 1e3:.1f} ms) — per-dispatch overhead "
            f"is no longer amortized (scan width too small?)")

    imgs_per_s = batch_size * k / dt
    size = cfg.model.image_size
    return {
        "metric": (f"{size}x{size} images/sec/chip (infer, "
                   f"{cfg.infer.dtype}, batch {batch_size}, fwd+NMS)"),
        "value": round(imgs_per_s, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_s / 1000.0, 3),
    }


def _bench_train(batch_size: int = 16, iters: int = 24, warmup: int = 3,
                 extra_overrides: list | None = None) -> dict:
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from basi_tpu.config import get_config
    from basi_tpu.models.basi import create_model
    from basi_tpu.train.state import create_train_state, make_optimizer
    from basi_tpu.train.step import make_train_step

    # The function default is a BASE override so --set can change it; read
    # the final values back from cfg (a half-applied --set would silently
    # measure a different configuration than requested).
    cfg = get_config("train_ilso_1ep", [f"data.batch_size={batch_size}",
                                        *(extra_overrides or [])])
    batch_size = cfg.data.batch_size
    model = create_model(cfg.model)
    tx, _ = make_optimizer(cfg.train, max_steps=1000)
    state = create_train_state(model, cfg.model, cfg.train, max_steps=1000)
    step = make_train_step(model, tx, cfg.train, cfg.data, mesh=None,
                           donate=False)

    rng = np.random.RandomState(0)
    size = cfg.model.image_size
    m = cfg.data.max_instances
    # DISTINCT batches threaded through the scan as xs: a constant closure
    # batch would let XLA hoist the loop-invariant GT prep (mask downsample,
    # instance stats) out of the loop and understate the real per-step cost.
    # This matches the product path exactly (train.steps_per_dispatch runs
    # the same stacked-batch scan).
    raw = (rng.rand(iters, batch_size, size, size, 3) * 255).astype(np.uint8)
    from basi_tpu.data.transforms import space_to_depth_host, wants_s2d_feed

    if wants_s2d_feed(cfg.model) and not cfg.data.multiscale:
        # Same host-packed s2d feed the Trainer's DeviceFeed ships
        # (pack_s2d): zero device-side reorder copies.
        raw = np.stack([space_to_depth_host(b) for b in raw])
    gt = (rng.rand(iters, batch_size, m, size, size) > 0.8).astype(np.uint8)
    if getattr(cfg.data, "pack_masks", False):
        # Same bit-packed GT feed the Trainer's DeviceFeed ships: the step
        # unpacks on-device, so the bench must include that (tiny) cost —
        # and the stacked-batch HBM drops 8x.
        from basi_tpu.data.transforms import pack_masks_host

        gt = pack_masks_host(gt)
    batches = {
        "image": jnp.asarray(raw),
        "masks": jnp.asarray(gt),
        "valid": jnp.asarray(np.ones((iters, batch_size, m), np.uint8)),
    }
    # Scan ``iters`` steps inside one program (see _bench_infer: the relay
    # round trip is ~25-30 ms per dispatch, so per-call timing measures the
    # tunnel, not the train step). Batches are passed as ARGUMENTS, not a
    # closure: closure constants are baked into the HLO and the ~1.1 GB of
    # stacked uint8 batches overflows the remote-compile request (HTTP 413
    # on the axon relay).
    @jax.jit
    def run_many(state, batches):
        def body(st, b):
            st, metrics = step.body(st, b)
            return st, metrics["loss"]
        return jax.lax.scan(body, state, batches)

    new_state, losses = run_many(state, batches)
    float(jax.device_get(losses[-1]))  # warmup + compile
    # Best-of-3 like _bench_infer: single-shot timing is exposed to the
    # relay's bimodal interference (measured back-to-back same-code runs
    # of 93.6 / 434.5 / 93.6 ms/step — one contended run would be the
    # recorded number).
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, losses = run_many(state, batches)
        float(jax.device_get(jnp.sum(losses)))
        dts.append(time.perf_counter() - t0)
    dt = min(dts)  # total for ``iters`` steps
    ms = dt / iters * 1000
    return {
        "metric": (f"train step ms (batch {batch_size}, {size}x{size}, "
                   f"{cfg.model.dtype})"),
        "value": round(ms, 2),
        "unit": "ms/step",
        "vs_baseline": round((batch_size / (dt / iters)) / 1000.0, 3),
    }


def _bench_e2e(n_images: int = 400, batch_size: int = 8,
               extra_overrides: list | None = None) -> dict:
    """Ingest-INCLUDED throughput (SURVEY §7 hard part 4): real JPEG files
    on disk -> C++ threaded decode+letterbox -> double-buffered device
    feed -> full forward+NMS. Also measures the pure ingest rate (no
    forward) to expose the host-core budget: the scan-amortized device
    headline (~1.26k imgs/s/chip) assumes the host can feed it; this
    prints imgs/s/core and the cores needed to saturate the chip."""
    import os
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from basi_tpu.config import get_config
    from basi_tpu.data.datasets import FolderDataset
    from basi_tpu.data.pipeline import DeviceFeed
    from basi_tpu.infer import Inferencer

    rng = np.random.RandomState(0)
    tmp = tempfile.mkdtemp(prefix="basi_e2e_")
    try:
        img_dir = os.path.join(tmp, "images")
        os.makedirs(img_dir)
        os.makedirs(os.path.join(tmp, "masks"))
        # Photo-ish scenes (smooth background + boxes), not noise: JPEG
        # decode cost is content-dependent and white noise is pathological.
        cfg = get_config("val_v4-8_ap", [f"infer.batch_size={batch_size}"]
                         + list(extra_overrides or []))
        # Read the final value back: the default above is only a BASE for
        # --set overrides; DeviceFeed below must ship the size the
        # Inferencer was built with.
        batch_size = cfg.infer.batch_size
        if n_images // batch_size < 2:
            raise ValueError(
                f"e2e bench needs >= 2 batches to time (first is "
                f"compile): infer.batch_size={batch_size} vs "
                f"{n_images} images")
        side = cfg.model.image_size
        gy = np.linspace(0, 120, side, dtype=np.float32)[:, None]
        gx = np.linspace(0, 100, side, dtype=np.float32)[None, :]
        base = (gy + gx)[..., None] + np.array([40.0, 60.0, 80.0])
        for i in range(n_images):
            arr = base.copy()
            for _ in range(6):
                y0, x0 = rng.randint(0, int(side * 0.78), 2)
                h, w = rng.randint(max(2, side // 13), max(3, side // 5), 2)
                arr[y0:y0 + h, x0:x0 + w] = rng.randint(0, 255, 3)
            Image.fromarray(arr.clip(0, 255).astype(np.uint8)).save(
                os.path.join(img_dir, f"im{i:05d}.jpg"), quality=85)

        inf = Inferencer(cfg)
        ds = FolderDataset(tmp, image_size=cfg.model.image_size,
                           max_instances=cfg.data.max_instances,
                           decode_backend="native")

        def paced(dataset):
            """(e2e imgs/s, ingest-only imgs/s) through a DeviceFeed.

            e2e pass: ingest overlaps device compute; dispatches are async
            and the final scalar fetch syncs every batch's execution.
            Ingest-only pass: files -> host batch -> device upload, no
            forward. First batch (compile + first decode) excluded."""
            feed = DeviceFeed(dataset, batch_size, shuffle=False, seed=0,
                              depth=4, drop_last=True,
                              pack_masks=getattr(cfg.data, "pack_masks",
                                                 False))
            n_imgs = 0
            t0 = None
            last = None
            for bi, batch in enumerate(feed.epoch(0)):
                _, scores, _ = inf.predict_batch(batch["image"])
                last = scores
                if bi == 0:
                    float(jax.device_get(jnp.sum(scores)))
                    t0 = time.perf_counter()
                else:
                    n_imgs += batch_size
            float(jax.device_get(jnp.sum(last)))
            e2e = n_imgs / (time.perf_counter() - t0)

            n_imgs = 0
            t0 = None
            last_img = None
            for bi, batch in enumerate(feed.epoch(1)):
                last_img = batch["image"]
                if bi == 0:
                    t0 = time.perf_counter()
                else:
                    n_imgs += batch_size
            # force the final (async) upload before stopping the clock
            float(jax.device_get(jnp.sum(last_img.astype(jnp.int32))))
            return e2e, n_imgs / (time.perf_counter() - t0)

        e2e_rate, ingest_rate = paced(ds)

        # Same two passes through a `basi pack` shard cache (decode paid
        # once, off the clock): quantifies the decode-once answer to the
        # host-core budget (SURVEY §7 hard part 4).
        from basi_tpu.data.shards import ShardDataset, pack_dataset

        shard_dir = os.path.join(tmp, "shards")
        pack_dataset(ds, shard_dir, shard_size=1024,
                     batch_size=batch_size, log=None)
        sds = ShardDataset(shard_dir)
        shard_e2e, shard_ingest = paced(sds)

        # HOST-ONLY rates (no device upload): on a tunneled host the
        # ingest numbers above are relay-upload-bound (~22 MB/batch over
        # axon), which hides how far the decode-once cache moves the
        # actual host budget — these isolate it.
        def host_rate(dataset):
            from basi_tpu.data.datasets import iter_epoch

            n = 0
            t0 = time.perf_counter()
            for b in iter_epoch(dataset, batch_size, shuffle=False, seed=0):
                n += b["image"].shape[0]
            return n / (time.perf_counter() - t0)

        host_decode = host_rate(ds)
        host_rate(sds)  # warm the page cache (decode pass just wrote it)
        host_shards = host_rate(sds)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    ncores = os.cpu_count() or 1
    per_core = ingest_rate / ncores
    headline = 1257.0  # BENCH_r02 device-only imgs/s/chip
    return {
        "metric": "512x512 images/sec, files->decode->feed->forward (e2e)",
        "value": round(e2e_rate, 1),
        "unit": "images/sec",
        "vs_baseline": round(e2e_rate / 1000.0, 3),
        "ingest_only_imgs_per_s": round(ingest_rate, 1),
        "host_cores": ncores,
        "ingest_imgs_per_s_per_core": round(per_core, 1),
        "cores_to_saturate_device_headline": int(np.ceil(headline / per_core)),
        # decode-once shard cache (`basi pack`, data/shards.py)
        "shards_e2e_imgs_per_s": round(shard_e2e, 1),
        "shards_ingest_only_imgs_per_s": round(shard_ingest, 1),
        # host-side batch assembly only, no device upload (the honest
        # decode-vs-shards comparison on a relay-bound host)
        "host_only_decode_imgs_per_s": round(host_decode, 1),
        "host_only_shards_imgs_per_s": round(host_shards, 1),
    }


def run(mode: str = "infer", overrides: list | None = None) -> int:
    fns = {"infer": _bench_infer, "train": _bench_train, "e2e": _bench_e2e}
    if overrides and mode == "infer":
        raise SystemExit("--set is supported for --mode train/e2e only "
                         "(the infer headline config is pinned)")
    result = fns[mode](**({"extra_overrides": overrides}
                          if overrides and mode in ("train", "e2e") else {}))
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="infer", choices=["infer", "train", "e2e"])
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   help="dotted config override (train/e2e modes), e.g. "
                        "--set model.dtype=bfloat16")
    args = p.parse_args()
    raise SystemExit(run(args.mode, args.overrides))

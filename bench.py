"""Benchmark driver entrypoint (driver contract: repo-root bench.py prints
ONE JSON line). The implementation lives in basi_tpu.benchmark so the
installed `basi bench` subcommand works outside the repo checkout too."""

import argparse

from basi_tpu.benchmark import run

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="infer", choices=["infer", "train", "e2e"])
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY.PATH=VALUE",
                   help="config override (train/e2e modes)")
    args = p.parse_args()
    raise SystemExit(run(args.mode, overrides=args.overrides))

"""Failure-recovery composition under multi-host (VERDICT r3 item 8):
a REAL 2-process Gloo Trainer with train.async_checkpoint=true gets a
SIGTERM on ONE process mid-epoch. The stop decision must be agreed
collectively (loop.py _should_stop psums the flag — acting on the local
flag alone would have the processes enter the collective orbax save at
different steps and deadlock the grace window), the async in-flight save
must be committed before return, and a fresh resume on BOTH processes
must complete the run bitwise-identical to an uninterrupted pair.
"""

import os

import pytest

_WORKER = """
import json, os, signal, sys
pid, port, out, ckpt_dir, preempt_at = (
    sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4], int(sys.argv[5]))
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=2 "
    "--xla_backend_optimization_level=0")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["BASI_TEST_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
os.environ.update({
    "BASI_COORDINATOR": f"127.0.0.1:{port}",
    "BASI_NUM_PROCESSES": "2",
    "BASI_PROCESS_ID": pid,
})
import numpy as np
from basi_tpu.config import (Config, DataConfig, InferConfig, ModelConfig,
                             ParallelConfig, TrainConfig)
from basi_tpu.parallel.distributed import maybe_initialize
from basi_tpu.train.loop import Trainer

assert maybe_initialize() is True
assert jax.process_count() == 2

cfg = Config(
    model=ModelConfig(backbone="resnet_tiny", fpn_channels=32,
                      mask_channels=32, grid_size=8, num_slots=8,
                      image_size=64),
    data=DataConfig(dataset="synthetic", batch_size=4, image_size=64,
                    max_instances=4, synthetic_n=8),
    train=TrainConfig(epochs=2, lr=1e-3, log_every=1,
                      checkpoint_dir=ckpt_dir, resume="auto",
                      async_checkpoint=True,
                      # Poll the collective stop flag at EVERY boundary so
                      # the 2-step epoch stops exactly at preempt_at (the
                      # production default of 16 amortizes the psum sync).
                      stop_poll_steps=1),
    infer=InferConfig(batch_size=4, dtype="float32", pre_nms_top_k=16),
    parallel=ParallelConfig(num_devices=0),
)
tr = Trainer(cfg)
if preempt_at and pid == "0":
    # SIGTERM to SELF after the preempt_at-th dispatch, on process 0 ONLY:
    # the collective stop agreement must halt process 1 at the same step.
    orig = tr.train_step
    calls = []
    def wrapped(state, batch):
        res = orig(state, batch)
        calls.append(1)
        if len(calls) == preempt_at:
            os.kill(os.getpid(), signal.SIGTERM)
        return res
    tr.train_step = wrapped
metrics = tr.train()
tr.close()
record = {"preempted_at_step": metrics.get("preempted_at_step", -1)}
if preempt_at:
    assert record["preempted_at_step"] == preempt_at, metrics
    # Fresh Trainer on BOTH processes: resume from the preemption save
    # (async — the unconditional ckpt.wait() made it durable) and finish.
    tr2 = Trainer(cfg)
    record["resumed_step"] = int(jax.device_get(tr2.state.step))
    assert record["resumed_step"] == preempt_at, record
    metrics2 = tr2.train()
    tr2.close()
    assert "preempted_at_step" not in metrics2, metrics2
    final = tr2.state
else:
    assert record["preempted_at_step"] == -1, metrics
    final = tr.state
assert int(jax.device_get(final.step)) == 4
flat = jax.tree_util.tree_flatten_with_path(jax.device_get(final.params))[0]
arrs = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
np.savez(out, **arrs)
with open(out + ".rec.json", "w") as fh:
    json.dump(record, fh)
print("worker done", pid)
"""


def _run_pair(tmp_path, tag: str, preempt_at: int):
    import socket
    import subprocess
    import sys

    worker = tmp_path / "preempt_worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ, PYTHONPATH=os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + os.environ.get("PYTHONPATH", "").split(os.pathsep)))
    env.pop("JAX_PLATFORMS", None)
    env["BASI_TEST_CACHE"] = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".xla_cache")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port,
             str(tmp_path / f"{tag}{i}.npz"), str(tmp_path / f"ckpt_{tag}"),
             str(preempt_at)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(outs)


@pytest.mark.slow
def test_multihost_sigterm_midepoch_resumes_bitwise(tmp_path):
    import json

    import numpy as np

    # Uninterrupted reference pair first (warms the XLA cache too).
    _run_pair(tmp_path, "ref", preempt_at=0)
    # SIGTERM process 0 after step 1 (mid-epoch: 2 steps/epoch).
    _run_pair(tmp_path, "pre", preempt_at=1)

    r0 = json.load(open(tmp_path / "pre0.npz.rec.json"))
    r1 = json.load(open(tmp_path / "pre1.npz.rec.json"))
    # BOTH processes stopped at the SAME step (the collective agreement),
    # including the one that never received the signal.
    assert r0 == r1 == {"preempted_at_step": 1, "resumed_step": 1}

    ref = np.load(tmp_path / "ref0.npz")
    p0 = np.load(tmp_path / "pre0.npz")
    p1 = np.load(tmp_path / "pre1.npz")
    assert set(ref.files) == set(p0.files) == set(p1.files)
    for k in ref.files:
        # Same programs, same (seed, epoch)-pure batch order, mid-epoch
        # replay from the exact step: the interrupted+resumed run must be
        # BITWISE the uninterrupted one, on both processes.
        np.testing.assert_array_equal(p0[k], ref[k], err_msg=k)
        np.testing.assert_array_equal(p0[k], p1[k], err_msg=k)

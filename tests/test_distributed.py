"""Multi-host init path (SURVEY §5.8): both detection branches of
``maybe_initialize`` exercised with a monkeypatched
``jax.distributed.initialize`` — no cluster needed, but the arguments JAX
would receive are asserted exactly.
"""

import os

import jax
import pytest

import basi_tpu.parallel.distributed as dist


@pytest.fixture(autouse=True)
def _reset_state(monkeypatch):
    monkeypatch.setattr(dist, "_initialized", False)
    for var in ("BASI_COORDINATOR", "BASI_NUM_PROCESSES", "BASI_PROCESS_ID",
                "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    yield


def test_no_env_no_init(monkeypatch):
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append((a, k)))
    assert dist.maybe_initialize() is False
    assert calls == []


def test_explicit_env_branch(monkeypatch):
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append((a, k)))
    monkeypatch.setenv("BASI_COORDINATOR", "10.0.0.1:1234")
    monkeypatch.setenv("BASI_NUM_PROCESSES", "4")
    monkeypatch.setenv("BASI_PROCESS_ID", "2")
    assert dist.maybe_initialize() is True
    assert calls == [((), {"coordinator_address": "10.0.0.1:1234",
                           "num_processes": 4, "process_id": 2})]
    # idempotent: second call must NOT re-initialize
    assert dist.maybe_initialize() is True
    assert len(calls) == 1


def test_partial_explicit_env_not_distributed(monkeypatch):
    """Coordinator without process id/count must not initialize."""
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append((a, k)))
    monkeypatch.setenv("BASI_COORDINATOR", "10.0.0.1:1234")
    assert dist.maybe_initialize() is False
    assert calls == []


def test_tpu_pod_env_branch(monkeypatch):
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append((a, k)))
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-0,host-1,host-2,host-3")
    assert dist.maybe_initialize() is True
    assert calls == [((), {})]  # JAX auto-infers args on pod slices


def test_single_worker_tpu_env_not_distributed(monkeypatch):
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append((a, k)))
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-0")  # no comma
    assert dist.maybe_initialize() is False
    assert calls == []


def test_process_info_single_process():
    idx, count = dist.process_info()
    assert (idx, count) == (0, 1)


_TRAINER_WORKER = """
import json, os, sys
mode, port, out, ckpt_dir = (sys.argv[1], sys.argv[2], sys.argv[3],
                             sys.argv[4])
ndev_local = 4 if mode == "single" else 2
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={ndev_local} "
    "--xla_backend_optimization_level=0")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["BASI_TEST_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
if mode != "single":
    os.environ.update({
        "BASI_COORDINATOR": f"127.0.0.1:{port}",
        "BASI_NUM_PROCESSES": "2",
        "BASI_PROCESS_ID": mode,
    })
import numpy as np
from basi_tpu.config import (Config, DataConfig, InferConfig, ModelConfig,
                             ParallelConfig, TrainConfig)
from basi_tpu.parallel.distributed import maybe_initialize
from basi_tpu.train.loop import Trainer

if mode != "single":
    assert maybe_initialize() is True
    assert jax.process_count() == 2
assert len(jax.devices()) == 4, jax.devices()

cfg = Config(
    model=ModelConfig(backbone="resnet_tiny", fpn_channels=32,
                      mask_channels=32, grid_size=8, num_slots=8,
                      image_size=64),
    data=DataConfig(dataset="synthetic", batch_size=4, image_size=64,
                    max_instances=4, synthetic_n=8),
    train=TrainConfig(epochs=2, lr=1e-3, log_every=1,
                      checkpoint_dir=ckpt_dir, resume="none"),
    infer=InferConfig(batch_size=4, dtype="float32", pre_nms_top_k=16),
    parallel=ParallelConfig(num_devices=0),
)
tr = Trainer(cfg)
metrics = tr.train()
# Multi-host checkpoint/resume: every process participates in the orbax
# save (global replicated arrays, shared directory); a FRESH Trainer with
# resume=auto must restore the final step on every process.
import dataclasses
cfg2 = dataclasses.replace(
    cfg, train=dataclasses.replace(cfg.train, resume="auto"))
tr2 = Trainer(cfg2)
resumed = int(jax.device_get(tr2.state.step))
assert resumed == 4, f"resume restored step {resumed}, expected 4"
flat = jax.tree_util.tree_flatten_with_path(
    jax.device_get(tr.state.params))[0]
arrs = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
arrs["__step__"] = np.asarray(jax.device_get(tr.state.step))
np.savez(out, **arrs)
with open(out + ".metrics.json", "w") as fh:
    json.dump({k: float(v) for k, v in metrics.items()}, fh)
print("worker done", mode)
"""


@pytest.mark.slow
def test_two_process_trainer_matches_single_process(tmp_path):
    """The product-level multi-host gate (VERDICT r2 item 1): a REAL
    2-process Gloo-backed Trainer — process-sharded decode, global-array
    feed, shard_map DP step, multi-process DP eval — must train to the
    same state as one process driving the identical 4-device mesh, and
    both processes must report identical eval metrics."""
    import subprocess
    import sys

    worker = tmp_path / "trainer_worker.py"
    worker.write_text(_TRAINER_WORKER)
    env = dict(os.environ, PYTHONPATH=os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + os.environ.get("PYTHONPATH", "").split(os.pathsep)))
    env.pop("JAX_PLATFORMS", None)
    env["BASI_TEST_CACHE"] = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".xla_cache")

    def run_single():
        p = subprocess.run(
            [sys.executable, str(worker), "single", "0",
             str(tmp_path / "single.npz"), str(tmp_path / "ckpt_single")],
            env=env, capture_output=True, text=True, timeout=900)
        assert p.returncode == 0, p.stdout + p.stderr
        return p

    def run_pair():
        import socket

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = str(s.getsockname()[1])
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), str(i), port,
                 str(tmp_path / f"proc{i}.npz"),
                 str(tmp_path / "ckpt_pair")],  # SHARED dir: orbax
                env=env, stdout=subprocess.PIPE,  # multihost save
                stderr=subprocess.STDOUT, text=True)
            for i in range(2)
        ]
        outs = [p.communicate(timeout=900)[0] for p in procs]
        assert all(p.returncode == 0 for p in procs), "\n---\n".join(outs)

    # Serialize: this host has ONE core; concurrent single+pair runs would
    # distort nothing correctness-wise but triple the wall time via
    # compile contention. Run the reference first to warm the XLA cache.
    run_single()
    run_pair()

    import json

    import numpy as np

    single = np.load(tmp_path / "single.npz")
    p0 = np.load(tmp_path / "proc0.npz")
    p1 = np.load(tmp_path / "proc1.npz")
    assert int(single["__step__"]) == int(p0["__step__"]) == 4
    assert set(single.files) == set(p0.files) == set(p1.files)
    for k in single.files:
        # Gloo allreduce and single-process psum may order float sums
        # differently; over 4 SGD steps (grad psum + sync-BN pmean each)
        # the accumulated reduction-order drift is O(1e-4) on f32 params.
        np.testing.assert_allclose(p0[k], single[k], rtol=1e-3, atol=5e-4,
                                   err_msg=k)
        # both processes hold the SAME replicated state — exactly.
        np.testing.assert_array_equal(p0[k], p1[k], err_msg=k)
    m0 = json.load(open(tmp_path / "proc0.npz.metrics.json"))
    m1 = json.load(open(tmp_path / "proc1.npz.metrics.json"))
    drop = ("step_ms", "imgs_per_s", "infer_ms_per_batch", "t",
            "png_ms_per_batch")
    assert {k: v for k, v in m0.items() if k not in drop} == \
           {k: v for k, v in m1.items() if k not in drop}


@pytest.mark.slow
def test_two_process_cpu_gloo_psum(tmp_path):
    """REAL multi-process jax.distributed smoke (SURVEY §5.8): two
    subprocesses initialize through maybe_initialize's BASI_* env branch,
    build a global 4-device mesh (2 local CPU devices each), and a
    shard_map psum over Gloo must produce the global sum in both."""
    import subprocess
    import sys
    import textwrap

    worker = tmp_path / "worker.py"
    worker.write_text(textwrap.dedent("""
        import os, sys
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        import jax
        jax.config.update("jax_platforms", "cpu")
        pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
        os.environ.update({
            "BASI_COORDINATOR": f"127.0.0.1:{port}",
            "BASI_NUM_PROCESSES": str(nproc),
            "BASI_PROCESS_ID": str(pid),
        })
        import numpy as np
        import jax.numpy as jnp
        from basi_tpu.parallel.distributed import maybe_initialize
        assert maybe_initialize() is True
        assert jax.process_count() == nproc
        devs = jax.devices()
        assert len(devs) == 2 * nproc, devs
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        mesh = Mesh(np.array(devs), ("data",))
        g = jax.shard_map(lambda x: jax.lax.psum(x, "data"), mesh=mesh,
                          in_specs=P("data"), out_specs=P("data"))
        x = jnp.arange(2 * nproc, dtype=jnp.float32)
        out = g(jax.device_put(x, NamedSharding(mesh, P("data"))))
        local = np.asarray([s.data for s in out.addressable_shards]).ravel()
        assert np.allclose(local, float(x.sum())), (local, float(x.sum()))
        print(f"proc {pid} OK")
    """))
    import socket

    with socket.socket() as s:  # free port
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ, PYTHONPATH=os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + os.environ.get("PYTHONPATH", "").split(os.pathsep)))
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(i), "2", port],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(outs)
    assert all(f"proc {i} OK" in outs[i] for i in range(2)), outs

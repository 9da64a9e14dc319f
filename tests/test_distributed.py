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

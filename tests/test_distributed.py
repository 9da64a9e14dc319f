"""Multi-host init path (SURVEY §5.8): both detection branches of
``maybe_initialize`` exercised with a monkeypatched
``jax.distributed.initialize`` — no cluster needed, but the arguments JAX
would receive are asserted exactly.
"""

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
def test_two_process_cpu_distributed_smoke(tmp_path):
    """Real 2-process jax.distributed over localhost CPU: both workers
    initialize through maybe_initialize (BASI_* env branch), see a global
    2-device view, and psum across hosts."""
    import os
    import subprocess
    import sys

    script = tmp_path / "worker.py"
    script.write_text(
        "import os\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from basi_tpu.parallel.distributed import maybe_initialize, process_info\n"
        "assert maybe_initialize() is True\n"
        "idx, count = process_info()\n"
        "assert count == 2, count\n"
        "import jax.numpy as jnp\n"
        "from jax.sharding import Mesh, NamedSharding, PartitionSpec as P\n"
        "mesh = Mesh(jax.devices(), ('data',))\n"
        "assert len(jax.devices()) == 2\n"
        "x = jnp.ones((1,)) * (idx + 1)\n"
        "g = jax.make_array_from_single_device_arrays(\n"
        "    (2, 1), NamedSharding(mesh, P('data')),\n"
        "    [jax.device_put(x[None], jax.local_devices()[0])])\n"
        "s = jax.jit(lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P()))(g)\n"
        "assert float(s) == 3.0, float(s)\n"
        "print(f'WORKER{idx} OK')\n"
    )
    env_base = {**os.environ,
                "PYTHONPATH": os.environ.get("PYTHONPATH", "") + os.pathsep
                + os.getcwd(),
                "BASI_COORDINATOR": "localhost:12945",
                "BASI_NUM_PROCESSES": "2",
                "JAX_PLATFORMS": "cpu"}
    procs = [
        subprocess.Popen([sys.executable, str(script)],
                         env={**env_base, "BASI_PROCESS_ID": str(i)},
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER{i} OK" in out

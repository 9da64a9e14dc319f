"""Test harness: force the CPU backend with 8 virtual devices.

The machine's axon sitecustomize force-registers the TPU backend and wins
over the JAX_PLATFORMS env var, so we must override via jax.config BEFORE
any backend is initialized. XLA_FLAGS must also be set before first use.
The 8-device CPU mesh is the fake-cluster harness for distributed tests
(SURVEY.md §4 item 2).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # CPU-backend compile time dominates suite wall-clock on this 1-core host;
    # level 0 skips the slow LLVM opt pipeline (~1.7x faster suite) and all
    # golden-parity tolerances still hold (tests compare vs f32 torch oracles
    # at precision=highest, which is unaffected by backend opt level).
    + " --xla_backend_optimization_level=0"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Tests compare against f32 torch oracles; make matmuls deterministic-exact.
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: XLA:CPU compile time dominates suite wall-clock
# (first run ~18 min on this 1-core host); cached reruns skip it entirely.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture()
def rng():
    return np.random.RandomState(0)

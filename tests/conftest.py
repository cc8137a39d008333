"""Test harness config: run everything on CPU with 8 virtual devices.

This is the standard JAX trick for testing multi-device sharding without a
pod: XLA's host platform is forced to expose 8 devices, so mesh/halo logic
runs exactly as it would across chips (collectives included).

Note: this environment may inject a TPU plugin via sitecustomize (which
imports jax before pytest starts and pins jax_platforms), so setting env
vars alone is not enough — we also override jax.config directly before any
backend is initialized by a test.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Tests default to the scanned (non-unrolled) pipeline: CPU-compiling the
# unrolled straight-line programs doubles suite time for no coverage gain
# (one explicit unroll-parity test opts back in).
os.environ.setdefault("TPUFLOW_UNROLL", "0")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / long-compile tests"
    )


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _tpuflow_env_hygiene():
    """No test (or library code a test drives) may leak TPUFLOW_* state.

    Round 3's red suite came from exactly this: the VMEM-fallback latch
    wrote os.environ and a monkeypatch teardown restored the leaked value,
    poisoning every later test. The latch is a module flag now; this
    fixture (a) fails the OFFENDING test on any TPUFLOW_* env delta, and
    (b) clears the runtime Pallas latch on both sides of every test.
    """
    from tpuflow.utils import envcache

    envcache.reset_pallas_runtime()
    before = {k: v for k, v in os.environ.items() if k.startswith("TPUFLOW_")}
    yield
    after = {k: v for k, v in os.environ.items() if k.startswith("TPUFLOW_")}
    envcache.reset_pallas_runtime()
    assert after == before, (
        "TPUFLOW_* env leaked across this test: "
        f"{ {k: (before.get(k), after.get(k)) for k in set(before) | set(after) if before.get(k) != after.get(k)} }"
    )


def pytest_sessionstart(session):
    assert all(d.platform == "cpu" for d in jax.devices()), (
        "tests must run on the virtual CPU mesh, got "
        f"{[d.platform for d in jax.devices()]}"
    )
    assert jax.device_count() == 8, (
        f"expected 8 virtual CPU devices, got {jax.device_count()}"
    )

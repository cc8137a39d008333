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


def pytest_sessionstart(session):
    assert all(d.platform == "cpu" for d in jax.devices()), (
        "tests must run on the virtual CPU mesh, got "
        f"{[d.platform for d in jax.devices()]}"
    )
    assert jax.device_count() == 8, (
        f"expected 8 virtual CPU devices, got {jax.device_count()}"
    )

"""Test configuration: run all tests on a virtual 8-device CPU backend.

Multi-chip sharding is exercised on `--xla_force_host_platform_device_count=8`
CPU devices (no TPU needed in CI), per SURVEY.md §4's test-pyramid plan.

NOTE: on this machine a sitecustomize hook registers the `axon` TPU plugin at
interpreter start and pins jax_platforms="axon,cpu" — env vars set here are
too late. The runtime config updates below run before the first backend
initialization, which is what actually selects CPU.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# This JAX build lowers f32 matmuls/convs to reduced precision by default
# (even on CPU). Golden-parity tests need true f32 accumulation; production
# code chooses bf16 explicitly via compute_dtype.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)

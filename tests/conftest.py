"""Test configuration: run all tests on a virtual 8-device CPU backend.

Multi-chip sharding is exercised on `--xla_force_host_platform_device_count=8`
CPU devices (no TPU needed in CI), per SURVEY.md §4's test-pyramid plan.

On-TPU lane (VERDICT r4 #3): `GWKIT_TPU_TESTS=1 python -m pytest tests/ -q
-m tpu` skips the CPU pin and runs the `tpu`-marked kernel-parity tests
compiled on the real chip, with tolerances selected per backend inside the
tests (see tests/test_tpu_lane.py). Without the env var, `tpu`-marked tests
are skipped so the default suite stays chip-free.

NOTE: on this machine a sitecustomize hook registers the `axon` TPU plugin at
interpreter start and pins jax_platforms="axon,cpu" — env vars set here are
too late. The runtime config updates below run before the first backend
initialization, which is what actually selects CPU.
"""
import os

RUN_TPU = os.environ.get("GWKIT_TPU_TESTS", "0") == "1"

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not RUN_TPU:
    jax.config.update("jax_platforms", "cpu")
# This JAX build lowers f32 matmuls/convs to reduced precision by default
# (even on CPU). Golden-parity tests need true f32 accumulation; production
# code chooses bf16 explicitly via compute_dtype.
#
# TPU lane exception: the axon relay backend HANGS compiling any dot at a
# non-default precision (a bare 512x512 f32 matmul at 'high' or 'highest'
# never returns — measured round 5), so the on-chip lane keeps the DEFAULT
# precision. That is also the numeric mode every production path actually
# runs in (bench.py, the search engine, training set no global override),
# so the lane's tolerances are calibrated to the production lowering.
if not RUN_TPU:
    jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

if not RUN_TPU:
    assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: on-device kernel-parity lane (GWKIT_TPU_TESTS=1 pytest -m tpu)")


def pytest_collection_modifyitems(config, items):
    if not RUN_TPU:
        skip = pytest.mark.skip(
            reason="on-TPU lane: run GWKIT_TPU_TESTS=1 pytest -m tpu")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)

"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding paths are
validated on a host-platform mesh exactly as the reference's CI validates
behavior without special hardware (3-OS matrix, rust.yml:28-30).

A marker-gated hardware leg exists for the machines that DO have a chip:

    COMPU_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

keeps the environment's real platform (axon/TPU) and runs only the
``@pytest.mark.tpu`` subset (kernel roundtrips + one scheduler e2e on the
device — tests/test_tpu_leg.py), so device numerics are validated by
tests, not only by bench side-effects. Everything else stays CPU-pinned.
"""

import os

import pytest

TPU_LEG = os.environ.get("COMPU_TPU_TESTS", "") == "1"

if not TPU_LEG:
    # Force CPU regardless of the environment's default platform (an
    # axon/TPU plugin may have pinned JAX_PLATFORMS before pytest starts).
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: hardware leg; run with COMPU_TPU_TESTS=1 -m tpu")


def pytest_collection_modifyitems(config, items):
    if TPU_LEG:
        return
    skip = pytest.mark.skip(reason="hardware leg: set COMPU_TPU_TESTS=1 and -m tpu")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)

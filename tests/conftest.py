"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding paths are
validated on a host-platform mesh exactly as the reference's CI validates
behavior without special hardware (3-OS matrix, rust.yml:28-30)."""

import os

# Force CPU regardless of the environment's default platform (an axon/TPU
# plugin may have pinned JAX_PLATFORMS before pytest starts).
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

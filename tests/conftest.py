"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on host CPU devices
(xla_force_host_platform_device_count), mirroring how the driver dry-runs
the multichip entry point.

NOTE: this environment's jax build ignores the JAX_PLATFORMS env var (the
axon TPU plugin pins itself); only jax.config.update("jax_platforms", ...)
takes effect, so we set it programmatically before any backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

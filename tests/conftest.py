"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on host CPU devices
(xla_force_host_platform_device_count), mirroring how the driver dry-runs
the multichip entry point. Must run before jax initializes its backends.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (the tunneled
# TPU), which would make unit tests slow and serialized on one real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

"""Test environment: force CPU with a virtual 8-device mesh.

Multi-chip hardware is unavailable in CI; sharding tests run on
``xla_force_host_platform_device_count=8`` CPU devices, per SURVEY.md §7.
Must run before any jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

"""Test environment: force CPU with a virtual 8-device mesh.

Multi-chip hardware is unavailable in CI; sharding tests run on
``xla_force_host_platform_device_count=8`` CPU devices, per SURVEY.md §7.

The axon TPU plugin registers itself at interpreter startup (sitecustomize)
whenever ``PALLAS_AXON_POOL_IPS`` is set, which pins ``JAX_PLATFORMS=axon``.
Backends initialize lazily, so deregistering the factory here — before any
test touches a backend — restores a clean CPU mesh regardless of launch env.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
try:  # the sitecustomize imported jax already; re-point its config at CPU
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:  # pragma: no cover - plugin internals shift between versions
    import sys

    print("WARNING: could not pin jax to CPU for tests", file=sys.stderr)

# Separate try (ADVICE r3): a platform-pin failure must not silently skip the
# cache config; enable_compile_cache reports its own failures to stderr.
from egg_fluid_simulation_tpu._compat import enable_compile_cache  # noqa: E402

enable_compile_cache()

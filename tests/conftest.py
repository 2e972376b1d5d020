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
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

try:  # the sitecustomize imported jax already; re-point its config at CPU
    import jax

    jax.config.update("jax_platforms", "cpu")
    # The env var above is read when jax first imports — which sitecustomize
    # already did — so the persistent compile cache silently never engages
    # unless the config is set explicitly post-import.
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
except Exception:  # pragma: no cover - plugin internals shift between versions
    pass

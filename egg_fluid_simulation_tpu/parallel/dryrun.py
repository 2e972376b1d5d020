"""Multi-chip dry run: one full sharded step on an ``n_devices`` virtual mesh.

Run as ``python -m egg_fluid_simulation_tpu.parallel.dryrun N`` inside an
environment where JAX sees >= N devices (the driver exports
``JAX_PLATFORMS=cpu`` + ``--xla_force_host_platform_device_count``; see
``__graft_entry__.dryrun_multichip``, which re-execs this module in a clean
subprocess when the parent interpreter is pinned to a TPU plugin).

Validates the framework's SPMD scaling layer (parallel/sharding.py — the
distributed-communication analog the reference lacks, SURVEY.md §2): particle
arrays sharded over the mesh, collision pass via all_gather over ICI,
reductions via psum/pmax, and asserts the result matches the single-chip step.
"""

from __future__ import annotations

import sys


def main(n_devices: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from egg_fluid_simulation_tpu.ops import solver as solver_ops
    from egg_fluid_simulation_tpu.ops.solver import SolverOptions
    from egg_fluid_simulation_tpu.parallel import sharding

    devices = jax.devices()
    assert len(devices) >= n_devices, (
        f"need {n_devices} devices, have {len(devices)} "
        f"(platform={jax.default_backend()})")
    mesh = sharding.make_mesh(devices[:n_devices])

    from __graft_entry__ import _tiny_handler

    # capacity must divide evenly over the mesh; >= 512 keeps the scene real
    capacity = n_devices * max(64, -(-512 // n_devices))
    h = _tiny_handler(capacity=capacity)
    opts = SolverOptions(engine="gather", table_size=2048, slots_per_cell=16,
                         budget_mode="off")

    state = sharding.shard_state(h.state, mesh)
    step = sharding.sharded_step(mesh, opts)
    cfg2 = h._device_cfg2()
    dt = jnp.float32(1 / 60)
    relax = jnp.float32(1.0)
    new_state, stats = step(state, cfg2, dt, relax)
    jax.block_until_ready(new_state.pos)

    pos = np.asarray(new_state.pos)
    assert np.isfinite(pos[:, :70]).all(), (
        "sharded step produced non-finite positions")

    # cross-check vs the single-chip step: Jacobi + all-gather is exact, so
    # the sharded result must match to float tolerance
    ref_state, ref_stats = solver_ops.step(h.state, cfg2, dt, relax, opts)
    ref_pos = np.asarray(ref_state.pos)
    np.testing.assert_allclose(pos[:, :70], ref_pos[:, :70],
                               rtol=1e-5, atol=1e-4)

    print(f"dryrun_multichip: {n_devices}-device sharded step OK "
          f"(platform={jax.default_backend()}), matches single-chip, "
          f"centroid={np.asarray(stats.centroid)[0].round(2).tolist()}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)

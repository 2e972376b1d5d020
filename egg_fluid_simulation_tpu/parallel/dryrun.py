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

    # ---- 2D spatial decomposition (dense engine, halo exchange) ----
    from egg_fluid_simulation_tpu.parallel import spatial as S

    db, dx = (2, 2) if n_devices >= 4 else (2, 1)
    lay = S.SpatialLayout(grid_dim=32, slots_per_cell=4, db=db, dx=dx,
                          migrate_cap=32)
    sp_opts = SolverOptions(engine="dense", budget_mode="off",
                            dense_rebin="step", dense_grid_dim=32,
                            dense_slots=4, use_pallas=False)
    h2 = _tiny_handler(capacity=capacity, engine="dense")
    cell_sizes = []
    for cfg in (h2._white_config, h2._yolk_config):
        f = max(cfg["collision_overlap_factor"],
                cfg["cohesion_interaction_distance_factor"])
        cell_sizes.append(max(1.0, cfg["max_radius"] * f))
    sp_mesh = S.make_spatial_mesh(db, dx, devices[:db * dx])
    sp_state = S.redistribute(h2.state, cell_sizes, lay, sp_mesh)
    sp_step = S.spatial_step(sp_mesh, lay, sp_opts)
    sp_state, sp_stats, info = sp_step(sp_state, h2._device_cfg2(), dt, relax)
    jax.block_until_ready(sp_state.pos)
    assert np.isfinite(np.asarray(sp_state.pos)).all()
    ref2, ref2_stats = solver_ops.step(h2.state, h2._device_cfg2(), dt, relax,
                                       sp_opts)
    np.testing.assert_allclose(np.asarray(sp_stats.centroid),
                               np.asarray(ref2_stats.centroid),
                               rtol=1e-4, atol=1e-3)
    cb = lay.collective_bytes_per_step(sp_opts)
    print(f"dryrun_multichip: ({db}x{dx})-mesh 2D spatial dense step OK, "
          f"halo exchange + migration, centroid matches single-chip; "
          f"ICI bytes/step/device: {cb['total_per_step']:,} "
          f"(vs O(total particles) for the 1D all-gather layer)")

    # ---- plane-resident multi-step (drift-adaptive, one dispatch) ----
    sp_multi = S.spatial_multi_step(sp_mesh, lay, sp_opts)
    sp_state2, sp_stats2, info2, _ws = sp_multi(sp_state, h2._device_cfg2(), dt,
                                           relax, jnp.int32(3))
    jax.block_until_ready(sp_state2.pos)
    assert np.isfinite(np.asarray(sp_state2.pos)).all()
    assert int(np.asarray(info2)[:, 0].sum()) == 0
    print(f"dryrun_multichip: ({db}x{dx})-mesh plane-RESIDENT multi-step OK "
          f"(3 steps, one dispatch, migration inside the rebin cond)")

    # ---- sharded renderer (per-device splats + log-psum combine) ----
    from egg_fluid_simulation_tpu.ops import render as render_ops

    opts2 = tuple(render_ops.auto_render_options(cfg, 256)
                  for cfg in (h2._white_config, h2._yolk_config))
    draw = S.spatial_draw(sp_mesh, lay, opts2, (0.0, 0.0, 256, 256),
                          0.3, 0.01, True)
    frame = np.asarray(draw(sp_state2, sp_stats2, h2._device_cfg2(),
                            jnp.float32(1.0)))
    assert frame.shape == (256, 256, 4) and np.isfinite(frame).all()
    assert frame[..., 3].max() > 0.05, "sharded frame rendered nothing"
    print(f"dryrun_multichip: ({db}x{dx})-mesh sharded RENDER OK "
          f"(frame alpha max {frame[..., 3].max():.3f})")

    # ---- the product surface: SpatialHandler end-to-end ----
    from egg_fluid_simulation_tpu import SpatialHandler
    from egg_fluid_simulation_tpu import (default_white_config,
                                          default_yolk_config)

    hp = SpatialHandler(default_white_config(), default_yolk_config(),
                        db=db, dx=dx, capacity=capacity, max_batches=8,
                        options=sp_opts)
    bid = hp.add(60.0, 50.0, 25.0, 8.0, None, None, 50, 12)
    hp.set_target_position(bid, 100.0, 80.0)
    hp.update(2 / 60)
    hp.run_steps(2)
    frame2 = np.asarray(hp.draw(viewport=(0, 0, 256, 256)))
    assert np.isfinite(frame2).all() and frame2[..., 3].max() > 0.05
    px, py = hp.get_position(bid)
    assert np.isfinite([px, py]).all()
    print(f"dryrun_multichip: SpatialHandler product flow OK "
          f"(add/update/run_steps/draw/get_position on the {db}x{dx} mesh)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)

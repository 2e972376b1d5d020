"""Spatial-mode benchmark: per-step time + MEASURED collective bytes.

Run via ``python bench.py --spatial`` (which re-execs this module in a clean
CPU subprocess with a virtual device mesh, like the multichip dryrun) or
directly: ``python -m egg_fluid_simulation_tpu.parallel.spatial_bench
[n_devices] [n_particles]``.

Records, for the product SpatialHandler on a (db x dx) mesh:
- per-step wall time of the plane-resident multi-step (dependence-chained),
- collective bytes per step measured from the compiled HLO
  (parallel/accounting.py) next to the analytic model
  (SpatialLayout.collective_bytes_per_step).

CPU-mesh wall times are NOT comparable to the TPU headline — the value of
this mode is the measured communication profile and a timed end-to-end
product path over a real (virtual) mesh.
"""

from __future__ import annotations

import json
import sys
import time


def main(n_devices: int = 8, n_target: int = 20_000) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from egg_fluid_simulation_tpu import (SolverOptions, SpatialHandler,
                                          default_white_config,
                                          default_yolk_config)
    from egg_fluid_simulation_tpu.parallel import accounting

    assert len(jax.devices()) >= n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}")
    db = 4 if n_devices >= 8 else 2
    dx = n_devices // db

    per_batch = max(200, n_target // 16)
    n_batches = max(1, n_target // per_batch)
    capacity = 1 << int(np.ceil(np.log2(n_target + n_batches + 1024)))
    g = 32
    while g * g * 4 < capacity and g < 512:
        g *= 2
    options = SolverOptions(engine="dense", budget_mode="off",
                            dense_rebin="step", dense_grid_dim=g,
                            dense_slots=4, use_pallas=False)
    h = SpatialHandler(default_white_config(), default_yolk_config(),
                       db=db, dx=dx, capacity=capacity,
                       max_batches=max(256, n_batches + 1), options=options)
    side = int(np.ceil(np.sqrt(n_batches)))
    batch_radius = float(np.sqrt(per_batch) * 4.0)
    spacing = batch_radius * 2.2
    for b in range(n_batches):
        h.add((b % side) * spacing + spacing, (b // side) * spacing + spacing,
              batch_radius, batch_radius * 0.3, None, None,
              per_batch, max(2, per_batch // 10))
    total = sum(h.get_n_particles())

    # ---- measured collective bytes (compiled HLO of one sharded step) ----
    h._ensure_spatial()
    step, multi = h._fns()
    cfg2 = h._inner._device_cfg2()
    dt, relax = h._inner._step_scalars(1 / 60)
    measured = accounting.measured_collective_bytes(
        step, h._sp_state, cfg2, dt, relax)
    analytic = h.layout.collective_bytes_per_step(options)

    # ---- chained per-step time through the product surface ----
    h.run_steps(2)  # warm both compiles
    chain, trials = 10, 3
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        h.run_steps(chain)
        jax.device_get(h.state.pos[0, 0, 0])
        times.append((time.perf_counter() - t0) * 1000 / chain)
    info = np.asarray(h.last_migration_info)

    out = {
        "metric": "spatial per-step latency (virtual CPU mesh)",
        "value": round(sorted(times)[len(times) // 2], 3),
        "unit": "ms",
        "mesh": f"{db}x{dx}",
        "n_particles": total,
        "grid_dim": g,
        # per-device bytes: measured counts each collective op once (the
        # resident path's conditional rebin collectives compile in too)
        "collective_bytes_measured_per_step": measured.get("total", 0),
        "collective_bytes_measured": {k: v for k, v in measured.items()
                                      if k != "total"},
        "collective_bytes_analytic_per_step": analytic["total_per_step"],
        "migration_dropped": int(info[:, 0].sum()),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8,
         int(sys.argv[2]) if len(sys.argv) > 2 else 20_000)

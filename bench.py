#!/usr/bin/env python
"""Benchmark harness — the driver runs this on real TPU hardware.

Measures the BASELINE.md north-star metrics:
  - particle-steps/sec at 10k and 1M particles (XPBD step, default
    2 substeps x 3 collision passes),
  - p50 step+render latency at 1M particles (full 4-pass render pipeline).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

The headline metric is p50 step+render latency at 1M particles;
``vs_baseline`` is (16 ms target / measured) — >1.0 beats the BASELINE.md
target. The reference (Lua, single-threaded CPU XPBD) publishes no numbers;
extrapolating its per-pair cost to 1M particles gives O(minutes) per step, so
the target, not the reference, is the meaningful bar.

Honest measurement rules:
  - **Dependence-chained device time.** All timings run N iterations inside
    ONE dispatch (``lax.scan``) and divide; a per-call loop would measure the
    host<->device round trip (~27 ms on tunneled runtimes), not the work.
    Chains are long (10-100) so the single unavoidable RTT per trial biases
    the per-iteration number by well under a millisecond.
  - **The scene is physically packed and actually rendered.** Batches tile at
    ~2.2x batch radius so the 1M scene is as compact as collision allows
    (~8000 px across); canvases are the adaptive AABB buckets, which clamp at
    2560 px exactly like the reference (simulation_handler.lua:1953-1954),
    and the render loop draws the full 2560^2 canvas region to a 2560^2
    viewport with the frame checksum consumed on the host — nothing is
    clipped out at bin time beyond what the reference's own canvas clamp
    would drop, and nothing is lazily skipped.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np  # noqa: E402

try:
    # sitecustomize (axon plugin) imports jax before this script runs, so the
    # env var alone never reaches the already-imported config — the persistent
    # compile cache silently stays off unless set explicitly post-import.
    import jax  # noqa: E402

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
except Exception:
    pass


def build_handler(n_target: int, canvas_size=None, spacing_factor: float = 2.2):
    """A physically-packed multi-batch scene totalling ~n_target white particles."""
    from egg_fluid_simulation_tpu import (SimulationHandler,
                                          default_white_config, default_yolk_config)

    per_batch = max(200, min(n_target // 8, 5000))
    n_batches = max(1, n_target // per_batch)
    n_batches = min(n_batches, 250)
    per_batch_w = n_target // n_batches
    per_batch_y = max(2, per_batch_w // 10)

    capacity = 1 << int(np.ceil(np.log2(max(n_target + n_batches, 1024))))
    h = SimulationHandler(
        default_white_config(), default_yolk_config(),
        capacity=capacity, max_batches=256, canvas_size=canvas_size)

    side = int(np.ceil(np.sqrt(n_batches)))
    # batch radius so particles fit: area ~= n * (pi r_p^2) with r_p = 4
    batch_radius = float(np.sqrt(per_batch_w) * 4.0)
    spacing = batch_radius * spacing_factor
    for b in range(n_batches):
        x = (b % side) * spacing + spacing
        y = (b // side) * spacing + spacing
        h.add(float(x), float(y), batch_radius, batch_radius * 0.3,
              None, None, per_batch_w, per_batch_y)
    return h


def median_ms(fn, n_trials: int, warmup: int = 2) -> float:
    times = []
    for t in range(warmup + n_trials):
        t0 = time.perf_counter()
        fn()
        dt = (time.perf_counter() - t0) * 1000
        if t >= warmup:
            times.append(dt)
    return statistics.median(times)


def step_ms(h, chain: int, n_trials: int) -> float:
    """Per-step device latency: ``chain`` dependence-chained steps, one dispatch."""
    import jax

    def run():
        h.run_steps(chain)
        jax.device_get(h.state.pos[0, 0, 0])  # force completion through the tunnel

    return median_ms(run, n_trials) / chain


def step_render_ms(h, chain: int, n_trials: int) -> float:
    """Per-iteration latency of a device-resident (step -> full render) loop.

    The frame is reduced into the scan carry, so every pass of the 4-pass
    pipeline executes for every iteration; buckets/options are frozen from
    the current stats exactly as an interactive draw() would choose them.
    """
    import jax
    import jax.numpy as jnp
    from egg_fluid_simulation_tpu.ops import render as render_ops
    from egg_fluid_simulation_tpu.ops import solver as solver_ops

    h.run_steps(160)  # settle past the spawn transient (see main) + stats
                      # for the canvas bucket choice
    # honesty: let the overflow auto-bump settle the per-bin budget BEFORE
    # freezing the options — the timed frames must drop zero particles
    h.draw(viewport=(0.0, 0.0, 256, 256), check_overflow=True)
    opts2 = render_ops.frame_options(h)
    view = float(max(o.canvas_size for o in opts2))
    # viewport covers the full (clamped) canvas region around the scene centroid
    center = np.asarray(h.stats.centroid[0])
    origin = jnp.asarray(center - view / 2.0, jnp.float32)
    vw = vh = int(view)

    cfg2 = h._device_cfg2()
    options = h._options
    dt, relax = h._step_scalars(1 / 60)
    thr = jnp.float32(h._thresholding_threshold)
    smooth = jnp.float32(h._thresholding_smoothness)
    use_lighting = bool(h._use_lighting)

    # the frame loop draws at a varying interpolation alpha, like the
    # reference's accumulator-driven draw (:216, :2090); alpha cycles
    # deterministically so every frame still renders the full pipeline
    alphas = jnp.asarray(np.linspace(0.15, 1.0, chain), jnp.float32)

    def frame_fn(state, stats, t):
        a = alphas[t % chain]
        frame, _, _ = render_ops._render_frame(
            state, stats, cfg2, a, thr, smooth, origin,
            opts2, use_lighting, vw, vh, pop_caps=options.pop_caps)
        return jnp.sum(frame)

    @jax.jit
    def loop(state, ws):
        # plane-resident frame loop: step + full render per iteration, the
        # binning amortized by drift-adaptive residency like a real app's
        # persistent update->draw loop; the violence-episode state threads
        # across calls so the wide-sweep budget doesn't restart every trial
        return solver_ops.multi_step_frames(state, cfg2, dt, relax, options,
                                            chain, frame_fn, wide_state=ws)

    state = h.state
    ws = h._wide_or_init()

    def run():
        nonlocal state, ws
        state, acc, ws = loop(state, ws)
        jax.device_get(acc)

    ms = median_ms(run, n_trials) / chain
    h._state = state
    h._wide_state = ws

    # honesty: re-render one frame of the FINAL state with overflow counters
    # read and assert the per-bin render budget dropped nothing (the
    # reference drops nothing inside its canvas, :2054-2064)
    _, _, overflows = render_ops._render_frame(
        h.state, h.stats, cfg2, jnp.float32(1.0), thr, smooth, origin,
        opts2, use_lighting, vw, vh, pop_caps=options.pop_caps)
    n_dropped = int(np.asarray(overflows)[:, 0].sum())
    assert n_dropped == 0, (
        f"render budget overflow in the headline frame: {n_dropped} "
        f"particles dropped — auto-bump failed to settle")
    return ms, n_dropped


def spatial_mode() -> None:
    """``--spatial``: run the SpatialHandler benchmark on a virtual CPU mesh
    in a clean subprocess (the TPU interpreter is pinned single-chip)."""
    import subprocess

    n_devices = 8
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={n_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("JAX_PLATFORM_NAME", None)
    repo = os.path.dirname(os.path.abspath(__file__))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_cpu_spatial"
    proc = subprocess.run(
        [sys.executable, "-m",
         "egg_fluid_simulation_tpu.parallel.spatial_bench", str(n_devices)],
        env=env, cwd=repo, text=True, timeout=1800)
    sys.exit(proc.returncode)


def main() -> None:
    quick = "--quick" in sys.argv
    if "--spatial" in sys.argv:
        spatial_mode()
        return

    results = {}

    # ---- step throughput at 10k and 1M (chained device time) ----
    for label, n, chain in (("10k", 10_000, 100), ("1m", 1_000_000, 20)):
        if quick and n > 100_000:
            n = 65_536
        h = build_handler(n)
        total = sum(h.get_n_particles())
        # settle past the spawn transient: the violence-gated wide sweep
        # (SolverOptions.wide_budget_substeps) covers the explosion for up
        # to ~2 simulated seconds; the headline measures the steady state
        # an interactive app lives in, not the one-off spawn shock
        h.run_steps(160)
        ms = step_ms(h, chain, n_trials=5)
        results[f"step_ms_{label}"] = round(ms, 3)
        results[f"particle_steps_per_sec_{label}"] = round(total / ms * 1000, 0)
        del h

    # ---- step + render latency at 1M (device-resident frame loop) ----
    h = build_handler(65_536 if quick else 1_000_000)
    total = sum(h.get_n_particles())
    ms, n_dropped = step_render_ms(h, chain=10, n_trials=5)
    results["step_render_ms_1m"] = round(ms, 3)
    results["render_ms_1m"] = round(ms - results["step_ms_1m"], 3)
    results["render_overflow_dropped"] = n_dropped

    # solver honesty: settled collision-budget drop rate of the headline
    # scene (the reference drops nothing at scale; a persistent settled
    # drop rate would mean the dense grid is undersized and the timed
    # physics softer than the reference's)
    from egg_fluid_simulation_tpu.utils.profiling import collision_drop_stats
    ds = collision_drop_stats(h)
    results["collision_drop_pct_white"] = round(ds["white"]["drop_pct"], 3)
    results["max_cell_occupancy_white"] = ds["white"]["max_cell_occupancy"]

    target_ms = 16.0
    out = {
        "metric": "p50 step+render latency at 1M particles",
        "value": results["step_render_ms_1m"],
        "unit": "ms",
        "vs_baseline": round(target_ms / results["step_render_ms_1m"], 4),
        **results,
        "n_particles_headline": total,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

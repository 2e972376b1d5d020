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

Timings use dependence-chained steps and force a host read per trial — on
detached async runtimes ``block_until_ready`` alone can under-measure.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np  # noqa: E402


def build_handler(n_target: int, canvas_size: int = 512):
    """A spread-out multi-batch scene totalling ~n_target particles per population."""
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
    spacing = batch_radius * 4.0
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


def main() -> None:
    quick = "--quick" in sys.argv
    import jax

    results = {}

    # ---- step throughput at 10k and 1M ----
    for label, n in (("10k", 10_000), ("1m", 1_000_000)):
        if quick and n > 100_000:
            n = 65_536
        h = build_handler(n)
        total = sum(h.get_n_particles())

        def one_step():
            h.step_once(1 / 60)
            float(h.state.pos[0, 0, 0])  # force completion on async runtimes

        ms = median_ms(one_step, n_trials=5 if n > 100_000 else 10)
        results[f"step_ms_{label}"] = round(ms, 3)
        results[f"particle_steps_per_sec_{label}"] = round(total / ms * 1000, 0)

    # ---- step + render latency at 1M ----
    h = build_handler(65_536 if quick else 1_000_000, canvas_size=512)
    total = sum(h.get_n_particles())

    def step_and_render():
        h.step_once(1 / 60)
        frame = h.draw(viewport=(0.0, 0.0, 1024, 1024))
        float(frame[0, 0, 0])

    ms = median_ms(step_and_render, n_trials=5)
    results["step_render_ms_1m"] = round(ms, 3)

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

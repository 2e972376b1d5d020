"""Profiling and observability utilities.

The reference's only instrument is the demo's 100-frame rolling wall-time
window (test.lua:178-221); this module generalizes it and adds device-side
tracing and NaN guarding — the auxiliary subsystems SURVEY.md §5 calls for.
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import log

__all__ = ["StepTimer", "trace", "validate_state", "collision_drop_stats"]


class StepTimer:
    """Rolling window of phase timings (the demo overlay's instrument, generalized).

    Usage::

        timer = StepTimer(window=100)
        with timer.phase("step"):
            handler.update(1 / 60)
        timer.summary()  # {"step": {"p50_ms": ..., "mean_ms": ..., ...}}
    """

    def __init__(self, window: int = 100):
        self.window = window
        self._samples: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = (time.perf_counter() - t0) * 1000
            bucket = self._samples.setdefault(name, [])
            bucket.append(dt)
            if len(bucket) > self.window:
                bucket.pop(0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self._samples.items():
            out[name] = {
                "p50_ms": statistics.median(xs),
                "mean_ms": statistics.fmean(xs),
                "max_ms": max(xs),
                "n": len(xs),
            }
        return out

    def frame_usage_pct(self, name: str, frame_s: float = 1 / 60) -> float:
        """Mean phase time as % of a frame (the reference overlay's metric)."""
        xs = self._samples.get(name, [0.0])
        return statistics.fmean(xs) / (frame_s * 1000) * 100


@contextlib.contextmanager
def trace(dir_path: str):
    """Wrap a block in a ``jax.profiler`` trace (TensorBoard format)."""
    jax.profiler.start_trace(dir_path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def collision_drop_stats(handler) -> dict:
    """Host-side dense-grid budget audit for the CURRENT state.

    Per population: particles past the per-cell slot budget K in their torus
    cell ``floor(pos / cell) mod G`` — the count the dense engine would drop
    from collision this rebin (integration-only fallback). The reference
    drops nothing at scale (its 0.05 n^2 pair cutoff is astronomically
    slack above ~360 particles, simulation_handler.lua:1656-1658), so a
    HEALTHY configuration shows only transient drops: a persistent settled
    drop rate means the grid is undersized (see SimulationHandler
    ._auto_options) and dropped particles collapse onto their follow
    targets. Keys: ``drop_pct`` (of live), ``max_cell_occupancy``,
    ``mean_cell_occupancy`` per population.
    """
    state = handler.state
    options = handler._options
    active = np.asarray(state.active_mask())
    out = {}
    for pop, name in ((0, "white"), (1, "yolk")):
        cfg = handler._white_config if pop == 0 else handler._yolk_config
        cell = max(1.0, cfg["max_radius"]
                   * max(cfg["collision_overlap_factor"],
                         cfg["cohesion_interaction_distance_factor"]))
        g = options.dense_grid_dim[pop]
        k = options.dense_slots[pop]
        pos = np.asarray(state.pos[pop])[active[pop]]
        n = pos.shape[0]
        if n == 0:
            out[name] = dict(drop_pct=0.0, max_cell_occupancy=0,
                             mean_cell_occupancy=0.0)
            continue
        c = np.mod(np.floor(pos / cell).astype(np.int64), g)
        counts = np.bincount(c[:, 1] * g + c[:, 0], minlength=g * g)
        dropped = np.maximum(counts - k, 0).sum()
        occ = counts[counts > 0]
        out[name] = dict(drop_pct=100.0 * dropped / n,
                         max_cell_occupancy=int(counts.max()),
                         mean_cell_occupancy=float(occ.mean()))
    return out


def validate_state(handler, *, fatal: bool = True) -> bool:
    """NaN/overflow guard — the analog of the reference's NaN config rejection
    (simulation_handler.lua:1300-1302) applied to the running simulation.

    Returns True when every active particle is finite; otherwise raises (or
    warns when ``fatal=False``) naming the bad population.
    """
    state = handler.state
    active = np.asarray(state.active_mask())
    ok = True
    for pop, name in ((0, "white"), (1, "yolk")):
        pos = np.asarray(state.pos[pop])[active[pop]]
        vel = np.asarray(state.vel[pop])[active[pop]]
        if not (np.isfinite(pos).all() and np.isfinite(vel).all()):
            ok = False
            msg = ("validate_state: population `", name,
                   "` has non-finite positions or velocities — the solver "
                   "likely diverged (check damping >= 0.05 and strengths < 1)")
            if fatal:
                log.error(*msg)
            log.warning(*msg)
    return ok

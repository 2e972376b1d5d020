"""Checkpoint / resume — serialize the full simulation to a single .npz.

The reference has no persistence (SURVEY.md §5), but its state is fully
captured by the two SoA arrays + batch table + configs + elapsed time
(simulation_handler.lua:467-488). Here that's the :class:`ParticleState`
PyTree plus the host-side registry, so a checkpoint is one compressed npz —
also the foundation of the fidelity tests' golden trajectories.
"""

from __future__ import annotations

import json
from dataclasses import fields

import jax.numpy as jnp
import numpy as np

from .handler import SimulationHandler
from .state import ParticleState

__all__ = ["save", "load"]

_FORMAT_VERSION = 1


def save(handler, path: str) -> None:
    """Write the complete simulation state to ``path`` (npz).

    Accepts a :class:`SimulationHandler` or a multi-chip
    :class:`~.parallel.spatial_handler.SpatialHandler` — the latter syncs
    its live sharded state back into the prefix layout first, so the
    checkpoint format is identical (resume single-chip, or wrap with
    ``SpatialHandler.from_handler`` for any mesh shape)."""
    sync = getattr(handler, "_sync_inner", None)
    if sync is not None:
        sync()
        handler = handler._inner
    arrays = {f"state_{f.name}": np.asarray(getattr(handler.state, f.name))
              for f in fields(ParticleState)}
    meta = {
        "version": _FORMAT_VERSION,
        "white_config": handler.get_white_config(),
        "yolk_config": handler.get_yolk_config(),
        "batches": {str(k): v for k, v in handler._batches.items()},
        "current_batch_id": handler._current_batch_id,
        "free_slots": handler._free_slots,
        "counts": handler._counts,
        "elapsed": handler._elapsed,
        "interpolation_alpha": handler._interpolation_alpha,
        "capacity": handler._capacity,
        "max_batches": handler._max_batches,
        "canvas_size": handler._canvas_size,
        "jacobi_relaxation": handler._jacobi_relaxation,
        "use_particle_color": handler._use_particle_color,
        "use_lighting": handler._use_lighting,
        # overflow-recovery render-budget multipliers: without them a
        # resumed clustered scene silently drops splats until the next
        # draw(check_overflow=True) re-bumps
        "render_k_boost": list(handler._render_k_boost),
    }
    arrays["host_targets"] = handler._host_targets
    ws = getattr(handler, "_wide_state", None)
    if ws is not None:
        # violence-episode state (trip, budget, calm) per population — so a
        # resumed run doesn't restart the wide-sweep budget mid-episode.
        # Engines without the wide machinery (gather, per-pass rebuild)
        # leave a population's entry None; encode that as budget = -1.
        arrays["wide_state"] = np.asarray(
            [[0, -1, 0] if w is None else [int(w[0]), int(w[1]), int(w[2])]
             for w in ws], np.int64)
    np.savez_compressed(path, meta=json.dumps(meta), **arrays)


def load(path: str, *, options=None) -> SimulationHandler:
    """Reconstruct a handler (including batch registry) from ``path``."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    if meta["version"] != _FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {meta['version']}")

    handler = SimulationHandler(
        meta["white_config"], meta["yolk_config"],
        capacity=meta["capacity"], max_batches=meta["max_batches"],
        canvas_size=meta["canvas_size"],
        jacobi_relaxation=meta["jacobi_relaxation"], options=options)
    handler._use_particle_color = meta["use_particle_color"]
    handler._use_lighting = meta["use_lighting"]
    if "render_k_boost" in meta:   # absent in pre-r3 checkpoints
        handler._render_k_boost = [float(b) for b in meta["render_k_boost"]]

    kwargs = {f.name: jnp.asarray(data[f"state_{f.name}"])
              for f in fields(ParticleState)}
    handler._state = ParticleState(**kwargs)
    handler._batches = {int(k): {**v, "target": tuple(v["target"])}
                        for k, v in meta["batches"].items()}
    handler._current_batch_id = meta["current_batch_id"]
    handler._free_slots = list(meta["free_slots"])
    handler._counts = list(meta["counts"])
    handler._elapsed = meta["elapsed"]
    handler._interpolation_alpha = meta["interpolation_alpha"]
    handler._host_targets = np.asarray(data["host_targets"])
    if "wide_state" in data:
        ws = data["wide_state"]
        handler._wide_state = tuple(
            None if int(r[1]) < 0 else
            (jnp.bool_(bool(r[0])), jnp.int32(int(r[1])), jnp.int32(int(r[2])))
            for r in ws)
    handler._refresh_auto_options()   # size solver options to restored counts
    from .handler import _compute_stats
    handler._stats = _compute_stats(handler._state)
    return handler

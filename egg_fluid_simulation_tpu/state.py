"""Fixed-capacity SoA particle state — the TPU-native particle store.

The reference keeps each population in one flat Lua array with stride-20
records (``/root/reference/simulation_handler.lua:714-740``). The TPU-native
equivalent is a PyTree of fixed-capacity arrays with a leading population axis
of size 2 (0 = white, 1 = yolk), so one vmapped, jitted step advances both
populations without recompilation and without dynamic shapes:

reference field (offset)            -> here
  x, y (0, 1)                       -> ``pos``            (2, N, 2) f32
  velocity_x/y (3, 4)               -> ``vel``            (2, N, 2) f32
  previous_x/y (5, 6)               -> ``prev``           (2, N, 2) f32
  radius (7)                        -> ``radius``         (2, N)    f32
  mass_distribution_t (8)           -> ``mass_t``         (2, N)    f32
  mass / inverse_mass (9, 10)       -> ``inv_mass``       (2, N)    f32 (mass re-derived from ``mass_t``)
  cell_x / cell_y (11, 12)          -> transient, inside the grid build (ops/grid.py)
  batch_id (13)                     -> ``batch_slot``     (2, N)    i32 (index into batch arrays)
  r, g, b, a (14-17)                -> ``color``          (2, N, 4) f32
  last_update_x/y (18, 19)          -> ``last_pos``       (2, N, 2) f32
  z / render priority (2)           -> constant 0 in the reference (written :967); dropped

Batches are dense slots (the analog of the reference's ``_batch_id_to_batch``
registry at :467-469 but with static capacity so ``add``/``remove`` never
change device shapes): ``batch_target`` (B, 2), ``batch_radius`` (2, B)
(white/yolk egg radii from :889-890), ``batch_used`` (B,).

``count`` (2,) holds the number of live particles per population; live
particles always occupy the prefix ``[0, count)`` (the host handler compacts on
remove, mirroring the reference's prefix-sum compaction at :1037-1106).

``StepStats`` mirrors the per-step "environment" the reference rebuilds every
``_step`` (:1344-1390): AABB, centroid, last centroid, max radius/velocity —
kept on device so queries don't force a sync.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ParticleState", "StepStats", "zeros_state", "zeros_stats"]

N_POPULATIONS = 2  # white, yolk
WHITE, YOLK = 0, 1


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ParticleState:
    pos: jnp.ndarray          # (2, N, 2) f32
    prev: jnp.ndarray         # (2, N, 2) f32
    vel: jnp.ndarray          # (2, N, 2) f32
    last_pos: jnp.ndarray     # (2, N, 2) f32  position at start of last whole step
    radius: jnp.ndarray       # (2, N)    f32
    mass_t: jnp.ndarray       # (2, N)    f32  mass-distribution interpolant
    inv_mass: jnp.ndarray     # (2, N)    f32
    batch_slot: jnp.ndarray   # (2, N)    i32
    color: jnp.ndarray        # (2, N, 4) f32
    count: jnp.ndarray        # (2,)      i32  live particles per population
    batch_target: jnp.ndarray  # (B, 2)   f32  follow target per batch slot
    batch_radius: jnp.ndarray  # (2, B)   f32  white/yolk egg radius per batch slot
    batch_used: jnp.ndarray    # (B,)     bool

    @property
    def capacity(self) -> int:
        return self.pos.shape[1]

    @property
    def max_batches(self) -> int:
        return self.batch_target.shape[0]

    def active_mask(self) -> jnp.ndarray:
        """(2, N) bool — particle slots below the live count."""
        n = self.capacity
        idx = jnp.arange(n, dtype=jnp.int32)[None, :]
        return idx < self.count[:, None]

    def replace(self, **kw) -> "ParticleState":
        return replace(self, **kw)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class StepStats:
    """Per-population aggregates produced by each step (env analog, :1344-1390)."""
    aabb_min: jnp.ndarray        # (2, 2) f32
    aabb_max: jnp.ndarray        # (2, 2) f32
    centroid: jnp.ndarray        # (2, 2) f32
    last_centroid: jnp.ndarray   # (2, 2) f32 centroid at start of step (frame interp)
    max_radius: jnp.ndarray      # (2,)   f32
    max_velocity: jnp.ndarray    # (2,)   f32
    batch_pos_sum: jnp.ndarray   # (2, B, 2) f32  per-batch position sums
    batch_count: jnp.ndarray     # (2, B) f32     per-batch particle counts

    def batch_centroid(self, slot) -> jnp.ndarray:
        """Combined white+yolk centroid of a batch slot (reference :1134-1148)."""
        total = self.batch_count[0, slot] + self.batch_count[1, slot]
        s = self.batch_pos_sum[0, slot] + self.batch_pos_sum[1, slot]
        return s / jnp.maximum(total, 1.0)


def zeros_state(capacity: int, max_batches: int) -> ParticleState:
    f32 = jnp.float32
    n2 = (N_POPULATIONS, capacity, 2)
    n1 = (N_POPULATIONS, capacity)
    return ParticleState(
        pos=jnp.zeros(n2, f32),
        prev=jnp.zeros(n2, f32),
        vel=jnp.zeros(n2, f32),
        last_pos=jnp.zeros(n2, f32),
        radius=jnp.zeros(n1, f32),
        mass_t=jnp.zeros(n1, f32),
        inv_mass=jnp.ones(n1, f32),
        batch_slot=jnp.zeros(n1, jnp.int32),
        color=jnp.ones((N_POPULATIONS, capacity, 4), f32),
        count=jnp.zeros((N_POPULATIONS,), jnp.int32),
        batch_target=jnp.zeros((max_batches, 2), f32),
        batch_radius=jnp.ones((N_POPULATIONS, max_batches), f32),
        batch_used=jnp.zeros((max_batches,), bool),
    )


def zeros_stats(max_batches: int) -> StepStats:
    f32 = jnp.float32
    return StepStats(
        aabb_min=jnp.zeros((N_POPULATIONS, 2), f32),
        aabb_max=jnp.zeros((N_POPULATIONS, 2), f32),
        centroid=jnp.zeros((N_POPULATIONS, 2), f32),
        last_centroid=jnp.zeros((N_POPULATIONS, 2), f32),
        max_radius=jnp.ones((N_POPULATIONS,), f32),
        max_velocity=jnp.zeros((N_POPULATIONS,), f32),
        batch_pos_sum=jnp.zeros((N_POPULATIONS, max_batches, 2), f32),
        batch_count=jnp.zeros((N_POPULATIONS, max_batches), f32),
    )


def host_view(state: ParticleState) -> dict:
    """Fetch the full state to host numpy (used by add/remove and checkpoints)."""
    return {k: np.asarray(v) for k, v in jax.device_get(vars(state)).items()}

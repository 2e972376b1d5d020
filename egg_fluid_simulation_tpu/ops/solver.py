"""XPBD solver core — pure-JAX, population-vmapped, fully jitted.

TPU-native reimplementation of the reference's per-substep pipeline
(``/root/reference/simulation_handler.lua:1324-1990``):

  pre_solve (:1393-1432) -> follow constraint (:1435-1471)
  -> [grid rebuild (:1486-1511) + pair projection (:1548-1666)] x n_collision_steps
  -> post_solve (:1669-1718)

with the strength->compliance conversion ``alpha = (1 - s) / dt^2``
(:1337-1341) and the substep loop (:1821-1932) expressed as ``lax.scan``.

Design deltas from the reference (all deliberate, see SURVEY.md §5/§7):

- **Jacobi, not Gauss-Seidel.** The reference applies pair corrections in
  place, sequentially (:1625-1628, :1649-1652); order-dependent and
  unparallelizable. Here every particle accumulates its half of every
  neighboring pair's correction and all corrections apply at once, scaled by
  ``relaxation`` (an SOR-style knob; trajectories match the reference in
  envelope, not bitwise — SURVEY.md §5.3).
- **Pair dedup is free.** The reference dedups pairs with a Szudzik pair-set
  (:1584-1590) because each sequential visit applies *both* sides. In the
  Jacobi form each particle only ever applies its *own* half, and the
  candidate relation is symmetric, so processing (a,b) from both sides is
  exactly one full pair application.
- **Collision budget** becomes the grid's static ``slots_per_cell`` cap
  (ops/grid.py) instead of the global ``0.05 n^2`` counter (:1749-1753).
- **Cohesion modes.** The literal reference branch (:1608-1617) is inert for
  any non-coincident pair (SURVEY.md §5.1): same-batch pairs get
  ``interaction_distance = 0``. ``cohesion_mode="literal"`` reproduces that
  (i.e. no cohesion force); ``"spacing"`` implements the documented intent
  (README.md of the reference: cohesion acts between same-batch particles
  within ``factor * (r_a + r_b)``), driving such pairs toward that distance.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import DeviceConfig
from ..state import ParticleState, StepStats
from ..utils.mathx import EPS, jnp_mix
from . import dense as dense_ops
from . import grid as grid_ops

__all__ = ["SolverOptions", "step", "substep", "pre_solve", "solve_follow",
           "solve_pairs", "post_solve", "strength_to_compliance"]

_BIG = jnp.float32(3.4e38)


@dataclass(frozen=True)
class SolverOptions:
    """Static solver configuration (hashable; changing any field recompiles)."""
    table_size: int = 1 << 14       # gather engine: grid buckets, power of two
    slots_per_cell: int = 16        # gather engine: K, per-cell capacity cap
    cohesion_mode: str = "spacing"  # "spacing" (documented intent) | "literal"
    budget_mode: str = "ordered"    # "ordered" (reference 0.05*n^2 cutoff) | "off"
    pair_chunk: int = 1 << 15       # gather engine: sweep chunk (memory cap)
    engine: str = "gather"          # "gather" (exact, small N) | "dense" (big N)
    dense_grid_dim: int = 512       # dense engine: G (cells per axis)
    dense_slots: int = 4            # dense engine: K (slots per cell)
    use_pallas: bool = True         # dense engine: Pallas sweep on TPU
    dense_rebin: str = "substep"    # "step" (one sort/step, fastest) |
                                    # "substep" (bin per substep) |
                                    # "pass" (rebuild per collision pass, strict)
    n_substeps: int = 2             # reference default, simulation_handler.lua:170
    n_collision_steps: int = 3      # reference default, :171

    def __post_init__(self):
        assert self.table_size & (self.table_size - 1) == 0, "table_size must be a power of two"
        assert self.cohesion_mode in ("spacing", "literal")
        assert self.budget_mode in ("ordered", "off")
        assert self.engine in ("gather", "dense")
        assert self.dense_rebin in ("step", "substep", "pass")


def strength_to_compliance(strength: jnp.ndarray, sub_dt: jnp.ndarray) -> jnp.ndarray:
    """XPBD compliance-per-substep, ``(1 - clamp(s)) / dt^2`` (reference :1337-1341)."""
    return (1.0 - jnp.clip(strength, 0.0, 1.0)) / (sub_dt * sub_dt)


# ----------------------------------------------------------------- substeps --

def pre_solve(pos, prev, vel, mass_t, active, cfg: DeviceConfig, sub_dt):
    """Damped velocity integration + mass/radius re-derivation (reference :1393-1432).

    The reference re-derives mass/radius only when min/max changed
    (:1420-1430); deriving unconditionally from ``mass_t`` is branch-free and
    bit-identical, since ``mix(min, max, t)`` is deterministic.
    """
    damping_mult = 1.0 - jnp.clip(cfg.damping, 0.0, 1.0)  # :1768
    new_prev = pos
    new_vel = vel * damping_mult
    new_pos = pos + sub_dt * new_vel

    mass = jnp_mix(cfg.min_mass, cfg.max_mass, mass_t)
    inv_mass = 1.0 / jnp.maximum(mass, jnp.float32(1e-12))
    radius = jnp_mix(cfg.min_radius, cfg.max_radius, mass_t)

    keep = active[:, None]
    return (jnp.where(keep, new_pos, pos), jnp.where(keep, new_prev, prev),
            jnp.where(keep, new_vel, vel), jnp.where(active, inv_mass, 0.0),
            jnp.where(active, radius, 0.0))


def take_batch_rows(table: jnp.ndarray, idx: jnp.ndarray,
                    chunk: int = 1 << 16) -> jnp.ndarray:
    """``table[idx]`` for a small (B, C) table via chunked one-hot matmul.

    TPU row gathers cost ~4.6ns/row; for B <= a few hundred, a one-hot
    contraction on the MXU is ~5x faster at 10^6 indices. Exact: the one-hot
    matrix is 0/1 and each output row selects exactly one table row.
    """
    n = idx.shape[0]
    b = table.shape[0]
    ids = jnp.arange(b, dtype=idx.dtype)
    # hi/lo bf16 split: the one-hot is exactly representable in bf16 and each
    # output row selects ONE table row, so hi + lo reconstructs the f32 value
    # while the matmuls run at the MXU's 4x bf16 rate
    hi = table.astype(jnp.bfloat16)
    lo = (table - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def one(chunk_idx):
        onehot = (chunk_idx[:, None] == ids[None, :]).astype(jnp.bfloat16)
        return (jnp.dot(onehot, hi, preferred_element_type=jnp.float32)
                + jnp.dot(onehot, lo, preferred_element_type=jnp.float32))

    if n <= chunk:
        return one(idx)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    idx_p = jnp.pad(idx, (0, pad)).reshape(n_chunks, chunk)
    out = jax.lax.map(one, idx_p).reshape(n_chunks * chunk, -1)
    return out[:n]


def batch_segment_sums(pos, active, batch_slot, max_batches: int,
                       chunk: int = 1 << 16):
    """Per-batch position sums + counts via chunked one-hot contraction.

    Replaces a (N,)-row scatter-add (~45ns/row on TPU) with MXU matmuls; used
    for ``get_position`` (reference centroid, :1134-1148).
    """
    n = pos.shape[0]
    ids = jnp.arange(max_batches, dtype=batch_slot.dtype)

    def one(args):
        slot_c, pos_c, act_c = args
        onehot = ((slot_c[:, None] == ids[None, :]) & act_c[:, None]
                  ).astype(jnp.bfloat16)                   # (C, B)
        vals = jnp.concatenate([pos_c, jnp.ones((pos_c.shape[0], 1))], axis=1)
        # hi/lo bf16 split keeps f32 position accuracy at bf16 MXU rate
        hi = vals.astype(jnp.bfloat16)
        lo = (vals - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return (jnp.dot(onehot.T, hi, preferred_element_type=jnp.float32)
                + jnp.dot(onehot.T, lo, preferred_element_type=jnp.float32))

    if n <= chunk:
        out = one((batch_slot, pos, active))
    else:
        n_chunks = -(-n // chunk)
        pad = n_chunks * chunk - n
        slot_p = jnp.pad(batch_slot, (0, pad), constant_values=0)
        pos_p = jnp.pad(pos, ((0, pad), (0, 0)))
        act_p = jnp.pad(active, (0, pad), constant_values=False)
        parts = jax.lax.map(one, (slot_p.reshape(n_chunks, chunk),
                                  pos_p.reshape(n_chunks, chunk, 2),
                                  act_p.reshape(n_chunks, chunk)))
        out = jnp.sum(parts, axis=0)
    return out[:, :2], out[:, 2]


def solve_follow(pos, inv_mass, batch_slot, active,
                 batch_target, follow_radius, compliance):
    """Pull particles toward their batch target (reference :1435-1471).

    ``follow_radius`` is ``sqrt(batch_radius)`` per slot — the reference's
    (surprising but load-bearing) ``math.sqrt(batch.white_radius)`` at
    :1789-1792, giving a ``2*sqrt(r)`` px dead zone around the target.
    """
    table = jnp.concatenate([batch_target, follow_radius[:, None]], axis=1)
    rows = take_batch_rows(table, batch_slot)
    target = rows[:, :2]                                   # (N, 2)
    target_distance = 2.0 * rows[:, 2]                     # (N,)

    delta = target - pos
    dist = jnp.sqrt(jnp.sum(delta * delta, axis=-1))
    direction = jnp.where((dist > EPS)[:, None], delta / jnp.maximum(dist, EPS)[:, None], 0.0)

    violation = dist - target_distance
    delta_lambda = violation / (inv_mass + compliance)
    apply = active & (inv_mass > EPS) & (dist > target_distance)
    correction = direction * (delta_lambda * inv_mass)[:, None]
    return pos + jnp.where(apply[:, None], correction, 0.0)


def solve_pairs(pos, inv_mass, radius, batch_slot, active, cfg: DeviceConfig,
                collision_compliance, cohesion_compliance,
                relaxation, options: SolverOptions):
    """One grid rebuild + Jacobi pair projection pass.

    Vectorized form of ``_rebuild_spatial_hash`` + ``_solve_collision``
    (reference :1486-1511, :1548-1666) with ``_enforce_distance``'s
    symmetric-projection math (:1514-1545): correction
    ``-(dist - target) / (w_a + w_b + alpha)`` clamped to ±|violation|, each
    endpoint moving by its inverse-mass share.
    """
    n = pos.shape[0]
    max_factor = jnp.maximum(cfg.collision_overlap_factor,
                             cfg.cohesion_interaction_distance_factor)
    cell_size = jnp.maximum(1.0, cfg.max_radius * max_factor)  # :1756-1760

    grid = grid_ops.build_grid(
        pos, active, cell_size,
        table_size=options.table_size, slots_per_cell=options.slots_per_cell)
    cand = grid_ops.neighbor_candidates(grid)               # (N, 9K)

    self_idx = jnp.arange(n, dtype=jnp.int32)[:, None]
    valid = (cand >= 0) & (cand != self_idx) & active[:, None]
    safe = jnp.maximum(cand, 0)

    if options.budget_mode == "ordered":
        # Reference collision budget (:1749-1753, :1656-1658): each pass
        # examines unique pairs in particle order and stops after
        # 0.05 * n_live^2 pairs. A pair (p, q) is first examined while
        # processing m = min(p, q) (q > m is still unmarked then), so its
        # examination rank is ~ the count of pairs first seen at particles
        # before m. Pairs past the budget are dropped, both halves alike.
        # Counted pairs must be the TRUE 3x3-cell set (like the reference's
        # injective Szudzik hash) — bucket-collision phantoms are excluded.
        n_live = jnp.sum(active).astype(jnp.float32)
        max_pairs = jnp.float32(0.05) * n_live * n_live
        cell_xy = grid.cell_xy
        o_cells = cell_xy[jnp.maximum(cand, 0)]             # (N, 9K, 2)
        near = ((jnp.abs(o_cells[..., 0] - cell_xy[:, None, 0]) <= 1)
                & (jnp.abs(o_cells[..., 1] - cell_xy[:, None, 1]) <= 1))
        new_pairs = jnp.sum(valid & near & (cand > self_idx),
                            axis=1).astype(jnp.float32)
        cum = jnp.cumsum(new_pairs) - new_pairs  # exclusive prefix
    else:
        max_pairs = jnp.float32(0.0)
        cum = jnp.zeros((n,), jnp.float32)

    # Pack every per-particle field into one matrix so the candidate sweep is a
    # SINGLE row gather — separate per-field gathers cost ~5x more on TPU.
    # batch slot, budget prefix, and cell coords ride as floats (< 2^24 exact).
    # Cell coords are needed because bucket hash collisions can admit
    # non-neighbor cells whose particles still sit within the collision radius
    # (the reference's cell size under-covers it, :1756-1760) — the true 3x3
    # cell test below keeps the pair set identical to the reference's.
    cell_f = grid.cell_xy.astype(jnp.float32)
    pack = jnp.stack([pos[:, 0], pos[:, 1], inv_mass, radius,
                      batch_slot.astype(jnp.float32), cum,
                      cell_f[:, 0], cell_f[:, 1]], axis=1)  # (N, 8)
    batch_f = batch_slot.astype(jnp.float32)
    ordered = options.budget_mode == "ordered"

    def sweep(args):
        """Candidate sweep for one particle chunk -> its (C, 2) correction sum.

        Chunked so the (C, 9K, 6) gathered block stays bounded in HBM at large
        N (the unchunked (N, 9K, 6) form OOMs at ~10^5 particles).
        """
        (cand_c, valid_c, s_x, s_y, s_w, s_r, s_batch, s_cum, s_idx,
         s_cx, s_cy) = args
        safe = jnp.maximum(cand_c, 0)
        g = pack[safe]                                      # (C, 9K, 6)
        o_x, o_y = g[..., 0], g[..., 1]
        o_w = jnp.where(valid_c, g[..., 2], 0.0)
        o_r = jnp.where(valid_c, g[..., 3], 0.0)
        valid = (valid_c
                 & (jnp.abs(g[..., 6] - s_cx[:, None]) <= 1.0)
                 & (jnp.abs(g[..., 7] - s_cy[:, None]) <= 1.0))
        if ordered:
            # cum[min(self, cand)] without a second gather
            cum_min = jnp.where(cand_c < s_idx[:, None], g[..., 5], s_cum[:, None])
            valid = valid & (cum_min < max_pairs)

        dx = o_x - s_x[:, None]
        dy = o_y - s_y[:, None]
        dist2 = dx * dx + dy * dy
        dist = jnp.sqrt(dist2)
        inv_dist = jnp.where(dist > EPS, 1.0 / jnp.maximum(dist, EPS), 0.0)
        dir_x, dir_y = dx * inv_dist, dy * inv_dist         # zero when coincident

        w_sum = s_w[:, None] + o_w
        ok = valid & (w_sum >= EPS)                         # :1601

        def half_scale(target_distance, compliance, apply):
            """|correction| * w_self of ``_enforce_distance`` (:1514-1545)."""
            violation = dist - target_distance
            divisor = w_sum + compliance
            corr = jnp.where(divisor >= EPS, -violation / jnp.maximum(divisor, EPS), 0.0)
            corr = jnp.clip(corr, -jnp.abs(violation), jnp.abs(violation))  # :1535-1536
            return jnp.where(apply & ok, corr * s_w[:, None], 0.0)  # :1538-1539

        scale = jnp.zeros_like(dist)

        # cohesion (:1603-1630)
        if options.cohesion_mode == "spacing":
            same_batch = g[..., 4] == s_batch[:, None]
            coh_dist = cfg.cohesion_interaction_distance_factor * (s_r[:, None] + o_r)
            scale = scale + half_scale(coh_dist, cohesion_compliance,
                                       same_batch & (dist2 <= coh_dist * coh_dist))
        # "literal" mode: same-batch interaction distance is 0 (:1609-1613):
        # the constraint only fires for exactly coincident particles where the
        # normalized direction is the zero vector -> correction identically 0.

        # collision (:1632-1654)
        min_dist = cfg.collision_overlap_factor * (s_r[:, None] + o_r)
        scale = scale + half_scale(min_dist, collision_compliance,
                                   dist2 <= min_dist * min_dist)

        return jnp.stack([jnp.sum(-dir_x * scale, axis=1),
                          jnp.sum(-dir_y * scale, axis=1)], axis=1)

    c = min(options.pair_chunk, n)
    n_chunks = n // c
    self_idx_flat = jnp.arange(n, dtype=jnp.int32)
    args = (cand, valid, pos[:, 0], pos[:, 1], inv_mass, radius,
            batch_f, cum, self_idx_flat, cell_f[:, 0], cell_f[:, 1])
    if n_chunks <= 1:
        total = sweep(args)
    else:
        chunked = jax.tree.map(
            lambda a: a.reshape((n_chunks, c) + a.shape[1:]), args)
        total = jax.lax.map(sweep, chunked).reshape(n, 2)

    return pos + jnp.where(active[:, None], relaxation * total, 0.0)


def solve_pairs_dense(pos, inv_mass, radius, batch_slot, active, cfg: DeviceConfig,
                      collision_compliance, cohesion_compliance,
                      relaxation, options: SolverOptions):
    """Dense-engine grid rebuild + pair sweep pass (see ops/dense.py).

    Same constraint math as :func:`solve_pairs`; the neighbor structure is the
    dense plane tensor and the sweep is lane rolls (Pallas on TPU, jnp
    elsewhere) instead of candidate gathers.
    """
    g, k = options.dense_grid_dim, options.dense_slots
    lanes = g * k
    cell_size, max_pairs = _dense_setup(pos, active, cfg, options)

    binning = dense_ops.bin_to_planes(
        pos, inv_mass, radius, batch_slot, active, cell_size,
        grid_dim=g, slots_per_cell=k)
    if options.budget_mode == "ordered":
        binning = _dense_add_cum(binning, max_pairs, k, options.use_pallas)

    params = dense_ops.SweepParams(
        collision_compliance=collision_compliance,
        cohesion_compliance=cohesion_compliance,
        collision_overlap_factor=cfg.collision_overlap_factor,
        cohesion_factor=cfg.cohesion_interaction_distance_factor,
        max_pairs=max_pairs)
    cohesion = options.cohesion_mode == "spacing"
    ordered = options.budget_mode == "ordered"
    from .pallas import sweep_kernel

    corr = sweep_kernel.sweep_planes(binning.planes, params, k,
                                     cohesion=cohesion, ordered_budget=ordered,
                                     use_pallas=options.use_pallas)  # (2, G, L)
    corr_flat = corr.reshape(2, -1)
    safe_slot = jnp.minimum(binning.slot, lanes * g - 1)
    dx = jnp.where(binning.slot < lanes * g, corr_flat[0][safe_slot], 0.0)
    dy = jnp.where(binning.slot < lanes * g, corr_flat[1][safe_slot], 0.0)
    delta = jnp.stack([dx, dy], axis=1)
    return pos + jnp.where(active[:, None], relaxation * delta, 0.0)


def _dense_setup(pos, active, cfg: DeviceConfig, options: SolverOptions):
    """Cell size (auto-coarsening) + ordered-budget cutoff for the dense engine."""
    max_factor = jnp.maximum(cfg.collision_overlap_factor,
                             cfg.cohesion_interaction_distance_factor)
    ref_cell = jnp.maximum(1.0, cfg.max_radius * max_factor)  # :1756-1760
    g = options.dense_grid_dim
    big = jnp.float32(3.4e38)
    lo = jnp.min(jnp.where(active[:, None], pos, big), axis=0)
    hi = jnp.max(jnp.where(active[:, None], pos, -big), axis=0)
    extent = jnp.maximum(jnp.max(hi - lo), 0.0)
    cell_size = jnp.maximum(ref_cell, extent / (g - 2 * dense_ops.MARGIN - 1))

    if options.budget_mode == "ordered":
        n_live = jnp.sum(active).astype(jnp.float32)
        max_pairs = jnp.float32(0.05) * n_live * n_live
    else:
        max_pairs = jnp.float32(3.4e38)
    return cell_size, max_pairs


def _dense_add_cum(binning, max_pairs, k, use_pallas):
    """Ordered-budget prefix (reference :1656-1658) in grid layout."""
    from .pallas import sweep_kernel
    g_lanes = binning.planes.shape[2] * (binning.planes.shape[1] - 2 * dense_ops.ROW_PAD)
    counts = sweep_kernel.count_planes(binning.planes, k, use_pallas=use_pallas)
    safe_slot = jnp.minimum(binning.slot, g_lanes - 1)
    c_p = jnp.where(binning.slot < g_lanes, counts.reshape(-1)[safe_slot], 0.0)
    cum = jnp.cumsum(c_p) - c_p
    return dense_ops.update_cum_field(binning, cum)


def dense_collision_phase(pos, inv_mass, radius, batch_slot, active,
                          cfg: DeviceConfig, collision_compliance,
                          cohesion_compliance, relaxation,
                          options: SolverOptions, n_passes: int,
                          binning=None):
    """All collision passes of one substep on the dense grid, binned ONCE.

    The reference rebuilds its spatial hash every pass (:1866-1879), but its
    own hash goes stale across substeps anyway (SURVEY.md §5.2) and intra-
    substep movement is far below a cell, so the grid is rebuilt per substep
    and positions update *inside* the plane tensor between passes — saving the
    two most expensive TPU ops (sort + permutation scatter) per pass.
    ``dense_rebin="step"`` passes a prebuilt ``binning`` (one sort per whole
    step, positions refreshed by a row gather); ``"pass"`` rebins per pass.
    """
    k = options.dense_slots
    g = options.dense_grid_dim
    lanes = g * k
    cell_size, max_pairs = _dense_setup(pos, active, cfg, options)

    if binning is None:
        binning = dense_ops.bin_to_planes(
            pos, inv_mass, radius, batch_slot, active, cell_size,
            grid_dim=g, slots_per_cell=k)
        if options.budget_mode == "ordered":
            binning = _dense_add_cum(binning, max_pairs, k, options.use_pallas)
    else:
        binning = dense_ops.refresh_positions(binning, pos)

    params = dense_ops.SweepParams(
        collision_compliance=collision_compliance,
        cohesion_compliance=cohesion_compliance,
        collision_overlap_factor=cfg.collision_overlap_factor,
        cohesion_factor=cfg.cohesion_interaction_distance_factor,
        max_pairs=max_pairs)
    cohesion = options.cohesion_mode == "spacing"
    ordered = options.budget_mode == "ordered"
    from .pallas import sweep_kernel
    rp = dense_ops.ROW_PAD

    def one_pass(_, planes):
        corr = sweep_kernel.sweep_planes(planes, params, k, cohesion=cohesion,
                                         ordered_budget=ordered,
                                         use_pallas=options.use_pallas)
        planes = planes.at[dense_ops.FIELD_X, rp:rp + g].add(relaxation * corr[0])
        planes = planes.at[dense_ops.FIELD_Y, rp:rp + g].add(relaxation * corr[1])
        return planes

    planes = jax.lax.fori_loop(0, n_passes, one_pass, binning.planes)

    # extract final positions: one row gather per particle
    xy = jnp.stack([planes[dense_ops.FIELD_X, rp:rp + g],
                    planes[dense_ops.FIELD_Y, rp:rp + g]], axis=-1).reshape(-1, 2)
    got = xy[jnp.minimum(binning.slot, g * lanes - 1)]
    keep = (binning.slot < g * lanes) & active
    return jnp.where(keep[:, None], got, pos)


def post_solve(pos, prev, active, batch_slot, sub_dt, max_batches: int):
    """True-velocity update + centroid/max aggregates (reference :1669-1718).

    Per-batch sums for ``get_position`` are computed once per step in
    :func:`step` via :func:`batch_segment_sums` (a per-substep scatter-add
    would cost ~45ns/particle on TPU)."""
    del batch_slot, max_batches
    vel = jnp.where(active[:, None], (pos - prev) / sub_dt, 0.0)
    speed = jnp.sqrt(jnp.sum(vel * vel, axis=-1))

    n_active = jnp.maximum(jnp.sum(active), 1)
    centroid = jnp.sum(jnp.where(active[:, None], pos, 0.0), axis=0) / n_active
    max_velocity = jnp.max(jnp.where(active, speed, 0.0))
    return vel, centroid, max_velocity


def _aabb(pos, radius, active):
    """Radius-inclusive AABB over active particles (reference :1703-1709)."""
    lo = jnp.min(jnp.where(active[:, None], pos - radius[:, None], _BIG), axis=0)
    hi = jnp.max(jnp.where(active[:, None], pos + radius[:, None], -_BIG), axis=0)
    return lo, hi


def substep(pos, prev, vel, inv_mass, radius, mass_t, batch_slot, active,
            cfg: DeviceConfig, batch_target, follow_radius,
            sub_dt, relaxation, options: SolverOptions, max_batches: int,
            dense_binning=None):
    """One solver substep over a single population (reference :1821-1932)."""
    follow_c = strength_to_compliance(cfg.follow_strength, sub_dt)
    collision_c = strength_to_compliance(cfg.collision_strength, sub_dt)
    cohesion_c = strength_to_compliance(cfg.cohesion_strength, sub_dt)

    pos, prev, vel, inv_mass, radius = pre_solve(pos, prev, vel, mass_t, active, cfg, sub_dt)
    pos = solve_follow(pos, inv_mass, batch_slot, active,
                       batch_target, follow_radius, follow_c)

    if options.engine == "dense" and options.dense_rebin in ("substep", "step"):
        pos = dense_collision_phase(pos, inv_mass, radius, batch_slot, active,
                                    cfg, collision_c, cohesion_c, relaxation,
                                    options, options.n_collision_steps,
                                    binning=dense_binning)
    else:
        pair_fn = solve_pairs if options.engine == "gather" else solve_pairs_dense

        def collision_pass(_, p):
            return pair_fn(p, inv_mass, radius, batch_slot, active, cfg,
                           collision_c, cohesion_c, relaxation, options)

        pos = jax.lax.fori_loop(0, options.n_collision_steps, collision_pass, pos)

    # true-velocity update (reference :1690-1693); the aggregate stats of
    # post_solve are computed once per step in `step`, not per substep
    vel = jnp.where(active[:, None], (pos - prev) / sub_dt, 0.0)
    return pos, prev, vel, inv_mass, radius


# --------------------------------------------------------------- whole step --

@functools.partial(jax.jit, static_argnames=("options",))
def step(state: ParticleState, cfg2: DeviceConfig, step_delta: jnp.ndarray,
         relaxation: jnp.ndarray, options: SolverOptions
         ) -> Tuple[ParticleState, StepStats]:
    """One fixed step: both populations, all substeps (reference ``_step`` :1722-1989).

    ``cfg2`` is a :class:`DeviceConfig` with a leading (2,) population axis.
    Everything dynamic (configs, dt, relaxation) is traced, so live config
    edits and dt changes never recompile; only ``options`` is static.
    """
    sub_dt = jnp.maximum(step_delta / options.n_substeps, EPS)  # :1723
    active = state.active_mask()
    max_batches = state.max_batches

    # pre-step positions + centroid for frame interpolation (:1795-1818)
    last_pos = state.pos
    n_act = jnp.maximum(jnp.sum(active, axis=1), 1)
    last_centroid = (jnp.sum(jnp.where(active[..., None], state.pos, 0.0), axis=1)
                     / n_act[:, None])

    follow_radius = jnp.sqrt(jnp.maximum(state.batch_radius, 0.0))  # :1789-1792

    def one_population(pos, prev, vel, inv_mass, radius, mass_t, batch_slot,
                       act, cfg, frad):
        binning = None
        if options.engine == "dense" and options.dense_rebin == "step":
            # one sort + permutation build per STEP; substeps refresh positions
            cell_size, max_pairs = _dense_setup(pos, act, cfg, options)
            binning = dense_ops.bin_to_planes(
                pos, inv_mass, radius, batch_slot, act, cell_size,
                grid_dim=options.dense_grid_dim,
                slots_per_cell=options.dense_slots)
            if options.budget_mode == "ordered":
                binning = _dense_add_cum(binning, max_pairs,
                                         options.dense_slots, options.use_pallas)
        # unrolled substep loop (n_substeps is 2 by default; unrolling avoids
        # lax.scan carry traffic and lets XLA fuse across substep boundaries)
        for _ in range(options.n_substeps):
            pos, prev, vel, inv_mass, radius = substep(
                pos, prev, vel, inv_mass, radius, mass_t, batch_slot,
                act, cfg, state.batch_target, frad,
                sub_dt, relaxation, options, max_batches,
                dense_binning=binning)

        # per-step aggregates (the reference computes these per substep in
        # _post_solve :1669-1718; only the final values are observable)
        n_act = jnp.maximum(jnp.sum(act), 1)
        centroid = jnp.sum(jnp.where(act[:, None], pos, 0.0), axis=0) / n_act
        speed2 = jnp.sum(vel * vel, axis=-1)
        max_vel = jnp.sqrt(jnp.max(jnp.where(act, speed2, 0.0)))
        batch_sum, batch_count = batch_segment_sums(pos, act, batch_slot, max_batches)
        lo, hi = _aabb(pos, radius, act)
        mrad = jnp.max(jnp.where(act, radius, 0.0))
        return (pos, prev, vel, inv_mass, radius,
                centroid, max_vel, batch_sum, batch_count, lo, hi, mrad)

    # populations run as a Python loop (2 traces), not vmap: the Pallas sweep
    # kernel can't be batched, and the two populations share no compute
    outs = []
    for i in range(2):
        outs.append(one_population(
            state.pos[i], state.prev[i], state.vel[i], state.inv_mass[i],
            state.radius[i], state.mass_t[i], state.batch_slot[i], active[i],
            jax.tree.map(lambda a: a[i], cfg2), follow_radius[i]))
    (pos, prev, vel, inv_mass, radius,
     centroid, max_vel, batch_sum, batch_count, lo, hi, mrad) = jax.tree.map(
        lambda *xs: jnp.stack(xs), *outs)

    new_state = state.replace(pos=pos, prev=prev, vel=vel, inv_mass=inv_mass,
                              radius=radius, last_pos=last_pos)
    stats = StepStats(
        aabb_min=lo, aabb_max=hi, centroid=centroid,
        last_centroid=last_centroid, max_radius=jnp.maximum(mrad, 1.0),
        max_velocity=max_vel, batch_pos_sum=batch_sum, batch_count=batch_count)
    return new_state, stats

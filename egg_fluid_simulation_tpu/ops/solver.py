"""XPBD solver core — pure-JAX, population-vmapped, fully jitted.

TPU-native reimplementation of the reference's per-substep pipeline
(``/root/reference/simulation_handler.lua:1324-1990``):

  pre_solve (:1393-1432) -> follow constraint (:1435-1471)
  -> [grid rebuild (:1486-1511) + pair projection (:1548-1666)] x n_collision_steps
  -> post_solve (:1669-1718)

with the strength->compliance conversion ``alpha = (1 - s) / dt^2``
(:1337-1341) and the substep loop (:1821-1932) unrolled under ``jit``.

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
  (ops/grid.py, ops/dense.py) instead of the global ``0.05 n^2`` counter
  (:1749-1753); budget-dropped particles still integrate (pre-solve +
  follow), exactly like reference particles past the cutoff (:1656-1658).
- **Cohesion modes.** The literal reference branch (:1608-1617) is inert for
  any non-coincident pair (SURVEY.md §5.1): same-batch pairs get
  ``interaction_distance = 0``. ``cohesion_mode="literal"`` reproduces that
  (i.e. no cohesion force); ``"spacing"`` implements the documented intent
  (README.md of the reference: cohesion acts between same-batch particles
  within ``factor * (r_a + r_b)``), driving such pairs toward that distance.

**The dense engine runs plane-resident** (``dense_rebin="step"``, the
default): each population is sort-binned into the torus cell planes ONCE per
step — velocity, previous-position, and follow-target fields ride along —
and the whole substep pipeline (damped integration, follow constraint,
collision sweeps, velocity update) executes in grid layout as elementwise VPU
work plus the fused Pallas sweep, with a single gather extracting particle
arrays at the end of the step. This removes every intermediate sort / scatter
/ gather: the reference's own spatial hash is stale across substeps anyway
(SURVEY.md §5.2), and intra-substep motion is far below a cell.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DeviceConfig
from ..state import ParticleState, StepStats
from ..utils.mathx import EPS, jnp_mix
from . import dense as dense_ops
from . import grid as grid_ops

__all__ = ["SolverOptions", "step", "multi_step", "substep", "pre_solve",
           "solve_follow", "solve_pairs", "post_solve",
           "strength_to_compliance", "take_batch_rows", "batch_segment_sums"]

_BIG = np.float32(3.4e38)  # np scalar: no backend init at import

# aux plane field layout (ride-along fields of the plane-resident dense step)
AUX_PX = 0   # previous x (start of current substep)
AUX_PY = 1
AUX_VX = 2   # velocity
AUX_VY = 3
AUX_TX = 4   # follow target x (static within a step)
AUX_TY = 5
AUX_TD = 6   # follow dead-zone distance (2 * sqrt(batch_radius))
N_AUX = 7


def _per_pop(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else (int(v[0]), int(v[1]))


@dataclass(frozen=True)
class SolverOptions:
    """Static solver configuration (hashable; changing any field recompiles).

    ``dense_grid_dim`` / ``dense_slots`` / ``pop_caps`` may be a single int
    (both populations) or a (white, yolk) tuple — the yolk population is
    typically ~10x smaller (reference add() area math, :52-58), so giving it
    its own grid and particle-slice capacity removes ~45%% of step cost.
    """
    table_size: int = 1 << 14       # gather engine: grid buckets, power of two
    slots_per_cell: int = 16        # gather engine: K, per-cell capacity cap
    cohesion_mode: str = "spacing"  # "spacing" (documented intent) | "literal"
    budget_mode: str = "ordered"    # "ordered" (reference 0.05*n^2 cutoff) | "off"
    pair_chunk: int = 1 << 15       # gather engine: sweep chunk (memory cap)
    engine: str = "gather"          # "gather" (exact, small N) | "dense" (big N)
    dense_grid_dim: Union[int, Tuple[int, int]] = 512  # dense: G per population
    dense_slots: Union[int, Tuple[int, int]] = 4       # dense: K per population
    use_pallas: bool = True         # dense engine: Pallas sweep on TPU
    dense_rebin: str = "step"       # "step" (one sort/step, plane-resident) |
                                    # "substep" (rebin per substep) |
                                    # "pass" (rebuild per collision pass, strict)
    n_substeps: int = 2             # reference default, simulation_handler.lua:170
    n_collision_steps: int = 3      # reference default, :171
    pop_caps: Optional[Union[int, Tuple[int, int]]] = None  # static per-pop
                                    # particle-slice size; None = full capacity.
                                    # INVARIANT: each cap must be >= the live
                                    # particle count of its population — the
                                    # step only touches rows [0, cap), so an
                                    # undersized cap silently freezes live
                                    # particles beyond it. SimulationHandler
                                    # enforces this on every step entry.
    adaptive_rebin: bool = True     # multi_step fast-forward: keep state
                                    # plane-resident across steps, rebinning
                                    # only when accumulated drift exceeds
                                    # cell_size/4 (see _population_multi_dense)
    rebin_tolerance: float = 1e-3   # fraction of live particles allowed past
                                    # the drift bound before a rebin fires;
                                    # outliers meanwhile lose pairs exactly
                                    # like budget-dropped particles (the
                                    # reference's own 0.05 n^2 cutoff drops
                                    # far more at scale). 0.0 = strict.
    wide_threshold_cells: float = 0.5  # violence gate of the WIDE sweep
                                    # (_adaptive_substep_run): a substep whose
                                    # relative motion exceeds this fraction of
                                    # a cell for more than ``wide_tolerance``
                                    # of live particles runs the next substep
                                    # with per-pass-rebuild-equivalent pair
                                    # freshness (window=3 + fresh mask).
                                    # Looser than the rebin gate on purpose:
                                    # the wide sweep costs ~4x a narrow pass,
                                    # and a sub-percent tail of fast movers
                                    # transiently losing pairs is the same
                                    # class of error as the reference's own
                                    # 0.05 n^2 budget cutoff — macroscopic
                                    # violent transients (spawn explosions,
                                    # impacts) are what the gate must catch
                                    # (tests/test_fidelity_native.py).
    wide_tolerance: float = 0.02    # fraction of live particles past the
                                    # wide threshold before violence engages
    wide_budget_substeps: int = 240 # wide substeps per violent EPISODE: the
                                    # wide sweep targets TRANSIENT violence
                                    # (spawn explosions, impacts — the
                                    # regimes the 500/5k fidelity gates
                                    # measure, whose violent phases run
                                    # ~30 steps = 180 substeps). A scene
                                    # that stays violent past the budget is
                                    # statistically-stationary chaos (e.g. a
                                    # permanently boiling 100%-packed
                                    # scene), where per-pass pair fidelity
                                    # has no trajectory meaning — it reverts
                                    # to the narrow fast path until calm
                                    # re-arms the trigger. 240 substeps =
                                    # 2 s of simulated time at the 60 Hz / 2
                                    # substep defaults.
    wide_rearm_substeps: int = 12   # consecutive calm substeps that end an
                                    # episode and refill the budget
    occ_pressure_cap: float = 8.0   # occupancy-pressure boost cap (see
                                    # dense.SweepParams.occ_boost_cap): in a
                                    # cell of occupancy c > K each resolved
                                    # pair's correction scales by
                                    # clip(c/K, 1, cap), standing in for the
                                    # over-budget partners the reference
                                    # would have resolved (:1548-1666).
                                    # Without it the follow pull (unbounded)
                                    # over-compresses crowded scenes ~4x
                                    # past honest packing. <= 1 disables.
                                    # No effect on the ordered-budget path
                                    # (FIELD_OCC stays 0/1 there).
    sweep_symmetric: bool = False   # Pallas sweep: evaluate each unordered
                                    # pair once and scatter both sides (same
                                    # math to float rounding, ~half the pair
                                    # terms + per-block spill fold; see
                                    # sweep_kernel._pair_terms_sym)
    stale_hash_compat: bool = False # reproduce the reference's stale
                                    # pair-set quirk (SURVEY.md §5.2): the
                                    # hash + examined-pair set are cleared at
                                    # step start (:1375-1377) and between
                                    # collision passes WITHIN a substep
                                    # (:1905-1912, guarded by collision_i <
                                    # n_collision_steps) but NOT between
                                    # substeps — so substep >= 2's first
                                    # pass skips every pair already adjacent
                                    # in the previous substep's last pass.
                                    # Under the dense engine's per-step
                                    # binning, cell membership is frozen
                                    # within a step, so that suppression is
                                    # EXACTLY "substeps >= 2 run one fewer
                                    # collision pass" (with dense_rebin=
                                    # "substep" the engine rebins where the
                                    # reference inserts into a dirty table:
                                    # newly-adjacent pairs are then skipped
                                    # too — documented deviation). Dense
                                    # engine only. Default OFF: clean
                                    # per-pass semantics.

    def __post_init__(self):
        assert self.table_size & (self.table_size - 1) == 0, "table_size must be a power of two"
        assert self.cohesion_mode in ("spacing", "literal")
        assert self.budget_mode in ("ordered", "off")
        assert self.engine in ("gather", "dense")
        assert self.dense_rebin in ("step", "substep", "pass")
        assert not (self.stale_hash_compat and self.engine != "dense"), (
            "stale_hash_compat emulates the reference's substep-stale pair "
            "set on the dense engine's frozen-membership passes")
        object.__setattr__(self, "dense_grid_dim", _per_pop(self.dense_grid_dim))
        object.__setattr__(self, "dense_slots", _per_pop(self.dense_slots))
        if self.pop_caps is not None:
            object.__setattr__(self, "pop_caps", _per_pop(self.pop_caps))


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


def _follow_delta(x, y, inv_mass, apply_mask, tx, ty, td, compliance):
    """XPBD follow-constraint correction, shape-generic (reference :1435-1471).

    Returns (dx, dy) to add to positions. Works on (N,) particle vectors and
    (rows, lanes) plane tensors alike; ``td`` is the ``2*sqrt(batch_radius)``
    dead-zone distance (:1789-1792)."""
    dx = tx - x
    dy = ty - y
    dist = jnp.sqrt(dx * dx + dy * dy)
    inv_dist = jnp.where(dist > EPS, 1.0 / jnp.maximum(dist, EPS), 0.0)
    violation = dist - td
    delta_lambda = violation / (inv_mass + compliance)
    apply = apply_mask & (inv_mass > EPS) & (dist > td)
    scale = jnp.where(apply, delta_lambda * inv_mass * inv_dist, 0.0)
    return dx * scale, dy * scale


def solve_follow(pos, inv_mass, batch_slot, active,
                 batch_target, follow_radius, compliance):
    """Pull particles toward their batch target (reference :1435-1471).

    ``follow_radius`` is ``sqrt(batch_radius)`` per slot — the reference's
    (surprising but load-bearing) ``math.sqrt(batch.white_radius)`` at
    :1789-1792, giving a ``2*sqrt(r)`` px dead zone around the target.
    """
    table = jnp.concatenate([batch_target, follow_radius[:, None]], axis=1)
    rows = take_batch_rows(table, batch_slot)
    dx, dy = _follow_delta(pos[:, 0], pos[:, 1], inv_mass, active,
                           rows[:, 0], rows[:, 1], 2.0 * rows[:, 2], compliance)
    return pos + jnp.stack([dx, dy], axis=1)


def solve_pairs(pos, inv_mass, radius, batch_slot, active, cfg: DeviceConfig,
                collision_compliance, cohesion_compliance,
                relaxation, options: SolverOptions):
    """One grid rebuild + Jacobi pair projection pass (gather engine).

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


# ------------------------------------------------- dense engine (per-pass) --

def _dense_params(cfg: DeviceConfig, active, collision_compliance,
                  cohesion_compliance, options: SolverOptions):
    """Cell size + sweep params; the torus grid never coarsens (ops/dense.py)."""
    max_factor = jnp.maximum(cfg.collision_overlap_factor,
                             cfg.cohesion_interaction_distance_factor)
    cell_size = jnp.maximum(1.0, cfg.max_radius * max_factor)  # :1756-1760
    if options.budget_mode == "ordered":
        n_live = jnp.sum(active).astype(jnp.float32)
        max_pairs = jnp.float32(0.05) * n_live * n_live
    else:
        max_pairs = _BIG
    params = dense_ops.SweepParams(
        collision_compliance=collision_compliance,
        cohesion_compliance=cohesion_compliance,
        collision_overlap_factor=cfg.collision_overlap_factor,
        cohesion_factor=cfg.cohesion_interaction_distance_factor,
        max_pairs=max_pairs,
        cell_size=cell_size,  # fresh-cell pair mask of the wide sweep
        occ_boost_cap=jnp.float32(options.occ_pressure_cap))
    return cell_size, params


def _dense_add_cum(binning, k, use_pallas):
    """Ordered-budget prefix (reference :1656-1658) in grid layout."""
    from .pallas import sweep_kernel
    g_lanes = binning.planes.shape[2] * (binning.planes.shape[1]
                                         - 2 * dense_ops.ROW_PAD)
    counts = sweep_kernel.count_planes(binning.planes, k, use_pallas=use_pallas)
    safe_slot = jnp.minimum(binning.slot, g_lanes - 1)
    c_p = jnp.where(binning.slot < g_lanes, counts.reshape(-1)[safe_slot], 0.0)
    cum = jnp.cumsum(c_p) - c_p
    return dense_ops.update_cum_field(binning, cum)


def solve_pairs_dense(pos, inv_mass, radius, batch_slot, active,
                      cfg: DeviceConfig, collision_compliance,
                      cohesion_compliance, relaxation, options: SolverOptions,
                      g: int, k: int):
    """Dense-engine grid rebuild + pair sweep, one pass (``dense_rebin="pass"``,
    the strict per-pass rebuild matching the reference's :1866-1879)."""
    lanes = g * k
    cell_size, params = _dense_params(cfg, active, collision_compliance,
                                      cohesion_compliance, options)
    from .pallas import place_kernel
    binning = dense_ops.bin_to_planes(
        pos, inv_mass, radius, batch_slot, active, cell_size,
        grid_dim=g, slots_per_cell=k,
        use_placement=(options.use_pallas
                       and options.budget_mode != "ordered"
                       and place_kernel.on_tpu()),
        rotate=options.budget_mode != "ordered")
    if options.budget_mode == "ordered":
        binning = _dense_add_cum(binning, k, options.use_pallas)

    from .pallas import sweep_kernel
    corr = sweep_kernel.sweep_planes(
        binning.planes, params, k,
        cohesion=options.cohesion_mode == "spacing",
        ordered_budget=options.budget_mode == "ordered",
        use_pallas=options.use_pallas,
        symmetric=options.sweep_symmetric)                 # (2, G, L)
    corr_flat = corr.reshape(2, -1)
    safe_slot = jnp.minimum(binning.slot, lanes * g - 1)
    dx = jnp.where(binning.slot < lanes * g, corr_flat[0][safe_slot], 0.0)
    dy = jnp.where(binning.slot < lanes * g, corr_flat[1][safe_slot], 0.0)
    delta = jnp.stack([dx, dy], axis=1)
    return pos + jnp.where(active[:, None], relaxation * delta, 0.0)


# ------------------------------------------ dense engine (plane-resident) --

def _plane_substeps(pos, vel, inv_mass, radius, batch_slot, act,
                    tx, ty, td, damp, follow_c, cell_size, params,
                    sub_dt, relaxation, options: SolverOptions,
                    g: int, k: int, n_sub: int, first_substep: bool = True):
    """Run ``n_sub`` substeps entirely in plane layout after ONE binning.

    Returns (pos, prev, vel) for collision-participating particles plus the
    drop mask for the fallback path. Empty slots hold all-zero fields, and
    every update below maps zeros to zeros, so no occupancy masking is needed
    outside the sweep kernel (which tests FIELD_OCC). Halo rows carry
    consistent copies of their source rows: elementwise updates preserve that
    invariant automatically; only the sweep correction (computed for real
    rows) requires a halo refresh.
    """
    from .pallas import place_kernel, sweep_kernel
    rp = dense_ops.ROW_PAD
    lanes = g * k
    cohesion = options.cohesion_mode == "spacing"
    ordered = options.budget_mode == "ordered"
    use_placement = (options.use_pallas and not ordered
                     and place_kernel.on_tpu())

    aux_cols = jnp.stack([pos[:, 0], pos[:, 1], vel[:, 0], vel[:, 1],
                          tx, ty, td], axis=1)
    binning = dense_ops.bin_to_planes(
        pos, inv_mass, radius, batch_slot, act, cell_size,
        grid_dim=g, slots_per_cell=k, aux_cols=aux_cols,
        use_placement=use_placement, rotate=not ordered)
    if ordered:
        binning = _dense_add_cum(binning, k, options.use_pallas)
    planes, aux = binning.planes, binning.aux

    planes, aux = _plane_run(planes, aux, damp, follow_c, params, sub_dt,
                             relaxation, options, g, k, n_sub,
                             cohesion=cohesion, ordered=ordered,
                             first_substep=first_substep)
    return _plane_extract(planes, aux, binning.slot, g, lanes, sub_dt=sub_dt)


def _plane_run(planes, aux, damp, follow_c, params, sub_dt, relaxation,
               options: SolverOptions, g: int, k: int, n_sub: int,
               *, cohesion: bool, ordered: bool, wide: bool = False,
               first_substep: bool = True):
    """``n_sub`` substeps of the whole pipeline in plane layout (no binning,
    no extraction) — shared by the per-step path and the plane-resident
    fast-forward (:func:`_population_multi_dense`). ``wide`` selects the
    violent-phase +-3-cell sweep with the fresh-cell pair mask.
    ``first_substep`` marks whether substep 0 of this call is the step's
    first: with ``options.stale_hash_compat`` every NON-first substep runs
    one fewer collision pass (the reference's substep-stale pair set,
    SURVEY.md §5.2 / reference :1905-1912 — see SolverOptions)."""
    from .pallas import sweep_kernel
    rp = dense_ops.ROW_PAD

    def collision_pass(_, pl):
        # wide window = 3: stale cell distance of a fresh-adjacent pair is
        # bounded by 1 (fresh adjacency) + 2 (each partner crossing one cell
        # boundary since bin time) while per-particle drift < 1 cell — the
        # exact envelope tests/test_sweep_kernel.py proves against a rebuilt
        # binning (interaction reach is up to 2x cell_size: min_d =
        # overlap_f * (r_a + r_b) vs cell = max_radius * max_factor,
        # ops/dense.py + reference :1756-1760)
        corr = sweep_kernel.sweep_planes(pl, params, k, cohesion=cohesion,
                                         ordered_budget=ordered,
                                         use_pallas=options.use_pallas,
                                         window=3 if wide else 1,
                                         fresh_mask=wide,
                                         symmetric=options.sweep_symmetric)
        pl = pl.at[dense_ops.FIELD_X, rp:rp + g].add(relaxation * corr[0])
        pl = pl.at[dense_ops.FIELD_Y, rp:rp + g].add(relaxation * corr[1])
        return dense_ops.refresh_halo_xy(pl)

    for s in range(n_sub):
        # pre-solve (:1393-1432): damped integration; mass/radius already
        # derived once per step (deterministic re-derivation, :1420-1430)
        px, py = planes[dense_ops.FIELD_X], planes[dense_ops.FIELD_Y]
        vx = aux[AUX_VX] * damp
        vy = aux[AUX_VY] * damp
        aux = (aux.at[AUX_PX].set(px).at[AUX_PY].set(py)
                  .at[AUX_VX].set(vx).at[AUX_VY].set(vy))
        x = px + sub_dt * vx
        y = py + sub_dt * vy
        # follow constraint (:1435-1471) — target fields plane-resident
        dx, dy = _follow_delta(x, y, planes[dense_ops.FIELD_W],
                               planes[dense_ops.FIELD_OCC] > 0.0,
                               aux[AUX_TX], aux[AUX_TY], aux[AUX_TD], follow_c)
        planes = (planes.at[dense_ops.FIELD_X].set(x + dx)
                        .at[dense_ops.FIELD_Y].set(y + dy))
        # collision passes (:1866-1913); stale_hash_compat drops one pass
        # on non-first substeps (the reference's substep-stale pair set
        # suppresses every already-adjacent pair there, :1905-1912)
        n_passes = options.n_collision_steps
        if options.stale_hash_compat and not (first_substep and s == 0):
            n_passes = max(n_passes - 1, 0)
        planes = jax.lax.fori_loop(0, n_passes, collision_pass, planes)
        # post-solve velocity (:1690-1693)
        aux = (aux.at[AUX_VX].set((planes[dense_ops.FIELD_X] - aux[AUX_PX])
                                  / sub_dt)
                  .at[AUX_VY].set((planes[dense_ops.FIELD_Y] - aux[AUX_PY])
                                  / sub_dt))

    return planes, aux


# -------------------------------------- dense engine (fused component path) --
#
# The production TPU fast path: positions/previous-positions in UNPADDED
# (2, G, L) tensors, step-static pair fields (W, R, BATCH, OCC) in a
# (4, G, L) tensor, follow targets in (3, G, L) — and each collision pass is
# ONE Pallas kernel producing updated positions directly
# (ops/pallas/sweep_kernel.substep_pass). The first pass of a substep fuses
# the substep prologue (damped integration + follow constraint) into its own
# kernel prologue. Velocity is never stored: ``prev`` encodes it exactly
# (``v = (x - prev) / sub_dt``), so damped integration is the recurrence
# ``x += damp * (x - prev)`` — bit-identical to the explicit velocity form.
# This removes every per-substep full-tensor XLA traversal (aux rewrites,
# follow delta, correction add, halo refresh) that dominated the step at 1M
# (round-5 profile: ~39 ms of non-sweep cost per step).


def _fused_component_path(options: "SolverOptions") -> bool:
    """Whether the fused component-layout substep path applies."""
    from .pallas import sweep_kernel
    return (options.use_pallas
            and options.budget_mode == "off"
            and not options.sweep_symmetric
            and options.n_collision_steps >= 1
            and not (options.stale_hash_compat
                     and options.n_collision_steps < 2)
            and (sweep_kernel._on_tpu() or sweep_kernel.FORCE_INTERPRET))


def _bin_components(p, v, inv_mass, radius, batch_slot, act, cell_size,
                    tx, ty, td, sub_dt, g: int, k: int, use_placement: bool,
                    occ_cap: float = 8.0):
    """Sort-bin directly into the fused component layout.

    Only 5 aux columns ride along (previous position x/y + follow targets):
    ``prev`` is initialized to ``pos - sub_dt * vel`` so the first damped
    integration ``x + damp * (x - prev)`` reproduces ``x + sub_dt * damp *
    vel`` to float rounding (the subtraction reassociates ``dt * vel`` —
    sub-ulp-of-position, measured max rel ~5e-7 vs the legacy velocity
    form) — and extraction's derived velocity is the input velocity even
    when zero substeps ran.

    ``stat`` row 3 holds the PRECOMPUTED occupancy-pressure boost
    (``clip(count / k, 1, occ_cap)``; 0 = empty slot) — occupancy is static
    within a step, so the fused kernels read it instead of re-deriving the
    clip per pair term (sweep_kernel occ_is_boost). Returns
    (xy, prev, stat, follow, slot)."""
    aux_cols = jnp.stack([p[:, 0] - sub_dt * v[:, 0],
                          p[:, 1] - sub_dt * v[:, 1], tx, ty, td], axis=1)
    binning = dense_ops.bin_to_planes(
        p, inv_mass, radius, batch_slot, act, cell_size,
        grid_dim=g, slots_per_cell=k, aux_cols=aux_cols,
        use_placement=use_placement, rotate=True)
    rp = dense_ops.ROW_PAD
    core = binning.planes[:, rp:rp + g]
    a = binning.aux[:, rp:rp + g]
    occ = core[dense_ops.FIELD_OCC]
    boost = jnp.where(occ > 0.0,
                      jnp.clip(occ * (1.0 / k), 1.0, max(occ_cap, 1.0)),
                      0.0)
    stat = jnp.stack([core[dense_ops.FIELD_W], core[dense_ops.FIELD_R],
                      core[dense_ops.FIELD_BATCH], boost])
    return core[:2], a[0:2], stat, a[2:5], binning.slot


def _fused_run(xy, prev, stat, follow, damp, follow_c, params, sub_dt,
               relaxation, options: "SolverOptions", g: int, k: int,
               n_sub: int, *, cohesion: bool, wide: bool = False,
               first_substep: bool = True):
    """``n_sub`` substeps in component layout — the fused analog of
    :func:`_plane_run` (kernel-resident prologue, no elementwise XLA)."""
    del sub_dt, g  # encoded in prev / the tensor shapes
    from .pallas import sweep_kernel
    interp = not sweep_kernel._on_tpu()
    aux_scalars = (damp, follow_c, relaxation)
    window = 3 if wide else 1
    for s in range(n_sub):
        n_passes = options.n_collision_steps
        if options.stale_hash_compat and not (first_substep and s == 0):
            n_passes = max(n_passes - 1, 0)
        xy, prev = sweep_kernel.substep_pass(
            xy, stat, params, aux_scalars, k, cohesion=cohesion,
            window=window, fresh_mask=wide, prev=prev, follow=follow,
            integrate=True, interpret=interp)
        for _ in range(n_passes - 1):
            xy = sweep_kernel.substep_pass(
                xy, stat, params, aux_scalars, k, cohesion=cohesion,
                window=window, fresh_mask=wide, interpret=interp)
    return xy, prev


def _comp_extract(xy, prev, stat, slot, g: int, lanes: int, sub_dt):
    """Component-layout extraction — one gather, velocity derived exactly
    (mirrors :func:`_plane_extract`; valid at any substep count because
    ``prev`` encodes the input velocity at bin time)."""
    ext = jnp.stack([xy[0], xy[1], prev[0], prev[1], stat[3]],
                    axis=-1).reshape(-1, 5)
    safe = jnp.minimum(slot, g * lanes - 1)
    got = ext[safe]
    in_grid = (slot < g * lanes) & (got[:, 4] > 0.0)
    p = got[:, 0:2]
    pr = got[:, 2:4]
    return p, pr, (p - pr) / sub_dt, in_grid


def _comp_drift_over(xy, occ, ref_xy, thresh2):
    """Relative-drift count in component layout (mirrors
    :func:`_plane_drift_over`, no halo rows to skip)."""
    occ01 = jnp.minimum(occ, 1.0)
    n_occ = jnp.maximum(jnp.sum(occ01), 1.0)
    dxp = (xy[0] - ref_xy[0]) * occ01
    dyp = (xy[1] - ref_xy[1]) * occ01
    mx = jnp.sum(dxp) / n_occ
    my = jnp.sum(dyp) / n_occ
    rel2 = (dxp - mx * occ01) ** 2 + (dyp - my * occ01) ** 2
    return jnp.sum(rel2 > thresh2), n_occ, jnp.stack([mx, my])


def _fused_adaptive_run(xy, prev, stat, follow, fb_p, fb_prev, fb_v,
                        fallback_substep, act, cell_size, damp, follow_c,
                        params, sub_dt, relaxation, options: "SolverOptions",
                        g: int, k: int, n_sub: int, *, cohesion: bool,
                        wide=None):
    """Violence-gated substep runner in component layout — the fused analog
    of :func:`_adaptive_substep_run` (same gate, same episode budget)."""
    if options.wide_budget_substeps == 0:
        if wide is None:
            wide = wide_state_init(options)
        for s in range(n_sub):
            xy, prev = _fused_run(xy, prev, stat, follow, damp, follow_c,
                                  params, sub_dt, relaxation, options, g, k,
                                  1, cohesion=cohesion, wide=False,
                                  first_substep=(s == 0))
            fb_p, fb_prev, fb_v = fallback_substep(fb_p, fb_v)
        return xy, prev, fb_p, fb_prev, fb_v, wide

    thresh2 = (options.wide_threshold_cells * cell_size) ** 2
    wide_tol = options.wide_tolerance
    rearm = jnp.int32(options.wide_rearm_substeps)
    full_budget = jnp.int32(options.wide_budget_substeps)
    n_live = jnp.maximum(jnp.sum(act), 1)
    occ01 = jnp.minimum(stat[3], 1.0)
    n_occ = jnp.maximum(jnp.sum(occ01), 1.0)
    # velocity-predicted first-substep trip: (x - prev) == vel * sub_dt
    pdx = (xy[0] - prev[0]) * occ01
    pdy = (xy[1] - prev[1]) * occ01
    mx = jnp.sum(pdx) / n_occ
    my = jnp.sum(pdy) / n_occ
    rel2 = (pdx - mx * occ01) ** 2 + (pdy - my * occ01) ** 2
    pred_trip = jnp.sum(rel2 > thresh2) > wide_tol * n_live
    if wide is None:
        wide = wide_state_init(options)
    trip, budget, calm = wide
    trip = trip | pred_trip
    move_ref = xy
    for s in range(n_sub):
        wide_now = trip & (budget > 0)

        def run(w, first=s == 0):
            def f(c):
                x, p = c
                return _fused_run(x, p, stat, follow, damp, follow_c,
                                  params, sub_dt, relaxation, options, g, k,
                                  1, cohesion=cohesion, wide=w,
                                  first_substep=first)
            return f

        xy, prev = jax.lax.cond(wide_now, run(True), run(False), (xy, prev))
        budget = jnp.where(wide_now, budget - 1, budget)
        fb_p, fb_prev, fb_v = fallback_substep(fb_p, fb_v)
        n_over, _, _ = _comp_drift_over(xy, stat[3], move_ref, thresh2)
        move_ref = xy
        trip = n_over > wide_tol * n_live
        calm = jnp.where(trip, 0, calm + 1)
        budget = jnp.where(calm >= rearm, full_budget, budget)
    return xy, prev, fb_p, fb_prev, fb_v, (trip, budget, calm)


def _plane_drift_over(planes, ref_xy, g: int, thresh2):
    """Count of occupied real-row slots whose RELATIVE drift (vs the
    population-mean displacement) since bin time exceeds ``thresh2``.

    Uniform translation shifts every torus cell equally, so only
    differential motion can invalidate the 3x3 pair windows."""
    rp = dense_ops.ROW_PAD
    # FIELD_OCC holds cell COUNTS on product paths — normalize to 0/1 so
    # the drift metric weights slots, not occupancies
    occ = jnp.minimum(planes[dense_ops.FIELD_OCC, rp:rp + g], 1.0)
    n_occ = jnp.maximum(jnp.sum(occ), 1.0)
    dxp = (planes[dense_ops.FIELD_X, rp:rp + g] - ref_xy[0, rp:rp + g]) * occ
    dyp = (planes[dense_ops.FIELD_Y, rp:rp + g] - ref_xy[1, rp:rp + g]) * occ
    mx = jnp.sum(dxp) / n_occ
    my = jnp.sum(dyp) / n_occ
    rel2 = (dxp - mx * occ) ** 2 + (dyp - my * occ) ** 2
    return jnp.sum(rel2 > thresh2), n_occ, jnp.stack([mx, my])


def wide_state_init(options: "SolverOptions"):
    """Fresh violence-episode state ``(trip, budget, calm)`` for the
    wide-sweep gate (see :func:`_adaptive_substep_run`)."""
    return (jnp.bool_(False), jnp.int32(options.wide_budget_substeps),
            jnp.int32(0))


def _adaptive_substep_run(planes, aux, fb_p, fb_prev, fb_v,
                          fallback_substep, act, cell_size, damp,
                          follow_c, params, sub_dt, relaxation,
                          options: SolverOptions, g: int, k: int, n_sub: int,
                          *, cohesion: bool, ordered: bool, wide=None):
    """``n_sub`` substeps with a VIOLENCE-GATED wide pair sweep.

    Measured on the 500-particle settle explosion vs the sequential oracle:
    per-step binning errs ~20%% in spread, per-SUBSTEP binning ~20%% too,
    per-PASS rebuild 0.1%% — the whole fast-path fidelity gap (VERDICT r2
    weak #5) is pair-membership staleness WITHIN a substep's collision
    passes, which no rebinning cadence short of per-pass (6 sorts/step) can
    fix. The wide sweep fixes it without sorts: positions in the planes are
    always current (corrections apply in place), so scanning +-3 STALE cells
    and admitting only pairs whose FRESH cells are within +-1 reproduces the
    per-pass-rebuilt pair set exactly while intra-step drift stays under one
    cell. The gate: a substep whose relative motion tripped the drift metric
    flags the NEXT substep wide (one-substep lag; violent phases persist for
    many substeps). Calm scenes pay one cheap metric per substep; the wide
    sweep costs ~4x a narrow one only while violence lasts.

    Violence response is per EPISODE: an uninterrupted violent phase gets
    the wide sweep for up to ``options.wide_budget_substeps`` substeps —
    enough to cover the whole transient the fidelity gates measure — after
    which a scene that is STILL violent is statistically-stationary chaos
    (a permanently boiling packed scene) and reverts to the narrow fast
    path; ``wide_rearm_substeps`` consecutive calm substeps end the episode
    and refill the budget, so the next real transient is caught again.

    Returns ``(planes, aux, fb_p, fb_prev, fb_v, wstate)`` where ``wstate =
    (trip, budget, calm)`` — callers with step-resident state carry it
    across steps so violence detected at a step's end widens the next
    step's first substep too (see :func:`wide_state_init`).
    """
    if options.wide_budget_substeps == 0:
        # STATIC wide disable: no violence metrics, no lax.cond, and — the
        # big one — no wide (window=3) Pallas kernel in the graph at all.
        # The cond otherwise compiles BOTH branches per substep, roughly
        # doubling the resident graph's cold-compile time (VERDICT r3 #1),
        # and the fully-unrolled wide kernel is the slowest single compile.
        # Calm scenes take the narrow path under the gate anyway, so a
        # caller that knows its scene is settled loses nothing.
        if wide is None:
            wide = wide_state_init(options)
        for s in range(n_sub):
            planes, aux = _plane_run(planes, aux, damp, follow_c, params,
                                     sub_dt, relaxation, options, g, k, 1,
                                     cohesion=cohesion, ordered=ordered,
                                     wide=False, first_substep=(s == 0))
            fb_p, fb_prev, fb_v = fallback_substep(fb_p, fb_v)
        return planes, aux, fb_p, fb_prev, fb_v, wide

    thresh2 = (options.wide_threshold_cells * cell_size) ** 2
    wide_tol = options.wide_tolerance
    rearm = jnp.int32(options.wide_rearm_substeps)
    full_budget = jnp.int32(options.wide_budget_substeps)
    rp = dense_ops.ROW_PAD
    n_live = jnp.maximum(jnp.sum(act), 1)
    # velocity-PREDICTED movement widens the very first substep too:
    # stateless callers (step/step_once) reset the state every step, and
    # sustained violence is visible in the incoming velocity field (only a
    # cold spawn explosion's first substep escapes both detectors)
    occ = jnp.minimum(planes[dense_ops.FIELD_OCC, rp:rp + g], 1.0)
    n_occ = jnp.maximum(jnp.sum(occ), 1.0)
    pdx = aux[AUX_VX, rp:rp + g] * occ * sub_dt
    pdy = aux[AUX_VY, rp:rp + g] * occ * sub_dt
    mx = jnp.sum(pdx) / n_occ
    my = jnp.sum(pdy) / n_occ
    rel2 = (pdx - mx * occ) ** 2 + (pdy - my * occ) ** 2
    pred_trip = jnp.sum(rel2 > thresh2) > wide_tol * n_live
    if wide is None:
        wide = wide_state_init(options)
    trip, budget, calm = wide
    trip = trip | pred_trip
    move_ref = planes[:2]
    for s in range(n_sub):
        wide_now = trip & (budget > 0)

        def run(w, first=s == 0):
            def f(c):
                pl, ax = c
                return _plane_run(pl, ax, damp, follow_c, params, sub_dt,
                                  relaxation, options, g, k, 1,
                                  cohesion=cohesion, ordered=ordered, wide=w,
                                  first_substep=first)
            return f

        planes, aux = jax.lax.cond(wide_now, run(True), run(False),
                                   (planes, aux))
        budget = jnp.where(wide_now, budget - 1, budget)
        fb_p, fb_prev, fb_v = fallback_substep(fb_p, fb_v)
        # movement DURING this substep decides the next substep's window
        n_over, _, _ = _plane_drift_over(planes, move_ref, g, thresh2)
        move_ref = planes[:2]
        trip = n_over > wide_tol * n_live
        calm = jnp.where(trip, 0, calm + 1)
        budget = jnp.where(calm >= rearm, full_budget, budget)
    return planes, aux, fb_p, fb_prev, fb_v, (trip, budget, calm)


def _plane_extract(planes, aux, slot, g: int, lanes: int, sub_dt=None):
    """One gather pulling (pos, prev, vel) per particle out of plane layout.

    ``in_grid`` additionally requires the slot's FIELD_OCC to be set: a
    particle whose placement was dropped (per-cell cap, or the placement
    kernel's bounded overflow window) reads zeros from the planes and must
    fall back to integration-without-collision — the reference's
    past-budget behavior (:1656-1658) — rather than collapse to (0, 0).

    With ``sub_dt`` the velocity is DERIVED as ``(pos - prev) / sub_dt`` —
    bit-identical to the stored AUX_VX/VY (the post-solve update is exactly
    that expression on the same operands) and two gathered columns cheaper
    (~30%% of the extraction's bandwidth at 1M). Only valid after at least
    one substep ran on these planes: at bin time AUX_PX/PY hold the CURRENT
    position, so the derived velocity would be zero — callers on a
    maybe-zero-substep path must pass ``sub_dt=None`` (stored velocity)."""
    rp = dense_ops.ROW_PAD
    cols = [planes[dense_ops.FIELD_X], planes[dense_ops.FIELD_Y],
            aux[AUX_PX], aux[AUX_PY]]
    if sub_dt is None:
        cols += [aux[AUX_VX], aux[AUX_VY]]
    cols.append(planes[dense_ops.FIELD_OCC])
    ext = jnp.stack(cols, axis=-1)                # (rows, L, 5 or 7)
    n_c = ext.shape[-1]
    ext = ext.reshape(-1, n_c)
    padded = jnp.minimum(slot + rp * lanes, ext.shape[0] - 1)
    got = ext[padded]
    in_grid = (slot < g * lanes) & (got[:, n_c - 1] > 0.0)
    p, prev = got[:, 0:2], got[:, 2:4]
    if sub_dt is None:
        vel = got[:, 4:6]
    else:
        vel = (p - prev) / sub_dt
    return p, prev, vel, in_grid


def _population_step_dense(pos, vel, mass_t, batch_slot, act, cfg,
                           batch_target, follow_radius, sub_dt, relaxation,
                           options: SolverOptions, g: int, k: int,
                           follow_rows=None, wide_state=None):
    """Whole-step dense path: one binning per step (or per substep), all
    substep math in plane layout; budget-dropped particles fall back to
    integration-without-collision (the reference's past-cutoff behavior,
    :1656-1658)."""
    damp = 1.0 - jnp.clip(cfg.damping, 0.0, 1.0)           # :1768
    mass = jnp_mix(cfg.min_mass, cfg.max_mass, mass_t)
    inv_mass = jnp.where(act, 1.0 / jnp.maximum(mass, jnp.float32(1e-12)), 0.0)
    radius = jnp.where(act, jnp_mix(cfg.min_radius, cfg.max_radius, mass_t), 0.0)

    follow_c = strength_to_compliance(cfg.follow_strength, sub_dt)
    collision_c = strength_to_compliance(cfg.collision_strength, sub_dt)
    cohesion_c = strength_to_compliance(cfg.cohesion_strength, sub_dt)
    cell_size, params = _dense_params(cfg, act, collision_c, cohesion_c, options)

    # follow target per particle, once per step (targets static within a step;
    # multi_step hoists this expansion out of the whole scan)
    if follow_rows is None:
        table = jnp.concatenate([batch_target, follow_radius[:, None]], axis=1)
        follow_rows = take_batch_rows(table, batch_slot)
    rows3 = follow_rows
    tx, ty, td = rows3[:, 0], rows3[:, 1], 2.0 * rows3[:, 2]

    def fallback_substep(p, v):
        """One pre-solve + follow substep in particle layout (no collision)."""
        v = v * damp
        prev = p
        p = p + sub_dt * v
        fdx, fdy = _follow_delta(p[:, 0], p[:, 1], inv_mass, act,
                                 tx, ty, td, follow_c)
        p = p + jnp.stack([fdx, fdy], axis=1)
        return p, prev, (p - prev) / sub_dt

    n_sub = options.n_substeps
    if options.dense_rebin == "step":
        # ONE binning per step plus a drift-gated mid-step rebin: calm and
        # steadily boiling scenes pay only the cheap drift metric; violent
        # transients get per-substep freshness (see _adaptive_substep_run)
        from .pallas import place_kernel
        ordered = options.budget_mode == "ordered"
        cohesion = options.cohesion_mode == "spacing"
        use_placement = (options.use_pallas and not ordered
                         and place_kernel.on_tpu())
        lanes = g * k

        def bin_now(p, v):
            aux_cols = jnp.stack([p[:, 0], p[:, 1], v[:, 0], v[:, 1],
                                  tx, ty, td], axis=1)
            binning = dense_ops.bin_to_planes(
                p, inv_mass, radius, batch_slot, act, cell_size,
                grid_dim=g, slots_per_cell=k, aux_cols=aux_cols,
                use_placement=use_placement, rotate=not ordered)
            if ordered:
                binning = _dense_add_cum(binning, k, options.use_pallas)
            return binning.planes, binning.aux, binning.slot

        if _fused_component_path(options):
            xy, prev_c, stat_c, follow3, slot = _bin_components(
                pos, vel, inv_mass, radius, batch_slot, act, cell_size,
                tx, ty, td, sub_dt, g, k, use_placement,
                occ_cap=options.occ_pressure_cap)
            xy, prev_c, fb_p, fb_prev, fb_v, ws = _fused_adaptive_run(
                xy, prev_c, stat_c, follow3, pos, pos, vel,
                fallback_substep, act, cell_size, damp, follow_c, params,
                sub_dt, relaxation, options, g, k, n_sub,
                cohesion=cohesion, wide=wide_state)
            p_pl, prev_pl, v_pl, in_grid = _comp_extract(xy, prev_c, stat_c,
                                                         slot, g, lanes,
                                                         sub_dt)
        else:
            planes, aux, slot = bin_now(pos, vel)
            planes, aux, fb_p, fb_prev, fb_v, ws = _adaptive_substep_run(
                planes, aux, pos, pos, vel,
                fallback_substep, act, cell_size, damp, follow_c, params,
                sub_dt, relaxation, options, g, k, n_sub,
                cohesion=cohesion, ordered=ordered, wide=wide_state)
            p_pl, prev_pl, v_pl, in_grid = _plane_extract(
                planes, aux, slot, g, lanes, sub_dt=sub_dt)
        sel = (in_grid & act)[:, None]
        keep = act[:, None]
        new_pos = jnp.where(sel, p_pl, jnp.where(keep, fb_p, pos))
        new_prev = jnp.where(sel, prev_pl, jnp.where(keep, fb_prev, pos))
        new_vel = jnp.where(sel, v_pl, jnp.where(keep, fb_v, vel))
        return new_pos, new_prev, new_vel, inv_mass, radius, ws

    # "substep": strict rebuild before every substep
    new_pos, new_vel = pos, vel
    new_prev = pos
    for s0 in range(n_sub):
        p_pl, prev_pl, v_pl, in_grid = _plane_substeps(
            new_pos, new_vel, inv_mass, radius, batch_slot, act,
            tx, ty, td, damp, follow_c, cell_size, params,
            sub_dt, relaxation, options, g, k, 1, first_substep=(s0 == 0))
        fb_p, fb_prev, fb_v = fallback_substep(new_pos, new_vel)
        sel = (in_grid & act)[:, None]
        keep = act[:, None]
        new_pos = jnp.where(sel, p_pl, jnp.where(keep, fb_p, new_pos))
        new_prev = jnp.where(sel, prev_pl, jnp.where(keep, fb_prev, new_prev))
        new_vel = jnp.where(sel, v_pl, jnp.where(keep, fb_v, new_vel))
    # the strict per-substep rebuild has no wide machinery; pass the episode
    # state through untouched
    ws = wide_state if wide_state is not None else wide_state_init(options)
    return new_pos, new_prev, new_vel, inv_mass, radius, ws


def _population_multi_dense_fused(pos, vel, mass_t, batch_slot, act, cfg,
                                  follow_rows, sub_dt, relaxation,
                                  options: SolverOptions, g: int, k: int,
                                  n_steps, wide_state=None):
    """Fused component-layout variant of :func:`_population_multi_dense` —
    same adaptive plane residency, drift gate, and fallback merge, with the
    substep pipeline living entirely in the fused Pallas passes."""
    from .pallas import place_kernel
    assert options.budget_mode == "off" and options.dense_rebin == "step"
    lanes = g * k
    n_sub = options.n_substeps
    cohesion = options.cohesion_mode == "spacing"
    use_placement = options.use_pallas and place_kernel.on_tpu()

    damp = 1.0 - jnp.clip(cfg.damping, 0.0, 1.0)
    mass = jnp_mix(cfg.min_mass, cfg.max_mass, mass_t)
    inv_mass = jnp.where(act, 1.0 / jnp.maximum(mass, jnp.float32(1e-12)), 0.0)
    radius = jnp.where(act, jnp_mix(cfg.min_radius, cfg.max_radius, mass_t), 0.0)

    follow_c = strength_to_compliance(cfg.follow_strength, sub_dt)
    collision_c = strength_to_compliance(cfg.collision_strength, sub_dt)
    cohesion_c = strength_to_compliance(cfg.cohesion_strength, sub_dt)
    cell_size, params = _dense_params(cfg, act, collision_c, cohesion_c, options)
    tx, ty, td = follow_rows[:, 0], follow_rows[:, 1], 2.0 * follow_rows[:, 2]
    drift_thresh2 = (0.25 * cell_size) ** 2

    def bin_now(p, v):
        xy, prev, stat, follow, slot = _bin_components(
            p, v, inv_mass, radius, batch_slot, act, cell_size,
            tx, ty, td, sub_dt, g, k, use_placement,
            occ_cap=options.occ_pressure_cap)
        return xy, prev, stat, follow, slot, xy

    def merge(xy, prev, stat, slot, fb_p, fb_prev, fb_v):
        p_pl, prev_pl, v_pl, in_grid = _comp_extract(xy, prev, stat, slot,
                                                     g, lanes, sub_dt)
        sel = (in_grid & act)[:, None]
        return (jnp.where(sel, p_pl, fb_p), jnp.where(sel, prev_pl, fb_prev),
                jnp.where(sel, v_pl, fb_v))

    def fb_one(p, v):
        v = v * damp
        pr = p
        p = p + sub_dt * v
        fdx, fdy = _follow_delta(p[:, 0], p[:, 1], inv_mass, act,
                                 tx, ty, td, follow_c)
        p = p + jnp.stack([fdx, fdy], axis=1)
        return p, pr, (p - pr) / sub_dt

    def body(carry):
        (xy, prev, stat, follow, slot, ref_xy,
         fb_p, fb_prev, fb_v, fb_ref, wide) = carry
        n_over, _, mxy = _comp_drift_over(xy, stat[3], ref_xy, drift_thresh2)
        dropped = act & (slot >= g * lanes)
        dfb = fb_p - fb_ref - mxy
        n_over = n_over + jnp.sum(
            dropped & (jnp.sum(dfb * dfb, axis=1) > drift_thresh2))
        n_live = jnp.maximum(jnp.sum(act), 1)
        need = n_over > options.rebin_tolerance * n_live

        def rebin(c):
            xy, prev, stat, follow, slot, ref_xy, fb_p, fb_prev, fb_v, fb_ref = c
            p, pr, v = merge(xy, prev, stat, slot, fb_p, fb_prev, fb_v)
            xy2, prev2, stat2, follow2, slot2, ref2 = bin_now(p, v)
            return (xy2, prev2, stat2, follow2, slot2, ref2, p, pr, v, p)

        (xy, prev, stat, follow, slot, ref_xy, fb_p, fb_prev, fb_v,
         fb_ref) = jax.lax.cond(
            need, rebin, lambda c: c,
            (xy, prev, stat, follow, slot, ref_xy, fb_p, fb_prev, fb_v,
             fb_ref))
        (xy, prev, fb_p, fb_prev, fb_v, wide) = _fused_adaptive_run(
            xy, prev, stat, follow, fb_p, fb_prev, fb_v, fb_one, act,
            cell_size, damp, follow_c, params, sub_dt, relaxation, options,
            g, k, n_sub, cohesion=cohesion, wide=wide)
        return (xy, prev, stat, follow, slot, ref_xy, fb_p, fb_prev, fb_v,
                fb_ref, wide)

    xy, prev, stat, follow, slot, ref_xy = bin_now(pos, vel)
    ws0 = wide_state if wide_state is not None else wide_state_init(options)
    carry = (xy, prev, stat, follow, slot, ref_xy, pos, pos, vel, pos, ws0)
    carry = jax.lax.fori_loop(0, n_steps, lambda _, c: body(c), carry)
    (xy, prev, stat, follow, slot, ref_xy, fb_p, fb_prev, fb_v, fb_ref,
     ws) = carry
    p, pr, v = merge(xy, prev, stat, slot, fb_p, fb_prev, fb_v)
    # zero-substep safety is free here: prev encodes the input velocity at
    # bin time, so the derived velocity is exact at any n_steps
    return p, pr, v, inv_mass, radius, ws


def _population_multi_dense(pos, vel, mass_t, batch_slot, act, cfg,
                            follow_rows, sub_dt, relaxation,
                            options: SolverOptions, g: int, k: int,
                            n_steps, wide_state=None):
    """``n_steps`` whole fixed steps with ADAPTIVE plane residency.

    The dense state stays in grid layout across steps; a fresh binning (sort
    + placement, ~19 ms at 1M) happens only when some live particle has
    drifted more than ``cell_size/4`` from its position at bin time —
    settled scenes advance at pure sweep + elementwise cost, violent scenes
    rebin every step. Justification: the pair sets the 3x3 sweep window sees
    are exact for the *binned* cells; a bounded drift bounds the window
    error to a quarter-cell, far inside the staleness the reference itself
    carries across substeps (SURVEY.md §5.2). Requires
    ``budget_mode='off'`` (the ordered prefix would need a per-pass global
    recount) and ``dense_rebin='step'``.
    """
    if _fused_component_path(options):
        return _population_multi_dense_fused(
            pos, vel, mass_t, batch_slot, act, cfg, follow_rows, sub_dt,
            relaxation, options, g, k, n_steps, wide_state=wide_state)
    from .pallas import place_kernel
    assert options.budget_mode == "off" and options.dense_rebin == "step"
    lanes = g * k
    n_sub = options.n_substeps
    cohesion = options.cohesion_mode == "spacing"
    use_placement = options.use_pallas and place_kernel.on_tpu()

    damp = 1.0 - jnp.clip(cfg.damping, 0.0, 1.0)
    mass = jnp_mix(cfg.min_mass, cfg.max_mass, mass_t)
    inv_mass = jnp.where(act, 1.0 / jnp.maximum(mass, jnp.float32(1e-12)), 0.0)
    radius = jnp.where(act, jnp_mix(cfg.min_radius, cfg.max_radius, mass_t), 0.0)

    follow_c = strength_to_compliance(cfg.follow_strength, sub_dt)
    collision_c = strength_to_compliance(cfg.collision_strength, sub_dt)
    cohesion_c = strength_to_compliance(cfg.cohesion_strength, sub_dt)
    cell_size, params = _dense_params(cfg, act, collision_c, cohesion_c, options)
    tx, ty, td = follow_rows[:, 0], follow_rows[:, 1], 2.0 * follow_rows[:, 2]
    drift_thresh2 = (0.25 * cell_size) ** 2

    def bin_now(p, v):
        aux_cols = jnp.stack([p[:, 0], p[:, 1], v[:, 0], v[:, 1],
                              tx, ty, td], axis=1)
        binning = dense_ops.bin_to_planes(
            p, inv_mass, radius, batch_slot, act, cell_size,
            grid_dim=g, slots_per_cell=k, aux_cols=aux_cols,
            use_placement=use_placement, rotate=True)
        ref_xy = binning.planes[:2]
        return binning.planes, binning.aux, binning.slot, ref_xy

    def merge(planes, aux, slot, fb_p, fb_prev, fb_v):
        p_pl, prev_pl, v_pl, in_grid = _plane_extract(planes, aux, slot,
                                                      g, lanes, sub_dt=sub_dt)
        sel = (in_grid & act)[:, None]
        p = jnp.where(sel, p_pl, fb_p)
        pr = jnp.where(sel, prev_pl, fb_prev)
        v = jnp.where(sel, v_pl, fb_v)
        return p, pr, v

    def fb_one(p, v):
        v = v * damp
        pr = p
        p = p + sub_dt * v
        fdx, fdy = _follow_delta(p[:, 0], p[:, 1], inv_mass, act,
                                 tx, ty, td, follow_c)
        p = p + jnp.stack([fdx, fdy], axis=1)
        return p, pr, (p - pr) / sub_dt

    def body(carry, _):
        planes, aux, slot, ref_xy, fb_p, fb_prev, fb_v, fb_ref, wide = carry
        # max squared drift since bin time: plane-resident particles ...
        # Drift is measured RELATIVE to the population-mean displacement:
        # a uniform translation shifts every true cell equally, so relative
        # adjacency — the only thing the 3x3 window needs — is untouched
        # (torus cells are translation-covariant). Only differential motion
        # can invalidate pair sets.
        rp = dense_ops.ROW_PAD
        occ = jnp.minimum(                              # counts -> 0/1
            planes[dense_ops.FIELD_OCC, rp:rp + g], 1.0)  # real rows only:
        n_occ = jnp.maximum(jnp.sum(occ), 1.0)          # halo dups edge rows
        dxp = (planes[dense_ops.FIELD_X, rp:rp + g] - ref_xy[0, rp:rp + g]) * occ
        dyp = (planes[dense_ops.FIELD_Y, rp:rp + g] - ref_xy[1, rp:rp + g]) * occ
        mx = jnp.sum(dxp) / n_occ
        my = jnp.sum(dyp) / n_occ
        rel2 = (dxp - mx * occ) ** 2 + (dyp - my * occ) ** 2
        n_over = jnp.sum(rel2 > drift_thresh2)
        # ... plus the fallback-integrated (budget-dropped) live particles
        dropped = act & (slot >= g * lanes)
        dfb = fb_p - fb_ref - jnp.stack([mx, my])
        n_over = n_over + jnp.sum(
            dropped & (jnp.sum(dfb * dfb, axis=1) > drift_thresh2))
        n_live = jnp.maximum(jnp.sum(act), 1)
        need = n_over > options.rebin_tolerance * n_live

        def rebin(c):
            planes, aux, slot, ref_xy, fb_p, fb_prev, fb_v, fb_ref = c
            p, pr, v = merge(planes, aux, slot, fb_p, fb_prev, fb_v)
            planes2, aux2, slot2, ref2 = bin_now(p, v)
            return (planes2, aux2, slot2, ref2, p, pr, v, p)

        (planes, aux, slot, ref_xy, fb_p, fb_prev, fb_v, fb_ref) = (
            jax.lax.cond(need, rebin, lambda c: c,
                         (planes, aux, slot, ref_xy, fb_p, fb_prev, fb_v,
                          fb_ref)))
        (planes, aux, fb_p, fb_prev, fb_v, wide) = (
            _adaptive_substep_run(
                planes, aux, fb_p, fb_prev, fb_v,
                fb_one, act, cell_size,
                damp, follow_c, params, sub_dt, relaxation, options, g, k,
                n_sub, cohesion=cohesion, ordered=False, wide=wide))
        return (planes, aux, slot, ref_xy, fb_p, fb_prev, fb_v, fb_ref,
                wide), None

    planes, aux, slot, ref_xy = bin_now(pos, vel)
    ws0 = wide_state if wide_state is not None else wide_state_init(options)
    carry = (planes, aux, slot, ref_xy, pos, pos, vel, pos, ws0)
    # fori_loop with a TRACED count: one compile serves every n_steps (the
    # resident graph costs minutes to compile; a lax.scan would key the jit
    # cache on the static length)
    carry = jax.lax.fori_loop(0, n_steps, lambda _, c: body(c, None)[0],
                              carry)
    planes, aux, slot, ref_xy, fb_p, fb_prev, fb_v, fb_ref, ws = carry
    p, pr, v = merge(planes, aux, slot, fb_p, fb_prev, fb_v)
    # merge DERIVES vel as (pos - prev)/sub_dt, which is zero on planes that
    # never ran a substep (n_steps == 0: aux prev == pos from bin time) —
    # fall back to the input velocity, carried untouched in fb_v
    stepped = n_steps > 0
    v = jnp.where(stepped, v, fb_v)
    pr = jnp.where(stepped, pr, fb_prev)
    return p, pr, v, inv_mass, radius, ws


# ----------------------------------------------------- classic substep path --

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
            sub_dt, relaxation, options: SolverOptions,
            g: int = 0, k: int = 0):
    """One solver substep over a single population (reference :1821-1932);
    the gather engine and the strict per-pass dense path."""
    follow_c = strength_to_compliance(cfg.follow_strength, sub_dt)
    collision_c = strength_to_compliance(cfg.collision_strength, sub_dt)
    cohesion_c = strength_to_compliance(cfg.cohesion_strength, sub_dt)

    pos, prev, vel, inv_mass, radius = pre_solve(pos, prev, vel, mass_t, active, cfg, sub_dt)
    pos = solve_follow(pos, inv_mass, batch_slot, active,
                       batch_target, follow_radius, follow_c)

    if options.engine == "gather":
        def collision_pass(_, p):
            return solve_pairs(p, inv_mass, radius, batch_slot, active, cfg,
                               collision_c, cohesion_c, relaxation, options)
    else:
        def collision_pass(_, p):
            return solve_pairs_dense(p, inv_mass, radius, batch_slot, active,
                                     cfg, collision_c, cohesion_c, relaxation,
                                     options, g, k)

    pos = jax.lax.fori_loop(0, options.n_collision_steps, collision_pass, pos)

    # true-velocity update (reference :1690-1693); the aggregate stats of
    # post_solve are computed once per step in `step`, not per substep
    vel = jnp.where(active[:, None], (pos - prev) / sub_dt, 0.0)
    return pos, prev, vel, inv_mass, radius


# --------------------------------------------------------------- whole step --

def _step_impl(state: ParticleState, cfg2: DeviceConfig, step_delta,
               relaxation, options: SolverOptions, with_stats: bool = True,
               follow_rows=None, wide_state=None):
    """Returns ``(state, stats)`` — or ``(state, stats, wide_state_out)``
    when ``wide_state`` (per-population violence-episode tuples, see
    :func:`wide_state_init`) is passed: the episode budget only means
    anything when callers persist it across calls."""
    thread_wide = wide_state is not None
    ws_out = [None, None]
    sub_dt = jnp.maximum(step_delta / options.n_substeps, EPS)  # :1723
    capacity = state.capacity
    caps = options.pop_caps or (capacity, capacity)
    caps = tuple(min(c, capacity) for c in caps)
    active_full = state.active_mask()
    max_batches = state.max_batches

    # pre-step positions + centroid for frame interpolation (:1795-1818)
    last_pos = state.pos
    if with_stats:
        n_act = jnp.maximum(jnp.sum(active_full, axis=1), 1)
        last_centroid = (jnp.sum(jnp.where(active_full[..., None], state.pos,
                                           0.0), axis=1) / n_act[:, None])

    follow_radius = jnp.sqrt(jnp.maximum(state.batch_radius, 0.0))  # :1789-1792

    new_pos, new_prev, new_vel = state.pos, state.prev, state.vel
    new_inv, new_rad = state.inv_mass, state.radius
    stat_outs = []
    # populations run as a Python loop (2 traces), not vmap: the Pallas sweep
    # kernel can't be batched, the two populations share no compute, and the
    # static per-population slice caps/grids differ
    for i in range(2):
        cap = caps[i]
        pos = state.pos[i, :cap]
        vel = state.vel[i, :cap]
        mass_t = state.mass_t[i, :cap]
        batch_slot = state.batch_slot[i, :cap]
        act = active_full[i, :cap]
        cfg = jax.tree.map(lambda a: a[i], cfg2)
        g = options.dense_grid_dim[i]
        k = options.dense_slots[i]

        if options.engine == "dense" and options.dense_rebin in ("step", "substep"):
            pos, prev, vel, inv_mass, radius, ws_out[i] = (
                _population_step_dense(
                    pos, vel, mass_t, batch_slot, act, cfg,
                    state.batch_target, follow_radius[i], sub_dt, relaxation,
                    options, g, k,
                    follow_rows=None if follow_rows is None else follow_rows[i],
                    wide_state=wide_state[i] if thread_wide else None))
        else:
            # engines without wide-sweep machinery (gather, dense per-pass)
            # pass the violence-episode state through untouched — callers
            # thread it blindly (handler.run_steps), and a None here would
            # break the multi_step fori carry's pytree structure
            ws_out[i] = wide_state[i] if thread_wide else None
            prev = state.prev[i, :cap]
            inv_mass = state.inv_mass[i, :cap]
            radius = state.radius[i, :cap]
            # unrolled substep loop (n_substeps is 2 by default; unrolling
            # avoids lax.scan carry traffic and lets XLA fuse across substeps)
            for _ in range(options.n_substeps):
                pos, prev, vel, inv_mass, radius = substep(
                    pos, prev, vel, inv_mass, radius, mass_t, batch_slot,
                    act, cfg, state.batch_target, follow_radius[i],
                    sub_dt, relaxation, options, g, k)

        if with_stats:
            # per-step aggregates (the reference computes these per substep
            # in _post_solve :1669-1718 but reads centroids lazily via
            # `centroid_needs_update` :289-293; only final values observable)
            n_a = jnp.maximum(jnp.sum(act), 1)
            centroid = jnp.sum(jnp.where(act[:, None], pos, 0.0), axis=0) / n_a
            speed2 = jnp.sum(vel * vel, axis=-1)
            max_vel = jnp.sqrt(jnp.max(jnp.where(act, speed2, 0.0)))
            batch_sum, batch_count = batch_segment_sums(pos, act, batch_slot,
                                                        max_batches)
            lo, hi = _aabb(pos, radius, act)
            mrad = jnp.max(jnp.where(act, radius, 0.0))
            stat_outs.append((centroid, max_vel, batch_sum, batch_count,
                              lo, hi, mrad))

        new_pos = new_pos.at[i, :cap].set(pos)
        new_prev = new_prev.at[i, :cap].set(prev)
        new_vel = new_vel.at[i, :cap].set(vel)
        new_inv = new_inv.at[i, :cap].set(inv_mass)
        new_rad = new_rad.at[i, :cap].set(radius)

    new_state = state.replace(pos=new_pos, prev=new_prev, vel=new_vel,
                              inv_mass=new_inv, radius=new_rad,
                              last_pos=last_pos)
    if not with_stats:
        if thread_wide:
            return new_state, None, tuple(ws_out)
        return new_state, None

    (centroid, max_vel, batch_sum, batch_count, lo, hi, mrad) = jax.tree.map(
        lambda *xs: jnp.stack(xs), *stat_outs)
    stats = StepStats(
        aabb_min=lo, aabb_max=hi, centroid=centroid,
        last_centroid=last_centroid, max_radius=jnp.maximum(mrad, 1.0),
        max_velocity=max_vel, batch_pos_sum=batch_sum, batch_count=batch_count)
    if thread_wide:
        return new_state, stats, tuple(ws_out)
    return new_state, stats


@functools.partial(jax.jit, static_argnames=("options",))
def step(state: ParticleState, cfg2: DeviceConfig, step_delta: jnp.ndarray,
         relaxation: jnp.ndarray, options: SolverOptions,
         wide_state=None):
    """One fixed step: both populations, all substeps (reference ``_step`` :1722-1989).

    ``cfg2`` is a :class:`DeviceConfig` with a leading (2,) population axis.
    Everything dynamic (configs, dt, relaxation) is traced, so live config
    edits and dt changes never recompile; only ``options`` is static.

    Returns ``(state, stats)``; with ``wide_state`` (per-population
    violence-episode tuples) it returns ``(state, stats, wide_state_out)`` —
    interactive per-tick callers persist it so the wide-sweep episode
    budget survives across ticks (see :func:`wide_state_init`).
    """
    return _step_impl(state, cfg2, step_delta, relaxation, options,
                      wide_state=wide_state)


def multi_step_frames(state: ParticleState, cfg2: DeviceConfig, step_delta,
                      relaxation, options: SolverOptions, n_steps: int,
                      frame_fn, wide_state=None):
    """Resident frame loop: one fixed step then ``frame_fn`` per iteration.

    The device-side analog of an interactive app's update->draw loop (and
    the honest step+render benchmark): the dense state stays plane-resident
    across frames with drift-adaptive rebinning exactly like
    :func:`multi_step`, and after each step the extracted particle state is
    handed to ``frame_fn(state, stats) -> scalar`` (typically a render whose
    output is reduced); the scalar accumulates into the returned total so
    nothing can be dead-code-eliminated. ``stats`` carries the centroid /
    last-centroid fields the renderer consumes; AABB-class fields are zero
    (canvas buckets are chosen on the host before the loop).

    Returns ``(final_state, total)``. Requires the adaptive-resident
    preconditions (dense engine, ``budget_mode='off'``,
    ``dense_rebin='step'``). Not jitted here — close over it or jit the
    caller.
    """
    assert (options.engine == "dense" and options.dense_rebin == "step"
            and options.budget_mode == "off"), (
        "multi_step_frames requires the plane-resident dense configuration")
    capacity = state.capacity
    caps = options.pop_caps or (capacity, capacity)
    caps = tuple(min(c, capacity) for c in caps)
    sub_dt = jnp.maximum(step_delta / options.n_substeps, EPS)
    active_full = state.active_mask()
    follow_radius = jnp.sqrt(jnp.maximum(state.batch_radius, 0.0))
    n_sub = options.n_substeps
    cohesion = options.cohesion_mode == "spacing"
    from .pallas import place_kernel
    use_placement = options.use_pallas and place_kernel.on_tpu()

    pops = []
    for i in range(2):
        cap = caps[i]
        cfg = jax.tree.map(lambda a: a[i], cfg2)
        g, k = options.dense_grid_dim[i], options.dense_slots[i]
        act = active_full[i, :cap]
        mass_t = state.mass_t[i, :cap]
        batch_slot = state.batch_slot[i, :cap]
        damp = 1.0 - jnp.clip(cfg.damping, 0.0, 1.0)
        mass = jnp_mix(cfg.min_mass, cfg.max_mass, mass_t)
        inv_mass = jnp.where(act, 1.0 / jnp.maximum(mass, 1e-12), 0.0)
        radius = jnp.where(act, jnp_mix(cfg.min_radius, cfg.max_radius,
                                        mass_t), 0.0)
        follow_c = strength_to_compliance(cfg.follow_strength, sub_dt)
        collision_c = strength_to_compliance(cfg.collision_strength, sub_dt)
        cohesion_c = strength_to_compliance(cfg.cohesion_strength, sub_dt)
        cell_size, params = _dense_params(cfg, act, collision_c, cohesion_c,
                                          options)
        rows3 = take_batch_rows(
            jnp.concatenate([state.batch_target,
                             follow_radius[i][:, None]], axis=1), batch_slot)
        pops.append(dict(
            i=i, cap=cap, g=g, k=k, act=act, batch_slot=batch_slot,
            inv_mass=inv_mass, radius=radius, damp=damp, follow_c=follow_c,
            cell_size=cell_size, params=params,
            tx=rows3[:, 0], ty=rows3[:, 1], td=2.0 * rows3[:, 2]))

    fused = _fused_component_path(options)

    def bin_now(p, v, pp):
        """-> (grid_state, slot); grid_state is engine-specific (fused
        component tuple vs legacy planes/aux)."""
        if fused:
            xy, prev, stat, follow, slot = _bin_components(
                p, v, pp["inv_mass"], pp["radius"], pp["batch_slot"],
                pp["act"], pp["cell_size"], pp["tx"], pp["ty"], pp["td"],
                sub_dt, pp["g"], pp["k"], use_placement,
                occ_cap=options.occ_pressure_cap)
            return (xy, prev, stat, follow), slot
        aux_cols = jnp.stack([p[:, 0], p[:, 1], v[:, 0], v[:, 1],
                              pp["tx"], pp["ty"], pp["td"]], axis=1)
        binning = dense_ops.bin_to_planes(
            p, pp["inv_mass"], pp["radius"], pp["batch_slot"], pp["act"],
            pp["cell_size"], grid_dim=pp["g"], slots_per_cell=pp["k"],
            aux_cols=aux_cols, use_placement=use_placement, rotate=True)
        return (binning.planes, binning.aux), binning.slot

    def run_sub(grid, fb_p, fb_prev, fb_v, pp, wide):
        """One fixed step's substeps on the engine-specific grid state."""
        if fused:
            xy, prev, stat, follow = grid
            xy, prev, fb_p, fb_prev, fb_v, wide = _fused_adaptive_run(
                xy, prev, stat, follow, fb_p, fb_prev, fb_v,
                lambda p, v: fb_one(p, v, pp), pp["act"], pp["cell_size"],
                pp["damp"], pp["follow_c"], pp["params"], sub_dt,
                relaxation, options, pp["g"], pp["k"], n_sub,
                cohesion=cohesion, wide=wide)
            return (xy, prev, stat, follow), fb_p, fb_prev, fb_v, wide
        planes, aux = grid
        planes, aux, fb_p, fb_prev, fb_v, wide = _adaptive_substep_run(
            planes, aux, fb_p, fb_prev, fb_v,
            lambda p, v: fb_one(p, v, pp), pp["act"], pp["cell_size"],
            pp["damp"], pp["follow_c"], pp["params"], sub_dt, relaxation,
            options, pp["g"], pp["k"], n_sub,
            cohesion=cohesion, ordered=False, wide=wide)
        return (planes, aux), fb_p, fb_prev, fb_v, wide

    def merge(grid, slot, fb_p, fb_prev, fb_v, pp):
        # derived velocity (always called right after a substep run)
        if fused:
            xy, prev, stat, _follow = grid
            p_pl, prev_pl, v_pl, in_grid = _comp_extract(
                xy, prev, stat, slot, pp["g"], pp["g"] * pp["k"], sub_dt)
        else:
            planes, aux = grid
            p_pl, prev_pl, v_pl, in_grid = _plane_extract(
                planes, aux, slot, pp["g"], pp["g"] * pp["k"], sub_dt=sub_dt)
        sel = (in_grid & pp["act"])[:, None]
        return (jnp.where(sel, p_pl, fb_p), jnp.where(sel, prev_pl, fb_prev),
                jnp.where(sel, v_pl, fb_v))

    def fb_one(p, v, pp):
        v = v * pp["damp"]
        pr = p
        p = p + sub_dt * v
        fdx, fdy = _follow_delta(p[:, 0], p[:, 1], pp["inv_mass"],
                                 pp["act"], pp["tx"], pp["ty"], pp["td"],
                                 pp["follow_c"])
        p = p + jnp.stack([fdx, fdy], axis=1)
        return p, pr, (p - pr) / sub_dt

    def pop_body(c, pp):
        """One fixed step for one population; ONE extraction per frame.

        Order: plane step -> extract (the render needs it anyway) -> rebin
        FROM the extracted arrays if drift demands (so next frame's step
        runs on fresh bins without a second extraction)."""
        grid, slot, ref_p, fb_p, fb_prev, fb_v, _last_p, wide = c
        # position at frame start (= previous frame's merged extraction) is
        # this frame's ``last_pos`` — the whole-step interpolation anchor the
        # reference snapshots in update_last_positions (:1795-1818)
        pre_p = fb_p
        grid, fb_p, fb_prev, fb_v, wide = run_sub(grid, fb_p, fb_prev, fb_v,
                                                  pp, wide)
        p, pr, v = merge(grid, slot, fb_p, fb_prev, fb_v, pp)

        # relative-to-mean drift vs bin-time positions (per particle)
        thresh2 = (0.25 * pp["cell_size"]) ** 2
        act = pp["act"]
        d = p - ref_p
        n_live = jnp.maximum(jnp.sum(act), 1)
        mean_d = (jnp.sum(jnp.where(act[:, None], d, 0.0), axis=0)
                  / n_live)
        rel2 = jnp.sum((d - mean_d) ** 2, axis=1)
        n_over = jnp.sum(act & (rel2 > thresh2))

        def rebin(op):
            grid, slot, ref_p = op
            grid2, slot2 = bin_now(p, v, pp)
            return (grid2, slot2, p)

        grid, slot, ref_p = jax.lax.cond(
            n_over > options.rebin_tolerance * n_live,
            rebin, lambda op: op, (grid, slot, ref_p))
        return ((grid, slot, ref_p, p, pr, v, pre_p, wide),
                (p, pr, v, pre_p))

    # frame_fn may take (state, stats) or (state, stats, frame_index) — the
    # index lets callers vary per-frame inputs (e.g. interpolation alpha)
    import inspect
    _wants_index = len(inspect.signature(frame_fn).parameters) >= 3

    def body(carry, t):
        pop_carries, prev_centroid, acc = carry
        new_state = state
        cents = []
        outs = []
        for pp, c in zip(pops, pop_carries):
            i, cap = pp["i"], pp["cap"]
            c2, (p, pr, v, pre_p) = pop_body(c, pp)
            outs.append(c2)
            new_state = new_state.replace(
                pos=new_state.pos.at[i, :cap].set(p),
                prev=new_state.prev.at[i, :cap].set(pr),
                vel=new_state.vel.at[i, :cap].set(v),
                last_pos=new_state.last_pos.at[i, :cap].set(pre_p))
            n_a = jnp.maximum(jnp.sum(pp["act"]), 1)
            cents.append(jnp.sum(jnp.where(pp["act"][:, None], p, 0.0),
                                 axis=0) / n_a)
        pop_carries = tuple(outs)
        centroid = jnp.stack(cents)
        z2 = jnp.zeros((2, 2), jnp.float32)
        z1 = jnp.zeros((2,), jnp.float32)
        stats = StepStats(aabb_min=z2, aabb_max=z2, centroid=centroid,
                          last_centroid=prev_centroid,
                          max_radius=jnp.ones((2,), jnp.float32),
                          max_velocity=z1,
                          batch_pos_sum=jnp.zeros(
                              (2, state.max_batches, 2), jnp.float32),
                          batch_count=jnp.zeros((2, state.max_batches),
                                                jnp.float32))
        acc = acc + (frame_fn(new_state, stats, t) if _wants_index
                     else frame_fn(new_state, stats))
        return (pop_carries, centroid, acc), None

    init_pops = []
    for pp in pops:
        i, cap = pp["i"], pp["cap"]
        p0 = state.pos[i, :cap]
        v0 = state.vel[i, :cap]
        grid, slot = bin_now(p0, v0, pp)
        init_pops.append((grid, slot, p0, p0, p0, v0, p0,
                          wide_state[i] if wide_state is not None
                          else wide_state_init(options)))
    n_a0 = jnp.maximum(jnp.sum(active_full, axis=1), 1)
    cent0 = (jnp.sum(jnp.where(active_full[..., None], state.pos, 0.0),
                     axis=1) / n_a0[:, None])
    carry = (tuple(init_pops), cent0, jnp.float32(0.0))
    (pop_carries, centroid, acc), _ = jax.lax.scan(
        body, carry, jnp.arange(n_steps, dtype=jnp.int32))
    new_state = state
    ws_out = []
    for pp, c in zip(pops, pop_carries):
        i, cap = pp["i"], pp["cap"]
        grid, slot, ref_p, p, pr, v, last_p, ws = c
        ws_out.append(ws)
        new_state = new_state.replace(
            pos=new_state.pos.at[i, :cap].set(p),
            prev=new_state.prev.at[i, :cap].set(pr),
            vel=new_state.vel.at[i, :cap].set(v),
            last_pos=new_state.last_pos.at[i, :cap].set(last_p))
    if wide_state is not None:
        return new_state, acc, tuple(ws_out)
    return new_state, acc


@functools.partial(jax.jit, static_argnames=("options",))
def multi_step(state: ParticleState, cfg2: DeviceConfig, step_delta,
               relaxation, options: SolverOptions, n_steps,
               wide_state=None):
    """``n_steps`` dependence-chained fixed steps in ONE dispatch.

    Returns ``(state, stats)`` — or ``(state, stats, wide_state_out)`` when
    ``wide_state`` is passed (per-population violence-episode state; persist
    it across calls or the wide-sweep budget restarts every call).

    The device executes the steps back-to-back with no host round-trips —
    the headless fast-forward API (and the honest way to measure per-step
    device latency on tunneled runtimes, where a single dispatch+read costs
    ~27 ms of pure RTT).

    Aggregate stats are produced for the FINAL step only — the reference
    itself reads centroids lazily (``centroid_needs_update``, :289-293,
    :1134-1148) — and the per-particle follow-target expansion is hoisted out
    of the scan (targets and batch membership are constant across the call).
    """
    capacity = state.capacity
    caps = options.pop_caps or (capacity, capacity)
    caps = tuple(min(c, capacity) for c in caps)
    follow_radius = jnp.sqrt(jnp.maximum(state.batch_radius, 0.0))
    follow_rows = tuple(
        take_batch_rows(
            jnp.concatenate([state.batch_target,
                             follow_radius[i][:, None]], axis=1),
            state.batch_slot[i, :caps[i]])
        for i in range(2))

    n_steps = jnp.asarray(n_steps, jnp.int32)
    thread_wide = wide_state is not None
    if not thread_wide:
        wide_state = (wide_state_init(options), wide_state_init(options))
    wide_state = list(wide_state)
    use_resident = (options.engine == "dense" and options.dense_rebin == "step"
                    and options.budget_mode == "off"
                    and options.adaptive_rebin)
    if use_resident:
        # plane-resident fast-forward: n_steps-1 steps with drift-adaptive
        # rebinning, then one fully-binned step for stats/last_pos
        sub_dt = jnp.maximum(step_delta / options.n_substeps, EPS)
        active_full = state.active_mask()
        new_pos, new_prev, new_vel = state.pos, state.prev, state.vel
        new_inv, new_rad = state.inv_mass, state.radius
        for i in range(2):
            cap = caps[i]
            cfg = jax.tree.map(lambda a: a[i], cfg2)
            p, pr, v, im, rad, wide_state[i] = _population_multi_dense(
                state.pos[i, :cap], state.vel[i, :cap],
                state.mass_t[i, :cap], state.batch_slot[i, :cap],
                active_full[i, :cap], cfg, follow_rows[i], sub_dt,
                relaxation, options, options.dense_grid_dim[i],
                options.dense_slots[i], jnp.maximum(n_steps - 1, 0),
                wide_state=wide_state[i])
            new_pos = new_pos.at[i, :cap].set(p)
            new_prev = new_prev.at[i, :cap].set(pr)
            new_vel = new_vel.at[i, :cap].set(v)
            new_inv = new_inv.at[i, :cap].set(im)
            new_rad = new_rad.at[i, :cap].set(rad)
        state = state.replace(pos=new_pos, prev=new_prev, vel=new_vel,
                              inv_mass=new_inv, radius=new_rad)
    else:
        def body(_, c):
            s, ws = c
            s2, _none, ws2 = _step_impl(s, cfg2, step_delta, relaxation,
                                        options, with_stats=False,
                                        follow_rows=follow_rows,
                                        wide_state=ws)
            return (s2, ws2)

        state, wide_state = jax.lax.fori_loop(
            0, jnp.maximum(n_steps - 1, 0), body, (state, tuple(wide_state)))
        wide_state = list(wide_state)
    state, stats, ws_fin = _step_impl(state, cfg2, step_delta, relaxation,
                                      options, with_stats=True,
                                      follow_rows=follow_rows,
                                      wide_state=tuple(wide_state))
    if thread_wide:
        return state, stats, ws_fin
    return state, stats

"""Dense cell-grid collision engine — the TPU-native neighbor structure.

The gather-based engine (ops/grid.py + the candidate sweep in ops/solver.py)
is exact but bandwidth-crippled at scale: TPU gathers run element-at-a-time,
so the ``(N, 9K)`` candidate fetch caps out around ~8 GB/s. This engine
removes gathers from the hot path entirely.

**Layout.** Particles are binned into field *planes* of shape ``(F, G+2R, L)``
with ``L = G * K`` lanes: grid row = y cell (plus ``R = ROW_PAD`` halo rows top
and bottom), lane = ``x_cell * K + slot``. Cell size is the reference's
spatial-hash cell ``max(1, max_radius * max(collision_overlap_factor,
cohesion_interaction_distance_factor))`` (simulation_handler.lua:1756-1760).
``L`` is lane-aligned and large, so every op tiles perfectly onto the VPU.

**Torus.** Cells are ``floor(pos / cell) mod G`` — the grid is periodic in
both axes, the dense analog of the reference's *hash table* (:1474-1483):
unbounded world coordinates map into a fixed structure, and distant particles
that alias into the same cell are rejected by the pair distance tests exactly
like reference hash-bucket collisions. Unlike an AABB-anchored grid this
never coarsens cells when the scene spreads out, and ``floor(pos / cell)``
matches the reference's absolute cell lattice (:1494-1495) bit-for-bit, so
dense and gather engines (and the oracle) see identical cell partitions.
Adjacency survives the wrap: truly neighboring cells are neighbors mod G, so
the 3x3 pair scan is exact whenever the pair is within interaction range.
Lane rolls wrap in x by construction; the halo rows carry copies of the
opposite edge rows for y (:func:`fill_halo`).

**Sweep.** The reference's 3x3-cell pair scan (:1548-1666) becomes, per
vertical offset dy in {-1,0,1}, a set of *lane rolls*: rolling the neighbor
plane by d lanes pairs self lane ``l`` with lane ``l - d``; sweeping
``d in [-(2K-1), 2K-1]`` covers every slot pair whose cells are within +-1
column (a static periodic lane mask drops the few cell-distance-2 pairs the
roll range also reaches, keeping the reference's exact 3x3 neighborhood).
Each (dy, d) term is pure elementwise VPU work over ``(rows, L)`` — zero
gathers, no K x K blow-up. The sweep runs as a Pallas kernel
(ops/pallas/sweep_kernel.py) with the jnp implementation here as the
CPU/interpret fallback and golden model.

**Budget.** Particles beyond ``K`` per cell are dropped from *collision* for
the step — the static analog of the reference's collision budget
(:1749-1753); the solver still integrates them (pre-solve + follow), exactly
like reference particles past the 0.05 n^2 cutoff (:1656-1658). The ordered
``0.05 n^2`` examined-pair cutoff is reproduced with a counting sweep +
prefix ride-along field, as in the gather engine.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.mathx import EPS
from .grid import segment_extent, segmented_rank

__all__ = ["DenseBinning", "SweepParams", "bin_to_planes", "sweep_planes_jnp",
           "count_planes_jnp", "lane_mask", "fill_halo", "refresh_halo_xy",
           "FIELD_X", "FIELD_Y", "FIELD_W", "FIELD_R", "FIELD_BATCH",
           "FIELD_CUM", "FIELD_IDX", "FIELD_OCC", "N_FIELDS", "ROW_PAD"]

# Separation axis for COINCIDENT pairs (dist <= eps). The reference's
# normalize(0,0) -> (0,0) makes coincident pairs exert zero force
# (math.lua normalize + :1524-1531), which it never hits because every pair
# is always resolved; a budgeted Jacobi solver DOES hit it — particles that
# lost collision while over budget collapse onto their follow target, and
# once coincident the zero direction makes the stack a stable equilibrium
# (measured: ~3.4k-particle stacks at 1M). Coincident pairs therefore
# separate along a fixed oblique unit axis, with an ANTISYMMETRIC sign per
# pair side (sgn(dy, d)) so both sides push apart, not together. Honest
# scenes (no coincident pairs) are bit-for-bit unaffected.
TIE_X = 0.5403023  # cos(1) — oblique so lines don't align with the cell grid
TIE_Y = 0.8414710  # sin(1)

# field layout of the (F, G+2R, L) pair-plane tensor (read by the sweep kernel)
FIELD_X = 0       # position x (px)
FIELD_Y = 1       # position y
FIELD_W = 2       # inverse mass
FIELD_R = 3       # radius
FIELD_BATCH = 4   # batch slot as float (exact below 2^24)
FIELD_CUM = 5     # exclusive prefix of examined-pair counts (ordered budget)
FIELD_IDX = 6     # particle index as float (pair ordering / self exclusion)
FIELD_OCC = 7     # > 0 = occupied slot. Product paths (bin_to_planes
                  # rotate=True) store the cell's TRUE occupancy (incl.
                  # over-budget members) so the sweep can boost resolved
                  # pairs by the unresolved fraction (occupancy pressure);
                  # ordered-budget/spatial paths store 1.0 (boost neutral)
N_FIELDS = 8

ROW_PAD = 8       # halo rows above/below the grid; 8-row alignment lets the
                  # Pallas kernel DMA (8,128)-tiled row blocks without masking


class DenseBinning(NamedTuple):
    planes: jnp.ndarray     # (8, G+2*ROW_PAD, L) f32 pair fields (sweep input)
    aux: Optional[jnp.ndarray]  # (A, G+2*ROW_PAD, L) f32 ride-along fields
    slot: jnp.ndarray       # (N,) i32 unpadded flat slot (row*L + cx*K + rank),
                            # G*L = dropped from collision (rank >= K)
    pidx_grid: Optional[jnp.ndarray]  # (rows*L,) i32 particle index per padded
                            # slot, -1 empty; None on the placement-kernel path
    cell_size: jnp.ndarray  # scalar f32


class SweepParams(NamedTuple):
    """Dynamic scalars for the sweep (packed to a (8,) array for SMEM)."""
    collision_compliance: jnp.ndarray
    cohesion_compliance: jnp.ndarray
    collision_overlap_factor: jnp.ndarray
    cohesion_factor: jnp.ndarray
    max_pairs: jnp.ndarray     # ordered-budget cutoff; +inf when budget off
    cell_size: jnp.ndarray = np.float32(1.0)   # for the wide sweep's
                               # FRESH-cell pair mask (see sweep_planes_jnp)
    fresh_mod: jnp.ndarray = np.float32(0.0)   # torus modulus of the fresh
                               # cells; 0 = the plane's own lanes//k (the
                               # single-chip torus). The SPATIAL path must
                               # pass the GLOBAL grid_dim: its local planes
                               # are windows, so the global wrap (cell G-1
                               # adjacent to 0) is not a multiple of the
                               # local width and a local modulus would
                               # reject wrap-adjacent pairs.
    occ_boost_cap: jnp.ndarray = np.float32(8.0)  # occupancy-pressure cap:
                               # each resolved pair's correction scales by
                               # clip(occ_other / K, 1, cap) to stand in for
                               # the partners past the slot budget (the
                               # reference resolves ALL pairs, :1548-1666;
                               # a capped-K Jacobi otherwise UNDER-pressures
                               # crowded cells and the follow pull
                               # over-compresses them ~4x). <= 1 disables.

    def pack(self) -> jnp.ndarray:
        vals = [jnp.asarray(v, jnp.float32) for v in self]
        vals += [jnp.float32(0.0)] * (8 - len(vals))
        return jnp.stack(vals)


def fill_halo(t: jnp.ndarray) -> jnp.ndarray:
    """Copy the opposite grid edges into the halo rows (torus wrap in y).

    ``t`` is (F, ROW_PAD + G + ROW_PAD, L); real row r lives at ROW_PAD + r.
    Top halo := last ROW_PAD real rows, bottom halo := first ROW_PAD real rows.
    """
    g = t.shape[1] - 2 * ROW_PAD
    t = t.at[:, :ROW_PAD].set(t[:, g:g + ROW_PAD])
    return t.at[:, ROW_PAD + g:].set(t[:, ROW_PAD:2 * ROW_PAD])


def refresh_halo_xy(planes: jnp.ndarray) -> jnp.ndarray:
    """Re-copy only the X/Y halo rows after an in-plane position update."""
    g = planes.shape[1] - 2 * ROW_PAD
    planes = planes.at[:2, :ROW_PAD].set(planes[:2, g:g + ROW_PAD])
    return planes.at[:2, ROW_PAD + g:].set(planes[:2, ROW_PAD:2 * ROW_PAD])


def torus_cells(pos: jnp.ndarray, cell_size, grid_dim: int) -> jnp.ndarray:
    """(N, 2) i32 torus cell coords ``floor(pos / cell) mod G``.

    ``floor(pos / cell)`` is the reference's absolute cell lattice
    (simulation_handler.lua:1494-1495); the mod-G wrap is this engine's hash.
    The pre-clamp bounds the float before the int cast (NaN/overflow safety —
    the analog of the reference's NaN config guards)."""
    c = jnp.floor(pos / cell_size)
    c = jnp.clip(jnp.where(jnp.isfinite(c), c, 0.0), -1e9, 1e9)
    return jnp.mod(c.astype(jnp.int32), grid_dim)


def rotate_hash_buckets(grid_dim: int) -> int:
    """Hash buckets per cell for the rotating winner key (see
    ``bin_to_planes`` rotate=True): as many low bits as fit beside
    ``cell_id`` in a non-negative i32, capped at 4096. Layout-dependent
    callers (parallel/spatial._bin_local) must use the GLOBAL grid_dim so
    the hash truncation — and therefore the winner order — matches the
    single-chip binning exactly."""
    import math
    return 1 << min(12, int(math.floor(math.log2((2**31 - 1)
                                                 / (grid_dim * grid_dim + 1)))))


def bin_to_planes(pos, inv_mass, radius, batch_slot, active, cell_size,
                  *, grid_dim: int, slots_per_cell: int,
                  cum=None, aux_cols=None, use_placement=False,
                  rotate=False, interpret=False) -> DenseBinning:
    """Sort-bin particles into dense field planes.

    ``aux_cols`` is an optional (N, A) matrix of extra per-particle fields to
    ride along in a separate ``aux`` tensor (same layout, not read by the
    sweep kernel — used by the plane-resident step for velocity / previous
    position / follow-target fields).

    Two placement backends, bit-identical outputs:

    - ``use_placement=True``: the Pallas one-hot-matmul placement kernel
      (ops/pallas/place_kernel.py) — no scatter, no oversized gather.
    - default: inverse-index scatter + row gather (XLA row scatters run
      ~45ns/row on TPU while row gathers run ~4ns/row, so only the (N,)
      particle-index permutation is scattered and the wide payload gathered).
      This is the golden model and the ordered-budget path (it produces
      ``pidx_grid`` for the budget prefix refresh).
    """
    n = pos.shape[0]
    g, k = grid_dim, slots_per_cell
    assert g >= 2 * ROW_PAD, "grid_dim must be at least 2*ROW_PAD"
    lanes = g * k

    cxy = torus_cells(pos, cell_size, g)
    cell_id = cxy[:, 1] * g + cxy[:, 0]
    cell_id = jnp.where(active, cell_id, g * g)            # sentinel

    idx = jnp.arange(n, dtype=jnp.int32)
    if rotate:
        # Rotate which K members of an over-occupied cell win slots.
        # ``sort_key_val`` is STABLE, so without this the lowest-index K
        # particles of every cell win every rebin and the rest NEVER
        # collide — permanent budget drops whose zero-pressure victims the
        # follow constraint collapses into dense stacks (the reference's
        # budget is ordered but so slack it never binds, :1656-1658).
        # Winner rank within a cell = hash of the particle's POSITION BITS,
        # folded into the low bits of the (still single-i32) sort key:
        # layout-independent (the spatial decomposition computes the same
        # order from its local windows — parallel/spatial._bin_local),
        # self-rotating (any sub-ulp movement reshuffles the hash), and
        # inert exactly when rotation is moot (a bit-static scene needs no
        # new pairs; cells at or under K place every member regardless).
        hb = rotate_hash_buckets(g)
        xb = jax.lax.bitcast_convert_type(pos[:, 0], jnp.int32)
        yb = jax.lax.bitcast_convert_type(pos[:, 1], jnp.int32)
        h = xb * jnp.int32(-1640531535) + yb * jnp.int32(-2048144789)
        h = jnp.bitwise_and(jnp.bitwise_xor(h, jnp.right_shift(h, 15)),
                            jnp.int32(hb - 1))
        key = cell_id * jnp.int32(hb) + h
        if use_placement:
            # Carry the payload columns THROUGH the sort instead of row-
            # gathering ``pack[pidx_sorted]`` afterwards: a (N, 13) row
            # gather costs ~12 ms at 1M (XLA row gathers degrade badly at
            # 52-byte rows) while a multi-operand sort stays ~2 ms.
            pay = [pos[:, 0], pos[:, 1], inv_mass, radius,
                   batch_slot.astype(jnp.float32),
                   (cum if cum is not None
                    else jnp.zeros((n,), jnp.float32)),
                   idx.astype(jnp.float32)]
            if aux_cols is not None:
                pay += [aux_cols[:, j] for j in range(aux_cols.shape[1])]
            sorted_all = jax.lax.sort(tuple([key, idx] + pay), num_keys=1)
            key_sorted, pidx_sorted = sorted_all[0], sorted_all[1]
            pay_sorted = list(sorted_all[2:])
        else:
            key_sorted, pidx_sorted = jax.lax.sort_key_val(key, idx)
        cid_sorted = key_sorted // jnp.int32(hb)
        # cell occupancy rides along (FIELD_OCC carries the TRUE cell count
        # incl. over-budget members, feeding the sweep's occupancy-pressure
        # boost); count derivation is two parallel scans, and the count
        # returns to original order as an extra payload of the inverse sort
        rank, cnt_sorted = segment_extent(cid_sorted)
    else:
        cid_sorted, pidx_sorted = jax.lax.sort_key_val(cell_id, idx)
        rank = segmented_rank(cid_sorted)
    # unpadded flat slot: row * L + cx * K + rank
    row = cid_sorted // g
    cx = cid_sorted - row * g
    slot_sorted = jnp.where((rank < k) & (cid_sorted < g * g),
                            row * lanes + cx * k + rank, g * lanes)

    # per-particle slot = inverse permutation of (pidx_sorted -> slot_sorted);
    # sort-by-pidx costs ~2.8 ms at 1M vs ~5 ms for the element scatter
    if rotate:
        _, slot, occ_col = jax.lax.sort(
            (pidx_sorted, slot_sorted, cnt_sorted.astype(jnp.float32)),
            num_keys=1)
    else:
        _, slot = jax.lax.sort_key_val(pidx_sorted, slot_sorted)
        occ_col = jnp.ones((n,), jnp.float32)

    if cum is None:
        cum = jnp.zeros((n,), jnp.float32)
    pack = jnp.stack([
        pos[:, 0], pos[:, 1], inv_mass, radius,
        batch_slot.astype(jnp.float32), cum,
        idx.astype(jnp.float32),
        jnp.where(active, occ_col, 0.0),
    ], axis=1)                                             # (N, 8)
    if aux_cols is not None:
        pack = jnp.concatenate([pack, aux_cols], axis=1)   # (N, 8 + A)

    rows = g + 2 * ROW_PAD
    if use_placement:
        from .pallas import place_kernel
        # The placement kernel's window starts need a MONOTONE search key.
        # Cell-sorted order isn't ascending in slots (entries past the
        # per-cell cap carry the sentinel slot interleaved mid-array), but
        # clamping overflow ranks to k-1 IS monotone: cell ids ascend and
        # ranks ascend within a cell. The one-hot still matches on the real
        # slot column, where overflow entries keep the sentinel and match
        # nothing — so the compaction sort round 2 paid here (~2.8 ms at 1M)
        # is unnecessary. Overflow inflates window spans; entries beyond the
        # kernel's slack stay unplaced (FIELD_OCC = 0) and are treated as
        # collision budget drops by the extraction path.
        clamped = jnp.where(cid_sorted < g * g,
                            cid_sorted * k + jnp.minimum(rank, k - 1),
                            g * lanes)
        if rotate:
            # payload columns rode the sort; FIELD_OCC (true cell count,
            # zero for inactive) assembles directly from the sorted-order
            # counts — no row gather at all
            occ_sorted = jnp.where(cid_sorted < g * g,
                                   cnt_sorted.astype(jnp.float32), 0.0)
            pack_sorted = jnp.stack(
                pay_sorted[:7] + [occ_sorted] + pay_sorted[7:], axis=1)
        else:
            pack_sorted = pack[pidx_sorted]                # (N, F) sorted rows
        all_planes = place_kernel.place_planes(slot_sorted, pack_sorted, g, k,
                                               interpret=interpret,
                                               search_key=clamped)
        planes = fill_halo(all_planes[:N_FIELDS])
        aux = (fill_halo(all_planes[N_FIELDS:pack.shape[1]])
               if aux_cols is not None else None)
        return DenseBinning(planes=planes, aux=aux, slot=slot, pidx_grid=None,
                            cell_size=cell_size)

    slot_padded = jnp.where(slot_sorted < g * lanes,
                            slot_sorted + ROW_PAD * lanes, rows * lanes)
    pidx_grid = jnp.full((rows * lanes + 1,), -1, jnp.int32)
    pidx_grid = pidx_grid.at[slot_padded].set(pidx_sorted, mode="drop")[:-1]

    occupied = pidx_grid >= 0
    rows_data = pack[jnp.maximum(pidx_grid, 0)]            # (rows*L, F) row gather
    rows_data = jnp.where(occupied[:, None], rows_data, 0.0)
    all_planes = rows_data.T.reshape(pack.shape[1], rows, lanes)
    planes = fill_halo(all_planes[:N_FIELDS])
    aux = (fill_halo(all_planes[N_FIELDS:])
           if aux_cols is not None else None)
    return DenseBinning(planes=planes, aux=aux, slot=slot, pidx_grid=pidx_grid,
                        cell_size=cell_size)


def update_cum_field(binning: DenseBinning, cum: jnp.ndarray) -> DenseBinning:
    """Write a fresh ordered-budget prefix into FIELD_CUM (gather by pidx_grid)."""
    rows, lanes = binning.planes.shape[1], binning.planes.shape[2]
    occupied = binning.pidx_grid >= 0
    vals = cum[jnp.maximum(binning.pidx_grid, 0)]
    vals = jnp.where(occupied, vals, 0.0)
    planes = binning.planes.at[FIELD_CUM].set(vals.reshape(rows, lanes))
    return binning._replace(planes=fill_halo(planes))


def lane_mask(lanes: int, k: int, d: int, window: int = 1) -> jnp.ndarray:
    """(lanes,) bool — pairs (l, l-d) whose cells are within +-window columns.

    cell(l) - cell(l-d) = -floor((s - d) / k) for s = l mod k; the mask keeps
    |cell diff| <= window (window=1 is the reference's 3x3 scan,
    :1568-1569). The pattern is k-periodic, so it is identical at the lane
    wrap — where rolled pairs straddle columns 0 and G-1, which are adjacent
    on the torus.
    """
    s = jnp.arange(lanes) % k
    cell_diff = -jnp.floor_divide(s - d, k)
    return jnp.abs(cell_diff) <= window


def _roll_lanes(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Roll the last axis by d (positive d: lane l reads lane l - d)."""
    if d == 0:
        return x
    return jnp.roll(x, d, axis=-1)


def _row_slice(planes, dy):
    """(F, G, L) view of neighbor rows at vertical offset dy of self rows."""
    g = planes.shape[1] - 2 * ROW_PAD
    return planes[:, ROW_PAD + dy:ROW_PAD + dy + g]


def sweep_planes_jnp(planes: jnp.ndarray, params: SweepParams, k: int,
                     cohesion: bool, ordered_budget: bool,
                     window: int = 1, fresh_mask: bool = False) -> jnp.ndarray:
    """Full-grid pair sweep, jnp fallback. Returns (2, G, L) corrections.

    Semantically identical to the Pallas kernel (ops/pallas/sweep_kernel.py);
    math follows ``_enforce_distance`` (reference :1514-1545) with each slot
    applying its own half of each pair's correction.

    ``window=3, fresh_mask=True`` is the WIDE sweep used during violent
    phases: the scan covers +-3 STALE cells but pairs are admitted only when
    their FRESH cells (recomputed from current positions) are within +-1 —
    exactly the pair set a per-pass hash rebuild would produce
    (reference :1866-1879) as long as no particle drifted a full cell since
    binning, at zero extra sorts. Measured on the 500-particle settle
    explosion: per-step binning alone errs ~20%% in spread vs the sequential
    oracle, per-PASS rebuild 0.1%% — the entire gap is intra-substep
    membership staleness, which the fresh-cell mask removes.
    """
    lanes = planes.shape[2]
    g = lanes // k
    s = _row_slice(planes, 0)
    sx, sy, sw, sr = s[FIELD_X], s[FIELD_Y], s[FIELD_W], s[FIELD_R]
    sb, scum, sidx, socc = (s[FIELD_BATCH], s[FIELD_CUM],
                            s[FIELD_IDX], s[FIELD_OCC])

    tx = jnp.zeros_like(sx)
    ty = jnp.zeros_like(sy)
    (collision_c, cohesion_c, overlap_f, cohesion_f, max_pairs,
     cell_size, fresh_mod, occ_cap) = params
    fm = jnp.where(fresh_mod > 0, fresh_mod, jnp.float32(g))
    boost_hi = jnp.maximum(occ_cap, 1.0)
    inv_k = jnp.float32(1.0 / k)
    if fresh_mask:
        # fresh torus cells from CURRENT positions (planes are updated in
        # place every pass; only slot membership goes stale); the modulus is
        # the GLOBAL torus (fresh_mod), not the plane width — they differ on
        # spatial local windows
        fx_all = jnp.mod(jnp.floor(planes[FIELD_X] / cell_size), fm)
        fy_all = jnp.mod(jnp.floor(planes[FIELD_Y] / cell_size), fm)
        fresh = jnp.stack([fx_all, fy_all])                  # (2, rows, L)
        sfx = _row_slice(fresh, 0)[0]
        sfy = _row_slice(fresh, 0)[1]

    def torus_adjacent(a, b):
        dd = jnp.mod(a - b + 0.5 * fm, fm) - 0.5 * fm
        return jnp.abs(dd) <= 1

    def pair_terms(tx, ty, o, mask, sgn):
        ox, oy, ow, orr = o[FIELD_X], o[FIELD_Y], o[FIELD_W], o[FIELD_R]
        ob, ocum, oidx, oocc = (o[FIELD_BATCH], o[FIELD_CUM],
                                o[FIELD_IDX], o[FIELD_OCC])

        ddx = ox - sx
        ddy = oy - sy
        dist2 = ddx * ddx + ddy * ddy

        valid = (socc > 0.0) & (oocc > 0.0) & mask
        if ordered_budget:
            cum_min = jnp.where(oidx < sidx, ocum, scum)
            valid = valid & (cum_min < max_pairs)

        # Trimmed XPBD projection, kept in LOCKSTEP with the Pallas kernel
        # (ops/pallas/sweep_kernel._pair_terms — bit-exact twin): the
        # direction normalization inv_d folds into the violation factor
        # f = -viol * inv_d = target_d * inv_d - 1 (dist * inv_d == 1 up
        # to rsqrt rounding), raw ddx/ddy serve as the direction, and the
        # two constraint divides share one denominator. Coincident pairs
        # (deg, the reference's eps guard :1531) substitute inv_d -> 1,
        # "1" -> 0 so the factor is exactly |viol|, pushed along the
        # oblique tiebreak axis (TIE_X above) with the antisymmetric sign.
        # clip(-viol/D, ±|viol|) == -viol/max(D, 1) — the reference's
        # correction clamp :1535-1536 folded into the division.
        deg = dist2 <= EPS * EPS
        inv_d1 = jnp.where(deg, 1.0,
                           jax.lax.rsqrt(jnp.maximum(dist2, EPS * EPS)))
        nd = jnp.where(deg, 0.0, 1.0)

        w_sum = sw + ow
        ok = valid & (w_sum >= EPS)                    # :1601
        sum_r = sr + orr

        min_d = overlap_f * sum_r
        hit_l = ok & (dist2 <= min_d * min_d)
        fl = jnp.where(hit_l, min_d * inv_d1 - nd, 0.0)
        dl = jnp.maximum(w_sum + collision_c, 1.0)
        if cohesion:
            coh_d = cohesion_f * sum_r
            hit_c = ok & (sb == ob) & (dist2 <= coh_d * coh_d)
            fc = jnp.where(hit_c, coh_d * inv_d1 - nd, 0.0)
            dc = jnp.maximum(w_sum + cohesion_c, 1.0)
            num = fc * dl + fl * dc
            den = dc * dl
        else:
            num = fl
            den = dl

        # occupancy pressure (SweepParams.occ_boost_cap): the other side's
        # cell holds oocc members but only K are resolved — scale this
        # pair's effect by the unresolved fraction. Honest cells (occ <= K,
        # or 0/1-OCC layouts) give boost = 1 exactly.
        boost = jnp.clip(oocc * inv_k, 1.0, boost_hi)
        s_eff = (num / den) * (sw * boost)
        ux = jnp.where(deg, sgn * TIE_X, ddx)
        uy = jnp.where(deg, sgn * TIE_Y, ddy)
        tx = tx - ux * s_eff
        ty = ty - uy * s_eff
        return tx, ty

    d_hi = (window + 1) * k                            # d in [-(d_hi-1), d_hi)
    for dy in range(-window, window + 1):
        o_rows = _row_slice(planes, dy)
        of_rows = _row_slice(fresh, dy) if fresh_mask else None

        def terms_at(tx, ty, d, static_d: bool):
            """Pair terms at lane offset d (python int when static_d)."""
            roll = _roll_lanes if static_d else (
                lambda x, dd: jnp.roll(x, dd, axis=-1))
            mask = lane_mask(lanes, k, d, window)[None, :]
            if dy == 0:
                mask = mask & (jnp.asarray(d) != 0)        # self pairing
            o = roll(o_rows, d)
            if fresh_mask:
                ofr = roll(of_rows, d)
                mask = (mask & torus_adjacent(sfx, ofr[0])
                        & torus_adjacent(sfy, ofr[1]))
            # antisymmetric pair-side sign for the coincident tiebreak:
            # +1 on the (dy > 0) | (dy == 0 & d > 0) half-space, -1 opposite
            sgn = (jnp.sign(jnp.asarray(d).astype(jnp.float32)) if dy == 0
                   else jnp.float32(1.0 if dy > 0 else -1.0))
            return pair_terms(tx, ty, o, mask, sgn)

        if window == 1:
            # hot narrow path: static unroll (cheap — 4k-1 offsets)
            for d in range(-(d_hi - 1), d_hi):
                if dy == 0 and d == 0:
                    continue
                tx, ty = terms_at(tx, ty, d, True)
        else:
            # wide path: a traced-offset loop — unrolling the up-to-8k
            # offsets x 7 rows of window=3 ballooned compile time on the
            # CPU-mesh paths (the jnp sweep is the fallback/golden model,
            # not the hot path; the Pallas kernel stays fully unrolled)
            def body(j, c):
                tx, ty = c
                return terms_at(tx, ty, j - (d_hi - 1), False)

            tx, ty = jax.lax.fori_loop(0, 2 * d_hi - 1, body, (tx, ty))

    return jnp.stack([tx, ty])


def count_planes_jnp(planes: jnp.ndarray, k: int) -> jnp.ndarray:
    """(G, L) count of neighbor pairs first examined at each slot (idx_j > idx_i),
    for the ordered budget prefix (examined-pair counting, reference :1656-1658)."""
    lanes = planes.shape[2]
    s = _row_slice(planes, 0)
    sidx, socc = s[FIELD_IDX], s[FIELD_OCC]
    total = jnp.zeros_like(sidx)
    for dy in (-1, 0, 1):
        o_rows = _row_slice(planes, dy)
        for d in range(-(2 * k - 1), 2 * k):
            if dy == 0 and d == 0:
                continue
            mask = lane_mask(lanes, k, d)[None, :]
            o = _roll_lanes(o_rows, d)
            new_pair = ((socc > 0.0) & (o[FIELD_OCC] > 0.0) & mask
                        & (o[FIELD_IDX] > sidx))
            total = total + new_pair.astype(jnp.float32)
    return total

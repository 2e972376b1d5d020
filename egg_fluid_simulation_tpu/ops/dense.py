"""Dense cell-grid collision engine — the TPU-native neighbor structure.

The gather-based engine (ops/grid.py + the candidate sweep in ops/solver.py)
is exact but bandwidth-crippled at scale: TPU gathers run element-at-a-time,
so the ``(N, 9K)`` candidate fetch caps out around ~8 GB/s. This engine
removes gathers from the hot path entirely.

**Layout.** Particles are binned into field *planes* of shape ``(F, G+2, L)``
with ``L = G * K`` lanes: grid row = y cell (plus one padding row top and
bottom for the vertical halo), lane = ``x_cell * K + slot``. Cell size is the
reference's spatial-hash cell ``max(1, max_radius * max(collision_overlap_factor,
cohesion_interaction_distance_factor))`` (simulation_handler.lua:1756-1760).
``L`` is lane-aligned and large, so every op tiles perfectly onto the VPU.

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

**Budget.** Particles beyond ``K`` per cell or outside the grid are dropped
for the pass — the static analog of the reference's collision budget
(:1749-1753). The ordered ``0.05 n^2`` examined-pair cutoff (:1656-1658) is
reproduced with a counting sweep + prefix ride-along field, as in the gather
engine.

Out-of-range particles clamp into the 2-cell empty margin ring, degrading
(extra same-cell candidates) but never changing shapes — mirroring the
reference's canvas clamp philosophy (:1953-1954).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..utils.mathx import EPS
from .grid import segmented_rank

__all__ = ["DenseBinning", "SweepParams", "bin_to_planes", "sweep_planes_jnp",
           "count_planes_jnp", "lane_mask", "FIELD_X", "FIELD_Y", "FIELD_W",
           "FIELD_R", "FIELD_BATCH", "FIELD_CUM", "FIELD_IDX", "FIELD_OCC",
           "N_FIELDS", "MARGIN"]

# field layout of the (F, G+2, L) plane tensor
FIELD_X = 0       # position x (px)
FIELD_Y = 1       # position y
FIELD_W = 2       # inverse mass
FIELD_R = 3       # radius
FIELD_BATCH = 4   # batch slot as float (exact below 2^24)
FIELD_CUM = 5     # exclusive prefix of examined-pair counts (ordered budget)
FIELD_IDX = 6     # particle index as float (pair ordering / self exclusion)
FIELD_OCC = 7     # 1.0 = occupied slot
N_FIELDS = 8

MARGIN = 2        # empty cells on every side; >= ceil((2K-1)/K) so lane rolls
                  # never wrap occupied data into occupied lanes
ROW_PAD = 8       # padding rows above/below the grid; 8-row alignment lets the
                  # Pallas kernel DMA (8,128)-tiled row blocks without masking


class DenseBinning(NamedTuple):
    planes: jnp.ndarray     # (F, G+2*ROW_PAD, L) f32; first/last ROW_PAD rows pad
    slot: jnp.ndarray       # (N,) i32 unpadded flat slot (row*L + cx*K + rank),
                            # G*L = dropped
    pidx_grid: jnp.ndarray  # (rows*L,) i32 particle index per padded slot, -1 empty
    origin: jnp.ndarray     # (2,) f32 world position of grid corner
    cell_size: jnp.ndarray  # scalar f32


class SweepParams(NamedTuple):
    """Dynamic scalars for the sweep (packed to a (8,) array for SMEM)."""
    collision_compliance: jnp.ndarray
    cohesion_compliance: jnp.ndarray
    collision_overlap_factor: jnp.ndarray
    cohesion_factor: jnp.ndarray
    max_pairs: jnp.ndarray     # ordered-budget cutoff; +inf when budget off

    def pack(self) -> jnp.ndarray:
        vals = [jnp.asarray(v, jnp.float32) for v in self]
        vals += [jnp.float32(0.0)] * (8 - len(vals))
        return jnp.stack(vals)


def bin_to_planes(pos, inv_mass, radius, batch_slot, active, cell_size,
                  *, grid_dim: int, slots_per_cell: int,
                  cum=None) -> DenseBinning:
    """Sort-bin particles into dense field planes (one sort, one scatter)."""
    n = pos.shape[0]
    g, k = grid_dim, slots_per_cell
    lanes = g * k

    big = jnp.float32(3.4e38)
    aabb_min = jnp.min(jnp.where(active[:, None], pos, big), axis=0)
    # snap to the world cell lattice: the reference hashes floor(pos / cell)
    # (:1494-1495), so pair sets depend on absolute cell alignment — snapping
    # makes dense and gather engines (and the oracle) see identical cells
    origin = (jnp.floor(aabb_min / cell_size) - MARGIN) * cell_size

    cxy = jnp.clip(jnp.floor((pos - origin) / cell_size).astype(jnp.int32),
                   MARGIN, g - 1 - MARGIN)
    cell_id = cxy[:, 1] * g + cxy[:, 0]
    cell_id = jnp.where(active, cell_id, g * g)            # sentinel

    idx = jnp.arange(n, dtype=jnp.int32)
    cid_sorted, pidx_sorted = jax.lax.sort_key_val(cell_id, idx)
    rank = segmented_rank(cid_sorted)
    # unpadded flat slot: row * L + cx * K + rank
    row = cid_sorted // g
    cx = cid_sorted - row * g
    slot_sorted = jnp.where((rank < k) & (cid_sorted < g * g),
                            row * lanes + cx * k + rank, g * lanes)

    slot = jnp.zeros((n,), jnp.int32).at[pidx_sorted].set(slot_sorted)

    if cum is None:
        cum = jnp.zeros((n,), jnp.float32)
    pack = jnp.stack([
        pos[:, 0], pos[:, 1], inv_mass, radius,
        batch_slot.astype(jnp.float32), cum,
        idx.astype(jnp.float32),
        jnp.where(active, 1.0, 0.0),
    ], axis=1)                                             # (N, F)

    # Build planes by inverse-index scatter + ROW GATHER: XLA row scatters run
    # ~45ns/row on TPU while row gathers run ~4ns/row, so we scatter only the
    # (N,) particle-index permutation and gather the wide payload.
    rows = g + 2 * ROW_PAD
    slot_padded = jnp.where(slot_sorted < g * lanes,
                            slot_sorted + ROW_PAD * lanes, rows * lanes)
    pidx_grid = jnp.full((rows * lanes + 1,), -1, jnp.int32)
    pidx_grid = pidx_grid.at[slot_padded].set(pidx_sorted, mode="drop")[:-1]

    occupied = pidx_grid >= 0
    rows_data = pack[jnp.maximum(pidx_grid, 0)]            # (rows*L, F) row gather
    rows_data = jnp.where(occupied[:, None], rows_data, 0.0)
    planes = rows_data.T.reshape(N_FIELDS, rows, lanes)
    return DenseBinning(planes=planes, slot=slot, pidx_grid=pidx_grid,
                        origin=origin, cell_size=cell_size)


def refresh_positions(binning: DenseBinning, pos: jnp.ndarray) -> DenseBinning:
    """Rewrite the X/Y fields from current positions, keeping slot assignment.

    Used by ``dense_rebin="step"``: the sort + permutation build happens once
    per step; between substeps only positions change materially, so one row
    gather refreshes the grid (cells go stale by at most a substep's motion).
    """
    rows, lanes = binning.planes.shape[1], binning.planes.shape[2]
    occupied = binning.pidx_grid >= 0
    xy = pos[jnp.maximum(binning.pidx_grid, 0)]            # (rows*L, 2)
    xy = jnp.where(occupied[:, None], xy, 0.0)
    planes = binning.planes.at[FIELD_X].set(xy[:, 0].reshape(rows, lanes))
    planes = planes.at[FIELD_Y].set(xy[:, 1].reshape(rows, lanes))
    return binning._replace(planes=planes)


def update_cum_field(binning: DenseBinning, cum: jnp.ndarray) -> DenseBinning:
    """Write a fresh ordered-budget prefix into FIELD_CUM (gather by pidx_grid)."""
    rows, lanes = binning.planes.shape[1], binning.planes.shape[2]
    occupied = binning.pidx_grid >= 0
    vals = cum[jnp.maximum(binning.pidx_grid, 0)]
    vals = jnp.where(occupied, vals, 0.0)
    planes = binning.planes.at[FIELD_CUM].set(vals.reshape(rows, lanes))
    return binning._replace(planes=planes)


def lane_mask(lanes: int, k: int, d: int) -> jnp.ndarray:
    """(lanes,) bool — pairs (l, l-d) whose cells are within +-1 column.

    cell(l) - cell(l-d) = -floor((s - d) / k) for s = l mod k; the mask keeps
    |cell diff| <= 1, exactly the reference's 3x3 scan (:1568-1569).
    """
    s = jnp.arange(lanes) % k
    cell_diff = -jnp.floor_divide(s - d, k)
    return jnp.abs(cell_diff) <= 1


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
                     cohesion: bool, ordered_budget: bool) -> jnp.ndarray:
    """Full-grid pair sweep, jnp fallback. Returns (2, G, L) corrections.

    Semantically identical to the Pallas kernel (ops/pallas/sweep_kernel.py);
    math follows ``_enforce_distance`` (reference :1514-1545) with each slot
    applying its own half of each pair's correction.
    """
    lanes = planes.shape[2]
    s = _row_slice(planes, 0)
    sx, sy, sw, sr = s[FIELD_X], s[FIELD_Y], s[FIELD_W], s[FIELD_R]
    sb, scum, sidx, socc = (s[FIELD_BATCH], s[FIELD_CUM],
                            s[FIELD_IDX], s[FIELD_OCC])

    tx = jnp.zeros_like(sx)
    ty = jnp.zeros_like(sy)
    (collision_c, cohesion_c, overlap_f, cohesion_f, max_pairs) = params

    for dy in (-1, 0, 1):
        o_rows = _row_slice(planes, dy)
        for d in range(-(2 * k - 1), 2 * k):
            if dy == 0 and d == 0:
                continue                                   # self pairing
            mask = lane_mask(lanes, k, d)[None, :]
            o = _roll_lanes(o_rows, d)
            ox, oy, ow, orr = o[FIELD_X], o[FIELD_Y], o[FIELD_W], o[FIELD_R]
            ob, ocum, oidx, oocc = (o[FIELD_BATCH], o[FIELD_CUM],
                                    o[FIELD_IDX], o[FIELD_OCC])

            ddx = ox - sx
            ddy = oy - sy
            dist2 = ddx * ddx + ddy * ddy
            dist = jnp.sqrt(dist2)
            inv_dist = jnp.where(dist > EPS, 1.0 / jnp.maximum(dist, EPS), 0.0)

            valid = (socc > 0.0) & (oocc > 0.0) & mask
            if ordered_budget:
                cum_min = jnp.where(oidx < sidx, ocum, scum)
                valid = valid & (cum_min < max_pairs)

            w_sum = sw + ow
            ok = valid & (w_sum >= EPS)                    # :1601

            scale = jnp.zeros_like(dist)
            if cohesion:
                same = sb == ob
                coh_d = cohesion_f * (sr + orr)
                viol = dist - coh_d
                corr = jnp.where(w_sum + cohesion_c >= EPS,
                                 -viol / jnp.maximum(w_sum + cohesion_c, EPS), 0.0)
                corr = jnp.clip(corr, -jnp.abs(viol), jnp.abs(viol))
                scale = scale + jnp.where(ok & same & (dist2 <= coh_d * coh_d),
                                          corr * sw, 0.0)

            min_d = overlap_f * (sr + orr)
            viol = dist - min_d
            corr = jnp.where(w_sum + collision_c >= EPS,
                             -viol / jnp.maximum(w_sum + collision_c, EPS), 0.0)
            corr = jnp.clip(corr, -jnp.abs(viol), jnp.abs(viol))  # :1535-1536
            scale = scale + jnp.where(ok & (dist2 <= min_d * min_d),
                                      corr * sw, 0.0)

            tx = tx + (-ddx * inv_dist) * scale
            ty = ty + (-ddy * inv_dist) * scale

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

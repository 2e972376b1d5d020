"""Uniform-grid neighbor search, rebuilt sort-free of host hash tables.

The reference builds a Lua-table spatial hash every collision pass
(``/root/reference/simulation_handler.lua:1474-1511``): Szudzik-paired cell
hash -> list of particle indices, with cell size
``max(1, max_radius * max(collision_overlap_factor,
cohesion_interaction_distance_factor))`` (:1756-1760).

Unbounded hash tables don't exist on a TPU, so this is the sort-based dense
equivalent (the "tiled cell-list" of SURVEY.md §7):

1. integer cell coords ``floor(pos / cell_size)`` (:1494-1495),
2. multiplicative XOR hash of the cell coords into a power-of-two table
   (replaces Szudzik pairing — we only need a well-mixed bucket index, not an
   invertible pairing),
3. one ``lax.sort`` by bucket, ranks within each bucket via ``searchsorted``,
4. scatter into a dense ``(table_size + 1, K)`` slot table. Particles beyond
   ``K`` per bucket are dropped — the static-capacity analog of the
   reference's collision budget ``0.05 * n^2`` (:1749-1753, :1656-1658), which
   exists for exactly the same reason: dense clusters must not blow up cost.

Bucket collisions (two far-apart cells sharing a bucket) only create candidate
pairs that the solver's distance tests reject, so they cost compute, never
correctness.

All shapes are static; everything runs under ``vmap`` over the population axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CellGrid", "build_grid", "neighbor_candidates",
           "NEIGHBOR_OFFSETS", "count_pairs_mxu"]

# Knuth-style multiplicative constants; any well-mixed odd constants work.
# numpy scalars ON PURPOSE: jnp scalar constructors dispatch a primitive at
# module import, initializing the JAX backend — which dials the TPU tunnel
# and hangs every `import egg_fluid_simulation_tpu` when the tunnel is down
_HASH_X = np.uint32(0x9E3779B1)
_HASH_Y = np.uint32(0x85EBCA77)

# 3x3 neighborhood, matching the reference's cell scan at :1568-1569.
NEIGHBOR_OFFSETS = [(-1, -1), (-1, 0), (-1, 1),
                    (0, -1), (0, 0), (0, 1),
                    (1, -1), (1, 0), (1, 1)]


class CellGrid(NamedTuple):
    table: jnp.ndarray      # (table_size + 1, K) i32, -1 = empty slot
    cell_xy: jnp.ndarray    # (N, 2) i32 cell coords per particle
    table_size: int


def _bucket_of(cell_x: jnp.ndarray, cell_y: jnp.ndarray, table_size: int) -> jnp.ndarray:
    hx = cell_x.astype(jnp.uint32) * _HASH_X
    hy = cell_y.astype(jnp.uint32) * _HASH_Y
    return ((hx ^ hy) & jnp.uint32(table_size - 1)).astype(jnp.int32)


def build_grid(
    pos: jnp.ndarray,        # (N, 2) f32
    active: jnp.ndarray,     # (N,) bool
    cell_size: jnp.ndarray,  # scalar f32 (dynamic — depends on live config)
    *,
    table_size: int,         # static, power of two
    slots_per_cell: int,     # static K
) -> CellGrid:
    n = pos.shape[0]
    cell_xy = jnp.floor(pos / cell_size).astype(jnp.int32)
    bucket = _bucket_of(cell_xy[:, 0], cell_xy[:, 1], table_size)
    # inactive particles go to the sentinel row `table_size`, never queried
    bucket = jnp.where(active, bucket, table_size)

    idx = jnp.arange(n, dtype=jnp.int32)
    bucket_sorted, idx_sorted = jax.lax.sort_key_val(bucket, idx)
    rank = segmented_rank(bucket_sorted)

    # flattened 1D scatter (2D scatters and searchsorted-based ranking compile
    # orders of magnitude slower on TPU); rank >= K clamps into a dumping row
    flat = jnp.where(rank < slots_per_cell,
                     bucket_sorted * slots_per_cell + rank,
                     jnp.int32((table_size + 1) * slots_per_cell))
    table = jnp.full(((table_size + 2) * slots_per_cell,), -1, dtype=jnp.int32)
    table = table.at[flat].set(idx_sorted, mode="drop")
    table = table[:(table_size + 1) * slots_per_cell].reshape(table_size + 1,
                                                              slots_per_cell)
    return CellGrid(table=table, cell_xy=cell_xy, table_size=table_size)


def segmented_rank(sorted_keys: jnp.ndarray) -> jnp.ndarray:
    """Rank of each element within its run of equal (sorted) keys.

    ``cummax`` of run-start positions — compiles to a cheap parallel scan,
    unlike a searchsorted self-query.
    """
    n = sorted_keys.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool),
                                sorted_keys[1:] != sorted_keys[:-1]])
    run_start = jax.lax.cummax(jnp.where(is_start, idx, 0))
    return idx - run_start


def segment_extent(sorted_keys: jnp.ndarray):
    """(rank, count) of each element within its run of equal sorted keys.

    ``count`` is the run's TOTAL length — for cell-sorted particles, the
    cell's true occupancy including members past the slot budget. Two
    parallel scans (forward cummax of run starts, reverse cummin of run
    ends); no gathers, no extra sort.
    """
    n = sorted_keys.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    change = sorted_keys[1:] != sorted_keys[:-1]
    is_start = jnp.concatenate([jnp.ones((1,), bool), change])
    is_end = jnp.concatenate([change, jnp.ones((1,), bool)])
    run_start = jax.lax.cummax(jnp.where(is_start, idx, 0))
    run_end = jax.lax.cummin(jnp.where(is_end, idx, n - 1), reverse=True)
    return idx - run_start, run_end - run_start + 1


def count_pairs_mxu(hi: jnp.ndarray, lo: jnp.ndarray, n_hi: int, n_lo: int,
                    chunk: int = 1 << 16) -> jnp.ndarray:
    """(n_hi, n_lo) occurrence counts of id pairs via one MXU contraction.

    ``counts[r, c] = #{i : hi_i == r and lo_i == c}`` computed as
    ``A @ B`` with ``A[r, i] = [hi_i == r]`` and ``B[i, c] = [lo_i == c]`` —
    indicator entries are exact in bf16 and the f32 accumulation is exact for
    counts below 2^24. Replaces searchsorted-based histogram/edge builds:
    ``jnp.searchsorted``'s default method='scan' serializes over queries
    (measured ~0.5 us/query — ~3 ms for one 6k-bin edge table at 1M keys),
    while this runs at MXU rate (~0.3 ms for the same shape). Ids outside
    ``[0, n_hi) x [0, n_lo)`` (e.g. sentinel rows) count toward nothing.
    """
    n = hi.shape[0]
    ids_h = jnp.arange(n_hi, dtype=jnp.int32)
    ids_l = jnp.arange(n_lo, dtype=jnp.int32)

    def one(args):
        h, l = args
        a = (ids_h[:, None] == h[None, :]).astype(jnp.bfloat16)   # (H, C)
        b = (l[:, None] == ids_l[None, :]).astype(jnp.bfloat16)   # (C, L)
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    if n <= chunk:
        return one((hi.astype(jnp.int32), lo.astype(jnp.int32)))
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    h_p = jnp.pad(hi.astype(jnp.int32), (0, pad), constant_values=n_hi)
    l_p = jnp.pad(lo.astype(jnp.int32), (0, pad), constant_values=n_lo)
    parts = jax.lax.map(one, (h_p.reshape(n_chunks, chunk),
                              l_p.reshape(n_chunks, chunk)))
    return jnp.sum(parts, axis=0)


def neighbor_candidates(grid: CellGrid) -> jnp.ndarray:
    """(N, 9 * K) candidate particle indices per particle, -1 = empty.

    The 3x3 scan around each particle's own cell — the vectorized form of the
    reference's ``for x_offset = -1, 1 do for y_offset = -1, 1`` (:1568-1573).
    """
    cx, cy = grid.cell_xy[:, 0], grid.cell_xy[:, 1]
    buckets = jnp.stack(
        [_bucket_of(cx + dx, cy + dy, grid.table_size) for dx, dy in NEIGHBOR_OFFSETS],
        axis=1,
    )  # (N, 9)
    # Distinct cells can hash to the same bucket; the reference's Szudzik
    # pairing (:1474-1483) is injective so it never visits a cell twice —
    # mask repeated buckets or their candidates would be double-applied.
    n_off = buckets.shape[1]
    dup = jnp.zeros_like(buckets, dtype=bool)
    for j in range(1, n_off):
        seen = jnp.zeros((buckets.shape[0],), bool)
        for i in range(j):
            seen = seen | (buckets[:, i] == buckets[:, j])
        dup = dup.at[:, j].set(seen)
    cand = grid.table[buckets]  # (N, 9, K)
    cand = jnp.where(dup[:, :, None], -1, cand)
    return cand.reshape(cand.shape[0], -1)

"""Pallas TPU kernel: build the dense field planes from sort-binned particles.

After the cell sort, particle slots are ASCENDING — building the plane tensor
is an ordered "expand with gaps", which XLA can only express as an
element-serialized scatter (~7 ns/element) plus a 2x-oversized row gather
(~6 ms at 1M particles). This kernel replaces both.

Each program produces one 512-slot chunk of the flattened (F, G*L) plane
tensor. Slots are unique and sorted, so the particles landing in a chunk are
one contiguous input run of length <= 512 whose start is a scalar-prefetched
searchsorted result. The program:

1. DMAs a lane-aligned window ``pack_t[:, align(start) : align(start)+640]``
   of the TRANSPOSED sorted payload straight from HBM (starts are rounded
   down to the 128-lane tile, so no unaligned slicing anywhere),
2. places entries with a one-hot matmul on the MXU over the whole window:
   ``out[f, o] = sum_j pack[f, j] * [slot_j == o0 + o]`` — exact, since the
   one-hot selects at most one window entry per output slot (entries outside
   the chunk's slot range simply match nothing),
3. writes the (F, 512) chunk.

Torus halo rows (ops/dense.py) are filled by the caller's ``fill_halo`` — two
row-block copies.

The jnp scatter+gather path in ops/dense.py remains the golden model and the
CPU / ordered-budget fallback; a unit test diffs the two bit-for-bit in
interpret mode. Capability parity: the reference's per-pass hash rebuild is
``_rebuild_spatial_hash`` (/root/reference/simulation_handler.lua:1486-1511).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import dense as D

__all__ = ["place_planes", "on_tpu"]

_SUB = 512        # output slots per program
_ALIGN = 128      # lane tile: DMA starts rounded down to this
_OVERFLOW_SLACK = 512  # extra window lanes absorbing per-cell-cap overflow
                  # entries interleaved in the cell-sorted input (see
                  # place_planes: overflow beyond the slack is budget-dropped)
_F_PAD = 16       # padded field count (8 pair + up to 7 aux + slot column)
SLOT_COL = 15     # the slot rides as an f32 payload column (exact < 2^24)


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _make_kernel(sub: int, win: int, ch: int):
    """One program = ``ch`` consecutive 512-slot chunks, double-buffered:
    chunk j+1's window DMA flies while chunk j's one-hot matmul runs. The
    one-chunk-per-program form serialized 4.6k DMA start/wait pairs against
    the MXU (~6 ms of exposed issue latency at the 1M headline)."""
    def kernel(starts_ref, pack_hbm, out_ref, scratch, sem):
        s = pl.program_id(0)

        def get_dma(slot, j):
            start = starts_ref[s * ch + j]
            aligned = (start // _ALIGN) * _ALIGN
            return pltpu.make_async_copy(
                pack_hbm.at[:, pl.ds(aligned, win)],
                scratch.at[slot], sem.at[slot])

        get_dma(0, 0).start()
        for j in range(ch):                                 # static unroll
            if j + 1 < ch:
                get_dma((j + 1) % 2, j + 1).start()
            get_dma(j % 2, j).wait()
            _place_chunk(scratch[j % 2], starts_ref, s * ch + j, sub,
                         out_ref, j)
    return kernel


def _place_chunk(window, starts_ref, c, sub: int, out_ref, j: int):
    """Place one 512-slot chunk from its VMEM ``window`` into output
    columns [j*sub, (j+1)*sub)."""
    win = window.shape[1]
    o0 = (c * sub).astype(jnp.float32)
    # slots are exact integers in f32 (< 2^24); compare in int32
    # (Mosaic iota is integer-only)
    offs = (window[SLOT_COL] - o0).astype(jnp.int32)        # (win,)
    col = jax.lax.broadcasted_iota(jnp.int32, (win, sub), 1)
    onehot = (offs[:, None] == col).astype(jnp.bfloat16)    # (j, o)

    # The payload must survive the MXU EXACTLY (positions feed physics;
    # an f32 matmul may silently run at bf16 under
    # --xla_allow_excess_precision, which was observed to quantize
    # positions to ~16px and blow the solver up). Provably exact path:
    # bitcast f32 -> 4 bytes, one-hot match each byte plane (8-bit
    # integers and {0,1} are exact in bf16; each output selects at most
    # one entry, so no summation error), reassemble the bits. The four
    # byte planes STACK ALONG M into a single (4F, win) x (win, sub)
    # matmul: same FLOPs as four (F, win) passes, but M=64 instead of
    # M=16 lifts MXU row utilization 12.5% -> 50% (measured 11.4 -> 9.3 ms
    # at the 1M headline; the rest was the serialized DMA this kernel's
    # double buffering removes).
    bits = pltpu.bitcast(window, jnp.int32)
    w4 = jnp.concatenate(
        [jnp.bitwise_and(jax.lax.shift_right_logical(bits, 8 * byte),
                         0xFF)
         for byte in range(4)], axis=0).astype(jnp.bfloat16)  # (4F, win)
    placed = jax.lax.dot_general(
        w4, onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # (4F, o) exact ints
    f = window.shape[0]
    acc = None
    for byte in range(4):
        part = placed[byte * f:(byte + 1) * f].astype(jnp.int32)
        shifted = jax.lax.shift_left(part, 8 * byte)
        acc = shifted if acc is None else jnp.bitwise_or(acc, shifted)
    out_ref[:, j * sub:(j + 1) * sub] = pltpu.bitcast(acc, jnp.float32)


@functools.partial(jax.jit, static_argnames=("g", "k", "win", "interpret"))
def _place_pallas(pack_t, starts, g: int, k: int, win: int,
                  interpret: bool = False):
    lanes = g * k
    total = g * lanes
    sub = min(_SUB, lanes)
    assert total % sub == 0
    n_chunks = total // sub
    ch = 8
    while n_chunks % ch:
        ch //= 2

    kernel = _make_kernel(sub, win, ch)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks // ch,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((_F_PAD, ch * sub), lambda i, starts: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((2, _F_PAD, win), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((_F_PAD, total), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(starts, pack_t)


def place_planes(slot_sorted, pack_sorted, g: int, k: int,
                 interpret: bool = False, search_key=None):
    """(F_pad, rows, lanes) planes (halo rows EMPTY — caller fills) from
    sorted slots + payload.

    ``slot_sorted``: (N,) i32 unpadded flat slots (g*lanes = dropped).
    ``pack_sorted``: (N, F<=15) f32 payload in the same order. Returns the
    stacked plane tensor; caller slices pair/aux fields and wraps the torus
    halo. Padding column ``SLOT_COL`` is consumed here.

    Two input orders are supported:

    - ``search_key=None``: ``slot_sorted`` itself is globally ascending
      (compacted order — overflow/sentinel entries at the tail).
    - ``search_key=`` a (N,) i32 MONOTONE key (e.g. the cell-sorted
      ``cell_id * k + min(rank, k-1)`` clamp): window starts come from the
      key while the one-hot matches on ``slot_sorted``, whose sentinel
      entries (per-cell-cap overflow) match nothing. This skips the
      compaction sort entirely (~2.8 ms at 1M). Overflow entries inflate the
      window span; spans beyond ``_OVERFLOW_SLACK`` leave the span's TAIL
      entries unplaced — their plane slots stay zero (FIELD_OCC = 0), which
      the extraction path treats as a collision budget drop (the reference's
      past-cutoff behavior, simulation_handler.lua:1656-1658).
    """
    n, f = pack_sorted.shape
    lanes = g * k
    sub = min(_SUB, lanes)
    win = sub + _ALIGN + (0 if search_key is None else _OVERFLOW_SLACK)
    assert f <= SLOT_COL

    pad_cols = jnp.zeros((n, SLOT_COL - f), jnp.float32)
    pack16 = jnp.concatenate(
        [pack_sorted, pad_cols, slot_sorted.astype(jnp.float32)[:, None]],
        axis=1)
    pack_t = pack16.T                                       # (16, N)
    # DMA overrun slack: one full window of sentinel entries
    sentinel = jnp.zeros((_F_PAD, win), jnp.float32).at[SLOT_COL].set(
        jnp.float32(g * lanes))
    pack_t = jnp.concatenate([pack_t, sentinel], axis=1)

    key = slot_sorted if search_key is None else search_key
    n_chunks = (g * lanes) // sub
    if sub & (sub - 1) == 0:
        # starts via per-chunk COUNTS (MXU one-hot) + cumsum: searchsorted's
        # per-query scan serialized over the ~2k chunk queries (~1-2 ms at
        # production shapes). chunk id = key >> log2(sub); sentinel keys land
        # at n_chunks and count toward nothing.
        from ..grid import count_pairs_mxu
        shift = sub.bit_length() - 1
        cid = jax.lax.shift_right_logical(key, shift)
        n_lo = min(64, n_chunks)
        n_hi = -(-n_chunks // n_lo)
        cnt = count_pairs_mxu(cid // n_lo, cid % n_lo, n_hi, n_lo)
        flat = cnt.reshape(-1)[:n_chunks]
        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.float32),
             jnp.cumsum(flat)])[:-1].astype(jnp.int32)
    else:
        block_starts = jnp.arange(0, g * lanes, sub, dtype=jnp.int32)
        starts = jnp.searchsorted(key, block_starts).astype(jnp.int32)
    flat = _place_pallas(pack_t, starts, g, k, win, interpret=interpret)
    rows = g + 2 * D.ROW_PAD
    out = jnp.zeros((_F_PAD, rows, lanes), jnp.float32)
    return out.at[:, D.ROW_PAD:D.ROW_PAD + g].set(flat.reshape(_F_PAD, g, lanes))

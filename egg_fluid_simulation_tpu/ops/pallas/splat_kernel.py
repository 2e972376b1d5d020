"""Pallas TPU kernel: per-tile gaussian splat accumulation.

The render's dominant cost is evaluating every candidate particle's rotated
anisotropic gaussian against every pixel of its evaluation tile and
screen-blending the results (``1 - prod(1 - g)``) — the TPU-side equivalent
of the reference's instanced textured-quad draw with
``glBlendFunc(GL_ONE_MINUS_DST_ALPHA, GL_ONE)`` accumulation
(/root/reference/simulation_handler.lua:2046-2064,
simulation_handler_particle_texture.glsl:6-17,
simulation_handler_instanced_draw.glsl:14-44).

In plain XLA this pass is a ``vmap``-over-tiles ``lax.scan`` over candidate
chunks (ops/render.py:splat_population): every chunk step materializes its
(tiles, th, tw, chunk) intermediates through HBM, which measured ~15 ms at
the 1M headline (640^2 effective canvas, 720 candidates/px) — ~6x over the
arithmetic's VPU cost. This kernel runs the same math VMEM-resident:

- XLA pre-gathers each tile's candidate window into a dense
  ``(n_tiles, F, C)`` tensor (a bandwidth-cheap row gather of the bin-resident
  payload table, ~0.4 ms round trip at 1M) with fields on a minor-major axis
  so each 128-candidate chunk is one lane-aligned VMEM slice per field.
- One program per TILE GROUP: Mosaic auto-pipelines the (TG, F, C) input
  block and (TG, th, tw) output block DMAs across the 1D grid.
- Per tile, the kernel keeps a running elementwise ``prod(1 - g)`` over
  (th, tw, 128) chunk blocks and reduces over the candidate lanes ONCE at
  the end — a single HBM write per tile, zero materialized intermediates.

The jnp scan path in ops/render.py remains the golden model and the CPU /
particle-color fallback; unit tests diff the two in interpret mode.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["splat_tiles", "on_tpu"]

_CHUNK = 128      # candidates per eval block: the minor (lane) dim
_TILE_GROUP = int(os.environ.get("EGG_SPLAT_TILE_GROUP", "8"))
                  # tiles per program; amortizes per-program ramp + DMA issue;
                  # env override for hardware tuning sweeps

# payload field order — must match splat_population's ``pack`` columns
# (ops/render.py): x, y, cos, sin, extent_perp, extent_par, inv_sx, inv_sy, a
_N_F = 9

_GAUSS_COEFF = float(4.0 * 3.14159265358979323846 / 3.0)


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _make_kernel(tg: int, th: int, tw: int, n_chunks: int, ntx: int,
                 max_splat_px: int):
    gauss = _GAUSS_COEFF          # python floats: jnp scalars would be
    icap = 1.0 / float(max_splat_px)  # captured tracer constants

    def kernel(trips_ref, cand_ref, out_ref):
        i = pl.program_id(0)
        # pixel centers of tile t (global tile id = i*tg + t), in effective
        # canvas pixels; iota is 2D-safe on Mosaic via broadcasted_iota
        # Mosaic iota is integer-only
        py_g = jax.lax.broadcasted_iota(
            jnp.int32, (th, tw, 1), 0).astype(jnp.float32) + 0.5
        px_g = jax.lax.broadcasted_iota(
            jnp.int32, (th, tw, 1), 1).astype(jnp.float32) + 0.5

        for t in range(tg):
            tid = i * tg + t
            ty = tid // ntx
            tx = tid % ntx
            px = px_g + (tx * tw).astype(jnp.float32)        # (th, tw, 1)
            py = py_g + (ty * th).astype(jnp.float32)

            def chunk_body(c, acc):
                def f(j):                                     # (1, 1, CHUNK)
                    return cand_ref[t, c, j, :][None, None, :]

                pcx, pcy, ca, sa = f(0), f(1), f(2), f(3)
                isx, isy, ap = f(6), f(7), f(8)
                # fold the normalization into the rotation row-vectors —
                # (1, 1, C) ops are ~free next to the (th, tw, C) terms
                cax, sax = ca * isx, sa * isx
                cay, say = ca * isy, sa * isy
                dx = px - pcx                                 # (th, tw, C)
                dy = py - pcy
                # rotate into the velocity frame, pre-normalized by the quad
                # extents (instanced_draw.glsl:27-35): isx == 1/extent_par
                # exactly, so the quad test |d_par| <= extent becomes
                # |nx| <= 1 (empty/padded slots: extent 0 -> isx = 1/EPS ->
                # nx huge -> excluded)
                nx = dx * cax + dy * sax
                ny = dy * cay - dx * say
                r2 = nx * nx + ny * ny
                # quad extent + static splat cap (texture clampzero analog)
                # as ONE normalized box test
                m = jnp.maximum(
                    jnp.maximum(jnp.abs(nx), jnp.abs(ny)),
                    icap * jnp.maximum(jnp.abs(dx), jnp.abs(dy)))
                g = jnp.where(m <= 1.0, jnp.exp(-gauss * r2) * ap, 0.0)
                return acc * (1.0 - g)                        # screen blend

            # TRIP SKIP: candidates are slot-major (ops/render.py
            # _splat_alpha_kernel), so every chunk past the tile's trip
            # count holds only zero rows — the loop stops there instead of
            # paying the peak-sized static budget for every tile
            acc = jax.lax.fori_loop(
                0, trips_ref[tid], chunk_body,
                jnp.ones((th, tw, _CHUNK), jnp.float32))
            # one lane reduction per tile: product over the candidate axis
            # (pairwise halving — Mosaic has no reduce_prod primitive)
            w = _CHUNK
            while w > 1:
                w //= 2
                acc = acc[..., :w] * acc[..., w:2 * w]
            out_ref[t] = 1.0 - acc[..., 0]

    return kernel


def _make_kernel_v2(tg: int, th: int, tw: int, w_bins: int, kp: int,
                    n_f: int, ntx: int, max_splat_px: int, use_rgb: bool):
    """Bin-major candidate layout: cand block (tg, W, F, Kp).

    Chunks of 128 candidate lanes are assembled from the per-bin payload
    blocks — 2 bins when Kp == 64, 1 when Kp == 128, half a bin when
    Kp == 256 — so no XLA-side transpose or re-chunking exists at all.
    The caller count-sorts each tile's window bins DESCENDING by occupancy,
    which makes "all remaining bins empty" a prefix property: ``trips``
    bounds the chunk loop exactly like the slot-major layout did.
    """
    gauss = _GAUSS_COEFF
    icap = 1.0 / float(max_splat_px)
    assert kp in (8, 16, 32, 64, 128, 256)
    bins_per_chunk = _CHUNK // kp         # >= 2, 1, or 0 (-> half-bin chunks)

    def kernel(trips_ref, cand_ref, out_a_ref, *rest):
        if use_rgb:
            out_rgb_ref = rest[0]
        i = pl.program_id(0)
        py_g = jax.lax.broadcasted_iota(
            jnp.int32, (th, tw, 1), 0).astype(jnp.float32) + 0.5
        px_g = jax.lax.broadcasted_iota(
            jnp.int32, (th, tw, 1), 1).astype(jnp.float32) + 0.5

        for t in range(tg):
            tid = i * tg + t
            ty = tid // ntx
            tx = tid % ntx
            px = px_g + (tx * tw).astype(jnp.float32)
            py = py_g + (ty * th).astype(jnp.float32)

            def field(c, j):
                """(1, 1, 128) candidate lane vector of field j, chunk c."""
                if bins_per_chunk >= 2:       # kp < 128: concat whole bins
                    parts = [cand_ref[t, bins_per_chunk * c + u, j, :]
                             for u in range(bins_per_chunk)]
                    return jnp.concatenate(parts)[None, None, :]
                if kp == _CHUNK:              # one bin per chunk
                    return cand_ref[t, c, j, :][None, None, :]
                half = c % 2                  # kp == 256: half a bin
                # a traced-bound python slice fails tracing — use pl.ds with
                # a provable 128-alignment (half is 0 or 1)
                start = pl.multiple_of(half * _CHUNK, _CHUNK)
                return cand_ref[t, c // 2, j,
                                pl.ds(start, _CHUNK)][None, None, :]

            def chunk_body(c, carry):
                acc = carry[0]
                pcx, pcy, ca, sa = (field(c, 0), field(c, 1), field(c, 2),
                                    field(c, 3))
                isx, isy, ap = field(c, 6), field(c, 7), field(c, 8)
                cax, sax = ca * isx, sa * isx
                cay, say = ca * isy, sa * isy
                dx = px - pcx
                dy = py - pcy
                nx = dx * cax + dy * sax
                ny = dy * cay - dx * say
                r2 = nx * nx + ny * ny
                m = jnp.maximum(
                    jnp.maximum(jnp.abs(nx), jnp.abs(ny)),
                    icap * jnp.maximum(jnp.abs(dx), jnp.abs(dy)))
                g = jnp.where(m <= 1.0, jnp.exp(-gauss * r2) * ap, 0.0)
                acc = acc * (1.0 - g)
                if use_rgb:
                    # per-channel screen blend of g * rgb — the reference's
                    # experimental use_particle_color mode (test.lua:25-67)
                    return (acc,) + tuple(
                        carry[1 + ch] * (1.0 - g * field(c, 9 + ch))
                        for ch in range(3))
                return (acc,)

            n_acc = 4 if use_rgb else 1
            init = tuple(jnp.ones((th, tw, _CHUNK), jnp.float32)
                         for _ in range(n_acc))
            accs = jax.lax.fori_loop(0, trips_ref[tid], chunk_body, init)
            w = _CHUNK
            while w > 1:
                w //= 2
                accs = tuple(a[..., :w] * a[..., w:2 * w] for a in accs)
            out_a_ref[t] = 1.0 - accs[0][..., 0]
            if use_rgb:
                out_rgb_ref[t] = 1.0 - jnp.stack(
                    [accs[1 + ch][..., 0] for ch in range(3)], axis=-1)

    return kernel


@functools.partial(jax.jit, static_argnames=("th", "tw", "ntx",
                                             "max_splat_px", "use_rgb",
                                             "interpret"))
def splat_tiles_v2(cand: jnp.ndarray, trips: jnp.ndarray, th: int, tw: int,
                   ntx: int, max_splat_px: int, use_rgb: bool = False,
                   interpret: bool = False):
    """(n_tiles, th, tw) splat alpha from BIN-MAJOR candidate payload.

    ``cand``: (n_tiles, W, F, Kp) — per tile, its (count-sorted) window
    bins' payload blocks, fields pre-transposed so candidates are the minor
    axis; Kp in {64, 128, 256}. ``trips``: (n_tiles,) i32 chunk bound per
    tile (bins beyond it are empty — the caller's count sort guarantees the
    prefix property). With ``use_rgb`` a second (n_tiles, th, tw, 3) output
    carries the per-particle-color accumulation and F >= 12.
    """
    n_tiles, w_bins, n_f, kp = cand.shape
    assert (w_bins * kp) % _CHUNK == 0
    tg = _TILE_GROUP
    while n_tiles % tg:
        tg //= 2

    kernel = _make_kernel_v2(tg, th, tw, w_bins, kp, n_f, ntx,
                             max_splat_px, use_rgb)
    out_shape = [jax.ShapeDtypeStruct((n_tiles, th, tw), jnp.float32)]
    out_specs = [pl.BlockSpec((tg, th, tw), lambda i: (i, 0, 0))]
    if use_rgb:
        out_shape.append(
            jax.ShapeDtypeStruct((n_tiles, th, tw, 3), jnp.float32))
        out_specs.append(
            pl.BlockSpec((tg, th, tw, 3), lambda i: (i, 0, 0, 0)))
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles // tg,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((tg, w_bins, n_f, kp),
                               lambda i: (i, 0, 0, 0))],
        out_specs=out_specs if use_rgb else out_specs[0],
        out_shape=out_shape if use_rgb else out_shape[0],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(trips, cand)
    return out if use_rgb else (out, None)


def _make_kernel_rows(th: int, tw: int, s: int, nbx: int, wx: int, wy: int,
                      rpt: int, bw: int, ntx: int, kp: int, n_f: int,
                      max_splat_px: int, use_rgb: bool):
    """One program = one TILE ROW of the canvas (grid=(nty,)).

    The program DMAs its window's ``wy`` bin rows — one CONTIGUOUS slab of
    the row-major (nby*nbx, F, Kp) payload table, double-buffered across
    grid steps — and evaluates its ``ntx`` tiles from VMEM with static
    window-column offsets. This removes the (T, W, F, Kp) candidate window
    gather entirely (XLA materialized ~220 MB/frame through HBM at the 1M
    headline) AND writes output directly in canvas layout (no tile->canvas
    transpose epilogue). Each bin row is fetched by the ``wy`` programs
    whose windows cover it, so slab traffic is only wy/rpt x the table
    size (~75 MB/frame vs the gather's ~450 MB round trip)."""
    gauss = _GAUSS_COEFF
    icap = 1.0 / float(max_splat_px)
    assert kp in (8, 16, 32, 64, 128, 256)
    bpc = max(1, _CHUNK // kp)            # bins per 128-lane chunk
    n_rows = wy * nbx
    # chunk padding can address window positions past (wy, wx): those land
    # in zeroed TAIL rows of the slab (alpha 0 contributes nothing)
    w_pad_max = (-(-(wy * wx) // bpc)) * bpc - 1
    extra = max(0, (w_pad_max // wx) * nbx + nbx - n_rows)

    def kernel(trips_ref, payload_hbm, out_a_ref, *rest):
        if use_rgb:
            out_rgb_ref = rest[0]
            scratch, sem = rest[1], rest[2]
        else:
            scratch, sem = rest[0], rest[1]
        i = pl.program_id(0)
        nty = pl.num_programs(0)

        def slab_dma(slot, row):
            start = row * (rpt * nbx)
            return pltpu.make_async_copy(
                payload_hbm.at[pl.ds(start, n_rows)],
                scratch.at[slot, pl.ds(0, n_rows)], sem.at[slot])

        @pl.when(i == 0)
        def _warm():
            if extra:
                # DMAs never touch the tail rows; zero them once per call
                scratch[0, n_rows:] = jnp.zeros((extra, n_f, kp),
                                                jnp.float32)
                scratch[1, n_rows:] = jnp.zeros((extra, n_f, kp),
                                                jnp.float32)
            slab_dma(0, 0).start()

        @pl.when(i + 1 < nty)
        def _prefetch():
            slab_dma((i + 1) % 2, i + 1).start()

        slab_dma(i % 2, i).wait()
        slab = scratch.at[i % 2]          # (wy*nbx, F, Kp) ref view

        py_g = jax.lax.broadcasted_iota(
            jnp.int32, (th, tw, 1), 0).astype(jnp.float32) + 0.5
        px_g = jax.lax.broadcasted_iota(
            jnp.int32, (th, tw, 1), 1).astype(jnp.float32) + 0.5
        py = py_g + (i * th).astype(jnp.float32)

        tiles_a = []
        tiles_rgb = []
        for t in range(ntx):
            px = px_g + float(t * tw)
            bx0 = t * (tw // bw)

            def field(c, j, bx0=bx0):
                """(1, 1, 128) candidate lane vector of field j, chunk c."""
                if bpc >= 2:
                    parts = []
                    for u in range(bpc):
                        w = c * bpc + u
                        b = (w // wx) * nbx + bx0 + (w % wx)
                        parts.append(slab[b, j, :])
                    return jnp.concatenate(parts)[None, None, :]
                if kp == _CHUNK:
                    b = (c // wx) * nbx + bx0 + (c % wx)
                    return slab[b, j, :][None, None, :]
                w = c // 2                # kp == 256: half a bin per chunk
                half = c % 2
                b = (w // wx) * nbx + bx0 + (w % wx)
                start = pl.multiple_of(half * _CHUNK, _CHUNK)
                return slab[b, j, pl.ds(start, _CHUNK)][None, None, :]

            def chunk_body(c, carry, field=field, px=px):
                acc = carry[0]
                pcx, pcy, ca, sa = (field(c, 0), field(c, 1), field(c, 2),
                                    field(c, 3))
                isx, isy, ap = field(c, 6), field(c, 7), field(c, 8)
                cax, sax = ca * isx, sa * isx
                cay, say = ca * isy, sa * isy
                dx = px - pcx
                dy = py - pcy
                nx = dx * cax + dy * sax
                ny = dy * cay - dx * say
                r2 = nx * nx + ny * ny
                m = jnp.maximum(
                    jnp.maximum(jnp.abs(nx), jnp.abs(ny)),
                    icap * jnp.maximum(jnp.abs(dx), jnp.abs(dy)))
                g = jnp.where(m <= 1.0, jnp.exp(-gauss * r2) * ap, 0.0)
                acc = acc * (1.0 - g)
                if use_rgb:
                    return (acc,) + tuple(
                        carry[1 + ch] * (1.0 - g * field(c, 9 + ch))
                        for ch in range(3))
                return (acc,)

            n_acc = 4 if use_rgb else 1
            init = tuple(jnp.ones((th, tw, _CHUNK), jnp.float32)
                         for _ in range(n_acc))
            accs = jax.lax.fori_loop(0, trips_ref[i * ntx + t], chunk_body,
                                     init)
            w = _CHUNK
            while w > 1:
                w //= 2
                accs = tuple(a[..., :w] * a[..., w:2 * w] for a in accs)
            tiles_a.append(1.0 - accs[0][..., 0])
            if use_rgb:
                tiles_rgb.append(1.0 - jnp.stack(
                    [accs[1 + ch][..., 0] for ch in range(3)], axis=-1))

        out_a_ref[:] = jnp.concatenate(tiles_a, axis=1)
        if use_rgb:
            out_rgb_ref[:] = jnp.concatenate(tiles_rgb, axis=1)

    return kernel


def _rows_extra(wy: int, wx: int, nbx: int, kp: int) -> int:
    bpc = max(1, _CHUNK // kp)
    w_pad_max = (-(-(wy * wx) // bpc)) * bpc - 1
    return max(0, (w_pad_max // wx) * nbx + nbx - wy * nbx)


@functools.partial(jax.jit, static_argnames=(
    "th", "tw", "s", "nbx", "wx", "wy", "rpt", "bw", "max_splat_px",
    "use_rgb", "interpret"))
def splat_rows(payload_t: jnp.ndarray, trips: jnp.ndarray, th: int, tw: int,
               s: int, nbx: int, wx: int, wy: int, rpt: int, bw: int,
               max_splat_px: int, use_rgb: bool = False,
               interpret: bool = False):
    """(s, s) splat alpha straight from the row-major payload table.

    ``payload_t``: (nby*nbx, F, Kp) bin-resident payload WITHOUT the
    sentinel row (every window position of every tile is a real ring or
    interior bin). ``trips``: (n_tiles,) i32 chunk bound per tile — chunks
    enumerate the tile's (wy, wx) window bins in raster order, so the bound
    is the last nonempty chunk index + 1 (no count sort needed).
    """
    n_rows_total, n_f, kp = payload_t.shape
    assert s % th == 0 and s % tw == 0
    ntx = s // tw
    nty = s // th
    kernel = _make_kernel_rows(th, tw, s, nbx, wx, wy, rpt, bw, ntx, kp,
                               n_f, max_splat_px, use_rgb)
    out_shape = [jax.ShapeDtypeStruct((s, s), jnp.float32)]
    out_specs = [pl.BlockSpec((th, s), lambda i: (i, 0))]
    if use_rgb:
        out_shape.append(jax.ShapeDtypeStruct((s, s, 3), jnp.float32))
        out_specs.append(pl.BlockSpec((th, s, 3), lambda i: (i, 0, 0)))
    out = pl.pallas_call(
        kernel,
        grid=(nty,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs if use_rgb else out_specs[0],
        out_shape=out_shape if use_rgb else out_shape[0],
        scratch_shapes=[pltpu.VMEM((2, wy * nbx + _rows_extra(wy, wx, nbx,
                                                             kp),
                                    n_f, kp), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(trips, payload_t)
    return out if use_rgb else (out, None)


@functools.partial(jax.jit, static_argnames=("th", "tw", "ntx",
                                             "max_splat_px", "interpret"))
def splat_tiles(cand: jnp.ndarray, trips: jnp.ndarray, th: int, tw: int,
                ntx: int, max_splat_px: int,
                interpret: bool = False) -> jnp.ndarray:
    """(n_tiles, th, tw) accumulated splat alpha per evaluation tile.

    ``cand``: (n_tiles, n_chunks, F, 128) per-tile candidate payload in
    slot-major chunk layout, fields as in splat_population's pack (padded
    with zeros — zero alpha contributes nothing). ``trips``: (n_tiles,) i32
    chunks to actually evaluate per tile (the tail chunks are all-zero by
    the slot-major layout).
    """
    n_tiles, n_chunks, n_f, c_chunk = cand.shape
    assert n_f == _N_F, (n_f, _N_F)
    assert c_chunk == _CHUNK
    tg = _TILE_GROUP
    while n_tiles % tg:
        tg //= 2

    kernel = _make_kernel(tg, th, tw, n_chunks, ntx, max_splat_px)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles // tg,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((tg, n_chunks, n_f, _CHUNK),
                               lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((tg, th, tw), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles, th, tw), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(trips, cand)

"""Pallas TPU kernel for the dense-grid pair sweep.

One fused kernel per collision pass: each program DMAs a block of grid rows
(plus a one-row vertical halo) from HBM into VMEM, then evaluates every
(dy, lane-roll) pair term of the 3x3-cell XPBD projection entirely on-chip —
the dense-engine equivalent of the reference's ``_solve_collision``
(``/root/reference/simulation_handler.lua:1548-1666``) with
``_enforce_distance`` math (:1514-1545).

Why a kernel: XLA materializes each of the ~45 shifted pair terms to HBM
(~150 ms/sweep at 1M slots); fusing them in VMEM turns the sweep into one
read + one write of the plane tensor (~35 MB) plus pure VPU arithmetic.

The jnp implementations in ops/dense.py are the golden model; unit tests
diff the kernel (in interpret mode off-TPU) against them bit-for-bit.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.mathx import EPS
from .. import dense as D

__all__ = ["sweep_planes", "count_planes", "substep_pass"]

_BLOCK_ROWS = int(os.environ.get("EGG_SWEEP_BLOCK_ROWS", "32"))
                  # rows per program; larger blocks amortize the 2*ROW_PAD
                  # DMA halo (only +-1 row is read) and the per-program ramp;
                  # env override for hardware block-size sweeps


def _lane_mask_2d(rows: int, lanes: int, k: int, d: int, window: int = 1):
    """(1, lanes) bool — cells of pair (l, l-d) within +-window columns.

    Row-invariant; broadcasting the single row into the pair terms is free
    compared to materializing (rows, lanes) per d."""
    s = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1) % k
    cell_diff = -jnp.floor_divide(s - d, k)
    return jnp.abs(cell_diff) <= window


def _roll(x, d):
    """Lane roll matching jnp.roll(x, d, axis=-1): out[l] = x[l - d].

    Concat-of-slices on purpose: ``pltpu.roll`` (the native lane rotate) was
    measured marginally SLOWER here (4.6 vs 4.2 ms/sweep at 1M slots) and
    costs minutes of extra Mosaic compile time at 90 rolls per kernel.

    Layout experiments that did NOT pay (measured, 1M slots, G=768 K=4):
    a K-leading (K, rows, G) retile — partner slot rank becomes a static
    leading index, lane rolls drop 90 -> 18, masks vanish — ran 6.8 vs the
    shipped 6.06 ms/sweep: the XLA-side (F, R, G*K) <-> (F, K, R, G)
    transposes cost more than the rolls they remove, and Mosaic rejects
    doing the retile in-kernel (lane-dim reshape)."""
    if d == 0:
        return x
    lanes = x.shape[-1]
    d = d % lanes
    return jnp.concatenate([x[..., lanes - d:], x[..., :lanes - d]], axis=-1)


def _pair_terms(block, r0: int, rows: int, k: int, params,
                cohesion: bool, ordered_budget: bool, count_only: bool,
                window: int = 1, fresh_mask: bool = False,
                occ_is_boost: bool = False):
    """Shared sweep body over self rows [r0, r0+rows) of a (F, R, L) block.

    Returns (tx, ty) correction sums, or the examined-pair count when
    ``count_only`` — the same static loop structure as
    :func:`...ops.dense.sweep_planes_jnp` / ``count_planes_jnp``.
    ``window``/``fresh_mask`` implement the wide violent-phase sweep (see
    the jnp golden model's docstring).

    ``block`` is either a (F, R, L) array or a list indexed by the same
    D.FIELD_* constants — the fused substep kernels assemble their field
    windows individually and pass ``None`` for fields the configuration
    never reads (CUM/IDX outside the ordered budget).

    ``occ_is_boost``: FIELD_OCC already holds the PRECOMPUTED
    occupancy-pressure boost (``clip(count / k, 1, cap)``, 0 = empty) —
    the fused component path bakes it at bin time, saving the clip per
    pair term. The math is bit-identical either way.
    """
    lanes = block[D.FIELD_X].shape[-1]
    g = lanes // k

    def rowsl(f, dy):
        return block[f][r0 + dy:r0 + dy + rows]  # static slice (Mosaic-lowerable)

    sx, sy = rowsl(D.FIELD_X, 0), rowsl(D.FIELD_Y, 0)
    sw, sr = rowsl(D.FIELD_W, 0), rowsl(D.FIELD_R, 0)
    socc = rowsl(D.FIELD_OCC, 0)
    sb = rowsl(D.FIELD_BATCH, 0) if (cohesion and not count_only) else None
    scum = rowsl(D.FIELD_CUM, 0) if ordered_budget else None
    sidx = (rowsl(D.FIELD_IDX, 0)
            if (ordered_budget or count_only) else None)

    if count_only:
        acc = jnp.zeros_like(sx)
    else:
        tx = jnp.zeros_like(sx)
        ty = jnp.zeros_like(sy)
        (collision_c, cohesion_c, overlap_f, cohesion_f, max_pairs,
         cell_size, fresh_mod, occ_cap) = params
        boost_hi = jnp.maximum(occ_cap, 1.0)
        inv_k = 1.0 / k

    FX, FY = "FX", "FY"  # derived fresh-cell pseudo-fields
    if fresh_mask:
        # modulus: the GLOBAL torus (params.fresh_mod; 0 = this plane's own
        # g). On spatial local windows the global wrap is not a multiple of
        # the local width — a local modulus would reject wrap-adjacent pairs.
        fm = jnp.where(fresh_mod > 0, fresh_mod, jnp.float32(g))
        fresh = {FX: jnp.mod(jnp.floor(block[D.FIELD_X] / cell_size), fm),
                 FY: jnp.mod(jnp.floor(block[D.FIELD_Y] / cell_size), fm)}
        sfx = fresh[FX][r0:r0 + rows]
        sfy = fresh[FY][r0:r0 + rows]

        def torus_adj(a, b):
            dd = jnp.mod(a - b + 0.5 * fm, fm) - 0.5 * fm
            return jnp.abs(dd) <= 1.0

    # Only the fields this pass reads get rolled — lane shifts are pure VMEM
    # shuffle traffic, the kernel's second-largest cost after the pair math.
    # CUM/IDX ride only under the ordered budget; IDX also keys the count
    # pass; BATCH only matters when cohesion tests same-batch.
    need = [D.FIELD_X, D.FIELD_Y, D.FIELD_W, D.FIELD_R, D.FIELD_OCC]
    if count_only or ordered_budget:
        need.append(D.FIELD_IDX)
    if ordered_budget:
        need.append(D.FIELD_CUM)
    if cohesion and not count_only:
        need.append(D.FIELD_BATCH)

    def plane_of(f):
        return fresh[f] if f in (FX, FY) else block[f]

    if fresh_mask:
        need = need + [FX, FY]

    # roll once per lane offset d (dy-independent), slice rows per dy —
    # cuts roll op count 3x vs rolling inside the dy loop; only the
    # [r0-w, r0+rows+w) window the dy slices read gets rolled
    w = window
    for d in range(-((w + 1) * k - 1), (w + 1) * k):
        mask = _lane_mask_2d(rows, lanes, k, d, w)
        rolled = {f: _roll(plane_of(f)[r0 - w:r0 + rows + w], d)
                  for f in need}
        for dy in range(-w, w + 1):
            if dy == 0 and d == 0:
                continue
            o_block = {f: rolled[f][w + dy:w + dy + rows]
                       for f in need}
            oocc = o_block[D.FIELD_OCC]
            oidx = o_block.get(D.FIELD_IDX)
            valid = (socc > 0.0) & (oocc > 0.0) & mask
            if fresh_mask:
                valid = (valid & torus_adj(sfx, o_block[FX])
                         & torus_adj(sfy, o_block[FY]))

            if count_only:
                acc = acc + jnp.where(valid & (oidx > sidx), 1.0, 0.0)
                continue

            ox, oy = o_block[D.FIELD_X], o_block[D.FIELD_Y]
            ow, orr = o_block[D.FIELD_W], o_block[D.FIELD_R]

            if ordered_budget:
                ocum = o_block[D.FIELD_CUM]
                cum_min = jnp.where(oidx < sidx, ocum, scum)
                valid = valid & (cum_min < max_pairs)

            ddx = ox - sx
            ddy = oy - sy
            dist2 = ddx * ddx + ddy * ddy
            # Trimmed XPBD projection (one divide, no explicit dist): the
            # direction normalization inv_d folds INTO the violation factor
            #   f = -viol * inv_d = target_d * inv_d - 1
            # (using dist * inv_d == 1 up to rsqrt rounding), the raw ddx/y
            # serve as the direction, and the two constraint divides share
            # a common denominator: fc/Dc + fl/Dl = (fc*Dl + fl*Dc)/(Dc*Dl).
            # Coincident pairs (deg) substitute inv_d -> 1, "1" -> 0, so
            # the factor becomes target_d == |viol| exactly, pushed along
            # the fixed oblique tiebreak axis (dense.TIE_X docstring).
            # clip(-viol/D, ±|viol|) stays folded as D = max(..., 1).
            deg = dist2 <= EPS * EPS
            inv_d1 = jnp.where(deg, 1.0,
                               jax.lax.rsqrt(jnp.maximum(dist2, EPS * EPS)))
            nd = jnp.where(deg, 0.0, 1.0)

            w_sum = sw + ow
            ok = valid & (w_sum >= EPS)
            sum_r = sr + orr

            min_d = overlap_f * sum_r
            hit_l = ok & (dist2 <= min_d * min_d)
            fl = jnp.where(hit_l, min_d * inv_d1 - nd, 0.0)
            dl = jnp.maximum(w_sum + collision_c, 1.0)
            if cohesion:
                ob = o_block[D.FIELD_BATCH]
                coh_d = cohesion_f * sum_r
                hit_c = ok & (sb == ob) & (dist2 <= coh_d * coh_d)
                fc = jnp.where(hit_c, coh_d * inv_d1 - nd, 0.0)
                dc = jnp.maximum(w_sum + cohesion_c, 1.0)
                num = fc * dl + fl * dc
                den = dc * dl
            else:
                num = fl
                den = dl

            # occupancy-pressure boost (dense.SweepParams.occ_boost_cap)
            boost = oocc if occ_is_boost else jnp.clip(oocc * inv_k, 1.0,
                                                       boost_hi)
            s_eff = (num / den) * (sw * boost)
            # antisymmetric per-side sign of the coincident tiebreak; a
            # compile-time constant per (d, dy) term. The direction is the
            # RAW ddx/ddy — its 1/dist normalization lives in s_eff via f.
            sgn = 1.0 if (dy > 0 or (dy == 0 and d > 0)) else -1.0
            ux = jnp.where(deg, sgn * D.TIE_X, ddx)
            uy = jnp.where(deg, sgn * D.TIE_Y, ddy)
            tx = tx - ux * s_eff
            ty = ty - uy * s_eff

    return acc if count_only else (tx, ty)


OUT_PAD = 8  # spill rows appended to each SYMMETRIC output block (8-row
             # alignment for Mosaic; only the first `window` rows are used)


def _pair_terms_sym(block, r0: int, rows: int, k: int, params,
                    cohesion: bool, ordered_budget: bool,
                    window: int = 1, fresh_mask: bool = False):
    """Symmetric sweep body: every unordered pair evaluated ONCE.

    The asymmetric body (:func:`_pair_terms`) has each slot compute its own
    half of each pair's correction — every pair's distance/violation math
    runs twice. Here a half-space of offsets (dy > 0 all d; dy = 0 only
    d > 0) is evaluated and BOTH sides accumulated: the self side in place,
    the other side rolled back by (-d, -dy). Same math to float rounding
    (summation order differs), ~half the pair terms.

    Returns (2, rows + window, lanes): rows [0, rows) are the block's own
    correction sums, rows [rows, rows + window) spill DOWNWARD into the next
    block's first rows (dy >= 0 means contributions never flow up). The
    caller folds spills across blocks (torus-wrapped).
    """
    lanes = block.shape[-1]
    g = lanes // k

    def rowsl(f, dy):
        return block[f][r0 + dy:r0 + dy + rows]

    sx, sy = rowsl(D.FIELD_X, 0), rowsl(D.FIELD_Y, 0)
    sw, sr = rowsl(D.FIELD_W, 0), rowsl(D.FIELD_R, 0)
    sb, scum = rowsl(D.FIELD_BATCH, 0), rowsl(D.FIELD_CUM, 0)
    sidx, socc = rowsl(D.FIELD_IDX, 0), rowsl(D.FIELD_OCC, 0)

    tx = jnp.zeros_like(sx)
    ty = jnp.zeros_like(sy)
    (collision_c, cohesion_c, overlap_f, cohesion_f, max_pairs,
     cell_size, fresh_mod, occ_cap) = params
    boost_hi = jnp.maximum(occ_cap, 1.0)
    inv_k = 1.0 / k

    FX, FY = "FX", "FY"
    if fresh_mask:
        fm = jnp.where(fresh_mod > 0, fresh_mod, jnp.float32(g))
        fresh = {FX: jnp.mod(jnp.floor(block[D.FIELD_X] / cell_size), fm),
                 FY: jnp.mod(jnp.floor(block[D.FIELD_Y] / cell_size), fm)}
        sfx = fresh[FX][r0:r0 + rows]
        sfy = fresh[FY][r0:r0 + rows]

        def torus_adj(a, b):
            dd = jnp.mod(a - b + 0.5 * fm, fm) - 0.5 * fm
            return jnp.abs(dd) <= 1.0

    need = [D.FIELD_X, D.FIELD_Y, D.FIELD_W, D.FIELD_R, D.FIELD_OCC]
    if ordered_budget:
        need += [D.FIELD_IDX, D.FIELD_CUM]
    if cohesion:
        need.append(D.FIELD_BATCH)

    def plane_of(f):
        return fresh[f] if f in (FX, FY) else block[f]

    if fresh_mask:
        need = need + [FX, FY]

    w = window
    # other-side accumulators over block-local target rows [0, rows + w)
    oxa = jnp.zeros((rows + w, lanes), sx.dtype)
    oya = jnp.zeros((rows + w, lanes), sy.dtype)
    for d in range(-((w + 1) * k - 1), (w + 1) * k):
        mask = _lane_mask_2d(rows, lanes, k, d, w)
        # dy >= 0 only: rolled window needs rows [r0, r0 + rows + w)
        rolled = {f: _roll(plane_of(f)[r0:r0 + rows + w], d) for f in need}
        odx = jnp.zeros((rows + w, lanes), sx.dtype)
        ody = jnp.zeros((rows + w, lanes), sy.dtype)
        for dy in range(0, w + 1):
            if dy == 0 and d <= 0:
                continue  # dy=0 pairs taken once, from the d > 0 side
            o_block = {f: rolled[f][dy:dy + rows] for f in need}
            oocc = o_block[D.FIELD_OCC]
            valid = (socc > 0.0) & (oocc > 0.0) & mask
            if fresh_mask:
                valid = (valid & torus_adj(sfx, o_block[FX])
                         & torus_adj(sfy, o_block[FY]))

            ox, oy = o_block[D.FIELD_X], o_block[D.FIELD_Y]
            ow, orr = o_block[D.FIELD_W], o_block[D.FIELD_R]

            if ordered_budget:
                # cum of the LOWER-idx side — symmetric in the pair
                oidx = o_block[D.FIELD_IDX]
                ocum = o_block[D.FIELD_CUM]
                cum_min = jnp.where(oidx < sidx, ocum, scum)
                valid = valid & (cum_min < max_pairs)

            ddx = ox - sx
            ddy = oy - sy
            dist2 = ddx * ddx + ddy * ddy

            w_sum = sw + ow
            ok = valid & (w_sum >= EPS)

            # trimmed projection in LOCKSTEP with the one-sided body (see
            # _pair_terms): inv_d folded into the violation factors, one
            # shared divide serving BOTH sides' corrections
            deg = dist2 <= EPS * EPS
            inv_d1 = jnp.where(deg, 1.0,
                               jax.lax.rsqrt(jnp.maximum(dist2, EPS * EPS)))
            nd = jnp.where(deg, 0.0, 1.0)
            sum_r = sr + orr

            min_d = overlap_f * sum_r
            hit_l = ok & (dist2 <= min_d * min_d)
            fl = jnp.where(hit_l, min_d * inv_d1 - nd, 0.0)
            dl = jnp.maximum(w_sum + collision_c, 1.0)
            if cohesion:
                ob = o_block[D.FIELD_BATCH]
                coh_d = cohesion_f * sum_r
                hit_c = ok & (sb == ob) & (dist2 <= coh_d * coh_d)
                fc = jnp.where(hit_c, coh_d * inv_d1 - nd, 0.0)
                dc = jnp.maximum(w_sum + cohesion_c, 1.0)
                num = fc * dl + fl * dc
                den = dc * dl
            else:
                num = fl
                den = dl
            r = num / den

            # occupancy-pressure boost, per side: each side's correction
            # stands in for ITS missing partners in the OTHER's cell
            boost_s = jnp.clip(oocc * inv_k, 1.0, boost_hi)
            boost_o = jnp.clip(socc * inv_k, 1.0, boost_hi)
            # half-space terms (dy > 0, or dy = 0 & d > 0) carry sgn = +1;
            # the other side gets the opposite push via +ux below — the
            # same antisymmetric coincident tiebreak as the one-sided body
            ux = jnp.where(deg, D.TIE_X, ddx)
            uy = jnp.where(deg, D.TIE_Y, ddy)
            tx = tx - ux * (r * (sw * boost_s))
            ty = ty - uy * (r * (sw * boost_s))
            # other side: opposite direction, own inverse-mass share; lands
            # at (row + dy, lane - d) — row shift now, lane roll once per d.
            # Zero-padded concat instead of .at[dy:dy+rows].add: Mosaic has
            # no scatter-add lowering, and the static row shift is just an
            # aligned add.
            vx = ux * (r * (ow * boost_o))
            vy = uy * (r * (ow * boost_o))
            if dy or w - dy:
                # Mosaic rejects 0-sized vector operands: only concatenate
                # the non-empty pads (dy=0 or dy=w legs of window>1 sweeps)
                parts = []
                if dy:
                    parts.append(jnp.zeros((dy, lanes), vx.dtype))
                vparts_x = parts + [vx]
                vparts_y = parts + [vy]
                if w - dy:
                    zbot = jnp.zeros((w - dy, lanes), vx.dtype)
                    vparts_x.append(zbot)
                    vparts_y.append(zbot)
                vx = jnp.concatenate(vparts_x, axis=0)
                vy = jnp.concatenate(vparts_y, axis=0)
            odx = odx + vx
            ody = ody + vy
        oxa = oxa + _roll(odx, -d)
        oya = oya + _roll(ody, -d)

    out_x = jnp.concatenate([tx + oxa[:rows], oxa[rows:]], axis=0)
    out_y = jnp.concatenate([ty + oya[:rows], oya[rows:]], axis=0)
    return out_x, out_y


def _make_kernel(k: int, cohesion: bool, ordered_budget: bool, count_only: bool,
                 block_rows: int, window: int = 1, fresh_mask: bool = False):
    def kernel(flags_ref, params_ref, planes_hbm, out_ref, scratch, sem):
        i = pl.program_id(0)

        # OCCUPANCY SKIP: a block whose self rows hold no occupied slot
        # produces identically-zero corrections (pairs need both sides
        # occupied; corrections land on occupied self slots only) — settle
        # scenes fill a band of the torus, so empty blocks skip the whole
        # planes DMA + pair math and pay one VMEM zero + writeback.
        @pl.when(flags_ref[i] == 0)
        def _skip():
            if count_only:
                out_ref[:] = jnp.zeros_like(out_ref)
            else:
                out_ref[0] = jnp.zeros_like(out_ref[0])
                out_ref[1] = jnp.zeros_like(out_ref[1])

        @pl.when(flags_ref[i] != 0)
        def _run():
            # rows [i*B, i*B + B + 2*ROW_PAD): 8-row aligned (Mosaic DMA
            # tiling); self rows sit at scratch offset ROW_PAD
            dma = pltpu.make_async_copy(
                planes_hbm.at[:, pl.ds(i * block_rows,
                                       block_rows + 2 * D.ROW_PAD), :],
                scratch, sem)
            dma.start()
            dma.wait()
            block = scratch[:]
            params = tuple(params_ref[j] for j in range(8))
            out = _pair_terms(block, D.ROW_PAD, block_rows, k, params,
                              cohesion, ordered_budget, count_only,
                              window=window, fresh_mask=fresh_mask)
            if count_only:
                out_ref[:] = out
            else:
                out_ref[0] = out[0]
                out_ref[1] = out[1]

    return kernel


def _block_flags(planes, g: int, b: int) -> jnp.ndarray:
    """(g // b,) i32 — 1 where the block's self rows hold any occupied slot."""
    occ = planes[D.FIELD_OCC, D.ROW_PAD:D.ROW_PAD + g]
    any_occ = jnp.max(occ.reshape(g // b, -1), axis=1)
    return (any_occ > 0.0).astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("k", "cohesion", "ordered_budget",
                                    "window", "fresh_mask", "interpret"))
def _sweep_pallas(planes, params_packed, k: int, cohesion: bool,
                  ordered_budget: bool, window: int = 1,
                  fresh_mask: bool = False, interpret: bool = False):
    f, g2, lanes = planes.shape
    g = g2 - 2 * D.ROW_PAD
    b = min(_BLOCK_ROWS, g)
    assert g % b == 0, "dense_grid_dim must be a multiple of the sweep block"

    kernel = _make_kernel(k, cohesion, ordered_budget, False, b,
                          window=window, fresh_mask=fresh_mask)
    return pl.pallas_call(
        kernel,
        grid=(g // b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((2, b, lanes), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, g, lanes), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((f, b + 2 * D.ROW_PAD, lanes), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(_block_flags(planes, g, b), params_packed, planes)


def _make_kernel_sym(k: int, cohesion: bool, ordered_budget: bool,
                     block_rows: int, window: int = 1,
                     fresh_mask: bool = False):
    def kernel(flags_ref, params_ref, planes_hbm, out_ref, scratch, sem):
        i = pl.program_id(0)

        # occupancy skip (see _make_kernel): empty self rows admit no pairs,
        # so the block's core AND its downward spill are identically zero
        @pl.when(flags_ref[i] == 0)
        def _skip():
            out_ref[0] = jnp.zeros_like(out_ref[0])
            out_ref[1] = jnp.zeros_like(out_ref[1])

        @pl.when(flags_ref[i] != 0)
        def _run():
            dma = pltpu.make_async_copy(
                planes_hbm.at[:, pl.ds(i * block_rows,
                                       block_rows + 2 * D.ROW_PAD), :],
                scratch, sem)
            dma.start()
            dma.wait()
            block = scratch[:]
            params = tuple(params_ref[j] for j in range(8))
            out_x, out_y = _pair_terms_sym(block, D.ROW_PAD, block_rows, k,
                                           params, cohesion, ordered_budget,
                                           window=window, fresh_mask=fresh_mask)
            pad = OUT_PAD - window
            if pad:
                z = jnp.zeros((pad, out_x.shape[-1]), out_x.dtype)
                out_x = jnp.concatenate([out_x, z], axis=0)
                out_y = jnp.concatenate([out_y, z], axis=0)
            out_ref[0] = out_x
            out_ref[1] = out_y

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("k", "cohesion", "ordered_budget",
                                    "window", "fresh_mask", "interpret"))
def _sweep_pallas_sym(planes, params_packed, k: int, cohesion: bool,
                      ordered_budget: bool, window: int = 1,
                      fresh_mask: bool = False, interpret: bool = False):
    """Symmetric sweep: blocks emit (b + OUT_PAD)-row tiles whose tail rows
    spill into the NEXT block's head; the fold below adds them back
    (torus-wrapped across the grid edge)."""
    f, g2, lanes = planes.shape
    g = g2 - 2 * D.ROW_PAD
    b = min(_BLOCK_ROWS, g)
    assert g % b == 0, "dense_grid_dim must be a multiple of the sweep block"
    assert b >= OUT_PAD >= window

    kernel = _make_kernel_sym(k, cohesion, ordered_budget, b,
                              window=window, fresh_mask=fresh_mask)
    nb = g // b
    raw = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((2, b + OUT_PAD, lanes), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, nb * (b + OUT_PAD), lanes),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((f, b + 2 * D.ROW_PAD, lanes), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(_block_flags(planes, g, b), params_packed, planes)

    blocks = raw.reshape(2, nb, b + OUT_PAD, lanes)
    core = blocks[:, :, :b]
    # block i's spill rows are real rows [i*b + b, i*b + b + window) — the
    # head of block i+1 (block nb-1 wraps to block 0: torus in y)
    spill = jnp.roll(blocks[:, :, b:], 1, axis=1)
    core = core.at[:, :, :OUT_PAD].add(spill)
    return core.reshape(2, g, lanes)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _count_pallas(planes, k: int, interpret: bool = False):
    f, g2, lanes = planes.shape
    g = g2 - 2 * D.ROW_PAD
    b = min(_BLOCK_ROWS, g)
    assert g % b == 0

    kernel = _make_kernel(k, False, False, True, b)
    dummy = jnp.zeros((8,), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(g // b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((b, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, lanes), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((f, b + 2 * D.ROW_PAD, lanes), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(_block_flags(planes, g, b), dummy, planes)


# ------------------------------------------------- fused substep kernels --
#
# The component-layout fast path (solver._population_*_fused): positions ride
# in an UNPADDED (2, G, L) tensor, step-static pair fields (W, R, BATCH, OCC)
# in a (4, G, L) tensor, and a whole collision pass is ONE kernel producing
# updated positions directly — no correction tensor, no XLA ``.at[].add``,
# no halo refresh (the torus wrap is three wrapped-index input refs). The
# first pass of each substep additionally runs the substep prologue
# (damped integration + follow constraint) in its own prologue: integration
# is elementwise, so each block recomputes its +-window neighbor rows'
# integrated positions redundantly instead of waiting on a separate
# full-tensor XLA pass. Velocity is not stored at all — the previous-position
# planes encode it exactly (``v = (x - prev) / dt``), and damped integration
# is the recurrence ``x += damp * (x - prev)`` (bit-identical to the
# reference's explicit velocity update, simulation_handler.lua:1393-1432 and
# :1690-1693, composed).

def _follow_prologue(xi, yi, W, OC, TX, TY, TD, follow_c):
    """XPBD follow correction, identical math to solver._follow_delta
    (reference :1435-1471)."""
    dx = TX - xi
    dy = TY - yi
    dist = jnp.sqrt(dx * dx + dy * dy)
    inv_dist = jnp.where(dist > EPS, 1.0 / jnp.maximum(dist, EPS), 0.0)
    violation = dist - TD
    delta_lambda = violation / (W + follow_c)
    apply = (OC > 0.0) & (W > EPS) & (dist > TD)
    scale = jnp.where(apply, delta_lambda * W * inv_dist, 0.0)
    return xi + dx * scale, yi + dy * scale


_CPAD = 8  # window halo rows above/below each block in the scratch windows:
           # 8-row alignment keeps every DMA start on the (8, 128) f32 tile
           # grid (G is always a multiple of 8), and bounds window <= 8


def _start_window(hbm, scratch, sem, i, b: int, g: int):
    """Issue (without waiting) the DMAs for rows [i*b - 8, i*b + b + 8)
    mod G of ``hbm`` into ``scratch``; returns the started copy handles.

    The torus wrap lives HERE — the component tensors carry no halo rows.
    The window is always THREE branchless contiguous segments (top halo,
    body, bottom halo): the body never wraps, and each halo wraps only as a
    whole (i==0 / i==nb-1), so a scalar select picks its source row.
    Starts are multiples of 8 (b, p and G are — asserted for Mosaic with
    pl.multiple_of, which cannot prove it through the subtraction/select),
    so every copy is tile-aligned.

    Issuing all segments — and all windows of a block — before ANY wait is
    load-bearing: the serialized start-wait-start-wait form left every DMA's
    issue latency exposed, a measured ~3.5 ms/pass floor at the 1M headline
    (vs ~0.1 ms of actual HBM traffic)."""
    nb = g // b
    p = _CPAD
    top = pl.multiple_of(jnp.where(i == 0, g - p, i * b - p), 8)
    bot = pl.multiple_of(jnp.where(i == nb - 1, 0, i * b + b), 8)
    body = pl.multiple_of(i * b, 8)
    copies = [
        pltpu.make_async_copy(hbm.at[:, pl.ds(top, p)],
                              scratch.at[:, pl.ds(0, p)], sem),
        pltpu.make_async_copy(hbm.at[:, pl.ds(body, b)],
                              scratch.at[:, pl.ds(p, b)], sem),
        pltpu.make_async_copy(hbm.at[:, pl.ds(bot, p)],
                              scratch.at[:, pl.ds(b + p, p)], sem),
    ]
    for c in copies:
        c.start()
    return copies


def _load_window(hbm, scratch, sem, i, b: int, g: int):
    """Start + wait one window (all three segments in flight together)."""
    for c in _start_window(hbm, scratch, sem, i, b, g):
        c.wait()


def _make_pass_kernel(k: int, cohesion: bool, b: int, g: int, window: int,
                      fresh_mask: bool, integrate: bool):
    """One collision pass over row blocks; ``integrate`` fuses the substep
    prologue (damped integration + follow) ahead of the pair sweep."""
    r0 = _CPAD

    def compute(params_ref, aux_ref, sxy, sst, sprev, sfol, out_xy, out_prev):
        X, Y = sxy[0], sxy[1]                                # (b + 16, L)
        W, R = sst[0], sst[1]
        BA = sst[2] if cohesion else None
        OC = sst[3]
        params = tuple(params_ref[j] for j in range(8))
        relax = aux_ref[2]
        if integrate:
            damp = aux_ref[0]
            follow_c = aux_ref[1]
            PX, PY = sprev[0], sprev[1]
            xi = X + damp * (X - PX)
            yi = Y + damp * (Y - PY)
            xf, yf = _follow_prologue(xi, yi, W, OC, sfol[0], sfol[1],
                                      sfol[2], follow_c)
        else:
            xf, yf = X, Y
        block = [xf, yf, W, R, BA, None, None, OC]
        tx, ty = _pair_terms(block, r0, b, k, params, cohesion, False, False,
                             window=window, fresh_mask=fresh_mask,
                             occ_is_boost=True)
        out_xy[0] = xf[r0:r0 + b] + relax * tx
        out_xy[1] = yf[r0:r0 + b] + relax * ty
        if integrate:
            out_prev[0] = X[r0:r0 + b]                       # pre-integration
            out_prev[1] = Y[r0:r0 + b]

    # The window of each tensor arrives as THREE blocked refs (top halo,
    # body, bottom halo) whose index maps wrap at the torus edge — Pallas's
    # automatic pipelining then double-buffers every fetch across grid
    # steps, overlapping the DMAs with the previous block's pair math. The
    # earlier manual start/wait DMAs serialized issue latency against
    # compute: a measured ~3.5 ms/pass floor at the 1M headline against
    # ~0.1 ms of actual HBM traffic.
    def win(t_ref, b_ref, d_ref):
        return jnp.concatenate([t_ref[:], b_ref[:], d_ref[:]], axis=1)

    if integrate:
        def kernel(flags_ref, params_ref, aux_ref, xyT, xyB, xyD,
                   stT, stB, stD, prT, prB, prD, foT, foB, foD,
                   out_xy, out_prev):
            i = pl.program_id(0)

            # occupancy skip: empty self rows hold all-zero fields, on which
            # the whole pipeline is the identity (integration of zeros,
            # masked follow, no valid pairs) — zero output == identity
            @pl.when(flags_ref[i] == 0)
            def _skip():
                out_xy[:] = jnp.zeros_like(out_xy)
                out_prev[:] = jnp.zeros_like(out_prev)

            @pl.when(flags_ref[i] != 0)
            def _run():
                compute(params_ref, aux_ref, win(xyT, xyB, xyD),
                        win(stT, stB, stD), win(prT, prB, prD),
                        win(foT, foB, foD), out_xy, out_prev)
    else:
        def kernel(flags_ref, params_ref, aux_ref, xyT, xyB, xyD,
                   stT, stB, stD, out_xy):
            i = pl.program_id(0)

            @pl.when(flags_ref[i] == 0)
            def _skip():
                out_xy[:] = jnp.zeros_like(out_xy)

            @pl.when(flags_ref[i] != 0)
            def _run():
                compute(params_ref, aux_ref, win(xyT, xyB, xyD),
                        win(stT, stB, stD), None, None, out_xy, None)

    return kernel


def _comp_block_flags(stat, b: int) -> jnp.ndarray:
    """(nb,) i32 — 1 where a row block's self rows hold any occupied slot.

    Wrapped-window reads make a block's PAIR CANDIDATES extend +-window rows
    beyond it, but corrections only land on occupied SELF slots and every
    field of an empty slot is zero, so empty self rows produce zero output
    (== their identity)."""
    g = stat.shape[1]
    any_occ = jnp.max(stat[3].reshape(g // b, -1), axis=1)
    return (any_occ > 0.0).astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("k", "cohesion", "window", "fresh_mask",
                                    "integrate", "interpret"))
def _substep_pass_pallas(xy, stat, prev, follow, params_packed, aux_packed,
                         k: int, cohesion: bool, window: int = 1,
                         fresh_mask: bool = False, integrate: bool = False,
                         interpret: bool = False):
    _, g, lanes = xy.shape
    b = min(_BLOCK_ROWS, g)
    assert g % b == 0, "dense_grid_dim must be a multiple of the sweep block"
    assert g % 8 == 0 and b % 8 == 0
    assert window <= _CPAD
    nb = g // b
    kernel = _make_pass_kernel(k, cohesion, b, g, window, fresh_mask,
                               integrate)

    out_xy = jax.ShapeDtypeStruct((2, g, lanes), jnp.float32)
    out_block = pl.BlockSpec((2, b, lanes), lambda i: (0, i, 0))

    # Each tensor's wrapped window = three blocked refs (top halo, body,
    # bottom halo) in _CPAD-row block units, auto-pipelined by Pallas.
    p = _CPAD
    rb = b // p
    nph = g // p

    def trio(c):
        return [pl.BlockSpec((c, p, lanes),
                             lambda i: (0, (i * rb - 1) % nph, 0)),
                pl.BlockSpec((c, b, lanes), lambda i: (0, i, 0)),
                pl.BlockSpec((c, p, lanes),
                             lambda i: (0, (i * rb + rb) % nph, 0))]

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM)]
    in_specs += trio(2) + trio(4)
    operands = [_comp_block_flags(stat, b), params_packed, aux_packed,
                xy, xy, xy, stat, stat, stat]
    if integrate:
        in_specs += trio(2) + trio(3)
        operands += [prev, prev, prev, follow, follow, follow]
        out_specs = [out_block, out_block]
        out_shape = [out_xy, out_xy]
    else:
        out_specs = out_block
        out_shape = out_xy

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)


def substep_pass(xy, stat, params: "D.SweepParams", aux_scalars, k: int, *,
                 cohesion: bool, window: int = 1, fresh_mask: bool = False,
                 prev=None, follow=None, integrate: bool = False,
                 interpret: bool = False):
    """One fused collision pass in component layout -> updated ``xy``
    (and, with ``integrate``, the new previous-position tensor).

    ``aux_scalars``: (damp, follow_compliance, relaxation) traced scalars.
    ``stat`` rows: W, R, BATCH, OCC (step-static). Wrap-around neighbor rows
    are read via wrapped-index block refs, so no halo rows exist anywhere.
    """
    aux_packed = jnp.stack([jnp.asarray(v, jnp.float32)
                            for v in aux_scalars] + [jnp.float32(0.0)])
    if integrate:
        return _substep_pass_pallas(xy, stat, prev, follow, params.pack(),
                                    aux_packed, k, cohesion, window,
                                    fresh_mask, True, interpret)
    return _substep_pass_pallas(xy, stat, xy, xy, params.pack(), aux_packed,
                                k, cohesion, window, fresh_mask, False,
                                interpret)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# Test hook: force the Pallas kernels in INTERPRET mode off-TPU, so the
# CPU-mesh spatial equivalence tests drive the exact production kernel path
# (shard_map -> _sweep_local -> pallas_call) instead of the jnp fallback.
FORCE_INTERPRET = os.environ.get("EGG_SWEEP_INTERPRET", "0") == "1"


def sweep_planes(planes, params: "D.SweepParams", k: int, *, cohesion: bool,
                 ordered_budget: bool, use_pallas: bool = True,
                 window: int = 1, fresh_mask: bool = False,
                 symmetric: bool = False):
    """(2, G, L) pair-correction sums; Pallas on TPU, jnp elsewhere.

    ``window=3, fresh_mask=True`` selects the violent-phase wide sweep (the
    per-pass-rebuild-equivalent pair set; see dense.sweep_planes_jnp).
    ``symmetric=True`` evaluates each unordered pair once and scatters both
    sides (same math to float rounding, ~half the pair terms; Pallas path
    only — the jnp fallback keeps the simple one-sided golden form)."""
    if use_pallas and (_on_tpu() or FORCE_INTERPRET):
        interp = not _on_tpu()
        if symmetric:
            return _sweep_pallas_sym(planes, params.pack(), k, cohesion,
                                     ordered_budget, window=window,
                                     fresh_mask=fresh_mask, interpret=interp)
        return _sweep_pallas(planes, params.pack(), k, cohesion,
                             ordered_budget, window=window,
                             fresh_mask=fresh_mask, interpret=interp)
    return D.sweep_planes_jnp(planes, params, k, cohesion, ordered_budget,
                              window=window, fresh_mask=fresh_mask)


def count_planes(planes, k: int, *, use_pallas: bool = True):
    """(G, L) examined-pair counts for the ordered budget."""
    if use_pallas and _on_tpu():
        return _count_pallas(planes, k)
    return D.count_planes_jnp(planes, k)

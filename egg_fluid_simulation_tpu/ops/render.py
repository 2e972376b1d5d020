"""Render pipeline: the reference's 4 GLSL passes as TPU-native array ops.

Reference pipeline (``/root/reference/simulation_handler.lua:1992-2175`` plus
the four shaders):

1. **Splat accumulation** — every particle drawn as a gaussian-alpha textured
   quad into an offscreen canvas with blend ``("screen", "premultiplied")``
   (:2071), instanced (simulation_handler_instanced_draw.glsl): quad scaled by
   ``radius * texture_scale``, stretched along velocity by
   ``1 + |v| * motion_blur``, rotated to the velocity angle, positioned at
   ``mix(last_pos, pos, interpolation_alpha)``. The particle texture is the
   gaussian ``exp(-(4pi/3) x^2)`` of normalized center distance
   (simulation_handler_particle_texture.glsl:6-17).
2. **Outline** — 8-direction dilation of the accumulated alpha then
   ``smoothstep(0.5*threshold, +0.035)`` (simulation_handler_outline.glsl).
3. **Lighting** — alpha thresholded with ``smoothstep(threshold±smoothness)``,
   Sobel gradient -> surface normal, Blinn-Phong specular (focus 48, light
   (1,-1,1)) and smoothstepped lambert shadow (light (-.5,.75,0)); output
   ``rgb - shadow + specular`` (simulation_handler_lighting.glsl).
4. **Composite** — per population: outline then lighting, canvas placed at
   ``centroid - canvas/2``, white before yolk, alpha blending (:2117-2175).

TPU-native design decisions (not a port):

- The splat is evaluated **analytically** per pixel — no texture sampling.
  Screen-blend accumulation ``1 - prod(1 - a_i)`` is order-independent, so the
  scatter-style rasterization inverts into a per-tile **gather**: particles are
  binned into canvas bins (same sort-and-rank machinery as the solver grid)
  and each evaluation tile multiplies in its candidates' gaussian
  contributions. Bin granularity is decoupled from the evaluation tile and
  auto-sized to the splat footprint, so small splats don't drag in far-away
  candidates. A static per-bin candidate cap is the render-budget analog of
  the reference's collision budget; overflow is counted and reported (the
  reference drops nothing but clamps its canvas instead, :1953-1954).
- Canvases are sized per population to the particle AABB plus the reference's
  velocity-scaled padding (:1944-1950), snapped to a static bucket
  (256/512/1024/2048) and clamped at 2560 exactly like the reference
  (:1953-1954). Static buckets keep XLA shapes stable: crossing a bucket
  recompiles once, staying inside never does.
- Fractional-pixel canvas placement resolves the sub-pixel part with a
  4-tap bilinear shift before compositing, matching the reference's linear
  canvas resample (:2132-2133).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.mathx import EPS

__all__ = ["RenderOptions", "CANVAS_BUCKETS", "splat_population",
           "outline_pass", "lighting_pass", "render_population", "draw",
           "frame_options"]

_GAUSS_COEFF = 4.0 * np.pi / 3.0  # particle_texture.glsl:8
_SPLAT_CHUNK = 128                # candidates per serial eval step; the chunk
                                  # is the minor (lane) dim of the eval block,
                                  # so 128 fills the VPU exactly

# static canvas sizes; last entry is the reference's hard clamp (:1953-1954)
CANVAS_BUCKETS = (256, 512, 1024, 2048, 2560)


@dataclass(frozen=True)
class RenderOptions:
    """Static render configuration (one per population per draw).

    ``downsample`` evaluates the gaussian splat accumulation at
    ``canvas_size / downsample`` resolution and bilinearly upsamples the
    accumulated alpha — the analog of the reference sampling its
    limited-resolution pre-rendered gaussian texture with linear filtering
    (``texture_resolution_factor``, simulation_handler.lua:455, :644-645).
    Tile/bin dims and ``max_splat_px`` are in EFFECTIVE (downsampled) pixels.
    """
    canvas_size: int = 512        # px, square canvas (full resolution)
    tile_h: int = 32              # evaluation tile height (sublane-friendly)
    tile_w: int = 128             # evaluation tile width (lane-aligned)
    bin_h: int = 32               # candidate bin height (<= tile_h)
    bin_w: int = 128              # candidate bin width (<= tile_w)
    max_splat_px: int = 64        # static half-extent cap of one splat quad
    tile_capacity: int = 64       # max particles per candidate bin (budget)
    max_outline_steps: int = 8    # outline dilation samples: ceil(thick)+1
    shift_pad: int = 16           # outline sampling reach bound (px)
    downsample: int = 1           # splat evaluation resolution divisor
    use_particle_color: bool = False
    post_mode: str = "coarse"     # outline/lighting resolution:
                                  # "coarse" — at the splat's effective
                                  #   (downsampled) resolution, upsample the
                                  #   finished RGBA once (fastest; round-2
                                  #   default),
                                  # "full"   — at canvas resolution,
                                  # "super"  — at 2x canvas resolution with a
                                  #   2x2 box filter down: the analog of the
                                  #   reference's MSAA-4 canvases
                                  #   (simulation_handler.lua:453, :1962)

    @property
    def eff_size(self) -> int:
        return self.canvas_size // self.downsample

    def __post_init__(self):
        assert self.canvas_size % self.downsample == 0
        eff = self.canvas_size // self.downsample
        assert eff % self.tile_h == 0
        assert eff % self.tile_w == 0
        assert self.tile_h % self.bin_h == 0
        assert self.tile_w % self.bin_w == 0
        assert self.post_mode in ("coarse", "full", "super")


def auto_render_options(config: dict, canvas_size: int,
                        use_particle_color: bool = False,
                        density: Optional[float] = None,
                        k_boost: float = 1.0,
                        post_mode: str = "coarse",
                        peak_density: Optional[float] = None) -> RenderOptions:
    """Derive static render parameters from a (host) population config.

    - splat reach: ``max_radius * texture_scale`` quad half-extent, capped at
      64 px (the smear axis can exceed this at extreme velocity; the cap is
      the static-shape analog of the reference's texture clamp, :644-645),
    - bin granularity ~ splat footprint (small splats shouldn't pay for
      128px-wide candidate sharing),
    - per-bin capacity from the densest packing the collision constraint
      allows (spacing ``2 * collision_overlap_factor * min_radius``), with
      3x slack for transient compression,
    - outline sampling: ``ceil(thickness) + 1`` steps exactly like the GLSL
      (simulation_handler_outline.glsl:14-15), reach-bounded pad.
    """
    splat_full = max(4, min(64, int(math.ceil(config["max_radius"]
                                              * config["texture_scale"]))))

    # splat evaluation resolution: large soft gaussians carry no detail below
    # ~1/12 of their reach, so evaluate them coarse and upsample (the
    # reference's own texture has finite resolution, :455, :626-635)
    ds = 1
    while ds < 4 and splat_full // (2 * ds) >= 12 and canvas_size % (2 * ds) == 0:
        ds *= 2
    splat = max(4, -(-splat_full // ds))                 # effective px
    eff = canvas_size // ds

    def pow2_clamp(v, lo, hi):
        p = lo
        while p * 2 <= min(v, hi):
            p *= 2
        return p

    # Geometry: the eval cost per pixel is w_bins * k ~ density * slack *
    # (tile + 2*ceil(splat/bin)*bin)^2 — dominated by the window DILATION, so
    # both bins and tiles want to be small relative to the splat reach.
    # (Round-2 used 128-wide bins/tiles "for lane alignment", which put 50
    # window bins behind every tile at 1M — 4000 candidates/px vs a true
    # coverage of ~115. Candidates live in the minor/lane dim of the eval
    # block, so PIXEL granularity needs no 128 alignment at all.)
    bin_h = pow2_clamp(max(splat // 2, 8), 8, min(32, eff))
    bin_w = pow2_clamp(max(splat // 2, 8), 8, min(32, eff))
    tile_h = min(max(bin_h, 8), eff)
    tile_w = min(2 * bin_w, eff)

    # per-bin candidate budget from particle density. The collision-spacing
    # formula is the static fallback; the MEASURED density (particles per
    # full-res px^2 of the live AABB, passed by frame_options) both catches
    # over-packed scenes the formula underestimates (silent overflow) and
    # shrinks the budget for sparse populations (the eval cost per canvas is
    # proportional to k, irrespective of how many particles exist).
    spacing = 2.0 * config["collision_overlap_factor"] * config["min_radius"] / ds
    d_eff = 1.0 / max(spacing * spacing * 0.72, 1.0)     # hex-ish packing
    slack = 3.0
    if density is not None and density > 0.0:
        d_eff = density * ds * ds
        # measured density needs less headroom than the packing formula; k
        # multiplies the whole eval cost, and overflow is counted with
        # handler-level auto-bump (k_boost) recovering any shortfall
        slack = 1.75
    if peak_density is not None and peak_density > 0.0:
        # MEASURED peak bin occupancy (normalized to particles per full-res
        # px^2 over a bin-sized window) — the AABB mean-density estimate
        # underestimates clustered scenes' peaks ~6x (VERDICT r3 #4); the
        # peak needs only alignment headroom, not distribution headroom
        d_eff = peak_density * (ds * ds)
        slack = 1.3
    k = int(math.ceil(bin_h * bin_w * d_eff * slack / 8.0)) * 8
    # NOTE: a saturation-based cap (stop once blended alpha must saturate)
    # was tried and is NOT lossless — bin-level selection can keep only
    # far-away particles for an edge pixel while dropping the one on top of
    # it (measured 0.34 max pixel error). The budget stays density-based;
    # overflow is counted and warned (draw(check_overflow=True)).
    k = max(8, min(256, k))
    # the overflow auto-bump boost applies AFTER the floor/cap — density can
    # underestimate peak occupancy arbitrarily (clustered scene in a huge
    # AABB), so the boost must scale the effective k, not the raw estimate
    if k_boost != 1.0:
        k = min(256, int(math.ceil(k * k_boost / 8.0)) * 8)

    thickness = float(config["outline_thickness"])
    steps = int(math.ceil(thickness)) + 1                # outline.glsl:14
    if steps > 64:
        from ..utils import log
        log.warning("outline_thickness `", thickness, "` needs ", steps,
                    " dilation steps; clamping to 64 (reach preserved)")
        steps = 64
    # outline distances are in EVAL pixels: "super" doubles them
    reach = int(math.ceil(thickness)) + 2
    shift_pad = max(16, 2 * reach if post_mode == "super" else reach)

    return RenderOptions(canvas_size=canvas_size, tile_h=tile_h, tile_w=tile_w,
                         bin_h=bin_h, bin_w=bin_w, max_splat_px=splat,
                         tile_capacity=k, max_outline_steps=steps,
                         shift_pad=shift_pad, downsample=ds,
                         use_particle_color=use_particle_color,
                         post_mode=post_mode)


def pick_canvas_bucket(aabb_min, aabb_max, max_radius_ts, max_vel,
                       motion_blur, fixed: Optional[int]) -> int:
    """Canvas size for one population (reference :1944-1954).

    Extent = AABB + padding ``max_radius*texture_scale*(1 + max(1,|v|max) *
    motion_blur)`` on each side, snapped up to a static bucket, clamped at
    2560 exactly like the reference."""
    if fixed is not None:
        return int(fixed)
    pad = max_radius_ts * (1.0 + max(1.0, max_vel) * motion_blur)
    extent = float(max(aabb_max[0] - aabb_min[0], aabb_max[1] - aabb_min[1]))
    need = extent + 2.0 * pad
    for b in CANVAS_BUCKETS:
        if need <= b:
            return b
    return CANVAS_BUCKETS[-1]


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / jnp.maximum(e1 - e0, EPS), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


# -------------------------------------------------------------- splat pass --

def _ring_depth(opts: RenderOptions) -> Tuple[int, int]:
    """Bin-grid ring rows/cols beyond each canvas edge.

    A splat center up to ``max_splat_px`` outside the canvas still touches
    it (the reference rasterizes any quad intersecting the canvas,
    :2046-2064). Binning those into REAL exterior ring bins keeps per-bin
    occupancy at scene density; clamping them into the edge bins instead
    funnels the whole off-canvas reach band into one bin row, which no
    honest per-bin budget can hold when the scene is larger than the
    clamped 2560 canvas (the 1M bench: ~65k funneled drops at k=256)."""
    e = opts.max_splat_px
    return -(-e // opts.bin_h), -(-e // opts.bin_w)


def _bin_particles(p_canvas, active, opts: RenderOptions, cols=None):
    """Bin each particle ONCE by its center bin; tiles gather neighbor bins.

    One sorted entry per particle (multi-bin scatter windows cost ~18x more
    sort traffic); a splat reaches at most ``max_splat_px``, so at eval time a
    tile's candidates are the bins within a static neighborhood — see
    :func:`_tile_bins`. The bin grid EXTENDS one ring of ``_ring_depth``
    bins beyond every canvas edge so near-edge exterior particles bin at
    scene density. Returns ``(table, audit)``: a
    ``(n_bins + 1, tile_capacity)`` index table (-1 empty; last row holds
    beyond-reach particles, never read) and an i32 ``[n_overflow, max_count]``
    pair — canvas-reaching particles dropped past the per-bin budget, and
    the peak bin occupancy (draw()'s one-shot budget bump sizes k from it).

    With ``cols`` (a list of (N,) f32 payload columns) the columns ride the
    bucket sort and the return value is the bin-resident PAYLOAD
    ``(n_bins + 1, tile_capacity, F)`` directly — no index table and no
    (N, F) row gather afterwards (the ``pack[table]`` gather cost ~6 ms at
    the 1M headline; per-column window gathers from the sorted runs stay
    ~2 ms). Candidate order within a bin is identical either way (the sort
    is stable on the bucket key).
    """
    s, bh, bw, e = opts.eff_size, opts.bin_h, opts.bin_w, opts.max_splat_px
    ry, rx = _ring_depth(opts)
    nby, nbx = s // bh + 2 * ry, s // bw + 2 * rx
    n_bins = nby * nbx

    n = p_canvas.shape[0]
    by = jnp.floor(p_canvas[:, 1] / bh).astype(jnp.int32) + ry
    bx = jnp.floor(p_canvas[:, 0] / bw).astype(jnp.int32) + rx
    # particles slightly off-canvas splat onto it: they bin into the ring
    # (the clip only engages in the sliver between reach e and the ring
    # boundary ry*bh >= e); beyond max_splat_px they are dropped entirely
    reach_y = (p_canvas[:, 1] > -e) & (p_canvas[:, 1] < s + e)
    reach_x = (p_canvas[:, 0] > -e) & (p_canvas[:, 0] < s + e)
    by = jnp.clip(by, 0, nby - 1)
    bx = jnp.clip(bx, 0, nbx - 1)
    ok = active & reach_x & reach_y
    bucket = jnp.where(ok, by * nbx + bx, n_bins)

    pidx = jnp.arange(n, dtype=jnp.int32)
    if cols is None:
        bucket_sorted, pidx_sorted = jax.lax.sort_key_val(bucket, pidx)
    else:
        sorted_all = jax.lax.sort(tuple([bucket] + list(cols)), num_keys=1)
        cols_sorted = sorted_all[1:]
    k = opts.tile_capacity
    # Scatter-free table build: per-bin runs are contiguous in the sorted
    # order, so the table is a (n_bins+1, k) window gather from segment
    # starts. The starts come from per-bin COUNTS via an MXU one-hot
    # contraction (grid.count_pairs_mxu) + a tiny cumsum — searchsorted over
    # the ~6k bin queries serialized (~3 ms/population at 2560^2 canvases).
    from .grid import count_pairs_mxu
    by_s = jnp.where(ok, by, nby)
    bx_s = jnp.where(ok, bx, nbx)
    cnt2 = count_pairs_mxu(by_s, bx_s, nby, nbx)             # (nby, nbx)
    flat_counts = cnt2.reshape(-1)                           # bucket-id order
    n_sent = jnp.float32(n) - jnp.sum(flat_counts)
    all_counts = jnp.concatenate([flat_counts, n_sent[None]])
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32),
         jnp.cumsum(all_counts)])[:-1].astype(jnp.int32)     # (n_bins+1,)
    counts = all_counts.astype(jnp.int32)
    overflow = jnp.sum(jnp.maximum(counts[:n_bins] - k, 0))
    maxcnt = jnp.max(counts[:n_bins])
    pos_in = starts[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
    valid = jnp.arange(k, dtype=jnp.int32)[None, :] < counts[:, None]
    # row n_bins backs out-of-canvas window positions and must stay empty
    valid = valid & (jnp.arange(n_bins + 1, dtype=jnp.int32)
                     < n_bins)[:, None]
    capped = jnp.minimum(pos_in, n - 1)
    if cols is not None:
        payload = jnp.stack(
            [jnp.where(valid, c[capped], 0.0) for c in cols_sorted],
            axis=-1)                                         # (n_bins+1, k, F)
        return payload, jnp.stack([overflow, maxcnt]), counts
    table = jnp.where(valid, pidx_sorted[capped], -1)
    return table, jnp.stack([overflow, maxcnt]), counts


def _tile_bins(opts: RenderOptions):
    """(n_tiles, n_window_bins) bin ids per evaluation tile (static).

    The window is every bin intersecting the tile dilated by the splat
    reach — bins are footprint-sized (auto_render_options), so candidates
    stay local to the tile. The window halo depth equals the exterior ring
    depth of :func:`_bin_particles`, so edge tiles' windows land exactly on
    the ring bins holding near-edge exterior particles."""
    s, th, tw = opts.eff_size, opts.tile_h, opts.tile_w
    bh, bw = opts.bin_h, opts.bin_w
    nty, ntx = s // th, s // tw
    ry, rx = _ring_depth(opts)           # halo == exterior ring depth
    nby, nbx = s // bh + 2 * ry, s // bw + 2 * rx
    n_tiles = nty * ntx
    wy = th // bh + 2 * ry
    wx = tw // bw + 2 * rx

    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    ty = tids // ntx
    tx = tids % ntx
    # in ring-extended bin coords (+r offset cancels the -r halo start):
    # every window position is a real bin — by0 >= 0 and the last tile's
    # window top is exactly nby - 1
    by0 = ty * (th // bh)
    bx0 = tx * (tw // bw)
    neighbors = []
    for dy in range(wy):
        for dx in range(wx):
            neighbors.append((by0 + dy) * nbx + (bx0 + dx))
    return jnp.stack(neighbors, axis=1)                     # (n_tiles, wy*wx)


def _splat_payload(pos, last_pos, vel, radius, color, active, canvas_center,
                   interpolation_alpha, texture_scale, motion_blur,
                   opts: RenderOptions):
    """(n_bins+1, K, F) bin-resident candidate payload + overflow count.

    ONE (n_bins+1)*K row gather packs every per-candidate parameter; the
    per-tile windows downstream then slice rows of this table instead of
    issuing ~10 element gathers per candidate (which dominated the pass:
    ~90 ms at 2560^2 / 65k particles). Frame interpolation
    (instanced_draw.glsl:40) and canvas placement: canvas pixel (0,0) sits
    at canvas_center - S/2 (reference :2090, :2060). All geometry is in
    EFFECTIVE (downsampled) canvas pixels."""
    ds = float(opts.downsample)
    p_world = last_pos + (pos - last_pos) * interpolation_alpha
    origin = canvas_center - 0.5 * opts.canvas_size
    p_canvas = (p_world - origin) / ds

    speed = jnp.sqrt(jnp.sum(vel * vel, axis=-1))
    inv_speed = 1.0 / jnp.maximum(speed, EPS)
    cos_a = jnp.where(speed > EPS, vel[:, 0] * inv_speed, 1.0)
    sin_a = jnp.where(speed > EPS, vel[:, 1] * inv_speed, 0.0)
    base_scale = radius * texture_scale / ds
    smear = 1.0 + speed * motion_blur                        # instanced_draw.glsl:25

    a_p = jnp.where(active, color[:, 3], 0.0)
    inv_sx = 1.0 / jnp.maximum(base_scale * smear, EPS)      # stretched axis
    inv_sy = 1.0 / jnp.maximum(base_scale, EPS)
    cols = [p_canvas[:, 0], p_canvas[:, 1], cos_a, sin_a,
            base_scale, base_scale * smear, inv_sx, inv_sy, a_p]
    if opts.use_particle_color:
        cols += [color[:, 0], color[:, 1], color[:, 2]]
    # columns ride the bucket sort; empty slots come back zeroed (ap=0,
    # extent=0), exactly like the old pack[table] + occupancy mask
    payload, audit, counts = _bin_particles(p_canvas, active, opts,
                                            cols=cols)
    return payload, audit, counts


def _splat_alpha_kernel(payload, nb, opts: RenderOptions, counts=None,
                        interpret: bool = False, use_rgb: bool = False):
    """(eff, eff) splat alpha (and optional rgb) via the Pallas tile kernel.

    ``payload``: (n_bins+1, K, F) bin-resident candidate table (F fields as
    packed by splat_population); ``nb``: (n_tiles, W) window bin ids;
    ``counts``: (n_bins+1,) per-bin occupancy — enables the per-tile trip
    skip.

    Candidates reach the kernel BIN-major: the payload is transposed once
    at table granularity to (n_bins+1, F, Kp) (Kp = K rounded up to a
    divisor/multiple of the 128-lane chunk), each tile's window is ONE row
    gather of (W, F*Kp) — no transposes, padding passes, or re-chunking of
    the big (T, W, F, Kp) tensor exist at all (the round-4 slot-major
    layout materialized it ~4x through HBM: ~206 MB/frame of pure layout
    traffic at the 1M headline). Window bins are count-sorted DESCENDING
    per tile, so "every remaining bin is empty" is a prefix property and
    ``trips = ceil(nnz_bins / bins_per_chunk)`` bounds the kernel's chunk
    loop — finer than the old peak-occupancy bound, since ring/empty bins
    drop out entirely.
    """
    s, th, tw = opts.eff_size, opts.tile_h, opts.tile_w
    nty, ntx = s // th, s // tw
    k = opts.tile_capacity
    n_f = payload.shape[-1]
    n_tiles, w_bins = nb.shape
    n_bins1 = payload.shape[0]
    from .pallas import splat_kernel

    # Kp: smallest divisor-or-multiple of 128 holding k (8-granular)
    kp = 8
    while kp < k:
        kp *= 2
    kp = min(max(kp, 8), 256)
    bins_per_chunk = max(1, _SPLAT_CHUNK // kp)

    # Row-slab path: the kernel DMAs whole window-row slabs of the
    # row-major payload table and needs NO candidate window gather at all
    # (and no tile->canvas transpose) — see splat_kernel.splat_rows. Gated
    # on the slab's PHYSICAL VMEM footprint ((F, Kp) pads to (8*, 128)
    # tiles; the full-resolution post modes can exceed it).
    ry, rx = _ring_depth(opts)
    bh, bw = opts.bin_h, opts.bin_w
    nby, nbx = s // bh + 2 * ry, s // bw + 2 * rx
    wy, wx = th // bh + 2 * ry, tw // bw + 2 * rx
    rpt = th // bh
    slab_phys = (wy * nbx * (-(-n_f // 8) * 8) * max(kp, 128) * 4)
    if counts is not None and slab_phys <= 12 * 1024 * 1024:
        chunks_per_bin = max(1, kp // _SPLAT_CHUNK)
        n_chunks = -(-(wy * wx) // bins_per_chunk) * chunks_per_bin
        # raster-order chunk bound: last nonempty window chunk + 1
        wc = jnp.minimum(counts[nb[:, :wy * wx]], k)         # (T, W) raster
        pad_w = -(-(wy * wx) // bins_per_chunk) * bins_per_chunk - wy * wx
        if pad_w:
            wc = jnp.pad(wc, ((0, 0), (0, pad_w)))
        chunk_nz = jnp.any(
            wc.reshape(n_tiles, -1, bins_per_chunk) > 0, axis=2)
        if chunks_per_bin > 1:
            chunk_nz = jnp.repeat(chunk_nz, chunks_per_bin, axis=1)
        cidx = jnp.arange(chunk_nz.shape[1], dtype=jnp.int32)
        trips = jnp.max(jnp.where(chunk_nz, cidx + 1, 0),
                        axis=1).astype(jnp.int32)
        payload_t = payload[:nby * nbx].transpose(0, 2, 1)   # no sentinel
        if kp > k:
            payload_t = jnp.pad(payload_t,
                                ((0, 0), (0, 0), (0, kp - k)))
        alpha, rgb = splat_kernel.splat_rows(
            payload_t, trips, th, tw, s, nbx, wx, wy, rpt, bw,
            opts.max_splat_px, use_rgb=use_rgb, interpret=interpret)
        return alpha, rgb
    if w_bins % bins_per_chunk:
        pad_w = bins_per_chunk - w_bins % bins_per_chunk
        # sentinel row n_bins is always empty — padded window positions
        # contribute nothing and sort to the tail
        nb = jnp.pad(nb, ((0, 0), (0, pad_w)),
                     constant_values=n_bins1 - 1)
        w_bins += pad_w
    chunks_per_bin = max(1, kp // _SPLAT_CHUNK)
    n_chunks = (w_bins // bins_per_chunk) * chunks_per_bin

    if counts is not None:
        wc = jnp.minimum(counts[nb], k)                      # (T, W)
        order = jnp.argsort(-wc, axis=1)
        nb = jnp.take_along_axis(nb, order, axis=1)
        nnz = jnp.sum((jnp.take_along_axis(wc, order, axis=1) > 0)
                      .astype(jnp.int32), axis=1)
        trips = (-(-nnz // bins_per_chunk) * chunks_per_bin).astype(jnp.int32)
    else:
        trips = jnp.full((n_tiles,), n_chunks, jnp.int32)

    payload_t = payload.transpose(0, 2, 1)                   # (n_bins+1, F, K)
    if kp > k:
        payload_t = jnp.pad(payload_t, ((0, 0), (0, 0), (0, kp - k)))
    cand = (payload_t.reshape(n_bins1, n_f * kp)[nb]
            .reshape(n_tiles, w_bins, n_f, kp))
    tiles_a, tiles_rgb = splat_kernel.splat_tiles_v2(
        cand, trips, th, tw, ntx, opts.max_splat_px, use_rgb=use_rgb,
        interpret=interpret)
    alpha = (tiles_a.reshape(nty, ntx, th, tw)
             .transpose(0, 2, 1, 3).reshape(s, s))
    rgb = None
    if use_rgb:
        rgb = (tiles_rgb.reshape(nty, ntx, th, tw, 3)
               .transpose(0, 2, 1, 3, 4).reshape(s, s, 3))
    return alpha, rgb


def splat_population(pos, last_pos, vel, radius, color, active,
                     canvas_center, interpolation_alpha,
                     texture_scale, motion_blur,
                     opts: RenderOptions, upsample: bool = True,
                     use_pallas: bool = True):
    """Accumulated density canvas(es) for one population.

    Returns ``(alpha, rgb_or_None, n_overflow)``: ``alpha`` is (S, S)
    screen-blend accumulated gaussian density; ``rgb`` (S, S, 3) only when
    ``opts.use_particle_color`` (the reference's experimental per-particle
    color mode, test.lua:25); ``n_overflow`` counts on-canvas particles
    dropped past the per-bin render budget.
    """
    s = opts.eff_size
    th, tw = opts.tile_h, opts.tile_w
    nty, ntx = s // th, s // tw
    k = opts.tile_capacity
    use_rgb = opts.use_particle_color

    payload, audit, counts = _splat_payload(
        pos, last_pos, vel, radius, color, active, canvas_center,
        interpolation_alpha, texture_scale, motion_blur, opts)
    n_f = payload.shape[-1]

    nb = _tile_bins(opts)                                    # (T, W) bin ids
    n_tiles, w_bins = nb.shape
    n_cand = w_bins * k

    from .pallas import splat_kernel
    if use_pallas and splat_kernel.on_tpu():
        # Pallas path: one VMEM-resident accumulation per tile (see
        # ops/pallas/splat_kernel.py). XLA's job is only the bandwidth-cheap
        # payload transpose + window row gather feeding it. The
        # use_particle_color mode rides the same kernel with 3 extra
        # payload fields and per-channel accumulators (VERDICT r4 #8 — it
        # previously fell off the Pallas path entirely).
        alpha, rgb = _splat_alpha_kernel(payload, nb, opts, counts=counts,
                                         use_rgb=use_rgb)
        if opts.downsample > 1 and upsample:
            alpha, rgb = upsample_splat(alpha, rgb, opts)
        return alpha, rgb, audit

    py_grid = jax.lax.broadcasted_iota(jnp.float32, (th, tw), 0) + 0.5
    px_grid = jax.lax.broadcasted_iota(jnp.float32, (th, tw), 1) + 0.5

    chunk = min(_SPLAT_CHUNK, n_cand)
    n_chunks = -(-n_cand // chunk)
    cpad = n_chunks * chunk - n_cand

    def render_tile(tile_id, cand_payload):
        """cand_payload: (W*K, F) pre-gathered window parameters."""
        ty = tile_id // ntx
        tx = tile_id % ntx
        px = px_grid + (tx * tw).astype(jnp.float32)         # (th, tw)
        py = py_grid + (ty * th).astype(jnp.float32)
        if cpad:
            cand_payload = jnp.concatenate(
                [cand_payload, jnp.zeros((cpad, n_f), jnp.float32)])
        cp = cand_payload.reshape(n_chunks, chunk, n_f)

        def body(carry, xs):
            acc_a, acc_rgb = carry
            pcx, pcy, ca, sa, bs, bs_sm, isx, isy, ap = (
                xs[..., 0], xs[..., 1], xs[..., 2], xs[..., 3], xs[..., 4],
                xs[..., 5], xs[..., 6], xs[..., 7], xs[..., 8])
            dx = px[..., None] - pcx                         # (th, tw, C)
            dy = py[..., None] - pcy
            # rotate into the velocity frame (instanced_draw.glsl:27-35)
            d_par = dx * ca + dy * sa
            d_perp = -dx * sa + dy * ca
            nx = d_par * isx
            ny = d_perp * isy
            r2 = nx * nx + ny * ny
            # quad extent + static splat cap (texture clampzero analog);
            # empty slots have bs == 0 so `inside` is identically False
            inside = ((jnp.abs(d_par) <= bs_sm) & (jnp.abs(d_perp) <= bs)
                      & (jnp.abs(dx) <= opts.max_splat_px)
                      & (jnp.abs(dy) <= opts.max_splat_px))
            g = jnp.where(inside, jnp.exp(-_GAUSS_COEFF * r2) * ap, 0.0)
            acc_a = acc_a * jnp.prod(1.0 - g, axis=-1)       # screen blend
            if use_rgb:
                crgb = xs[..., 9:12]
                acc_rgb = acc_rgb * jnp.prod(1.0 - g[..., None] * crgb, axis=-2)
            return (acc_a, acc_rgb), None

        init_rgb = jnp.ones((th, tw, 3), jnp.float32) if use_rgb else jnp.zeros((1,))
        (acc_a, acc_rgb), _ = jax.lax.scan(
            body, (jnp.ones((th, tw), jnp.float32), init_rgb), cp)
        return 1.0 - acc_a, (1.0 - acc_rgb if use_rgb else acc_rgb)

    # Tiles run in vmapped groups: a plain lax.map would process one (th, tw)
    # tile per sequential scan iteration (dispatch-bound, ~30x slower at
    # 2560^2). Group size bounds the live (TC, th, tw, chunk) intermediate.
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    tc = max(1, min(n_tiles, (8 << 20) // (th * tw * chunk * 4)))
    n_groups = -(-n_tiles // tc)
    tpad = n_groups * tc - n_tiles
    tile_ids_p = jnp.pad(tile_ids, (0, tpad)).reshape(n_groups, tc)
    flat_payload = payload.reshape(-1, k * n_f)              # (n_bins+1, K*F)

    def render_group(ids):
        windows = flat_payload[nb[ids]]                      # (TC, W, K*F) rows
        windows = windows.reshape(ids.shape[0], n_cand, n_f)
        return jax.vmap(render_tile)(ids, windows)

    tiles_a, tiles_rgb = jax.lax.map(render_group, tile_ids_p)
    tiles_a = tiles_a.reshape(n_groups * tc, th, tw)[:n_tiles]
    alpha = tiles_a.reshape(nty, ntx, th, tw).transpose(0, 2, 1, 3).reshape(s, s)
    rgb = None
    if use_rgb:
        tiles_rgb = tiles_rgb.reshape(n_groups * tc, th, tw, 3)[:n_tiles]
        rgb = tiles_rgb.reshape(nty, ntx, th, tw, 3).transpose(0, 2, 1, 3, 4).reshape(s, s, 3)
    if opts.downsample > 1 and upsample:
        alpha, rgb = upsample_splat(alpha, rgb, opts)
    return alpha, rgb, audit


@functools.lru_cache(maxsize=16)
def _linear_resize_rows(s_out: int, s_in: int):
    """(s_out, s_in) row-interpolation matrix == ``jax.image.resize``'s
    'linear' UPSAMPLE (half-pixel centers, edge clamp; not valid for
    downsampling, which antialiases). Applied as two MXU matmuls, a
    640 -> 2560 canvas upsample runs in a fraction of a ms where XLA's
    gather-based resize measured ~7 ms at the 1M headline."""
    pos = (np.arange(s_out) + 0.5) * (s_in / s_out) - 0.5
    lo = np.floor(pos).astype(np.int64)
    w = (pos - lo).astype(np.float32)
    lo_c = np.clip(lo, 0, s_in - 1)
    hi_c = np.clip(lo + 1, 0, s_in - 1)
    m = np.zeros((s_out, s_in), np.float32)
    m[np.arange(s_out), lo_c] += 1.0 - w
    m[np.arange(s_out), hi_c] += w
    return m


def _resize_linear_up(img, s_out: int):
    """Bilinear upsample of a square (S, S[, C]) image via interpolation
    matmuls; identical sampling to ``jax.image.resize(..., 'linear')``."""
    s_in = img.shape[0]
    if s_out == s_in:
        return img
    assert s_out > s_in, "matmul path is an upsampler"
    m = jnp.asarray(_linear_resize_rows(s_out, s_in))
    if img.ndim == 2:
        return m @ img @ m.T
    t = jnp.einsum("oi,ijc->ojc", m, img)
    return jnp.einsum("pj,ojc->opc", m, t)


def upsample_splat(alpha, rgb, opts: RenderOptions):
    """Bilinear upsample of a coarse-evaluated splat canvas to full res.

    Split out so multi-device renderers can combine per-device COARSE
    canvases first — the screen-blend product does not commute with
    bilinear resampling."""
    s_full = opts.canvas_size
    alpha = _resize_linear_up(alpha, s_full)
    if rgb is not None and rgb.ndim == 3:
        rgb = _resize_linear_up(rgb, s_full)
    return alpha, rgb


# ------------------------------------------------------- post-process passes --

def _shift_bilinear(img, dx, dy, pad: int, padded=None):
    """Shift a 2D image by a (possibly fractional) offset, zero-padded.

    Sampling ``tex(uv + offset)`` with linear filtering == shifting the image
    by ``-offset``; callers pass the sample offset directly. ``padded`` lets
    hot loops (the outline dilation does up to 64 of these) pre-pad once.
    """
    if padded is None:
        padded = jnp.pad(img, ((pad, pad), (pad, pad)))
    # sample at (x + dx, y + dy): 4-tap bilinear mix of integer shifts
    fx, fy = jnp.floor(dx), jnp.floor(dy)
    ax, ay = dx - fx, dy - fy
    iy, ix = fy.astype(jnp.int32), fx.astype(jnp.int32)

    def tap(sy, sx):
        return jax.lax.dynamic_slice(padded, (pad + sy, pad + sx), img.shape)

    return (tap(iy, ix) * (1 - ax) * (1 - ay)
            + tap(iy, ix + 1) * ax * (1 - ay)
            + tap(iy + 1, ix) * (1 - ax) * ay
            + tap(iy + 1, ix + 1) * ax * ay)


def roll0_dyn(im, sy, sx, pad: int):
    """out[y, x] = im[y + sy, x + sx] with zero padding; |s| <= pad."""
    padded = jnp.pad(im, ((pad, pad), (pad, pad)))
    return jax.lax.dynamic_slice(padded, (pad + sy, pad + sx), im.shape)


_DIAG = float(np.sqrt(2.0) / 2.0)
_OUTLINE_DIRECTIONS = [(1.0, 0.0), (-1.0, 0.0), (0.0, 1.0), (0.0, -1.0),
                       (_DIAG, _DIAG), (-_DIAG, _DIAG),
                       (_DIAG, -_DIAG), (-_DIAG, -_DIAG)]


def outline_pass(alpha, outline_thickness, threshold, opts: RenderOptions,
                 px_scale: float = 1.0):
    """Morphological 8-direction dilation + smoothstep edge
    (simulation_handler_outline.glsl). Returns outline coverage in [0, 1].

    ``opts.max_outline_steps`` is sized to ``ceil(thickness) + 1`` on the
    host (auto_render_options), so the full GLSL step count runs
    (outline.glsl:14-15); masking handles the traced thickness changing
    below the static bound. ``px_scale`` > 1 evaluates on a coarse canvas:
    sample count unchanged, distances in coarse pixels."""
    max_alpha = jnp.zeros_like(alpha)
    steps_f = jnp.ceil(outline_thickness) + 1.0
    step_size = outline_thickness / (steps_f * px_scale)
    pad = opts.shift_pad
    padded = jnp.pad(alpha, ((pad, pad), (pad, pad)))  # once, not per tap
    for step in range(1, opts.max_outline_steps + 1):
        use = jnp.float32(step) <= steps_f
        d = jnp.float32(step) * step_size
        d = jnp.minimum(d, float(opts.shift_pad - 1))
        for dx, dy in _OUTLINE_DIRECTIONS:
            sampled = _shift_bilinear(alpha, d * dx, d * dy, pad,
                                      padded=padded)
            max_alpha = jnp.maximum(max_alpha, jnp.where(use, sampled, 0.0))
    max_alpha = jnp.minimum(max_alpha, 1.0)

    outline_threshold = 0.5 * threshold                      # glsl:44
    coverage = _smoothstep(outline_threshold, outline_threshold + 0.035, max_alpha)
    return jnp.where(alpha > 0.0, coverage, 0.0)             # glsl:11 discard


_SPEC_LIGHT = np.array([1.0, -1.0, 1.0]) / np.linalg.norm([1.0, -1.0, 1.0])
_VIEW = np.array([0.0, 0.0, 1.0])
_HALF = (_SPEC_LIGHT + _VIEW) / np.linalg.norm(_SPEC_LIGHT + _VIEW)
_SHADOW_LIGHT = np.array([-0.5, 0.75, 0.0]) / np.linalg.norm([-0.5, 0.75, 0.0])
_SPECULAR_FOCUS = 48.0


def lighting_pass(alpha, rgb, cfg_color, highlight_strength, shadow_strength,
                  threshold, smoothness, use_lighting: bool,
                  use_particle_color: bool, grad_scale: float = 1.0):
    """Threshold + Sobel-normal Blinn-Phong pass (simulation_handler_lighting.glsl).

    Returns (rgb, a) premultiplied-ish exactly as the shader outputs:
    ``vec4(center.rgb - shadow + specular, center.a)``.
    """
    value = _smoothstep(threshold - smoothness, threshold + smoothness, alpha)
    if use_particle_color:
        center_rgb = rgb * cfg_color[:3]
        center_a = value * cfg_color[3]
    else:
        center_rgb = value[..., None] * cfg_color[:3]
        center_a = value * cfg_color[3]

    # 3x3 Sobel over the *raw* accumulated alpha (glsl:37-46)
    z = jnp.pad(alpha, ((1, 1), (1, 1)))
    tl, tm, tr = z[:-2, :-2], z[:-2, 1:-1], z[:-2, 2:]
    ml, mr = z[1:-1, :-2], z[1:-1, 2:]
    bl, bm, br = z[2:, :-2], z[2:, 1:-1], z[2:, 2:]
    gx = (-tl + tr - 2.0 * ml + 2.0 * mr - bl + br) * grad_scale
    gy = (-tl - 2.0 * tm - tr + bl + 2.0 * bm + br) * grad_scale

    inv_len = jax.lax.rsqrt(gx * gx + gy * gy + 1.0)
    nx, ny, nz = -gx * inv_len, -gy * inv_len, inv_len

    out_rgb = center_rgb
    if use_lighting:
        ndoth = jnp.maximum(nx * _HALF[0] + ny * _HALF[1] + nz * _HALF[2], 0.0)
        specular = highlight_strength * jnp.power(ndoth, _SPECULAR_FOCUS)
        specular = jnp.where(highlight_strength > 0.0, specular, 0.0)

        ndotl = nx * _SHADOW_LIGHT[0] + ny * _SHADOW_LIGHT[1] + nz * _SHADOW_LIGHT[2]
        shadow = _smoothstep(0.0, 1.0, jnp.clip(ndotl * shadow_strength, 0.0, 1.0))
        shadow = jnp.where(shadow_strength > 0.0, shadow, 0.0)
        out_rgb = center_rgb - shadow[..., None] + specular[..., None]

    return out_rgb, center_a


def render_population(alpha, rgb, cfg, thresholding_threshold,
                      thresholding_smoothness, use_lighting: bool,
                      opts: RenderOptions, px_scale: float = 1.0):
    """Outline + lighting for one population's canvas; returns straight RGBA,
    already internally composited (outline under lighting, :2139-2159).

    With ``px_scale`` = opts.downsample the passes run on the COARSE splat
    canvas (distances and gradients corrected to full-res pixels) — the
    upsampled alpha is pure bilinear interpolation of the coarse data, so
    evaluating post passes coarse loses nothing the splat still had; the
    caller upsamples the finished RGBA once."""
    out_rgb = jnp.zeros(alpha.shape + (3,), jnp.float32)
    out_a = jnp.zeros_like(alpha)

    # outline (skipped when thickness == 0 via masking rather than branching)
    coverage = outline_pass(alpha, cfg.outline_thickness, thresholding_threshold,
                            opts, px_scale=px_scale)
    coverage = jnp.where(cfg.outline_thickness > 0.0, coverage, 0.0)
    o_rgb = cfg.outline_color[:3] * (coverage * cfg.outline_color[3])[..., None]
    o_a = coverage * cfg.outline_color[3]
    out_rgb, out_a = _src_over(out_rgb, out_a, o_rgb, o_a)

    l_rgb, l_a = lighting_pass(
        alpha, rgb, cfg.color, cfg.highlight_strength, cfg.shadow_strength,
        thresholding_threshold, thresholding_smoothness, use_lighting,
        opts.use_particle_color, grad_scale=1.0 / px_scale)
    out_rgb, out_a = _src_over(out_rgb, out_a, l_rgb * jnp.clip(l_a, 0.0, 1.0)[..., None], l_a)
    return jnp.concatenate([out_rgb, out_a[..., None]], axis=-1)


def _src_over(dst_rgb, dst_a, src_rgb_premul, src_a):
    """Standard alpha blending, premultiplied source (LÖVE "alpha"/"alphamultiply")."""
    a = jnp.clip(src_a, 0.0, 1.0)
    out_rgb = src_rgb_premul + dst_rgb * (1.0 - a[..., None])
    out_a = a + dst_a * (1.0 - a)
    return out_rgb, out_a


# ------------------------------------------------------------ orchestration --

@functools.partial(jax.jit, static_argnames=("opts2", "use_lighting", "vw",
                                             "vh", "pop_caps"))
def _render_frame(state, stats, cfg2, interpolation_alpha,
                  threshold, smoothness, viewport_origin,
                  opts2: Tuple[RenderOptions, RenderOptions],
                  use_lighting: bool, vw: int, vh: int,
                  pop_caps=None):
    """Jitted full-frame render: both populations splatted, shaded, composited.

    ``opts2`` holds one (static) RenderOptions per population — canvases are
    sized independently, like the reference's two AABB-grown canvases.
    ``pop_caps`` statically slices each population's particle arrays (the
    yolk population is ~10x smaller than capacity; binning a full-capacity
    array costs the same sort whether slots are live or not)."""
    active = state.active_mask()

    centers = (stats.last_centroid
               + (stats.centroid - stats.last_centroid) * interpolation_alpha)

    def pop_canvas(i, opts):
        cap = state.capacity if pop_caps is None else min(pop_caps[i],
                                                          state.capacity)
        cfg = jax.tree.map(lambda a: a[i], cfg2)
        alpha, rgb, audit = splat_population(
            state.pos[i, :cap], state.last_pos[i, :cap], state.vel[i, :cap],
            state.radius[i, :cap], state.color[i, :cap], active[i, :cap],
            centers[i], interpolation_alpha,
            cfg.texture_scale, cfg.motion_blur, opts, upsample=False)
        s = opts.canvas_size
        if opts.post_mode == "coarse":
            # outline/lighting at the splat's effective resolution; the
            # finished RGBA upsamples once (fastest — the coarse alpha is
            # pure bilinear data, so the passes lose nothing the splat had)
            rgba = render_population(alpha, rgb, cfg, threshold, smoothness,
                                     use_lighting, opts,
                                     px_scale=float(opts.downsample))
            if opts.downsample > 1:
                rgba = _resize_linear_up(rgba, s)
        else:
            # "full"/"super": edge-quality modes — smoothstep thresholds and
            # Sobel normals evaluate at (2x) canvas resolution; "super" box-
            # filters 2x2 back down, the analog of the reference's MSAA-4
            # canvas resolve (:453, :1962)
            scale = 1 if opts.post_mode == "full" else 2
            e = s * scale
            alpha_hi = (alpha if alpha.shape[0] == e
                        else _resize_linear_up(alpha, e))
            rgb_hi = None
            if rgb is not None and rgb.ndim == 3:
                rgb_hi = (rgb if rgb.shape[0] == e
                          else _resize_linear_up(rgb, e))
            rgba = render_population(alpha_hi, rgb_hi, cfg, threshold,
                                     smoothness, use_lighting, opts,
                                     px_scale=1.0 / scale)
            if scale > 1:
                rgba = rgba.reshape(s, scale, s, scale, 4).mean(axis=(1, 3))
        if opts.downsample > 1:
            alpha = _resize_linear_up(alpha, s)
        return rgba, alpha, audit

    screen_rgb = jnp.zeros((vh, vw, 3), jnp.float32)
    screen_a = jnp.zeros((vh, vw), jnp.float32)
    canvases = []
    overflows = []
    for i in (0, 1):  # white first, then yolk (:2163-2171)
        rgba, raw_alpha, audit = pop_canvas(i, opts2[i])
        canvases.append(raw_alpha)
        overflows.append(audit)
        # canvas top-left in viewport pixels (reference :2132-2133); the
        # fractional part is resolved by a 4-tap bilinear shift of the
        # canvas, matching the reference's bilinear canvas resample.
        # Reference-faithful quirk: the canvas CONTENT is centered on the
        # INTERPOLATED centroid (:2056-2060) but the canvas is pasted at the
        # END-OF-STEP centroid — at alpha < 1 the whole egg sits offset by
        # (1-alpha)*(centroid - last_centroid), exactly like the reference.
        corner = stats.centroid[i] - 0.5 * opts2[i].canvas_size - viewport_origin
        screen_rgb, screen_a = _paste_src_over_frac(screen_rgb, screen_a,
                                                    rgba, corner)

    frame = jnp.concatenate([screen_rgb, screen_a[..., None]], axis=-1)
    return frame, tuple(canvases), jnp.stack(overflows)


def _paste_src_over_frac(dst_rgb, dst_a, src_rgba, corner):
    """Fractional-position paste: bilinear-shift the canvas by the corner's
    fractional part (the reference places canvases at float coordinates and
    lets the GPU's linear filter resample, :2132-2133), then integer-paste."""
    ci = jnp.floor(corner)
    frac = corner - ci                                       # in [0, 1)
    fx, fy = frac[0], frac[1]
    # sample src at (q - frac): 4-tap bilinear of integer shifts 0 / -1
    p = jnp.pad(src_rgba, ((1, 1), (1, 1), (0, 0)))
    s00 = p[1:-1, 1:-1]
    s01 = p[1:-1, :-2]                                       # x-1
    s10 = p[:-2, 1:-1]                                       # y-1
    s11 = p[:-2, :-2]
    shifted = (s00 * (1 - fx) * (1 - fy) + s01 * fx * (1 - fy)
               + s10 * (1 - fx) * fy + s11 * fx * fy)
    return _paste_src_over(dst_rgb, dst_a, shifted,
                           ci[0].astype(jnp.int32), ci[1].astype(jnp.int32))


def _paste_src_over(dst_rgb, dst_a, src_rgba, x0, y0):
    """Alpha-blend a canvas onto the screen at integer offset (x0, y0), clipped.

    Padding by the full viewport size on every side means the dynamic-slice
    start never needs clamping while any part of the canvas overlaps the
    viewport — partially off-screen canvases clip exactly (the clamp only
    engages with zero overlap, where the slice lands in pure padding)."""
    vh, vw = dst_a.shape
    s = src_rgba.shape[0]
    src = jnp.pad(src_rgba, ((vh, vh), (vw, vw), (0, 0)))
    start_y = jnp.clip(vh - y0, 0, src.shape[0] - vh)
    start_x = jnp.clip(vw - x0, 0, src.shape[1] - vw)
    placed = jax.lax.dynamic_slice(src, (start_y, start_x, 0), (vh, vw, 4))
    src_a = jnp.clip(placed[..., 3], 0.0, 1.0)
    src_rgb = placed[..., :3]
    out_rgb = src_rgb * src_a[..., None] + dst_rgb * (1.0 - src_a[..., None])
    out_a = src_a + dst_a * (1.0 - src_a)
    return out_rgb, out_a


def frame_options(handler) -> Tuple[RenderOptions, RenderOptions]:
    """Static per-population RenderOptions for the handler's CURRENT state.

    Canvas buckets are chosen on the host from the latest step stats (AABB +
    velocity padding, reference :1944-1954); also used by benchmarks to
    freeze options for a fully device-resident step+render loop."""
    stats = handler.stats
    counts = handler.get_n_particles()
    opts = []
    for i, cfg in ((0, handler._white_config), (1, handler._yolk_config)):
        aabb_min = np.asarray(stats.aabb_min[i])
        aabb_max = np.asarray(stats.aabb_max[i])
        if handler._canvas_size is not None:
            bucket = int(handler._canvas_size)
        else:
            bucket = pick_canvas_bucket(
                aabb_min, aabb_max,
                cfg["max_radius"] * cfg["texture_scale"],
                float(stats.max_velocity[i]), cfg["motion_blur"], None)
        area = float(max(aabb_max[0] - aabb_min[0], 1.0)
                     * max(aabb_max[1] - aabb_min[1], 1.0))
        density = counts[i] / area if area > 1.0 else None
        boost = getattr(handler, "_render_k_boost", (1.0, 1.0))[i]
        peak = getattr(handler, "_render_peak_density", (None, None))[i]
        opts.append(auto_render_options(
            cfg, bucket, use_particle_color=handler._use_particle_color,
            density=density, k_boost=boost, peak_density=peak,
            post_mode=getattr(handler, "_render_post_mode", "coarse")))
    return tuple(opts)


def draw(handler, viewport=None, background=None, check_overflow=True):
    """Render the handler's current state to an (H, W, 4) straight-alpha image.

    ``viewport=(x, y, w, h)`` in world pixels. ``background`` optionally an
    (r, g, b, a) tuple composited under everything. ``check_overflow``
    (default ON — the reference drops nothing inside its canvas, :2054-2064)
    reads the per-bin render-budget overflow counters, warns, and re-renders
    with a boosted budget until the frame drops nothing; the boost persists
    on the handler. Costs one scalar device sync per fresh frame; pass
    ``False`` only for throwaway frames where a transient budget drop is
    acceptable.
    """
    if viewport is None:
        viewport = (0.0, 0.0, 800, 600)
    x, y, w, h = viewport

    opts2 = frame_options(handler)

    cfg2 = handler._device_cfg2()
    frame, canvases, overflows = _render_frame(
        handler.state, handler.stats, cfg2,
        jnp.float32(handler.interpolation_alpha),
        jnp.float32(handler._thresholding_threshold),
        jnp.float32(handler._thresholding_smoothness),
        jnp.asarray([x, y], jnp.float32),
        opts2, bool(handler._use_lighting), int(w), int(h),
        pop_caps=handler._options.pop_caps)
    handler._canvases = canvases
    if check_overflow:
        # persist the frame's MEASURED peak bin occupancy (normalized to a
        # full-res px^2 density) as the next frame_options' budget hint, so
        # k is sized from observation, not the AABB mean-density estimate
        audits0 = np.asarray(overflows)
        dens = list(getattr(handler, "_render_peak_density", [None, None]))
        for i in range(2):
            o = opts2[i]
            m = int(audits0[i, 1])
            if m > 0:
                d = m / float(o.bin_h * o.bin_w * o.downsample ** 2)
                # only RAISE the hint: k (tile_capacity) is a static jit
                # shape parameter, so tracking every frame's fluctuation
                # downward would recompile the render pipeline repeatedly
                # and can undersize k, re-triggering the overflow auto-bump
                if dens[i] is None or d > dens[i]:
                    dens[i] = d
        handler._render_peak_density = dens
        # auto-bump: size the per-bin budget of any overflowing population
        # directly from the MEASURED max bin occupancy (the binning counts
        # it as a byproduct) and re-render until the frame drops nothing
        # (the reference drops nothing inside its canvas, :2054-2064); the
        # boost persists on the handler so subsequent frames start honest.
        # One shot normally settles; the loop guards state races and the
        # k = 256 cap (dropping past a saturated cap warns every pass).
        for _ in range(3):
            audits = np.asarray(overflows)                # (pop, [drops, max])
            if audits[:, 0].sum() == 0:
                break
            from ..utils import log
            boosts = list(getattr(handler, "_render_k_boost", [1.0, 1.0]))
            for i in range(2):
                if audits[i, 0] > 0:
                    # 20% headroom over the measured peak, snapped up to the
                    # table granularity; expressed as a multiplier on the
                    # current k so frame_options reproduces it
                    need = min(256, max(8, -(-int(audits[i, 1] * 1.2) // 8) * 8))
                    boosts[i] *= max(1.0, need / opts2[i].tile_capacity)
            handler._render_k_boost = boosts
            log.warning("render budget overflow: dropped ", int(audits[0, 0]),
                        " white / ", int(audits[1, 0]), " yolk particles "
                        "past tile_capacity (peak bin occupancy ",
                        (int(audits[0, 1]), int(audits[1, 1])),
                        "); re-rendering with budget boost ", tuple(boosts))
            opts2 = frame_options(handler)
            frame, canvases, overflows = _render_frame(
                handler.state, handler.stats, cfg2,
                jnp.float32(handler.interpolation_alpha),
                jnp.float32(handler._thresholding_threshold),
                jnp.float32(handler._thresholding_smoothness),
                jnp.asarray([x, y], jnp.float32),
                opts2, bool(handler._use_lighting), int(w), int(h),
                pop_caps=handler._options.pop_caps)
            handler._canvases = canvases
    if background is not None:
        bg = jnp.asarray(background, jnp.float32)
        a = frame[..., 3:4]
        frame = jnp.concatenate([
            frame[..., :3] * 1.0 + bg[:3] * (1.0 - a),
            jnp.maximum(frame[..., 3:4], bg[3]),
        ], axis=-1)
    return frame

#!/usr/bin/env python
"""Diagnose render-bin occupancy of the 1M bench scene (why 62k drops at k=256)."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax.numpy as jnp
from bench import build_handler
from egg_fluid_simulation_tpu.ops import render as render_ops

N = int(os.environ.get("DIAG_N", "1000000"))
h = build_handler(N)
h.run_steps(160)
opts2 = render_ops.frame_options(h)
stats = h.stats
for i in range(2):
    o = opts2[i]
    print(f"pop{i}: canvas={o.canvas_size} ds={o.downsample} bin=({o.bin_h},{o.bin_w}) "
          f"k={o.tile_capacity} splat={o.max_splat_px} tile=({o.tile_h},{o.tile_w})",
          flush=True)
    cap = min(h._options.pop_caps[i], h.state.capacity)
    pos = np.asarray(h.state.pos[i, :cap])
    act = np.asarray(h.state.active_mask()[i, :cap])
    cen = np.asarray(stats.centroid[i])
    print(f"  n_act={act.sum()} centroid={cen} aabb={np.asarray(stats.aabb_min[i])}"
          f"->{np.asarray(stats.aabb_max[i])} max_vel={float(stats.max_velocity[i]):.1f}",
          flush=True)
    ds = o.downsample
    origin = cen - 0.5 * o.canvas_size
    pc = (pos - origin) / ds
    s, bh, bw, e = o.eff_size, o.bin_h, o.bin_w, o.max_splat_px
    ry, rx = render_ops._ring_depth(o)
    nby, nbx = s // bh + 2 * ry, s // bw + 2 * rx
    inr = act & (pc[:, 0] > -e) & (pc[:, 0] < s + e) & (pc[:, 1] > -e) & (pc[:, 1] < s + e)
    by = np.clip(np.floor(pc[inr][:, 1] / bh).astype(int) + ry, 0, nby - 1)
    bx = np.clip(np.floor(pc[inr][:, 0] / bw).astype(int) + rx, 0, nbx - 1)
    bid = by * nbx + bx
    cnt = np.bincount(bid, minlength=nby * nbx)
    k = o.tile_capacity
    drops = np.maximum(cnt - k, 0).sum()
    top = np.argsort(cnt)[-8:][::-1]
    print(f"  in_reach={inr.sum()} bins={nby}x{nbx} meancnt={cnt[cnt>0].mean():.1f} "
          f"maxcnt={cnt.max()} drops@k{k}={drops}", flush=True)
    for t in top:
        tby, tbx = t // nbx, t % nbx
        print(f"    bin({tby},{tbx}) ring={(tby<ry) or (tby>=nby-ry) or (tbx<rx) or (tbx>=nbx-rx)} cnt={cnt[t]}", flush=True)
    # occupancy histogram
    qs = np.percentile(cnt[cnt > 0], [50, 90, 99, 99.9])
    print(f"  cnt pct 50/90/99/99.9 = {qs}", flush=True)

#!/usr/bin/env python
"""Round-3 profiling: per-piece timings of the 1M bench scene.

Prints the static render options the bench actually uses (k, bins, tiles, ds)
plus chained device timings of each render/step piece, so optimization
targets are measured, not guessed. See memory: all timings chain >=10
iterations in one dispatch (27 ms tunnel RTT).
"""
import json
import os
import statistics
import time

import numpy as np
import jax
import jax.numpy as jnp

from egg_fluid_simulation_tpu._compat import enable_compile_cache

enable_compile_cache()

from bench import build_handler
from egg_fluid_simulation_tpu.ops import render as render_ops
from egg_fluid_simulation_tpu.ops import solver as solver_ops

N = int(os.environ.get("PROF_N", "1000000"))
CHAIN = int(os.environ.get("PROF_CHAIN", "50"))


def timed(fn, n_trials=3):
    times = []
    for t in range(n_trials + 1):
        t0 = time.perf_counter()
        fn()
        dt = (time.perf_counter() - t0) * 1000
        if t >= 1:
            times.append(dt)
    return statistics.median(times)


def chain_ms(make_step, init, consts=(), chain=CHAIN, n_trials=3):
    """Time `chain` dependence-chained applications of make_step in one jit.

    ``consts``: large arrays the step reads but doesn't thread — passed as
    REAL jit arguments, not closure captures: the axon tunnel serializes
    closure constants into the compile request and rejects bodies past a
    size limit (HTTP 413 at ~hundreds of MB).
    """
    @jax.jit
    def loop(x, *cs):
        def body(c, _):
            return make_step(c, *cs), None
        out, _ = jax.lax.scan(body, x, None, length=chain)
        return out

    out = loop(init, *consts)  # compile
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])

    def run():
        r = loop(init, *consts)
        jax.device_get(jax.tree.leaves(r)[0].ravel()[0])

    return timed(run, n_trials) / chain


def main():
    h = build_handler(N)
    # settle past the spawn transient (the wide-sweep episode budget) so
    # pieces are measured in the steady state the bench headline uses
    h.run_steps(int(os.environ.get("PROF_SETTLE", "160")))
    opts2 = render_ops.frame_options(h)
    for i, o in enumerate(opts2):
        nb = render_ops._tile_bins(o)
        print(f"pop{i}: canvas={o.canvas_size} ds={o.downsample} eff={o.eff_size} "
              f"tile=({o.tile_h},{o.tile_w}) bin=({o.bin_h},{o.bin_w}) "
              f"k={o.tile_capacity} splat={o.max_splat_px} "
              f"w_bins={nb.shape[1]} n_tiles={nb.shape[0]} "
              f"cand_per_px={nb.shape[1]*o.tile_capacity}", flush=True)
    counts = h.get_n_particles()
    stats = h.stats
    for i in range(2):
        lo = np.asarray(stats.aabb_min[i]); hi = np.asarray(stats.aabb_max[i])
        area = float(max(hi[0]-lo[0], 1) * max(hi[1]-lo[1], 1))
        print(f"pop{i}: n={counts[i]} aabb={lo}->{hi} density={counts[i]/area:.5f}/px^2",
              flush=True)

    state = h.state
    cfg2 = h._device_cfg2()
    options = h._options
    dt, relax = h._step_scalars(1 / 60)
    active = state.active_mask()
    caps = options.pop_caps or (state.capacity, state.capacity)

    cents = jnp.stack([stats.centroid[i] for i in range(2)])

    # --- render pieces, per population ---
    res = {}

    def measure(label, make_step, init, consts=()):
        """One piece: time it, record it, PRINT it (a later piece failing
        must not lose earlier evidence — round-4 lesson: the tunnel rejects
        oversized compile requests with HTTP 413)."""
        try:
            res[label] = round(chain_ms(make_step, init, consts), 3)
        except Exception as e:  # noqa: BLE001 — keep profiling other pieces
            res[label] = f"FAILED: {type(e).__name__}"
        print(json.dumps({label: res[label]}), flush=True)
    for i in range(2):
        o = opts2[i]
        cap = min(caps[i], state.capacity)
        cfg = jax.tree.map(lambda a: a[i], cfg2)
        pos = state.pos[i, :cap]; last = state.last_pos[i, :cap]
        vel = state.vel[i, :cap]; rad = state.radius[i, :cap]
        col = state.color[i, :cap]; act = active[i, :cap]

        def splat(c, _o=o, _cfg=cfg, pos=pos, last=last, vel=vel, rad=rad,
                  col=col, act=act, i=i):
            a, _, ov = render_ops.splat_population(
                pos + c * 0, last, vel, rad, col, act, cents[i],
                jnp.float32(1.0), _cfg.texture_scale, _cfg.motion_blur, _o,
                upsample=False)
            return jnp.sum(a) * 1e-9

        measure(f"splat_{i}_ms", splat, jnp.float32(0.0))

        def binning(c, _o=o, pos=pos, act=act, i=i):
            p_canvas = (pos + c * 0 - (cents[i] - 0.5 * _o.canvas_size)) / _o.downsample
            table, ov, _cnt = render_ops._bin_particles(p_canvas, act, _o)
            return jnp.sum(table) * 1e-9 + jnp.sum(ov.astype(jnp.float32)) * 0

        measure(f"render_bin_{i}_ms", binning, jnp.float32(0.0))

        s = o.eff_size
        alpha0 = jnp.zeros((s, s), jnp.float32)

        def post(a, _o=o, _cfg=cfg):
            rgba = render_ops.render_population(
                a + 1e-6, None, _cfg, jnp.float32(0.3), jnp.float32(0.01),
                True, _o, px_scale=float(_o.downsample))
            return rgba[..., 3] * 1e-3

        measure(f"post_{i}_ms", post, alpha0)

    # --- full frame ---
    thr = jnp.float32(0.3); smooth = jnp.float32(0.01)
    view = float(max(o.canvas_size for o in opts2))
    center = np.asarray(stats.centroid[0])
    origin = jnp.asarray(center - view / 2.0, jnp.float32)
    vw = vh = int(view)

    def frame(c):
        f, _, _ = render_ops._render_frame(
            state, stats, cfg2, jnp.float32(1.0) + c * 0, thr, smooth, origin,
            opts2, True, vw, vh, pop_caps=options.pop_caps)
        return jnp.sum(f) * 1e-9

    measure("frame_ms", frame, jnp.float32(0.0))

    # --- step pieces (white pop, dense engine internals) ---
    from egg_fluid_simulation_tpu.ops import dense as dense_ops
    from egg_fluid_simulation_tpu.ops.pallas import place_kernel, sweep_kernel

    i = 0
    cap = min(caps[0], state.capacity)
    cfg = jax.tree.map(lambda a: a[i], cfg2)
    act0 = active[i, :cap]
    sub_dt = jnp.maximum(dt / options.n_substeps, 1e-6)
    cc = solver_ops.strength_to_compliance(cfg.collision_strength, sub_dt)
    coc = solver_ops.strength_to_compliance(cfg.cohesion_strength, sub_dt)
    cell_size, params = solver_ops._dense_params(cfg, act0, cc, coc, options)
    g = options.dense_grid_dim[i]
    k = options.dense_slots[i]
    pos = state.pos[i, :cap]
    vel = state.vel[i, :cap]
    inv_mass = jnp.where(state.inv_mass[i, :cap] > 0,
                         state.inv_mass[i, :cap], 0.0)
    radius = state.radius[i, :cap]
    batch = state.batch_slot[i, :cap]

    # bin_to_planes sub-pieces (what the ~15 ms rebin is made of)
    n_p = pos.shape[0]
    cxy = dense_ops.torus_cells(pos, cell_size, g)
    cell_id0 = jnp.where(act0, cxy[:, 1] * g + cxy[:, 0], g * g)
    idx0 = jnp.arange(n_p, dtype=jnp.int32)

    def sort_piece(c):
        cs, ps = jax.lax.sort_key_val(cell_id0 + c.astype(jnp.int32) * 0, idx0)
        return jnp.float32(cs[0] + ps[-1])

    measure("bin_sort_ms", sort_piece, jnp.float32(0.0))

    cid_s, pidx_s = jax.lax.sort_key_val(cell_id0, idx0)

    def inv_piece(c):
        _, slot = jax.lax.sort_key_val(pidx_s + c.astype(jnp.int32) * 0,
                                       cid_s)
        return jnp.float32(slot[0])

    measure("bin_inv_sort_ms", inv_piece, jnp.float32(0.0))

    pack0 = jnp.stack([pos[:, 0], pos[:, 1], inv_mass, radius,
                       batch.astype(jnp.float32), jnp.zeros_like(inv_mass),
                       idx0.astype(jnp.float32),
                       jnp.where(act0, 1.0, 0.0)] + [pos[:, 0]] * 7, axis=1)

    def packgather_piece(c):
        out = pack0[pidx_s + c.astype(jnp.int32) * 0]
        return jnp.float32(jnp.sum(out[::4096]))

    measure("bin_packgather_ms", packgather_piece, jnp.float32(0.0))

    def binning_piece(c):
        aux_cols = jnp.stack([pos[:, 0] + c * 0, pos[:, 1], vel[:, 0],
                              vel[:, 1], pos[:, 0], pos[:, 1],
                              jnp.zeros_like(pos[:, 0])], axis=1)
        b = dense_ops.bin_to_planes(pos + c * 0, inv_mass, radius, batch,
                                    act0, cell_size, grid_dim=g,
                                    slots_per_cell=k, aux_cols=aux_cols,
                                    use_placement=place_kernel.on_tpu())
        return jnp.sum(b.planes) * 1e-9 + jnp.sum(b.slot) * 1e-12

    measure("bin_ms", binning_piece, jnp.float32(0.0))

    def binning_rot_piece(c):
        aux_cols = jnp.stack([pos[:, 0] + c * 0, pos[:, 1], vel[:, 0],
                              vel[:, 1], pos[:, 0], pos[:, 1],
                              jnp.zeros_like(pos[:, 0])], axis=1)
        b = dense_ops.bin_to_planes(pos + c * 0, inv_mass, radius, batch,
                                    act0, cell_size, grid_dim=g,
                                    slots_per_cell=k, aux_cols=aux_cols,
                                    use_placement=place_kernel.on_tpu(),
                                    rotate=True)
        return jnp.sum(b.planes) * 1e-9 + jnp.sum(b.slot) * 1e-12

    measure("bin_rot_ms", binning_rot_piece, jnp.float32(0.0))

    aux_cols = jnp.stack([pos[:, 0], pos[:, 1], vel[:, 0], vel[:, 1],
                          pos[:, 0], pos[:, 1],
                          jnp.zeros_like(pos[:, 0])], axis=1)
    b = dense_ops.bin_to_planes(pos, inv_mass, radius, batch, act0,
                                cell_size, grid_dim=g, slots_per_cell=k,
                                aux_cols=aux_cols,
                                use_placement=place_kernel.on_tpu())

    for label, window, fresh, sym in (("sweep_ms", 1, False, False),
                                      ("sweep_wide_ms", 3, True, False),
                                      ("sweep_sym_ms", 1, False, True),
                                      ("sweep_wide_sym_ms", 3, True, True)):
        def sweep_piece(pl, _w=window, _f=fresh, _s=sym):
            corr = sweep_kernel.sweep_planes(
                pl, params, k, cohesion=False, ordered_budget=False,
                window=_w, fresh_mask=_f, symmetric=_s)
            rp = dense_ops.ROW_PAD
            return pl.at[dense_ops.FIELD_X, rp:rp + g].add(corr[0] * 1e-6)

        measure(label, sweep_piece, b.planes)

    def extract_piece(c, planes, aux, slot):
        p, pr, v, ing = solver_ops._plane_extract(
            planes + c * 0, aux, slot, g, g * k)
        return jnp.sum(p) * 1e-9

    measure("extract_ms", extract_piece, jnp.float32(0.0), (b.planes, b.aux, b.slot))

    # --- the step's "rest": fallback substeps, drift metric, plane-run
    #     elementwise (follow + aux bookkeeping), merge ---
    damp = 1.0 - jnp.clip(cfg.damping, 0.0, 1.0)
    follow_c = solver_ops.strength_to_compliance(cfg.follow_strength, sub_dt)
    follow_radius = jnp.sqrt(jnp.maximum(state.batch_radius[i], 0.0))
    table = jnp.concatenate([state.batch_target,
                             follow_radius[:, None]], axis=1)
    rows3 = solver_ops.take_batch_rows(table, batch)
    ftx, fty, ftd = rows3[:, 0], rows3[:, 1], 2.0 * rows3[:, 2]

    def fb_piece(c):
        p = pos + c * 0
        v = vel * damp
        pr = p
        p = p + sub_dt * v
        fdx, fdy = solver_ops._follow_delta(p[:, 0], p[:, 1], inv_mass, act0,
                                            ftx, fty, ftd, follow_c)
        p = p + jnp.stack([fdx, fdy], axis=1)
        return jnp.sum(p[::4096]) * 1e-6

    measure("fb_substep_ms", fb_piece, jnp.float32(0.0))

    def drift_piece(c, planes):
        n_over, n_occ, mxy = solver_ops._plane_drift_over(
            planes + c * 0, planes[:2] * 0.99, g,
            (0.25 * cell_size) ** 2)
        return n_over.astype(jnp.float32) + jnp.sum(mxy)

    measure("drift_metric_ms", drift_piece, jnp.float32(0.0), (b.planes,))

    # one full narrow substep in plane layout (3 sweeps + follow + aux);
    # subtract 3*sweep_ms for the elementwise share
    def plane_run_piece(c, aux):
        pl, ax = solver_ops._plane_run(
            c, aux, damp, follow_c, params, sub_dt,
            jnp.float32(1.0), options, g, k, 1, cohesion=False, ordered=False)
        return pl

    measure("plane_run1_ms", plane_run_piece, b.planes, (b.aux,))

    def merge_piece(c, planes, aux, slot):
        p_pl, prev_pl, v_pl, in_grid = solver_ops._plane_extract(
            planes + c * 0, aux, slot, g, g * k)
        sel = (in_grid & act0)[:, None]
        p = jnp.where(sel, p_pl, pos)
        pr = jnp.where(sel, prev_pl, pos)
        v = jnp.where(sel, v_pl, vel)
        return (jnp.sum(p[::4096]) + jnp.sum(pr[::4096])
                + jnp.sum(v[::4096])) * 1e-6

    measure("merge_ms", merge_piece, jnp.float32(0.0), (b.planes, b.aux, b.slot))

    # --- step (one-sided vs symmetric sweep) ---
    def step(s):
        s2, _ = solver_ops._step_impl(s, cfg2, dt, relax, options,
                                      with_stats=False)
        return s2

    measure("step_ms", step, state)

    import dataclasses
    options_sym = dataclasses.replace(options, sweep_symmetric=True)

    def step_sym(s):
        s2, _ = solver_ops._step_impl(s, cfg2, dt, relax, options_sym,
                                      with_stats=False)
        return s2

    measure("step_sym_ms", step_sym, state)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-5 micro-profile: the pieces INSIDE bin_to_planes at headline shape.

bin_ms measured 22.8 ms at 1M (G=768, K=4) but its known sub-pieces (sorts +
pack gather) only account for ~7.7 ms — this isolates segment_extent, the
pack build/transpose, the placement kernel, the starts computation, and the
halo/pad epilogue, plus the NEW fused-path pieces (component binning, fused
substep pass, component extraction). Prints one JSON line per piece.
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

N = int(os.environ.get("PROF_N", "1000000"))
G = int(os.environ.get("PROF_G", "768"))
K = int(os.environ.get("PROF_K", "4"))
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
    @jax.jit
    def loop(x, *cs):
        def body(c, _):
            return make_step(c, *cs), None
        out, _ = jax.lax.scan(body, x, None, length=chain)
        return out

    out = loop(init, *consts)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])

    def run():
        r = loop(init, *consts)
        jax.device_get(jax.tree.leaves(r)[0].ravel()[0])

    return timed(run, n_trials) / chain


res = {}


def measure(label, make_step, init, consts=()):
    try:
        res[label] = round(chain_ms(make_step, init, consts), 3)
    except Exception as e:  # noqa: BLE001
        res[label] = f"FAILED: {type(e).__name__}: {e}"
    print(json.dumps({label: res[label]}), flush=True)


def main():
    from egg_fluid_simulation_tpu.ops import dense as dense_ops
    from egg_fluid_simulation_tpu.ops import solver as solver_ops
    from egg_fluid_simulation_tpu.ops.grid import segment_extent
    from egg_fluid_simulation_tpu.ops.pallas import place_kernel, sweep_kernel

    rng = np.random.RandomState(0)
    cell = 8.0
    extent = G * cell * 0.95
    pos = jnp.asarray(rng.uniform(16.0, extent, size=(N, 2)), jnp.float32)
    vel = jnp.asarray(rng.uniform(-30, 30, size=(N, 2)), jnp.float32)
    inv_mass = jnp.ones((N,), jnp.float32)
    radius = jnp.full((N,), 2.2, jnp.float32)
    batch = jnp.zeros((N,), jnp.int32)
    act = jnp.ones((N,), bool)
    cell_size = jnp.float32(cell)
    lanes = G * K

    # --- sort pipeline pieces (rotate=True path) ---
    idx = jnp.arange(N, dtype=jnp.int32)
    cxy = dense_ops.torus_cells(pos, cell_size, G)
    cell_id = cxy[:, 1] * G + cxy[:, 0]
    hb = dense_ops.rotate_hash_buckets(G)
    xb = jax.lax.bitcast_convert_type(pos[:, 0], jnp.int32)
    yb = jax.lax.bitcast_convert_type(pos[:, 1], jnp.int32)
    h = xb * jnp.int32(-1640531535) + yb * jnp.int32(-2048144789)
    h = jnp.bitwise_and(jnp.bitwise_xor(h, jnp.right_shift(h, 15)),
                        jnp.int32(hb - 1))
    key = cell_id * jnp.int32(hb) + h
    key_sorted, pidx_sorted = jax.lax.sort_key_val(key, idx)
    cid_sorted = key_sorted // jnp.int32(hb)

    def seg_piece(c):
        rank, cnt = segment_extent(cid_sorted + c.astype(jnp.int32) * 0)
        return jnp.float32(rank[0] + cnt[-1])

    measure("segext_ms", seg_piece, jnp.float32(0.0))

    rank, cnt_sorted = segment_extent(cid_sorted)
    row = cid_sorted // G
    cx = cid_sorted - row * G
    slot_sorted = jnp.where((rank < K) & (cid_sorted < G * G),
                            row * lanes + cx * K + rank, G * lanes)

    def sort3_piece(c):
        _, slot, occ = jax.lax.sort(
            (pidx_sorted + c.astype(jnp.int32) * 0, slot_sorted,
             cnt_sorted.astype(jnp.float32)), num_keys=1)
        return jnp.float32(slot[0] + occ[-1])

    measure("sort3_ms", sort3_piece, jnp.float32(0.0))

    # pack build + transpose + sentinel concat (place_planes prologue)
    pack13 = jnp.stack([pos[:, 0], pos[:, 1], inv_mass, radius,
                        batch.astype(jnp.float32), jnp.zeros((N,)),
                        idx.astype(jnp.float32), jnp.ones((N,))] +
                       [pos[:, 0]] * 5, axis=1)
    pack_sorted = pack13[pidx_sorted]

    def packT_piece(c):
        pack16 = jnp.concatenate(
            [pack_sorted + c * 0,
             jnp.zeros((N, 15 - pack13.shape[1]), jnp.float32),
             slot_sorted.astype(jnp.float32)[:, None]], axis=1)
        return jnp.float32(jnp.sum(pack16.T[:, ::4096]))

    measure("packT_ms", packT_piece, jnp.float32(0.0))

    clamped = jnp.where(cid_sorted < G * G,
                        cid_sorted * K + jnp.minimum(rank, K - 1), G * lanes)

    def place_piece(c):
        out = place_kernel.place_planes(slot_sorted, pack_sorted + c * 0,
                                        G, K, search_key=clamped)
        return jnp.sum(out[:2]) * 1e-9

    measure("place_ms", place_piece, jnp.float32(0.0))

    # --- fused component path pieces ---
    tx = jnp.full((N,), extent / 2, jnp.float32)
    ty = jnp.full((N,), extent / 2, jnp.float32)
    td = jnp.full((N,), 14.0, jnp.float32)
    sub_dt = jnp.float32(1 / 120)

    def bincomp_piece(c):
        xy, prev, stat, follow, slot = solver_ops._bin_components(
            pos + c * 0, vel, inv_mass, radius, batch, act, cell_size,
            tx, ty, td, sub_dt, G, K, use_placement=place_kernel.on_tpu())
        return jnp.sum(xy) * 1e-9 + jnp.sum(slot) * 1e-12

    measure("bin_components_ms", bincomp_piece, jnp.float32(0.0))

    xy, prev, stat, follow, slot = solver_ops._bin_components(
        pos, vel, inv_mass, radius, batch, act, cell_size,
        tx, ty, td, sub_dt, G, K, use_placement=place_kernel.on_tpu())

    from egg_fluid_simulation_tpu.config import (default_white_config,
                                                 device_config_from_dict)
    cfg = device_config_from_dict(default_white_config())
    cc = solver_ops.strength_to_compliance(cfg.collision_strength, sub_dt)
    coc = solver_ops.strength_to_compliance(cfg.cohesion_strength, sub_dt)
    options = solver_ops.SolverOptions(
        engine="dense", budget_mode="off", dense_rebin="step",
        dense_grid_dim=G, dense_slots=K, wide_budget_substeps=0)
    _, params = solver_ops._dense_params(cfg, act, cc, coc, options)
    damp = jnp.float32(0.9)
    follow_c = solver_ops.strength_to_compliance(cfg.follow_strength, sub_dt)

    def fused_int_piece(c, prev, stat, follow):
        out_xy, out_prev = sweep_kernel.substep_pass(
            c, stat, params, (damp, follow_c, jnp.float32(1.0)), K,
            cohesion=True, prev=prev, follow=follow, integrate=True)
        return out_xy

    measure("fused_integrate_pass_ms", fused_int_piece, xy,
            (prev, stat, follow))

    def fused_sweep_piece(c, stat):
        return sweep_kernel.substep_pass(
            c, stat, params, (damp, follow_c, jnp.float32(1.0)), K,
            cohesion=True)

    measure("fused_sweep_pass_ms", fused_sweep_piece, xy, (stat,))

    def fused_substep_piece(c, prev, stat, follow):
        out_xy, out_prev = solver_ops._fused_run(
            c, prev, stat, follow, damp, follow_c, params, sub_dt,
            jnp.float32(1.0), options, G, K, 1, cohesion=True)
        return out_xy

    measure("fused_substep_ms", fused_substep_piece, xy,
            (prev, stat, follow))

    def comp_extract_piece(c, prev, stat, slot):
        p, pr, v, ing = solver_ops._comp_extract(c, prev, stat, slot, G,
                                                 lanes, sub_dt)
        return c + jnp.sum(p[::4096]) * 1e-20

    measure("comp_extract_ms", comp_extract_piece, xy, (prev, stat, slot))

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()

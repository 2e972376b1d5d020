"""Fused component-layout substep path vs the legacy plane path.

The fused Pallas passes (ops/pallas/sweep_kernel.substep_pass) must
reproduce the legacy ``_plane_run`` pipeline to FLOAT ROUNDING: the pair
sweep shares ``_pair_terms`` verbatim and corrections apply in the same
order, but the integration recurrence ``x += damp * (x - prev)`` (velocity
encoded in ``prev``) reassociates the legacy ``x + dt * (v * damp)`` — a
sub-ulp-of-position difference per substep (measured max rel ~5e-7), the
same error class as any sum reordering. These tests run the kernels in
INTERPRET mode on CPU and diff against the planes/aux golden path at
rounding-level tolerances (positions atol 1e-3 px over multiple substeps).

Reference parity anchor: the substep pipeline is
/root/reference/simulation_handler.lua:1821-1932.
"""

import os

import numpy as np
import pytest

os.environ.setdefault("EGG_SWEEP_INTERPRET", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from egg_fluid_simulation_tpu.config import (  # noqa: E402
    default_white_config, device_config_from_dict)
from egg_fluid_simulation_tpu.ops import dense as dense_ops  # noqa: E402
from egg_fluid_simulation_tpu.ops import solver as solver_ops  # noqa: E402


def _scene(n=700, seed=0, spread=160.0):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(20.0, 20.0 + spread, size=(n, 2)).astype(np.float32)
    vel = rng.uniform(-40.0, 40.0, size=(n, 2)).astype(np.float32)
    mass_t = rng.uniform(0.0, 1.0, size=(n,)).astype(np.float32)
    batch = (rng.randint(0, 3, size=(n,))).astype(np.int32)
    act = np.ones((n,), bool)
    act[-7:] = False
    return (jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass_t),
            jnp.asarray(batch), jnp.asarray(act))


def _setup(options, n=700, seed=0):
    pos, vel, mass_t, batch, act = _scene(n, seed)
    cfg = device_config_from_dict(default_white_config())
    sub_dt = jnp.float32((1 / 60) / options.n_substeps)
    damp = 1.0 - jnp.clip(cfg.damping, 0.0, 1.0)
    mass = solver_ops.jnp_mix(cfg.min_mass, cfg.max_mass, mass_t)
    inv_mass = jnp.where(act, 1.0 / jnp.maximum(mass, 1e-12), 0.0)
    radius = jnp.where(act,
                       solver_ops.jnp_mix(cfg.min_radius, cfg.max_radius,
                                          mass_t), 0.0)
    follow_c = solver_ops.strength_to_compliance(cfg.follow_strength, sub_dt)
    collision_c = solver_ops.strength_to_compliance(cfg.collision_strength,
                                                    sub_dt)
    cohesion_c = solver_ops.strength_to_compliance(cfg.cohesion_strength,
                                                   sub_dt)
    cell_size, params = solver_ops._dense_params(cfg, act, collision_c,
                                                 cohesion_c, options)
    tx = jnp.full((n,), 100.0, jnp.float32)
    ty = jnp.full((n,), 100.0, jnp.float32)
    td = jnp.full((n,), 2.0 * np.sqrt(50.0), jnp.float32)
    return dict(pos=pos, vel=vel, mass_t=mass_t, batch=batch, act=act,
                inv_mass=inv_mass, radius=radius, damp=damp,
                follow_c=follow_c, cell_size=cell_size, params=params,
                sub_dt=sub_dt, tx=tx, ty=ty, td=td)


def _legacy_run(s, options, g, k, n_sub, wide=False):
    aux_cols = jnp.stack([s["pos"][:, 0], s["pos"][:, 1],
                          s["vel"][:, 0], s["vel"][:, 1],
                          s["tx"], s["ty"], s["td"]], axis=1)
    binning = dense_ops.bin_to_planes(
        s["pos"], s["inv_mass"], s["radius"], s["batch"], s["act"],
        s["cell_size"], grid_dim=g, slots_per_cell=k, aux_cols=aux_cols,
        rotate=True)
    planes, aux = solver_ops._plane_run(
        binning.planes, binning.aux, s["damp"], s["follow_c"], s["params"],
        s["sub_dt"], jnp.float32(1.0), options, g, k, n_sub,
        cohesion=options.cohesion_mode == "spacing", ordered=False,
        wide=wide)
    return solver_ops._plane_extract(planes, aux, binning.slot, g, g * k,
                                     sub_dt=s["sub_dt"])


def _fused_run(s, options, g, k, n_sub, wide=False):
    xy, prev, stat, follow, slot = solver_ops._bin_components(
        s["pos"], s["vel"], s["inv_mass"], s["radius"], s["batch"],
        s["act"], s["cell_size"], s["tx"], s["ty"], s["td"], s["sub_dt"],
        g, k, use_placement=False)
    xy, prev = solver_ops._fused_run(
        xy, prev, stat, follow, s["damp"], s["follow_c"], s["params"],
        s["sub_dt"], jnp.float32(1.0), options, g, k, n_sub,
        cohesion=options.cohesion_mode == "spacing", wide=wide)
    return solver_ops._comp_extract(xy, prev, stat, slot, g, g * k,
                                    s["sub_dt"])


@pytest.mark.parametrize("n_sub,wide", [(1, False), (2, False), (2, True)])
def test_fused_matches_legacy_plane_run(n_sub, wide):
    options = solver_ops.SolverOptions(
        engine="dense", budget_mode="off", dense_rebin="step",
        dense_grid_dim=32, dense_slots=4, pop_caps=None)
    g, k = 32, 4
    s = _setup(options)
    p_l, prev_l, v_l, in_l = jax.tree.map(np.asarray,
                                          _legacy_run(s, options, g, k,
                                                      n_sub, wide))
    p_f, prev_f, v_f, in_f = jax.tree.map(np.asarray,
                                          _fused_run(s, options, g, k,
                                                     n_sub, wide))
    np.testing.assert_array_equal(in_l, in_f)
    sel = in_l
    np.testing.assert_allclose(p_l[sel], p_f[sel], rtol=0, atol=1e-3)
    np.testing.assert_allclose(prev_l[sel], prev_f[sel], rtol=0, atol=1e-3)
    np.testing.assert_allclose(v_l[sel], v_f[sel], rtol=0, atol=0.2)


def test_fused_matches_legacy_multiblock():
    """Grid larger than one sweep block exercises the wrap DMA splits."""
    options = solver_ops.SolverOptions(
        engine="dense", budget_mode="off", dense_rebin="step",
        dense_grid_dim=64, dense_slots=4, pop_caps=None)
    g, k = 64, 4
    s = _setup(options, n=1500, seed=3)
    p_l, prev_l, v_l, in_l = jax.tree.map(
        np.asarray, _legacy_run(s, options, g, k, 2))
    p_f, prev_f, v_f, in_f = jax.tree.map(
        np.asarray, _fused_run(s, options, g, k, 2))
    np.testing.assert_array_equal(in_l, in_f)
    sel = in_l
    np.testing.assert_allclose(p_l[sel], p_f[sel], rtol=0, atol=1e-3)
    np.testing.assert_allclose(prev_l[sel], prev_f[sel], rtol=0, atol=1e-3)


def test_fused_zero_substep_velocity_identity():
    """prev encodes the input velocity: extraction after 0 substeps must
    return it exactly (the legacy path needed a fallback for this)."""
    options = solver_ops.SolverOptions(
        engine="dense", budget_mode="off", dense_rebin="step",
        dense_grid_dim=32, dense_slots=4, pop_caps=None)
    s = _setup(options)
    g, k = 32, 4
    xy, prev, stat, follow, slot = solver_ops._bin_components(
        s["pos"], s["vel"], s["inv_mass"], s["radius"], s["batch"],
        s["act"], s["cell_size"], s["tx"], s["ty"], s["td"], s["sub_dt"],
        g, k, use_placement=False)
    p, pr, v, in_grid = jax.tree.map(
        np.asarray,
        solver_ops._comp_extract(xy, prev, stat, slot, g, g * k,
                                 s["sub_dt"]))
    vel = np.asarray(s["vel"])
    pos = np.asarray(s["pos"])
    sel = in_grid
    np.testing.assert_array_equal(p[sel], pos[sel])
    np.testing.assert_allclose(v[sel], vel[sel], rtol=1e-5, atol=1e-3)

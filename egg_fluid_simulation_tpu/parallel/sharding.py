"""Multi-chip scale-out: particle-sharded SPMD step over a device mesh.

The reference is single-threaded Lua with no distribution of any kind
(SURVEY.md §2 "Parallelism strategies ... none"). This module is the
TPU-native scaling layer it never had:

- **Data parallel over particles** (the real axis of scale): each device owns
  a contiguous shard of both populations' particle arrays. Per-particle work
  (integration, follow constraint, velocity update) is embarrassingly local.
- **Neighbor search**: each device ``all_gather``s the packed pair fields
  (position, inverse mass, radius, batch) over ICI — one collective per
  collision pass — builds a local cell grid of the *full* particle set, and
  projects constraints only for its own shard. Jacobi projection makes this
  exact: every pair is seen by both endpoints' owners, each applying its own
  half, so no halo bookkeeping is needed.
- **Reductions** (centroid, AABB, max velocity, per-batch sums) finish with
  ``psum``/``pmax``/``pmin`` over the mesh.

This trades bandwidth (an all-gather of ~16 bytes/particle/pass) for zero
rebalancing logic — the right first rung on the scaling ladder. A 2D spatial
decomposition with ``ppermute`` halo exchange (the context-parallel analog,
SURVEY.md §5) drops the collective to O(boundary) and is the planned next
rung.

Everything here also runs on a CPU mesh
(``--xla_force_host_platform_device_count``) for testing, which is how the
driver's ``dryrun_multichip`` validates it without real chips.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DeviceConfig
from ..state import ParticleState, StepStats
from ..utils.mathx import EPS
from ..ops import grid as grid_ops
from ..ops import solver as solver_ops
from ..ops.solver import SolverOptions

__all__ = ["make_mesh", "shard_state", "sharded_step"]

AXIS = "particles"


def make_mesh(devices=None) -> Mesh:
    """1D mesh over all (or the given) devices, particle-sharded axis."""
    devices = devices if devices is not None else jax.devices()
    import numpy as np
    return Mesh(np.asarray(devices), (AXIS,))


def shard_state(state: ParticleState, mesh: Mesh) -> ParticleState:
    """Place particle arrays sharded over the mesh, batch tables replicated."""
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    particle_spec = P(None, AXIS)  # (population, particle, ...)
    return state.replace(
        pos=put(state.pos, particle_spec), prev=put(state.prev, particle_spec),
        vel=put(state.vel, particle_spec), last_pos=put(state.last_pos, particle_spec),
        radius=put(state.radius, particle_spec), mass_t=put(state.mass_t, particle_spec),
        inv_mass=put(state.inv_mass, particle_spec),
        batch_slot=put(state.batch_slot, particle_spec),
        color=put(state.color, particle_spec),
        count=put(state.count, P()), batch_target=put(state.batch_target, P()),
        batch_radius=put(state.batch_radius, P()),
        batch_used=put(state.batch_used, P()),
    )


def _solve_pairs_sharded(pos, inv_mass, radius, batch_slot, active,
                         cfg: DeviceConfig, collision_c, cohesion_c,
                         relaxation, options: SolverOptions):
    """One collision pass: all-gather pair fields, project the local shard.

    Identical math to :func:`...ops.solver.solve_pairs`; the grid covers the
    globally gathered particle set while corrections are computed only for the
    shard this device owns.
    """
    # gather the minimal pair fields of ALL particles over ICI
    g_pos = jax.lax.all_gather(pos, AXIS, axis=0, tiled=True)
    g_w = jax.lax.all_gather(inv_mass, AXIS, axis=0, tiled=True)
    g_r = jax.lax.all_gather(radius, AXIS, axis=0, tiled=True)
    g_b = jax.lax.all_gather(batch_slot, AXIS, axis=0, tiled=True)
    g_act = jax.lax.all_gather(active, AXIS, axis=0, tiled=True)

    max_factor = jnp.maximum(cfg.collision_overlap_factor,
                             cfg.cohesion_interaction_distance_factor)
    cell_size = jnp.maximum(1.0, cfg.max_radius * max_factor)
    grid = grid_ops.build_grid(g_pos, g_act, cell_size,
                               table_size=options.table_size,
                               slots_per_cell=options.slots_per_cell)

    n_local = pos.shape[0]
    shard = jax.lax.axis_index(AXIS) * n_local
    # candidates of the local shard only
    cell_local = jax.lax.dynamic_slice_in_dim(grid.cell_xy, shard, n_local, axis=0)
    local_grid = grid._replace(cell_xy=cell_local)
    cand = grid_ops.neighbor_candidates(local_grid)        # (n_local, 9K)

    self_idx = shard + jnp.arange(n_local, dtype=jnp.int32)[:, None]
    valid = (cand >= 0) & (cand != self_idx) & active[:, None]
    safe = jnp.maximum(cand, 0)

    cell_f = grid.cell_xy.astype(jnp.float32)
    pack = jnp.stack([g_pos[:, 0], g_pos[:, 1], g_w, g_r,
                      g_b.astype(jnp.float32),
                      cell_f[:, 0], cell_f[:, 1]], axis=1)
    g = pack[safe]                                         # (n_local, 9K, 7)
    s_cell = cell_local.astype(jnp.float32)
    valid = (valid
             & (jnp.abs(g[..., 5] - s_cell[:, None, 0]) <= 1.0)
             & (jnp.abs(g[..., 6] - s_cell[:, None, 1]) <= 1.0))

    o_x, o_y = g[..., 0], g[..., 1]
    o_w = jnp.where(valid, g[..., 2], 0.0)
    o_r = jnp.where(valid, g[..., 3], 0.0)

    dx = o_x - pos[:, None, 0]
    dy = o_y - pos[:, None, 1]
    dist2 = dx * dx + dy * dy
    dist = jnp.sqrt(dist2)
    inv_dist = jnp.where(dist > EPS, 1.0 / jnp.maximum(dist, EPS), 0.0)
    w_sum = inv_mass[:, None] + o_w
    ok = valid & (w_sum >= EPS)

    def half_scale(target, compliance, apply):
        viol = dist - target
        divisor = w_sum + compliance
        corr = jnp.where(divisor >= EPS, -viol / jnp.maximum(divisor, EPS), 0.0)
        corr = jnp.clip(corr, -jnp.abs(viol), jnp.abs(viol))
        return jnp.where(apply & ok, corr * inv_mass[:, None], 0.0)

    scale = jnp.zeros_like(dist)
    if options.cohesion_mode == "spacing":
        same = g[..., 4] == batch_slot.astype(jnp.float32)[:, None]
        coh_d = cfg.cohesion_interaction_distance_factor * (radius[:, None] + o_r)
        scale = scale + half_scale(coh_d, cohesion_c,
                                   same & (dist2 <= coh_d * coh_d))
    min_d = cfg.collision_overlap_factor * (radius[:, None] + o_r)
    scale = scale + half_scale(min_d, collision_c, dist2 <= min_d * min_d)

    tx = jnp.sum(-dx * inv_dist * scale, axis=1)
    ty = jnp.sum(-dy * inv_dist * scale, axis=1)
    total = jnp.stack([tx, ty], axis=1)
    return pos + jnp.where(active[:, None], relaxation * total, 0.0)


def _substep_sharded(pos, prev, vel, inv_mass, radius, mass_t, batch_slot,
                     active, cfg, batch_target, follow_radius,
                     sub_dt, relaxation, options):
    follow_c = solver_ops.strength_to_compliance(cfg.follow_strength, sub_dt)
    collision_c = solver_ops.strength_to_compliance(cfg.collision_strength, sub_dt)
    cohesion_c = solver_ops.strength_to_compliance(cfg.cohesion_strength, sub_dt)

    pos, prev, vel, inv_mass, radius = solver_ops.pre_solve(
        pos, prev, vel, mass_t, active, cfg, sub_dt)
    pos = solver_ops.solve_follow(pos, inv_mass, batch_slot, active,
                                  batch_target, follow_radius, follow_c)
    for _ in range(options.n_collision_steps):
        pos = _solve_pairs_sharded(pos, inv_mass, radius, batch_slot, active,
                                   cfg, collision_c, cohesion_c, relaxation,
                                   options)
    vel = jnp.where(active[:, None], (pos - prev) / sub_dt, 0.0)
    return pos, prev, vel, inv_mass, radius


def sharded_step(mesh: Mesh, options: SolverOptions):
    """Build the jitted multi-chip step: state sharded over ``mesh``.

    Returns ``step(state, cfg2, step_delta, relaxation) -> (state, stats)``
    with the same semantics as the single-chip :func:`...ops.solver.step` with
    ``budget_mode="off"`` — the reference's ordered 0.05*n^2 pair cutoff
    (inert above ~360 live particles, exactly the multi-chip regime) would
    need a cross-shard prefix scan and is not implemented here.
    """
    assert options.budget_mode == "off", (
        "sharded_step implements budget_mode='off' semantics; the ordered "
        "budget is inert at multi-chip particle counts")
    def _shard_body(state: ParticleState, cfg2: DeviceConfig,
                    step_delta, relaxation):
        sub_dt = jnp.maximum(step_delta / options.n_substeps, EPS)
        n_local = state.pos.shape[1]
        idx0 = jax.lax.axis_index(AXIS) * n_local
        local_ids = idx0 + jnp.arange(n_local, dtype=jnp.int32)
        active = local_ids[None, :] < state.count[:, None]

        last_pos = state.pos
        follow_radius = jnp.sqrt(jnp.maximum(state.batch_radius, 0.0))

        outs = []
        stats = []
        for i in range(2):
            cfg = jax.tree.map(lambda a: a[i], cfg2)
            carry = (state.pos[i], state.prev[i], state.vel[i],
                     state.inv_mass[i], state.radius[i])
            for _ in range(options.n_substeps):
                carry = _substep_sharded(
                    *carry, state.mass_t[i], state.batch_slot[i], active[i],
                    cfg, state.batch_target, follow_radius[i],
                    sub_dt, relaxation, options)
            pos, prev, vel, inv_mass, radius = carry
            outs.append(carry)

            act = active[i]
            n_act = jnp.maximum(jax.lax.psum(jnp.sum(act), AXIS), 1)
            centroid = jax.lax.psum(
                jnp.sum(jnp.where(act[:, None], pos, 0.0), axis=0), AXIS) / n_act
            max_vel = jnp.sqrt(jax.lax.pmax(
                jnp.max(jnp.where(act, jnp.sum(vel * vel, -1), 0.0)), AXIS))
            big = jnp.float32(3.4e38)
            lo = jax.lax.pmin(jnp.min(
                jnp.where(act[:, None], pos - radius[:, None], big), axis=0), AXIS)
            hi = jax.lax.pmax(jnp.max(
                jnp.where(act[:, None], pos + radius[:, None], -big), axis=0), AXIS)
            mrad = jnp.maximum(jax.lax.pmax(
                jnp.max(jnp.where(act, radius, 0.0)), AXIS), 1.0)
            bsum, bcount = solver_ops.batch_segment_sums(
                pos, act, state.batch_slot[i], state.max_batches)
            bsum = jax.lax.psum(bsum, AXIS)
            bcount = jax.lax.psum(bcount, AXIS)
            stats.append((centroid, max_vel, bsum, bcount, lo, hi, mrad))

        pos, prev, vel, inv_mass, radius = jax.tree.map(
            lambda *x: jnp.stack(x), *outs)
        centroid, max_vel, bsum, bcount, lo, hi, mrad = jax.tree.map(
            lambda *x: jnp.stack(x), *stats)

        n_act_all = jnp.maximum(jax.lax.psum(jnp.sum(active, axis=1), AXIS), 1)
        last_centroid = jax.lax.psum(
            jnp.sum(jnp.where(active[..., None], last_pos, 0.0), axis=1), AXIS
        ) / n_act_all[:, None]

        new_state = state.replace(pos=pos, prev=prev, vel=vel,
                                  inv_mass=inv_mass, radius=radius,
                                  last_pos=last_pos)
        st = StepStats(aabb_min=lo, aabb_max=hi, centroid=centroid,
                       last_centroid=last_centroid, max_radius=mrad,
                       max_velocity=max_vel, batch_pos_sum=bsum,
                       batch_count=bcount)
        return new_state, st

    pspec = P(None, AXIS)
    state_specs = ParticleState(
        pos=pspec, prev=pspec, vel=pspec, last_pos=pspec, radius=pspec,
        mass_t=pspec, inv_mass=pspec, batch_slot=pspec, color=P(None, AXIS, None),
        count=P(), batch_target=P(), batch_radius=P(), batch_used=P())
    # color is (2, N, 4); pos-like arrays are (2, N, 2) — shard dim 1 everywhere
    state_specs = state_specs.replace(
        pos=P(None, AXIS, None), prev=P(None, AXIS, None),
        vel=P(None, AXIS, None), last_pos=P(None, AXIS, None))

    cfg_specs = jax.tree.map(lambda _: P(), DeviceConfig(
        *([0.0] * 15), jnp.zeros(4), jnp.zeros(4)))
    stats_specs = StepStats(
        aabb_min=P(), aabb_max=P(), centroid=P(), last_centroid=P(),
        max_radius=P(), max_velocity=P(), batch_pos_sum=P(), batch_count=P())

    from ._compat import shard_map_compat
    fn = shard_map_compat(
        _shard_body, mesh=mesh,
        in_specs=(state_specs, cfg_specs, P(), P()),
        out_specs=(state_specs, stats_specs))
    return jax.jit(fn)

"""Unit tests: solver pieces against closed-form expectations.

Covers SURVEY.md §4(a): pre-solve integration, compliance conversion, the
follow constraint's dead zone and XPBD magnitude, and two-particle
enforce-distance projection (where Jacobi and the reference's Gauss-Seidel are
exactly equal, since each side's correction is computed from pre-update
positions)."""

import jax.numpy as jnp
import numpy as np
import pytest

from egg_fluid_simulation_tpu.config import (default_white_config,
                                             device_config_from_dict)
from egg_fluid_simulation_tpu.ops import solver as S
from oracle import OracleSim, OracleConfig


def _cfg(**overrides):
    d = default_white_config()
    d.update(overrides)
    return device_config_from_dict(d)


def test_strength_to_compliance():
    # alpha = (1 - s) / dt^2 (reference :1337-1341)
    out = S.strength_to_compliance(jnp.float32(0.8), jnp.float32(0.01))
    assert float(out) == pytest.approx(0.2 / 0.0001, rel=1e-5)
    assert float(S.strength_to_compliance(jnp.float32(1.5), jnp.float32(0.1))) == 0.0


def test_pre_solve_integration_and_damping():
    cfg = _cfg(damping=0.25, min_mass=2.0, max_mass=4.0, min_radius=3.0, max_radius=5.0)
    pos = jnp.asarray([[10.0, 20.0]])
    vel = jnp.asarray([[100.0, -40.0]])
    mass_t = jnp.asarray([0.5])
    active = jnp.asarray([True])
    dt = jnp.float32(0.1)
    new_pos, new_prev, new_vel, inv_mass, radius = S.pre_solve(
        pos, pos, vel, mass_t, active, cfg, dt)
    np.testing.assert_allclose(np.asarray(new_prev), [[10.0, 20.0]])
    np.testing.assert_allclose(np.asarray(new_vel), [[75.0, -30.0]])  # * (1-0.25)
    np.testing.assert_allclose(np.asarray(new_pos), [[10 + 7.5, 20 - 3.0]], rtol=1e-6)
    assert float(inv_mass[0]) == pytest.approx(1 / 3.0)   # mix(2,4,.5)
    assert float(radius[0]) == pytest.approx(4.0)


def test_pre_solve_inactive_untouched():
    cfg = _cfg()
    pos = jnp.asarray([[1.0, 2.0]])
    vel = jnp.asarray([[5.0, 5.0]])
    out = S.pre_solve(pos, pos, vel, jnp.asarray([0.5]),
                      jnp.asarray([False]), cfg, jnp.float32(0.1))
    np.testing.assert_allclose(np.asarray(out[0]), [[1.0, 2.0]])
    np.testing.assert_allclose(np.asarray(out[2]), [[5.0, 5.0]])


def test_follow_dead_zone():
    # inside 2*sqrt(batch_radius) of the target: no pull (reference :1454-1458, :1789-1792)
    batch_radius = 49.0  # -> dead zone 2*7 = 14
    target = jnp.asarray([[0.0, 0.0]])
    frad = jnp.asarray([np.sqrt(batch_radius)], jnp.float32)
    pos = jnp.asarray([[10.0, 0.0]])  # dist 10 < 14
    out = S.solve_follow(pos, jnp.asarray([1.0]), jnp.asarray([0]),
                         jnp.asarray([True]), target, frad, jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(out), [[10.0, 0.0]])


def test_follow_xpbd_magnitude():
    # outside the dead zone: dx = dir * (dist - target_d)/(w + alpha) * w
    target = jnp.asarray([[0.0, 0.0]])
    frad = jnp.asarray([2.0], jnp.float32)  # dead zone 4
    pos = jnp.asarray([[10.0, 0.0]])
    w, alpha = 0.5, 1.5
    out = S.solve_follow(pos, jnp.asarray([w]), jnp.asarray([0]),
                         jnp.asarray([True]), target, frad, jnp.float32(alpha))
    expected = 10.0 - (10.0 - 4.0) / (w + alpha) * w  # moves toward 0
    assert float(out[0, 0]) == pytest.approx(expected, rel=1e-6)
    assert float(out[0, 1]) == 0.0


def test_follow_infinite_mass_pinned():
    target = jnp.asarray([[0.0, 0.0]])
    out = S.solve_follow(jnp.asarray([[50.0, 0.0]]), jnp.asarray([0.0]),
                         jnp.asarray([0]), jnp.asarray([True]), target,
                         jnp.asarray([1.0], jnp.float32), jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(out), [[50.0, 0.0]])


def _two_particle_pair_step(p0, p1, r=4.0, w0=1.0, w1=1.0, strength=0.9975,
                            overlap=2.0, relaxation=1.0):
    cfg = _cfg(collision_strength=strength, collision_overlap_factor=overlap,
               cohesion_interaction_distance_factor=0.0,
               min_radius=r, max_radius=r)
    pos = jnp.asarray([p0, p1], jnp.float32)
    inv_mass = jnp.asarray([w0, w1], jnp.float32)
    radius = jnp.full((2,), r, jnp.float32)
    batch = jnp.zeros((2,), jnp.int32)
    active = jnp.ones((2,), bool)
    sub_dt = jnp.float32(1 / 120)
    coll_c = S.strength_to_compliance(cfg.collision_strength, sub_dt)
    opts = S.SolverOptions(table_size=256, slots_per_cell=8, cohesion_mode="literal")
    out = S.solve_pairs(pos, inv_mass, radius, batch, active, cfg,
                        coll_c, jnp.float32(0.0), jnp.float32(relaxation), opts)
    return np.asarray(out)


def test_two_particle_collision_matches_oracle_enforce_distance():
    # single overlapping pair: Jacobi == Gauss-Seidel exactly
    p0, p1 = [0.0, 0.0], [6.0, 0.0]
    got = _two_particle_pair_step(p0, p1)
    sub_dt = 1 / 120
    compliance = (1 - 0.9975) / sub_dt ** 2
    c = OracleSim._enforce_distance(0.0, 0.0, 6.0, 0.0, 1.0, 1.0,
                                    2.0 * (4.0 + 4.0), compliance)
    np.testing.assert_allclose(got[0], [p0[0] + c[0], p0[1] + c[1]], rtol=1e-5)
    np.testing.assert_allclose(got[1], [p1[0] + c[2], p1[1] + c[3]], rtol=1e-5)


def test_two_particle_collision_respects_mass_ratio():
    got = _two_particle_pair_step([0.0, 0.0], [6.0, 0.0], w0=1.0, w1=3.0)
    # heavier particle (lower inverse mass) moves less: particle 0 has w=1
    d0 = abs(got[0, 0])
    d1 = abs(got[1, 0] - 6.0)
    assert d1 == pytest.approx(3 * d0, rel=1e-4)


def test_non_overlapping_pair_untouched():
    got = _two_particle_pair_step([0.0, 0.0], [100.0, 0.0])
    np.testing.assert_allclose(got, [[0.0, 0.0], [100.0, 0.0]])


def test_coincident_particles_no_nan():
    got = _two_particle_pair_step([5.0, 5.0], [5.0, 5.0])
    assert np.isfinite(got).all()
    # zero direction -> zero correction, the reference normalize convention
    np.testing.assert_allclose(got, [[5.0, 5.0], [5.0, 5.0]])


def test_degenerate_infinite_masses_skipped():
    got = _two_particle_pair_step([0.0, 0.0], [6.0, 0.0], w0=0.0, w1=0.0)
    np.testing.assert_allclose(got, [[0.0, 0.0], [6.0, 0.0]])


def test_correction_clamped_to_violation():
    # with compliance 0 (strength 1) and large overlap, |correction| <= |violation|
    got = _two_particle_pair_step([0.0, 0.0], [0.5, 0.0], strength=1.0)
    # target distance = 16, violation = 15.5; each particle moves 7.75
    assert abs(got[0, 0] - (-7.75)) < 1e-3
    assert abs(got[1, 0] - 8.25) < 1e-3


def test_post_solve_velocity_and_batch_sums():
    pos = jnp.asarray([[2.0, 0.0], [0.0, 4.0], [9.0, 9.0]])
    prev = jnp.zeros((3, 2))
    active = jnp.asarray([True, True, False])
    slot = jnp.asarray([0, 1, 1])
    vel, centroid, max_vel = S.post_solve(pos, prev, active, slot,
                                          jnp.float32(0.5), 4)
    np.testing.assert_allclose(np.asarray(vel[0]), [4.0, 0.0])
    np.testing.assert_allclose(np.asarray(vel[2]), [0.0, 0.0])  # inactive
    np.testing.assert_allclose(np.asarray(centroid), [1.0, 2.0])
    assert float(max_vel) == pytest.approx(8.0)
    bsum, bcount = S.batch_segment_sums(pos, active, slot, 4)
    np.testing.assert_allclose(np.asarray(bsum[0]), [2.0, 0.0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(bsum[1]), [0.0, 4.0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(bcount), [1.0, 1.0, 0.0, 0.0])


def test_take_batch_rows_exact():
    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.uniform(-1e4, 1e4, (256, 3)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 256, (1000,)), jnp.int32)
    got = np.asarray(S.take_batch_rows(table, idx))
    want = np.asarray(table)[np.asarray(idx)]
    # hi/lo bf16 split reconstructs f32 rows to ~1e-7 relative
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-2)


@pytest.mark.slow
def test_wide_episode_budget_and_rearm():
    """The violence gate is per EPISODE: a persistently violent scene runs
    the wide sweep only for ``wide_budget_substeps``, then reverts to the
    narrow fast path; calm substeps re-arm the budget. The episode state
    must PERSIST across handler calls (a per-call reset would restart the
    budget every run_steps)."""
    import egg_fluid_simulation_tpu as E

    opts = E.SolverOptions(engine="dense", budget_mode="off",
                           dense_rebin="step", dense_grid_dim=32,
                           dense_slots=8, use_pallas=False,
                           adaptive_rebin=False,
                           wide_budget_substeps=6, wide_rearm_substeps=4)
    h = E.SimulationHandler(E.default_white_config(),
                            E.default_yolk_config(),
                            capacity=512, max_batches=8, options=opts)
    # dense spawn = violent settle explosion: the gate trips immediately
    h.add(100.0, 100.0, 18.0, 6.0, None, None, 120, 8)
    h.step_once()          # 2 substeps; spawn violence trips the pred gate
    trip0, budget0, _ = h._wide_state[0]
    b_after_1 = int(budget0)
    assert b_after_1 < 6, "violent spawn must consume wide budget"
    h.step_once()
    h.step_once()
    _, budget1, _ = h._wide_state[0]
    # persistent violence keeps draining the SAME episode's budget across
    # calls until it floors at 0 (no mid-episode refill)
    assert int(budget1) <= max(0, b_after_1 - 1)

    # a calm scene must neither trip the gate nor touch the budget ...
    import jax.numpy as jnp
    h2 = E.SimulationHandler(E.default_white_config(),
                             E.default_yolk_config(),
                             capacity=512, max_batches=8, options=opts)
    h2.add(100.0, 100.0, 60.0, 6.0, None, None, 30, 4)   # sparse: no overlap
    h2.run_steps(5)
    trip_c, budget_c, _ = h2._wide_state[0]
    assert not bool(trip_c) and int(budget_c) == 6

    # ... and sustained calm RE-ARMS a drained budget (episode over)
    h2._wide_state = ((jnp.bool_(False), jnp.int32(0), jnp.int32(0)),
                      h2._wide_state[1])
    h2.run_steps(10)     # 20 calm substeps > wide_rearm_substeps
    _, budget_r, _ = h2._wide_state[0]
    assert int(budget_r) == 6, int(budget_r)

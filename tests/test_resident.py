"""Adaptive plane-resident fast-forward (solver.multi_step) vs per-step
binning. Residency must be an implementation detail: when drift forces a
rebin every step the paths are identical, and in settled scenes (the case
residency accelerates) trajectories stay within a fraction of a pixel."""

import numpy as np
import pytest

import jax.numpy as jnp

from egg_fluid_simulation_tpu import (SimulationHandler, SolverOptions,
                                      default_white_config,
                                      default_yolk_config)
from egg_fluid_simulation_tpu.ops import solver as solver_ops

BASE = dict(engine="dense", budget_mode="off", dense_rebin="step",
            dense_grid_dim=32, dense_slots=4, use_pallas=False)


def _handler(adaptive):
    h = SimulationHandler(
        default_white_config(), default_yolk_config(),
        capacity=512, max_batches=8,
        options=SolverOptions(adaptive_rebin=adaptive, **BASE))
    a = h.add(80.0, 60.0, 25.0, 8.0, None, None, 50, 12)
    h.set_target_position(a, 120.0, 90.0)
    h._flush_targets()
    return h


@pytest.mark.slow
def test_resident_fastforward_matches_per_step_binning():
    ha = _handler(adaptive=True)
    hb = _handler(adaptive=False)
    # same seed geometry => identical initial states
    np.testing.assert_array_equal(np.asarray(ha.state.pos),
                                  np.asarray(hb.state.pos))

    ha.run_steps(12)
    hb.run_steps(12)
    act = np.asarray(ha.state.active_mask())
    pa = np.asarray(ha.state.pos)[act]
    pb = np.asarray(hb.state.pos)[act]
    # early steps are violent (spawn overlap) -> rebins fire constantly and
    # the paths track each other; sub-threshold pair-set differences at cell
    # boundaries still amplify chaotically, so the pointwise gate is loose
    # (a fraction of the particle radius) with tight aggregate envelopes
    assert np.abs(pa - pb).max() < 2.5, np.abs(pa - pb).max()
    assert np.abs(pa.mean(0) - pb.mean(0)).max() < 0.25
    va = np.asarray(ha.state.vel)[act]
    assert np.isfinite(va).all()


@pytest.mark.slow
def test_resident_fastforward_settled_scene_subpixel():
    ha = _handler(adaptive=True)
    hb = _handler(adaptive=False)
    # settle both with identical per-step dynamics first
    for h in (ha, hb):
        opts = h._options
        h._options = SolverOptions(adaptive_rebin=False, **BASE)
        h.run_steps(40)
        h._options = opts
    np.testing.assert_array_equal(np.asarray(ha.state.pos),
                                  np.asarray(hb.state.pos))

    ha.run_steps(15)
    hb.run_steps(15)
    # collision dynamics are chaotic: sub-threshold pair-set differences at
    # cell boundaries amplify per particle, so the gate is the same
    # envelope style the oracle fidelity tests use — aggregate statistics,
    # not pointwise trajectories
    act = np.asarray(ha.state.active_mask())
    for i in range(2):
        pa = np.asarray(ha.state.pos[i])[act[i]]
        pb = np.asarray(hb.state.pos[i])[act[i]]
        ca, cb = pa.mean(axis=0), pb.mean(axis=0)
        assert np.abs(ca - cb).max() < 1.0, (i, ca, cb)
        sa = np.linalg.norm(pa - ca, axis=1).mean()
        sb = np.linalg.norm(pb - cb, axis=1).mean()
        assert abs(sa - sb) / max(sb, 1e-6) < 0.05, (i, sa, sb)


@pytest.mark.slow
def test_resident_fastforward_stats_and_counts():
    h = _handler(adaptive=True)
    n0 = h.get_n_particles()
    h.run_steps(10)
    assert h.get_n_particles() == n0
    stats = h.stats
    assert np.isfinite(np.asarray(stats.centroid)).all()
    assert np.isfinite(np.asarray(stats.aabb_min)).all()


@pytest.mark.slow
def test_multi_step_frames_matches_stepwise_rendering():
    """The resident frame loop must produce the same frames an app would get
    from step-then-draw, and the same final state as run_steps."""
    import jax
    from egg_fluid_simulation_tpu.ops import render as render_ops
    from egg_fluid_simulation_tpu.ops import solver as solver_ops

    ha = _handler(adaptive=True)
    hb = _handler(adaptive=True)
    opts2 = tuple(render_ops.auto_render_options(cfg, 256)
                  for cfg in (ha._white_config, ha._yolk_config))
    cfg2 = ha._device_cfg2()
    dt, relax = ha._step_scalars(1 / 60)
    origin = jnp.asarray([0.0, 0.0], jnp.float32)

    sums = []

    def frame_fn(state, stats):
        frame, _, _ = render_ops._render_frame(
            state, stats, cfg2, jnp.float32(1.0), jnp.float32(0.3),
            jnp.float32(0.01), origin, opts2, True, 256, 256)
        return jnp.sum(frame)

    state, acc = solver_ops.multi_step_frames(
        ha.state, cfg2, dt, relax, ha._options, 4, frame_fn)

    # reference: stepwise step + render
    ref_acc = 0.0
    sb = hb.state
    for _ in range(4):
        sb, stats = solver_ops.step(sb, cfg2, dt, relax, hb._options)
        frame, _, _ = render_ops._render_frame(
            sb, stats, cfg2, jnp.float32(1.0), jnp.float32(0.3),
            jnp.float32(0.01), origin, opts2, True, 256, 256)
        ref_acc += float(jnp.sum(frame))

    assert np.isfinite(float(acc))
    # frame sums track within a fraction of a percent (chaotic pair-set
    # differences below the drift threshold move edge pixels slightly)
    assert abs(float(acc) - ref_acc) / max(abs(ref_acc), 1.0) < 5e-3, \
        (float(acc), ref_acc)
    act = np.asarray(ha.state.active_mask())
    pa = np.asarray(state.pos)[act]
    pb = np.asarray(sb.pos)[act]
    assert np.abs(pa.mean(0) - pb.mean(0)).max() < 0.5


def test_static_wide_disable_matches_on_calm_scene():
    """wide_budget_substeps=0 statically removes the violence machinery (no
    lax.cond, no wide kernel in the graph — the bench relies on this for
    cold-compile time); on a scene where the gate never fires the
    trajectories must be bit-identical to the gated graph's narrow path."""
    ha = _handler(adaptive=True)
    hb = _handler(adaptive=True)
    # settle past the spawn transient with IDENTICAL dynamics (gated graph)
    ha.run_steps(30)
    hb.run_steps(30)
    np.testing.assert_array_equal(np.asarray(ha.state.pos),
                                  np.asarray(hb.state.pos))
    # from the settled state: gated vs statically-disabled wide machinery
    hb._options = SolverOptions(adaptive_rebin=True, wide_budget_substeps=0,
                                **BASE)
    hb._wide_state = None
    ha.run_steps(8)
    hb.run_steps(8)
    act = np.asarray(ha.state.active_mask())
    pa = np.asarray(ha.state.pos)[act]
    pb = np.asarray(hb.state.pos)[act]
    np.testing.assert_array_equal(pa, pb)


def _handler_compat(compat, n_substeps=2):
    h = SimulationHandler(
        default_white_config(), default_yolk_config(),
        capacity=512, max_batches=8,
        options=SolverOptions(adaptive_rebin=True, stale_hash_compat=compat,
                              n_substeps=n_substeps, **BASE))
    a = h.add(80.0, 60.0, 25.0, 8.0, None, None, 50, 12)
    h.set_target_position(a, 120.0, 90.0)
    h._flush_targets()
    return h


def test_stale_hash_compat_single_substep_is_identity():
    """With one substep there is no 'substep >= 2', so the compat flag must
    change nothing (reference :1375-1377 clears at step start)."""
    ha = _handler_compat(False, n_substeps=1)
    hb = _handler_compat(True, n_substeps=1)
    ha.run_steps(10)
    hb.run_steps(10)
    np.testing.assert_array_equal(np.asarray(ha.state.pos),
                                  np.asarray(hb.state.pos))


def test_stale_hash_compat_drops_one_pass_on_later_substeps(monkeypatch):
    """stale_hash_compat must run n_collision_steps passes on the step's
    first substep and n-1 on every later one (reference :1905-1912: the
    pair set is not cleared between substeps, suppressing every
    already-adjacent pair of substep >= 2's first pass)."""
    from egg_fluid_simulation_tpu.ops.pallas import sweep_kernel

    def count_passes(compat):
        import jax
        jax.clear_caches()  # force a fresh trace: the spy is trace-time only
        h = _handler_compat(compat)
        calls = []
        orig = solver_ops.jax.lax.fori_loop

        def spy_fori(lo, hi, body, init):
            # collision-pass loops are the only fori_loops whose body is
            # named collision_pass (trace-time introspection)
            if getattr(body, "__name__", "") == "collision_pass":
                calls.append(int(hi) - int(lo))
            return orig(lo, hi, body, init)

        monkeypatch.setattr(solver_ops.jax.lax, "fori_loop", spy_fori)
        try:
            h.step_once()
        finally:
            monkeypatch.setattr(solver_ops.jax.lax, "fori_loop", orig)
        return calls

    without = count_passes(False)
    with_compat = count_passes(True)
    # 2 populations x 2 substeps x 2 wide-cond branches, traced once each
    assert sorted(without) == [3] * 8, without
    assert sorted(with_compat) == [2] * 4 + [3] * 4, with_compat


def test_stale_hash_compat_requires_dense_engine():
    with pytest.raises(AssertionError):
        SolverOptions(engine="gather", stale_hash_compat=True)

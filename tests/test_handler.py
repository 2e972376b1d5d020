"""API tests: SimulationHandler lifecycle, bookkeeping, and driver semantics."""

import math

import jax
import numpy as np
import pytest

from egg_fluid_simulation_tpu import (SimulationHandler, default_white_config,
                                      default_yolk_config, fluid_config, WHITE, YOLK)
from egg_fluid_simulation_tpu.utils.log import SimulationError


def make_handler(**kw):
    kw.setdefault("capacity", 1024)
    kw.setdefault("max_batches", 16)
    return SimulationHandler(default_white_config(), default_yolk_config(), **kw)


def test_constructor_single_config_reused_for_yolk():
    h = SimulationHandler(default_white_config(), capacity=64, max_batches=4)
    assert h.get_yolk_config()["max_mass"] == default_white_config()["max_mass"]


def test_constructor_rejects_non_table():
    with pytest.raises(SimulationError):
        SimulationHandler(3)


def test_add_particle_count_estimate():
    # n = ceil(egg_r^2 / particle_r^2) with particle_r = mix(min,max,0.5)
    h = make_handler()
    h.add(0.0, 0.0, 50.0, 15.0)
    w, y = h.get_n_particles()
    assert w == math.ceil(50.0 ** 2 / 4.0 ** 2)   # 157
    assert y == math.ceil(15.0 ** 2 / 4.0 ** 2)   # 15


def test_add_default_radii():
    # white default = particle_radius * 15, yolk = white * 10/50 (reference :41-47)
    h = make_handler()
    bid = h.add(0.0, 0.0)
    w, y = h.get_n_particles(bid)
    assert w == math.ceil((4.0 * 15) ** 2 / 16.0)
    assert y == math.ceil((4.0 * 15 * 0.2) ** 2 / 16.0)


def test_add_explicit_counts_and_errors():
    h = make_handler()
    bid = h.add(10.0, 10.0, 10.0, 3.0, None, None, 20, 15)
    assert h.get_n_particles(bid) == (20, 15)
    with pytest.raises(SimulationError):
        h.add(0.0, 0.0, -5.0, 3.0)
    with pytest.raises(SimulationError):
        h.add(0.0, 0.0, 10.0, 3.0, None, None, 1, 5)
    with pytest.raises(SimulationError):
        h.add(0.0, 0.0, 10.0, 3.0, [1.0, 0.0, 0.0, float("nan")], None, 20, 15)


def test_add_low_count_warns(capsys):
    h = make_handler()
    h.add(0.0, 0.0, 10.0, 3.0, None, None, 5, 3)
    err = capsys.readouterr().err
    assert "white" in err and "yolk" in err and err.count("[WARNING]") == 2


def test_fibonacci_layout_within_radius():
    h = make_handler()
    h.add(100.0, 200.0, 30.0, 8.0, None, None, 40, 10)
    pos = np.asarray(h.state.pos)
    w = pos[WHITE][:40] - [100.0, 200.0]
    assert np.all(np.hypot(w[:, 0], w[:, 1]) <= 30.0 + 1e-4)
    y = pos[YOLK][:10] - [100.0, 200.0]
    assert np.all(np.hypot(y[:, 0], y[:, 1]) <= 8.0 + 1e-4)


def test_mass_distribution_butterworth():
    # masses follow mix(min,max, butterworth bell): edges light, middle heavy
    h = make_handler()
    h.add(0.0, 0.0, 20.0, 6.0, None, None, 21, 5)
    inv_mass = np.asarray(h.state.inv_mass)[WHITE][:21]
    mass = 1.0 / inv_mass
    assert mass[10] > mass[0] and mass[10] > mass[20]
    cfg = default_white_config()
    assert np.all(mass >= cfg["min_mass"] - 1e-5)
    assert np.all(mass <= cfg["max_mass"] + 1e-5)


def test_remove_compacts_and_remaps():
    h = make_handler()
    a = h.add(0.0, 0.0, 10.0, 3.0, None, None, 20, 15)
    b = h.add(500.0, 0.0, 10.0, 3.0, None, None, 10, 8)
    c = h.add(0.0, 500.0, 10.0, 3.0, None, None, 12, 6)
    h.remove(b)
    assert h.get_n_particles() == (32, 21)
    assert sorted(h.list_ids()) == [a, c]
    # surviving batches keep their particles: centroids unchanged
    ax, ay = h.get_position(a)
    cx, cy = h.get_position(c)
    assert abs(ax) < 2 and abs(ay) < 2
    assert abs(cx) < 2 and abs(cy - 500) < 2
    # counts prefix is dense
    slots = np.asarray(h.state.batch_slot)[WHITE][:32]
    assert len(np.unique(slots)) == 2


def test_remove_unknown_warns(capsys):
    h = make_handler()
    h.remove(99)
    assert "no batch with id" in capsys.readouterr().err


def test_remove_then_add_reuses_capacity():
    h = make_handler(capacity=64, max_batches=2)
    for _ in range(5):
        bid = h.add(0.0, 0.0, 10.0, 3.0, None, None, 30, 20)
        h.remove(bid)
    bid = h.add(0.0, 0.0, 10.0, 3.0, None, None, 30, 20)
    assert h.get_n_particles(bid) == (30, 20)


def test_capacity_exhaustion_fatal():
    h = make_handler(capacity=32, max_batches=4)
    with pytest.raises(SimulationError):
        h.add(0.0, 0.0, 10.0, 3.0, None, None, 40, 5)


def test_target_roundtrip_and_unknown():
    h = make_handler()
    bid = h.add(1.0, 2.0, 10.0, 3.0, None, None, 10, 5)
    assert h.get_target_position(bid) == (1.0, 2.0)
    h.set_target_position(bid, 7.0, 8.0)
    assert h.get_target_position(bid) == (7.0, 8.0)
    with pytest.raises(SimulationError):
        h.get_target_position(1234)
    h.set_target_position(1234, 0.0, 0.0)  # warns, not fatal


def test_update_validation():
    h = make_handler()
    h.add(0.0, 0.0, 10.0, 3.0, None, None, 10, 5)
    with pytest.raises(SimulationError):
        h.update(0.016, -1.0)
    with pytest.raises(SimulationError):
        h.update(0.016, 1 / 60, 0)
    with pytest.raises(SimulationError):
        h.update(0.016, 1 / 60, 2, 0)


def test_update_fixed_timestep_accumulator():
    h = make_handler()
    h.add(0.0, 0.0, 10.0, 3.0, None, None, 10, 5)
    # delta below the step: no step runs, alpha accumulates
    h.update(0.01, 1 / 60)
    assert h.interpolation_alpha == pytest.approx(0.01 / (1 / 60))
    h.update(0.01, 1 / 60)  # total 0.02 > 1/60: one step, remainder ~0.00333
    assert h.interpolation_alpha == pytest.approx((0.02 - 1 / 60) / (1 / 60), abs=1e-5)


def test_update_death_spiral_cap():
    h = make_handler()
    h.add(0.0, 0.0, 10.0, 3.0, None, None, 10, 5)
    h.update(10.0, 1 / 60)  # 600 steps owed; cap = max(4, 4) -> caps and resets
    assert h.interpolation_alpha == 0.0


def test_float_substep_counts_ceiled():
    h = make_handler()
    h.add(0.0, 0.0, 10.0, 3.0, None, None, 10, 5)
    h.update(1 / 30, 1 / 60, 1.5, 2.2)  # -> 2 substeps, 3 collision steps


def test_set_colors():
    h = make_handler()
    h._use_particle_color = True
    bid = h.add(0.0, 0.0, 10.0, 3.0, None, None, 10, 5)
    h.set_yolk_color(bid, 0.2, 0.4, 0.6, 0.8)
    col = np.asarray(h.state.color)[YOLK][:5]
    np.testing.assert_allclose(col, np.tile([0.2, 0.4, 0.6, 0.8], (5, 1)), rtol=1e-6)
    h.set_white_color(bid, 1.5, -0.5, 0.5)  # clamped, default alpha 1
    col = np.asarray(h.state.color)[WHITE][:10]
    np.testing.assert_allclose(col, np.tile([1.0, 0.0, 0.5, 1.0], (10, 1)), rtol=1e-6)
    h.set_white_color(777, 1.0, 1.0, 1.0)  # unknown id warns, not fatal


def test_get_position_mixes_white_and_yolk():
    h = make_handler()
    bid = h.add(50.0, 60.0, 10.0, 3.0, None, None, 10, 5)
    x, y = h.get_position(bid)
    assert abs(x - 50.0) < 2.0 and abs(y - 60.0) < 2.0
    with pytest.raises(SimulationError):
        h.get_position(123)


def test_config_hot_reload_rederives_mass_radius():
    h = make_handler()
    h.add(0.0, 0.0, 20.0, 6.0, None, None, 20, 10)
    h.set_white_config({"min_radius": 8.0, "max_radius": 8.0})
    h.update(1 / 30)  # run at least one step
    radius = np.asarray(h.state.radius)[WHITE][:20]
    np.testing.assert_allclose(radius, 8.0, rtol=1e-6)


def test_get_config_is_isolated_copy():
    h = make_handler()
    cfg = h.get_white_config()
    cfg["damping"] = 0.999
    cfg["color"][0] = 0.0
    assert h.get_white_config()["damping"] == 0.1
    assert h.get_white_config()["color"][0] == pytest.approx(0.961)


def test_fluid_config_swap_runs():
    # the demo's config hot-swap path (reference test.lua:110-123)
    h = make_handler()
    h.add(0.0, 0.0, 20.0, 6.0, None, None, 30, 10)
    h.set_white_config(fluid_config())
    h.set_yolk_config(fluid_config())
    for _ in range(5):
        h.update(1 / 60)
    assert np.isfinite(np.asarray(h.state.pos)[:, :30]).all()


def test_simulation_stays_finite_with_motion():
    h = make_handler()
    bid = h.add(0.0, 0.0, 30.0, 9.0, None, None, 60, 15)
    for i in range(30):
        h.set_target_position(bid, 10.0 * i, 5.0 * i)
        h.update(1 / 60)
    pos = np.asarray(h.state.pos)
    assert np.isfinite(pos[WHITE][:60]).all()
    x, y = h.get_position(bid)
    assert 100 < x < 400 and 50 < y < 200  # moved toward the dragged target


def test_warmup_has_no_side_effects():
    h = make_handler(canvas_size=128)
    h.add(10.0, 10.0, 10.0, 3.0, None, None, 10, 5)
    pos_before = np.asarray(h.state.pos).copy()
    h.warmup(viewport=(0.0, 0.0, 128, 128))
    np.testing.assert_array_equal(np.asarray(h.state.pos), pos_before)
    assert h.interpolation_alpha == 0.0


@pytest.mark.slow
def test_update_kwarg_alternation_compiles_once_per_variant():
    """update(n_substeps=..., n_collision_steps=...) swaps static
    SolverOptions; repeated ALTERNATION must hit the jit cache, not retrace
    (each distinct variant compiles exactly once — the reference never
    recompiles, so the analog cost must be one-time)."""
    from egg_fluid_simulation_tpu.ops import solver as solver_ops
    from egg_fluid_simulation_tpu import SolverOptions as _SolverOptions

    h = SimulationHandler(default_white_config(), default_yolk_config(),
                          capacity=256, max_batches=4,
                          options=_SolverOptions(engine="gather",
                                                 table_size=1024,
                                                 slots_per_cell=8))
    h.add(10.0, 10.0, 15.0, 5.0, None, None, 20, 5)
    h.update(1 / 30)                      # default 2x3
    h.update(1 / 30, n_substeps=3)        # variant compiles once
    base = solver_ops.step._cache_size()
    for _ in range(4):
        h.update(1 / 30)
        h.update(1 / 30, n_substeps=3)
    assert solver_ops.step._cache_size() == base


def test_run_steps_gather_engine_threads_wide_state():
    """run_steps on a NON-dense engine must not break the multi_step fori
    carry: engines without wide-sweep machinery pass the violence-episode
    state through untouched (a None output changed the carry pytree and
    crashed any gather-engine run_steps(n >= 2))."""
    from egg_fluid_simulation_tpu import SolverOptions as _SolverOptions

    h = SimulationHandler(default_white_config(), default_yolk_config(),
                          capacity=256, max_batches=4,
                          options=_SolverOptions(engine="gather",
                                                 table_size=1024,
                                                 slots_per_cell=8))
    h.add(10.0, 10.0, 15.0, 5.0, None, None, 20, 5)
    ws0 = h._wide_or_init()
    h.run_steps(3)
    assert np.isfinite(np.asarray(h.state.pos)).all()
    # pass-through: same structure, same budget (gather never spends it)
    ws1 = h._wide_state
    assert jax.tree.structure(ws1) == jax.tree.structure(ws0)
    assert int(ws1[0][1]) == int(ws0[0][1])


def test_add_many_matches_sequential_add():
    """Bulk add_many is bit-identical to the same adds issued one at a time
    (one device upload instead of ~12 eager ops per batch)."""
    specs = [dict(x=50.0 + 90 * b, y=60.0, white_radius=30.0,
                  yolk_radius=9.0, white_n_particles=40, yolk_n_particles=6)
             for b in range(3)]
    ha = make_handler()
    ids_a = [ha.add(**s) for s in specs]
    hb = make_handler()
    ids_b = hb.add_many(specs)
    assert ids_a == ids_b
    assert ha.get_n_particles() == hb.get_n_particles()
    assert ha.list_ids() == hb.list_ids()
    for f in ("pos", "prev", "last_pos", "vel", "radius", "mass_t",
              "inv_mass", "batch_slot", "color", "batch_target",
              "batch_radius", "count"):
        np.testing.assert_array_equal(np.asarray(getattr(ha.state, f)),
                                      np.asarray(getattr(hb.state, f)), err_msg=f)
    # both step identically afterwards
    ha.run_steps(3)
    hb.run_steps(3)
    np.testing.assert_array_equal(np.asarray(ha.state.pos),
                                  np.asarray(hb.state.pos))


def test_add_many_after_remove_zeroes_stale_rows():
    """Rows re-used after a remove() compaction must not leak stale velocity
    into freshly spawned particles."""
    h = make_handler()
    a = h.add(100.0, 100.0, 30.0, 9.0, None, None, 40, 6)
    h.add(300.0, 100.0, 30.0, 9.0, None, None, 40, 6)
    h.run_steps(5)  # give everything nonzero velocity
    h.remove(a)
    h.add_many([dict(x=500.0, y=100.0, white_radius=30.0, yolk_radius=9.0,
                     white_n_particles=40, yolk_n_particles=6)])
    n_w = h.get_n_particles()[0]
    vel = np.asarray(h.state.vel[WHITE, n_w - 40:n_w])
    np.testing.assert_array_equal(vel, 0.0)


def test_add_many_capacity_error_is_atomic():
    h = make_handler()
    with pytest.raises(SimulationError):
        h.add_many([dict(x=0.0, y=0.0, white_radius=30.0, yolk_radius=9.0,
                         white_n_particles=600, yolk_n_particles=6),
                    dict(x=90.0, y=0.0, white_radius=30.0, yolk_radius=9.0,
                         white_n_particles=600, yolk_n_particles=6)])
    # nothing was committed
    assert h.get_n_particles() == (0, 0)
    assert h.list_ids() == []

"""Golden-trajectory fidelity tests vs the sequential NumPy oracle.

Per SURVEY.md §4(b)/§5.3: the TPU solver is Jacobi where the reference is
Gauss-Seidel, so multi-particle scenes are gated on trajectory *envelopes*
(centroid paths, spread statistics, steady states), not bitwise positions.
Two-particle scenes ARE exact (single pair -> identical math) and are checked
tightly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from egg_fluid_simulation_tpu import (SimulationHandler, SolverOptions,
                                      default_white_config, default_yolk_config,
                                      WHITE)
from egg_fluid_simulation_tpu.config import stack_device_configs, device_config_from_dict
from egg_fluid_simulation_tpu.ops import solver as S
from egg_fluid_simulation_tpu.state import zeros_state

from oracle import OracleSim, OracleConfig


def build_handler_and_oracle(x, y, white_r, yolk_r, n_white, n_yolk, **cfg_over):
    wc, yc = default_white_config(), default_yolk_config()
    wc.update(cfg_over)
    yc.update(cfg_over)
    h = SimulationHandler(wc, yc, capacity=1024, max_batches=8,
                          options=SolverOptions(table_size=4096, slots_per_cell=32,
                                                cohesion_mode="literal"))
    bid = h.add(x, y, white_r, yolk_r, None, None, n_white, n_yolk)

    ow = OracleConfig(**{k: wc[k] for k in OracleConfig.__dataclass_fields__})
    oy = OracleConfig(**{k: yc[k] for k in OracleConfig.__dataclass_fields__})
    o = OracleSim(ow, oy)
    obid = o.add_batch(x, y, white_r, yolk_r, n_white, n_yolk)
    return h, bid, o, obid


def test_initial_layout_identical():
    h, _, o, _ = build_handler_and_oracle(100.0, 50.0, 30.0, 9.0, 40, 10)
    np.testing.assert_allclose(np.asarray(h.state.pos)[WHITE][:40],
                               o.positions("white"), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(h.state.inv_mass)[WHITE][:40],
                               [p for p in o.white.inv_mass], rtol=1e-5)


def test_single_particle_pair_trajectory_exact():
    """Two overlapping white particles: Jacobi == Gauss-Seidel, per-step exact."""
    h, bid, o, obid = build_handler_and_oracle(0.0, 0.0, 10.0, 3.0, 2, 2)
    for step in range(30):
        h.step_once(1 / 60)
        o.step(1 / 60)
        got = np.asarray(h.state.pos)[WHITE][:2]
        want = o.positions("white")
        # identical math; tolerance grows with step count because the solver
        # runs f32 where the oracle is f64 and the pair oscillates
        np.testing.assert_allclose(got, want, atol=0.02 + 0.01 * step,
                                   err_msg=f"diverged at step {step}")


def test_free_particle_damped_drift_exact():
    """A particle with initial velocity, no neighbors: closed-form damping decay."""
    h, bid, o, obid = build_handler_and_oracle(0.0, 0.0, 10.0, 3.0, 2, 2)
    # separate the two whites far apart and give one velocity
    st = h.state
    new_pos = st.pos.at[WHITE, 1].set(jnp.asarray([10000.0, 10000.0]))
    h._state = st.replace(pos=new_pos, prev=st.prev.at[WHITE, 1].set(
        jnp.asarray([10000.0, 10000.0])),
        vel=st.vel.at[WHITE, 0].set(jnp.asarray([120.0, 0.0])))
    # keep it outside the follow dead zone? target at origin, particle 0 at ~0:
    # within dead zone 2*sqrt(10) ~ 6.3 -> no follow force. good.
    o.white.pos[1] = [10000.0, 10000.0]
    o.white.prev[1] = [10000.0, 10000.0]
    o.white.vel[0] = [120.0, 0.0]
    o.yolk.pos = [[5e5, 5e5], [6e5, 6e5]]
    o.yolk.prev = [[5e5, 5e5], [6e5, 6e5]]
    st = h.state
    h._state = st.replace(
        pos=st.pos.at[1, :2].set(jnp.asarray([[5e5, 5e5], [6e5, 6e5]])),
        prev=st.prev.at[1, :2].set(jnp.asarray([[5e5, 5e5], [6e5, 6e5]])))

    for _ in range(10):
        h.step_once(1 / 60)
        o.step(1 / 60)
    np.testing.assert_allclose(np.asarray(h.state.pos)[WHITE][0],
                               o.positions("white")[0], rtol=1e-4, atol=0.01)


@pytest.mark.slow
@pytest.mark.parametrize("damping", [0.05, 0.1, 0.3])
def test_batch_centroid_trajectory_envelope(damping):
    """One 30-particle egg snapping to a moved target: centroid paths agree."""
    h, bid, o, obid = build_handler_and_oracle(0.0, 0.0, 20.0, 6.0, 30, 8,
                                               damping=damping)
    h.set_target_position(bid, 120.0, 80.0)
    o.targets[obid] = (120.0, 80.0)
    cent_h, cent_o = [], []
    for _ in range(90):
        h.step_once(1 / 60)
        o.step(1 / 60)
        n = 30
        cent_h.append(np.asarray(h.state.pos)[WHITE][:n].mean(axis=0))
        cent_o.append(o.centroid("white"))
    cent_h, cent_o = np.asarray(cent_h), np.asarray(cent_o)
    err = np.hypot(*(cent_h - cent_o).T)
    # envelope: centroids within a few px of each other along the whole path
    assert err.max() < 6.0, f"max centroid divergence {err.max():.2f}px"
    assert err[-1] < 3.0, f"steady-state divergence {err[-1]:.2f}px"


def test_steady_state_spread_envelope():
    """Blob radius (mean distance to centroid) settles to the same value."""
    h, bid, o, obid = build_handler_and_oracle(0.0, 0.0, 25.0, 8.0, 40, 10)
    for _ in range(120):
        h.step_once(1 / 60)
        o.step(1 / 60)

    def spread(p):
        c = p.mean(axis=0)
        return np.hypot(*(p - c).T).mean()

    s_h = spread(np.asarray(h.state.pos)[WHITE][:40])
    s_o = spread(o.positions("white"))
    assert abs(s_h - s_o) / s_o < 0.15, f"spread {s_h:.2f} vs oracle {s_o:.2f}"


@pytest.mark.parametrize("key,value", [
    ("collision_strength", 0.5),
    ("cohesion_strength", 0.999),
    ("collision_overlap_factor", 1.0),
])
def test_parameter_sweep_envelope(key, value):
    """Per-parameter fidelity (BASELINE.md): envelopes hold across settings."""
    h, bid, o, obid = build_handler_and_oracle(0.0, 0.0, 20.0, 6.0, 25, 6,
                                               **{key: value})
    for _ in range(60):
        h.step_once(1 / 60)
        o.step(1 / 60)
    p_h = np.asarray(h.state.pos)[WHITE][:25]
    p_o = o.positions("white")
    c_err = np.hypot(*(p_h.mean(0) - p_o.mean(0)))
    assert c_err < 6.0

    def spread(p):
        c = p.mean(axis=0)
        return np.hypot(*(p - c).T).mean()

    assert abs(spread(p_h) - spread(p_o)) / max(spread(p_o), 1.0) < 0.25


def test_mass_distribution_wide_gap_stable():
    """Parameter-extremes scenario (BASELINE config #4): wide mass gap stays finite."""
    h, bid, o, obid = build_handler_and_oracle(
        0.0, 0.0, 20.0, 6.0, 30, 8,
        min_mass=1 / 20, max_mass=1 - 1 / 20, damping=0.05)
    h.set_target_position(bid, 60.0, 0.0)
    for _ in range(120):
        h.step_once(1 / 60)
    p = np.asarray(h.state.pos)[WHITE][:30]
    assert np.isfinite(p).all()
    assert np.hypot(*(p.mean(0) - [60.0, 0.0])) < 30.0

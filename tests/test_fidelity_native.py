"""Large-scale fidelity gates using the native oracle (SURVEY.md §4b at scale).

The Python oracle caps envelope tests at ~50 particles; the C++ oracle runs
the same exact semantics ~100x faster, so these tests gate the TPU solver on
500-particle scenes — beyond the reference's documented per-batch stability
envelope (15-200, README.md:235) and into the regime where the ordered
collision budget saturates.
"""

import numpy as np
import pytest

from egg_fluid_simulation_tpu import (SimulationHandler, SolverOptions,
                                      default_white_config, default_yolk_config,
                                      WHITE)
from egg_fluid_simulation_tpu.native import NativeOracle, available

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not available(), reason="no C++ toolchain")]


def _pair(n_white=500, engine="gather", **cfg_over):
    wc, yc = default_white_config(), default_yolk_config()
    wc.update(cfg_over)
    h = SimulationHandler(wc, yc, capacity=2048, max_batches=8,
                          options=SolverOptions(
                              engine=engine, table_size=8192, slots_per_cell=32,
                              dense_grid_dim=64, dense_slots=8,
                              cohesion_mode="literal"))
    bid = h.add(0.0, 0.0, 90.0, 25.0, None, None, n_white, 20)

    native = NativeOracle({k: wc[k] for k in (
        "damping", "follow_strength", "cohesion_strength",
        "cohesion_interaction_distance_factor", "collision_strength",
        "collision_overlap_factor", "min_mass", "max_mass",
        "min_radius", "max_radius")})
    slot = h._batches[bid]["slot"]
    native.add_particles(np.asarray(h.state.pos)[WHITE][:n_white],
                         np.asarray(h.state.mass_t)[WHITE][:n_white],
                         batch_id=slot, batch_radius=90.0, target=(0.0, 0.0))
    return h, bid, native


def _spread(p):
    c = p.mean(axis=0)
    return np.hypot(*(p - c).T).mean()


@pytest.mark.parametrize("engine", ["gather", "dense"])
def test_500_particle_settling_envelope(engine):
    h, bid, native = _pair(engine=engine)
    for _ in range(60):
        h.step_once(1 / 60)
        native.step(1 / 60)
    got = np.asarray(h.state.pos)[WHITE][:500]
    want = native.positions
    c_err = np.hypot(*(got.mean(0) - want.mean(0)))
    assert c_err < 5.0, f"centroid err {c_err:.2f}px"
    s_got, s_want = _spread(got), _spread(want)
    assert abs(s_got - s_want) / s_want < 0.2, f"spread {s_got:.1f} vs {s_want:.1f}"


def test_500_particle_dragged_envelope():
    h, bid, native = _pair()
    h.set_target_position(bid, 300.0, 150.0)
    native.set_target(h._batches[bid]["slot"], 300.0, 150.0)
    errs = []
    for _ in range(90):
        h.step_once(1 / 60)
        native.step(1 / 60)
        got = np.asarray(h.state.pos)[WHITE][:500].mean(0)
        want = native.positions.mean(0)
        errs.append(np.hypot(*(got - want)))
    assert max(errs) < 10.0, f"max centroid divergence {max(errs):.2f}px"
    assert errs[-1] < 5.0


def test_dense_overlap_stress_envelope():
    """BASELINE config #3 analog: batches forced into the same region."""
    wc, yc = default_white_config(), default_yolk_config()
    h = SimulationHandler(wc, yc, capacity=2048, max_batches=8,
                          options=SolverOptions(engine="gather", table_size=8192,
                                                slots_per_cell=64,
                                                cohesion_mode="literal"))
    ids = [h.add(20.0 * i, 0.0, 40.0, 12.0, None, None, 100, 10)
           for i in range(4)]
    for bid in ids:
        h.set_target_position(bid, 0.0, 0.0)

    native = NativeOracle({k: wc[k] for k in (
        "damping", "follow_strength", "cohesion_strength",
        "cohesion_interaction_distance_factor", "collision_strength",
        "collision_overlap_factor", "min_mass", "max_mass",
        "min_radius", "max_radius")})
    for bid in ids:
        slot = h._batches[bid]["slot"]
        lo = sum(h._batches[b]["n_white"] for b in ids if b < bid)
        native.add_particles(np.asarray(h.state.pos)[WHITE][lo:lo + 100],
                             np.asarray(h.state.mass_t)[WHITE][lo:lo + 100],
                             batch_id=slot, batch_radius=40.0, target=(0.0, 0.0))
    for _ in range(60):
        h.step_once(1 / 60)
        native.step(1 / 60)
    got = np.asarray(h.state.pos)[WHITE][:400]
    want = native.positions
    assert np.isfinite(got).all()
    c_err = np.hypot(*(got.mean(0) - want.mean(0)))
    assert c_err < 8.0
    s_got, s_want = _spread(got), _spread(want)
    assert abs(s_got - s_want) / s_want < 0.3, f"spread {s_got:.1f} vs {s_want:.1f}"

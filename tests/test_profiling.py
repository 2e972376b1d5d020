"""Profiling/observability utilities tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from egg_fluid_simulation_tpu import (SimulationHandler, default_white_config,
                                      default_yolk_config)
from egg_fluid_simulation_tpu.utils import profiling
from egg_fluid_simulation_tpu.utils.log import SimulationError


def test_step_timer_window_and_summary():
    t = profiling.StepTimer(window=5)
    for _ in range(8):
        with t.phase("step"):
            pass
    s = t.summary()["step"]
    assert s["n"] == 5
    assert s["p50_ms"] >= 0.0
    assert t.frame_usage_pct("step") >= 0.0


def test_validate_state_clean():
    h = SimulationHandler(default_white_config(), default_yolk_config(),
                          capacity=512, max_batches=4)
    h.add(0.0, 0.0, 10.0, 3.0, None, None, 10, 5)
    h.update(1 / 60)
    assert profiling.validate_state(h)


def test_validate_state_detects_nan(capsys):
    h = SimulationHandler(default_white_config(), default_yolk_config(),
                          capacity=512, max_batches=4)
    h.add(0.0, 0.0, 10.0, 3.0, None, None, 10, 5)
    h._state = h._state.replace(
        pos=h._state.pos.at[0, 0, 0].set(jnp.nan))
    with pytest.raises(SimulationError):
        profiling.validate_state(h)
    assert not profiling.validate_state(h, fatal=False)
    assert "white" in capsys.readouterr().err

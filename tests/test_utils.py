"""Unit tests: math helpers, logging semantics, config validation."""

import numpy as np
import pytest

from egg_fluid_simulation_tpu.utils import log, mathx
from egg_fluid_simulation_tpu import config as cfg_mod


def test_clamp_mix_wrap():
    assert mathx.clamp(5, 0, 1) == 1
    assert mathx.clamp(-5, 0, 1) == 0
    assert mathx.mix(0.0, 10.0, 0.25) == 2.5
    assert mathx.mix2(0, 0, 2, 4, 0.5) == (1.0, 2.0)
    assert mathx.wrap(5, 4) == 1
    assert mathx.wrap(4, 4) == 4
    assert mathx.wrap(0, 0) == 0


def test_normalize_zero_vector_convention():
    # the reference returns (0, 0) for |v| < eps (math.lua:54-61)
    assert mathx.normalize2(0.0, 0.0) == (0.0, 0.0)
    x, y = mathx.normalize2(3.0, 4.0)
    assert abs(x - 0.6) < 1e-12 and abs(y - 0.8) < 1e-12


def test_jnp_normalize_matches():
    import jax.numpy as jnp
    v = jnp.asarray([[3.0, 4.0], [0.0, 0.0], [1e-12, 0.0]])
    out, mag = mathx.jnp_normalize2(v)
    np.testing.assert_allclose(np.asarray(out[0]), [0.6, 0.8], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), [0.0, 0.0])
    np.testing.assert_allclose(np.asarray(out[2]), [0.0, 0.0])  # below EPS


def test_log_error_raises_with_callsite():
    with pytest.raises(log.SimulationError) as ei:
        log.error("boom ", 42)
    msg = str(ei.value)
    assert msg.startswith("[ERROR]") and "boom 42" in msg and "test_utils.py" in msg


def test_log_warning_to_stderr(capsys):
    log.warning("careful ", "now")
    err = capsys.readouterr().err
    assert "[WARNING]" in err and "careful now" in err


def test_assert_types():
    assert log.assert_types(1, "number", {"a": 1}, "table", [1], "table")
    with pytest.raises(log.SimulationError):
        log.assert_types("x", "number")
    with pytest.raises(log.SimulationError):
        log.assert_types(True, "number")  # bools are not numbers in the reference
    with pytest.raises(log.SimulationError):
        log.assert_types(1, "number", 2)  # odd arg count


def test_config_defaults_match_reference_values():
    w = cfg_mod.default_white_config()
    y = cfg_mod.default_yolk_config()
    # spot-check against simulation_handler_default_config.lua
    assert w["cohesion_strength"] == 1 - 0.2
    assert w["collision_strength"] == 1 - 0.0025
    assert w["highlight_strength"] == 0.0 and w["shadow_strength"] == 1.0
    assert y["highlight_strength"] == 1.0 and y["shadow_strength"] == 0.0
    assert y["max_mass"] == 1.35 and w["max_mass"] == 1.8
    assert w["texture_scale"] == 12.0 and w["motion_blur"] == 0.0003
    assert set(w) == set(cfg_mod.CONFIG_SCHEMA)
    assert set(y) == set(cfg_mod.CONFIG_SCHEMA)


def test_config_unknown_key_warns_and_ignores(capsys):
    target = cfg_mod.default_white_config()
    cfg_mod.load_config(target, {"nonsense": 1.0}, True)
    assert "unrecognized config key" in capsys.readouterr().err
    assert "nonsense" not in target


def test_config_clamps_out_of_bounds_with_warning(capsys):
    target = cfg_mod.default_white_config()
    cfg_mod.load_config(target, {"damping": 2.0}, True)
    assert target["damping"] == 1.0
    cfg_mod.load_config(target, {"damping": -0.5}, True)
    assert target["damping"] == 0.0
    assert capsys.readouterr().err.count("[WARNING]") == 2


def test_config_nan_ignored_with_warning(capsys):
    target = cfg_mod.default_white_config()
    before = target["damping"]
    cfg_mod.load_config(target, {"damping": float("nan")}, True)
    assert target["damping"] == before
    assert "NaN" in capsys.readouterr().err


def test_config_wrong_type_fatal():
    target = cfg_mod.default_white_config()
    with pytest.raises(log.SimulationError):
        cfg_mod.load_config(target, {"damping": "high"}, True)
    with pytest.raises(log.SimulationError):
        cfg_mod.load_config(target, {"color": [1, 0, 0]}, True)  # 3 components
    with pytest.raises(log.SimulationError):
        cfg_mod.load_config(target, {"color": [1, 0, 0, "x"]}, True)


def test_config_color_clamped(capsys):
    target = cfg_mod.default_white_config()
    cfg_mod.load_config(target, {"color": [2.0, -1.0, 0.5, 1.0]}, True)
    assert target["color"] == [1.0, 0.0, 0.5, 1.0]
    assert "[WARNING]" in capsys.readouterr().err


def test_device_config_roundtrip():
    w = cfg_mod.default_white_config()
    dc = cfg_mod.device_config_from_dict(w)
    assert float(dc.damping) == pytest.approx(0.1)
    assert np.asarray(dc.color).shape == (4,)
    stacked = cfg_mod.stack_device_configs(dc, cfg_mod.device_config_from_dict(
        cfg_mod.default_yolk_config()))
    assert np.asarray(stacked.damping).shape == (2,)
    assert np.asarray(stacked.color).shape == (2, 4)

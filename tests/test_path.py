"""Path class tests (reference path.lua semantics)."""

import numpy as np
import pytest

from egg_fluid_simulation_tpu import Path
from egg_fluid_simulation_tpu.utils.log import SimulationError


def test_at_endpoints_and_midpoint():
    p = Path([0.0, 0.0, 10.0, 0.0])
    assert p.at(0.0) == (0.0, 0.0)
    assert p.at(1.0) == (10.0, 0.0)
    assert p.at(0.5) == (5.0, 0.0)
    assert p.at(-1.0) == (0.0, 0.0)   # clamped
    assert p.at(2.0) == (10.0, 0.0)


def test_varargs_construction():
    p = Path(0.0, 0.0, 4.0, 0.0)
    assert p.get_length() == pytest.approx(4.0)


def test_degenerate_inputs():
    p = Path([])
    assert p.at(0.5) == (0.0, 0.0)
    p2 = Path([3.0, 4.0])  # single point duplicated (reference :476-478)
    assert p2.at(0.7) == (3.0, 4.0)
    with pytest.raises(SimulationError):
        Path([0.0, 0.0, 1.0])


def test_uniform_vs_arclength_parameterization():
    pts = [0.0, 0.0, 1.0, 0.0, 11.0, 0.0]  # segments of length 1 and 10
    uniform = Path(pts)
    # uniform: t=0.5 is the boundary between segments
    assert uniform.at(0.25) == (0.5, 0.0)
    arc = Path(pts)
    arc.create_from_and_reparameterize(pts)
    # arc-length: t=0.5 is halfway along total length 11 -> x = 5.5
    x, y = arc.at(0.5)
    assert x == pytest.approx(5.5) and y == 0.0


def test_tangent_and_segment():
    p = Path([0.0, 0.0, 1.0, 0.0, 1.0, 1.0])
    assert p.tangent_at(0.1) == (1.0, 0.0)
    assert p.tangent_at(0.9) == (0.0, 1.0)
    assert p.get_segment(0.9) == (1.0, 0.0, 1.0, 1.0)
    assert p.get_segment_count() == 2


def test_override_parameterization():
    p = Path([0.0, 0.0, 1.0, 0.0, 2.0, 0.0])
    p.override_parameterization(0.9, 0.1)
    x, _ = p.at(0.45)
    assert x == pytest.approx(0.5)
    with pytest.raises(SimulationError):
        p.override_parameterization(0.5)        # wrong count
    with pytest.raises(SimulationError):
        p.override_parameterization(0.7, 0.7)   # doesn't sum to 1


def test_resample_uniform_spacing():
    pts = [0.0, 0.0, 0.1, 0.0, 10.0, 0.0]
    p = Path(pts)
    p.create_from_and_resample(pts)
    out = np.asarray(p.get_points()).reshape(-1, 2)
    gaps = np.diff(out[:, 0])
    assert np.allclose(gaps, gaps[0], atol=1e-9)
    assert out[0].tolist() == [0.0, 0.0] and out[-1].tolist() == [10.0, 0.0]


def test_closest_point():
    p = Path([0.0, 0.0, 10.0, 0.0])
    x, y, t = p.get_closest_point(5.0, 3.0)
    assert (x, y) == (5.0, 0.0) and t == pytest.approx(0.5)
    # range-restricted query
    x, y, t = p.get_closest_point(5.0, 3.0, 0.6, 1.0)
    assert x == pytest.approx(6.0) and t == pytest.approx(0.6)
    # swapped range is normalized
    x, y, t = p.get_closest_point(5.0, 3.0, 1.0, 0.6)
    assert x == pytest.approx(6.0)


def test_closest_point_on_closed_polygon():
    p = Path([0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0, 0.0, 0.0])
    x, y, t = p.get_closest_point(11.0, 5.0)
    assert x == pytest.approx(10.0) and y == pytest.approx(5.0)


def test_array_queries():
    p = Path([0.0, 0.0, 10.0, 0.0])
    pts = p.at(np.asarray([0.0, 0.5, 1.0]))
    np.testing.assert_allclose(pts, [[0, 0], [5, 0], [10, 0]])


def test_get_length():
    p = Path([0.0, 0.0, 3.0, 4.0])
    assert p.get_length() == pytest.approx(5.0)

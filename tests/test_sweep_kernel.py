"""Pallas sweep kernel vs its jnp golden model (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from egg_fluid_simulation_tpu.ops import dense as D
from egg_fluid_simulation_tpu.ops.pallas import sweep_kernel as K


@pytest.fixture(scope="module")
def binning():
    n, g, k = 512, 32, 4
    rng = np.random.default_rng(2)
    pos = jnp.asarray(rng.uniform(0, 150, (n, 2)), jnp.float32)
    inv_mass = jnp.asarray(rng.uniform(0.5, 1.5, (n,)), jnp.float32)
    radius = jnp.full((n,), 4.0)
    batch = jnp.asarray(rng.integers(0, 3, (n,)), jnp.int32)
    active = jnp.asarray(rng.random(n) < 0.9)
    cum = jnp.asarray(np.cumsum(rng.random(n)), jnp.float32)
    return D.bin_to_planes(pos, inv_mass, radius, batch, active,
                           jnp.float32(8.0), grid_dim=g, slots_per_cell=k,
                           cum=cum)


PARAMS = D.SweepParams(jnp.float32(10.0), jnp.float32(50.0), jnp.float32(2.0),
                       jnp.float32(2.0), jnp.float32(1000.0))


@pytest.mark.parametrize(
    "cohesion,budget",
    [(True, False), (False, True),
     pytest.param(False, False, marks=pytest.mark.slow),
     pytest.param(True, True, marks=pytest.mark.slow)])
def test_sweep_kernel_matches_jnp_model(binning, cohesion, budget):
    ref = D.sweep_planes_jnp(binning.planes, PARAMS, 4, cohesion, budget)
    got = K._sweep_pallas(binning.planes, PARAMS.pack(), 4, cohesion, budget,
                          interpret=True)
    # accumulation order differs (d-major vs dy-major): float tolerance only
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_count_kernel_matches_jnp_model(binning):
    ref = D.count_planes_jnp(binning.planes, 4)
    got = K._count_pallas(binning.planes, 4, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_placement_kernel_matches_scatter_path():
    """The one-hot-matmul placement (place_kernel) must reproduce the
    scatter+gather plane build bit-for-bit, including aux fields and the
    torus halo rows."""
    n, g, k = 700, 32, 4
    rng = np.random.default_rng(7)
    pos = jnp.asarray(rng.uniform(-100, 400, (n, 2)), jnp.float32)
    inv_mass = jnp.asarray(rng.uniform(0.5, 1.5, (n,)), jnp.float32)
    radius = jnp.full((n,), 4.0)
    batch = jnp.asarray(rng.integers(0, 3, (n,)), jnp.int32)
    active = jnp.asarray(rng.random(n) < 0.9)
    aux = jnp.asarray(rng.normal(size=(n, 7)), jnp.float32)

    ref = D.bin_to_planes(pos, inv_mass, radius, batch, active,
                          jnp.float32(8.0), grid_dim=g, slots_per_cell=k,
                          aux_cols=aux)
    got = D.bin_to_planes(pos, inv_mass, radius, batch, active,
                          jnp.float32(8.0), grid_dim=g, slots_per_cell=k,
                          aux_cols=aux, use_placement=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.planes), np.asarray(ref.planes))
    np.testing.assert_array_equal(np.asarray(got.aux), np.asarray(ref.aux))
    np.testing.assert_array_equal(np.asarray(got.slot), np.asarray(ref.slot))


def test_placement_kernel_with_cell_overflow():
    """Crowded cells (rank >= k) must not corrupt placement.

    Overflow entries carry the sentinel slot interleaved mid-array in cell-id
    order; without the tail-compaction sort the kernel's binary-searched
    window starts are computed over a non-sorted array and entries are
    silently dropped (observed on hardware at 20k particles / 64^2 cells).
    This pins the regression: ~5x more particles than grid slots, plus one
    pathological cell holding ~10% of all particles."""
    n, g, k = 5000, 32, 4
    rng = np.random.default_rng(11)
    xy = rng.uniform(-100, 400, (n, 2))
    xy[:500] = rng.uniform(0, 7.9, (500, 2))          # one crowded cell
    pos = jnp.asarray(xy, jnp.float32)
    inv_mass = jnp.asarray(rng.uniform(0.5, 1.5, (n,)), jnp.float32)
    radius = jnp.full((n,), 4.0)
    batch = jnp.asarray(rng.integers(0, 3, (n,)), jnp.int32)
    active = jnp.asarray(rng.random(n) < 0.9)
    aux = jnp.asarray(rng.normal(size=(n, 7)), jnp.float32)

    ref = D.bin_to_planes(pos, inv_mass, radius, batch, active,
                          jnp.float32(8.0), grid_dim=g, slots_per_cell=k,
                          aux_cols=aux)
    got = D.bin_to_planes(pos, inv_mass, radius, batch, active,
                          jnp.float32(8.0), grid_dim=g, slots_per_cell=k,
                          aux_cols=aux, use_placement=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.planes), np.asarray(ref.planes))
    np.testing.assert_array_equal(np.asarray(got.aux), np.asarray(ref.aux))


def test_placement_window_truncation_degrades_to_budget_drop():
    """A chunk whose cells hold more overflow than the kernel's window slack
    loses the span's tail entries from placement. That loss must degrade
    EXACTLY like a per-cell-cap budget drop: the affected particles read
    FIELD_OCC = 0 at their slot and the extraction path routes them to the
    no-collision fallback instead of reading zero positions."""
    from egg_fluid_simulation_tpu.ops import solver as S
    from egg_fluid_simulation_tpu.ops.pallas import place_kernel as P

    g, k = 32, 4
    lanes = g * k
    rng = np.random.default_rng(13)
    # one cell holding far more than _OVERFLOW_SLACK entries, then a few
    # particles in the NEXT cells of the same placement chunk
    n_crowd = P._OVERFLOW_SLACK + 300
    xy = np.concatenate([
        rng.uniform(0, 7.9, (n_crowd, 2)),               # cell (0, 0)
        np.stack([rng.uniform(8.1, 15.9, 40), rng.uniform(0, 7.9, 40)], 1),
    ]).astype(np.float32)                                # cell (1, 0)
    n = xy.shape[0]
    pos = jnp.asarray(xy)
    inv_mass = jnp.ones((n,), jnp.float32)
    radius = jnp.full((n,), 4.0)
    batch = jnp.zeros((n,), jnp.int32)
    active = jnp.ones((n,), bool)
    aux = jnp.asarray(rng.normal(size=(n, 7)), jnp.float32)

    got = D.bin_to_planes(pos, inv_mass, radius, batch, active,
                          jnp.float32(8.0), grid_dim=g, slots_per_cell=k,
                          aux_cols=aux, use_placement=True, interpret=True)
    p, prev, vel, in_grid = S._plane_extract(got.planes, got.aux, got.slot,
                                             g, lanes)
    in_grid = np.asarray(in_grid)
    slot = np.asarray(got.slot)
    # some particles with a valid slot were truncated out of the window ...
    truncated = (slot < g * lanes) & ~in_grid
    assert truncated.sum() > 0
    # ... and every particle flagged in-grid extracts its true position
    p = np.asarray(p)
    np.testing.assert_allclose(p[in_grid], xy[in_grid], atol=0)
    # nobody in-grid collapsed to the zero slot
    assert (np.abs(p[in_grid]).sum(axis=1) > 0).all()

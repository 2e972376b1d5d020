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
    [(False, True),
     pytest.param(True, False, marks=pytest.mark.slow),
     pytest.param(False, False, marks=pytest.mark.slow),
     pytest.param(True, True, marks=pytest.mark.slow)])
def test_sweep_kernel_matches_jnp_model(binning, cohesion, budget):
    ref = D.sweep_planes_jnp(binning.planes, PARAMS, 4, cohesion, budget)
    got = K._sweep_pallas(binning.planes, PARAMS.pack(), 4, cohesion, budget,
                          interpret=True)
    # accumulation order differs (d-major vs dy-major): float tolerance only
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


PARAMS8 = PARAMS._replace(cell_size=jnp.float32(8.0))


def _per_particle(corr, slot, g, lanes):
    """Scatter (2, G, L) slot corrections back to particle order."""
    flat = np.asarray(corr).reshape(2, g * lanes)
    slot = np.asarray(slot)
    ok = slot < g * lanes
    safe = np.minimum(slot, g * lanes - 1)
    return np.where(ok[None, :], flat[:, safe], 0.0).T


def test_wide_sweep_on_fresh_binning_matches_narrow(binning):
    """window=3 + fresh_mask on a just-built binning admits exactly the
    narrow +-1 pair set (every fresh cell equals its stale cell)."""
    ref = D.sweep_planes_jnp(binning.planes, PARAMS8, 4, False, False)
    got = D.sweep_planes_jnp(binning.planes, PARAMS8, 4, False, False,
                             window=3, fresh_mask=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_wide_sweep_matches_per_pass_rebuild_after_drift():
    """The violent-phase wide sweep's pair set on a STALE binning must equal
    a narrow sweep on a freshly REBUILT binning (the per-pass hash rebuild
    the reference performs, :1866-1879) while drift stays under a cell."""
    n, g, k = 600, 32, 8   # k=8: no cell exceeds the slot cap in either
    lanes = g * k          # layout (a cap drop would legitimately change the
    cell = 8.0             # dropped particle's neighbors' pair sets)
    rng = np.random.default_rng(5)
    pos0 = rng.uniform(16.0, 240.0, (n, 2)).astype(np.float32)
    drift = rng.uniform(-0.2 * cell, 0.2 * cell, (n, 2)).astype(np.float32)
    pos1 = pos0 + drift
    inv_mass = jnp.asarray(rng.uniform(0.5, 1.5, (n,)), jnp.float32)
    radius = jnp.full((n,), 4.0)
    batch = jnp.asarray(rng.integers(0, 3, (n,)), jnp.int32)
    active = jnp.asarray(rng.random(n) < 0.9)

    b0 = D.bin_to_planes(jnp.asarray(pos0), inv_mass, radius, batch, active,
                         jnp.float32(cell), grid_dim=g, slots_per_cell=k)
    # write the drifted positions into the STALE slot layout (what the
    # solver's in-place pass updates do), keeping membership from pos0
    rp = D.ROW_PAD
    planes = b0.planes
    for f, col in ((D.FIELD_X, 0), (D.FIELD_Y, 1)):
        flat = planes[f, rp:rp + g].reshape(-1)
        flat = flat.at[b0.slot].set(jnp.asarray(pos1[:, col]), mode="drop")
        planes = planes.at[f, rp:rp + g].set(flat.reshape(g, lanes))
    planes = D.refresh_halo_xy(planes)

    wide = D.sweep_planes_jnp(planes, PARAMS8, k, False, False,
                              window=3, fresh_mask=True)

    b1 = D.bin_to_planes(jnp.asarray(pos1), inv_mass, radius, batch, active,
                         jnp.float32(cell), grid_dim=g, slots_per_cell=k)
    fresh = D.sweep_planes_jnp(b1.planes, PARAMS8, k, False, False)

    got = _per_particle(wide, b0.slot, g, lanes)
    ref = _per_particle(fresh, b1.slot, g, lanes)
    # both layouts must be complete — a cap drop would change the dropped
    # particle's NEIGHBORS' corrections, which no per-particle filter can
    # mask out
    n_act = int(np.asarray(active).sum())
    keep = ((np.asarray(b0.slot) < g * lanes)
            & (np.asarray(b1.slot) < g * lanes))
    assert keep.sum() == n_act
    np.testing.assert_allclose(got[keep], ref[keep], rtol=1e-4, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("cohesion", [False, True])
def test_wide_sweep_kernel_matches_jnp_model(binning, cohesion):
    ref = D.sweep_planes_jnp(binning.planes, PARAMS8, 4, cohesion, False,
                             window=3, fresh_mask=True)
    got = K._sweep_pallas(binning.planes, PARAMS8.pack(), 4, cohesion, False,
                          window=3, fresh_mask=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "cohesion,budget",
    [(True, False),
     pytest.param(False, False, marks=pytest.mark.slow),
     pytest.param(False, True, marks=pytest.mark.slow),
     pytest.param(True, True, marks=pytest.mark.slow)])
def test_symmetric_sweep_kernel_matches_jnp_model(binning, cohesion, budget):
    """The symmetric kernel (each unordered pair evaluated once, both sides
    scattered, spill rows folded across blocks) must match the one-sided
    golden model to float-summation-order tolerance."""
    ref = D.sweep_planes_jnp(binning.planes, PARAMS, 4, cohesion, budget)
    got = K._sweep_pallas_sym(binning.planes, PARAMS.pack(), 4, cohesion,
                              budget, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("cohesion", [False, True])
def test_symmetric_wide_sweep_kernel_matches_jnp_model(binning, cohesion):
    ref = D.sweep_planes_jnp(binning.planes, PARAMS8, 4, cohesion, False,
                             window=3, fresh_mask=True)
    got = K._sweep_pallas_sym(binning.planes, PARAMS8.pack(), 4, cohesion,
                              False, window=3, fresh_mask=True,
                              interpret=True)
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

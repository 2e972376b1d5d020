"""Unit tests: sort-based cell grid vs brute-force neighborhood."""

import jax.numpy as jnp
import numpy as np

from egg_fluid_simulation_tpu.ops import grid as grid_ops


def _brute_force_neighbors(pos, active, cell):
    """Particles whose cells are within the 3x3 neighborhood of each particle."""
    cells = np.floor(pos / cell).astype(np.int64)
    n = len(pos)
    out = []
    for i in range(n):
        res = set()
        if not active[i]:
            out.append(res)
            continue
        for j in range(n):
            if not active[j] or j == i:
                continue
            if (abs(cells[j][0] - cells[i][0]) <= 1
                    and abs(cells[j][1] - cells[i][1]) <= 1):
                res.add(j)
        out.append(res)
    return out


def test_grid_contains_all_true_neighbors():
    rng = np.random.default_rng(0)
    n = 256
    pos = rng.uniform(-100, 100, size=(n, 2)).astype(np.float32)
    active = np.ones(n, bool)
    active[200:] = False
    cell = 16.0

    grid = grid_ops.build_grid(jnp.asarray(pos), jnp.asarray(active),
                               jnp.float32(cell), table_size=1024, slots_per_cell=32)
    cand = np.asarray(grid_ops.neighbor_candidates(grid))

    truth = _brute_force_neighbors(pos, active, cell)
    for i in range(n):
        got = set(c for c in cand[i] if c >= 0 and c != i)
        # all true neighbors must be present (K large enough here that nothing drops)
        missing = truth[i] - got
        assert not missing, f"particle {i} missing neighbors {missing}"
        # no inactive particle may appear anywhere
        assert all(active[c] for c in got)


def test_grid_budget_drops_beyond_capacity():
    # 40 coincident particles, K=8: exactly 8 survive in the shared cell
    n = 40
    pos = jnp.zeros((n, 2), jnp.float32)
    active = jnp.ones((n,), bool)
    grid = grid_ops.build_grid(pos, active, jnp.float32(10.0),
                               table_size=256, slots_per_cell=8)
    cand = np.asarray(grid_ops.neighbor_candidates(grid))
    valid = cand[0][cand[0] >= 0]
    assert len(set(valid.tolist())) == 8


def test_grid_negative_coordinates():
    pos = jnp.asarray([[-5.0, -5.0], [-6.0, -5.5], [100.0, 100.0]], jnp.float32)
    active = jnp.ones((3,), bool)
    grid = grid_ops.build_grid(pos, active, jnp.float32(4.0),
                               table_size=256, slots_per_cell=4)
    cand = np.asarray(grid_ops.neighbor_candidates(grid))
    assert 1 in cand[0] and 0 in cand[1]
    assert 2 not in cand[0] and 2 not in cand[1]


def test_grid_vmaps_over_populations():
    import jax
    pos = jnp.zeros((2, 16, 2), jnp.float32)
    active = jnp.ones((2, 16), bool)
    build = jax.vmap(lambda p, a: grid_ops.build_grid(
        p, a, jnp.float32(8.0), table_size=64, slots_per_cell=32).table)
    tables = build(pos, active)
    assert tables.shape == (2, 65, 32)


def test_count_pairs_mxu_exact_counts():
    """The MXU one-hot histogram equals numpy's, including sentinel ids
    outside the table (counted toward nothing) and the chunked path."""
    rng = np.random.default_rng(3)
    n_hi, n_lo = 7, 13
    hi = rng.integers(0, n_hi + 2, 5000)          # some out-of-range
    lo = rng.integers(0, n_lo + 1, 5000)
    ref = np.zeros((n_hi, n_lo))
    ok = (hi < n_hi) & (lo < n_lo)
    np.add.at(ref, (hi[ok], lo[ok]), 1.0)
    got = grid_ops.count_pairs_mxu(jnp.asarray(hi, jnp.int32),
                                   jnp.asarray(lo, jnp.int32), n_hi, n_lo)
    np.testing.assert_array_equal(np.asarray(got), ref)
    # chunked path (n > chunk) must agree bit-for-bit
    got_c = grid_ops.count_pairs_mxu(jnp.asarray(hi, jnp.int32),
                                     jnp.asarray(lo, jnp.int32), n_hi, n_lo,
                                     chunk=1024)
    np.testing.assert_array_equal(np.asarray(got_c), ref)

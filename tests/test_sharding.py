"""Multi-chip SPMD tests on a virtual 8-device CPU mesh (SURVEY.md §7 #8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egg_fluid_simulation_tpu import (SimulationHandler, SolverOptions,
                                      default_white_config, default_yolk_config,
                                      WHITE)
from egg_fluid_simulation_tpu.config import (device_config_from_dict,
                                             stack_device_configs)
from egg_fluid_simulation_tpu.ops import solver as solver_ops
from egg_fluid_simulation_tpu.parallel import sharding


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    return sharding.make_mesh()


def _make_state(capacity=1024):
    h = SimulationHandler(default_white_config(), default_yolk_config(),
                          capacity=capacity, max_batches=8,
                          options=SolverOptions(cohesion_mode="literal"))
    a = h.add(0.0, 0.0, 20.0, 6.0, None, None, 40, 10)
    b = h.add(300.0, 100.0, 20.0, 6.0, None, None, 30, 8)
    h.set_target_position(a, 150.0, 50.0)
    h._flush_targets()
    return h


@pytest.mark.slow
def test_sharded_step_matches_single_chip(mesh):
    h = _make_state()
    cfg2 = h._device_cfg2()
    opts = SolverOptions(cohesion_mode="literal", table_size=4096,
                         slots_per_cell=32, budget_mode="off")

    single, _ = solver_ops.step(h.state, cfg2, jnp.float32(1 / 60),
                                jnp.float32(1.0), opts)

    sharded_state = sharding.shard_state(h.state, mesh)
    step = sharding.sharded_step(mesh, opts)
    multi, stats = step(sharded_state, cfg2, jnp.float32(1 / 60), jnp.float32(1.0))

    np.testing.assert_allclose(np.asarray(multi.pos)[WHITE][:70],
                               np.asarray(single.pos)[WHITE][:70],
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(multi.vel)[WHITE][:70],
                               np.asarray(single.vel)[WHITE][:70],
                               rtol=1e-4, atol=0.2)


def test_sharded_stats_match(mesh):
    h = _make_state()
    cfg2 = h._device_cfg2()
    opts = SolverOptions(cohesion_mode="literal", table_size=4096,
                         slots_per_cell=32, budget_mode="off")
    _, single_stats = solver_ops.step(h.state, cfg2, jnp.float32(1 / 60),
                                      jnp.float32(1.0), opts)
    step = sharding.sharded_step(mesh, opts)
    _, multi_stats = step(sharding.shard_state(h.state, mesh), cfg2,
                          jnp.float32(1 / 60), jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(multi_stats.centroid),
                               np.asarray(single_stats.centroid),
                               rtol=1e-4, atol=0.1)
    np.testing.assert_allclose(np.asarray(multi_stats.aabb_min),
                               np.asarray(single_stats.aabb_min),
                               rtol=1e-4, atol=0.1)
    np.testing.assert_allclose(np.asarray(multi_stats.batch_count),
                               np.asarray(single_stats.batch_count), atol=0.5)


@pytest.mark.slow
def test_sharded_step_runs_multiple_steps(mesh):
    h = _make_state()
    cfg2 = h._device_cfg2()
    opts = SolverOptions(cohesion_mode="literal", table_size=4096,
                         slots_per_cell=32, budget_mode="off")
    step = sharding.sharded_step(mesh, opts)
    st = sharding.shard_state(h.state, mesh)
    for _ in range(5):
        st, stats = step(st, cfg2, jnp.float32(1 / 60), jnp.float32(1.0))
    pos = np.asarray(st.pos)
    assert np.isfinite(pos[:, :70]).all()
    # batch a is being dragged toward (150, 50)
    c = np.asarray(stats.batch_pos_sum[0, 0] + stats.batch_pos_sum[1, 0]) / max(
        float(stats.batch_count[0, 0] + stats.batch_count[1, 0]), 1.0)
    assert 0.0 < c[0] < 160.0

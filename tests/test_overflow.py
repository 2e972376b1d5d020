"""Render-budget honesty: overflow detection + auto-bump recovery.

``auto_render_options`` derives the per-bin candidate budget k from the
population's AABB density; a scene clustered inside a huge AABB makes that
density underestimate peak bin occupancy (VERDICT r2, weak #8). The overflow
counters must fire and ``draw(check_overflow=True)`` must auto-bump the
budget until the frame drops nothing (the reference drops nothing inside its
canvas, /root/reference/simulation_handler.lua:2054-2064).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from egg_fluid_simulation_tpu import (SimulationHandler, SolverOptions,
                                      default_white_config,
                                      default_yolk_config)
from egg_fluid_simulation_tpu.ops import render as render_ops

BASE = dict(engine="dense", budget_mode="off", dense_rebin="step",
            dense_grid_dim=32, dense_slots=8, use_pallas=False)


def _clustered_handler():
    h = SimulationHandler(
        default_white_config(), default_yolk_config(),
        capacity=1024, max_batches=8, canvas_size=1024,
        options=SolverOptions(adaptive_rebin=False, **BASE))
    # dense cluster: many particles compressed into a small disk
    h.add(200.0, 200.0, 20.0, 8.0, None, None, 400, 20)
    # far-away singleton batch blows the AABB up ~25x in each axis, so the
    # AABB density underestimates the cluster's bin occupancy by ~600x
    h.add(5000.0, 5000.0, 8.0, 4.0, None, None, 10, 3)
    return h


@pytest.mark.slow
def test_clustered_scene_overflows_then_autobumps():
    h = _clustered_handler()
    h.step_once()

    opts2 = render_ops.frame_options(h)
    cfg2 = h._device_cfg2()
    origin = jnp.asarray([0.0, 0.0], jnp.float32)
    _, _, overflows = render_ops._render_frame(
        h.state, h.stats, cfg2, jnp.float32(1.0), jnp.float32(0.3),
        jnp.float32(0.01), origin, opts2, True, 256, 256,
        pop_caps=h._options.pop_caps)
    # the density-derived budget must be overwhelmed by the cluster
    assert int(np.asarray(overflows)[:, 0].sum()) > 0, (
        "expected overflow in the clustered-in-big-AABB scene; "
        f"opts k = {[o.tile_capacity for o in opts2]}")

    # auto-bump: draw(check_overflow=True) re-renders with boosted budgets
    h.draw(viewport=(0, 0, 256, 256), check_overflow=True)
    assert max(h._render_k_boost) > 1.0

    opts2b = render_ops.frame_options(h)
    assert opts2b[0].tile_capacity > opts2[0].tile_capacity
    _, _, overflows_b = render_ops._render_frame(
        h.state, h.stats, cfg2, jnp.float32(1.0), jnp.float32(0.3),
        jnp.float32(0.01), origin, opts2b, True, 256, 256,
        pop_caps=h._options.pop_caps)
    assert int(np.asarray(overflows_b)[:, 0].sum()) == 0


def test_clamped_canvas_edge_contributions_match_unclamped():
    """A scene LARGER than its canvas: near-edge exterior particles must
    still contribute (the reference rasterizes any quad intersecting the
    canvas, :2046-2064) and must NOT funnel into edge-bin overflow — they
    bin into the exterior ring at scene density (ops/render._ring_depth).
    The clamped render must equal the matching window of an unclamped one.
    """
    rng = np.random.default_rng(7)
    # uniform scene ~320 px across, centered at (150, 150)
    n_side = 56
    xs = np.linspace(-10.0, 310.0, n_side)
    p = np.stack(np.meshgrid(xs, xs), axis=-1).reshape(-1, 2)
    p = p + rng.uniform(-1.5, 1.5, p.shape)
    n = p.shape[0]
    pos = jnp.asarray(p, jnp.float32)
    vel = jnp.zeros_like(pos)
    radius = jnp.full((n,), 3.0, jnp.float32)
    color = jnp.tile(jnp.asarray([1.0, 1.0, 1.0, 0.9], jnp.float32), (n, 1))
    act = jnp.ones((n,), bool)
    center = jnp.asarray([150.0, 150.0], jnp.float32)

    def opts_for(s):
        return render_ops.RenderOptions(
            canvas_size=s, tile_h=32, tile_w=128, bin_h=16, bin_w=16,
            max_splat_px=16, tile_capacity=32)

    kw = dict(use_pallas=False)
    args = (pos, pos, vel, radius, color, act, center, jnp.float32(1.0),
            jnp.float32(4.0), jnp.float32(0.0))
    small, _, ov_small = render_ops.splat_population(*args, opts_for(256), **kw)
    big, _, ov_big = render_ops.splat_population(*args, opts_for(512), **kw)
    assert int(ov_small[0]) == 0, "exterior ring must absorb near-edge particles"
    assert int(ov_big[0]) == 0
    # canvas origins are center - S/2: the small canvas sits at offset
    # (512-256)/2 = 128 inside the big one
    np.testing.assert_allclose(np.asarray(small),
                               np.asarray(big)[128:384, 128:384],
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_uniform_scene_budget_is_honest_without_boost():
    """A uniformly spread scene must not overflow with the default slack.

    Slow tier: compile-dominated (~2 min on 1 CPU); the fast tier's
    clamped-vs-unclamped gate above asserts zero overflow on two canvases.
    """
    h = SimulationHandler(
        default_white_config(), default_yolk_config(),
        capacity=1024, max_batches=8,
        options=SolverOptions(adaptive_rebin=False, **BASE))
    h.add(150.0, 150.0, 40.0, 12.0, None, None, 150, 15)
    h.step_once()
    h.draw(viewport=(0, 0, 256, 256), check_overflow=True)
    assert h._render_k_boost == [1.0, 1.0]

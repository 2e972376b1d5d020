"""Demo harness + checkpoint/resume tests."""

import numpy as np
import pytest

from egg_fluid_simulation_tpu import demo as demo_mod
from egg_fluid_simulation_tpu import checkpoint
from egg_fluid_simulation_tpu.state import WHITE

pytestmark = pytest.mark.slow  # heavy gate tier; see pytest.ini


def test_demo_scripted_session_runs():
    stats = demo_mod.run_demo(frames=20, out_dir=None, spawn_every=8, swap_at=10)
    assert stats["n_particles"] > 0
    assert np.isfinite(stats["mean_update_ms"])


def test_demo_spawn_remove_cycle():
    d = demo_mod.DemoState(capacity=4096)
    ids = [d.spawn_batch() for _ in range(4)]
    assert len(d.handler.list_ids()) == 4
    d.update()
    d.remove_batch()
    d.remove_batch()
    assert len(d.handler.list_ids()) == 2
    d.update()
    w, y = d.handler.get_n_particles()
    assert (w, y) == (40, 30)


def test_demo_path_follows():
    d = demo_mod.DemoState(capacity=4096)
    d.spawn_batch()
    x0, y0 = d.target_position()
    for _ in range(30):
        d.update(1 / 60)
    x1, y1 = d.target_position()
    assert (x0, y0) != (x1, y1)  # target moves along the path at 300 px/s


def test_demo_config_swap_stable():
    d = demo_mod.DemoState(capacity=4096)
    d.spawn_batch()
    for _ in range(5):
        d.update()
    d.swap_config()
    assert not d.current_config_solid
    for _ in range(5):
        d.update()
    d.swap_config()
    assert d.current_config_solid
    pos = np.asarray(d.handler.state.pos)
    assert np.isfinite(pos[WHITE][:20]).all()


def test_demo_renders_frame():
    d = demo_mod.DemoState(width=256, height=256,
                           capacity=4096, canvas_size=128)
    d.spawn_batch()
    d.update()
    frame = d.draw()
    assert frame.shape == (256, 256, 4)
    assert np.isfinite(frame).all()


def test_checkpoint_roundtrip(tmp_path):
    d = demo_mod.DemoState(capacity=4096)
    a = d.spawn_batch()
    d.spawn_batch()
    for _ in range(10):
        d.update()
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(d.handler, path)

    restored = checkpoint.load(path)
    assert sorted(restored.list_ids()) == sorted(d.handler.list_ids())
    assert restored.get_n_particles() == d.handler.get_n_particles()
    np.testing.assert_allclose(np.asarray(restored.state.pos),
                               np.asarray(d.handler.state.pos))
    np.testing.assert_allclose(restored.get_position(a), d.handler.get_position(a),
                               atol=1e-3)
    # both continue identically for one step
    restored.update(1 / 60)
    d.handler.update(1 / 60)
    np.testing.assert_allclose(np.asarray(restored.state.pos),
                               np.asarray(d.handler.state.pos), atol=1e-4)


def test_checkpoint_preserves_wide_state(tmp_path):
    # The violence-episode state (trip, budget, calm) must survive a
    # checkpoint so a resumed run doesn't restart the wide-sweep budget
    # mid-episode (ref: the reference has no analog — persistence invariant
    # is ours: resume == never-stopped).
    # capacity >= 16384 selects the dense engine, whose step threads real
    # (trip, budget, calm) tuples; smaller handlers (gather engine) leave
    # per-population entries None — both encodings must roundtrip.
    d = demo_mod.DemoState(capacity=16384)
    d.spawn_batch()
    for _ in range(5):
        d.update()
    assert d.handler._wide_state is not None

    def host(ws):
        return [None if w is None else (bool(w[0]), int(w[1]), int(w[2]))
                for w in ws]

    want = host(d.handler._wide_state)
    assert any(w is not None for w in want)  # dense engine threads tuples
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(d.handler, path)
    restored = checkpoint.load(path)
    assert host(restored._wide_state) == want

    # gather-engine handler: None entries must survive as None
    d2 = demo_mod.DemoState(capacity=4096)
    d2.spawn_batch()
    d2.update()
    path2 = str(tmp_path / "ckpt2.npz")
    checkpoint.save(d2.handler, path2)
    restored2 = checkpoint.load(path2)
    assert host(restored2._wide_state) == host(d2.handler._wide_state)


def test_checkpoint_preserves_configs(tmp_path):
    d = demo_mod.DemoState(capacity=4096)
    d.spawn_batch()
    d.swap_config()  # fluid config active
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(d.handler, path)
    restored = checkpoint.load(path)
    assert restored.get_white_config()["damping"] == pytest.approx(0.05)
    assert restored.get_white_config()["follow_strength"] == pytest.approx(0.8)


def test_checkpoint_preserves_render_k_boost(tmp_path):
    """The overflow-recovery render-budget multiplier must survive resume:
    a clustered scene that needed a boosted per-bin budget would silently
    drop splats after load until the next check_overflow draw."""
    d = demo_mod.DemoState(capacity=4096)
    d.spawn_batch()
    d.update()
    d.handler._render_k_boost = [2.0, 1.5]   # as if auto-bump had fired
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(d.handler, path)
    restored = checkpoint.load(path)
    assert restored._render_k_boost == [2.0, 1.5]


@pytest.mark.slow
def test_demo_spatial_session_runs():
    """The demo session runs unmodified on a SpatialHandler over a 2x2 mesh
    (same public API: spawn, targets, update, draw-with-background)."""
    d = demo_mod.DemoState(capacity=1024, spatial=(2, 2))
    d.spawn_batch()
    d.spawn_batch()
    for _ in range(3):
        d.update()
    frame = d.draw()
    assert frame.shape == (600, 800, 4)
    assert np.isfinite(frame).all()
    stats = d.overlay_stats()
    assert stats["n_particles"] > 0


def test_checkpoint_spatial_roundtrip(tmp_path):
    """Checkpoint a LIVE SpatialHandler (sharded state synced back to the
    prefix layout) and resume it on a DIFFERENT mesh shape via
    SpatialHandler.from_handler — multi-chip parity for A4."""
    from egg_fluid_simulation_tpu import (SimulationHandler, SolverOptions,
                                          default_white_config,
                                          default_yolk_config)
    from egg_fluid_simulation_tpu.parallel.spatial_handler import SpatialHandler

    options = SolverOptions(engine="dense", budget_mode="off",
                            dense_rebin="step", dense_grid_dim=32,
                            dense_slots=4, use_pallas=False)
    sh = SpatialHandler(default_white_config(), default_yolk_config(),
                        db=2, dx=2, capacity=1024, max_batches=8,
                        options=options)
    a = sh.add(60.0, 50.0, 20.0, 6.0, None, None, 40, 10)
    sh.set_target_position(a, 100.0, 70.0)
    sh.run_steps(3)
    pos_before = np.asarray(sh.state.pos)
    path = str(tmp_path / "spatial_ckpt.npz")
    checkpoint.save(sh, path)

    inner = checkpoint.load(path, options=options)
    sh2 = SpatialHandler.from_handler(inner, db=1, dx=2)
    assert sh2.get_n_particles() == sh.get_n_particles()
    # the synced checkpoint state matches the saved state as a set
    # (save() synced the sharded state into the prefix layout)
    n0 = sh.get_n_particles()[0]
    p_live = np.sort(np.asarray(sh.state.pos[0])[:n0], axis=0)
    p2 = np.sort(np.asarray(sh2.state.pos[0])[:n0], axis=0)
    np.testing.assert_allclose(p2, p_live, atol=1e-5)
    # and it steps + draws on the new mesh
    sh2.run_steps(2)
    frame = sh2.draw(viewport=(0.0, 0.0, 128, 128))
    assert np.isfinite(np.asarray(frame)).all()

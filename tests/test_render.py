"""Render-pass golden tests against the reference GLSL formulas (SURVEY §4c).

Each pass is checked against a direct numpy evaluation of the corresponding
shader math: the gaussian particle texture
(simulation_handler_particle_texture.glsl), screen-blend accumulation
(simulation_handler.lua:2071), the velocity-stretched instanced quad
(simulation_handler_instanced_draw.glsl), the 8-direction outline dilation
(simulation_handler_outline.glsl), and the Sobel/Blinn-Phong lighting pass
(simulation_handler_lighting.glsl).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from egg_fluid_simulation_tpu.ops import render as R

GAUSS = 4.0 * np.pi / 3.0


def _splat_one(pos, vel=(0.0, 0.0), radius=4.0, texture_scale=12.0,
               motion_blur=0.0, alpha=1.0, canvas=256, n=1, positions=None):
    opts = R.RenderOptions(canvas_size=canvas)
    if positions is None:
        positions = np.tile(np.asarray(pos, np.float32), (n, 1))
    n = len(positions)
    p = jnp.asarray(positions, jnp.float32)
    v = jnp.tile(jnp.asarray(vel, jnp.float32), (n, 1))
    r = jnp.full((n,), radius, jnp.float32)
    c = jnp.concatenate([jnp.ones((n, 3)), jnp.full((n, 1), alpha)], axis=1)
    act = jnp.ones((n,), bool)
    center = jnp.asarray([canvas / 2.0, canvas / 2.0], jnp.float32)
    out, _, _ = R.splat_population(p, p, v, r, c, act, center, jnp.float32(1.0),
                                jnp.float32(texture_scale),
                                jnp.float32(motion_blur), opts)
    return np.asarray(out)


def test_gaussian_splat_profile():
    # density(d) = exp(-(4pi/3) * (d / (radius*texture_scale))^2)
    a = _splat_one((128.0, 128.0))
    base = 4.0 * 12.0
    # canvas pixel centers are at +0.5; particle sits at canvas coords (128,128)
    for d in (0, 5, 10, 20, 40):
        got = a[128, 128 + d]
        want = np.exp(-GAUSS * ((d + 0.5) ** 2 + 0.5 ** 2) / base ** 2)
        assert got == pytest.approx(want, rel=1e-3, abs=1e-4), f"d={d}"


def test_splat_clamps_outside_quad():
    a = _splat_one((128.0, 128.0))
    base = 4.0 * 12.0  # quad half-extent 48; static cap at 64
    assert a[128, 128 + int(base) + 2] == 0.0


def test_screen_blend_accumulation():
    # two coincident particles: alpha = 1 - (1-g)^2
    one = _splat_one((128.0, 128.0))
    two = _splat_one((128.0, 128.0), n=2)
    expected = 1.0 - (1.0 - one) ** 2
    np.testing.assert_allclose(two, expected, rtol=1e-4, atol=1e-5)


def test_particle_alpha_scales_contribution():
    half = _splat_one((128.0, 128.0), alpha=0.5)
    full = _splat_one((128.0, 128.0), alpha=1.0)
    np.testing.assert_allclose(half, 0.5 * full, rtol=1e-4, atol=1e-5)


def test_motion_blur_stretches_along_velocity():
    # smear = 1 + |v| * motion_blur stretches the parallel axis only
    a = _splat_one((128.0, 128.0), vel=(100.0, 0.0), motion_blur=0.005)
    smear = 1.0 + 100.0 * 0.005
    base = 4.0 * 12.0
    d = 20
    got_par = a[128, 128 + d]
    want_par = np.exp(-GAUSS * (((d + 0.5) / smear) ** 2 + 0.5 ** 2) / base ** 2)
    assert got_par == pytest.approx(want_par, rel=1e-2)
    got_perp = a[128 + d, 128]
    want_perp = np.exp(-GAUSS * ((d + 0.5) ** 2 + (0.5 / smear) ** 2) / base ** 2)
    assert got_perp == pytest.approx(want_perp, rel=1e-2)
    assert got_par > got_perp  # stretched along +x


def test_splat_rotation_to_velocity_angle():
    a = _splat_one((128.0, 128.0), vel=(100.0, 100.0), motion_blur=0.005)
    # the stretch axis is the (1,1) diagonal
    assert a[128 + 14, 128 + 14] > a[128 + 14, 128 - 14] - 1e-6


def test_outline_pass_formula():
    opts = R.RenderOptions(canvas_size=128)
    # synthetic alpha: hard disk of radius 20
    yy, xx = np.mgrid[0:128, 0:128]
    alpha = ((xx - 64) ** 2 + (yy - 64) ** 2 <= 20 ** 2).astype(np.float32)
    out = np.asarray(R.outline_pass(jnp.asarray(alpha), jnp.float32(2.0),
                                    jnp.float32(0.3), opts))
    # interior: max_alpha = 1 -> smoothstep(0.15, 0.185, 1) = 1
    assert out[64, 64] == pytest.approx(1.0)
    # discard where center alpha == 0 (glsl:11)
    assert out[64, 64 + 30] == 0.0
    assert out[2, 2] == 0.0


def _lighting_numpy(alpha, color, hs, ss, th, sm, use_lighting=True):
    """Direct numpy transcription of simulation_handler_lighting.glsl."""
    def smoothstep(e0, e1, x):
        t = np.clip((x - e0) / (e1 - e0), 0, 1)
        return t * t * (3 - 2 * t)

    value = smoothstep(th - sm, th + sm, alpha)
    center_rgb = value[..., None] * np.asarray(color[:3])
    center_a = value * color[3]

    z = np.pad(alpha, 1)
    tl, tm_, tr = z[:-2, :-2], z[:-2, 1:-1], z[:-2, 2:]
    ml, mr = z[1:-1, :-2], z[1:-1, 2:]
    bl, bm, br = z[2:, :-2], z[2:, 1:-1], z[2:, 2:]
    gx = -tl + tr - 2 * ml + 2 * mr - bl + br
    gy = -tl - 2 * tm_ - tr + bl + 2 * bm + br
    inv = 1.0 / np.sqrt(gx ** 2 + gy ** 2 + 1.0)
    nx, ny, nz = -gx * inv, -gy * inv, inv

    light = np.array([1.0, -1.0, 1.0]) / np.sqrt(3.0)
    view = np.array([0.0, 0.0, 1.0])
    half = (light + view) / np.linalg.norm(light + view)
    spec = hs * np.maximum(nx * half[0] + ny * half[1] + nz * half[2], 0) ** 48
    if hs <= 0 or not use_lighting:
        spec = 0.0

    sl = np.array([-0.5, 0.75, 0.0]) / np.linalg.norm([-0.5, 0.75, 0.0])
    nd = nx * sl[0] + ny * sl[1] + nz * sl[2]
    shadow = smoothstep(0.0, 1.0, np.clip(nd * ss, 0, 1))
    if ss <= 0 or not use_lighting:
        shadow = 0.0
    rgb = center_rgb - np.asarray(shadow)[..., None] + np.asarray(spec)[..., None]
    return rgb, center_a


@pytest.mark.parametrize("hs,ss", [(1.0, 0.0), (0.0, 1.0), (0.7, 0.4)])
def test_lighting_pass_matches_glsl_formula(hs, ss):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:64, 0:64]
    alpha = np.clip(1.2 - np.hypot(xx - 32, yy - 32) / 20.0, 0, 1).astype(np.float32)
    color = (0.9, 0.7, 0.2, 1.0)
    want_rgb, want_a = _lighting_numpy(alpha, color, hs, ss, 0.3, 0.01)
    got_rgb, got_a = R.lighting_pass(
        jnp.asarray(alpha), None, jnp.asarray(color), jnp.float32(hs),
        jnp.float32(ss), jnp.float32(0.3), jnp.float32(0.01),
        use_lighting=True, use_particle_color=False)
    np.testing.assert_allclose(np.asarray(got_rgb), want_rgb, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_a), want_a, rtol=1e-4, atol=1e-5)


def test_full_draw_composites_white_then_yolk():
    from egg_fluid_simulation_tpu import SimulationHandler, default_white_config, default_yolk_config
    h = SimulationHandler(default_white_config(), default_yolk_config(),
                          capacity=1024, canvas_size=256)
    h.add(128.0, 128.0, 40.0, 12.0)
    h.update(1 / 30)
    frame = np.asarray(h.draw(viewport=(0.0, 0.0, 256, 256)))
    assert frame.shape == (256, 256, 4)
    assert np.isfinite(frame).all()
    # the yolk (orange-ish) dominates the very center, white around it
    cy = frame[128, 128]
    assert cy[3] > 0.5
    edge = frame[128, 128 + 35]
    assert edge[3] > 0.3
    # white region is brighter in blue channel than the yolk center
    assert edge[2] > cy[2]


def test_use_particle_color_rgb_accumulation():
    # per-particle color mode (test.lua:25): rgb accumulates with screen blend
    opts = R.RenderOptions(canvas_size=128, use_particle_color=True)
    n = 2
    p = jnp.asarray([[64.0, 64.0], [64.0, 64.0]], jnp.float32)
    v = jnp.zeros((n, 2))
    r = jnp.full((n,), 4.0)
    c = jnp.asarray([[1.0, 0.0, 0.0, 1.0], [0.0, 1.0, 0.0, 1.0]], jnp.float32)
    act = jnp.ones((n,), bool)
    center = jnp.asarray([64.0, 64.0], jnp.float32)
    alpha, rgb, _ = R.splat_population(p, p, v, r, c, act, center, jnp.float32(1.0),
                                    jnp.float32(12.0), jnp.float32(0.0), opts)
    assert rgb is not None and rgb.shape == (128, 128, 3)
    g = np.exp(-GAUSS * (0.5 ** 2 + 0.5 ** 2) / 48.0 ** 2)
    got = np.asarray(rgb)[64, 64]
    # red from particle 0 only, green from particle 1 only: 1-(1-g*c)
    assert got[0] == pytest.approx(1 - (1 - g), rel=1e-3)
    assert got[1] == pytest.approx(1 - (1 - g), rel=1e-3)
    assert got[2] == pytest.approx(0.0, abs=1e-6)


def test_lighting_pass_particle_color_mode():
    alpha = np.full((16, 16), 0.9, np.float32)
    rgb = np.zeros((16, 16, 3), np.float32)
    rgb[..., 0] = 0.8
    got_rgb, got_a = R.lighting_pass(
        jnp.asarray(alpha), jnp.asarray(rgb), jnp.asarray([1.0, 0.5, 1.0, 1.0]),
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.3), jnp.float32(0.01),
        use_lighting=False, use_particle_color=True)
    # center.rgb = data.rgb * color.rgb (glsl:28)
    np.testing.assert_allclose(np.asarray(got_rgb)[8, 8], [0.8, 0.0, 0.0],
                               atol=1e-6)
    assert float(got_a[8, 8]) == pytest.approx(1.0)  # smoothstep saturated


@pytest.mark.slow
def test_draw_frame_cache_invalidation():
    from egg_fluid_simulation_tpu import SimulationHandler, default_white_config, default_yolk_config
    h = SimulationHandler(default_white_config(), default_yolk_config(),
                          capacity=512, canvas_size=128)
    bid = h.add(64.0, 64.0, 20.0, 6.0, None, None, 20, 5)
    h.update(1 / 30)
    f1 = h.draw(viewport=(0.0, 0.0, 128, 128))
    f2 = h.draw(viewport=(0.0, 0.0, 128, 128))
    assert f1 is f2  # cached (reference _canvases_need_update, :1996)
    f3 = h.draw(viewport=(0.0, 0.0, 256, 256))
    assert f3 is not f2  # different viewport -> re-render
    h.update(1 / 30)
    f4 = h.draw(viewport=(0.0, 0.0, 128, 128))
    assert f4 is not f1  # stepping invalidates
    h.set_white_color(bid, 0.1, 0.2, 0.3)
    f5 = h.draw(viewport=(0.0, 0.0, 128, 128))
    assert f5 is not f4  # recolor invalidates


@pytest.mark.slow
def test_downsampled_splat_matches_full_resolution():
    """A coarse-evaluated + bilinearly upsampled splat stays close to the
    full-resolution evaluation (the reference itself samples a finite-
    resolution gaussian texture with linear filtering, :644-645)."""
    rng = np.random.default_rng(3)
    n = 60
    positions = rng.uniform(80, 176, (n, 2)).astype(np.float32)
    p = jnp.asarray(positions)
    v = jnp.zeros((n, 2), jnp.float32)
    r = jnp.full((n,), 4.0, jnp.float32)
    c = jnp.concatenate([jnp.ones((n, 3)), jnp.full((n, 1), 0.8)], axis=1)
    act = jnp.ones((n,), bool)
    center = jnp.asarray([128.0, 128.0], jnp.float32)

    def run(ds):
        opts = R.RenderOptions(canvas_size=256, downsample=ds,
                               max_splat_px=-(-48 // ds),
                               tile_h=8, tile_w=min(128, 256 // ds),
                               bin_h=8, bin_w=16, tile_capacity=64)
        out, _, _ = R.splat_population(p, p, v, r, c, act, center,
                                       jnp.float32(1.0), jnp.float32(12.0),
                                       jnp.float32(0.0), opts)
        return np.asarray(out)

    full = run(1)
    coarse = run(4)
    # interior agreement: the gaussian has ~13px bandwidth, so a 4x coarse
    # grid reconstructs it to a few percent
    assert np.abs(full - coarse).max() < 0.06
    assert np.abs(full - coarse).mean() < 0.005


def test_auto_options_pick_downsample_for_big_splats():
    cfg = {"max_radius": 16.0, "texture_scale": 3.0, "min_radius": 4.0,
           "collision_overlap_factor": 1.0, "outline_thickness": 2.0}
    o = R.auto_render_options(cfg, 2048)
    assert o.downsample == 4 and o.max_splat_px == 12
    cfg_small = dict(cfg, max_radius=3.0, texture_scale=2.0)
    o2 = R.auto_render_options(cfg_small, 2048)
    assert o2.downsample == 1



def test_pallas_splat_kernel_matches_scan_path():
    """The Pallas tile kernel (ops/pallas/splat_kernel.py, interpret mode)
    must reproduce the jnp scan path's accumulated alpha bit-close — same
    math, different loop nesting/accumulation order."""
    rng = np.random.default_rng(21)
    n, canvas = 300, 256
    positions = rng.uniform(20.0, 236.0, (n, 2)).astype(np.float32)
    vels = rng.normal(0.0, 60.0, (n, 2)).astype(np.float32)
    opts = R.RenderOptions(canvas_size=canvas, tile_h=8, tile_w=16,
                           bin_h=8, bin_w=8, max_splat_px=12,
                           tile_capacity=8)
    p = jnp.asarray(positions)
    last = p - 0.25 * jnp.asarray(vels)  # exercise interpolation too
    v = jnp.asarray(vels)
    r = jnp.asarray(rng.uniform(0.5, 1.2, (n,)), jnp.float32)
    c = jnp.concatenate(
        [jnp.ones((n, 3)), jnp.asarray(rng.uniform(0.3, 1.0, (n, 1)))],
        axis=1).astype(jnp.float32)
    act = jnp.asarray(rng.random(n) < 0.9)
    center = jnp.asarray([128.0, 128.0], jnp.float32)
    args = (p, last, v, r, c, act, center, jnp.float32(0.4),
            jnp.float32(8.0), jnp.float32(0.002), opts)

    ref, _, _ = R.splat_population(*args, use_pallas=False)

    payload, _, counts = R._splat_payload(*args)
    nb = R._tile_bins(opts)
    got, _ = R._splat_alpha_kernel(payload, nb, opts, interpret=True)
    got = np.asarray(got)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-5, atol=1e-6)

    # the count-sorted trip skip must change nothing: bins past the trip
    # bound are empty, and the screen-blend product is order-independent
    got_skip, _ = R._splat_alpha_kernel(payload, nb, opts,
                                        counts=counts, interpret=True)
    np.testing.assert_allclose(np.asarray(got_skip), got,
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("capacity", [128, 200])
def test_pallas_splat_kernel_large_capacity_chunk_paths(capacity):
    """kp == 128 (one bin per chunk) and kp == 256 (half-bin chunks with a
    dynamic pl.ds start — round-5 TPU trace fix) must match the scan path;
    the small-capacity tests only cover the concat path (kp < 128)."""
    rng = np.random.default_rng(11)
    n, canvas = 400, 128
    positions = rng.uniform(12.0, 116.0, (n, 2)).astype(np.float32)
    opts = R.RenderOptions(canvas_size=canvas, tile_h=8, tile_w=16,
                           bin_h=8, bin_w=16, max_splat_px=12,
                           tile_capacity=capacity)
    p = jnp.asarray(positions)
    v = jnp.zeros((n, 2), jnp.float32)
    r = jnp.asarray(rng.uniform(0.5, 1.2, (n,)), jnp.float32)
    c = jnp.concatenate(
        [jnp.ones((n, 3)), jnp.asarray(rng.uniform(0.3, 1.0, (n, 1)))],
        axis=1).astype(jnp.float32)
    act = jnp.ones((n,), bool)
    center = jnp.asarray([64.0, 64.0], jnp.float32)
    args = (p, p, v, r, c, act, center, jnp.float32(1.0),
            jnp.float32(8.0), jnp.float32(0.0), opts)

    ref, _, _ = R.splat_population(*args, use_pallas=False)
    payload, _, counts = R._splat_payload(*args)
    nb = R._tile_bins(opts)
    got, _ = R._splat_alpha_kernel(payload, nb, opts, counts=counts,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_pallas_splat_kernel_particle_color_matches_scan_path():
    """The per-particle-color mode must ride the Pallas kernel (rgb
    accumulators) and reproduce the jnp scan path (the reference's
    experimental mode, test.lua:25-67)."""
    rng = np.random.default_rng(5)
    n, canvas = 200, 256
    positions = rng.uniform(20.0, 236.0, (n, 2)).astype(np.float32)
    vels = rng.normal(0.0, 40.0, (n, 2)).astype(np.float32)
    opts = R.RenderOptions(canvas_size=canvas, tile_h=8, tile_w=16,
                           bin_h=8, bin_w=8, max_splat_px=12,
                           tile_capacity=8, use_particle_color=True)
    p = jnp.asarray(positions)
    last = p - 0.2 * jnp.asarray(vels)
    v = jnp.asarray(vels)
    r = jnp.asarray(rng.uniform(0.5, 1.2, (n,)), jnp.float32)
    c = jnp.asarray(rng.uniform(0.1, 1.0, (n, 4)), jnp.float32)
    act = jnp.asarray(rng.random(n) < 0.9)
    center = jnp.asarray([128.0, 128.0], jnp.float32)
    args = (p, last, v, r, c, act, center, jnp.float32(0.7),
            jnp.float32(8.0), jnp.float32(0.002), opts)

    ref_a, ref_rgb, _ = R.splat_population(*args, use_pallas=False)

    payload, _, counts = R._splat_payload(*args)
    nb = R._tile_bins(opts)
    got_a, got_rgb = R._splat_alpha_kernel(payload, nb, opts, counts=counts,
                                           interpret=True, use_rgb=True)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(ref_a),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_rgb), np.asarray(ref_rgb),
                               rtol=1e-5, atol=1e-6)

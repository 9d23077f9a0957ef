"""Skybox: config parsing, presets, device render sanity."""

import numpy as np
import jax.numpy as jnp

from bonnie32_tpu.models import level as L
from bonnie32_tpu.models.skybox import Skybox
from bonnie32_tpu.ops import skybox as sky_ops
from bonnie32_tpu.ops import raster_ref
from bonnie32_tpu.models import build

LEVELS = "/root/reference/assets/samples/levels"


def test_parse_level_skyboxes():
    found = 0
    for name in ("Cave.ron", "Cathedral.ron", "Dungeon.ron", "West.ron"):
        lev = L.load_level(f"{LEVELS}/{name}")
        if lev.skybox is not None:
            sb = Skybox.from_ron(lev.skybox)
            assert sb is not None
            assert 0.0 <= sb.horizon <= 1.0
            found += 1
    assert found >= 1, "at least one sample level ships a skybox"


def test_sample_gradient_monotone_regions():
    sb = Skybox.preset_sunset()
    # zenith ~ zenith_color, nadir ~ nadir_color
    top = sb.sample_at_direction(np.float32(0.0), np.float32(0.0))
    bottom = sb.sample_at_direction(np.float32(0.0), np.float32(np.pi))
    np.testing.assert_allclose(top, sb.zenith_color, atol=1.5)
    np.testing.assert_allclose(bottom, sb.nadir_color, atol=1.5)


def test_generate_mesh_shapes():
    sb = Skybox.preset_night()
    dirs, colors, faces = sb.generate_sphere()
    assert dirs.shape == (33 * 49, 3)
    assert faces.shape == (48 * 32 * 2, 3)
    mdirs, mcolors, mfaces = sb.generate_mountains()
    assert len(mfaces) > 0, "night preset has a mountain range"


def test_device_render_skybox():
    sb = Skybox.preset_sunset()
    tables = sky_ops.build_sky_tables(sb)
    basis = build.camera_basis(0.1, 0.7)
    cam = build.make_camera((0.0, 0.0, 0.0), basis)
    fb = raster_ref.new_framebuffer(120, 160, depth_mode="inv")
    out = sky_ops.render_skybox(fb, tables, cam)
    word = np.asarray(out.color)
    r = word & 0xFF
    g = (word >> 8) & 0xFF
    b = (word >> 16) & 0xFF
    # every pixel covered, non-trivial variation (gradient), warm horizon
    assert ((word >> 24) & 0xFF).min() == 255
    assert r.std() > 5 and g.std() > 3
    assert float(np.asarray(out.depth).max()) == 0.0  # cleared depth

    # night preset draws stars
    sbn = Skybox.preset_night()
    tn = sky_ops.build_sky_tables(sbn)
    outn = sky_ops.render_skybox(fb, tn, cam, time=0.5)
    wn = np.asarray(outn.color)
    rn = wn & 0xFF
    assert rn.max() > 150, "bright star pixels present"


def test_exact_skybox_matches_scalar_golden():
    """render_skybox(exact=True) vs the scalar transcription of
    fb.render_skybox + render_stars (render.rs:81-299)."""
    import jax
    from golden import skybox_golden as G

    sb = Skybox.preset_night()   # has mountains + stars
    tables = sky_ops.build_sky_tables(sb)
    basis = build.camera_basis(0.15, 0.9)
    cam = build.make_camera((0.0, 0.0, 0.0), basis)
    H, W = 120, 160
    fb = raster_ref.new_framebuffer(H, W, depth_mode="inv")
    out = sky_ops.render_skybox(fb, tables, cam, time=0.0, exact=True)
    w = np.asarray(out.color)
    jpix = np.stack([w & 0xFF, (w >> 8) & 0xFF, (w >> 16) & 0xFF],
                    axis=-1).astype(np.uint8)

    gpix = np.zeros((H, W, 3), np.uint8)
    star_spec = dict(dirs=np.asarray(tables.star_dirs),
                     phase=np.asarray(tables.star_phase),
                     color=np.asarray(tables.star_color),
                     size=float(tables.star_size),
                     twinkle=float(tables.star_twinkle),
                     enabled=bool(tables.stars_enabled))
    G.render_skybox_scalar(gpix, np.asarray(tables.all_dirs),
                           np.asarray(tables.all_colors),
                           np.asarray(tables.all_faces), basis,
                           star_spec=star_spec, time=0.0)

    diff = (jpix != gpix).any(-1)
    covered = (gpix != 0).any(-1).mean()
    assert covered > 0.9, f"sky should cover the frame ({covered:.0%})"
    if jax.devices()[0].platform in ("tpu", "axon"):
        # bit-exact on TPU (no FMA contraction there)
        assert diff.sum() == 0, f"exact skybox: {diff.sum()} pixel diffs"
    else:
        # XLA:CPU contracts FMAs per fusion context: interpolated colors
        # can land one quantization step apart on gradient boundaries
        mag = np.abs(jpix.astype(np.int32) - gpix.astype(np.int32)).max(-1)
        assert (mag <= 1).all(), f"exact skybox: diffs beyond +-1 step"
        assert diff.mean() < 0.05, f"exact skybox: {diff.mean():.1%} diffs"


def test_fast_path_matches_host_sampler():
    """Every sphere pixel of the fast path is an analytic
    sample_at_direction evaluation at the pixel's exact direction: the
    host transcription evaluated at the same directions must agree to
    within 1 u8 step (device transcendentals differ from numpy's by
    ulps), with the overwhelming majority exact."""
    import dataclasses
    from bonnie32_tpu.config import PROJ_DISTANCE, PROJ_SCALE

    sb = dataclasses.replace(Skybox.preset_sunset(),
                             mountain_ranges=[None, None])
    tables = sky_ops.build_sky_tables(sb)
    basis = build.camera_basis(0.12, 1.3)
    cam = build.make_camera((0.0, 0.0, 0.0), basis)
    H, W = 120, 160
    fb = raster_ref.new_framebuffer(H, W, depth_mode="inv")
    word = np.asarray(sky_ops.render_skybox(fb, tables, cam).color)
    got = np.stack([word & 0xFF, (word >> 8) & 0xFF,
                    (word >> 16) & 0xFF], -1).astype(np.int32)

    # host-side replica of the per-pixel ray math (float32)
    yi, xi = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    vs = np.float32(min(W, H) / 2.0 * PROJ_SCALE)
    usq = np.float32(PROJ_DISTANCE - 1.0)
    ndc_x = ((xi + 0.5 - W / 2.0).astype(np.float32) / vs / usq)
    ndc_y = ((yi + 0.5 - H / 2.0).astype(np.float32) / vs / usq)
    norm = np.sqrt(ndc_x * ndc_x + ndc_y * ndc_y + 1.0)
    cx, cy, cz = ndc_x / norm, ndc_y / norm, 1.0 / norm
    b = np.asarray(basis, np.float32)
    wx = cx * b[0, 0] + cy * b[1, 0] + cz * b[2, 0]
    wy = cx * b[0, 1] + cy * b[1, 1] + cz * b[2, 1]
    wz = cx * b[0, 2] + cy * b[1, 2] + cz * b[2, 2]
    phi = np.arccos(np.clip(wy, -1.0, 1.0))
    theta = np.mod(np.arctan2(wz, wx), 2 * np.pi).astype(np.float32)
    want = np.clip(sb.sample_at_direction(theta, phi.astype(np.float32)),
                   0, 255).astype(np.int32)

    err = np.abs(got - want).max(-1)
    assert (err <= 1).all(), \
        f"{(err > 1).sum()} pixels beyond 1 step (max {err.max()})"
    assert (err == 0).mean() > 0.97, \
        f"only {(err == 0).mean():.1%} pixels exact"


def test_analytic_close_to_exact():
    """The fast LUT sky samples the ground-truth function the mesh path
    discretizes — bound their divergence so regressions are caught."""
    sb = Skybox.preset_sunset()
    tables = sky_ops.build_sky_tables(sb)
    basis = build.camera_basis(0.05, 2.1)
    cam = build.make_camera((0.0, 0.0, 0.0), basis)
    H, W = 120, 160
    fb = raster_ref.new_framebuffer(H, W, depth_mode="inv")
    fast = np.asarray(sky_ops.render_skybox(fb, tables, cam).color)
    ex = np.asarray(sky_ops.render_skybox(fb, tables, cam,
                                          exact=True).color)

    def unpack(w):
        return np.stack([w & 0xFF, (w >> 8) & 0xFF, (w >> 16) & 0xFF],
                        -1).astype(np.int32)

    a, b = unpack(fast), unpack(ex)
    # mean absolute channel error small; allow sparkle/seam outliers
    mae = np.abs(a - b).mean()
    assert mae < 4.0, f"analytic sky drifted from mesh sky (MAE {mae:.2f})"


def test_layout_skybox_bit_exact():
    """render_skybox_layout == to_layout(render_skybox(...).color) on
    every real pixel (padding lanes excluded) — the datagen path's
    transpose-free sky."""
    from bonnie32_tpu.ops import raster_batch as rb

    for preset in (Skybox.preset_night(), Skybox.preset_sunset()):
        tables = sky_ops.build_sky_tables(preset)
        basis = build.camera_basis(0.15, 0.9)
        cam = build.make_camera((0.0, 0.0, 0.0), basis)
        H, W = 120, 160
        fb = raster_ref.new_framebuffer(H, W, depth_mode="inv")
        normal = sky_ops.render_skybox(fb, tables, cam, time=0.25)
        lay = np.asarray(sky_ops.render_skybox_layout(tables, cam, H, W,
                                                      time=0.25))
        want = np.asarray(rb.to_layout(normal.color[None], W)[0])
        ngl = -(-W // 128)
        rows = np.arange(ngl * H)[:, None]
        lanes = np.arange(128)[None, :]
        mask = ((rows // H) * 128 + lanes) < W
        assert (((lay != want) & mask).sum()) == 0


def test_sky_kernel_path_matches_buffer_path():
    """The IN-KERNEL sky (phase-2 background synthesis + star post pass,
    round 5) must reproduce the sky-buffer path (render_skybox_layout ->
    fb_layout_color) pixel-for-pixel: same sphere math at the same
    directions, identical mountain expressions on identical projected
    scalars, identical star writes restricted to still-background
    pixels.  (The kernel's minimax acos/atan2 sit inside the same
    device-transcendental budget; on identical-backend interpret runs
    the two paths have matched bit-for-bit.)"""
    import jax
    from bonnie32_tpu.config import RasterSettings
    from bonnie32_tpu.models import scene_flat
    from bonnie32_tpu.ops import camera as cam_ops
    from tests import scenes

    verts, faces = scenes.cube_scene(tex_ids=(0, 0, 0, None, None, 0))
    tex = [scenes.checker_texture15(32, 32, with_black=False)]
    flat, static = scene_flat.compile_scene_flat(
        verts, faces, tex, scenes.DEFAULT_LIGHT_SPECS)
    settings = RasterSettings.game()
    n = 2
    H, W = 120, 160
    fb0 = raster_ref.new_framebuffer(H, W, depth_mode="inv")
    fbs = jnp.broadcast_to(fb0.color, (n,) + fb0.color.shape)
    from bonnie32_tpu.types import FrameBuffers
    fbs = FrameBuffers(
        color=jnp.broadcast_to(fb0.color, (n,) + fb0.color.shape),
        depth=jnp.broadcast_to(fb0.depth, (n,) + fb0.depth.shape))
    cams = cam_ops.orbit_cameras(np.asarray([0.3, 2.2], np.float32),
                                 0.35, 3.5)

    # night preset: mountains + stars + moon; sunset: tint/sun/haze
    for preset in (Skybox.preset_night(), Skybox.preset_sunset()):
        tables = sky_ops.build_sky_tables(preset)
        assert sky_ops.sky_kernel_ok(tables, static, settings)
        skyc = jax.vmap(lambda c, t=tables: sky_ops.render_skybox_layout(
            t, c, H, W))(cams)
        ref = scene_flat.render_level_flat(
            fbs, flat, static, cams, settings, height=H, width=W,
            interpret=True, fb_layout_color=skyc)
        out = scene_flat.render_level_flat(
            fbs, flat, static, cams, settings, height=H, width=W,
            interpret=True, sky=tables)
        cr = np.asarray(ref.color)
        co = np.asarray(out.color)
        err = 0
        for s in (0, 8, 16, 24):
            err = max(err, np.abs(((cr >> s) & 255).astype(int)
                                  - ((co >> s) & 255).astype(int)).max())
        diffs = (cr != co).sum()
        assert err <= 1 and diffs <= cr.size * 0.001, \
            f"in-kernel sky diverged: {diffs} diffs, max step {err}"
        np.testing.assert_array_equal(np.asarray(ref.depth),
                                      np.asarray(out.depth))


def test_sky_kernel_ok_gating():
    """Routing: combinations whose in-kernel ordering would be wrong
    (stars over in-kernel transparency, x-ray, painter's) fall back to
    the sky-buffer path."""
    import dataclasses
    from bonnie32_tpu.config import RasterSettings

    class _S:  # minimal FlatSceneStatic stand-in
        def __init__(self, tr):
            self.transparent_idx = tr

    tables = sky_ops.build_sky_tables(Skybox.preset_night())
    game = RasterSettings.game()
    assert sky_ops.sky_kernel_ok(tables, _S(()), game)
    # stars + transparent faces -> buffer path
    assert not sky_ops.sky_kernel_ok(tables, _S((3, 5)), game)
    # x-ray / painter's -> buffer path
    assert not sky_ops.sky_kernel_ok(
        tables, _S(()), RasterSettings.game(xray_mode=True))
    assert not sky_ops.sky_kernel_ok(
        tables, _S(()), RasterSettings.game(use_zbuffer=False))
    # starless sky + transparent faces is fine
    sb = dataclasses.replace(
        Skybox.preset_night(),
        stars=dataclasses.replace(Skybox.preset_night().stars,
                                  enabled=False))
    t2 = sky_ops.build_sky_tables(sb)
    assert sky_ops.sky_kernel_ok(t2, _S((3, 5)), game)

"""End-to-end parity: JAX rasterizer vs the golden numpy model.

The golden model is a literal transcription of render_mesh_15; the JAX
pipeline must produce *identical* RGBA output for the PS1 fixed-point
configurations (integer screen coordinates make every float op exact), and
near-identical for float-projection configurations (documented divergence:
direct vs incremental edge functions).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bonnie32_tpu.config import RasterSettings, ShadingMode, BlendMode
from bonnie32_tpu.models import build
from bonnie32_tpu.render import render_mesh_15 as jax_render
from bonnie32_tpu.ops import raster_ref
from bonnie32_tpu.types import default_lights, no_fog

from golden import raster_golden as gold
import scenes


W, H = 160, 120  # small frame: keeps the golden model fast


def run_both(vertices, faces, textures, campos, basis, settings,
             light_specs=None, fog=None, depth_mode="harmonic"):
    light_specs = light_specs if light_specs is not None else scenes.DEFAULT_LIGHT_SPECS

    # --- golden ---
    gfb = gold.new_framebuffer(W, H)
    gsettings = dict(
        affine_textures=settings.affine_textures,
        use_zbuffer=settings.use_zbuffer,
        shading=int(settings.shading),
        backface_cull=settings.backface_cull,
        ambient=settings.ambient,
        dithering=settings.dithering,
        xray_mode=settings.xray_mode,
        use_fixed_point=settings.use_fixed_point,
        ortho=None,
        backface_wireframe=settings.backface_wireframe,
        wireframe_overlay=settings.wireframe_overlay,
    )
    # Light constructors normalize directions (types.rs:1318-1321, 1355-1368).
    glights = []
    for spec in light_specs:
        spec = dict(spec)
        if "direction" in spec:
            d = np.asarray(spec["direction"], np.float32)
            l = np.float32(np.sqrt(np.float32(
                np.float32(d[0] * d[0]) + np.float32(d[1] * d[1])) + np.float32(d[2] * d[2])))
            if l != 0:
                spec["direction"] = (d / l).astype(np.float32)
        glights.append(spec)
    gtex = [dict(pixels=np.asarray(p, np.int64), blend_mode=b) for p, b in textures]
    gold.render_mesh_15(gfb, vertices, faces, gtex,
                        dict(position=campos, basis=basis),
                        gsettings, glights, fog=fog)

    # --- jax ---
    mesh, fa = scenes.to_jax_scene(vertices, faces)
    atlas = build.build_atlas(textures)
    cam = build.make_camera(campos, basis)
    lights = build.lights_from_list(light_specs, ambient=settings.ambient)
    jfog = no_fog() if fog is None else scenes.make_fog(fog[0], fog[1], fog[2], fog[3])
    fb = raster_ref.new_framebuffer(H, W, depth_mode=depth_mode)
    out = jax_render(fb, mesh, fa, atlas, cam, lights, jfog, settings,
                     depth_mode=depth_mode)

    word = np.asarray(out.color)
    jpix = np.stack([(word >> 0) & 0xFF, (word >> 8) & 0xFF,
                     (word >> 16) & 0xFF, (word >> 24) & 0xFF],
                    axis=-1).astype(np.uint8)
    return gfb["pixels"], jpix


def _seam_budget(npixels):
    """Allowed mismatching pixels.

    On TPU (the target hardware) parity is bit-exact: budget 0.  XLA:CPU
    contracts a*b+c into FMA (verified empirically), which can flip the
    winner of near-tie depth tests on triangle seams — allow a handful of
    seam pixels there.
    """
    import jax
    platform = jax.devices()[0].platform
    if platform in ("tpu", "axon"):
        return 0
    return max(4, npixels // 2000)


def assert_identical(gpix, jpix, context=""):
    if not np.array_equal(gpix, jpix):
        diff = np.any(gpix != jpix, axis=-1)
        budget = _seam_budget(diff.size)
        if diff.sum() <= budget:
            return
        frac = diff.mean()
        ys, xs = np.where(diff)
        k = min(5, len(ys))
        samples = [(int(ys[i]), int(xs[i]), gpix[ys[i], xs[i]].tolist(),
                    jpix[ys[i], xs[i]].tolist()) for i in range(k)]
        raise AssertionError(
            f"{context}: {diff.sum()} mismatched pixels ({frac:.2%}, "
            f"budget {budget}); samples (y,x,gold,jax): {samples}")


BASIS = build.camera_basis(0.35, 0.6)
CAMPOS = np.array([-1.8, -1.5, -3.2], np.float32)


def standard_scene(**cube_kw):
    tex = [scenes.checker_texture15(32, 32, with_black=True, with_transparent=True),
           scenes.checker_texture15(16, 16, c1=0x7C00, c2=0x03E0)]
    vertex_colors = [(128, 128, 128), (255, 64, 64), (40, 200, 90),
                     (128, 128, 128), (200, 200, 0), (90, 90, 255)]
    verts, faces = scenes.cube_scene(tex_ids=(0, 1, 0, None, None, 1),
                                     vertex_colors=vertex_colors, **cube_kw)
    return verts, faces, tex


def test_parity_ps1_default():
    """Game defaults: fixed-point, z-buffer, Gouraud, dithering, RGB555."""
    verts, faces, tex = standard_scene()
    s = RasterSettings.game()
    g, j = run_both(verts, faces, tex, CAMPOS, BASIS, s)
    assert (g[..., 3] == 255).any(), "scene should cover some pixels"
    assert_identical(g, j, "ps1_default")


def test_parity_painters():
    """Painter's algorithm (no z-buffer): draw order & sorting semantics."""
    verts, faces, tex = standard_scene()
    s = RasterSettings.game(use_zbuffer=False)
    g, j = run_both(verts, faces, tex, CAMPOS, BASIS, s)
    assert_identical(g, j, "painters")


def test_parity_no_dither_flat():
    verts, faces, tex = standard_scene()
    s = RasterSettings.game(dithering=False, shading=ShadingMode.FLAT)
    g, j = run_both(verts, faces, tex, CAMPOS, BASIS, s)
    assert_identical(g, j, "flat_nodither")


def test_parity_shading_none():
    verts, faces, tex = standard_scene()
    s = RasterSettings.game(shading=ShadingMode.NONE)
    g, j = run_both(verts, faces, tex, CAMPOS, BASIS, s)
    assert_identical(g, j, "shading_none")


def test_parity_black_opaque():
    """black_transparent=False: black texels become drawable black."""
    verts, faces, tex = standard_scene(black_transparent=False)
    s = RasterSettings.game()
    g, j = run_both(verts, faces, tex, CAMPOS, BASIS, s)
    assert_identical(g, j, "black_opaque")


def test_parity_blend_modes():
    """Semi-transparent textures exercise the transparent pass + blending."""
    tex = [scenes.checker_texture15(32, 32, with_black=True),
           scenes.checker_texture15(16, 16, c1=0xFC00 | 0x8000, c2=0x83E0,
                                    blend_mode=int(BlendMode.AVERAGE))]
    verts, faces = scenes.cube_scene(tex_ids=(0, 1, 0, 1, None, 1))
    # second cube behind, additive
    tex.append(scenes.checker_texture15(8, 8, c1=0x9E60, c2=0x8421,
                                        blend_mode=int(BlendMode.ADD)))
    v2, f2 = scenes.cube_scene(tex_ids=(2, 2, 2, 2, 2, 2), size=1.4,
                               center=(0.4, 0.2, 1.2))
    off = len(verts)
    for f in f2:
        f["v0"] += off
        f["v1"] += off
        f["v2"] += off
    verts += v2
    faces += f2
    s = RasterSettings.game()
    g, j = run_both(verts, faces, tex, CAMPOS, BASIS, s)
    assert_identical(g, j, "blend_modes")


def test_parity_fog():
    verts, faces, tex = standard_scene()
    s = RasterSettings.game()
    fog = (2.0, 4.0, 30.0, (90, 110, 140))
    g, j = run_both(verts, faces, tex, CAMPOS, BASIS, s, fog=fog)
    assert_identical(g, j, "fog")


def test_parity_editor_alpha_and_backfaces():
    verts, faces, tex = standard_scene(editor_alpha=140)
    s = RasterSettings(backface_cull=False, backface_wireframe=False)
    g, j = run_both(verts, faces, tex, CAMPOS, BASIS, s)
    assert_identical(g, j, "editor_alpha_backfaces")


def test_parity_xray():
    verts, faces, tex = standard_scene()
    s = RasterSettings.game(xray_mode=True)
    g, j = run_both(verts, faces, tex, CAMPOS, BASIS, s)
    assert_identical(g, j, "xray")


def test_parity_float_projection_close():
    """Float path: direct vs incremental edge functions may differ by ~1 ulp
    at triangle edges — require sub-0.5% pixel disagreement."""
    verts, faces, tex = standard_scene()
    s = RasterSettings.game(use_fixed_point=False)
    g, j = run_both(verts, faces, tex, CAMPOS, BASIS, s)
    frac = np.any(g != j, axis=-1).mean()
    assert frac < 0.005, f"float path divergence too high: {frac:.3%}"


def test_fast_path_matches_golden():
    """Visibility-reduction rasterizer vs golden on the PS1 default config."""
    verts, faces, tex = standard_scene()
    s = RasterSettings.game()
    g, j = run_both(verts, faces, tex, CAMPOS, BASIS, s, depth_mode="fast")
    assert_identical(g, j, "fast_default")


def test_fast_path_matches_golden_blends():
    tex = [scenes.checker_texture15(32, 32, with_black=True, with_transparent=True),
           scenes.checker_texture15(16, 16, c1=0xFC00 | 0x8000, c2=0x83E0,
                                    blend_mode=int(BlendMode.AVERAGE))]
    verts, faces = scenes.cube_scene(tex_ids=(0, 1, 0, 1, None, 1))
    s = RasterSettings.game()
    g, j = run_both(verts, faces, tex, CAMPOS, BASIS, s, depth_mode="fast")
    assert_identical(g, j, "fast_blends")


def test_parity_backface_wireframe():
    """Editor default: depth-tested backface wireframe (render.rs:2576)."""
    verts, faces, tex = standard_scene()
    s = RasterSettings()  # backface_wireframe defaults on
    gpix, jpix = run_both(verts, faces, tex, CAMPOS, BASIS, s)
    assert_identical(gpix, jpix, "backface wireframe")
    # wireframe color actually appears somewhere
    assert (np.all(jpix[..., :3] == (80, 80, 100), axis=-1)).any()


def test_parity_wireframe_overlay():
    """Overlay mode: no solids, bright front-face edges (render.rs:2550)."""
    verts, faces, tex = standard_scene()
    s = RasterSettings.game(wireframe_overlay=True)
    gpix, jpix = run_both(verts, faces, tex, CAMPOS, BASIS, s)
    assert_identical(gpix, jpix, "wireframe overlay")
    assert (np.all(jpix[..., :3] == (200, 200, 220), axis=-1)).any()
    # solids skipped: only background + line colors present
    lit = jpix[..., 3] == 255
    assert np.all(np.all(jpix[lit][:, :3] == (200, 200, 220), axis=-1))


def test_line_pixels_closed_form():
    """Closed-form Bresenham == the reference walk, including the screen-clip
    step offset, over random segments with far-offscreen endpoints."""
    import jax
    from bonnie32_tpu.ops import wireframe as wf

    rng = np.random.default_rng(7)
    Wd, Hd = 64, 48
    f = jax.jit(lambda a, b, c, d: wf.line_pixels(a, b, c, d, Wd, Hd, 128))
    for _ in range(200):
        span = int(rng.choice([8, 60, 500, 4000]))
        x0, y0, x1, y1 = [int(v) for v in rng.integers(-span, span, 4)]
        want = [(x, y, st) for (x, y, st) in gold._bresenham(x0, y0, x1, y1)
                if 0 <= x < Wd and 0 <= y < Hd]
        xs, ys, t, ok = f(x0, y0, x1, y1)
        xs, ys, ok = np.asarray(xs), np.asarray(ys), np.asarray(ok)
        onscreen = ok & (xs >= 0) & (xs < Wd) & (ys >= 0) & (ys < Hd)
        got = list(zip(xs[onscreen].tolist(), ys[onscreen].tolist()))
        assert got == [(x, y) for (x, y, _) in want], (x0, y0, x1, y1)
        # t parameter matches step/total
        total = max(abs(x1 - x0), abs(y1 - y0), 1)
        tt = np.asarray(t)[onscreen]
        np.testing.assert_allclose(
            tt, [st / total for (_, _, st) in want], rtol=1e-6)


def test_parity_ortho_projection():
    """Orthographic editor views (math.rs:140; render.rs:2323-2327)."""
    from bonnie32_tpu.config import OrthoProjection
    verts, faces, tex = standard_scene()
    s = RasterSettings.game(
        use_fixed_point=False,
        ortho_projection=OrthoProjection(zoom=40.0, center_x=0.0, center_y=0.0))
    # golden needs the ortho dict
    gfb = gold.new_framebuffer(W, H)
    gsettings = dict(affine_textures=True, use_zbuffer=True, shading=2,
                     backface_cull=True, ambient=s.ambient, dithering=True,
                     xray_mode=False, use_fixed_point=False,
                     ortho=dict(zoom=40.0, center_x=0.0, center_y=0.0))
    glights = []
    gtex = [dict(pixels=np.asarray(p, np.int64), blend_mode=b) for p, b in tex]
    # top-down ortho camera (camera.rs:35-45)
    basis = np.array([[-1, 0, 0], [0, 0, 1], [0, 1, 0]], np.float32)
    campos = np.array([0, -10, 0], np.float32)
    gold.render_mesh_15(gfb, verts, faces, gtex,
                        dict(position=campos, basis=basis), gsettings, glights)

    mesh, fa = scenes.to_jax_scene(verts, faces)
    atlas = build.build_atlas(tex)
    cam = build.make_camera(campos, basis)
    lights = build.lights_from_list([], ambient=s.ambient)
    fb = raster_ref.new_framebuffer(H, W, depth_mode="harmonic")
    out = jax_render(fb, mesh, fa, atlas, cam, lights, no_fog(), s,
                     depth_mode="harmonic")
    word = np.asarray(out.color)
    jpix = np.stack([(word >> 0) & 0xFF, (word >> 8) & 0xFF,
                     (word >> 16) & 0xFF, (word >> 24) & 0xFF],
                    axis=-1).astype(np.uint8)
    assert (jpix[..., 3] == 255).any(), "ortho view shows the cube"
    frac = np.any(gfb["pixels"] != jpix, axis=-1).mean()
    assert frac < 0.01, f"ortho divergence {frac:.2%}"


def test_inv_depth_mode_matches_harmonic():
    """The fast inverse-z ordering must reproduce the harmonic-z image."""
    verts, faces, tex = standard_scene()
    s = RasterSettings.game()
    _, j_harm = run_both(verts, faces, tex, CAMPOS, BASIS, s, depth_mode="harmonic")
    _, j_inv = run_both(verts, faces, tex, CAMPOS, BASIS, s, depth_mode="inv")
    assert_identical(j_harm, j_inv, "inv_vs_harmonic")


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-x"])

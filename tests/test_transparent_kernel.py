"""In-kernel transparent pass (raster_batch phase 3) vs the sequential
compositor and render_mesh_15.

Round-5 replacement for scene_flat._transparent_pass on the kernel path
(VERDICT r4 item 2): the static transparent-face list composites
back-to-front INSIDE the fused Pallas kernel (render.rs:2547-2570 +
set_pixel_blended_15 render.rs:479) instead of re-rasterizing the full
frame per face through the scalar oracle.  These tests pin, for every PS1
blend mode plus editor-alpha and keyed textures:

  * phase 3 == the sequential compositor path ("seqtrans" debug) on the
    SAME prep (strictest possible A/B — only the rasterizer differs);
  * phase 3 == render_mesh_15 (the golden-chain path).

Pallas interpret mode on CPU; seam budgets cover XLA:CPU FMA contraction
(bit-exact asserts belong on TPU runs — CLAUDE.md conventions).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import scenes
from bonnie32_tpu.config import BlendMode, RasterSettings, ShadingMode
from bonnie32_tpu.models import build
from bonnie32_tpu.models import scene_flat
from bonnie32_tpu.ops import camera as cam_ops
from bonnie32_tpu.ops import raster_ref
from bonnie32_tpu.render import render_mesh_15
from bonnie32_tpu.types import no_fog

H, W = 120, 160


def _seam_budget(npixels, n_inst):
    if jax.devices()[0].platform in ("tpu", "axon"):
        return 0
    return max(64 * n_inst, npixels // 500)


def _render_pair(verts, faces, tex, settings, n=2, debug=""):
    flat, static = scene_flat.compile_scene_flat(
        verts, faces, tex, scenes.DEFAULT_LIGHT_SPECS)
    assert scene_flat.kernel_path_ok(static, settings)
    fb0 = raster_ref.new_framebuffer(H, W, depth_mode="inv",
                                     clear_color=0x40302010)
    cams = cam_ops.orbit_cameras(
        jnp.asarray(np.arange(n, dtype=np.float32) * 0.9 + 0.2), 0.4, 3.2)
    fbs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), fb0)
    out = scene_flat.render_level_flat(fbs, flat, static, cams, settings,
                                       height=H, width=W, interpret=True,
                                       debug=debug)
    return flat, static, fb0, cams, out


def _mixed_blend_scene(editor_alpha=255, with_black=True,
                       with_transparent=True):
    """Cube with every non-opaque blend mode represented: textured keyed
    faces, a texture whose own blend mode is AVERAGE, plus an untextured
    (vertex-colored) blended face."""
    tex = [scenes.checker_texture15(32, 32, with_black=with_black,
                                    with_transparent=with_transparent),
           scenes.checker_texture15(16, 16, c1=0x03E0, c2=0x7C1F,
                                    blend_mode=int(BlendMode.AVERAGE))]
    # cube faces 0..5 cycle through all five non-opaque modes; face 3 is
    # untextured (tex_id None -> vertex-colored)
    blend_modes = (int(BlendMode.AVERAGE), int(BlendMode.ADD),
                   int(BlendMode.SUBTRACT), int(BlendMode.ADD_QUARTER),
                   int(BlendMode.ERASE), int(BlendMode.OPAQUE))
    verts, faces = scenes.cube_scene(
        tex_ids=(0, 1, 0, None, 1, 0),
        vertex_colors=[(200, 120, 60), (60, 200, 120), (120, 60, 200),
                       (230, 230, 40), (40, 230, 230), (128, 128, 128)],
        blend_modes=blend_modes, editor_alpha=editor_alpha)
    return verts, faces, tex


@pytest.mark.parametrize("editor_alpha", [255, 128, 0])
def test_phase3_matches_sequential_compositor(editor_alpha):
    verts, faces, tex = _mixed_blend_scene(editor_alpha=editor_alpha)
    settings = RasterSettings.game()
    flat, static, fb0, cams, out = _render_pair(verts, faces, tex, settings)
    assert static.transparent_idx, "scene must exercise the transparent list"

    # identical prep, sequential compositor for the transparent pass
    fbs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (2,) + x.shape), fb0)
    ref = scene_flat.render_level_flat(fbs, flat, static, cams, settings,
                                       height=H, width=W, interpret=True,
                                       debug="seqtrans")
    diff = (np.asarray(out.color) != np.asarray(ref.color))
    budget = _seam_budget(diff.size, 2)
    assert diff.sum() <= budget, \
        f"ea={editor_alpha}: {diff.sum()} diffs vs seqtrans (budget {budget})"
    # depth must be untouched by the transparent pass in both paths
    ddiff = (np.asarray(out.depth) != np.asarray(ref.depth))
    assert ddiff.sum() == 0, f"depth diverged: {ddiff.sum()}"


def test_phase3_matches_render_mesh():
    verts, faces, tex = _mixed_blend_scene()
    settings = RasterSettings.game()
    flat, static, fb0, cams, out = _render_pair(verts, faces, tex, settings)

    mesh, fa = scenes.to_jax_scene(verts, faces)
    atlas = build.build_atlas(tex)
    lights = build.lights_from_list(scenes.DEFAULT_LIGHT_SPECS)
    for i in range(2):
        cam_i = jax.tree_util.tree_map(lambda x: x[i], cams)
        ref = render_mesh_15(fb0, mesh, fa, atlas, cam_i, lights, no_fog(),
                             settings, depth_mode="fast")
        diff = (np.asarray(out.color[i]) != np.asarray(ref.color))
        budget = _seam_budget(diff.size, 1)
        assert diff.sum() <= budget, \
            f"inst {i}: {diff.sum()} diffs vs render_mesh_15 ({budget})"


def test_phase3_flat_and_none_shading():
    verts, faces, tex = _mixed_blend_scene()
    for variant in (dict(shading=ShadingMode.FLAT),
                    dict(shading=ShadingMode.NONE, dithering=False)):
        settings = RasterSettings.game(**variant)
        flat, static, fb0, cams, out = _render_pair(verts, faces, tex,
                                                    settings)
        fbs = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (2,) + x.shape), fb0)
        ref = scene_flat.render_level_flat(fbs, flat, static, cams,
                                           settings, height=H, width=W,
                                           interpret=True, debug="seqtrans")
        diff = (np.asarray(out.color) != np.asarray(ref.color))
        budget = _seam_budget(diff.size, 2)
        assert diff.sum() <= budget, f"{variant}: {diff.sum()} diffs"


def test_phase3_painters_mode():
    """Painter's mode: transparent faces composite with no z-test; the
    kernel path must match the sequential compositor."""
    verts, faces, tex = _mixed_blend_scene()
    settings = RasterSettings.game(use_zbuffer=False)
    flat, static, fb0, cams, out = _render_pair(verts, faces, tex, settings)
    fbs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (2,) + x.shape), fb0)
    ref = scene_flat.render_level_flat(fbs, flat, static, cams, settings,
                                       height=H, width=W, interpret=True,
                                       debug="seqtrans")
    diff = (np.asarray(out.color) != np.asarray(ref.color))
    budget = _seam_budget(diff.size, 2)
    assert diff.sum() <= budget, f"painters: {diff.sum()} diffs"


def test_phase3_nonaffine_falls_back():
    """Perspective-correct UVs use exact_div in the sequential pass —
    phase 3 must NOT engage (no f64 in Mosaic); the fallback still
    renders correctly."""
    verts, faces, tex = _mixed_blend_scene()
    settings = RasterSettings.game(affine_textures=False)
    flat, static, fb0, cams, out = _render_pair(verts, faces, tex, settings)
    fbs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (2,) + x.shape), fb0)
    ref = scene_flat.render_level_flat(fbs, flat, static, cams, settings,
                                       height=H, width=W, interpret=True,
                                       debug="seqtrans")
    assert (np.asarray(out.color) == np.asarray(ref.color)).all()


def test_xray_kernel_matches_render_mesh():
    """X-ray through the kernel (round 5): phase 3 composites EVERY face
    in draw order with the 50% blend and no depth writes
    (render.rs:507-526); phases 1-2 are skipped."""
    verts, faces, tex = _mixed_blend_scene()
    settings = RasterSettings.game(xray_mode=True)
    flat, static, fb0, cams, out = _render_pair(verts, faces, tex, settings)

    mesh, fa = scenes.to_jax_scene(verts, faces)
    atlas = build.build_atlas(tex)
    lights = build.lights_from_list(scenes.DEFAULT_LIGHT_SPECS)
    for i in range(2):
        cam_i = jax.tree_util.tree_map(lambda x: x[i], cams)
        ref = render_mesh_15(fb0, mesh, fa, atlas, cam_i, lights, no_fog(),
                             settings, depth_mode="fast")
        diff = (np.asarray(out.color[i]) != np.asarray(ref.color))
        budget = _seam_budget(diff.size, 1)
        assert diff.sum() <= budget, \
            f"xray inst {i}: {diff.sum()} diffs vs render_mesh_15 ({budget})"
        # x-ray never writes depth: output must equal the cleared buffer
        ddiff = (np.asarray(out.depth[i]) != np.asarray(ref.depth))
        assert ddiff.sum() == 0, f"xray depth diverged: {ddiff.sum()}"


def test_xray_kernel_matches_sequential_level():
    """X-ray on a real level (Cave): per-room draw groups must composite
    in room order exactly as the per-room sequential path."""
    from bonnie32_tpu.models import level as L
    from bonnie32_tpu.models import scene as scene_mod
    from bonnie32_tpu.models import texture_pack as tp

    level = L.load_level(
        "/root/reference/assets/samples/levels/Cave.ron")
    textures = tp.load_texture_packs(
        "/root/reference/assets/samples/texture-packs")
    resolve = tp.make_resolver(textures)
    flat, static = scene_flat.compile_level_flat(level, textures, resolve)
    seq = scene_mod.compile_level(level, textures, resolve)
    settings = RasterSettings.game(xray_mode=True)
    assert scene_flat.kernel_path_ok(static, settings)

    r0 = level.rooms[0]
    for x, z, s in r0.iter_sectors():
        if s.floor is not None:
            px = float(r0.position[0]) + (x + 0.5) * 1024.0
            pz = float(r0.position[2]) + (z + 0.5) * 1024.0
            fi = level.get_floor_info((px, 0.0, pz))
            pos = (px, fi.floor - 800.0, pz)
            break
    cam = build.make_camera(np.asarray(pos, np.float32),
                            build.camera_basis(0.15, 0.4))
    cams = jax.tree_util.tree_map(lambda x: jnp.stack([x]), cam)
    fb0 = raster_ref.new_framebuffer(H, W, depth_mode="inv")
    fbs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (1,) + x.shape), fb0)
    out = scene_flat.render_level_flat(fbs, flat, static, cams, settings,
                                       height=H, width=W, interpret=True)
    ref = scene_mod.render_level(fb0, seq, cam, settings, depth_mode="fast")
    c_new = np.asarray(out.color[0])
    c_ref = np.asarray(ref.color)
    assert (c_ref != c_ref.reshape(-1)[0]).mean() > 0.1
    diff = c_new != c_ref
    budget = _seam_budget(diff.size, 1)
    assert diff.sum() <= budget, \
        f"xray cave: {diff.sum()} diffs (budget {budget})"

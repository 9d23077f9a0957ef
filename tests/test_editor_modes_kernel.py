"""Editor render modes through the batched kernel path (round 4).

VERDICT r03 "missing #5": xray/editor-alpha/wireframe lived only in the
sequential paths.  Now the fused kernel covers:

  * painter's mode (use_zbuffer=False): prep sorts faces back-to-front per
    draw group (render.rs:2525-2542) and the kernel merges by draw order;
  * wireframe_overlay: solid passes skipped (render.rs:2550), front edges
    drawn by the batched closed-form Bresenham pass — exact for any group
    count (order-independent);
  * backface wireframes: post-kernel depth-tested line pass, single draw
    group only (per-group solid/wire interleave cannot flatten).

X-ray stays sequential: it 50%-blends EVERY covered face per pixel in
draw order (render.rs:507-526), which a winner-resolve kernel cannot
express — kernel_path_ok must keep rejecting it.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bonnie32_tpu.config import RasterSettings, WIDTH, HEIGHT
from bonnie32_tpu.models import level as L
from bonnie32_tpu.models import scene as scene_mod
from bonnie32_tpu.models import scene_flat
from bonnie32_tpu.models import texture_pack as tp
from bonnie32_tpu.models import build
from bonnie32_tpu.ops import raster_ref

import scenes

LEVELS = "/root/reference/assets/samples/levels"
PACKS = "/root/reference/assets/samples/texture-packs"


def _seam_budget(npixels, n_inst):
    if jax.devices()[0].platform in ("tpu", "axon"):
        return 0
    return max(64 * n_inst, npixels // 500)


@pytest.fixture(scope="module")
def cave():
    level = L.load_level(f"{LEVELS}/Cave.ron")
    textures = tp.load_texture_packs(PACKS)
    resolve = tp.make_resolver(textures)
    flat, static = scene_flat.compile_level_flat(level, textures, resolve)
    seq = scene_mod.compile_level(level, textures, resolve)
    return level, flat, static, seq


def _cams(level, n):
    fi_pos = []
    r0 = level.rooms[0]
    for x, z, s in r0.iter_sectors():
        if s.floor is not None:
            px = float(r0.position[0]) + (x + 0.5) * 1024.0
            pz = float(r0.position[2]) + (z + 0.5) * 1024.0
            fi = level.get_floor_info((px, 0.0, pz))
            fi_pos.append((px, fi.floor - 800.0, pz))
            if len(fi_pos) >= n:
                break
    while len(fi_pos) < n:
        fi_pos.append(fi_pos[-1])
    cams = []
    for i, p in enumerate(fi_pos):
        basis = build.camera_basis(0.1 + 0.2 * i, 0.7 * i)
        cams.append(build.make_camera(np.asarray(p, np.float32), basis))
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)


def _run_both(level, flat, static, seq, settings, n=2):
    cams = _cams(level, n)
    fb0 = raster_ref.new_framebuffer(HEIGHT, WIDTH, depth_mode="inv")
    fbs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), fb0)
    out = scene_flat.render_level_flat(fbs, flat, static, cams, settings,
                                       height=HEIGHT, width=WIDTH,
                                       interpret=True)
    ref = jax.vmap(lambda c: scene_mod.render_level(
        fb0, seq, c, settings, depth_mode="fast"))(cams)
    return out, ref, n


def test_painters_mode_kernel_matches_sequential(cave):
    level, flat, static, seq = cave
    settings = RasterSettings.game(use_zbuffer=False)
    assert scene_flat.kernel_path_ok(static, settings)

    out, ref, n = _run_both(level, flat, static, seq, settings)
    c_new = np.asarray(out.color)
    c_ref = np.asarray(ref.color)
    drawn = (c_ref != c_ref.reshape(n, -1)[:, :1, None]).any(-1)
    assert drawn.mean() > 0.2, "cameras should see the cave walls"
    diff = (c_new != c_ref).any(-1)
    budget = _seam_budget(diff.size, n)
    assert diff.sum() <= budget, \
        f"painter's flat vs sequential: {diff.sum()} diffs (budget {budget})"
    # painter's never writes depth: both paths must return the clear plane
    assert (np.asarray(out.depth) == 0.0).all()
    assert (np.asarray(ref.depth) == 0.0).all()


def test_painters_cube_matches_render_mesh():
    from bonnie32_tpu.ops import camera as cam_ops
    from bonnie32_tpu.render import render_mesh_15
    from bonnie32_tpu.types import no_fog

    settings = RasterSettings.game(use_zbuffer=False)
    tex = [scenes.checker_texture15(32, 32, with_black=False)]
    verts, faces = scenes.cube_scene(tex_ids=(0, 0, 0, 0, 0, 0))
    flat, static = scene_flat.compile_scene_flat(
        verts, faces, tex, scenes.DEFAULT_LIGHT_SPECS)
    assert scene_flat.kernel_path_ok(static, settings)

    fb0 = raster_ref.new_framebuffer(HEIGHT, WIDTH, depth_mode="inv")
    cams = cam_ops.orbit_cameras(
        jnp.asarray(np.arange(2, dtype=np.float32) * 0.7), 0.35, 3.5)
    fbs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (2,) + x.shape), fb0)
    out = scene_flat.render_level_flat(fbs, flat, static, cams, settings,
                                       height=HEIGHT, width=WIDTH,
                                       interpret=True)

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
            f"painter's cube inst {i}: {diff.sum()} diffs (budget {budget})"


def test_wireframe_overlay_kernel_matches_sequential(cave):
    level, flat, static, seq = cave
    # game preset = backface wires off; overlay on is the editor's
    # "wireframe" display toggle.
    settings = RasterSettings.game(wireframe_overlay=True)
    assert scene_flat.kernel_path_ok(static, settings)

    out, ref, n = _run_both(level, flat, static, seq, settings)
    c_new = np.asarray(out.color)
    c_ref = np.asarray(ref.color)
    clear = c_ref.reshape(n, -1)[:, :1, None]
    assert (c_ref != clear).any(), "overlay must draw some wire pixels"
    diff = (c_new != c_ref).any(-1)
    budget = _seam_budget(diff.size, n)
    assert diff.sum() <= budget, \
        f"overlay flat vs sequential: {diff.sum()} diffs (budget {budget})"


def test_backface_wireframe_single_group_cube():
    from bonnie32_tpu.ops import camera as cam_ops
    from bonnie32_tpu.render import render_mesh_15
    from bonnie32_tpu.types import no_fog

    # default settings: backface_cull + backface_wireframe (the modeler /
    # world-editor default view)
    settings = RasterSettings()
    tex = [scenes.checker_texture15(32, 32, with_black=False)]
    verts, faces = scenes.cube_scene(tex_ids=(0, 0, 0, 0, 0, 0))
    flat, static = scene_flat.compile_scene_flat(
        verts, faces, tex, scenes.DEFAULT_LIGHT_SPECS)
    assert static.n_draw_groups == 1
    assert scene_flat.kernel_path_ok(static, settings)

    fb0 = raster_ref.new_framebuffer(HEIGHT, WIDTH, depth_mode="inv")
    cams = cam_ops.orbit_cameras(
        jnp.asarray(np.arange(2, dtype=np.float32) * 0.7), 0.35, 3.5)
    fbs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (2,) + x.shape), fb0)
    out = scene_flat.render_level_flat(fbs, flat, static, cams, settings,
                                       height=HEIGHT, width=WIDTH,
                                       interpret=True)

    mesh, fa = scenes.to_jax_scene(verts, faces)
    atlas = build.build_atlas(tex)
    lights = build.lights_from_list(scenes.DEFAULT_LIGHT_SPECS)
    from bonnie32_tpu.ops.wireframe import BACKFACE_COLOR
    back_word = (BACKFACE_COLOR[0] | (BACKFACE_COLOR[1] << 8)
                 | (BACKFACE_COLOR[2] << 16) | (255 << 24))
    back_word = back_word - (1 << 32) if back_word >= (1 << 31) else back_word
    saw_wire = False
    for i in range(2):
        cam_i = jax.tree_util.tree_map(lambda x: x[i], cams)
        ref = render_mesh_15(fb0, mesh, fa, atlas, cam_i, lights, no_fog(),
                             settings, depth_mode="fast")
        diff = (np.asarray(out.color[i]) != np.asarray(ref.color))
        budget = _seam_budget(diff.size, 1)
        assert diff.sum() <= budget, \
            f"backface-wire cube inst {i}: {diff.sum()} diffs (budget {budget})"
        saw_wire |= bool((np.asarray(ref.color) == back_word).any())
    assert saw_wire, "reference must draw some backface wire pixels"


def test_multigroup_backface_wires_stay_sequential(cave):
    level, flat, static, seq = cave
    assert static.n_draw_groups > 1
    # default settings = backface wires on: multi-group levels must reject
    # the kernel path (per-group solid/wire interleave can't flatten)
    assert not scene_flat.kernel_path_ok(static, RasterSettings())
    # x-ray IS kernel-eligible since round 5 (phase-3 ordered composite;
    # tests/test_transparent_kernel.py pins its parity) — but only on
    # single-segment affine levels; ortho stays sequential
    assert scene_flat.kernel_path_ok(
        static, RasterSettings.game(xray_mode=True))
    from bonnie32_tpu.config import OrthoProjection
    assert not scene_flat.kernel_path_ok(
        static, RasterSettings.game(
            ortho_projection=OrthoProjection(1.0, 0.0, 0.0)))


if __name__ == "__main__":
    pytest.main([__file__, "-v"])

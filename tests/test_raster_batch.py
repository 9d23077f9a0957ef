"""Batched flat-scene rasterizer (ops/raster_batch.py) vs the sequential
per-room path (models/scene.py) — same level, same cameras, same settings.

The batched path is the round-2 performance architecture (PLAN_PERF.md):
one fused Pallas kernel over all instances, faces compacted and drawn
sequentially with a strict-greater inverse-z test, then the static
transparent list composited back-to-front.  Its output must equal the
per-room reference path (`render_scene` semantics, scene.rs:180-261).

Runs in Pallas interpret mode on CPU; on TPU hardware the same comparison
was measured bit-exact (0 diffs color+depth, Cave, 4 instances).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bonnie32_tpu.config import (RasterSettings, ShadingMode, WIDTH, HEIGHT)
from bonnie32_tpu.models import level as L
from bonnie32_tpu.models import scene as scene_mod
from bonnie32_tpu.models import scene_flat
from bonnie32_tpu.models import texture_pack as tp
from bonnie32_tpu.ops import raster_ref
from bonnie32_tpu.models import build

LEVELS = "/root/reference/assets/samples/levels"
PACKS = "/root/reference/assets/samples/texture-packs"


def _seam_budget(npixels, n_inst):
    # XLA:CPU contracts FMAs per fusion context; the two paths compile
    # separately, so near-tie depth/coverage decisions on triangle seams
    # can flip.  Bit-exact on TPU (no FMA contraction there).
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


def test_flat_equals_sequential_cave(cave):
    level, flat, static, seq = cave
    settings = RasterSettings.game()
    assert scene_flat.kernel_path_ok(static, settings)

    n = 2
    cams = _cams(level, n)
    fb0 = raster_ref.new_framebuffer(HEIGHT, WIDTH, depth_mode="inv")
    fbs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), fb0)

    out = scene_flat.render_level_flat(fbs, flat, static, cams, settings,
                                       height=HEIGHT, width=WIDTH,
                                       interpret=True)
    ref = jax.vmap(lambda c: scene_mod.render_level(
        fb0, seq, c, settings, depth_mode="fast"))(cams)

    c_new = np.asarray(out.color)
    c_ref = np.asarray(ref.color)
    # scene must actually be visible (not an empty-frame vacuous pass)
    drawn = (c_ref != c_ref.reshape(n, -1)[:, :1, None]).any(-1)
    assert drawn.mean() > 0.2, "cameras should see the cave walls"
    diff = (c_new != c_ref).any(-1)
    budget = _seam_budget(diff.size, n)
    assert diff.sum() <= budget, \
        f"flat vs sequential: {diff.sum()} pixel diffs (budget {budget})"


def test_flat_scene_has_transparent_faces_static(cave):
    level, flat, static, seq = cave
    # Cave has no transparent faces; the static list must reflect that and
    # keep the kernel path eligible.
    assert static.transparent_last
    assert static.n_faces > 100
    assert static.t_pad % 128 == 0


def test_flat_cube_matches_render_mesh(cave):
    """compile_scene_flat (raw meshes, the bench's raster configs) must
    match render_mesh_15 on the textured cube."""
    import scenes
    from bonnie32_tpu.ops import camera as cam_ops
    from bonnie32_tpu.render import render_mesh_15
    from bonnie32_tpu.types import no_fog

    settings = RasterSettings.game()
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
            f"cube inst {i}: {diff.sum()} diffs (budget {budget})"


def test_flat_multi_segment_face_table(monkeypatch):
    """Levels with more than SEG compacted faces stream the face table
    through SMEM segments; output must still equal the sequential path.
    SEG is pinned small here — the production value (2560, column-major
    SMEM windows) runs every sample level single-segment."""
    from bonnie32_tpu.models.level import Level, Room, TextureRef
    from bonnie32_tpu.models import texture_pack as tp
    from bonnie32_tpu.ops import raster_batch as rb

    monkeypatch.setattr(rb, "SEG", 256)

    level = Level()
    room = Room.new(0, (0.0, 0.0, 0.0), 18, 18)
    texr = TextureRef("p", "A")
    for x in range(18):
        for z in range(18):
            room.set_floor(x, z, (x + z) % 3 * 256.0, texr)
    room.recalculate_bounds()
    level.add_room(room)

    import scenes as sc
    textures = [sc.checker_texture15(16, 16, with_black=False)]

    def resolve(ref):
        return (0, 16)

    flat, static = scene_flat.compile_level_flat(level, textures, resolve)
    assert static.n_faces > rb.SEG          # multi-segment territory
    assert static.t_pad % rb.SEG == 0
    seq = scene_mod.compile_level(level, textures, resolve)

    settings = RasterSettings.game()
    H, W = 24, 32
    cam = build.make_camera(
        np.asarray([9 * 1024.0, 2600.0, 2000.0], np.float32),
        build.camera_basis(0.55, 0.1))
    cams = jax.tree_util.tree_map(lambda x: jnp.stack([x]), cam)
    fb0 = raster_ref.new_framebuffer(H, W, depth_mode="inv")
    fbs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (1,) + x.shape), fb0)

    out = scene_flat.render_level_flat(fbs, flat, static, cams, settings,
                                       height=H, width=W, interpret=True)
    ref = scene_mod.render_level(fb0, seq, cam, settings,
                                 depth_mode="fast")
    c_new = np.asarray(out.color[0])
    c_ref = np.asarray(ref.color)
    drawn = (c_ref != c_ref.reshape(-1)[0]).mean()
    assert drawn > 0.3, f"floor should be visible ({drawn:.0%})"
    diff = (c_new != c_ref)
    budget = _seam_budget(diff.size, 1)
    assert diff.sum() <= budget, \
        f"multi-seg: {diff.sum()} diffs (budget {budget})"


def test_flat_placed_assets_match_sequential():
    """The flat compile's placed-asset branch (scene.rs:226-259 order:
    rooms then per-part draws with Y-rotation/translation + resolved
    Texture15s) must match the sequential path on level_008's object."""
    from bonnie32_tpu.models import level as L
    from bonnie32_tpu.models import texture_pack as TP
    from bonnie32_tpu.models import asset as A
    from bonnie32_tpu.models import user_texture as UT
    from bonnie32_tpu.models.scene import collect_scene_lights

    SAMPLES = "/root/reference/assets/samples"
    level = L.load_level(f"{SAMPLES}/levels/level_008.ron")
    textures = TP.load_texture_packs(f"{SAMPLES}/texture-packs")
    resolve = TP.make_resolver(textures)
    lib = A.AssetLibrary([f"{SAMPLES}/assets"])
    utex = UT.TextureLibrary([f"{SAMPLES}/textures"])
    settings = RasterSettings.game()
    light_specs = collect_scene_lights(level, lib)

    flat, static = scene_flat.compile_level_flat(
        level, textures, resolve, light_specs=light_specs,
        asset_library=lib, user_textures=utex)
    seq = scene_mod.compile_level(level, textures, resolve,
                                  light_specs=light_specs,
                                  asset_library=lib, user_textures=utex)
    assert scene_flat.kernel_path_ok(static, settings)

    room = next(r for r in level.rooms if r.objects)
    obj = room.objects[0]
    wp = obj.world_position(room)
    campos = np.asarray(wp, np.float32) + np.asarray(
        [-1500, 1200, -2200], np.float32)
    cam = build.make_camera(campos, build.camera_basis(0.35, 0.65))
    cams = jax.tree_util.tree_map(lambda x: jnp.stack([x]), cam)

    H2, W2 = 120, 160
    fb0 = raster_ref.new_framebuffer(H2, W2, depth_mode="inv")
    fbs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (1,) + x.shape), fb0)
    out = scene_flat.render_level_flat(fbs, flat, static, cams, settings,
                                       height=H2, width=W2,
                                       interpret=True)
    ref = scene_mod.render_level(fb0, seq, cam, settings,
                                 depth_mode="fast")
    c_new = np.asarray(out.color[0])
    c_ref = np.asarray(ref.color)
    assert (c_ref != c_ref.reshape(-1)[0]).mean() > 0.1
    diff = c_new != c_ref
    budget = _seam_budget(diff.size, 1)
    assert diff.sum() <= budget, \
        f"asset flat vs seq: {diff.sum()} diffs (budget {budget})"


import dataclasses
import pytest


@pytest.mark.parametrize("variant", [
    dict(affine_textures=False),                      # persp-correct UV
    dict(shading=ShadingMode.FLAT),
    dict(shading=ShadingMode.NONE, dithering=False),
    dict(use_fixed_point=False),                      # float projection
])
def test_flat_kernel_settings_branches(cave, variant):
    """The kernel specializes on affine/shading/dither statics — each
    branch must match the sequential path too."""
    level, flat, static, seq = cave
    settings = dataclasses.replace(RasterSettings.game(), **variant)
    assert scene_flat.kernel_path_ok(static, settings)

    cams = _cams(level, 1)
    H2, W2 = 120, 160
    fb0 = raster_ref.new_framebuffer(H2, W2, depth_mode="inv")
    fbs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (1,) + x.shape), fb0)
    out = scene_flat.render_level_flat(fbs, flat, static, cams, settings,
                                       height=H2, width=W2,
                                       interpret=True)
    ref = jax.vmap(lambda c: scene_mod.render_level(
        fb0, seq, c, settings, depth_mode="fast"))(cams)
    c_new = np.asarray(out.color)
    c_ref = np.asarray(ref.color)
    assert (c_ref != c_ref.reshape(1, -1)[:, :1, None]).any(-1).mean() > 0.1
    diff = (c_new != c_ref).any(-1)
    budget = _seam_budget(diff.size, 1)
    assert diff.sum() <= budget, \
        f"{variant}: {diff.sum()} diffs (budget {budget})"


@pytest.mark.parametrize("dbg", ["fb2", "fb4", "nogate", "ch8", "ch24"])
def test_flat_kernel_debug_variants_bit_exact(cave, dbg):
    """Round-4/5 knobs — phase-1 face unroll (fbK), presence-gate disable
    (nogate), window/chunk sweeps (wbK/chK; H=120 here, so tokens must
    divide 120 — explicit tokens assert instead of degrading) — must be
    bit-exact vs the default kernel on the same scene."""
    level, flat, static, seq = cave
    settings = RasterSettings.game()
    cams = _cams(level, 1)
    H2, W2 = 120, 160
    fb0 = raster_ref.new_framebuffer(H2, W2, depth_mode="inv")
    fbs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (1,) + x.shape), fb0)
    base = scene_flat.render_level_flat(fbs, flat, static, cams, settings,
                                        height=H2, width=W2,
                                        interpret=True)
    out = scene_flat.render_level_flat(fbs, flat, static, cams, settings,
                                       height=H2, width=W2,
                                       interpret=True, debug=dbg)
    diff = int((np.asarray(out.color) != np.asarray(base.color)).sum())
    assert diff == 0, f"{dbg}: {diff} pixel diffs vs default kernel"

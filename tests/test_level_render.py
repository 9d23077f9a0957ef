"""End-to-end: sample level -> compiled scene -> render, vs golden model."""

import numpy as np
import jax
import pytest

from bonnie32_tpu.config import RasterSettings
from bonnie32_tpu.models import level as L
from bonnie32_tpu.models import scene as S
from bonnie32_tpu.models import texture_pack as TP
from bonnie32_tpu.models import build
from bonnie32_tpu.ops import raster_ref

from golden import raster_golden as gold

LEVELS = "/root/reference/assets/samples/levels"
PACKS = "/root/reference/assets/samples/texture-packs"

W, H = 160, 120


def _render_both(level_name, campos, pitch, yaw, n_rooms=None):
    level = L.load_level(f"{LEVELS}/{level_name}")
    if n_rooms is not None:
        level.rooms = level.rooms[:n_rooms]
    textures = TP.load_texture_packs(PACKS)
    resolve = TP.make_resolver(textures)
    settings = RasterSettings.game()
    basis = build.camera_basis(pitch, yaw)
    camera = build.make_camera(np.asarray(campos, np.float32), basis)

    # --- jax ---
    scene = S.compile_level(level, textures, resolve)
    fb = raster_ref.new_framebuffer(H, W, depth_mode="inv")
    out = S.render_level(fb, scene, camera, settings, depth_mode="fast")
    word = np.asarray(out.color)
    jpix = np.stack([(word >> 0) & 0xFF, (word >> 8) & 0xFF,
                     (word >> 16) & 0xFF, (word >> 24) & 0xFF],
                    axis=-1).astype(np.uint8)

    # --- golden ---
    gfb = gold.new_framebuffer(W, H)
    gtex = [dict(pixels=t.pixels15.astype(np.int64), blend_mode=0)
            for t in textures]
    for room in level.rooms:
        verts, faces = room.to_render_data(resolve)
        en, start, falloff, cull, color = S._room_fog_params(room)
        fog = (start, falloff, cull, color) if en else None
        gsettings = dict(affine_textures=settings.affine_textures,
                         use_zbuffer=True, shading=2, backface_cull=True,
                         ambient=np.float32(room.ambient), dithering=True,
                         xray_mode=False, use_fixed_point=True, ortho=None)
        gold.render_mesh_15(gfb, verts, faces, gtex,
                            dict(position=np.asarray(campos, np.float32),
                                 basis=basis),
                            gsettings, [], fog=fog)
    return gfb["pixels"], jpix


def _assert_close(gpix, jpix, name):
    diff = np.any(gpix != jpix, axis=-1)
    budget = 0 if jax.devices()[0].platform in ("tpu", "axon") else \
        max(8, diff.size // 1000)
    assert diff.sum() <= budget, \
        f"{name}: {diff.sum()} diffs ({diff.mean():.2%}) budget {budget}"


def test_cave_level_renders_and_matches():
    level = L.load_level(f"{LEVELS}/Cave.ron")
    r0 = level.rooms[0]
    cx = float(r0.position[0]) + (r0.width / 2) * 1024.0
    cz = float(r0.position[2]) + (r0.depth / 2) * 1024.0
    fi = None
    for x, z, s in r0.iter_sectors():
        if s.floor is not None:
            fi = level.get_floor_info(
                (float(r0.position[0]) + (x + 0.5) * 1024.0, 0.0,
                 float(r0.position[2]) + (z + 0.5) * 1024.0))
            break
    assert fi is not None
    campos = (cx, fi.floor + 900.0, cz)

    g, j = _render_both("Cave.ron", campos, 0.25, 0.9)
    covered = (j[..., 3] == 255).mean()
    assert covered > 0.3, f"level should fill the frame (covered {covered:.0%})"
    _assert_close(g, j, "cave")


def test_dungeon_level_renders_and_matches():
    level = L.load_level(f"{LEVELS}/Dungeon.ron")
    r0 = level.rooms[0]
    fi = None
    for x, z, s in r0.iter_sectors():
        if s.floor is not None:
            fi = level.get_floor_info(
                (float(r0.position[0]) + (x + 0.5) * 1024.0, 0.0,
                 float(r0.position[2]) + (z + 0.5) * 1024.0))
            break
    campos = (float(r0.position[0]) + (fi.sector_x + 0.5) * 1024.0,
              fi.floor + 900.0,
              float(r0.position[2]) + (fi.sector_z + 0.5) * 1024.0)
    g, j = _render_both("Dungeon.ron", campos, 0.15, 2.2)
    _assert_close(g, j, "dungeon")


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-x"])

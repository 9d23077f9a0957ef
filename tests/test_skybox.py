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

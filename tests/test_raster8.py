"""8-bit (non-RGB555) render path parity vs the golden transcription."""

import numpy as np
import jax.numpy as jnp

from bonnie32_tpu.config import RasterSettings, ShadingMode
from bonnie32_tpu.models import build
from bonnie32_tpu.ops import raster8
from bonnie32_tpu.types import FrameBuffers, no_fog

from golden import raster8_golden as g8
import scenes

W, H = 160, 120
F32_MAX = np.float32(3.4028235e38)


def make_tex_rgba(w=32, h=32, holes=True, seed=0):
    rng = np.random.default_rng(seed)
    rgba = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    rgba[..., 3] = 255
    if holes:
        rgba[::5, ::3, 3] = 0    # transparent texels
    return rgba


def run_both(settings, tex_specs, light_specs=None, fog=None,
             editor_alpha=255, vertex_colors=None):
    light_specs = light_specs if light_specs is not None \
        else scenes.DEFAULT_LIGHT_SPECS
    verts, faces = scenes.cube_scene(
        tex_ids=(0, 1, 0, None, None, 1),
        vertex_colors=vertex_colors or [(128, 128, 128)] * 6)
    for f in faces:
        f["editor_alpha"] = editor_alpha

    campos = np.array([-1.8, -1.5, -3.2], np.float32)
    basis = np.asarray(build.camera_basis(0.35, 0.6), np.float32)

    # golden
    gfb = dict(pixels=np.zeros((H, W, 4), np.uint8),
               zbuffer=np.full((H, W), F32_MAX))
    gset = dict(affine_textures=settings.affine_textures,
                use_zbuffer=settings.use_zbuffer,
                shading=int(settings.shading),
                backface_cull=settings.backface_cull,
                ambient=settings.ambient, dithering=settings.dithering,
                xray_mode=False, use_fixed_point=settings.use_fixed_point)
    glights = []
    for spec in light_specs:
        spec = dict(spec)
        if "direction" in spec:
            d = np.asarray(spec["direction"], np.float32)
            n = np.float32(np.sqrt(np.float32(
                np.float32(d[0] * d[0]) + np.float32(d[1] * d[1]))
                + np.float32(d[2] * d[2])))
            if n != 0:
                spec["direction"] = (d / n).astype(np.float32)
        glights.append(spec)
    gtex = [dict(rgba=t) for t in tex_specs]
    g8.render_mesh8(gfb, verts, faces, gtex,
                    dict(position=campos, basis=basis), gset, glights,
                    fog=fog)

    # jax
    mesh, fa = scenes.to_jax_scene(verts, faces)
    atlas8 = build.build_atlas8([(t, 0) for t in tex_specs])
    cam = build.make_camera(campos, basis)
    lights = build.lights_from_list(light_specs, ambient=settings.ambient)
    jfog = no_fog() if fog is None else scenes.make_fog(*fog)
    fb = FrameBuffers(color=jnp.zeros((H, W), jnp.int32),
                      depth=jnp.full((H, W), F32_MAX))
    out = raster8.render_mesh8(fb, mesh, fa, atlas8, cam, lights, jfog,
                               settings)
    word = np.asarray(out.color)
    jpix = np.stack([(word >> 0) & 0xFF, (word >> 8) & 0xFF,
                     (word >> 16) & 0xFF, (word >> 24) & 0xFF],
                    axis=-1).astype(np.uint8)
    return gfb["pixels"], jpix


def assert_close(gpix, jpix, context):
    diff = np.any(gpix != jpix, axis=-1)
    import jax
    budget = 0 if jax.devices()[0].platform in ("tpu", "axon") \
        else max(4, diff.size // 2000)
    assert diff.sum() <= budget, \
        f"{context}: {diff.sum()} mismatched ({diff.mean():.2%})"


def texset():
    return [make_tex_rgba(32, 32, holes=True, seed=0),
            make_tex_rgba(16, 16, holes=False, seed=1)]


def test_raster8_default():
    """Fixed-point + z-buffer + Gouraud + dither, alpha-holed texture."""
    s = RasterSettings.game()
    gpix, jpix = run_both(s, texset())
    assert_close(gpix, jpix, "8-bit default")
    assert (jpix[..., 3] == 255).any()


def test_raster8_no_dither_keeps_8bit():
    s = RasterSettings.game(dithering=False, shading=ShadingMode.NONE)
    gpix, jpix = run_both(s, texset())
    assert_close(gpix, jpix, "8-bit undithered")
    # full 8-bit values survive (not quantized to 5-bit steps)
    lit = jpix[..., 3] == 255
    vals = jpix[lit][:, 0]
    assert np.any(vals & 0x7), "8-bit precision retained"


def test_raster8_painters():
    s = RasterSettings.game(use_zbuffer=False)
    gpix, jpix = run_both(s, texset())
    assert_close(gpix, jpix, "8-bit painter's")


def test_raster8_flat_and_editor_alpha():
    s = RasterSettings.game(shading=ShadingMode.FLAT)
    gpix, jpix = run_both(s, texset(), editor_alpha=128)
    assert_close(gpix, jpix, "8-bit flat + editor alpha")


def test_raster8_fog_and_float_path():
    s = RasterSettings.game(use_fixed_point=False)
    fog = (2.0, 6.0, 50.0, (40, 40, 60))
    gpix, jpix = run_both(s, texset(), fog=fog)
    # float projection: allow a small seam budget like the 15-bit tests
    diff = np.any(gpix != jpix, axis=-1)
    assert diff.mean() < 0.01, f"8-bit fog/float: {diff.mean():.2%}"

def test_use_rgb555_dispatch_on_level():
    """render_level routes on settings.use_rgb555 (scene.rs:214-219): the
    False branch runs the 8-bit pipeline against the untrimmed global
    atlas with face texture ids remapped room-local -> global, and its
    output must match a hand-built render_mesh8 loop."""
    import jax
    import jax.numpy as jnp
    from bonnie32_tpu.models.level import (Level, Room, TextureRef)
    from bonnie32_tpu.models import scene as scene_mod
    from bonnie32_tpu.models import build
    from bonnie32_tpu.ops import raster_ref
    import scenes as sc

    level = Level()
    room = Room.new(0, (0.0, 0.0, 0.0), 3, 3)
    t0 = TextureRef("p", "A")
    t1 = TextureRef("p", "B")
    for x in range(3):
        for z in range(3):
            room.set_floor(x, z, 0.0, t1 if (x + z) % 2 else t0)
    room.recalculate_bounds()
    level.add_room(room)

    textures = [sc.checker_texture15(16, 16, with_black=False),
                sc.checker_texture15(8, 8, with_black=True)]
    names = {"A": (0, 16), "B": (1, 8)}

    def resolve(ref):
        if not getattr(ref, "is_valid", False):
            return (0, 16)
        return names.get(ref.name)

    scene = scene_mod.compile_level(level, textures, resolve,
                                    with_8bit=True)
    assert scene.atlas8 is not None and scene.tex_map is not None

    campos = np.asarray([1536.0, 900.0, 300.0], np.float32)
    basis = build.camera_basis(0.5, 0.2)
    cam = build.make_camera(campos, basis)
    H, W = 120, 160
    fb = raster_ref.new_framebuffer(H, W, depth_mode="inv")

    s15 = RasterSettings.game()
    s8 = RasterSettings.game(use_rgb555=False)
    out15 = scene_mod.render_level(fb, scene, cam, s15, depth_mode="fast")
    out8 = scene_mod.render_level(fb, scene, cam, s8, depth_mode="fast")

    a15 = np.asarray(out15.color)
    a8 = np.asarray(out8.color)
    bg = a15.reshape(-1)[0]
    assert (a15 != bg).sum() > 500, "floor should be visible"
    # the toggle changes observable output (15-bit quantized vs 8-bit)
    assert (a8 != a15).any()

    # plumbing equality: manual room loop with render_mesh8 + global ids
    mesh0 = jax.tree_util.tree_map(lambda x: x[0], scene.mesh)
    faces0 = jax.tree_util.tree_map(lambda x: x[0], scene.faces)
    tm = scene.tex_map[0]
    tid = faces0.tex_id
    faces0 = faces0._replace(
        tex_id=jnp.where(tid >= 0, tm[jnp.maximum(tid, 0)], tid))
    lights = scene.lights._replace(ambient=scene.ambient[0])
    from bonnie32_tpu.types import no_fog
    ref8 = raster8.render_mesh8(fb, mesh0, faces0, scene.atlas8, cam,
                                lights, no_fog(), s8)
    np.testing.assert_array_equal(a8, np.asarray(ref8.color))

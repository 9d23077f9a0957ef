"""Asset pipeline: sample asset + user textures + placed-object rendering."""

import numpy as np
import jax

from bonnie32_tpu.config import RasterSettings
from bonnie32_tpu.models import level as L
from bonnie32_tpu.models import scene as S
from bonnie32_tpu.models import texture_pack as TP
from bonnie32_tpu.models import asset as A
from bonnie32_tpu.models import user_texture as UT
from bonnie32_tpu.models import build
from bonnie32_tpu.ops import raster_ref

from golden import raster_golden as gold

SAMPLES = "/root/reference/assets/samples"
W, H = 160, 120


def test_asset_roundtrip():
    a = A.load_asset(f"{SAMPLES}/assets/asset_003.ron")
    assert a.mesh() is not None
    import tempfile, os
    with tempfile.NamedTemporaryFile(suffix=".ron", delete=False) as tf:
        A.save_asset(a, tf.name)
        a2 = A.load_asset(tf.name)
        os.unlink(tf.name)
    assert a2.id == a.id
    p1, p2 = a.mesh()[0], a2.mesh()[0]
    assert len(p2.mesh.vertices) == len(p1.mesh.vertices)
    assert p2.texture_ref.kind == p1.texture_ref.kind
    assert p2.double_sided == p1.double_sided


def test_user_texture_roundtrip():
    lib = UT.TextureLibrary([f"{SAMPLES}/textures"])
    assert len(lib) >= 3
    tex = next(iter(lib.textures.values()))
    import tempfile, os
    with tempfile.NamedTemporaryFile(suffix=".ron", delete=False) as tf:
        UT.save_user_texture(tex, tf.name)
        t2 = UT.load_user_texture(tf.name)
        os.unlink(tf.name)
    np.testing.assert_array_equal(t2.to_texture15(), tex.to_texture15())


def test_level008_placed_asset_renders_and_matches():
    level = L.load_level(f"{SAMPLES}/levels/level_008.ron")
    textures = TP.load_texture_packs(f"{SAMPLES}/texture-packs")
    resolve = TP.make_resolver(textures)
    lib = A.AssetLibrary([f"{SAMPLES}/assets"])
    utex = UT.TextureLibrary([f"{SAMPLES}/textures"])
    settings = RasterSettings.game()

    # aim the camera at the placed object
    room = next(r for r in level.rooms if r.objects)
    obj = room.objects[0]
    assert lib.get_by_id(obj.asset_id) is not None, "sample asset must resolve"
    wp = obj.world_position(room)
    campos = np.asarray(wp, np.float32) + np.array([-1500, 1200, -2200], np.float32)
    basis = build.camera_basis(0.35, 0.65)
    camera = build.make_camera(campos, basis)

    light_specs = S.collect_scene_lights(level, lib)

    scene = S.compile_level(level, textures, resolve, light_specs=light_specs,
                            asset_library=lib, user_textures=utex)
    assert int(np.asarray(scene.a_faces.valid).sum()) > 0, "asset draw exists"

    fb = raster_ref.new_framebuffer(H, W, depth_mode="inv")
    out = S.render_level(fb, scene, camera, settings, depth_mode="fast")
    word = np.asarray(out.color)
    jpix = np.stack([(word >> 0) & 0xFF, (word >> 8) & 0xFF,
                     (word >> 16) & 0xFF, (word >> 24) & 0xFF],
                    axis=-1).astype(np.uint8)

    # --- golden: rooms then asset parts (scene.rs order) ---
    gfb = gold.new_framebuffer(W, H)
    gtex = [dict(pixels=t.pixels15.astype(np.int64), blend_mode=0)
            for t in textures]
    glights = [dict(s) for s in light_specs]
    cam_dict = dict(position=campos, basis=basis)

    def gsettings(amb):
        return dict(affine_textures=True, use_zbuffer=True, shading=2,
                    backface_cull=True, ambient=np.float32(amb),
                    dithering=True, xray_mode=False, use_fixed_point=True,
                    ortho=None)

    for r in level.rooms:
        verts, faces = r.to_render_data(resolve)
        en, start, falloff, cull, color = S._room_fog_params(r)
        fog = (start, falloff, cull, color) if en else None
        gold.render_mesh_15(gfb, verts, faces, gtex, cam_dict,
                            gsettings(r.ambient), glights, fog=fog)
    for r in level.rooms:
        en, start, falloff, cull, color = S._room_fog_params(r)
        fog = (start, falloff, cull, color) if en else None
        for o in r.objects:
            if not o.enabled:
                continue
            a = lib.get_by_id(o.asset_id)
            if a is None or not a.mesh():
                continue
            wpo = o.world_position(r)
            for part in a.mesh():
                if not part.visible:
                    continue
                verts, pfaces = part.mesh.to_render_data_textured()
                verts = S.transform_part_vertices(verts, o.facing, wpo)
                tex15 = S.resolve_part_texture15(part, utex)
                gs = gsettings(r.ambient)
                gs["backface_cull"] = (not part.double_sided)
                gold.render_mesh_15(
                    gfb, verts, pfaces,
                    [dict(pixels=tex15.astype(np.int64), blend_mode=0)],
                    cam_dict, gs, glights, fog=fog)

    diff = np.any(gfb["pixels"] != jpix, axis=-1)
    budget = 0 if jax.devices()[0].platform in ("tpu", "axon") else \
        max(8, diff.size // 1000)
    assert diff.sum() <= budget, \
        f"placed-asset scene: {diff.sum()} diffs ({diff.mean():.2%})"


def test_collision_shapes():
    """CollisionShapeDef parsing, containment, FromMesh resolution
    (component.rs:251-330)."""
    from bonnie32_tpu.models.asset import (Asset, AssetComponent,
                                           CollisionShape)
    from bonnie32_tpu.io.ron import Tag

    s = CollisionShape.parse(Tag("Sphere", {"radius": 300.0}))
    assert s.kind == "sphere"
    assert s.contains([0, 299, 0]) and not s.contains([0, 301, 0])

    b = CollisionShape.parse(Tag("Box", {"half_extents": (1, 2, 3)}))
    assert b.contains([0.9, -1.9, 2.9]) and not b.contains([1.1, 0, 0])
    assert abs(b.bounding_radius() - 14 ** 0.5) < 1e-6

    # capsule height is TOTAL (caps included): r=1 h=4 -> reaches y=+-2
    c = CollisionShape.capsule(1.0, 4.0)
    assert c.contains([0, 1.9, 0]) and not c.contains([0, 2.1, 0])
    assert c.contains([0.9, 0.0, 0]) and not c.contains([1.1, 0.0, 0])

    cy = CollisionShape.cylinder(1.0, 4.0)
    assert cy.contains([0.9, 1.9, 0]) and not cy.contains([0, 2.1, 0])

    # RON round trip
    for shape in (s, b, c, cy):
        assert CollisionShape.parse(shape.to_ron()) == shape
    assert "Box (2x4x6)" == b.description()

    # FromMesh resolves to the mesh AABB via the asset accessor
    from bonnie32_tpu.models.mesh import EditableMesh, MeshPart
    part = MeshPart(name="p", mesh=EditableMesh.cube(512.0))
    a = Asset(id=9, name="crate", components=[
        AssetComponent("Mesh", {"parts_obj": [part]}),
        AssetComponent("Collision", {"shape": Tag("FromMesh")})])
    shape = a.collision_shape()
    assert shape.kind == "box"
    assert all(abs(h - 256.0) < 1e-3 for h in shape.half_extents)

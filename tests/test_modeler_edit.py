"""Modeler viewport interaction: vertex/face picking and drag editing
(viewport.rs:394-560 + the DragManager semantics)."""

import numpy as np

from bonnie32_tpu.models import modeler_edit as me
from bonnie32_tpu.models.mesh import EditableMesh
from bonnie32_tpu.models.modeler import ModelerState, SelectMode
from bonnie32_tpu.models.modeler_viewport import (ModelerViewports,
                                                  ViewportId)
from bonnie32_tpu.ops import picking

FBW, FBH = 160, 120


def _setup():
    st = ModelerState(EditableMesh.cube(512.0))
    st.mirror.enabled = False     # mirror constraints tested elsewhere
    vp = ModelerViewports()
    vp.perspective.distance = 2000.0
    for cam in vp.cameras.values():
        cam.zoom = 0.1
    return st, vp


def _vertex_screen(st, vp, view, vid):
    xy = me._screen_xy(st, vp, view, FBW, FBH)
    return float(xy[vid, 0]), float(xy[vid, 1])


def test_pick_vertex_perspective_and_miss():
    st, vp = _setup()
    mx, my = _vertex_screen(st, vp, ViewportId.PERSPECTIVE, 2)
    assert me.pick_vertex(st, vp, ViewportId.PERSPECTIVE, (mx, my),
                          FBW, FBH) == 2
    assert me.pick_vertex(st, vp, ViewportId.PERSPECTIVE, (5, 5),
                          FBW, FBH) is None


def test_pick_face_via_ray():
    st, vp = _setup()
    # aim at the center of the screen: some cube face must be hit
    fid = me.pick_face(st, vp, ViewportId.PERSPECTIVE,
                       (FBW / 2, FBH / 2), FBW, FBH)
    assert fid is not None
    # aim far off: miss
    assert me.pick_face(st, vp, ViewportId.PERSPECTIVE, (2, 2),
                        FBW, FBH) is None


def test_vertex_drag_moves_with_snap_and_undo():
    st, vp = _setup()
    st.select_mode = SelectMode.VERTEX
    st.snap.grid_size = 64.0
    view = ViewportId.PERSPECTIVE

    mx, my = _vertex_screen(st, vp, view, 0)
    before = np.asarray(st.mesh.vertices[0].pos, np.float32).copy()

    g = me.DragGesture(state=st, viewports=vp, view=view,
                       fb_w=FBW, fb_h=FBH)
    assert g.press((mx, my))
    assert st.selected_vertices == {0}
    assert g.move((mx + 12, my)) and g.release()

    after = np.asarray(st.mesh.vertices[0].pos, np.float32)
    assert not np.allclose(before, after)
    # snapped to the 64-unit grid
    assert np.allclose(after % 64.0, 0.0, atol=1e-3)
    # one undo snapshot restores the original
    assert len(st.undo_stack) == 1
    st.undo()
    np.testing.assert_allclose(
        np.asarray(st.mesh.vertices[0].pos), before, atol=1e-5)


def test_face_drag_moves_all_face_vertices_together():
    st, vp = _setup()
    st.select_mode = SelectMode.FACE
    st.snap.enabled = False
    view = ViewportId.PERSPECTIVE

    fid = me.pick_face(st, vp, view, (FBW / 2, FBH / 2), FBW, FBH)
    face_vids = list(st.mesh.faces[fid].vertices)
    before = np.asarray([st.mesh.vertices[v].pos for v in face_vids],
                        np.float32)

    g = me.DragGesture(state=st, viewports=vp, view=view,
                       fb_w=FBW, fb_h=FBH)
    assert g.press((FBW / 2, FBH / 2))
    assert st.selected_faces == {fid}
    assert g.move((FBW / 2 + 15, FBH / 2 + 6)) and g.release()

    after = np.asarray([st.mesh.vertices[v].pos for v in face_vids],
                       np.float32)
    deltas = after - before
    # rigid translation: every vertex moved by the same delta
    np.testing.assert_allclose(
        deltas, np.broadcast_to(deltas[0:1], deltas.shape), atol=1e-3)
    assert np.linalg.norm(deltas[0]) > 1.0


def test_ortho_drag_constrained_to_view_plane():
    st, vp = _setup()
    st.select_mode = SelectMode.VERTEX
    st.snap.enabled = False
    view = ViewportId.TOP

    mx, my = _vertex_screen(st, vp, view, 0)
    vid = me.pick_vertex(st, vp, view, (mx, my), FBW, FBH)
    assert vid is not None
    before = np.asarray(st.mesh.vertices[vid].pos, np.float32).copy()

    g = me.DragGesture(state=st, viewports=vp, view=view,
                       fb_w=FBW, fb_h=FBH)
    assert g.press((mx, my))
    assert g.move((mx + 10, my)) and g.release()
    after = np.asarray(st.mesh.vertices[vid].pos, np.float32)
    # TOP view: drags move in the XZ plane, never in Y
    assert abs(after[1] - before[1]) < 1e-3
    assert np.linalg.norm(after - before) > 1.0

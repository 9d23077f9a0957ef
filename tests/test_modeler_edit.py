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


def test_box_select_tracker_bounds_and_contains():
    # drag/box_select.rs tests
    t = me.BoxSelectTracker((100.0, 100.0), (50.0, 150.0))
    assert t.bounds() == (50.0, 100.0, 100.0, 150.0)
    assert t.width() == 50.0 and t.height() == 50.0
    t2 = me.BoxSelectTracker((0.0, 0.0), (100.0, 100.0))
    assert t2.contains(50, 50) and t2.contains(0, 0) \
        and t2.contains(100, 100)
    assert not t2.contains(-1, 50) and not t2.contains(101, 50)


def test_box_select_vertices_and_shift_add():
    st, vp = _setup()
    st.select_mode = SelectMode.VERTEX
    view = ViewportId.PERSPECTIVE
    xy = me._screen_xy(st, vp, view, FBW, FBH)

    def expect_in(bounds):
        x0, y0, x1, y1 = bounds
        return {i for i in range(len(xy))
                if x0 <= xy[i, 0] <= x1 and y0 <= xy[i, 1] <= y1}

    # a small box around vertex 0
    x, y = float(xy[0, 0]), float(xy[0, 1])
    box0 = (x - 2, y - 2, x + 2, y + 2)
    want0 = expect_in(box0)
    n = me.apply_box_selection(st, vp, view, box0, FBW, FBH)
    assert 0 in st.selected_vertices and st.selected_vertices == want0
    assert n == len(want0)

    # shift-add a box around vertex 3 keeps the originals
    x2, y2 = float(xy[3, 0]), float(xy[3, 1])
    box3 = (x2 - 2, y2 - 2, x2 + 2, y2 + 2)
    n = me.apply_box_selection(st, vp, view, box3, FBW, FBH,
                               add_to_selection=True)
    assert st.selected_vertices == want0 | expect_in(box3)
    assert 3 in st.selected_vertices

    # a whole-screen box selects every vertex
    me.apply_box_selection(st, vp, view, (0, 0, FBW, FBH), FBW, FBH)
    assert len(st.selected_vertices) == len(st.mesh.vertices)

    # an empty plain box clears; an empty shift box keeps
    me.apply_box_selection(st, vp, view, (0, 0, 1, 1), FBW, FBH,
                           add_to_selection=True)
    assert len(st.selected_vertices) == len(st.mesh.vertices)
    me.apply_box_selection(st, vp, view, (0, 0, 1, 1), FBW, FBH)
    assert st.selected_vertices == set()


def test_box_select_faces_by_center():
    st, vp = _setup()
    st.select_mode = SelectMode.FACE
    view = ViewportId.PERSPECTIVE
    n = me.apply_box_selection(st, vp, view, (0, 0, FBW, FBH), FBW, FBH)
    assert n == len(st.mesh.faces)
    assert st.selected_faces == set(range(len(st.mesh.faces)))

"""Modeler viewport interaction: pick + drag editing of EditableMesh.

The headless core of the modeler's mouse tools
(`/root/reference/src/modeler/viewport.rs:394-560` and the DragManager in
`modeler/drag/`): screen-space vertex picking, ray-cast face picking
(Möller–Trumbore over the triangulated faces), and drag gestures that
move the selection — on a camera-parallel plane through the grab point
in the perspective view, or in the view plane in ortho panes — with
grid snapping, mirror-plane constraints, and one undo snapshot per
gesture.
"""

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np

from ..ops import picking
from .modeler import ModelerState, SelectMode
from .modeler_viewport import (ORTHO_BASES, ModelerViewports, ViewportId,
                               view_camera)

PICK_RADIUS_PX = 8.0


def _screen_xy(state: ModelerState, viewports: ModelerViewports,
               view: ViewportId, fb_w: int, fb_h: int) -> np.ndarray:
    """(V, 2) screen positions of every vertex in this pane."""
    cam = view_camera(viewports, view)
    pos = np.asarray([v.pos for v in state.mesh.vertices], np.float32)
    if len(pos) == 0:
        return np.zeros((0, 2), np.float32)
    if view == ViewportId.PERSPECTIVE:
        sx, sy, _, valid = picking.world_to_screen(
            pos, np.asarray(cam.position), np.asarray(cam.basis),
            fb_w, fb_h)
        sx = np.where(np.asarray(valid), np.asarray(sx), np.nan)
        return np.stack([np.asarray(sx), np.asarray(sy)], -1)
    oc = viewports.cameras[view]
    sx, sy, _, _ = picking.world_to_screen_ortho(
        pos, np.asarray(cam.position), np.asarray(cam.basis), fb_w, fb_h,
        oc.zoom, oc.center[0], oc.center[1])
    return np.stack([np.asarray(sx), np.asarray(sy)], -1)


def pick_vertex(state: ModelerState, viewports: ModelerViewports,
                view: ViewportId, mouse_fb, fb_w: int, fb_h: int,
                radius: float = PICK_RADIUS_PX) -> Optional[int]:
    """Nearest vertex within `radius` px of the mouse, or None."""
    xy = _screen_xy(state, viewports, view, fb_w, fb_h)
    if len(xy) == 0:
        return None
    d = np.hypot(xy[:, 0] - mouse_fb[0], xy[:, 1] - mouse_fb[1])
    d = np.where(np.isnan(d), np.inf, d)
    i = int(np.argmin(d))
    return i if d[i] <= radius else None


def _mouse_ray(viewports: ModelerViewports, view: ViewportId, mouse_fb,
               fb_w: int, fb_h: int):
    cam = view_camera(viewports, view)
    if view == ViewportId.PERSPECTIVE:
        o, d = picking.screen_to_ray(
            mouse_fb[0], mouse_fb[1], fb_w, fb_h,
            np.asarray(cam.position), np.asarray(cam.basis))
    else:
        oc = viewports.cameras[view]
        o, d = picking.screen_to_ray_ortho(
            mouse_fb[0], mouse_fb[1], fb_w, fb_h,
            np.asarray(cam.position), np.asarray(cam.basis),
            oc.zoom, oc.center[0], oc.center[1])
    return (np.asarray(o, np.float32).reshape(3),
            np.asarray(d, np.float32).reshape(3))


def pick_face(state: ModelerState, viewports: ModelerViewports,
              view: ViewportId, mouse_fb, fb_w: int,
              fb_h: int) -> Optional[int]:
    """Nearest face hit by the mouse ray (Möller–Trumbore per tri)."""
    o, d = _mouse_ray(viewports, view, mouse_fb, fb_w, fb_h)
    best_t = math.inf
    best_face: Optional[int] = None
    verts = state.mesh.vertices
    for fi, face in enumerate(state.mesh.faces):
        for (a, b, c) in face.triangulate():
            hit = picking.ray_triangle_intersect(
                o, d, np.asarray(verts[a].pos, np.float32),
                np.asarray(verts[b].pos, np.float32),
                np.asarray(verts[c].pos, np.float32))
            t = float(np.asarray(hit[0])) if isinstance(hit, tuple) \
                else float(np.asarray(hit))
            ok = bool(np.asarray(hit[1])) if isinstance(hit, tuple) \
                else np.isfinite(t)
            if ok and 0.0 < t < best_t:
                best_t = t
                best_face = fi
    return best_face


@dataclasses.dataclass
class DragGesture:
    """One press-move-release vertex/selection drag."""

    state: ModelerState
    viewports: ModelerViewports
    view: ViewportId
    fb_w: int
    fb_h: int
    grab_point: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32))
    vids: Tuple[int, ...] = ()
    start_pos: Optional[np.ndarray] = None
    started: bool = False

    def press(self, mouse_fb) -> bool:
        """Grab the picked vertex (vertex mode) or the selection pivot."""
        st = self.state
        if st.select_mode == SelectMode.VERTEX:
            vid = pick_vertex(st, self.viewports, self.view, mouse_fb,
                              self.fb_w, self.fb_h)
            if vid is None:
                return False
            if vid not in st.selected_vertices:
                st.selected_vertices = {vid}
            self.vids = tuple(sorted(st.selected_vertices))
            self.grab_point = np.asarray(st.mesh.vertices[vid].pos,
                                         np.float32).copy()
        else:
            fid = pick_face(st, self.viewports, self.view, mouse_fb,
                            self.fb_w, self.fb_h)
            if fid is None:
                return False
            if fid not in st.selected_faces:
                st.selected_faces = {fid}
            self.vids = tuple(st.selection_vertices())
            self.grab_point = st.selection_pivot()
        self.start_pos = np.asarray(
            [self.state.mesh.vertices[v].pos for v in self.vids],
            np.float32)
        self.started = False
        return True

    def _drag_delta(self, mouse_fb) -> Optional[np.ndarray]:
        """World-space delta: mouse ray intersected with the camera-
        parallel plane through the grab point (the DragManager's plane)."""
        o, d = _mouse_ray(self.viewports, self.view, mouse_fb,
                          self.fb_w, self.fb_h)
        cam = view_camera(self.viewports, self.view)
        normal = np.asarray(cam.basis)[2].astype(np.float32)
        denom = float(np.dot(normal, d))
        if abs(denom) < 1e-8:
            return None
        t = float(np.dot(normal, self.grab_point - o)) / denom
        if self.view == ViewportId.PERSPECTIVE and t <= 0:
            return None   # plane behind the eye
        return (o + d * t - self.grab_point).astype(np.float32)

    def move(self, mouse_fb) -> bool:
        if self.start_pos is None:
            return False
        delta = self._drag_delta(mouse_fb)
        if delta is None:
            return False
        st = self.state
        if not self.started:
            st.save_undo()
            self.started = True
        for i, vid in enumerate(self.vids):
            p = self.start_pos[i] + delta
            p = st.snap.snap_vec(p)
            if st.mirror.enabled and st.mirror.is_on_plane(
                    self.start_pos[i]):
                p = st.mirror.constrain_to_plane(p)
            st.mesh.vertices[vid].pos = tuple(float(x) for x in p)
        return True

    def release(self) -> bool:
        moved = self.started
        self.start_pos = None
        self.started = False
        return moved


# ---------------------------------------------------------------------------
# Box selection (modeler/drag/box_select.rs + viewport.rs:1624
# apply_box_selection)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class BoxSelectTracker:
    """drag/box_select.rs:2 — a screen-space rubber-band rectangle."""

    start_mouse: Tuple[float, float]
    current_mouse: Tuple[float, float] = None

    def __post_init__(self):
        if self.current_mouse is None:
            self.current_mouse = self.start_mouse

    def bounds(self) -> Tuple[float, float, float, float]:
        """(min_x, min_y, max_x, max_y)."""
        sx, sy = self.start_mouse
        cx, cy = self.current_mouse
        return (min(sx, cx), min(sy, cy), max(sx, cx), max(sy, cy))

    def contains(self, x: float, y: float) -> bool:
        x0, y0, x1, y1 = self.bounds()
        return x0 <= x <= x1 and y0 <= y <= y1

    def width(self) -> float:
        return abs(self.current_mouse[0] - self.start_mouse[0])

    def height(self) -> float:
        return abs(self.current_mouse[1] - self.start_mouse[1])


def apply_box_selection(state: ModelerState, viewports: ModelerViewports,
                        view: ViewportId, bounds, fb_w: int, fb_h: int,
                        add_to_selection: bool = False) -> int:
    """viewport.rs:1624 — select every vertex (Vertex mode) or face
    (Face mode, by projected face center) whose screen position falls in
    `bounds` = (x0, y0, x1, y1).  Shift adds to the existing selection;
    an empty plain box clears it.  Returns the selected count."""
    x0, y0, x1, y1 = bounds
    xy = _screen_xy(state, viewports, view, fb_w, fb_h)

    if state.select_mode == SelectMode.VERTEX:
        inside = [i for i in range(len(xy))
                  if not np.isnan(xy[i, 0])
                  and x0 <= xy[i, 0] <= x1 and y0 <= xy[i, 1] <= y1]
        selected = (set(state.selected_vertices) if add_to_selection
                    else set())
        selected.update(inside)
        if selected:
            state.selected_vertices = selected
        elif not add_to_selection:
            state.selected_vertices = set()
        return len(selected)

    if state.select_mode == SelectMode.FACE:
        cam = view_camera(viewports, view)
        centers = []
        for face in state.mesh.faces:
            pts = np.asarray([state.mesh.vertices[v].pos
                              for v in face.vertices], np.float32)
            centers.append(pts.mean(axis=0))
        if not centers:
            return 0
        pos = np.asarray(centers, np.float32)
        if view == ViewportId.PERSPECTIVE:
            sx, sy, _, valid = picking.world_to_screen(
                pos, np.asarray(cam.position), np.asarray(cam.basis),
                fb_w, fb_h)
            sx = np.where(np.asarray(valid), np.asarray(sx), np.nan)
        else:
            oc = viewports.cameras[view]
            sx, sy, _, _ = picking.world_to_screen_ortho(
                pos, np.asarray(cam.position), np.asarray(cam.basis),
                fb_w, fb_h, oc.zoom, oc.center[0], oc.center[1])
        sx, sy = np.asarray(sx), np.asarray(sy)
        inside = [i for i in range(len(pos))
                  if not np.isnan(sx[i])
                  and x0 <= sx[i] <= x1 and y0 <= sy[i] <= y1]
        selected = (set(state.selected_faces) if add_to_selection
                    else set())
        selected.update(inside)
        if selected:
            state.selected_faces = selected
        elif not add_to_selection:
            state.selected_faces = set()
        return len(selected)

    return 0

"""Modeler screen composition + UV editor pane.

Reference behavior: `/root/reference/src/modeler/layout.rs` —
draw_modeler (:97): toolbar / status bar / main+right splits, left panel
(overview + parts/components), PicoCAD-style 4-pane viewport center,
right panel with the paint/UV section; the UV modal transforms
(:3732-3900 apply_uv_modal_transform: pixel-snapped Grab, Scale =
1 + dx*0.01 about a snapped center, Rotate = dx*0.01 rad) and the direct
UV vertex drag (:3851).  Screen routing + actions, not pixel chrome —
the rects returned let the caller render the real 4-pane views
(modeler_viewport.render_all_views) into the frame.
"""

from __future__ import annotations

import dataclasses
import enum
import math
from typing import Dict, List, Optional, Tuple

from ..ui import (Rect, SplitPanel, UiContext, button, draw_panel, toolbar,
                  vlist)
from ..ui.widgets import drag_value
from .mesh import EditableMesh
from .modeler import ModalTransform, ModelerState, SelectMode

TOOLBAR_HEIGHT = 36.0   # layout.rs:118
STATUS_HEIGHT = 22.0    # layout.rs:123
PANEL_BG = (35, 35, 40)

TOOL_IDS = ["select", "move", "rotate", "scale", "extrude"]
TOOL_LABELS = ["Sel", "Mov", "Rot", "Scl", "Ext"]
MODE_LABELS = {SelectMode.VERTEX: "Vtx", SelectMode.EDGE: "Edg",
               SelectMode.FACE: "Fac"}


def poly_count_color(face_count: int) -> Tuple[int, int, int]:
    """layout.rs:42 — green under budget, yellow near, red over."""
    if face_count <= 64:
        return (100, 220, 100)
    if face_count <= 128:
        return (230, 210, 90)
    return (230, 100, 90)


# ---------------------------------------------------------------------------
# UV editor (layout.rs:3517-4070 draw_paint_texture_editor UV mode)
# ---------------------------------------------------------------------------

class UvModalTransform(enum.Enum):
    """texture editor UvModalTransform states."""

    NONE = "none"
    GRAB = "grab"
    SCALE_PENDING = "scale_pending"
    SCALE = "scale"
    ROTATE = "rotate"


@dataclasses.dataclass
class UvEditorState:
    """UV pane state: zoom/pan + selection + modal transform bookkeeping
    (texture_editor.rs uv_* fields driven by layout.rs:3732)."""

    zoom: float = 2.0
    pan_x: float = 0.0
    pan_y: float = 0.0
    selected: List[int] = dataclasses.field(default_factory=list)
    modal: UvModalTransform = UvModalTransform.NONE
    modal_start_mouse: Tuple[float, float] = (0.0, 0.0)
    modal_center: Tuple[float, float] = (0.0, 0.0)
    modal_start_uvs: List[Tuple[int, Tuple[float, float]]] = \
        dataclasses.field(default_factory=list)
    drag_vertex: Optional[int] = None

    # -- canvas mapping (texture centered + panned/zoomed) ----------------

    def tex_origin(self, canvas: Rect, tw: float, th: float
                   ) -> Tuple[float, float]:
        cx = canvas.x + canvas.w / 2.0
        cy = canvas.y + canvas.h / 2.0
        return (cx - tw * self.zoom / 2.0 + self.pan_x,
                cy - th * self.zoom / 2.0 + self.pan_y)

    def uv_to_screen(self, uv, canvas: Rect, tw: float, th: float
                     ) -> Tuple[float, float]:
        ox, oy = self.tex_origin(canvas, tw, th)
        return (ox + uv[0] * tw * self.zoom, oy + uv[1] * th * self.zoom)

    def screen_to_uv(self, sx: float, sy: float, canvas: Rect, tw: float,
                     th: float) -> Tuple[float, float]:
        ox, oy = self.tex_origin(canvas, tw, th)
        return ((sx - ox) / (tw * self.zoom), (sy - oy) / (th * self.zoom))

    # -- selection --------------------------------------------------------

    def selection_uvs(self, mesh: EditableMesh
                      ) -> List[Tuple[int, Tuple[float, float]]]:
        out = []
        for vi in self.selected:
            if 0 <= vi < len(mesh.vertices):
                u, v = mesh.vertices[vi].uv
                out.append((vi, (float(u), float(v))))
        return out

    def select_all_faces_uvs(self, mesh: EditableMesh) -> None:
        """actions.rs select-all when the UV editor is focused."""
        seen = []
        for f in mesh.faces:
            for vi in f.vertices:
                if vi not in seen:
                    seen.append(vi)
        self.selected = seen

    def pick_vertex(self, mouse, canvas: Rect, mesh: EditableMesh,
                    tw: float, th: float, radius: float = 6.0
                    ) -> Optional[int]:
        best, best_d = None, radius
        for vi, v in enumerate(mesh.vertices):
            sx, sy = self.uv_to_screen(v.uv, canvas, tw, th)
            d = math.hypot(mouse[0] - sx, mouse[1] - sy)
            if d < best_d:
                best, best_d = vi, d
        return best

    # -- modal transforms (layout.rs:3732 apply_uv_modal_transform) -------

    def begin_modal(self, mode: UvModalTransform, mouse,
                    mesh: EditableMesh) -> None:
        uvs = self.selection_uvs(mesh)
        if not uvs:
            return
        self.modal = mode
        self.modal_start_mouse = (float(mouse[0]), float(mouse[1]))
        self.modal_start_uvs = uvs
        cu = sum(u for _, (u, _) in uvs) / len(uvs)
        cv = sum(v for _, (_, v) in uvs) / len(uvs)
        self.modal_center = (cu, cv)

    def apply_modal(self, mouse, canvas: Rect, tw: float, th: float,
                    mesh: EditableMesh) -> None:
        if self.modal in (UvModalTransform.NONE,
                          UvModalTransform.SCALE_PENDING):
            return
        dx = mouse[0] - self.modal_start_mouse[0]
        dy = mouse[1] - self.modal_start_mouse[1]
        du = dx / (tw * self.zoom)
        dv = -dy / (th * self.zoom)    # layout.rs:3766 inverted Y

        def snap(u, v):
            return (round(u * tw) / tw, round(v * th) / th)

        if self.modal == UvModalTransform.GRAB:
            for vi, (u0, v0) in self.modal_start_uvs:
                mesh.vertices[vi].uv = snap(u0 + du, v0 + dv)
        elif self.modal == UvModalTransform.SCALE:
            cx, cy = snap(*self.modal_center)
            scale = max(1.0 + dx * 0.01, 0.01)
            for vi, (u0, v0) in self.modal_start_uvs:
                su, sv = snap(u0, v0)
                mesh.vertices[vi].uv = snap(cx + (su - cx) * scale,
                                            cy + (sv - cy) * scale)
        elif self.modal == UvModalTransform.ROTATE:
            cx, cy = self.modal_center
            ang = dx * 0.01
            ca, sa = math.cos(ang), math.sin(ang)
            for vi, (u0, v0) in self.modal_start_uvs:
                ox, oy = u0 - cx, v0 - cy
                mesh.vertices[vi].uv = snap(cx + ox * ca - oy * sa,
                                            cy + ox * sa + oy * ca)

    def end_modal(self) -> None:
        self.modal = UvModalTransform.NONE
        self.modal_start_uvs = []

    def cancel_modal(self, mesh: EditableMesh) -> None:
        for vi, uv in self.modal_start_uvs:
            mesh.vertices[vi].uv = uv
        self.end_modal()

    # -- direct vertex drag (layout.rs:3851 apply_uv_direct_drag) ---------

    def press(self, mouse, canvas: Rect, mesh: EditableMesh, tw: float,
              th: float, shift: bool = False) -> bool:
        """Click: pick a UV vertex (shift extends); start a direct drag
        when the pick lands on a selected vertex."""
        vi = self.pick_vertex(mouse, canvas, mesh, tw, th)
        if vi is None:
            if not shift:
                self.selected = []
            return False
        if shift:
            if vi in self.selected:
                self.selected.remove(vi)
            else:
                self.selected.append(vi)
        elif vi not in self.selected:
            self.selected = [vi]
        self.drag_vertex = vi
        self.modal_start_mouse = (float(mouse[0]), float(mouse[1]))
        self.modal_start_uvs = self.selection_uvs(mesh)
        return True

    def drag(self, mouse, canvas: Rect, mesh: EditableMesh, tw: float,
             th: float) -> None:
        if self.drag_vertex is None:
            return
        du = (mouse[0] - self.modal_start_mouse[0]) / (tw * self.zoom)
        dv = (mouse[1] - self.modal_start_mouse[1]) / (th * self.zoom)
        for vi, (u0, v0) in self.modal_start_uvs:
            mesh.vertices[vi].uv = (round((u0 + du) * tw) / tw,
                                    round((v0 + dv) * th) / th)

    def release(self) -> None:
        self.drag_vertex = None
        self.modal_start_uvs = []


# ---------------------------------------------------------------------------
# Screen composition (layout.rs:97 draw_modeler)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class ModelerLayout:
    """Persistent layout state (ModelerLayout::new, layout.rs:80)."""

    main_split: SplitPanel = dataclasses.field(
        default_factory=lambda: SplitPanel.horizontal("m.main")
        .with_ratio(0.20).with_min_size(120))
    right_split: SplitPanel = dataclasses.field(
        default_factory=lambda: SplitPanel.horizontal("m.right")
        .with_ratio(0.70).with_min_size(170))
    uv: UvEditorState = dataclasses.field(default_factory=UvEditorState)
    parts_scroll: float = 0.0
    clut_scroll: float = 0.0
    components_ui: dict = dataclasses.field(default_factory=dict)


def draw_modeler(ctx: UiContext, layout: ModelerLayout,
                 state: ModelerState, bounds: Rect,
                 tex_size: Tuple[int, int] = (64, 64),
                 clut_pool=None) -> Dict[str, Rect]:
    """One modeler frame's chrome; returns named rects (the caller renders
    the 4-pane views into `viewport` via modeler_viewport and paints the
    UV texture into `uv_canvas`).  Mutates state/layout from ctx input."""
    screen = bounds
    toolbar_rect = screen.slice_top(TOOLBAR_HEIGHT)
    main_rect = screen.remaining_after_top(TOOLBAR_HEIGHT)
    status_rect = main_rect.slice_bottom(STATUS_HEIGHT)
    panels_rect = main_rect.remaining_after_bottom(STATUS_HEIGHT)

    # --- toolbar (layout.rs:188 draw_toolbar) ---
    ctx.fill(toolbar_rect, (28, 28, 33))
    ctx.outline(toolbar_rect, (60, 60, 70))
    active_tool = layout_tool_index(state)
    strip = Rect(toolbar_rect.x + 4, toolbar_rect.y + 4,
                 len(TOOL_IDS) * 30.0, toolbar_rect.h - 8)
    new_tool = toolbar(ctx, "m.tools", strip, TOOL_LABELS, active_tool,
                       button_w=30.0)
    if new_tool != active_tool:
        state.toolbox.deactivate_all()
        if TOOL_IDS[new_tool] != "select":
            state.toolbox.activate(TOOL_IDS[new_tool])
    mx = strip.right + 10
    modes = list(MODE_LABELS)
    midx = modes.index(state.select_mode)
    mstrip = Rect(mx, strip.y, 3 * 30.0, strip.h)
    new_mode = toolbar(ctx, "m.mode", mstrip, list(MODE_LABELS.values()),
                       midx, button_w=30.0)
    if new_mode != midx:
        state.select_mode = modes[new_mode]
        state.selection = []
    ux = mstrip.right + 10
    if button(ctx, "m.undo", Rect(ux, strip.y, 40, strip.h), "Undo"):
        state.undo()
    if button(ctx, "m.redo", Rect(ux + 44, strip.y, 40, strip.h), "Redo"):
        state.redo()

    # --- splits (layout.rs:135-138) ---
    left_rect, rest_rect = layout.main_split.update(ctx, panels_rect)
    center_rect, right_rect = layout.right_split.update(ctx, rest_rect)

    # --- left panel: overview + parts (layout.rs:464-705) ---
    draw_panel(ctx, left_rect, None, PANEL_BG)
    y = left_rect.y + 6
    mesh = state.mesh
    ctx.text(left_rect.x + 6, y, "Overview")
    y += 14
    tris = sum(max(len(f.vertices) - 2, 0) for f in mesh.faces)
    ctx.text(left_rect.x + 6, y, f"V {state.project.total_vertices()}  F "
             f"{state.project.total_faces()}  T {tris}",
             poly_count_color(len(mesh.faces)))
    y += 16
    ctx.text(left_rect.x + 6, y, f"Mode: {state.select_mode.value}",
             (150, 150, 160))
    y += 16

    # --- part list (mesh_editor.rs:306 MeshProject; layout.rs:464-705
    # object rows: eye toggle, active highlight, add/delete) ---
    parts = state.project.objects
    ctx.text(left_rect.x + 6, y, "Parts", (170, 170, 180))
    addr = Rect(left_rect.right - 22, y - 1, 16, 14)
    ah = addr.contains(ctx.mouse.x, ctx.mouse.y)
    ctx.fill(addr, (60, 80, 65) if ah else (42, 54, 46))
    ctx.text(addr.x + 5, addr.y + 2, "+")
    if ah and ctx.mouse.pressed:
        state.add_part()
    y += 14
    for pi, part in enumerate(parts):
        row = Rect(left_rect.x + 4, y, left_rect.w - 8, 15)
        active = pi == state.active_part
        hov = row.contains(ctx.mouse.x, ctx.mouse.y)
        if active:
            ctx.fill(row, (60, 80, 100))
        elif hov:
            ctx.fill(row, (48, 48, 55))
        eye = Rect(row.x + 1, y + 2, 12, 12)
        ctx.fill(eye, (120, 180, 255) if part.visible else (50, 50, 58))
        if eye.contains(ctx.mouse.x, ctx.mouse.y) and ctx.mouse.pressed:
            part.visible = not part.visible
        ctx.text(row.x + 17, y + 3, part.name,
                 (230, 230, 235) if active else (160, 160, 170))
        if len(parts) > 1 and (active or hov):
            dr = Rect(row.right - 14, y + 2, 12, 12)
            dh = dr.contains(ctx.mouse.x, ctx.mouse.y)
            ctx.fill(dr, (90, 50, 50) if dh else (55, 42, 42))
            ctx.text(dr.x + 3, dr.y + 1, "x")
            if dh and ctx.mouse.pressed:
                state.delete_part(pi)
                break
        if state.rigged is not None and (active or hov):
            # bone-bind cycle (layout.rs:7540 draw_bone_picker_popup,
            # condensed to a cycle button: None -> bone 0 -> ... -> None)
            bones = state.skeleton()
            br = Rect(row.right - 30, y + 2, 14, 12)
            bh = br.contains(ctx.mouse.x, ctx.mouse.y)
            bi = part.default_bone_index
            ctx.fill(br, (50, 70, 90) if bh else (40, 48, 58))
            ctx.text(br.x + 3, br.y + 1,
                     "B" if bi is None else str(bi % 10),
                     (120, 180, 255) if bi is not None else (130, 130, 140))
            if bh and ctx.mouse.pressed and bones:
                part.default_bone_index = (
                    0 if bi is None
                    else bi + 1 if bi + 1 < len(bones) else None)
        name_r = Rect(row.x + 15, y, row.w - 32, 15)
        if name_r.contains(ctx.mouse.x, ctx.mouse.y) and ctx.mouse.pressed:
            state.set_active_part(pi)
        y += 15
    y += 4

    # --- components section (layout.rs:723 draw_components_section:
    # per-kind editors for the asset's behavior components) ---
    from .modeler_components import draw_components_section
    comp_rect = Rect(left_rect.x + 4, y, left_rect.w - 8, 0)
    y = draw_components_section(ctx, comp_rect, state.components,
                                layout.components_ui)
    y += 4

    avail = max(left_rect.bottom - y - 6, 40)
    parts_h = avail * 0.5 if state.rigged is not None else avail
    parts_rect = Rect(left_rect.x + 4, y, left_rect.w - 8, parts_h)
    labels = [f"Face {i} ({len(f.vertices)}v)"
              for i, f in enumerate(mesh.faces)]
    sel_face = (state.selection[0] if state.select_mode == SelectMode.FACE
                and state.selection else None)
    picked, layout.parts_scroll = vlist(
        ctx, "m.parts", parts_rect, labels, sel_face,
        scroll=layout.parts_scroll)
    if picked is not None and picked != sel_face:
        state.select_mode = SelectMode.FACE
        state.selection = [picked]

    # --- skeleton editor (layout.rs:1335 draw_skeleton_editor_content) ---
    if state.rigged is not None:
        skel_rect = Rect(left_rect.x + 4, parts_rect.bottom + 4,
                         left_rect.w - 8,
                         max(left_rect.bottom - parts_rect.bottom - 10, 20))
        draw_skeleton_panel(ctx, skel_rect, state)

    # --- center: the 4-pane viewport region (draw_4panel_viewport) ---
    draw_panel(ctx, center_rect, None, (12, 12, 16))

    # --- right panel: UV editor + CLUT palette (layout.rs:2575, :3517) ---
    draw_panel(ctx, right_rect, None, PANEL_BG)
    ry = right_rect.y + 6
    ctx.text(right_rect.x + 6, ry, "UV Editor")
    ry += 14
    canvas = Rect(right_rect.x + 4, ry, right_rect.w - 8,
                  min(right_rect.w - 8, right_rect.h * 0.5))
    ctx.fill(canvas, (18, 18, 22))
    ctx.outline(canvas, (60, 60, 70))
    tw, th = float(tex_size[0]), float(tex_size[1])
    uv = layout.uv
    # texture frame + UV overlay (wireframe of face UVs + vertex handles)
    ox, oy = uv.tex_origin(canvas, tw, th)
    ctx.set_clip(canvas)
    ctx.outline(Rect(ox, oy, tw * uv.zoom, th * uv.zoom), (90, 90, 100))
    for f in mesh.faces:
        n = len(f.vertices)
        for i in range(n):
            a = mesh.vertices[f.vertices[i]].uv
            b = mesh.vertices[f.vertices[(i + 1) % n]].uv
            ax, ay = uv.uv_to_screen(a, canvas, tw, th)
            bx, by = uv.uv_to_screen(b, canvas, tw, th)
            ctx.line(ax, ay, bx, by, (120, 200, 220))
    for vi, v in enumerate(mesh.vertices):
        sx, sy = uv.uv_to_screen(v.uv, canvas, tw, th)
        rgb = (255, 220, 100) if vi in uv.selected else (200, 200, 210)
        ctx.fill(Rect(sx - 2, sy - 2, 4, 4), rgb)
    ctx.set_clip(None)

    # UV pane interaction: wheel zoom, direct drag, modal follow
    mouse = (ctx.mouse.x, ctx.mouse.y)
    inside = canvas.contains(*mouse)
    if inside and ctx.mouse.wheel != 0.0:
        uv.zoom = min(max(uv.zoom * (1.0 + ctx.mouse.wheel * 0.1), 0.25),
                      32.0)
    if uv.modal != UvModalTransform.NONE:
        uv.apply_modal(mouse, canvas, tw, th, mesh)
        if ctx.mouse.pressed:        # click commits the modal
            uv.end_modal()
    elif inside and ctx.mouse.pressed:
        if uv.press(mouse, canvas, mesh, tw, th,
                    shift=ctx.key_down("shift")):
            state.save_undo()
    elif ctx.mouse.down and uv.drag_vertex is not None:
        uv.drag(mouse, canvas, mesh, tw, th)
    elif ctx.mouse.released:
        uv.release()

    # CLUT palette swatches (draw_paint_section palette row)
    py = canvas.bottom + 8
    ctx.text(right_rect.x + 6, py, "Palette")
    py += 12
    if clut_pool is None:
        clut_pool = state.project.clut_pool
    clut = (clut_pool.cluts[0] if getattr(clut_pool, "cluts", None)
            else state.project.effective_clut())
    if clut is not None:
        sw = 10.0
        per_row = max(int((right_rect.w - 12) // sw), 1)
        for i, c15 in enumerate(clut.colors):
            px = right_rect.x + 6 + (i % per_row) * sw
            yy = py + (i // per_row) * sw
            r = ((c15 & 31) << 3) | ((c15 & 31) >> 2)
            g = (((c15 >> 5) & 31) << 3) | (((c15 >> 5) & 31) >> 2)
            b = (((c15 >> 10) & 31) << 3) | (((c15 >> 10) & 31) >> 2)
            ctx.fill(Rect(px, yy, sw - 1, sw - 1), (r, g, b))

    # --- snap settings row (layout.rs:8196 draw_snap_menu, condensed:
    # enable checkbox + grid-size cycle through the reference's steps) ---
    sy = right_rect.bottom - 22
    from ..ui.widgets import checkbox as _checkbox
    new_sn = _checkbox(ctx, "m.snap", Rect(right_rect.x + 6, sy, 14, 14),
                       state.snap.enabled, "Snap")
    if new_sn != state.snap.enabled:
        state.snap.enabled = new_sn
    gr = Rect(right_rect.x + 70, sy, 52, 16)
    if button(ctx, "m.snapgrid", gr, f"{state.snap.grid_size:.0f}"):
        steps = (32.0, 64.0, 128.0, 256.0, 512.0)
        try:
            i = steps.index(state.snap.grid_size)
        except ValueError:
            i = -1
        state.snap.grid_size = steps[(i + 1) % len(steps)]

    # --- status bar (draw_status_bar) ---
    ctx.fill(status_rect, (24, 24, 28))
    ctx.outline(status_rect, (60, 60, 70))
    sel = state.selection
    status = (state.status_message if state.status_message else
              f"{state.select_mode.value}: {len(sel)} selected  "
              f"uv:{uv.modal.value}")
    ctx.text(status_rect.x + 6, status_rect.y + 7, status,
             (120, 120, 130))

    return {"toolbar": toolbar_rect, "status": status_rect,
            "left": left_rect, "viewport": center_rect,
            "right": right_rect, "uv_canvas": canvas,
            "parts": parts_rect}


def layout_tool_index(state: ModelerState) -> int:
    active = state.toolbox.active_transform_tool()
    if active in TOOL_IDS:
        return TOOL_IDS.index(active)
    if state.toolbox.is_active("extrude"):
        return TOOL_IDS.index("extrude")
    return 0


# =============================================================================
# Skeleton editor panel (layout.rs:1335-1660)
# =============================================================================

def draw_skeleton_panel(ctx: UiContext, rect: Rect,
                        state: ModelerState) -> None:
    """Bone tree (indent per depth, select/hover, add-child / rename /
    delete row actions) + per-bone properties with inline rename."""
    line_h = 18.0
    ctx.fill(rect, (24, 24, 29))
    ctx.outline(rect, (55, 55, 65))
    x, y = rect.x + 2, rect.y + 2
    ctx.text(x + 2, y, "Skeleton", (200, 200, 210))
    y += 14

    bones = state.skeleton()
    if not bones:
        ctx.text(x + 2, y, "No bones", (120, 120, 130))
        if button(ctx, "sk.add", Rect(x + 2, y + 14, 90, 16),
                  "Add Skeleton"):
            state.ensure_skeleton()
        return

    props_h = 80.0 if state.selected_bone is not None else 0.0
    list_bottom = rect.bottom - props_h - 4.0

    select_idx = delete_idx = add_idx = rename_idx = None

    def draw_bone(idx: int, depth: int, y: float) -> float:
        nonlocal select_idx, delete_idx, add_idx, rename_idx
        if y + line_h > list_bottom:
            return y
        bone = bones[idx]
        row = Rect(x, y, rect.w - 4, line_h)
        hovered = row.contains(ctx.mouse.x, ctx.mouse.y)
        selected = state.selected_bone == idx
        if selected:
            ctx.fill(row, (60, 80, 100))
        elif hovered or state.hovered_bone == idx:
            ctx.fill(row, (50, 50, 55))
        indent = depth * 12.0
        dot = (255, 220, 100) if bone.parent is None else \
            (80, 255, 80) if selected else (170, 170, 180)
        ctx.fill(Rect(x + 3 + indent, y + 6, 6, 6), dot)
        ctx.text(x + 14 + indent, y + 5, bone.name,
                 (120, 180, 255) if selected else (200, 200, 210))
        if selected or hovered:
            bx = row.right - 16
            for label, slot in (("x", "del"), ("r", "ren"), ("+", "add")):
                br = Rect(bx, y + 2, 14, 14)
                bh = br.contains(ctx.mouse.x, ctx.mouse.y)
                ctx.fill(br, (70, 70, 80) if bh else (45, 45, 52))
                ctx.text(br.x + 4, br.y + 3, label)
                if bh and ctx.mouse.pressed:
                    if slot == "del":
                        delete_idx = idx
                    elif slot == "ren":
                        rename_idx = idx
                    else:
                        add_idx = idx
                bx -= 16
        name_r = Rect(x, y, row.w - 3 * 16 - 4, line_h)
        if (name_r.contains(ctx.mouse.x, ctx.mouse.y) and ctx.mouse.pressed
                and delete_idx is None and rename_idx is None
                and add_idx is None):
            select_idx = idx
        y += line_h
        for ci in state.bone_children(idx):
            y = draw_bone(ci, depth + 1, y)
        return y

    yy = y
    for root in state.bone_children(None):
        yy = draw_bone(root, 0, yy)

    # apply actions after the walk (layout.rs:1483-1509)
    if delete_idx is not None:
        state.remove_bone(delete_idx)
        state.bone_rename_active = False
        state.bone_rename_buffer = ""
    elif add_idx is not None:
        state.create_child_bone(add_idx)
    elif rename_idx is not None:
        state.selected_bone = rename_idx
        state.bone_rename_buffer = bones[rename_idx].name
        state.bone_rename_active = True
    elif select_idx is not None:
        if state.selected_bone != select_idx:
            state.bone_rename_active = False
            state.bone_rename_buffer = ""
        state.selected_bone = select_idx

    # --- per-bone properties (layout.rs:1511-1660) ---
    sel = state.selected_bone
    if sel is None or sel >= len(state.skeleton()):
        return
    bones = state.skeleton()
    bone = bones[sel]
    py = list_bottom + 4
    ctx.fill(Rect(x, py - 2, rect.w - 8, 1), (60, 60, 70))
    if state.bone_rename_active:
        for k in ctx.keys_pressed:
            if len(k) == 1 and (k.isalnum() or k in "_- "):
                state.bone_rename_buffer += k
            elif k == "backspace":
                state.bone_rename_buffer = state.bone_rename_buffer[:-1]
            elif k == "enter":
                if state.bone_rename_buffer:
                    state.rename_bone(sel, state.bone_rename_buffer)
                state.bone_rename_active = False
            elif k == "escape":
                state.bone_rename_active = False
        ir = Rect(x + 2, py, rect.w - 12, line_h)
        ctx.fill(ir, (40, 45, 55))
        ctx.outline(ir, (120, 180, 255))
        ctx.text(ir.x + 3, ir.y + 5, state.bone_rename_buffer + "|",
                 (120, 180, 255))
    else:
        ctx.text(x + 2, py + 4, bone.name, (230, 230, 235))
    py += line_h + 2
    parent_name = (bones[bone.parent].name if bone.parent is not None
                   else "(root)")
    ctx.text(x + 2, py, f"Parent: {parent_name}", (130, 130, 140))
    py += 14
    ctx.text(x + 2, py, f"Length: {bone.length:.0f}", (130, 130, 140))
    py += 14
    new_w = drag_value(ctx, "sk.width", Rect(x + 2, py, 90, 15),
                       bone.display_width(), speed=1.0, lo=20.0, hi=200.0)
    if new_w != bone.display_width():
        bone.width = new_w
        state.dirty = True

"""Texture editor screen: canvas view, palette panel, UV-overlay editing.

The composed editing surface of `/root/reference/src/texture/
texture_editor.rs` (5,120 LoC) on top of the raster ops in
`texture/paint.py`:

  * canvas view math — centered zoomed texture, pan, screen<->texture
    mapping (texture_editor.rs:1545-1570), tiling preview, pixel grid;
  * palette panel — slot selection, RGB555 slider edits, HSL ramps and
    the 3-key-color palette generator (texture_editor.rs:1620-1755),
    sample-color swatches (texture_editor.rs:1576-1612);
  * floating selections — lift/commit/clipboard semantics
    (texture_editor.rs:1359-1474);
  * UV mode — UvOverlayData over a mesh part, vertex/face selection, box
    select, move drags, bounding-box handle scaling and G/S/R modal
    transforms (texture_editor.rs:3685-4190);
  * screen composition — mode tabs, tool panel, canvas and palette rects
    with input routing (texture_editor.rs:1476-1543, 2554+).

State is plain Python (host UI), rendering goes through ops/draw2d into
the shared framebuffer like every other editor screen.
"""

from __future__ import annotations

import dataclasses
import enum
import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .paint import (BrushShape, DrawTool, PaintState, Selection, _grid,
                    draw_ellipse, draw_line, draw_rect, flood_fill,
                    paint_brush, select_by_color)

# ---------------------------------------------------------------------------
# Palette math (texture_editor.rs:1620-1755)
# ---------------------------------------------------------------------------


def rgb5_to_hsl(r: int, g: int, b: int) -> Tuple[float, float, float]:
    """RGB555 channel values (0-31) -> (h 0-360, s 0-1, l 0-1)."""
    rf, gf, bf = r / 31.0, g / 31.0, b / 31.0
    mx, mn = max(rf, gf, bf), min(rf, gf, bf)
    l = (mx + mn) / 2.0
    if abs(mx - mn) < 0.0001:
        return (0.0, 0.0, l)
    d = mx - mn
    s = d / (2.0 - mx - mn) if l > 0.5 else d / (mx + mn)
    if abs(mx - rf) < 0.0001:
        h = (gf - bf) / d
        if gf < bf:
            h += 6.0
        h *= 60.0
    elif abs(mx - gf) < 0.0001:
        h = ((bf - rf) / d + 2.0) * 60.0
    else:
        h = ((rf - gf) / d + 4.0) * 60.0
    return (h, s, l)


def hsl_to_rgb5(h: float, s: float, l: float) -> Tuple[int, int, int]:
    if abs(s) < 0.0001:
        v = int(round(l * 31.0))
        return (v, v, v)
    h = h % 360.0
    if h < 0.0:
        h += 360.0
    q = l * (1.0 + s) if l < 0.5 else l + s - l * s
    p = 2.0 * l - q

    def hue_to_rgb(t: float) -> float:
        if t < 0.0:
            t += 1.0
        if t > 1.0:
            t -= 1.0
        if t < 1.0 / 6.0:
            return p + (q - p) * 6.0 * t
        if t < 0.5:
            return q
        if t < 2.0 / 3.0:
            return p + (q - p) * (2.0 / 3.0 - t) * 6.0
        return p

    def clamp31(x: float) -> int:
        return int(min(max(round(x * 31.0), 0), 31))

    return (clamp31(hue_to_rgb(h / 360.0 + 1.0 / 3.0)),
            clamp31(hue_to_rgb(h / 360.0)),
            clamp31(hue_to_rgb(h / 360.0 - 1.0 / 3.0)))


def pack15(r: int, g: int, b: int) -> int:
    return (r & 31) | ((g & 31) << 5) | ((b & 31) << 10)


def unpack15(c: int) -> Tuple[int, int, int]:
    return (c & 31, (c >> 5) & 31, (c >> 10) & 31)


def generate_ramp(key_color: Tuple[int, int, int], brightness_range: float,
                  hue_shift: float) -> List[int]:
    """5-color dark->key->light ramp (texture_editor.rs:1689-1723)."""
    h, s, l = rgb5_to_hsl(*key_color)
    l_range = brightness_range * 0.4
    colors = []
    for i in range(5):
        step = i - 2.0
        new_l = min(max(l + step * l_range / 2.0, 0.05), 0.95)
        sat_factor = 1.0 - step * 0.15 if step > 0.0 else 1.0
        new_s = min(max(s * sat_factor, 0.0), 1.0)
        new_h = h + step * hue_shift
        colors.append(pack15(*hsl_to_rgb5(new_h, new_s, new_l)))
    return colors


def generate_palette_from_keys(key_colors, brightness_range: float,
                               hue_shift: float) -> List[int]:
    """16-color palette: slot 0 transparent + three 5-color ramps
    (texture_editor.rs:1730-1753)."""
    palette = [0] * 16
    for ramp_idx, key in enumerate(key_colors):
        ramp = generate_ramp(tuple(key), brightness_range, hue_shift)
        start = 1 + ramp_idx * 5
        palette[start:start + 5] = ramp
    return palette


#: 32 sample swatches (texture_editor.rs:1576-1612), RGB555 triples.
SAMPLE_COLORS_32: Tuple[Tuple[int, int, int], ...] = (
    (0, 0, 0), (3, 5, 10), (15, 4, 10), (0, 16, 10),
    (21, 10, 6), (11, 10, 9), (24, 24, 24), (31, 29, 28),
    (31, 0, 9), (31, 20, 0), (31, 29, 4), (0, 28, 6),
    (5, 21, 31), (16, 14, 19), (31, 14, 20), (31, 25, 20),
    (5, 3, 2), (2, 3, 6), (8, 4, 6), (2, 10, 11),
    (14, 5, 5), (9, 6, 7), (20, 16, 14), (29, 29, 15),
    (23, 2, 9), (31, 13, 4), (20, 28, 5), (0, 22, 8),
    (0, 11, 22), (14, 8, 12), (31, 13, 11), (31, 19, 15),
)


# ---------------------------------------------------------------------------
# Canvas view math (texture_editor.rs:1545-1570)
# ---------------------------------------------------------------------------


def texture_origin(canvas_rect, tex_w: int, tex_h: int, zoom: float,
                   pan_x: float, pan_y: float) -> Tuple[float, float]:
    """Screen-space top-left of the zoomed texture, centered in the canvas."""
    cx = canvas_rect[0] + canvas_rect[2] / 2.0
    cy = canvas_rect[1] + canvas_rect[3] / 2.0
    return (cx - tex_w * zoom / 2.0 + pan_x, cy - tex_h * zoom / 2.0 + pan_y)


def screen_to_texture(sx: float, sy: float, canvas_rect, tex_w: int,
                      tex_h: int, zoom: float, pan_x: float,
                      pan_y: float) -> Tuple[int, int]:
    tx, ty = texture_origin(canvas_rect, tex_w, tex_h, zoom, pan_x, pan_y)
    return (int(math.floor((sx - tx) / zoom)),
            int(math.floor((sy - ty) / zoom)))


def reset_view(tex_w: int, tex_h: int, view_w: float, view_h: float,
               margin: float = 40.0) -> float:
    """Zoom that fits the texture in the canvas (texture_editor.rs:702)."""
    if tex_w <= 0 or tex_h <= 0:
        return 4.0
    z = min((view_w - margin) / tex_w, (view_h - margin) / tex_h)
    return max(1.0, float(int(z)))


class ResizeEdge(enum.Enum):
    TOP = "top"
    BOTTOM = "bottom"
    LEFT = "left"
    RIGHT = "right"
    TOP_LEFT = "top_left"
    TOP_RIGHT = "top_right"
    BOTTOM_LEFT = "bottom_left"
    BOTTOM_RIGHT = "bottom_right"

    @property
    def is_corner(self) -> bool:
        return self in (ResizeEdge.TOP_LEFT, ResizeEdge.TOP_RIGHT,
                        ResizeEdge.BOTTOM_LEFT, ResizeEdge.BOTTOM_RIGHT)


# ---------------------------------------------------------------------------
# Floating selection / clipboard (texture_editor.rs:1359-1474)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ClipboardData:
    """Copied pixel block (texture_editor.rs ClipboardData)."""

    width: int
    height: int
    indices: np.ndarray          # (h, w)
    mask: Optional[np.ndarray]   # (h, w) bool or None


def make_clipboard_from_selection(tex, selection: Selection) -> ClipboardData:
    g = _grid(tex)
    region = g[selection.y:selection.y + selection.h,
               selection.x:selection.x + selection.w].copy()
    mask = None
    if selection.mask is not None:
        mask = selection.mask[selection.y:selection.y + selection.h,
                              selection.x:selection.x + selection.w].copy()
    return ClipboardData(width=selection.w, height=selection.h,
                         indices=region, mask=mask)


def paste_clipboard(tex, clip: ClipboardData, state: "TextureEditorState",
                    at: Optional[Tuple[int, int]] = None) -> Selection:
    """Paste as a floating selection centered (or at `at`), pending commit."""
    if at is None:
        at = ((tex.width - clip.width) // 2, (tex.height - clip.height) // 2)
    sel = Selection(at[0], at[1], clip.width, clip.height)
    sel.floating = clip.indices.copy()
    if clip.mask is not None:
        sel.mask = np.zeros((tex.height, tex.width), bool)
    state.selection = sel
    state.floating_active = True
    return sel


def lift_selection_to_floating(tex, state: "TextureEditorState",
                               background: int = 0) -> None:
    """Cut the selection into a floating block (texture_editor.rs:1415)."""
    sel = state.selection
    if sel is None or sel.floating is not None:
        return
    sel.cut(tex, background)
    state.floating_active = True


def commit_floating_selection(tex, state: "TextureEditorState") -> None:
    """Stamp the floating block down (texture_editor.rs:1452)."""
    sel = state.selection
    if sel is None or sel.floating is None:
        return
    sel.stamp(tex)
    sel.floating = None
    state.floating_active = False


# ---------------------------------------------------------------------------
# UV overlay (texture_editor.rs:414-438, 3685-4190)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class UvOverlayData:
    """Mesh-part UVs projected over the texture for UV-mode editing."""

    vertices: np.ndarray        # (V, 2) f32 uv (0-1)
    vertex_index: np.ndarray    # (V,) i32 global vertex ids
    faces: List[Tuple[int, ...]]  # indices into `vertices`
    selected_faces: List[int] = dataclasses.field(default_factory=list)

    @classmethod
    def from_mesh(cls, uv: np.ndarray, vidx: np.ndarray) -> "UvOverlayData":
        """uv: (V, 2) per-vertex; vidx: (F, 3) faces over those verts."""
        uv = np.asarray(uv, np.float32)
        faces = [tuple(int(v) for v in f) for f in np.asarray(vidx)]
        return cls(vertices=uv.copy(),
                   vertex_index=np.arange(uv.shape[0], dtype=np.int32),
                   faces=faces)


def uv_to_screen(u: float, v: float, tex_x: float, tex_y: float,
                 tex_w: int, tex_h: int, zoom: float) -> Tuple[float, float]:
    """UVs have +v up; screen y grows down (texture_editor.rs:3849-3853)."""
    return (tex_x + u * tex_w * zoom, tex_y + (1.0 - v) * tex_h * zoom)


def screen_to_uv(sx: float, sy: float, tex_x: float, tex_y: float,
                 tex_w: int, tex_h: int, zoom: float) -> Tuple[float, float]:
    return ((sx - tex_x) / zoom / tex_w,
            1.0 - (sy - tex_y) / zoom / tex_h)


def find_nearest_uv_vertex(uv_data: UvOverlayData, sx: float, sy: float,
                           tex_x: float, tex_y: float, tex_w: int,
                           tex_h: int, zoom: float,
                           threshold: float = 10.0) -> Optional[int]:
    """Nearest UV vertex within `threshold` px (texture_editor.rs:3857)."""
    best, best_d = None, threshold
    for i in range(uv_data.vertices.shape[0]):
        vx, vy = uv_to_screen(float(uv_data.vertices[i, 0]),
                              float(uv_data.vertices[i, 1]),
                              tex_x, tex_y, tex_w, tex_h, zoom)
        d = math.hypot(sx - vx, sy - vy)
        if d < best_d:
            best, best_d = i, d
    return best


def calc_uv_selection_bounds(uv_data: UvOverlayData,
                             selection: Sequence[int]
                             ) -> Optional[Tuple[float, float, float, float]]:
    """(min_u, min_v, max_u, max_v) of selected verts
    (texture_editor.rs:3685)."""
    if not selection:
        return None
    pts = uv_data.vertices[np.asarray(list(selection), np.int64)]
    return (float(pts[:, 0].min()), float(pts[:, 1].min()),
            float(pts[:, 0].max()), float(pts[:, 1].max()))


HANDLE_SIZE = 8.0


def find_uv_handle_at(uv_data: UvOverlayData, selection: Sequence[int],
                      sx: float, sy: float, tex_x: float, tex_y: float,
                      tex_w: int, tex_h: int,
                      zoom: float) -> Optional[ResizeEdge]:
    """Bounding-box handle hit test (texture_editor.rs:3881-3919)."""
    bounds = calc_uv_selection_bounds(uv_data, selection)
    if bounds is None:
        return None
    min_u, min_v, max_u, max_v = bounds
    hs = HANDLE_SIZE / 2.0 + 2.0
    x1, y1 = uv_to_screen(min_u, max_v, tex_x, tex_y, tex_w, tex_h, zoom)
    x2, y2 = uv_to_screen(max_u, min_v, tex_x, tex_y, tex_w, tex_h, zoom)
    cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
    if abs(sx - x1) < hs and abs(sy - y1) < hs:
        return ResizeEdge.TOP_LEFT
    if abs(sx - x2) < hs and abs(sy - y1) < hs:
        return ResizeEdge.TOP_RIGHT
    if abs(sx - x1) < hs and abs(sy - y2) < hs:
        return ResizeEdge.BOTTOM_LEFT
    if abs(sx - x2) < hs and abs(sy - y2) < hs:
        return ResizeEdge.BOTTOM_RIGHT
    if x2 - x1 > HANDLE_SIZE * 3.0:
        if abs(sx - cx) < hs and abs(sy - y1) < hs:
            return ResizeEdge.TOP
        if abs(sx - cx) < hs and abs(sy - y2) < hs:
            return ResizeEdge.BOTTOM
    if y2 - y1 > HANDLE_SIZE * 3.0:
        if abs(sx - x1) < hs and abs(sy - cy) < hs:
            return ResizeEdge.LEFT
        if abs(sx - x2) < hs and abs(sy - cy) < hs:
            return ResizeEdge.RIGHT
    return None


def scale_factors_for_handle(handle: ResizeEdge, mouse_uv, anchor,
                             original_bounds) -> Tuple[float, float]:
    """Scale from a handle drag (texture_editor.rs:3925-3962)."""
    min_u, min_v, max_u, max_v = original_bounds
    ow, oh = max_u - min_u, max_v - min_v
    su = sv = 1.0
    if handle.is_corner:
        if ow > 0.001:
            su = abs(mouse_uv[0] - anchor[0]) / ow
        if oh > 0.001:
            sv = abs(mouse_uv[1] - anchor[1]) / oh
    elif handle in (ResizeEdge.LEFT, ResizeEdge.RIGHT):
        if ow > 0.001:
            su = abs(mouse_uv[0] - anchor[0]) / ow
    else:
        if oh > 0.001:
            sv = abs(mouse_uv[1] - anchor[1]) / oh
    return su, sv


def anchor_for_handle(handle: ResizeEdge, bounds) -> Tuple[float, float]:
    """Fixed point opposite the dragged handle."""
    min_u, min_v, max_u, max_v = bounds
    cu, cv = (min_u + max_u) / 2.0, (min_v + max_v) / 2.0
    return {
        ResizeEdge.TOP_LEFT: (max_u, min_v),
        ResizeEdge.TOP_RIGHT: (min_u, min_v),
        ResizeEdge.BOTTOM_LEFT: (max_u, max_v),
        ResizeEdge.BOTTOM_RIGHT: (min_u, max_v),
        ResizeEdge.LEFT: (max_u, cv),
        ResizeEdge.RIGHT: (min_u, cv),
        ResizeEdge.TOP: (cu, min_v),
        ResizeEdge.BOTTOM: (cu, max_v),
    }[handle]


def apply_uv_scale(uv_data: UvOverlayData, selection: Sequence[int],
                   anchor, su: float, sv: float) -> None:
    idx = np.asarray(list(selection), np.int64)
    pts = uv_data.vertices[idx]
    pts[:, 0] = anchor[0] + (pts[:, 0] - anchor[0]) * su
    pts[:, 1] = anchor[1] + (pts[:, 1] - anchor[1]) * sv
    uv_data.vertices[idx] = pts


def apply_uv_translate(uv_data: UvOverlayData, selection: Sequence[int],
                       du: float, dv: float) -> None:
    idx = np.asarray(list(selection), np.int64)
    uv_data.vertices[idx, 0] += du
    uv_data.vertices[idx, 1] += dv


def apply_uv_rotate(uv_data: UvOverlayData, selection: Sequence[int],
                    center, angle: float) -> None:
    idx = np.asarray(list(selection), np.int64)
    pts = uv_data.vertices[idx]
    c, s = math.cos(angle), math.sin(angle)
    du = pts[:, 0] - center[0]
    dv = pts[:, 1] - center[1]
    uv_data.vertices[idx, 0] = center[0] + du * c - dv * s
    uv_data.vertices[idx, 1] = center[1] + du * s + dv * c


class UvOperation(enum.Enum):
    FLIP_H = "flip_h"
    FLIP_V = "flip_v"
    ROTATE_90 = "rotate_90"
    RESET = "reset"


def apply_uv_operation(uv_data: UvOverlayData, selection: Sequence[int],
                       op: UvOperation) -> None:
    """Button-driven UV ops around the selection center."""
    bounds = calc_uv_selection_bounds(uv_data, selection)
    if bounds is None:
        return
    cu = (bounds[0] + bounds[2]) / 2.0
    cv = (bounds[1] + bounds[3]) / 2.0
    idx = np.asarray(list(selection), np.int64)
    if op is UvOperation.FLIP_H:
        uv_data.vertices[idx, 0] = 2.0 * cu - uv_data.vertices[idx, 0]
    elif op is UvOperation.FLIP_V:
        uv_data.vertices[idx, 1] = 2.0 * cv - uv_data.vertices[idx, 1]
    elif op is UvOperation.ROTATE_90:
        apply_uv_rotate(uv_data, selection, (cu, cv), math.pi / 2.0)
    elif op is UvOperation.RESET:
        apply_uv_translate(uv_data, selection, 0.5 - cu, 0.5 - cv)


# ---------------------------------------------------------------------------
# Editor state + input routing
# ---------------------------------------------------------------------------


class TextureEditorMode(enum.Enum):
    PAINT = "paint"
    UV = "uv"


class UvTool(enum.Enum):
    MOVE = "move"
    SCALE = "scale"
    ROTATE = "rotate"


class UvModalTransform(enum.Enum):
    NONE = "none"
    GRAB = "grab"
    SCALE = "scale"
    ROTATE = "rotate"


class TextureEditorState(PaintState):
    """Full editor state (texture_editor.rs:440-580) extending PaintState
    with view, palette-panel, floating-selection and UV-mode state."""

    def __init__(self):
        super().__init__()
        self.zoom = 4.0                      # texture_editor.rs:589
        self.pan_x = 0.0
        self.pan_y = 0.0
        self.panning = False
        self.pan_start = (0.0, 0.0)
        self.pan_start_offset = (0.0, 0.0)
        self.dirty = False
        self.show_grid = True
        self.show_tiling = False
        self.color_tolerance = 0
        self.contiguous_select = True
        self.clipboard: Optional[ClipboardData] = None
        self.floating_active = False
        self.selection_drag_start: Optional[Tuple[int, int]] = None
        self.creating_selection = False
        self.resizing_edge: Optional[ResizeEdge] = None
        self.move_original_pos: Optional[Tuple[int, int]] = None
        self.shape_start: Optional[Tuple[int, int]] = None
        self.last_draw_pos: Optional[Tuple[int, int]] = None
        # palette panel
        self.color_slider: Optional[int] = None
        self.palette_gen_colors = [(24, 16, 12), (8, 12, 20), (12, 18, 8)]
        self.palette_gen_brightness = 0.7
        self.palette_gen_hue_shift = 10.0
        self.palette_gen_editing: Optional[int] = None
        self.sample_colors_open = False
        self.blend_dropdown_open = False
        # UV mode
        self.mode = TextureEditorMode.PAINT
        self.uv_tool = UvTool.MOVE
        self.uv_selection: List[int] = []
        self.uv_drag_active = False
        self.uv_drag_start = (0.0, 0.0)
        self.uv_drag_start_uvs: Optional[np.ndarray] = None
        self.uv_box_select_start: Optional[Tuple[float, float]] = None
        self.uv_modal_transform = UvModalTransform.NONE
        self.uv_modal_start_mouse = (0.0, 0.0)
        self.uv_modal_start_uvs: Optional[np.ndarray] = None
        self.uv_modal_center = (0.5, 0.5)
        self.uv_handle_drag: Optional[ResizeEdge] = None
        self.uv_scale_anchor = (0.0, 0.0)
        self.uv_scale_original_bounds = (0.0, 0.0, 1.0, 1.0)
        self.uv_undo_pending: Optional[str] = None
        self.undo_save_pending: Optional[str] = None
        self.auto_unwrap_requested = False

    # --- palette edits ---------------------------------------------------

    def set_palette_color(self, tex, index: int, r: int, g: int, b: int,
                          save_undo: bool = True) -> None:
        if save_undo:
            self.save_undo(tex, "Edit palette color")
        while len(tex.palette) <= index:
            tex.palette.append(0)
        tex.palette[index] = pack15(r, g, b)
        self.dirty = True

    def apply_generated_palette(self, tex) -> None:
        self.save_undo(tex, "Generate palette")
        pal = generate_palette_from_keys(self.palette_gen_colors,
                                         self.palette_gen_brightness,
                                         self.palette_gen_hue_shift)
        n = min(len(pal), max(len(tex.palette), 16))
        while len(tex.palette) < n:
            tex.palette.append(0)
        tex.palette[:16] = pal
        self.dirty = True

    # --- selection lifecycle --------------------------------------------

    def copy_selection(self, tex) -> None:
        if self.selection is not None:
            self.clipboard = make_clipboard_from_selection(tex,
                                                           self.selection)
            self.status = "Copied selection"

    def cut_selection(self, tex, background: int = 0) -> None:
        if self.selection is None:
            return
        self.save_undo(tex, "Cut selection")
        self.clipboard = make_clipboard_from_selection(tex, self.selection)
        g = _grid(tex)
        sel = self.selection
        if sel.mask is not None:
            sub = sel.mask[sel.y:sel.y + sel.h, sel.x:sel.x + sel.w]
            g[sel.y:sel.y + sel.h, sel.x:sel.x + sel.w][sub] = background
        else:
            g[sel.y:sel.y + sel.h, sel.x:sel.x + sel.w] = background
        tex.indices = g.reshape(-1)
        self.selection = None
        self.dirty = True

    def paste(self, tex) -> None:
        if self.clipboard is None:
            return
        self.save_undo(tex, "Paste")
        paste_clipboard(tex, self.clipboard, self)
        self.tool = DrawTool.SELECT

    # --- UV interactions -------------------------------------------------

    def uv_click_select(self, uv_data: UvOverlayData, sx, sy, tex_x, tex_y,
                        tex_w, tex_h, additive: bool = False) -> None:
        """Click selection: nearest vertex within threshold; shift adds
        (texture_editor.rs:4030-4075)."""
        hit = find_nearest_uv_vertex(uv_data, sx, sy, tex_x, tex_y,
                                     tex_w, tex_h, self.zoom)
        if hit is None:
            if not additive:
                self.uv_selection = []
            return
        if additive:
            if hit in self.uv_selection:
                self.uv_selection.remove(hit)
            else:
                self.uv_selection.append(hit)
        else:
            self.uv_selection = [hit]

    def uv_box_select(self, uv_data: UvOverlayData, s0, s1, tex_x, tex_y,
                      tex_w, tex_h, additive: bool = False) -> None:
        """Box selection of UV verts in screen space."""
        x0, x1 = sorted((s0[0], s1[0]))
        y0, y1 = sorted((s0[1], s1[1]))
        hits = []
        for i in range(uv_data.vertices.shape[0]):
            vx, vy = uv_to_screen(float(uv_data.vertices[i, 0]),
                                  float(uv_data.vertices[i, 1]),
                                  tex_x, tex_y, tex_w, tex_h, self.zoom)
            if x0 <= vx <= x1 and y0 <= vy <= y1:
                hits.append(i)
        if additive:
            self.uv_selection = sorted(set(self.uv_selection) | set(hits))
        else:
            self.uv_selection = hits

    def uv_begin_move(self, uv_data: UvOverlayData, sx: float,
                      sy: float) -> None:
        self.uv_drag_active = True
        self.uv_drag_start = (sx, sy)
        self.uv_drag_start_uvs = uv_data.vertices.copy()

    def uv_update_move(self, uv_data: UvOverlayData, sx: float, sy: float,
                       tex_w: int, tex_h: int) -> None:
        if not self.uv_drag_active or self.uv_drag_start_uvs is None:
            return
        du = (sx - self.uv_drag_start[0]) / self.zoom / tex_w
        dv = -(sy - self.uv_drag_start[1]) / self.zoom / tex_h
        idx = np.asarray(self.uv_selection, np.int64)
        uv_data.vertices[idx] = self.uv_drag_start_uvs[idx] + [du, dv]

    def uv_end_move(self) -> None:
        if self.uv_drag_active:
            self.uv_drag_active = False
            self.uv_undo_pending = "Move UVs"

    def uv_begin_handle_drag(self, uv_data: UvOverlayData,
                             handle: ResizeEdge) -> None:
        bounds = calc_uv_selection_bounds(uv_data, self.uv_selection)
        if bounds is None:
            return
        self.uv_handle_drag = handle
        self.uv_scale_original_bounds = bounds
        self.uv_scale_anchor = anchor_for_handle(handle, bounds)
        self.uv_drag_start_uvs = uv_data.vertices.copy()

    def uv_update_handle_drag(self, uv_data: UvOverlayData,
                              mouse_uv) -> None:
        if self.uv_handle_drag is None or self.uv_drag_start_uvs is None:
            return
        su, sv = scale_factors_for_handle(
            self.uv_handle_drag, mouse_uv, self.uv_scale_anchor,
            self.uv_scale_original_bounds)
        idx = np.asarray(self.uv_selection, np.int64)
        uv_data.vertices[idx] = self.uv_drag_start_uvs[idx]
        apply_uv_scale(uv_data, self.uv_selection, self.uv_scale_anchor,
                       su, sv)

    def uv_end_handle_drag(self) -> None:
        if self.uv_handle_drag is not None:
            self.uv_handle_drag = None
            self.uv_undo_pending = "Scale UVs"


# ---------------------------------------------------------------------------
# Screen composition (texture_editor.rs:1476-1543 mode tabs + panel layout)
# ---------------------------------------------------------------------------

TOOL_PANEL_W = 56.0
PALETTE_PANEL_W = 120.0
TAB_H = 22.0


@dataclasses.dataclass
class TextureEditorLayout:
    """Routed rects for the composed screen."""

    tabs: Tuple[float, float, float, float]
    tool_panel: Tuple[float, float, float, float]
    canvas: Tuple[float, float, float, float]
    palette_panel: Tuple[float, float, float, float]


def layout_screen(x: float, y: float, w: float,
                  h: float) -> TextureEditorLayout:
    return TextureEditorLayout(
        tabs=(x, y, w, TAB_H),
        tool_panel=(x, y + TAB_H, TOOL_PANEL_W, h - TAB_H),
        canvas=(x + TOOL_PANEL_W, y + TAB_H,
                w - TOOL_PANEL_W - PALETTE_PANEL_W, h - TAB_H),
        palette_panel=(x + w - PALETTE_PANEL_W, y + TAB_H,
                       PALETTE_PANEL_W, h - TAB_H),
    )


def route_click(layout: TextureEditorLayout, sx: float,
                sy: float) -> str:
    """Which region a point lands in: tabs/tools/canvas/palette/none."""
    def inside(r):
        return r[0] <= sx < r[0] + r[2] and r[1] <= sy < r[1] + r[3]
    if inside(layout.tabs):
        return "tabs"
    if inside(layout.tool_panel):
        return "tools"
    if inside(layout.palette_panel):
        return "palette"
    if inside(layout.canvas):
        return "canvas"
    return "none"


# ---------------------------------------------------------------------------
# Screen drawing (texture_editor.rs:1755-2554 draw_texture_canvas,
# 2554+ draw_tool_panel, 3095+ draw_palette_panel) via the UiContext
# command queue, same style as editor/grid_view.py.
# ---------------------------------------------------------------------------

_CHECKER_A = (28, 28, 32)
_CHECKER_B = (40, 40, 46)
_GRID_RGB = (70, 70, 80)
_ANTS_RGB = (255, 255, 255)
_UV_WIRE = (90, 200, 255)
_UV_SEL = (255, 200, 60)


def _c15_to_rgb8(c: int) -> Tuple[int, int, int]:
    r, g, b = unpack15(c)
    return ((r << 3) | (r >> 2), (g << 3) | (g >> 2), (b << 3) | (b >> 2))


def draw_texture_canvas(ctx, rect, tex, state: TextureEditorState,
                        uv_data: Optional[UvOverlayData] = None,
                        frame: int = 0) -> None:
    """Zoomed texture + grid/tiling/selection/UV overlay in `rect`."""
    from ..ui.rect import Rect

    ctx.set_clip(rect)
    ctx.fill(rect, (15, 15, 18))
    z = state.zoom
    tx, ty = texture_origin((rect.x, rect.y, rect.w, rect.h),
                            tex.width, tex.height, z, state.pan_x,
                            state.pan_y)
    g = _grid(tex)
    lut = [(0, 0, 0)] * 256
    for i, c in enumerate(tex.palette[:256]):
        lut[i] = _c15_to_rgb8(int(c))

    copies = ([(dx, dy) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
              if state.show_tiling else [(0, 0)])
    for cdx, cdy in copies:
        ox = tx + cdx * tex.width * z
        oy = ty + cdy * tex.height * z
        if (ox + tex.width * z < rect.x or ox > rect.right
                or oy + tex.height * z < rect.y or oy > rect.bottom):
            continue
        dim = (cdx, cdy) != (0, 0)
        for py in range(tex.height):
            for px in range(tex.width):
                idx = int(g[py, px])
                if idx == 0:
                    # checkerboard for transparent slot 0
                    rgb = _CHECKER_A if (px + py) % 2 == 0 else _CHECKER_B
                else:
                    rgb = lut[idx]
                if dim:
                    rgb = tuple(v // 2 for v in rgb)
                ctx.fill(Rect(ox + px * z, oy + py * z, z, z), rgb)

    if state.show_grid and z >= 4.0:
        for px in range(tex.width + 1):
            ctx.line(tx + px * z, ty, tx + px * z, ty + tex.height * z,
                     _GRID_RGB, alpha=80)
        for py in range(tex.height + 1):
            ctx.line(tx, ty + py * z, tx + tex.width * z, ty + py * z,
                     _GRID_RGB, alpha=80)

    # marching-ants selection (texture_editor.rs:1202-1314)
    sel = state.selection
    if sel is not None:
        x0, y0 = tx + sel.x * z, ty + sel.y * z
        x1, y1 = x0 + sel.w * z, y0 + sel.h * z
        dash, off = 4.0, float(frame % 8)
        for (ax, ay, bx, by) in ((x0, y0, x1, y0), (x1, y0, x1, y1),
                                 (x1, y1, x0, y1), (x0, y1, x0, y0)):
            seg = math.hypot(bx - ax, by - ay)
            steps = max(int(seg / dash), 1)
            for i in range(steps):
                if (i + int(off / dash)) % 2 == 0:
                    t0, t1 = i / steps, min((i + 1) / steps, 1.0)
                    ctx.line(ax + (bx - ax) * t0, ay + (by - ay) * t0,
                             ax + (bx - ax) * t1, ay + (by - ay) * t1,
                             _ANTS_RGB)

    # UV overlay (texture_editor.rs:3716-3820)
    if uv_data is not None and state.mode is TextureEditorMode.UV:
        sel_set = set(state.uv_selection)
        for face in uv_data.faces:
            n = len(face)
            for i in range(n):
                a, b = face[i], face[(i + 1) % n]
                ax, ay = uv_to_screen(float(uv_data.vertices[a, 0]),
                                      float(uv_data.vertices[a, 1]),
                                      tx, ty, tex.width, tex.height, z)
                bx, by = uv_to_screen(float(uv_data.vertices[b, 0]),
                                      float(uv_data.vertices[b, 1]),
                                      tx, ty, tex.width, tex.height, z)
                ctx.line(ax, ay, bx, by, _UV_WIRE, alpha=180)
        for i in range(uv_data.vertices.shape[0]):
            vx, vy = uv_to_screen(float(uv_data.vertices[i, 0]),
                                  float(uv_data.vertices[i, 1]),
                                  tx, ty, tex.width, tex.height, z)
            rgb = _UV_SEL if i in sel_set else _UV_WIRE
            ctx.fill(Rect(vx - 2, vy - 2, 4, 4), rgb)
        bounds = calc_uv_selection_bounds(uv_data, state.uv_selection)
        if bounds is not None and len(state.uv_selection) > 1:
            x0, y0 = uv_to_screen(bounds[0], bounds[3], tx, ty,
                                  tex.width, tex.height, z)
            x1, y1 = uv_to_screen(bounds[2], bounds[1], tx, ty,
                                  tex.width, tex.height, z)
            ctx.outline(Rect(x0, y0, x1 - x0, y1 - y0), _UV_SEL)
            hs = HANDLE_SIZE
            cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
            for hx, hy in ((x0, y0), (x1, y0), (x0, y1), (x1, y1),
                           (cx, y0), (cx, y1), (x0, cy), (x1, cy)):
                ctx.fill(Rect(hx - hs / 2, hy - hs / 2, hs, hs), _UV_SEL)
    ctx.set_clip(None)


def draw_palette_panel(ctx, rect, tex, state: TextureEditorState) -> None:
    """Palette slots + RGB sliders + generator row
    (texture_editor.rs:3095-3685, swatch grid and slider behavior)."""
    from ..ui.rect import Rect

    ctx.set_clip(rect)
    ctx.fill(rect, (25, 25, 30))
    cell = (rect.w - 8) / 4.0
    n = max(len(tex.palette), 16)
    for i in range(min(n, 64)):
        cx = rect.x + 4 + (i % 4) * cell
        cy = rect.y + 4 + (i // 4) * cell
        r = Rect(cx, cy, cell - 2, cell - 2)
        if i < len(tex.palette):
            ctx.fill(r, _c15_to_rgb8(int(tex.palette[i])))
        else:
            ctx.fill(r, (10, 10, 10))
        if i == state.primary_index:
            ctx.outline(r, (255, 255, 255))
        if ctx.mouse.pressed and r.contains(ctx.mouse.x, ctx.mouse.y):
            state.primary_index = i
    # RGB sliders for the selected slot
    rows = (min(n, 64) + 3) // 4
    sy = rect.y + 8 + rows * cell
    cur = unpack15(int(tex.palette[state.primary_index])
                   if state.primary_index < len(tex.palette) else 0)
    for ch, (label, val) in enumerate(zip("RGB", cur)):
        ry = sy + ch * 16
        bar = Rect(rect.x + 16, ry, rect.w - 24, 12)
        ctx.text(rect.x + 4, ry + 2, label)
        ctx.fill(bar, (45, 45, 52))
        fillw = bar.w * val / 31.0
        ctx.fill(Rect(bar.x, bar.y, fillw, bar.h), (120, 120, 140))
        if ctx.mouse.down and bar.contains(ctx.mouse.x, ctx.mouse.y):
            nv = int(round((ctx.mouse.x - bar.x) / bar.w * 31.0))
            nv = min(max(nv, 0), 31)
            rgb = list(cur)
            rgb[ch] = nv
            state.set_palette_color(tex, state.primary_index, *rgb,
                                    save_undo=ctx.mouse.pressed)
            state.color_slider = ch
        elif not ctx.mouse.down:
            state.color_slider = None
    ctx.set_clip(None)


def draw_texture_editor(ctx, rect, tex, state: TextureEditorState,
                        uv_data: Optional[UvOverlayData] = None,
                        frame: int = 0) -> TextureEditorLayout:
    """Full composed screen; returns the layout for external routing."""
    from ..ui.rect import Rect

    lay = layout_screen(rect.x, rect.y, rect.w, rect.h)
    # mode tabs (texture_editor.rs:1476-1543)
    tabs = [("Paint", TextureEditorMode.PAINT), ("UV", TextureEditorMode.UV)]
    tw = 64.0
    for i, (label, mode) in enumerate(tabs):
        r = Rect(lay.tabs[0] + i * tw, lay.tabs[1], tw - 2, lay.tabs[3] - 2)
        active = state.mode is mode
        ctx.fill(r, (60, 60, 72) if active else (32, 32, 38))
        ctx.text(r.x + 8, r.y + 6, label)
        if ctx.mouse.pressed and r.contains(ctx.mouse.x, ctx.mouse.y):
            state.mode = mode
    # tool panel: one button per DrawTool (texture_editor.rs:2554+)
    tp = Rect(*lay.tool_panel)
    ctx.fill(tp, (22, 22, 27))
    for i, tool in enumerate(DrawTool):
        r = Rect(tp.x + 4, tp.y + 4 + i * 24, tp.w - 8, 20)
        active = state.tool is tool
        ctx.fill(r, (70, 70, 85) if active else (36, 36, 42))
        ctx.text(r.x + 4, r.y + 4, tool.name[:6].title())
        if ctx.mouse.pressed and r.contains(ctx.mouse.x, ctx.mouse.y):
            state.tool = tool
    draw_texture_canvas(ctx, Rect(*lay.canvas), tex, state, uv_data, frame)
    draw_palette_panel(ctx, Rect(*lay.palette_panel), tex, state)
    return lay

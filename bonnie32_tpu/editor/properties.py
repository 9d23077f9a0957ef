"""Editor properties panel: per-selection editing surface.

`draw_properties` (`/root/reference/src/editor/layout.rs:5204-6100`) with
the container bodies of `draw_horizontal_face_container` (:3679) /
`draw_wall_face_container` (:4764) / `draw_room_properties` (:3014):

  * floor/ceiling: split-direction toggle with the triangle diagram,
    dual texture slots with the link toggle (texture_2 None == linked;
    clicking a slot applies the palette's selected texture to Tri1/Tri2/
    both), heights link + raise/lower-by-256 buttons per triangle,
  * walls: per-corner heights, texture slot, solid flag, UV projection,
  * both: the 2x2 corner color swatches with multi-select feeding one
    PS1 color picker + blend-mode row (edits every selected corner),
    normal-mode three-way toggle, black-transparent eye toggle,
  * objects: name, enabled, height/facing,
  * rooms: ambient + fog (enabled, color, start/falloff/cull).

Continuous drags snapshot undo on the press edge; discrete toggles on
the click (state.save_undo, state.rs:938).
"""

import dataclasses
import math
from typing import Dict, Optional

from ..models.level import UV_SCALE
from ..ui import Rect, UiContext
from ..ui.widgets import (button, checkbox, drag_value,
                          ps1_color_picker_with_blend_mode,
                          ps1_color_picker, slider, three_way_toggle)
from .state import CLICK_HEIGHT, EditorState, SectorFace

ROW = 18.0
HEADER = (255, 255, 255)
DIM = (150, 150, 150)
FAINT = (100, 100, 100)

_NORMAL_LABELS = ("Front", "Both", "Back")   # level._NORMAL_MODES order
_UV_LABELS = ("Default", "Projected")


def _undo_once(state: EditorState, ctx: UiContext, key: str,
               ui: Dict) -> None:
    """One undo snapshot per drag gesture (press edge) or per click."""
    if ui.get("undo_gesture") != key:
        state.save_undo()
        ui["undo_gesture"] = key


def _end_gestures(ctx: UiContext, ui: Dict) -> None:
    if not ctx.mouse.down:
        ui.pop("undo_gesture", None)


def _tex_name(t) -> str:
    if t is None:
        return "(none)"
    name = getattr(t, "name", None) or getattr(t, "user_id", None)
    return str(name) if name else "(none)"


def _face_colors_section(ctx: UiContext, x: float, y: float, w: float,
                         state: EditorState, face, colors_attr: str,
                         wid: str, ui: Dict) -> float:
    """2x2 corner swatches + shared picker (layout.rs:4179-4300)."""
    sel = ui.setdefault("corner_sel", [0])
    sw, gap = 18.0, 3.0
    # grid order NW NE / SW SE -> corner indices 0 1 / 3 2
    for k, ci in enumerate((0, 1, 3, 2)):
        r = Rect(x + (k % 2) * (sw + gap), y + (k // 2) * (sw + gap),
                 sw, sw)
        rgb = getattr(face, colors_attr)[ci][0]
        ctx.fill(r, rgb)
        selected = ci in sel
        ctx.outline(r, (0, 255, 255) if selected else (90, 90, 100))
        if r.contains(ctx.mouse.x, ctx.mouse.y) and ctx.mouse.pressed:
            if selected:
                if len(sel) > 1:
                    sel.remove(ci)
            else:
                sel.append(ci)
    picker_x = x + 2 * sw + gap + 10.0
    first = sel[0] if sel else 0
    cur_rgb, cur_blend = getattr(face, colors_attr)[first]
    (new_rgb, new_blend), _ = ps1_color_picker_with_blend_mode(
        ctx, f"{wid}.col", picker_x, y, w - (picker_x - x), tuple(cur_rgb),
        cur_blend, (128, 128, 128), "", ui)
    if new_rgb is not None or new_blend is not None:
        _undo_once(state, ctx, f"{wid}.col", ui)
        cols = list(getattr(face, colors_attr))
        for ci in sel:
            rgb, bl = cols[ci]
            cols[ci] = (new_rgb if new_rgb is not None else rgb,
                        new_blend if new_blend is not None else bl)
        setattr(face, colors_attr, cols)
        state.dirty = True
    return y + max(2 * sw + gap, 56.0) + 6.0


def _multi_selected_faces(state: EditorState):
    """Faces referenced by the multi-selection (apply_normal_mode_to_face /
    apply_black_transparent_to_face walk these, layout.rs:637-667)."""
    out = []
    for sel in state.multi_selection:
        if sel.kind not in ("sector_face", "vertex") or sel.face is None:
            continue
        if not (0 <= sel.room < len(state.level.rooms)):
            continue
        sector = state.level.rooms[sel.room].get_sector(sel.x, sel.z)
        if sector is None:
            continue
        f = sel.face
        if f.kind == "floor":
            if sector.floor is not None:
                out.append(sector.floor)
        elif f.kind == "ceiling":
            if sector.ceiling is not None:
                out.append(sector.ceiling)
        else:
            walls = sector.walls(f.direction)
            if 0 <= f.wall_index < len(walls):
                out.append(walls[f.wall_index])
    return out


def _face_flags_section(ctx: UiContext, x: float, y: float, w: float,
                        state: EditorState, face, wid: str,
                        ui: Dict) -> float:
    """Normal mode + black-transparent, applied to the primary face AND
    every multi-selected face (layout.rs:4620-4680, :637-667)."""
    targets = [face] + _multi_selected_faces(state)
    new_mode = three_way_toggle(ctx, Rect(x, y, min(w, 150.0), 16.0),
                                _NORMAL_LABELS, face.normal_mode)
    if new_mode is not None:
        state.save_undo()
        for f in targets:
            f.normal_mode = new_mode
        state.dirty = True
    y += 20.0
    new_bt = checkbox(ctx, f"{wid}.bt", Rect(x, y, 14, 14),
                      face.black_transparent, "Black transparent")
    if new_bt != face.black_transparent:
        state.save_undo()
        for f in targets:
            f.black_transparent = new_bt
        state.dirty = True
    return y + 20.0


# --- UV parameter editing (layout.rs:4418-4762) ---------------------------

def default_uv():
    """The identity quad [(0,0),(S,0),(S,S),(0,S)], UV_SCALE=0.5
    (geometry.rs:15)."""
    s = float(UV_SCALE)
    return [(0.0, 0.0), (s, 0.0), (s, s), (0.0, s)]


def flip_uv_horizontal(uv):
    """layout.rs:4418 — mirror X within the UV_SCALE span."""
    s = float(UV_SCALE)
    cur = list(uv) if uv is not None else default_uv()
    return [(s - u, v) for u, v in cur]


def flip_uv_vertical(uv):
    """layout.rs:4436 — mirror Y within the UV_SCALE span."""
    s = float(UV_SCALE)
    cur = list(uv) if uv is not None else default_uv()
    return [(u, s - v) for u, v in cur]


def rotate_uv_cw(uv):
    """layout.rs:4455 — each corner takes the previous corner's UV."""
    cur = list(uv) if uv is not None else default_uv()
    return [cur[3], cur[0], cur[1], cur[2]]


@dataclasses.dataclass
class UvParams:
    """layout.rs:4477 — offset in blocks, scale normalized to UV_SCALE,
    angle in degrees."""

    x_offset: float = 0.0
    y_offset: float = 0.0
    x_scale: float = 1.0
    y_scale: float = 1.0
    angle: float = 0.0


def extract_uv_params(uv) -> UvParams:
    """layout.rs:4499-4537 — center offset, NW->NE/NW->SW edge lengths,
    NW->NE edge angle."""
    s = float(UV_SCALE)
    c = list(uv) if uv is not None else default_uv()
    cx = (c[0][0] + c[1][0] + c[2][0] + c[3][0]) / 4.0
    cy = (c[0][1] + c[1][1] + c[2][1] + c[3][1]) / 4.0
    width = math.hypot(c[1][0] - c[0][0], c[1][1] - c[0][1])
    height = math.hypot(c[3][0] - c[0][0], c[3][1] - c[0][1])
    angle = math.degrees(math.atan2(c[1][1] - c[0][1], c[1][0] - c[0][0]))
    return UvParams(x_offset=(cx - s / 2.0) / s,
                    y_offset=(cy - s / 2.0) / s,
                    x_scale=width / s, y_scale=height / s, angle=angle)


def apply_uv_params(p: UvParams):
    """layout.rs:4539-4579 — scaled quad rotated about its center, then
    translated to UV_SCALE/2 + offset blocks."""
    s = float(UV_SCALE)
    hw = p.x_scale * s / 2.0
    hh = p.y_scale * s / 2.0
    corners = [(-hw, -hh), (hw, -hh), (hw, hh), (-hw, hh)]
    rad = math.radians(p.angle)
    ca, sa = math.cos(rad), math.sin(rad)
    cx = s / 2.0 + p.x_offset * s
    cy = s / 2.0 + p.y_offset * s
    return [(px * ca - py * sa + cx, px * sa + py * ca + cy)
            for px, py in corners]


def _uv_controls(ctx: UiContext, wid: str, x: float, y: float, w: float,
                 state: EditorState, face, attr: str, ui: Dict) -> float:
    """layout.rs:4581-4762 draw_uv_controls: X/Y pixel offset rows with
    -32/-1/+1/+32 steppers, scale + angle drags, flip/rotate buttons."""
    uv = getattr(face, attr)
    params = extract_uv_params(uv)
    changed = False
    ctx.text(x, y + 3, "UV", DIM)
    y += 16.0
    for axis, label in (("x_offset", "X:"), ("y_offset", "Y:")):
        px = int(round(getattr(params, axis) * 32.0)) % 64
        ctx.text(x, y + 3, label, FAINT)
        steps = ((f"{wid}.{axis}.c-", "<<", -1.0),
                 (f"{wid}.{axis}.f-", "<", -1.0 / 32.0),
                 (None, f"{px}px", 0.0),
                 (f"{wid}.{axis}.f+", ">", 1.0 / 32.0),
                 (f"{wid}.{axis}.c+", ">>", 1.0))
        bx = x + 20
        for sid, lab, delta in steps:
            r = Rect(bx, y, 26 if sid is None else 18, 16)
            if sid is None:
                ctx.text(r.x + 2, r.center_y, lab, HEADER)
            elif button(ctx, sid, r, lab):
                setattr(params, axis, getattr(params, axis) + delta)
                changed = True
            bx += r.w + 2
        y += 18.0
    for axis, label in (("x_scale", "SX"), ("y_scale", "SY"),
                        ("angle", "Rot")):
        ctx.text(x, y + 3, label, FAINT)
        st = ui.setdefault(f"{wid}.{axis}", {})
        speed = 0.5 if axis == "angle" else 0.01
        new = drag_value(ctx, f"{wid}.{axis}", Rect(x + 30, y, 60, 16),
                         getattr(params, axis), speed=speed, state=st)
        if new != getattr(params, axis):
            _undo_once(state, ctx, f"{wid}.{axis}", ui)
            setattr(params, axis, new)
            setattr(face, attr, apply_uv_params(params))
            state.dirty = True
        y += 18.0
    bx = x
    for sid, lab, fn in ((f"{wid}.fh", "FlipH", flip_uv_horizontal),
                         (f"{wid}.fv", "FlipV", flip_uv_vertical),
                         (f"{wid}.rot", "RotCW", rotate_uv_cw)):
        if button(ctx, sid, Rect(bx, y, 46, 16), lab):
            state.save_undo()
            setattr(face, attr, fn(getattr(face, attr)))
            state.dirty = True
        bx += 50
    y += 20.0
    if changed:
        state.save_undo()
        setattr(face, attr, apply_uv_params(params))
        state.dirty = True
    return y


def _horizontal_container(ctx: UiContext, x: float, y: float, w: float,
                          state: EditorState, room, gx: int, gz: int,
                          is_floor: bool, ui: Dict) -> float:
    sector = room.get_sector(gx, gz)
    face = (sector.floor if is_floor else sector.ceiling) \
        if sector is not None else None
    name = "Floor" if is_floor else "Ceiling"
    ctx.text(x, y, name, (150, 200, 255) if is_floor else (200, 150, 255))
    y += ROW
    if face is None:
        ctx.text(x, y, f"(no {name.lower()})", FAINT)
        return y + ROW

    # split-direction toggle (layout.rs:3756-3800)
    if button(ctx, f"h.split", Rect(x, y, 52, 16),
              "NwSe" if face.split_direction == 0 else "NeSw"):
        state.save_undo()
        face.split_direction = 1 - face.split_direction
        state.dirty = True
    # texture link + slots (layout.rs:3790-3920)
    linked = face.texture_2 is None
    if button(ctx, "h.texlink", Rect(x + 58, y, 40, 16),
              "Link" if linked else "Unlk"):
        state.save_undo()
        face.texture_2 = None if not linked else face.texture
        state.dirty = True
    y += 20.0
    for label, attr in (("Tri1", "texture"),
                        ("Tri2", "texture_2")):
        t = getattr(face, attr)
        shown = face.texture if (attr == "texture_2" and t is None) else t
        r = Rect(x, y, w - 4, 16)
        ctx.fill(r, (36, 36, 43))
        ctx.outline(r, (70, 70, 80))
        ctx.text(r.x + 3, r.center_y, f"{label}: {_tex_name(shown)}", DIM)
        if (r.contains(ctx.mouse.x, ctx.mouse.y) and ctx.mouse.pressed
                and state.selected_texture is not None):
            state.save_undo()
            if linked:
                face.texture = state.selected_texture
            else:
                setattr(face, attr, state.selected_texture)
            state.dirty = True
        y += 18.0

    # heights: link toggle + -/+ 256 buttons (layout.rs:3920-4030)
    hlinked = face.heights_2 is None
    if button(ctx, "h.hlink", Rect(x, y, 40, 16),
              "HLnk" if hlinked else "HUnl"):
        state.save_undo()
        face.heights_2 = None if not hlinked else list(face.heights)
        state.dirty = True
    if is_floor:
        # Extrude button (layout.rs:4362-4402): +256, walls connect
        er = Rect(x + w - 70, y, 64, 16)
        hovered = er.contains(ctx.mouse.x, ctx.mouse.y)
        ctx.fill(er, (60, 80, 100) if hovered else (40, 45, 55))
        ctx.outline(er, (80, 90, 100))
        ctx.text(er.x + 4, er.center_y, "Extrude")
        if hovered and ctx.mouse.pressed:
            state.save_undo()
            if sector.extrude_floor(CLICK_HEIGHT, state.selected_texture):
                state.set_status("Extruded floor by 256 units", 2.0)
                state.dirty = True
    rows = ((("", "heights"),) if hlinked
            else (("Tri1", "heights"), ("Tri2", "heights_2")))
    hx = x + 46
    for label, attr in rows:
        hs = getattr(face, attr)
        ctx.text(hx, y + 3, f"{label} H: {hs[0]:.0f}", DIM)
        if button(ctx, f"h.{attr}.minus", Rect(hx + 80, y, 18, 16), "-"):
            state.save_undo()
            setattr(face, attr, [h - CLICK_HEIGHT for h in hs])
            state.dirty = True
        if button(ctx, f"h.{attr}.plus", Rect(hx + 102, y, 18, 16), "+"):
            state.save_undo()
            setattr(face, attr, [h + CLICK_HEIGHT for h in hs])
            state.dirty = True
        y += 18.0
    y += 4.0

    y = _face_colors_section(ctx, x, y, w, state, face, "colors", "h", ui)
    y = _face_flags_section(ctx, x, y, w, state, face, "h", ui)
    y = _uv_controls(ctx, "h.uv", x, y, w, state, face, "uv", ui)
    if state.dirty:
        room.recalculate_bounds()
    return y


def _wall_container(ctx: UiContext, x: float, y: float, w: float,
                    state: EditorState, room, gx: int, gz: int,
                    face_sel: SectorFace, ui: Dict) -> float:
    sector = room.get_sector(gx, gz)
    walls = sector.walls(face_sel.direction) if sector is not None else []
    if not (0 <= face_sel.wall_index < len(walls)):
        ctx.text(x, y, "(wall gone)", FAINT)
        return y + ROW
    wall = walls[face_sel.wall_index]
    dname = ("North", "East", "South", "West", "NwSe", "NeSw")[
        face_sel.direction]
    ctx.text(x, y, f"Wall ({dname})", (255, 180, 120))
    y += ROW

    # texture slot
    r = Rect(x, y, w - 4, 16)
    ctx.fill(r, (36, 36, 43))
    ctx.outline(r, (70, 70, 80))
    ctx.text(r.x + 3, r.center_y, f"Tex: {_tex_name(wall.texture)}", DIM)
    if (r.contains(ctx.mouse.x, ctx.mouse.y) and ctx.mouse.pressed
            and state.selected_texture is not None):
        state.save_undo()
        wall.texture = state.selected_texture
        state.dirty = True
    y += 20.0

    # per-corner heights [BL, BR, TR, TL] as drag values
    labels = ("BL", "BR", "TR", "TL")
    for i in range(4):
        r = Rect(x + (i % 2) * ((w - 8) / 2), y + (i // 2) * 18.0,
                 (w - 8) / 2 - 4, 16)
        ctx.text(r.x, r.center_y, labels[i], FAINT)
        vr = Rect(r.x + 20, r.y, r.w - 20, 16)
        st = ui.setdefault(f"w.h{i}", {})
        new = drag_value(ctx, f"w.h{i}", vr, wall.heights[i], speed=4.0,
                         state=st)
        if new != wall.heights[i]:
            _undo_once(state, ctx, "w.heights", ui)
            wall.heights[i] = new
            state.dirty = True
    y += 2 * 18.0 + 4.0

    # solid + UV projection
    new_solid = checkbox(ctx, "w.solid", Rect(x, y, 14, 14), wall.solid,
                         "Solid")
    if new_solid != wall.solid:
        state.save_undo()
        wall.solid = new_solid
        state.dirty = True
    new_uv = three_way_toggle(ctx, Rect(x + 90, y, 110, 16), _UV_LABELS,
                              wall.uv_projection)
    if new_uv is not None:
        state.save_undo()
        wall.uv_projection = new_uv
        state.dirty = True
    y += 22.0

    y = _face_colors_section(ctx, x, y, w, state, wall, "colors", "w", ui)
    y = _face_flags_section(ctx, x, y, w, state, wall, "w", ui)
    y = _uv_controls(ctx, "w.uv", x, y, w, state, wall, "uv", ui)
    if state.dirty:
        room.recalculate_bounds()
    return y


_SECTION = (120, 150, 180)


def _player_spawn_section(ctx: UiContext, x: float, y: float, w: float,
                          state: EditorState, room, obj, ui: Dict,
                          scene=None) -> float:
    """layout.rs:5878-5996 — a player-spawn object edits the level's
    PlayerSettings in place: Collision / Movement / Camera prop fields
    plus a live rendered camera preview."""
    ps = state.level.player_settings
    groups = (("Collision", (("Radius", "radius", 4.0),
                             ("Height", "height", 8.0),
                             ("Step", "step_height", 4.0))),
              ("Movement", (("Walk", "walk_speed", 20.0),
                            ("Run", "run_speed", 20.0),
                            ("Gravity", "gravity", 20.0))),
              ("Camera", (("Distance", "camera_distance", 20.0),
                          ("Y Offset", "camera_vertical_offset", 10.0))))
    for title, fields in groups:
        ctx.text(x, y, title, _SECTION)
        y += 18.0
        for label, attr, speed in fields:
            ctx.text(x, y + 3, label, FAINT)
            st = ui.setdefault(f"ps.{attr}", {})
            new = drag_value(ctx, f"ps.{attr}", Rect(x + 60, y, 80, 16),
                             getattr(ps, attr), speed=speed, state=st)
            if new != getattr(ps, attr):
                _undo_once(state, ctx, f"ps.{attr}", ui)
                setattr(ps, attr, new)
                state.dirty = True
            y += 20.0
        y += 6.0

    ctx.text(x, y, "Preview", _SECTION)
    y += 18.0
    pw = min(w - 8.0, 160.0)
    ph = pw * 0.75
    if pw >= 16:
        from .viewport_render import render_player_camera_preview

        words = render_player_camera_preview(state, room, obj, int(pw),
                                             int(ph), scene=scene)
        ctx.outline(Rect(x - 1, y - 1, pw + 2, ph + 2), (60, 60, 65))
        ctx.commands.append(("image", (x, y), words))
    y += ph + 8.0
    return y


def _object_container(ctx: UiContext, x: float, y: float, w: float,
                      state: EditorState, room, idx: int,
                      ui: Dict, scene=None) -> float:
    if not (0 <= idx < len(room.objects)):
        return y
    obj = room.objects[idx]
    ctx.text(x, y, f"Object {idx}: {obj.name or 'asset ' + str(obj.asset_id)}",
             HEADER)
    y += ROW
    new_en = checkbox(ctx, "o.en", Rect(x, y, 14, 14), obj.enabled,
                      "Enabled")
    if new_en != obj.enabled:
        state.save_undo()
        obj.enabled = new_en
        state.dirty = True
    y += 20.0
    for label, attr, speed in (("Height", "height", 4.0),
                               ("Facing", "facing", 0.02)):
        ctx.text(x, y + 3, label, FAINT)
        st = ui.setdefault(f"o.{attr}", {})
        new = drag_value(ctx, f"o.{attr}", Rect(x + 50, y, 80, 16),
                         getattr(obj, attr), speed=speed, state=st)
        if new != getattr(obj, attr):
            _undo_once(state, ctx, f"o.{attr}", ui)
            setattr(obj, attr, new)
            state.dirty = True
        y += 18.0
    lib = state.asset_library
    asset = lib.get_by_id(obj.asset_id) if lib is not None else None
    if asset is not None and asset.has_spawn_point(True):
        y = _player_spawn_section(ctx, x, y + 4.0, w, state, room, obj,
                                  ui, scene=scene)
    return y + 4.0


def _room_container(ctx: UiContext, x: float, y: float, w: float,
                    state: EditorState, idx: int, ui: Dict) -> float:
    """draw_room_properties (layout.rs:3014): ambient + fog."""
    room = state.level.rooms[idx]
    ctx.text(x, y, f"Room {idx}", HEADER)
    y += ROW
    ctx.text(x, y + 2, f"Ambient {room.ambient:.2f}", DIM)
    new_amb = slider(ctx, "r.amb", Rect(x + 90, y, w - 100, 12),
                     room.ambient, 0.0, 1.0)
    if new_amb != room.ambient:
        _undo_once(state, ctx, "r.amb", ui)
        room.ambient = new_amb
        state.dirty = True
    y += 18.0
    fog = room.fog
    new_fe = checkbox(ctx, "r.fog", Rect(x, y, 14, 14), fog.enabled,
                      "Fog")
    if new_fe != fog.enabled:
        state.save_undo()
        fog.enabled = new_fe
        state.dirty = True
    y += 20.0
    if fog.enabled:
        rgb255 = tuple(int(round(c * 255.0)) for c in fog.color)
        new_rgb, _ = ps1_color_picker(ctx, "r.fogcol", x, y, w - 8,
                                      rgb255, (5, 5, 5), "Fog color", ui)
        if new_rgb is not None:
            _undo_once(state, ctx, "r.fogcol", ui)
            fog.color = tuple(c / 255.0 for c in new_rgb)
            state.dirty = True
        y += 44.0
        for label, attr in (("Start", "start"), ("Falloff", "falloff"),
                            ("Cull", "cull_offset")):
            ctx.text(x, y + 3, label, FAINT)
            st = ui.setdefault(f"r.{attr}", {})
            new = drag_value(ctx, f"r.{attr}", Rect(x + 60, y, 90, 16),
                             getattr(fog, attr), speed=50.0, lo=0.0,
                             state=st)
            if new != getattr(fog, attr):
                _undo_once(state, ctx, f"r.{attr}", ui)
                setattr(fog, attr, new)
                state.dirty = True
            y += 18.0
    return y + 4.0


def draw_properties(ctx: UiContext, rect: Rect, state: EditorState,
                    ui: Optional[Dict] = None, scene=None) -> None:
    """The panel body (layout.rs:5204), scrolled by the mouse wheel.
    `scene` (a models.scene.CompiledScene) enables the live level render
    inside the player-spawn camera preview."""
    if ui is None:
        ui = {}
    scroll = ui.get("scroll", 0.0)
    if rect.contains(ctx.mouse.x, ctx.mouse.y):
        scroll = max(scroll - ctx.mouse.wheel * 30.0, 0.0)
    ui["scroll"] = scroll
    ctx.set_clip(rect)
    x = rect.x + 4
    y = rect.y + 4 - scroll
    w = rect.w - 8
    sel = state.selection
    rooms = state.level.rooms

    if sel.kind == "none":
        ctx.text(x, y, "Nothing selected", DIM)
    elif sel.kind == "room" and 0 <= sel.room < len(rooms):
        _room_container(ctx, x, y, w, state, sel.room, ui)
    elif sel.kind == "portal" and 0 <= sel.room < len(rooms):
        ctx.text(x, y, f"Portal {sel.index} in Room {sel.room}", HEADER)
    elif sel.kind == "object" and 0 <= sel.room < len(rooms):
        _object_container(ctx, x, y, w, state, rooms[sel.room], sel.index,
                          ui, scene=scene)
    elif sel.kind in ("sector", "sector_face", "vertex", "edge") \
            and 0 <= sel.room < len(rooms):
        room = rooms[sel.room]
        ctx.text(x, y, f"Sector ({sel.x}, {sel.z})", DIM)
        y += 22.0
        face = sel.face
        if sel.kind == "sector" or face is None:
            # whole sector: stack floor then ceiling (layout.rs:5463)
            y = _horizontal_container(ctx, x, y, w, state, room, sel.x,
                                      sel.z, True, ui) + 6.0
            _horizontal_container(ctx, x, y, w, state, room, sel.x, sel.z,
                                  False, ui)
        elif face.kind in ("floor", "ceiling"):
            _horizontal_container(ctx, x, y, w, state, room, sel.x, sel.z,
                                  face.kind == "floor", ui)
        else:
            _wall_container(ctx, x, y, w, state, room, sel.x, sel.z, face,
                            ui)
    ctx.set_clip(None)
    _end_gestures(ctx, ui)

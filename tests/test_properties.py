"""Editor properties panel (layout.rs:5204-6100, 3679, 4764, 3014):
split/texture/heights/colors/flags editing for faces, object and room
properties, with undo snapshots per gesture."""

from bonnie32_tpu.editor.properties import draw_properties
from bonnie32_tpu.editor.state import (CLICK_HEIGHT, EditorState,
                                       SectorFace, Selection)
from bonnie32_tpu.models.level import (NORTH, Level, Room, TextureRef,
                                       AssetInstance)
from bonnie32_tpu.ui import Rect, UiContext

TEX = TextureRef("p", "T")
TEX2 = TextureRef("p", "U")
RECT = Rect(0, 0, 240, 400)


def _state():
    level = Level()
    room = Room.new(0, (0.0, 0.0, 0.0), 4, 4)
    room.set_floor(1, 1, 0.0, TEX)
    room.add_wall(1, 1, NORTH, 0.0, 1024.0, TEX)
    room.recalculate_bounds()
    level.add_room(room)
    s = EditorState(level)
    s.selected_texture = TEX2
    return s


def _click(state, ui, x, y):
    ctx = UiContext()
    ctx.begin_frame(x, y, True)
    draw_properties(ctx, RECT, state, ui)
    ctx.begin_frame(x, y, False)
    draw_properties(ctx, RECT, state, ui)
    return ctx


def test_floor_split_toggle_and_undo():
    s = _state()
    s.selection = Selection(kind="sector_face", room=0, x=1, z=1,
                            face=SectorFace(kind="floor"))
    floor = s.level.rooms[0].get_sector(1, 1).floor
    assert floor.split_direction == 0
    ui = {}
    # the split button sits at (x=4, y=4+22+18) per container layout
    _click(s, ui, 10, 4 + 22 + 18 + 8)
    floor = s.level.rooms[0].get_sector(1, 1).floor
    assert floor.split_direction == 1
    assert len(s.undo_stack) == 1
    s.undo()
    assert s.level.rooms[0].get_sector(1, 1).floor.split_direction == 0


def test_floor_texture_slot_applies_selected():
    s = _state()
    s.selection = Selection(kind="sector_face", room=0, x=1, z=1,
                            face=SectorFace(kind="floor"))
    ui = {}
    # Tri1 slot row: y = 4 + 22 + 18 + 20 + 8
    _click(s, ui, 30, 4 + 22 + 18 + 20 + 8)
    assert s.level.rooms[0].get_sector(1, 1).floor.texture == TEX2


def test_floor_height_buttons():
    s = _state()
    s.selection = Selection(kind="sector_face", room=0, x=1, z=1,
                            face=SectorFace(kind="floor"))
    ui = {}
    # heights row: after header(22)+split(20)+2 slots(36): y=4+22+18+20+36
    base_y = 4 + 22 + 18 + 20 + 36
    hx = 4 + 46
    _click(s, ui, hx + 80 + 9, base_y + 8)     # minus button
    floor = s.level.rooms[0].get_sector(1, 1).floor
    assert floor.heights == [-CLICK_HEIGHT] * 4
    _click(s, ui, hx + 102 + 9, base_y + 8)    # plus button
    assert s.level.rooms[0].get_sector(1, 1).floor.heights == [0.0] * 4


def test_wall_solid_checkbox_and_texture():
    s = _state()
    s.selection = Selection(
        kind="sector_face", room=0, x=1, z=1,
        face=SectorFace(kind="wall", direction=NORTH, wall_index=0))
    wall = s.level.rooms[0].get_sector(1, 1).walls(NORTH)[0]
    assert wall.solid is True
    ui = {}
    # texture slot row at y = 4+22+18+8
    _click(s, ui, 30, 4 + 22 + 18 + 8)
    assert s.level.rooms[0].get_sector(1, 1).walls(NORTH)[0].texture == TEX2
    # solid checkbox at y = 4+22+18+20+36+4 + 7
    cy = 4 + 22 + 18 + 20 + 36 + 4 + 7
    _click(s, ui, 8, cy)
    assert s.level.rooms[0].get_sector(1, 1).walls(NORTH)[0].solid is False


def test_room_ambient_and_fog():
    s = _state()
    s.selection = Selection(kind="room", room=0)
    room = s.level.rooms[0]
    assert room.fog.enabled is False
    ui = {}
    # fog checkbox at y = 4 + 18 + 18 + 7
    _click(s, ui, 8, 4 + 18 + 18 + 7)
    assert room.fog.enabled is True
    # ambient slider drag: row y = 4+18, x in the slider track
    ctx = UiContext()
    ctx.begin_frame(90 + (RECT.w - 100) * 0.9, 4 + 18 + 6, True)
    draw_properties(ctx, RECT, s, ui)
    assert room.ambient > 0.8


def test_object_enabled_toggle():
    s = _state()
    room = s.level.rooms[0]
    room.objects.append(AssetInstance(sector_x=1, sector_z=1, asset_id=7))
    s.selection = Selection(kind="object", room=0, index=0)
    ui = {}
    _click(s, ui, 8, 4 + 18 + 7)
    assert room.objects[0].enabled is False


def test_corner_color_multi_select_edit():
    s = _state()
    s.selection = Selection(kind="sector_face", room=0, x=1, z=1,
                            face=SectorFace(kind="floor"))
    floor = s.level.rooms[0].get_sector(1, 1).floor
    ui = {}
    # colors section y: header 22 + split 20 + slots 36 + heights 18+4 = y0
    y0 = 4 + 22 + 18 + 20 + 36 + 18 + 4
    # select NE corner swatch too (grid (1,0) -> corner 1)
    _click(s, ui, 4 + 21 + 9, y0 + 9)
    assert sorted(ui["corner_sel"]) == [0, 1]
    # drag the R slider to the right end -> r5=31 expands to 255
    picker_x = 4 + 2 * 18 + 3 + 10
    slider_x = picker_x + 32 + 8 + 16          # widgets.ps1_color_picker
    track_w = (RECT.w - 8 - (picker_x - 4)) - 32 - 8 - 16 - 20 - 4
    ctx = UiContext()
    ctx.begin_frame(slider_x + track_w - 1, y0 + 4, True)
    draw_properties(ctx, RECT, s, ui)
    floor = s.level.rooms[0].get_sector(1, 1).floor
    assert floor.colors[0][0][0] == 255 and floor.colors[1][0][0] == 255
    assert floor.colors[2][0][0] == 128   # unselected corners untouched


def test_flags_apply_to_multi_selection():
    s = _state()
    room = s.level.rooms[0]
    room.set_floor(2, 2, 0.0, TEX)
    room.recalculate_bounds()
    s.selection = Selection(kind="sector_face", room=0, x=1, z=1,
                            face=SectorFace(kind="floor"))
    s.multi_selection = [Selection(kind="sector_face", room=0, x=2, z=2,
                                   face=SectorFace(kind="floor"))]
    ui = {}
    # black-transparent checkbox: colors section bottom + 20 + 7
    y0 = 4 + 22 + 18 + 20 + 36 + 18 + 4            # colors section top
    colors_h = max(2 * 18.0 + 3.0, 56.0) + 6.0
    cy = y0 + colors_h + 20 + 7
    _click(s, ui, 8, cy)
    assert room.get_sector(1, 1).floor.black_transparent is False
    assert room.get_sector(2, 2).floor.black_transparent is False


def test_extrude_button_in_floor_container():
    s = _state()
    s.selection = Selection(kind="sector_face", room=0, x=1, z=1,
                            face=SectorFace(kind="floor"))
    ui = {}
    # Extrude button: right side of the heights row, y = 4+22+18+20+36+8
    ey = 4 + 22 + 18 + 20 + 36 + 8
    _click(s, ui, RECT.w - 8 - 40, ey)
    sector = s.level.rooms[0].get_sector(1, 1)
    assert sector.floor.heights == [CLICK_HEIGHT] * 4
    assert len(sector.walls_north) == 1
    assert "Extruded" in s.status_message


def test_player_spawn_section_and_preview():
    """layout.rs:5878-5996 — selecting a player-spawn object shows
    PlayerSettings fields and a rendered camera preview image."""
    import numpy as np
    from bonnie32_tpu.models import asset as A
    from bonnie32_tpu.models.level import AssetInstance

    s = _state()
    lib = A.AssetLibrary()
    lib.assets = {a.id: a for a in A.builtin_assets()}
    s.asset_library = lib
    by_name = {a.name: a for a in lib.assets.values()}
    spawn = by_name.get("Player Spawn") or by_name.get("player_spawn")
    assert spawn is not None
    s.level.rooms[0].objects.append(
        AssetInstance(sector_x=1, sector_z=1, asset_id=spawn.id))
    s.selection = Selection(kind="object", room=0, index=0)

    ctx = UiContext()
    ctx.begin_frame(-10, -10, False)
    ui = {}
    draw_properties(ctx, RECT, s, ui)
    texts = [c[2] for c in ctx.commands if c[0] == "text"]
    for expected in ("Collision", "Movement", "Camera", "Radius", "Walk",
                     "Distance", "Preview"):
        assert any(expected in t for t in texts), f"missing {expected}"
    imgs = [c for c in ctx.commands if c[0] == "image"]
    assert len(imgs) == 1
    words = np.asarray(imgs[0][2])
    assert words.ndim == 2 and words.shape[0] > 0
    # the preview contains the clear color and the green player cylinder
    green = (100 | (255 << 8) | (100 << 16) | (255 << 24))
    bg = (20 | (20 << 8) | (25 << 16) | (255 << 24))
    w_i64 = words.astype(np.int64) & 0xFFFFFFFF
    assert (w_i64 == (bg & 0xFFFFFFFF)).sum() > 0
    assert (w_i64 == (green & 0xFFFFFFFF)).sum() > 5
    # the field rows registered their drag states
    assert "ps.radius" in ui and "ps.camera_distance" in ui


def test_uv_params_roundtrip_and_ops():
    """layout.rs:4418-4579 — flips/rotation reference-truth cases and
    extract/apply round-trips."""
    import math
    from bonnie32_tpu.editor.properties import (apply_uv_params,
                                                default_uv,
                                                extract_uv_params,
                                                flip_uv_horizontal,
                                                flip_uv_vertical,
                                                rotate_uv_cw, UvParams)

    S = 0.5
    d = default_uv()
    assert d == [(0.0, 0.0), (S, 0.0), (S, S), (0.0, S)]
    # flips mirror within the UV_SCALE span (None = default quad)
    assert flip_uv_horizontal(None) == [(S, 0.0), (0.0, 0.0), (0.0, S),
                                        (S, S)]
    assert flip_uv_vertical(None) == [(0.0, S), (S, S), (S, 0.0),
                                      (0.0, 0.0)]
    # rotate: each corner takes the previous corner's UV
    assert rotate_uv_cw(None) == [(0.0, S), (0.0, 0.0), (S, 0.0), (S, S)]
    # double flip is identity
    assert flip_uv_horizontal(flip_uv_horizontal(d)) == d
    # four rotations are identity
    uv = d
    for _ in range(4):
        uv = rotate_uv_cw(uv)
    assert uv == d

    # default quad extracts to identity params
    p = extract_uv_params(None)
    assert abs(p.x_offset) < 1e-6 and abs(p.y_offset) < 1e-6
    assert abs(p.x_scale - 1.0) < 1e-6 and abs(p.y_scale - 1.0) < 1e-6
    assert abs(p.angle) < 1e-6
    # apply(extract(uv)) reproduces an offset/scaled/rotated quad
    src = UvParams(x_offset=0.25, y_offset=-0.5, x_scale=2.0,
                   y_scale=0.5, angle=30.0)
    quad = apply_uv_params(src)
    back = extract_uv_params(quad)
    for a, b in ((src.x_offset, back.x_offset),
                 (src.y_offset, back.y_offset),
                 (src.x_scale, back.x_scale),
                 (src.y_scale, back.y_scale), (src.angle, back.angle)):
        assert abs(a - b) < 1e-4


def test_uv_controls_stepper_edits_face():
    """Clicking the +32px stepper shifts the face UV by one block and
    snapshots undo."""
    s = _state()
    s.selection = Selection(kind="sector_face", room=0, x=1, z=1,
                            face=SectorFace(kind="floor"))
    ui = {}
    # render once to find the X-offset ">>" button location: scan text
    ctx = UiContext()
    ctx.begin_frame(-5, -5, False)
    draw_properties(ctx, RECT, s, ui)
    texts = [c[2] for c in ctx.commands if c[0] == "text"]
    assert any(t == "UV" for t in texts)
    assert any("0px" in t for t in texts)

    floor = s.level.rooms[0].get_sector(1, 1).floor
    assert floor.uv is None
    from bonnie32_tpu.editor.properties import (_uv_controls,
                                                extract_uv_params)
    # drive the control directly at a known origin
    ctx2 = UiContext()
    # X row: y=16; ">>" button is the 5th element at bx = 20+18+2+18+2+26+2+18+2 = 108
    bx = 20 + (18 + 2) * 2 + (26 + 2) + (18 + 2)
    ctx2.begin_frame(bx + 4, 16 + 8, True)
    _uv_controls(ctx2, "t.uv", 0, 0, 200, s, floor, "uv", ui)
    ctx2.begin_frame(bx + 4, 16 + 8, False)
    _uv_controls(ctx2, "t.uv", 0, 0, 200, s, floor, "uv", ui)
    assert floor.uv is not None
    p = extract_uv_params(floor.uv)
    assert abs(p.x_offset - 1.0) < 1e-5     # +1 block = +32 px
    assert len(s.undo_stack) >= 1

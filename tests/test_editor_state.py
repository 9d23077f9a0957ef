"""Editor state: selection, undo/redo stacks, geometry + face clipboards."""

from bonnie32_tpu.editor import (EditorState, EditorTool, GeometryClipboard,
                                 SectorFace, Selection)
from bonnie32_tpu.models.level import (HorizontalFace, Level, Room, Sector,
                                       TextureRef, VerticalFace)


def create_test_level():
    """5x5 room with floors everywhere (editing playground)."""
    level = Level()
    room = Room.new(0, (0.0, 0.0, 0.0), 5, 5)
    tex = TextureRef("retro-texture-pack", "FLOOR_1A")
    for x in range(5):
        for z in range(5):
            room.set_floor(x, z, 0.0, tex)
    room.recalculate_bounds()
    level.add_room(room)
    return level


def sel_sector(room, x, z):
    return Selection(kind="sector", room=room, x=x, z=z)


def test_selection_model():
    s = EditorState(create_test_level())
    assert s.tool == EditorTool.SELECT
    s.set_selection(sel_sector(0, 2, 3))
    assert s.selection.includes_sector(0, 2, 3)
    assert not s.selection.includes_sector(0, 2, 4)
    s.add_to_multi_selection(sel_sector(0, 1, 1))
    s.add_to_multi_selection(sel_sector(0, 1, 1))  # dedup
    assert len(s.multi_selection) == 1
    assert s.selected_sectors() == [(0, 2, 3), (0, 1, 1)]
    face = Selection(kind="sector_face", room=0, x=2, z=3,
                     face=SectorFace("wall", direction=0, wall_index=0))
    assert face.face.is_wall
    s.clear_selection()
    assert s.selection.kind == "none" and not s.multi_selection


def test_level_undo_redo():
    s = EditorState(create_test_level())
    room = s.level.rooms[0]
    orig = room.sectors[0][0].floor.heights[0]
    s.save_undo()
    room.sectors[0][0].floor.heights[0] = orig + 512.0
    assert s.undo()
    assert s.level.rooms[0].sectors[0][0].floor.heights[0] == orig
    assert s.redo()
    assert s.level.rooms[0].sectors[0][0].floor.heights[0] == orig + 512.0
    # new edit clears redo
    s.save_undo()
    assert not s.redo_stack
    assert not s.redo()


def test_selection_undo_dedup():
    s = EditorState(create_test_level())
    s.set_selection(sel_sector(0, 1, 1))
    s.save_selection_undo()
    n = len(s.undo_stack)
    s.save_selection_undo()           # unchanged -> skipped
    assert len(s.undo_stack) == n
    s.set_selection(sel_sector(0, 2, 2))
    s.save_selection_undo()
    assert len(s.undo_stack) == n + 1
    s.set_selection(sel_sector(0, 3, 3))
    s.undo()
    assert s.selection == sel_sector(0, 2, 2)


def test_undo_cap():
    s = EditorState(create_test_level())
    for _ in range(130):
        s.save_undo()
    assert len(s.undo_stack) == 100


def test_geometry_clipboard_transform():
    c = GeometryClipboard()
    assert c.bounds() == (0, 0, 0, 0)
    assert c.transformed_offset(2, 1) == (2, 1)
    c.rotation = 1
    assert c.transformed_offset(2, 1) == (-1, 2)   # 90 cw
    c.rotation = 2
    assert c.transformed_offset(2, 1) == (-2, -1)
    c.flip_h = True
    c.rotation = 0
    assert c.transformed_offset(2, 1) == (-2, 1)


def test_copy_paste_geometry():
    s = EditorState(create_test_level())
    room = s.level.rooms[0]
    # give sector (1,1) a wall to copy alongside its floor
    tex = TextureRef("retro-texture-pack", "WALL_1A")
    room.sectors[1][1].walls_north.append(
        VerticalFace(heights=[0.0, 0.0, 1024.0, 1024.0], texture=tex))
    s.set_selection(sel_sector(0, 1, 1))
    n = s.copy_selected_geometry()
    assert n >= 2   # floor (+ maybe ceiling) + wall

    # paste into an empty corner
    tgt_x, tgt_z = room.width - 1, room.depth - 1
    room.sectors[tgt_x][tgt_z] = None
    pasted = s.paste_geometry(0, tgt_x, tgt_z)
    assert pasted == n
    sec = room.sectors[tgt_x][tgt_z]
    assert sec is not None and sec.floor is not None
    assert len(sec.walls_north) == 1
    # paste is deep: mutating the paste doesn't affect the source
    sec.floor.heights[0] = -999.0
    assert room.sectors[1][1].floor.heights[0] != -999.0
    # and it's undoable
    assert s.undo()
    assert s.level.rooms[0].sectors[tgt_x][tgt_z] is None


def test_face_property_clipboard():
    s = EditorState(create_test_level())
    tex = TextureRef("retro-texture-pack", "WALL_2B")
    src = HorizontalFace(heights=[1.0, 2.0, 3.0, 4.0], texture=tex,
                         blend_mode=2, walkable=False,
                         black_transparent=False)
    dst = HorizontalFace(heights=[9.0, 9.0, 9.0, 9.0],
                         texture=TextureRef("retro-texture-pack", "FLOOR_1A"))
    s.copy_face_properties(src)
    assert s.paste_face_properties(dst)
    assert dst.texture.name == "WALL_2B"
    assert dst.blend_mode == 2 and not dst.walkable
    assert dst.heights == [9.0, 9.0, 9.0, 9.0]  # heights NOT copied
    # kind mismatch refuses
    wall = VerticalFace(heights=[0, 0, 1, 1], texture=tex)
    assert not s.paste_face_properties(wall)
    # vertical round trip
    s.copy_face_properties(wall)
    wall2 = VerticalFace(heights=[5, 5, 6, 6],
                         texture=TextureRef("retro-texture-pack", "FLOOR_1A"))
    assert s.paste_face_properties(wall2)
    assert wall2.texture.name == "WALL_2B"
    assert wall2.heights == [5, 5, 6, 6]

# ---------------------------------------------------------------------------
# Selection center / camera orbit (state.rs:1110-1260)
# ---------------------------------------------------------------------------

import math

import numpy as np

from bonnie32_tpu.models.level import Portal


def _state_with_floor():
    from bonnie32_tpu.models.level import Level, Room, TextureRef
    level = Level()
    room = Room.new(0, (0.0, 0.0, 0.0), 4, 4)
    room.set_floor(1, 2, 0.0, TextureRef("p", "T"))
    room.recalculate_bounds()
    level.add_room(room)
    return EditorState(level)


def test_selection_center_sector_and_room():
    s = _state_with_floor()
    s.selection = Selection(kind="sector", room=0, x=1, z=2)
    c = s.get_selection_center()
    np.testing.assert_allclose(c, [1.5 * 1024.0, 1024.0, 2.5 * 1024.0])
    s.selection = Selection(kind="room", room=0)
    c = s.get_selection_center()
    np.testing.assert_allclose(c, [2048.0, 512.0, 2048.0])


def test_selection_center_portal_and_object():
    s = _state_with_floor()
    room = s.level.rooms[0]
    room.portals.append(Portal(
        target_room=1,
        vertices=np.array([[0, 0, 0], [4, 0, 0], [4, 4, 0], [0, 4, 0]],
                          np.float32),
        normal=np.array([0, 0, 1], np.float32)))
    s.selection = Selection(kind="portal", room=0, index=0)
    np.testing.assert_allclose(s.get_selection_center(), [2.0, 2.0, 0.0])
    s.selection = Selection(kind="portal", room=0, index=5)
    assert s.get_selection_center() is None


def test_center_camera_orbit_and_free():
    s = _state_with_floor()
    s.selection = Selection(kind="sector", room=0, x=1, z=2)
    center = s.get_selection_center()
    # free mode: same distance, camera looks along -bz at the center
    d0 = float(np.linalg.norm(s.camera_pos - center))
    s.center_camera_on_selection()
    d1 = float(np.linalg.norm(s.camera_pos - center))
    np.testing.assert_allclose(d1, d0, rtol=1e-5)
    # orbit mode: position derives from azimuth/elevation/distance
    s.camera_mode = "orbit"
    s.center_camera_on_selection()
    np.testing.assert_allclose(s.orbit_target, center)
    pitch, yaw = s.orbit_elevation, s.orbit_azimuth
    fwd = np.array([math.cos(pitch) * math.sin(yaw), -math.sin(pitch),
                    math.cos(pitch) * math.cos(yaw)], np.float32)
    np.testing.assert_allclose(s.camera_pos,
                               center - fwd * s.orbit_distance, rtol=1e-5)
    assert s.camera_rot_x == pitch and s.camera_rot_y == yaw


def test_toggle_multi_selection_keeps_primary():
    s = _state_with_floor()
    a = Selection(kind="sector", room=0, x=0, z=0)
    b = Selection(kind="sector", room=0, x=1, z=1)
    s.selection = a
    s.toggle_multi_selection(b)
    assert a in s.multi_selection and b in s.multi_selection
    s.toggle_multi_selection(b)
    assert b not in s.multi_selection


def test_portal_center_is_world_space():
    s = _state_with_floor()
    room = s.level.rooms[0]
    room.position = np.array([4096.0, 0.0, 2048.0], np.float32)
    room.portals.append(Portal(
        target_room=1,
        vertices=np.array([[0, 0, 0], [4, 0, 0], [4, 4, 0], [0, 4, 0]],
                          np.float32),
        normal=np.array([0, 0, 1], np.float32)))
    s.selection = Selection(kind="portal", room=0, index=0)
    np.testing.assert_allclose(s.get_selection_center(),
                               [4098.0, 2.0, 2048.0])


def test_paste_transforms_face_contents():
    """layout.rs:1574-1878 — rotation rotates corner heights/colors, odd
    rotation flips the split and swaps tri1/tri2, walls retarget lists."""
    from bonnie32_tpu.editor.state import (rotate_quad,
                                           transform_clipboard_position,
                                           transform_wall_direction)
    from bonnie32_tpu.models.level import (EAST, NESW, NORTH, NWSE, SOUTH,
                                           WEST)

    # pure helpers against reference-truth cases
    assert rotate_quad([1, 2, 3, 4], 1) == [4, 1, 2, 3]
    assert rotate_quad([1, 2, 3, 4], 2) == [3, 4, 1, 2]
    assert transform_clipboard_position(2, 1, 3, 2, 1, False, False) \
        == (1, 2)          # 90 CW: (depth - z, x)
    assert transform_clipboard_position(2, 1, 3, 2, 0, True, False) \
        == (1, 1)          # flip_h: width - x
    assert transform_wall_direction(NORTH, 1, False, False) == EAST
    assert transform_wall_direction(NWSE, 1, False, False) == NESW
    assert transform_wall_direction(NORTH, 0, False, True) == SOUTH
    assert transform_wall_direction(NWSE, 2, False, False) == NWSE

    s = EditorState(create_test_level())
    room = s.level.rooms[0]
    tex = TextureRef("retro-texture-pack", "WALL_1A")
    src = room.sectors[1][1]
    src.floor.heights = [10.0, 20.0, 30.0, 40.0]
    src.walls_north.append(
        VerticalFace(heights=[0.0, 0.0, 512.0, 512.0], texture=tex))
    s.set_selection(sel_sector(0, 1, 1))
    assert s.copy_selected_geometry() >= 2

    s.geometry_clipboard.rotation = 1
    pasted = s.paste_geometry(0, 3, 3)
    assert pasted >= 2
    sec = room.sectors[3][3]
    # 90 CW height rotation with odd-rotation tri swap: rotated [NW,NE,
    # SE,SW] = [40,10,20,30]; heights_2 was None so tri swap keeps them
    assert sec.floor.heights == [40.0, 10.0, 20.0, 30.0]
    assert sec.floor.split_direction == 1          # NwSe -> NeSw
    assert sec.floor.heights_2 == [40.0, 10.0, 20.0, 30.0]
    # the north wall lands in the EAST list after a 90 CW rotation
    assert len(sec.walls_east) == 1 and len(sec.walls_north) == 0


def test_paste_expands_room():
    """layout.rs:1597-1636 — pasting past the grid grows the room (and
    shifts its position for negative targets)."""
    s = EditorState(create_test_level())
    room = s.level.rooms[0]
    s.set_selection(sel_sector(0, 1, 1))
    s.copy_selected_geometry()
    w0, d0 = room.width, room.depth
    px = float(room.position[0])
    assert s.paste_geometry(0, -1, d0 + 1) >= 1
    assert room.width == w0 + 1 and room.depth == d0 + 2
    assert float(room.position[0]) < px      # shifted for negative growth
    assert room.sectors[0][d0 + 1] is not None

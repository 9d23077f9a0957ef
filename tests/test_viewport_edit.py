"""3D-viewport interactive editing: scripted mouse gestures must produce
the reference's Level mutations (viewport_3d.rs:294-5654 semantics):
drag-rectangle floor/ceiling placement with Shift height adjustment,
wall placement along an edge, select-tool height drags with undo
snapshots, and object placement/dragging."""

import numpy as np

from bonnie32_tpu.editor.state import (CEILING_HEIGHT, CLICK_HEIGHT,
                                       EditorState, EditorTool, SectorFace,
                                       Selection)
from bonnie32_tpu.editor.viewport_edit import ViewportEditor, pick_plane
from bonnie32_tpu.models.level import (NORTH, SECTOR_SIZE, Level, Room,
                                       TextureRef)
from bonnie32_tpu.models import build

TEX = TextureRef("p", "T")


def _editor(width=6, depth=6, with_floors=()):
    level = Level()
    room = Room.new(0, (0.0, 0.0, 0.0), width, depth)
    for x, z in with_floors:
        room.set_floor(x, z, 0.0, TEX)
    room.recalculate_bounds()
    level.add_room(room)
    state = EditorState(level)
    return ViewportEditor(state=state)


def _cam_above(cx=3 * 1024.0, cz=3 * 1024.0, h=4000.0):
    """Camera straight above the room center, looking down."""
    pos = np.asarray([cx, h, cz], np.float32)
    basis = build.camera_basis(math_pitch_down(), 0.0)
    return pos, basis


def math_pitch_down():
    # pitch so that bz points toward -y (down): bz.y = -sin(pitch) => ~+1.2
    return 1.2


def _screen_of_world(wx, wz, cam_pos, basis, fb_w=320, fb_h=240, wy=0.0):
    """Invert via projection to aim the mouse at a world point."""
    import numpy as np
    rel = np.asarray([wx, wy, wz], np.float32) - cam_pos
    cam = np.asarray(basis) @ rel
    vs = (min(fb_w, fb_h) / 2.0) * 0.75
    sx = (cam[0] * 4.0) / (cam[2] + 5.0) * vs + fb_w / 2.0
    sy = (cam[1] * 4.0) / (cam[2] + 5.0) * vs + fb_h / 2.0
    return float(sx), float(sy)


def test_pick_plane_roundtrip():
    cam_pos, basis = _cam_above()
    target = (1.5 * 1024.0, 0.0, 2.5 * 1024.0)
    mx, my = _screen_of_world(target[0], target[2], cam_pos, basis)
    hit = pick_plane((mx, my), cam_pos, basis, 320, 240, 0.0)
    assert hit is not None
    np.testing.assert_allclose([hit[0], hit[2]], [target[0], target[2]],
                               atol=4.0)


def test_floor_drag_rectangle_placement():
    ed = _editor()
    ed.state.tool = EditorTool.DRAW_FLOOR
    cam_pos, basis = _cam_above()

    def aim(cellx, cellz):
        wx = (cellx + 0.5) * 1024.0
        wz = (cellz + 0.5) * 1024.0
        return _screen_of_world(wx, wz, cam_pos, basis)

    m0 = aim(1, 1)
    ed.update_placement_preview(m0, cam_pos, basis)
    assert ed.preview_sector is not None and not ed.preview_sector[3]
    ed.press_placement()
    m1 = aim(3, 2)
    ed.move_placement(m1, cam_pos, basis)
    placed = ed.release_placement(TEX)
    assert placed == 3 * 2
    room = ed.state.level.rooms[0]
    for x in range(1, 4):
        for z in range(1, 3):
            assert room.get_sector(x, z).floor is not None
    assert room.get_sector(0, 0) is None
    # one gesture = one undo snapshot; undo removes everything
    assert len(ed.state.undo_stack) == 1
    ed.state.undo()
    room = ed.state.level.rooms[0]
    assert room.get_sector(2, 2) is None or \
        room.get_sector(2, 2).floor is None


def test_placement_skips_occupied_and_shift_height():
    ed = _editor(with_floors=[(2, 2)])
    ed.state.tool = EditorTool.DRAW_FLOOR
    cam_pos, basis = _cam_above()

    def aim(cellx, cellz):
        return _screen_of_world((cellx + 0.5) * 1024.0,
                                (cellz + 0.5) * 1024.0, cam_pos, basis)

    # shift-drag raises the target height in CLICK_HEIGHT snaps
    m = aim(2, 3)
    ed.update_placement_preview(m, cam_pos, basis, shift=False)
    ed.update_placement_preview(m, cam_pos, basis, shift=True)
    # drag 52px up: 52*5=260 -> snaps to 256 (1 click)
    m_up = (m[0], m[1] - 52)
    ed.update_placement_preview(m_up, cam_pos, basis, shift=True)
    assert ed.placement_target_y == CLICK_HEIGHT
    assert "Height" in ed.state.status_message
    ed.update_placement_preview(m_up, cam_pos, basis, shift=False)

    # drag across the occupied cell: only the empty ones are filled
    ed.update_placement_preview(aim(2, 2), cam_pos, basis)
    ed.press_placement()
    ed.move_placement(aim(2, 3), cam_pos, basis)
    placed = ed.release_placement(TEX)
    assert placed == 1
    room = ed.state.level.rooms[0]
    assert room.get_sector(2, 3).floor.heights[0] == CLICK_HEIGHT


def test_ceiling_default_height():
    ed = _editor()
    ed.state.tool = EditorTool.DRAW_CEILING
    cam_pos, basis = _cam_above()
    m = _screen_of_world(0.5 * 1024, 0.5 * 1024, cam_pos, basis)
    ed.update_placement_preview(m, cam_pos, basis)
    ed.press_placement()
    ed.release_placement(TEX)
    room = ed.state.level.rooms[0]
    assert room.get_sector(0, 0).ceiling.heights[0] == CEILING_HEIGHT


def test_wall_drag_along_edge():
    ed = _editor(with_floors=[(1, 1), (2, 1), (3, 1)])
    ed.state.tool = EditorTool.DRAW_WALL
    ed.wall_direction = NORTH
    cam_pos, basis = _cam_above()

    def aim(cellx, cellz):
        return _screen_of_world((cellx + 0.5) * 1024.0,
                                (cellz + 0.5) * 1024.0, cam_pos, basis)

    ed.press_wall(aim(1, 1), cam_pos, basis)
    ed.move_wall(aim(3, 4), cam_pos, basis)   # z ignored for N walls
    placed = ed.release_wall(TEX)
    assert placed == 3
    room = ed.state.level.rooms[0]
    for x in (1, 2, 3):
        walls = room.get_sector(x, 1).walls(NORTH)
        assert len(walls) == 1
        assert walls[0].heights[2] == CEILING_HEIGHT  # floor..ceiling gap
    assert len(ed.state.undo_stack) == 1


def test_select_face_height_drag():
    ed = _editor(with_floors=[(2, 2)])
    ed.state.tool = EditorTool.SELECT
    ed.state.set_selection(Selection(kind="sector_face", room=0, x=2, z=2,
                                     face=SectorFace(kind="floor")))
    ed.press_select_drag((100.0, 200.0))
    ed.move_select_drag((100.0, 200.0 - 103))   # 103*5=515 -> 2 clicks
    ed.release_select_drag()
    face = ed.state.level.rooms[0].get_sector(2, 2).floor
    assert all(h == 2 * CLICK_HEIGHT for h in face.heights)
    assert len(ed.state.undo_stack) == 1        # snapshot on first move

    # vertex drag moves a single corner
    ed.state.set_selection(Selection(kind="vertex", room=0, x=2, z=2,
                                     face=SectorFace(kind="floor"),
                                     corner_idx=1))
    ed.press_select_drag((50.0, 100.0))
    ed.move_select_drag((50.0, 100.0 + 52))     # down: -256
    ed.release_select_drag()
    face = ed.state.level.rooms[0].get_sector(2, 2).floor
    assert face.heights[1] == 2 * CLICK_HEIGHT - CLICK_HEIGHT
    assert face.heights[0] == 2 * CLICK_HEIGHT


def test_object_place_and_drag():
    ed = _editor(with_floors=[(x, z) for x in range(6) for z in range(6)])
    ed.state.tool = EditorTool.PLACE_OBJECT
    ed.selected_asset = 42
    cam_pos, basis = _cam_above()

    def aim(cellx, cellz):
        return _screen_of_world((cellx + 0.5) * 1024.0,
                                (cellz + 0.5) * 1024.0, cam_pos, basis)

    idx = ed.place_object(aim(1, 2), cam_pos, basis)
    assert idx == 0
    room = ed.state.level.rooms[0]
    obj = room.objects[0]
    assert (obj.sector_x, obj.sector_z, obj.asset_id) == (1, 2, 42)
    assert ed.state.selection.kind == "object"

    # XZ drag to another cell
    ed.press_object(0, 0, aim(1, 2), cam_pos, basis)
    ed.move_object(aim(4, 4), cam_pos, basis)
    ed.release_object()
    assert (obj.sector_x, obj.sector_z) == (4, 4)

    # shift-drag adjusts height
    ed.press_object(0, 0, (100.0, 150.0), cam_pos, basis, shift=True)
    ed.move_object((100.0, 150.0 - 20), cam_pos, basis)
    ed.release_object()
    assert obj.height == 100.0  # 20px * 5.0


# ---------------------------------------------------------------------------
# Box select + shared vertex drags (viewport_3d.rs:1159-1230, 2994-3022)
# ---------------------------------------------------------------------------

from bonnie32_tpu.editor.viewport_edit import BoxSelector, VertexDrag


def test_box_select_collects_faces():
    ed = _editor(with_floors=[(2, 2), (3, 2), (2, 3)])
    pos, basis = _cam_above()
    box = BoxSelector(ed)
    box.press((10.0, 10.0))
    box.move((310.0, 380.0))
    assert box.rect() is not None
    n = box.release(pos, basis)
    assert n >= 3, f"expected the three floors collected, got {n}"
    assert len(ed.state.multi_selection) >= 3
    assert ed.state.selection.kind == "sector_face"
    kinds = {s.face.kind for s in ed.state.multi_selection}
    assert "floor" in kinds


def test_box_select_click_does_not_collect():
    ed = _editor(with_floors=[(2, 2)])
    pos, basis = _cam_above()
    box = BoxSelector(ed)
    box.press((100.0, 100.0))
    box.move((101.0, 101.0))     # < 3 px: just a click
    assert box.release(pos, basis) == 0
    assert not ed.state.multi_selection


def test_box_select_plain_press_clears_selection():
    ed = _editor(with_floors=[(2, 2)])
    ed.state.selection = Selection(kind="sector_face", room=0, x=2, z=2,
                                   face=SectorFace("floor"))
    box = BoxSelector(ed)
    box.press((5.0, 5.0), shift=False)
    assert ed.state.selection.kind == "none"
    ed2 = _editor(with_floors=[(2, 2)])
    sel = Selection(kind="sector_face", room=0, x=2, z=2,
                    face=SectorFace("floor"))
    ed2.state.selection = sel
    box2 = BoxSelector(ed2)
    box2.press((5.0, 5.0), shift=True)   # shift keeps the selection
    assert ed2.state.selection == sel


def test_vertex_drag_moves_shared_corners():
    # two adjacent floors: NE corner of (2,2) coincides with NW of (3,2)
    ed = _editor(with_floors=[(2, 2), (3, 2)])
    room = ed.state.level.rooms[0]
    ed.state.selection = Selection(kind="vertex", room=0, x=2, z=2,
                                   face=SectorFace("floor"), corner_idx=1)
    drag = VertexDrag(ed)
    assert drag.press((100.0, 100.0))
    # the coincident corner of the neighbour must be in the drag set
    faces = {id(e[0]) for e in drag.entries}
    f22 = room.get_sector(2, 2).floor
    f32 = room.get_sector(3, 2).floor
    assert id(f22) in faces and id(f32) in faces
    # drag up by one CLICK_HEIGHT (mouse up = -y px; 5 px/unit sensitivity)
    drag.move((100.0, 100.0 - CLICK_HEIGHT / 5.0))
    drag.release()
    assert f22.heights[1] == CLICK_HEIGHT
    assert f32.heights[0] == CLICK_HEIGHT
    assert f22.heights[0] == 0.0, "non-coincident corners untouched"
    assert ed.state.undo_stack, "drag snapshots undo once"


def test_vertex_drag_multi_selection():
    ed = _editor(with_floors=[(1, 1), (4, 4)])
    room = ed.state.level.rooms[0]
    ed.state.selection = Selection(kind="vertex", room=0, x=1, z=1,
                                   face=SectorFace("floor"), corner_idx=0)
    ed.state.add_to_multi_selection(
        Selection(kind="vertex", room=0, x=4, z=4,
                  face=SectorFace("floor"), corner_idx=2))
    drag = VertexDrag(ed)
    assert drag.press((50.0, 50.0))
    drag.move((50.0, 50.0 - 2 * CLICK_HEIGHT / 5.0))
    drag.release()
    assert room.get_sector(1, 1).floor.heights[0] == 2 * CLICK_HEIGHT
    assert room.get_sector(4, 4).floor.heights[2] == 2 * CLICK_HEIGHT


def test_vertex_drag_snaps_to_click_height():
    ed = _editor(with_floors=[(2, 2)])
    room = ed.state.level.rooms[0]
    ed.state.selection = Selection(kind="vertex", room=0, x=2, z=2,
                                   face=SectorFace("floor"), corner_idx=3)
    drag = VertexDrag(ed)
    drag.press((0.0, 100.0))
    drag.move((0.0, 95.0))   # 25 world units < CLICK_HEIGHT/2 -> no move
    assert room.get_sector(2, 2).floor.heights[3] == 0.0
    assert not drag.started


# ---------------------------------------------------------------------------
# Wall gap detection (geometry.rs:1630-1975) + gap-aware placement
# ---------------------------------------------------------------------------

from bonnie32_tpu.models.level import (EAST, NESW, NWSE, Sector,
                                       HorizontalFace, VerticalFace)


def _sector(floor_h=None, ceil_h=None, walls_north=()):
    s = Sector()
    if floor_h is not None:
        s.floor = HorizontalFace.flat(floor_h, TEX)
    if ceil_h is not None:
        s.ceiling = HorizontalFace.flat(ceil_h, TEX)
    for h in walls_north:
        s.walls_north.append(VerticalFace(heights=list(h), texture=TEX))
    return s


def test_next_wall_empty_sector_full_fill():
    s = Sector()
    assert s.next_wall_position(NORTH, 0.0, 3072.0) == [0.0, 0.0,
                                                        3072.0, 3072.0]


def test_next_wall_floor_ceiling_span():
    s = _sector(floor_h=512.0, ceil_h=2048.0)
    # floor clamps DOWN to the room bottom (geometry.rs:1643): gaps under a
    # raised floor are detectable
    assert s.next_wall_position(NORTH, 0.0, 3072.0) == [0.0, 0.0,
                                                        3072.0, 3072.0]
    # with matching fallbacks the heights follow the faces
    assert s.next_wall_position(NORTH, 512.0, 2048.0) == [512.0, 512.0,
                                                          2048.0, 2048.0]


def test_next_wall_gap_selection_by_mouse_y():
    mid = [1024.0, 1024.0, 2048.0, 2048.0]
    s = _sector(floor_h=0.0, ceil_h=3072.0, walls_north=[mid])
    low = s.next_wall_position(NORTH, 0.0, 3072.0, mouse_y=1.0)
    high = s.next_wall_position(NORTH, 0.0, 3072.0, mouse_y=3071.0)
    assert low == [0.0, 0.0, 1024.0, 1024.0]
    assert high == [2048.0, 2048.0, 3072.0, 3072.0]
    # no mouse -> largest gap (both are 1024; max picks the first found)
    assert s.next_wall_position(NORTH, 0.0, 3072.0) in (low, high)


def test_next_wall_between_two_walls():
    s = _sector(floor_h=0.0, ceil_h=3072.0,
                walls_north=[[0.0, 0.0, 1024.0, 1024.0],
                             [2048.0, 2048.0, 3072.0, 3072.0]])
    got = s.next_wall_position(NORTH, 0.0, 3072.0, mouse_y=1500.0)
    assert got == [1024.0, 1024.0, 2048.0, 2048.0]


def test_next_wall_three_walls_is_full():
    s = _sector(floor_h=0.0, ceil_h=3072.0,
                walls_north=[[0.0, 0.0, 1000.0, 1000.0]] * 3)
    assert s.next_wall_position(NORTH, 0.0, 3072.0) is None


def test_next_wall_triangular_collapse():
    # wall bottom touches the floor on the left only -> left vertices
    # collapse to the floor (geometry.rs:1714-1726)
    s = _sector(floor_h=0.0, ceil_h=3072.0,
                walls_north=[[0.0, 1024.0, 3072.0, 3072.0]])
    got = s.next_wall_position(NORTH, 0.0, 3072.0, mouse_y=1.0)
    assert got == [0.0, 0.0, 1024.0, 0.0]


def test_next_wall_sloped_floor_triangular_gaps():
    # floor corners clamp DOWN to the room bottom (geometry.rs:1643), so a
    # slope only survives where it dips BELOW the fallback
    s = Sector()
    s.floor = HorizontalFace.flat(0.0, TEX)
    s.floor.heights = [0.0, -1024.0, 0.0, 0.0]   # NE corner dips below
    s.ceiling = HorizontalFace.flat(3072.0, TEX)
    low = s.next_wall_position(NORTH, 0.0, 3072.0, mouse_y=-1000.0)
    high = s.next_wall_position(NORTH, 0.0, 3072.0, mouse_y=3000.0)
    # NORTH edge (el,er)=(h0,h1)=(0,-1024); wall-left=sector-right swap:
    # floor_left=min(er,0)=-1024, floor_right=min(el,0)=0, floor_max=0
    assert low == [-1024.0, 0.0, 0.0, 0.0]
    assert high == [0.0, 0.0, 3072.0, 3072.0]


def test_next_diagonal_wall_corners():
    s = Sector()
    s.floor = HorizontalFace.flat(0.0, TEX)
    s.floor.heights = [100.0, 200.0, 300.0, 400.0]
    s.ceiling = HorizontalFace.flat(3072.0, TEX)
    got = s.next_diagonal_wall_position(True, 0.0, 3072.0)   # NwSe: NW,SE
    assert got == [100.0, 300.0, 3072.0, 3072.0]
    got = s.next_diagonal_wall_position(False, 0.0, 3072.0)  # NeSw: NE,SW
    assert got == [200.0, 400.0, 3072.0, 3072.0]


def test_release_wall_respects_existing_stack():
    ed = _editor(with_floors=[(1, 1)])
    room = ed.state.level.rooms[0]
    room.get_sector(1, 1).ceiling = HorizontalFace.flat(3072.0, TEX)
    room.add_wall(1, 1, NORTH, 0.0, 1024.0, TEX)
    room.recalculate_bounds()
    ed.state.tool = EditorTool.DRAW_WALL
    ed.wall_direction = NORTH
    ed.wall_prefer_high = True
    ed.wall_drag_start = (1, 1, NORTH)
    ed.wall_drag_current = (1, 1, NORTH)
    assert ed.wall_preview() == [1024.0, 1024.0, 3072.0, 3072.0]
    placed = ed.release_wall(TEX)
    assert placed == 1
    walls = room.get_sector(1, 1).walls(NORTH)
    assert [w.heights for w in walls] == [[0.0, 0.0, 1024.0, 1024.0],
                                          [1024.0, 1024.0, 3072.0, 3072.0]]


def test_release_wall_expands_room():
    ed = _editor(width=2, depth=2, with_floors=[(0, 0)])
    room = ed.state.level.rooms[0]
    ed.state.tool = EditorTool.DRAW_WALL
    ed.wall_direction = EAST
    ed.wall_drag_start = (3, 0, EAST)     # outside the 2x2 grid
    ed.wall_drag_current = (3, 1, EAST)
    placed = ed.release_wall(TEX)
    assert placed == 2
    assert room.width >= 4
    assert len(room.get_sector(3, 0).walls(EAST)) == 1
    assert len(room.get_sector(3, 1).walls(EAST)) == 1


def test_release_wall_diagonal_and_normal_mode():
    ed = _editor(with_floors=[(2, 2)])
    room = ed.state.level.rooms[0]
    ed.state.tool = EditorTool.DRAW_WALL
    ed.wall_direction = NWSE
    ed.wall_drag_start = (2, 2, NWSE)
    ed.wall_drag_current = (2, 2, NWSE)
    # camera on the SW side of the NW-SE diagonal -> normal (-1,1) faces it
    cam = np.asarray([0.0, 1000.0, 6 * 1024.0], np.float32)
    placed = ed.release_wall(TEX, camera_pos=cam)
    assert placed == 1
    w = room.get_sector(2, 2).walls_nwse[0]
    assert w.normal_mode == 0     # Front: camera on the normal's side
    bottom, top = room.effective_height_bounds()
    assert w.heights == [bottom, bottom, top, top]


def test_release_wall_negative_boundary_drag():
    # a multi-cell drag crossing the room's -x edge must expand ONCE and
    # land every wall on the dragged line (review finding: per-cell
    # expansion shifted the origin mid-loop)
    ed = _editor(width=2, depth=2, with_floors=[(0, 0)])
    room = ed.state.level.rooms[0]
    orig_x = float(room.position[0])
    ed.state.tool = EditorTool.DRAW_WALL
    ed.wall_direction = NORTH
    ed.wall_drag_start = (-2, 0, NORTH)
    ed.wall_drag_current = (1, 0, NORTH)
    placed = ed.release_wall(TEX)
    assert placed == 4
    assert float(room.position[0]) == orig_x - 2 * SECTOR_SIZE
    for gx in range(4):
        assert len(room.get_sector(gx, 0).walls(NORTH)) == 1, gx


def test_extrude_floor_creates_and_extends_walls():
    # geometry.rs:1986 — perimeter walls connect old->new floor heights
    from bonnie32_tpu.models.level import Sector, VerticalFace

    s = Sector()
    s.floor = HorizontalFace(heights=[0.0, 0.0, 256.0, 256.0], texture=TEX)
    assert s.extrude_floor(512.0, TEX)
    assert s.floor.heights == [512.0, 512.0, 768.0, 768.0]
    # north edge: new Back wall from old (NW,NE) to new heights
    n = s.walls_north[0]
    assert n.heights == [0.0, 0.0, 512.0, 512.0]
    assert n.normal_mode == 2
    # east edge spans NE->SE
    e = s.walls_east[0]
    assert e.heights == [0.0, 256.0, 768.0, 512.0]
    # an existing wall gets its bottom raised instead of a new wall
    s2 = Sector()
    s2.floor = HorizontalFace.flat(0.0, TEX)
    s2.walls_north.append(VerticalFace(heights=[-512.0, -512.0, 1024.0,
                                                1024.0], texture=TEX))
    s2.extrude_floor(256.0, TEX)
    assert len(s2.walls_north) == 1
    assert s2.walls_north[0].heights[:2] == [256.0, 256.0]
    # no floor -> no-op
    assert Sector().extrude_floor(100.0, TEX) is False

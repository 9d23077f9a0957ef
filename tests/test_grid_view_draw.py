"""Interactive 2D grid view (grid_view.rs:43 draw_grid_view): rendered
frames on the Cave sample level in all three view modes, plus the gesture
state machines (select/drag/draw/delete) mirroring test_viewport_edit.py."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from bonnie32_tpu.editor import grid_view as gv
from bonnie32_tpu.editor.state import (CEILING_HEIGHT, EditorState,
                                       EditorTool, GridViewMode, Selection)
from bonnie32_tpu.models import asset as A
from bonnie32_tpu.models import level as L
from bonnie32_tpu.models.level import (EAST, NORTH, AssetInstance, Level,
                                       Room, TextureRef)
from bonnie32_tpu.types import FrameBuffers
from bonnie32_tpu.ui import Rect, UiContext

SAMPLES = "/root/reference/assets/samples"
VIEW = Rect(0, 0, 320, 240)


def _fb(w=320, h=240):
    return FrameBuffers(color=jnp.zeros((h, w), jnp.int32),
                        depth=jnp.full((h, w), 3.4e38, jnp.float32))


def _cave_state():
    state = EditorState(L.load_level(f"{SAMPLES}/levels/Cave.ron"))
    state.asset_library = A.AssetLibrary([f"{SAMPLES}/assets"])
    state.selected_texture = TextureRef("pack", "T")
    return state


def _synth_state():
    level = Level()
    room = Room.new(0, (0.0, 0.0, 0.0), 4, 4)
    for x in range(3):
        for z in range(3):
            room.set_floor(x, z, 0.0, TextureRef("p", "T"))
    room.set_ceiling(1, 1, CEILING_HEIGHT, TextureRef("p", "T"))
    room.add_wall(0, 0, NORTH, 0.0, CEILING_HEIGHT, TextureRef("p", "T"))
    room.recalculate_bounds()
    level.add_room(room)
    state = EditorState(level)
    state.asset_library = A.AssetLibrary()
    state.selected_texture = TextureRef("p", "T")
    # view transform: sector (gx, gz) center at ~(40*gx+40, 120-40*gz...)
    state.grid_zoom = 0.04
    return state


def _frame(state, x=0.0, y=0.0, down=False, wheel=0.0, right=False,
           keys_down=(), keys_pressed=(), rect=VIEW, ctx=None):
    """One UI frame.  Press/release edges come from the previous frame's
    button state, so gesture tests must thread one ctx through."""
    if ctx is None:
        ctx = UiContext()
    ctx.begin_frame(x, y, down, wheel=wheel, right_down=right,
                    keys_down=keys_down, keys_pressed=keys_pressed)
    gv.draw_grid_view(ctx, rect, state)
    return ctx


def _press_drag_release(state, path, keys_down=(), rect=VIEW, ctx=None):
    """Press at path[0], drag through path[1:], release at path[-1]."""
    ctx = _frame(state, *path[0], down=True, keys_down=keys_down,
                 rect=rect, ctx=ctx)
    for (x, y) in path[1:]:
        _frame(state, x, y, down=True, keys_down=keys_down, rect=rect,
               ctx=ctx)
    _frame(state, *path[-1], down=False, keys_down=keys_down, rect=rect,
           ctx=ctx)
    return ctx


def _screen_of(state, wa, wb, rect=VIEW):
    cx = rect.x + rect.w * 0.5 + state.grid_offset_x
    cy = rect.y + rect.h * 0.5 + state.grid_offset_y
    return (cx + wa * state.grid_zoom, cy - wb * state.grid_zoom)


def _sector_center_screen(state, gx, gz, rect=VIEW):
    room = state.current_room_ref()
    ss = float(L.SECTOR_SIZE)
    return _screen_of(state,
                      float(room.position[0]) + (gx + 0.5) * ss,
                      float(room.position[2]) + (gz + 0.5) * ss, rect)


# ---------------------------------------------------------------------------
# rendered frames (golden-style: deterministic, mode-distinct, non-empty)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", [GridViewMode.TOP, GridViewMode.FRONT,
                                  GridViewMode.SIDE])
def test_cave_views_paint(mode):
    state = _cave_state()
    state.grid_view = mode
    state.grid_zoom = 0.02
    ctx = _frame(state)
    fb = ctx.paint(_fb())
    img = np.asarray(fb.color)
    bg = np.array([20 | (20 << 8) | (25 << 16) | (255 << 24)],
                  np.uint32).view(np.int32)[0]
    painted = int((img != bg).sum())
    # the view rasterizes real content (sector fills + edges + markers)
    assert painted > 2000
    # deterministic: same state paints the identical frame
    img2 = np.asarray(_frame(state).paint(_fb()).color)
    assert (img == img2).all()


def test_cave_views_distinct_and_clipped():
    state = _cave_state()
    state.grid_zoom = 0.02
    imgs = {}
    for mode in (GridViewMode.TOP, GridViewMode.FRONT, GridViewMode.SIDE):
        state.grid_view = mode
        rect = Rect(40, 30, 200, 160)
        ctx = _frame(state, rect=rect)
        img = np.asarray(ctx.paint(_fb()).color)
        imgs[mode] = img
        # scissor: nothing outside the view rect
        outside = np.ones_like(img, bool)
        outside[30:190, 40:240] = False
        assert (img[outside] == 0).all()
    assert (imgs[GridViewMode.TOP] != imgs[GridViewMode.FRONT]).any()
    assert (imgs[GridViewMode.FRONT] != imgs[GridViewMode.SIDE]).any()


def test_portals_and_objects_render():
    state = _cave_state()
    state.grid_zoom = 0.02
    room = state.current_room_ref()
    assert room.portals or any(r.portals for r in state.level.rooms)
    ctx = _frame(state)
    cmds = ctx.commands
    # portal outlines queue magenta lines
    assert any(c[0] == "line" and c[2] == (255, 100, 255) for c in cmds)
    # room center crosshair present (current room red or hover yellow)
    assert any(c[0] == "circle" and c[2] in ((255, 100, 100),
                                             (255, 255, 150)) for c in cmds)


# ---------------------------------------------------------------------------
# pan / zoom
# ---------------------------------------------------------------------------

def test_wheel_zoom_and_right_pan():
    state = _synth_state()
    z0 = state.grid_zoom
    _frame(state, 160, 120, wheel=10.0)
    assert state.grid_zoom > z0
    # right-drag pans by the mouse delta
    _frame(state, 100, 100, right=True)
    _frame(state, 130, 90, right=True)
    assert state.grid_offset_x == pytest.approx(30.0)
    assert state.grid_offset_y == pytest.approx(-10.0)
    # zoom clamps
    state.grid_zoom = 2.0
    _frame(state, 160, 120, wheel=1000.0)
    assert state.grid_zoom <= 2.0


# ---------------------------------------------------------------------------
# selection + sector drag
# ---------------------------------------------------------------------------

def test_click_selects_sector_then_drag_moves():
    state = _synth_state()
    sx, sy = _sector_center_screen(state, 2, 2)
    ctx = _frame(state, sx, sy, down=True)
    _frame(state, sx, sy, down=False, ctx=ctx)
    assert state.selection.kind == "sector"
    assert (state.selection.x, state.selection.z) == (2, 2)

    # drag the selected sector one cell +x (40 px at zoom 0.04 = 1000wu,
    # rounds to 1 sector)
    before = state.current_room_ref().sectors[2][2]
    assert before is not None
    _press_drag_release(state, [(sx, sy), (sx + 41, sy)], ctx=ctx)
    room = state.current_room_ref()
    # target cell now holds the dragged sector; source empty (pre-compact
    # coordinates hold because no edge trimming happens here)
    assert room.sectors[3][2] is before
    assert room.sectors[2][2] is None
    assert state.undo_stack  # one undo snapshot
    state.undo()
    assert state.current_room_ref().sectors[2][2] is not None


def test_rubber_band_multi_select():
    state = _synth_state()
    x0, y0 = _sector_center_screen(state, 0, 0)
    x1, y1 = _sector_center_screen(state, 1, 1)
    # start on empty space (below-left of the room: world x<0, z<0) so the
    # press begins a rubber band instead of selecting a sector
    start = (min(x0, x1) - 25, max(y0, y1) + 25)
    end = (max(x0, x1) + 25, min(y0, y1) - 25)
    _press_drag_release(state, [start, end])
    cells = {(s.x, s.z) for s in state.multi_selection}
    assert {(0, 0), (1, 0), (0, 1), (1, 1)} <= cells
    assert state.selection.kind == "sector"


def test_sector_drag_negative_expands_room():
    state = _synth_state()
    room = state.current_room_ref()
    w0 = room.width
    px0 = float(room.position[0])
    sx, sy = _sector_center_screen(state, 0, 0)
    ctx = _frame(state, sx, sy, down=True)
    _frame(state, sx, sy, down=False, ctx=ctx)
    _press_drag_release(state, [(sx, sy), (sx - 41, sy)], ctx=ctx)
    room = state.current_room_ref()
    # room origin shifted one sector -x; grid re-compacted to same width
    assert float(room.position[0]) == pytest.approx(
        px0 - float(L.SECTOR_SIZE))
    assert room.width == w0
    assert room.sectors[0][0] is not None


# ---------------------------------------------------------------------------
# draw tools
# ---------------------------------------------------------------------------

def test_draw_floor_and_occupied_guard():
    state = _synth_state()
    state.tool = EditorTool.DRAW_FLOOR
    sx, sy = _sector_center_screen(state, 3, 1)
    assert state.current_room_ref().get_sector(3, 1) is None
    _frame(state, sx, sy, down=True)
    s = state.current_room_ref().get_sector(3, 1)
    assert s is not None and s.floor is not None
    assert s.floor.heights == [0.0] * 4
    # clicking again refuses (already has a floor), no extra undo
    n_undo = len(state.undo_stack)
    ctx = _frame(state, sx, sy, down=False)
    _frame(state, sx, sy, down=True, ctx=ctx)
    assert "already has a floor" in state.status_message
    assert len(state.undo_stack) == n_undo


def test_draw_ceiling_places_at_ceiling_height():
    state = _synth_state()
    state.tool = EditorTool.DRAW_CEILING
    sx, sy = _sector_center_screen(state, 0, 2)
    _frame(state, sx, sy, down=True)
    s = state.current_room_ref().get_sector(0, 2)
    assert s is not None and s.ceiling is not None
    assert s.ceiling.heights == [CEILING_HEIGHT] * 4


def test_draw_floor_expands_room_negative():
    state = _synth_state()
    room = state.current_room_ref()
    px0 = float(room.position[0])
    state.tool = EditorTool.DRAW_FLOOR
    sx, sy = _sector_center_screen(state, -1, 0)
    _frame(state, sx, sy, down=True)
    room = state.current_room_ref()
    assert float(room.position[0]) == pytest.approx(
        px0 - float(L.SECTOR_SIZE))
    assert room.get_sector(0, 0).floor is not None   # the new cell
    assert room.get_sector(1, 0).floor is not None   # old (0,0) shifted


def test_draw_wall_on_hovered_edge():
    state = _synth_state()
    state.tool = EditorTool.DRAW_WALL
    # hover near the east edge of sector (1, 1)
    sx, sy = _sector_center_screen(state, 1, 1)
    ex = sx + 0.45 * float(L.SECTOR_SIZE) * state.grid_zoom
    sector = state.current_room_ref().get_sector(1, 1)
    assert not sector.walls_east
    ctx = _frame(state, ex, sy, down=True)
    assert len(sector.walls_east) == 1
    w = sector.walls_east[0]
    assert (w.y_bottom(), w.y_top()) == (0.0, CEILING_HEIGHT)
    assert "east wall" in state.status_message
    # second click refuses
    _frame(state, ex, sy, down=False, ctx=ctx)
    _frame(state, ex, sy, down=True, ctx=ctx)
    assert len(sector.walls_east) == 1
    assert "already exists" in state.status_message


def test_wall_tool_needs_top_view():
    state = _synth_state()
    state.tool = EditorTool.DRAW_WALL
    state.grid_view = GridViewMode.FRONT
    sx, sy = _sector_center_screen(state, 1, 1)
    _frame(state, sx, sy, down=True)
    assert "switch to Top view" in state.status_message


# ---------------------------------------------------------------------------
# objects
# ---------------------------------------------------------------------------

def _first_named_asset(state):
    for a in state.asset_library.assets.values():
        if not a.has_spawn_point(True):
            return a
    raise AssertionError("no asset")


def test_place_select_drag_delete_object():
    state = _synth_state()
    asset = _first_named_asset(state)
    state.selected_asset = asset.name
    state.tool = EditorTool.PLACE_OBJECT
    sx, sy = _sector_center_screen(state, 1, 1)
    ctx = _frame(state, sx, sy, down=True)
    room = state.current_room_ref()
    assert len(room.objects) == 1
    obj = room.objects[0]
    assert (obj.sector_x, obj.sector_z) == (1, 1)
    assert state.selection.kind == "object"
    _frame(state, sx, sy, down=False, ctx=ctx)

    # select tool: click selected object starts a drag; move one cell +x
    state.tool = EditorTool.SELECT
    _press_drag_release(state, [(sx, sy), (sx + 41, sy)], ctx=ctx)
    assert (obj.sector_x, obj.sector_z) == (2, 1)

    # delete key removes it
    _frame(state, sx, sy, keys_pressed=("delete",))
    assert len(room.objects) == 0
    assert state.selection.kind == "none"


def test_object_height_drag_in_front_view():
    state = _synth_state()
    asset = _first_named_asset(state)
    room = state.current_room_ref()
    room.objects.append(AssetInstance(sector_x=1, sector_z=1,
                                      asset_id=asset.id))
    state.grid_view = GridViewMode.FRONT
    state.set_selection(Selection(kind="object", room=0, index=0))
    obj = room.objects[0]
    wp = obj.world_position(room)
    sx, sy = _screen_of(state, float(wp[0]), float(wp[1]))
    # drag up 11 px at zoom 0.04 = 275 wu -> snaps to 256 (one click)
    _press_drag_release(state, [(sx, sy), (sx, sy - 11)])
    assert obj.height == pytest.approx(256.0)


def test_spawn_uniqueness_guard():
    state = _synth_state()
    spawn = None
    for a in state.asset_library.assets.values():
        if a.has_spawn_point(True):
            spawn = a
            break
    assert spawn is not None
    room = state.current_room_ref()
    room.objects.append(AssetInstance(sector_x=0, sector_z=0,
                                      asset_id=spawn.id))
    state.selected_asset = spawn.name
    state.tool = EditorTool.PLACE_OBJECT
    sx, sy = _sector_center_screen(state, 2, 2)
    _frame(state, sx, sy, down=True)
    assert len(room.objects) == 1
    assert "Only one player spawn" in state.status_message


# ---------------------------------------------------------------------------
# delete + shortcuts + room origin drag
# ---------------------------------------------------------------------------

def test_delete_clears_sector_geometry():
    state = _synth_state()
    sx, sy = _sector_center_screen(state, 0, 0)
    ctx = _frame(state, sx, sy, down=True)
    _frame(state, sx, sy, down=False, ctx=ctx)
    assert state.selection.kind == "sector"
    _frame(state, sx, sy, keys_pressed=("delete",), ctx=ctx)
    # cleared + compacted; the room re-trims to the remaining 3x3 block
    room = state.current_room_ref()
    assert all(room.get_sector(0, 0) is None or
               not room.get_sector(0, 0).walls_north
               for _ in (0,))
    assert "Deleted 1 sector" in state.status_message


def test_tool_shortcut_keys():
    state = _synth_state()
    _frame(state, 160, 120, keys_pressed=("3",))
    assert state.tool == EditorTool.DRAW_WALL
    _frame(state, 160, 120, keys_pressed=("1",))
    assert state.tool == EditorTool.SELECT


def test_room_origin_drag_moves_room():
    state = _synth_state()
    room = state.current_room_ref()
    ss = float(L.SECTOR_SIZE)
    cx = float(room.position[0]) + room.width * ss / 2.0
    cz = float(room.position[2]) + room.depth * ss / 2.0
    ox, oy = _screen_of(state, cx, cz)
    px0 = float(room.position[0])
    _press_drag_release(state, [(ox, oy), (ox + 41, oy)])
    assert float(state.current_room_ref().position[0]) == pytest.approx(
        px0 + ss)
    assert state.portals_dirty


def test_closest_edge_top_view():
    ss = float(L.SECTOR_SIZE)
    assert gv.closest_edge_top_view(0.5 * ss, 0.05 * ss) == NORTH
    assert gv.closest_edge_top_view(0.95 * ss, 0.5 * ss) == EAST

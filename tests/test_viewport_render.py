"""3D-viewport overlay rendering (viewport_3d.rs:3492-5654): placement
grids, wall previews, room/portal wireframes, selection + hover edges
drawn into the framebuffer."""

import numpy as np

from bonnie32_tpu.editor.state import (EditorState, EditorTool, SectorFace,
                                       Selection)
from bonnie32_tpu.editor.viewport_edit import ViewportEditor
from bonnie32_tpu.editor import viewport_render as vr
from bonnie32_tpu.models.level import (NORTH, NWSE, SECTOR_SIZE, Level,
                                       Portal, Room, TextureRef)
from bonnie32_tpu.ops import raster_ref

TEX = TextureRef("p", "T")


def _pack(rgb):
    return np.int32(rgb[0] | (rgb[1] << 8) | (rgb[2] << 16)
                    | np.uint32(255 << 24).astype(np.int32))


def _count(fb, rgb):
    return int((np.asarray(fb.color) == _pack(rgb)).sum())


def _state(with_floor=True):
    level = Level()
    room = Room.new(0, (0.0, 0.0, 0.0), 4, 4)
    if with_floor:
        room.set_floor(1, 1, 0.0, TEX)
    room.recalculate_bounds()
    level.add_room(room)
    s = EditorState(level)
    # look at the room center from above/outside
    s.selection = Selection(kind="sector", room=0, x=1, z=1)
    s.camera_mode = "orbit"
    s.orbit_distance = 6000.0
    s.center_camera_on_selection()
    s.selection = Selection()
    return s


def _fb():
    return raster_ref.new_framebuffer(240, 320, depth_mode="inv")


def test_placement_grid_draws_teal_lines_and_corners():
    s = _state()
    s.tool = EditorTool.DRAW_FLOOR
    ed = ViewportEditor(state=s)
    ed.preview_sector = (1.0 * SECTOR_SIZE, 1.0 * SECTOR_SIZE, 0.0, False)
    fb = vr.draw_viewport_overlays(_fb(), s, editor=ed)
    assert _count(fb, vr.GRID_INNER) > 50
    assert _count(fb, vr.GRID_OUTER) > 50
    assert _count(fb, vr.VERTEX_WHITE) >= 4


def test_wall_preview_new_vs_gap_fill_colors():
    s = _state()
    s.tool = EditorTool.DRAW_WALL
    ed = ViewportEditor(state=s)
    ed.wall_direction = NORTH
    ed.wall_drag_start = (1, 1, NORTH)
    ed.wall_drag_current = (1, 1, NORTH)
    fb = vr.draw_viewport_overlays(_fb(), s, editor=ed)
    assert _count(fb, vr.NEW_WALL) > 20         # teal: new wall
    assert _count(fb, vr.GAP_FILL) == 0

    # an existing wall on the edge turns the preview orange (gap fill)
    room = s.level.rooms[0]
    room.add_wall(1, 1, NORTH, 0.0, 512.0, TEX)
    room.add_wall(1, 1, NORTH, 896.0, 2048.0, TEX)
    room.recalculate_bounds()
    fb2 = vr.draw_viewport_overlays(_fb(), s, editor=ed)
    assert _count(fb2, vr.GAP_FILL) > 20


def test_room_bounds_and_portit_outlines():
    s = _state()
    room = s.level.rooms[0]
    room.portals.append(Portal(
        target_room=1,
        vertices=np.array([[0, 0, 0], [1024, 0, 0], [1024, 1024, 0],
                           [0, 1024, 0]], np.float32),
        normal=np.array([0, 0, 1], np.float32)))
    fb = vr.draw_viewport_overlays(_fb(), s)
    assert _count(fb, vr.ROOM_CURRENT) > 50       # current room AABB
    assert _count(fb, vr.PORTAL_WALL) > 10        # cyan wall portal
    # horizontal portal -> magenta
    room.portals[0].normal = np.array([0, 1, 0], np.float32)
    fb2 = vr.draw_viewport_overlays(_fb(), s)
    assert _count(fb2, vr.PORTAL_HORIZONTAL) > 10


def test_selection_and_hover_edges():
    s = _state()
    s.selection = Selection(kind="sector_face", room=0, x=1, z=1,
                            face=SectorFace(kind="floor"))
    fb = vr.draw_viewport_overlays(_fb(), s)
    assert _count(fb, vr.SELECT_COLOR) > 30

    hover = (0, 1, 1, SectorFace(kind="floor"))
    fb2 = vr.draw_viewport_overlays(_fb(), s, hover=hover)
    # hovered face == selected face -> no hover color drawn
    assert _count(fb2, vr.HOVER_COLOR) == 0
    s.selection = Selection()
    fb3 = vr.draw_viewport_overlays(_fb(), s, hover=hover)
    assert _count(fb3, vr.HOVER_COLOR) > 30


def test_vertex_selection_point():
    s = _state()
    s.selection = Selection(kind="vertex", room=0, x=1, z=1,
                            face=SectorFace(kind="floor"), corner_idx=2)
    fb = vr.draw_viewport_overlays(_fb(), s)
    assert _count(fb, vr.SELECT_COLOR) > 40   # edges + the 5px corner point


def test_hidden_room_skipped():
    s = _state()
    s.hidden_rooms.add(0)
    fb = vr.draw_viewport_overlays(_fb(), s)
    assert _count(fb, vr.ROOM_CURRENT) == 0


def test_render_editor_viewport_full_pass():
    # scene + overlays through the real pipeline on a tiny one-room level
    from bonnie32_tpu.models import scene as scene_mod
    from bonnie32_tpu.models import texture_pack as tp

    s = _state()
    packs = tp.load_texture_packs(
        "/root/reference/assets/samples/texture-packs")
    scene = scene_mod.compile_level(s.level, packs, tp.make_resolver(packs))
    fb = vr.render_editor_viewport(s, scene, 160, 120)
    assert fb.color.shape == (120, 160)
    assert int((np.asarray(fb.color) != 0).sum()) > 100


def test_asset_gizmos_light_spawn_collision():
    from bonnie32_tpu.models import asset as A
    from bonnie32_tpu.models.level import AssetInstance

    s = _state()
    lib = A.AssetLibrary()
    lib.assets = {a.id: a for a in A.builtin_assets()}
    s.asset_library = lib
    by_name = {a.name: a for a in lib.assets.values()}
    room = s.level.rooms[0]
    spawn = by_name.get("Player Spawn") or by_name.get("player_spawn")
    light = by_name.get("Point Light") or by_name.get("point_light")
    assert spawn is not None and light is not None
    room.objects.append(AssetInstance(sector_x=1, sector_z=1,
                                      asset_id=spawn.id))
    # height lifts the light to the orbit target's altitude so the
    # octahedron lands mid-viewport
    room.objects.append(AssetInstance(sector_x=2, sector_z=1,
                                      asset_id=light.id, height=1024.0))
    # orbit in close so the 50-unit octahedron covers real pixels
    room.set_floor(2, 1, 0.0, TEX)
    room.recalculate_bounds()
    s.selection = Selection(kind="sector", room=0, x=2, z=1)
    s.orbit_distance = 1500.0
    s.center_camera_on_selection()
    s.selection = Selection()
    fb = vr.draw_viewport_overlays(_fb(), s)
    arr = np.asarray(fb.color)
    assert int((arr == _pack(vr.GIZMO_LIGHT)).sum()) > 20   # octahedron fill

    # spawn cylinder (grey) from a camera centered on its sector
    s.selection = Selection(kind="sector", room=0, x=1, z=1)
    s.orbit_distance = 4000.0
    s.center_camera_on_selection()
    s.selection = Selection()
    arr2 = np.asarray(vr.draw_viewport_overlays(_fb(), s).color)
    assert int((arr2 == _pack(vr.GIZMO_PLAIN)).sum()) > 10

    # selecting the light turns the octahedron white and larger
    # (same camera as the yellow measurement: re-center on the light)
    s.selection = Selection(kind="sector", room=0, x=2, z=1)
    s.orbit_distance = 1500.0
    s.center_camera_on_selection()
    s.selection = Selection(kind="object", room=0, index=1)
    fb2 = vr.draw_viewport_overlays(_fb(), s)
    assert int((np.asarray(fb2.color) == _pack((255, 255, 255))).sum()) > \
        int((arr == _pack(vr.GIZMO_LIGHT)).sum())


def test_scene_render_options_skip_rooms_and_fog():
    # SceneRenderOptions parity (scene.rs:172-178) on the sequential path
    import jax.numpy as jnp
    from bonnie32_tpu.models import scene as scene_mod
    from bonnie32_tpu.models import texture_pack as tp
    from bonnie32_tpu.config import RasterSettings
    from bonnie32_tpu.types import CameraArrays

    s = _state()
    packs = tp.load_texture_packs(
        "/root/reference/assets/samples/texture-packs")
    scene = scene_mod.compile_level(s.level, packs, tp.make_resolver(packs))
    s.selection = Selection(kind="sector", room=0, x=1, z=1)
    s.camera_mode = "orbit"
    s.center_camera_on_selection()
    cam = CameraArrays(position=jnp.asarray(s.camera_pos, jnp.float32),
                       basis=jnp.asarray(s.camera_basis(), jnp.float32))
    settings = RasterSettings.game()
    fb = raster_ref.new_framebuffer(240, 320, depth_mode="inv")
    full = scene_mod.render_level(fb, scene, cam, settings)
    skipped = scene_mod.render_level(fb, scene, cam, settings,
                                     skip_rooms=(0,))
    assert int((np.asarray(full.color) != 0).sum()) > 1000
    assert int((np.asarray(skipped.color) != 0).sum()) == 0
    nofog = scene_mod.render_level(fb, scene, cam, settings, use_fog=False)
    assert nofog.color.shape == full.color.shape


def test_paste_preview_ghost():
    s = _state()
    # copy the floor at (1,1) into the geometry clipboard
    s.selection = Selection(kind="sector", room=0, x=1, z=1)
    assert s.copy_selected_geometry() >= 1
    fb = vr.draw_viewport_overlays(_fb(), s, paste_hover=(2, 2))
    assert _count(fb, vr.PASTE_PREVIEW) > 20
    # no clipboard, no ghost
    s.geometry_clipboard.faces = []
    fb2 = vr.draw_viewport_overlays(_fb(), s, paste_hover=(2, 2))
    assert _count(fb2, vr.PASTE_PREVIEW) == 0

"""2D grid views + tracker piano key mapping."""

from bonnie32_tpu.audio.tracker_ui import key_to_note
from bonnie32_tpu.editor.grid_view import (GridView,
                                           plane_to_world_offset,
                                           world_to_plane)
from bonnie32_tpu.editor.state import GridViewMode


def test_plane_mappings():
    assert world_to_plane(GridViewMode.TOP, 1, 2, 3) == (1, 3)
    assert world_to_plane(GridViewMode.FRONT, 1, 2, 3) == (1, 2)
    assert world_to_plane(GridViewMode.SIDE, 1, 2, 3) == (3, 2)
    assert plane_to_world_offset(GridViewMode.TOP, 5, 7) == (5, 0, 7)
    assert plane_to_world_offset(GridViewMode.FRONT, 5, 7) == (5, 7, 0)
    assert plane_to_world_offset(GridViewMode.SIDE, 5, 7) == (0, 7, 5)


def test_screen_world_roundtrip_and_zoom():
    v = GridView(center_x=160, center_y=120, scale=0.05)
    sx, sy = v.world_to_screen(1024.0, 2048.0)
    wa, wb = v.screen_to_world(sx, sy)
    assert abs(wa - 1024.0) < 1e-6 and abs(wb - 2048.0) < 1e-6
    # y axis flipped: +world-b is up-screen
    assert sy < 120
    # zoom about a point keeps it fixed
    before = v.screen_to_world(200.0, 80.0)
    v.zoom(2.0, 200.0, 80.0)
    after = v.screen_to_world(200.0, 80.0)
    assert abs(before[0] - after[0]) < 1e-6
    assert abs(before[1] - after[1]) < 1e-6
    # pan shifts
    w0 = v.screen_to_world(160, 120)
    v.pan(10.0, 0.0)
    w1 = v.screen_to_world(160, 120)
    assert w1[0] < w0[0]


def test_sector_at():
    v = GridView(center_x=0, center_y=0, scale=1.0 / 1024.0)
    # world (2560, z=1536) -> sector (2, 1)
    sx, sy = v.world_to_screen(2560.0, 1536.0)
    assert v.sector_at(sx, sy) == (2, 1)
    v.mode = GridViewMode.FRONT
    assert v.sector_at(0, 0) is None


def test_key_to_note():
    assert key_to_note("z", 4) == 48          # C4
    assert key_to_note("s", 4) == 49          # C#4
    assert key_to_note("m", 4) == 59          # B4
    assert key_to_note(",", 4) == 60          # C5
    assert key_to_note("q", 4) == 65          # F5
    assert key_to_note("]", 4) == 84          # C7
    assert key_to_note("Z", 0) == 0
    assert key_to_note("]", 9) == 127         # clamped
    assert key_to_note("1", 4) is None
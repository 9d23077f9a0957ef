"""Composed editor + tracker screens (layout.rs / tracker layout.rs):
panel arithmetic, widget routing, and headless screenshot rasterization."""

import numpy as np
import jax.numpy as jnp

from bonnie32_tpu.audio.song import Note, Pattern, Song
from bonnie32_tpu.audio.state import TrackerState
from bonnie32_tpu.audio import tracker_ui
from bonnie32_tpu.editor.layout import (EditorLayout, STATUS_HEIGHT,
                                        TOOLBAR_HEIGHT, draw_editor)
from bonnie32_tpu.editor.state import EditorState, EditorTool
from bonnie32_tpu.models.level import Level, Room, TextureRef
from bonnie32_tpu.types import FrameBuffers
from bonnie32_tpu.ui import Rect, UiContext


def _state():
    level = Level()
    for rid in (0, 1, 2):
        room = Room.new(rid, (0.0, 0.0, rid * 4096.0), 4, 4)
        room.set_floor(0, 0, 0.0, TextureRef("p", "T"))
        room.recalculate_bounds()
        level.add_room(room)
    return EditorState(level)


def test_editor_layout_rects_and_tool_click():
    state = _state()
    layout = EditorLayout()
    ctx = UiContext()
    bounds = Rect(0, 0, 640, 480)

    ctx.begin_frame(0, 0, False)
    rects = draw_editor(ctx, layout, state, bounds)
    assert rects["toolbar"].h == TOOLBAR_HEIGHT
    assert rects["status"].h == STATUS_HEIGHT
    # viewport sits between the two sidebars
    assert rects["left"].right <= rects["viewport"].x + 6
    assert rects["viewport"].right <= rects["right"].x + 6
    assert rects["viewport"].w > 200

    # click the Wall tool button (3rd in the strip at x=4+2*30..)
    bx = 4 + 2 * 30 + 15
    by = TOOLBAR_HEIGHT / 2
    ctx.begin_frame(bx, by, True)
    draw_editor(ctx, layout, state, bounds)
    ctx.begin_frame(bx, by, False)
    draw_editor(ctx, layout, state, bounds)
    assert state.tool == EditorTool.DRAW_WALL


def test_editor_room_list_and_status_toast():
    state = _state()
    state.set_status("Hello toast", 2.0)
    layout = EditorLayout()
    ctx = UiContext()
    ctx.begin_frame(0, 0, False)
    rects = draw_editor(ctx, layout, state, Rect(0, 0, 640, 480))
    assert "left:Room" in rects          # Room panel expanded by default
    assert state.status_message == "Hello toast"

    # click the second room row (right of the visibility eye column)
    rr = rects["left:Room"]
    ctx.begin_frame(rr.x + 30, rr.y + 2 + 16 + 8, True)
    draw_editor(ctx, layout, state, Rect(0, 0, 640, 480))
    ctx.begin_frame(rr.x + 30, rr.y + 2 + 16 + 8, False)
    draw_editor(ctx, layout, state, Rect(0, 0, 640, 480))
    assert state.current_room == 1

    # toast expires after its duration
    for _ in range(130):
        ctx.begin_frame(0, 0, False)
        draw_editor(ctx, layout, state, Rect(0, 0, 640, 480))
    assert state.status_message == ""


def test_editor_screen_rasterizes():
    state = _state()
    layout = EditorLayout()
    ctx = UiContext()
    ctx.begin_frame(0, 0, False)
    draw_editor(ctx, layout, state, Rect(0, 0, 320, 240))
    fb = FrameBuffers(color=jnp.zeros((240, 320), jnp.int32),
                      depth=jnp.zeros((240, 320), jnp.float32))
    out = ctx.paint(fb)
    w = np.asarray(out.color)
    assert (w != 0).mean() > 0.5         # chrome covers the frame
    # toolbar region has accent-colored active tool pixels
    assert (w[4:32, 4:40] != w[100, 300]).any()


def _song():
    pat = Pattern.new(16, 3)
    pat.channels[0][0] = Note(pitch=60, instrument=1, volume=100)
    pat.channels[1][4] = Note(pitch=67, instrument=2, volume=80)
    return Song(patterns=[pat], arrangement=[0, 0],
                channel_instruments=[1, 2, 3])


def test_note_text_formatting():
    assert tracker_ui.note_text(None) == "... .. .. ..."
    assert tracker_ui.note_text(Note()) == "... .. .. ..."
    from bonnie32_tpu.audio.song import Effect
    assert tracker_ui.note_text(
        Note(pitch=60, effect=Effect(kind="SetPan", x=64))).endswith("P40")
    assert tracker_ui.note_text(
        Note(pitch=60, instrument=1, volume=100)) == "C-4 01 100"[:9] \
        or tracker_ui.note_text(
            Note(pitch=60, instrument=1, volume=100)).startswith("C-4 01")
    assert tracker_ui.note_text(Note(pitch=61)).startswith("C#4")


def test_tracker_grid_click_and_raster():
    st = TrackerState(song=_song())
    ctx = UiContext()
    bounds = Rect(0, 0, 320, 240)
    ctx.begin_frame(0, 0, False)
    rects = tracker_ui.draw_tracker(ctx, st, bounds)
    assert "grid" in rects and "arrangement" in rects

    # click row 5 / channel 1's cell
    g = rects["grid"]
    cx = g.x + tracker_ui.ROWNUM_W + 1 * tracker_ui.CELL_W + 5
    cy = g.y + 5 * tracker_ui.ROW_H + 3
    ctx.begin_frame(cx, cy, True)
    tracker_ui.draw_tracker(ctx, st, bounds)
    ctx.begin_frame(cx, cy, False)
    tracker_ui.draw_tracker(ctx, st, bounds)
    assert (st.current_row, st.current_channel) == (5, 1)

    # arrangement strip click switches pattern position
    a = rects["arrangement"]
    ctx.begin_frame(a.x + 4 + 22 + 5, a.y + 8, True)
    tracker_ui.draw_tracker(ctx, st, bounds)
    ctx.begin_frame(a.x + 4 + 22 + 5, a.y + 8, False)
    tracker_ui.draw_tracker(ctx, st, bounds)
    assert st.current_pattern_idx == 1

    fb = FrameBuffers(color=jnp.zeros((240, 320), jnp.int32),
                      depth=jnp.zeros((240, 320), jnp.float32))
    out = ctx.paint(fb)
    w = np.asarray(out.color)
    assert (w != 0).mean() > 0.5


def test_textures_panel_user_flow_opens_paint_editor():
    from bonnie32_tpu.editor.layout import EditorLayout, draw_editor

    state = _state()
    layout = EditorLayout()
    ctx = UiContext()
    bounds = Rect(0, 0, 640, 480)
    ctx.begin_frame(0, 0, False)
    rects = draw_editor(ctx, layout, state, bounds)
    tex_body = rects["right:Textures"]
    # switch the palette to User mode (right half of the toggle strip)
    tx = tex_body.x + tex_body.w * 0.75
    ctx.begin_frame(tx, tex_body.y + 8, True)
    draw_editor(ctx, layout, state, bounds)
    assert layout.palette.user_mode is True
    # click "+ New" in the user grid (top-left of the grid area)
    ctx.begin_frame(0, 0, False)
    draw_editor(ctx, layout, state, bounds)
    ctx.begin_frame(tex_body.x + 10, tex_body.y + 18 + 10, True)
    draw_editor(ctx, layout, state, bounds)
    assert layout.editing_texture is not None
    assert layout.editing_texture in state.user_textures
    # the paint editor composes over the viewport; Escape closes it
    ctx.begin_frame(0, 0, False, keys_pressed=("escape",))
    draw_editor(ctx, layout, state, bounds)
    assert layout.editing_texture is None


def test_room_list_add_hide_delete():
    from bonnie32_tpu.editor.layout import EditorLayout, draw_editor

    state = _state()                      # 3 rooms
    layout = EditorLayout()
    layout.left_collapsed = [True, True, False, True]   # expand Room only
    ctx = UiContext()
    bounds = Rect(0, 0, 640, 480)
    ctx.begin_frame(0, 0, False)
    rects = draw_editor(ctx, layout, state, bounds)
    body = rects["left:Room"]
    # hide room 0 via its eye button
    ctx.begin_frame(body.x + 2 + 6, body.y + 2 + 7, True)
    draw_editor(ctx, layout, state, bounds)
    assert 0 in state.hidden_rooms
    # click room 1's row to select it
    ctx.begin_frame(0, 0, False)
    draw_editor(ctx, layout, state, bounds)
    ctx.begin_frame(body.x + 40, body.y + 2 + 16 + 8, True)
    draw_editor(ctx, layout, state, bounds)
    assert state.current_room == 1
    # delete room 1: hidden index 0 stays, current clamps
    ctx.begin_frame(0, 0, False)
    draw_editor(ctx, layout, state, bounds)
    ctx.begin_frame(body.right - 12 - 4 + 6, body.y + 2 + 16 + 8, True)
    draw_editor(ctx, layout, state, bounds)
    assert len(state.level.rooms) == 2
    assert 0 in state.hidden_rooms
    # add a room: placed east of the last, becomes current
    ctx.begin_frame(0, 0, False)
    draw_editor(ctx, layout, state, bounds)
    ctx.begin_frame(body.x + 2 + 10, body.bottom - 16 + 6, True)
    draw_editor(ctx, layout, state, bounds)
    assert len(state.level.rooms) == 3
    assert state.current_room == 2
    assert float(state.level.rooms[2].position[0]) > \
        float(state.level.rooms[1].position[0])


def test_skybox_panel_toggle_and_preset():
    from bonnie32_tpu.editor.layout import EditorLayout, draw_editor
    from bonnie32_tpu.models.skybox import Skybox

    state = _state()
    layout = EditorLayout()
    layout.left_collapsed = [False, True, True, True]   # expand Skybox
    ctx = UiContext()
    bounds = Rect(0, 0, 640, 480)
    ctx.begin_frame(0, 0, False)
    rects = draw_editor(ctx, layout, state, bounds)
    body = rects["left:Skybox"]
    assert state.level.skybox is None
    # toggle ON
    ctx.begin_frame(body.x + 10, body.y + 2 + 8, True)
    draw_editor(ctx, layout, state, bounds)
    assert state.level.skybox is not None
    # click the Night preset (3rd button under the 28px preview)
    ctx.begin_frame(0, 0, False)
    draw_editor(ctx, layout, state, bounds)
    bw = (body.w - 8 - 12) / 4
    py = body.y + 2 + 16 + 4 + 28 + 4 + 7
    ctx.begin_frame(body.x + 2 + 2 * (bw + 4) + 4, py, True)
    draw_editor(ctx, layout, state, bounds)
    night = Skybox.from_ron(state.level.skybox)
    assert night.stars.enabled == Skybox.preset_night().stars.enabled
    assert night.zenith_color == Skybox.preset_night().zenith_color


def test_skybox_panel_sun_toggle_persists():
    from bonnie32_tpu.editor.layout import EditorLayout, draw_editor
    from bonnie32_tpu.models.skybox import Skybox

    state = _state()
    state.level.skybox = Skybox().to_ron()      # sun disabled by default
    layout = EditorLayout()
    layout.left_collapsed = [False, True, True, True]
    ctx = UiContext()
    bounds = Rect(0, 0, 640, 480)
    ctx.begin_frame(0, 0, False)
    rects = draw_editor(ctx, layout, state, bounds)
    body = rects["left:Skybox"]
    # Sun checkbox row: toggle + preview + presets + 18
    sy = body.y + 2 + 16 + 4 + 28 + 4 + 18 + 6
    ctx.begin_frame(body.x + 2 + 6, sy, True)
    draw_editor(ctx, layout, state, bounds)
    ctx.begin_frame(body.x + 2 + 6, sy, False)
    draw_editor(ctx, layout, state, bounds)
    assert Skybox.from_ron(state.level.skybox).sun.enabled is True


def test_debug_panel_draws_timings_and_memory():
    """layout.rs:2816 draw_debug_panel: FPS line, timing bars, memory."""
    from bonnie32_tpu.editor.layout import EditorLayout, draw_editor
    from bonnie32_tpu.editor.state import EditorState
    from bonnie32_tpu.ui import Rect, UiContext

    s = EditorState()
    s.frame_fps = 60.0
    s.frame_timings = {"toolbar": 0.2, "viewport": 5.0, "right": 1.0}
    layout = EditorLayout()
    layout.left_collapsed = [False] * len(layout.left_collapsed)
    ctx = UiContext()
    ctx.begin_frame(-5, -5, False)
    draw_editor(ctx, layout, s, Rect(0, 0, 800, 600))
    texts = [c[2] for c in ctx.commands if c[0] == "text"]
    assert any("FPS:" in t for t in texts)
    assert any("Frame:" in t for t in texts)
    assert any("Memory:" in t for t in texts)
    assert any("viewport" in t for t in texts)

"""Dropdown menus, PS1 color pickers, three-way toggle
(ui/widgets.rs:1280-2290), driven through UiContext events."""

import numpy as np
import jax.numpy as jnp

from bonnie32_tpu.types import FrameBuffers
from bonnie32_tpu.ui import (DropdownState, Rect, UiContext, dropdown,
                             dropdown_block_clicks, ps1_color_picker,
                             ps1_color_picker_height,
                             ps1_color_picker_with_alpha,
                             ps1_color_picker_with_blend_mode,
                             three_way_toggle, PS1_PRESETS)

ITEMS = ["Alpha", "Beta", "Gamma"]


def _frames(fn, events):
    """Drive fn(ctx) across (x, y, down, extras) event frames with one
    persistent context; returns the per-frame results."""
    ctx = UiContext()
    out = []
    for ev in events:
        x, y, down = ev[0], ev[1], ev[2]
        kw = ev[3] if len(ev) > 3 else {}
        ctx.begin_frame(x, y, down, **kw)
        out.append(fn(ctx))
    return ctx, out


def test_dropdown_open_pick_close():
    state = DropdownState()
    trigger = Rect(10, 10, 100, 20)

    def frame(ctx):
        return dropdown(ctx, state, "dd", trigger, ITEMS, 0)

    # click the trigger -> menu opens
    _, res = _frames(frame, [(50, 20, True), (50, 20, False)])
    assert state.is_open("dd")
    # menu rect sits below the trigger; click item 2 ("Gamma")
    item_y = trigger.bottom + 2 + 2 + 2 * 20 + 10
    _, res = _frames(frame, [(50, 20, False), (50, item_y, True)])
    assert res[-1] == 2
    assert not state.is_any_open()


def test_dropdown_closes_on_outside_click():
    state = DropdownState()
    trigger = Rect(10, 10, 100, 20)

    def frame(ctx):
        return dropdown(ctx, state, "dd", trigger, ITEMS, 1)

    _frames(frame, [(50, 20, True), (50, 20, False)])
    assert state.is_any_open()
    _frames(frame, [(50, 20, False), (300, 200, True)])
    assert not state.is_any_open()


def test_dropdown_block_clicks_swallows_press():
    state = DropdownState()
    state.open("dd", Rect(10, 10, 100, 20))
    ctx = UiContext()
    ctx.begin_frame(200, 200, True)
    assert ctx.mouse.pressed
    dropdown_block_clicks(ctx, state)
    assert not ctx.mouse.pressed
    # press on the trigger is NOT swallowed (needed for toggle-to-close)
    ctx.begin_frame(50, 20, False)
    ctx.begin_frame(50, 20, True)
    dropdown_block_clicks(ctx, state)
    assert ctx.mouse.pressed


def test_color_picker_slider_drag_and_presets():
    st = {}
    cur = [(128, 128, 128)]

    def frame(ctx):
        changed, active = ps1_color_picker(ctx, "cp", 10, 20, 200,
                                           cur[0], (100, 100, 100), "Col",
                                           st)
        if changed is not None:
            cur[0] = changed
        return changed, active

    # R slider: swatch 32 + 8 + label 16 = slider_x 66, width 200-32-8-16-20-4=120
    # R track at y = 20 + (32 - 32)/2 = 20..30; drag to the far right
    _, res = _frames(frame, [(185, 25, True), (185, 25, False)])
    assert cur[0][0] == 255      # r5=31 expanded
    # preset row at y = 20+32+6 = 58; preset 2 (Red) at x=10+42+2*16=84
    _, res = _frames(frame, [(86, 60, True), (86, 60, False)])
    assert cur[0] == (255, 0, 0)
    # double-click on G track resets that channel to the default
    _, res = _frames(frame, [(100, 36, True,
                              dict(double_clicked=True))])
    g5_default = 100 >> 3
    assert cur[0][1] == (g5_default << 3) | (g5_default >> 2)


def test_color_picker_drag_continues_outside_track():
    st = {}
    seen = []

    def frame(ctx):
        changed, active = ps1_color_picker(ctx, "cp", 10, 20, 200,
                                           (0, 0, 0), (0, 0, 0), "", st)
        seen.append((changed, active))
        return changed

    # press inside the B track (third slider, y ~ 42..52), drag far away
    _frames(frame, [(100, 45, True), (400, 300, True), (400, 300, False)])
    # while held, the drag stayed active and pinned to the track range
    assert seen[1][1] is True
    assert seen[1][0] is not None and seen[1][0][2] == 255


def test_color_picker_alpha_and_blend_variants():
    st = {}

    def frame_a(ctx):
        return ps1_color_picker_with_alpha(ctx, "cpa", 10, 20, 200,
                                           (10, 20, 30), 255,
                                           (0, 0, 0), "", st)

    ay = 20 + ps1_color_picker_height() + 4
    _, res = _frames(frame_a, [(26 + 1, ay + 5, True)])
    (color, alpha), active = res[-1]
    assert alpha is not None and alpha < 16 and active

    st2 = {}

    def frame_b(ctx):
        return ps1_color_picker_with_blend_mode(ctx, "cpb", 10, 20, 200,
                                                (10, 20, 30), 0,
                                                (0, 0, 0), "", st2)

    by = 20 + ps1_color_picker_height() + 4
    bw = (200 - 6) / 4.0
    _, res = _frames(frame_b, [(10 + 1 * (bw + 2) + 3, by + 8, True)])
    (color, blend), _ = res[-1]
    assert blend == 1   # ADD


def test_three_way_toggle():
    rect = Rect(0, 0, 90, 18)

    def frame(ctx):
        return three_way_toggle(ctx, rect, ["A", "B", "C"], 0)

    _, res = _frames(frame, [(45, 9, True)])
    assert res[-1] == 1
    # clicking the already-selected option returns None
    _, res = _frames(frame, [(5, 9, True)])
    assert res[-1] is None


def test_widgets_paint_smoke():
    """All new widgets rasterize through paint() without error."""
    ctx = UiContext()
    ctx.begin_frame(0, 0, False)
    state = DropdownState()
    dropdown(ctx, state, "dd", Rect(5, 5, 80, 16), ITEMS, 0)
    ps1_color_picker(ctx, "cp", 5, 40, 150, (200, 50, 50), (0, 0, 0),
                     "Color", {})
    three_way_toggle(ctx, Rect(5, 110, 90, 16), ["X", "Y", "Z"], 2)
    fb = FrameBuffers(color=jnp.zeros((240, 320), jnp.int32),
                      depth=jnp.full((240, 320), 3.4e38, jnp.float32))
    out = ctx.paint(fb)
    assert int((np.asarray(out.color) != 0).sum()) > 500


# ---------------------------------------------------------------------------
# Rotary knobs (widgets.rs:781-1100)
# ---------------------------------------------------------------------------

import math

from bonnie32_tpu.ui.widgets import knob, mini_knob


def test_knob_draws_and_reports_no_change_when_idle():
    ctx = UiContext()
    ctx.begin_frame(0, 0, False)
    new, editing = knob(ctx, 100, 100, 20, 64, "VOL")
    assert new is None and editing is False
    assert len(ctx.commands) > 10   # ring, arc segments, pointer, label


def test_knob_drag_sets_value_by_angle():
    ctx = UiContext()
    # mouse at 12 o'clock inside the knob -> angle 0 from vertical ->
    # norm = (0 + 3pi/4) / pi = 0.75 -> value 95
    ctx.begin_frame(100, 85, True)
    new, _ = knob(ctx, 100, 100, 20, 0, "VOL")
    assert new == round(0.75 * 127)
    # bottom-left dead zone snaps to 0
    ctx.begin_frame(90, 118, True)
    new, _ = knob(ctx, 100, 100, 20, 64, "VOL")
    assert new == 0
    # bottom-right dead zone snaps to 127
    ctx.begin_frame(110, 118, True)
    new, _ = knob(ctx, 100, 100, 20, 64, "VOL")
    assert new == 127


def test_knob_value_box_starts_editing():
    ctx = UiContext()
    ctx.begin_frame(100, 100 + 20 + 10, True)   # inside the value box
    _, editing = knob(ctx, 100, 100, 20, 64, "VOL")
    assert editing is True


def test_mini_knob_drag():
    ctx = UiContext()
    ctx.begin_frame(60, 50, True)     # straight up, inside radius
    new = mini_knob(ctx, 60, 60, 12, 0, "P", bipolar=True)
    assert new == round(0.75 * 127)
    ctx.begin_frame(0, 0, False)
    assert mini_knob(ctx, 60, 60, 12, 64, "P") is None


def test_vlist_scrollbar_drawn_when_overflowing():
    ctx = UiContext()
    ctx.begin_frame(0, 0, False)
    from bonnie32_tpu.ui.widgets import vlist
    items = [f"row {i}" for i in range(50)]
    vlist(ctx, "l", Rect(0, 0, 100, 100), items, None)
    n_cmds = len(ctx.commands)
    ctx2 = UiContext()
    ctx2.begin_frame(0, 0, False)
    vlist(ctx2, "s", Rect(0, 0, 100, 100), ["a", "b"], None)
    assert n_cmds > len(ctx2.commands)   # scrollbar fills added

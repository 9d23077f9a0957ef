"""UI toolkit: rect math, widget interaction state machine, drag tracker,
framebuffer painting."""

import numpy as np
import jax.numpy as jnp

from bonnie32_tpu.ui import (DEFAULT_THEME, DragConfig, DragState, Rect,
                             UiContext, button, checkbox, drag_value,
                             slider, vlist)
from bonnie32_tpu.types import FrameBuffers


def test_rect_math():
    r = Rect.screen(320, 240)
    assert r.right == 320 and r.bottom == 240
    assert r.contains(0, 0) and not r.contains(320, 0)
    a, b = r.split_h(0.25)
    assert a.w == 80 and b.x == 80 and b.w == 240
    t, btm = r.split_v_px(24)
    assert t.h == 24 and btm.y == 24 and btm.h == 216
    assert r.pad(10) == Rect(10, 10, 300, 220)
    assert r.slice_top(20).h == 20
    assert r.remaining_after_top(20).y == 20
    assert r.slice_bottom(30).y == 210
    i = Rect(0, 0, 100, 100).intersect(Rect(50, 60, 100, 100))
    assert (i.x, i.y, i.w, i.h) == (50, 60, 50, 40)


def frame(ctx, x, y, down, wheel=0.0):
    ctx.begin_frame(x, y, down, wheel)


def test_button_click_on_release():
    ctx = UiContext()
    r = Rect(10, 10, 60, 20)
    frame(ctx, 0, 0, False)
    assert not button(ctx, "b", r)
    # press inside
    frame(ctx, 20, 15, True)
    assert not button(ctx, "b", r)       # press, not click yet
    assert ctx.active == "b"
    # release inside -> click
    frame(ctx, 22, 16, False)
    assert button(ctx, "b", r)
    # press inside, drag out, release out -> no click
    frame(ctx, 20, 15, True)
    button(ctx, "b", r)
    frame(ctx, 200, 200, False)
    assert not button(ctx, "b", r)


def test_checkbox_and_slider():
    ctx = UiContext()
    r = Rect(0, 0, 80, 16)
    v = False
    frame(ctx, 5, 5, True)
    v = checkbox(ctx, "c", r, v)
    frame(ctx, 5, 5, False)
    v = checkbox(ctx, "c", r, v)
    assert v is True

    s = Rect(0, 30, 100, 10)
    val = 0.0
    frame(ctx, 75, 35, True)
    val = slider(ctx, "s", s, val, 0.0, 10.0)
    assert abs(val - 7.5) < 0.2
    # drag past the end clamps
    frame(ctx, 500, 35, True)
    val = slider(ctx, "s", s, val, 0.0, 10.0)
    assert val == 10.0


def test_drag_value():
    ctx = UiContext()
    r = Rect(0, 0, 60, 16)
    st = {}
    frame(ctx, 10, 5, True)
    v = drag_value(ctx, "d", r, 5.0, speed=0.5, state=st)
    assert v == 5.0                       # first frame anchors
    frame(ctx, 30, 5, True)
    v = drag_value(ctx, "d", r, v, speed=0.5, state=st)
    assert abs(v - 15.0) < 1e-6           # +20px * 0.5
    frame(ctx, 30, 5, False)
    v = drag_value(ctx, "d", r, v, speed=0.5, state=st, lo=0.0, hi=12.0)
    assert v == 12.0                      # clamped


def test_vlist_select_scroll():
    ctx = UiContext()
    r = Rect(0, 0, 100, 54)               # 3 rows of 18
    items = [f"item{i}" for i in range(10)]
    sel, scroll = None, 0.0
    frame(ctx, 50, 20, True)              # row 1
    sel, scroll = vlist(ctx, "l", r, items, sel, scroll=scroll)
    frame(ctx, 50, 20, False)
    sel, scroll = vlist(ctx, "l", r, items, sel, scroll=scroll)
    assert sel == 1
    # wheel scrolls down
    frame(ctx, 50, 20, False, wheel=-2.0)
    sel, scroll = vlist(ctx, "l", r, items, sel, scroll=scroll)
    assert scroll == 36.0


def test_paint_into_framebuffer():
    ctx = UiContext()
    frame(ctx, 0, 0, False)
    ctx.fill(Rect(2, 2, 10, 6), (255, 0, 0))
    ctx.outline(Rect(0, 0, 32, 24), (0, 255, 0))
    ctx.line(0, 12, 31, 12, (0, 0, 255))
    fb = FrameBuffers(color=jnp.zeros((24, 32), jnp.int32),
                      depth=jnp.zeros((24, 32), jnp.float32))
    out = ctx.paint(fb)
    w = np.asarray(out.color)
    assert (w[3, 3] & 0xFF) == 255        # fill red
    assert ((w[0, 5] >> 8) & 0xFF) == 255  # outline green
    assert ((w[12, 20] >> 16) & 0xFF) == 255  # line blue


def test_drag_tracker_line_and_circle():
    basis = np.eye(3, dtype=np.float32)
    campos = np.array([0, 0, -10], np.float32)
    W, H = 320, 240
    st = DragState.new([0, 0, 0], [0, 0, 0], (160, 120))
    cfg = DragConfig.line([0, 0, 0], [1, 0, 0]).with_snap(0.5)
    # drag right: handle slides along +x, snapped to 0.5
    st = cfg.update(st, 200.0, 120.0, campos, basis, W, H)
    assert st.current_position[0] > 0
    assert abs(st.current_position[0] / 0.5
               - round(st.current_position[0] / 0.5)) < 1e-4
    assert abs(st.current_position[1]) < 1e-4

    # rotation: circle in the z=0 plane viewed head-on
    st2 = DragState.new_rotation([0, 0, 0], 0.0, (160, 120), (160, 120))
    cfg2 = DragConfig.circle([0, 0, 0], [0, 0, 1], [1, 0, 0])
    st2 = cfg2.update(st2, 160.0, 60.0, campos, basis, W, H)
    # mouse above center: hit point has -y (screen y down) -> angle ~ -90deg
    assert abs(abs(st2.current_angle) - np.pi / 2) < 0.2
    d = st2.angle_delta()
    assert abs(d - st2.current_angle) < 1e-6

    # screen picker moves in camera plane
    st3 = DragState.new([1, 1, 0], [0, 0, 0], (100, 100))
    cfg3 = DragConfig(picker="screen", sensitivity=0.01)
    st3 = cfg3.update(st3, 150.0, 100.0, campos, basis, W, H)
    np.testing.assert_allclose(st3.position_delta(), [0.5, 0, 0], atol=1e-5)
    st3.reset_initial()
    assert st3.mouse_delta() == (0.0, 0.0)

def test_font_masks():
    from bonnie32_tpu.ui import font
    m = font.render_text_mask("A")
    assert m.shape == (7, 5)
    assert m.any() and not m.all()
    # 'A' is symmetric around the center column
    np.testing.assert_array_equal(m, m[:, ::-1])
    w, h = font.text_size("HELLO")
    assert (w, h) == (5 * 6 - 1, 7)
    m2 = font.render_text_mask("HI", scale=2)
    assert m2.shape == (14, 22)
    # every printable ASCII char has a real glyph
    for code in range(32, 127):
        assert chr(code) in font.GLYPHS


def test_text_rasterizes_into_framebuffer():
    """Headless screenshot: widget chrome + text land in the frame."""
    from bonnie32_tpu.ui import draw_panel, panel_content_rect
    ctx = UiContext()
    frame(ctx, 0, 0, False)
    draw_panel(ctx, Rect(0, 0, 120, 60), "TOOLS", (30, 30, 36))
    ctx.text(4, 30, "Hello, world!", (255, 200, 50))
    fb = FrameBuffers(color=jnp.zeros((64, 128), jnp.int32),
                      depth=jnp.zeros((64, 128), jnp.float32))
    out = ctx.paint(fb)
    w = np.asarray(out.color)
    # title text pixels (white) somewhere in the title bar rows
    title_rows = w[7:14, 5:60]
    assert ((title_rows & 0xFFFFFF) == 0xFFFFFF).sum() > 20
    # body text: orange pixels ((50<<16)|(200<<8)|255)
    body = w[30:37, 4:90]
    expected = (50 << 16) | (200 << 8) | 255
    assert ((body & 0xFFFFFF) == expected).sum() > 40
    # text clips safely at the edge without error
    ctx2 = UiContext()
    frame(ctx2, 0, 0, False)
    ctx2.text(120, 60, "CLIPPED", (255, 255, 255))
    ctx2.text(-3, -2, "NEG", (255, 255, 255))
    out2 = ctx2.paint(fb)
    assert np.asarray(out2.color).shape == (64, 128)


def test_split_panel_layout_and_drag():
    from bonnie32_tpu.ui import SplitPanel
    sp = SplitPanel.horizontal("main").with_ratio(0.5).with_min_size(20)
    bounds = Rect(0, 0, 200, 100)
    a, b = sp.layout(bounds)
    assert a.w == 98 and b.w == 98 and b.x == 102

    ctx = UiContext()
    # press on the divider, drag right, release
    frame(ctx, 100, 50, False)
    sp.handle_input(ctx, bounds)
    frame(ctx, 100, 50, True)
    sp.handle_input(ctx, bounds)
    frame(ctx, 150, 50, True)
    sp.handle_input(ctx, bounds)
    assert sp.ratio == 0.75
    # min-size clamps the drag
    frame(ctx, 999, 50, True)
    sp.handle_input(ctx, bounds)
    assert sp.ratio == 0.9  # 1 - 20/200
    frame(ctx, 999, 50, False)


def test_collapsible_panel():
    from bonnie32_tpu.ui import draw_collapsible_panel
    ctx = UiContext()
    r = Rect(0, 0, 100, 80)
    frame(ctx, 50, 10, False)
    clicked, content = draw_collapsible_panel(ctx, r, "INFO", False,
                                              (20, 20, 25))
    assert not clicked and content is not None
    assert content.y == 22 and content.h == 80 - 20 - 4
    frame(ctx, 50, 10, True)   # press on header
    clicked, content = draw_collapsible_panel(ctx, r, "INFO", True,
                                              (20, 20, 25))
    assert clicked and content is None


def test_radial_menu_segments_and_submenu():
    from bonnie32_tpu.ui.radial_menu import (RadialMenuConfig,
                                             RadialMenuItem,
                                             RadialMenuState, segment_at,
                                             draw_radial_menu)
    st = RadialMenuState()
    cfg = RadialMenuConfig()
    items = [RadialMenuItem("a", "A"),
             RadialMenuItem("b", "B").with_children(
                 [RadialMenuItem("b1", "B1")]),
             RadialMenuItem("c", "C").disabled(),
             RadialMenuItem("d", "D")]
    st.open(100, 100, items)
    assert st.is_open

    # 4 segments of 90deg starting at top: straight up = segment 0,
    # right = 1, down = 2, left = 3 (radial_menu.rs angle normalization)
    assert segment_at(st, cfg, 100, 100 - 50) == 0
    assert segment_at(st, cfg, 100 + 50, 100) == 1
    assert segment_at(st, cfg, 100, 100 + 50) == 2
    assert segment_at(st, cfg, 100 - 50, 100) == 3
    # center = cancel zone
    assert segment_at(st, cfg, 102, 101) is None

    # select the highlighted item on close
    ctx = UiContext()
    ctx.begin_frame(100, 50, False)
    draw_radial_menu(ctx, st, cfg, 100, 50)
    assert st.highlighted == 0
    assert st.close(select=True) == "a"
    assert st.take_selected() == "a"
    assert st.take_selected() is None

    # disabled items can't be selected
    st.open(100, 100, items)
    st.highlighted = 2
    assert st.close(select=True) is None

    # submenu navigation
    st.open(100, 100, items)
    st.enter_submenu(1)
    assert [i.id for i in st.items] == ["b1"]
    assert st.back() and [i.id for i in st.items][1] == "b"
    assert not st.back()

    # drawing queues commands
    st.open(100, 100, items)
    ctx2 = UiContext()
    ctx2.begin_frame(150, 100, False)
    draw_radial_menu(ctx2, st, cfg, 150, 100)
    assert len(ctx2.commands) > 16


def test_icons_compile_and_draw_centered():
    import numpy as np
    from bonnie32_tpu.ops import raster_ref
    from bonnie32_tpu.ui import Rect
    from bonnie32_tpu.ui import icons

    # every icon is a 7x7 non-empty mask
    for name, g in icons.ICONS.items():
        assert g.shape == (7, 7) and g.any(), name
    assert icons.icon_mask("no_such_icon").any()      # fallback box
    assert icons.icon_mask("play", scale=2).shape == (14, 14)

    fb = raster_ref.new_framebuffer(24, 24)
    before = np.asarray(fb.color).copy()
    fb = icons.draw_icon_centered(fb, "save", Rect(0, 0, 24, 24),
                                  (255, 255, 255))
    img = np.asarray(fb.color)
    changed = img != before
    assert changed.any()
    ys, xs = np.nonzero(changed)
    # centered: the 7x7 glyph lands in the middle of the 24x24 rect
    assert 8 <= ys.min() and ys.max() <= 15
    assert 8 <= xs.min() and xs.max() <= 15

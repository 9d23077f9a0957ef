"""Landing screen (landing.rs): word wrap, scroll clamp, link rows."""

import numpy as np

from bonnie32_tpu.ops import raster_ref
from bonnie32_tpu.ui import Rect
from bonnie32_tpu.ui import landing as ld
from bonnie32_tpu.ui import font


def test_wrap_text_greedy_and_paragraphs():
    width = font.text_size("aaaa bbbb")[0]
    lines = ld.wrap_text("aaaa bbbb cccc", width)
    assert lines == ["aaaa bbbb", "cccc"]
    # empty paragraphs become empty lines
    assert ld.wrap_text("x\n\ny", 1000) == ["x", "", "y"]
    # a word wider than the budget still gets its own line
    assert ld.wrap_text("superlongword tiny", 10) \
        == ["superlongword", "tiny"]


def test_scroll_clamped_to_content():
    st = ld.LandingState()
    st.max_scroll = -50.0
    st.scroll(-100.0)           # way past the end
    assert st.scroll_y == -50.0
    st.scroll(100.0)            # back past the top
    assert st.scroll_y == 0.0


def test_draw_landing_paints_and_measures():
    fb = raster_ref.new_framebuffer(240, 320)
    st = ld.LandingState()
    fb, hovered = ld.draw_landing(fb, Rect(0, 0, 320, 240), st)
    assert hovered is None
    assert st.max_scroll < 0.0          # content taller than the screen
    img = np.asarray(fb.color)
    # background filled, accent title drawn somewhere up top
    assert (img != img[0, 0]).any()


def test_link_row_hover():
    fb = raster_ref.new_framebuffer(60, 200)
    fb, rects, hovered = ld.draw_link_row(fb, 10, 20, ld.LINKS)
    assert len(rects) == len(ld.LINKS) and hovered is None
    r, url = rects[0]
    fb, rects, hovered = ld.draw_link_row(
        fb, 10, 20, ld.LINKS, mouse=(r.x + 1, r.y + 1))
    assert hovered == url


def test_scroll_moves_content():
    st = ld.LandingState()
    fb = raster_ref.new_framebuffer(240, 320)
    fb, _ = ld.draw_landing(fb, Rect(0, 0, 320, 240), st)
    top_before = np.asarray(fb.color)[:20].copy()

    st2 = ld.LandingState()
    st2.max_scroll = -200.0
    fb2 = raster_ref.new_framebuffer(240, 320)
    fb2, _ = ld.draw_landing(fb2, Rect(0, 0, 320, 240), st2,
                             scroll_delta=-30.0)
    assert st2.scroll_y == -90.0
    assert (np.asarray(fb2.color)[:20] != top_before).any()

"""Texture paint tools on indexed UserTextures."""

import numpy as np

from bonnie32_tpu.models.user_texture import UserTexture
from bonnie32_tpu.texture import (BrushShape, DrawTool, PaintState,
                                  Selection, draw_ellipse, draw_line,
                                  draw_rect, flood_fill, paint_brush,
                                  select_by_color)


def make_tex(w=16, h=16):
    return UserTexture(id=1, name="t", width=w, height=h, depth=0,
                       indices=np.zeros(w * h, np.uint8),
                       palette=[0] + [0x7FFF] * 15)


def grid(tex):
    return tex.indices.reshape(tex.height, tex.width)


def test_tool_flags():
    assert DrawTool.BRUSH.uses_brush_size()
    assert DrawTool.LINE.uses_brush_size()
    assert not DrawTool.FILL.uses_brush_size()
    assert DrawTool.RECTANGLE.is_shape_tool()
    assert not DrawTool.EYEDROPPER.modifies_texture()
    assert DrawTool.FILL.modifies_texture()


def test_brush_square_and_circle():
    tex = make_tex()
    n = paint_brush(tex, 8, 8, 5, size=3)
    assert n == 9
    g = grid(tex)
    assert np.all(g[7:10, 7:10] == 5) and g[6, 8] == 0
    # circle brush size 5 paints fewer than 25
    tex2 = make_tex()
    n2 = paint_brush(tex2, 8, 8, 5, size=5, shape=BrushShape.CIRCLE)
    assert 12 < n2 < 25
    # clipped at edges
    tex3 = make_tex()
    n3 = paint_brush(tex3, 0, 0, 5, size=3)
    assert n3 == 4  # 2x2 visible


def test_flood_fill():
    tex = make_tex()
    g = grid(tex)
    g[4, :] = 7          # wall splits the canvas
    tex.indices = g.reshape(-1)
    n = flood_fill(tex, 0, 0, 3)
    g = grid(tex)
    assert np.all(g[:4] == 3)
    assert np.all(g[4] == 7)
    assert np.all(g[5:] == 0)           # below the wall untouched
    assert n == 4 * 16
    assert flood_fill(tex, 0, 0, 3) == 0  # same index no-op
    assert flood_fill(tex, -1, 0, 3) == 0


def test_line_rect_ellipse():
    tex = make_tex()
    draw_line(tex, 0, 0, 15, 15, 2, size=1)
    g = grid(tex)
    assert g[0, 0] == 2 and g[15, 15] == 2 and g[8, 8] == 2

    tex = make_tex()
    draw_rect(tex, 2, 3, 10, 8, 4, filled=False)
    g = grid(tex)
    assert np.all(g[3, 2:11] == 4) and np.all(g[8, 2:11] == 4)
    assert np.all(g[3:9, 2] == 4) and np.all(g[3:9, 10] == 4)
    assert g[5, 5] == 0
    draw_rect(tex, 2, 3, 10, 8, 6, filled=True)
    assert np.all(grid(tex)[3:9, 2:11] == 6)

    tex = make_tex()
    n = draw_ellipse(tex, 2, 2, 13, 13, 9, filled=True)
    g = grid(tex)
    assert g[8, 8] == 9 and g[2, 2] == 0  # center in, corner out
    tex2 = make_tex()
    n2 = draw_ellipse(tex2, 2, 2, 13, 13, 9, filled=False)
    assert 0 < n2 < n                      # outline thinner than fill
    assert grid(tex2)[8, 8] == 0


def test_select_by_color():
    tex = make_tex()
    g = grid(tex)
    g[0:4, 0:4] = 5
    g[10:12, 10:12] = 5
    g[0, 15] = 6
    tex.indices = g.reshape(-1)
    # non-contiguous: every 5 everywhere
    m = select_by_color(tex, 1, 1).reshape(16, 16)
    assert m[2, 2] and m[10, 10] and not m[0, 15]
    # contiguous: only the clicked patch
    m = select_by_color(tex, 1, 1, contiguous=True).reshape(16, 16)
    assert m[2, 2] and not m[10, 10]
    # tolerance picks up nearby indices
    m = select_by_color(tex, 1, 1, tolerance=1).reshape(16, 16)
    assert m[0, 15]                        # |6-5| <= 1


def test_selection_cut_move_stamp():
    tex = make_tex()
    g = grid(tex)
    g[2:4, 2:4] = 8
    tex.indices = g.reshape(-1)
    sel = Selection.from_corners(2, 2, 3, 3)
    assert sel.is_rectangular() and sel.contains(3, 3)
    sel.cut(tex, background=0)
    assert np.all(grid(tex)[2:4, 2:4] == 0)
    sel.x, sel.y = 10, 11                  # move
    sel.stamp(tex)
    assert np.all(grid(tex)[11:13, 10:12] == 8)

    # mask-based selection from select_by_color
    m = select_by_color(tex, 10, 11, contiguous=True)
    ms = Selection.from_mask(m, 16, 16)
    assert ms is not None and not ms.is_rectangular()
    assert (ms.x, ms.y, ms.w, ms.h) == (10, 11, 2, 2)
    assert Selection.from_mask(np.zeros(256, bool), 16, 16) is None


def test_paint_state_undo():
    tex = make_tex()
    st = PaintState()
    assert st.brush_size == 3
    st.save_undo(tex, "fill")
    flood_fill(tex, 0, 0, 2)
    assert np.all(grid(tex) == 2)
    assert st.undo(tex)
    assert np.all(grid(tex) == 0)
    assert st.redo(tex)
    assert np.all(grid(tex) == 2)
    assert not st.redo(tex)
    # palette restored too
    st.save_undo(tex)
    tex.palette[1] = 0x1234
    st.undo(tex)
    assert tex.palette[1] == 0x7FFF
    # eyedropper
    g = grid(tex)
    g[5, 5] = 9
    tex.indices = g.reshape(-1)
    assert st.eyedrop(tex, 5, 5) == 9
    assert st.primary_index == 9
"""Texture editor surface: palette math, canvas view, floating selection,
UV-overlay editing, screen composition (texture_editor.rs parity)."""

import numpy as np
import pytest

from bonnie32_tpu.models.user_texture import UserTexture
from bonnie32_tpu.texture import editor as ed
from bonnie32_tpu.texture.paint import DrawTool, Selection
from bonnie32_tpu.ui.context import UiContext
from bonnie32_tpu.ui.rect import Rect


def make_tex(w=8, h=8, ncol=4):
    pal = [0] + [ed.pack15(5 * i, 3 * i, 2 * i) for i in range(1, ncol)]
    idx = np.zeros(w * h, np.uint8)
    idx[: w] = 1
    return UserTexture(id=1, name="t", width=w, height=h, depth=0,
                       indices=idx, palette=pal)


# --- palette math ---------------------------------------------------------

def test_hsl_roundtrip_stability():
    for rgb in [(31, 0, 9), (0, 28, 6), (5, 21, 31), (11, 10, 9), (0, 0, 0)]:
        h, s, l = ed.rgb5_to_hsl(*rgb)
        back = ed.hsl_to_rgb5(h, s, l)
        assert all(abs(a - b) <= 1 for a, b in zip(rgb, back)), (rgb, back)


def test_hsl_achromatic():
    assert ed.rgb5_to_hsl(16, 16, 16)[:2] == (0.0, 0.0)
    v = ed.hsl_to_rgb5(123.0, 0.0, 0.5)
    assert v[0] == v[1] == v[2]


def test_generate_ramp_monotone_lightness():
    ramp = ed.generate_ramp((24, 16, 12), 0.7, 10.0)
    assert len(ramp) == 5
    ls = [ed.rgb5_to_hsl(*ed.unpack15(c))[2] for c in ramp]
    assert ls == sorted(ls), "ramp must go dark -> light"


def test_generate_palette_from_keys_layout():
    pal = ed.generate_palette_from_keys(
        [(24, 16, 12), (8, 12, 20), (12, 18, 8)], 0.7, 10.0)
    assert len(pal) == 16
    assert pal[0] == 0                      # transparent slot
    assert all(c != 0 for c in pal[1:16])   # three full ramps
    # middle of each ramp is (close to) the key color
    for k, key in enumerate([(24, 16, 12), (8, 12, 20), (12, 18, 8)]):
        mid = ed.unpack15(pal[1 + k * 5 + 2])
        assert all(abs(a - b) <= 2 for a, b in zip(mid, key))


def test_sample_colors_table():
    assert len(ed.SAMPLE_COLORS_32) == 32
    assert ed.SAMPLE_COLORS_32[0] == (0, 0, 0)
    assert all(0 <= c <= 31 for rgb in ed.SAMPLE_COLORS_32 for c in rgb)


# --- canvas view ----------------------------------------------------------

def test_screen_to_texture_roundtrip():
    rect = (100.0, 50.0, 400.0, 300.0)
    for zoom, pan in [(4.0, (0.0, 0.0)), (2.0, (13.0, -7.0))]:
        tx, ty = ed.texture_origin(rect, 16, 16, zoom, *pan)
        for px, py in [(0, 0), (7, 3), (15, 15)]:
            sx = tx + (px + 0.5) * zoom
            sy = ty + (py + 0.5) * zoom
            assert ed.screen_to_texture(sx, sy, rect, 16, 16, zoom,
                                        *pan) == (px, py)


def test_reset_view_fits():
    z = ed.reset_view(16, 16, 400.0, 300.0)
    assert z >= 1.0 and 16 * z <= 300.0


# --- floating selection / clipboard --------------------------------------

def test_lift_move_commit_floating():
    tex = make_tex()
    st = ed.TextureEditorState()
    st.selection = Selection.from_corners(0, 0, 3, 0)   # the painted row
    ed.lift_selection_to_floating(tex, st, background=0)
    g = tex.indices.reshape(8, 8)
    assert g[0, :4].sum() == 0, "source cleared"
    st.selection.x, st.selection.y = 2, 5               # drag
    ed.commit_floating_selection(tex, st)
    g = tex.indices.reshape(8, 8)
    assert (g[5, 2:6] == 1).all(), "stamped at new position"
    assert not st.floating_active


def test_copy_paste_roundtrip():
    tex = make_tex()
    st = ed.TextureEditorState()
    st.selection = Selection.from_corners(0, 0, 3, 0)
    st.copy_selection(tex)
    assert st.clipboard is not None and st.clipboard.width == 4
    st.paste(tex)
    assert st.selection.floating is not None
    assert st.tool is DrawTool.SELECT
    ed.commit_floating_selection(tex, st)
    g = tex.indices.reshape(8, 8)
    assert (g[3, 2:6] == 1).all(), "pasted centered ((8-1)//2 = row 3)"


def test_cut_clears_and_fills_clipboard():
    tex = make_tex()
    st = ed.TextureEditorState()
    st.selection = Selection.from_corners(0, 0, 7, 0)
    st.cut_selection(tex)
    assert tex.indices.reshape(8, 8)[0].sum() == 0
    assert st.clipboard.indices.shape == (1, 8)
    assert st.undo_stack, "cut saved undo"


# --- UV overlay -----------------------------------------------------------

def quad_uv_data():
    uv = np.array([[0.25, 0.25], [0.75, 0.25], [0.75, 0.75], [0.25, 0.75]],
                  np.float32)
    vidx = np.array([[0, 1, 2], [0, 2, 3]])
    return ed.UvOverlayData.from_mesh(uv, vidx)


def test_uv_screen_mapping_v_flip():
    # v=1 maps to the texture top (screen y = tex_y)
    x, y = ed.uv_to_screen(0.0, 1.0, 10.0, 20.0, 16, 16, 2.0)
    assert (x, y) == (10.0, 20.0)
    u, v = ed.screen_to_uv(10.0, 20.0, 10.0, 20.0, 16, 16, 2.0)
    assert (u, v) == (0.0, 1.0)


def test_uv_click_and_box_select():
    data = quad_uv_data()
    st = ed.TextureEditorState()
    st.zoom = 4.0
    tx, ty = 0.0, 0.0
    # click near vertex 0 (0.25, 0.25) -> screen (16, 48) at 16px tex
    sx, sy = ed.uv_to_screen(0.25, 0.25, tx, ty, 16, 16, 4.0)
    st.uv_click_select(data, sx + 2, sy - 2, tx, ty, 16, 16)
    assert st.uv_selection == [0]
    st.uv_click_select(data, *ed.uv_to_screen(0.75, 0.25, tx, ty, 16, 16,
                                              4.0), tx, ty, 16, 16,
                       additive=True)
    assert sorted(st.uv_selection) == [0, 1]
    st.uv_box_select(data, (0, 0), (64, 64), tx, ty, 16, 16)
    assert sorted(st.uv_selection) == [0, 1, 2, 3]


def test_uv_move_drag():
    data = quad_uv_data()
    st = ed.TextureEditorState()
    st.zoom = 4.0
    st.uv_selection = [0, 1, 2, 3]
    st.uv_begin_move(data, 100.0, 100.0)
    st.uv_update_move(data, 100.0 + 4.0 * 16 * 0.125, 100.0, 16, 16)
    st.uv_end_move()
    assert st.uv_undo_pending == "Move UVs"
    np.testing.assert_allclose(data.vertices[0], [0.375, 0.25], atol=1e-6)


def test_uv_handle_scale():
    data = quad_uv_data()
    st = ed.TextureEditorState()
    st.zoom = 4.0
    st.uv_selection = [0, 1, 2, 3]
    bounds = ed.calc_uv_selection_bounds(data, st.uv_selection)
    assert bounds == (0.25, 0.25, 0.75, 0.75)
    st.uv_begin_handle_drag(data, ed.ResizeEdge.RIGHT)
    assert st.uv_scale_anchor == (0.25, 0.5)
    # drag right edge from u=0.75 to u=1.25 -> width doubles
    st.uv_update_handle_drag(data, (1.25, 0.5))
    b2 = ed.calc_uv_selection_bounds(data, st.uv_selection)
    np.testing.assert_allclose(b2, (0.25, 0.25, 1.25, 0.75), atol=1e-6)
    st.uv_end_handle_drag()
    assert st.uv_undo_pending == "Scale UVs"


def test_uv_handle_hit_test():
    data = quad_uv_data()
    tx, ty = 0.0, 0.0
    sel = [0, 1, 2, 3]
    # top-left handle sits at (min_u, max_v) in screen space
    hx, hy = ed.uv_to_screen(0.25, 0.75, tx, ty, 64, 64, 4.0)
    h = ed.find_uv_handle_at(data, sel, hx, hy, tx, ty, 64, 64, 4.0)
    assert h is ed.ResizeEdge.TOP_LEFT
    assert ed.find_uv_handle_at(data, [], hx, hy, tx, ty, 64, 64, 4.0) is None


def test_uv_operations():
    data = quad_uv_data()
    sel = [0, 1, 2, 3]
    ed.apply_uv_operation(data, sel, ed.UvOperation.FLIP_H)
    np.testing.assert_allclose(data.vertices[0], [0.75, 0.25], atol=1e-6)
    ed.apply_uv_operation(data, sel, ed.UvOperation.ROTATE_90)
    b = ed.calc_uv_selection_bounds(data, sel)
    np.testing.assert_allclose(b, (0.25, 0.25, 0.75, 0.75), atol=1e-6)
    ed.apply_uv_translate(data, sel, 0.4, 0.0)
    ed.apply_uv_operation(data, sel, ed.UvOperation.RESET)
    b = ed.calc_uv_selection_bounds(data, sel)
    assert abs((b[0] + b[2]) / 2 - 0.5) < 1e-6


# --- palette panel + screen composition -----------------------------------

def test_set_palette_color_undo():
    tex = make_tex()
    st = ed.TextureEditorState()
    old = tex.palette[1]
    st.set_palette_color(tex, 1, 31, 0, 0)
    assert tex.palette[1] == ed.pack15(31, 0, 0)
    assert st.undo(tex)
    assert tex.palette[1] == old


def test_apply_generated_palette():
    tex = make_tex(ncol=16)
    st = ed.TextureEditorState()
    st.apply_generated_palette(tex)
    assert tex.palette[0] == 0
    assert len([c for c in tex.palette[1:16] if c != 0]) == 15
    assert st.dirty


def test_layout_and_routing():
    lay = ed.layout_screen(0, 0, 320, 240)
    assert ed.route_click(lay, 5, 5) == "tabs"
    assert ed.route_click(lay, 10, 100) == "tools"
    assert ed.route_click(lay, 160, 120) == "canvas"
    assert ed.route_click(lay, 315, 120) == "palette"
    assert ed.route_click(lay, -5, -5) == "none"


def test_draw_texture_editor_composes():
    tex = make_tex()
    st = ed.TextureEditorState()
    ctx = UiContext()
    ctx.begin_frame(0, 0, False)
    lay = ed.draw_texture_editor(ctx, Rect(0, 0, 320, 240), tex, st,
                                 uv_data=quad_uv_data(), frame=3)
    assert lay.canvas[2] > 0
    assert len(ctx.commands) > 50, "texture pixels + panels queued"


def test_draw_uv_mode_overlay():
    tex = make_tex()
    st = ed.TextureEditorState()
    st.mode = ed.TextureEditorMode.UV
    st.uv_selection = [0, 1]
    ctx = UiContext()
    ctx.begin_frame(0, 0, False)
    n0 = 0
    ed.draw_texture_canvas(ctx, Rect(0, 0, 200, 200), tex, st,
                           uv_data=quad_uv_data())
    lines = [c for c in ctx.commands if c[0] == "line"]
    assert len(lines) > 6, "UV wireframe drawn"


def test_palette_panel_click_selects_slot():
    tex = make_tex()
    st = ed.TextureEditorState()
    ctx = UiContext()
    r = Rect(0, 0, 120, 240)
    cell = (r.w - 8) / 4.0
    # click the second slot (index 1)
    ctx.begin_frame(4 + cell + 2, 6, True)
    ed.draw_palette_panel(ctx, r, tex, st)
    assert st.primary_index == 1


def test_marching_ants_animate():
    tex = make_tex()
    st = ed.TextureEditorState()
    st.selection = Selection.from_corners(1, 1, 5, 5)
    counts = []
    for frame in (0, 4):
        ctx = UiContext()
        ctx.begin_frame(0, 0, False)
        ed.draw_texture_canvas(ctx, Rect(0, 0, 200, 200), tex, st,
                               frame=frame)
        counts.append(len([c for c in ctx.commands if c[0] == "line"]))
    assert all(c > 0 for c in counts)

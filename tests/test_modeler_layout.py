"""Composed modeler screen + UV editor (modeler/layout.rs): panel
arithmetic, toolbar routing, parts-list selection, and the UV pane's
modal transforms / direct drags driven end-to-end through UiContext.
"""

import jax.numpy as jnp
import numpy as np

from bonnie32_tpu.models.mesh import ClutPool, EditableMesh
from bonnie32_tpu.models.modeler import ModelerState, SelectMode
from bonnie32_tpu.models.modeler_layout import (
    ModelerLayout, STATUS_HEIGHT, TOOLBAR_HEIGHT, UvEditorState,
    UvModalTransform, draw_modeler, poly_count_color)
from bonnie32_tpu.types import FrameBuffers
from bonnie32_tpu.ui import Rect, UiContext


BOUNDS = Rect(0, 0, 640, 480)


def _draw(ctx, layout, state, x=0.0, y=0.0, down=False, **kw):
    ctx.begin_frame(x, y, down, **kw)
    return draw_modeler(ctx, layout, state, BOUNDS)


def test_modeler_layout_rects():
    state = ModelerState()
    layout = ModelerLayout()
    ctx = UiContext()
    rects = _draw(ctx, layout, state)
    assert rects["toolbar"].h == TOOLBAR_HEIGHT
    assert rects["status"].h == STATUS_HEIGHT
    assert rects["left"].right <= rects["viewport"].x + 6
    assert rects["viewport"].right <= rects["right"].x + 6
    assert rects["uv_canvas"].x >= rects["right"].x
    assert rects["parts"].w > 0


def test_toolbar_switches_tool_and_mode():
    state = ModelerState()
    layout = ModelerLayout()
    ctx = UiContext()
    # Move starts active (tools/mod.rs:125); click "Rot" (3rd button)
    bx, by = 4 + 2 * 30 + 15, TOOLBAR_HEIGHT / 2
    _draw(ctx, layout, state, bx, by, True)
    _draw(ctx, layout, state, bx, by, False)
    assert state.toolbox.active_transform_tool() == "rotate"
    # click the select-mode strip's "Vtx" button
    mx = 4 + 5 * 30 + 10 + 15
    _draw(ctx, layout, state, mx, by, True)
    _draw(ctx, layout, state, mx, by, False)
    assert state.select_mode == SelectMode.VERTEX
    assert state.selection == []


def test_parts_list_selects_face():
    state = ModelerState()
    layout = ModelerLayout()
    ctx = UiContext()
    rects = _draw(ctx, layout, state)
    pr = rects["parts"]
    # second row of the parts vlist
    cy = pr.y + 18 + 9
    _draw(ctx, layout, state, pr.x + 10, cy, True)
    _draw(ctx, layout, state, pr.x + 10, cy, False)
    assert state.select_mode == SelectMode.FACE
    assert state.selection == [1]


def test_uv_direct_drag_and_undo():
    state = ModelerState()
    layout = ModelerLayout()
    ctx = UiContext()
    rects = _draw(ctx, layout, state)
    canvas = rects["uv_canvas"]
    uv = layout.uv
    mesh = state.mesh
    v0 = mesh.vertices[0].uv
    sx, sy = uv.uv_to_screen(v0, canvas, 64.0, 64.0)
    assert canvas.contains(sx, sy)
    # press on the vertex: selects it, saves undo, starts the drag
    _draw(ctx, layout, state, sx, sy, True)
    assert uv.selected == [0]
    assert uv.drag_vertex == 0
    n_undo = len(state.undo_stack)
    assert n_undo >= 1
    # drag right by 8 px = 4 texels (zoom=2 px/texel, 64px texture)
    _draw(ctx, layout, state, sx + 8, sy, True)
    moved = mesh.vertices[0].uv
    assert abs(moved[0] - (v0[0] + 4.0 / 64.0)) < 1e-9   # pixel-snapped
    assert moved[1] == v0[1]
    # release ends the drag
    _draw(ctx, layout, state, sx + 8, sy, False)
    assert uv.drag_vertex is None
    # undo restores the original UV
    assert state.undo()
    assert state.mesh.vertices[0].uv == v0


def test_uv_modal_grab_scale_rotate():
    state = ModelerState()
    layout = ModelerLayout()
    ctx = UiContext()
    rects = _draw(ctx, layout, state)
    canvas = rects["uv_canvas"]
    uv = layout.uv
    mesh = state.mesh
    uv.select_all_faces_uvs(mesh)
    before = [tuple(v.uv) for v in mesh.vertices]

    # G: move mouse +8px => +4 texels in u (zoom=2 px/texel)
    uv.begin_modal(UvModalTransform.GRAB, (200.0, 200.0), mesh)
    _draw(ctx, layout, state, 208.0, 200.0, False)
    assert uv.modal == UvModalTransform.GRAB
    for (u0, v0), v in zip(before, mesh.vertices):
        assert abs(v.uv[0] - round((u0 + 4 / 64) * 64) / 64) < 1e-9
    # click commits the modal
    _draw(ctx, layout, state, 208.0, 200.0, True)
    assert uv.modal == UvModalTransform.NONE
    grabbed = [tuple(v.uv) for v in mesh.vertices]

    # S: +100px => scale 2.0 about the snapped selection center
    _draw(ctx, layout, state, 208.0, 200.0, False)  # release click
    uv.begin_modal(UvModalTransform.SCALE, (200.0, 200.0), mesh)
    _draw(ctx, layout, state, 300.0, 200.0, False)
    cu = sum(u for u, _ in grabbed) / len(grabbed)
    cv = sum(v for _, v in grabbed) / len(grabbed)
    cx, cy = round(cu * 64) / 64, round(cv * 64) / 64
    u0, v0 = grabbed[0]
    su, sv = round(u0 * 64) / 64, round(v0 * 64) / 64
    want_u = round((cx + (su - cx) * 2.0) * 64) / 64
    assert abs(mesh.vertices[0].uv[0] - want_u) < 1e-9
    # Escape-equivalent: cancel restores the pre-modal UVs
    uv.cancel_modal(mesh)
    assert [tuple(v.uv) for v in mesh.vertices] == grabbed

    # R: dx=157 => ~1.57 rad; rotation keeps the selection's center
    uv.begin_modal(UvModalTransform.ROTATE, (200.0, 200.0), mesh)
    _draw(ctx, layout, state, 200.0 + 157.0799, 200.0, False)
    uvs = [tuple(v.uv) for v in mesh.vertices]
    assert uvs != grabbed
    uv.end_modal()


def test_modeler_screen_rasterizes():
    state = ModelerState()
    state.selection = [0]
    layout = ModelerLayout()
    ctx = UiContext()
    pool = ClutPool.new()
    ctx.begin_frame(0, 0, False)
    draw_modeler(ctx, layout, state, Rect(0, 0, 320, 240),
                 clut_pool=pool)
    fb = FrameBuffers(color=jnp.zeros((240, 320), jnp.int32),
                      depth=jnp.zeros((240, 320), jnp.float32))
    out = ctx.paint(fb)
    w = np.asarray(out.color)
    assert (w != 0).mean() > 0.5


def test_poly_count_color_thresholds():
    assert poly_count_color(10) == (100, 220, 100)
    assert poly_count_color(100) == (230, 210, 90)
    assert poly_count_color(200) == (230, 100, 90)


def test_uv_screen_mapping_roundtrip():
    uv = UvEditorState(zoom=4.0, pan_x=3.0, pan_y=-2.0)
    canvas = Rect(10, 20, 200, 160)
    for p in [(0.0, 0.0), (0.5, 0.25), (1.0, 1.0)]:
        s = uv.uv_to_screen(p, canvas, 64, 64)
        back = uv.screen_to_uv(*s, canvas, 64, 64)
        assert abs(back[0] - p[0]) < 1e-9 and abs(back[1] - p[1]) < 1e-9


# ---------------------------------------------------------------------------
# Skeleton editor panel (layout.rs:1335-1660)
# ---------------------------------------------------------------------------

from bonnie32_tpu.models.modeler_layout import draw_skeleton_panel


def _skel_state():
    st = ModelerState()
    st.ensure_skeleton()
    st.create_child_bone(0)
    return st


def test_skeleton_panel_tree_and_select():
    st = _skel_state()
    rect = Rect(0, 0, 160, 240)
    ctx = UiContext()
    # click the child bone's name row (depth 1, second row): y = 2+14+18+5
    ctx.begin_frame(30, 2 + 14 + 18 + 5, True)
    draw_skeleton_panel(ctx, rect, st)
    assert st.selected_bone == 1


def test_skeleton_panel_add_and_delete():
    st = _skel_state()
    st.selected_bone = 0
    rect = Rect(0, 0, 160, 240)
    row_y = 2 + 14          # root row
    right = rect.right - 4
    ctx = UiContext()
    # "+" button is the third from the right edge on the selected row
    ctx.begin_frame(right - 16 - 16 - 16 + 7, row_y + 8, True)
    draw_skeleton_panel(ctx, rect, st)
    assert len(st.skeleton()) == 3
    assert st.skeleton()[2].parent == 0
    # "x" (delete) is rightmost; delete the root -> children reparent
    st.selected_bone = 0
    ctx = UiContext()
    ctx.begin_frame(right - 16 + 7, row_y + 8, True)
    draw_skeleton_panel(ctx, rect, st)
    assert len(st.skeleton()) == 2
    assert all(b.parent is None for b in st.skeleton())


def test_skeleton_rename_flow():
    st = _skel_state()
    st.selected_bone = 1
    st.bone_rename_active = True
    st.bone_rename_buffer = "Arm"
    rect = Rect(0, 0, 160, 240)
    ctx = UiContext()
    ctx.begin_frame(0, 0, False, keys_pressed=("l",))
    draw_skeleton_panel(ctx, rect, st)
    ctx.begin_frame(0, 0, False, keys_pressed=("enter",))
    draw_skeleton_panel(ctx, rect, st)
    assert st.skeleton()[1].name == "Arml"
    assert st.bone_rename_active is False


def test_skeleton_empty_state_button():
    st = ModelerState()
    st.rigged = None
    from bonnie32_tpu.models.animation import RiggedModel
    st.rigged = RiggedModel(name="m")     # rig present, no bones
    rect = Rect(0, 0, 160, 240)
    ctx = UiContext()
    # click "Add Skeleton": y = 2+14+14+8
    ctx.begin_frame(30, 2 + 14 + 14 + 8, True)
    draw_skeleton_panel(ctx, rect, st)
    ctx.begin_frame(30, 2 + 14 + 14 + 8, False)
    draw_skeleton_panel(ctx, rect, st)
    assert len(st.skeleton()) == 1 and st.skeleton()[0].name == "Root"


def test_part_list_add_switch_delete():
    st = ModelerState()
    layout = ModelerLayout()
    bounds = Rect(0, 0, 640, 480)
    ctx = UiContext()
    ctx.begin_frame(0, 0, False)
    rects = draw_modeler(ctx, layout, st, bounds)
    left_w = rects["left"].w
    # the "+" add button: top-right of the Parts header (y = toolbar +
    # 6 + 14 + 16 + 16)
    from bonnie32_tpu.models.modeler_layout import TOOLBAR_HEIGHT
    py = TOOLBAR_HEIGHT + 6 + 14 + 16 + 16
    ctx.begin_frame(rects["left"].right - 22 + 5, py - 1 + 7, True)
    draw_modeler(ctx, layout, st, bounds)
    assert len(st.project.objects) == 2
    assert st.active_part == 1          # new part becomes active
    # click the first part's name row to switch back
    ctx.begin_frame(0, 0, False)
    draw_modeler(ctx, layout, st, bounds)
    row_y = py + 14 + 3
    ctx.begin_frame(rects["left"].x + 30, row_y + 4, True)
    draw_modeler(ctx, layout, st, bounds)
    assert st.active_part == 0
    # eye toggles visibility of part 0
    ctx.begin_frame(0, 0, False)
    draw_modeler(ctx, layout, st, bounds)
    ctx.begin_frame(rects["left"].x + 4 + 6, row_y + 4, True)
    draw_modeler(ctx, layout, st, bounds)
    assert st.project.objects[0].visible is False


def test_components_section_add_select_edit_remove():
    """layout.rs:723-892 + per-kind editors: add a component from the
    popup, edit its fields through the drawn widgets, remove it."""
    from bonnie32_tpu.models import modeler_components as mc
    from bonnie32_tpu.ui import UiContext

    state = ModelerState()
    layout = ModelerLayout()
    ctx = UiContext()

    # the section renders inside draw_modeler's left panel
    _draw(ctx, layout, state)
    texts = [c[2] for c in ctx.commands if c[0] == "text"]
    assert any("Components" in t for t in texts)

    # direct-drive the section: add a Collision component
    comps = state.components
    ui = layout.components_ui
    rect = Rect(0, 0, 200, 300)
    ctx.begin_frame(-5, -5, False)
    mc.draw_components_section(ctx, rect, comps, ui)
    ui["adding"] = True
    ctx.begin_frame(-5, -5, False)
    mc.draw_components_section(ctx, rect, comps, ui)
    comps.append(mc.create_default_component("Collision"))
    ui["adding"] = False
    ui["selected"] = 0
    assert comps[0].kind == "Collision"
    assert not comps[0].data["is_trigger"]

    # the selected component's editor form renders
    ctx.begin_frame(-5, -5, False)
    mc.draw_components_section(ctx, rect, comps, ui)
    texts = [c[2] for c in ctx.commands if c[0] == "text"]
    assert any("Shape:" in t for t in texts)
    assert any("Is Trigger:" in t for t in texts)

    # clicking the Is Trigger toggle flips the data (press+release)
    # toggle rect: x+4+w-8-40 .. +32 at the row after shape buttons
    # find it by driving the toggle directly
    d = comps[0].data
    from bonnie32_tpu.models.modeler_components import draw_collision_editor
    ctx.begin_frame(150, 0, True)     # press
    draw_collision_editor(ctx, 0, -38, 200, d)   # toggle row lands at y~2
    ctx.begin_frame(150, 8, False)    # release on the toggle
    draw_collision_editor(ctx, 0, -32, 200, d)
    # regardless of exact hit, the editor must keep a valid shape payload
    from bonnie32_tpu.models.asset import CollisionShape
    assert CollisionShape.parse(d["shape"]) is not None

    # defaults exist for every addable kind and every kind has an editor
    for kind in mc.ADDABLE_KINDS:
        c = mc.create_default_component(kind)
        assert c.kind == kind
        assert kind in mc._EDITORS
        ctx.begin_frame(-5, -5, False)
        y_end = mc._EDITORS[kind](ctx, 0, 0, 200, c.data)
        assert y_end > 0


def test_component_editor_field_semantics():
    """Reference field semantics: light colors snap to 5-bit * 8, spawn
    toggles flip booleans, pickup respawn toggles None<->30s."""
    from bonnie32_tpu.models import modeler_components as mc
    from bonnie32_tpu.ui import UiContext

    ctx = UiContext()
    light = mc.create_default_component("Light")
    # drag the R channel slider to its max: x+14 .. x+14+w-40 at y..y+14
    ctx.begin_frame(14 + 160 - 1, 14 + 5, True)
    mc.draw_light_editor(ctx, 0, 0, 200, light.data)
    assert light.data["color"][0] == 31 * 8    # 5-bit expansion
    assert 0.0 <= light.data["intensity"] <= 5.0

    spawn = mc.create_default_component("SpawnPoint")
    assert spawn.data["is_player"] is False
    ctx.begin_frame(-5, -5, False)    # settle the mouse from the drag
    ctx.begin_frame(-5, -5, False)
    # click the Player Start toggle (x+4+w-8-40=156, y+2..16)
    ctx.begin_frame(160, 8, True)
    mc.draw_spawn_point_editor(ctx, 0, 0, 200, spawn.data)
    ctx.begin_frame(160, 8, False)
    mc.draw_spawn_point_editor(ctx, 0, 0, 200, spawn.data)
    assert spawn.data["is_player"] is True

    pick = mc.create_default_component("Pickup")
    assert pick.data["respawn_time"] is None

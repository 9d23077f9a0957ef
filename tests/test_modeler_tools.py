"""Modeler tool box (modeler/tools/mod.rs — mirrors its tests)."""

from bonnie32_tpu.models.modeler_tools import (Axis, ModelerToolBox,
                                               ExtrudeTool, MoveTool)
from bonnie32_tpu.ui.tool import DragAcceptResult, InputState, ModifierKeys


def test_move_active_by_default():
    mtb = ModelerToolBox()
    assert mtb.move.active()
    assert not mtb.rotate.active() and not mtb.scale.active()
    assert mtb.active_transform_tool() == "move"
    assert mtb.tool_box.active_tool() == "move"


def test_exclusive_transform_group():
    mtb = ModelerToolBox()
    mtb.activate("rotate")
    assert not mtb.move.active() and mtb.rotate.active()
    mtb.activate("scale")
    assert not mtb.rotate.active() and mtb.scale.active()
    assert mtb.active_transform_tool() == "scale"


def test_extrude_suppresses_transforms_then_restores():
    mtb = ModelerToolBox()
    mtb.activate("extrude")
    assert mtb.extrude.active()
    assert not mtb.move.active()
    assert mtb.tool_box.is_tool_suppressed("move")
    mtb.deactivate("extrude")
    assert mtb.move.active()                # restored
    assert mtb.active_transform_tool() == "move"


def test_toggle_cannot_turn_off_transform_tool():
    # tools/mod.rs:149-154 — re-pressing G keeps Move active
    mtb = ModelerToolBox()
    mtb.toggle("move")
    assert mtb.move.active()
    # but a non-transform tool toggles freely
    mtb.toggle("select")
    assert mtb.select.active()
    mtb.toggle("select")
    assert not mtb.select.active()


def test_move_drag_needs_hovered_axis():
    t = MoveTool()
    t.do_activate()
    press = InputState(left_pressed=True)
    assert t.accept_mouse_drag(press) is DragAcceptResult.NONE
    t.set_hovered_axis(Axis.X)
    assert t.accept_mouse_drag(press) is DragAcceptResult.STARTED
    assert t.is_dragging() if hasattr(t, "is_dragging") else t.dragging
    assert t.drag_axis is Axis.X
    # mid-drag axis constraint swap; hover is frozen while dragging
    t.set_axis_constraint(Axis.Z)
    assert t.drag_axis is Axis.Z
    t.set_hovered_axis(Axis.Y)
    assert t.hovered_axis is Axis.X
    assert t.cancel() and not t.dragging and t.drag_axis is None


def test_select_tool_alt_bypasses_box_select():
    mtb = ModelerToolBox()
    mtb.activate("select")
    alt_drag = InputState(left_pressed=True,
                          modifiers=ModifierKeys(alt=True))
    assert mtb.select.accept_mouse_drag(alt_drag) is DragAcceptResult.NONE
    plain = InputState(left_pressed=True)
    assert mtb.select.accept_mouse_drag(plain) is DragAcceptResult.STARTED
    assert mtb.select.box_selecting


def test_extrude_single_gesture_and_deactivate_clears():
    t = ExtrudeTool()
    t.do_activate()
    press = InputState(left_pressed=True)
    assert t.accept_mouse_drag(press) is DragAcceptResult.STARTED
    assert t.accept_mouse_drag(press) is DragAcceptResult.NONE  # busy
    t.deactivate()
    assert not t.extruding


def test_rotate_records_initial_angle():
    mtb = ModelerToolBox()
    mtb.activate("rotate")
    mtb.rotate.start_drag(Axis.Y, initial_angle=1.25)
    assert mtb.rotate.drag_axis is Axis.Y
    assert mtb.rotate.initial_angle == 1.25
    assert Axis.Y.unit_vector == (0.0, 1.0, 0.0)

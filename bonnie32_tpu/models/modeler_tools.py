"""Modeler tool set: select/move/rotate/scale/extrude over the ToolBox.

Port of `/root/reference/src/modeler/tools/` — the five concrete tools
(each a `ToolController` with its gizmo drag state) and
`ModelerToolBox` (tools/mod.rs:112): move/rotate/scale form an
exclusive group, extrude suppresses all three while active, and Move is
the default active tool.  `Axis` mirrors ui/drag_tracker.rs:165.
"""

import enum
from typing import Optional, Tuple

from ..ui.tool import (DragAcceptResult, InputState, Tool, ToolBox,
                       ToolController, ToolRegistry)


class Axis(enum.Enum):
    """ui/drag_tracker.rs:165 — gizmo axis with its unit vector."""

    X = 0
    Y = 1
    Z = 2

    @property
    def unit_vector(self) -> Tuple[float, float, float]:
        return {Axis.X: (1.0, 0.0, 0.0),
                Axis.Y: (0.0, 1.0, 0.0),
                Axis.Z: (0.0, 0.0, 1.0)}[self]


class SelectTool(ToolController):
    """tools/select_tool.rs — box-select on plain left drag."""

    def __init__(self):
        super().__init__("select", "Select")
        self.box_selecting = False

    def do_deactivate(self) -> bool:
        self.box_selecting = False
        return super().do_deactivate()

    def accept_mouse_drag(self, inp: InputState) -> DragAcceptResult:
        if inp.left_pressed and not inp.modifiers.alt:
            self.box_selecting = True
            return DragAcceptResult.STARTED
        return DragAcceptResult.NONE

    def cancel(self) -> bool:
        if self.box_selecting:
            self.box_selecting = False
            return True
        return False


class _GizmoDragTool(ToolController):
    """Shared move/rotate/scale shape: hover axis, drag axis, axis
    constraint swapping mid-drag (tools/move_tool.rs)."""

    def __init__(self, tool_id: str, label: str):
        super().__init__(tool_id, label)
        self.hovered_axis: Optional[Axis] = None
        self.dragging = False
        self.drag_axis: Optional[Axis] = None

    def set_hovered_axis(self, axis: Optional[Axis]) -> None:
        if not self.dragging:
            self.hovered_axis = axis

    def start_drag(self, axis: Optional[Axis]) -> None:
        self.dragging = True
        self.drag_axis = axis

    def end_drag(self) -> None:
        self.dragging = False
        self.drag_axis = None

    def set_axis_constraint(self, axis: Optional[Axis]) -> None:
        if self.dragging:
            self.drag_axis = axis

    def do_deactivate(self) -> bool:
        self.hovered_axis = None
        self.dragging = False
        self.drag_axis = None
        return super().do_deactivate()

    def accept_mouse_drag(self, inp: InputState) -> DragAcceptResult:
        if inp.left_pressed and self.hovered_axis is not None:
            self.start_drag(self.hovered_axis)
            return DragAcceptResult.STARTED
        return DragAcceptResult.NONE

    def cancel(self) -> bool:
        if self.dragging:
            self.end_drag()
            return True
        return False


class MoveTool(_GizmoDragTool):
    def __init__(self):
        super().__init__("move", "Move (G)")


class RotateTool(_GizmoDragTool):
    """tools/rotate_tool.rs — also records the grab angle."""

    def __init__(self):
        super().__init__("rotate", "Rotate (R)")
        self.initial_angle = 0.0

    def start_drag(self, axis: Optional[Axis],
                   initial_angle: float = 0.0) -> None:
        super().start_drag(axis)
        self.initial_angle = initial_angle


class ScaleTool(_GizmoDragTool):
    def __init__(self):
        super().__init__("scale", "Scale (T)")


class ExtrudeTool(ToolController):
    """tools/extrude_tool.rs — one extrusion gesture at a time."""

    def __init__(self):
        super().__init__("extrude", "Extrude (E)")
        self.extruding = False

    def do_deactivate(self) -> bool:
        self.extruding = False
        return super().do_deactivate()

    def accept_mouse_drag(self, inp: InputState) -> DragAcceptResult:
        if inp.left_pressed and self.active() and not self.extruding:
            self.extruding = True
            return DragAcceptResult.STARTED
        return DragAcceptResult.NONE

    def cancel(self) -> bool:
        if self.extruding:
            self.extruding = False
            return True
        return False


TRANSFORM_TOOLS = ("move", "rotate", "scale")


class ModelerToolBox:
    """tools/mod.rs:112 — the modeler's configured ToolBox: transform
    tools are mutually exclusive, extrude suppresses them, Move starts
    active."""

    def __init__(self):
        self.tool_box = ToolBox()
        self.tool_box.add_exclusive_group(list(TRANSFORM_TOOLS))
        self.tool_box.suppress_while_active("extrude",
                                            list(TRANSFORM_TOOLS))
        self.select = SelectTool()
        self.move = MoveTool()
        self.rotate = RotateTool()
        self.scale = ScaleTool()
        self.extrude = ExtrudeTool()
        self.tools = ToolRegistry([self.select, self.move, self.rotate,
                                   self.scale, self.extrude])
        # Move active by default (tools/mod.rs:125-127)
        self.move.do_activate()
        self.tool_box.modal_tool_stack.append("move")

    def active_transform_tool(self) -> Optional[str]:
        for tid in TRANSFORM_TOOLS:
            if self.tools.get_tool(tid).active():
                return tid
        return None

    def activate(self, tool_id: str) -> None:
        self.tool_box.activate_tool(tool_id, self.tools)

    def deactivate(self, tool_id: str) -> None:
        self.tool_box.deactivate_tool(tool_id, self.tools)

    def toggle(self, tool_id: str) -> None:
        """A transform tool can't be toggled off by its own key —
        re-pressing G/R/T keeps it active (tools/mod.rs:149-154)."""
        if tool_id in TRANSFORM_TOOLS and self.is_active(tool_id):
            return
        self.tool_box.toggle_tool(tool_id, self.tools)

    def is_active(self, tool_id: str) -> bool:
        return self.tool_box.is_tool_active(tool_id)

    def deactivate_all(self) -> None:
        self.tool_box.deactivate_all(self.tools)

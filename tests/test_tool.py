"""Tool lifecycle + ToolBox exclusivity/suppression (ui/tool.rs,
tool_box.rs, tool_controller.rs — mirrors the reference's own tests)."""

from bonnie32_tpu.ui.tool import (DragAcceptResult, InputState,
                                  ModifierKeys, Tool, ToolBox,
                                  ToolController, ToolRegistry)


class CountingTool(Tool):
    def __init__(self, tool_id):
        super().__init__(tool_id)
        self.activate_count = 0
        self.deactivate_count = 0

    def do_activate(self):
        self.activate_count += 1
        return super().do_activate()

    def do_deactivate(self):
        self.deactivate_count += 1
        return super().do_deactivate()


def test_activation_lifecycle():
    # tool.rs test_activation_lifecycle
    t = CountingTool("test")
    assert not t.active()
    assert t.activate() and t.active() and t.activate_count == 1
    assert not t.activate()            # already active: no-op
    assert t.activate_count == 1
    assert t.deactivate() and not t.active() and t.deactivate_count == 1
    assert not t.deactivate()
    assert t.deactivate_count == 1


def test_input_state_helpers():
    inp = InputState(mouse_x=100.0, mouse_y=200.0, mouse_dx=5.0,
                     mouse_dy=-3.0, modifiers=ModifierKeys(shift=True))
    assert inp.mouse_pos() == (100.0, 200.0)
    assert inp.mouse_delta() == (5.0, -3.0)
    assert inp.has_modifier()
    assert not InputState().has_modifier()


def test_tool_controller_defaults_decline():
    class T(ToolController):
        pass

    t = T("probe")
    inp = InputState()
    assert not t.mouse_click(inp) and not t.mouse_double_click(inp)
    assert t.accept_mouse_drag(inp) is DragAcceptResult.NONE
    assert not t.cancel()


def _box(*ids):
    reg = ToolRegistry([CountingTool(i) for i in ids])
    return ToolBox(), reg


def test_exclusive_group_swaps_active_tool():
    box, reg = _box("select", "draw", "erase")
    box.add_exclusive_group(["select", "draw", "erase"])
    box.activate_tool("select", reg)
    assert box.active_tool() == "select"
    box.activate_tool("draw", reg)
    assert box.active_tool() == "draw"
    assert not reg.get_tool("select").active()
    assert reg.get_tool("draw").active()
    assert box.modal_tool_stack == ["draw"]


def test_toggle_and_disable():
    box, reg = _box("select")
    box.toggle_tool("select", reg)
    assert box.is_tool_active("select")
    box.toggle_tool("select", reg)
    assert not box.is_tool_active("select")
    box.disable()
    box.activate_tool("select", reg)
    assert not box.is_tool_active("select")     # disabled box ignores
    box.enable()
    box.activate_tool("select", reg)
    assert box.is_tool_active("select")


def test_suppression_restores_on_deactivate():
    # tool_box.rs: suppress_while_active → the suppressed tool is
    # deactivated while the primary is active and reactivated (back on
    # the stack) when the primary deactivates
    box, reg = _box("camera", "gizmo")
    box.suppress_while_active("camera", ["gizmo"])
    box.activate_tool("gizmo", reg)
    assert reg.get_tool("gizmo").active()

    box.activate_tool("camera", reg)
    assert not reg.get_tool("gizmo").active()
    assert box.is_tool_suppressed("gizmo")
    assert box.modal_tool_stack == ["camera"]

    box.deactivate_tool("camera", reg)
    assert reg.get_tool("gizmo").active()
    assert not box.is_tool_suppressed("gizmo")
    assert box.modal_tool_stack == ["gizmo"]


def test_suppression_only_restores_inactive_suppressed():
    # a tool that was never active isn't resurrected by its suppressor
    box, reg = _box("camera", "gizmo")
    box.suppress_while_active("camera", ["gizmo"])
    box.activate_tool("camera", reg)
    box.deactivate_tool("camera", reg)
    assert not reg.get_tool("gizmo").active()
    assert box.modal_tool_stack == []


def test_deactivate_all_clears_stack():
    # tool_box.rs test_deactivate_all
    box, reg = _box("move", "select")
    box.activate_tool("move", reg)
    box.activate_tool("select", reg)
    box.deactivate_all(reg)
    assert box.modal_tool_stack == []
    assert not any(reg.get_tool(i).active() for i in ("move", "select"))


def test_deactivate_all_restores_suppressed_midway():
    # deactivate_all snapshots the stack, so a tool restored by its
    # suppressor's deactivation survives (tool_box.rs:148-154 semantics)
    box, reg = _box("a", "b", "c")
    box.suppress_while_active("a", ["c"])
    box.activate_tool("c", reg)
    box.activate_tool("a", reg)
    box.activate_tool("b", reg)
    box.deactivate_all(reg)
    assert box.modal_tool_stack == ["c"]
    assert reg.get_tool("c").active()
    assert not any(reg.get_tool(i).active() for i in ("a", "b"))
    assert not box._suppressed_tools


def test_activate_unknown_or_active_is_noop():
    box, reg = _box("select")
    box.activate_tool("missing", reg)
    assert box.modal_tool_stack == []
    box.activate_tool("select", reg)
    box.activate_tool("select", reg)            # second: no double push
    assert box.modal_tool_stack == ["select"]
    assert reg.get_tool("select").activate_count == 1

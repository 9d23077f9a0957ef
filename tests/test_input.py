"""Input mapping: stick merge, deadzone, edge detection, controller type."""

import math

import numpy as np

from bonnie32_tpu.input import (Action, ButtonLabels, ControllerType,
                                InputState, VirtualGamepad, VirtualKeyboard,
                                apply_deadzone)


def test_deadzone():
    assert apply_deadzone(0.1, 0.0, 0.15) == (0.0, 0.0)
    x, y = apply_deadzone(1.0, 0.0, 0.15)
    assert abs(x - 1.0) < 1e-6 and y == 0.0
    # halfway through the live range rescales
    x, _ = apply_deadzone(0.575, 0.0, 0.15)
    assert abs(x - 0.5) < 1e-6


def test_left_stick_merge_and_normalize():
    kb = VirtualKeyboard()
    gp = VirtualGamepad()
    inp = InputState(kb, gp)
    kb.update({"w", "d"})
    x, y = inp.left_stick()
    # diagonal normalized (state.rs:44)
    assert abs(math.hypot(x, y) - 1.0) < 1e-6
    assert x > 0 and y > 0
    # larger gamepad magnitude wins (strictly larger, state.rs:39)
    gp.update(axes=dict(lx=-1.0, ly=0.0))
    kb.update(set())
    x, y = inp.left_stick()
    assert x < -0.9 and abs(y) < 1e-6
    kb.update({"w"})
    # smaller gamepad magnitude loses to keyboard
    gp.update(axes=dict(lx=-0.3, ly=0.0))
    x, y = inp.left_stick()
    assert y == 1.0 and x == 0.0


def test_action_down_and_pressed():
    kb = VirtualKeyboard()
    gp = VirtualGamepad()
    inp = InputState(kb, gp)
    kb.update({"space"})
    assert inp.action_down(Action.JUMP)
    assert inp.action_pressed(Action.JUMP)      # newly held
    kb.update({"space"})
    assert inp.action_down(Action.JUMP)
    assert not inp.action_pressed(Action.JUMP)  # still held, no edge
    kb.update(set())
    gp.update(buttons={"rb"})
    assert inp.action_down(Action.ATTACK)
    assert inp.action_pressed(Action.ATTACK)
    gp.update(buttons={"rb"})
    assert not inp.action_pressed(Action.ATTACK)
    # keyboard pressed-subset: GUARD not edge-detectable from keyboard
    kb.update({"l"})
    assert inp.action_down(Action.GUARD)
    assert not inp.action_pressed(Action.GUARD)


def test_controller_detection_and_labels():
    assert ControllerType.from_name("Sony DualSense") \
        == ControllerType.PLAYSTATION
    assert ControllerType.from_name("Nintendo Switch Pro Controller") \
        == ControllerType.NINTENDO
    assert ControllerType.from_name("XInput Gamepad") == ControllerType.XBOX
    assert ControllerType.from_name("Mystery Pad") == ControllerType.GENERIC
    assert ButtonLabels.for_type(ControllerType.PLAYSTATION).a == "Cross"
    assert ButtonLabels.for_type(ControllerType.XBOX).y == "Y"


def test_to_actions_bridge():
    kb = VirtualKeyboard()
    gp = VirtualGamepad()
    inp = InputState(kb, gp)
    kb.update({"w", "left_shift", "space"})
    gp.update(axes=dict(rx=0.8, ry=0.0))
    acts = inp.to_actions()
    assert float(acts.move_y) == 1.0
    assert bool(acts.sprint) and bool(acts.jump)
    assert float(acts.cam_x) > 0.7

    # drives the actual batched sim one step without error
    from bonnie32_tpu.game import state as st
    from bonnie32_tpu.game import step as gstep
    from bonnie32_tpu.game import collision as col
    from bonnie32_tpu.models.level import create_test_level
    level = create_test_level()
    grid = col.compile_collision(level)
    params = col.player_params(level)
    s = st.new_state(8)
    pos = (2.5 * 1024, 0.0, 2.5 * 1024)
    info = level.get_floor_info(pos)
    start_y = (info.floor_height if info is not None else 0.0) - 10.0
    s, _ = st.spawn_player(s, (pos[0], start_y, pos[2]),
                           level.player_settings)
    s2 = gstep.tick(s, grid, params, acts, 1.0 / 60.0)
    assert float(s2.time) > 0

# ---------------------------------------------------------------------------
# Controller debug screen (input/debug.rs)
# ---------------------------------------------------------------------------

def test_debug_action_labels_use_platform_buttons():
    from bonnie32_tpu.input.debug import build_action_labels
    from bonnie32_tpu.input.state import ButtonLabels, ControllerType

    ps = build_action_labels(ButtonLabels.for_type(
        ControllerType.PLAYSTATION))
    assert ps[0][1] == "Jump (Cross)"
    xb = build_action_labels(ButtonLabels.for_type(ControllerType.XBOX))
    assert xb[0][1] == "Jump (A)" and len(xb) == 16


def test_debug_screen_draws_and_slider_sets_deadzone():
    import numpy as np
    from bonnie32_tpu.input.debug import draw_controller_debug
    from bonnie32_tpu.input.state import InputState
    from bonnie32_tpu.ops import raster_ref
    from bonnie32_tpu.ui import Rect, UiContext

    inp = InputState()
    inp.gamepad.connected = True
    inp.gamepad.update(axes={"lx": 0.7, "ly": 0.2})

    ctx = UiContext()
    ctx.begin_frame(0, 0, down=False)
    draw_controller_debug(ctx, Rect(0, 0, 320, 240), inp)
    fb = ctx.paint(raster_ref.new_framebuffer(240, 320))
    img = np.asarray(fb.color)
    assert (img != img[0, 0]).any()

    # drag on the slider track sets the deadzone from the mouse x
    ctx.begin_frame(16 + 50, 38, down=True)   # mid-track
    draw_controller_debug(ctx, Rect(0, 0, 320, 240), inp)
    assert abs(inp.deadzone() - 0.25) < 0.05


def test_deadzone_accessor_clamped():
    from bonnie32_tpu.input.state import InputState

    inp = InputState()
    inp.set_deadzone(0.9)
    assert inp.deadzone() == 0.5
    inp.set_deadzone(-1.0)
    assert inp.deadzone() == 0.0

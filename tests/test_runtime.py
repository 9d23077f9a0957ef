"""Game runtime shell: fps limiter, freefly camera, play-mode state."""

import numpy as np

from bonnie32_tpu.game.runtime import (CameraMode, FpsLimit, FrameLimiter,
                                       FreeflyCamera, GameToolState)
from bonnie32_tpu.game import collision as col
from bonnie32_tpu.input import InputState, VirtualGamepad, VirtualKeyboard
from bonnie32_tpu.models.level import create_test_level


def test_fps_limit_cycle():
    assert FpsLimit.FPS30.frame_time() == 1.0 / 30.0
    assert FpsLimit.FPS60.frame_time() == 1.0 / 60.0
    assert FpsLimit.UNLOCKED.frame_time() is None
    assert FpsLimit.FPS30.next() == FpsLimit.FPS60
    assert FpsLimit.UNLOCKED.next() == FpsLimit.FPS30
    assert FpsLimit.FPS30.prev() == FpsLimit.UNLOCKED
    assert FpsLimit.FPS60.label == "60"


def test_frame_limiter_paces():
    t = [0.0]
    sleeps = []

    def clock():
        t[0] += 1e-5  # pretend reading the clock costs 10us (spin advances)
        return t[0]

    def sleep(s):
        sleeps.append(s)
        t[0] += s

    lim = FrameLimiter(FpsLimit.FPS60, sleep_fn=sleep, clock=clock)
    lim.begin_frame()
    t[0] += 0.005                      # frame took 5 ms
    dt = lim.end_frame()
    assert abs(dt - 1.0 / 60.0) < 0.003, dt
    assert sleeps and sleeps[0] > 0.005
    # unlocked: returns immediately
    lim = FrameLimiter(FpsLimit.UNLOCKED, sleep_fn=sleep, clock=clock)
    lim.begin_frame()
    t[0] += 0.001
    assert abs(lim.end_frame() - 0.001) < 1e-3


def test_freefly_camera():
    kb, gp = VirtualKeyboard(), VirtualGamepad()
    inp = InputState(kb, gp)
    cam = FreeflyCamera()
    # RMB drag looks around
    cam.update(inp, 1 / 60, mouse_delta=(100.0, 0.0), rmb_down=True)
    assert cam.yaw < 0
    # pitch clamps
    cam.update(inp, 1 / 60, mouse_delta=(0.0, 10000.0), rmb_down=True)
    assert cam.pitch == 1.5
    # fly up via Q
    cam2 = FreeflyCamera()
    kb.update({"q"})
    cam2.update(inp, 1.0)
    assert cam2.position[1] == 1500.0
    # stick forward moves along +z when yaw 0
    kb.update(set())
    gp.update(axes=dict(lx=0.0, ly=1.0))
    cam3 = FreeflyCamera()
    cam3.update(inp, 1.0)
    assert cam3.position[2] > 1000
    c = cam3.camera()
    assert np.asarray(c.position).shape == (3,)


def test_game_tool_state():
    level = create_test_level()
    grid = col.compile_collision(level)
    params = col.player_params(level)
    g = GameToolState(grid, params, capacity=8)
    # paused: tick does nothing
    kb, gp = VirtualKeyboard(), VirtualGamepad()
    inp = InputState(kb, gp)
    g.tick(inp)
    assert float(g.state.time) == 0.0
    # orbit camera before spawn
    cam = g.camera()
    assert np.linalg.norm(np.asarray(cam.position) - g.orbit_target) > 1000

    e = g.spawn_player((512.0, -10.0, 512.0))
    assert int(g.state.player) == e
    g.playing = True
    kb.update({"w"})
    g.tick(inp)
    assert float(g.state.time) > 0
    cam = g.camera()      # character camera now
    assert np.asarray(cam.basis).shape == (3, 3)

    # toggle into freefly seeds from the character camera
    g.toggle_camera_mode()
    assert g.camera_mode == CameraMode.FREEFLY
    before = g.freefly.position.copy()
    kb.update({"q", "w"})
    g.tick(inp)
    assert g.freefly.position[1] > before[1]  # flew up; no sim step
    g.toggle_camera_mode()
    assert g.camera_mode == CameraMode.CHARACTER
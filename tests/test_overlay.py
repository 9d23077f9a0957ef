"""Game debug overlay + options menu (renderer.rs:494-905): line
content, D-pad navigation with separator skipping, toggle application,
and rasterization into a framebuffer via the bitmap font."""

import numpy as np
import jax.numpy as jnp

from bonnie32_tpu.config import RasterSettings, ShadingMode
from bonnie32_tpu.game import overlay as ov
from bonnie32_tpu.game.runtime import CameraMode, FpsLimit, GameToolState
from bonnie32_tpu.input import InputState
from bonnie32_tpu.input.state import VirtualGamepad, VirtualKeyboard
from bonnie32_tpu.profiling import FrameTimings
from bonnie32_tpu.types import FrameBuffers
from bonnie32_tpu.ui import Rect, UiContext


def _game():
    return GameToolState(grid=None, params=None)


def _input():
    kb = VirtualKeyboard()
    gp = VirtualGamepad()
    inp = InputState(kb, gp)
    return inp, kb, gp


def test_overlay_lines_no_player():
    game = _game()
    inp, kb, gp = _input()
    lines = ov.overlay_lines(game, inp, fps=60.0)
    texts = [t for t, _ in lines]
    assert texts[0] == "FPS: 60"
    assert "No Player" in texts
    assert any(t.startswith("L Stick") for t in texts)


def test_overlay_lines_with_player_and_flags():
    import bonnie32_tpu.game.state as st
    from bonnie32_tpu.game.collision import player_params
    from bonnie32_tpu.models.level import Level
    game = _game()
    game.state, _ = st.spawn_player(game.state, (100.0, 50.0, 200.0),
                                    player_params(Level()))
    inp, kb, gp = _input()
    kb.update({"left_shift", "w"})   # dodge hold + forward => sprinting
    lines = ov.overlay_lines(game, inp, fps=40.0, floor_height=12.0)
    texts = [t for t, _ in lines]
    assert "Pos: 100, 50, 200" in texts
    assert any(t.startswith("Grounded") for t in texts)
    assert "Floor: 12" in texts
    assert "B: DOWN" in texts and "SPRINTING" in texts
    # fps 40 -> warn color on the FPS line
    assert lines[0][1] == ov.WARN


def test_menu_navigation_skips_separators():
    game = _game()
    inp, kb, gp = _input()
    game.debug_menu_selection = 1      # "Overlay"; next non-sep is 3
    gp.update(buttons={"dpad_down"})
    ov.menu_navigate(game, inp)
    assert ov.MENU_ITEMS[game.debug_menu_selection] == "Affine UV"
    gp.update(buttons=set()); gp.update(buttons={"dpad_up"})
    ov.menu_navigate(game, inp)
    assert ov.MENU_ITEMS[game.debug_menu_selection] == "Overlay"


def test_menu_toggles_settings():
    game = _game()
    inp, kb, gp = _input()
    game.debug_menu_selection = ov.MENU_ITEMS.index("RGB555")
    before = game.settings.use_rgb555
    gp.update(buttons={"a"})           # Jump = toggle (renderer.rs:729)
    ov.menu_apply(game, inp)
    assert game.settings.use_rgb555 != before

    game.debug_menu_selection = ov.MENU_ITEMS.index("Shading")
    gp.update(buttons=set()); gp.update(buttons={"a"})
    s0 = game.settings.shading
    ov.menu_apply(game, inp)
    assert game.settings.shading != s0

    game.debug_menu_selection = ov.MENU_ITEMS.index("FPS")
    gp.update(buttons=set()); gp.update(buttons={"a"})
    ov.menu_apply(game, inp)
    assert game.fps_limit == FpsLimit.UNLOCKED

    game.debug_menu_selection = ov.MENU_ITEMS.index("Camera")
    gp.update(buttons=set()); gp.update(buttons={"a"})
    ov.menu_apply(game, inp)
    assert game.camera_mode == CameraMode.FREEFLY

    game.debug_menu_selection = ov.MENU_ITEMS.index("Reset")
    gp.update(buttons=set()); gp.update(buttons={"a"})
    ov.menu_apply(game, inp)
    assert game.settings == RasterSettings.game()


def test_overlay_and_menu_rasterize():
    """Headless screenshot: both overlays write text pixels into the fb."""
    game = _game()
    game.show_debug_overlay = True
    inp, kb, gp = _input()
    ctx = UiContext()
    ctx.begin_frame(0, 0, False)
    rect = Rect(0, 0, 320, 240)
    t = FrameTimings()
    t.add("render", 0.010)
    t.add("input", 0.001)
    ov.draw_debug_overlay(ctx, game, rect, inp, fps=60.0, timings=t)
    ov.draw_debug_menu(ctx, game, rect, inp)
    fb = FrameBuffers(color=jnp.zeros((240, 320), jnp.int32),
                      depth=jnp.zeros((240, 320), jnp.float32))
    out = ctx.paint(fb)
    w = np.asarray(out.color)
    assert (w != 0).sum() > 2000            # both boxes drawn
    # overlay bg occupies the top-right corner, menu the top-left
    assert (w[10:40, 210:310] != 0).any()
    assert (w[10:40, 8:120] != 0).any()
    # green FPS text pixels in the overlay region
    green = ((w >> 8) & 0xFF) > 200
    assert green[6:20, 200:320].any()

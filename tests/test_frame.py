"""Application frame dispatch (main.rs:393-1597): tab switching, project
sync, and every tool's screen composing into one framebuffer."""

import numpy as np
import jax.numpy as jnp

from bonnie32_tpu.app import AppState, Tool
from bonnie32_tpu.audio.song import Note
from bonnie32_tpu.frame import TAB_H, draw_frame
from bonnie32_tpu.game.runtime import GameToolState
from bonnie32_tpu.input import InputState
from bonnie32_tpu.input.state import VirtualGamepad, VirtualKeyboard
from bonnie32_tpu.types import FrameBuffers
from bonnie32_tpu.ui import Rect, UiContext


def _fb(h=240, w=320):
    return FrameBuffers(color=jnp.zeros((h, w), jnp.int32),
                        depth=jnp.zeros((h, w), jnp.float32))


def _paint(ctx):
    return np.asarray(ctx.paint(_fb()).color)


def test_tab_switching_and_project_sync():
    app = AppState()
    ctx = UiContext()
    inp = InputState(VirtualKeyboard(), VirtualGamepad())
    bounds = Rect(0, 0, 320, 240)

    ctx.begin_frame(0, 0, False)
    rects = draw_frame(app, ctx, bounds, inp)
    assert rects["tabs"].h == TAB_H
    assert app.active_tool == Tool.HOME
    # the project level IS the editor's level after sync
    assert app.project.level is app.world_editor.level

    # click the World tab (index 1 of 6 equal tabs)
    # the auth controls reserve 200px on the right (tab_bar_with_auth)
    tab_w = max(bounds.w - 200.0, 60.0) / len(Tool.labels())
    tx = tab_w * 1 + tab_w / 2
    ctx.begin_frame(tx, TAB_H / 2, True)
    draw_frame(app, ctx, bounds, inp)
    ctx.begin_frame(tx, TAB_H / 2, False)
    draw_frame(app, ctx, bounds, inp)
    assert app.active_tool == Tool.WORLD_EDITOR


def test_each_tool_screen_rasterizes():
    app = AppState()
    inp = InputState(VirtualKeyboard(), VirtualGamepad())
    bounds = Rect(0, 0, 320, 240)
    app.tracker.song.patterns[0].channels[0][0] = Note(pitch=60)

    game = GameToolState(grid=None, params=None)
    game.show_debug_overlay = True
    game.options_menu_open = True

    for tool in Tool:
        app.active_tool = tool
        ctx = UiContext()
        ctx.begin_frame(0, 0, False)
        rects = draw_frame(app, ctx, bounds, inp, game=game)
        w = _paint(ctx)
        body = w[int(TAB_H) + 2:, :]
        if tool == Tool.TEST:
            # game view: HUD layers only (scene blits underneath)
            assert rects["viewport"].h == 240 - TAB_H
            assert (body != 0).any()
        else:
            assert (body != 0).mean() > 0.2, f"{tool} screen too empty"

    # modeler pane rects present
    app.active_tool = Tool.MODELER
    ctx = UiContext()
    ctx.begin_frame(0, 0, False)
    rects = draw_frame(app, ctx, bounds, inp)
    assert "pane:top" in rects and "pane:perspective" in rects


def test_tab_bar_auth_button_toggles_session():
    from bonnie32_tpu.app import AppState, Tool
    from bonnie32_tpu.frame import draw_frame
    from bonnie32_tpu.ui import Rect, UiContext

    app = AppState()
    app.auth.provider = lambda: "user@example.com"
    bounds = Rect(0, 0, 640, 480)
    # the Sign In button sits just left of the right edge
    bx = bounds.right - 8 - (7 * len("Sign In") + 14) / 2
    ctx = UiContext()
    ctx.begin_frame(bx, 12, True)
    draw_frame(app, ctx, bounds)
    assert app.auth.authenticated and app.storage.cloud is not None \
        or app.auth.authenticated   # storage switch depends on backend
    # click again (now "Sign Out")
    bx2 = bounds.right - 8 - (7 * len("Sign Out") + 14) / 2
    ctx.begin_frame(0, 0, False)
    draw_frame(app, ctx, bounds)
    ctx.begin_frame(bx2, 12, True)
    draw_frame(app, ctx, bounds)
    assert not app.auth.authenticated

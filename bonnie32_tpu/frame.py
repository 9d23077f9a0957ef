"""Per-frame tool dispatch: the main-loop body (main.rs:393-1597).

One call composes the whole application frame headlessly: the live
project sync (main.rs:405), the tab bar, and the active tool's screen —
world editor layout, game view overlays, modeler quad viewport, tracker
grid, or the input tester — all into the UiContext draw queue.  The
caller renders 3D viewport contents into the returned rects (the
framebuffer is the display surface, exactly like the reference's
macroquad draw pass).
"""

from typing import Dict, Optional

from .app import AppState, Tool
from .audio import tracker_ui
from .editor.layout import EditorLayout, draw_editor
from .game import overlay as game_overlay
from .input import InputState
from .models import modeler_viewport as mv
from .ui import Rect, UiContext, tab_bar
from .ui.widgets import tab_bar_with_auth

VERSION = "0.3.0"   # mirrors pyproject; the reference shows vX.Y.Z in the tab bar

TAB_H = 28.0


def draw_frame(app: AppState, ctx: UiContext, bounds: Rect,
               inp: Optional[InputState] = None,
               dt: float = 1.0 / 60.0,
               editor_layout: Optional[EditorLayout] = None,
               game=None, game_fps: float = 60.0,
               game_timings=None,
               modeler_views: Optional[mv.ModelerViewports] = None,
               modeler_frames=None) -> Dict[str, Rect]:
    """Compose one application frame; returns named rects (always
    includes "tabs" and "content"; tool screens contribute more)."""
    # live-edit project sync (main.rs:405): edits in the world editor are
    # immediately visible to every other tool
    app.project.level = app.world_editor.level

    tab_rect = bounds.slice_top(TAB_H)
    content = bounds.remaining_after_top(TAB_H)
    idx, auth_clicked = tab_bar_with_auth(
        ctx, "tabs", tab_rect, Tool.labels(), app.active_tool_index(),
        version=VERSION, storage_label=app.storage.mode().label,
        is_authenticated=app.auth.authenticated,
        user_label=app.auth.user_email or "")
    if auth_clicked:
        # tabbar.rs:402: toggles the session; the PKCE flow (auth.py)
        # plugs in via AuthState.provider
        if app.auth.authenticated:
            app.auth.sign_out()
            app.storage.update_for_auth(False)
        else:
            app.update_auth()
    if idx != app.active_tool_index():
        tool = Tool.from_index(idx)
        if tool is not None:
            app.set_active_tool(tool)

    rects: Dict[str, Rect] = {"tabs": tab_rect, "content": content}
    tool = app.active_tool

    if tool == Tool.HOME:
        from .ui.landing import draw_landing_ctx

        draw_landing_ctx(ctx, content, app.landing)

    elif tool == Tool.WORLD_EDITOR:
        layout = editor_layout or app.editor_layout
        rects.update(draw_editor(ctx, layout, app.world_editor, content,
                                 dt=dt, textures=app.textures))

    elif tool == Tool.TEST:
        # the caller blits the rendered game frame into `content`; this
        # pass draws the in-frame HUD layers (renderer.rs:735, :494)
        rects["viewport"] = content
        if game is not None and inp is not None:
            if game.show_debug_overlay:
                game_overlay.draw_debug_overlay(
                    ctx, game, content, inp, fps=game_fps,
                    timings=game_timings)
            if game.options_menu_open:
                game_overlay.draw_debug_menu(ctx, game, content, inp)

    elif tool == Tool.MODELER:
        from .models.modeler_layout import draw_modeler

        mrects = draw_modeler(ctx, app.modeler_layout, app.modeler,
                              content)
        rects.update({f"modeler:{k}": v for k, v in mrects.items()})
        views = modeler_views or mv.ModelerViewports()
        vp = mrects["viewport"]
        if modeler_frames is not None:
            mv.composite_views(ctx, views, modeler_frames, vp)
        else:
            for view, rect in views.pane_rects(vp).items():
                ctx.fill(rect, (14, 14, 18))
                ctx.outline(rect, (70, 70, 80))
                ctx.text(rect.x + 3, rect.y + 3, view.value.upper(),
                         (160, 160, 170))
        rects.update({f"pane:{v.value}": r for v, r
                      in views.pane_rects(vp).items()})

    elif tool == Tool.TRACKER:
        app.tracker_tab = tracker_ui.draw_tracker_screen(
            ctx, app.tracker, content, tab=app.tracker_tab,
            presets=app.tracker_presets, sel=app.tracker_sel)
        rects["tracker"] = content

    elif tool == Tool.INPUT_TEST:
        if inp is not None:
            from .input.debug import draw_controller_debug

            draw_controller_debug(ctx, content, inp)
        else:
            ctx.fill(content, (16, 16, 20))

    return rects

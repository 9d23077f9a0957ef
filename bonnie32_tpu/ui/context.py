"""UiContext: per-frame immediate-mode state + framebuffer painting.

Mirrors the reference's UiContext usage (ui/widgets.rs) with a virtual
mouse: widgets are functions `(ctx, rect, ...) -> result` that test the
mouse against their rect, track hot/active ids across frames, and queue
draw commands.  `ctx.paint(fb)` replays the commands through ops/draw2d.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

from .rect import Rect
from .theme import DEFAULT_THEME, Theme


@dataclasses.dataclass
class MouseState:
    x: float = 0.0
    y: float = 0.0
    down: bool = False
    pressed: bool = False   # edge: went down this frame
    released: bool = False  # edge: went up this frame
    wheel: float = 0.0


class UiContext:
    def __init__(self, theme: Theme = DEFAULT_THEME):
        self.theme = theme
        self.mouse = MouseState()
        self.hot: Optional[str] = None      # hovered widget id
        self.active: Optional[str] = None   # held widget id
        self.commands: List[tuple] = []     # draw queue
        self.blocked: bool = False          # modal/dropdown click blocking

    # --- frame lifecycle -------------------------------------------------

    def begin_frame(self, x: float, y: float, down: bool,
                    wheel: float = 0.0) -> None:
        prev_down = self.mouse.down
        self.mouse = MouseState(
            x=x, y=y, down=down,
            pressed=down and not prev_down,
            released=(not down) and prev_down,
            wheel=wheel)
        self.hot = None
        self.commands = []
        self.blocked = False
        # active persists through the release frame (widgets detect the
        # click on release), then clears once the mouse has settled up
        if not down and not self.mouse.released:
            self.active = None

    # --- interaction helpers ----------------------------------------------

    def hover(self, wid: str, rect: Rect) -> bool:
        if self.blocked:
            return False
        h = rect.contains(self.mouse.x, self.mouse.y)
        if h:
            self.hot = wid
        return h

    def clicked(self, wid: str, rect: Rect) -> bool:
        """Press begins on the widget, click fires on release inside."""
        h = self.hover(wid, rect)
        if h and self.mouse.pressed:
            self.active = wid
        fired = (self.active == wid and self.mouse.released and h)
        return fired

    def held(self, wid: str, rect: Rect) -> bool:
        h = self.hover(wid, rect)
        if h and self.mouse.pressed:
            self.active = wid
        return self.active == wid and self.mouse.down

    # --- draw queue ---------------------------------------------------------

    def fill(self, rect: Rect, rgb, alpha: int = 255) -> None:
        self.commands.append(("fill", rect, tuple(rgb), alpha))

    def outline(self, rect: Rect, rgb) -> None:
        self.commands.append(("outline", rect, tuple(rgb)))

    def line(self, x0, y0, x1, y1, rgb) -> None:
        self.commands.append(("line", (x0, y0, x1, y1), tuple(rgb)))

    def circle(self, cx, cy, radius, rgb) -> None:
        self.commands.append(("circle", (cx, cy, radius), tuple(rgb)))

    def circle_lines(self, cx, cy, radius, rgb) -> None:
        """Ring: filled circle minus its interior at paint time."""
        self.commands.append(("circle_lines", (cx, cy, radius),
                              tuple(rgb)))

    def text(self, x, y, s: str, rgb=None, scale: int = 1) -> None:
        """Queue a text draw; paint() rasterizes it with the 5x7 bitmap
        font (ui/font.py) like the reference draws its ttf text into the
        frame (ui/widgets.rs)."""
        self.commands.append(("text", (x, y), s,
                              tuple(rgb or self.theme.text), scale))

    def paint(self, fb):
        """Replay the queue into a FrameBuffers via ops/draw2d."""
        from ..ops import draw2d
        import jax.numpy as jnp
        for cmd in self.commands:
            if cmd[0] == "fill":
                _, r, rgb, alpha = cmd
                fb = draw2d.draw_filled_rect(fb, int(r.x), int(r.y),
                                             int(r.right) - 1,
                                             int(r.bottom) - 1, rgb,
                                             alpha=alpha)
            elif cmd[0] == "outline":
                _, r, rgb = cmd
                fb = draw2d.draw_rect(fb, int(r.x), int(r.y),
                                      int(r.right) - 1, int(r.bottom) - 1,
                                      rgb)
            elif cmd[0] == "line":
                _, (x0, y0, x1, y1), rgb = cmd
                fb = draw2d.draw_lines(
                    fb, jnp.asarray([[int(x0), int(x1)]], jnp.int32),
                    jnp.asarray([[int(y0), int(y1)]], jnp.int32), rgb)
            elif cmd[0] == "circle":
                _, (cx, cy, radius), rgb = cmd
                fb = draw2d.draw_circle(fb, int(cx), int(cy),
                                        int(radius), rgb)
            elif cmd[0] == "circle_lines":
                _, (cx, cy, radius), rgb = cmd
                fb = draw2d.draw_circle_outline(fb, int(cx), int(cy),
                                                int(radius), rgb)
            elif cmd[0] == "text":
                _, (x, y), s, rgb, scale = cmd
                fb = draw2d.draw_text(fb, int(x), int(y), s, rgb,
                                      scale=scale)
            elif cmd[0] == "image":
                _, (x, y), words = cmd
                fb = draw2d.draw_image(fb, int(x), int(y), words)
        return fb

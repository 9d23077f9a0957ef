"""Core immediate-mode widgets (ui/widgets.rs behaviors).

Each widget draws into the context queue and returns its interaction
result.  Widget identity is the caller-provided id string (the reference
hashes labels; explicit ids avoid collisions).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from .context import UiContext
from .rect import Rect


def button(ctx: UiContext, wid: str, rect: Rect, label: str = "") -> bool:
    """Click-on-release button; hover/active tint."""
    hovered = ctx.hover(wid, rect)
    clicked = ctx.clicked(wid, rect)
    if ctx.active == wid and ctx.mouse.down:
        bg = ctx.theme.widget_active
    elif hovered:
        bg = ctx.theme.widget_hover
    else:
        bg = ctx.theme.widget
    ctx.fill(rect, bg)
    ctx.outline(rect, ctx.theme.panel_border)
    if label:
        ctx.text(rect.x + 4, rect.center_y, label)
    return clicked


def checkbox(ctx: UiContext, wid: str, rect: Rect, value: bool,
             label: str = "") -> bool:
    """Returns the (possibly toggled) value."""
    box = rect.slice_left(rect.h)
    if ctx.clicked(wid, rect):
        value = not value
    ctx.fill(box, ctx.theme.widget)
    ctx.outline(box, ctx.theme.panel_border)
    if value:
        ctx.fill(box.pad(3), ctx.theme.accent)
    if label:
        ctx.text(box.right + 4, rect.center_y, label)
    return value


def slider(ctx: UiContext, wid: str, rect: Rect, value: float,
           lo: float, hi: float) -> float:
    """Horizontal drag slider; returns the new value clamped to [lo, hi]."""
    if ctx.held(wid, rect):
        t = (ctx.mouse.x - rect.x) / max(rect.w, 1e-6)
        value = lo + (hi - lo) * min(max(t, 0.0), 1.0)
    t = 0.0 if hi == lo else (value - lo) / (hi - lo)
    ctx.fill(rect, ctx.theme.slider_track)
    fill = Rect(rect.x, rect.y, rect.w * min(max(t, 0.0), 1.0), rect.h)
    ctx.fill(fill, ctx.theme.slider_fill)
    ctx.outline(rect, ctx.theme.panel_border)
    return min(max(value, min(lo, hi)), max(lo, hi))


def drag_value(ctx: UiContext, wid: str, rect: Rect, value: float,
               speed: float = 1.0, lo: Optional[float] = None,
               hi: Optional[float] = None,
               state: Optional[dict] = None) -> float:
    """Horizontal-drag numeric field (widgets.rs DragValueResult): value
    changes by mouse-x delta * speed while held.  `state` carries the last
    mouse x across frames ({} persisted by the caller)."""
    st = state if state is not None else {}
    if ctx.held(wid, rect):
        last = st.get("last_x")
        if last is not None:
            value += (ctx.mouse.x - last) * speed
        st["last_x"] = ctx.mouse.x
    else:
        st.pop("last_x", None)
    if lo is not None:
        value = max(value, lo)
    if hi is not None:
        value = min(value, hi)
    ctx.fill(rect, ctx.theme.widget)
    ctx.outline(rect, ctx.theme.panel_border)
    ctx.text(rect.x + 4, rect.center_y, f"{value:.3g}")
    return value


def label_row(ctx: UiContext, rect: Rect, label: str,
              value: str = "") -> None:
    ctx.text(rect.x, rect.center_y, label)
    if value:
        ctx.text(rect.center_x, rect.center_y, value, ctx.theme.text_dim)


def tab_bar(ctx: UiContext, wid: str, rect: Rect, labels: Sequence[str],
            active: int) -> int:
    """Horizontal tab strip (ui/tabbar.rs): equal-width tabs, click to
    switch; returns the (possibly new) active index."""
    if not labels:
        return active
    tw = rect.w / len(labels)
    for i, label in enumerate(labels):
        tr = Rect(rect.x + i * tw, rect.y, tw, rect.h)
        tid = f"{wid}.{i}"
        if ctx.clicked(tid, tr):
            active = i
        if i == active:
            ctx.fill(tr, ctx.theme.widget_active)
            ctx.fill(Rect(tr.x, tr.bottom - 2, tr.w, 2), ctx.theme.accent)
        elif ctx.hot == tid:
            ctx.fill(tr, ctx.theme.widget_hover)
        else:
            ctx.fill(tr, ctx.theme.panel)
        ctx.text(tr.x + 6, tr.center_y, label)
    ctx.outline(rect, ctx.theme.panel_border)
    return active


def toolbar(ctx: UiContext, wid: str, rect: Rect, items: Sequence[str],
            active: int, button_w: float = 28.0) -> int:
    """Icon-button strip (ui/widgets.rs Toolbar): one square-ish button per
    item, the active one accented; returns the selected index."""
    for i, label in enumerate(items):
        br = Rect(rect.x + i * button_w, rect.y, button_w, rect.h).pad(1)
        bid = f"{wid}.{i}"
        if ctx.clicked(bid, br):
            active = i
        if i == active:
            ctx.fill(br, ctx.theme.accent)
        elif ctx.hot == bid:
            ctx.fill(br, ctx.theme.widget_hover)
        else:
            ctx.fill(br, ctx.theme.widget)
        ctx.outline(br, ctx.theme.panel_border)
        ctx.text(br.center_x - 3, br.center_y, label)
    return active


def vlist(ctx: UiContext, wid: str, rect: Rect, items: Sequence[str],
          selected: Optional[int], row_h: float = 18.0,
          scroll: float = 0.0) -> Tuple[Optional[int], float]:
    """Scrollable selection list (widgets.rs ListResult): returns
    (selected index, new scroll offset)."""
    scroll = max(0.0, min(scroll - ctx.mouse.wheel * row_h,
                          max(len(items) * row_h - rect.h, 0.0)))
    ctx.fill(rect, ctx.theme.panel)
    first = int(scroll // row_h)
    visible = int(rect.h // row_h) + 1
    for i in range(first, min(first + visible, len(items))):
        row = Rect(rect.x, rect.y + i * row_h - scroll, rect.w, row_h)
        row = row.intersect(rect)
        if row.h <= 0:
            continue
        rid = f"{wid}.{i}"
        if ctx.clicked(rid, row):
            selected = i
        if i == selected:
            ctx.fill(row, ctx.theme.accent, alpha=120)
        elif ctx.hot == rid:
            ctx.fill(row, ctx.theme.widget_hover)
        ctx.text(row.x + 4, row.center_y, items[i])
    ctx.outline(rect, ctx.theme.panel_border)
    return selected, scroll

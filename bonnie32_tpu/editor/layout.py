"""World-editor screen composition (the headless layout.rs counterpart).

Mirrors `draw_editor` (`/root/reference/src/editor/layout.rs:231-290`):
a unified toolbar strip on top, a status bar at the bottom, then a
horizontal main split (left sidebar | rest) and a second split (center
viewport | right sidebar).  The left sidebar holds four collapsible
panels (Skybox, 2D Grid, Room, Debug); the right sidebar holds Textures
and Properties.  Everything renders into the UiContext draw queue, which
paint() rasterizes into a framebuffer alongside the 3D viewport.
"""

import dataclasses
from typing import Dict, List, Optional

from ..ui import (Rect, SplitPanel, UiContext, button, draw_collapsible_panel,
                  draw_panel, toolbar, vlist)
from ..ui.panel import COLLAPSED_PANEL_HEIGHT
from .state import EditorState, EditorTool

TOOLBAR_HEIGHT = 36.0   # layout.rs:248
STATUS_HEIGHT = 22.0    # layout.rs:253
PANEL_BG = (35, 35, 40)  # layout.rs:275

TOOLS = [EditorTool.SELECT, EditorTool.DRAW_FLOOR, EditorTool.DRAW_WALL,
         EditorTool.DRAW_CEILING, EditorTool.PLACE_OBJECT]
TOOL_LABELS = ["Sel", "Flr", "Wal", "Cei", "Obj"]
LEFT_PANELS = ["Skybox", "2D Grid", "Room", "Debug"]  # layout.rs:274
RIGHT_PANELS = ["Textures", "Properties"]


@dataclasses.dataclass
class EditorLayout:
    """Persistent layout state (splits + collapse flags)."""

    main_split: SplitPanel = dataclasses.field(
        default_factory=lambda: SplitPanel.horizontal("main")
        .with_ratio(0.22).with_min_size(120))
    right_split: SplitPanel = dataclasses.field(
        default_factory=lambda: SplitPanel.horizontal("right")
        .with_ratio(0.72).with_min_size(160))
    left_collapsed: List[bool] = dataclasses.field(
        default_factory=lambda: [True, False, False, True])
    right_collapsed: List[bool] = dataclasses.field(
        default_factory=lambda: [False, False])
    room_scroll: float = 0.0
    properties_ui: dict = dataclasses.field(default_factory=dict)
    # texture palette + paint-editor session state
    palette: "object" = None            # TexturePalette (lazy)
    editing_texture: Optional[str] = None
    paint_state: "object" = None        # TextureEditorState (lazy)


def _collapsible_stack(ctx, rect, names, collapsed, bg) -> Dict[str, Rect]:
    """layout.rs:278-300 — equal heights for expanded panels, headers for
    collapsed ones; toggles on header click."""
    n_collapsed = sum(collapsed)
    avail = max(rect.h - n_collapsed * COLLAPSED_PANEL_HEIGHT, 0.0)
    n_expanded = len(names) - n_collapsed
    exp_h = avail / n_expanded if n_expanded else 0.0

    content: Dict[str, Rect] = {}
    y = rect.y
    for i, name in enumerate(names):
        h = COLLAPSED_PANEL_HEIGHT if collapsed[i] else exp_h
        pr = Rect(rect.x, y, rect.w, h)
        clicked, body = draw_collapsible_panel(ctx, pr, name, collapsed[i],
                                               bg)
        if clicked:
            collapsed[i] = not collapsed[i]
        if body is not None:
            content[name] = body
        y += h
    return content


def draw_editor(ctx: UiContext, layout: EditorLayout, state: EditorState,
                bounds: Rect, dt: float = 1.0 / 60.0,
                textures=(), scene=None) -> Dict[str, Rect]:
    """One editor frame's chrome; returns named rects so the caller can
    render the 3D viewport / grid views into them and route input."""
    screen = bounds
    toolbar_rect = screen.slice_top(TOOLBAR_HEIGHT)
    main_rect = screen.remaining_after_top(TOOLBAR_HEIGHT)
    status_rect = main_rect.slice_bottom(STATUS_HEIGHT)
    panels_rect = main_rect.remaining_after_bottom(STATUS_HEIGHT)

    # --- toolbar: tool buttons + undo/redo (draw_unified_toolbar) ---
    ctx.fill(toolbar_rect, (28, 28, 33))
    ctx.outline(toolbar_rect, (60, 60, 70))
    active = TOOLS.index(state.tool) if state.tool in TOOLS else 0
    strip = Rect(toolbar_rect.x + 4, toolbar_rect.y + 4,
                 len(TOOLS) * 30.0, toolbar_rect.h - 8)
    new_active = toolbar(ctx, "tools", strip, TOOL_LABELS, active,
                         button_w=30.0)
    if new_active != active:
        state.tool = TOOLS[new_active]
    ux = strip.right + 12
    if button(ctx, "undo", Rect(ux, strip.y, 40, strip.h), "Undo"):
        state.undo()
    if button(ctx, "redo", Rect(ux + 44, strip.y, 40, strip.h), "Redo"):
        state.redo()

    # --- splits (layout.rs:263-266) ---
    left_rect, rest_rect = layout.main_split.update(ctx, panels_rect)
    center_rect, right_rect = layout.right_split.update(ctx, rest_rect)

    # --- left sidebar: 4 collapsible panels ---
    left_content = _collapsible_stack(ctx, left_rect, LEFT_PANELS,
                                      layout.left_collapsed, PANEL_BG)
    if "Skybox" in left_content:
        _skybox_panel(ctx, left_content["Skybox"], state)
    if "Room" in left_content:
        _room_list(ctx, left_content["Room"], state)
    if "Debug" in left_content:
        _debug_panel(ctx, left_content["Debug"], state)

    # --- right sidebar: Textures + Properties ---
    right_content = _collapsible_stack(ctx, right_rect, RIGHT_PANELS,
                                       layout.right_collapsed, PANEL_BG)
    if "Textures" in right_content:
        _textures_panel(ctx, right_content["Textures"], state, layout,
                        textures)
    if "Properties" in right_content:
        from .properties import draw_properties

        draw_properties(ctx, right_content["Properties"], state,
                        ui=layout.properties_ui, scene=scene)

    # --- viewport frame; the paint editor takes it over while a user
    # texture is being edited (texture_editor.rs draws over the tool area)
    draw_panel(ctx, center_rect, None, (12, 12, 16))
    if layout.editing_texture is not None:
        _paint_editor_overlay(ctx, center_rect, state, layout)

    # --- status bar (state.set_status toasts) ---
    ctx.fill(status_rect, (24, 24, 28))
    ctx.outline(status_rect, (60, 60, 70))
    state.tick_status(dt)
    if state.status_message:
        ctx.text(status_rect.x + 6, status_rect.y + 7,
                 state.status_message)
    else:
        ctx.text(status_rect.x + 6, status_rect.y + 7,
                 f"Tool: {state.tool.value}", (120, 120, 130))

    return {
        "toolbar": toolbar_rect, "status": status_rect,
        "left": left_rect, "viewport": center_rect, "right": right_rect,
        **{f"left:{k}": v for k, v in left_content.items()},
        **{f"right:{k}": v for k, v in right_content.items()},
    }


def _textures_panel(ctx: UiContext, body: Rect, state: EditorState,
                    layout: EditorLayout, textures) -> None:
    """Textures sidebar: Source|User toggle + the active grid
    (texture_palette.rs:59-110)."""
    from .texture_palette import (TexturePalette, draw_mode_toggle,
                                  draw_user_grid)

    if layout.palette is None:
        layout.palette = TexturePalette()
    pal = layout.palette
    toggle = Rect(body.x, body.y, body.w, 16)
    draw_mode_toggle(ctx, toggle, pal)
    grid = Rect(body.x, toggle.bottom + 2, body.w,
                body.bottom - toggle.bottom - 2)
    if not pal.user_mode:
        if textures:
            pal.draw(ctx, state, grid, textures)
            if pal.selected is not None:
                state.selected_texture = pal.selected
        else:
            ctx.text(grid.x + 4, grid.y + 4, "(no packs loaded)",
                     (110, 110, 120))
        return
    action = draw_user_grid(ctx, state, grid, pal,
                            list(state.user_textures.values()))
    if action == "new":
        import numpy as np

        from ..models.user_texture import UserTexture

        existing = set(state.user_textures)
        for i in range(1, 100):
            name = f"texture_{i:02d}"
            if name not in existing:
                break
        tex = UserTexture(id=max([t.id for t in
                                  state.user_textures.values()] or [0]) + 1,
                          name=name, width=32, height=32, depth=0,
                          indices=np.zeros(32 * 32, np.uint8),
                          palette=[0] + [0x7FFF] * 15)
        state.user_textures[name] = tex
        layout.editing_texture = name
        layout.paint_state = None
        state.set_status(f"Created {name}", 2.0)
    elif action is not None and action.startswith("edit:"):
        layout.editing_texture = action[5:]
        layout.paint_state = None


def _paint_editor_overlay(ctx: UiContext, rect: Rect, state: EditorState,
                          layout: EditorLayout) -> None:
    """The composed paint editor over the viewport while editing."""
    from ..texture.editor import TextureEditorState, draw_texture_editor

    tex = state.user_textures.get(layout.editing_texture)
    if tex is None:
        layout.editing_texture = None
        return
    if layout.paint_state is None:
        layout.paint_state = TextureEditorState()
    close = Rect(rect.right - 54, rect.y + 2, 50, 16)
    hovered = close.contains(ctx.mouse.x, ctx.mouse.y)
    body = Rect(rect.x, rect.y + 20, rect.w, rect.h - 20)
    draw_texture_editor(ctx, body, tex, layout.paint_state)
    ctx.fill(close, (90, 50, 50) if hovered else (60, 40, 40))
    ctx.text(close.x + 6, close.center_y, "Close")
    if (hovered and ctx.mouse.pressed) or ctx.key_pressed("escape"):
        layout.editing_texture = None


def _room_list(ctx: UiContext, body: Rect, state: EditorState) -> None:
    """The room list rows (layout.rs:3012-3134): visibility eye, click to
    switch, trash delete with index bookkeeping, and the Add Room button
    that places a fresh 1x1 room east of the last one."""
    from ..models.level import SECTOR_SIZE, Room

    line_h = 16.0
    btn = 12.0
    y = body.y + 2
    to_delete = None
    for i, room in enumerate(state.level.rooms):
        if y + line_h > body.bottom - line_h:
            break
        hidden = i in state.hidden_rooms
        selected = i == state.current_room
        eye = Rect(body.x + 2, y + 1, btn, btn)
        eh = eye.contains(ctx.mouse.x, ctx.mouse.y)
        ctx.fill(eye, (50, 50, 58) if hidden else (120, 180, 255))
        if eh and ctx.mouse.pressed:
            if hidden:
                state.hidden_rooms.discard(i)
            else:
                state.hidden_rooms.add(i)
        dr = Rect(body.right - btn - 4, y + 1, btn, btn)
        dh = dr.contains(ctx.mouse.x, ctx.mouse.y)
        ctx.fill(dr, (90, 50, 50) if dh else (55, 42, 42))
        ctx.text(dr.x + 3, dr.y, "x")
        if dh and ctx.mouse.pressed:
            to_delete = i
        row = Rect(body.x + btn + 4, y, body.w - 2 * btn - 12, line_h)
        if selected:
            ctx.fill(row, (60, 80, 60))
        if row.contains(ctx.mouse.x, ctx.mouse.y) and ctx.mouse.pressed \
                and to_delete is None:
            state.current_room = i
        n_sectors = sum(1 for _ in room.iter_sectors())
        ctx.text(row.x + 2, y + 3, f"Room {room.id} ({n_sectors} sectors)",
                 (100, 200, 100) if selected
                 else (130, 130, 140) if hidden else (210, 210, 215))
        y += line_h

    if to_delete is not None:
        i = to_delete
        state.save_undo()
        state.level.rooms.pop(i)
        if state.current_room >= len(state.level.rooms) \
                and state.level.rooms:
            state.current_room = len(state.level.rooms) - 1
        state.hidden_rooms = {idx - 1 if idx > i else idx
                              for idx in state.hidden_rooms if idx != i}
        if state.selection.kind != "none" and state.selection.room == i:
            state.clear_selection()
        state.multi_selection = []
        state.mark_portals_dirty()
        state.set_status(f"Deleted Room {i}", 2.0)

    add = Rect(body.x + 2, body.bottom - line_h, min(body.w - 4, 80),
               line_h - 2)
    ah = add.contains(ctx.mouse.x, ctx.mouse.y)
    ctx.fill(add, (42, 54, 46) if not ah else (60, 80, 65))
    ctx.text(add.x + 4, add.center_y, "+ Add Room")
    if ah and ctx.mouse.pressed:
        rooms = state.level.rooms
        new_id = len(rooms)
        off_x = (float(rooms[-1].position[0])
                 + rooms[-1].width * SECTOR_SIZE + SECTOR_SIZE
                 if rooms else 0.0)
        state.save_undo()
        rooms.append(Room.new(new_id, (off_x, 0.0, 0.0), 1, 1))
        state.current_room = new_id
        state.set_status(f"Created Room {new_id}", 2.0)


_TIMING_COLORS = {
    "toolbar": (100, 180, 255), "left": (180, 100, 255),
    "viewport": (255, 100, 100), "right": (255, 200, 100),
    "status": (100, 255, 180),
}


def _debug_panel(ctx: UiContext, body: Rect, state: EditorState) -> None:
    """layout.rs:2816-3012 draw_debug_panel: FPS + per-section frame
    timing bars + memory accounting (Process RSS / textures /
    framebuffers).  Timings come from state.frame_timings (section ->
    ms), populated by the frame driver."""
    x = body.x + 6
    y = body.y + 4
    fps = state.frame_fps
    fps_rgb = ((100, 255, 100) if fps >= 55 else
               (255, 220, 100) if fps >= 28 else (255, 100, 100))
    ctx.text(x, y, f"FPS: {fps:.0f}", fps_rgb)
    y += 14
    timings = state.frame_timings
    total = sum(timings.values())
    ctx.text(x, y, f"Frame: {total:.2f}ms")
    y += 14
    bar_w = max(body.w - 70, 20.0)
    max_ms = max(total, 1e-6)
    for name, ms in timings.items():
        rgb = _TIMING_COLORS.get(name, (150, 150, 160))
        ctx.text(x, y, name[:9], (150, 150, 160))
        frac = min(ms / max_ms, 1.0)
        ctx.fill(Rect(x + 58, y + 2, bar_w * frac, 8), rgb)
        ctx.text(x + 58 + bar_w * frac + 3, y, f"{ms:.2f}", (200, 200, 210))
        y += 12
    y += 4
    m = state.memory_stats
    m.update_process_memory()
    fmt = type(m).format_bytes
    ctx.text(x, y, "Memory:", (150, 150, 160))
    y += 12
    rows = (("Process RSS", fmt(m.physical_bytes)),
            ("Textures", f"{fmt(m.texture_bytes)} ({m.texture_count})"),
            ("RGB555 cache", fmt(m.texture15_bytes)),
            ("Framebuffer", fmt(m.framebuffer_bytes)),
            ("GPU cache", str(m.gpu_cache_count)))
    for label, val in rows:
        ctx.text(x + 8, y, label, (150, 150, 160))
        ctx.text(x + 100, y, val, (200, 200, 210))
        y += 12


def _skybox_panel(ctx: UiContext, body: Rect, state: EditorState) -> None:
    """Skybox panel (layout.rs:1879-1980 + preset row :2687-2712):
    ON/OFF toggle creating/clearing level.skybox, a vertical gradient
    preview sampled from the config, and the four preset buttons."""
    from ..models.skybox import Skybox

    has = state.level.skybox is not None
    tr = Rect(body.x + 2, body.y + 2, 44, 16)
    th = tr.contains(ctx.mouse.x, ctx.mouse.y)
    ctx.fill(tr, (60, 110, 70) if has else (60, 60, 65))
    if th:
        ctx.outline(tr, (255, 255, 255))
    ctx.text(tr.x + 8, tr.center_y, "ON" if has else "OFF")
    if th and ctx.mouse.pressed:
        state.save_undo()
        state.level.skybox = None if has else Skybox().to_ron()
        state.dirty = True
        has = not has
    y = tr.bottom + 4

    if has:
        sb = Skybox.from_ron(state.level.skybox)
        # gradient preview strip: zenith -> horizon sky | ground -> nadir
        strip = Rect(body.x + 2, y, body.w - 8, 28)
        half = strip.h / 2
        for i in range(int(half)):
            t = i / max(half - 1, 1)
            from ..models.skybox import _lerp_rgb
            ctx.fill(Rect(strip.x, strip.y + i, strip.w, 1),
                     _lerp_rgb(sb.zenith_color, sb.horizon_sky_color, t))
            ctx.fill(Rect(strip.x, strip.y + half + i, strip.w, 1),
                     _lerp_rgb(sb.horizon_ground_color, sb.nadir_color, t))
        y = strip.bottom + 4
        presets = (("Sunset", Skybox.preset_sunset),
                   ("Twilight", Skybox.preset_twilight),
                   ("Night", Skybox.preset_night),
                   ("Arctic", Skybox.preset_arctic))
        bw = (body.w - 8 - 3 * 4) / 4
        for i, (name, builder) in enumerate(presets):
            r = Rect(body.x + 2 + i * (bw + 4), y, bw, 14)
            hov = r.contains(ctx.mouse.x, ctx.mouse.y)
            ctx.fill(r, (58, 58, 70) if hov else (40, 40, 48))
            ctx.text(r.x + 2, r.center_y, name[:6], (200, 200, 210))
            if hov and ctx.mouse.pressed:
                state.save_undo()
                state.level.skybox = builder().to_ron()
                state.dirty = True
                state.set_status(f"Skybox: {name}", 1.5)
        y += 18

        # body/star toggles + sliders (the panel's collapsible sections'
        # core controls, layout.rs:2060-2400)
        from ..ui.widgets import checkbox, slider

        changed = False
        new_sun = checkbox(ctx, "sky.sun", Rect(body.x + 2, y, 12, 12),
                           sb.sun.enabled, "Sun")
        if new_sun != sb.sun.enabled:
            sb.sun.enabled = new_sun
            changed = True
        new_moon = checkbox(ctx, "sky.moon",
                            Rect(body.x + 70, y, 12, 12),
                            sb.moon.enabled, "Moon")
        if new_moon != sb.moon.enabled:
            sb.moon.enabled = new_moon
            changed = True
        y += 16
        if sb.sun.enabled:
            ctx.text(body.x + 2, y + 1, "Elev", (130, 130, 140))
            new_e = slider(ctx, "sky.sunelev",
                           Rect(body.x + 34, y, body.w - 44, 10),
                           sb.sun.elevation, 0.0, 1.5)
            if new_e != sb.sun.elevation:
                sb.sun.elevation = new_e
                changed = True
            y += 14
        new_st = checkbox(ctx, "sky.stars", Rect(body.x + 2, y, 12, 12),
                          sb.stars.enabled, "Stars")
        if new_st != sb.stars.enabled:
            sb.stars.enabled = new_st
            changed = True
        if changed:
            state.level.skybox = sb.to_ron()
            state.dirty = True

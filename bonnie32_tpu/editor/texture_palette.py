"""Texture palette: thumbnail browser + apply-to-selection.

Headless port of `/root/reference/src/editor/texture_palette.rs`:
a scrollable grid of pack-texture thumbnails (sizes 32..128, :584-607),
click selects the texture and applies it to the current selection
(:449-467), respecting the face kind (floor/ceiling/wall stacks) and
the floor/ceiling triangle sub-selection (:471-581).
"""

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..models.level import Level, TextureRef
from ..ui import Rect, UiContext
from .state import EditorState, Selection, TriangleSelection

THUMB_SIZES = [32.0, 48.0, 64.0, 96.0, 128.0]   # texture_palette.rs:584


def smaller_thumb_size(current: float) -> float:
    for s in reversed(THUMB_SIZES):
        if s < current:
            return s
    return THUMB_SIZES[0]


def larger_thumb_size(current: float) -> float:
    for s in THUMB_SIZES:
        if s > current:
            return s
    return THUMB_SIZES[-1]


def thumbnail_words(pixels15: np.ndarray, size: int) -> np.ndarray:
    """Color15 texture -> (size, size) packed-RGBA8 words via 5->8
    expansion and nearest sampling (the palette preview path)."""
    h, w = pixels15.shape
    ys = (np.arange(size) * h // size).clip(0, h - 1)
    xs = (np.arange(size) * w // size).clip(0, w - 1)
    c15 = pixels15[np.ix_(ys, xs)].astype(np.int64)
    r5 = (c15 >> 10) & 31
    g5 = (c15 >> 5) & 31
    b5 = c15 & 31
    r8 = (r5 << 3) | (r5 >> 2)
    g8 = (g5 << 3) | (g5 >> 2)
    b8 = (b5 << 3) | (b5 >> 2)
    word = r8 | (g8 << 8) | (b8 << 16) | (255 << 24)
    return word.astype(np.int64).astype(np.int32, casting="unsafe")


def apply_texture_to_horizontal_face(face, tex_ref: TextureRef,
                                     triangle_sel: TriangleSelection):
    """texture_palette.rs:560-581."""
    if triangle_sel == TriangleSelection.BOTH:
        face.texture = tex_ref
        face.texture_2 = None
    elif triangle_sel == TriangleSelection.TRI1:
        face.texture = tex_ref
    else:
        face.texture_2 = tex_ref


def apply_texture_to_selection(level: Level, selection: Selection,
                               tex_ref: TextureRef,
                               triangle_sel: TriangleSelection) -> bool:
    """texture_palette.rs:471-557; returns True when something changed."""
    if selection.room >= len(level.rooms):
        return False
    room = level.rooms[selection.room]
    sector = room.get_sector(selection.x, selection.z)
    if sector is None:
        return False

    if selection.kind == "sector_face" and selection.face is not None:
        f = selection.face
        if f.kind == "floor":
            if sector.floor is None:
                return False
            apply_texture_to_horizontal_face(sector.floor, tex_ref,
                                             triangle_sel)
            return True
        if f.kind == "ceiling":
            if sector.ceiling is None:
                return False
            apply_texture_to_horizontal_face(sector.ceiling, tex_ref,
                                             triangle_sel)
            return True
        if f.kind == "wall" and f.direction is not None:
            walls = sector.walls(f.direction)
            if f.wall_index < len(walls):
                walls[f.wall_index].texture = tex_ref
                return True
        return False

    if selection.kind == "sector":
        changed = False
        if sector.floor is not None:
            apply_texture_to_horizontal_face(sector.floor, tex_ref,
                                             triangle_sel)
            changed = True
        if sector.ceiling is not None:
            apply_texture_to_horizontal_face(sector.ceiling, tex_ref,
                                             triangle_sel)
            changed = True
        for d in range(4):   # cardinal walls only (texture_palette.rs:541)
            for wall in sector.walls(d):
                wall.texture = tex_ref
                changed = True
        return changed
    return False


@dataclasses.dataclass
class TexturePalette:
    """Palette panel state (thumb size, scroll, current selection)."""

    pack_name: str = "texture-pack"
    thumb_size: float = 48.0
    scroll: float = 0.0
    selected: Optional[TextureRef] = None
    user_mode: bool = False   # Source|User toggle (texture_palette.rs:65)

    def grid_layout(self, rect: Rect, n: int
                    ) -> List[Tuple[int, Rect]]:
        """Visible (index, rect) thumbnail cells."""
        pad = 2.0
        cell = self.thumb_size + pad
        cols = max(int(rect.w // cell), 1)
        out = []
        for i in range(n):
            col = i % cols
            row = i // cols
            y = rect.y + row * cell - self.scroll
            if y + cell < rect.y or y > rect.bottom:
                continue
            out.append((i, Rect(rect.x + col * cell + 1, y + 1,
                                self.thumb_size, self.thumb_size)))
        return out

    def draw(self, ctx: UiContext, state: EditorState, rect: Rect,
             textures: Sequence, apply_on_select: bool = True
             ) -> Optional[int]:
        """One palette frame: thumbnails, selection accent, click-to-apply
        (texture_palette.rs:402-467).  Returns the clicked index."""
        ctx.fill(rect, (22, 22, 26))
        self.scroll = max(self.scroll - ctx.mouse.wheel
                          * (self.thumb_size + 2.0), 0.0)
        clicked_idx = None
        for i, cell in self.grid_layout(rect, len(textures)):
            tex = textures[i]
            words = thumbnail_words(np.asarray(tex.pixels15),
                                    int(self.thumb_size))
            ctx.commands.append(("image", (cell.x, cell.y), words))
            is_sel = (self.selected is not None
                      and self.selected.name == tex.name)
            ctx.outline(cell, (255, 200, 60) if is_sel else (60, 60, 70))
            if ctx.clicked(f"pal.{i}", cell):
                clicked_idx = i

        if clicked_idx is not None:
            tex = textures[clicked_idx]
            self.selected = TextureRef(self.pack_name, tex.name)
            if apply_on_select:
                targets = [state.selection] + state.multi_selection
                will_change = any(
                    s.kind in ("sector", "sector_face") for s in targets)
                if will_change:
                    state.save_undo()
                    n_applied = 0
                    for sel in targets:
                        if apply_texture_to_selection(
                                state.level, sel, self.selected,
                                state.triangle_selection):
                            n_applied += 1
                    if n_applied:
                        state.set_status(
                            f"Applied {tex.name} to {n_applied} "
                            f"selection{'s' if n_applied != 1 else ''}",
                            1.5)
        return clicked_idx


# ---------------------------------------------------------------------------
# Source / User mode toggle (texture_palette.rs:59-110)
# ---------------------------------------------------------------------------

def draw_mode_toggle(ctx: UiContext, rect: Rect,
                     palette: "TexturePalette") -> None:
    """Two-tab Source|User strip; flips palette.user_mode."""
    half = rect.w / 2.0
    for i, label in enumerate(("Source", "User")):
        r = Rect(rect.x + i * half, rect.y, half, rect.h)
        active = palette.user_mode == (i == 1)
        hovered = r.contains(ctx.mouse.x, ctx.mouse.y)
        ctx.fill(r, (50, 60, 75) if active
                 else (40, 40, 48) if hovered else (28, 28, 34))
        ctx.text(r.x + 6, r.center_y, label,
                 (255, 255, 255) if active else (150, 150, 160))
        if hovered and ctx.mouse.pressed and not active:
            palette.user_mode = (i == 1)
            palette.scroll = 0.0


def draw_user_grid(ctx: UiContext, state: EditorState, rect: Rect,
                   palette: "TexturePalette", user_textures
                   ) -> Optional[str]:
    """User-texture thumbnails + the New button (texture_palette.rs:65-110).
    Applies the clicked texture to the selection by user id and returns
    "edit:<name>" / "new" actions for the caller to open the paint editor."""
    ctx.fill(rect, (22, 22, 26))
    action: Optional[str] = None
    new_r = Rect(rect.x + 2, rect.y + 2, 48, 18)
    hovered = new_r.contains(ctx.mouse.x, ctx.mouse.y)
    ctx.fill(new_r, (50, 70, 55) if hovered else (38, 52, 42))
    ctx.text(new_r.x + 6, new_r.center_y, "+ New")
    if hovered and ctx.mouse.pressed:
        action = "new"
    grid = Rect(rect.x, new_r.bottom + 2, rect.w,
                rect.bottom - new_r.bottom - 2)
    texs = list(user_textures)
    clicked_idx = None
    for i, cell in palette.grid_layout(grid, len(texs)):
        t = texs[i]
        words = thumbnail_words(np.asarray(t.to_texture15()),
                                int(palette.thumb_size))
        ctx.commands.append(("image", (cell.x, cell.y), words))
        is_sel = (palette.selected is not None
                  and palette.selected.is_user_texture
                  and palette.selected.name == t.name)
        ctx.outline(cell, (255, 200, 60) if is_sel else (60, 60, 70))
        if ctx.clicked(f"upal.{i}", cell):
            clicked_idx = i
        # right-click opens the paint editor on it (Edit flow)
        if cell.contains(ctx.mouse.x, ctx.mouse.y) and ctx.mouse.right_down:
            action = f"edit:{t.name}"
    if clicked_idx is not None:
        t = texs[clicked_idx]
        palette.selected = TextureRef.user(t.name)
        state.selected_texture = palette.selected
        targets = [state.selection] + state.multi_selection
        if any(s.kind in ("sector", "sector_face") for s in targets):
            state.save_undo()
            n = 0
            for sel in targets:
                if apply_texture_to_selection(state.level, sel,
                                              palette.selected,
                                              state.triangle_selection):
                    n += 1
            if n:
                state.set_status(f"Applied {t.name} to {n} "
                                 f"selection{'s' if n != 1 else ''}", 1.5)
    return action

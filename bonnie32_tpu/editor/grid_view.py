"""2D grid-view projections (world editor top/front/side views).

Reference behavior: `/root/reference/src/editor/grid_view.rs:100-125` —
plane mappings per GridViewMode, screen<->world scaling with a center +
zoom, and sector-cell hit testing against SECTOR_SIZE cells.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

from ..models.level import SECTOR_SIZE
from .state import GridViewMode


def world_to_plane(mode: GridViewMode, x: float, y: float,
                   z: float) -> Tuple[float, float]:
    """grid_view.rs:108 — project a world position onto the view plane."""
    if mode == GridViewMode.TOP:
        return (x, z)
    if mode == GridViewMode.FRONT:
        return (x, y)
    return (z, y)


def plane_to_world_offset(mode: GridViewMode, da: float,
                          db: float) -> Tuple[float, float, float]:
    """grid_view.rs:118 — lift a 2D plane delta back to a world offset."""
    if mode == GridViewMode.TOP:
        return (da, 0.0, db)
    if mode == GridViewMode.FRONT:
        return (da, db, 0.0)
    return (0.0, db, da)


@dataclasses.dataclass
class GridView:
    """Pan/zoom state for one 2D view (grid_view.rs screen transforms)."""

    mode: GridViewMode = GridViewMode.TOP
    center_x: float = 0.0   # screen px of world-plane origin
    center_y: float = 0.0
    scale: float = 0.1      # screen px per world unit
    # world-plane coords the view is centered on (for pan)
    offset_a: float = 0.0
    offset_b: float = 0.0

    def world_to_screen(self, wa: float, wb: float) -> Tuple[float, float]:
        return (self.center_x + (wa - self.offset_a) * self.scale,
                self.center_y - (wb - self.offset_b) * self.scale)

    def screen_to_world(self, sx: float, sy: float) -> Tuple[float, float]:
        """grid_view.rs:101 — inverse, y flipped."""
        return (self.offset_a + (sx - self.center_x) / self.scale,
                self.offset_b - (sy - self.center_y) / self.scale)

    def pan(self, dx_px: float, dy_px: float) -> None:
        self.offset_a -= dx_px / self.scale
        self.offset_b += dy_px / self.scale

    def zoom(self, factor: float, at_sx: float, at_sy: float) -> None:
        """Zoom keeping the world point under the cursor fixed."""
        wa, wb = self.screen_to_world(at_sx, at_sy)
        self.scale *= factor
        wa2, wb2 = self.screen_to_world(at_sx, at_sy)
        self.offset_a += wa - wa2
        self.offset_b += wb - wb2

    def sector_at(self, sx: float, sy: float, room_origin=(0.0, 0.0, 0.0)
                  ) -> Optional[Tuple[int, int]]:
        """Sector cell under a screen point (TOP view only: x/z cells)."""
        if self.mode != GridViewMode.TOP:
            return None
        wa, wb = self.screen_to_world(sx, sy)
        lx = wa - room_origin[0]
        lz = wb - room_origin[2]
        return (int(math.floor(lx / SECTOR_SIZE)),
                int(math.floor(lz / SECTOR_SIZE)))


# ---------------------------------------------------------------------------
# Tracker piano keyboard (tracker/state.rs:1068 key_to_note)
# ---------------------------------------------------------------------------

_BOTTOM_ROW = ["z", "s", "x", "d", "c", "v", "g", "b", "h", "n", "j", "m",
               ",", "l", ".", ";", "/"]                    # semitones 0-16
_TOP_ROW = ["q", "2", "w", "3", "e", "4", "r", "t", "6", "y", "7", "u",
            "i", "9", "o", "0", "p", "-", "[", "]"]        # semitones 17-36

KEY_SEMITONES = {k: i for i, k in enumerate(_BOTTOM_ROW)}
KEY_SEMITONES.update({k: 17 + i for i, k in enumerate(_TOP_ROW)})


def key_to_note(key: str, octave: int) -> Optional[int]:
    """tracker/state.rs:1068 — 37-key two-row piano layout; returns the
    MIDI pitch (clamped to 127) or None."""
    off = KEY_SEMITONES.get(key.lower())
    if off is None:
        return None
    return min(octave * 12 + off, 127)

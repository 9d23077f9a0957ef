"""Tracker screen composition (the headless tracker/layout.rs counterpart).

Draws the pattern grid (row numbers, per-channel note cells, cursor and
playback-row highlights), channel headers, the arrangement strip, and the
transport/status line into the UiContext queue
(`/root/reference/src/tracker/layout.rs` — pattern grid + piano keys +
channel headers).  Cell click routing moves the cursor like the
reference's mouse handling.
"""

from typing import Dict, Optional

from ..ui import Rect, UiContext
from .song import Note
from .state import TrackerState

ROW_H = 10.0
ROWNUM_W = 24.0
CELL_W = 64.0
HEADER_H = 14.0
ARRANGE_H = 16.0

NOTE_NAMES = ["C-", "C#", "D-", "D#", "E-", "F-", "F#", "G-", "G#", "A-",
              "A#", "B-"]

BG = (18, 18, 22)
GRID_LINE = (45, 45, 52)
TEXT = (190, 190, 200)
DIM = (110, 110, 120)
CURSOR_BG = (70, 90, 140)
PLAY_BG = (50, 70, 50)
BEAT_BG = (28, 28, 34)


# ---------------------------------------------------------------------------
# Piano keyboard (tracker/state.rs:1068 key_to_note)
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


def note_text(note: Optional[Note]) -> str:
    """layout.rs note cell formatting: 'C-4 01 64' / '...' padding."""
    if note is None or note.is_empty:
        return "... .. .."
    if note.pitch is not None and note.pitch < 0:
        p = "OFF"
    elif note.pitch is not None:
        p = f"{NOTE_NAMES[note.pitch % 12]}{note.pitch // 12 - 1}"
    else:
        p = "..."
    i = f"{note.instrument:02d}" if note.instrument is not None else ".."
    v = f"{note.volume:02d}" if note.volume is not None else ".."
    return f"{p} {i} {v}"


def draw_tracker(ctx: UiContext, st: TrackerState, bounds: Rect
                 ) -> Dict[str, Rect]:
    """One tracker frame; returns named rects for input routing."""
    ctx.fill(bounds, BG)

    # --- arrangement strip (pattern order) ---
    arr_rect = bounds.slice_top(ARRANGE_H)
    x = arr_rect.x + 4
    for pos, pat_idx in enumerate(st.song.arrangement):
        w = 22.0
        r = Rect(x, arr_rect.y + 2, w - 2, ARRANGE_H - 4)
        cur = pos == st.current_pattern_idx
        ctx.fill(r, CURSOR_BG if cur else (40, 40, 48))
        ctx.text(r.x + 3, r.y + 2, f"{pat_idx:02d}",
                 (255, 255, 255) if cur else DIM)
        if ctx.clicked(f"arr.{pos}", r):
            st.current_pattern_idx = pos
            st.current_row = 0
        x += w

    # --- channel headers ---
    head_rect = Rect(bounds.x, arr_rect.bottom, bounds.w, HEADER_H)
    ctx.fill(head_rect, (30, 30, 36))
    n_ch = st.num_channels()
    for c in range(n_ch):
        cx = head_rect.x + ROWNUM_W + c * CELL_W
        settings = (st.song.channel_settings[c]
                    if c < len(st.song.channel_settings) else None)
        inst = (st.song.channel_instruments[c]
                if c < len(st.song.channel_instruments) else 0)
        label = f"CH{c + 1} i{inst:02d}"
        if settings is not None and getattr(settings, "muted", False):
            label += " M"
        ctx.text(cx + 2, head_rect.y + 3, label,
                 TEXT if c == st.current_channel else DIM)

    # --- pattern grid ---
    grid_rect = Rect(bounds.x, head_rect.bottom, bounds.w,
                     bounds.bottom - head_rect.bottom - 14)
    pat = st.current_pattern()
    rows: Dict[str, Rect] = {"arrangement": arr_rect, "headers": head_rect,
                             "grid": grid_rect}
    if pat is None:
        ctx.text(grid_rect.x + 8, grid_rect.y + 8, "No pattern", DIM)
        return rows

    visible = int(grid_rect.h // ROW_H)
    first = st.scroll_row
    for vis_i in range(min(visible, pat.length - first)):
        r = first + vis_i
        ry = grid_rect.y + vis_i * ROW_H
        row_rect = Rect(grid_rect.x, ry, grid_rect.w, ROW_H)
        if st.playing and r == st.playback_row \
                and st.current_pattern_idx == st.playback_pattern_idx:
            ctx.fill(row_rect, PLAY_BG)
        elif r % 4 == 0:
            ctx.fill(row_rect, BEAT_BG)
        ctx.text(row_rect.x + 2, ry + 1, f"{r:02d}", DIM)
        for c in range(n_ch):
            cx = grid_rect.x + ROWNUM_W + c * CELL_W
            cell = Rect(cx, ry, CELL_W - 2, ROW_H)
            if r == st.current_row and c == st.current_channel:
                ctx.fill(cell, CURSOR_BG)
            note = pat.get(c, r)
            ctx.text(cx + 2, ry + 1, note_text(note),
                     TEXT if not (note is None or note.is_empty) else DIM)
            if ctx.clicked(f"cell.{r}.{c}", cell):
                st.current_row = r
                st.current_channel = c

    # --- transport / status line ---
    foot = Rect(bounds.x, grid_rect.bottom, bounds.w, 14)
    mode = "PLAY" if st.playing else ("EDIT" if st.edit_mode else "VIEW")
    ctx.text(foot.x + 4, foot.y + 2,
             f"{mode}  bpm {st.song.bpm}  oct {st.octave}  "
             f"pat {st.current_pattern_idx + 1}/"
             f"{max(len(st.song.arrangement), 1)}", DIM)
    rows["footer"] = foot
    return rows

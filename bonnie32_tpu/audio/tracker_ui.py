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


_EFFECT_TO_CHAR = {  # pattern.rs:447 Effect::to_char
    "Arpeggio": "0", "SlideUp": "1", "SlideDown": "2", "Portamento": "3",
    "Vibrato": "4", "VolumeSlide": "A", "SetVolume": "C",
    "PatternBreak": "D", "SetExpression": "E", "SetSpeed": "F",
    "SetModulation": "M", "SetPan": "P"}


def note_text(note: Optional[Note]) -> str:
    """layout.rs note cell formatting: 'C-4 01 64 P40' / '...' padding
    (note, instrument, volume, effect+param columns)."""
    if note is None or note.is_empty:
        return "... .. .. ..."
    if note.pitch is not None and note.pitch < 0:
        p = "OFF"
    elif note.pitch is not None:
        p = f"{NOTE_NAMES[note.pitch % 12]}{note.pitch // 12 - 1}"
    else:
        p = "..."
    i = f"{note.instrument:02d}" if note.instrument is not None else ".."
    v = f"{note.volume:02d}" if note.volume is not None else ".."
    ch = _EFFECT_TO_CHAR.get(note.effect.kind)
    e = f"{ch}{note.effect.x:02X}" if ch is not None else "..."
    return f"{p} {i} {v} {e}"


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


# ---------------------------------------------------------------------------
# Full screen composition (tracker/layout.rs:33-210 draw_tracker + header,
# 739-1026 arrangement view, 1070-1535 instruments view).
# ---------------------------------------------------------------------------

import enum


class TrackerTab(enum.Enum):
    """layout.rs tab strip: the three tracker sub-screens."""

    PATTERN = "pattern"
    ARRANGEMENT = "arrangement"
    INSTRUMENTS = "instruments"


TAB_H = 16.0
BANK_W = 140.0
ROW24 = 14.0


def draw_header(ctx: UiContext, st: TrackerState, rect: Rect,
                tab: TrackerTab) -> TrackerTab:
    """Transport + bpm/octave spinners + tab strip (layout.rs:210-441).
    Returns the (possibly changed) active tab."""
    ctx.fill(rect, (26, 26, 32))
    x = rect.x + 4

    def button(label, wid, w=34.0):
        nonlocal x
        r = Rect(x, rect.y + 2, w, rect.h - 4)
        ctx.fill(r, (48, 48, 58))
        ctx.text(r.x + 4, r.y + 2, label, TEXT)
        x += w + 4
        return ctx.clicked(wid, r)

    if button("Play" if not st.playing else "Stop", "tr.play"):
        st.toggle_playback()
    if button("|<", "tr.restart", 22.0):
        st.play_from_start()
    # bpm spinner (layout.rs header bpm +/- buttons)
    if button("-", "tr.bpm-", 16.0):
        st.song.bpm = max(st.song.bpm - 1, 32)
    ctx.text(x, rect.y + 4, f"bpm {st.song.bpm:3d}", TEXT)
    x += 56.0
    if button("+", "tr.bpm+", 16.0):
        st.song.bpm = min(st.song.bpm + 1, 255)
    if button("-", "tr.oct-", 16.0):
        st.octave = max(st.octave - 1, 0)
    ctx.text(x, rect.y + 4, f"oct {st.octave}", TEXT)
    x += 40.0
    if button("+", "tr.oct+", 16.0):
        st.octave = min(st.octave + 1, 9)

    # tab strip, right-aligned
    tabs = list(TrackerTab)
    tw = 72.0
    tx = rect.right - tw * len(tabs) - 4
    out = tab
    for i, t in enumerate(tabs):
        r = Rect(tx + i * tw, rect.y + 2, tw - 2, rect.h - 4)
        active = t is tab
        ctx.fill(r, CURSOR_BG if active else (36, 36, 44))
        ctx.text(r.x + 4, r.y + 2, t.value.title(), TEXT if active else DIM)
        if ctx.clicked(f"tr.tab.{t.value}", r):
            out = t
    return out


def draw_arrangement_view(ctx: UiContext, st: TrackerState, rect: Rect,
                          sel: dict) -> None:
    """Pattern bank (left) + arrangement order (right), layout.rs:739-1026.

    `sel` carries the view's focus state across frames:
    {"bank": int, "arr": int, "focus_arr": bool}.
    """
    ctx.fill(rect, BG)
    bank = Rect(rect.x + 4, rect.y + 18, BANK_W, rect.h - 26)
    ctx.text(rect.x + 6, rect.y + 4, "Pattern Bank", TEXT)
    ctx.fill(bank, (20, 20, 26))
    for i, pat in enumerate(st.song.patterns):
        y = bank.y + i * ROW24
        if y + ROW24 > bank.bottom:
            break
        r = Rect(bank.x, y, bank.w, ROW24 - 1)
        selected = not sel.get("focus_arr") and sel.get("bank") == i
        if selected:
            ctx.fill(r, CURSOR_BG)
        elif i % 2 == 0:
            ctx.fill(r, BEAT_BG)
        notes = sum(1 for chan in pat.channels for n in chan
                    if n is not None and not n.is_empty)
        mark = "*" if notes else "-"
        used = ">" if i in st.song.arrangement else " "
        ctx.text(r.x + 3, y + 2, f"{mark} {i:02d} [{pat.length:3d}]{used}",
                 (255, 255, 255) if selected else TEXT)
        if ctx.clicked(f"bank.{i}", r):
            sel["bank"] = i
            sel["focus_arr"] = False
        # right-click appends the pattern to the arrangement (layout.rs:812)
        if ctx.mouse.right_down and r.contains(ctx.mouse.x, ctx.mouse.y):
            st.arrangement_insert(len(st.song.arrangement), i)

    arr = Rect(bank.right + 8, rect.y + 18, rect.right - bank.right - 12,
               rect.h - 26)
    ctx.text(arr.x + 2, rect.y + 4, "Arrangement", TEXT)
    ctx.fill(arr, (20, 20, 26))
    for pos, pat_idx in enumerate(st.song.arrangement):
        y = arr.y + pos * ROW24
        if y + ROW24 > arr.bottom:
            break
        r = Rect(arr.x, y, arr.w - 70, ROW24 - 1)
        selected = sel.get("focus_arr") and sel.get("arr") == pos
        playing = st.playing and pos == st.playback_pattern_idx
        if selected:
            ctx.fill(r, CURSOR_BG)
        elif playing:
            ctx.fill(r, PLAY_BG)
        ctx.text(r.x + 3, y + 2, f"{pos:02d}: pattern {pat_idx:02d}",
                 (255, 255, 255) if selected else TEXT)
        if ctx.clicked(f"arrv.{pos}", r):
            sel["arr"] = pos
            sel["focus_arr"] = True
        # per-row controls: up / down / remove (layout.rs arrangement ops)
        for bi, (label, wid) in enumerate((("^", "up"), ("v", "dn"),
                                           ("x", "rm"))):
            br = Rect(arr.right - 66 + bi * 22, y, 20, ROW24 - 1)
            ctx.fill(br, (44, 44, 54))
            ctx.text(br.x + 6, y + 2, label, DIM)
            if ctx.clicked(f"arrv.{pos}.{wid}", br):
                if wid == "up":
                    st.arrangement_move_up(pos)
                elif wid == "dn":
                    st.arrangement_move_down(pos)
                else:
                    st.arrangement_remove(pos)
    # append selected bank pattern (layout.rs "Add" button)
    add = Rect(arr.x, arr.bottom - 16, 60, 14)
    ctx.fill(add, (48, 48, 58))
    ctx.text(add.x + 4, add.y + 2, "Add", TEXT)
    if ctx.clicked("arrv.add", add):
        st.arrangement_insert(len(st.song.arrangement),
                              sel.get("bank", 0))


def draw_instruments_view(ctx: UiContext, st: TrackerState, rect: Rect,
                          presets, sel: dict) -> None:
    """SoundFont preset list + per-channel assignment
    (layout.rs:1070-1535).  `presets`: sequence of (bank, program, name)."""
    ctx.fill(rect, BG)
    lst = Rect(rect.x + 4, rect.y + 18, rect.w * 0.55, rect.h - 160)
    ctx.text(rect.x + 6, rect.y + 4, "Instruments", TEXT)
    ctx.fill(lst, (20, 20, 26))
    for i, (bank, prog, name) in enumerate(presets):
        y = lst.y + i * ROW24
        if y + ROW24 > lst.bottom:
            break
        r = Rect(lst.x, y, lst.w, ROW24 - 1)
        selected = sel.get("inst") == i
        if selected:
            ctx.fill(r, CURSOR_BG)
        elif i % 2 == 0:
            ctx.fill(r, BEAT_BG)
        ctx.text(r.x + 3, y + 2, f"{bank:03d}:{prog:03d} {name[:18]}",
                 (255, 255, 255) if selected else TEXT)
        if ctx.clicked(f"inst.{i}", r):
            sel["inst"] = i

    # channel assignment column (click assigns the selected preset)
    chn = Rect(lst.right + 8, rect.y + 18, rect.right - lst.right - 12,
               rect.h - 24)
    ctx.text(chn.x + 2, rect.y + 4, "Channels", TEXT)
    for c in range(st.num_channels()):
        y = chn.y + c * ROW24
        r = Rect(chn.x, y, chn.w, ROW24 - 1)
        cur = (st.song.channel_instruments[c]
               if c < len(st.song.channel_instruments) else 0)
        ctx.fill(r, BEAT_BG if c % 2 == 0 else BG)
        ctx.text(r.x + 3, y + 2, f"CH{c + 1}: inst {cur:02d}",
                 TEXT if c == st.current_channel else DIM)
        if ctx.clicked(f"inst.ch.{c}", r) and sel.get("inst") is not None:
            while len(st.song.channel_instruments) <= c:
                st.song.channel_instruments.append(0)
            st.song.channel_instruments[c] = sel["inst"]

    # Channel effects block (layout.rs:1270-1445): sample-rate buttons,
    # reverb preset grid, Pan/Mod/Expr knobs + Wet mini-knob — values
    # persist in ChannelSettings (pattern.rs:9)
    from ..ui.widgets import knob, mini_knob

    from .song import ChannelSettings

    ch = st.current_channel
    while len(st.song.channel_settings) <= ch:
        st.song.channel_settings.append(ChannelSettings())
    cs = st.song.channel_settings[ch]
    if cs is not None:
        fy = chn.y + st.num_channels() * ROW24 + 8
        ctx.text(chn.x + 2, fy, f"Channel {ch + 1} Effects", TEXT)
        fy += 16
        # sample-rate row (SPU output simulation, audio.rs:36-78)
        for i, label in enumerate(("OFF", "44k", "22k", "11k", "5k")):
            r = Rect(chn.x + 2 + i * 34, fy, 32, 16)
            active = cs.sample_rate == i
            hov = r.contains(ctx.mouse.x, ctx.mouse.y)
            ctx.fill(r, (51, 102, 128) if active
                     else (64, 64, 77) if hov else (38, 38, 46))
            ctx.text(r.x + 3, r.center_y, label,
                     (255, 255, 255) if active else TEXT)
            if hov and ctx.mouse.pressed:
                cs.sample_rate = i
        fy += 20
        # reverb preset grid (10 PsyQ presets, 5 per row, green active)
        from .spu_tables import REVERB_ORDER
        for i, name in enumerate(REVERB_ORDER):
            r = Rect(chn.x + 2 + (i % 5) * 44, fy + (i // 5) * 18, 42, 16)
            active = cs.reverb_type == i
            hov = r.contains(ctx.mouse.x, ctx.mouse.y)
            ctx.fill(r, (51, 128, 77) if active
                     else (64, 64, 77) if hov else (38, 38, 46))
            ctx.text(r.x + 2, r.center_y, name[:6].title(),
                     (255, 255, 255) if active else TEXT)
            if hov and ctx.mouse.pressed:
                cs.reverb_type = i
        fy += 2 * 18 + 6
        knob_y = fy + 28
        for i, (label, attr, bipolar) in enumerate(
                (("Pan", "pan", True), ("Mod", "modulation", False),
                 ("Expr", "expression", False))):
            kx = chn.x + 30 + i * 64
            new, _ = knob(ctx, kx, knob_y, 24, getattr(cs, attr), label,
                          bipolar=bipolar)
            if new is not None:
                setattr(cs, attr, new)
        new = mini_knob(ctx, chn.x + 30 + 3 * 64, knob_y, 14, cs.wet,
                        "Wet")
        if new is not None:
            cs.wet = new

    # piano keyboard along the bottom (layout.rs:1142); a click enters the
    # note at the cursor exactly like typing its mapped key
    note = draw_piano(ctx, st, rect.x + 8, rect.bottom - 112)
    if note is not None:
        st.enter_note(note)


def draw_tracker_screen(ctx: UiContext, st: TrackerState, bounds: Rect,
                        tab: TrackerTab = TrackerTab.PATTERN,
                        presets=(), sel: Optional[dict] = None
                        ) -> TrackerTab:
    """The composed tracker screen: header + active tab body
    (layout.rs:33-61 draw_tracker routing)."""
    if sel is None:
        sel = {}
    head = bounds.slice_top(TAB_H + 4)
    tab = draw_header(ctx, st, head, tab)
    body = Rect(bounds.x, head.bottom, bounds.w,
                bounds.bottom - head.bottom)
    if tab is TrackerTab.PATTERN:
        draw_tracker(ctx, st, body)
    elif tab is TrackerTab.ARRANGEMENT:
        draw_arrangement_view(ctx, st, body, sel)
    else:
        draw_instruments_view(ctx, st, body, presets, sel)
    return tab


def handle_pattern_key(st: TrackerState, key: str) -> bool:
    """Note-entry + navigation keys over the pattern grid
    (layout.rs:1570-1937 handle_input subset: piano keys, cursor moves,
    delete, note-off, octave).  Returns True when the key was consumed."""
    if key == "up":
        st.cursor_up()
    elif key == "down":
        st.cursor_down()
    elif key == "left":
        st.cursor_left()
    elif key == "right":
        st.cursor_right()
    elif key == "delete":
        st.delete_note()
    elif key == "1":
        st.enter_note_off()
    elif key == "pageup":
        st.octave = min(st.octave + 1, 9)
    elif key == "pagedown":
        st.octave = max(st.octave - 1, 0)
    elif key == "space":
        st.toggle_playback()
    elif st.current_column == 1 and key.isdigit():
        # volume column: 3-digit rolling entry, clamp 127 (layout.rs:1869)
        p = st.current_pattern()
        note = p.get(st.current_channel, st.current_row) if p else None
        cur = note.volume if note is not None and note.volume is not None \
            else 0
        st.set_volume(min((cur * 10 + int(key)) % 1000, 127))
    elif st.current_column == 2 and len(key) == 1:
        # effect column letters (layout.rs:1893)
        if not st.set_effect_char(key):
            return False
    elif st.current_column == 3 and key.isdigit():
        # effect parameter: rolling two-digit hex-free entry
        p = st.current_pattern()
        note = p.get(st.current_channel, st.current_row) if p else None
        if note is None:
            return False
        cur = note.effect.x
        st.set_effect(note.effect.kind,
                      min((cur * 10 + int(key)) % 1000, 127),
                      note.effect.y)
    else:
        pitch = key_to_note(key, st.octave)
        if pitch is None:
            return False
        st.enter_note(pitch)
    return True


# ---------------------------------------------------------------------------
# Piano keyboard drawing (layout.rs:1018-1025, :1142-1260)
# ---------------------------------------------------------------------------

_SEMITONE_KEY = {v: k for k, v in KEY_SEMITONES.items()}

# 22 white keys across semitones 0-36 (3 octaves C..C) + 15 black keys at
# fractional white-key positions (layout.rs:1144-1157)
_WHITE_KEYS = [(o * 12 + s, n) for o in range(3)
               for s, n in ((0, "C"), (2, "D"), (4, "E"), (5, "F"),
                            (7, "G"), (9, "A"), (11, "B"))] + [(36, "C")]
_BLACK_KEYS = [(o * 12 + s, o * 7 + fx) for o in range(3)
               for s, fx in ((1, 0.7), (3, 1.7), (6, 3.7), (8, 4.7),
                             (10, 5.7))]


def draw_piano(ctx: UiContext, st: TrackerState, x: float, y: float,
               white_w: float = 24.0, white_h: float = 100.0
               ) -> Optional[int]:
    """The 3-octave piano with keyboard-mapping labels; keys light up when
    hovered or when their mapped computer key is held.  Returns the
    clicked MIDI pitch or None (layout.rs:1142-1260)."""
    ctx.text(x, y - 14, f"Piano - Octave {st.octave}", TEXT)
    clicked: Optional[int] = None
    black_w, black_h = 16.0, 60.0

    for i, (semi, name) in enumerate(_WHITE_KEYS):
        r = Rect(x + i * white_w, y, white_w - 2.0, white_h)
        hovered = r.contains(ctx.mouse.x, ctx.mouse.y)
        key = _SEMITONE_KEY.get(semi)
        held = key is not None and ctx.key_down(key)
        rgb = ((120, 180, 255) if held else
               (215, 215, 220) if hovered else (240, 240, 245))
        ctx.fill(r, rgb)
        ctx.outline(r, (60, 60, 70))
        ctx.text(r.x + 3, r.bottom - 24, name, (60, 60, 70))
        if key is not None:
            ctx.text(r.x + 3, r.bottom - 12, key.upper(), (120, 120, 130))
        if hovered and ctx.mouse.pressed:
            clicked = min(st.octave * 12 + semi, 127)

    for semi, fx in _BLACK_KEYS:
        r = Rect(x + fx * white_w, y, black_w, black_h)
        hovered = r.contains(ctx.mouse.x, ctx.mouse.y)
        key = _SEMITONE_KEY.get(semi)
        held = key is not None and ctx.key_down(key)
        rgb = ((90, 140, 220) if held else
               (60, 60, 70) if hovered else (25, 25, 30))
        ctx.fill(r, rgb)
        if key is not None:
            ctx.text(r.x + 3, r.bottom - 12, key.upper(), (150, 150, 160))
        if hovered and ctx.mouse.pressed:
            clicked = min(st.octave * 12 + semi, 127)
    return clicked


def handle_midi(st: TrackerState, messages) -> list:
    """MIDI -> tracker routing (layout.rs:1836-1863): note-on previews and
    enters in edit mode on the note column, note-off stops the preview,
    CC1 -> preview modulation, CC7 -> default volume.  `messages` are
    input.midi events; returns ("note_on"/"note_off", channel, ...) preview
    emissions for the audio engine."""
    from ..input.midi import ControlChange, NoteOff, NoteOn

    out = []
    for msg in messages:
        if isinstance(msg, NoteOn):
            out.append(("note_on", st.current_channel, msg.note,
                        msg.velocity))
            if st.edit_mode and st.current_column == 0:
                st.enter_note(msg.note)
        elif isinstance(msg, NoteOff):
            out.append(("note_off", st.current_channel, msg.note))
        elif isinstance(msg, ControlChange):
            if msg.controller == 1:
                out.append(("modulation", st.current_channel, msg.value))
            elif msg.controller == 7:
                st.default_volume = msg.value
    return out

"""Tracker screen composition: header/transport, arrangement view,
instruments view, key input routing (tracker/layout.rs parity)."""

from bonnie32_tpu.audio import tracker_ui as tu
from bonnie32_tpu.audio.state import TrackerState
from bonnie32_tpu.ui import Rect, UiContext


def click(ctx, draw, x, y):
    """Press then release at (x, y), drawing both frames (clicks fire on
    release inside — ui/context.py clicked())."""
    ctx.begin_frame(x, y, True)
    draw()
    ctx.begin_frame(x, y, False)
    return draw()


def test_header_tab_switch():
    st = TrackerState()
    ctx = UiContext()
    bounds = Rect(0, 0, 480, 300)
    ctx.begin_frame(0, 0, False)
    tab = tu.draw_tracker_screen(ctx, st, bounds)
    assert tab is tu.TrackerTab.PATTERN
    # click the Arrangement tab (second of three right-aligned 72px tabs)
    tx = bounds.right - 72.0 * 3 - 4 + 72.0 + 4
    tab = click(ctx, lambda: tu.draw_tracker_screen(ctx, st, bounds), tx, 8)
    assert tab is tu.TrackerTab.ARRANGEMENT


def test_header_transport_and_spinners():
    st = TrackerState()
    ctx = UiContext()
    rect = Rect(0, 0, 480, 20)
    bpm0 = st.song.bpm
    draw = lambda: tu.draw_header(ctx, st, rect, tu.TrackerTab.PATTERN)
    # Play button is first at x=4
    click(ctx, draw, 10, 8)
    assert st.playing
    # bpm "-" button follows Play(34+4) and |<(22+4): x = 4+38+26 = 68
    click(ctx, draw, 70, 8)
    assert st.song.bpm == bpm0 - 1


def test_arrangement_view_bank_and_ops():
    st = TrackerState()
    st.create_pattern()
    ctx = UiContext()
    rect = Rect(0, 0, 480, 280)
    sel = {}
    draw = lambda: tu.draw_arrangement_view(ctx, st, rect, sel)
    # click second bank row
    click(ctx, draw, 10, 18 + tu.ROW24 + 2)
    assert sel["bank"] == 1 and not sel["focus_arr"]
    # Add button appends the selected pattern
    n0 = len(st.song.arrangement)
    arr = Rect(rect.x + 4 + tu.BANK_W + 8, rect.y + 18,
               rect.right - (rect.x + 4 + tu.BANK_W + 8) - 4, rect.h - 26)
    click(ctx, draw, arr.x + 10, arr.bottom - 16 + 4)
    assert len(st.song.arrangement) == n0 + 1
    assert st.song.arrangement[-1] == 1


def test_arrangement_row_remove():
    st = TrackerState()
    st.arrangement_insert(len(st.song.arrangement), 0)
    n0 = len(st.song.arrangement)
    ctx = UiContext()
    rect = Rect(0, 0, 480, 280)
    sel = {}
    draw = lambda: tu.draw_arrangement_view(ctx, st, rect, sel)
    arr = Rect(rect.x + 4 + tu.BANK_W + 8, rect.y + 18,
               rect.right - (rect.x + 4 + tu.BANK_W + 8) - 4, rect.h - 26)
    # "x" button of row 0 sits at arr.right - 66 + 2*22
    click(ctx, draw, arr.right - 66 + 44 + 5, arr.y + 4)
    assert len(st.song.arrangement) == n0 - 1


def test_instruments_view_assign():
    st = TrackerState()
    presets = [(0, 0, "Piano"), (0, 24, "Guitar"), (128, 0, "Drums")]
    ctx = UiContext()
    rect = Rect(0, 0, 480, 280)
    sel = {}
    draw = lambda: tu.draw_instruments_view(ctx, st, rect, presets, sel)
    # select the second preset
    click(ctx, draw, 10, rect.y + 18 + tu.ROW24 + 2)
    assert sel["inst"] == 1
    # assign to channel 0
    lst_w = rect.w * 0.55
    click(ctx, draw, rect.x + 4 + lst_w + 10, rect.y + 18 + 2)
    assert st.song.channel_instruments[0] == 1


def test_pattern_key_input():
    st = TrackerState()
    assert tu.handle_pattern_key(st, "z")
    note = st.current_pattern().get(st.current_channel, 0)
    assert note is not None and note.pitch == st.octave * 12
    tu.handle_pattern_key(st, "down")
    r0 = st.current_row
    tu.handle_pattern_key(st, "up")
    assert st.current_row <= r0
    assert not tu.handle_pattern_key(st, "escape-ish-unknown")
    tu.handle_pattern_key(st, "pageup")
    assert st.octave == 5
    tu.handle_pattern_key(st, "space")
    assert st.playing


def test_screen_tabs_render_all():
    st = TrackerState()
    ctx = UiContext()
    bounds = Rect(0, 0, 480, 300)
    for tab in tu.TrackerTab:
        ctx.begin_frame(0, 0, False)
        tu.draw_tracker_screen(ctx, st, bounds, tab=tab,
                               presets=[(0, 0, "P")])
        assert len(ctx.commands) > 10


def test_instruments_view_knobs_adjust_channel_settings():
    st = TrackerState()
    ctx = UiContext()
    sel = {"inst": 0}
    rect = Rect(0, 20, 640, 440)
    lst_w = rect.w * 0.55
    chn_x = rect.x + 4 + lst_w + 8
    fy = rect.y + 18 + st.num_channels() * tu.ROW24 + 8 + 16 + 20
    knob_y = fy + 2 * 18 + 6 + 28
    kx = chn_x + 30
    # press at 12 o'clock inside the Pan knob -> value 95 (bipolar arc)
    ctx.begin_frame(kx, knob_y - 10, True)
    tu.draw_instruments_view(ctx, st, rect, [(0, 0, "Piano")], sel)
    assert st.song.channel_settings[st.current_channel].pan == \
        round(0.75 * 127)


def test_instruments_view_sample_rate_and_reverb_buttons():
    st = TrackerState()
    ctx = UiContext()
    sel = {}
    rect = Rect(0, 20, 640, 440)
    chn_x = rect.x + 4 + rect.w * 0.55 + 8
    fy = rect.y + 18 + st.num_channels() * tu.ROW24 + 8 + 16
    draw = lambda: tu.draw_instruments_view(ctx, st, rect,
                                            [(0, 0, "Piano")], sel)
    # click the 22k sample-rate button (index 2)
    click(ctx, draw, chn_x + 2 + 2 * 34 + 5, fy + 8)
    assert st.song.channel_settings[st.current_channel].sample_rate == 2
    # click the HALL reverb preset (index 5 -> row 1 col 0)
    ry = fy + 20
    click(ctx, draw, chn_x + 2 + 5, ry + 18 + 8)
    assert st.song.channel_settings[st.current_channel].reverb_type == 5


def test_piano_click_enters_note_and_held_key_highlight():
    st = TrackerState()
    st.edit_mode = True
    ctx = UiContext()
    sel = {}
    rect = Rect(0, 20, 640, 440)
    # the piano starts at rect.x + 8, rect.bottom - 112; first white key = C
    px = rect.x + 8 + 5
    py = rect.bottom - 112 + 80      # below black keys, inside white key
    click(ctx, lambda: tu.draw_instruments_view(ctx, st, rect,
                                                [(0, 0, "Piano")], sel),
          px, py)
    pat = st.current_pattern()
    note = pat.get(st.current_channel, 0)
    assert note is not None and note.pitch == st.octave * 12

    # held mapped key ("z" = semitone 0) lights the key (accent fill)
    ctx2 = UiContext()
    ctx2.begin_frame(0, 0, False, keys_down=("z",))
    tu.draw_instruments_view(ctx2, st, rect, [(0, 0, "Piano")], sel)
    fills = [c for c in ctx2.commands if c[0] == "fill"
             and c[2] == (120, 180, 255)]
    assert fills


def test_midi_routing_into_tracker():
    from bonnie32_tpu.input.midi import (ControlChange, MidiInput, NoteOn,
                                         NoteOff, VirtualMidiBackend)

    st = TrackerState()
    st.edit_mode = True
    st.current_column = 0
    backend = VirtualMidiBackend()
    midi = MidiInput(backend)
    backend.note_on(60, 100)
    backend.note_off(60)
    backend.feed([(0xB0, 7, 99)])
    events = tu.handle_midi(st, midi.poll())
    kinds = [e[0] for e in events]
    assert kinds == ["note_on", "note_off"]
    assert st.default_volume == 99
    note = st.current_pattern().get(st.current_channel, 0)
    assert note is not None and note.pitch == 60


def test_column_aware_entry_volume_and_effect():
    st = TrackerState()
    st.edit_mode = True
    st.enter_note(60)
    st.current_row = 0
    # volume column rolling digits
    st.current_column = 1
    tu.handle_pattern_key(st, "9")
    tu.handle_pattern_key(st, "9")
    note = st.current_pattern().get(st.current_channel, 0)
    assert note.volume == 99
    tu.handle_pattern_key(st, "9")    # 999 -> clamp 127
    assert st.current_pattern().get(st.current_channel, 0).volume == 127
    # effect column letter then parameter digits
    st.current_column = 2
    assert tu.handle_pattern_key(st, "p")
    assert st.current_pattern().get(st.current_channel, 0).effect.kind == \
        "SetPan"
    st.current_column = 3
    tu.handle_pattern_key(st, "6")
    tu.handle_pattern_key(st, "4")
    assert st.current_pattern().get(st.current_channel, 0).effect.x == 64

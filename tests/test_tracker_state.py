"""Tracker editing/playback state vs tracker/state.rs behavior."""

from bonnie32_tpu.audio.state import TrackerState
from bonnie32_tpu.audio.song import Note


def events_sink(log):
    def sink(kind, channel, payload):
        log.append((kind, channel, payload))
    return sink


def test_pattern_bank_and_arrangement():
    t = TrackerState()
    assert t.pattern_length() == 64
    i1 = t.create_pattern()
    assert i1 == 1 and t.song.patterns[1].num_channels() == 4
    i2 = t.duplicate_pattern(0)
    assert i2 == 2
    t.arrangement_insert(1, 1)
    t.arrangement_insert(2, 2)
    assert t.song.arrangement == [0, 1, 2]
    # delete pattern 1: arrangement drops it, higher indices shift
    assert t.delete_pattern(1)
    assert t.song.arrangement == [0, 1]
    assert not t.delete_pattern(99)
    # move / set
    t.arrangement_move_down(0)
    assert t.song.arrangement == [1, 0]
    t.arrangement_move_up(1)
    assert t.song.arrangement == [0, 1]
    t.arrangement_set_pattern(0, 1)
    assert t.song.arrangement == [1, 1]
    assert t.arrangement_remove(1)
    assert not t.arrangement_remove(0)   # last entry protected


def test_pattern_length_and_channels():
    t = TrackerState()
    t.increase_pattern_length()
    assert t.pattern_length() == 80
    for _ in range(20):
        t.increase_pattern_length()
    assert t.pattern_length() == 256     # clamp
    t.current_row = 255
    for _ in range(20):
        t.decrease_pattern_length()
    assert t.pattern_length() == 16      # clamp
    assert t.current_row == 15           # cursor pulled in

    t.add_channel()
    assert t.num_channels() == 5
    assert t.current_pattern().num_channels() == 5
    t.remove_channel()
    assert t.num_channels() == 4


def test_cursor_wraps_columns_and_channels():
    t = TrackerState()
    assert (t.current_channel, t.current_column) == (0, 0)
    t.cursor_right()
    t.cursor_right()
    t.cursor_right()
    assert t.current_column == 3
    t.cursor_right()
    assert (t.current_channel, t.current_column) == (1, 0)
    t.cursor_left()
    assert (t.current_channel, t.current_column) == (0, 3)
    t.cursor_down()
    assert t.current_row == 1
    t.cursor_up()
    t.cursor_up()
    assert t.current_row == 0


def test_note_entry_and_selection_fill():
    log = []
    t = TrackerState(sink=events_sink(log))
    t.enter_note(60)
    n = t.current_pattern().get(0, 0)
    assert n.pitch == 60 and t.dirty
    assert log[-1] == ("note_on", 0, (60, 100))
    t.enter_note_off()
    assert t.current_pattern().get(0, 0).is_off
    t.delete_note()
    assert t.current_pattern().get(0, 0).is_empty

    # selection fill
    t.selection_start = (0, 2, 0)
    t.selection_end = (0, 4, 1)
    t.enter_note(64)
    for ch in (0, 1):
        for row in (2, 3, 4):
            assert t.current_pattern().get(ch, row).pitch == 64

    # copy / paste
    assert t.copy_selection()
    t.selection_start = t.selection_end = None
    t.current_row, t.current_channel = 10, 2
    assert t.paste()
    assert t.current_pattern().get(2, 11).pitch == 64
    assert t.current_pattern().get(3, 12).pitch == 64

    t.set_effect("Vibrato", 3, 4)
    eff = t.current_pattern().get(2, 10).effect
    assert eff.kind == "Vibrato" and (eff.x, eff.y) == (3, 4)


def test_playback_stepping_and_sustain():
    log = []
    t = TrackerState(sink=events_sink(log))
    p = t.current_pattern()
    p.set_length(16)
    p.set(0, 0, Note(pitch=60))
    p.set(0, 2, Note(pitch=60))   # same pitch -> sustained, no retrigger
    p.set(0, 4, Note(pitch=62))   # new pitch -> note_off + note_on
    p.set(0, 6, Note.off())
    p.set_reverb(1, 3)

    t.song.bpm = 120
    t.song.rows_per_beat = 4      # tick = 0.125 s
    t.toggle_playback()
    assert t.playing
    t.update_playback(0.125 * 8)  # play rows 0..7
    kinds = [e for e in log if e[0] != "reverb"]
    assert kinds[0] == ("note_on", 0, (60, 100))
    assert kinds[1] == ("note_off", 0, 60)
    assert kinds[2] == ("note_on", 0, (62, 100))
    assert kinds[3] == ("note_off", 0, 62)
    assert ("reverb", 0, 3) in log
    assert t.playback_row == 8

    # wraps pattern into next arrangement slot, loops at the end
    t.update_playback(0.125 * 8)
    assert t.playback_row == 0 and t.playback_pattern_idx == 0  # looped
    # view cursor follows playback
    assert t.current_row == 0

    t.stop_playback()
    assert not t.playing and ("all_off", 0, None) in log


def test_tap_tempo():
    t = TrackerState()
    assert t.tap_tempo(0.0) is None
    assert t.tap_tempo(0.5) == 120       # 0.5 s interval
    assert t.tap_tempo(1.0) == 120
    # reset after >2 s gap
    assert t.tap_tempo(10.0) is None
    # clamping
    t2 = TrackerState()
    t2.tap_tempo(0.0)
    assert t2.tap_tempo(0.05) == 300     # 1200 bpm clamps
    t3 = TrackerState()
    t3.tap_tempo(0.0)
    assert t3.tap_tempo(5.0) is None     # gap resets even the 2nd tap

def test_playback_applies_effects():
    """state.rs:946-1027 — the MIDI-control effect subset fires through
    the sink after the row's notes; SetSpeed mutates the song bpm."""
    from bonnie32_tpu.audio.song import Effect

    st = _state() if "_state" in dir() else None
    from bonnie32_tpu.audio.state import TrackerState
    from bonnie32_tpu.audio.song import Note, Pattern, Song

    pat = Pattern.new(8, 2)
    pat.channels[0][0] = Note(pitch=60, volume=90,
                              effect=Effect(kind="SetPan", x=32))
    pat.channels[1][0] = Note(pitch=48,
                              effect=Effect(kind="SlideUp", x=10))
    pat.channels[0][1] = Note(effect=Effect(kind="Vibrato", x=3, y=5))
    pat.channels[1][1] = Note(effect=Effect(kind="SetSpeed", x=150))
    song = Song(patterns=[pat], arrangement=[0],
                channel_instruments=[0, 0], bpm=120)

    events = []
    st = TrackerState(song=song, sink=lambda k, ch, p: events.append(
        (k, ch, p)))
    st.play_from_start()
    st._play_current_row()
    assert ("pan", 0, 32) in events
    assert ("pitch_bend", 1, 8192 + 640) in events
    # effects come after the notes
    assert events.index(("note_on", 0, (60, 90))) < \
        events.index(("pan", 0, 32))

    st._advance_playback()
    events.clear()
    st._play_current_row()
    assert ("modulation", 0, 40) in events
    assert song.bpm == 150

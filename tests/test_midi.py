"""MIDI input queue + MemoryStats accounting."""

import numpy as np

from bonnie32_tpu.input.midi import (ControlChange, MidiInput, NoteOff,
                                     NoteOn, VirtualMidiBackend)
from bonnie32_tpu.editor.state import MemoryStats


def test_midi_messages_and_held():
    be = VirtualMidiBackend()
    m = MidiInput(be)
    assert m.is_connected() and m.list_devices() == ["Virtual Keyboard"]

    be.note_on(60, 90)
    be.feed([(0xB1, 7, 100)])         # CC on channel 1
    msgs = m.poll()
    assert msgs == [NoteOn(60, 90), ControlChange(7, 100)]
    assert m.is_note_held(60)
    assert not m.is_note_held(61)

    be.note_off(60)
    assert m.poll() == [NoteOff(60)]
    assert not m.is_note_held(60)

    # velocity-0 note-on is a note-off (MIDI running status convention)
    be.feed([(0x90, 62, 100), (0x90, 62, 0), (0xF8, 0, 0)])  # 0xF8 ignored
    msgs = m.poll()
    assert msgs == [NoteOn(62, 100), NoteOff(62)]
    assert not m.is_note_held(62)
    assert m.poll() == []             # queue drained


def test_midi_drives_tracker():
    from bonnie32_tpu.audio.state import TrackerState
    be = VirtualMidiBackend()
    m = MidiInput(be)
    t = TrackerState()
    be.note_on(48)
    for msg in m.poll():
        if isinstance(msg, NoteOn):
            t.enter_note(msg.note)
    assert t.current_pattern().get(0, 0).pitch == 48


def test_memory_stats():
    s = MemoryStats()
    s.update_process_memory()
    assert s.physical_bytes > 1024 * 1024     # a real process RSS
    s.update_assets(textures=[np.zeros((64, 64)), np.zeros((32, 32))],
                    framebuffers=[np.zeros((240, 320))])
    assert s.texture_count == 2
    assert s.texture15_bytes == (64 * 64 + 32 * 32) * 2
    assert s.framebuffer_bytes == 240 * 320 * 8
    assert MemoryStats.format_bytes(512) == "512 B"
    assert MemoryStats.format_bytes(2048) == "2.0 KB"
    assert MemoryStats.format_bytes(3 * 1024 ** 2) == "3.0 MB"
    assert MemoryStats.format_bytes(int(1.5 * 1024 ** 3)) == "1.5 GB"
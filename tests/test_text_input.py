"""Text input state machine (ui/text_input.rs:6-260) + fb rendering."""

import numpy as np

from bonnie32_tpu.ops import raster_ref
from bonnie32_tpu.ui import (Rect, TextInputState, draw_text_input,
                             x_to_char_index)
from bonnie32_tpu.ui import font


def test_new_places_cursor_at_end():
    s = TextInputState.new("hello")
    assert s.cursor == 5 and s.selection_start is None and s.focused


def test_selection_range_is_ordered():
    s = TextInputState.new("abcdef")
    s.cursor, s.selection_start = 2, 5
    assert s.selection_range() == (2, 5)
    s.cursor, s.selection_start = 5, 2
    assert s.selection_range() == (2, 5)
    s.selection_start = None
    assert s.selection_range() is None


def test_has_selection_excludes_zero_width():
    s = TextInputState.new("abc")
    s.selection_start = s.cursor
    assert not s.has_selection()
    s.selection_start = 1
    assert s.has_selection()


def test_move_left_right_basic_and_clamped():
    s = TextInputState.new("ab")
    s.move_right()
    assert s.cursor == 2          # clamped at end
    s.move_left()
    s.move_left()
    assert s.cursor == 0
    s.move_left()
    assert s.cursor == 0          # clamped at start


def test_move_nonextend_collapses_selection_without_moving():
    # text_input.rs:72-77: left with a selection jumps to range start
    s = TextInputState.new("abcdef")
    s.cursor, s.selection_start = 4, 2
    s.move_left()
    assert s.cursor == 2 and s.selection_start is None
    s.cursor, s.selection_start = 2, 4
    s.move_right()
    assert s.cursor == 4 and s.selection_start is None


def test_move_extend_anchors_then_grows():
    s = TextInputState.new("abcdef")
    s.cursor = 3
    s.move_left(extend_selection=True)
    assert s.selection_range() == (2, 3)
    s.move_left(extend_selection=True)
    assert s.selection_range() == (1, 3)
    # releasing shift collapses to start
    s.move_left()
    assert s.cursor == 1 and not s.has_selection()


def test_home_end_select_all():
    s = TextInputState.new("abcdef")
    s.cursor = 3
    s.move_home(extend_selection=True)
    assert s.selection_range() == (0, 3)
    s.move_end()
    assert s.cursor == 6 and not s.has_selection()
    s.select_all()
    assert s.selection_range() == (0, 6)


def test_word_boundaries_and_double_click_select():
    s = TextInputState.new("foo bar_baz qux")
    assert s.word_boundaries(1) == (0, 3)
    assert s.word_boundaries(6) == (4, 11)     # '_' is a word char
    # on the space: the backward scan still consumes the preceding word
    # (text_input.rs:162-169), forward stops immediately
    assert s.word_boundaries(3) == (0, 3)
    s.cursor = 5
    s.select_word_at_cursor()
    assert s.selected_text() == "bar_baz"


def test_insert_replaces_selection():
    s = TextInputState.new("hello world")
    s.cursor, s.selection_start = 5, 0
    s.insert("goodbye")
    assert s.text == "goodbye world" and s.cursor == 7
    assert not s.has_selection()


def test_backspace_delete_and_selection_variants():
    s = TextInputState.new("abc")
    s.backspace()
    assert s.text == "ab" and s.cursor == 2
    s.cursor = 0
    s.delete()
    assert s.text == "b"
    s.delete()
    s.delete()                                  # at end: no-op
    assert s.text == "" and s.cursor == 0
    s.backspace()                               # at start: no-op
    assert s.text == ""
    s = TextInputState.new("abcdef")
    s.cursor, s.selection_start = 2, 4
    s.backspace()
    assert s.text == "abef" and s.cursor == 2


def test_handle_key_stream_types_text():
    s = TextInputState.new("")
    for ch in "hi there":
        assert s.handle_key(ch)
    assert s.text == "hi there"
    assert s.handle_key("a", ctrl=True) is False   # select-all: no change
    assert s.selection_range() == (0, 8)
    assert s.handle_key("x")                        # replaces everything
    assert s.text == "x"


def test_handle_click_double_click_selects_word():
    s = TextInputState.new("foo bar")
    s.handle_click(5, now=1.0)
    assert s.cursor == 5 and not s.has_selection()
    s.handle_click(5, now=1.2)                      # within 0.4s window
    assert s.selected_text() == "bar"
    # a slow second click just moves the cursor
    s.handle_click(1, now=5.0)
    s.handle_click(1, now=6.0)
    assert not s.has_selection()
    # shift-click extends
    s.handle_click(3, now=10.0, shift=True)
    assert s.selection_range() == (1, 3)


def test_x_to_char_index_round_trips_caret_positions():
    text = "hello"
    for i in range(len(text) + 1):
        w = font.text_size(text[:i])[0] if i else 0
        assert x_to_char_index(text, 10.0, 10.0 + w) == i
    assert x_to_char_index(text, 10.0, 0.0) == 0
    assert x_to_char_index(text, 10.0, 1e6) == len(text)


def test_draw_text_input_paints_and_edits():
    fb = raster_ref.new_framebuffer(40, 120)
    s = TextInputState.new("ab")
    fb, changed = draw_text_input(
        fb, Rect(4, 4, 100, 16), s,
        keys=[("c", False, False), ("left", True, False)], dt=0.01)
    assert changed and s.text == "abc"
    assert s.selection_range() == (2, 3)
    img = np.asarray(fb.color)
    # border + background painted inside the rect
    assert img[4, 4] != img[0, 0]
    assert (img[5:19, 5:103] != img[0, 0]).any()

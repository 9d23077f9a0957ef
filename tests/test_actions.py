"""Action/shortcut framework (ui/actions.rs + modeler/actions.rs)."""

import pytest

from bonnie32_tpu.ui.actions import (Action, ActionContext, ActionRegistry,
                                     Shortcut, create_modeler_actions)


def _ctx(keys=(), ctrl=False, shift=False, alt=False, flags=(),
         text_editing=False):
    return ActionContext(flags=set(flags), text_editing=text_editing,
                         pressed_keys=set(keys), ctrl=ctrl, shift=shift,
                         alt=alt)


def test_shortcut_display():
    assert Shortcut.with_ctrl("s").display() == "Ctrl+S"
    assert Shortcut.ctrl_shift("z").display() == "Ctrl+Shift+Z"
    assert Shortcut.key("g").display() == "G"
    assert Shortcut.with_alt("escape").display() == "Alt+Escape"


def test_trigger_requires_exact_modifiers():
    r = create_modeler_actions()
    assert r.triggered("file.save", _ctx(keys={"s"}, ctrl=True))
    # Ctrl+Shift+S must NOT fire plain save (exact modifier match)
    assert not r.triggered("file.save", _ctx(keys={"s"}, ctrl=True,
                                             shift=True))
    assert r.triggered("file.save_as", _ctx(keys={"s"}, ctrl=True,
                                            shift=True))


def test_text_editing_suppresses_everything():
    r = create_modeler_actions()
    ctx = _ctx(keys={"s"}, ctrl=True, text_editing=True)
    assert not r.triggered("file.save", ctx)
    assert not r.is_enabled("file.save", ctx)


def test_context_sensitive_enabling():
    r = create_modeler_actions()
    no_sel = _ctx(keys={"g"})
    with_sel = _ctx(keys={"g"}, flags={"has_selection"})
    assert not r.triggered("transform.grab", no_sel)
    assert r.triggered("transform.grab", with_sel)
    assert r.tooltip("transform.grab") == "Grab (G)"


def test_rebind_with_conflict_check():
    r = create_modeler_actions()
    with pytest.raises(ValueError):
        r.rebind("file.open", Shortcut.with_ctrl("s"))   # taken by save
    r.rebind("file.open", Shortcut.with_ctrl("p"))
    assert r.triggered("file.open", _ctx(keys={"p"}, ctrl=True))
    assert not r.triggered("file.open", _ctx(keys={"o"}, ctrl=True))
    r.reset_shortcut("file.open")
    assert r.triggered("file.open", _ctx(keys={"o"}, ctrl=True))


def test_triggered_ids_and_categories():
    r = create_modeler_actions()
    fired = r.triggered_ids(_ctx(keys={"z"}, ctrl=True,
                                 flags={"has_selection"}))
    assert fired == ["edit.undo"]
    cats = r.by_category()
    assert "File" in cats and "Transform" in cats
    assert any(a.id == "mesh.extrude" for a in cats["Mesh"])


def test_editor_actions_flags_and_predicates():
    from bonnie32_tpu.ui.actions import (ActionContext,
                                         create_editor_actions)

    r = create_editor_actions()
    assert len(r.actions) == 24
    ctx = ActionContext()
    # predicates gate correctly
    assert not r.is_enabled("edit.undo", ctx)
    ctx.can_undo = True
    assert r.is_enabled("edit.undo", ctx)
    assert not r.is_enabled("room.delete", ctx)
    ctx.with_flag("room_selected")
    assert r.is_enabled("room.delete", ctx)
    assert r.is_enabled("room.duplicate", ctx)
    # copy needs an object or sector selection
    assert not r.is_enabled("edit.copy", ctx)
    ctx.with_flag("sector_selected")
    assert r.is_enabled("edit.copy", ctx)
    assert r.is_enabled("sector.raise_floor", ctx)
    # shortcut dispatch
    ctx.pressed_keys = {"s"}
    ctx.ctrl = True
    assert r.triggered("file.save", ctx)
    ctx.shift = True
    assert not r.triggered("file.save", ctx)
    assert r.triggered("file.save_as", ctx)


def test_tracker_actions_navigation_and_notes():
    from bonnie32_tpu.ui.actions import (ActionContext,
                                         create_tracker_actions)

    r = create_tracker_actions()
    ctx = ActionContext(pressed_keys={"space"})
    assert r.triggered("playback.toggle", ctx)
    # shift+tab is prev channel, tab alone is next
    ctx = ActionContext(pressed_keys={"tab"})
    assert r.triggered("nav.next_channel", ctx)
    assert not r.triggered("nav.prev_channel", ctx)
    ctx.shift = True
    assert r.triggered("nav.prev_channel", ctx)
    assert not r.triggered("nav.next_channel", ctx)
    # note entry actions need the note column
    ctx = ActionContext(pressed_keys={"delete"})
    assert not r.triggered("note.delete", ctx)
    ctx.with_flag("note_column")
    assert r.triggered("note.delete", ctx)
    # text editing suppresses everything (ui/actions.rs:336)
    ctx.text_editing = True
    assert not r.triggered("note.delete", ctx)

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

"""App shell: tools, project data, pending ops, auth, level browser."""

import os

from bonnie32_tpu.app import (AppState, AuthState, PendingOps, ProjectData,
                              Tool)
from bonnie32_tpu.editor.browser import (BrowserAction, LevelBrowser,
                                         LevelCategory, discover_from_manifest,
                                         discover_sample_levels)
from bonnie32_tpu.models.level import load_level
from bonnie32_tpu import storage as sto

SAMPLES = "/root/reference/assets/samples/levels"


def test_tool_tabs():
    assert Tool.labels() == ["Home", "World", "Test", "Assets", "Music",
                             "Input"]
    assert Tool.from_index(3) == Tool.MODELER
    assert Tool.from_index(99) is None
    assert Tool.MODELER.value == 3


def test_app_state_and_tab_switch():
    class FakeLib:
        reloads = 0

        def reload_all(self):
            FakeLib.reloads += 1

    app = AppState(asset_library=FakeLib())
    assert app.active_tool == Tool.HOME
    app.set_active_tool(Tool.WORLD_EDITOR)
    assert app.prev_tool == Tool.HOME
    assert FakeLib.reloads == 1           # hot reload on entering World
    app.set_active_tool(Tool.WORLD_EDITOR)
    assert FakeLib.reloads == 1           # no-op when already active
    app.set_active_tool(Tool.TRACKER)
    assert FakeLib.reloads == 1
    assert app.active_tool_index() == 4
    # all tool states alive
    assert app.world_editor is not None and app.modeler is not None
    assert app.tracker.pattern_length() == 64


def test_auth_state_and_storage_switch(tmp_path):
    app = AppState(storage=sto.Storage(local=sto.LocalStorage(str(tmp_path))))
    email = [None]
    app.auth.provider = lambda: email[0]
    assert not app.update_auth()
    email[0] = "dev@example.com"
    assert app.update_auth()
    assert app.auth.authenticated and app.storage.has_cloud()
    assert not app.update_auth()          # no change
    email[0] = None
    assert app.update_auth()
    assert not app.storage.has_cloud()
    app.auth.authenticated = True
    app.auth.sign_out()
    assert not app.auth.authenticated


def test_pending_ops(tmp_path):
    p = str(tmp_path / "x.bin")
    ops = PendingOps()
    assert not ops.is_busy()
    ops.save = sto.save_async(p, b"abc")
    assert ops.is_busy()
    ops.save.wait()
    assert ops.poll() is None
    assert ops.status_message == "Saved" and ops.save is None
    ops.load = sto.load_async(p)
    ops.load.wait()
    assert ops.poll() == b"abc"
    ops.clear_status()
    assert ops.status_message is None


def test_discover_sample_levels():
    levels = discover_sample_levels(SAMPLES)
    names = [l.name for l in levels]
    assert "Cave" in names and "Dungeon" in names
    assert names == sorted(names)
    assert all(l.category == LevelCategory.SAMPLE for l in levels)
    assert discover_sample_levels("/nonexistent") == []


def test_discover_from_manifest(tmp_path):
    (tmp_path / "manifest.txt").write_text("B.ron\nA.ron\nskip.txt\n")
    levels = discover_from_manifest(str(tmp_path))
    assert [l.name for l in levels] == ["A", "B"]


def test_level_browser_flow(tmp_path):
    storage = sto.Storage(local=sto.LocalStorage(str(tmp_path)))
    # put a fake user level where the userdata listing finds it
    storage.write_sync("assets/userdata/levels/My.ron", b"(rooms: [])")

    b = LevelBrowser()
    samples = discover_sample_levels(SAMPLES)
    b.open(samples, storage)
    assert b.open_flag
    b.poll()
    assert not b.is_loading_user_levels()
    assert any(l.category == LevelCategory.USER and l.name == "My"
               for l in b.entries())

    # select + load a real sample through the actual loader
    cave_idx = next(i for i, l in enumerate(b.entries())
                    if l.name == "Cave")
    b.select(cave_idx)
    assert b.is_sample_selected() and not b.is_user_selected()
    level = b.load_selected(load_level)
    assert level is not None and len(level.rooms) == 2
    assert not b.open_flag                 # closes after load
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

# ---------------------------------------------------------------------------
# Editor action dispatch (main.rs:2533) + EditorLayoutConfig persistence
# ---------------------------------------------------------------------------

def test_editor_action_save_open_roundtrip(tmp_path):
    import numpy as np

    from bonnie32_tpu.app import AppState, handle_editor_action
    from bonnie32_tpu.editor.layout import EditorLayout
    from bonnie32_tpu.models.level import Room, TextureRef

    app = AppState()
    room = Room.new(0, (0.0, 0.0, 0.0), 3, 3)
    room.set_floor(1, 1, 256.0, TextureRef("p", "T"))
    room.recalculate_bounds()
    app.world_editor.level.add_room(room)
    app.world_editor.orbit_distance = 1234.0
    app.world_editor.grid_zoom = 0.42
    layout = EditorLayout()
    layout.main_split.ratio = 0.31

    p = str(tmp_path / "lvl.ron")
    assert handle_editor_action(app, "save_as", path=p, layout=layout)
    assert app.world_editor.current_file == p
    assert "Saved" in app.world_editor.status_message

    # mutate, then load back: camera + grid + splits restore from the file
    app.world_editor.orbit_distance = 9.0
    app.world_editor.grid_zoom = 9.0
    layout.main_split.ratio = 0.9
    assert handle_editor_action(app, "open", path=p, layout=layout)
    ws = app.world_editor
    assert ws.orbit_distance == 1234.0
    assert abs(ws.grid_zoom - 0.42) < 1e-6
    assert abs(layout.main_split.ratio - 0.31) < 1e-6
    assert ws.level.rooms[-1].get_sector(1, 1).floor.heights[0] == 256.0
    assert app.project.level is ws.level       # live-sync source swapped


def test_editor_action_new_resets(tmp_path):
    from bonnie32_tpu.app import AppState, handle_editor_action

    app = AppState()
    app.world_editor.dirty = True
    assert handle_editor_action(app, "new")
    assert app.world_editor.dirty is False
    assert "new level" in app.world_editor.status_message

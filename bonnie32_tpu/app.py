"""Application shell: tools, shared project data, pending ops, auth glue.

Reference behavior: `/root/reference/src/app.rs` — Tool tab set (:63),
PendingOps (:22), AppState with per-tool persistent state, tab switching
with asset hot-reload (:230); `/root/reference/src/project.rs` —
ProjectData as the single source of truth all editors share;
`/root/reference/src/auth/mod.rs` — AuthState (the OAuth transport is a
pluggable callable here; this environment has no egress).

Headless: the per-frame loop is `poll()` + tool dispatch by the host.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Callable, List, Optional

from .audio.state import TrackerState
from .editor import EditorState
from .models.level import Level, create_empty_level
from .models.modeler import ModelerState
from .storage import PendingLoad, PendingSave, Storage


class Tool(enum.Enum):
    """app.rs:63 — fixed tab set, all tools persist in the background."""

    HOME = 0
    WORLD_EDITOR = 1
    TEST = 2
    MODELER = 3
    TRACKER = 4
    INPUT_TEST = 5

    @property
    def label(self) -> str:
        return {Tool.HOME: "Home", Tool.WORLD_EDITOR: "World",
                Tool.TEST: "Test", Tool.MODELER: "Assets",
                Tool.TRACKER: "Music", Tool.INPUT_TEST: "Input"}[self]

    @classmethod
    def labels(cls) -> List[str]:
        return [t.label for t in cls]

    @classmethod
    def from_index(cls, i: int) -> Optional["Tool"]:
        try:
            return list(cls)[i]
        except IndexError:
            return None


@dataclasses.dataclass
class PendingOps:
    """app.rs:22 — fire-and-poll operations surfaced in the status bar."""

    save: Optional[PendingSave] = None
    load: Optional[PendingLoad] = None
    modeler_save: Optional[PendingSave] = None
    status_message: Optional[str] = None

    def is_busy(self) -> bool:
        return any(op is not None
                   for op in (self.save, self.load, self.modeler_save))

    def clear_status(self) -> None:
        self.status_message = None

    def poll(self) -> Optional[bytes]:
        """Clear finished ops; returns loaded bytes when a load completed
        (main.rs:1674 poll_pending_ops)."""
        loaded = None
        for name in ("save", "modeler_save"):
            op = getattr(self, name)
            if op is not None and op.is_complete():
                try:
                    op.take()
                    self.status_message = "Saved"
                except Exception as e:  # noqa: BLE001
                    self.status_message = f"Save failed: {e}"
                setattr(self, name, None)
        if self.load is not None and self.load.is_complete():
            try:
                loaded = self.load.take()
                self.status_message = "Loaded"
            except Exception as e:  # noqa: BLE001
                self.status_message = f"Load failed: {e}"
            self.load = None
        return loaded


@dataclasses.dataclass
class AuthState:
    """auth/mod.rs:9 — authenticated flag + user identity.

    The OAuth flow (localhost callback + PKCE on native, JS FFI on web) is
    a transport; it plugs in via `provider() -> Optional[user_email]`.
    Zero-egress builds stay signed out unless a provider is installed.
    """

    authenticated: bool = False
    user_email: Optional[str] = None
    provider: Optional[Callable[[], Optional[str]]] = None

    def update(self) -> None:
        if self.provider is None:
            return
        email = self.provider()
        self.authenticated = email is not None
        self.user_email = email

    def sign_out(self) -> None:
        self.authenticated = False
        self.user_email = None


class ProjectData:
    """project.rs:20 — single source of truth shared by every tool."""

    def __init__(self, level: Optional[Level] = None):
        self.level = level if level is not None else Level()
        self.models: List[Any] = []    # RiggedModel
        self.meshes: List[Any] = []    # EditableMesh
        self.songs: List[Any] = []     # Song

    @classmethod
    def with_starter_level(cls) -> "ProjectData":
        return cls(create_empty_level())


class AppState:
    """app.rs:128 — all tool states, alive across tab switches."""

    def __init__(self, level: Optional[Level] = None,
                 asset_library=None, storage: Optional[Storage] = None):
        self.active_tool = Tool.HOME
        self.prev_tool = Tool.HOME
        self.storage = storage if storage is not None else Storage()
        self.project = ProjectData(level)
        self.world_editor = EditorState(self.project.level)
        self.modeler = ModelerState()
        self.tracker = TrackerState()
        self.asset_library = asset_library
        self.auth = AuthState()
        self.pending_ops = PendingOps()
        from .ui.landing import LandingState
        self.landing = LandingState()
        # per-tool screen layout state (main.rs keeps these on the app)
        from .editor.layout import EditorLayout
        from .models.modeler_layout import ModelerLayout
        from .audio.tracker_ui import TrackerTab
        self.editor_layout = EditorLayout()
        self.modeler_layout = ModelerLayout()
        self.tracker_tab = TrackerTab.PATTERN
        self.tracker_sel: dict = {}
        self.tracker_presets: list = []
        self.textures: list = []      # pack textures for the editor palette

    def update_auth(self) -> bool:
        """app.rs:209 — returns True when the auth state flipped (and the
        storage backend was switched)."""
        was = self.auth.authenticated
        self.auth.update()
        if self.auth.authenticated != was:
            self.storage.update_for_auth(self.auth.authenticated)
            return True
        return False

    def set_active_tool(self, tool: Tool) -> None:
        """app.rs:230 — hot-reloads assets when entering the world editor
        so modeler edits are immediately visible."""
        if tool == self.active_tool:
            return
        self.prev_tool = self.active_tool
        self.active_tool = tool
        if tool == Tool.WORLD_EDITOR and self.asset_library is not None:
            reload_all = getattr(self.asset_library, "reload_all", None)
            if reload_all is not None:
                reload_all()

    def active_tool_index(self) -> int:
        return self.active_tool.value


DEFAULT_LEVEL_DIR = "assets/userdata/levels"


def handle_editor_action(app: AppState, action: str, path=None,
                         layout=None) -> bool:
    """main.rs:2533 handle_editor_action, headless: the OS file dialogs
    become explicit `path` arguments (the level browser supplies them).

    Actions: "new" | "save" | "save_as" | "open" | "play".
    Returns True when the action changed app state."""
    import os

    from .models.level import create_empty_level, load_level, save_level

    ws = app.world_editor

    if action == "play":
        ws.set_status("Game preview coming soon", 2.0)   # main.rs:2540
        return False

    if action == "new":
        from .editor.state import EditorState

        app.world_editor = EditorState(create_empty_level())
        app.world_editor.apply_layout_config(layout)
        app.world_editor.set_status("Created new level", 3.0)
        app.project.level = app.world_editor.level
        return True

    if action in ("save", "save_as"):
        if action == "save" and path is None:
            path = ws.current_file
        if path is None:
            path = os.path.join(DEFAULT_LEVEL_DIR, "level.ron")
        ws.store_layout_config(layout)
        try:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            save_level(ws.level, path)
        except OSError as e:
            ws.set_status(f"Save failed: {e}", 5.0)
            return False
        ws.current_file = path
        ws.dirty = False
        ws.set_status(f"Saved ({app.storage.mode().label}) {path}", 3.0)
        return True

    if action == "open":
        if path is None:
            return False
        try:
            level = load_level(path)
        except (OSError, ValueError, KeyError) as e:
            ws.set_status(f"Load failed: {e}", 5.0)
            return False
        ws.load_level(level, path)
        ws.apply_layout_config(layout)
        ws.set_status(f"Loaded {path}", 3.0)
        app.project.level = ws.level
        return True

    return False

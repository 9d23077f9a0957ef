"""Level discovery + open/save browser state.

Reference behavior: `/root/reference/src/editor/sample_levels.rs`
(LevelCategory/LevelInfo, directory + manifest discovery, user-level
discovery via Storage) and `/root/reference/src/editor/level_browser.rs`
(modal browser with sample/user tabs, async user listing, preview).
"""

from __future__ import annotations

import dataclasses
import enum
import os
from typing import Callable, List, Optional

from ..storage import Storage, StorageError, StorageHandle


class LevelCategory(enum.Enum):
    """sample_levels.rs:18."""

    SAMPLE = "sample"
    USER = "user"


@dataclasses.dataclass
class LevelInfo:
    """sample_levels.rs:26 — metadata without loading the level."""

    name: str
    path: str
    category: LevelCategory


def discover_sample_levels(levels_dir: str) -> List[LevelInfo]:
    """sample_levels.rs:37 — .ron files in the samples dir, sorted."""
    out: List[LevelInfo] = []
    try:
        entries = os.listdir(levels_dir)
    except OSError:
        return out
    for name in entries:
        path = os.path.join(levels_dir, name)
        if os.path.isfile(path) and name.endswith(".ron"):
            out.append(LevelInfo(name=name[:-4], path=path,
                                 category=LevelCategory.SAMPLE))
    out.sort(key=lambda i: i.name)
    return out


def discover_from_manifest(levels_dir: str,
                           manifest_name: str = "manifest.txt"
                           ) -> List[LevelInfo]:
    """The WASM path can't list directories; build.rs writes a
    manifest.txt per asset dir instead (build.rs; sample_levels.rs:66)."""
    out: List[LevelInfo] = []
    try:
        with open(os.path.join(levels_dir, manifest_name)) as f:
            names = [ln.strip() for ln in f if ln.strip()]
    except OSError:
        return out
    for name in names:
        if name.endswith(".ron"):
            out.append(LevelInfo(name=name[:-4],
                                 path=os.path.join(levels_dir, name),
                                 category=LevelCategory.SAMPLE))
    out.sort(key=lambda i: i.name)
    return out


USER_LEVELS_PATH = "assets/userdata/levels"


def discover_user_levels(storage: Storage) -> StorageHandle:
    """Async user-level listing (cloud when authenticated)."""
    return storage.list(USER_LEVELS_PATH)


class BrowserAction(enum.Enum):
    """level_browser.rs:219."""

    NONE = "none"
    LOAD = "load"
    DELETE = "delete"
    CANCEL = "cancel"


class LevelBrowser:
    """level_browser.rs:15 — modal open browser with sample/user tabs."""

    def __init__(self):
        self.open_flag = False
        self.samples: List[LevelInfo] = []
        self.user_levels: List[LevelInfo] = []
        self.selected: Optional[int] = None          # index into combined
        self.preview = None                          # loaded Level
        self._pending_user: Optional[StorageHandle] = None
        self._pending_preview: Optional[StorageHandle] = None

    # --- lifecycle -----------------------------------------------------

    def open(self, samples: List[LevelInfo],
             storage: Optional[Storage] = None) -> None:
        """Open the dialog; kick off the async user listing when a storage
        is provided (level_browser.rs:89-104)."""
        self.open_flag = True
        self.samples = list(samples)
        self.user_levels = []
        self.selected = None
        self.preview = None
        if storage is not None:
            self._pending_user = discover_user_levels(storage)

    def close(self) -> None:
        self.open_flag = False
        self.preview = None
        self._pending_user = None
        self._pending_preview = None

    # --- async polling ---------------------------------------------------

    def is_loading_user_levels(self) -> bool:
        return self._pending_user is not None and \
            self._pending_user.is_pending()

    def poll(self) -> None:
        """Fold finished async listings into the tabs."""
        if self._pending_user is not None and self._pending_user.is_ready():
            try:
                names = self._pending_user.take()
                self.user_levels = [
                    LevelInfo(name=n[:-4] if n.endswith(".ron") else n,
                              path=f"{USER_LEVELS_PATH}/{n}",
                              category=LevelCategory.USER)
                    for n in sorted(names)]
            except StorageError:
                self.user_levels = []
            self._pending_user = None

    # --- selection ------------------------------------------------------------

    def entries(self) -> List[LevelInfo]:
        return self.samples + self.user_levels

    def select(self, index: int) -> None:
        if 0 <= index < len(self.entries()):
            self.selected = index
            self.preview = None

    def selected_level(self) -> Optional[LevelInfo]:
        es = self.entries()
        if self.selected is None or self.selected >= len(es):
            return None
        return es[self.selected]

    def is_sample_selected(self) -> bool:
        s = self.selected_level()
        return s is not None and s.category == LevelCategory.SAMPLE

    def is_user_selected(self) -> bool:
        s = self.selected_level()
        return s is not None and s.category == LevelCategory.USER

    def load_selected(self, loader: Callable[[str], object]):
        """Load the selected entry with `loader` (models.level.load_level);
        returns the Level or None."""
        info = self.selected_level()
        if info is None:
            return None
        level = loader(info.path)
        self.close()
        return level

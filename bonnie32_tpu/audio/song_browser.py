"""Song browser: modal open/new dialog with sample + user tabs.

`/root/reference/src/tracker/song_browser.rs` — SongCategory (:28),
SongInfo (:38), SongBrowserAction (:49), SongBrowser state (:69),
directory discovery (:579), next_available_song_name (:607).  Shares the
fire-and-poll async listing pattern with editor/browser.py's
LevelBrowser (the reference duplicates it; here the plumbing really is
the same Storage handle machinery).
"""

import enum
import os
from dataclasses import dataclass
from typing import Callable, List, Optional

from ..storage import Storage, StorageError, StorageHandle

USER_SONGS_PATH = "assets/userdata/songs"


class SongCategory(enum.Enum):
    """song_browser.rs:28."""

    SAMPLE = "sample"
    USER = "user"


@dataclass
class SongInfo:
    """song_browser.rs:38."""

    name: str
    path: str
    category: SongCategory


class SongBrowserAction(enum.Enum):
    """song_browser.rs:49."""

    NONE = "none"
    SELECT_PREVIEW = "select_preview"
    OPEN_SONG = "open_song"
    NEW_SONG = "new_song"
    CANCEL = "cancel"
    TOGGLE_PREVIEW = "toggle_preview"
    DELETE_SONG = "delete_song"
    REFRESH = "refresh"


def discover_songs_from_dir(path: str,
                            category: SongCategory) -> List[SongInfo]:
    """song_browser.rs:579 — *.ron files sorted by stem."""
    out = []
    try:
        for name in os.listdir(path):
            if name.endswith(".ron"):
                out.append(SongInfo(name=name[:-4],
                                    path=os.path.join(path, name),
                                    category=category))
    except OSError:
        return []
    out.sort(key=lambda s: s.name)
    return out


def next_available_song_name(samples: List[SongInfo],
                             user_songs: List[SongInfo]) -> str:
    """song_browser.rs:607 — song_NNN.ron above the highest existing
    number across BOTH lists (cloud-safe: derives from listings, not the
    local filesystem)."""
    highest = 0
    for s in list(samples) + list(user_songs):
        if s.name.startswith("song_"):
            try:
                highest = max(highest, int(s.name[5:]))
            except ValueError:
                pass
    return f"{USER_SONGS_PATH}/song_{highest + 1:03d}.ron"


class SongBrowser:
    """song_browser.rs:69 — selection + async user listing state."""

    def __init__(self):
        self.open_flag = False
        self.samples: List[SongInfo] = []
        self.user_songs: List[SongInfo] = []
        self.selected: Optional[int] = None
        self.preview = None                    # loaded Song
        self.preview_playing = False
        self._pending_user: Optional[StorageHandle] = None

    # --- lifecycle ------------------------------------------------------

    def open(self, samples: List[SongInfo],
             storage: Optional[Storage] = None) -> None:
        self.open_flag = True
        self.samples = list(samples)
        self.user_songs = []
        self.selected = None
        self.preview = None
        self.preview_playing = False
        if storage is not None:
            self._pending_user = storage.list(USER_SONGS_PATH)

    def close(self) -> None:
        self.open_flag = False
        self.preview = None
        self.preview_playing = False
        self._pending_user = None

    # --- async polling --------------------------------------------------

    def is_loading_user_songs(self) -> bool:
        return self._pending_user is not None \
            and self._pending_user.is_pending()

    def poll(self) -> None:
        if self._pending_user is not None and self._pending_user.is_ready():
            try:
                names = self._pending_user.take()
                self.user_songs = [
                    SongInfo(name=n[:-4] if n.endswith(".ron") else n,
                             path=f"{USER_SONGS_PATH}/{n}",
                             category=SongCategory.USER)
                    for n in sorted(names)]
            except StorageError:
                self.user_songs = []
            self._pending_user = None

    # --- selection ------------------------------------------------------

    def entries(self) -> List[SongInfo]:
        return self.samples + self.user_songs

    def select(self, index: int) -> None:
        if 0 <= index < len(self.entries()):
            self.selected = index
            self.preview = None
            self.preview_playing = False

    def selected_song(self) -> Optional[SongInfo]:
        es = self.entries()
        if self.selected is None or self.selected >= len(es):
            return None
        return es[self.selected]

    def is_sample_selected(self) -> bool:
        s = self.selected_song()
        return s is not None and s.category == SongCategory.SAMPLE

    def is_user_selected(self) -> bool:
        s = self.selected_song()
        return s is not None and s.category == SongCategory.USER

    def set_preview(self, song) -> None:
        """song_browser.rs:172."""
        self.preview = song

    def load_selected(self, loader: Callable[[str], object]):
        """Open flow: load with audio.song.load_song, close the dialog."""
        info = self.selected_song()
        if info is None:
            return None
        song = loader(info.path)
        self.close()
        return song

    def delete_selected(self, storage: Storage) -> bool:
        """DeleteSong: user songs only (song_browser.rs delete arm)."""
        info = self.selected_song()
        if info is None or info.category != SongCategory.USER:
            return False
        try:
            storage.delete_sync(info.path)
        except StorageError:
            return False
        self.user_songs = [s for s in self.user_songs
                           if s.path != info.path]
        self.selected = None
        return True

"""Asset system: component-based assets + library.

Host-side mirror of `/root/reference/src/asset/` with the same RON schema:
  * AssetComponent enum (component.rs:18): Mesh{parts}, Collision{shape,
    is_trigger}, Light{color,intensity,radius,offset}, Trigger, Pickup,
    Enemy, Door, Audio, Particle, SpawnPoint{is_player,respawns},
    Skeleton{bones} — parsed generically (tag + payload) with typed
    accessors for the components the runtime consumes.
  * Asset (asset.rs:85): id/name/components/category/description/tags.
  * AssetLibrary (library.rs): directory discovery (brotli-RON files),
    lookup by id, hot reload.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

from ..io import brotli_io, ron
from ..io.ron import Tag
from .mesh import MeshPart


@dataclasses.dataclass
class AssetComponent:
    """Generic tagged component; `data` holds the RON payload dict."""

    kind: str
    data: dict

    @classmethod
    def from_ron(cls, v):
        if isinstance(v, Tag):
            payload = v.value if isinstance(v.value, dict) else {"value": v.value}
            return cls(kind=v.name, data=payload or {})
        raise ValueError(f"bad component: {v!r}")

    def to_ron(self):
        if self.kind == "Mesh" and "parts_obj" in self.data:
            return Tag("Mesh", {"parts": [p.to_ron()
                                          for p in self.data["parts_obj"]]})
        return Tag(self.kind, self.data if self.data else None)


@dataclasses.dataclass
class Asset:
    """asset.rs:85."""

    id: int
    name: str
    components: List[AssetComponent]
    category: str = ""
    description: str = ""
    tags: List[str] = dataclasses.field(default_factory=list)
    is_builtin: bool = False

    def mesh(self) -> Optional[List[MeshPart]]:
        """First Mesh component's parts (asset.rs:192)."""
        for c in self.components:
            if c.kind == "Mesh":
                if "parts_obj" not in c.data:
                    c.data["parts_obj"] = [MeshPart.from_ron(p)
                                           for p in c.data.get("parts", [])]
                return c.data["parts_obj"]
        return None

    def light_component(self):
        """First Light component as (color, intensity, radius, offset)
        (scene.rs:44-62 consumption shape)."""
        for c in self.components:
            if c.kind == "Light":
                d = c.data
                color = tuple(int(x) for x in d.get("color", (255, 255, 255)))
                offset = tuple(float(x) for x in d.get("offset", (0.0, 0.0, 0.0)))
                return (color, float(d.get("intensity", 1.0)),
                        float(d.get("radius", 0.0)), offset)
        return None

    def has_spawn_point(self, is_player: bool) -> bool:
        """asset.rs:279."""
        for c in self.components:
            if c.kind == "SpawnPoint":
                if bool(c.data.get("is_player", False)) == is_player:
                    return True
        return False

    def collision_component(self) -> Optional[dict]:
        for c in self.components:
            if c.kind == "Collision":
                return c.data
        return None

    @classmethod
    def from_ron(cls, d):
        return cls(
            id=int(d.get("id", 0)),
            name=d.get("name", ""),
            components=[AssetComponent.from_ron(c)
                        for c in d.get("components", [])],
            category=d.get("category", ""),
            description=d.get("description", ""),
            tags=list(d.get("tags", [])),
            is_builtin=bool(d.get("is_builtin", False)),
        )

    def to_ron(self):
        return {"id": self.id, "name": self.name,
                "components": [c.to_ron() for c in self.components],
                "category": self.category, "description": self.description,
                "tags": self.tags, "is_builtin": self.is_builtin}


def parse_asset(data: bytes) -> Asset:
    return Asset.from_ron(ron.loads(brotli_io.maybe_decompress(data)))


def load_asset(path) -> Asset:
    with open(path, "rb") as f:
        return parse_asset(f.read())


def save_asset(asset: Asset, path, quality: int = 6):
    text = ron.dumps(asset.to_ron())
    with open(path, "wb") as f:
        f.write(brotli_io.compress(text.encode(), quality=quality))


# ----------------------------------------------------------------------------
# Built-in assets (asset/library.rs creates player_spawn, point_light, ...)
# ----------------------------------------------------------------------------

PLAYER_SPAWN_ID = 1
POINT_LIGHT_ID = 2
CHECKPOINT_ID = 3


def builtin_assets() -> List[Asset]:
    return [
        Asset(id=PLAYER_SPAWN_ID, name="player_spawn", is_builtin=True,
              components=[AssetComponent("SpawnPoint",
                                         {"is_player": True, "respawns": False})]),
        Asset(id=POINT_LIGHT_ID, name="point_light", is_builtin=True,
              components=[AssetComponent("Light", {
                  "color": (255, 220, 160), "intensity": 1.0,
                  "radius": 4096.0, "offset": (0.0, 0.0, 0.0)})]),
        Asset(id=CHECKPOINT_ID, name="checkpoint", is_builtin=True,
              components=[AssetComponent("SpawnPoint",
                                         {"is_player": False, "respawns": True})]),
    ]


class AssetLibrary:
    """asset/library.rs:61 — discovery over sample + user dirs, id lookup."""

    def __init__(self, dirs: Optional[List[str]] = None,
                 include_builtins: bool = True):
        self.dirs = dirs or []
        self.assets: Dict[int, Asset] = {}
        self.include_builtins = include_builtins
        self.reload_all()

    def reload_all(self):
        self.assets = {}
        if self.include_builtins:
            for a in builtin_assets():
                self.assets[a.id] = a
        for d in self.dirs:
            if not os.path.isdir(d):
                continue
            for fn in sorted(os.listdir(d)):
                if not fn.endswith(".ron"):
                    continue
                try:
                    a = load_asset(os.path.join(d, fn))
                    self.assets[a.id] = a
                except Exception:
                    continue

    def get_by_id(self, asset_id: int) -> Optional[Asset]:
        return self.assets.get(asset_id)

    def __len__(self):
        return len(self.assets)

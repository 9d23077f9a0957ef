"""Modeler component list + per-kind component editors.

Reference behavior: `/root/reference/src/modeler/layout.rs` —
component_icon (:705), draw_components_section (:723),
create_default_component (:967), draw_component_editor (:1045) and the
per-kind forms: draw_collision_editor (:1776), draw_light_component_editor
(:1928), draw_trigger_editor (:2053), draw_pickup_editor (:2082),
draw_enemy_editor (:2150), draw_door_editor (:2262), draw_audio_editor
(:2299), draw_particle_editor (:2374), draw_character_controller_editor
(:2398), draw_spawn_point_editor (:2470).  Field names and slider ranges
mirror `/root/reference/src/asset/component.rs:18-175`.

The editors mutate `AssetComponent.data` dicts in place (the repo's
generic tagged-component model, models/asset.py) so edited assets
round-trip through the same RON serialization.
"""

from typing import Dict, List, Optional

from ..io.ron import Tag
from ..models.asset import AssetComponent
from ..ui import Rect, UiContext
from ..ui.widgets import button, slider

ROW = 20.0
DIM = (150, 150, 160)
TXT = (220, 220, 225)
ACCENT = (120, 180, 255)

# layout.rs:705 component_icon — icon glyphs keyed by kind (the repo's
# 7x7 icon set uses single chars; the mapping keeps the reference's
# one-icon-per-kind contract)
COMPONENT_ICONS = {
    "Mesh": "#", "Collision": "O", "Light": "*", "Trigger": "!",
    "Pickup": "+", "Enemy": "E", "Door": "D", "Audio": "~",
    "Particle": ".", "CharacterController": "C", "SpawnPoint": "S",
    "Skeleton": "B",
}

# layout.rs:1797-1803 shape buttons with their defaults
_SHAPES = (
    ("Mesh", Tag("FromMesh", None)),
    ("Box", Tag("Box", {"half_extents": (256.0, 256.0, 256.0)})),
    ("Sphere", Tag("Sphere", {"radius": 256.0})),
    ("Capsule", Tag("Capsule", {"radius": 128.0, "height": 512.0})),
    ("Cylinder", Tag("Cylinder", {"radius": 128.0, "height": 512.0})),
)

_PICKUP_TYPES = ("Health", "Currency", "Key", "Upgrade")   # layout.rs:2110
_ENEMY_TYPES = ("Grunt", "Archer", "Heavy", "Swarm", "Elite",
                "Boss")                                    # layout.rs:2181


def create_default_component(kind: str) -> AssetComponent:
    """layout.rs:967-1043 — the defaults each Add-Component choice gets."""
    defaults = {
        "Mesh": {"parts": []},
        "Collision": {"shape": Tag("Box",
                                   {"half_extents": (256.0, 256.0, 256.0)}),
                      "is_trigger": False},
        "Light": {"color": (255, 200, 100), "intensity": 1.0,
                  "radius": 2048.0, "offset": (0.0, 0.0, 0.0)},
        "Trigger": {"trigger_id": "trigger_1", "on_enter": None,
                    "on_exit": None},
        "Pickup": {"item_type": Tag("HealthPickup", {"amount": 25}),
                   "respawn_time": None},
        "Enemy": {"enemy_type": Tag("Grunt", None), "health": 100,
                  "damage": 10, "patrol_radius": 2048.0},
        "Door": {"required_key": None, "start_open": False},
        "Audio": {"sound": "ambient_1", "volume": 1.0, "radius": 4096.0,
                  "looping": True},
        "Particle": {"effect": "smoke", "offset": (0.0, 0.0, 0.0)},
        "CharacterController": {"height": 1800.0, "radius": 300.0,
                                "step_height": 384.0},
        "SpawnPoint": {"is_player": False, "respawns": True},
        "Skeleton": {"bones": []},
    }
    return AssetComponent(kind=kind,
                          data=dict(defaults.get(
                              kind, defaults["Collision"])))


def _shape_kind(v) -> str:
    if isinstance(v, Tag):
        return v.name.lower()
    if isinstance(v, dict):
        return str(v.get("kind", "")).lower()
    return ""


def _shape_payload(v) -> dict:
    if isinstance(v, Tag) and isinstance(v.value, dict):
        return v.value
    if isinstance(v, dict):
        return v
    return {}


def _hslider(ctx: UiContext, wid: str, x: float, y: float, w: float,
             value: float, lo: float, hi: float) -> float:
    return slider(ctx, wid, Rect(x, y + 4, w, 10), value, lo, hi)


def _toggle(ctx: UiContext, wid: str, x: float, y: float, w: float,
            label: str, value: bool) -> bool:
    """Reference ON/OFF pill toggle (layout.rs:2228-2243)."""
    ctx.text(x, y + 3, label, DIM)
    r = Rect(x + w - 40, y + 2, 32, 14)
    ctx.fill(r, ACCENT if value else (60, 60, 65))
    ctx.text(r.x + 6, r.y + 2, "ON" if value else "OFF")
    if ctx.clicked(wid, r):
        return not value
    return value


def _tag_name(v, default: str) -> str:
    if isinstance(v, Tag):
        return v.name
    if isinstance(v, str):
        return v
    return default


def _type_buttons(ctx: UiContext, wid: str, x: float, y: float, w: float,
                  names, current: str) -> Optional[str]:
    bw = (w - 12.0) / len(names)
    picked = None
    for i, name in enumerate(names):
        r = Rect(x + 4 + i * bw, y, bw - 2, 18)
        active = name.lower() == current.lower()
        ctx.fill(r, ACCENT if active else (45, 45, 50))
        ctx.text(r.x + 3, r.y + 4, name[:6],
                 (20, 20, 25) if active else TXT)
        if not active and ctx.clicked(f"{wid}.{name}", r):
            picked = name
    return picked


def draw_collision_editor(ctx: UiContext, x: float, y: float, w: float,
                          data: Dict) -> float:
    """layout.rs:1776-1926: shape buttons, Is Trigger, per-shape sliders
    (radius/extent caps 2048, heights 4096)."""
    shape = data.get("shape")
    kind = _shape_kind(shape)
    ctx.text(x + 4, y + 3, "Shape:", DIM)
    ctx.text(x + 50, y + 3, kind or "none", TXT)
    y += ROW
    picked = _type_buttons(ctx, "mc.shape", x, y, w,
                           [n for n, _ in _SHAPES],
                           {"frommesh": "Mesh", "box": "Box",
                            "sphere": "Sphere", "capsule": "Capsule",
                            "cylinder": "Cylinder"}.get(kind, ""))
    if picked is not None:
        data["shape"] = dict(_SHAPES)[picked]
        shape = data["shape"]
        kind = _shape_kind(shape)
    y += ROW
    new_tr = _toggle(ctx, "mc.trig", x + 4, y, w - 8, "Is Trigger:",
                     bool(data.get("is_trigger", False)))
    data["is_trigger"] = new_tr
    y += ROW
    payload = _shape_payload(shape)
    sx, sw = x + 70, w - 110
    if kind == "sphere":
        ctx.text(x + 4, y + 3, "Radius:", DIM)
        payload["radius"] = _hslider(ctx, "mc.rad", sx, y, sw,
                                     float(payload.get("radius", 0.0)),
                                     0.0, 2048.0)
        y += ROW
    elif kind == "box":
        he = list(payload.get("half_extents", (256.0, 256.0, 256.0)))
        for i, label in enumerate(("Width:", "Height:", "Depth:")):
            ctx.text(x + 4, y + 3, label, DIM)
            he[i] = _hslider(ctx, f"mc.he{i}", sx, y, sw, float(he[i]),
                             0.0, 2048.0)
            ctx.text(x + w - 35, y + 3, f"{he[i] * 2:.0f}", TXT)
            y += ROW
        payload["half_extents"] = tuple(he)
    elif kind in ("capsule", "cylinder"):
        ctx.text(x + 4, y + 3, "Radius:", DIM)
        payload["radius"] = _hslider(ctx, "mc.rad", sx, y, sw,
                                     float(payload.get("radius", 0.0)),
                                     0.0, 2048.0)
        y += ROW
        ctx.text(x + 4, y + 3, "Height:", DIM)
        payload["height"] = _hslider(ctx, "mc.hgt", sx, y, sw,
                                     float(payload.get("height", 0.0)),
                                     0.0, 4096.0)
        y += ROW
    else:
        ctx.text(x + 4, y + 3, "Auto-fit to mesh bounds", DIM)
        y += ROW
    if isinstance(shape, Tag):
        data["shape"] = Tag(shape.name, payload or None)
    return y


def draw_light_editor(ctx: UiContext, x: float, y: float, w: float,
                      data: Dict) -> float:
    """layout.rs:1928-2051: 5-bit RGB channel sliders, intensity (max 5),
    radius (max 8192)."""
    ctx.text(x + 4, y + 2, "Color:", DIM)
    y += 14
    color = list(data.get("color", (255, 255, 255)))
    tints = ((200, 90, 90), (90, 200, 90), (90, 90, 200))
    for i, label in enumerate("RGB"):
        ctx.text(x + 4, y + 1, label, tints[i])
        v31 = int(color[i]) // 8
        new31 = int(round(_hslider(ctx, f"mc.l{i}", x + 14, y, w - 40,
                                   float(v31), 0.0, 31.0)))
        color[i] = min(new31 * 8, 255)   # layout.rs:1974 *8 expansion
        y += 14
    data["color"] = tuple(color)
    y += 4
    ctx.text(x + 4, y + 3, "Intensity:", DIM)
    data["intensity"] = _hslider(ctx, "mc.int", x + 70, y, w - 110,
                                 float(data.get("intensity", 1.0)),
                                 0.0, 5.0)
    y += ROW
    ctx.text(x + 4, y + 3, "Radius:", DIM)
    data["radius"] = _hslider(ctx, "mc.lrad", x + 70, y, w - 110,
                              float(data.get("radius", 0.0)),
                              0.0, 8192.0)
    return y + ROW


def draw_trigger_editor(ctx: UiContext, x: float, y: float, w: float,
                        data: Dict) -> float:
    """layout.rs:2053-2080: trigger id and enter/exit event names."""
    for label, key in (("Trigger ID:", "trigger_id"),
                       ("On Enter:", "on_enter"), ("On Exit:", "on_exit")):
        ctx.text(x + 4, y + 3, label, DIM)
        ctx.text(x + 70, y + 3, str(data.get(key) or "-"), TXT)
        y += ROW
    return y


def draw_pickup_editor(ctx: UiContext, x: float, y: float, w: float,
                       data: Dict) -> float:
    """layout.rs:2082-2148: item-type buttons + respawn toggle."""
    ctx.text(x + 4, y + 3, "Type:", DIM)
    y += ROW
    cur = _tag_name(data.get("item_type"), "HealthPickup")
    short = {"healthpickup": "Health", "currency": "Currency",
             "key": "Key", "upgrade": "Upgrade"}.get(cur.lower(), cur)
    picked = _type_buttons(ctx, "mc.pick", x, y, w, _PICKUP_TYPES, short)
    if picked == "Health":
        data["item_type"] = Tag("HealthPickup", {"amount": 25})
    elif picked == "Currency":
        data["item_type"] = Tag("Currency", {"amount": 10})
    elif picked == "Key":
        data["item_type"] = Tag("Key", Tag("Generic", 1))
    elif picked == "Upgrade":
        data["item_type"] = Tag("Upgrade", None)
    y += ROW
    rt = data.get("respawn_time")
    ctx.text(x + 4, y + 3, "Respawn:", DIM)
    ctx.text(x + 70, y + 3, f"{rt:.0f}s" if rt is not None else "Never",
             TXT)
    if ctx.clicked("mc.resp", Rect(x + 70, y, 60, 16)):
        data["respawn_time"] = None if rt is not None else 30.0
    return y + ROW


def draw_enemy_editor(ctx: UiContext, x: float, y: float, w: float,
                      data: Dict) -> float:
    """layout.rs:2150-2260: type buttons (two rows of three) + stats."""
    ctx.text(x + 4, y + 3, "Type:", DIM)
    y += ROW
    cur = _tag_name(data.get("enemy_type"), "Grunt")
    for row in (_ENEMY_TYPES[:3], _ENEMY_TYPES[3:]):
        picked = _type_buttons(ctx, f"mc.en{row[0]}", x, y, w, row, cur)
        if picked is not None:
            data["enemy_type"] = Tag(picked, None)
        y += ROW
    for label, key in (("Health:", "health"), ("Damage:", "damage"),
                       ("Patrol:", "patrol_radius")):
        ctx.text(x + 4, y + 3, label, DIM)
        ctx.text(x + 60, y + 3, f"{float(data.get(key, 0)):.0f}", TXT)
        y += ROW
    return y


def draw_door_editor(ctx: UiContext, x: float, y: float, w: float,
                     data: Dict) -> float:
    """layout.rs:2262-2297: required key + start-open toggle."""
    ctx.text(x + 4, y + 3, "Key:", DIM)
    ctx.text(x + 70, y + 3, str(data.get("required_key") or "None"), TXT)
    y += ROW
    data["start_open"] = _toggle(ctx, "mc.open", x + 4, y, w - 8,
                                 "Start Open:",
                                 bool(data.get("start_open", False)))
    return y + ROW


def draw_audio_editor(ctx: UiContext, x: float, y: float, w: float,
                      data: Dict) -> float:
    """layout.rs:2299-2372: sound name, volume (0-1), radius (max 8192),
    looping toggle."""
    ctx.text(x + 4, y + 3, "Sound:", DIM)
    ctx.text(x + 60, y + 3, str(data.get("sound", "")), TXT)
    y += ROW
    ctx.text(x + 4, y + 3, "Volume:", DIM)
    data["volume"] = _hslider(ctx, "mc.vol", x + 60, y, w - 100,
                              float(data.get("volume", 1.0)), 0.0, 1.0)
    y += ROW
    ctx.text(x + 4, y + 3, "Radius:", DIM)
    data["radius"] = _hslider(ctx, "mc.arad", x + 60, y, w - 100,
                              float(data.get("radius", 0.0)), 0.0, 8192.0)
    y += ROW
    data["looping"] = _toggle(ctx, "mc.loop", x + 4, y, w - 8, "Looping:",
                              bool(data.get("looping", False)))
    return y + ROW


def draw_particle_editor(ctx: UiContext, x: float, y: float, w: float,
                         data: Dict) -> float:
    """layout.rs:2374-2396: effect id + offset display."""
    ctx.text(x + 4, y + 3, "Effect:", DIM)
    ctx.text(x + 60, y + 3, str(data.get("effect", "")), TXT)
    y += ROW
    off = data.get("offset", (0.0, 0.0, 0.0))
    ctx.text(x + 4, y + 3, "Offset:", DIM)
    ctx.text(x + 60, y + 3,
             f"{off[0]:.0f}, {off[1]:.0f}, {off[2]:.0f}", TXT)
    return y + ROW


def draw_character_controller_editor(ctx: UiContext, x: float, y: float,
                                     w: float, data: Dict) -> float:
    """layout.rs:2398-2468: height/radius (max 3072) + step (max 1024)."""
    sx, sw = x + 70, w - 110
    for label, key, hi in (("Height:", "height", 3072.0),
                           ("Radius:", "radius", 3072.0),
                           ("Step:", "step_height", 1024.0)):
        ctx.text(x + 4, y + 3, label, DIM)
        data[key] = _hslider(ctx, f"mc.cc.{key}", sx, y, sw,
                             float(data.get(key, 0.0)), 0.0, hi)
        y += ROW
    return y


def draw_spawn_point_editor(ctx: UiContext, x: float, y: float, w: float,
                            data: Dict) -> float:
    """layout.rs:2470-2509: is_player + respawns toggles."""
    data["is_player"] = _toggle(ctx, "mc.isp", x + 4, y, w - 8,
                                "Player Start:",
                                bool(data.get("is_player", False)))
    y += ROW
    data["respawns"] = _toggle(ctx, "mc.rsp", x + 4, y, w - 8,
                               "Respawns:",
                               bool(data.get("respawns", True)))
    return y + ROW


_EDITORS = {
    "Collision": draw_collision_editor,
    "Light": draw_light_editor,
    "Trigger": draw_trigger_editor,
    "Pickup": draw_pickup_editor,
    "Enemy": draw_enemy_editor,
    "Door": draw_door_editor,
    "Audio": draw_audio_editor,
    "Particle": draw_particle_editor,
    "CharacterController": draw_character_controller_editor,
    "SpawnPoint": draw_spawn_point_editor,
}

ADDABLE_KINDS = ("Collision", "Light", "Trigger", "Pickup", "Enemy",
                 "Door", "Audio", "Particle", "CharacterController",
                 "SpawnPoint")


def draw_components_section(ctx: UiContext, rect: Rect,
                            components: List[AssetComponent],
                            ui: Dict) -> float:
    """layout.rs:723-892 — component rows (icon + kind, click selects,
    x removes) + the selected component's editor form below
    (draw_component_editor :1045)."""
    x, y, w = rect.x, rect.y, rect.w
    ctx.text(x + 4, y, "Components", (170, 170, 180))
    addr = Rect(x + w - 22, y - 1, 16, 14)
    if button(ctx, "mc.add", addr, "+"):
        ui["adding"] = not ui.get("adding", False)
    y += 16
    if ui.get("adding"):
        # add-component popup (layout.rs:7487 draw_add_component_popup)
        for kind in ADDABLE_KINDS:
            r = Rect(x + 8, y, w - 16, 15)
            if button(ctx, f"mc.add.{kind}", r, kind):
                components.append(create_default_component(kind))
                ui["adding"] = False
                ui["selected"] = len(components) - 1
            y += 16
        return y
    sel = ui.get("selected")
    remove = None
    for i, comp in enumerate(components):
        r = Rect(x + 4, y, w - 8, 15)
        if i == sel:
            ctx.fill(r, (60, 80, 100))
        elif r.contains(ctx.mouse.x, ctx.mouse.y):
            ctx.fill(r, (48, 48, 55))
        icon = COMPONENT_ICONS.get(comp.kind, "?")
        ctx.text(r.x + 2, y + 3, icon, ACCENT)
        ctx.text(r.x + 14, y + 3, comp.kind, TXT)
        xr = Rect(r.right - 14, y + 2, 12, 12)
        if comp.kind not in ("Mesh", "Skeleton") and \
                ctx.clicked(f"mc.del{i}", xr):
            remove = i
        ctx.text(xr.x + 3, xr.y + 1, "x", (200, 100, 100))
        if ctx.clicked(f"mc.row{i}", Rect(r.x, r.y, r.w - 16, r.h)):
            ui["selected"] = i if sel != i else None
        y += 16
    if remove is not None:
        components.pop(remove)
        if ui.get("selected") == remove:
            ui["selected"] = None
        return y
    sel = ui.get("selected")
    if sel is not None and 0 <= sel < len(components):
        comp = components[sel]
        editor = _EDITORS.get(comp.kind)
        y += 4
        if editor is not None:
            y = editor(ctx, x, y, w, comp.data)
        else:
            ctx.text(x + 4, y + 3, f"{comp.kind}: no editable fields",
                     DIM)
            y += ROW
    return y

"""Scene compilation: Level + textures -> padded device arrays + render loop.

The TPU analogue of `render_scene` (`/root/reference/src/scene.rs:180-261`):
rooms compile once into fixed-shape stacked buffers; rendering scans over
rooms (each with its own ambient + fog, matching the reference's per-room
settings clone at scene.rs:201-205) and then over placed asset instances.

Level geometry is regenerated per frame in the reference (no caching —
SURVEY.md hot-loop note); here it is compiled once on the host, which is both
faithful (geometry only changes on edits) and TPU-friendly.
"""

import functools
from typing import Callable, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import RasterSettings
from ..types import (FaceArrays, Fog, FrameBuffers, Lights, MeshArrays,
                     TextureAtlas, CameraArrays, empty_lights)
from ..render import render_mesh_15
from . import build
from .level import Level, Room

F32 = np.float32


class CompiledScene(NamedTuple):
    """Stacked per-room buffers (R = rooms, leading axis)."""

    mesh: MeshArrays        # fields (R, V, ...)
    faces: FaceArrays       # fields (R, T, ...)
    atlas: TextureAtlas     # fields (R, ...): per-room trimmed atlases
    fog: Fog                # fields (R, ...)
    ambient: jnp.ndarray    # (R,) f32
    lights: Lights          # scene lights (w/o ambient; set per room)


def _room_fog_params(room: Room):
    """build_room_fog (scene.rs:264-276)."""
    f = room.fog
    if not f.enabled:
        return False, 0.0, 0.0, 3.4e38, (0, 0, 0)
    color = tuple(int(F32(F32(c) * F32(255.0))) for c in f.color)
    cull = float(F32(F32(F32(f.start) + F32(f.falloff)) + F32(f.cull_offset)))
    return True, float(f.start), float(f.falloff), cull, color


def collect_scene_lights(level: Level, asset_library=None) -> List[dict]:
    """collect_scene_lights (scene.rs:32-69): placed Light components with
    per-instance overrides applied."""
    specs: List[dict] = []
    if asset_library is None:
        return specs
    for room in level.rooms:
        for obj in room.objects:
            if not obj.enabled:
                continue
            asset = asset_library.get_by_id(obj.asset_id)
            if asset is None:
                continue
            light = asset.light_component()
            if light is None:
                continue
            color, intensity, radius, offset = light
            ov = obj.light_override
            if ov is not None:
                color = ov.color if ov.color is not None else color
                intensity = ov.intensity if ov.intensity is not None else intensity
                radius = ov.radius if ov.radius is not None else radius
                offset = ov.offset if ov.offset is not None else offset
            base = obj.world_position(room)
            pos = (float(base[0]) + offset[0], float(base[1]) + offset[1],
                   float(base[2]) + offset[2])
            specs.append(dict(kind="point", position=pos, radius=radius,
                              intensity=intensity, color=color))
    return specs


def compile_level(level: Level, textures, resolve,
                  light_specs: Optional[List[dict]] = None,
                  pad_verts: Optional[int] = None,
                  pad_faces: Optional[int] = None,
                  light_pad: int = 8) -> CompiledScene:
    """Emit all rooms and pack to stacked padded device arrays.

    `textures`: sequence of PackTexture (or (pixels15, blend) tuples);
    `resolve`: TextureRef -> (id, width) or None.
    """
    per_room = [room.to_render_data(resolve) for room in level.rooms]
    max_v = max((len(v) for v, _ in per_room), default=1)
    max_t = max((len(f) for _, f in per_room), default=1)
    pad_verts = pad_verts or max(max_v, 1)
    pad_faces = pad_faces or max(max_t, 1)

    # Per-room trimmed texture tables: remap global texture ids to a compact
    # per-room list so the rasterizer's atlas (and its one-hot resolve) only
    # carries the textures that room actually samples.
    tex_list = []
    for t in textures:
        tex_list.append(t if isinstance(t, tuple) else (t.pixels15, 0))
    room_tex_lists = []
    for _, faces in per_room:
        used = sorted({f["tex_id"] for f in faces
                       if f.get("tex_id") is not None and f["tex_id"] >= 0})
        if not used:
            used = [0] if tex_list else []
        remap = {g: i for i, g in enumerate(used)}
        for f in faces:
            if f.get("tex_id") is not None and f["tex_id"] >= 0:
                f["tex_id"] = remap[f["tex_id"]]
        room_tex_lists.append([tex_list[g] for g in used])

    meshes, face_arrays = [], []
    for verts, faces in per_room:
        if not verts:
            verts = [dict(pos=(0, 0, 0), uv=(0, 0), normal=(0, 0, 0),
                          color=(128, 128, 128), color_blend=0)]
        pos = np.array([v["pos"] for v in verts], F32)
        uv = np.array([v["uv"] for v in verts], F32)
        normal = np.array([v["normal"] for v in verts], F32)
        color = np.array([v["color"] for v in verts], np.int32)
        cblend = np.array([v["color_blend"] for v in verts], np.int32)
        meshes.append(build.make_mesh_arrays(pos, uv, normal, color, cblend,
                                             pad_to=pad_verts))
        if faces:
            vidx = np.array([(f["v0"], f["v1"], f["v2"]) for f in faces], np.int32)
            tex_id = np.array([-1 if f.get("tex_id") is None else f["tex_id"]
                               for f in faces], np.int32)
            bt = np.array([f.get("black_transparent", True) for f in faces], bool)
            bm = np.array([f.get("blend_mode", 0) for f in faces], np.int32)
            ea = np.array([f.get("editor_alpha", 255) for f in faces], np.int32)
            face_arrays.append(build.make_face_arrays(
                vidx, tex_id, bt, bm, ea, pad_to=pad_faces))
        else:
            fa = build.make_face_arrays(np.zeros((1, 3), np.int32),
                                        pad_to=pad_faces)
            face_arrays.append(fa._replace(
                valid=jnp.zeros((pad_faces,), bool)))

    def stack(trees):
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)

    mesh = stack(meshes)
    faces = stack(face_arrays)

    if not room_tex_lists:
        room_tex_lists = [[]]
    a_max = max(max((sum(p.shape[0] * p.shape[1] for p, _ in lst) for lst in
                     room_tex_lists), default=1), 1)
    a_max = -(-a_max // 128) * 128  # one-hot gather alignment
    nt_max = max(max((len(lst) for lst in room_tex_lists), default=1), 1)
    atlas = stack([build.build_atlas(lst, pad_data_to=a_max,
                                     pad_count_to=nt_max)
                   for lst in room_tex_lists])

    fog_rows = [_room_fog_params(r) for r in level.rooms] or \
        [(False, 0.0, 0.0, 3.4e38, (0, 0, 0))]
    fog = Fog(
        enabled=jnp.asarray(np.array([f[0] for f in fog_rows], bool)),
        start=jnp.asarray(np.array([f[1] for f in fog_rows], F32)),
        falloff=jnp.asarray(np.array([f[2] for f in fog_rows], F32)),
        cull_distance=jnp.asarray(np.array([f[3] for f in fog_rows], F32)),
        color=jnp.asarray(np.array([f[4] for f in fog_rows], np.int32)),
    )
    ambient = jnp.asarray(np.array([r.ambient for r in level.rooms] or [0.5], F32))

    lights = build.lights_from_list(light_specs or [], pad=light_pad)
    return CompiledScene(mesh=mesh, faces=faces, atlas=atlas, fog=fog,
                         ambient=ambient, lights=lights)


@functools.partial(jax.jit, static_argnames=("settings", "depth_mode"))
def render_level(fb: FrameBuffers, scene: CompiledScene,
                 camera: CameraArrays, settings: RasterSettings,
                 depth_mode: str = "fast") -> FrameBuffers:
    """Room loop of render_scene (scene.rs:196-219): sequential rooms, each
    with its own ambient + fog, into one framebuffer."""
    n_rooms = scene.ambient.shape[0]

    def body(i, fb):
        mesh = jax.tree_util.tree_map(lambda x: x[i], scene.mesh)
        faces = jax.tree_util.tree_map(lambda x: x[i], scene.faces)
        fog = jax.tree_util.tree_map(lambda x: x[i], scene.fog)
        atlas = jax.tree_util.tree_map(lambda x: x[i], scene.atlas)
        lights = scene.lights._replace(ambient=scene.ambient[i])
        return render_mesh_15(fb, mesh, faces, atlas, camera, lights,
                              fog, settings, depth_mode=depth_mode)

    return jax.lax.fori_loop(0, n_rooms, body, fb)

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
    """Stacked per-room buffers (R = rooms) + per-placed-asset-part draws
    (D = draws), mirroring render_scene's two phases (scene.rs:196, 226)."""

    mesh: MeshArrays        # fields (R, V, ...)
    faces: FaceArrays       # fields (R, T, ...)
    atlas: TextureAtlas     # fields (R, ...): per-room trimmed atlases
    fog: Fog                # fields (R, ...)
    ambient: jnp.ndarray    # (R,) f32
    lights: Lights          # scene lights (w/o ambient; set per room)
    # placed asset draws (possibly D == 0 -> dummy invalid draw)
    a_mesh: MeshArrays      # fields (D, V', ...)
    a_faces: FaceArrays     # fields (D, T', ...)
    a_atlas: TextureAtlas   # fields (D, ...): one texture per draw
    a_fog: Fog              # fields (D, ...): containing room's fog
    a_ambient: jnp.ndarray  # (D,) f32: containing room's ambient
    # 8-bit path (use_rgb555=False, scene.rs:214-219 / :163-168); None
    # unless compiled with with_8bit=True.
    atlas8: "object" = None     # TextureAtlas8 — GLOBAL (untrimmed)
    tex_map: "object" = None    # (R, NT) i32: per-room local -> global id
    a_atlas8: "object" = None   # TextureAtlas8 fields (D, ...)
    a_room: "object" = None     # (D,) i32: containing room per draw


def _rgba8_from_c15(c15: np.ndarray) -> np.ndarray:
    """Color15 -> quantized RGBA8 exactly as to_raster_texture
    (mesh_editor.rs:725-747): 5->8 expansion `(v<<3)|(v>>2)`, texel 0
    (transparent / CLUT index 0) -> alpha 0 (ERASE)."""
    r5 = (c15 >> 10) & 31
    g5 = (c15 >> 5) & 31
    b5 = c15 & 31
    out = np.stack([((r5 << 3) | (r5 >> 2)).astype(np.uint8),
                    ((g5 << 3) | (g5 >> 2)).astype(np.uint8),
                    ((b5 << 3) | (b5 >> 2)).astype(np.uint8),
                    np.where(c15 == 0, 0, 255).astype(np.uint8)], axis=-1)
    return out


def _tex_rgba8(entry) -> np.ndarray:
    """8-bit view of a texture-table entry: the retained quantized PNG
    source when available (PackTexture.rgba8, types.rs:876), else the
    Color15 texels expanded 5->8."""
    if not isinstance(entry, tuple) \
            and getattr(entry, "rgba8", None) is not None:
        return entry.rgba8
    p15 = entry[0] if isinstance(entry, tuple) else entry.pixels15
    return _rgba8_from_c15(np.asarray(p15, np.uint16))


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


def transform_part_vertices(verts, facing: float, world_pos):
    """render_asset_parts' Y-rotation + translation (scene.rs:123-159),
    host-side f32 with the reference op order.  Returns new golden-format
    vertex dicts."""
    F = np.float32
    cos_f = F(np.cos(F(facing)))
    sin_f = F(np.sin(F(facing)))
    wp = np.asarray(world_pos, F)
    has_transform = (abs(float(facing)) > 0.0001
                     or abs(float(wp[0])) > 0.0001
                     or abs(float(wp[1])) > 0.0001
                     or abs(float(wp[2])) > 0.0001)
    if not has_transform:
        return verts
    out = []
    for v in verts:
        x, y, z = F(v["pos"][0]), F(v["pos"][1]), F(v["pos"][2])
        nx, ny, nz = F(v["normal"][0]), F(v["normal"][1]), F(v["normal"][2])
        rx = F(F(x * cos_f) - F(z * sin_f))
        rz = F(F(x * sin_f) + F(z * cos_f))
        out.append(dict(
            pos=(float(F(rx + wp[0])), float(F(y + wp[1])), float(F(rz + wp[2]))),
            uv=v["uv"],
            normal=(float(F(F(nx * cos_f) - F(nz * sin_f))), float(ny),
                    float(F(F(nx * sin_f) + F(nz * cos_f)))),
            color=v["color"], color_blend=v.get("color_blend", 0)))
    return out


def resolve_part_texture15(part, user_textures) -> np.ndarray:
    """resolve_part_texture + CLUT pre-bake (scene.rs:75-104, 163-165):
    TextureRef::Id -> the UserTexture's indices + embedded palette;
    everything else -> the built-in checkerboard atlas + grayscale CLUT."""
    from . import mesh as mesh_mod

    if part.texture_ref.kind == "Id" and user_textures is not None:
        tex = user_textures.get_by_id(part.texture_ref.id)
        if tex is not None:
            return tex.to_texture15()
    if part.texture_ref.kind == "Embedded" and part.texture_ref.embedded is not None \
            and not part.texture_ref.embedded.is_empty:
        return part.texture_ref.embedded.to_texture15(mesh_mod.checkerboard_clut())
    atlas = mesh_mod.IndexedAtlas.new_checkerboard(128, 128, 0)
    return atlas.to_texture15(mesh_mod.checkerboard_clut())


def compile_level(level: Level, textures, resolve,
                  light_specs: Optional[List[dict]] = None,
                  asset_library=None, user_textures=None,
                  pad_verts: Optional[int] = None,
                  pad_faces: Optional[int] = None,
                  light_pad: int = 8,
                  with_8bit: bool = False) -> CompiledScene:
    """Emit all rooms (and placed asset parts) into stacked padded arrays.

    `textures`: sequence of PackTexture (or (pixels15, blend) tuples);
    `resolve`: TextureRef -> (id, width) or None.  `with_8bit` also packs
    the untrimmed global 8-bit atlas so render_level can dispatch on
    `settings.use_rgb555` (scene.rs:214-219).
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
    room_used = []
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
        room_used.append(used)

    meshes, face_arrays = [], []
    for room_i, (verts, faces) in enumerate(per_room):
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
            # prove most faces can never color-key (fast-path routing)
            kp = build.compute_key_possible(uv, vidx, tex_id, bt,
                                            room_tex_lists[room_i])
            face_arrays.append(build.make_face_arrays(
                vidx, tex_id, bt, bm, ea, key_possible=kp,
                pad_to=pad_faces))
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
    w_max = 8
    for lst in room_tex_lists:
        for p, _ in lst:
            w_max = max(w_max, -(-(-(-(p.shape[0] * p.shape[1]) // 32)) // 8) * 8)
    atlas = stack([build.build_atlas(lst, pad_data_to=a_max,
                                     pad_count_to=nt_max, pad_words_to=w_max)
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

    # ---- placed asset draws (scene.rs:226-259) ----
    draws = []  # (verts, faces, tex15, fog_row, ambient, double_sided)
    draw_rooms = []
    if asset_library is not None:
        for room_idx, room in enumerate(level.rooms):
            fog_row = _room_fog_params(room)
            for obj in room.objects:
                if not obj.enabled:
                    continue
                a = asset_library.get_by_id(obj.asset_id)
                if a is None:
                    continue
                parts = a.mesh()
                if not parts:
                    continue
                wp = obj.world_position(room)
                for part in parts:
                    if not part.visible:
                        continue
                    verts, pfaces = part.mesh.to_render_data_textured()
                    if not verts:
                        continue
                    verts = transform_part_vertices(verts, obj.facing, wp)
                    tex15 = resolve_part_texture15(part, user_textures)
                    draws.append((verts, pfaces, tex15, fog_row, room.ambient,
                                  part.double_sided))
                    draw_rooms.append(room_idx)

    if not draws:
        dummy_tex = np.full((1, 1), 0x7FFF, np.uint16)
        draws = [([dict(pos=(0, 0, 0), uv=(0, 0), normal=(0, 0, 0),
                        color=(128, 128, 128), color_blend=0)],
                  [], dummy_tex, (False, 0.0, 0.0, 3.4e38, (0, 0, 0)), 0.5,
                  False)]
        draw_rooms = [0]

    av_max = max(max(len(v) for v, _, _, _, _, _ in draws), 1)
    at_max = max(max(len(f) for _, f, _, _, _, _ in draws), 1)
    aa_max = max(t.shape[0] * t.shape[1] for _, _, t, _, _, _ in draws)
    aa_max = -(-aa_max // 128) * 128
    aw_max = max(8, -(-max(-(-(t.shape[0] * t.shape[1]) // 32)
                           for _, _, t, _, _, _ in draws) // 8) * 8)

    a_meshes, a_face_arrays, a_atlases, a_fogs, a_amb = [], [], [], [], []
    for verts, pfaces, tex15, fog_row, amb, ds in draws:
        pos = np.array([v["pos"] for v in verts], F32)
        uv = np.array([v["uv"] for v in verts], F32)
        normal = np.array([v["normal"] for v in verts], F32)
        color = np.array([v["color"] for v in verts], np.int32)
        cblend = np.array([v.get("color_blend", 0) for v in verts], np.int32)
        a_meshes.append(build.make_mesh_arrays(pos, uv, normal, color, cblend,
                                               pad_to=av_max))
        if pfaces:
            vidx = np.array([(f["v0"], f["v1"], f["v2"]) for f in pfaces], np.int32)
            tid = np.array([0 if f.get("tex_id") is not None else -1
                            for f in pfaces], np.int32)
            bt = np.array([f.get("black_transparent", True) for f in pfaces], bool)
            bm = np.array([f.get("blend_mode", 0) for f in pfaces], np.int32)
            dsa = np.full(len(pfaces), ds, bool)
            kp = build.compute_key_possible(uv, vidx, tid, bt, [(tex15, 0)])
            fa2 = build.make_face_arrays(vidx, tid, bt, bm,
                                         double_sided=dsa, key_possible=kp,
                                         pad_to=at_max)
        else:
            fa2 = build.make_face_arrays(np.zeros((1, 3), np.int32),
                                         pad_to=at_max)
            fa2 = fa2._replace(valid=jnp.zeros((at_max,), bool))
        a_face_arrays.append(fa2)
        a_atlases.append(build.build_atlas([(tex15, 0)], pad_data_to=aa_max,
                                           pad_count_to=1,
                                           pad_words_to=aw_max))
        a_fogs.append(fog_row)
        a_amb.append(amb)

    a_mesh = stack(a_meshes)
    a_faces = stack(a_face_arrays)
    a_atlas = stack(a_atlases)
    a_fog = Fog(
        enabled=jnp.asarray(np.array([f[0] for f in a_fogs], bool)),
        start=jnp.asarray(np.array([f[1] for f in a_fogs], F32)),
        falloff=jnp.asarray(np.array([f[2] for f in a_fogs], F32)),
        cull_distance=jnp.asarray(np.array([f[3] for f in a_fogs], F32)),
        color=jnp.asarray(np.array([f[4] for f in a_fogs], np.int32)),
    )
    atlas8 = tex_map = a_atlas8 = None
    if with_8bit:
        # Global untrimmed 8-bit atlas + per-room local->global id map
        # (the reference's 8-bit branch samples the full texture list,
        # scene.rs:214-219); asset draws expand their baked Texture15
        # exactly like to_raster_texture (mesh_editor.rs:725-747).
        atlas8 = build.build_atlas8(
            [(_tex_rgba8(t), 0) for t in textures]
            or [(np.full((1, 1, 4), 255, np.uint8), 0)])
        tm = np.zeros((len(room_used) or 1, nt_max), np.int32)
        for i, used in enumerate(room_used):
            tm[i, :len(used)] = used
        tex_map = jnp.asarray(tm)
        aa8 = [build.build_atlas8([(_rgba8_from_c15(np.asarray(t, np.uint16)),
                                    0)], pad_data_to=aa_max, pad_count_to=1)
               for _, _, t, _, _, _ in draws]
        a_atlas8 = stack(aa8)

    return CompiledScene(mesh=mesh, faces=faces, atlas=atlas, fog=fog,
                         ambient=ambient, lights=lights,
                         a_mesh=a_mesh, a_faces=a_faces, a_atlas=a_atlas,
                         a_fog=a_fog,
                         a_ambient=jnp.asarray(np.array(a_amb, F32)),
                         atlas8=atlas8, tex_map=tex_map, a_atlas8=a_atlas8,
                         a_room=jnp.asarray(np.array(draw_rooms, np.int32)))


@functools.partial(jax.jit, static_argnames=("settings", "depth_mode",
                                             "skip_rooms", "use_fog",
                                             "render_assets"))
def render_level(fb: FrameBuffers, scene: CompiledScene,
                 camera: CameraArrays, settings: RasterSettings,
                 depth_mode: str = "fast", skip_rooms: tuple = (),
                 use_fog: bool = True,
                 render_assets: bool = True) -> FrameBuffers:
    """render_scene (scene.rs:180-261): sequential rooms (each with its own
    ambient + fog), then placed asset parts, into one framebuffer.

    skip_rooms / use_fog / render_assets mirror SceneRenderOptions
    (scene.rs:172-178): hidden rooms (and their placed objects) are
    skipped, fog can be forced off, and asset draws disabled — the world
    editor viewport's configuration.

    Dispatches on `settings.use_rgb555` (scene.rs:214-219): the False
    branch runs the full-8-bit pipeline (render_mesh, no fog) and needs a
    scene compiled with `with_8bit=True`."""
    if not settings.use_rgb555:
        if scene.atlas8 is None:
            raise ValueError(
                "use_rgb555=False needs compile_level(..., with_8bit=True)")
        return _render_level8(fb, scene, camera, settings, depth_mode)
    n_rooms = scene.ambient.shape[0]
    room_ok = np.ones(n_rooms, bool)
    for r in skip_rooms:
        if 0 <= r < n_rooms:
            room_ok[r] = False
    room_ok_d = jnp.asarray(room_ok)

    def no_fog_like(fog):
        return fog._replace(enabled=jnp.zeros_like(fog.enabled))

    def room_render(i, fb):
        mesh = jax.tree_util.tree_map(lambda x: x[i], scene.mesh)
        faces = jax.tree_util.tree_map(lambda x: x[i], scene.faces)
        fog = jax.tree_util.tree_map(lambda x: x[i], scene.fog)
        if not use_fog:
            fog = no_fog_like(fog)
        atlas = jax.tree_util.tree_map(lambda x: x[i], scene.atlas)
        lights = scene.lights._replace(ambient=scene.ambient[i])
        return render_mesh_15(fb, mesh, faces, atlas, camera, lights,
                              fog, settings, depth_mode=depth_mode)

    def room_body(i, fb):
        return jax.lax.cond(room_ok_d[i], lambda f: room_render(i, f),
                            lambda f: f, fb)

    fb = jax.lax.fori_loop(0, n_rooms, room_body, fb)

    if not render_assets:
        return fb
    n_draws = scene.a_ambient.shape[0]
    a_room = (scene.a_room if scene.a_room is not None
              else jnp.zeros(n_draws, jnp.int32))

    def draw_render(i, fb):
        mesh = jax.tree_util.tree_map(lambda x: x[i], scene.a_mesh)
        faces = jax.tree_util.tree_map(lambda x: x[i], scene.a_faces)
        fog = jax.tree_util.tree_map(lambda x: x[i], scene.a_fog)
        if not use_fog:
            fog = no_fog_like(fog)
        atlas = jax.tree_util.tree_map(lambda x: x[i], scene.a_atlas)
        lights = scene.lights._replace(ambient=scene.a_ambient[i])
        return render_mesh_15(fb, mesh, faces, atlas, camera, lights,
                              fog, settings, depth_mode=depth_mode)

    def draw_body(i, fb):
        ok = room_ok_d[jnp.clip(a_room[i], 0, n_rooms - 1)]
        return jax.lax.cond(ok, lambda f: draw_render(i, f),
                            lambda f: f, fb)

    return jax.lax.fori_loop(0, n_draws, draw_body, fb)


def _render_level8(fb: FrameBuffers, scene: CompiledScene,
                   camera: CameraArrays, settings: RasterSettings,
                   depth_mode: str) -> FrameBuffers:
    """use_rgb555=False branch: 8-bit pipeline against the untrimmed global
    atlas (scene.rs:216-218 `render_mesh(...)` — fog is 15-bit-only)."""
    from ..ops.raster8 import render_mesh8
    from ..types import no_fog

    n_rooms = scene.ambient.shape[0]
    fog0 = no_fog()

    def room_body(i, fb):
        mesh = jax.tree_util.tree_map(lambda x: x[i], scene.mesh)
        faces = jax.tree_util.tree_map(lambda x: x[i], scene.faces)
        tm = scene.tex_map[i]
        tid = faces.tex_id
        faces = faces._replace(
            tex_id=jnp.where(tid >= 0, tm[jnp.maximum(tid, 0)], tid))
        lights = scene.lights._replace(ambient=scene.ambient[i])
        return render_mesh8(fb, mesh, faces, scene.atlas8, camera, lights,
                            fog0, settings)

    fb = jax.lax.fori_loop(0, n_rooms, room_body, fb)

    n_draws = scene.a_ambient.shape[0]

    def draw_body(i, fb):
        mesh = jax.tree_util.tree_map(lambda x: x[i], scene.a_mesh)
        faces = jax.tree_util.tree_map(lambda x: x[i], scene.a_faces)
        atlas8 = jax.tree_util.tree_map(lambda x: x[i], scene.a_atlas8)
        lights = scene.lights._replace(ambient=scene.a_ambient[i])
        return render_mesh8(fb, mesh, faces, atlas8, camera, lights,
                            fog0, settings)

    return jax.lax.fori_loop(0, n_draws, draw_body, fb)

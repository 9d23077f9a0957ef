"""Flat scene compilation for the batched Pallas rasterizer.

`compile_level` (scene.py) stacks rooms into (R, ...) buffers and renders
them with a sequential fori_loop per instance — fine for parity, but it
keeps the whole rasterizer inside a per-instance vmap (round-1 profile:
the keyed pass alone was ~1.8 ms/instance there, PLAN_PERF.md item 9).

This module compiles the SAME level into one flat face list:

  * all rooms' (and placed asset parts') vertices/faces concatenated,
    with one GLOBAL texture atlas (no per-room remap);
  * per-face fog/ambient arrays carrying each room's settings
    (render_scene clones settings per room, scene.rs:196-225 — a face's
    corners always belong to its room, so per-face params are exact);
  * host-precomputed kernel tables: texel bit-planes for the MXU texel
    fetch, per-texture key-bit word rows, texture metadata rows.

Draw order is preserved: rooms in order, then placed asset draws in order
(scene.rs:196, 226).  For opaque faces under a z-buffer the order only
breaks ties, so flattening is exact; transparent faces are recorded as a
STATIC index list and composited by the caller (bonnie32_tpu/ops/
raster_batch.py routes to the sequential path when interleaving with later
rooms' opaque geometry could change the reference's output).
"""

import dataclasses
import functools
from typing import List, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import RasterSettings, ShadingMode, BlendMode, NEAR_PLANE
from ..types import (CameraArrays, FaceArrays, FrameBuffers, Lights,
                     MeshArrays, Surfaces, TextureAtlas)
from ..ops.surface import _fog_factor, _apply_fog_to_color
from ..ops.exactf import exact_div, exact_recip
from ..ops.lighting import shade_points
from ..ops.vertex import transform_vertices, normalize_rows
from . import build
from .level import Level
from .scene import (_room_fog_params, transform_part_vertices,
                    resolve_part_texture15)

F32 = np.float32
_F32 = jnp.float32
_I32 = jnp.int32


class FogFaces(NamedTuple):
    """Per-face room fog parameters (room settings flattened onto faces)."""

    enabled: jnp.ndarray        # (T,) bool
    start: jnp.ndarray          # (T,) f32
    falloff: jnp.ndarray        # (T,) f32
    cull_distance: jnp.ndarray  # (T,) f32
    color: jnp.ndarray          # (T, 3) i32


class FlatScene(NamedTuple):
    """Device arrays for the whole level as one flat draw list."""

    mesh: MeshArrays        # (V, ...)
    faces: FaceArrays       # (T, ...) — global texture ids
    fog: FogFaces           # (T, ...)
    ambient: jnp.ndarray    # (T,) f32 per-face room ambient
    lights: Lights
    atlas: TextureAtlas     # global
    # Kernel tables (see ops/raster_batch.py):
    tex_lo: jnp.ndarray     # (Ra, 128) bf16 — texel low byte
    tex_hi: jnp.ndarray     # (Ra, 128) bf16 — texel high byte << 8
    keyrows: jnp.ndarray    # (NT, WR, 128) i32 — per-texture key-bit words
    texmeta: jnp.ndarray    # (4, 128) i32 rows: width, height, offset, 0
    tex_pack: jnp.ndarray   # (Rp, 128) i32 — per-texture packed planes
    tex_pal: jnp.ndarray    # (Pp, 128) i32 — per-texture palettes
    # Pre-gathered per-face corner attributes: the vertex->corner gathers
    # are camera-independent, so they happen ONCE at compile time instead
    # of per instance per frame (round-4: vmapped XLA gathers made surf
    # ~44 us/inst on Cathedral).  Transforming corner copies is bit-exact
    # vs transform-then-gather (same elementwise math on the same values).
    cpos: jnp.ndarray       # (T, 3, 3) f32 world corner positions
    cnorm: jnp.ndarray      # (T, 3, 3) f32 world corner normals
    cuv: jnp.ndarray        # (T, 3, 2) f32
    cvcol: jnp.ndarray      # (T, 3, 3) i32
    cvblend: jnp.ndarray    # (T, 3) i32
    # Camera-independent per-face attributes, resolved at compile time so
    # build_surfaces_flat carries no per-instance gathers for them:
    f_blend: jnp.ndarray      # (T,) i32 resolved blend mode (tex or face)
    f_hastransp: jnp.ndarray  # (T,) bool has_transparency
    # Draw-group id per face (room index, then one group per placed asset
    # part, in draw order) — scopes painter's-mode back-to-front sorting
    # and wireframe edge dedup to one render_mesh_15-call equivalent.
    f_group: jnp.ndarray      # (T,) i32
    # Precomputed Gouraud/flat shading (round 4): point-light shading
    # depends only on world positions/normals + static lights, so for a
    # static level it is camera-independent — computed ONCE at compile
    # time for both normal orientations (the backface swap negates the
    # normal).  Killed ~half of Cathedral's surf cost (shade_points over
    # T*3*L per instance per frame).
    cshade: jnp.ndarray       # (T, 3, 3) f32 Gouraud shade, front
    cshade_neg: jnp.ndarray   # (T, 3, 3) f32 Gouraud shade, -normal
    fshade: jnp.ndarray       # (T, 3) f32 flat shade, front
    fshade_neg: jnp.ndarray   # (T, 3) f32 flat shade, -normal


@dataclasses.dataclass(frozen=True)
class FlatSceneStatic:
    """Hashable compile-time facts about a FlatScene (static jit args)."""

    n_faces: int            # T
    t_pad: int              # compacted-face capacity (multiple of 128)
    groups: int             # t_pad // 128
    n_textures: int         # NT (<= 128)
    atlas_rows: int         # Ra (16-aligned for bf16 sublane tiling)
    atlas_rows_data: int    # rows actually holding texels (loop bound)
    key_wrows: int          # WR: key words per texture / 128
    # Per-texture packed-fetch encodings (build.encode_atlas_packed):
    # ("pack2", row0, nrows) | ("pal4"|"pal16", row0, nrows, pal0, prows)
    tex_enc: Tuple[tuple, ...]
    transparent_idx: Tuple[int, ...]   # static transparent-face list
    # True when every transparent face lives in the final room/draw, so
    # opaque-then-transparent matches the reference's per-room interleave.
    transparent_last: bool
    # Number of draw groups (rooms + placed asset parts).  Backface
    # wireframes are kernel-eligible only at 1: later groups' solids can
    # overwrite earlier groups' wire pixels in the reference's per-group
    # interleave, which a post-kernel line pass cannot replicate.
    n_draw_groups: int = 1
    # black_transparent folded to a compile-time constant when uniform
    # over valid faces (True/False), else None — lets the kernel drop the
    # C_FLAGS attr gather and the flag selects (all sample levels are
    # uniformly True).
    bt_const: Optional[bool] = None
    # Vertex-color fold (round 5).  With fog disabled on every face the
    # runtime vertex colors ARE the compile-time corner colors
    # (_apply_fog_to_color's factor<=0 branch passes the i32 values
    # through untouched), so:
    #   ("const", packed_rgb) — one uniform (r,g,b) over all valid faces'
    #     corners: the kernel drops the three C_VCP* attr gathers and
    #     interpolates compile-time constants (identical expressions —
    #     bit-exact; corner swaps permute equal values);
    #   ("gray",) — r==g==b per corner: one channel interp, vg=vb=vr.
    # Cave/Cathedral are ("const", 128|128<<8|128<<16); Dungeon ("gray",).
    vc_mode: Optional[tuple] = None
    # (w, h) when every texture in the atlas has the same dimensions —
    # the kernel folds the per-pixel tw/th texmeta gathers to constants
    # (every sample level ships only 64x64 textures).
    tex_wh: Optional[Tuple[int, int]] = None
    # Shade fold (round 5).  The compile-time shade tables (cshade/
    # cshade_neg/fshade/fshade_neg) collapse without point lights: every
    # corner's shade is its room's ambient, identical for both normal
    # orientations — so the swap select and the per-corner variation
    # vanish STATICALLY.  Classification over valid faces (requires all
    # four tables elementwise equal and corner-uniform, which makes the
    # fold exact for every shading mode and backface swap):
    #   ("const", (r, g, b)) — one shade everywhere: the 9 Gouraud gather
    #     columns drop entirely;
    #   ("pfgray",) — per-face uniform corners with r==g==b: one column;
    #   ("pf",) — per-face uniform corners: three columns.
    # The datagen configs carry no lights, so the sample levels all fold.
    sh_mode: Optional[tuple] = None


def _faces_to_arrays(verts, faces, textures, pad_faces=None):
    pos = np.array([v["pos"] for v in verts], F32)
    uv = np.array([v["uv"] for v in verts], F32)
    normal = np.array([v["normal"] for v in verts], F32)
    color = np.array([v["color"] for v in verts], np.int32)
    cblend = np.array([v.get("color_blend", 0) for v in verts], np.int32)
    mesh = build.make_mesh_arrays(pos, uv, normal, color, cblend)
    if faces:
        vidx = np.array([(f["v0"], f["v1"], f["v2"]) for f in faces], np.int32)
        tex_id = np.array([-1 if f.get("tex_id") is None else f["tex_id"]
                           for f in faces], np.int32)
        bt = np.array([f.get("black_transparent", True) for f in faces], bool)
        bm = np.array([f.get("blend_mode", 0) for f in faces], np.int32)
        ea = np.array([f.get("editor_alpha", 255) for f in faces], np.int32)
        kp = build.compute_key_possible(uv, vidx, tex_id, bt, textures)
        fa = build.make_face_arrays(vidx, tex_id, bt, bm, ea,
                                    key_possible=kp, pad_to=pad_faces)
    else:
        fa = build.make_face_arrays(np.zeros((1, 3), np.int32),
                                    pad_to=pad_faces)
        fa = fa._replace(valid=jnp.zeros_like(fa.valid))
    return mesh, fa


def compile_level_flat(level: Level, textures, resolve,
                       light_specs: Optional[List[dict]] = None,
                       asset_library=None, user_textures=None,
                       light_pad: int = 8):
    """Level -> (FlatScene, FlatSceneStatic).

    `textures`/`resolve` as in scene.compile_level; placed asset parts
    append their resolved Texture15s to the global texture table.
    """
    tex_list = [t if isinstance(t, tuple) else (t.pixels15, 0)
                for t in textures]

    groups = []   # (verts, faces(dicts, global tex ids), fog_row, ambient, ds)
    for room in level.rooms:
        verts, faces = room.to_render_data(resolve)
        groups.append((verts, faces, _room_fog_params(room), room.ambient,
                       None))

    # Placed asset draws (scene.rs:226-259), same walk as compile_level.
    if asset_library is not None:
        for room in level.rooms:
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
                    gid = len(tex_list)
                    tex_list.append((tex15, 0))
                    pfaces = [dict(f, tex_id=(gid if f.get("tex_id")
                                              is not None else None))
                              for f in pfaces]
                    if part.double_sided:
                        pfaces = [dict(f, double_sided=True) for f in pfaces]
                    groups.append((verts, pfaces, fog_row, room.ambient,
                                   part.double_sided))

    return _compile_groups(groups, tex_list, light_specs, light_pad)


def compile_scene_flat(verts, faces, textures, light_specs=None,
                       ambient: float = 0.3, light_pad: int = 8):
    # default ambient matches build.lights_from_list's 0.3 so raw-mesh
    # scenes shade identically through either path
    """One raw mesh (scenes.py-style vert/face dicts + (pixels15, blend)
    textures) -> (FlatScene, FlatSceneStatic) for the batched kernel —
    the bench's raster-only configs go through the same kernel as levels."""
    tex_list = [t if isinstance(t, tuple) else (t.pixels15, 0)
                for t in textures]
    fog_row = (False, 0.0, 0.0, 3.4e38, (0, 0, 0))
    groups = [(list(verts), [dict(f) for f in faces], fog_row, ambient,
               None)]
    return _compile_groups(groups, tex_list, light_specs, light_pad)


def _compile_groups(groups, tex_list, light_specs, light_pad):
    # Concatenate into one vertex/face list.
    all_v, all_f = [], []
    fog_rows, ambients, ds_flags, group_ids = [], [], [], []
    for gi, (verts, faces, fog_row, amb, ds) in enumerate(groups):
        base = len(all_v)
        if not verts:
            verts = [dict(pos=(0, 0, 0), uv=(0, 0), normal=(0, 0, 0),
                          color=(128, 128, 128), color_blend=0)]
        all_v.extend(verts)
        for f in faces:
            all_f.append(dict(f, v0=f["v0"] + base, v1=f["v1"] + base,
                              v2=f["v2"] + base))
            fog_rows.append(fog_row)
            ambients.append(amb)
            ds_flags.append(bool(ds) if ds is not None
                            else bool(f.get("double_sided", False)))
            group_ids.append(gi)

    if not all_f:
        all_f = [dict(v0=0, v1=0, v2=0, tex_id=None)]
        fog_rows.append((False, 0.0, 0.0, 3.4e38, (0, 0, 0)))
        ambients.append(0.5)
        ds_flags.append(False)
        group_ids.append(0)
        dummy_valid = True
    else:
        dummy_valid = False

    # Trim the global atlas to textures actually sampled (the per-room path
    # trims per room, scene.py; here one compact global table).  FIRST-USE
    # order, not sorted: faces draw in room order, so co-occurring textures
    # pack into adjacent atlas rows — the kernel's 128-row texel tiles then
    # stay sparse per screen chunk (raster_batch.py fetch_texel).
    used = list(dict.fromkeys(f["tex_id"] for f in all_f
                              if f.get("tex_id") is not None
                              and f["tex_id"] >= 0))
    if not used and tex_list:
        used = [0]
    remap = {g: i for i, g in enumerate(used)}
    for f in all_f:
        if f.get("tex_id") is not None and f["tex_id"] >= 0:
            f["tex_id"] = remap[f["tex_id"]]
    tex_list = [tex_list[g] for g in used]

    mesh, fa = _faces_to_arrays(all_v, all_f, tex_list)
    if dummy_valid:
        fa = fa._replace(valid=jnp.zeros_like(fa.valid))
    fa = fa._replace(double_sided=jnp.asarray(np.asarray(ds_flags, bool)))

    fog = FogFaces(
        enabled=jnp.asarray(np.array([f[0] for f in fog_rows], bool)),
        start=jnp.asarray(np.array([f[1] for f in fog_rows], F32)),
        falloff=jnp.asarray(np.array([f[2] for f in fog_rows], F32)),
        cull_distance=jnp.asarray(np.array([f[3] for f in fog_rows], F32)),
        color=jnp.asarray(np.array([f[4] for f in fog_rows], np.int32)),
    )
    ambient = jnp.asarray(np.array(ambients, F32))
    lights = build.lights_from_list(light_specs or [], pad=light_pad)

    atlas = build.build_atlas(tex_list)

    # ---- kernel tables ----
    data = np.asarray(atlas.data)
    ra_data = max(-(-data.size // 128), 1)
    ra = -(-ra_data // 16) * 16  # bf16 sublane alignment
    padded = np.zeros(ra * 128, np.int32)
    padded[:data.size] = data
    padded = padded.reshape(ra, 128)
    # hi plane prescaled by 256 (hi<<8 keeps 8 significant bits — still
    # bf16-exact) so the kernel combines planes with one add, no multiply
    tex_lo = jnp.asarray((padded & 0xFF).astype(np.float32), jnp.bfloat16)
    tex_hi = jnp.asarray((padded & 0xFF00).astype(np.float32),
                         jnp.bfloat16)

    wrows_np = np.asarray(atlas.black_wrows)   # (NT, Wmax)
    nt = wrows_np.shape[0]
    assert nt <= 128, "global texture table exceeds one metadata lane row"
    wr = max(-(-wrows_np.shape[1] // 128), 1)
    keyrows = np.zeros((nt, wr, 128), np.int32)
    keyrows.reshape(nt, -1)[:, :wrows_np.shape[1]] = wrows_np

    texmeta = np.zeros((4, 128), np.int32)
    texmeta[0, :nt] = np.asarray(atlas.width)
    texmeta[1, :nt] = np.asarray(atlas.height)
    texmeta[2, :nt] = np.asarray(atlas.offset)
    texmeta[0, nt:] = 1
    texmeta[1, nt:] = 1

    texpack, texpal, tex_enc = build.encode_atlas_packed(atlas)

    # ---- static facts ----
    t = len(all_f)
    t_pad = max(-(-t // 128) * 128, 128)
    from ..ops.raster_batch import SEG
    if t_pad > SEG:
        # big levels stream the face table through SMEM in SEG-row
        # segments — pad to a whole segment count
        t_pad = -(-t_pad // SEG) * SEG
    tex_blend = np.asarray(atlas.blend_mode)
    tid_np = np.array([-1 if f.get("tex_id") is None else f["tex_id"]
                       for f in all_f], np.int64)
    textured = tid_np >= 0
    face_bm = np.array([f.get("blend_mode", 0) for f in all_f], np.int64)
    ea_np = np.array([f.get("editor_alpha", 255) for f in all_f], np.int64)
    has_tr = ((textured & (tex_blend[np.maximum(tid_np, 0)]
                           != int(BlendMode.OPAQUE)))
              | (face_bm != int(BlendMode.OPAQUE)) | (ea_np < 255))
    if dummy_valid:
        has_tr[:] = False
    tr_idx = tuple(int(i) for i in np.where(has_tr)[0])
    # all transparent faces in the final group <=> flat order == per-room
    last_start = t - len(groups[-1][1]) if groups else 0
    tr_last = all(i >= last_start for i in tr_idx)

    vidx_np = np.asarray(fa.vidx)
    pos_np = np.asarray(mesh.pos)
    norm_np = np.asarray(mesh.normal)
    uv_np = np.asarray(mesh.uv)
    vcol_np = np.asarray(mesh.color)
    vblend_np = np.asarray(mesh.color_blend)

    # Compile-time shading (see FlatScene field comment).  The negated
    # variants replicate the runtime backface path bit-for-bit: Gouraud
    # is per-corner pointwise (permute+negate commute); the flat average
    # uses the SWAPPED corner summation order (0,2),1 because fp addition
    # isn't associative.
    cpos_j = jnp.asarray(pos_np[vidx_np])
    cnorm_j = jnp.asarray(norm_np[vidx_np])
    amb3 = jnp.broadcast_to(ambient[:, None], cpos_j.shape[:2])
    cshade = shade_points(cnorm_j, cpos_j, lights, ambient=amb3)
    cshade_neg = shade_points(-cnorm_j, cpos_j, lights, ambient=amb3)
    third = _F32(1.0 / 3.0)
    center_f = ((cpos_j[:, 0] + cpos_j[:, 1]) + cpos_j[:, 2]) * third
    avg_f = ((cnorm_j[:, 0] + cnorm_j[:, 1]) + cnorm_j[:, 2]) * third
    fshade = shade_points(normalize_rows(avg_f), center_f, lights,
                          ambient=ambient)
    center_s = ((cpos_j[:, 0] + cpos_j[:, 2]) + cpos_j[:, 1]) * third
    avg_s = ((-cnorm_j[:, 0] + -cnorm_j[:, 2]) + -cnorm_j[:, 1]) * third
    fshade_neg = shade_points(normalize_rows(avg_s), center_s, lights,
                              ambient=ambient)

    scene = FlatScene(mesh=mesh, faces=fa, fog=fog, ambient=ambient,
                      lights=lights, atlas=atlas,
                      tex_lo=tex_lo, tex_hi=tex_hi,
                      keyrows=jnp.asarray(keyrows),
                      texmeta=jnp.asarray(texmeta),
                      tex_pack=jnp.asarray(texpack),
                      tex_pal=jnp.asarray(texpal),
                      cpos=cpos_j,
                      cnorm=cnorm_j,
                      cuv=jnp.asarray(uv_np[vidx_np]),
                      cvcol=jnp.asarray(vcol_np[vidx_np]),
                      cvblend=jnp.asarray(vblend_np[vidx_np]),
                      f_blend=jnp.asarray(
                          np.where(textured,
                                   tex_blend[np.maximum(tid_np, 0)],
                                   face_bm).astype(np.int32)),
                      f_hastransp=jnp.asarray(has_tr),
                      f_group=jnp.asarray(np.asarray(group_ids, np.int32)),
                      cshade=cshade, cshade_neg=cshade_neg,
                      fshade=fshade, fshade_neg=fshade_neg)
    bt_np = np.array([f.get("black_transparent", True) for f in all_f],
                     bool)
    valid_np = np.asarray(fa.valid)
    btv = bt_np[valid_np]
    bt_const = (True if (btv.size == 0 or btv.all())
                else (False if not btv.any() else None))

    # vc_mode / tex_wh folds (see FlatSceneStatic field comments)
    fog_any = bool(np.array([f[0] for f in fog_rows], bool)[valid_np].any())
    vcc = np.asarray(vcol_np[vidx_np])[valid_np].reshape(-1, 3)
    vc_mode = None
    if not fog_any and vcc.size:
        uniq = np.unique(vcc, axis=0)
        if len(uniq) == 1:
            r, g, b = (int(x) for x in uniq[0])
            vc_mode = ("const", r | (g << 8) | (b << 16))
        elif ((vcc[:, 0] == vcc[:, 1]).all()
              and (vcc[:, 1] == vcc[:, 2]).all()):
            vc_mode = ("gray",)
    ws = np.unique(texmeta[0, :nt]) if nt else np.empty(0)
    hs = np.unique(texmeta[1, :nt]) if nt else np.empty(0)
    tex_wh = ((int(ws[0]), int(hs[0]))
              if len(ws) == 1 and len(hs) == 1 else None)

    # sh_mode fold (see FlatSceneStatic): all four shade tables must agree
    # elementwise (orientation-independent) and be corner-uniform
    sh_mode = None
    cs = np.asarray(cshade)[valid_np]                       # (Tv, 3, 3)
    csn = np.asarray(cshade_neg)[valid_np]
    fs3 = np.broadcast_to(np.asarray(fshade)[valid_np][:, None, :],
                          cs.shape)
    fsn3 = np.broadcast_to(np.asarray(fshade_neg)[valid_np][:, None, :],
                           cs.shape)
    if cs.size and (cs == csn).all() and (cs == fs3).all() \
            and (cs == fsn3).all() and (cs == cs[:, :1, :]).all():
        vals = cs[:, 0, :]                                  # (Tv, 3)
        uniq = np.unique(vals, axis=0)
        if len(uniq) == 1:
            sh_mode = ("const", tuple(float(x) for x in uniq[0]))
        elif (vals[:, 0] == vals[:, 1]).all() \
                and (vals[:, 1] == vals[:, 2]).all():
            sh_mode = ("pfgray",)
        else:
            sh_mode = ("pf",)

    static = FlatSceneStatic(
        n_faces=t, t_pad=t_pad, groups=t_pad // 128, n_textures=nt,
        atlas_rows=ra, atlas_rows_data=ra_data,
        key_wrows=wr, tex_enc=tex_enc, transparent_idx=tr_idx,
        transparent_last=tr_last, n_draw_groups=len(groups),
        bt_const=bt_const, vc_mode=vc_mode, tex_wh=tex_wh,
        sh_mode=sh_mode)
    return scene, static


def build_surfaces_flat(scene: FlatScene, camera: CameraArrays,
                        settings: RasterSettings,
                        width: int, height: int) -> Surfaces:
    """ops/surface.build_surfaces with per-FACE fog/ambient arrays.

    Same math/op order (render.rs:2313-2513); fog parameters and ambient
    broadcast per face instead of being scalars, which is exact because a
    face's corners are always in its own room.
    """
    faces, fog = scene.faces, scene.fog
    atlas, lights = scene.atlas, scene.lights
    # Transform the pre-gathered corner copies directly: zero per-instance
    # gathers (the vertex->corner indexing happened once at compile time),
    # bit-exact vs transform-then-gather.
    tv = transform_vertices(scene.cpos, scene.cnorm, camera, settings,
                            width, height, with_normals=False)

    c_sx = tv.sx            # (T, 3)
    c_sy = tv.sy
    c_sz = tv.sz
    c_cam = tv.cam          # (T, 3, 3)
    c_wpos = scene.cpos
    c_wnorm = scene.cnorm
    c_uv = scene.cuv
    c_vcol = scene.cvcol
    c_vblend = scene.cvblend

    cam_z = c_cam[..., 2]

    if settings.ortho_projection is None:
        near_ok = jnp.all(cam_z > NEAR_PLANE, axis=-1)
    else:
        near_ok = jnp.ones(c_sx.shape[0], bool)

    v1x, v2x, v3x = c_sx[:, 0], c_sx[:, 1], c_sx[:, 2]
    v1y, v2y, v3y = c_sy[:, 0], c_sy[:, 1], c_sy[:, 2]
    signed_area = (v2x - v1x) * (v3y - v1y) - (v3x - v1x) * (v2y - v1y)
    is_backface = signed_area <= 0.0

    # Fog with per-face params (broadcast over the 3 corners).
    factors = jnp.where(fog.enabled[:, None],
                        _fog_factor(cam_z, fog.start[:, None],
                                    fog.falloff[:, None]),
                        jnp.zeros_like(cam_z))
    vc_rgb, vc_blend = _apply_fog_to_color(c_vcol, c_vblend,
                                           fog.color[:, None, :], factors)
    fog_cull = fog.enabled & jnp.all(cam_z > fog.cull_distance[:, None],
                                     axis=-1)

    textured = faces.tex_id >= 0
    # blend mode / transparency are camera-independent — resolved at scene
    # compile (kills the per-instance atlas.blend_mode[tid] gather)
    has_transparency = scene.f_hastransp
    blend_mode = scene.f_blend

    render_back = not settings.backface_cull or settings.xray_mode
    render_back_face = (faces.double_sided
                        if not render_back else jnp.ones_like(is_backface))
    swap = is_backface & (render_back_face | render_back)

    def permute(arr):
        # corner swap (0,2,1) as slice+stack + select — static-index
        # gathers ([:, [0,2,1]]) still lower as XLA gathers under vmap
        # (and take_along_axis promotes to i64, which scalarizes on
        # XLA:TPU — PLAN_PERF.md item 1); slices fuse for free.
        swapped = jnp.stack([arr[:, 0], arr[:, 2], arr[:, 1]], axis=1)
        mask = swap.reshape(swap.shape + (1,) * (arr.ndim - 1))
        return jnp.where(mask, swapped, arr)

    sx = permute(c_sx[..., None])[..., 0]
    sy = permute(c_sy[..., None])[..., 0]
    sz = permute(c_sz[..., None])[..., 0]
    uv = permute(c_uv)
    vc = permute(vc_rgb)
    vcb = permute(vc_blend[..., None])[..., 0]

    # Shading comes from the compile-time tables (FlatScene.cshade*):
    # point-light Gouraud/flat shading is camera-independent, so the only
    # per-instance work is selecting the backface-negated variant.
    shape3 = c_wpos.shape
    if settings.shading == ShadingMode.GOURAUD:
        neg = scene.cshade_neg
        neg_p = jnp.stack([neg[:, 0], neg[:, 2], neg[:, 1]], axis=1)
        shade = jnp.where(swap[:, None, None], neg_p, scene.cshade)
    elif settings.shading == ShadingMode.FLAT:
        flat = jnp.where(swap[:, None], scene.fshade_neg, scene.fshade)
        shade = jnp.broadcast_to(flat[:, None, :], shape3)
    else:
        shade = jnp.ones(shape3, _F32)

    vc_eq_12 = jnp.all(vc[:, 0] == vc[:, 1], axis=-1) & (vcb[:, 0] == vcb[:, 1])
    vc_eq_23 = jnp.all(vc[:, 1] == vc[:, 2], axis=-1) & (vcb[:, 1] == vcb[:, 2])
    needs_dither = settings.dithering & (
        (settings.shading == ShadingMode.GOURAUD)
        | textured | ~vc_eq_12 | ~vc_eq_23)

    front_ok = ~is_backface | render_back_face | render_back
    valid = faces.valid & near_ok & ~fog_cull & front_ok

    centroid_z = exact_div((sz[:, 0] + sz[:, 1]) + sz[:, 2],
                           jnp.full_like(sz[:, 0], 3.0))
    inv_z = exact_recip(sz)

    r1x, r2x, r3x = sx[:, 0], sx[:, 1], sx[:, 2]
    r1y, r2y, r3y = sy[:, 0], sy[:, 1], sy[:, 2]
    area = (r2y - r3y) * (r1x - r3x) + (r3x - r2x) * (r1y - r3y)
    degenerate = jnp.abs(area) < 0.00001
    inv_area = exact_recip(jnp.where(degenerate, _F32(1.0), area))

    return Surfaces(
        sx=sx, sy=sy, z=sz, inv_z=inv_z, area=area, inv_area=inv_area,
        uv=uv, vc=vc, shade=shade,
        tex_id=faces.tex_id, blend_mode=blend_mode,
        black_transparent=faces.black_transparent,
        editor_alpha=faces.editor_alpha,
        needs_dither=needs_dither,
        has_transparency=has_transparency,
        centroid_z=centroid_z,
        valid=valid,
        key_possible=faces.key_possible,
    )


# ---------------------------------------------------------------------------
# Top-level batched render entry
# ---------------------------------------------------------------------------

def kernel_path_ok(static: FlatSceneStatic,
                   settings: RasterSettings) -> bool:
    """Static eligibility for the fused kernel (else use scene.render_level
    under vmap).  Round-4 widened the kernel beyond the game configs:

      * painter's mode (use_zbuffer=False): the kernel merges by draw
        order (last covering face wins) with faces pre-sorted per group
        back-to-front — single-segment face tables only (the painter's
        sort needs the whole order column in one segment);
      * wireframe_overlay: solid passes are skipped entirely
        (render.rs:2550) and the front-edge pass is order-independent,
        so it runs as a post pass for any group count;
      * backface wireframes: post-pass, exact only for one draw group
        (per-group solid/wire interleave — see render_wireframes_flat);
      * x-ray (round 5): the kernel's phase-3 ordered compositor runs
        over EVERY face in draw order with the 50% blend and no depth
        interaction (render.rs:507-526) — phases 1-2 are skipped.
        Needs single-segment tables, affine UVs and packed texel
        encodings (the phase-3 preconditions).

    Still excluded: ortho projection (depth can be <= 0 where inverse-z
    ordering breaks; the reference semantics need harmonic z,
    raster_ref)."""
    from ..ops.raster_batch import SEG

    if settings.ortho_projection is not None:
        return False
    if (settings.backface_cull and settings.backface_wireframe
            and static.n_draw_groups > 1):
        return False
    if settings.xray_mode:
        return (settings.affine_textures and static.t_pad <= SEG
                and bool(static.tex_enc))
    if not static.transparent_last:
        return False
    if not settings.use_zbuffer and static.t_pad > SEG:
        return False
    return True


def _transparent_pass(fb, surf, idx_tuple, atlas, settings, width, height):
    """Back-to-front masked compositing of the STATIC transparent-face set
    (render.rs:2522-2570 transparent pass), vmapped over instances."""
    from ..ops.raster_ref import _raster_one

    idxs = np.asarray(idx_tuple, np.int64)
    sub = jax.tree_util.tree_map(lambda x: x[:, idxs], surf)
    n = len(idx_tuple)

    yi, xi = jnp.meshgrid(jnp.arange(height, dtype=_I32),
                          jnp.arange(width, dtype=_I32), indexing="ij")
    grids = (xi.astype(_F32), yi.astype(_F32), xi, yi)

    def one(color, depth, s):
        # back-to-front: centroid z descending, stable (index order ties) —
        # matches raster_fast's lexsort((arange, -centroid_z, ...)).
        order = jnp.argsort(-s.centroid_z, stable=True).astype(_I32)

        def body(i, carry):
            k = order[i]
            scalars = (
                s.sx[k], s.sy[k], s.z[k], s.inv_z[k], s.area[k],
                s.inv_area[k], s.uv[k], s.vc[k], s.shade[k], s.tex_id[k],
                s.blend_mode[k], s.black_transparent[k], s.editor_alpha[k],
                s.needs_dither[k], jnp.asarray(True), s.valid[k],
            )
            return _raster_one(carry, scalars, atlas, settings, grids, "inv")

        return jax.lax.fori_loop(0, n, body, (color, depth))

    color, depth = jax.vmap(one)(fb.color, fb.depth, sub)
    return FrameBuffers(color=color, depth=depth)


@functools.partial(jax.jit, static_argnames=("static", "settings", "height",
                                             "width", "interpret",
                                             "debug", "background"))
def render_level_flat(fb: FrameBuffers, scene: FlatScene,
                      static: FlatSceneStatic, cams: CameraArrays,
                      settings: RasterSettings,
                      height: int, width: int,
                      interpret: bool = False,
                      debug: str = "",
                      background: Optional[int] = None,
                      fb_layout_color=None,
                      sky=None) -> FrameBuffers:
    """Batched level render: (I, H, W) framebuffers + (I,) cameras through
    the fused Pallas kernel.  render_scene (scene.rs:180-261) semantics:
    identical output to scene.render_level per instance (tested), one
    kernel launch for the whole batch.

    `background` asserts fb == new_framebuffer(depth_mode="inv",
    clear_color=background) for every instance (the no-skybox datagen
    path): the kernel then synthesizes the background in-register and
    skips both framebuffer DMAs and the host-side layout transposes.

    `fb_layout_color` ((I, NG*H, 128) packed words, e.g. from
    ops.skybox.render_skybox_layout) supplies the color plane ALREADY in
    kernel layout with an implicitly-cleared inverse-z depth — the skybox
    buffer path: no host transposes, no depth DMA.

    `sky` (ops.skybox.SkyTables) selects the IN-KERNEL sky (round 5):
    the kernel synthesizes the background per chunk from the analytic
    sky function + static mountain faces — no per-instance sky buffer at
    all, and fully-covered chunks skip the sky entirely — then the star
    sparkles post-compose onto still-background pixels
    (scatter_stars_layout).  Requires ops.skybox.sky_kernel_ok."""
    from ..ops import raster_batch as rb
    from ..ops import wireframe as wf

    wires_on = (settings.wireframe_overlay
                or (settings.backface_cull and settings.backface_wireframe))
    if settings.wireframe_overlay:
        # Solid passes are skipped entirely in overlay mode
        # (render.rs:2550): only the front-edge line pass runs.
        assert fb is not None, "wireframe modes need explicit framebuffers"
        return wf.render_wireframes_flat(fb, scene, cams, settings,
                                         width, height, depth_mode="inv")

    # Segmentation plan: phase 3 (in-kernel transparency / x-ray) and
    # painter's need single-segment original-order tables, so they force
    # sg1 up to the SMEM cap even when seg_plan would rather stream
    # (seg_plan splits big tables so their SMEM DMAs double-buffer).
    in_kernel_tr = (bool(static.transparent_idx)
                    and static.t_pad <= rb.SEG
                    and settings.affine_textures
                    and bool(static.tex_enc)
                    and "seqtrans" not in debug)
    force_single = (settings.xray_mode or not settings.use_zbuffer
                    or in_kernel_tr) and static.t_pad <= rb.SEG
    if (force_single and "sg" not in debug
            and rb.seg_plan(static.t_pad, debug)[0] != 1):
        debug = (debug + " sg1").strip()
    n_segs = rb.seg_plan(static.t_pad, debug)[0]

    surf = jax.vmap(
        lambda c: build_surfaces_flat(scene, c, settings, width, height))(cams)
    prep = jax.vmap(
        lambda s: rb.prep_instance(s, scene.atlas, settings, width, height,
                                   static.t_pad, group_id=scene.f_group,
                                   n_segs=n_segs))(surf)
    n_inst = fb.color.shape[0] if fb is not None \
        else fb_layout_color.shape[0]
    skyprep = sky_static = None
    if sky is not None:
        from ..ops import skybox as sky_ops
        assert background is None and fb_layout_color is None
        assert sky_ops.sky_kernel_ok(sky, static, settings), \
            "in-kernel sky: use the fb_layout_color buffer path for " \
            "this settings/level combination (sky_kernel_ok)"
        skyprep = jax.vmap(
            lambda c: sky_ops.prep_sky_scal(sky, c, width, height))(cams)
        sky_static = sky.kstat
        fbc = jnp.zeros((n_inst, 8, 128), jnp.int32)
        fbd = jnp.zeros((n_inst, 8, 128), jnp.float32)
        if "cdepth" not in debug:
            debug = (debug + " cdepth").strip()
    elif fb_layout_color is not None:
        assert background is None
        fbc = fb_layout_color
        fbd = jnp.zeros((n_inst, 8, 128), jnp.float32)
        if "cdepth" not in debug:
            debug = (debug + " cdepth").strip()
    elif background is not None:
        fbc = jnp.zeros((n_inst, 8, 128), jnp.int32)
        fbd = jnp.zeros((n_inst, 8, 128), jnp.float32)
    else:
        fbc = rb.to_layout(fb.color, width)
        fbd = rb.to_layout(fb.depth, width)
    # In-kernel transparent pass (phase 3, round 5): eligible whenever the
    # kernel can read every face by original id (single-segment tables,
    # forced above), UVs are affine (the sequential compositor's
    # perspective path divides with exact_div — no f64 in Mosaic) and
    # packed texel encodings exist.  "seqtrans" forces the sequential
    # compositor for A/B.  X-ray mode is phase 3 over EVERY face in draw
    # order with phases 1-2 skipped (render.rs:507-526; kernel_path_ok
    # gates eligibility).
    trprep = None
    n_tr = 0
    if settings.xray_mode:
        assert kernel_path_ok(static, settings), \
            "x-ray through the kernel needs single-segment affine tables"
        trprep = jax.vmap(lambda s: rb.prep_xray(
            s, group_id=scene.f_group,
            use_zbuffer=settings.use_zbuffer))(surf)
        n_tr = static.n_faces
        debug = (debug + " novis nophase2").strip()
        in_kernel_tr = True     # the ordered pass covers transparency too
    elif in_kernel_tr:
        trprep = jax.vmap(
            lambda s: rb.prep_transparent(s, static.transparent_idx))(surf)
        n_tr = len(static.transparent_idx)
    color, depth = rb.rasterize_batch(
        fbc, fbd, prep, scene.keyrows, scene.texmeta, scene.tex_lo,
        scene.tex_hi, scene.tex_pack, scene.tex_pal,
        settings, width, height, static.t_pad,
        static.n_textures, static.atlas_rows, static.key_wrows,
        atlas_rows_data=static.atlas_rows_data, tex_enc=static.tex_enc,
        interpret=interpret, debug=debug, clear_color=background,
        trprep=trprep, n_tr=n_tr, skyprep=skyprep, sky_static=sky_static,
        bt_const=static.bt_const, vc_mode=static.vc_mode,
        tex_wh=static.tex_wh,
        sh_mode=static.sh_mode if settings.shading != ShadingMode.NONE
        else None)
    if sky is not None and sky.kstat.skybox.stars.enabled:
        from ..ops import skybox as sky_ops
        color = jax.vmap(
            lambda cl, d, cm: sky_ops.scatter_stars_layout(
                cl, d, sky, cm, height, width))(color, depth, cams)
    out = FrameBuffers(color=rb.from_layout(color, width, height),
                       depth=rb.from_layout(depth, width, height))
    if static.transparent_idx and not in_kernel_tr:
        out = _transparent_pass(out, surf, static.transparent_idx,
                                scene.atlas, settings, width, height)
    if wires_on:
        # Backface wires (single draw group; see kernel_path_ok) run after
        # the solid + transparent passes, as in render_mesh_15.
        out = wf.render_wireframes_flat(out, scene, cams, settings,
                                        width, height, depth_mode="inv")
    return out

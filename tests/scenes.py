"""Shared test scenes: build identical inputs for the golden numpy model and
the JAX pipeline."""

import numpy as np
import jax.numpy as jnp

from bonnie32_tpu.config import BlendMode
from bonnie32_tpu.models import build
from bonnie32_tpu.types import Fog, no_fog

F32 = np.float32


def checker_texture15(w=32, h=32, c1=0x7FFF, c2=0x0C63, block=4,
                      with_black=False, with_transparent=False,
                      blend_mode=int(BlendMode.OPAQUE)):
    """A Color15 checkerboard, optionally with black / transparent texels."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pix = np.where(((xs // block) + (ys // block)) % 2 == 0, c1, c2).astype(np.uint16)
    if with_black:
        pix[1::7, 1::5] = 0x8000  # drawable black (rgb 0, STP set)
    if with_transparent:
        pix[3::8, 2::6] = 0x0000
    return pix, blend_mode


def cube_scene(tex_ids=(0, 0, 0, None, None, 0), size=1.0, center=(0.0, 0.0, 0.0),
               vertex_colors=None, blend_modes=None, black_transparent=True,
               editor_alpha=255):
    """A 24-vertex, 12-triangle cube with per-face uv/normals.

    Returns (vertices, faces) in golden-model format; convert with
    `to_jax_scene` for the TPU pipeline.
    """
    s = size / 2.0
    cx, cy, cz = center
    # 6 faces: +x, -x, +y, -y, +z, -z; outward normals, CCW-ish winding.
    quads = [
        # (corner offsets, normal)
        ([(+s, -s, -s), (+s, +s, -s), (+s, +s, +s), (+s, -s, +s)], (1, 0, 0)),
        ([(-s, -s, +s), (-s, +s, +s), (-s, +s, -s), (-s, -s, -s)], (-1, 0, 0)),
        ([(-s, +s, -s), (-s, +s, +s), (+s, +s, +s), (+s, +s, -s)], (0, 1, 0)),
        ([(-s, -s, +s), (-s, -s, -s), (+s, -s, -s), (+s, -s, +s)], (0, -1, 0)),
        ([(+s, -s, +s), (+s, +s, +s), (-s, +s, +s), (-s, -s, +s)], (0, 0, 1)),
        ([(-s, -s, -s), (-s, +s, -s), (+s, +s, -s), (+s, -s, -s)], (0, 0, -1)),
    ]
    uvs = [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0)]
    vertices = []
    faces = []
    if vertex_colors is None:
        vertex_colors = [(128, 128, 128)] * 6
    if blend_modes is None:
        blend_modes = [0] * 6
    for qi, (corners, normal) in enumerate(quads):
        base = len(vertices)
        col = vertex_colors[qi % len(vertex_colors)]
        for ci, c in enumerate(corners):
            vertices.append(dict(
                pos=(c[0] + cx, c[1] + cy, c[2] + cz),
                uv=uvs[ci], normal=normal, color=col, color_blend=0))
        tid = tex_ids[qi % len(tex_ids)]
        for tri in ((0, 1, 2), (0, 2, 3)):
            faces.append(dict(
                v0=base + tri[0], v1=base + tri[1], v2=base + tri[2],
                tex_id=tid, black_transparent=black_transparent,
                blend_mode=blend_modes[qi % len(blend_modes)],
                editor_alpha=editor_alpha))
    return vertices, faces


def to_jax_scene(vertices, faces, pad_verts=None, pad_faces=None):
    """Golden-format scene -> (MeshArrays, FaceArrays)."""
    pos = np.array([v["pos"] for v in vertices], F32)
    uv = np.array([v["uv"] for v in vertices], F32)
    normal = np.array([v["normal"] for v in vertices], F32)
    color = np.array([v.get("color", (128, 128, 128)) for v in vertices], np.int32)
    cblend = np.array([v.get("color_blend", 0) for v in vertices], np.int32)
    mesh = build.make_mesh_arrays(pos, uv, normal, color, cblend, pad_to=pad_verts)

    vidx = np.array([(f["v0"], f["v1"], f["v2"]) for f in faces], np.int32)
    tex_id = np.array([-1 if f.get("tex_id") is None else f["tex_id"]
                       for f in faces], np.int32)
    bt = np.array([f.get("black_transparent", True) for f in faces], bool)
    bm = np.array([f.get("blend_mode", 0) for f in faces], np.int32)
    ea = np.array([f.get("editor_alpha", 255) for f in faces], np.int32)
    fa = build.make_face_arrays(vidx, tex_id, bt, bm, ea, pad_to=pad_faces)
    return mesh, fa


def make_fog(start, falloff, cull, color):
    return Fog(enabled=jnp.asarray(True), start=jnp.float32(start),
               falloff=jnp.float32(falloff), cull_distance=jnp.float32(cull),
               color=jnp.asarray(np.asarray(color, np.int32)))


DEFAULT_LIGHT_SPECS = [dict(kind="directional", direction=(-1.0, -1.0, -1.0),
                            intensity=0.7, color=(255, 255, 255))]

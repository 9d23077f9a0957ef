"""OBJ import: Wavefront meshes (ps1-mesh-gen outputs) -> EditableMesh,
with optional companion-PNG texture quantization to an indexed atlas + CLUT.

Reference behavior: `/root/reference/src/modeler/obj_import.rs` (parse at
:22, face-vertex dedup at :143, PNG resize+quantize at :271, full import
at :381, normal fill-in at :468).
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import List, Optional, Tuple

import numpy as np

from . import quantize
from .mesh import Clut, EditFace, EditableMesh, IndexedAtlas, MeshVertex


class ObjError(ValueError):
    """Parse or IO failure (obj_import.rs:530)."""


def _parse_float(s: str, line_num: int) -> float:
    try:
        return float(s)
    except ValueError:
        raise ObjError(f"Line {line_num + 1}: Invalid float value '{s}'")


def _parse_index(s: str, count: int, line_num: int) -> int:
    """1-based, negative = relative to current count (obj_import.rs:217)."""
    try:
        idx = int(s)
    except ValueError:
        raise ObjError(f"Line {line_num + 1}: Invalid index '{s}'")
    if idx > 0:
        result = idx - 1
    elif idx < 0:
        result = count + idx
    else:
        raise ObjError(f"Line {line_num + 1}: Index cannot be 0")
    if not 0 <= result < count:
        raise ObjError(f"Line {line_num + 1}: Index {idx} out of range "
                       f"(have {count} elements)")
    return result


def parse_obj(contents: str) -> EditableMesh:
    """obj_import.rs:22 — v/vt/vn/f; other directives ignored.

    Face vertices are deduplicated on the (pos, uv, normal) index triple.
    OBJ files use CCW winding; the rasterizer expects CW, so each fan
    triangle swaps its last two vertices (obj_import.rs:115-122).
    """
    positions: List[Tuple[float, float, float]] = []
    tex_coords: List[Tuple[float, float]] = []
    normals: List[Tuple[float, float, float]] = []
    vertices: List[MeshVertex] = []
    faces: List[EditFace] = []
    cache = {}

    def face_vertex(spec: str, line_num: int) -> int:
        parts = spec.split("/")
        if not parts[0]:
            raise ObjError(f"Line {line_num + 1}: Missing position index")
        pos_idx = _parse_index(parts[0], len(positions), line_num)
        tc_idx = (_parse_index(parts[1], len(tex_coords), line_num)
                  if len(parts) > 1 and parts[1] else -1)
        norm_idx = (_parse_index(parts[2], len(normals), line_num)
                    if len(parts) > 2 and parts[2] else -1)
        key = (pos_idx, tc_idx, norm_idx)
        if key in cache:
            return cache[key]
        uv = tex_coords[tc_idx] if tc_idx >= 0 else (0.0, 0.0)
        nrm = normals[norm_idx] if norm_idx >= 0 else (0.0, 0.0, 0.0)
        vertices.append(MeshVertex(pos=positions[pos_idx], uv=uv, normal=nrm))
        cache[key] = len(vertices) - 1
        return cache[key]

    for line_num, raw in enumerate(contents.splitlines()):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        tag = parts[0]
        if tag == "v":
            if len(parts) < 4:
                raise ObjError(f"Line {line_num + 1}: Invalid vertex position")
            positions.append(tuple(_parse_float(p, line_num)
                                   for p in parts[1:4]))
        elif tag == "vt":
            if len(parts) < 3:
                raise ObjError(f"Line {line_num + 1}: Invalid texture coord")
            tex_coords.append(tuple(_parse_float(p, line_num)
                                    for p in parts[1:3]))
        elif tag == "vn":
            if len(parts) < 4:
                raise ObjError(f"Line {line_num + 1}: Invalid normal")
            normals.append(tuple(_parse_float(p, line_num)
                                 for p in parts[1:4]))
        elif tag == "f":
            if len(parts) < 4:
                raise ObjError(f"Line {line_num + 1}: Face must have at "
                               "least 3 vertices")
            fv = [face_vertex(p, line_num) for p in parts[1:]]
            for i in range(1, len(fv) - 1):
                faces.append(EditFace(vertices=[fv[0], fv[i + 1], fv[i]]))
        # o/g/s/usemtl/mtllib etc. ignored (obj_import.rs:125)

    if not vertices:
        raise ObjError("No vertices found in OBJ file")
    if not faces:
        raise ObjError("No faces found in OBJ file")
    return EditableMesh(vertices=vertices, faces=faces)


def load_obj(path) -> EditableMesh:
    with open(path, "r") as f:
        return parse_obj(f.read())


def compute_face_normals(mesh: EditableMesh) -> None:
    """obj_import.rs:468 — fill zero normals with the face normal (first
    face touching the vertex wins)."""
    face_normals = []
    for face in mesh.faces:
        if len(face.vertices) < 3:
            continue
        p0 = np.asarray(mesh.vertices[face.vertices[0]].pos, np.float32)
        p1 = np.asarray(mesh.vertices[face.vertices[1]].pos, np.float32)
        p2 = np.asarray(mesh.vertices[face.vertices[2]].pos, np.float32)
        n = np.cross(p1 - p0, p2 - p0)
        length = math.sqrt(float((n * n).sum()))
        if length > 0:
            n = n / length
        face_normals.append((list(face.vertices), tuple(float(x) for x in n)))
    for verts, normal in face_normals:
        for vi in verts:
            v = mesh.vertices[vi]
            if v.normal == (0.0, 0.0, 0.0):
                mesh.vertices[vi] = dataclasses.replace(v, normal=normal)


# ---------------------------------------------------------------------------
# Texture import
# ---------------------------------------------------------------------------

def find_texture_for_obj(obj_path) -> Optional[str]:
    """obj_import.rs:252 — sibling PNG with the same stem."""
    png = os.path.splitext(str(obj_path))[0] + ".png"
    return png if os.path.exists(png) else None


def _atlas_dim(width: int, height: int) -> int:
    """obj_import.rs:283 — power-of-2 target, max 512."""
    m = max(width, height)
    if m <= 64:
        return 64
    if m <= 128:
        return 128
    if m <= 256:
        return 256
    return 512


def _resize_nearest(rgba: np.ndarray, dim: int) -> np.ndarray:
    """obj_import.rs:294 — floor-ratio nearest-neighbor sampling."""
    h, w = rgba.shape[:2]
    xs = np.minimum(np.arange(dim) * w // dim, w - 1)
    ys = np.minimum(np.arange(dim) * h // dim, h - 1)
    return rgba[ys[:, None], xs[None, :]]


def _load_png_rgba(png_path) -> np.ndarray:
    from PIL import Image
    with Image.open(png_path) as im:
        return np.asarray(im.convert("RGBA"), np.uint8)


def load_png_and_quantize(png_path, depth: int,
                          name: str = "") -> Tuple[IndexedAtlas, Clut]:
    """obj_import.rs:328 — resize to pow2 atlas then quantize at depth."""
    rgba = _resize_nearest(_load_png_rgba(png_path),
                           _atlas_dim(*_png_dims(png_path)))
    res = quantize.quantize_image(rgba, rgba.shape[1], rgba.shape[0],
                                  depth=depth, name=name)
    return res.texture, res.clut


def load_png_and_quantize_auto(png_path,
                               name: str = "") -> Tuple[IndexedAtlas, Clut, int]:
    """obj_import.rs:271 — pick Bpp4/Bpp8 from the unique-color count."""
    rgba = _resize_nearest(_load_png_rgba(png_path),
                           _atlas_dim(*_png_dims(png_path)))
    unique = quantize.count_unique_colors(rgba)
    depth = quantize.optimal_clut_depth(unique)
    res = quantize.quantize_image(rgba, rgba.shape[1], rgba.shape[0],
                                  depth=depth, name=name)
    return res.texture, res.clut, unique


def _png_dims(png_path) -> Tuple[int, int]:
    from PIL import Image
    with Image.open(png_path) as im:
        return im.width, im.height


# ---------------------------------------------------------------------------
# Full import
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class TextureImportResult:
    """obj_import.rs:508."""

    indexed: IndexedAtlas
    clut: Clut
    color_count: int


@dataclasses.dataclass
class ObjImportResult:
    """obj_import.rs:519."""

    mesh: EditableMesh
    texture: Optional[TextureImportResult]
    texture_path: Optional[str]


def import_with_texture(obj_path, scale: float = 1.0,
                        quantize_depth: Optional[int] = None) -> ObjImportResult:
    """obj_import.rs:381 — mesh + scale + normals + quantized texture."""
    mesh = load_obj(obj_path)
    _scale_mesh(mesh, scale)
    compute_face_normals(mesh)

    texture_path = find_texture_for_obj(obj_path)
    texture = None
    if texture_path is not None:
        name = os.path.splitext(os.path.basename(str(obj_path)))[0]
        depth = quantize_depth if quantize_depth is not None else 0
        try:
            indexed, clut = load_png_and_quantize(texture_path, depth, name)
            texture = TextureImportResult(
                indexed=indexed, clut=clut,
                color_count=len(np.unique(indexed.indices)))
        except OSError:
            texture = None
    return ObjImportResult(mesh=mesh, texture=texture,
                           texture_path=texture_path)


def import_with_auto_quantize(obj_path, scale: float = 1.0) -> ObjImportResult:
    """obj_import.rs:429 — CLUT depth chosen from the image's color count."""
    mesh = load_obj(obj_path)
    _scale_mesh(mesh, scale)
    compute_face_normals(mesh)

    texture_path = find_texture_for_obj(obj_path)
    texture = None
    if texture_path is not None:
        name = os.path.splitext(os.path.basename(str(obj_path)))[0]
        try:
            indexed, clut, n = load_png_and_quantize_auto(texture_path, name)
            texture = TextureImportResult(indexed=indexed, clut=clut,
                                          color_count=n)
        except OSError:
            texture = None
    return ObjImportResult(mesh=mesh, texture=texture,
                           texture_path=texture_path)


def _scale_mesh(mesh: EditableMesh, scale: float) -> None:
    if scale == 1.0:
        return
    for i, v in enumerate(mesh.vertices):
        mesh.vertices[i] = dataclasses.replace(
            v, pos=tuple(np.float32(c) * np.float32(scale) for c in v.pos))


# ---------------------------------------------------------------------------
# Import dialog state + transforms (obj_importer.rs:180-237, :607-670;
# accept flow main.rs:1189-1260; flip helpers obj_importer.rs:944-978)
# ---------------------------------------------------------------------------

def compute_mesh_bounds(mesh: EditableMesh):
    xs = [v.pos[0] for v in mesh.vertices] or [0.0]
    ys = [v.pos[1] for v in mesh.vertices] or [0.0]
    zs = [v.pos[2] for v in mesh.vertices] or [0.0]
    return ((min(xs), min(ys), min(zs)), (max(xs), max(ys), max(zs)))


def apply_mesh_flip_horizontal(mesh: EditableMesh) -> None:
    """obj_importer.rs:944 — mirror X about the bounds center; winding
    reverses so normals stay outward."""
    mn, mx = compute_mesh_bounds(mesh)
    cx = (mn[0] + mx[0]) / 2.0
    for v in mesh.vertices:
        v.pos = (cx - (v.pos[0] - cx), v.pos[1], v.pos[2])
    for f in mesh.faces:
        f.vertices.reverse()


def apply_mesh_flip_vertical(mesh: EditableMesh) -> None:
    """obj_importer.rs:963 — mirror Y about the bounds center."""
    mn, mx = compute_mesh_bounds(mesh)
    cy = (mn[1] + mx[1]) / 2.0
    for v in mesh.vertices:
        v.pos = (v.pos[0], cy - (v.pos[1] - cy), v.pos[2])
    for f in mesh.faces:
        f.vertices.reverse()


class ObjImportDialog:
    """obj_importer.rs:180 — the importer's working state: scale in
    halve/double steps, normal/axis flips, preview mesh."""

    def __init__(self):
        self.import_scale = 1024.0     # 1024 units = 1 m (:231)
        self.flip_normals = False
        self.flip_horizontal = False
        self.flip_vertical = False
        self.preview_mesh: Optional[EditableMesh] = None
        self.clut_depth_override: Optional[int] = None

    def halve_scale(self) -> None:
        self.import_scale = max(self.import_scale / 2.0, 0.001)

    def double_scale(self) -> None:
        self.import_scale = min(self.import_scale * 2.0, 1_000_000.0)

    def scale_text(self) -> str:
        """:614-619 — precision follows magnitude."""
        s = self.import_scale
        if s >= 1.0:
            return f"{s:.0f}"
        if s >= 0.01:
            return f"{s:.2f}"
        return f"{s:.3f}"

    def transform(self, mesh: EditableMesh) -> EditableMesh:
        """Apply scale + flips in the accept order (main.rs:1193-1220)."""
        for v in mesh.vertices:
            v.pos = (v.pos[0] * self.import_scale,
                     v.pos[1] * self.import_scale,
                     v.pos[2] * self.import_scale)
        compute_face_normals(mesh)
        if self.flip_normals:
            for v in mesh.vertices:
                v.normal = (-v.normal[0], -v.normal[1], -v.normal[2])
            for f in mesh.faces:
                f.vertices.reverse()
        if self.flip_horizontal:
            apply_mesh_flip_horizontal(mesh)
        if self.flip_vertical:
            apply_mesh_flip_vertical(mesh)
        return mesh

    def load_preview(self, path) -> EditableMesh:
        self.preview_mesh = self.transform(load_obj(path))
        return self.preview_mesh

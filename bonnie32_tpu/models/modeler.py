"""Modeler (asset editor) state: selection modes, modal G/S/R transforms,
snapping, mirror editing, mesh clipboard.

Reference behavior: `/root/reference/src/modeler/state.rs` — SelectMode
(:423), ModalTransform/UvModalTransform (:619-656), Axis/GizmoHandle
(:677-733), SnapSettings (:736, default grid 128 = SECTOR_SIZE/8),
MirrorSettings (:777-851), Clipboard copy_faces/paste (:855-958),
undo via UndoEvent snapshots (:1274).
"""

from __future__ import annotations

import copy
import dataclasses
import enum
import math
from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from .mesh import EditFace, EditableMesh, MeshVertex


class SelectMode(enum.Enum):
    """state.rs:423 — face-centric by default (PicoCAD workflow)."""

    VERTEX = "Vertex"
    EDGE = "Edge"
    FACE = "Face"


class ModalTransform(enum.Enum):
    """state.rs:619 — G/S/R modal editing."""

    NONE = ""
    GRAB = "Grab"
    SCALE = "Scale"
    ROTATE = "Rotate"


class Axis(enum.Enum):
    """state.rs:677."""

    X = 0
    Y = 1
    Z = 2

    @property
    def vec(self) -> np.ndarray:
        v = np.zeros(3, np.float32)
        v[self.value] = 1.0
        return v

    @property
    def color(self) -> Tuple[int, int, int]:
        return [(255, 80, 80), (80, 255, 80), (80, 80, 255)][self.value]


@dataclasses.dataclass
class SnapSettings:
    """state.rs:736 — grid 128 = SECTOR_SIZE / 8, on by default."""

    enabled: bool = True
    grid_size: float = 128.0

    def snap(self, value: float) -> float:
        if not self.enabled:
            return value
        return round(value / self.grid_size) * self.grid_size

    def snap_vec(self, pos) -> np.ndarray:
        p = np.asarray(pos, np.float32)
        if not self.enabled:
            return p
        return np.asarray([self.snap(float(c)) for c in p], np.float32)


@dataclasses.dataclass
class MirrorSettings:
    """state.rs:777 — symmetric editing across an axis plane."""

    enabled: bool = False
    axis: Axis = Axis.X
    threshold: float = 1.0

    def is_editable_side(self, pos) -> bool:
        if not self.enabled:
            return True
        return float(pos[self.axis.value]) >= -self.threshold

    def is_on_plane(self, pos) -> bool:
        return abs(float(pos[self.axis.value])) <= self.threshold

    def constrain_to_plane(self, pos) -> np.ndarray:
        p = np.asarray(pos, np.float32).copy()
        if self.enabled and self.is_on_plane(p):
            p[self.axis.value] = 0.0
        return p

    def mirror_position(self, pos) -> np.ndarray:
        p = np.asarray(pos, np.float32).copy()
        p[self.axis.value] = -p[self.axis.value]
        return p

    def mirror_normal(self, normal) -> np.ndarray:
        return self.mirror_position(normal)


# ---------------------------------------------------------------------------
# Modal transform application (viewport.rs drives these per mouse delta)
# ---------------------------------------------------------------------------

def transform_positions(positions, mode: ModalTransform, pivot,
                        delta, axis: Optional[Axis] = None,
                        snap: Optional[SnapSettings] = None) -> np.ndarray:
    """Apply a modal transform to (N, 3) positions around `pivot`.

    GRAB:   delta = (3,) translation (constrained to `axis` if set)
    SCALE:  delta = scalar factor (axis-only when constrained)
    ROTATE: delta = angle radians about `axis` (Y when unset, matching the
            viewport's default turntable rotate)
    """
    p = np.asarray(positions, np.float32).reshape(-1, 3).copy()
    pivot = np.asarray(pivot, np.float32)
    if mode == ModalTransform.GRAB:
        d = np.asarray(delta, np.float32)
        if axis is not None:
            d = axis.vec * float(d[axis.value])
        p = p + d
        if snap is not None and snap.enabled:
            p = np.stack([snap.snap_vec(row) for row in p])
    elif mode == ModalTransform.SCALE:
        f = float(delta)
        rel = p - pivot
        if axis is not None:
            rel[:, axis.value] *= f
        else:
            rel *= f
        p = pivot + rel
    elif mode == ModalTransform.ROTATE:
        ax = (axis or Axis.Y).value
        a = float(delta)
        c, s = math.cos(a), math.sin(a)
        i, j = [(1, 2), (2, 0), (0, 1)][ax]   # plane perpendicular to axis
        rel = p - pivot
        ri = rel[:, i] * c - rel[:, j] * s
        rj = rel[:, i] * s + rel[:, j] * c
        rel[:, i] = ri
        rel[:, j] = rj
        p = pivot + rel
    return p


def transform_uvs(uvs, mode: ModalTransform, pivot, delta) -> np.ndarray:
    """UV-space G/S/R (state.rs:638 UvModalTransform)."""
    uv = np.asarray(uvs, np.float32).reshape(-1, 2).copy()
    pivot = np.asarray(pivot, np.float32)
    if mode == ModalTransform.GRAB:
        uv = uv + np.asarray(delta, np.float32)
    elif mode == ModalTransform.SCALE:
        uv = pivot + (uv - pivot) * float(delta)
    elif mode == ModalTransform.ROTATE:
        a = float(delta)
        c, s = math.cos(a), math.sin(a)
        rel = uv - pivot
        uv = pivot + np.stack([rel[:, 0] * c - rel[:, 1] * s,
                               rel[:, 0] * s + rel[:, 1] * c], axis=1)
    return uv


# ---------------------------------------------------------------------------
# Mesh clipboard (state.rs:855-958)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class MeshClipboard:
    mesh: Optional[EditableMesh] = None
    center: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    def copy_faces(self, mesh: EditableMesh, face_indices) -> None:
        """Extract the selected faces + their vertices, re-centered at the
        origin (state.rs:864)."""
        if not face_indices:
            self.mesh = None
            return
        used: List[int] = []
        remap: Dict[int, int] = {}
        for fi in face_indices:
            for v in mesh.faces[fi].vertices:
                if v not in remap:
                    remap[v] = len(used)
                    used.append(v)
        verts = [copy.deepcopy(mesh.vertices[v]) for v in used]
        center = np.mean([v.pos for v in verts], axis=0).astype(np.float32)
        verts = [dataclasses.replace(
            v, pos=tuple(np.asarray(v.pos, np.float32) - center))
            for v in verts]
        faces = []
        for fi in face_indices:
            f = mesh.faces[fi]
            faces.append(EditFace(
                vertices=[remap[v] for v in f.vertices],
                texture_id=f.texture_id,
                black_transparent=f.black_transparent,
                blend_mode=f.blend_mode))
        self.mesh = EditableMesh(vertices=verts, faces=faces)
        self.center = tuple(float(c) for c in center)

    def paste_into(self, mesh: EditableMesh, at=None) -> List[int]:
        """Append clipboard geometry at `at` (default: the original
        center).  Returns the new face indices."""
        if self.mesh is None:
            return []
        offset = np.asarray(at if at is not None else self.center,
                            np.float32)
        base = len(mesh.vertices)
        for v in self.mesh.vertices:
            mesh.vertices.append(dataclasses.replace(
                v, pos=tuple(np.asarray(v.pos, np.float32) + offset)))
        new_faces = []
        for f in self.mesh.faces:
            mesh.faces.append(EditFace(
                vertices=[base + v for v in f.vertices],
                texture_id=f.texture_id,
                black_transparent=f.black_transparent,
                blend_mode=f.blend_mode))
            new_faces.append(len(mesh.faces) - 1)
        return new_faces


# ---------------------------------------------------------------------------
# ModelerState
# ---------------------------------------------------------------------------

def face_edges(face: EditFace) -> List[Tuple[int, int]]:
    """Edge list of a face loop (sorted vertex pairs)."""
    n = len(face.vertices)
    return [tuple(sorted((face.vertices[i], face.vertices[(i + 1) % n])))
            for i in range(n)]


# =============================================================================
# Skeleton editing (state.rs:2307-2680, layout.rs:1661-1720)
# =============================================================================

class SkeletonMixin:
    """Bone CRUD for ModelerState — mixed in below to keep the mesh and
    skeleton concerns separable.  Operates on an attached RiggedModel."""

    DEFAULT_BONE_LENGTH = 200.0   # layout.rs:1665

    def skeleton(self) -> List:
        """state.rs:2307 — the bone list ([] without a rig)."""
        return self.rigged.skeleton if self.rigged is not None else []

    def ensure_skeleton(self) -> None:
        """layout.rs:1695 ensure_skeleton_component — create the rig and a
        'Root' bone at origin pointing +Y when absent."""
        from .animation import RigBone, RiggedModel

        if self.rigged is None:
            self.rigged = RiggedModel(name="model")
        if not self.rigged.skeleton:
            self.rigged.skeleton.append(RigBone(
                name="Root", parent=None, local_position=(0.0, 0.0, 0.0),
                local_rotation=(0.0, 0.0, 0.0),
                length=self.DEFAULT_BONE_LENGTH))

    def generate_bone_name(self) -> str:
        """state.rs:2662 — first free 'Bone.NN'."""
        existing = {b.name for b in self.skeleton()}
        for i in range(100):
            name = f"Bone.{i:02d}"
            if name not in existing:
                return name
        return "Bone.99"

    def save_undo_skeleton(self) -> None:
        """state.rs save_undo_skeleton — snapshot the bone list."""
        self.skeleton_undo.append(copy.deepcopy(self.skeleton()))
        if len(self.skeleton_undo) > self.MAX_UNDO:
            self.skeleton_undo.pop(0)

    def undo_skeleton(self) -> bool:
        if not self.skeleton_undo or self.rigged is None:
            return False
        self.rigged.skeleton = self.skeleton_undo.pop()
        if self.selected_bone is not None \
                and self.selected_bone >= len(self.rigged.skeleton):
            self.selected_bone = None
        return True

    def create_child_bone(self, parent_idx: int) -> Optional[int]:
        """layout.rs:1661 — child at the parent's tip, inheriting rotation
        and display width."""
        from .animation import RigBone

        bones = self.skeleton()
        if not (0 <= parent_idx < len(bones)):
            return None
        self.save_undo_skeleton()
        p = bones[parent_idx]
        bone = RigBone(name=self.generate_bone_name(), parent=parent_idx,
                       local_position=(0.0, p.length, 0.0),
                       local_rotation=tuple(p.local_rotation),
                       length=self.DEFAULT_BONE_LENGTH,
                       width=p.display_width())
        bones.append(bone)
        self.selected_bone = len(bones) - 1
        return self.selected_bone

    def remove_bone(self, bone_idx: int) -> None:
        """state.rs:2542 — reparent children to the removed bone's parent
        and fix up indices/selection."""
        bones = self.skeleton()
        if not (0 <= bone_idx < len(bones)):
            return
        self.save_undo_skeleton()
        parent = bones[bone_idx].parent
        for b in bones:
            if b.parent == bone_idx:
                b.parent = parent
            if b.parent is not None and b.parent > bone_idx:
                b.parent = b.parent - 1
        bones.pop(bone_idx)
        if self.selected_bone == bone_idx:
            self.selected_bone = None
        elif self.selected_bone is not None \
                and self.selected_bone > bone_idx:
            self.selected_bone -= 1
        self.dirty = True

    def rename_bone(self, bone_idx: int, name: str) -> bool:
        bones = self.skeleton()
        if not name or not (0 <= bone_idx < len(bones)):
            return False
        self.save_undo_skeleton()
        bones[bone_idx].name = name
        self.dirty = True
        return True

    def bone_children(self, bone_idx: Optional[int]) -> List[int]:
        return [i for i, b in enumerate(self.skeleton())
                if b.parent == bone_idx]




class ModelerState(SkeletonMixin):
    """state.rs:959 — headless core of the asset editor."""

    MAX_UNDO = 50  # state.rs:1439

    def __init__(self, mesh: Optional[EditableMesh] = None):
        from .mesh import MeshPart, MeshProject

        # multi-part project (mesh_editor.rs:306); `mesh` delegates to the
        # active part so the single-mesh editing core is untouched
        self.project = MeshProject(
            name="model",
            objects=[MeshPart(name="Part.00",
                              mesh=(mesh if mesh is not None
                                    else EditableMesh.cube(512.0)))],
            selected_object=0)
        self.active_part = 0
        self.select_mode = SelectMode.FACE
        self.selected_faces: Set[int] = set()
        self.selected_vertices: Set[int] = set()
        self.selected_edges: Set[Tuple[int, int]] = set()
        self.modal = ModalTransform.NONE
        self.modal_axis: Optional[Axis] = None
        self.snap = SnapSettings()
        self.mirror = MirrorSettings()
        self.status_message = ""
        self.status_seconds = 0.0
        self.clipboard = MeshClipboard()
        self.undo_stack: List[EditableMesh] = []
        self.redo_stack: List[EditableMesh] = []
        self.dirty = False
        # the configured tool box lives on the state like state.rs:959's
        # `tools` field (constructed in tools/mod.rs:112)
        from .modeler_tools import ModelerToolBox
        self.toolbox = ModelerToolBox()
        # --- rigging (state.rs:1070-1074, :1424-1426) ---
        self.rigged = None                  # RiggedModel when rigging
        self.selected_bone: Optional[int] = None
        self.hovered_bone: Optional[int] = None
        self.bone_rename_active = False
        self.bone_rename_buffer = ""
        self.skeleton_undo: List = []
        # --- asset components being edited (layout.rs:723
        # draw_components_section; the asset's non-mesh behavior) ---
        self.components: List = []

    @property
    def mesh(self) -> EditableMesh:
        """The active part's geometry (MeshProject.selected)."""
        return self.project.objects[self.active_part].mesh

    @mesh.setter
    def mesh(self, m: EditableMesh) -> None:
        self.project.objects[self.active_part].mesh = m

    def set_active_part(self, idx: int) -> None:
        """Switching parts clears the selection (the reference's
        selected_object switch)."""
        if 0 <= idx < len(self.project.objects) \
                and idx != self.active_part:
            self.active_part = idx
            self.project.selected_object = idx
            self.selection = []

    PRIMITIVES = ("cube", "plane", "prism", "cylinder", "pyramid",
                  "pent", "hex")   # the radial menu's primitive set

    def add_part(self, primitive: str = "") -> int:
        """MeshProject::add_object with a Part.NN name; `primitive` picks
        the starting geometry (the radial Primitives menu,
        state.rs ContextMenuType::Primitives)."""
        from .mesh import EditableMesh, MeshPart

        existing = {o.name for o in self.project.objects}
        for i in range(100):
            name = f"Part.{i:02d}"
            if name not in existing:
                break
        builders = {
            "cube": lambda: EditableMesh.cube(512.0),
            "plane": lambda: EditableMesh.plane(512.0),
            "prism": lambda: EditableMesh.prism(512.0, 512.0),
            "cylinder": lambda: EditableMesh.cylinder(256.0, 512.0, 8),
            "pyramid": lambda: EditableMesh.pyramid(512.0, 512.0),
            "pent": lambda: EditableMesh.pent(256.0, 512.0),
            "hex": lambda: EditableMesh.hex(256.0, 512.0),
        }
        mesh = builders.get(primitive, EditableMesh)()
        idx = self.project.add_object(MeshPart(name=name, mesh=mesh))
        self.set_active_part(idx)
        self.dirty = True
        return idx

    def primitive_menu_items(self):
        """RadialMenuItems for the primitive set (ui/radial_menu.py)."""
        from ..ui.radial_menu import RadialMenuItem

        return [RadialMenuItem(id=f"prim.{p}", label=p.title())
                for p in self.PRIMITIVES]

    def delete_part(self, idx: int) -> bool:
        """Remove a part (at least one always remains)."""
        objs = self.project.objects
        if len(objs) <= 1 or not (0 <= idx < len(objs)):
            return False
        objs.pop(idx)
        if self.active_part > idx:
            self.active_part -= 1          # keep the same part active
        if self.active_part >= len(objs):
            self.active_part = len(objs) - 1
        self.project.selected_object = self.active_part
        self.selection = []
        self.dirty = True
        return True

    @property
    def selection(self) -> List:
        """The active select-mode's selection as a sorted list — the
        state.rs selection accessor the screen layer reads."""
        if self.select_mode == SelectMode.VERTEX:
            return sorted(self.selected_vertices)
        if self.select_mode == SelectMode.EDGE:
            return sorted(self.selected_edges)
        return sorted(self.selected_faces)

    @selection.setter
    def selection(self, items) -> None:
        self.selected_vertices.clear()
        self.selected_edges.clear()
        self.selected_faces.clear()
        if self.select_mode == SelectMode.VERTEX:
            self.selected_vertices.update(items)
        elif self.select_mode == SelectMode.EDGE:
            self.selected_edges.update(items)
        else:
            self.selected_faces.update(items)

    # --- selection -----------------------------------------------------

    def selection_vertices(self) -> List[int]:
        """The vertex set a modal transform operates on, per select mode."""
        if self.select_mode == SelectMode.VERTEX:
            return sorted(self.selected_vertices)
        if self.select_mode == SelectMode.EDGE:
            out: Set[int] = set()
            for (a, b) in self.selected_edges:
                out.add(a)
                out.add(b)
            return sorted(out)
        out = set()
        for fi in self.selected_faces:
            out.update(self.mesh.faces[fi].vertices)
        return sorted(out)

    def selection_pivot(self) -> np.ndarray:
        vids = self.selection_vertices()
        if not vids:
            return np.zeros(3, np.float32)
        return np.mean([self.mesh.vertices[v].pos for v in vids],
                       axis=0).astype(np.float32)

    # --- undo ------------------------------------------------------------

    def save_undo(self) -> None:
        self.undo_stack.append(copy.deepcopy(self.mesh))
        self.redo_stack.clear()
        if len(self.undo_stack) > self.MAX_UNDO:
            self.undo_stack.pop(0)
        self.dirty = True

    def undo(self) -> bool:
        if not self.undo_stack:
            return False
        self.redo_stack.append(self.mesh)
        self.mesh = self.undo_stack.pop()
        return True

    def redo(self) -> bool:
        if not self.redo_stack:
            return False
        self.undo_stack.append(self.mesh)
        self.mesh = self.redo_stack.pop()
        return True

    # --- modal transforms --------------------------------------------------

    def begin_modal(self, mode: ModalTransform,
                    axis: Optional[Axis] = None) -> None:
        self.save_undo()
        self.modal = mode
        self.modal_axis = axis

    def apply_modal(self, delta) -> None:
        """Apply the active modal transform to the selection, honoring snap
        and mirror (center vertices pinned to the plane; the mirrored half
        follows when symmetric editing is enabled)."""
        vids = self.selection_vertices()
        if not vids or self.modal == ModalTransform.NONE:
            return
        pos = np.stack([np.asarray(self.mesh.vertices[v].pos, np.float32)
                        for v in vids])
        new = transform_positions(
            pos, self.modal, self.selection_pivot(), delta,
            axis=self.modal_axis,
            snap=self.snap if self.modal == ModalTransform.GRAB else None)

        mirror_map = self._mirror_pairs(vids) if self.mirror.enabled else {}
        for i, v in enumerate(vids):
            p = self.mirror.constrain_to_plane(new[i])
            self.mesh.vertices[v] = dataclasses.replace(
                self.mesh.vertices[v], pos=tuple(float(c) for c in p))
            m = mirror_map.get(v)
            if m is not None and m not in vids:
                mp = self.mirror.mirror_position(p)
                self.mesh.vertices[m] = dataclasses.replace(
                    self.mesh.vertices[m], pos=tuple(float(c) for c in mp))

    def end_modal(self) -> None:
        self.modal = ModalTransform.NONE
        self.modal_axis = None

    def cancel_modal(self) -> None:
        """Escape: restore the pre-modal mesh."""
        if self.modal != ModalTransform.NONE:
            self.undo()
            self.redo_stack.clear()
        self.end_modal()

    def _mirror_pairs(self, vids) -> Dict[int, int]:
        """Match each selected vertex to its mirror twin by position."""
        out: Dict[int, int] = {}
        eps = max(self.mirror.threshold, 1e-3)
        for v in vids:
            p = np.asarray(self.mesh.vertices[v].pos, np.float32)
            if self.mirror.is_on_plane(p):
                continue
            target = self.mirror.mirror_position(p)
            for j, other in enumerate(self.mesh.vertices):
                if j == v:
                    continue
                q = np.asarray(other.pos, np.float32)
                if float(np.max(np.abs(q - target))) <= eps:
                    out[v] = j
                    break
        return out

    # --- face ops ------------------------------------------------------------

    def delete_selected_faces(self) -> int:
        if not self.selected_faces:
            return 0
        self.save_undo()
        keep = [f for i, f in enumerate(self.mesh.faces)
                if i not in self.selected_faces]
        n = len(self.mesh.faces) - len(keep)
        self.mesh.faces = keep
        self.selected_faces = set()
        return n

    def copy_selection(self) -> bool:
        if not self.selected_faces:
            return False
        self.clipboard.copy_faces(self.mesh, sorted(self.selected_faces))
        return True

    def paste(self, at=None) -> List[int]:
        self.save_undo()
        new_faces = self.clipboard.paste_into(self.mesh, at)
        self.selected_faces = set(new_faces)
        return new_faces

    # --- selection commands (layout.rs:6977-7113, :6891, :7358) --------

    def set_status(self, message: str, seconds: float = 1.0) -> None:
        """Status toast shown in the modeler status bar."""
        self.status_message = message
        self.status_seconds = seconds

    def select_all(self) -> int:
        """layout.rs:6977 — everything in the active select mode."""
        mesh = self.mesh
        if self.select_mode == SelectMode.VERTEX:
            items = list(range(len(mesh.vertices)))
            self.selection = items
            self.set_status(f"Selected {len(items)} vertices")
        elif self.select_mode == SelectMode.EDGE:
            edges = []
            seen = set()
            for face in mesh.faces:
                fv = face.vertices
                n = len(fv)
                for i in range(n):
                    a, b = fv[i], fv[(i + 1) % n]
                    e = (a, b) if a < b else (b, a)
                    if e not in seen:
                        seen.add(e)
                        edges.append(e)
            self.selection = edges
            self.set_status(f"Selected {len(edges)} edges")
            items = edges
        else:
            items = list(range(len(mesh.faces)))
            self.selection = items
            self.set_status(f"Selected {len(items)} faces")
        return len(items)

    def select_loop(self) -> None:
        """layout.rs:7013 — edge/face loop from the current selection."""
        mesh = self.mesh
        if self.select_mode == SelectMode.VERTEX:
            verts = sorted(self.selected_vertices)
            if len(verts) == 2:
                v0, v1 = verts
                is_edge = any(
                    (fv[i] == v0 and fv[(i + 1) % len(fv)] == v1)
                    or (fv[i] == v1 and fv[(i + 1) % len(fv)] == v0)
                    for f in mesh.faces for fv in (f.vertices,)
                    for i in range(len(fv)))
                if is_edge:
                    loop = mesh.select_edge_loop(v0, v1)
                    lv = mesh.vertices_from_edge_loop(loop)
                    self.selection = lv
                    self.set_status(
                        f"Selected edge loop ({len(lv)} vertices)", 1.5)
                else:
                    self.set_status(
                        "Selected vertices don't form an edge", 1.5)
            elif len(verts) == 1:
                v = verts[0]
                connected = {v}
                for face in mesh.faces:
                    if v in face.vertices:
                        connected.update(face.vertices)
                self.selection = sorted(connected)
                self.set_status(
                    f"Selected {len(connected)} connected vertices", 1.5)
            else:
                self.set_status(
                    "Select 2 adjacent vertices to select edge loop", 1.5)
        elif self.select_mode == SelectMode.EDGE:
            edges = sorted(self.selected_edges)
            if len(edges) == 1:
                loop = mesh.select_edge_loop(*edges[0])
                self.selection = [tuple(sorted(e)) for e in loop]
                self.set_status(
                    f"Selected edge loop ({len(loop)} edges)", 1.5)
            else:
                self.set_status(
                    "Select a single edge to select edge loop", 1.5)
        else:
            faces = sorted(self.selected_faces)
            if len(faces) == 1 and len(mesh.faces[faces[0]].vertices) >= 2:
                fv = mesh.faces[faces[0]].vertices
                loop = mesh.select_face_loop(faces[0], fv[0], fv[1])
                self.selection = loop
                self.set_status(
                    f"Selected face loop ({len(loop)} faces)", 1.5)
            else:
                self.set_status(
                    "Select a single face to select face loop", 1.5)

    def duplicate_selection(self) -> Optional[int]:
        """layout.rs:7358 — copy the selected faces (or the whole mesh)
        into a NEW part, offset (+100, 0, +100)."""
        import dataclasses as _dc

        from .mesh import MeshPart

        self.save_undo()
        if self.selected_faces:
            self.clipboard.copy_faces(self.mesh,
                                      sorted(self.selected_faces))
            n = len(self.selected_faces)
            msg = f"Duplicated {n} face(s)"
        else:
            self.clipboard.copy_faces(
                self.mesh, list(range(len(self.mesh.faces))))
            msg = "Duplicated mesh"
        if self.clipboard.mesh is None:
            return None
        new_mesh = copy.deepcopy(self.clipboard.mesh)
        cx, cy, cz = getattr(self.clipboard, "center", (0.0, 0.0, 0.0))
        for i, v in enumerate(new_mesh.vertices):
            p = v.pos
            new_mesh.vertices[i] = _dc.replace(
                v, pos=(p[0] + cx + 100.0, p[1] + cy, p[2] + cz + 100.0))
        part = MeshPart(name=f"Duplicate.{len(self.project.objects):02d}",
                        mesh=new_mesh)
        idx = self.project.add_object(part)
        self.set_status(msg)
        return idx

    def nudge_selection(self, dx: int, dy: int, view: str = "front",
                        shift: bool = False,
                        snap_disabled: bool = False) -> bool:
        """layout.rs:6891 handle_arrow_key_movement — move the selected
        vertices one grid step (half with shift, 1 unit with snap
        disabled) along the active viewport's axes.  dx/dy are the arrow
        direction (-1/0/+1; dy +1 = up)."""
        if dx == 0 and dy == 0:
            return False
        vids = self.selection_vertices()
        if not vids:
            return False
        grid = self.snap.grid_size
        amount = (1.0 if snap_disabled
                  else grid * 0.5 if shift else grid)
        if view in ("perspective", "front"):
            delta = np.array([dx * amount, dy * amount, 0.0], np.float32)
        elif view == "top":
            delta = np.array([dx * amount, 0.0, -dy * amount], np.float32)
        else:  # side (ZY plane)
            delta = np.array([0.0, dy * amount, dx * amount], np.float32)
        self.save_undo()
        mesh = self.mesh
        pairs = self._mirror_pairs(vids)
        moved = set()
        for v in vids:
            if v in moved:
                continue
            p = np.asarray(mesh.vertices[v].pos, np.float32) + delta
            mesh.vertices[v] = dataclasses.replace(
                mesh.vertices[v], pos=tuple(p.tolist()))
            moved.add(v)
            m = pairs.get(v)
            if m is not None and m not in moved and m not in vids:
                mp = self.mirror.mirror_position(p)
                mesh.vertices[m] = dataclasses.replace(
                    mesh.vertices[m], pos=tuple(np.asarray(
                        mp, np.float32).tolist()))
                moved.add(m)
        return True

    def auto_unwrap_selected_faces(self, tex_width: float = 64.0,
                                   tex_height: float = 64.0) -> int:
        """layout.rs:6395 + mesh_editor.rs:2936 auto_unwrap_faces,
        condensed: islands by shared edges, per-island planar projection
        onto the area-weighted normal plane, principal-axis grid
        alignment, then fit/pack into [0,1].  (The reference adds
        edge-unfolding within an island; this projects each island once —
        same islands, same packing contract.)"""
        faces = sorted(self.selected_faces)
        if not faces:
            self.set_status("Select faces to auto-unwrap")
            return 0
        self.save_undo()
        mesh = self.mesh

        # adjacency by shared edges within the selection
        edge_owner: Dict[Tuple[int, int], List[int]] = {}
        for fi in faces:
            fv = mesh.faces[fi].vertices
            for i in range(len(fv)):
                a, b = fv[i], fv[(i + 1) % len(fv)]
                edge_owner.setdefault((min(a, b), max(a, b)), []).append(fi)
        adj: Dict[int, set] = {fi: set() for fi in faces}
        for owners in edge_owner.values():
            for a in owners:
                for b in owners:
                    if a != b:
                        adj[a].add(b)
        # connected components
        islands: List[List[int]] = []
        left = set(faces)
        while left:
            seed = left.pop()
            comp = [seed]
            stack = [seed]
            while stack:
                for nb in adj[stack.pop()]:
                    if nb in left:
                        left.remove(nb)
                        comp.append(nb)
                        stack.append(nb)
            islands.append(comp)

        def face_normal(fi):
            fv = mesh.faces[fi].vertices
            p = [np.asarray(mesh.vertices[v].pos, np.float32)
                 for v in fv[:3]]
            n = np.cross(p[1] - p[0], p[2] - p[0])
            ln = np.linalg.norm(n)
            return n / ln if ln > 1e-9 else np.array([0, 1, 0], np.float32)

        uv_sets = []
        for comp in islands:
            n = np.sum([face_normal(fi) for fi in comp], axis=0)
            ln = np.linalg.norm(n)
            n = n / ln if ln > 1e-9 else np.array([0, 1, 0], np.float32)
            # build a tangent basis
            up = (np.array([0, 1, 0], np.float32)
                  if abs(n[1]) < 0.9 else np.array([1, 0, 0], np.float32))
            tu = np.cross(up, n)
            tu /= max(np.linalg.norm(tu), 1e-9)
            tv = np.cross(n, tu)
            vids = sorted({v for fi in comp
                           for v in mesh.faces[fi].vertices})
            pts = np.array([np.asarray(mesh.vertices[v].pos, np.float32)
                            for v in vids])
            uv2 = np.stack([pts @ tu, pts @ tv], axis=-1)
            # principal-axis alignment (find_optimal_rotation condensed)
            c = uv2 - uv2.mean(0)
            if len(c) > 1:
                cov = c.T @ c
                w, vecs = np.linalg.eigh(cov)
                axis = vecs[:, int(np.argmax(w))]
                ang = -math.atan2(axis[1], axis[0])
                ca, sa = math.cos(ang), math.sin(ang)
                rot = np.array([[ca, -sa], [sa, ca]], np.float32)
                uv2 = c @ rot.T
            uv_sets.append((vids, uv2))

        # pack islands side by side into [0,1] with a margin
        k = len(uv_sets)
        cols = max(int(math.ceil(math.sqrt(k))), 1)
        rows = int(math.ceil(k / cols))
        margin = 0.02
        cell_w = 1.0 / cols
        cell_h = 1.0 / rows
        for idx, (vids, uv2) in enumerate(uv_sets):
            lo = uv2.min(0)
            hi = uv2.max(0)
            span = np.maximum(hi - lo, 1e-6)
            scale = min((cell_w - 2 * margin) / span[0],
                        (cell_h - 2 * margin) / span[1])
            cx = (idx % cols) * cell_w + margin
            cy = (idx // cols) * cell_h + margin
            for j, v in enumerate(vids):
                u = cx + (uv2[j, 0] - lo[0]) * scale
                w_ = cy + (uv2[j, 1] - lo[1]) * scale
                mesh.vertices[v] = dataclasses.replace(
                    mesh.vertices[v], uv=(float(u), float(w_)))
        self.set_status(f"Auto-unwrapped {len(faces)} faces")
        return len(faces)



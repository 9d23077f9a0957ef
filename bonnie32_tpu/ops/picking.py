"""Ray picking and viewport-geometry math, vectorized.

Everything the editors use to turn mouse positions into 3D intent:
screen->ray inverse projection, world->screen overlays, ray/line and
ray/plane queries for drag gizmos, Moller-Trumbore triangle picking,
near-plane clipping, and 4x4 transform helpers.

Reference behavior: `/root/reference/src/rasterizer/ray.rs` (402 LoC) and
`/root/reference/src/rasterizer/math.rs:194-807`.  Option<T> returns become
(value, valid_mask) pairs so every function broadcasts over batched inputs
and stays jittable.
"""

from typing import Tuple

import jax.numpy as jnp

from ..config import NEAR_PLANE, PROJ_DISTANCE, PROJ_SCALE
from .vertex import normalize_rows

_F32 = jnp.float32


# ---------------------------------------------------------------------------
# Screen <-> world (ray.rs:46-143, math.rs:503-650)
# ---------------------------------------------------------------------------

def screen_to_ray(screen_x, screen_y, width: int, height: int,
                  cam_pos, basis):
    """ray.rs:46 — perspective inverse of project().

    basis: (3, 3) rows = camera x/y/z axes in world space.  Returns
    (origin (...,3), direction (...,3) normalized).  The virtual camera sits
    DISTANCE behind the eye, so directions use dz=1, dx=ndc/us.
    """
    screen_x = jnp.asarray(screen_x, _F32)
    screen_y = jnp.asarray(screen_y, _F32)
    vs = _F32(min(width, height) / 2.0 * PROJ_SCALE)
    us = _F32(PROJ_DISTANCE - 1.0)
    ndc_x = (screen_x - _F32(width / 2.0)) / vs
    ndc_y = (screen_y - _F32(height / 2.0)) / vs

    d_cam = jnp.stack([ndc_x / us, ndc_y / us,
                       jnp.ones_like(ndc_x)], axis=-1)
    world_dir = d_cam @ jnp.asarray(basis, _F32)          # rows are axes
    origin = jnp.broadcast_to(jnp.asarray(cam_pos, _F32), world_dir.shape)
    return origin, normalize_rows(world_dir)


def screen_to_ray_ortho(screen_x, screen_y, width: int, height: int,
                        cam_pos, basis, zoom, center_x, center_y):
    """ray.rs:108 — parallel rays from the ortho view plane."""
    screen_x = jnp.asarray(screen_x, _F32)
    screen_y = jnp.asarray(screen_y, _F32)
    basis = jnp.asarray(basis, _F32)
    cx = (screen_x - _F32(width / 2.0)) / _F32(zoom) + _F32(center_x)
    cy = -(screen_y - _F32(height / 2.0)) / _F32(zoom) + _F32(center_y)
    origin = (jnp.asarray(cam_pos, _F32)
              + cx[..., None] * basis[0] + cy[..., None] * basis[1])
    direction = jnp.broadcast_to(basis[2], origin.shape)
    return origin, direction


def screen_to_ray_auto(screen_x, screen_y, width: int, height: int,
                       cam_pos, basis, ortho=None):
    """ray.rs:131."""
    if ortho is None:
        return screen_to_ray(screen_x, screen_y, width, height, cam_pos, basis)
    return screen_to_ray_ortho(screen_x, screen_y, width, height, cam_pos,
                               basis, ortho.zoom, ortho.center_x,
                               ortho.center_y)


def world_to_screen(world_pos, cam_pos, basis, width: int, height: int):
    """math.rs:509 — forward projection for UI overlays.

    Returns (sx, sy, cam_z, valid); valid is False behind the camera
    (cam_z <= 0.1).
    """
    rel = jnp.asarray(world_pos, _F32) - jnp.asarray(cam_pos, _F32)
    cam = rel @ jnp.asarray(basis, _F32).T                # (..., 3)
    cam_z = cam[..., 2]
    valid = cam_z > 0.1
    vs = _F32(min(width, height) / 2.0 * PROJ_SCALE)
    us = _F32(PROJ_DISTANCE - 1.0)
    denom = jnp.where(valid, cam_z + _F32(PROJ_DISTANCE), _F32(1.0))
    sx = (cam[..., 0] * us / denom) * vs + _F32(width / 2.0)
    sy = (cam[..., 1] * us / denom) * vs + _F32(height / 2.0)
    return sx, sy, cam_z, valid


def world_to_screen_ortho(world_pos, cam_pos, basis, width: int, height: int,
                          zoom, center_x, center_y):
    """math.rs:538 (ortho arm) — matches project_ortho()."""
    rel = jnp.asarray(world_pos, _F32) - jnp.asarray(cam_pos, _F32)
    cam = rel @ jnp.asarray(basis, _F32).T
    sx = (cam[..., 0] - _F32(center_x)) * _F32(zoom) + _F32(width / 2.0)
    sy = -(cam[..., 1] - _F32(center_y)) * _F32(zoom) + _F32(height / 2.0)
    valid = jnp.ones(sx.shape, bool)
    return sx, sy, cam[..., 2], valid


# ---------------------------------------------------------------------------
# Ray queries (ray.rs:151-262)
# ---------------------------------------------------------------------------

def ray_at(origin, direction, t):
    return jnp.asarray(origin, _F32) + jnp.asarray(t, _F32)[..., None] \
        * jnp.asarray(direction, _F32)


def ray_line_closest_point(origin, direction, line_origin, line_dir):
    """ray.rs:151 — closest point on an infinite line to a ray.

    Returns (point (...,3), s, valid); valid False when near-parallel
    (|denom| < 1e-4).
    """
    w = jnp.asarray(origin, _F32) - jnp.asarray(line_origin, _F32)
    d1 = jnp.asarray(direction, _F32)
    d2 = jnp.asarray(line_dir, _F32)
    a = jnp.sum(d1 * d1, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    c = jnp.sum(d2 * d2, axis=-1)
    d = jnp.sum(w * d1, axis=-1)
    e = jnp.sum(w * d2, axis=-1)
    denom = a * c - b * b
    valid = jnp.abs(denom) >= 0.0001
    s = (a * e - d * b) / jnp.where(valid, denom, _F32(1.0))
    point = jnp.asarray(line_origin, _F32) + s[..., None] * d2
    return point, s, valid


def ray_plane_intersection(origin, direction, plane_point, plane_normal):
    """ray.rs:214 — (t, valid); invalid when parallel or behind origin."""
    d = jnp.asarray(direction, _F32)
    n = jnp.asarray(plane_normal, _F32)
    denom = jnp.sum(d * n, axis=-1)
    ok = jnp.abs(denom) >= 0.0001
    t = jnp.sum((jnp.asarray(plane_point, _F32)
                 - jnp.asarray(origin, _F32)) * n, axis=-1) \
        / jnp.where(ok, denom, _F32(1.0))
    return t, ok & (t >= 0.0)


def ray_circle_angle(origin, direction, center, axis, ref_vector):
    """ray.rs:239 — rotation-gizmo angle; (angle, valid)."""
    t, ok = ray_plane_intersection(origin, direction, center, axis)
    hit = ray_at(origin, direction, t)
    from_center = hit - jnp.asarray(center, _F32)
    dist = jnp.sqrt(jnp.sum(from_center * from_center, axis=-1))
    ok &= dist >= 0.0001
    perp = jnp.cross(jnp.asarray(axis, _F32), jnp.asarray(ref_vector, _F32))
    x = jnp.sum(from_center * jnp.asarray(ref_vector, _F32), axis=-1)
    y = jnp.sum(from_center * perp, axis=-1)
    return jnp.arctan2(y, x), ok


def ray_triangle_intersect(origin, direction, v0, v1, v2):
    """math.rs:413 — Moller-Trumbore; (t, hit).  Broadcasts over triangle
    arrays for one-shot scene picking."""
    eps = _F32(1e-7)
    v0 = jnp.asarray(v0, _F32)
    e1 = jnp.asarray(v1, _F32) - v0
    e2 = jnp.asarray(v2, _F32) - v0
    d = jnp.broadcast_to(jnp.asarray(direction, _F32), e1.shape)
    h = jnp.cross(d, e2)
    a = jnp.sum(e1 * h, axis=-1)
    ok = jnp.abs(a) >= eps
    f = _F32(1.0) / jnp.where(ok, a, _F32(1.0))
    s = jnp.asarray(origin, _F32) - v0
    u = f * jnp.sum(s * h, axis=-1)
    ok &= (u >= 0.0) & (u <= 1.0)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(d * q, axis=-1)
    ok &= (v >= 0.0) & (u + v <= 1.0)
    t = f * jnp.sum(e2 * q, axis=-1)
    ok &= t > eps
    return t, ok


def pick_triangle(origin, direction, tri_verts, valid=None):
    """Nearest hit over (T, 3, 3) triangles -> (index, t, any_hit).

    index is -1 when nothing is hit.  The editors' hover/click picking
    (viewport_3d.rs hover detection) as a single vectorized query.
    """
    t, hit = ray_triangle_intersect(origin, direction, tri_verts[:, 0],
                                    tri_verts[:, 1], tri_verts[:, 2])
    if valid is not None:
        hit &= valid
    t_masked = jnp.where(hit, t, jnp.inf)
    idx = jnp.argmin(t_masked)
    any_hit = jnp.any(hit)
    return jnp.where(any_hit, idx.astype(jnp.int32), -1), \
        t_masked[idx], any_hit


# ---------------------------------------------------------------------------
# 2D helpers (math.rs:655-711)
# ---------------------------------------------------------------------------

def point_to_segment_distance(px, py, x1, y1, x2, y2):
    """math.rs:655."""
    px, py, x1, y1, x2, y2 = [jnp.asarray(v, _F32)
                              for v in (px, py, x1, y1, x2, y2)]
    dx = x2 - x1
    dy = y2 - y1
    len_sq = dx * dx + dy * dy
    degen = len_sq < 1e-6
    t = jnp.clip(((px - x1) * dx + (py - y1) * dy)
                 / jnp.where(degen, _F32(1.0), len_sq), 0.0, 1.0)
    cx = jnp.where(degen, x1, x1 + t * dx)
    cy = jnp.where(degen, y1, y1 + t * dy)
    return jnp.sqrt((px - cx) ** 2 + (py - cy) ** 2)


def point_in_triangle_2d(px, py, x1, y1, x2, y2, x3, y3):
    """math.rs:687 — sign test, winding-independent."""
    px, py, x1, y1, x2, y2, x3, y3 = [jnp.asarray(v, _F32) for v in
                                      (px, py, x1, y1, x2, y2, x3, y3)]

    def sign(ax, ay, bx, by):
        return (px - bx) * (ay - by) - (ax - bx) * (py - by)
    d1 = sign(x1, y1, x2, y2)
    d2 = sign(x2, y2, x3, y3)
    d3 = sign(x3, y3, x1, y1)
    has_neg = (d1 < 0) | (d2 < 0) | (d3 < 0)
    has_pos = (d1 > 0) | (d2 > 0) | (d3 > 0)
    return ~(has_neg & has_pos)


def barycentric_2d(p, v1, v2, v3):
    """math.rs:390 — screen-space barycentric; degenerate -> (-1,-1,-1)."""
    p, v1, v2, v3 = [jnp.asarray(v, _F32) for v in (p, v1, v2, v3)]
    d = ((v2[..., 1] - v3[..., 1]) * (v1[..., 0] - v3[..., 0])
         + (v3[..., 0] - v2[..., 0]) * (v1[..., 1] - v3[..., 1]))
    degen = jnp.abs(d) < 0.00001
    dd = jnp.where(degen, _F32(1.0), d)
    u = ((v2[..., 1] - v3[..., 1]) * (p[..., 0] - v3[..., 0])
         + (v3[..., 0] - v2[..., 0]) * (p[..., 1] - v3[..., 1])) / dd
    v = ((v3[..., 1] - v1[..., 1]) * (p[..., 0] - v3[..., 0])
         + (v1[..., 0] - v3[..., 0]) * (p[..., 1] - v3[..., 1])) / dd
    w = 1.0 - u - v
    bad = jnp.full_like(u, -1.0)
    return (jnp.where(degen, bad, u), jnp.where(degen, bad, v),
            jnp.where(degen, bad, w))


# ---------------------------------------------------------------------------
# Near-plane clipping (math.rs:194-377)
# ---------------------------------------------------------------------------

def clip_edge_to_near_plane(v1, v2):
    """math.rs:366 — ((a, b), visible); endpoints clipped at z=NEAR_PLANE."""
    v1 = jnp.asarray(v1, _F32)
    v2 = jnp.asarray(v2, _F32)
    f1 = v1[..., 2] > NEAR_PLANE
    f2 = v2[..., 2] > NEAR_PLANE
    visible = f1 | f2

    def clip_from(front, back):
        t = (_F32(NEAR_PLANE) - front[..., 2]) \
            / (back[..., 2] - front[..., 2])
        return front + t[..., None] * (back - front)

    a = jnp.where(f1[..., None], v1, clip_from(v2, v1))
    b = jnp.where(f2[..., None], v2, clip_from(v1, v2))
    return (a, b), visible


def clip_triangle_to_near_plane(v1, v2, v3):
    """math.rs:194 — clip one triangle, fixed-shape output.

    Returns (tris (2, 3, 3), weights (2, 3, 3), tri_valid (2,)):
      * 3 in front  -> tri 0 = original, identity weights, tri 1 invalid.
      * 1 in front  -> tri 0 = (front, clip1, clip2), tri 1 invalid.
      * 2 in front  -> both tris valid (the reference's quad split).
      * 0 in front  -> both invalid.
    weights[i, j] are barycentric weights of output corner j in the ORIGINAL
    corner basis, exactly as the reference hands back for attribute lerp.
    """
    verts = jnp.stack([jnp.asarray(v1, _F32), jnp.asarray(v2, _F32),
                       jnp.asarray(v3, _F32)])            # (3, 3)
    eye = jnp.eye(3, dtype=_F32)
    in_front = verts[:, 2] > NEAR_PLANE
    n_front = jnp.sum(in_front.astype(jnp.int32))

    # Rotation index per case; reference picks the first matching corner.
    def pick(mask):
        # first True index (mask always has one in the cases used)
        return jnp.argmax(mask.astype(jnp.int32)).astype(jnp.int32)

    # --- case 1: exactly one vertex in front ---
    fi = pick(in_front)
    b1 = (fi + 1) % 3
    b2 = (fi + 2) % 3
    front, back1, back2 = verts[fi], verts[b1], verts[b2]
    t1 = (_F32(NEAR_PLANE) - front[2]) / (back1[2] - front[2])
    t2 = (_F32(NEAR_PLANE) - front[2]) / (back2[2] - front[2])
    one_tri = jnp.stack([front, front + t1 * (back1 - front),
                         front + t2 * (back2 - front)])
    one_w = jnp.stack([eye[fi],
                       (1.0 - t1) * eye[fi] + t1 * eye[b1],
                       (1.0 - t2) * eye[fi] + t2 * eye[b2]])

    # --- case 2: exactly two vertices in front ---
    bi = pick(~in_front)
    f1i = (bi + 1) % 3
    f2i = (bi + 2) % 3
    back, front1, front2 = verts[bi], verts[f1i], verts[f2i]
    s1 = (_F32(NEAR_PLANE) - front1[2]) / (back[2] - front1[2])
    s2 = (_F32(NEAR_PLANE) - front2[2]) / (back[2] - front2[2])
    clip1 = front1 + s1 * (back - front1)
    clip2 = front2 + s2 * (back - front2)
    w_clip1 = (1.0 - s1) * eye[f1i] + s1 * eye[bi]
    w_clip2 = (1.0 - s2) * eye[f2i] + s2 * eye[bi]
    two_tri_a = jnp.stack([front1, clip1, front2])
    two_w_a = jnp.stack([eye[f1i], w_clip1, eye[f2i]])
    two_tri_b = jnp.stack([clip1, clip2, front2])
    two_w_b = jnp.stack([w_clip1, w_clip2, eye[f2i]])

    unclipped = jnp.stack([verts, eye])                    # tri + weights

    tri0 = jnp.where(n_front == 3, unclipped[0],
            jnp.where(n_front == 1, one_tri, two_tri_a))
    w0 = jnp.where(n_front == 3, unclipped[1],
          jnp.where(n_front == 1, one_w, two_w_a))
    tris = jnp.stack([tri0, two_tri_b])
    weights = jnp.stack([w0, two_w_b])
    tri_valid = jnp.stack([n_front > 0, n_front == 2])
    return tris, weights, tri_valid


# ---------------------------------------------------------------------------
# Mat4 (math.rs:713-777)
# ---------------------------------------------------------------------------

def mat4_identity():
    return jnp.eye(4, dtype=_F32)


def mat4_translation(t):
    t = jnp.asarray(t, _F32)
    m = jnp.eye(4, dtype=_F32)
    return m.at[:3, 3].set(t)


def mat4_rotation(rot_deg):
    """math.rs:738 — ZYX Euler (degrees), Blender order."""
    r = jnp.deg2rad(jnp.asarray(rot_deg, _F32))
    sx, cx = jnp.sin(r[0]), jnp.cos(r[0])
    sy, cy = jnp.sin(r[1]), jnp.cos(r[1])
    sz, cz = jnp.sin(r[2]), jnp.cos(r[2])
    return jnp.array([
        [cy * cz, sx * sy * cz - cx * sz, cx * sy * cz + sx * sz, 0.0],
        [cy * sz, sx * sy * sz + cx * cz, cx * sy * sz - sx * cz, 0.0],
        [-sy, sx * cy, cx * cy, 0.0],
        [0.0, 0.0, 0.0, 1.0]], _F32)


def mat4_mul(a, b):
    return jnp.asarray(a, _F32) @ jnp.asarray(b, _F32)


def mat4_transform_point(m, p):
    m = jnp.asarray(m, _F32)
    p = jnp.asarray(p, _F32)
    return p @ m[:3, :3].T + m[:3, 3]


def mat4_from_position_rotation(position, rotation_deg):
    return mat4_mul(mat4_translation(position), mat4_rotation(rotation_deg))

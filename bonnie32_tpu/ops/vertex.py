"""Vertex transform & projection stage, batched.

Replicates the TRANSFORM phase of `render_mesh_15` (`/root/reference/src/
rasterizer/render.rs:2313-2360`): per-vertex camera-space transform, one of
three projection paths (orthographic / PS1 fixed-point / float perspective),
and camera-space normal transform+normalize.

All math follows the reference op-for-op; divisions/sqrts are correctly
rounded (ops/exactf).  The fixed-point path (settings.use_fixed_point, the
PS1 default) produces *integer* screen coordinates — which also makes the
downstream edge functions exact in f32, so rasterization parity is lossless.
"""

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..config import RasterSettings, PROJ_DISTANCE
from ..types import CameraArrays
from . import fixed as fx
from .exactf import exact_div, exact_sqrt

_F32 = jnp.float32


class TransformedVerts(NamedTuple):
    sx: jnp.ndarray        # (V,) f32 screen x
    sy: jnp.ndarray        # (V,) f32 screen y
    sz: jnp.ndarray        # (V,) f32 screen-space depth (projection dependent)
    cam: jnp.ndarray       # (V, 3) f32 camera-space position
    cam_normal: jnp.ndarray  # (V, 3) f32 normalized camera-space normal


def perspective_transform(v, basis):
    """math.rs:103: rotate by camera basis (rows bx, by, bz)."""
    bx, by, bz = basis[0], basis[1], basis[2]

    def dot(row):
        return (v[..., 0] * row[0] + v[..., 1] * row[1] + v[..., 2] * row[2])

    return jnp.stack([dot(bx), dot(by), dot(bz)], axis=-1)


def project_float(cam, width: int, height: int):
    """math.rs:117: float perspective projection.

    Returns (sx, sy, z) where z = denom = cam_z + DISTANCE (math.rs:134),
    or (w/2, h/2, cam_z) in the |denom| < 0.001 guard branch.
    """
    ud = _F32(PROJ_DISTANCE)
    us = _F32(PROJ_DISTANCE - 1.0)
    vs = _F32((min(width, height) / 2.0) * 0.75)
    hw = _F32(width / 2.0)
    hh = _F32(height / 2.0)

    x, y, z = cam[..., 0], cam[..., 1], cam[..., 2]
    denom = z + ud
    tiny = jnp.abs(denom) < 0.001
    safe = jnp.where(tiny, _F32(1.0), denom)

    sx = exact_div(x * us, safe) * vs + hw
    sy = exact_div(y * us, safe) * vs + hh
    sx = jnp.where(tiny, hw, sx)
    sy = jnp.where(tiny, hh, sy)
    sz = jnp.where(tiny, z, denom)
    return sx, sy, sz


def project_ortho(cam, zoom, center_x, center_y, width: int, height: int):
    """math.rs:140: orthographic projection; z passes through."""
    x, y, z = cam[..., 0], cam[..., 1], cam[..., 2]
    sx = (x - center_x) * zoom + _F32(width / 2.0)
    sy = -(y - center_y) * zoom + _F32(height / 2.0)
    return sx, sy, z


def normalize_rows(v):
    """Vec3::normalize on (..., 3) with exact sqrt/div (math.rs:39)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    l = exact_sqrt(x * x + y * y + z * z)
    zero = l == 0.0
    safe = jnp.where(zero, _F32(1.0), l)
    return jnp.where(zero[..., None], 0.0,
                     jnp.stack([exact_div(x, safe),
                                exact_div(y, safe),
                                exact_div(z, safe)], axis=-1))


def transform_vertices(pos, normal, camera: CameraArrays,
                       settings: RasterSettings,
                       width: int, height: int,
                       with_normals: bool = True) -> TransformedVerts:
    """The full TRANSFORM phase (render.rs:2321-2360), batched over any
    (..., 3) leading shape.  `with_normals=False` skips the camera-space
    normal transform+normalize (exact sqrt/div per vertex) — the 15-bit
    pipeline shades from WORLD normals and never reads cam_normal."""
    rel = pos - camera.position
    cam = perspective_transform(rel, camera.basis)

    if settings.ortho_projection is not None:
        o = settings.ortho_projection
        sx, sy, sz = project_ortho(cam, _F32(o.zoom), _F32(o.center_x),
                                   _F32(o.center_y), width, height)
    elif settings.use_fixed_point:
        # PS1 path (render.rs:2329-2345): integer screen coords from the
        # fixed-point pipeline; screen depth = float cam_z + DISTANCE.
        isx, isy, _ = fx.project_fixed(pos, camera.position, camera.basis,
                                       width, height)
        sx = isx.astype(_F32)
        sy = isy.astype(_F32)
        sz = cam[..., 2] + _F32(PROJ_DISTANCE)
    else:
        sx, sy, sz = project_float(cam, width, height)

    cam_normal = (normalize_rows(perspective_transform(normal, camera.basis))
                  if with_normals else None)
    return TransformedVerts(sx=sx, sy=sy, sz=sz, cam=cam, cam_normal=cam_normal)

"""Device-side camera basis computation.

Replicates Camera::update_basis (`/root/reference/src/rasterizer/
camera.rs:76-91`) in jnp so batched camera animation (orbit, character cam)
runs on device.  up = (0, -1, 0) — the screen-space convention.

For bit-parity workflows compute the basis on the host instead
(models/build.camera_basis); device trig rounding is libm-defined.
"""

import jax.numpy as jnp

from ..types import CameraArrays
from .vertex import normalize_rows

_F32 = jnp.float32


def basis_from_angles(pitch, yaw):
    """pitch/yaw arrays (...,) -> basis (..., 3, 3) rows (bx, by, bz)."""
    pitch = jnp.asarray(pitch, _F32)
    yaw = jnp.asarray(yaw, _F32)
    cx, sx = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)

    bz = jnp.stack([cx * sy, -sx, cx * cy], axis=-1)
    up = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0], _F32), bz.shape)
    bx = normalize_rows(jnp.cross(up, bz))
    by = jnp.cross(bz, bx)
    return jnp.stack([bx, by, bz], axis=-2)


def orbit_cameras(angles, pitch, distance, target=(0.0, 0.0, 0.0)) -> CameraArrays:
    """N cameras orbiting `target` at `distance`, looking inward."""
    basis = basis_from_angles(jnp.broadcast_to(pitch, jnp.shape(angles)), angles)
    tgt = jnp.asarray(target, _F32)
    pos = tgt - basis[..., 2, :] * _F32(distance)
    return CameraArrays(position=pos, basis=basis)

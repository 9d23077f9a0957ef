"""Multi-light vertex shading, vectorized.

Replicates `shade_multi_light_color` (`/root/reference/src/rasterizer/
render.rs:1013-1071`): ambient base plus per-light diffuse contributions
(directional / point with squared falloff / spot with cone edge falloff),
each scaled by the light's 0-1 color, channel-clamped to 1.0.

Float ops follow the reference's exact order; divisions and square roots go
through ops/exactf so results match IEEE-compliant hosts bit-for-bit.  The
one documented exception: spot lights use acos(), whose libm rounding is
platform-defined — spot shading may differ by 1 ulp from the Rust build in
rare angle boundary cases.

Lights are summed sequentially in array order (Python loop over the static
light capacity), matching the reference's accumulation order.
"""

import jax.numpy as jnp

from ..types import Lights
from .exactf import exact_div, exact_sqrt

_F32 = jnp.float32


def _dot3(ax, ay, az, bx, by, bz):
    """x*x' + y*y' + z*z', left-associated (math.rs:23)."""
    return ax * bx + ay * by + az * bz


def _normalize3(x, y, z):
    """Vec3::normalize (math.rs:39-49): zero-length guarded, exact div."""
    l = exact_sqrt(_dot3(x, y, z, x, y, z))
    zero = l == 0.0
    safe = jnp.where(zero, _F32(1.0), l)
    return (jnp.where(zero, 0.0, exact_div(x, safe)),
            jnp.where(zero, 0.0, exact_div(y, safe)),
            jnp.where(zero, 0.0, exact_div(z, safe)),
            l)


def shade_points(normal, world_pos, lights: Lights, ambient=None):
    """Per-point RGB shade in 0-1 (render.rs:1013).

    normal: (..., 3) f32 (world-space); world_pos: (..., 3) f32.
    `ambient` optionally overrides lights.ambient per point (broadcastable
    to normal[..., 0]) — used by the flat scene path where each face keeps
    its own room's ambient (scene.rs:201-205).
    Returns (..., 3) f32 clamped per-channel to <= 1.0.
    """
    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    px, py, pz = world_pos[..., 0], world_pos[..., 1], world_pos[..., 2]

    amb = jnp.asarray(lights.ambient if ambient is None else ambient, _F32)
    total_r = jnp.broadcast_to(amb, nx.shape).astype(_F32)
    total_g = total_r
    total_b = total_r

    num_lights = lights.kind.shape[0]
    for i in range(num_lights):
        kind = lights.kind[i]
        lpos = lights.position[i]
        ldir = lights.direction[i]
        inten = lights.intensity[i]
        radius = lights.radius[i]
        angle = lights.angle[i]

        # Directional (render.rs:1020): n . (-dir) clamped, * intensity.
        neg = -ldir
        ndl_dir = jnp.maximum(_dot3(nx, ny, nz, neg[0], neg[1], neg[2]), 0.0)
        c_dir = ndl_dir * inten

        # Point (render.rs:1026): squared-falloff attenuation.
        tx, ty, tz = lpos[0] - px, lpos[1] - py, lpos[2] - pz
        dist = exact_sqrt(_dot3(tx, ty, tz, tx, ty, tz))
        out_of_range = (dist > radius) | (dist < 0.001)
        ux, uy, uz, _ = _normalize3(tx, ty, tz)
        att = 1.0 - exact_div(dist, jnp.where(radius == 0, _F32(1.0), radius))
        ndl_pt = jnp.maximum(_dot3(nx, ny, nz, ux, uy, uz), 0.0)
        c_point = jnp.where(out_of_range, 0.0, ndl_pt * inten * att * att)

        # Spot (render.rs:1038): point light with cone restriction.
        # acos() rounding is libm-defined; see module docstring.
        spot_cos = _dot3(-ux, -uy, -uz, ldir[0], ldir[1], ldir[2])
        spot_angle = jnp.arccos(spot_cos).astype(_F32)
        outside_cone = spot_angle > angle
        safe_angle = jnp.where(angle == 0, _F32(1.0), angle)
        edge = 1.0 - exact_div(spot_angle, safe_angle)
        c_spot = jnp.where(out_of_range | outside_cone, 0.0,
                           ndl_pt * inten * att * att * edge)

        contribution = jnp.where(kind == 1, c_dir,
                       jnp.where(kind == 2, c_point,
                       jnp.where(kind == 3, c_spot, 0.0)))

        total_r = total_r + contribution * lights.color01[i, 0]
        total_g = total_g + contribution * lights.color01[i, 1]
        total_b = total_b + contribution * lights.color01[i, 2]

    out = jnp.stack([jnp.minimum(total_r, 1.0),
                     jnp.minimum(total_g, 1.0),
                     jnp.minimum(total_b, 1.0)], axis=-1)
    return out.astype(_F32)

"""Sequential masked-compositor rasterizer — the parity reference path.

Replicates `rasterize_triangle_15` (`/root/reference/src/rasterizer/
render.rs:1440-1714`) and the two-pass DRAW phase (render.rs:2547-2570) as a
`lax.fori_loop` over surfaces in draw order, each iteration evaluating the
triangle over the whole framebuffer with masks.  O(T * H * W) — this is the
*correctness* path (bit-exact vs the scalar golden model for the PS1
fixed-point pipeline); the throughput paths live in raster_fast.py (XLA
visibility reduction) and raster_batch.py (fused Pallas kernel).

Depth handling: `depth_mode`
  * "harmonic": buffer stores z = 1/interp(1/z) recomputed per pixel with a
    correctly-rounded division — the literal reference semantics
    (render.rs:1545-1550).  Init +f32::MAX, test `z < buf`.
  * "inv": buffer stores interp(1/z) directly — no per-pixel division; test
    `izi > buf`, init 0.  Equivalent ordering except when two distinct
    interpolated 1/z values round to the same z (sub-ulp z-fighting).

Direct vs incremental edge functions: the reference steps the edge functions
incrementally (render.rs:1520-1538); we evaluate them directly per pixel.
For the PS1 fixed-point path (integer screen coordinates) every intermediate
is an exact small integer in f32, so both forms are identical.  For float
projection the accumulated rounding can differ by ~1 ulp near edges
(documented divergence; the PS1-authentic configs are unaffected).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import RasterSettings, BlendMode
from ..types import FrameBuffers, Surfaces, TextureAtlas
from . import color as col
from . import pixel as px
from .exactf import exact_recip
from .surface import draw_order

_F32 = jnp.float32
_I32 = jnp.int32

F32_MAX = jnp.float32(3.4028235e38)


def new_framebuffer(height: int, width: int, depth_mode: str = "harmonic",
                    clear_color: int = 0) -> FrameBuffers:
    """Framebuffer::new + clear (render.rs:18-45)."""
    depth0 = F32_MAX if depth_mode == "harmonic" else jnp.float32(0.0)
    return FrameBuffers(
        color=jnp.full((height, width), jnp.int32(clear_color)),
        depth=jnp.full((height, width), depth0),
    )


def clear_color_word(r: int, g: int, b: int, a: int = 255) -> int:
    return (r & 0xFF) | ((g & 0xFF) << 8) | ((b & 0xFF) << 16) | ((a & 0xFF) << 24)


def _raster_one(carry, surf_scalars, atlas: TextureAtlas,
                settings: RasterSettings, grid, depth_mode: str):
    """Rasterize one surface over the full frame (rasterize_triangle_15)."""
    color_buf, depth_buf = carry
    (sx, sy, sz, iz, area, inv_area, uvc, vcc, shc, tid, blend_mode,
     black_transparent, editor_alpha, needs_dither, skip_z, valid) = surf_scalars
    pxf, pyf, xi, yi = grid

    v1x, v2x, v3x = sx[0], sx[1], sx[2]
    v1y, v2y, v3y = sy[0], sy[1], sy[2]

    # Bounding box with Rust's cast semantics (render.rs:1455-1458).
    min_xf = jnp.maximum(jnp.minimum(jnp.minimum(v1x, v2x), v3x), 0.0)
    max_xf = jnp.minimum(jnp.maximum(jnp.maximum(v1x, v2x), v3x) + 1.0,
                         _F32(color_buf.shape[1]))
    min_yf = jnp.maximum(jnp.minimum(jnp.minimum(v1y, v2y), v3y), 0.0)
    max_yf = jnp.minimum(jnp.maximum(jnp.maximum(v1y, v2y), v3y) + 1.0,
                         _F32(color_buf.shape[0]))
    min_x = jnp.trunc(min_xf).astype(_I32)
    max_x = jnp.maximum(jnp.trunc(max_xf).astype(_I32), 0)
    min_y = jnp.trunc(min_yf).astype(_I32)
    max_y = jnp.maximum(jnp.trunc(max_yf).astype(_I32), 0)
    bbox = (xi >= min_x) & (xi < max_x) & (yi >= min_y) & (yi < max_y)

    # Edge-function setup (render.rs:1499-1510); area reciprocal precomputed
    # per surface in build_surfaces.
    degenerate = jnp.abs(area) < 0.00001

    a0 = v2y - v3y
    b0 = v3x - v2x
    a1 = v3y - v1y
    b1 = v1x - v3x

    w0 = a0 * (pxf - v3x) + b0 * (pyf - v3y)
    w1 = a1 * (pxf - v3x) + b1 * (pyf - v3y)
    bc_x = w0 * inv_area
    bc_y = w1 * inv_area
    bc_z = (1.0 - bc_x) - bc_y

    err = _F32(-0.0001)  # render.rs:1541
    inside = (bc_x >= err) & (bc_y >= err) & (bc_z >= err)

    covered = bbox & inside & ~degenerate & valid

    # Depth (render.rs:1545-1550): interpolate 1/z.
    izi = (bc_x * iz[0] + bc_y * iz[1]) + bc_z * iz[2]
    if depth_mode == "harmonic":
        z = exact_recip(izi)
        zpass = z < depth_buf
        depth_new = z
    else:
        zpass = izi > depth_buf
        depth_new = izi

    zbuffer_active = settings.use_zbuffer and not settings.xray_mode
    vis = (covered & zpass) if zbuffer_active else covered

    # Shared pixel pipeline (render.rs:1563-1661); see ops/pixel.py.
    uv = tuple((uvc[k, 0], uvc[k, 1]) for k in range(3))
    vc = tuple((vcc[k, 0], vcc[k, 1], vcc[k, 2]) for k in range(3))
    shade = tuple((shc[k, 0], shc[k, 1], shc[k, 2]) for k in range(3))
    pc = px.pixel_color(bc_x, bc_y, bc_z, izi, (iz[0], iz[1], iz[2]),
                        uv, vc, shade, tid, black_transparent, needs_dither,
                        xi, yi, atlas, settings, exact_persp=True)
    front_r8, front_g8, front_b8, semi, keyed_out = pc

    drawn = vis & ~keyed_out & (editor_alpha != 0)

    back_r, back_g, back_b, _ = col.unpack_rgba8(color_buf)

    # PS1 blend when STP set and mode non-opaque (render.rs:1689, 1697).
    do_blend = semi & (blend_mode != int(BlendMode.OPAQUE))
    bl_r, bl_g, bl_b = col.blend_rgb555(
        (front_r8, front_g8, front_b8), (back_r, back_g, back_b), blend_mode)
    ps1_r = jnp.where(do_blend, bl_r, front_r8)
    ps1_g = jnp.where(do_blend, bl_g, front_g8)
    ps1_b = jnp.where(do_blend, bl_b, front_b8)

    if settings.xray_mode:
        # 50% blend, no depth interaction (render.rs:507-526).
        out_r = (front_r8 + back_r) // 2
        out_g = (front_g8 + back_g) // 2
        out_b = (front_b8 + back_b) // 2
        zwrite = jnp.zeros_like(drawn)
    else:
        # Editor-alpha lerp (render.rs:564-628), integer path.
        a = editor_alpha
        ia = 255 - a
        ea_r = (ps1_r * a + back_r * ia) // 255
        ea_g = (ps1_g * a + back_g * ia) // 255
        ea_b = (ps1_b * a + back_b * ia) // 255
        use_ea = editor_alpha < 255
        out_r = jnp.where(use_ea, ea_r, ps1_r)
        out_g = jnp.where(use_ea, ea_g, ps1_g)
        out_b = jnp.where(use_ea, ea_b, ps1_b)
        zwrite = drawn & bool(settings.use_zbuffer) & ~skip_z

    new_word = col.pack_rgba8(out_r, out_g, out_b, jnp.full_like(out_r, 255))
    color_buf = jnp.where(drawn, new_word, color_buf)
    depth_buf = jnp.where(zwrite, depth_new, depth_buf)
    return color_buf, depth_buf


@functools.partial(jax.jit, static_argnames=("settings", "depth_mode"))
def rasterize_surfaces(fb: FrameBuffers, surfaces: Surfaces,
                       atlas: TextureAtlas, settings: RasterSettings,
                       depth_mode: str = "harmonic") -> FrameBuffers:
    """DRAW phase (render.rs:2547-2570): sequential two-pass composite."""
    height, width = fb.color.shape
    order, skip_z = draw_order(surfaces, settings)

    yi, xi = jnp.meshgrid(jnp.arange(height, dtype=_I32),
                          jnp.arange(width, dtype=_I32), indexing="ij")
    pxf = xi.astype(_F32)
    pyf = yi.astype(_F32)
    grid = (pxf, pyf, xi, yi)

    def body(i, carry):
        idx = order[i]
        scalars = (
            surfaces.sx[idx], surfaces.sy[idx], surfaces.z[idx],
            surfaces.inv_z[idx], surfaces.area[idx], surfaces.inv_area[idx],
            surfaces.uv[idx], surfaces.vc[idx],
            surfaces.shade[idx], surfaces.tex_id[idx],
            surfaces.blend_mode[idx], surfaces.black_transparent[idx],
            surfaces.editor_alpha[idx], surfaces.needs_dither[idx],
            skip_z[i], surfaces.valid[idx],
        )
        return _raster_one(carry, scalars, atlas, settings, grid, depth_mode)

    n = surfaces.sx.shape[0]
    color, depth = jax.lax.fori_loop(0, n, body, (fb.color, fb.depth))
    return FrameBuffers(color=color, depth=depth)

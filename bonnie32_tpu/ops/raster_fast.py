"""Visibility-reduction rasterizer — the TPU throughput path.

Strategy (TPU-idiomatic replacement for the reference's sequential pixel
writes, `/root/reference/src/rasterizer/render.rs:2547-2570`):

  1. OPAQUE pass: instead of read-modify-write per triangle, reduce per pixel
     to the *winning* opaque surface: loop over opaque surfaces in draw order
     keeping (best_inv_z, best_idx).  Opaque surfaces never blend (their
     resolved blend mode is OPAQUE by construction — that's what routed them
     to this pass), so the final color depends only on the winner: a pure
     reduction, no ordered compositing.  Transparency *keying* (color-keyed
     texels) is folded into coverage — sampled inside the loop only for
     surfaces whose texture can actually key (per-texture has_black /
     has_transparent flags), via lax.cond.
  2. RESOLVE: one full-quality pixel pipeline evaluation (ops/pixel.py) for
     the winning surface of each pixel — color work is O(H*W), not O(T*H*W).
  3. TRANSPARENT pass: the few semi-transparent surfaces composite
     back-to-front sequentially (order-dependent blending), sharing
     raster_ref's masked compositor with inverse-z depth.

Depth is inverse-z throughout: z-tests are comparisons only, so no division
appears anywhere in the per-(surface, pixel) loop.  Ordering is equivalent to
the reference's z-space tests except where two distinct interpolated 1/z
values round to the same f32 z (sub-ulp z-fighting; see raster_ref.py).

Requires: perspective projection, z-buffer on, no x-ray (the game defaults).
`render.render_mesh_15` falls back to the sequential compositor otherwise.
"""

import functools

import jax
import jax.numpy as jnp

from ..config import RasterSettings, BlendMode
from ..types import FrameBuffers, Surfaces, TextureAtlas
from . import color as col
from . import pixel as px

from .raster_ref import _raster_one

_F32 = jnp.float32
_I32 = jnp.int32


def _edge_setup(sx, sy, area, inv_area, px_, py_, width, height):
    """Shared bbox + edge-function evaluation (render.rs:1455-1545)."""
    v1x, v2x, v3x = sx[..., 0], sx[..., 1], sx[..., 2]
    v1y, v2y, v3y = sy[..., 0], sy[..., 1], sy[..., 2]

    min_xf = jnp.maximum(jnp.minimum(jnp.minimum(v1x, v2x), v3x), 0.0)
    max_xf = jnp.minimum(jnp.maximum(jnp.maximum(v1x, v2x), v3x) + 1.0, _F32(width))
    min_yf = jnp.maximum(jnp.minimum(jnp.minimum(v1y, v2y), v3y), 0.0)
    max_yf = jnp.minimum(jnp.maximum(jnp.maximum(v1y, v2y), v3y) + 1.0, _F32(height))
    xi = px_.astype(_I32)
    yi = py_.astype(_I32)
    bbox = ((xi >= jnp.trunc(min_xf).astype(_I32))
            & (xi < jnp.maximum(jnp.trunc(max_xf).astype(_I32), 0))
            & (yi >= jnp.trunc(min_yf).astype(_I32))
            & (yi < jnp.maximum(jnp.trunc(max_yf).astype(_I32), 0)))

    degenerate = jnp.abs(area) < 0.00001

    a0 = v2y - v3y
    b0 = v3x - v2x
    a1 = v3y - v1y
    b1 = v1x - v3x
    w0 = a0 * (px_ - v3x) + b0 * (py_ - v3y)
    w1 = a1 * (px_ - v3x) + b1 * (py_ - v3y)
    bc_x = w0 * inv_area
    bc_y = w1 * inv_area
    bc_z = (1.0 - bc_x) - bc_y

    err = _F32(-0.0001)
    inside = (bc_x >= err) & (bc_y >= err) & (bc_z >= err)
    return bc_x, bc_y, bc_z, bbox & inside & ~degenerate


@functools.partial(jax.jit, static_argnames=("settings",))
def rasterize_surfaces_fast(fb: FrameBuffers, surfaces: Surfaces,
                            atlas: TextureAtlas,
                            settings: RasterSettings) -> FrameBuffers:
    assert settings.use_zbuffer and not settings.xray_mode \
        and settings.ortho_projection is None, \
        "fast path requires perspective + z-buffer + no x-ray"

    height, width = fb.color.shape
    n_surf = surfaces.sx.shape[0]
    yi, xi = jnp.meshgrid(jnp.arange(height, dtype=_I32),
                          jnp.arange(width, dtype=_I32), indexing="ij")
    px_ = xi.astype(_F32)
    py_ = yi.astype(_F32)

    opaque = surfaces.valid & ~surfaces.has_transparency
    transparent = surfaces.valid & surfaces.has_transparency

    # Compacted index lists: stable, original order for opaque (the zbuffer
    # draw order), back-to-front for transparent (render.rs:2527-2532).
    arange = jnp.arange(n_surf, dtype=_I32)
    op_order = jnp.lexsort((arange, jnp.where(opaque, 0, 1).astype(_I32))).astype(_I32)
    n_op = jnp.sum(opaque)
    tr_order = jnp.lexsort((arange, -surfaces.centroid_z,
                            jnp.where(transparent, 0, 1).astype(_I32))).astype(_I32)
    n_tr = jnp.sum(transparent)

    # ---- Pass 1: opaque visibility reduction ----
    def vis_body(i, carry):
        best_izi, best_idx = carry
        idx = op_order[i]
        sx = surfaces.sx[idx]
        sy = surfaces.sy[idx]
        iz = surfaces.inv_z[idx]
        uvc = surfaces.uv[idx]
        tid = surfaces.tex_id[idx]
        black_transparent = surfaces.black_transparent[idx]

        bc_x, bc_y, bc_z, covered = _edge_setup(
            sx, sy, surfaces.area[idx], surfaces.inv_area[idx],
            px_, py_, width, height)
        izi = (bc_x * iz[0] + bc_y * iz[1]) + bc_z * iz[2]

        safe_tid = jnp.maximum(tid, 0)
        keyable = (tid >= 0) & jnp.where(black_transparent,
                                         atlas.has_black[safe_tid],
                                         atlas.has_transparent[safe_tid])

        def keyed_mask(_):
            uv = ((uvc[0, 0], uvc[0, 1]), (uvc[1, 0], uvc[1, 1]),
                  (uvc[2, 0], uvc[2, 1]))
            u, v = px.uv_at(bc_x, bc_y, bc_z, uv, iz, izi, settings,
                            exact_persp=False)
            _, keyed = px.sample_and_key(atlas, tid, u, v, black_transparent)
            return keyed

        keyed = jax.lax.cond(keyable, keyed_mask,
                             lambda _: jnp.zeros_like(covered), None)

        better = covered & ~keyed & (izi > best_izi)
        return (jnp.where(better, izi, best_izi),
                jnp.where(better, idx, best_idx))

    best_izi, best_idx = jax.lax.fori_loop(
        0, n_op, vis_body,
        (fb.depth, jnp.full((height, width), -1, _I32)))

    # ---- Pass 2: resolve winners through the full pixel pipeline ----
    has = best_idx >= 0
    idx = jnp.maximum(best_idx, 0)

    sx = surfaces.sx[idx]        # (H, W, 3)
    sy = surfaces.sy[idx]
    iz3 = surfaces.inv_z[idx]
    uv3 = surfaces.uv[idx]       # (H, W, 3, 2)
    vc3 = surfaces.vc[idx]       # (H, W, 3, 3)
    sh3 = surfaces.shade[idx]
    tid = surfaces.tex_id[idx]
    bt = surfaces.black_transparent[idx]
    nd = surfaces.needs_dither[idx]

    bc_x, bc_y, bc_z, _ = _edge_setup(sx, sy, surfaces.area[idx],
                                      surfaces.inv_area[idx],
                                      px_, py_, width, height)
    iz = (iz3[..., 0], iz3[..., 1], iz3[..., 2])
    izi = (bc_x * iz[0] + bc_y * iz[1]) + bc_z * iz[2]

    uv = tuple((uv3[..., k, 0], uv3[..., k, 1]) for k in range(3))
    vc = tuple((vc3[..., k, 0], vc3[..., k, 1], vc3[..., k, 2]) for k in range(3))
    shade = tuple((sh3[..., k, 0], sh3[..., k, 1], sh3[..., k, 2]) for k in range(3))

    pc = px.pixel_color(bc_x, bc_y, bc_z, izi, iz, uv, vc, shade, tid, bt, nd,
                        xi, yi, atlas, settings, exact_persp=False)

    drawn = has & ~pc.keyed_out
    word = col.pack_rgba8(pc.r8, pc.g8, pc.b8, jnp.full_like(pc.r8, 255))
    color = jnp.where(drawn, word, fb.color)
    depth = best_izi  # loop already merged with incoming fb.depth

    # ---- Pass 3: transparent surfaces, sequential back-to-front ----
    def tr_body(i, carry):
        idx = tr_order[i]
        scalars = (
            surfaces.sx[idx], surfaces.sy[idx], surfaces.z[idx],
            surfaces.inv_z[idx], surfaces.area[idx], surfaces.inv_area[idx],
            surfaces.uv[idx], surfaces.vc[idx],
            surfaces.shade[idx], surfaces.tex_id[idx],
            surfaces.blend_mode[idx], surfaces.black_transparent[idx],
            surfaces.editor_alpha[idx], surfaces.needs_dither[idx],
            jnp.asarray(True), surfaces.valid[idx],
        )
        return _raster_one(carry, scalars, atlas, settings,
                           (px_, py_, xi, yi), "inv")

    color, depth = jax.lax.fori_loop(0, n_tr, tr_body, (color, depth))
    return FrameBuffers(color=color, depth=depth)

"""Visibility-reduction rasterizer — the TPU throughput path.

Strategy (TPU-idiomatic replacement for the reference's sequential pixel
writes, `/root/reference/src/rasterizer/render.rs:2547-2570`):

  1. OPAQUE pass — a pure per-pixel reduction to the winning surface.
     Opaque surfaces never blend (their resolved blend mode is OPAQUE by
     construction: that's what routed them to this pass), and the z-test is
     `first drawn wins ties`, i.e. the lexicographic (inv_z, -index) maximum:
     order-independent, so surfaces are processed vectorized in chunks with
     an argmax inside each chunk and a lexicographic merge across chunks.
     Surfaces whose texture can color-key pixels (per-texture has_black /
     has_transparent flags) need a texture sample to decide coverage; those
     few run in a separate sequential pass with the same lexicographic merge.
  2. RESOLVE — one full-quality pixel pipeline evaluation (ops/pixel.py) for
     each pixel's winner.  Per-surface attributes are fetched with an exact
     one-hot MXU matmul (ops/gatherx.py) instead of slow dynamic gathers;
     texture sampling likewise for small atlases.
  3. TRANSPARENT pass — the few semi-transparent surfaces composite
     back-to-front sequentially (order-dependent blending), sharing
     raster_ref's masked compositor with inverse-z depth.

Depth is inverse-z throughout: z-tests are comparisons only; no division in
any per-(surface, pixel) code.  Ordering is equivalent to the reference's
z-space tests except where two distinct interpolated 1/z values round to the
same f32 z (sub-ulp z-fighting; see raster_ref.py).

Requires: perspective projection, z-buffer on, no x-ray (the game defaults).
`render.render_mesh_15` falls back to the sequential compositor otherwise.
"""

import functools

import jax
import jax.numpy as jnp

from ..config import RasterSettings
from ..types import FrameBuffers, Surfaces, TextureAtlas
from . import color as col
from . import gatherx
from . import pixel as px
from .raster_ref import _raster_one

_F32 = jnp.float32
_I32 = jnp.int32

NEG_INF = jnp.float32(-jnp.inf)


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


def _pack_attrs(surfaces: Surfaces):
    """Per-surface attributes as one (T, C) f32 matrix for one-hot resolve.

    All columns are exactly representable in f32 (screen coords, 1/z, uv,
    0-255 colors, shades, small flags/ids).
    """
    cols = [
        surfaces.sx, surfaces.sy, surfaces.inv_z,            # 9
        surfaces.area[:, None], surfaces.inv_area[:, None],  # 2
        surfaces.uv.reshape(surfaces.uv.shape[0], 6),        # 6
        surfaces.vc.reshape(surfaces.vc.shape[0], 9).astype(_F32),  # 9
        surfaces.shade.reshape(surfaces.shade.shape[0], 9),  # 9
        surfaces.tex_id[:, None].astype(_F32),               # 1
        surfaces.black_transparent[:, None].astype(_F32),    # 1
        surfaces.needs_dither[:, None].astype(_F32),         # 1
    ]
    return jnp.concatenate(cols, axis=1)  # (T, 38)


@functools.partial(jax.jit, static_argnames=("settings", "chunk"))
def rasterize_surfaces_fast(fb: FrameBuffers, surfaces: Surfaces,
                            atlas: TextureAtlas, settings: RasterSettings,
                            chunk: int = 16) -> FrameBuffers:
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
    safe_tid = jnp.maximum(surfaces.tex_id, 0)
    # Keying can only remove coverage when black_transparent is set AND the
    # texture has a black texel (see ops/pixel.sample_keyed_bit).
    keyable = ((surfaces.tex_id >= 0) & surfaces.black_transparent
               & atlas.has_black[safe_tid] & surfaces.key_possible)
    clean_op = opaque & ~keyable
    key_op = opaque & keyable

    # ---- Pass 1a: clean opaque surfaces, vectorized in chunks ----
    # The winner is the lexicographic (inv_z, -index) maximum — equivalent to
    # sequential draw order with a strict z-test (first drawn wins ties).
    n_chunks = -(-n_surf // chunk)
    pad = n_chunks * chunk - n_surf

    def padded(arr, fill):
        if pad == 0:
            return arr
        shape = (pad,) + arr.shape[1:]
        return jnp.concatenate([arr, jnp.full(shape, fill, arr.dtype)])

    sx_p = padded(surfaces.sx, 0.0)
    sy_p = padded(surfaces.sy, 0.0)
    iz_p = padded(surfaces.inv_z, 0.0)
    area_p = padded(surfaces.area, 0.0)
    inva_p = padded(surfaces.inv_area, 1.0)
    clean_p = padded(clean_op, False)

    def chunk_body(c, carry):
        best_izi, best_idx = carry
        s = c * chunk
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, s, chunk)

        def tri(sx, sy, iz, area, inva, ok):
            bc_x, bc_y, bc_z, covered = _edge_setup(
                sx, sy, area, inva, px_, py_, width, height)
            izi = (bc_x * iz[0] + bc_y * iz[1]) + bc_z * iz[2]
            return jnp.where(covered & ok, izi, NEG_INF)

        izi_k = jax.vmap(tri)(sl(sx_p), sl(sy_p), sl(iz_p), sl(area_p),
                              sl(inva_p), sl(clean_p))  # (K, H, W)
        # argmax picks the FIRST max — lowest chunk offset — which is draw
        # order, since opaque draw order in zbuffer mode IS index order.
        local_k = jnp.argmax(izi_k, axis=0).astype(_I32)
        local_izi = jnp.max(izi_k, axis=0)
        local_idx = s + local_k

        # Background (best_idx == -1) wins ties: the reference z-test is
        # strictly `<`, so equal depth keeps the existing pixel.
        better = (local_izi > best_izi) | \
            ((local_izi == best_izi) & (best_idx >= 0) & (local_idx < best_idx))
        return (jnp.where(better, local_izi, best_izi),
                jnp.where(better, local_idx, best_idx))

    best_izi, best_idx = jax.lax.fori_loop(
        0, n_chunks, chunk_body,
        (fb.depth, jnp.full((height, width), -1, _I32)))

    # ---- Pass 1b: keyable opaque surfaces, sequential lexicographic merge ----
    arange = jnp.arange(n_surf, dtype=_I32)
    ko_order = jnp.lexsort((arange, jnp.where(key_op, 0, 1).astype(_I32))).astype(_I32)
    n_ko = jnp.sum(key_op)

    def ko_body(i, carry):
        best_izi, best_idx = carry
        idx = ko_order[i]
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
        uv = ((uvc[0, 0], uvc[0, 1]), (uvc[1, 0], uvc[1, 1]),
              (uvc[2, 0], uvc[2, 1]))
        u, v = px.uv_at(bc_x, bc_y, bc_z, uv, iz, izi, settings,
                        exact_persp=False)
        keyed = px.sample_keyed_bit_row(atlas, tid, u, v, black_transparent)
        cand = covered & ~keyed
        better = cand & ((izi > best_izi)
                         | ((izi == best_izi) & (best_idx >= 0)
                            & (idx < best_idx)))
        return (jnp.where(better, izi, best_izi),
                jnp.where(better, idx, best_idx))

    best_izi, best_idx = jax.lax.fori_loop(0, n_ko, ko_body,
                                           (best_izi, best_idx))

    has = best_idx >= 0
    best_idx = jnp.where(has, best_idx, 0)

    # ---- Pass 2: resolve winners through the full pixel pipeline ----
    attrs = gatherx.onehot_rows(_pack_attrs(surfaces), best_idx)  # (H, W, C)
    sx = attrs[..., 0:3]
    sy = attrs[..., 3:6]
    iz3 = attrs[..., 6:9]
    area = attrs[..., 9]
    inv_area = attrs[..., 10]
    uv3 = attrs[..., 11:17].reshape(height, width, 3, 2)
    vc3 = attrs[..., 17:26].reshape(height, width, 3, 3).astype(_I32)
    sh3 = attrs[..., 26:35].reshape(height, width, 3, 3)
    tid = attrs[..., 35].astype(_I32)
    bt = attrs[..., 36] != 0
    nd = attrs[..., 37] != 0

    bc_x, bc_y, bc_z, _ = _edge_setup(sx, sy, area, inv_area,
                                      px_, py_, width, height)
    iz = (iz3[..., 0], iz3[..., 1], iz3[..., 2])
    izi = (bc_x * iz[0] + bc_y * iz[1]) + bc_z * iz[2]

    uv = tuple((uv3[..., k, 0], uv3[..., k, 1]) for k in range(3))
    vc = tuple((vc3[..., k, 0], vc3[..., k, 1], vc3[..., k, 2]) for k in range(3))
    shade = tuple((sh3[..., k, 0], sh3[..., k, 1], sh3[..., k, 2]) for k in range(3))

    pc = px.pixel_color(bc_x, bc_y, bc_z, izi, iz, uv, vc, shade, tid, bt, nd,
                        xi, yi, atlas, settings, exact_persp=False,
                        tex_gather="onehot")

    drawn = has & ~pc.keyed_out
    word = col.pack_rgba8(pc.r8, pc.g8, pc.b8, jnp.full_like(pc.r8, 255))
    color = jnp.where(drawn, word, fb.color)
    depth = best_izi  # passes 1a/1b already merged with incoming fb.depth

    # ---- Pass 3: transparent surfaces, sequential back-to-front ----
    tr_order = jnp.lexsort((arange, -surfaces.centroid_z,
                            jnp.where(transparent, 0, 1).astype(_I32))).astype(_I32)
    n_tr = jnp.sum(transparent)

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

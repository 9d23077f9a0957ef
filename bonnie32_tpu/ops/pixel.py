"""The per-pixel PS1 color pipeline, shared by all rasterizer paths.

Implements the pixel body of `rasterize_triangle_15` (`/root/reference/src/
rasterizer/render.rs:1563-1661`): UV interpolation, texture sample, black/
transparent keying, 5->8 expansion, vertex-color modulation, shading,
dither-quantize and the drawable-black STP fixup.

Every attribute argument may be a scalar (sequential compositor: one surface
per call) or a per-pixel array (visibility resolve: the winning surface per
pixel) — the math broadcasts identically.
"""

from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp

from ..config import RasterSettings, ShadingMode
from ..types import TextureAtlas
from . import color as col
from .exactf import exact_div

_F32 = jnp.float32
_I32 = jnp.int32


class PixelColor(NamedTuple):
    r8: jnp.ndarray
    g8: jnp.ndarray
    b8: jnp.ndarray
    semi: jnp.ndarray       # STP bit (incl. all-black fixup)
    keyed_out: jnp.ndarray  # pixel skipped by transparency/black keying


def sample_texture(atlas: TextureAtlas, tid, u, v, tex_gather: str = "direct"):
    """Texture15::sample (types.rs:671-681); `v` is the already-flipped
    (1 - v) argument.  tid < 0 lanes gather slot 0 (caller overrides).

    tex_gather: "direct" uses a dynamic gather; "onehot" uses the exact
    MXU one-hot gather (ops/gatherx.py) when the atlas is small enough —
    ~8x faster per pixel on TPU, bit-identical results.
    """
    from . import gatherx

    safe = jnp.maximum(tid, 0)
    w = atlas.width[safe]
    h = atlas.height[safe]
    off = atlas.offset[safe]

    def wrap(x):
        r = jnp.fmod(x, _F32(1.0))
        r = jnp.where(r < 0, r + _F32(1.0), r)
        return jnp.where(jnp.isnan(r), _F32(0.0), r)

    uw = wrap(u)
    vw = wrap(v)
    tx = jnp.minimum(jnp.trunc(uw * w.astype(_F32)).astype(_I32), w - 1)
    ty = jnp.minimum(jnp.trunc(vw * h.astype(_F32)).astype(_I32), h - 1)
    flat = off + ty * w + tx
    if (tex_gather == "onehot"
            and atlas.data.shape[0] % 128 == 0
            and atlas.data.shape[0] <= gatherx.ONEHOT_ATLAS_LIMIT):
        return gatherx.onehot_values_u16(atlas.data, flat)
    return atlas.data[flat]


def u8_trunc_sat(x):
    """Rust `f32 as u8`: truncate toward zero, saturate [0,255], NaN->0."""
    x = jnp.where(jnp.isnan(x), 0.0, x)
    return jnp.clip(jnp.trunc(x), 0.0, 255.0).astype(_I32)


def interp3(bc_x, bc_y, bc_z, a0, a1, a2):
    """(bc_x*a0 + bc_y*a1) + bc_z*a2 — the reference's accumulation order."""
    return (bc_x * a0 + bc_y * a1) + bc_z * a2


def texel_flat_index(atlas: TextureAtlas, tid, u, v):
    """The flat atlas index Texture15::sample would read (types.rs:671-681);
    `v` is the already-flipped (1 - v) argument."""
    safe = jnp.maximum(tid, 0)
    w = atlas.width[safe]
    h = atlas.height[safe]
    off = atlas.offset[safe]

    def wrap(x):
        r = jnp.fmod(x, _F32(1.0))
        r = jnp.where(r < 0, r + _F32(1.0), r)
        return jnp.where(jnp.isnan(r), _F32(0.0), r)

    tx = jnp.minimum(jnp.trunc(wrap(u) * w.astype(_F32)).astype(_I32), w - 1)
    ty = jnp.minimum(jnp.trunc(wrap(v) * h.astype(_F32)).astype(_I32), h - 1)
    return off + ty * w + tx


def sample_keyed_bit_row(atlas: TextureAtlas, tid, u, v, black_transparent):
    """Keying test for a SINGLE surface (scalar tid): fetches that
    texture's packed black-bit word row (atlas.black_wrows[tid], <= Wmax
    words) and extracts the bit with a fused compare-select-reduce — no
    whole-atlas one-hot.  Bit semantics identical to sample_keyed_bit."""
    safe = jnp.maximum(tid, 0)
    w = atlas.width[safe]
    h = atlas.height[safe]

    def wrap(x):
        r = jnp.fmod(x, _F32(1.0))
        r = jnp.where(r < 0, r + _F32(1.0), r)
        return jnp.where(jnp.isnan(r), _F32(0.0), r)

    vf = _F32(1.0) - v
    tx = jnp.minimum(jnp.trunc(wrap(u) * w.astype(_F32)).astype(_I32), w - 1)
    ty = jnp.minimum(jnp.trunc(wrap(vf) * h.astype(_F32)).astype(_I32), h - 1)
    rel = ty * w + tx
    row = atlas.black_wrows[safe]                       # (Wm,) i32
    wm = row.shape[0]
    iota = jnp.arange(wm, dtype=_I32)
    word_idx = rel >> 5
    words = jnp.sum(jnp.where(word_idx[..., None] == iota, row, 0), axis=-1)
    bit = (words >> (rel & 31)) & 1
    return (bit != 0) & black_transparent & (tid >= 0)


def sample_keyed_bit(atlas: TextureAtlas, tid, u, v, black_transparent):
    """Keying test only — the outcome of render.rs:1588-1607: a pixel is
    skipped iff the sampled texel has rgb == 0 AND the face has
    black_transparent set (with black_transparent off, transparent texels
    become drawable black and are still written).  Uses the packed per-texel
    black-bit plane: one exact word one-hot instead of a texel gather."""
    from . import gatherx

    flat = texel_flat_index(atlas, tid, u, _F32(1.0) - v)
    words = gatherx.onehot_values_u32(atlas.black_words, flat >> 5)
    bit = (words >> (flat & 31)) & 1
    return (bit != 0) & black_transparent & (tid >= 0)


def sample_and_key(atlas, tid, u, v, black_transparent, tex_gather="direct"):
    """Texture sample + keying (render.rs:1582-1607).

    Returns (c15 after drawable-black fixup, keyed_out mask)."""
    textured = tid >= 0
    sampled = sample_texture(atlas, tid, u, _F32(1.0) - v, tex_gather)
    c15 = jnp.where(textured, sampled, _I32(col.WHITE))

    is_black = (col.r5(c15) == 0) & (col.g5(c15) == 0) & (col.b5(c15) == 0)
    is_transp = c15 == 0
    keyed_out = is_black & black_transparent
    c15 = jnp.where(is_transp & ~black_transparent,
                    _I32(col.BLACK_DRAWABLE), c15)
    return c15, keyed_out


def uv_at(bc_x, bc_y, bc_z, uv, iz, izi, settings: RasterSettings,
          exact_persp: bool):
    """UV interpolation (render.rs:1563-1579).  uv[k] = (u, v) per corner."""
    if settings.affine_textures:
        u = interp3(bc_x, bc_y, bc_z, uv[0][0], uv[1][0], uv[2][0])
        v = interp3(bc_x, bc_y, bc_z, uv[0][1], uv[1][1], uv[2][1])
    else:
        u_oz = ((bc_x * uv[0][0]) * iz[0] + (bc_y * uv[1][0]) * iz[1]) \
            + (bc_z * uv[2][0]) * iz[2]
        v_oz = ((bc_x * uv[0][1]) * iz[0] + (bc_y * uv[1][1]) * iz[1]) \
            + (bc_z * uv[2][1]) * iz[2]
        safe = jnp.where(izi == 0, _F32(1.0), izi)
        div = exact_div if exact_persp else (lambda a, b: a / b)
        u = div(u_oz, safe)
        v = div(v_oz, safe)
    return u, v


def pixel_color(bc_x, bc_y, bc_z, izi, iz, uv, vc, shade, tid,
                black_transparent, needs_dither, xi, yi,
                atlas: TextureAtlas, settings: RasterSettings,
                exact_persp: bool = True,
                tex_gather: str = "direct") -> PixelColor:
    """Full pixel pipeline after the inside/z tests.

    iz: 3-seq of 1/z per corner; uv: 3-seq of (u, v); vc: 3-seq of (r, g, b)
    int; shade: 3-seq of (r, g, b) f32 light shades.
    """
    u, v = uv_at(bc_x, bc_y, bc_z, uv, iz, izi, settings, exact_persp)
    c15, keyed_out = sample_and_key(atlas, tid, u, v, black_transparent,
                                    tex_gather)

    tex_r8 = col.expand_5_to_8(col.r5(c15))
    tex_g8 = col.expand_5_to_8(col.g5(c15))
    tex_b8 = col.expand_5_to_8(col.b5(c15))

    def f32(x):
        return jnp.asarray(x).astype(_F32)

    vr = u8_trunc_sat(interp3(bc_x, bc_y, bc_z, f32(vc[0][0]), f32(vc[1][0]), f32(vc[2][0])))
    vg = u8_trunc_sat(interp3(bc_x, bc_y, bc_z, f32(vc[0][1]), f32(vc[1][1]), f32(vc[2][1])))
    vb = u8_trunc_sat(interp3(bc_x, bc_y, bc_z, f32(vc[0][2]), f32(vc[1][2]), f32(vc[2][2])))

    mod_r8 = col.modulate8(tex_r8, vr)
    mod_g8 = col.modulate8(tex_g8, vg)
    mod_b8 = col.modulate8(tex_b8, vb)

    if settings.shading == ShadingMode.NONE:
        sh_r = sh_g = sh_b = jnp.ones_like(bc_x)
    else:
        # FLAT surfaces carry the same shade on all corners, so Gouraud
        # interpolation is exact for them too when corners agree; but the
        # reference uses the corner-0 value directly — keep both semantics.
        if settings.shading == ShadingMode.FLAT:
            sh_r = jnp.broadcast_to(shade[0][0], bc_x.shape)
            sh_g = jnp.broadcast_to(shade[0][1], bc_x.shape)
            sh_b = jnp.broadcast_to(shade[0][2], bc_x.shape)
        else:
            sh_r = interp3(bc_x, bc_y, bc_z, shade[0][0], shade[1][0], shade[2][0])
            sh_g = interp3(bc_x, bc_y, bc_z, shade[0][1], shade[1][1], shade[2][1])
            sh_b = interp3(bc_x, bc_y, bc_z, shade[0][2], shade[1][2], shade[2][2])

    def apply_shade(m8, s):
        return u8_trunc_sat(jnp.minimum(
            m8.astype(_F32) * jnp.clip(s, 0.0, 2.0), 255.0))

    shaded_r8 = apply_shade(mod_r8, sh_r)
    shaded_g8 = apply_shade(mod_g8, sh_g)
    shaded_b8 = apply_shade(mod_b8, sh_b)

    offset = col.dither_offset(xi, yi)
    r5 = jnp.where(needs_dither, col.dither_and_quantize8(shaded_r8, offset),
                   shaded_r8 >> 3)
    g5 = jnp.where(needs_dither, col.dither_and_quantize8(shaded_g8, offset),
                   shaded_g8 >> 3)
    b5 = jnp.where(needs_dither, col.dither_and_quantize8(shaded_b8, offset),
                   shaded_b8 >> 3)

    all_black = (r5 == 0) & (g5 == 0) & (b5 == 0)
    semi = col.is_semi_transparent(c15) | all_black
    return PixelColor(
        r8=col.expand_5_to_8(r5),
        g8=col.expand_5_to_8(g5),
        b8=col.expand_5_to_8(b5),
        semi=semi,
        keyed_out=keyed_out,
    )

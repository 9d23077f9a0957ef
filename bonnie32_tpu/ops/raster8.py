"""8-bit (non-RGB555) render path: `rasterize_triangle` + `render_mesh`.

The reference keeps a full-8-bit variant alongside the PS1-authentic
RGB555 path, selected by `use_rgb555 = false`
(`/root/reference/src/rasterizer/render.rs:1202` rasterize_triangle,
:1971 render_mesh).  Key semantic differences from the 15-bit path:

  * Textures are 8-bit RGBA: alpha-0 texels carry BlendMode::Erase and are
    skipped (types.rs:1095); no black color-keying, no drawable-black
    fixup, no STP bit.
  * Undithered pixels keep FULL 8-bit precision (no 5-bit quantize);
    dithering quantizes to 5 bits and expands with a plain << 3
    (render.rs:1186 apply_dither).
  * Blending happens in 8-bit space (Color::blend_with, types.rs:886).
  * SINGLE draw pass: no opaque/transparent partition; painter's sort only
    without a z-buffer; ALL depth-tested writes update z — including
    blended and editor-alpha pixels (render.rs:1395-1420, :377).
  * Editor alpha lerps in f32 with truncating casts (render.rs:398-409).

Implemented as a sequential masked compositor over the shared surface
build (ops/surface.py); per-texel blend modes ride in byte 3 of the
packed atlas words.
"""

import functools

import jax
import jax.numpy as jnp

from ..config import BlendMode, RasterSettings, ShadingMode
from ..types import FrameBuffers, Surfaces, TextureAtlas8
from . import color as col
from . import pixel as px
from .raster_fast import _edge_setup
from .surface import build_surfaces

_F32 = jnp.float32
_I32 = jnp.int32

F32_MAX = jnp.float32(3.4028235e38)
WHITE8 = (255, 255, 255, int(BlendMode.OPAQUE))


def sample_texture8(atlas: TextureAtlas8, tid, u, v):
    """Texture::sample (types.rs:1242) — rem_euclid wrap, nearest texel.
    Returns (r8, g8, b8, blend) i32; tid < 0 lanes read slot 0 (caller
    overrides with WHITE)."""
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
    word = atlas.data[off + ty * w + tx]
    return (word & 0xFF, (word >> 8) & 0xFF, (word >> 16) & 0xFF,
            (word >> 24) & 0xFF)


def blend8(fr, fg, fb_, br, bg, bb, mode):
    """Color::blend_with in 8-bit space (types.rs:886-930)."""
    avg = ((br + fr) // 2, (bg + fg) // 2, (bb + fb_) // 2)
    add = (jnp.minimum(br + fr, 255), jnp.minimum(bg + fg, 255),
           jnp.minimum(bb + fb_, 255))
    sub = (jnp.maximum(br - fr, 0), jnp.maximum(bg - fg, 0),
           jnp.maximum(bb - fb_, 0))
    addq = (jnp.minimum(br + fr // 4, 255), jnp.minimum(bg + fg // 4, 255),
            jnp.minimum(bb + fb_ // 4, 255))

    def pick(k):
        out = jnp.where(mode == int(BlendMode.AVERAGE), avg[k],
              jnp.where(mode == int(BlendMode.ADD), add[k],
              jnp.where(mode == int(BlendMode.SUBTRACT), sub[k],
              jnp.where(mode == int(BlendMode.ADD_QUARTER), addq[k],
                        (fr, fg, fb_)[k]))))
        return jnp.where(mode == int(BlendMode.ERASE), 0, out)

    return pick(0), pick(1), pick(2)


def _raster_one8(carry, scalars, atlas: TextureAtlas8,
                 settings: RasterSettings, grid):
    """One surface, full-frame masked (render.rs:1202-1432)."""
    color_buf, depth_buf = carry
    (sx, sy, z3, iz, area, inv_area, uvc, vc, shade, tid, editor_alpha,
     needs_dither, valid) = scalars
    px_, py_, xi, yi = grid

    bc_x, bc_y, bc_z, covered = _edge_setup(sx, sy, area, inv_area,
                                            px_, py_,
                                            color_buf.shape[1],
                                            color_buf.shape[0])
    izi = (bc_x * iz[0] + bc_y * iz[1]) + bc_z * iz[2]
    from .exactf import exact_recip
    z = jnp.where(izi == 0, F32_MAX, exact_recip(jnp.where(izi == 0, _F32(1.0), izi)))
    zpass = z < depth_buf if settings.use_zbuffer \
        else jnp.ones_like(covered)

    uv = ((uvc[0, 0], uvc[0, 1]), (uvc[1, 0], uvc[1, 1]),
          (uvc[2, 0], uvc[2, 1]))
    u, v = px.uv_at(bc_x, bc_y, bc_z, uv, iz, izi, settings,
                    exact_persp=False)

    textured = tid >= 0
    tr, tg, tb, tblend = sample_texture8(atlas, tid, u, _F32(1.0) - v)
    tr = jnp.where(textured, tr, WHITE8[0])
    tg = jnp.where(textured, tg, WHITE8[1])
    tb = jnp.where(textured, tb, WHITE8[2])
    tblend = jnp.where(textured, tblend, WHITE8[3])
    # alpha-0 texels (Erase) skip (render.rs:1349)
    drawable = tblend != int(BlendMode.ERASE)

    # interpolated vertex color, truncating casts (render.rs:1356-1362)
    def interp_u8(a, b, c):
        return px.u8_trunc_sat(px.interp3(bc_x, bc_y, bc_z, _F32(a),
                                          _F32(b), _F32(c)))

    vr = interp_u8(vc[0, 0], vc[1, 0], vc[2, 0])
    vg = interp_u8(vc[0, 1], vc[1, 1], vc[2, 1])
    vb = interp_u8(vc[0, 2], vc[1, 2], vc[2, 2])

    # modulation (types.rs:801): (tex * vc) / 128, min 255
    mr = col.modulate8(tr, vr)
    mg = col.modulate8(tg, vg)
    mb = col.modulate8(tb, vb)

    # shading (render.rs:1074 shade_color_rgb)
    if settings.shading == ShadingMode.NONE:
        sr = sg = sb = jnp.ones_like(bc_x)
    elif settings.shading == ShadingMode.FLAT:
        sr = jnp.broadcast_to(shade[0, 0], bc_x.shape)
        sg = jnp.broadcast_to(shade[0, 1], bc_x.shape)
        sb = jnp.broadcast_to(shade[0, 2], bc_x.shape)
    else:
        sr = px.interp3(bc_x, bc_y, bc_z, shade[0, 0], shade[1, 0], shade[2, 0])
        sg = px.interp3(bc_x, bc_y, bc_z, shade[0, 1], shade[1, 1], shade[2, 1])
        sb = px.interp3(bc_x, bc_y, bc_z, shade[0, 2], shade[1, 2], shade[2, 2])

    def shade_mul(m8, s):
        return jnp.trunc(jnp.minimum(m8.astype(_F32) * s, 255.0)).astype(_I32)

    r8 = shade_mul(mr, sr)
    g8 = shade_mul(mg, sg)
    b8 = shade_mul(mb, sb)

    # optional dither: quantize to 5-bit + plain << 3 expand (render.rs:1186)
    offset = col.dither_offset(xi, yi)
    r8 = jnp.where(needs_dither, col.dither_and_quantize8(r8, offset) << 3, r8)
    g8 = jnp.where(needs_dither, col.dither_and_quantize8(g8, offset) << 3, g8)
    b8 = jnp.where(needs_dither, col.dither_and_quantize8(b8, offset) << 3, b8)

    # blend with the framebuffer in 8-bit space (texel blend drives it)
    back_r, back_g, back_b, _ = col.unpack_rgba8(color_buf)
    fr, fg, fb2 = blend8(r8, g8, b8, back_r, back_g, back_b, tblend)

    # editor alpha: f32 lerp with the PS1-blend result (render.rs:398-409)
    a = editor_alpha.astype(_F32) / _F32(255.0)
    inv = _F32(1.0) - a
    lr = jnp.trunc(fr.astype(_F32) * a + back_r.astype(_F32) * inv).astype(_I32)
    lg = jnp.trunc(fg.astype(_F32) * a + back_g.astype(_F32) * inv).astype(_I32)
    lb = jnp.trunc(fb2.astype(_F32) * a + back_b.astype(_F32) * inv).astype(_I32)
    use_lerp = editor_alpha < 255
    fr = jnp.where(use_lerp, lr, fr)
    fg = jnp.where(use_lerp, lg, fg)
    fb2 = jnp.where(use_lerp, lb, fb2)

    out_a = jnp.where(tblend == int(BlendMode.ERASE), 0, 255)
    word = col.pack_rgba8(fr, fg, fb2, jnp.full_like(fr, 255))
    del out_a  # blends resolve to opaque; Erase texels were skipped

    drawn = covered & zpass & drawable & valid & (editor_alpha > 0)
    color_buf = jnp.where(drawn, word, color_buf)
    # ALL drawn pixels update z in the 8-bit path (render.rs:1395-1420)
    depth_buf = jnp.where(drawn & settings.use_zbuffer, z, depth_buf)
    return color_buf, depth_buf


@functools.partial(jax.jit, static_argnames=("settings",))
def render_mesh8(fb: FrameBuffers, mesh, faces, atlas8: TextureAtlas8,
                 camera, lights, fog, settings: RasterSettings
                 ) -> FrameBuffers:
    """render_mesh (render.rs:1971) — the full-8-bit pipeline.

    Reuses the shared CULL/FOG surface build; the 15-bit-only atlas inputs
    (keying planes) are not consulted.  Single pass in face order; painter's
    back-to-front sort without a z-buffer (render.rs:2154).
    """
    height, width = fb.color.shape
    # build_surfaces needs a 15-bit-shaped atlas only for transparency
    # classification; fabricate the two fields it reads from atlas8.
    from ..types import TextureAtlas
    shim = TextureAtlas(
        data=atlas8.data, offset=atlas8.offset, width=atlas8.width,
        height=atlas8.height, blend_mode=atlas8.blend_mode,
        has_black=jnp.zeros_like(atlas8.blend_mode, bool),
        has_transparent=jnp.zeros_like(atlas8.blend_mode, bool),
        black_words=jnp.zeros((128,), _I32),
        transp_words=jnp.zeros((128,), _I32),
        black_wrows=jnp.zeros((1, 8), _I32))
    surfaces = build_surfaces(mesh, faces, shim, camera, lights, fog,
                              settings, width, height)

    n = surfaces.sx.shape[0]
    arange = jnp.arange(n, dtype=_I32)
    if settings.use_zbuffer:
        order = arange
    else:
        # stable back-to-front on centroid z, invalid last
        order = jnp.lexsort((arange, -surfaces.centroid_z,
                             jnp.where(surfaces.valid, 0, 1).astype(_I32))
                            ).astype(_I32)

    yi, xi = jnp.meshgrid(jnp.arange(height, dtype=_I32),
                          jnp.arange(width, dtype=_I32), indexing="ij")
    grid = (xi.astype(_F32), yi.astype(_F32), xi, yi)

    def body(i, carry):
        idx = order[i]
        scalars = (
            surfaces.sx[idx], surfaces.sy[idx], surfaces.z[idx],
            surfaces.inv_z[idx], surfaces.area[idx], surfaces.inv_area[idx],
            surfaces.uv[idx], surfaces.vc[idx], surfaces.shade[idx],
            surfaces.tex_id[idx], surfaces.editor_alpha[idx],
            surfaces.needs_dither[idx], surfaces.valid[idx])
        return _raster_one8(carry, scalars, atlas8, settings, grid)

    color, depth = jax.lax.fori_loop(0, n, body, (fb.color, fb.depth))
    return FrameBuffers(color=color, depth=depth)

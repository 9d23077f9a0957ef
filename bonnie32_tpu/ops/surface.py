"""CULL + FOG + surface-build stage, batched.

Replicates the CULL/FOG phase of `render_mesh_15` (`/root/reference/src/
rasterizer/render.rs:2364-2513`) as fixed-shape array ops:

  * conservative near-plane rejection — any corner cam_z <= NEAR_PLANE kills
    the whole triangle (render.rs:2379-2385); skipped for ortho.
  * 2D screen-space signed-area backface test (render.rs:2392-2394).
  * per-vertex PS1 fog (depth cueing) on vertex colors and whole-face distance
    culling (render.rs:2417-2443).
  * the winding swap for rendered backfaces (corner order 0,2,1 and negated
    normals, render.rs:2452-2479).
  * has_transparency / resolved blend mode / dither-rule flags.
  * per-corner Gouraud light shades or flat face shade (precomputed here so
    the per-pixel loop only interpolates; matches rasterize_triangle_15's
    per-surface precomputation at render.rs:1466-1483).

Sort keys and draw order (render.rs:2518-2545) are built in `draw_order`.
"""

from typing import Optional

import jax.numpy as jnp

from ..config import RasterSettings, ShadingMode, BlendMode, NEAR_PLANE
from ..types import (CameraArrays, FaceArrays, Fog, Lights, MeshArrays,
                     Surfaces, TextureAtlas)
from .exactf import exact_div, exact_recip
from .lighting import shade_points
from .vertex import transform_vertices, normalize_rows

_F32 = jnp.float32
_I32 = jnp.int32


def _fog_factor(z, start, falloff):
    """calculate_fog_factor (render.rs:2266-2274)."""
    lin = jnp.minimum(exact_div(z - start, jnp.where(falloff <= 0.0, _F32(1.0), falloff)), 1.0)
    f = jnp.where(z <= start, _F32(0.0),
        jnp.where(falloff <= 0.0, _F32(1.0), lin))
    return f


def _apply_fog_to_color(color_rgb, color_blend, fog_rgb, factor):
    """apply_fog_to_color (render.rs:2279-2293).

    Returns (rgb i32 (...,3), blend i32).  The lerp branch constructs a fresh
    Color::new — blend resets to OPAQUE there; the passthrough branches keep
    the original color (and blend).
    """
    f = factor[..., None]
    inv = 1.0 - f
    lerped = (color_rgb.astype(_F32) * inv + fog_rgb.astype(_F32) * f)
    lerped = jnp.clip(jnp.trunc(lerped), 0, 255).astype(_I32)

    use_orig = factor <= 0.0
    use_fog = factor >= 1.0
    rgb = jnp.where(use_orig[..., None], color_rgb,
          jnp.where(use_fog[..., None], jnp.broadcast_to(fog_rgb, color_rgb.shape),
                    lerped))
    blend = jnp.where(use_orig, color_blend,
                      jnp.full_like(color_blend, int(BlendMode.OPAQUE)))
    return rgb, blend


def build_surfaces(mesh: MeshArrays, faces: FaceArrays, atlas: TextureAtlas,
                   camera: CameraArrays, lights: Lights, fog: Fog,
                   settings: RasterSettings, width: int, height: int) -> Surfaces:
    """Transform + cull + fog + shade: faces -> padded Surfaces."""
    tv = transform_vertices(mesh.pos, mesh.normal, camera, settings, width, height)

    vi = faces.vidx  # (T, 3)
    # Per-corner gathers, original face order (v0, v1, v2).
    c_sx = tv.sx[vi]
    c_sy = tv.sy[vi]
    c_sz = tv.sz[vi]
    c_cam = tv.cam[vi]          # (T, 3, 3)
    c_camn = tv.cam_normal[vi]  # (T, 3, 3) — unused by the 15-path shading
    del c_camn
    c_wpos = mesh.pos[vi]       # (T, 3, 3)
    c_wnorm = mesh.normal[vi]   # (T, 3, 3)
    c_uv = mesh.uv[vi]          # (T, 3, 2)
    c_vcol = mesh.color[vi]     # (T, 3, 3)
    c_vblend = mesh.color_blend[vi]  # (T, 3)

    cam_z = c_cam[..., 2]  # (T, 3)

    # Near-plane conservative reject (render.rs:2379-2385).
    if settings.ortho_projection is None:
        near_ok = jnp.all(cam_z > NEAR_PLANE, axis=-1)
    else:
        near_ok = jnp.ones(vi.shape[0], bool)

    # 2D signed-area backface test (render.rs:2393).
    v1x, v2x, v3x = c_sx[:, 0], c_sx[:, 1], c_sx[:, 2]
    v1y, v2y, v3y = c_sy[:, 0], c_sy[:, 1], c_sy[:, 2]
    signed_area = (v2x - v1x) * (v3y - v1y) - (v3x - v1x) * (v2y - v1y)
    is_backface = signed_area <= 0.0

    # Fog on vertex colors + distance cull (render.rs:2417-2443).
    fog_rgb = fog.color
    factors = jnp.where(fog.enabled,
                        _fog_factor(cam_z, fog.start, fog.falloff),
                        jnp.zeros_like(cam_z))
    vc_rgb, vc_blend = _apply_fog_to_color(c_vcol, c_vblend, fog_rgb, factors)
    fog_cull = fog.enabled & jnp.all(cam_z > fog.cull_distance, axis=-1)

    # Transparency classification (render.rs:2403-2415).
    textured = faces.tex_id >= 0
    safe_tid = jnp.maximum(faces.tex_id, 0)
    tex_blend = atlas.blend_mode[safe_tid]
    has_transparency = ((textured & (tex_blend != int(BlendMode.OPAQUE)))
                        | (faces.blend_mode != int(BlendMode.OPAQUE))
                        | (faces.editor_alpha < 255))
    # Resolved rasterization blend mode (render.rs:1450-1452).
    blend_mode = jnp.where(textured, tex_blend, faces.blend_mode)

    # Winding swap for rendered backfaces (render.rs:2452-2479): corner
    # permutation (0, 2, 1) and negated normals.  Per-face double_sided
    # disables culling like the per-part settings in render_asset_parts
    # (scene.rs:134-138).
    render_back = not settings.backface_cull or settings.xray_mode
    render_back_face = (faces.double_sided
                        if not render_back else jnp.ones_like(is_backface))
    swap = is_backface & (render_back_face | render_back)  # (T, 3)

    def permute(arr):
        # corner swap (0,2,1) as a static reindex + select — take_along_axis
        # promotes indices to i64 under x64, and i64 gathers scalarize on
        # XLA:TPU (PLAN_PERF.md item 1).
        swapped = arr[:, jnp.asarray([0, 2, 1], _I32)]
        mask = swap.reshape(swap.shape + (1,) * (arr.ndim - 1))
        return jnp.where(mask, swapped, arr)

    sx = permute(c_sx[..., None])[..., 0]
    sy = permute(c_sy[..., None])[..., 0]
    sz = permute(c_sz[..., None])[..., 0]
    uv = permute(c_uv)
    vc = permute(vc_rgb)
    vcb = permute(vc_blend[..., None])[..., 0]
    wpos = permute(c_wpos)
    wnorm = permute(c_wnorm)
    wnorm = jnp.where(swap[:, None, None], -wnorm, wnorm)

    # Per-corner lighting (render.rs:1466-1483, precomputed per surface).
    if settings.shading == ShadingMode.GOURAUD:
        shade = shade_points(wnorm, wpos, lights)
    elif settings.shading == ShadingMode.FLAT:
        # Flat: average world pos/normal then one shade (render.rs:1467-1469).
        third = _F32(1.0 / 3.0)
        center = ((wpos[:, 0] + wpos[:, 1]) + wpos[:, 2]) * third
        avg_n = ((wnorm[:, 0] + wnorm[:, 1]) + wnorm[:, 2]) * third
        flat = shade_points(normalize_rows(avg_n), center, lights)
        shade = jnp.broadcast_to(flat[:, None, :], wpos.shape)
    else:
        shade = jnp.ones(wpos.shape, _F32)

    # Dither rule (render.rs:1487-1492) on the FOGGED vertex colors + blends.
    vc_eq_12 = jnp.all(vc[:, 0] == vc[:, 1], axis=-1) & (vcb[:, 0] == vcb[:, 1])
    vc_eq_23 = jnp.all(vc[:, 1] == vc[:, 2], axis=-1) & (vcb[:, 1] == vcb[:, 2])
    needs_dither = settings.dithering & (
        (settings.shading == ShadingMode.GOURAUD)
        | textured | ~vc_eq_12 | ~vc_eq_23)

    # Validity: padding, near plane, fog cull, backface cull.
    front_ok = ~is_backface | render_back_face | render_back
    valid = faces.valid & near_ok & ~fog_cull & front_ok

    # Centroid depth key, post-swap corner order; note the reference DIVIDES
    # by 3.0 here (render.rs:2529), unlike flat shading's multiply-by-1/3.
    centroid_z = exact_div((sz[:, 0] + sz[:, 1]) + sz[:, 2],
                           jnp.full_like(sz[:, 0], 3.0))

    # Exact per-corner 1/z (render.rs:1546-1548 computes these per pixel; they
    # are per-corner constants).
    inv_z = exact_recip(sz)

    # Rasterization area + exact reciprocal (render.rs:1500-1504), hoisted out
    # of the per-pixel loops.  NOTE: different formula/order than the cull
    # phase's signed_area.
    r1x, r2x, r3x = sx[:, 0], sx[:, 1], sx[:, 2]
    r1y, r2y, r3y = sy[:, 0], sy[:, 1], sy[:, 2]
    area = (r2y - r3y) * (r1x - r3x) + (r3x - r2x) * (r1y - r3y)
    degenerate = jnp.abs(area) < 0.00001
    inv_area = exact_recip(jnp.where(degenerate, _F32(1.0), area))

    return Surfaces(
        sx=sx, sy=sy, z=sz, inv_z=inv_z, area=area, inv_area=inv_area,
        uv=uv, vc=vc, shade=shade,
        tex_id=faces.tex_id, blend_mode=blend_mode,
        black_transparent=faces.black_transparent,
        editor_alpha=faces.editor_alpha,
        needs_dither=needs_dither,
        has_transparency=has_transparency,
        centroid_z=centroid_z,
        valid=valid,
        key_possible=faces.key_possible,
    )


def draw_order(surfaces: Surfaces, settings: RasterSettings):
    """SORT phase (render.rs:2518-2545) -> (order, is_transparent_pass).

    Returns `order`: (T,) i32 draw sequence (invalid surfaces last) and
    `skip_z_write`: (T,) bool aligned with `order` (True for the transparent
    pass).  Partition is stable; transparent surfaces sort back-to-front by
    centroid z (stable); opaque surfaces sort likewise only in painter's mode.
    """
    t = surfaces.valid & surfaces.has_transparency
    o = surfaces.valid & ~surfaces.has_transparency

    rank = jnp.where(o, 0, jnp.where(t, 1, 2)).astype(_I32)
    neg_z = -surfaces.centroid_z
    if settings.use_zbuffer:
        within = jnp.where(t, neg_z, jnp.zeros_like(neg_z))
    else:
        within = neg_z  # painter's: opaque also back-to-front
    # lexsort: last key is primary; numpy-style stable.
    order = jnp.lexsort((within, rank))
    skip_z = t[order]
    return order.astype(_I32), skip_z

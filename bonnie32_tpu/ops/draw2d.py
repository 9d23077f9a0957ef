"""2D framebuffer drawing: clears, rects, circles, lines (plain/alpha/
thick), and the clipped 3D grid/line helpers the editors draw overlays with.

Reference behavior: Framebuffer methods in
`/root/reference/src/rasterizer/render.rs` (clear :36, clear_gradient :60,
draw_circle :631, set_pixel_alpha :646, draw_circle_alpha :670,
draw_line_alpha :684, draw_thick_line :875, draw_rect :941,
draw_filled_rect :954) and `/root/reference/src/rasterizer/draw.rs`
(draw_3d_line_clipped :12, draw_floor_grid :81, create_test_cube :138).

TPU design: per-pixel loops become full-frame masks; multi-segment opaque
single-color draws batch through the closed-form Bresenham scatter from
ops/wireframe.py (order-independent for one color); alpha lines scan
sequentially because overlapping alpha writes compose.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import NEAR_PLANE
from ..types import CameraArrays, FrameBuffers
from .color import pack_rgba8, unpack_rgba8
from .wireframe import line_pixels, _pack_rgb
from .picking import world_to_screen

_F32 = jnp.float32
_I32 = jnp.int32
F32_MAX = jnp.float32(3.4028235e38)


def _grid(fb: FrameBuffers):
    h, w = fb.color.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=_I32),
                          jnp.arange(w, dtype=_I32), indexing="ij")
    return xs, ys


def _full(fb: FrameBuffers, word) -> jnp.ndarray:
    return jnp.full_like(fb.color, jnp.int32(word))


def clear(fb: FrameBuffers, rgb: Tuple[int, int, int],
          alpha: int = 255) -> FrameBuffers:
    """render.rs:36 — solid color + depth reset."""
    word = _pack_rgb(rgb) if alpha == 255 else \
        (rgb[0] | (rgb[1] << 8) | (rgb[2] << 16) | (alpha << 24))
    return FrameBuffers(color=_full(fb, word),
                        depth=jnp.full_like(fb.depth, F32_MAX))


def clear_transparent(fb: FrameBuffers) -> FrameBuffers:
    """render.rs:48."""
    return FrameBuffers(color=jnp.zeros_like(fb.color),
                        depth=jnp.full_like(fb.depth, F32_MAX))


def clear_gradient(fb: FrameBuffers, top: Tuple[int, int, int],
                   bottom: Tuple[int, int, int]) -> FrameBuffers:
    """render.rs:60 — vertical lerp, truncating casts (Color::lerp)."""
    h, w = fb.color.shape
    t = (jnp.arange(h, dtype=_F32) / _F32(max(h - 1, 1)))[:, None]
    top_a = jnp.asarray(top, _F32)
    bot_a = jnp.asarray(bottom, _F32)
    rgb = jnp.trunc(top_a[None, None] * (1.0 - t)[..., None]
                    + bot_a[None, None] * t[..., None]).astype(_I32)
    rgb = jnp.broadcast_to(rgb, (h, w, 3))
    color = pack_rgba8(rgb[..., 0], rgb[..., 1], rgb[..., 2],
                       jnp.full((h, w), 255, _I32))
    return FrameBuffers(color=color, depth=jnp.full_like(fb.depth, F32_MAX))


def _alpha_blend_words(back_words, rgb: Tuple[int, int, int], alpha):
    """set_pixel_alpha (render.rs:646) — integer blend, result alpha 255."""
    br, bg, bb, _ = unpack_rgba8(back_words)
    a = jnp.asarray(alpha, _I32)
    inv = 255 - a
    r = (rgb[0] * a + br * inv) // 255
    g = (rgb[1] * a + bg * inv) // 255
    b = (rgb[2] * a + bb * inv) // 255
    return pack_rgba8(r, g, b, jnp.full_like(r, 255))


def draw_filled_rect(fb: FrameBuffers, x0: int, y0: int, x1: int, y1: int,
                     rgb, alpha: int = 255) -> FrameBuffers:
    """render.rs:954 (plus the alpha variant used by selection overlays)."""
    xs, ys = _grid(fb)
    lo_x, hi_x = jnp.minimum(x0, x1), jnp.maximum(x0, x1)
    lo_y, hi_y = jnp.minimum(y0, y1), jnp.maximum(y0, y1)
    inside = (xs >= lo_x) & (xs <= hi_x) & (ys >= lo_y) & (ys <= hi_y)
    if alpha == 255:
        color = jnp.where(inside, _full(fb, _pack_rgb(tuple(rgb))), fb.color)
    else:
        color = jnp.where(inside, _alpha_blend_words(fb.color, rgb, alpha),
                          fb.color)
    return FrameBuffers(color=color, depth=fb.depth)


def draw_filled_triangle(fb: FrameBuffers, x0, y0, x1, y1, x2, y2, rgb,
                         alpha: int = 255, clip=None) -> FrameBuffers:
    """2D UI triangle fill (macroquad draw_triangle as used by
    grid_view.rs sector fills).  Winding-agnostic edge-function test at
    pixel centers; optional (x0, y0, x1, y1) scissor rect."""
    xs, ys = _grid(fb)
    px = xs.astype(_F32) + 0.5
    py = ys.astype(_F32) + 0.5
    ax, ay, bx, by, cx, cy = [jnp.asarray(v, _F32)
                              for v in (x0, y0, x1, y1, x2, y2)]
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    sgn = jnp.where(area < 0.0, _F32(-1.0), _F32(1.0))
    e0 = ((bx - ax) * (py - ay) - (by - ay) * (px - ax)) * sgn
    e1 = ((cx - bx) * (py - by) - (cy - by) * (px - bx)) * sgn
    e2 = ((ax - cx) * (py - cy) - (ay - cy) * (px - cx)) * sgn
    inside = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
    inside &= jnp.abs(area) > 1e-6
    if clip is not None:
        cl, ct, cr, cb = clip
        inside &= ((xs >= int(cl)) & (xs < int(cr))
                   & (ys >= int(ct)) & (ys < int(cb)))
    if alpha >= 255:
        color = jnp.where(inside, _full(fb, _pack_rgb(tuple(rgb))), fb.color)
    else:
        color = jnp.where(inside, _alpha_blend_words(fb.color, rgb, alpha),
                          fb.color)
    return FrameBuffers(color=color, depth=fb.depth)


def draw_filled_triangle_scanline(fb: FrameBuffers, p0, p1, p2,
                                  rgb) -> FrameBuffers:
    """Gizmo triangle fill (editor/viewport_3d.rs:6295-6356
    draw_filled_triangle_3d): y-sorted scanline fill over integer screen
    coordinates, intentionally NOT z-tested ("ignore z, we don't z-test
    gizmos").  Per-row ax/bx use the reference's alpha/beta edge
    interpolation and `as i32` truncation, vectorized over rows."""
    pts = sorted([(int(p0[0]), int(p0[1])), (int(p1[0]), int(p1[1])),
                  (int(p2[0]), int(p2[1]))], key=lambda p: p[1])
    (x0, y0), (x1, y1), (x2, y2) = pts
    if y2 == y0:
        return fb
    xs, ys = _grid(fb)
    height, width = fb.color.shape
    yv = jnp.arange(height, dtype=_F32)
    total = _F32(y2 - y0)
    second = (yv > _F32(y1)) if y1 != y0 else jnp.ones(height, bool)
    seg = jnp.where(second, _F32(y2 - y1), _F32(y1 - y0))
    safe_seg = jnp.where(seg == 0.0, _F32(1.0), seg)
    alpha_t = (yv - _F32(y0)) / total
    beta = jnp.where(second, yv - _F32(y1), yv - _F32(y0)) / safe_seg
    ax = _F32(x0) + _F32(x2 - x0) * alpha_t
    bx = jnp.where(second, _F32(x1) + _F32(x2 - x1) * beta,
                   _F32(x0) + _F32(x1 - x0) * beta)
    lo = jnp.minimum(ax, bx)
    hi = jnp.maximum(ax, bx)
    x_start = jnp.maximum(jnp.trunc(lo).astype(_I32), 0)
    x_end = jnp.minimum(jnp.trunc(hi).astype(_I32), width - 1)
    row_ok = ((yv >= _F32(max(y0, 0))) & (yv <= _F32(min(y2, height - 1)))
              & (seg != 0.0))
    inside = (row_ok[:, None] & (xs >= x_start[:, None])
              & (xs <= x_end[:, None]))
    color = jnp.where(inside, _full(fb, _pack_rgb(tuple(rgb))), fb.color)
    return FrameBuffers(color=color, depth=fb.depth)


def draw_rect(fb: FrameBuffers, x0: int, y0: int, x1: int, y1: int,
              rgb) -> FrameBuffers:
    """render.rs:941 — outline (four axis-aligned 1px edges)."""
    xs, ys = _grid(fb)
    lo_x, hi_x = jnp.minimum(x0, x1), jnp.maximum(x0, x1)
    lo_y, hi_y = jnp.minimum(y0, y1), jnp.maximum(y0, y1)
    in_box = (xs >= lo_x) & (xs <= hi_x) & (ys >= lo_y) & (ys <= hi_y)
    on_edge = in_box & ((xs == lo_x) | (xs == hi_x)
                        | (ys == lo_y) | (ys == hi_y))
    color = jnp.where(on_edge, _full(fb, _pack_rgb(tuple(rgb))), fb.color)
    return FrameBuffers(color=color, depth=fb.depth)


def _clip_mask(xs, ys, clip):
    """AND-mask for an optional (x0, y0, x1, y1) scissor rect."""
    cl, ct, cr, cb = clip
    return ((xs >= int(cl)) & (xs < int(cr))
            & (ys >= int(ct)) & (ys < int(cb)))


def draw_circle_outline(fb: FrameBuffers, cx, cy, radius, rgb,
                        thickness: int = 1, clip=None) -> FrameBuffers:
    """draw_circle_lines — a ring: r-thickness < dist <= r."""
    xs, ys = _grid(fb)
    dx = xs - jnp.asarray(cx, _I32)
    dy = ys - jnp.asarray(cy, _I32)
    d2 = dx * dx + dy * dy
    r = jnp.asarray(radius, _I32)
    inner = jnp.maximum(r - jnp.asarray(thickness, _I32), 0)
    on_ring = (d2 <= r * r) & (d2 > inner * inner)
    if clip is not None:
        on_ring &= _clip_mask(xs, ys, clip)
    color = jnp.where(on_ring, _full(fb, _pack_rgb(tuple(rgb))), fb.color)
    return FrameBuffers(color=color, depth=fb.depth)


def draw_circle(fb: FrameBuffers, cx, cy, radius, rgb,
                alpha=None, clip=None) -> FrameBuffers:
    """render.rs:631 / draw_circle_alpha :670 — dx^2+dy^2 <= r^2 fill."""
    xs, ys = _grid(fb)
    dx = xs - jnp.asarray(cx, _I32)
    dy = ys - jnp.asarray(cy, _I32)
    inside = dx * dx + dy * dy <= jnp.asarray(radius, _I32) ** 2
    if clip is not None:
        inside &= _clip_mask(xs, ys, clip)
    if alpha is None:
        color = jnp.where(inside, _full(fb, _pack_rgb(tuple(rgb))), fb.color)
    else:
        color = jnp.where(inside, _alpha_blend_words(fb.color, rgb, alpha),
                          fb.color)
    return FrameBuffers(color=color, depth=fb.depth)


def draw_thick_line(fb: FrameBuffers, x0, y0, x1, y1, thickness: int,
                    rgb) -> FrameBuffers:
    """render.rs:875 — convex-quad fill with half-thickness perpendicular
    offsets; pixel centers at +0.5."""
    if thickness <= 1:
        return draw_lines(fb, jnp.asarray([[x0, x1]], _I32),
                          jnp.asarray([[y0, y1]], _I32), rgb)
    x0f, y0f, x1f, y1f = [jnp.asarray(v, _F32) for v in (x0, y0, x1, y1)]
    dx = x1f - x0f
    dy = y1f - y0f
    ln = jnp.sqrt(dx * dx + dy * dy)
    degenerate = ln < 0.001
    ln = jnp.where(degenerate, _F32(1.0), ln)
    half = _F32(thickness * 0.5)
    px = -dy / ln * half
    py = dx / ln * half
    corners = jnp.stack([
        jnp.stack([x0f + px, y0f + py]),
        jnp.stack([x0f - px, y0f - py]),
        jnp.stack([x1f - px, y1f - py]),
        jnp.stack([x1f + px, y1f + py])])          # (4, 2)
    xs, ys = _grid(fb)
    pxc = xs.astype(_F32) + 0.5
    pyc = ys.astype(_F32) + 0.5
    inside = jnp.ones(fb.color.shape, bool)
    for i in range(4):
        a = corners[i]
        b = corners[(i + 1) % 4]
        cross = ((b[0] - a[0]) * (pyc - a[1]) - (b[1] - a[1]) * (pxc - a[0]))
        inside &= cross >= 0.0
    inside &= ~degenerate
    color = jnp.where(inside, _full(fb, _pack_rgb(tuple(rgb))), fb.color)
    return FrameBuffers(color=color, depth=fb.depth)


def draw_lines(fb: FrameBuffers, ex, ey, rgb, valid=None,
               max_steps: int = 384) -> FrameBuffers:
    """Batched opaque Bresenham lines, one color (render.rs:715 per line).

    ex/ey: (E, 2) i32 endpoints.  Single color means overlapping writes are
    order-independent, so all lines scatter at once.
    """
    height, width = fb.color.shape
    ex = jnp.asarray(ex, _I32)
    ey = jnp.asarray(ey, _I32)
    xs, ys, _, ok = jax.vmap(
        lambda a, b, c, d: line_pixels(a, b, c, d, width, height, max_steps)
    )(ex[:, 0], ey[:, 0], ex[:, 1], ey[:, 1])
    if valid is not None:
        ok &= jnp.asarray(valid, bool)[:, None]
    ok &= (xs >= 0) & (xs < width) & (ys >= 0) & (ys < height)
    xs = xs.reshape(-1)
    ys = jnp.where(ok, ys, height).reshape(-1)
    color = fb.color.at[ys, xs].set(jnp.int32(_pack_rgb(tuple(rgb))),
                                    mode="drop")
    return FrameBuffers(color=color, depth=fb.depth)


def draw_lines_alpha(fb: FrameBuffers, ex, ey, rgb, alpha, valid=None,
                     max_steps: int = 384) -> FrameBuffers:
    """Sequential alpha-blended lines (render.rs:684).  Lines compose with
    whatever is already drawn, including earlier lines in this batch, so the
    scan is genuinely sequential; a single line never revisits a pixel, so
    each step blends exactly once."""
    height, width = fb.color.shape
    ex = jnp.asarray(ex, _I32)
    ey = jnp.asarray(ey, _I32)
    v = (jnp.ones(ex.shape[0], bool) if valid is None
         else jnp.asarray(valid, bool))

    def body(color, args):
        x0, y0, x1, y1, ok_line = args
        xs, ys, _, ok = line_pixels(x0, y0, x1, y1, width, height, max_steps)
        ok &= ok_line & (xs >= 0) & (xs < width) & (ys >= 0) & (ys < height)
        safe_x = jnp.where(ok, xs, 0)
        safe_y = jnp.where(ok, ys, 0)
        back = color[safe_y, safe_x]
        blended = _alpha_blend_words(back, rgb, alpha)
        color = color.at[jnp.where(ok, ys, height), safe_x].set(
            blended, mode="drop")
        return color, None

    color, _ = jax.lax.scan(body, fb.color,
                            (ex[:, 0], ey[:, 0], ex[:, 1], ey[:, 1], v))
    return FrameBuffers(color=color, depth=fb.depth)


DEPTH_BIAS_3D_ALPHA = 0.995  # render.rs:827


def draw_lines_3d_alpha(fb: FrameBuffers, ex, ey, ez, rgb, alpha,
                        valid=None, depth_mode: str = "harmonic",
                        max_steps: int = 384) -> FrameBuffers:
    """Depth-tested alpha-blended 3D lines (render.rs:822): endpoint z
    scaled by 0.995 to out-bias co-planar geometry, `<=` depth test, no
    depth write; sequential because overlapping alpha writes compose."""
    height, width = fb.color.shape
    ex = jnp.asarray(ex, _I32)
    ey = jnp.asarray(ey, _I32)
    ez = jnp.asarray(ez, _F32) * _F32(DEPTH_BIAS_3D_ALPHA)
    v = (jnp.ones(ex.shape[0], bool) if valid is None
         else jnp.asarray(valid, bool))

    def body(color, args):
        x0, y0, x1, y1, z0, z1, ok_line = args
        xs, ys, t, ok = line_pixels(x0, y0, x1, y1, width, height, max_steps)
        z = z0 + t * (z1 - z0)
        ok &= ok_line & (xs >= 0) & (xs < width) & (ys >= 0) & (ys < height)
        safe_x = jnp.where(ok, xs, 0)
        safe_y = jnp.where(ok, ys, 0)
        buf = fb.depth[safe_y, safe_x]
        if depth_mode == "harmonic":
            ok &= z <= buf
        else:
            izl = jnp.where(z > 0.0, 1.0 / z, _F32(-jnp.inf))
            ok &= izl >= buf
        back = color[safe_y, safe_x]
        blended = _alpha_blend_words(back, rgb, alpha)
        color = color.at[jnp.where(ok, ys, height), safe_x].set(
            blended, mode="drop")
        return color, None

    color, _ = jax.lax.scan(body, fb.color,
                            (ex[:, 0], ey[:, 0], ex[:, 1], ey[:, 1],
                             ez[:, 0], ez[:, 1], v))
    return FrameBuffers(color=color, depth=fb.depth)


# ---------------------------------------------------------------------------
# 3D overlay helpers (draw.rs)
# ---------------------------------------------------------------------------

def clip_segments_to_screen(p0, p1, camera: CameraArrays, width: int,
                            height: int):
    """draw_3d_line_clipped's transform half (draw.rs:12-67): camera-space
    near clip then world_to_screen; returns ((E,2) sx, sy i32, valid)."""
    p0 = jnp.asarray(p0, _F32)
    p1 = jnp.asarray(p1, _F32)
    basis = camera.basis
    rel0 = p0 - camera.position
    rel1 = p1 - camera.position
    z0 = rel0 @ camera.basis[2]
    z1 = rel1 @ camera.basis[2]
    visible = ~((z0 <= NEAR_PLANE) & (z1 <= NEAR_PLANE))

    denom = jnp.where(jnp.abs(z1 - z0) < 1e-20, _F32(1e-20), z1 - z0)
    t = (_F32(NEAR_PLANE) - z0) / denom
    c0 = jnp.where((z0 <= NEAR_PLANE)[:, None], p0 + t[:, None] * (p1 - p0),
                   p0)
    c1 = jnp.where((z1 <= NEAR_PLANE)[:, None], p0 + t[:, None] * (p1 - p0),
                   p1)

    sx0, sy0, _, ok0 = world_to_screen(c0, camera.position, basis, width,
                                       height)
    sx1, sy1, _, ok1 = world_to_screen(c1, camera.position, basis, width,
                                       height)
    valid = visible & ok0 & ok1
    ex = jnp.stack([jnp.trunc(sx0), jnp.trunc(sx1)], axis=-1).astype(_I32)
    ey = jnp.stack([jnp.trunc(sy0), jnp.trunc(sy1)], axis=-1).astype(_I32)
    return ex, ey, valid


def draw_3d_lines_clipped(fb: FrameBuffers, p0, p1, camera: CameraArrays,
                          rgb) -> FrameBuffers:
    """Batched draw_3d_line_clipped (draw.rs:12), one color per batch."""
    height, width = fb.color.shape
    ex, ey, valid = clip_segments_to_screen(p0, p1, camera, width, height)
    return draw_lines(fb, ex, ey, rgb, valid=valid)


@functools.partial(jax.jit, static_argnames=("y", "spacing", "extent",
                                             "grid_rgb", "x_axis_rgb",
                                             "z_axis_rgb"))
def draw_floor_grid(fb: FrameBuffers, camera: CameraArrays, y: float,
                    spacing: float, extent: float,
                    grid_rgb=(60, 60, 70), x_axis_rgb=(140, 60, 60),
                    z_axis_rgb=(60, 60, 140)) -> FrameBuffers:
    """draw.rs:81 — short segments per cell for near-plane behavior.

    Reference draw order: X-parallel lines (z-axis colored at z=0), then
    Z-parallel (x-axis colored at x=0).  Same-color groups batch; groups
    draw in reference order so crossings resolve identically.
    """
    n = int(extent / spacing)
    lines = jnp.arange(-n, n + 1, dtype=_F32) * _F32(spacing)
    starts = jnp.arange(-n, n, dtype=_F32) * _F32(spacing)
    ll, ss = jnp.meshgrid(lines, starts, indexing="ij")
    ll = ll.reshape(-1)
    ss = ss.reshape(-1)
    se = jnp.minimum(ss + _F32(spacing), _F32(extent))
    yv = jnp.full_like(ll, _F32(y))

    is_axis = jnp.abs(ll) < 0.001
    # X-parallel: from (s, y, l) to (s_end, y, l)
    xp0 = jnp.stack([ss, yv, ll], axis=-1)
    xp1 = jnp.stack([se, yv, ll], axis=-1)
    # Z-parallel: from (l, y, s) to (l, y, s_end)
    zp0 = jnp.stack([ll, yv, ss], axis=-1)
    zp1 = jnp.stack([ll, yv, se], axis=-1)

    height, width = fb.color.shape
    ex_x, ey_x, ok_x = clip_segments_to_screen(xp0, xp1, camera, width,
                                               height)
    ex_z, ey_z, ok_z = clip_segments_to_screen(zp0, zp1, camera, width,
                                               height)
    fb = draw_lines(fb, ex_x, ey_x, grid_rgb, valid=ok_x & ~is_axis)
    fb = draw_lines(fb, ex_x, ey_x, z_axis_rgb, valid=ok_x & is_axis)
    fb = draw_lines(fb, ex_z, ey_z, grid_rgb, valid=ok_z & ~is_axis)
    fb = draw_lines(fb, ex_z, ey_z, x_axis_rgb, valid=ok_z & is_axis)
    return fb


def create_test_cube():
    """draw.rs:138 — 24-vertex neutral-color test cube, 12 tris, texture 0.

    Returns golden-model-format (verts, faces) like
    EditableMesh.to_render_data_textured().
    """
    positions = [
        (-1, -1, 1), (1, -1, 1), (1, 1, 1), (-1, 1, 1),        # front
        (-1, -1, -1), (-1, 1, -1), (1, 1, -1), (1, -1, -1),    # back
        (-1, 1, -1), (-1, 1, 1), (1, 1, 1), (1, 1, -1),        # top
        (-1, -1, -1), (1, -1, -1), (1, -1, 1), (-1, -1, 1),    # bottom
        (1, -1, -1), (1, 1, -1), (1, 1, 1), (1, -1, 1),        # right
        (-1, -1, -1), (-1, -1, 1), (-1, 1, 1), (-1, 1, -1),    # left
    ]
    normals = [(0, 0, 1), (0, 0, -1), (0, 1, 0), (0, -1, 0),
               (1, 0, 0), (-1, 0, 0)]
    uvs = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
    verts = []
    faces = []
    for f in range(6):
        for i in range(4):
            verts.append(dict(pos=tuple(float(c) for c in positions[f * 4 + i]),
                              uv=uvs[i], normal=tuple(float(c) for c in normals[f]),
                              color=(128, 128, 128), color_blend=0))
        b = f * 4
        for (a, c, d) in ((b, b + 1, b + 2), (b, b + 2, b + 3)):
            faces.append(dict(v0=a, v1=c, v2=d, tex_id=0,
                              black_transparent=True, blend_mode=0,
                              editor_alpha=255))
    return verts, faces


def draw_wireframe_cylinder(fb: FrameBuffers, camera: CameraArrays,
                            center, radius: float, height: float,
                            segments: int = 12,
                            rgb=(80, 255, 120),
                            depth_mode: str = "harmonic",
                            depth_test: str = "strict") -> FrameBuffers:
    """Player collision-cylinder debug overlay (game/renderer.rs:984):
    depth-tested bottom/top circles + vertical lines every other segment
    (every segment when <= 8).  Lines never write depth.  depth_test
    "none" gives the editor camera-preview variant
    (editor/layout.rs:6444-6487 draw_preview_wireframe_cylinder, plain
    unclipped lines)."""
    import numpy as np
    from .wireframe import _scatter_lines, _pack_rgb

    center = jnp.asarray(center, _F32)
    ang = jnp.arange(segments, dtype=_F32) / _F32(segments) \
        * _F32(2.0 * np.pi)
    bx = center[0] + _F32(radius) * jnp.cos(ang)
    bz = center[2] + _F32(radius) * jnp.sin(ang)
    bottom = jnp.stack([bx, jnp.full_like(bx, center[1]), bz], axis=-1)
    top = bottom.at[:, 1].add(_F32(height))

    h, w = fb.color.shape
    basis = camera.basis

    def project(pts):
        rel = pts - camera.position
        cam = rel @ basis.T
        cz = cam[:, 2]
        ok = cz >= 0.1
        vs = _F32(min(w, h) / 2.0 * 0.75)
        us = _F32(4.0)
        denom = jnp.where(ok, cz + _F32(5.0), _F32(1.0))
        sx = (cam[:, 0] * us / denom) * vs + _F32(w / 2.0)
        sy = (cam[:, 1] * us / denom) * vs + _F32(h / 2.0)
        return (jnp.trunc(sx).astype(_I32), jnp.trunc(sy).astype(_I32),
                cz, ok)

    bsx, bsy, bz_, bok = project(bottom)
    tsx, tsy, tz_, tok = project(top)
    nxt = (jnp.arange(segments, dtype=_I32) + 1) % segments

    def ring(sx, sy, sz, ok):
        ex = jnp.stack([sx, sx[nxt]], axis=-1)
        ey = jnp.stack([sy, sy[nxt]], axis=-1)
        ez = jnp.stack([sz, sz[nxt]], axis=-1)
        return ex, ey, ez, ok & ok[nxt]

    word = _pack_rgb(tuple(rgb))
    for sx, sy, sz, ok in (ring(bsx, bsy, bz_, bok),
                           ring(tsx, tsy, tz_, tok)):
        fb = _scatter_lines(fb, sx, sy, sz, ok, word, 384, depth_mode,
                            depth_test=depth_test)

    skip = 2 if segments > 8 else 1
    sel = jnp.arange(0, segments, skip, dtype=_I32)
    vex = jnp.stack([bsx[sel], tsx[sel]], axis=-1)
    vey = jnp.stack([bsy[sel], tsy[sel]], axis=-1)
    vez = jnp.stack([bz_[sel], tz_[sel]], axis=-1)
    fb = _scatter_lines(fb, vex, vey, vez, bok[sel] & tok[sel], word, 384,
                        depth_mode, depth_test=depth_test)
    return fb


def draw_text(fb: FrameBuffers, x: int, y: int, s: str, rgb,
              scale: int = 1, clip=None) -> FrameBuffers:
    """Blit a single-line string with the 5x7 bitmap font (ui/font.py)
    at (x, y) top-left.  The coverage mask is host data (text content is
    host state, like the reference's ttf draw calls); the write is one
    clipped dynamic-slice update.  Off-screen text clips."""
    from ..ui import font as font_mod

    mask = font_mod.render_text_mask(s, scale=scale)
    mh, mw = mask.shape
    height, width = fb.color.shape
    x, y = int(x), int(y)
    # host-side clip (text layout is host data, so static is fine)
    cl, ct = (0, 0) if clip is None else (int(clip[0]), int(clip[1]))
    cr, cb = ((width, height) if clip is None
              else (int(clip[2]), int(clip[3])))
    sx0, sy0 = max(x, cl, 0), max(y, ct, 0)
    sx1, sy1 = min(x + mw, cr, width), min(y + mh, cb, height)
    if sx0 >= sx1 or sy0 >= sy1:
        return fb
    sub = jnp.asarray(mask[sy0 - y:sy1 - y, sx0 - x:sx1 - x])
    window = jax.lax.dynamic_slice(fb.color, (sy0, sx0),
                                   (sy1 - sy0, sx1 - sx0))
    painted = jnp.where(sub, jnp.asarray(_pack_rgb(tuple(rgb)),
                                         window.dtype), window)
    color = jax.lax.dynamic_update_slice(fb.color, painted, (sy0, sx0))
    return FrameBuffers(color=color, depth=fb.depth)


def draw_image(fb: FrameBuffers, x: int, y: int, words) -> FrameBuffers:
    """Blit a packed-RGBA8 word image (h, w) at (x, y), clipped — the
    palette/browser thumbnail path (texture_palette.rs thumbnails)."""
    import numpy as np

    words = jnp.asarray(words, fb.color.dtype)
    mh, mw = words.shape
    height, width = fb.color.shape
    x, y = int(x), int(y)
    sx0, sy0 = max(x, 0), max(y, 0)
    sx1, sy1 = min(x + mw, width), min(y + mh, height)
    if sx0 >= sx1 or sy0 >= sy1:
        return fb
    sub = words[sy0 - y:sy1 - y, sx0 - x:sx1 - x]
    color = jax.lax.dynamic_update_slice(fb.color, sub, (sy0, sx0))
    return FrameBuffers(color=color, depth=fb.depth)

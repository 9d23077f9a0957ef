"""Wireframe overlays: batched Bresenham lines with optional depth testing.

The reference draws editor wireframes with a sequential Bresenham walk per
edge (`/root/reference/src/rasterizer/render.rs:684-860`) after collecting
and deduplicating back-face / front-face edges in the cull loop
(render.rs:2368-2513, wireframe phase at render.rs:2573-2633).

TPU design: Bresenham is evaluated in CLOSED FORM per step index instead of
a data-dependent loop — for the reference's error-accumulator variant the
pixel at step k is exactly

    major axis:  p_k = p0 + s*k
    minor axis:  q_k = q0 + s_q * floor((2*k*d_minor + d_major) / (2*d_major))

(verified bit-exact against the loop over 200k random segments), so every
edge becomes a fixed-size (K,) pixel strip computed with pure vector math,
and all strips scatter into the framebuffer at once.  Line pixels never
write depth and each phase uses a single constant color, so overlapping
writes are order-independent — no sequential compositing needed.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import NEAR_PLANE, RasterSettings
from ..types import CameraArrays, FaceArrays, Fog, FrameBuffers, MeshArrays
from .vertex import transform_vertices

_F32 = jnp.float32
_I32 = jnp.int32

# Wireframe palette (render.rs:2599, 2630).
BACKFACE_COLOR = (80, 80, 100)
FRONTFACE_COLOR = (200, 200, 220)


def _ceil_div(a, b):
    return -((-a) // b)


def line_pixels(x0, y0, x1, y1, width: int, height: int, max_steps: int):
    """Closed-form Bresenham strip for one segment.

    Returns (xs, ys, t, valid): (K,) pixel coords, interpolation parameter
    t = step/total_steps (render.rs:783-786), and a mask for steps past the
    segment end.  Matches the reference walk pixel-for-pixel.

    The strip starts at an analytically derived k_start: the largest lower
    bound on the step index from the screen bounds on both axes (both axis
    positions are monotone in k).  Provably-offscreen prefixes are skipped,
    so `max_steps` only needs to cover the on-screen run (<= max(W, H)
    pixels) rather than the full segment, which may extend far offscreen.
    """
    dx = jnp.abs(x1 - x0)
    ady = jnp.abs(y1 - y0)
    sx = jnp.where(x0 < x1, 1, -1).astype(_I32)
    sy = jnp.where(y0 < y1, 1, -1).astype(_I32)
    length = jnp.maximum(dx, ady)

    xmajor = dx >= ady
    dmaj = jnp.maximum(jnp.where(xmajor, dx, ady), 1)
    dmin = jnp.where(xmajor, ady, dx)

    # Lower bounds on k from screen entry on each axis.
    p0 = jnp.where(xmajor, x0, y0)
    plim = jnp.where(xmajor, width, height)
    q0 = jnp.where(xmajor, y0, x0)
    qlim = jnp.where(xmajor, height, width)
    smaj = jnp.where(xmajor, sx, sy)
    smin = jnp.where(xmajor, sy, sx)
    k_lo_major = jnp.where(smaj > 0, -p0, p0 - (plim - 1))
    m_req = jnp.maximum(jnp.where(smin > 0, -q0, q0 - (qlim - 1)), 0)
    # minor_off(k) >= m  <=>  k >= ceil(dmaj*(2m-1) / (2*dmin))
    k_lo_minor = jnp.where(
        m_req == 0, 0,
        jnp.where(dmin > 0,
                  _ceil_div(dmaj * (2 * m_req - 1), jnp.maximum(2 * dmin, 1)),
                  length + 1))
    k_start = jnp.clip(jnp.maximum(k_lo_major, k_lo_minor), 0, length + 1)

    k = k_start + jnp.arange(max_steps, dtype=_I32)
    valid = k <= length

    minor_off = (2 * k * dmin + dmaj) // (2 * dmaj)
    xs = jnp.where(xmajor, x0 + sx * k, x0 + sx * minor_off)
    ys = jnp.where(xmajor, y0 + sy * minor_off, y0 + sy * k)

    # total_steps = dx.max((-dy).max(1)); step == k (render.rs:781-786).
    t = k.astype(_F32) / jnp.maximum(length, 1).astype(_F32)
    return xs, ys, t, valid


def _pack_rgb(rgb: Tuple[int, int, int]) -> int:
    r, g, b = rgb
    word = r | (g << 8) | (b << 16) | (255 << 24)
    return word - (1 << 32) if word >= (1 << 31) else word  # i32 wrap


def _scatter_lines(fb: FrameBuffers, ex, ey, ez, valid_edge, color_word,
                   max_steps: int, depth_mode: str, depth_test: str):
    """Rasterize all edges at once and write passing pixels.

    depth_test: "none" (draw_line, render.rs:715), "strict" (draw_line_3d,
    z < buf) or "equal" (draw_line_3d_overlay, z <= buf).  Depth is never
    written (set_pixel writes color only, render.rs:793-797).
    """
    height, width = fb.color.shape

    xs, ys, t, step_ok = jax.vmap(
        lambda a, b, c, d: line_pixels(a, b, c, d, width, height, max_steps)
    )(ex[:, 0], ey[:, 0], ex[:, 1], ey[:, 1])          # (E, K)

    z = ez[:, 0:1] + t * (ez[:, 1:2] - ez[:, 0:1])      # (E, K) f32

    ok = step_ok & valid_edge[:, None]
    ok &= (xs >= 0) & (xs < width) & (ys >= 0) & (ys < height)

    xs = xs.reshape(-1)
    ys = ys.reshape(-1)
    z = z.reshape(-1)
    ok = ok.reshape(-1)

    if depth_test != "none":
        safe_x = jnp.where(ok, xs, 0)
        safe_y = jnp.where(ok, ys, 0)
        buf = fb.depth[safe_y, safe_x]
        if depth_mode == "harmonic":
            # buffer stores z, smaller = closer (render.rs:795, 800)
            ok &= (z < buf) if depth_test == "strict" else (z <= buf)
        else:
            # "inv": buffer stores 1/z, larger = closer; z OP buf flips.
            # Line z <= 0 can't beat a positive-1/z buffer; init 0 = far.
            izl = jnp.where(z > 0.0, 1.0 / z, _F32(-jnp.inf))
            ok &= (izl > buf) if depth_test == "strict" else (izl >= buf)

    # Out-of-range indices drop; all writes share one color word.
    drop_y = jnp.where(ok, ys, height)
    color = fb.color.at[drop_y, xs].set(jnp.int32(color_word), mode="drop")
    return FrameBuffers(color=color, depth=fb.depth)


def _dedup_mask(ex, ey, valid):
    """First-occurrence mask over screen-coord edge keys (render.rs:2586).

    Edges are orientation-normalized so (a,b) == (b,a); duplicates keep the
    FIRST edge (and therefore its z values).
    """
    a_first = (ex[:, 0] < ex[:, 1]) | ((ex[:, 0] == ex[:, 1])
                                       & (ey[:, 0] < ey[:, 1]))
    kx0 = jnp.where(a_first, ex[:, 0], ex[:, 1])
    ky0 = jnp.where(a_first, ey[:, 0], ey[:, 1])
    kx1 = jnp.where(a_first, ex[:, 1], ex[:, 0])
    ky1 = jnp.where(a_first, ey[:, 1], ey[:, 0])

    same = ((kx0[:, None] == kx0[None, :]) & (ky0[:, None] == ky0[None, :])
            & (kx1[:, None] == kx1[None, :]) & (ky1[:, None] == ky1[None, :]))
    earlier = jnp.tril(jnp.ones_like(same), k=-1)
    dup = jnp.any(same & earlier & valid[None, :], axis=1)
    return valid & ~dup


def _normalize_edge_order(ex, ey, ez, valid):
    """Reference draws the normalized orientation (swapped so the lexically
    smaller endpoint leads, render.rs:2587-2591)."""
    a_first = (ex[:, 0] < ex[:, 1]) | ((ex[:, 0] == ex[:, 1])
                                       & (ey[:, 0] < ey[:, 1]))
    flip = ~a_first
    ex = jnp.where(flip[:, None], ex[:, ::-1], ex)
    ey = jnp.where(flip[:, None], ey[:, ::-1], ey)
    ez = jnp.where(flip[:, None], ez[:, ::-1], ez)
    return ex, ey, ez, valid


def wireframe_edges(mesh: MeshArrays, faces: FaceArrays,
                    camera: CameraArrays, fog: Fog,
                    settings: RasterSettings, width: int, height: int):
    """Collect per-face edges + back/front masks (render.rs:2373-2513).

    Returns (ex (E,2) i32, ey (E,2) i32, ez (E,2) f32, back (E,), front (E,))
    with E = 3*T in face order (edges v1v2, v2v3, v3v1 per face).  Backface
    edges of double-sided faces are excluded: the reference renders
    double-sided parts with backface_cull disabled, which skips the backface
    wireframe phase entirely (scene.rs:134-138).
    """
    tv = transform_vertices(mesh.pos, mesh.normal, camera, settings,
                            width, height)
    vi = faces.vidx
    c_sx = tv.sx[vi]            # (T, 3) f32
    c_sy = tv.sy[vi]
    c_sz = tv.sz[vi]
    cam_z = tv.cam[vi][..., 2]

    if settings.ortho_projection is None:
        near_ok = jnp.all(cam_z > NEAR_PLANE, axis=-1)
    else:
        near_ok = jnp.ones(vi.shape[0], bool)

    signed_area = ((c_sx[:, 1] - c_sx[:, 0]) * (c_sy[:, 2] - c_sy[:, 0])
                   - (c_sx[:, 2] - c_sx[:, 0]) * (c_sy[:, 1] - c_sy[:, 0]))
    is_backface = signed_area <= 0.0

    # Fog only culls whole faces here; fogged colors don't affect lines.
    fog_cull = fog.enabled & jnp.all(cam_z > fog.cull_distance, axis=-1)

    common = faces.valid & near_ok & ~fog_cull
    back_face = common & is_backface & (not settings.xray_mode) & ~faces.double_sided
    front_face = common & ~is_backface

    # v.x as i32 truncates toward zero (Rust float->int cast).
    ix = jnp.clip(jnp.trunc(c_sx), -2**31, 2**31 - 1).astype(_I32)
    iy = jnp.clip(jnp.trunc(c_sy), -2**31, 2**31 - 1).astype(_I32)

    corner_a = jnp.asarray([0, 1, 2], _I32)
    corner_b = jnp.asarray([1, 2, 0], _I32)
    ex = jnp.stack([ix[:, corner_a], ix[:, corner_b]], axis=-1)  # (T,3,2)
    ey = jnp.stack([iy[:, corner_a], iy[:, corner_b]], axis=-1)
    ez = jnp.stack([c_sz[:, corner_a], c_sz[:, corner_b]], axis=-1)

    t = vi.shape[0]
    ex = ex.reshape(t * 3, 2)
    ey = ey.reshape(t * 3, 2)
    ez = ez.reshape(t * 3, 2)
    back = jnp.repeat(back_face, 3)
    front = jnp.repeat(front_face, 3)
    return ex, ey, ez, back, front


def _dedup_mask_grouped(ex, ey, valid, group):
    """Per-GROUP first-occurrence mask (render.rs:2586 scoped to one
    render_mesh_15 call): the reference dedups edges within each mesh draw
    (room / asset part), never across draws, so the flat scene's edges
    carry their draw-group id and only merge within it.

    Sort-based (O(E log E)) instead of _dedup_mask's O(E^2) pairwise
    compare — the flat scene concatenates every group's edges (Cathedral:
    ~6k), where the pairwise mask's (E, E) booleans stop being free.
    Semantics match: among same-(group, normalized key) edges, the FIRST
    valid one survives; invalid edges never block a later valid one."""
    a_first = (ex[:, 0] < ex[:, 1]) | ((ex[:, 0] == ex[:, 1])
                                       & (ey[:, 0] < ey[:, 1]))
    kx0 = jnp.where(a_first, ex[:, 0], ex[:, 1])
    ky0 = jnp.where(a_first, ey[:, 0], ey[:, 1])
    kx1 = jnp.where(a_first, ex[:, 1], ex[:, 0])
    ky1 = jnp.where(a_first, ey[:, 1], ey[:, 0])

    e = ex.shape[0]
    idx = jnp.arange(e, dtype=_I32)
    inval = jnp.where(valid, _I32(0), _I32(1))
    # Stable sort: valid edges lead each (group, key) run in original
    # index order, so "first of run" == reference's first-valid-occurrence.
    g_s, k0_s, k1_s, k2_s, k3_s, inv_s, idx_s = jax.lax.sort(
        (group.astype(_I32), kx0, ky0, kx1, ky1, inval, idx),
        is_stable=True, num_keys=6)
    same_prev = ((g_s[1:] == g_s[:-1]) & (k0_s[1:] == k0_s[:-1])
                 & (k1_s[1:] == k1_s[:-1]) & (k2_s[1:] == k2_s[:-1])
                 & (k3_s[1:] == k3_s[:-1]))
    first = jnp.concatenate([jnp.ones((1,), bool), ~same_prev])
    keep_sorted = first & (inv_s == 0)
    return jnp.zeros(e, bool).at[idx_s].set(keep_sorted)


def wireframe_edges_flat(scene, camera: CameraArrays,
                         settings: RasterSettings, width: int, height: int):
    """wireframe_edges over a FlatScene (models/scene_flat.py): per-face
    fog params instead of one Fog, plus each edge's draw-group id for
    per-mesh dedup scoping.  Corner positions come from the pre-gathered
    compile-time copies (scene.cpos, ORIGINAL winding — the wireframe
    phase reads vertices before the backface corner swap,
    render.rs:2373-2513)."""
    tv = transform_vertices(scene.cpos, scene.cnorm, camera, settings,
                            width, height, with_normals=False)
    c_sx = tv.sx            # (T, 3)
    c_sy = tv.sy
    c_sz = tv.sz
    cam_z = tv.cam[..., 2]
    faces, fog = scene.faces, scene.fog

    if settings.ortho_projection is None:
        near_ok = jnp.all(cam_z > NEAR_PLANE, axis=-1)
    else:
        near_ok = jnp.ones(c_sx.shape[0], bool)

    signed_area = ((c_sx[:, 1] - c_sx[:, 0]) * (c_sy[:, 2] - c_sy[:, 0])
                   - (c_sx[:, 2] - c_sx[:, 0]) * (c_sy[:, 1] - c_sy[:, 0]))
    is_backface = signed_area <= 0.0

    fog_cull = fog.enabled & jnp.all(cam_z > fog.cull_distance[:, None],
                                     axis=-1)

    common = faces.valid & near_ok & ~fog_cull
    back_face = (common & is_backface & (not settings.xray_mode)
                 & ~faces.double_sided)
    front_face = common & ~is_backface

    ix = jnp.clip(jnp.trunc(c_sx), -2**31, 2**31 - 1).astype(_I32)
    iy = jnp.clip(jnp.trunc(c_sy), -2**31, 2**31 - 1).astype(_I32)

    corner_a = jnp.asarray([0, 1, 2], _I32)
    corner_b = jnp.asarray([1, 2, 0], _I32)
    ex = jnp.stack([ix[:, corner_a], ix[:, corner_b]], axis=-1)
    ey = jnp.stack([iy[:, corner_a], iy[:, corner_b]], axis=-1)
    ez = jnp.stack([c_sz[:, corner_a], c_sz[:, corner_b]], axis=-1)

    t = c_sx.shape[0]
    ex = ex.reshape(t * 3, 2)
    ey = ey.reshape(t * 3, 2)
    ez = ez.reshape(t * 3, 2)
    back = jnp.repeat(back_face, 3)
    front = jnp.repeat(front_face, 3)
    group = jnp.repeat(scene.f_group, 3)
    return ex, ey, ez, back, front, group


@functools.partial(jax.jit,
                   static_argnames=("settings", "depth_mode", "max_steps",
                                    "width", "height"))
def render_wireframes_flat(fb: FrameBuffers, scene, cams: CameraArrays,
                           settings: RasterSettings, width: int, height: int,
                           depth_mode: str = "inv",
                           max_steps: int = 384) -> FrameBuffers:
    """Batched WIREFRAME pass over (I, H, W) framebuffers for the flat
    kernel path.  Backface edges depth-test against the kernel's final
    depth plane, which equals the reference's per-room interleave only for
    single-draw-group scenes — kernel_path_ok gates on that; front overlay
    edges are drawn with the solid passes skipped (render.rs:2550), which
    is order-independent (one constant color, no depth interaction) and
    therefore exact for any group count."""
    def one(color, depth, cam):
        fb1 = FrameBuffers(color=color, depth=depth)
        ex, ey, ez, back, front, grp = wireframe_edges_flat(
            scene, cam, settings, width, height)
        if settings.backface_cull and settings.backface_wireframe:
            m = _dedup_mask_grouped(ex, ey, back, grp)
            bx, by, bz, m = _normalize_edge_order(ex, ey, ez, m)
            fb1 = _scatter_lines(fb1, bx, by, bz, m,
                                 _pack_rgb(BACKFACE_COLOR), max_steps,
                                 depth_mode, depth_test="strict")
        if settings.wireframe_overlay:
            m = _dedup_mask_grouped(ex, ey, front, grp)
            fx_, fy_, fz_, m = _normalize_edge_order(ex, ey, ez, m)
            fb1 = _scatter_lines(fb1, fx_, fy_, fz_, m,
                                 _pack_rgb(FRONTFACE_COLOR), max_steps,
                                 depth_mode, depth_test="none")
        return fb1.color, fb1.depth

    color, depth = jax.vmap(one)(fb.color, fb.depth, cams)
    return FrameBuffers(color=color, depth=depth)


@functools.partial(jax.jit,
                   static_argnames=("settings", "depth_mode", "max_steps"))
def render_wireframes(fb: FrameBuffers, mesh: MeshArrays, faces: FaceArrays,
                      camera: CameraArrays, fog: Fog,
                      settings: RasterSettings, depth_mode: str = "harmonic",
                      max_steps: int = 384) -> FrameBuffers:
    """WIREFRAME phase (render.rs:2573-2633): depth-tested back-face edges,
    then untested front-face overlay edges."""
    height, width = fb.color.shape
    ex, ey, ez, back, front = wireframe_edges(mesh, faces, camera, fog,
                                              settings, width, height)

    if settings.backface_cull and settings.backface_wireframe:
        m = _dedup_mask(ex, ey, back)
        bx, by, bz, m = _normalize_edge_order(ex, ey, ez, m)
        fb = _scatter_lines(fb, bx, by, bz, m, _pack_rgb(BACKFACE_COLOR),
                            max_steps, depth_mode, depth_test="strict")

    if settings.wireframe_overlay:
        m = _dedup_mask(ex, ey, front)
        fx_, fy_, fz_, m = _normalize_edge_order(ex, ey, ez, m)
        fb = _scatter_lines(fb, fx_, fy_, fz_, m, _pack_rgb(FRONTFACE_COLOR),
                            max_steps, depth_mode, depth_test="none")
    return fb

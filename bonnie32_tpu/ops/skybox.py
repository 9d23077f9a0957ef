"""Device skybox rendering: sphere background + mountain peaks + stars.

The reference clears the frame by rasterizing a vertex-colored sky sphere
mesh with mountains, then draws star sparkles (`/root/reference/src/
rasterizer/render.rs:81-299`).  TPU equivalents:

  * Sphere: the reference's mesh is itself a discretization of the
    ground-truth sky function `Skybox::sample_at_direction`
    (`world/geometry.rs:400-527`).  The fast path samples that function
    directly: a dense per-direction LUT is built ON THE HOST by the same
    vectorized transcription that colors the mesh vertices
    (models/skybox.py:sample_at_direction), and the device does only an
    integer bin lookup per pixel ray — every emitted color is bit-for-bit
    a `sample_at_direction` value at the pixel's quantized direction.
    (The mesh path Gouraud-interpolates BETWEEN coarse vertex samples of
    the same function, so the two paths agree to within the mesh's own
    discretization error; `exact=True` keeps strict mesh parity.)
  * Mountains: a small chunked last-covering-wins reduction over the peak
    triangles (order-independent replacement for overwrite compositing of
    opaque triangles drawn after the sphere).
  * Stars: LCG positions from the host (models/skybox.py), projected and
    scattered as diamond sparkles (render.rs:149-237).

No depth is written (the skybox is a clear; render.rs clears the z-buffer
separately).
"""

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PROJ_DISTANCE, PROJ_SCALE
from ..types import CameraArrays, FrameBuffers
from . import color as col

_F32 = jnp.float32
_I32 = jnp.int32
TWO_PI = 2.0 * math.pi


class SkyTables(NamedTuple):
    sky_lut: jnp.ndarray       # (LV, LH) i32 packed r|g<<8|b<<16 —
                               # sample_at_direction at bin centers
    mtn_dirs: jnp.ndarray      # (M, 3) f32 unit*scale directions
    mtn_colors: jnp.ndarray    # (M, 3) i32
    mtn_faces: jnp.ndarray     # (MF, 3) i32 (padded; valid mask)
    mtn_valid: jnp.ndarray     # (MF,) bool
    # full generated mesh (sphere then mountains, geometry.rs:529-733) for
    # the exact path that mirrors fb.render_skybox triangle-for-triangle
    all_dirs: jnp.ndarray      # (V, 3) f32 (unit * per-range scale)
    all_colors: jnp.ndarray    # (V, 3) i32
    all_faces: jnp.ndarray     # (F, 3) i32
    all_valid: jnp.ndarray     # (F,) bool
    star_dirs: jnp.ndarray     # (S, 3) f32 unit directions
    star_phase: jnp.ndarray    # (S,) f32 twinkle phase
    star_color: jnp.ndarray    # (3,) i32
    star_size: jnp.ndarray     # () f32
    star_twinkle: jnp.ndarray  # () f32
    stars_enabled: jnp.ndarray  # () bool


def build_sky_tables(skybox, time: float = 0.0, h_segments=48, v_segments=32,
                     mtn_pad=None, lut_h=2048, lut_v=1024) -> SkyTables:
    """Host: models.skybox.Skybox -> device tables.

    The (lut_v, lut_h) direction LUT holds `sample_at_direction` evaluated
    at bin centers with the same host code that colors the mesh vertices,
    so the fast path's sphere colors are true samples of the reference's
    sky function (geometry.rs:400-527) — not an interpolation scheme of
    our own."""
    sdirs_m, colors, sfaces_m = skybox.generate_sphere(time, h_segments,
                                                       v_segments)

    th = (np.arange(lut_h, dtype=np.float64) + 0.5) * (TWO_PI / lut_h)
    ph = (np.arange(lut_v, dtype=np.float64) + 0.5) * (math.pi / lut_v)
    PH, TH = np.meshgrid(ph.astype(np.float32), th.astype(np.float32),
                         indexing="ij")
    lut_rgb = np.clip(skybox.sample_at_direction(TH, PH, time),
                      0, 255).astype(np.int32)
    sky_lut = (lut_rgb[..., 0] | (lut_rgb[..., 1] << 8)
               | (lut_rgb[..., 2] << 16)).astype(np.int32)

    mdirs, mcolors, mfaces = skybox.generate_mountains(time)

    # combined mesh, sphere first then mountains (generate_mesh order,
    # geometry.rs:529-733) for the exact triangle path
    nv_sphere = len(sdirs_m)
    if len(mdirs):
        all_dirs = np.concatenate([sdirs_m, mdirs]).astype(np.float32)
        all_colors = np.concatenate([colors, mcolors]).astype(np.int32)
        all_faces = np.concatenate(
            [sfaces_m, np.asarray(mfaces, np.int32) + nv_sphere])
    else:
        all_dirs = sdirs_m.astype(np.float32)
        all_colors = colors.astype(np.int32)
        all_faces = sfaces_m
    all_valid = np.ones(len(all_faces), bool)
    if mtn_pad is None:
        # size the padded table to the actual peak count: the per-face
        # fori in render_skybox(_layout) costs ~25 full-frame vector ops
        # PER SLOT, so a fixed 128-slot pad made every skybox pay for 128
        # mountain faces regardless (round-5 Dungeon probe)
        mtn_pad = max(-(-len(mfaces) // 8) * 8, 8)
    mf = np.zeros((mtn_pad, 3), np.int32)
    mvalid = np.zeros(mtn_pad, bool)
    n = min(len(mfaces), mtn_pad)
    if n:
        mf[:n] = mfaces[:n]
        mvalid[:n] = True
    if len(mdirs) == 0:
        mdirs = np.zeros((1, 3), np.float32)
        mcolors = np.zeros((1, 3), np.int32)

    # star directions (render.rs:160-181 LCG)
    stars = skybox.stars
    sdirs, sphase = [], []
    state = stars.seed
    def next_rand():
        nonlocal state
        state = (state * 1103515245 + 12345) & 0xFFFFFFFFFFFFFFFF
        return ((state >> 16) & 0xFFFFFFFFFFFF) / 65536.0 % 1.0
    for _ in range(max(stars.count, 1)):
        theta = next_rand() * TWO_PI
        phi = next_rand() * (skybox.horizon * math.pi)
        y = math.cos(phi)
        ring = math.sin(phi)
        sdirs.append((ring * math.cos(theta), y, ring * math.sin(theta)))
        sphase.append(next_rand() * TWO_PI if stars.twinkle_speed > 0 else 0.0)

    return SkyTables(
        sky_lut=jnp.asarray(sky_lut),
        mtn_dirs=jnp.asarray(mdirs),
        mtn_colors=jnp.asarray(mcolors),
        mtn_faces=jnp.asarray(mf),
        mtn_valid=jnp.asarray(mvalid),
        star_dirs=jnp.asarray(np.asarray(sdirs, np.float32)),
        star_phase=jnp.asarray(np.asarray(sphase, np.float32)),
        star_color=jnp.asarray(np.asarray(stars.color, np.int32)),
        star_size=jnp.float32(stars.size),
        star_twinkle=jnp.float32(stars.twinkle_speed),
        stars_enabled=jnp.asarray(bool(stars.enabled)),
        all_dirs=jnp.asarray(all_dirs),
        all_colors=jnp.asarray(all_colors),
        all_faces=jnp.asarray(np.asarray(all_faces, np.int32)),
        all_valid=jnp.asarray(all_valid),
    )


@functools.partial(jax.jit, static_argnames=("height", "width", "parts"))
def render_skybox_layout(sky: SkyTables, camera: CameraArrays,
                         height: int, width: int, time=0.0,
                         parts: str = "lut mtn stars") -> jnp.ndarray:
    """The fast path rendered DIRECTLY in kernel layout space: returns
    (NG*H, 128) packed color words identical (per real pixel) to
    to_layout(render_skybox(fb, ...).color) — same per-pixel math on the
    layout-indexed grid, so the datagen path skips the per-instance
    (H, W) -> layout transpose entirely.  Depth is implicitly the
    cleared inverse-z plane (pass debug="cdepth" to the kernel).

    `parts` gates passes for profiling ("lut mtn stars"; "none" keeps
    only the direction math).  Unknown tokens raise — a typo'd string
    must not silently produce a plausible-but-wrong sky."""
    bad = set(parts.split()) - {"lut", "mtn", "stars", "none"}
    assert not bad, f"render_skybox_layout: unknown parts tokens {bad}"
    ngl = -(-width // 128)
    gh = ngl * height
    rows = jax.lax.broadcasted_iota(_I32, (gh, 128), 0)
    lanes = jax.lax.broadcasted_iota(_I32, (gh, 128), 1)
    yi = jax.lax.rem(rows, jnp.int32(height))
    xi = jax.lax.div(rows, jnp.int32(height)) * 128 + lanes
    lut_v = sky.sky_lut.shape[0]
    lut_h = sky.sky_lut.shape[1]
    time = jnp.asarray(time, _F32)
    vs = _F32((min(width, height) / 2.0) * PROJ_SCALE)

    usq = _F32(PROJ_DISTANCE - 1.0)
    ndc_x = (xi.astype(_F32) + 0.5 - _F32(width / 2.0)) / vs / usq
    ndc_y = (yi.astype(_F32) + 0.5 - _F32(height / 2.0)) / vs / usq
    norm = jnp.sqrt(ndc_x * ndc_x + ndc_y * ndc_y + 1.0)
    cx, cy, cz = ndc_x / norm, ndc_y / norm, 1.0 / norm
    b = camera.basis
    wx = cx * b[0, 0] + cy * b[1, 0] + cz * b[2, 0]
    wy = cx * b[0, 1] + cy * b[1, 1] + cz * b[2, 1]
    wz = cx * b[0, 2] + cy * b[1, 2] + cz * b[2, 2]
    phi = jnp.arccos(jnp.clip(wy, -1.0, 1.0))
    theta = jnp.mod(jnp.arctan2(wz, wx), TWO_PI)
    vbin = jnp.clip((phi * _F32(lut_v / math.pi)).astype(_I32),
                    0, lut_v - 1)
    hbin = jnp.clip((theta * _F32(lut_h / TWO_PI)).astype(_I32),
                    0, lut_h - 1)
    if "lut" in parts:      # `parts` gates passes for profiling only
        word = sky.sky_lut[vbin, hbin]
    else:
        word = vbin * 0
    r = word & 0xFF
    gch = (word >> 8) & 0xFF
    bch = (word >> 16) & 0xFF

    # mountains: same last-covering-wins pass on the layout grid
    mdir = sky.mtn_dirs * _F32(10000.0)
    mcam = jnp.einsum("vk,rk->vr", mdir, camera.basis)
    mvalid_v = mcam[:, 2] > 0.1
    ud = _F32(PROJ_DISTANCE)
    us = _F32(PROJ_DISTANCE - 1.0)
    denom = mcam[:, 2] + ud
    msx = (mcam[:, 0] * us) / denom * vs + _F32(width / 2.0)
    msy = (mcam[:, 1] * us) / denom * vs + _F32(height / 2.0)
    px = xi.astype(_F32) + 0.5
    py = yi.astype(_F32) + 0.5

    def face_body(i, carry):
        r, gc, bc = carry
        f = sky.mtn_faces[i]
        ok = (sky.mtn_valid[i] & mvalid_v[f[0]] & mvalid_v[f[1]]
              & mvalid_v[f[2]])
        x0, x1, x2 = msx[f[0]], msx[f[1]], msx[f[2]]
        y0, y1, y2 = msy[f[0]], msy[f[1]], msy[f[2]]
        signed = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
        ok = ok & (signed < 0.0)
        dnm = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
        ok = ok & (jnp.abs(dnm) >= 0.0001)
        inv = 1.0 / jnp.where(dnm == 0, _F32(1.0), dnm)
        w0 = ((y1 - y2) * (px - x2) + (x2 - x1) * (py - y2)) * inv
        w1 = ((y2 - y0) * (px - x2) + (x0 - x2) * (py - y2)) * inv
        w2 = 1.0 - w0 - w1
        covered = ok & (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0)
        cols = sky.mtn_colors[f].astype(_F32)
        rr = w0 * cols[0, 0] + w1 * cols[1, 0] + w2 * cols[2, 0]
        gg = w0 * cols[0, 1] + w1 * cols[1, 1] + w2 * cols[2, 1]
        bbv = w0 * cols[0, 2] + w1 * cols[1, 2] + w2 * cols[2, 2]
        r = jnp.where(covered,
                      jnp.clip(jnp.trunc(rr), 0, 255).astype(_I32), r)
        gc = jnp.where(covered,
                       jnp.clip(jnp.trunc(gg), 0, 255).astype(_I32), gc)
        bc = jnp.where(covered,
                       jnp.clip(jnp.trunc(bbv), 0, 255).astype(_I32), bc)
        return r, gc, bc

    if "mtn" in parts:
        r, gch, bch = jax.lax.fori_loop(0, sky.mtn_faces.shape[0], face_body,
                                        (r, gch, bch))

    # stars: scatter remapped to layout indices
    scam = jnp.einsum("vk,rk->vr", sky.star_dirs * _F32(10000.0),
                      camera.basis)
    s_ok = scam[:, 2] > 0.1
    sdenom = scam[:, 2] + ud
    ssx = ((scam[:, 0] * us) / sdenom * vs
           + _F32(width / 2.0)).astype(_I32)
    ssy = ((scam[:, 1] * us) / sdenom * vs
           + _F32(height / 2.0)).astype(_I32)
    brightness = jnp.where(
        sky.star_twinkle > 0.0,
        0.5 + 0.5 * jnp.sin(time * sky.star_twinkle + sky.star_phase),
        1.0)
    base = sky.star_color.astype(_F32)
    center_c = jnp.trunc(base[None, :] * brightness[:, None]).astype(_I32)
    s = jnp.maximum(sky.star_size, 1.0).astype(_I32)
    offsets = [((0, 0), 1.0, 1)]
    offsets += [((dx, dy), 0.7, 2) for dx, dy in
                ((-1, 0), (1, 0), (0, -1), (0, 1))]
    offsets += [((dx, dy), 0.4, 3) for dx, dy in
                ((-2, 0), (2, 0), (0, -2), (0, 2))]
    enabled = sky.stars_enabled & ("stars" in parts)
    for (dx, dy), dim, min_size in offsets:
        c = jnp.trunc(center_c.astype(_F32) * _F32(dim)).astype(_I32)
        xs = ssx + dx
        ys = ssy + dy
        ok = (s_ok & enabled & (s >= min_size)
              & (xs >= 0) & (xs < width) & (ys >= 0) & (ys < height))
        xs = jnp.clip(xs, 0, width - 1)
        ys = jnp.clip(ys, 0, height - 1)
        lrow = (xs >> 7) * height + ys
        llane = xs & 127
        r = r.at[lrow, llane].set(jnp.where(ok, c[:, 0], r[lrow, llane]))
        gch = gch.at[lrow, llane].set(
            jnp.where(ok, c[:, 1], gch[lrow, llane]))
        bch = bch.at[lrow, llane].set(
            jnp.where(ok, c[:, 2], bch[lrow, llane]))

    return col.pack_rgba8(r, gch, bch, jnp.full_like(r, 255))


@functools.partial(jax.jit, static_argnames=("exact",))
def render_skybox(fb: FrameBuffers, sky: SkyTables, camera: CameraArrays,
                  time=0.0, exact: bool = False) -> FrameBuffers:
    """fb.render_skybox (render.rs:81-145) + stars (:149-237).

    exact=False (default, the datagen hot path): each pixel ray fetches
    the host-built `sample_at_direction` LUT (see build_sky_tables) — one
    gather, no 3k-triangle loop, every color a true sky-function sample.
    exact=True rasterizes the generated sphere+mountain mesh
    triangle-by-triangle with rasterize_skybox_triangle's semantics
    (render.rs:246-299) for pixel-exact parity (tests/test_skybox.py)."""
    height, width = fb.color.shape
    lut_v = sky.sky_lut.shape[0]
    lut_h = sky.sky_lut.shape[1]
    time = jnp.asarray(time, _F32)

    yi, xi = jnp.meshgrid(jnp.arange(height, dtype=_I32),
                          jnp.arange(width, dtype=_I32), indexing="ij")
    vs = _F32((min(width, height) / 2.0) * PROJ_SCALE)

    if exact:
        # start from the current frame; the mesh triangles cover the sky
        w = fb.color
        r = w & 0xFF
        gch = (w >> 8) & 0xFF
        bch = (w >> 16) & 0xFF
    else:
        # --- per-pixel view ray -> world dir (ray.rs:46 inverse of
        # project(): dx = ndc/us, dz = 1) ---
        usq = _F32(PROJ_DISTANCE - 1.0)
        ndc_x = (xi.astype(_F32) + 0.5 - _F32(width / 2.0)) / vs / usq
        ndc_y = (yi.astype(_F32) + 0.5 - _F32(height / 2.0)) / vs / usq
        norm = jnp.sqrt(ndc_x * ndc_x + ndc_y * ndc_y + 1.0)
        cx, cy, cz = ndc_x / norm, ndc_y / norm, 1.0 / norm
        b = camera.basis
        wx = cx * b[0, 0] + cy * b[1, 0] + cz * b[2, 0]
        wy = cx * b[0, 1] + cy * b[1, 1] + cz * b[2, 1]
        wz = cx * b[0, 2] + cy * b[1, 2] + cz * b[2, 2]

        # --- per-direction LUT fetch: color = sample_at_direction at the
        # pixel's quantized (theta, phi) bin, computed on the host ---
        phi = jnp.arccos(jnp.clip(wy, -1.0, 1.0))
        theta = jnp.mod(jnp.arctan2(wz, wx), TWO_PI)
        vbin = jnp.clip((phi * _F32(lut_v / math.pi)).astype(_I32),
                        0, lut_v - 1)
        hbin = jnp.clip((theta * _F32(lut_h / TWO_PI)).astype(_I32),
                        0, lut_h - 1)
        word = sky.sky_lut[vbin, hbin]
        r = word & 0xFF
        gch = (word >> 8) & 0xFF
        bch = (word >> 16) & 0xFF

    # --- triangle pass: last-covering-wins (render.rs:111-139) ---
    # exact mode walks the FULL generated mesh (sphere + mountains, in
    # order); the fast path only the mountain peaks over the analytic sky
    if exact:
        t_dirs = sky.all_dirs
        t_colors = sky.all_colors
        t_faces = sky.all_faces
        t_valid = sky.all_valid
    else:
        t_dirs = sky.mtn_dirs
        t_colors = sky.mtn_colors
        t_faces = sky.mtn_faces
        t_valid = sky.mtn_valid
    mdir = t_dirs * _F32(10000.0)
    mcam = jnp.einsum("vk,rk->vr", mdir, camera.basis)
    mvalid_v = mcam[:, 2] > 0.1
    ud = _F32(PROJ_DISTANCE)
    us = _F32(PROJ_DISTANCE - 1.0)
    denom = mcam[:, 2] + ud
    sx = (mcam[:, 0] * us) / denom * vs + _F32(width / 2.0)
    sy = (mcam[:, 1] * us) / denom * vs + _F32(height / 2.0)

    fverts = t_faces  # (F, 3)
    n_faces = fverts.shape[0]
    px = xi.astype(_F32) + 0.5
    py = yi.astype(_F32) + 0.5

    def face_body(i, carry):
        r, gc, bc = carry
        f = fverts[i]
        ok = (t_valid[i] & mvalid_v[f[0]] & mvalid_v[f[1]]
              & mvalid_v[f[2]])
        x0, x1, x2 = sx[f[0]], sx[f[1]], sx[f[2]]
        y0, y1, y2 = sy[f[0]], sy[f[1]], sy[f[2]]
        signed = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
        ok = ok & (signed < 0.0)  # inward-facing (render.rs:124)
        dnm = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
        ok = ok & (jnp.abs(dnm) >= 0.0001)
        inv = 1.0 / jnp.where(dnm == 0, _F32(1.0), dnm)
        w0 = ((y1 - y2) * (px - x2) + (x2 - x1) * (py - y2)) * inv
        w1 = ((y2 - y0) * (px - x2) + (x0 - x2) * (py - y2)) * inv
        w2 = 1.0 - w0 - w1
        covered = ok & (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0)
        cols = t_colors[f].astype(_F32)  # (3 corners, 3)
        rr = w0 * cols[0, 0] + w1 * cols[1, 0] + w2 * cols[2, 0]
        gg = w0 * cols[0, 1] + w1 * cols[1, 1] + w2 * cols[2, 1]
        bbv = w0 * cols[0, 2] + w1 * cols[1, 2] + w2 * cols[2, 2]
        r = jnp.where(covered, jnp.clip(jnp.trunc(rr), 0, 255).astype(_I32), r)
        gc = jnp.where(covered, jnp.clip(jnp.trunc(gg), 0, 255).astype(_I32), gc)
        bc = jnp.where(covered, jnp.clip(jnp.trunc(bbv), 0, 255).astype(_I32), bc)
        return r, gc, bc

    r, gch, bch = jax.lax.fori_loop(0, n_faces, face_body, (r, gch, bch))

    # --- stars (render.rs:149-237): diamond sparkles ---
    scam = jnp.einsum("vk,rk->vr", sky.star_dirs * _F32(10000.0), camera.basis)
    s_ok = scam[:, 2] > 0.1
    sdenom = scam[:, 2] + ud
    ssx = ((scam[:, 0] * us) / sdenom * vs + _F32(width / 2.0)).astype(_I32)
    ssy = ((scam[:, 1] * us) / sdenom * vs + _F32(height / 2.0)).astype(_I32)
    brightness = jnp.where(
        sky.star_twinkle > 0.0,
        0.5 + 0.5 * jnp.sin(time * sky.star_twinkle + sky.star_phase),
        1.0)
    base = sky.star_color.astype(_F32)
    # two-stage truncation exactly as the reference: the center color
    # truncates base*brightness to u8 FIRST, then the diamond arms
    # truncate center*0.7 / center*0.4 (render.rs:194-232)
    center_c = jnp.trunc(base[None, :] * brightness[:, None]).astype(_I32)

    def star_color(bright, dim):
        return jnp.trunc(center_c.astype(_F32) * _F32(dim)).astype(_I32)

    s = jnp.maximum(sky.star_size, 1.0).astype(_I32)
    offsets = [((0, 0), 1.0, 1)]
    offsets += [((dx, dy), 0.7, 2) for dx, dy in
                ((-1, 0), (1, 0), (0, -1), (0, 1))]
    offsets += [((dx, dy), 0.4, 3) for dx, dy in
                ((-2, 0), (2, 0), (0, -2), (0, 2))]

    enabled = sky.stars_enabled
    for (dx, dy), dim, min_size in offsets:
        c = star_color(brightness, dim)
        xs = ssx + dx
        ys = ssy + dy
        ok = (s_ok & enabled & (s >= min_size)
              & (xs >= 0) & (xs < width) & (ys >= 0) & (ys < height))
        xs = jnp.clip(xs, 0, width - 1)
        ys = jnp.clip(ys, 0, height - 1)
        r = r.at[ys, xs].set(jnp.where(ok, c[:, 0], r[ys, xs]))
        gch = gch.at[ys, xs].set(jnp.where(ok, c[:, 1], gch[ys, xs]))
        bch = bch.at[ys, xs].set(jnp.where(ok, c[:, 2], bch[ys, xs]))

    word = col.pack_rgba8(r, gch, bch, jnp.full_like(r, 255))
    depth = jnp.zeros_like(fb.depth)  # cleared inverse-z buffer
    return FrameBuffers(color=word, depth=depth)

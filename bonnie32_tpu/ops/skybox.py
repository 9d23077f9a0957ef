"""Device skybox rendering: sphere background + mountain peaks + stars.

The reference clears the frame by rasterizing a vertex-colored sky sphere
mesh with mountains, then draws star sparkles (`/root/reference/src/
rasterizer/render.rs:81-299`).  TPU equivalents:

  * Sphere: the reference's mesh is itself a discretization of the
    ground-truth sky function `Skybox::sample_at_direction`
    (`world/geometry.rs:400-527`).  The fast path evaluates that function
    ANALYTICALLY per pixel ray, in-register on the VPU (_sample_sky — a
    jnp mirror of models/skybox.py:sample_at_direction with every config
    scalar baked in at trace time via StaticSky).  Until round 5 this was
    a host-built 1024x2048 direction LUT + one per-pixel XLA gather; the
    gather was the with-skybox datagen bottleneck (PLAN_PERF fact 3: hot
    paths must not sit on XLA gathers), and the analytic form is MORE
    faithful — it samples the true per-pixel direction instead of a
    quantized bin.  (The mesh path Gouraud-interpolates BETWEEN coarse
    vertex samples of the same function, so fast and mesh paths agree to
    within the mesh's own discretization error; `exact=True` keeps strict
    mesh parity.  Device transcendentals differ from numpy's by ulps, so
    fast-path colors can sit +-1 u8 step from a host evaluation at the
    same direction — tests/test_skybox.py budgets for that.)
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


@jax.tree_util.register_pytree_node_class
class StaticSky:
    """A models.skybox.Skybox carried as a ZERO-LEAF pytree node: the
    config rides the treedef (static, baked into the trace) instead of
    device buffers, so jitted renderers specialize on it — disabled sky
    features cost nothing and every scalar is an immediate.  Equality and
    hashing go through Skybox.freeze() so identical configs share a
    compiled program."""

    def __init__(self, skybox):
        self.skybox = skybox
        self._key = skybox.freeze()

    def tree_flatten(self):
        return (), self

    @classmethod
    def tree_unflatten(cls, aux, children):
        return aux

    def __eq__(self, other):
        return isinstance(other, StaticSky) and self._key == other._key

    def __hash__(self):
        return hash(self._key)


@jax.tree_util.register_pytree_node_class
class SkyKernelStatic:
    """Static descriptor for the IN-KERNEL sky pass (round 5): the sky
    config, generation time, the valid mountain faces with their (static)
    corner colors, and the padded per-instance scalar-table width.  Rides
    SkyTables as a zero-leaf pytree node so jitted renderers (and the
    Pallas kernel builder) specialize on it."""

    def __init__(self, skybox, time, faces, vpad):
        self.skybox = skybox
        self.time = float(time)
        self.faces = faces      # ((i0,i1,i2,(r,g,b),(r,g,b),(r,g,b)), ...)
        self.vpad = int(vpad)
        self._key = (skybox.freeze(), self.time, faces, self.vpad)

    def tree_flatten(self):
        return (), self

    @classmethod
    def tree_unflatten(cls, aux, children):
        return aux

    def __eq__(self, other):
        return (isinstance(other, SkyKernelStatic)
                and self._key == other._key)

    def __hash__(self):
        return hash(self._key)


class SkyTables(NamedTuple):
    cfg: StaticSky             # static Skybox config (zero-leaf pytree)
    kstat: SkyKernelStatic     # in-kernel sky pass descriptor (zero-leaf)
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
                     mtn_pad=None) -> SkyTables:
    """Host: models.skybox.Skybox -> device tables.

    The sphere field needs NO table — the fast path evaluates the sky
    function analytically per pixel (_sample_sky) with the config baked
    in statically; only the mesh (exact path), mountains and stars carry
    device data."""
    sdirs_m, colors, sfaces_m = skybox.generate_sphere(time, h_segments,
                                                       v_segments)

    mdirs, mcolors, mfaces = skybox.generate_mountains(time)

    # static face descriptor for the in-kernel sky pass: vertex ids +
    # corner colors are level constants, so the kernel bakes them as
    # immediates and only the projected vertex positions ride a tiny
    # per-instance scalar table (prep_sky_scal)
    kfaces = tuple(
        (int(f[0]), int(f[1]), int(f[2]),
         tuple(int(c) for c in mcolors[f[0]]),
         tuple(int(c) for c in mcolors[f[1]]),
         tuple(int(c) for c in mcolors[f[2]]))
        for f in mfaces)
    vpad = max(8, -(-max(len(mdirs), len(kfaces), 10) // 8) * 8)
    kstat = SkyKernelStatic(skybox, time, kfaces, vpad)

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
        cfg=StaticSky(skybox),
        kstat=kstat,
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


# ---------------------------------------------------------------------------
# Kernel-safe transcendentals.  Mosaic has no acos/atan2/mod lowerings
# (probed on v5e), so the in-kernel sky pass evaluates them from
# primitives it does have (sqrt, div, mul, select): a 6-term minimax
# arctangent (max error ~1e-5 rad — under 0.003 of one u8 color step on
# the steepest sky gradient, inside the fast path's existing
# device-transcendental budget) with exact quadrant logic.
# ---------------------------------------------------------------------------

def _katan_poly(t):
    """Minimax arctan on |t| <= 1 (Abramowitz-Stegun 4.4.49 class)."""
    r = t * t
    p = _F32(-0.0117212)
    for c in (0.05265332, -0.11643287, 0.19354346, -0.33262347,
              0.99997726):
        p = p * r + _F32(c)
    return t * p


def _katan2(y, x):
    """Full-quadrant atan2 via the octant-reduced minimax arctan."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    den = jnp.maximum(ax, ay)
    t = jnp.minimum(ax, ay) / jnp.where(den == 0, _F32(1.0), den)
    a = _katan_poly(t)
    a = jnp.where(ay > ax, _F32(math.pi / 2) - a, a)
    a = jnp.where(x < 0, _F32(math.pi) - a, a)
    return jnp.where(y < 0, -a, a)


def _kacos(x):
    """arccos on [-1, 1] -> [0, pi] via atan2(sqrt(1-x^2), x)."""
    s = jnp.sqrt(jnp.maximum((_F32(1.0) - x) * (_F32(1.0) + x), _F32(0.0)))
    return _katan2(s, x)


def _kmod2pi(x):
    """jnp.mod(x, 2*pi) without the rem primitive (floor-based)."""
    q = jnp.floor(x * _F32(1.0 / TWO_PI))
    return jnp.clip(x - q * _F32(TWO_PI), _F32(0.0), _F32(TWO_PI))


def _lerp3(a, b, t):
    """Channel lerp with the reference's clamp (a: planes/consts per
    channel; b likewise)."""
    one, zero = _F32(1.0), _F32(0.0)
    t = jnp.clip(t, zero, one)
    return tuple(av * (one - t) + bv * t for av, bv in zip(a, b))


def _const3(c):
    return tuple(_F32(float(x)) for x in c)


def _apply_body(body, color, ang):
    """Sun/moon core + glow onto `color` given the angular distance
    plane `ang` (geometry.rs body branch of sample_at_direction) —
    split out so the kernel path can compute `ang` from a direct dot
    product and gate the whole body per chunk (ang >= 4*size ==> the
    body contributes nothing, exactly)."""
    one, zero = _F32(1.0), _F32(0.0)
    size = _F32(body.size)
    core = jnp.where(ang < size, one - ang / size, zero)
    glow_r = body.size * 4.0
    glow_t = jnp.clip((ang - size)
                      / _F32(max(glow_r - body.size, 1e-9)), zero, one)
    glow = jnp.where((ang >= size) & (ang < _F32(glow_r)),
                     (one - glow_t) ** _F32(body.glow_falloff)
                     * _F32(0.6), zero)
    cored = _lerp3(color, _const3(body.color), core)
    sel = core > zero
    color = tuple(jnp.where(sel, a, c) for a, c in zip(cored, color))
    glowed = _lerp3(color, _const3(body.glow_color), glow)
    sel = glow > zero
    return tuple(jnp.where(sel, a, c) for a, c in zip(glowed, color))


def body_unit_dir(body):
    """Static unit direction of a sun/moon body in the (x, y, z) frame
    where a ray's spherical angles satisfy x = sin(phi)cos(theta),
    y = cos(phi), z = sin(phi)sin(theta) — then the reference's
    cos_dist trig chain (geometry.rs) equals dot(ray, body) exactly."""
    body_phi = math.pi / 2 - body.elevation
    sp, cp = math.sin(body_phi), math.cos(body_phi)
    return (sp * math.cos(body.azimuth), cp, sp * math.sin(body.azimuth))


def _sample_sky(cfg, theta, phi, time, acos=jnp.arccos, body_hook=None):
    """jnp mirror of models.skybox.Skybox.sample_at_direction
    (geometry.rs:400-527), channel-separated so every plane keeps the
    (rows, 128) VPU layout.  `cfg` is the host Skybox dataclass — all its
    scalars are Python constants at trace time, so disabled features
    compile to nothing.  Returns float (r, g, b) planes (unclipped, like
    the host function); callers clip+truncate to u8.

    `body_hook(body, color) -> color`, when given, replaces the sun/moon
    angular-distance evaluation (the kernel path computes the angle from
    a direct dot product against body_unit_dir and gates the whole body
    per chunk — see raster_batch)."""
    one = _F32(1.0)
    zero = _F32(0.0)
    v = phi / _F32(math.pi)
    hz = _F32(cfg.horizon)

    lerp = _lerp3
    const3 = _const3

    if cfg.horizon > 0:
        t_above = v / _F32(max(cfg.horizon, 1e-9))
    else:
        t_above = jnp.zeros_like(v)
    above = lerp(const3(cfg.zenith_color), const3(cfg.horizon_sky_color),
                 t_above)
    if cfg.horizon < 1:
        t_below = (v - hz) / _F32(max(1.0 - cfg.horizon, 1e-9))
    else:
        t_below = jnp.ones_like(v)
    below = lerp(const3(cfg.horizon_ground_color), const3(cfg.nadir_color),
                 t_below)
    is_above = v < hz
    color = tuple(jnp.where(is_above, a, b) for a, b in zip(above, below))

    if cfg.horizontal_tint_enabled and cfg.horizontal_tint_intensity > 0:
        diff = jnp.abs(theta - _F32(cfg.horizontal_tint_direction))
        diff = jnp.where(diff > _F32(math.pi), _F32(TWO_PI) - diff, diff)
        spread = _F32(cfg.horizontal_tint_spread)
        dt = one - diff / spread      # **2 as an explicit square: same
        strength = jnp.where(         # value, no integer_pow primitive
            diff < spread, (dt * dt)  # (Mosaic lowering)
            * _F32(cfg.horizontal_tint_intensity), zero)
        horizon_factor = one - jnp.minimum(jnp.abs(v - hz) / _F32(0.3), one)
        tinted = lerp(color, const3(cfg.horizontal_tint_color),
                      strength * horizon_factor)
        sel = strength > zero
        color = tuple(jnp.where(sel, t, c) for t, c in zip(tinted, color))

    if cfg.horizon_haze.enabled and cfg.horizon_haze.intensity > 0:
        dist = jnp.abs(v - hz)
        ext = _F32(cfg.horizon_haze.extent)
        de = one - dist / ext
        s = jnp.where(dist < ext,
                      (de * de)
                      * _F32(cfg.horizon_haze.intensity), zero)
        hazed = lerp(color, const3(cfg.horizon_haze.color), s)
        sel = s > zero
        color = tuple(jnp.where(sel, h, c) for h, c in zip(hazed, color))

    for body in (cfg.sun, cfg.moon):
        if not body.enabled:
            continue
        if body_hook is not None:
            color = body_hook(body, color)
            continue
        body_phi = math.pi / 2 - body.elevation
        cos_dist = (jnp.sin(phi) * _F32(math.sin(body_phi))
                    * jnp.cos(theta - _F32(body.azimuth))
                    + jnp.cos(phi) * _F32(math.cos(body_phi)))
        ang = acos(jnp.clip(cos_dist, -one, one))
        color = _apply_body(body, color, ang)

    for layer in cfg.cloud_layers:
        if layer is None or layer.opacity <= 0:
            continue
        vmin = layer.height - layer.thickness / 2
        vmax = layer.height + layer.thickness / 2
        inside = (v >= _F32(vmin)) & (v <= _F32(vmax))
        th_s = theta + time * _F32(layer.scroll_speed)
        stretch = 8.0 + layer.wispiness * 16.0
        n1 = jnp.sin(jnp.sin(th_s * _F32(layer.density * 3.0)
                             + _F32(layer.phase)) * _F32(stretch)
                     + v * _F32(50.0))
        n2 = jnp.sin(jnp.sin(th_s * _F32(layer.density * 7.0)
                             + _F32(layer.phase * 2.0))
                     * _F32(stretch * 0.5) + v * _F32(120.0))
        n3 = jnp.sin(jnp.sin(th_s * _F32(layer.density * 13.0)
                             + _F32(layer.phase * 0.7))
                     * _F32(stretch * 0.3) + v * _F32(200.0))
        raw = jnp.clip(n1 * _F32(0.5) + n2 * _F32(0.3) + n3 * _F32(0.2)
                       + _F32(0.5), zero, one)
        threshold = layer.wispiness * 0.5
        frac = jnp.maximum((raw - _F32(threshold))
                           / _F32(max(1.0 - threshold, 1e-9)), zero)
        cval = jnp.where(raw < _F32(threshold), zero, frac ** _F32(0.7))
        dist = jnp.abs(v - _F32(layer.height)) \
            / _F32(max(layer.thickness / 2, 1e-9))
        edge = jnp.clip(one - dist, zero, one)
        s = jnp.where(inside, cval * _F32(layer.opacity) * edge, zero)
        clouded = lerp(color, const3(layer.color), s)
        sel = s > zero
        color = tuple(jnp.where(sel, a, c) for a, c in zip(clouded, color))

    return color


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
    if "lut" in parts:      # `parts` gates passes for profiling only
        rf, gf, bf = _sample_sky(sky.cfg.skybox, theta, phi, time)
        r = jnp.clip(rf, 0.0, 255.0).astype(_I32)
        gch = jnp.clip(gf, 0.0, 255.0).astype(_I32)
        bch = jnp.clip(bf, 0.0, 255.0).astype(_I32)
    else:
        r = jnp.zeros_like(xi)
        gch = jnp.zeros_like(xi)
        bch = jnp.zeros_like(xi)

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
    enabled = sky.stars_enabled & ("stars" in parts)
    for lrow, llane, ok, c in _star_layout_writes(sky, camera, height,
                                                  width, time, enabled):
        r = r.at[lrow, llane].set(jnp.where(ok, c[:, 0], r[lrow, llane]))
        gch = gch.at[lrow, llane].set(
            jnp.where(ok, c[:, 1], gch[lrow, llane]))
        bch = bch.at[lrow, llane].set(
            jnp.where(ok, c[:, 2], bch[lrow, llane]))

    return col.pack_rgba8(r, gch, bch, jnp.full_like(r, 255))


def _star_layout_writes(sky: SkyTables, camera, height, width, time,
                        enabled):
    """Projected star sparkle writes (render.rs:149-237) in layout
    coordinates and draw order: yields (lrow, llane, ok, colors) per
    diamond offset.  Shared by the sky-buffer path
    (render_skybox_layout) and the in-kernel sky's post pass
    (scatter_stars_layout) so both produce identical pixels."""
    ud = _F32(PROJ_DISTANCE)
    us = _F32(PROJ_DISTANCE - 1.0)
    vs = _F32((min(width, height) / 2.0) * PROJ_SCALE)
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
    out = []
    for (dx, dy), dim, min_size in offsets:
        c = jnp.trunc(center_c.astype(_F32) * _F32(dim)).astype(_I32)
        xs = ssx + dx
        ys = ssy + dy
        ok = (s_ok & enabled & (s >= min_size)
              & (xs >= 0) & (xs < width) & (ys >= 0) & (ys < height))
        xs = jnp.clip(xs, 0, width - 1)
        ys = jnp.clip(ys, 0, height - 1)
        out.append(((xs >> 7) * height + ys, xs & 127, ok, c))
    return out


def scatter_stars_layout(colorL, depthL, sky: SkyTables, camera,
                         height: int, width: int, time=0.0):
    """Star pass for the IN-KERNEL sky path: sparkles land on every
    pixel no opaque face won (the depth plane still holds the cleared
    0.0 inverse-z there) — exactly the pixels where the buffer path's
    pre-drawn stars would survive the kernel's background select.
    Requires z-buffer mode and a level with no transparent faces
    (sky_kernel_ok gates): stars sit UNDER transparency in the
    reference draw order (render.rs:149-237 then :2547)."""
    time = jnp.asarray(time, _F32)
    enabled = sky.stars_enabled
    rows, lanes, oks, words = [], [], [], []
    for lrow, llane, ok, c in _star_layout_writes(sky, camera, height,
                                                  width, time, enabled):
        rows.append(lrow)
        lanes.append(llane)
        oks.append(ok)
        words.append(col.pack_rgba8(c[:, 0], c[:, 1], c[:, 2],
                                    jnp.full_like(c[:, 0], 255)))
    # One concatenated depth gather + nine drop-mode scatters (was 9
    # gather+gather+scatter rounds — 24 us/inst at N=256 on v5e; XLA
    # gathers are the known erratic hot-path trap, PLAN_PERF item 3).
    # The scatters stay per diamond offset IN ORDER: later offsets
    # overwrite earlier ones where different stars' sparkles collide,
    # and a single combined scatter resolves such duplicates in
    # unspecified order (measured: 57 wrong pixels on the 160x120
    # parity test — star collisions are birthday-frequent, not rare).
    lrow = jnp.concatenate(rows)
    llane = jnp.concatenate(lanes)
    ok = jnp.concatenate(oks)
    okd = ok & (depthL[lrow, llane] == 0.0)
    nb = rows[0].shape[0]
    # masked-out writes aim PAST the plane (drop mode ignores indices
    # >= size; NEGATIVE indices still wrap, even under mode="drop")
    oob = _I32(colorL.shape[0])
    for i, word in enumerate(words):
        okb = okd[i * nb:(i + 1) * nb]
        colorL = colorL.at[jnp.where(okb, rows[i], oob),
                           lanes[i]].set(word, mode="drop")
    return colorL


def prep_sky_scal(sky: SkyTables, camera, width: int, height: int):
    """Per-instance scalar table for the in-kernel sky pass: (8, vpad)
    f32, SMEM-resident in the kernel.  Rows:

      0: projected mountain-vertex screen x  (per vertex)
      1: projected mountain-vertex screen y  (per vertex)
      2: per-FACE 1/dnm (barycentric denominator reciprocal)
      3: camera basis row-major (cols 0-8) + generation time (col 9)
      4-7: per-FACE conservative screen bbox ymin/ymax/xmin/xmax
           (invalid/culled faces get an empty box, so the kernel's
           per-chunk scalar test skips them)

    The projection mirrors render_skybox_layout's mountain pass
    bit-for-bit (same expressions on the same f32 scalars), so the
    kernel's coverage and colors match the buffer path exactly."""
    ks = sky.kstat
    vs = _F32((min(width, height) / 2.0) * PROJ_SCALE)
    ud = _F32(PROJ_DISTANCE)
    us = _F32(PROJ_DISTANCE - 1.0)
    mdir = sky.mtn_dirs * _F32(10000.0)
    mcam = jnp.einsum("vk,rk->vr", mdir, camera.basis)
    mvalid = mcam[:, 2] > 0.1
    denom = mcam[:, 2] + ud
    msx = (mcam[:, 0] * us) / denom * vs + _F32(width / 2.0)
    msy = (mcam[:, 1] * us) / denom * vs + _F32(height / 2.0)
    nv = msx.shape[0]
    vpad = ks.vpad

    def padv(v, fill=0.0):
        return jnp.pad(v, (0, vpad - v.shape[0]),
                       constant_values=fill)

    brow = jnp.pad(
        jnp.concatenate([camera.basis.astype(_F32).reshape(-1),
                         jnp.asarray([ks.time], _F32)]),
        (0, vpad - 10))

    if ks.faces:
        # per-face rows, vectorized over the static face-index arrays
        # (one fused pass — per-face .at[] updates cost ~50 us/inst
        # under vmap at N=256, round-5 measurement)
        fi = np.asarray([(f[0], f[1], f[2]) for f in ks.faces], np.int32)
        x0, x1, x2 = msx[fi[:, 0]], msx[fi[:, 1]], msx[fi[:, 2]]
        y0, y1, y2 = msy[fi[:, 0]], msy[fi[:, 1]], msy[fi[:, 2]]
        ok = (mvalid[fi[:, 0]] & mvalid[fi[:, 1]] & mvalid[fi[:, 2]])
        signed = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
        ok = ok & (signed < 0.0)
        dnm = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
        ok = ok & (jnp.abs(dnm) >= 0.0001)
        inv = 1.0 / jnp.where(dnm == 0, _F32(1.0), dnm)
        big = _F32(1e9)
        xmin = jnp.minimum(jnp.minimum(x0, x1), x2) - 1.0
        xmax = jnp.maximum(jnp.maximum(x0, x1), x2) + 1.0
        ymin = jnp.minimum(jnp.minimum(y0, y1), y2) - 1.0
        ymax = jnp.maximum(jnp.maximum(y0, y1), y2) + 1.0
        rows = [padv(msx), padv(msy), padv(inv), brow,
                padv(jnp.where(ok, ymin, big)),
                padv(jnp.where(ok, ymax, -big)),
                padv(jnp.where(ok, xmin, big)),
                padv(jnp.where(ok, xmax, -big))]
    else:
        zeros = jnp.zeros((vpad,), _F32)
        rows = [padv(msx), padv(msy), zeros, brow,
                zeros, zeros, zeros, zeros]
    return jnp.stack(rows)


def sky_kernel_ok(sky, static, settings) -> bool:
    """Static routing test for the in-kernel sky pass (phase-2
    background synthesis + star post pass) vs the full sky-buffer path
    (render_skybox_layout -> fb_layout_color)."""
    if sky is None or getattr(sky, "kstat", None) is None:
        return False
    if not settings.use_zbuffer or settings.xray_mode:
        return False
    sb = sky.kstat.skybox
    if (sb.stars.enabled and sb.stars.count > 0
            and len(static.transparent_idx) > 0):
        # stars composite UNDER transparent faces; the post pass runs
        # after the kernel's phase-3 blend, so fall back
        return False
    return True


@functools.partial(jax.jit, static_argnames=("exact",))
def render_skybox(fb: FrameBuffers, sky: SkyTables, camera: CameraArrays,
                  time=0.0, exact: bool = False) -> FrameBuffers:
    """fb.render_skybox (render.rs:81-145) + stars (:149-237).

    exact=False (default, the datagen hot path): each pixel ray evaluates
    the sky function analytically in-register (_sample_sky) — no table,
    no gather, no 3k-triangle loop; every color a true sky-function
    sample at the pixel's exact direction.
    exact=True rasterizes the generated sphere+mountain mesh
    triangle-by-triangle with rasterize_skybox_triangle's semantics
    (render.rs:246-299) for pixel-exact parity (tests/test_skybox.py)."""
    height, width = fb.color.shape
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

        # --- analytic sky: sample_at_direction at the pixel's exact
        # (theta, phi), evaluated in-register with static config ---
        phi = jnp.arccos(jnp.clip(wy, -1.0, 1.0))
        theta = jnp.mod(jnp.arctan2(wz, wx), TWO_PI)
        rf, gf, bf = _sample_sky(sky.cfg.skybox, theta, phi, time)
        r = jnp.clip(rf, 0.0, 255.0).astype(_I32)
        gch = jnp.clip(gf, 0.0, 255.0).astype(_I32)
        bch = jnp.clip(bf, 0.0, 255.0).astype(_I32)

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

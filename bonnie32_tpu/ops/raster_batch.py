"""Batched Pallas rasterizer — one fused TPU kernel per game instance.

This is the north-star kernel (BASELINE.json; the reference's triangle fill
inner loop `/root/reference/src/rasterizer/render.rs:1440-1714` and the
two-pass opaque draw `render.rs:2547-2570`), restructured TPU-first:

  * The framebuffer lives in VMEM for the whole frame, laid out as
    (NG*H, 128) — the 320(/640)-pixel width padded to NG lane-groups of
    128, so every window, gather and store is natively tiled.
  * PHASE 1 (visibility): a sequential loop over COMPACTED candidate faces
    (XLA prepass culls off-screen/backfacing/degenerate faces and compacts
    survivors with an exact one-hot matmul).  Each face touches only its
    clipped bbox: dynamic 8-row windows x its 128-lane groups.  Color
    keying (render.rs:1588-1607) is folded into coverage via per-texture
    key-bit word rows fetched with the Mosaic dynamic-gather unit — this
    replaces round 1's 45 us/face sequential keyed pass (PLAN_PERF.md).
    Sequential face order + strict izi > test == the reference's z-test
    with first-drawn-wins-ties, order-independently.
  * PHASE 2 (resolve): per-pixel winner attributes via lane-gathers over
    the compacted attr table (dynamic group count), texels via an exact
    bf16 one-hot MXU row-fetch (8-bit planes are exact in bf16) + lane
    select, then the full PS1 pixel pipeline (UV wrap, color key fixups,
    5->8 expand, modulate, shade, Bayer dither — render.rs:1563-1661)
    entirely in VMEM.

NOTE: index maps derive zeros from the i32 grid index (i * 0) — under
the package's global x64 mode, literal-0 index maps trace as weak i64 and
Mosaic rejects the emitted `func.return` (this was round 1's "gridded
pallas_call does not compile" blocker, PLAN_PERF.md item 5).

Bit-exact with ops/raster_fast.py (same f32 expressions and order; TPU has
no FMA contraction in either XLA or Mosaic).  Transparent faces are a
STATIC per-level list and composite afterwards through the sequential
masked compositor (ops/raster_ref.py), back-to-front per instance.
"""

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import BlendMode, RasterSettings, ShadingMode
from ..types import FrameBuffers, Surfaces
from . import color as col

_F32 = jnp.float32
_I32 = jnp.int32
_BF16 = jnp.bfloat16

WB = 16           # framebuffer rows per phase-1 window
CH = 48           # layout rows per phase-2 chunk
# WB/CH raised 8/24 -> 16/48 in round 5: the tile sweep measured Cave
# N=128 render 58.3 -> 43.7 us/inst and cube raster-only 61.6k -> 84k+
# ifps — per-iteration scalar/loop overhead dominated over vector work
# at the old sizes (PLAN_PERF round-5 session 2).
KF = 4            # phase-1 faces per loop iteration (scalar-unit ILP;
#                   measured v5e: ~wash on Cave, -3.7 us/inst Cathedral)
SEG_TARGET = 1024  # preferred face-table segment rows: the per-instance
#                    ctrl+fscal SMEM windows are 32 rows x seg x 4 B, and
#                    past ~128 KB they stop double-buffering, exposing the
#                    whole DMA serially (Cathedral t_pad 2176: glue 41.7
#                    us/inst, round-5 session 3).  Levels above the target
#                    stream in segments so the DMA pipelines behind
#                    phase-1 compute.
SEG = 2560        # phase-1 face-table segment (SMEM window cap: each
SMALL_RA = 256  # atlas rows at/below which the direct gather loop wins
# (measured v5e: direct wins at every sample-level size - cube 16 rows
# 60.6->23.7 us/inst, Cave 160 rows 182.6->94.7, Cathedral 192 rows
# 323->254; all bit-exact. The one-hot-matmul path remains for atlases
# past 256 rows and as the 'matfetch' debug reference.)
# SEG: the ctrl/fscal tables are stored COLUMN-MAJOR ((cols, t_pad)) so
# their SMEM windows cost cols x seg x 4 B, not the 512 B/row granule of
# (rows, cols<=16) windows — (16+16) x 2560 x 4 x 2(double-buffer)
# = 655 KB fits the 1 MiB budget, so every sample level (Cathedral
# included, t_pad 2304) runs single-segment; larger levels stream
# SEG-face segments via a second grid dimension.

# attrs column layout (f32). Columns 0-15 also live in SMEM for the
# phase-1 face loop; the full table transposes into attrsT for resolve.
C_V3X, C_V3Y, C_A0, C_B0, C_A1, C_B1, C_IA = 0, 1, 2, 3, 4, 5, 6
C_IZA, C_IZB, C_IZC = 7, 8, 9
C_U0, C_VV0, C_U1, C_VV1, C_U2, C_VV2 = 10, 11, 12, 13, 14, 15
C_VCP0, C_VCP1, C_VCP2 = 16, 17, 18
C_SH = 19                      # 19..27: shade corner-major (r,g,b)x3
C_TID, C_FLAGS = 28, 29
N_COLS = 32

# ctrl column layout (i32, SMEM).
K_XLO, K_XHI, K_YLO, K_YHI, K_YB0, K_NBLK, K_G0, K_NG = 0, 1, 2, 3, 4, 5, 6, 7
K_TID, K_KEY, K_COUNT, K_ORDER = 8, 9, 10, 11
N_CTRL = 16

FLAG_DITHER = 1
FLAG_BT = 2

# transparent-pass (phase 3) table layouts — see prep_transparent
T_FID, T_TID, T_BLEND, T_EA, T_FLAGS, T_VALID = 0, 1, 2, 3, 4, 5
N_TCTRL = 8
N_TFS = 12      # vcp x3 + corner-major shade x9

# blend-mode codes as plain ints (device constants are minted in-kernel;
# comparisons against an i32 scalar stay i32 under x64)
_BM_AVERAGE = int(BlendMode.AVERAGE)
_BM_ADD = int(BlendMode.ADD)
_BM_SUBTRACT = int(BlendMode.SUBTRACT)
_BM_ADD_QUARTER = int(BlendMode.ADD_QUARTER)
_BM_ERASE = int(BlendMode.ERASE)


def seg_plan(t_pad: int, debug: str = ""):
    """(n_segs, seg_rows) for the phase-1 face-table streaming.

    Levels up to min(SEG_TARGET, SEG) rows run single-segment
    (order-indirect tables, in-kernel phase 3 eligible); bigger tables
    split into the fewest 8-row-aligned segments that fit the target so
    their SMEM windows double-buffer.  "sgK" in the debug string forces
    K segments for on-hardware A/B."""
    for tok in debug.split():
        if tok.startswith("sg") and tok[2:].isdigit():
            k = int(tok[2:])
            assert t_pad % k == 0 and (k == 1 or (t_pad // k) % 128 == 0), \
                (t_pad, k)
            return k, t_pad // k
    tgt = min(SEG_TARGET, SEG)
    if t_pad <= tgt:
        return 1, t_pad
    # Mosaic requires SMEM sub-blocks' last dim % 128 == 0, so segments
    # are 128-row aligned; t_pad is always a multiple of 128
    for k in range(-(-t_pad // tgt), t_pad + 1):
        if (t_pad % k == 0 and (t_pad // k) % 128 == 0
                and t_pad // k <= SEG):
            return k, t_pad // k
    return 1, t_pad    # unreachable while t_pad % 128 == 0


def _tile_sizes(debug: str, height: int = 0):
    """Phase-2 chunk rows / phase-1 window rows / phase-1 face unroll,
    overridable from the static debug string ("ch48", "wb16", "fb4") for
    on-hardware tile sweeps.  The DEFAULTS step down when the frame
    height doesn't divide (small test frames, 120-row halves): explicit
    tokens assert instead of degrading silently."""
    ch, wb, kf = CH, WB, KF
    if height:
        while height % ch:
            ch -= 8
        while height % wb:
            wb >>= 1
    for tok in debug.split():
        if tok.startswith("ch") and tok[2:].isdigit():
            ch = int(tok[2:])
        elif tok.startswith("wb") and tok[2:].isdigit():
            wb = int(tok[2:])
        elif tok.startswith("fb") and tok[2:].isdigit():
            kf = int(tok[2:])
    assert ch % 8 == 0 and wb % 8 == 0 and (wb & (wb - 1)) == 0, (ch, wb)
    assert kf >= 1
    return ch, wb, kf


def _lane_take(operand, lane_idx):
    """take_along_axis(operand, idx, axis=1) with i32 indices (Mosaic's
    fast dynamic-gather unit; see ops/gather_pallas.py)."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return jax.lax.gather(
        operand, lane_idx[..., None].astype(_I32), dnums, (1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _wrap01(x):
    """Texture15 UV wrap (pixel.py wrap / types.rs:671-681): fmod into
    [0,1), negatives shifted, NaN -> 0.  x - trunc(x) is IEEE-exact and
    equals fmod(x, 1.0)."""
    r = x - jnp.trunc(x)
    r = jnp.where(r < 0, r + _F32(1.0), r)
    return jnp.where(jnp.isnan(r), _F32(0.0), r)


def _u8_trunc_sat(x):
    """Rust `f32 as u8` (pixel.py u8_trunc_sat)."""
    x = jnp.where(jnp.isnan(x), 0.0, x)
    return jnp.clip(jnp.trunc(x), 0.0, 255.0).astype(_I32)


def _interp3(bc_x, bc_y, bc_z, a0, a1, a2):
    return (bc_x * a0 + bc_y * a1) + bc_z * a2


def _dither_offsets(xi, yi):
    """PS1_DITHER_MATRIX[y & 3][x & 3] in closed form (round 5: the old
    16-way select cost ~33 VPU passes per chunk; this is 8).  The matrix
    factors as row0 = -4 + 4*(x&1) + (x>>1), row-pair shift +6-8*(x&1)
    for odd y, and a 2-column rotation for y&2 — verified against the
    table over the full 8x8 period."""
    xe = (xi + (yi & 2)) & 3
    m0 = _I32(-4) + ((xe & 1) << 2) + (xe >> 1)
    odd = (yi & 1) != 0
    return m0 + jnp.where(odd, _I32(6) - ((xi & 1) << 3), _I32(0))


class BatchPrep(NamedTuple):
    """Per-instance XLA prepass products."""

    count: jnp.ndarray    # (1,) i32 — number of compacted opaque faces
    ctrl: jnp.ndarray     # (N_CTRL, Tp) i32 — column-major for cheap SMEM
    fscal: jnp.ndarray    # (16, Tp) f32 — phase-1 scalar columns
    attrsT: jnp.ndarray   # (N_COLS, G, 128) f32 — resolve table


def prep_instance(surfaces: Surfaces, atlas, settings: RasterSettings,
                  width: int, height: int, t_pad: int,
                  group_id=None, n_segs: int = None) -> BatchPrep:
    """Cull + bbox + compact one instance's surfaces for the kernel.

    Replicates raster_fast's routing: opaque = valid & ~has_transparency;
    keyable needs a texture sample during visibility (render.rs:1588).
    bbox ints follow _edge_setup exactly.

    In painter's mode (use_zbuffer=False) the compacted order is the SORT
    phase's draw order (render.rs:2525-2542): back-to-front by centroid z,
    stable, scoped per draw group (`group_id`, (T,) i32 — rooms then asset
    parts) because the reference sorts within each render_mesh_15 call.
    The kernel then composites by order instead of depth.
    """
    sx, sy = surfaces.sx, surfaces.sy
    v1x, v2x, v3x = sx[:, 0], sx[:, 1], sx[:, 2]
    v1y, v2y, v3y = sy[:, 0], sy[:, 1], sy[:, 2]

    min_xf = jnp.maximum(jnp.minimum(jnp.minimum(v1x, v2x), v3x), 0.0)
    max_xf = jnp.minimum(jnp.maximum(jnp.maximum(v1x, v2x), v3x) + 1.0,
                         _F32(width))
    min_yf = jnp.maximum(jnp.minimum(jnp.minimum(v1y, v2y), v3y), 0.0)
    max_yf = jnp.minimum(jnp.maximum(jnp.maximum(v1y, v2y), v3y) + 1.0,
                         _F32(height))
    x_lo = jnp.trunc(min_xf).astype(_I32)
    x_hi = jnp.maximum(jnp.trunc(max_xf).astype(_I32), 0)
    y_lo = jnp.trunc(min_yf).astype(_I32)
    y_hi = jnp.maximum(jnp.trunc(max_yf).astype(_I32), 0)

    degenerate = jnp.abs(surfaces.area) < 0.00001
    nan_box = jnp.isnan(min_xf) | jnp.isnan(max_xf) | jnp.isnan(min_yf) \
        | jnp.isnan(max_yf)
    opaque = surfaces.valid & ~surfaces.has_transparency
    keep = (opaque & ~degenerate & ~nan_box
            & (x_hi > x_lo) & (y_hi > y_lo))

    safe_tid = jnp.maximum(surfaces.tex_id, 0)
    keyable = ((surfaces.tex_id >= 0) & surfaces.black_transparent
               & atlas.has_black[safe_tid] & surfaces.key_possible)

    yb0 = (y_lo >> 3) << 3
    nblk = (y_hi - yb0 + (WB - 1)) >> 3
    g0 = x_lo >> 7
    ng = ((x_hi - 1) >> 7) - g0 + 1

    a0 = v2y - v3y
    b0 = v3x - v2x
    a1 = v3y - v1y
    b1 = v1x - v3x

    iz = surfaces.inv_z
    uv = surfaces.uv
    vc = surfaces.vc
    vcp = (vc[:, :, 0] + (vc[:, :, 1] << 8) + (vc[:, :, 2] << 16)).astype(_F32)
    sh = surfaces.shade.reshape(sh0 := surfaces.shade.shape[0], 9)
    flags = (jnp.where(surfaces.needs_dither, FLAG_DITHER, 0)
             | jnp.where(surfaces.black_transparent, FLAG_BT, 0))

    attrs = jnp.stack([
        v3x, v3y, a0, b0, a1, b1, surfaces.inv_area,
        iz[:, 0], iz[:, 1], iz[:, 2],
        uv[:, 0, 0], uv[:, 0, 1], uv[:, 1, 0], uv[:, 1, 1],
        uv[:, 2, 0], uv[:, 2, 1],
        vcp[:, 0], vcp[:, 1], vcp[:, 2],
        sh[:, 0], sh[:, 1], sh[:, 2], sh[:, 3], sh[:, 4], sh[:, 5],
        sh[:, 6], sh[:, 7], sh[:, 8],
        surfaces.tex_id.astype(_F32), flags.astype(_F32),
        jnp.zeros_like(v3x), jnp.zeros_like(v3x),
    ], axis=1)  # (T, N_COLS)

    ctrl_i = jnp.stack([
        x_lo, x_hi, y_lo, y_hi, yb0, nblk, g0, ng,
        surfaces.tex_id, jnp.where(keyable, _I32(1), _I32(0)),
    ], axis=1).astype(_I32)  # (T, 10)

    t = attrs.shape[0]
    keep_i = keep.astype(_I32)
    count = jnp.sum(keep_i, dtype=_I32)  # i32: x64 sum would promote -> i64

    def pad_rows(arr):
        if t == t_pad:
            return arr
        fill = jnp.zeros((t_pad - t,) + arr.shape[1:], arr.dtype)
        return jnp.concatenate([arr, fill], axis=0)

    painters = not settings.use_zbuffer
    if n_segs is None:
        n_segs = seg_plan(t_pad)[0]
    if n_segs == 1:
        # ORDER-INDIRECT compaction (round 4): the tables stay in original
        # face order; only a (t_pad,) index column compacts — a stable
        # sort on ~keep lists kept faces first in draw order.  The kernel
        # indirects f -> order[f].  This replaces the exact one-hot
        # einsum, whose (t_pad, T, 42-col) matmul was 123 M MAC/inst at
        # Cathedral scale (prep 61 us/inst, PLAN_PERF round-4).
        if painters:
            # Painter's draw order: per group, back-to-front (-z ascending
            # == z descending), original index breaking ties (stable) —
            # exactly surface.draw_order's opaque ordering per group.
            gid = (group_id.astype(_I32) if group_id is not None
                   else jnp.zeros(t, _I32))
            zkey = jnp.where(keep & ~jnp.isnan(surfaces.centroid_z),
                             -surfaces.centroid_z, _F32(jnp.inf))
            _, _, _, order = jax.lax.sort(
                (1 - keep_i, gid, zkey, jnp.arange(t, dtype=_I32)),
                is_stable=True, num_keys=3)
        else:
            _, order = jax.lax.sort(
                (1 - keep_i, jnp.arange(t, dtype=_I32)),
                is_stable=True, num_keys=1)
        order = pad_rows(order)
        attrs_c = pad_rows(attrs)
        ctrl_c = pad_rows(ctrl_i)
        # Phase 2's attr table in DRAW order (round 5): phase 1 records
        # the winner's draw POSITION, so a screen chunk's winner ids span
        # a narrow room-ordered band instead of arbitrary original ids —
        # Cathedral's per-chunk gather loop walked up to all 17 groups
        # (measured 52 us/inst via 'noattrs'); positions make it 1-2.
        # One XLA row-gather per instance; ctrl/fscal stay in original
        # order because phases 1/3 address rows by original face id.
        attrs_p2 = attrs_c[order]
    else:
        assert not painters, \
            "painter's mode needs a single-segment face table (seg_plan)"
        # Multi-segment levels keep the tables in ORIGINAL order too
        # (round-5 session 4: the global sort-gather compaction of the
        # (t_pad, 32) tables measured 26 us/inst at Cathedral scale —
        # worse than the SMEM serialization it replaced).  Instead the
        # order column is compacted PER SEGMENT (z-buffer draw order ==
        # original-kept order, and segments walk in ascending original
        # order, so the global merge sequence is unchanged), the K_COUNT
        # column carries per-segment kept counts (each segment's SMEM
        # window reads its own), and phase 2's winner ids are ORIGINAL
        # face ids — room-contiguous, so the [gmin, gmax] gather bound
        # stays narrow without any compaction.
        seg_rows = t_pad // n_segs
        attrs_c = pad_rows(attrs)
        ctrl_c = pad_rows(ctrl_i)
        keep_p = pad_rows(keep_i)
        k2 = keep_p.reshape(n_segs, seg_rows)
        loc = jax.lax.broadcasted_iota(_I32, (n_segs, seg_rows), 1)
        _, ord2 = jax.lax.sort((1 - k2, loc), dimension=1,
                               is_stable=True, num_keys=1)
        seg_off = (jnp.arange(n_segs, dtype=_I32) * seg_rows)[:, None]
        order = (ord2 + seg_off).reshape(t_pad)
        seg_counts = jnp.sum(k2, axis=1, dtype=_I32)
        count = jnp.repeat(seg_counts, seg_rows)   # per-row, per-segment
        attrs_p2 = attrs_c   # original order (winner ids = original ids)

    pad_cols = jnp.zeros((t_pad, N_CTRL - ctrl_c.shape[1]), _I32)
    pad_cols = pad_cols.at[:, 0].set(count)   # K_COUNT broadcast per row
    pad_cols = pad_cols.at[:, K_ORDER - ctrl_c.shape[1]].set(order)
    ctrl_c = jnp.concatenate([ctrl_c, pad_cols], axis=1)
    count = jnp.sum(keep_i, dtype=_I32)[None]   # total kept (diagnostic)

    g = t_pad // 128
    attrs_t = attrs_p2.T.reshape(N_COLS, g, 128)
    return BatchPrep(count=count, ctrl=ctrl_c.T, fscal=attrs_c[:, :16].T,
                     attrsT=attrs_t)


class TransPrep(NamedTuple):
    """Per-instance tables for the in-kernel transparent pass (phase 3).

    Both tables are already in composite order (back-to-front by centroid
    z, stable — the same `argsort(-centroid_z)` the sequential compositor
    uses), so the kernel walks columns 0..n_tr-1 directly.  Edge/bbox/UV
    scalars are NOT duplicated here: phase 3 reads them from the ctrl /
    fscal tables at row T_FID (single-segment tables stay in original face
    order, so every face — transparent included — is addressable)."""

    tctrl: jnp.ndarray   # (N_TCTRL, NTp) i32: fid, tid, blend, ea, flags,
    #                      valid (rows T_*)
    tfscal: jnp.ndarray  # (N_TFS, NTp) f32: packed vertex colors x3 +
    #                      corner-major shade x9


def _composite_tables(sub: Surfaces, fids, order) -> TransPrep:
    """Phase-3 tables for a face subset: `fids` are ORIGINAL face ids
    (rows into the single-segment ctrl/fscal tables), `order` the
    composite sequence.  Validity folds in the conditions `_raster_one`
    checks per pixel (valid, ~degenerate) plus NaN-bbox protection (NaN
    coords draw nothing in the sequential path; the kernel's block loop
    needs a sane trip count)."""
    nt = int(fids.shape[0])
    ntp = max(-(-nt // 8) * 8, 8)

    degenerate = jnp.abs(sub.area) < 0.00001
    sx, sy = sub.sx, sub.sy
    mins = jnp.minimum(jnp.minimum(sx[:, 0], sx[:, 1]), sx[:, 2])
    maxs = jnp.maximum(jnp.maximum(sx[:, 0], sx[:, 1]), sx[:, 2])
    miny = jnp.minimum(jnp.minimum(sy[:, 0], sy[:, 1]), sy[:, 2])
    maxy = jnp.maximum(jnp.maximum(sy[:, 0], sy[:, 1]), sy[:, 2])
    nan_box = (jnp.isnan(mins) | jnp.isnan(maxs) | jnp.isnan(miny)
               | jnp.isnan(maxy))
    valid = sub.valid & ~degenerate & ~nan_box

    flags = (jnp.where(sub.needs_dither, FLAG_DITHER, 0)
             | jnp.where(sub.black_transparent, FLAG_BT, 0))
    tctrl = jnp.stack([
        fids, sub.tex_id, sub.blend_mode, sub.editor_alpha,
        flags, valid.astype(_I32),
        jnp.zeros(nt, _I32), jnp.zeros(nt, _I32),
    ], axis=0).astype(_I32)[:, order]

    vc = sub.vc
    vcp = (vc[:, :, 0] + (vc[:, :, 1] << 8)
           + (vc[:, :, 2] << 16)).astype(_F32)       # (nt, 3)
    sh = sub.shade.reshape(nt, 9)
    tfscal = jnp.concatenate([vcp.T, sh.T], axis=0)[:, order]  # (12, nt)

    if ntp > nt:
        tctrl = jnp.pad(tctrl, ((0, 0), (0, ntp - nt)))
        tfscal = jnp.pad(tfscal, ((0, 0), (0, ntp - nt)))
    return TransPrep(tctrl=tctrl, tfscal=tfscal)


def prep_transparent(surfaces: Surfaces, idx_tuple) -> TransPrep:
    """One instance's transparent-face tables for the kernel's phase 3.

    `idx_tuple` is the STATIC per-level transparent-face list
    (FlatSceneStatic.transparent_idx).  Order matches the sequential
    compositor bit-for-bit: back-to-front by centroid z, stable in slot
    order (scene_flat._transparent_pass / render.rs:2525-2542)."""
    idxs = np.asarray(idx_tuple, np.int32)
    sub = jax.tree_util.tree_map(lambda x: x[idxs], surfaces)
    order = jnp.argsort(-sub.centroid_z, stable=True).astype(_I32)
    return _composite_tables(sub, jnp.asarray(idxs), order)


def prep_xray(surfaces: Surfaces, group_id=None,
              use_zbuffer: bool = True) -> TransPrep:
    """All-face composite tables for x-ray mode (render.rs:507-526):
    every face blends 50% onto the frame in draw order with no depth
    interaction, scoped per draw group exactly as the sequential path
    composites one render_mesh_15 call per room/part: within each group,
    opaque faces in index order (back-to-front in painter's mode), then
    transparent faces back-to-front (surface.draw_order /
    render.rs:2518-2545)."""
    t = surfaces.sx.shape[0]
    tr = surfaces.valid & surfaces.has_transparency
    op = surfaces.valid & ~surfaces.has_transparency
    rank = jnp.where(op, 0, jnp.where(tr, 1, 2)).astype(_I32)
    neg_z = -surfaces.centroid_z
    if use_zbuffer:
        within = jnp.where(tr, neg_z, jnp.zeros_like(neg_z))
    else:
        within = neg_z
    gid = (group_id.astype(_I32) if group_id is not None
           else jnp.zeros(t, _I32))
    arange = jnp.arange(t, dtype=_I32)
    order = jnp.lexsort((arange, within, rank, gid)).astype(_I32)
    return _composite_tables(surfaces, arange, order)


def _make_kernel(settings: RasterSettings, width: int, height: int,
                 t_pad: int, n_tex: int, atlas_rows: int, key_wrows: int,
                 debug: str = "", atlas_rows_data: int = 0,
                 tex_enc: tuple = (), clear_color=None, n_tr: int = 0,
                 sky_static=None, bt_const=None, vc_mode=None,
                 tex_wh=None, sh_mode=None):
    """Build the fused visibility+resolve kernel for static config.

    When t_pad > SEG the face table streams through SMEM in SEG-row
    segments over a second grid dimension (the framebuffer output blocks
    revisit across segments, standard accumulator pattern); phase 2 runs
    on the final segment only.

    n_tr > 0 appends PHASE 3: the static transparent-face list composites
    back-to-front inside the kernel (render.rs:2547-2570 transparent pass
    + set_pixel_blended_15, render.rs:479) — ordered bbox-windowed blend
    over the freshly resolved color plane, z-test-no-write against the
    opaque depth.  Requires single-segment tables (phase 3 indexes
    ctrl/fscal by ORIGINAL face id) and affine UVs (the sequential
    compositor's perspective path divides with exact_div, which needs f64
    — unavailable in Mosaic; the caller routes non-affine settings to the
    sequential compositor instead)."""
    ng_total = -(-width // 128)
    gh = ng_total * height
    groups = t_pad // 128
    ch, wb, kf = _tile_sizes(debug, height)
    assert gh % ch == 0 and height % ch == 0, (gh, height, ch)
    assert height % wb == 0, (height, wb)
    n_chunks = gh // ch
    chunks_per_g = height // ch
    # "cdepth": the caller guarantees the incoming depth plane is cleared
    # (0.0 inverse-z — new_framebuffer/"inv" and render_skybox both leave
    # it so), so the kernel skips the fbd DMA and fills the clear value.
    # clear_color: the color plane is ALSO a constant (no-skybox datagen)
    # — skip both DMAs and the host-side broadcast/transpose entirely.
    const_depth = "cdepth" in debug or clear_color is not None
    affine = settings.affine_textures
    shading = settings.shading
    # Painter's mode (use_zbuffer=False, render.rs:2525-2542): faces come
    # pre-sorted back-to-front per group (prep_instance), the merge is
    # pure draw-order overwrite, and the depth plane — used as scratch to
    # carry the winner's 1/z for perspective-correct UV — is restored to
    # its input value in phase 2 (the reference never writes depth here).
    painters = not settings.use_zbuffer
    n_segs, seg_rows = seg_plan(t_pad, debug)
    # Texture-major packed fetch (round 3, PLAN_PERF.md): per-texture
    # pal16/pal4/pack2 planes, whole textures skipped per chunk when no
    # pixel samples them.  Falls back to the round-2 paths under debug
    # flags or when no encodings were compiled.
    tex_major = (bool(tex_enc) and "matfetch" not in debug
                 and "dirfetch" not in debug)
    # Small atlases skip the one-hot-matmul + lane-pick pipeline (both
    # proportional to the 128-lane atlas width) for a per-row gather loop
    # proportional to atlas_rows instead (see PLAN_PERF.md round-3).
    direct_fetch = (not tex_major
                    and ((atlas_rows <= SMALL_RA and "matfetch" not in debug)
                         or "dirfetch" in debug))
    # the gather loop only visits rows that hold real texels (the table
    # is 16-row aligned for bf16 tiling; pad rows can never match trow)
    ra_loop = atlas_rows_data if atlas_rows_data else atlas_rows

    # Phase-1-computed per-chunk texture presence (round 4): each phase-1
    # block marks its face's texture bit for the chunk(s) it touches in a
    # tiny SMEM bitmask table; phase 2 then pl.when-skips whole textures
    # absent from a chunk.  Unlike the round-3 "gate" variant (in-kernel
    # VECTOR reductions per texture per chunk — measured loss), the
    # phase-2 test is a single scalar SMEM read.  "nogate"/"gate" force it
    # off/on for A/B.  The mark is a bbox superset, so skipping is always
    # safe.  Default is face-count adaptive (measured v5e, N per level):
    # Cave t_pad 384 wins 75.7->69.7 us/inst, Cathedral t_pad 2176 LOSES
    # 209.5->218.5 — the two scalar SMEM RMWs per merged block scale with
    # face count while the skipped texel rows per chunk do not.
    track_pres = (tex_major and "nogate" not in debug
                  and (t_pad <= 1024 or "gate" in debug))
    # the phase-1 mark touches only the first and last chunk a wb-row
    # window overlaps; wb > ch would let a window span 3+ chunks and
    # leave middle chunks unmarked (phase 2 would then skip a present
    # texture) — reject the combination (ADVICE r4)
    assert not (track_pres and wb > ch), \
        f"presence gating needs wb <= ch (wb={wb}, ch={ch}); pass 'nogate'"
    pres_words = max((n_tex + 31) >> 5, 1)
    # Phase-1-stored barycentric planes (round 5): merge() writes the
    # winner's (bcx, bcy) into two VMEM planes; phase 2 then reads them
    # back instead of gathering the 7 edge-setup columns (V3X/V3Y/A0/B0/
    # A1/B1/IA) and recomputing — bit-exact because phase 1 evaluates the
    # IDENTICAL expressions on the identical scalars.  Default ON at
    # every scale since round-5 session 4: even at Cathedral face counts
    # the two extra plane RWs per merged block beat the seven extra
    # gather columns (v5e N=64: bc 135.96 vs 138.97 us/inst pre-seg, and
    # the per-segment original-id winners made the gather ranges wider).
    # "nobc" forces off for A/B.
    store_bc = "nobc" not in debug
    # Compile-time flag folding (round 5): needs_dither is settings-only
    # under Gouraud shading (scene_flat.build_surfaces_flat:486 —
    # `dithering & (gouraud | textured | ...)`), and black_transparent is
    # a camera-independent per-level fact the scene compile summarizes as
    # bt_const (True/False when uniform over valid faces, else None).
    # When both fold, the C_FLAGS attr column drops out of the phase-2
    # gather and the flag selects trace away.
    if not settings.dithering:
        ndith_const = False
    elif shading == ShadingMode.GOURAUD:
        ndith_const = True
    else:
        ndith_const = None
    if "dynflags" in debug:            # A/B: force the dynamic flag path
        ndith_const = bt_const = None
    flags_needed = (ndith_const is None) or (bt_const is None)
    # Vertex-color fold (round 5, FlatSceneStatic.vc_mode): "const" drops
    # the three C_VCP* gathers and interpolates compile-time constants;
    # "gray" (and a grayscale const) computes one channel interp and
    # copies it — both bit-exact (identical expressions on identical
    # values).  The attrs gather loop is phase 2's single biggest line
    # (19-22 lane-takes x every winner chunk; the gather unit is
    # output-size-bound, PLAN_PERF fact 4), so dropped columns are pure
    # savings.  "dynvc" forces the dynamic path for A/B.
    if "dynvc" in debug:
        vc_mode = None
    vc_fold = vc_mode is not None and vc_mode[0] == "const"
    vc_gray = vc_mode is not None and (
        vc_mode[0] == "gray"
        or (vc_fold and (vc_mode[1] & 255) == ((vc_mode[1] >> 8) & 255)
            == ((vc_mode[1] >> 16) & 255)))
    # Texture-size fold (FlatSceneStatic.tex_wh): uniform atlas w/h folds
    # the per-pixel tw/th texmeta gathers to constants.  "dyntw" for A/B.
    if "dyntw" in debug:
        tex_wh = None
    # Shade fold (FlatSceneStatic.sh_mode): without point lights the
    # shade tables are orientation-independent and corner-uniform, so the
    # 9 Gouraud gather columns drop to 0 ("const"), 1 ("pfgray") or 3
    # ("pf") — identical interpolation expressions on identical values.
    # "dynsh" forces the dynamic path for A/B.
    if "dynsh" in debug:
        sh_mode = None

    if n_tr:
        assert n_segs == 1, "phase 3 needs single-segment (original-order)" \
            " face tables"
        assert affine, "phase 3 is affine-only (exact_div needs f64)"
        assert tex_enc, "phase 3 fetches texels via the packed encodings"
        assert wb <= ch, "phase 3 reuses the (ch,128) texel scratch per " \
            f"(wb,128) window (wb={wb}, ch={ch})"

    # In-kernel sky (round 5): with sky_static (ops.skybox.SkyKernelStatic)
    # the background is SYNTHESIZED per chunk — the analytic sky function
    # plus the static mountain faces — instead of DMA'd from a
    # pre-rendered (gh, 128) buffer per instance; chunks every opaque
    # face covered skip it entirely (a scalar test), so indoor scenes
    # stop paying for the sky at all.  Stars are a post pass
    # (ops.skybox.scatter_stars_layout; sky_kernel_ok gates the combos
    # where that ordering is exact).  Ref: render.rs:81-299.
    sky_mode = sky_static is not None
    sky_bodies = sky_mode and (sky_static.skybox.sun.enabled
                               or sky_static.skybox.moon.enabled)
    if sky_mode:
        assert const_depth, "in-kernel sky implies a cleared depth plane" \
            " (pass debug='cdepth')"
        assert clear_color is None

    def kernel(*refs):
        (ctrl_ref, fscal_ref, attrsT_ref, keyrows_ref,
         texmeta_ref, texmeta_v_ref, texlo_ref, texhi_ref,
         texpack_ref, texpal_ref, fbc_ref, fbd_ref) = refs[:12]
        pos = 12
        if sky_mode:
            skyscal_ref = refs[pos]
            pos += 1
        if n_tr:
            tctrl_ref, tfscal_ref = refs[pos:pos + 2]
            pos += 2
        color_ref, depth_ref, idx_scr, tex_scr, pres_scr = refs[pos:pos + 5]
        pos += 5
        if store_bc:
            bcx_scr, bcy_scr = refs[pos:pos + 2]
            pos += 2
        if sky_mode:
            sky_scr = refs[pos]
            pos += 1
            if sky_bodies:
                skyrgb_scr = refs[pos]
                pos += 1
        count = ctrl_ref[0, K_COUNT, 0]
        if n_segs == 1:
            seg_id = jnp.int32(0)
        else:
            seg_id = pl.program_id(1)
        seg_base = seg_id * seg_rows

        def fetch_packed(e, rel):
            """Texture-major packed texel fetch (shape follows `rel`):
            per-texture pal16/pal4/pack2 rows + palette pick.  Exact
            integer bit surgery — bit-identical to atlas.data[flat]."""
            shp = rel.shape
            mode, row0, nrows = e[0], e[1], e[2]
            lg = {"pal16": 3, "pal4": 2, "pack2": 1}[mode]
            widx = rel >> lg
            wrow = widx >> 7
            wlane = widx & 127
            word = jnp.zeros(shp, _I32)
            for rr in range(nrows):
                rowv = jnp.broadcast_to(
                    texpack_ref[row0 + rr, :][None, :], shp)
                vals = _lane_take(rowv, wlane)
                word = jnp.where(wrow == rr, vals, word)
            sub = rel & ((1 << lg) - 1)
            shift = sub << (5 - lg)
            mask = _I32((1 << (32 >> lg)) - 1)
            piece = jax.lax.shift_right_logical(word, shift) & mask
            if mode == "pack2":
                return piece
            p0, prows = e[3], e[4]
            plane = piece & 127
            prow_v = piece >> 7
            val = jnp.zeros(shp, _I32)
            for pp in range(prows):
                rowv = jnp.broadcast_to(
                    texpal_ref[p0 + pp, :][None, :], shp)
                pv = _lane_take(rowv, plane)
                val = jnp.where(prow_v == pp, pv, val)
            return val

        if sky_mode:
            from . import skybox as _sky
            from ..config import PROJ_DISTANCE, PROJ_SCALE
            cfg = sky_static.skybox
            sky_time = _F32(sky_static.time)
            vs_c = _F32((min(width, height) / 2.0) * PROJ_SCALE)
            usq_c = _F32(PROJ_DISTANCE - 1.0)
            # theta feeds only azimuth-dependent features; when the
            # config uses none, the atan2 evaluation traces away.
            # Sun/moon no longer need it (round-5 session 4): their
            # angular distance comes from a direct dot product against
            # body_unit_dir — the same quantity the reference's
            # sin/cos/atan2 chain computes, evaluated exactly — and the
            # whole body is chunk-gated on max(cos_dist) > cos(4*size)
            # (beyond the glow radius both core and glow are exactly 0).
            need_theta = ((cfg.horizontal_tint_enabled
                           and cfg.horizontal_tint_intensity > 0)
                          or any(l is not None and l.opacity > 0
                                 for l in cfg.cloud_layers))

            def _sky_chunk_scr(c):
                """Fill sky_scr with chunk c's analytic sky + mountain
                peaks — the same per-pixel math as ops.skybox.
                render_skybox_layout (sphere: _sample_sky at the pixel's
                exact direction; mountains: identical barycentric
                expressions on the identical projected scalars), so the
                kernel path matches the buffer path except for the
                minimax acos/atan2 (budgeted like device-transcendental
                ulps, see tests/test_skybox.py)."""
                g = c // chunks_per_g
                ybase = (c % chunks_per_g) * ch
                xi = jax.lax.broadcasted_iota(_I32, (ch, 128), 1) + (g << 7)
                yi = jax.lax.broadcasted_iota(_I32, (ch, 128), 0) + ybase
                b = [skyscal_ref[0, 3, j] for j in range(9)]
                ndc_x = (xi.astype(_F32) + 0.5
                         - _F32(width / 2.0)) / vs_c / usq_c
                ndc_y = (yi.astype(_F32) + 0.5
                         - _F32(height / 2.0)) / vs_c / usq_c
                norm = jnp.sqrt(ndc_x * ndc_x + ndc_y * ndc_y + 1.0)
                cx, cy, cz = ndc_x / norm, ndc_y / norm, 1.0 / norm
                wx = cx * b[0] + cy * b[3] + cz * b[6]
                wy = cx * b[1] + cy * b[4] + cz * b[7]
                wz = cx * b[2] + cy * b[5] + cz * b[8]
                phi = _sky._kacos(jnp.clip(wy, _F32(-1.0), _F32(1.0)))
                if need_theta:
                    theta = _sky._kmod2pi(_sky._katan2(wz, wx))
                else:
                    theta = jnp.zeros((ch, 128), _F32)

                def body_hook(body, color):
                    import math as _m
                    bx, by, bz = _sky.body_unit_dir(body)
                    cosd = (wx * _F32(bx) + wy * _F32(by)
                            + wz * _F32(bz))
                    glow_r = min(body.size * 4.0, _m.pi)
                    cg = _F32(_m.cos(glow_r) - 1e-5)
                    skyrgb_scr[pl.ds(0, ch), :] = color[0]
                    skyrgb_scr[pl.ds(ch, ch), :] = color[1]
                    skyrgb_scr[pl.ds(2 * ch, ch), :] = color[2]

                    @pl.when(jnp.max(cosd) > cg)
                    def _(body=body, cosd=cosd):
                        cur = (skyrgb_scr[pl.ds(0, ch), :],
                               skyrgb_scr[pl.ds(ch, ch), :],
                               skyrgb_scr[pl.ds(2 * ch, ch), :])
                        ang = _sky._kacos(
                            jnp.clip(cosd, _F32(-1.0), _F32(1.0)))
                        out = _sky._apply_body(body, cur, ang)
                        skyrgb_scr[pl.ds(0, ch), :] = out[0]
                        skyrgb_scr[pl.ds(ch, ch), :] = out[1]
                        skyrgb_scr[pl.ds(2 * ch, ch), :] = out[2]

                    return (skyrgb_scr[pl.ds(0, ch), :],
                            skyrgb_scr[pl.ds(ch, ch), :],
                            skyrgb_scr[pl.ds(2 * ch, ch), :])

                if "flatsky" in debug:   # DIAGNOSIS ONLY (wrong output):
                    # per-chunk cost floor without the sky function
                    rf = gf = bf = wy * _F32(100.0)
                else:
                    rf, gf, bf = _sky._sample_sky(
                        cfg, theta, phi, sky_time, acos=_sky._kacos,
                        body_hook=body_hook if sky_bodies else None)
                r = jnp.clip(rf, _F32(0.0), _F32(255.0)).astype(_I32)
                gc = jnp.clip(gf, _F32(0.0), _F32(255.0)).astype(_I32)
                bc = jnp.clip(bf, _F32(0.0), _F32(255.0)).astype(_I32)
                sky_scr[:] = col.pack_rgba8(
                    r, gc, bc, jnp.full((ch, 128), 255, _I32))

                px = xi.astype(_F32) + 0.5
                py = yi.astype(_F32) + 0.5
                gx0 = float(g << 7)
                mtn_faces = (() if "nomtn" in debug   # DIAGNOSIS ONLY
                             else sky_static.faces)
                for f, (i0, i1, i2, c0, c1, c2) in \
                        enumerate(mtn_faces):
                    ymin = skyscal_ref[0, 4, f]
                    ymax = skyscal_ref[0, 5, f]
                    xmin = skyscal_ref[0, 6, f]
                    xmax = skyscal_ref[0, 7, f]
                    hit = ((ymax >= _F32(ybase))
                           & (ymin <= _F32(ybase + ch))
                           & (xmax >= _F32(gx0))
                           & (xmin <= _F32(gx0 + 128.0)))

                    @pl.when(hit)
                    def _(i0=i0, i1=i1, i2=i2, c0=c0, c1=c1, c2=c2, f=f):
                        x0 = skyscal_ref[0, 0, i0]
                        y0 = skyscal_ref[0, 1, i0]
                        x1 = skyscal_ref[0, 0, i1]
                        y1 = skyscal_ref[0, 1, i1]
                        x2 = skyscal_ref[0, 0, i2]
                        y2 = skyscal_ref[0, 1, i2]
                        inv = skyscal_ref[0, 2, f]
                        w0 = ((y1 - y2) * (px - x2)
                              + (x2 - x1) * (py - y2)) * inv
                        w1 = ((y2 - y0) * (px - x2)
                              + (x0 - x2) * (py - y2)) * inv
                        w2 = 1.0 - w0 - w1
                        covered = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0)
                        rr = (w0 * _F32(c0[0]) + w1 * _F32(c1[0])
                              + w2 * _F32(c2[0]))
                        gg = (w0 * _F32(c0[1]) + w1 * _F32(c1[1])
                              + w2 * _F32(c2[1]))
                        bb = (w0 * _F32(c0[2]) + w1 * _F32(c1[2])
                              + w2 * _F32(c2[2]))
                        mr = jnp.clip(jnp.trunc(rr), _F32(0.0),
                                      _F32(255.0)).astype(_I32)
                        mg = jnp.clip(jnp.trunc(gg), _F32(0.0),
                                      _F32(255.0)).astype(_I32)
                        mb = jnp.clip(jnp.trunc(bb), _F32(0.0),
                                      _F32(255.0)).astype(_I32)
                        word = col.pack_rgba8(
                            mr, mg, mb, jnp.full((ch, 128), 255, _I32))
                        sky_scr[:] = jnp.where(covered, word, sky_scr[:])

        @pl.when(seg_id == 0)
        def _():
            if const_depth:
                depth_ref[0] = jnp.zeros((gh, 128), _F32)
            else:
                depth_ref[0] = fbd_ref[0]
            idx_scr[:] = jnp.full((gh, 128), -1, _I32)
            if track_pres:
                def clr(i, carry):
                    pres_scr[jax.lax.div(i, jnp.int32(pres_words)),
                             jax.lax.rem(i, jnp.int32(pres_words))] = \
                        jnp.int32(0)
                    return carry
                jax.lax.fori_loop(jnp.int32(0),
                                  jnp.int32(n_chunks * pres_words), clr,
                                  jnp.int32(0))

        sub8 = jax.lax.broadcasted_iota(_I32, (wb, 128), 0)
        lane8 = jax.lax.broadcasted_iota(_I32, (wb, 128), 1)
        wsh = wb.bit_length() - 1     # wb is a power of two

        # ---- PHASE 1: visibility in compacted draw order.  The loop
        # counter f walks the order column; the face's scalars live at
        # row (order[f] - seg_base) of the (possibly uncompacted) tables.
        # Single-segment levels store original-order tables + a compacted
        # order; multi-segment levels store compacted tables + identity
        # order — this code path is the same for both.  With kf > 1
        # ("fbK" debug) each iteration processes kf faces — the scalar
        # reads of face j+1 pipeline behind face j's vector blocks; an
        # out-of-range face clamps to row 0 with zero block iterations,
        # so draw order and results are unchanged. ----
        def one_face(fidx, n_here):
            valid = fidx < n_here
            fsafe = jnp.where(valid, fidx, jnp.int32(0))
            fo = ctrl_ref[0, K_ORDER, fsafe]  # global face id (draw order)
            fr = fo - seg_base                # row within this segment
            x_lo = ctrl_ref[0, K_XLO, fr]
            x_hi = ctrl_ref[0, K_XHI, fr]
            y_lo = ctrl_ref[0, K_YLO, fr]
            y_hi = ctrl_ref[0, K_YHI, fr]
            # window base/count derived in-kernel so the wb tile size is
            # free to change without touching the prepass ctrl table
            wsh_c = jnp.int32(wsh)
            yb0 = jax.lax.shift_left(
                jax.lax.shift_right_arithmetic(y_lo, wsh_c), wsh_c)
            nblk = jax.lax.shift_right_arithmetic(
                y_hi - yb0 + jnp.int32(wb - 1), wsh_c)
            g0 = ctrl_ref[0, K_G0, fr]
            ngr = ctrl_ref[0, K_NG, fr]
            tid = ctrl_ref[0, K_TID, fr]
            keyable = ctrl_ref[0, K_KEY, fr]
            if "nokey" in debug:
                # DIAGNOSIS ONLY (wrong output): cost of the keyed path
                keyable = jnp.int32(0)

            v3x = fscal_ref[0, C_V3X, fr]
            v3y = fscal_ref[0, C_V3Y, fr]
            a0 = fscal_ref[0, C_A0, fr]
            b0 = fscal_ref[0, C_B0, fr]
            a1 = fscal_ref[0, C_A1, fr]
            b1 = fscal_ref[0, C_B1, fr]
            ia = fscal_ref[0, C_IA, fr]
            iza = fscal_ref[0, C_IZA, fr]
            izb = fscal_ref[0, C_IZB, fr]
            izc = fscal_ref[0, C_IZC, fr]

            def block(g, k):
                yb = yb0 + k * wb
                row0 = pl.multiple_of(g * height + yb, wb)
                xi = lane8 + (g << 7)
                yi = sub8 + yb
                px = xi.astype(_F32)
                py = yi.astype(_F32)
                dx = px - v3x
                dy = py - v3y
                w0 = a0 * dx + b0 * dy
                w1 = a1 * dx + b1 * dy
                bcx = w0 * ia
                bcy = w1 * ia
                bcz = (1.0 - bcx) - bcy
                err = _F32(-0.0001)
                # min-trick: minimum propagates NaN and -0.0 exactly like
                # the 3-way compare chain, 3 ops instead of 5
                cov = (jnp.minimum(jnp.minimum(bcx, bcy), bcz) >= err) \
                    & (xi >= x_lo) & (xi < x_hi) \
                    & (yi >= y_lo) & (yi < y_hi)
                izi = (bcx * iza + bcy * izb) + bcz * izc
                return row0, cov, izi, bcx, bcy, bcz

            # winner id: single-segment = DRAW POSITION (attrsT is
            # draw-ordered, so a chunk's winners span a narrow
            # room-ordered group band); multi-segment = ORIGINAL face id
            # (attrsT stays in original order — still room-contiguous,
            # and the global prep row gather measured 26 us/inst at
            # Cathedral scale)
            fg = fsafe if n_segs == 1 else fo

            def merge(row0, cov, izi, bcx, bcy):
                if "skipmiss" in debug:
                    # bbox-edge blocks often cover nothing: one vector
                    # reduce + scalar branch skips the 4-plane RMW (the
                    # phase-1 VMEM-bandwidth floor) for all-miss visits
                    nz = jnp.max(jnp.where(cov, _I32(1), _I32(0))) > 0

                    @pl.when(nz)
                    def _():
                        _merge_body(row0, cov, izi, bcx, bcy)
                else:
                    _merge_body(row0, cov, izi, bcx, bcy)

            def _merge_body(row0, cov, izi, bcx, bcy):
                win = depth_ref[0, pl.ds(row0, wb), :]
                # painter's: last covering face wins regardless of depth
                better = cov if painters else (cov & (izi > win))
                depth_ref[0, pl.ds(row0, wb), :] = jnp.where(better, izi, win)
                if "mergelite" in debug:
                    # DIAGNOSIS ONLY (wrong output): depth merge only —
                    # isolates the idx/bc plane-RW share of a block visit
                    return
                iw = idx_scr[pl.ds(row0, wb), :]
                idx_scr[pl.ds(row0, wb), :] = jnp.where(better, fg, iw)
                if store_bc:
                    bw = bcx_scr[pl.ds(row0, wb), :]
                    bcx_scr[pl.ds(row0, wb), :] = jnp.where(better, bcx, bw)
                    bw = bcy_scr[pl.ds(row0, wb), :]
                    bcy_scr[pl.ds(row0, wb), :] = jnp.where(better, bcy, bw)
                if track_pres:
                    # mark the face's texture bit for the touched chunk(s)
                    # (two scalar SMEM RMWs; wb-blocks can straddle a
                    # chunk boundary only when wb doesn't divide ch)
                    tsafe = jnp.maximum(tid, 0)
                    wi = jax.lax.shift_right_arithmetic(tsafe, jnp.int32(5))
                    bit = jnp.where(
                        tid >= 0,
                        jax.lax.shift_left(jnp.int32(1), tsafe & 31),
                        jnp.int32(0))
                    c0 = jax.lax.div(row0, jnp.int32(ch))
                    c1 = jax.lax.div(row0 + jnp.int32(wb - 1), jnp.int32(ch))
                    pres_scr[c0, wi] = pres_scr[c0, wi] | bit
                    pres_scr[c1, wi] = pres_scr[c1, wi] | bit

            # (g, k) ride the fori carry instead of div/rem per block —
            # integer divide on the scalar unit costs ~10+ cycles and ran
            # once per block (round 5)
            def _bump(g, k):
                k2 = k + 1
                wrap = k2 >= nblk
                return (jnp.where(wrap, g + 1, g),
                        jnp.where(wrap, jnp.int32(0), k2))

            def blk_clean(q, carry):
                g, k = carry
                row0, cov, izi, bcx, bcy, _ = block(g, k)
                merge(row0, cov, izi, bcx, bcy)
                return _bump(g, k)

            def blk_keyed(q, carry, u0, vv0, u1, vv1, u2, vv2, tw, th):
                g, k = carry
                row0, cov, izi, bcx, bcy, bcz = block(g, k)
                if "skipmiss" in debug:
                    # all-miss visits skip the UV + key-word work too
                    nz = jnp.max(jnp.where(cov, _I32(1), _I32(0))) > 0

                    @pl.when(nz)
                    def _():
                        _keyed_body(row0, cov, izi, bcx, bcy, bcz,
                                    u0, vv0, u1, vv1, u2, vv2, tw, th)
                else:
                    _keyed_body(row0, cov, izi, bcx, bcy, bcz,
                                u0, vv0, u1, vv1, u2, vv2, tw, th)
                return _bump(g, k)

            def _keyed_body(row0, cov, izi, bcx, bcy, bcz,
                            u0, vv0, u1, vv1, u2, vv2, tw, th):
                # UV at pixel (render.rs:1563-1579) + keying bit
                if affine:
                    u = _interp3(bcx, bcy, bcz, u0, u1, u2)
                    v = _interp3(bcx, bcy, bcz, vv0, vv1, vv2)
                else:
                    u_oz = ((bcx * u0) * iza + (bcy * u1) * izb) \
                        + (bcz * u2) * izc
                    v_oz = ((bcx * vv0) * iza + (bcy * vv1) * izb) \
                        + (bcz * vv2) * izc
                    safe = jnp.where(izi == 0, _F32(1.0), izi)
                    u = u_oz / safe
                    v = v_oz / safe
                vf = _F32(1.0) - v
                tx = jnp.minimum(
                    jnp.trunc(_wrap01(u) * tw.astype(_F32)).astype(_I32),
                    tw - 1)
                ty = jnp.minimum(
                    jnp.trunc(_wrap01(vf) * th.astype(_F32)).astype(_I32),
                    th - 1)
                rel = ty * tw + tx
                widx = rel >> 5
                word = jnp.zeros((wb, 128), _I32)
                for rr in range(key_wrows):
                    krow = keyrows_ref[tid, rr, :]
                    sel = _lane_take(
                        jnp.broadcast_to(krow[None, :], (wb, 128)),
                        widx & 127)
                    word = jnp.where((widx >> 7) == rr, sel, word)
                keyed = ((word >> (rel & 31)) & 1) != 0
                if "skipmiss" in debug:
                    _merge_body(row0, cov & ~keyed, izi, bcx, bcy)
                else:
                    merge(row0, cov & ~keyed, izi, bcx, bcy)

            total_blocks = jnp.where(valid, ngr * nblk, jnp.int32(0))
            gk0 = (g0, jnp.int32(0))

            @pl.when(keyable == 0)
            def _():
                jax.lax.fori_loop(jnp.int32(0), total_blocks, blk_clean,
                                  gk0)

            @pl.when(keyable != 0)
            def _():
                # per-FACE scalar reads (were per-block, round-5 s4)
                u0 = fscal_ref[0, C_U0, fr]
                vv0 = fscal_ref[0, C_VV0, fr]
                u1 = fscal_ref[0, C_U1, fr]
                vv1 = fscal_ref[0, C_VV1, fr]
                u2 = fscal_ref[0, C_U2, fr]
                vv2 = fscal_ref[0, C_VV2, fr]
                tw = texmeta_ref[0, tid]
                th = texmeta_ref[1, tid]
                jax.lax.fori_loop(
                    jnp.int32(0), total_blocks,
                    lambda q, c: blk_keyed(q, c, u0, vv0, u1, vv1,
                                           u2, vv2, tw, th),
                    gk0)

        if "novis" not in debug:
            # K_COUNT is the total kept count for single-segment tables
            # and the SEGMENT's kept count for streamed ones (each
            # segment's SMEM window carries its own)
            n_here = jnp.minimum(count, jnp.int32(seg_rows))
            if kf == 1:
                def face_body(f, carry):
                    one_face(f, n_here)
                    return carry
                jax.lax.fori_loop(jnp.int32(0), n_here, face_body,
                                  jnp.int32(0))
            else:
                def face_body(fb, carry):
                    for j in range(kf):
                        one_face(fb * jnp.int32(kf) + jnp.int32(j),
                                 n_here)
                    return carry
                n_iters = jax.lax.div(n_here + jnp.int32(kf - 1),
                                      jnp.int32(kf))
                jax.lax.fori_loop(jnp.int32(0), n_iters, face_body,
                                  jnp.int32(0))

        # ---- PHASE 2: resolve + pixel pipeline, chunked; runs once the
        # final face segment has merged (the output blocks revisit).
        # "nophase2" passes the background straight through instead —
        # both the perf-diagnosis mode and the x-ray compose (which is
        # background + PHASE 3 only, render.rs:507-526). ----
        def _skip_phase2():
            if sky_mode:
                for c in range(n_chunks):
                    _sky_chunk_scr(c)
                    color_ref[0, pl.ds(c * ch, ch), :] = sky_scr[:]
            elif clear_color is None:
                color_ref[0] = fbc_ref[0]
            else:
                color_ref[0] = jnp.full((gh, 128), _I32(clear_color))

        def _run_phase2():
            n_groups_static = t_pad // 128
            if n_segs == 1:
                # winner ids are draw positions < count
                ngroups = jnp.maximum((count + 127) >> 7, 1)
            else:
                # winner ids are original face ids — no dynamic bound
                ngroups = jnp.int32(n_groups_static)

            if shading == ShadingMode.NONE or (sh_mode is not None
                                               and sh_mode[0] == "const"):
                sh_cols = []
            elif sh_mode is not None and sh_mode[0] == "pfgray":
                sh_cols = [C_SH]
            elif shading == ShadingMode.FLAT or sh_mode is not None:
                sh_cols = [C_SH, C_SH + 1, C_SH + 2]   # FLAT or "pf"
            else:
                sh_cols = list(range(C_SH, C_SH + 9))
            cols = (([] if store_bc
                     else [C_V3X, C_V3Y, C_A0, C_B0, C_A1, C_B1, C_IA])
                    + ([] if affine else [C_IZA, C_IZB, C_IZC])
                    + [C_U0, C_VV0, C_U1, C_VV1, C_U2, C_VV2]
                    + ([] if vc_fold else [C_VCP0, C_VCP1, C_VCP2])
                    + sh_cols + [C_TID]
                    + ([C_FLAGS] if flags_needed else []))

            if tex_major:
                texw = lane_iota3 = ra_iota = None
            elif direct_fetch:
                # full Color15 words, exact: bf16 planes -> f32 add -> i32
                texw = (texlo_ref[:].astype(_F32)
                        + texhi_ref[:].astype(_F32)).astype(_I32)
                lane_iota3 = ra_iota = None
            else:
                lane_iota3 = jax.lax.broadcasted_iota(
                    _I32, (ch, 128, 128), 2)
                ra_iota = jax.lax.broadcasted_iota(
                    _I32, (ch, 128, atlas_rows), 2)

            for c in range(n_chunks):
                g = c // chunks_per_g
                ybase = (c % chunks_per_g) * ch
                r0 = c * ch
                idx = idx_scr[r0:r0 + ch, :]
                has = idx >= 0
                idxs = jnp.maximum(idx, 0)
                lanei = idxs & 127
                grp = idxs >> 7

                # chunks with no winning face skip the whole pixel pipeline
                # and just pass the background through (sparse scenes: most
                # of the frame is skybox/clear)
                any_winner = jnp.max(jnp.where(has, _I32(1), _I32(0))) > 0

                @pl.when(jnp.logical_not(any_winner))
                def _(r0=r0, c=c):
                    if sky_mode:
                        _sky_chunk_scr(c)
                        color_ref[0, pl.ds(r0, ch), :] = sky_scr[:]
                    elif clear_color is None:
                        color_ref[0, pl.ds(r0, ch), :] = \
                            fbc_ref[0, pl.ds(r0, ch), :]
                    else:
                        color_ref[0, pl.ds(r0, ch), :] = jnp.full(
                            (ch, 128), _I32(clear_color))

                @pl.when(any_winner)
                def _(idx=idx, has=has, idxs=idxs, lanei=lanei, grp=grp,
                      g=g, ybase=ybase, r0=r0):

                    # faces sit in room order (original ids) or draw
                    # order (positions), so one screen chunk references a
                    # narrow band of attr groups — bound the gather loop
                    # by the [min, max] winner group instead of walking
                    # all groups.  Group gmin is peeled: its gathers
                    # initialize the carry WITHOUT the grp==gg select
                    # (chunks usually touch one group).  Pixels of later
                    # groups carry group-gmin values until their group
                    # overwrites them; non-winner pixels end up with some
                    # REAL face's attrs (bounded tid) and are masked at
                    # the final drawn-write, so the peel is bit-exact.
                    # "subattr": gather per (16,128) sub-block with its
                    # own [gmin, gmax] — winner locality is row-scale, so
                    # big-level chunks walk far fewer (group, col) pairs.
                    def gather_cols(lanei_s, grp_s, has_s, rows):
                        gmin = jnp.min(jnp.where(
                            has_s, grp_s, _I32(n_groups_static - 1)))
                        gmax = jnp.max(jnp.where(has_s, grp_s, _I32(0)))
                        # winner ids stay below the dynamic group count
                        gmax = jnp.minimum(jnp.maximum(gmax, gmin),
                                           ngroups - 1)
                        gmin = jnp.minimum(gmin, gmax)
                        vals0 = []
                        for cc in cols:
                            row = attrsT_ref[0, cc, gmin, :]
                            vals0.append(_lane_take(
                                jnp.broadcast_to(row[None, :],
                                                 (rows, 128)), lanei_s))

                        def body(gg, carry):
                            out = []
                            for ci, cc in enumerate(cols):
                                row = attrsT_ref[0, cc, gg, :]
                                sel = _lane_take(
                                    jnp.broadcast_to(row[None, :],
                                                     (rows, 128)),
                                    lanei_s)
                                out.append(jnp.where(grp_s == gg, sel,
                                                     carry[ci]))
                            return tuple(out)

                        return jax.lax.fori_loop(gmin + 1, gmax + 1,
                                                 body, tuple(vals0))

                    sub = 16 if ("subattr" in debug and ch % 16 == 0
                                 and ch > 16) else ch
                    if "noattrs" in debug:   # perf diagnosis: gather cost
                        vals = tuple(jnp.zeros((ch, 128), _F32)
                                     for _ in cols)
                    elif sub == ch:
                        vals = gather_cols(lanei, grp, has, ch)
                    else:
                        parts = [gather_cols(lanei[s:s + sub, :],
                                             grp[s:s + sub, :],
                                             has[s:s + sub, :], sub)
                                 for s in range(0, ch, sub)]
                        vals = tuple(
                            jnp.concatenate([p[ci] for p in parts], axis=0)
                            for ci in range(len(cols)))
                    a = dict(zip(cols, vals))

                    xi = jax.lax.broadcasted_iota(_I32, (ch, 128), 1) + (g << 7)
                    yi = jax.lax.broadcasted_iota(_I32, (ch, 128), 0) + ybase
                    if store_bc:
                        # winner barycentrics straight from phase 1 —
                        # identical f32 values (same expressions, same
                        # scalars); non-winner lanes hold stale/garbage
                        # planes and are masked at the drawn-write
                        bcx = bcx_scr[pl.ds(r0, ch), :]
                        bcy = bcy_scr[pl.ds(r0, ch), :]
                    else:
                        px = xi.astype(_F32)
                        py = yi.astype(_F32)
                        dx = px - a[C_V3X]
                        dy = py - a[C_V3Y]
                        w0 = a[C_A0] * dx + a[C_B0] * dy
                        w1 = a[C_A1] * dx + a[C_B1] * dy
                        bcx = w0 * a[C_IA]
                        bcy = w1 * a[C_IA]
                    bcz = (1.0 - bcx) - bcy

                    if affine:
                        u = _interp3(bcx, bcy, bcz, a[C_U0], a[C_U1], a[C_U2])
                        v = _interp3(bcx, bcy, bcz, a[C_VV0], a[C_VV1], a[C_VV2])
                    else:
                        izi = depth_ref[0, pl.ds(r0, ch), :]
                        u_oz = ((bcx * a[C_U0]) * a[C_IZA]
                                + (bcy * a[C_U1]) * a[C_IZB]) \
                            + (bcz * a[C_U2]) * a[C_IZC]
                        v_oz = ((bcx * a[C_VV0]) * a[C_IZA]
                                + (bcy * a[C_VV1]) * a[C_IZB]) \
                            + (bcz * a[C_VV2]) * a[C_IZC]
                        safe = jnp.where(izi == 0, _F32(1.0), izi)
                        u = u_oz / safe
                        v = v_oz / safe

                    tid = a[C_TID].astype(_I32)
                    textured = tid >= 0
                    tids = jnp.maximum(tid, 0)
                    if tex_wh is not None:
                        # uniform texture sizes fold the tw/th gathers to
                        # constants — identical value computations
                        twf = _F32(float(tex_wh[0]))
                        thf = _F32(float(tex_wh[1]))
                        twm1 = _I32(tex_wh[0] - 1)
                        thm1 = _I32(tex_wh[1] - 1)
                        twi = _I32(tex_wh[0])
                    else:
                        tw = _lane_take(
                            jnp.broadcast_to(texmeta_v_ref[0, :][None, :],
                                             (ch, 128)), tids)
                        th = _lane_take(
                            jnp.broadcast_to(texmeta_v_ref[1, :][None, :],
                                             (ch, 128)), tids)
                        twf, thf = tw.astype(_F32), th.astype(_F32)
                        twm1, thm1 = tw - 1, th - 1
                        twi = tw
                    vf = _F32(1.0) - v
                    tx = jnp.minimum(
                        jnp.trunc(_wrap01(u) * twf).astype(_I32), twm1)
                    ty = jnp.minimum(
                        jnp.trunc(_wrap01(vf) * thf).astype(_I32), thm1)
                    rel = ty * twi + tx
                    if not tex_major or "notex" in debug:
                        # flat-atlas paths only: tex_major never reads the
                        # offset table (drops its per-pixel gather)
                        toff = _lane_take(
                            jnp.broadcast_to(texmeta_v_ref[2, :][None, :],
                                             (ch, 128)), tids)
                        flat = toff + rel
                        trow = flat >> 7
                        tlane = flat & 127
                    if "notex" in debug:      # perf diagnosis: no texel fetch
                        lo = hiw = jnp.zeros((ch, 128, 1), _F32)
                    elif tex_major or direct_fetch:
                        lo = hiw = None
                    else:
                        oh = (trow[..., None] == ra_iota).astype(_BF16)
                        lo = jax.lax.dot_general(
                            oh, texlo_ref[:],
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=_F32)
                        hiw = jax.lax.dot_general(
                            oh, texhi_ref[:],
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=_F32)
                    if "notex" in debug:
                        texel = jnp.full((ch, 128), col.WHITE, _I32)
                    elif tex_major:
                        # Texture-major packed fetch.  Per-texture packed
                        # rows (pal16 8 texels/word, pal4 4, pack2 2) —
                        # far fewer rows than the flat-atlas loop.
                        # Default (round 4): whole textures are skipped
                        # per chunk via the phase-1-computed presence
                        # bitmask — a single scalar SMEM read per
                        # (chunk, texture) + pl.when.  (The round-3
                        # in-kernel VECTOR-reduction gate lost: cube 38.7
                        # vs 31.2 us/inst — do not re-try that form.)
                        # Unpacking is exact integer bit surgery, so the
                        # result is bit-identical to atlas.data[flat].
                        tid_v = a[C_TID].astype(_I32)
                        gate = track_pres

                        if gate:
                            tex_scr[:] = jnp.zeros((ch, 128), _I32)
                            for t, e in enumerate(tex_enc):
                                word = pres_scr[c, t >> 5]
                                present = (jax.lax.shift_right_logical(
                                    word, jnp.int32(t & 31)) & 1) != 0

                                @pl.when(present)
                                def _(e=e, t=t):
                                    tex_scr[:] = jnp.where(
                                        tid_v == t, fetch_packed(e, rel),
                                        tex_scr[:])
                            texel = tex_scr[:]
                        else:
                            texel = jnp.zeros((ch, 128), _I32)
                            for t, e in enumerate(tex_enc):
                                texel = jnp.where(tid_v == t,
                                                  fetch_packed(e, rel),
                                                  texel)
                    elif direct_fetch:
                        # group-select gather: for each atlas row, lane-pick
                        # its texels and keep where the pixel's row matches
                        texel = jnp.zeros((ch, 128), _I32)
                        for rr in range(ra_loop):
                            rowv = jnp.broadcast_to(texw[rr, :][None, :],
                                                    (ch, 128))
                            vals = _lane_take(rowv, tlane)
                            texel = jnp.where(trow == rr, vals, texel)
                    elif "pick0" in debug:    # perf diagnosis: skip the lane pick
                        texel = (lo[..., 0] + hiw[..., 0] * 256.0).astype(_I32)
                    elif "sumones" in debug:
                        # lane pick as per-plane bf16 ones-matmul (byte planes are
                        # bf16-exact) instead of the VPU cross-lane reduction
                        laneeq = lane_iota3 == tlane[..., None]
                        ones16 = jnp.ones((128, 128), _BF16)
                        mlo = jnp.where(laneeq, lo, 0.0).astype(_BF16)
                        mhi = jnp.where(laneeq, hiw, 0.0).astype(_BF16)
                        lo_sel = jax.lax.dot_general(
                            mlo, ones16,
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=_F32)[..., 0]
                        hi_sel = jax.lax.dot_general(
                            mhi, ones16,
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=_F32)[..., 0]
                        texel = (lo_sel + hi_sel).astype(_I32)
                    else:
                        tv = lo + hiw   # hi table prescaled by 256
                        texel = jnp.sum(
                            jnp.where(lane_iota3 == tlane[..., None], tv, 0.0),
                            axis=2).astype(_I32)

                    if flags_needed:
                        flags = a[C_FLAGS].astype(_I32)
                    bt = (bt_const if bt_const is not None
                          else (flags & FLAG_BT) != 0)
                    ndith = (ndith_const if ndith_const is not None
                             else (flags & FLAG_DITHER) != 0)

                    c15 = jnp.where(textured, texel, _I32(col.WHITE))
                    is_black = (col.r5(c15) == 0) & (col.g5(c15) == 0) \
                        & (col.b5(c15) == 0)
                    is_transp = c15 == 0
                    if bt is True:
                        keyed_out = is_black & textured
                    elif bt is False:
                        keyed_out = jnp.zeros(is_black.shape, bool)
                        c15 = jnp.where(is_transp,
                                        _I32(col.BLACK_DRAWABLE), c15)
                    else:
                        keyed_out = is_black & bt & textured
                        c15 = jnp.where(is_transp & ~bt,
                                        _I32(col.BLACK_DRAWABLE), c15)

                    tex_r8 = col.expand_5_to_8(col.r5(c15))
                    tex_g8 = col.expand_5_to_8(col.g5(c15))
                    tex_b8 = col.expand_5_to_8(col.b5(c15))

                    def unpack_vc(packed):
                        p = packed.astype(_I32)
                        return (p & 255, (p >> 8) & 255, (p >> 16) & 255)

                    if vc_fold:
                        pk = vc_mode[1]
                        kc = (_F32(float(pk & 255)),
                              _F32(float((pk >> 8) & 255)),
                              _F32(float((pk >> 16) & 255)))
                        vc0 = vc1 = vc2 = kc
                        vr = _u8_trunc_sat(_interp3(bcx, bcy, bcz,
                                                    kc[0], kc[0], kc[0]))
                    else:
                        vc0 = unpack_vc(a[C_VCP0])
                        vc1 = unpack_vc(a[C_VCP1])
                        vc2 = unpack_vc(a[C_VCP2])
                        vr = _u8_trunc_sat(_interp3(bcx, bcy, bcz,
                                                    vc0[0].astype(_F32),
                                                    vc1[0].astype(_F32),
                                                    vc2[0].astype(_F32)))
                    if vc_gray:
                        # r==g==b per corner: the g/b interps evaluate the
                        # identical expression on identical values
                        vg = vb = vr
                    else:
                        vg = _u8_trunc_sat(_interp3(bcx, bcy, bcz,
                                                    vc0[1].astype(_F32),
                                                    vc1[1].astype(_F32),
                                                    vc2[1].astype(_F32)))
                        vb = _u8_trunc_sat(_interp3(bcx, bcy, bcz,
                                                    vc0[2].astype(_F32),
                                                    vc1[2].astype(_F32),
                                                    vc2[2].astype(_F32)))

                    # modulate8 ((tex*vc)//128, render.rs:1624): operands are
                    # nonnegative u8 so the floor-div is a shift (Mosaic's
                    # floor_divide lowering recurses — avoid // in-kernel).
                    mod_r8 = jnp.minimum((tex_r8 * vr) >> 7, 255)
                    mod_g8 = jnp.minimum((tex_g8 * vg) >> 7, 255)
                    mod_b8 = jnp.minimum((tex_b8 * vb) >> 7, 255)

                    if shading == ShadingMode.NONE:
                        sh_r = sh_g = sh_b = jnp.ones((ch, 128), _F32)
                    elif shading == ShadingMode.FLAT:
                        if sh_mode is not None and sh_mode[0] == "const":
                            sh_r = _F32(sh_mode[1][0])
                            sh_g = _F32(sh_mode[1][1])
                            sh_b = _F32(sh_mode[1][2])
                        elif sh_mode is not None and sh_mode[0] == "pfgray":
                            sh_r = sh_g = sh_b = a[C_SH]
                        else:
                            sh_r, sh_g, sh_b = (a[C_SH], a[C_SH + 1],
                                                a[C_SH + 2])
                    elif sh_mode is not None:
                        # corner-uniform shade: the interpolation runs on
                        # the same value at every corner (exact fold)
                        if sh_mode[0] == "const":
                            cs_ = tuple(_F32(x) for x in sh_mode[1])
                        elif sh_mode[0] == "pfgray":
                            cs_ = (a[C_SH],) * 3
                        else:                  # "pf"
                            cs_ = (a[C_SH], a[C_SH + 1], a[C_SH + 2])
                        sh_r = _interp3(bcx, bcy, bcz, cs_[0], cs_[0],
                                        cs_[0])
                        if (sh_mode[0] == "pfgray"
                                or (sh_mode[0] == "const"
                                    and sh_mode[1][0] == sh_mode[1][1]
                                    == sh_mode[1][2])):
                            sh_g = sh_b = sh_r
                        else:
                            sh_g = _interp3(bcx, bcy, bcz, cs_[1], cs_[1],
                                            cs_[1])
                            sh_b = _interp3(bcx, bcy, bcz, cs_[2], cs_[2],
                                            cs_[2])
                    else:
                        sh_r = _interp3(bcx, bcy, bcz, a[C_SH], a[C_SH + 3],
                                        a[C_SH + 6])
                        sh_g = _interp3(bcx, bcy, bcz, a[C_SH + 1], a[C_SH + 4],
                                        a[C_SH + 7])
                        sh_b = _interp3(bcx, bcy, bcz, a[C_SH + 2], a[C_SH + 5],
                                        a[C_SH + 8])

                    def apply_shade(m8, s):
                        return _u8_trunc_sat(jnp.minimum(
                            m8.astype(_F32) * jnp.clip(s, 0.0, 2.0), 255.0))

                    shaded_r8 = apply_shade(mod_r8, sh_r)
                    shaded_g8 = apply_shade(mod_g8, sh_g)
                    shaded_b8 = apply_shade(mod_b8, sh_b)

                    if ndith is True:
                        offset = _dither_offsets(xi, yi)
                        r5v = col.dither_and_quantize8(shaded_r8, offset)
                        g5v = col.dither_and_quantize8(shaded_g8, offset)
                        b5v = col.dither_and_quantize8(shaded_b8, offset)
                    elif ndith is False:
                        r5v = shaded_r8 >> 3
                        g5v = shaded_g8 >> 3
                        b5v = shaded_b8 >> 3
                    else:
                        offset = _dither_offsets(xi, yi)
                        r5v = jnp.where(
                            ndith, col.dither_and_quantize8(shaded_r8, offset),
                            shaded_r8 >> 3)
                        g5v = jnp.where(
                            ndith, col.dither_and_quantize8(shaded_g8, offset),
                            shaded_g8 >> 3)
                        b5v = jnp.where(
                            ndith, col.dither_and_quantize8(shaded_b8, offset),
                            shaded_b8 >> 3)

                    word = col.pack_rgba8(col.expand_5_to_8(r5v),
                                          col.expand_5_to_8(g5v),
                                          col.expand_5_to_8(b5v),
                                          jnp.full((ch, 128), 255, _I32))
                    drawn = has & ~keyed_out
                    if sky_mode:
                        # synthesize the sky only when some pixel shows
                        # it — fully-covered chunks pay one scalar test
                        need_sky = jnp.min(
                            jnp.where(drawn, _I32(1), _I32(0))) == 0
                        pl.when(need_sky)(lambda: _sky_chunk_scr(c))
                        bg = sky_scr[:]
                    elif clear_color is None:
                        bg = fbc_ref[0, pl.ds(r0, ch), :]
                    else:
                        bg = jnp.full((ch, 128), _I32(clear_color))
                    color_ref[0, pl.ds(r0, ch), :] = jnp.where(drawn, word, bg)

                    if painters:
                        # The depth plane was only scratch (winner 1/z for
                        # perspective-correct UV); painter's never writes
                        # depth (raster_ref zwrite=False) — restore the
                        # input value.  No-winner chunks were never merged
                        # into, so they already hold it.
                        if const_depth:
                            depth_ref[0, pl.ds(r0, ch), :] = \
                                jnp.zeros((ch, 128), _F32)
                        else:
                            depth_ref[0, pl.ds(r0, ch), :] = \
                                fbd_ref[0, pl.ds(r0, ch), :]

        pl.when(seg_id == n_segs - 1)(
            _skip_phase2 if "nophase2" in debug else _run_phase2)

        # ---- PHASE 3: in-kernel transparent composite (render.rs:
        # 2547-2570 + set_pixel_blended_15 render.rs:479).  Tables arrive
        # pre-sorted back-to-front; each face z-tests against the opaque
        # depth (never writing it, skip_z semantics) and blends its bbox
        # windows onto the freshly resolved color plane.  Bit-exact vs
        # the sequential compositor (_raster_one) in affine mode: same
        # expressions, same order, integer divisions replaced by shifts /
        # an exhaustively-verified f32-multiply floor-div-255. ----
        def _run_phase3():
            op_c = int(BlendMode.OPAQUE)
            zactive = settings.use_zbuffer and not settings.xray_mode

            def tr_face(f, carry):
                fid = tctrl_ref[0, T_FID, f]
                tidv = tctrl_ref[0, T_TID, f]
                blendv = tctrl_ref[0, T_BLEND, f]
                eav = tctrl_ref[0, T_EA, f]
                flg = tctrl_ref[0, T_FLAGS, f]
                pval = tctrl_ref[0, T_VALID, f]
                x_lo = ctrl_ref[0, K_XLO, fid]
                x_hi = ctrl_ref[0, K_XHI, fid]
                y_lo = ctrl_ref[0, K_YLO, fid]
                y_hi = ctrl_ref[0, K_YHI, fid]
                g0 = ctrl_ref[0, K_G0, fid]
                ngr = ctrl_ref[0, K_NG, fid]
                wsh_c = jnp.int32(wsh)
                yb0 = jax.lax.shift_left(
                    jax.lax.shift_right_arithmetic(y_lo, wsh_c), wsh_c)
                nblk = jax.lax.shift_right_arithmetic(
                    y_hi - yb0 + jnp.int32(wb - 1), wsh_c)
                v3x = fscal_ref[0, C_V3X, fid]
                v3y = fscal_ref[0, C_V3Y, fid]
                a0 = fscal_ref[0, C_A0, fid]
                b0 = fscal_ref[0, C_B0, fid]
                a1 = fscal_ref[0, C_A1, fid]
                b1 = fscal_ref[0, C_B1, fid]
                ia = fscal_ref[0, C_IA, fid]
                iza = fscal_ref[0, C_IZA, fid]
                izb = fscal_ref[0, C_IZB, fid]
                izc = fscal_ref[0, C_IZC, fid]
                u0 = fscal_ref[0, C_U0, fid]
                vv0 = fscal_ref[0, C_VV0, fid]
                u1 = fscal_ref[0, C_U1, fid]
                vv1 = fscal_ref[0, C_VV1, fid]
                u2 = fscal_ref[0, C_U2, fid]
                vv2 = fscal_ref[0, C_VV2, fid]
                vcp = [tfscal_ref[0, j, f] for j in range(3)]
                sh = [tfscal_ref[0, 3 + j, f] for j in range(9)]
                bts = (flg & FLAG_BT) != 0
                ndiths = (flg & FLAG_DITHER) != 0
                textured = tidv >= 0

                def tblock(q, carry):
                    g, k = carry
                    yb = yb0 + k * wb
                    row0 = pl.multiple_of(g * height + yb, wb)
                    xi = lane8 + (g << 7)
                    yi = sub8 + yb
                    px = xi.astype(_F32)
                    py = yi.astype(_F32)
                    dx = px - v3x
                    dy = py - v3y
                    w0 = a0 * dx + b0 * dy
                    w1 = a1 * dx + b1 * dy
                    bcx = w0 * ia
                    bcy = w1 * ia
                    bcz = (1.0 - bcx) - bcy
                    err = _F32(-0.0001)
                    cov = (jnp.minimum(jnp.minimum(bcx, bcy), bcz) >= err) \
                        & (xi >= x_lo) & (xi < x_hi) \
                        & (yi >= y_lo) & (yi < y_hi)
                    izi = (bcx * iza + bcy * izb) + bcz * izc
                    if zactive:
                        zwin = depth_ref[0, pl.ds(row0, wb), :]
                        vis = cov & (izi > zwin)
                    else:
                        vis = cov

                    # affine UV + texel (render.rs:1563-1607); phase 3 is
                    # affine-only (asserted in _make_kernel)
                    u = _interp3(bcx, bcy, bcz, u0, u1, u2)
                    v = _interp3(bcx, bcy, bcz, vv0, vv1, vv2)
                    tsafe = jnp.maximum(tidv, 0)
                    tw = texmeta_ref[0, tsafe]
                    th = texmeta_ref[1, tsafe]
                    vf = _F32(1.0) - v
                    tx = jnp.minimum(
                        jnp.trunc(_wrap01(u) * tw.astype(_F32)).astype(_I32),
                        tw - 1)
                    ty = jnp.minimum(
                        jnp.trunc(_wrap01(vf) * th.astype(_F32)).astype(_I32),
                        th - 1)
                    rel = ty * tw + tx
                    for t, e in enumerate(tex_enc):
                        @pl.when(tidv == t)
                        def _(e=e):
                            tex_scr[pl.ds(0, wb), :] = fetch_packed(e, rel)
                    texel = tex_scr[pl.ds(0, wb), :]
                    c15 = jnp.where(textured, texel, _I32(col.WHITE))
                    is_black = (col.r5(c15) == 0) & (col.g5(c15) == 0) \
                        & (col.b5(c15) == 0)
                    is_transp = c15 == 0
                    keyed_out = is_black & bts & textured
                    c15 = jnp.where(is_transp & ~bts,
                                    _I32(col.BLACK_DRAWABLE), c15)

                    tex_r8 = col.expand_5_to_8(col.r5(c15))
                    tex_g8 = col.expand_5_to_8(col.g5(c15))
                    tex_b8 = col.expand_5_to_8(col.b5(c15))

                    def vchan(shift):
                        c0 = (vcp[0].astype(_I32) >> shift) & 255
                        c1 = (vcp[1].astype(_I32) >> shift) & 255
                        c2 = (vcp[2].astype(_I32) >> shift) & 255
                        return _u8_trunc_sat(_interp3(
                            bcx, bcy, bcz, c0.astype(_F32),
                            c1.astype(_F32), c2.astype(_F32)))

                    vr, vg, vb = vchan(0), vchan(8), vchan(16)
                    mod_r8 = jnp.minimum((tex_r8 * vr) >> 7, 255)
                    mod_g8 = jnp.minimum((tex_g8 * vg) >> 7, 255)
                    mod_b8 = jnp.minimum((tex_b8 * vb) >> 7, 255)

                    if shading == ShadingMode.NONE:
                        sh_r = sh_g = sh_b = jnp.ones((wb, 128), _F32)
                    elif shading == ShadingMode.FLAT:
                        # corner-0 shade (pixel_color FLAT branch)
                        sh_r, sh_g, sh_b = sh[0], sh[1], sh[2]
                    else:
                        sh_r = _interp3(bcx, bcy, bcz, sh[0], sh[3], sh[6])
                        sh_g = _interp3(bcx, bcy, bcz, sh[1], sh[4], sh[7])
                        sh_b = _interp3(bcx, bcy, bcz, sh[2], sh[5], sh[8])

                    def apply_shade(m8, s):
                        return _u8_trunc_sat(jnp.minimum(
                            m8.astype(_F32) * jnp.clip(s, 0.0, 2.0), 255.0))

                    shaded_r8 = apply_shade(mod_r8, sh_r)
                    shaded_g8 = apply_shade(mod_g8, sh_g)
                    shaded_b8 = apply_shade(mod_b8, sh_b)

                    offset = _dither_offsets(xi, yi)
                    r5v = jnp.where(ndiths, col.dither_and_quantize8(
                        shaded_r8, offset), shaded_r8 >> 3)
                    g5v = jnp.where(ndiths, col.dither_and_quantize8(
                        shaded_g8, offset), shaded_g8 >> 3)
                    b5v = jnp.where(ndiths, col.dither_and_quantize8(
                        shaded_b8, offset), shaded_b8 >> 3)
                    front_r = col.expand_5_to_8(r5v)
                    front_g = col.expand_5_to_8(g5v)
                    front_b = col.expand_5_to_8(b5v)
                    all_black = (r5v == 0) & (g5v == 0) & (b5v == 0)
                    semi = ((c15 & _I32(col.STP_BIT)) != 0) | all_black

                    back_word = color_ref[0, pl.ds(row0, wb), :]
                    back_r = back_word & 255
                    back_g = (back_word >> 8) & 255
                    back_b = (back_word >> 16) & 255

                    if settings.xray_mode:
                        # 50% blend, no depth interaction (render.rs:
                        # 507-526); operands nonnegative -> //2 is >>1
                        out_r = (front_r + back_r) >> 1
                        out_g = (front_g + back_g) >> 1
                        out_b = (front_b + back_b) >> 1
                    else:
                        do_blend = semi & (blendv != op_c)

                        def blend5(f8, b8):
                            # blend_rgb555 (render.rs:1093-1145) with
                            # in-kernel-safe shifts; output is the plain
                            # v5 << 3 expansion (render.rs:1143)
                            f5 = f8 >> 3
                            b5 = b8 >> 3
                            avg = jnp.minimum((b5 + f5) >> 1, _I32(31))
                            add_ = jnp.minimum(b5 + f5, _I32(31))
                            sub_ = jnp.maximum(b5 - f5, _I32(0))
                            addq = jnp.minimum(b5 + (f5 >> 2), _I32(31))
                            v5 = jnp.where(blendv == _BM_AVERAGE, avg,
                                 jnp.where(blendv == _BM_ADD, add_,
                                 jnp.where(blendv == _BM_SUBTRACT, sub_,
                                 jnp.where(blendv == _BM_ADD_QUARTER, addq,
                                 jnp.where(blendv == _BM_ERASE, b5, f5)))))
                            return v5 << 3

                        ps1_r = jnp.where(do_blend, blend5(front_r, back_r),
                                          front_r)
                        ps1_g = jnp.where(do_blend, blend5(front_g, back_g),
                                          front_g)
                        ps1_b = jnp.where(do_blend, blend5(front_b, back_b),
                                          front_b)

                        # editor-alpha lerp (render.rs:564-628): the //255
                        # is a trunc(x * (1/255.0)) f32 multiply, verified
                        # exact exhaustively over [0, 2*255*255]
                        ia_i = _I32(255) - eav

                        def ea_lerp(p, b):
                            x = p * eav + b * ia_i
                            return jnp.trunc(
                                x.astype(_F32)
                                * _F32(1.0 / 255.0)).astype(_I32)

                        use_ea = eav < _I32(255)
                        out_r = jnp.where(use_ea, ea_lerp(ps1_r, back_r),
                                          ps1_r)
                        out_g = jnp.where(use_ea, ea_lerp(ps1_g, back_g),
                                          ps1_g)
                        out_b = jnp.where(use_ea, ea_lerp(ps1_b, back_b),
                                          ps1_b)

                    drawn = vis & ~keyed_out & (eav != 0)
                    word = col.pack_rgba8(out_r, out_g, out_b,
                                          jnp.full((wb, 128), 255, _I32))
                    color_ref[0, pl.ds(row0, wb), :] = jnp.where(
                        drawn, word, back_word)
                    k2 = k + 1
                    wrap = k2 >= nblk
                    return (jnp.where(wrap, g + 1, g),
                            jnp.where(wrap, jnp.int32(0), k2))

                total = jnp.where(pval != 0, ngr * nblk, jnp.int32(0))
                jax.lax.fori_loop(jnp.int32(0), total, tblock,
                                  (g0, jnp.int32(0)))
                return carry

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_tr), tr_face,
                              jnp.int32(0))

        if n_tr and "notrans" not in debug:
            pl.when(seg_id == n_segs - 1)(_run_phase3)

    return kernel, gh, groups


@functools.partial(
    jax.jit,
    static_argnames=("settings", "width", "height", "t_pad", "n_tex",
                     "atlas_rows", "key_wrows", "interpret", "debug",
                     "atlas_rows_data", "tex_enc", "clear_color", "n_tr",
                     "sky_static", "bt_const", "vc_mode", "tex_wh",
                     "sh_mode"))
def rasterize_batch(fbc, fbd, prep: BatchPrep, keyrows, texmeta,
                    tex_lo, tex_hi, tex_pack, tex_pal,
                    settings: RasterSettings,
                    width: int, height: int, t_pad: int, n_tex: int,
                    atlas_rows: int, key_wrows: int,
                    interpret: bool = False, debug: str = "",
                    atlas_rows_data: int = 0, tex_enc: tuple = (),
                    clear_color=None, trprep: TransPrep = None,
                    n_tr: int = 0, skyprep=None, sky_static=None,
                    bt_const=None, vc_mode=None, tex_wh=None,
                    sh_mode=None):
    """Run the fused kernel over the instance grid.

    fbc/fbd: (I, GH, 128) layout framebuffers (see to_layout); prep fields
    carry a leading instance axis.  Returns (color, depth) in layout form.

    trprep/n_tr: per-instance transparent tables + static face count for
    the in-kernel phase-3 composite (see prep_transparent).

    skyprep/sky_static: per-instance (8, vpad) scalar tables
    (ops.skybox.prep_sky_scal) + the static sky descriptor — the kernel
    then synthesizes the background per chunk (in-kernel sky) and fbc is
    a dummy (1, 8, 128)-blocked plane like the clear_color path."""
    n_inst = fbc.shape[0]
    ch, _, _ = _tile_sizes(debug, height)
    const_depth = "cdepth" in debug or clear_color is not None
    sky_mode = sky_static is not None
    kernel, gh, groups = _make_kernel(settings, width, height, t_pad,
                                      n_tex, atlas_rows, key_wrows, debug,
                                      atlas_rows_data, tex_enc, clear_color,
                                      n_tr=n_tr, sky_static=sky_static,
                                      bt_const=bt_const, vc_mode=vc_mode,
                                      tex_wh=tex_wh, sh_mode=sh_mode)
    n_segs, seg_rows = seg_plan(t_pad, debug)

    if n_segs == 1:
        grid = (n_inst,)
        pin = lambda *blk: (lambda i: tuple(b(i, None) for b in blk))
    else:
        grid = (n_inst, n_segs)
        pin = lambda *blk: (lambda i, s: tuple(b(i, s) for b in blk))
    I = lambda i, s: i            # instance axis
    S = lambda i, s: (s if n_segs > 1 else i * 0)   # segment axis
    Z = lambda i, s: i * 0        # pinned zero

    in_specs = [
        pl.BlockSpec((1, N_CTRL, seg_rows), pin(I, Z, S),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 16, seg_rows), pin(I, Z, S),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, N_COLS, groups, 128), pin(I, Z, Z, Z),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_tex, key_wrows, 128), pin(Z, Z, Z),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((4, 128), pin(Z, Z), memory_space=pltpu.SMEM),
        pl.BlockSpec((4, 128), pin(Z, Z), memory_space=pltpu.VMEM),
        pl.BlockSpec((atlas_rows, 128), pin(Z, Z),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((atlas_rows, 128), pin(Z, Z),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tex_pack.shape[0], 128), pin(Z, Z),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tex_pal.shape[0], 128), pin(Z, Z),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, 128) if (clear_color is not None or sky_mode)
                     else (1, gh, 128),
                     pin(I, Z, Z), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, 128) if const_depth else (1, gh, 128),
                     pin(I, Z, Z), memory_space=pltpu.VMEM),
    ]
    operands = [prep.ctrl, prep.fscal, prep.attrsT, keyrows, texmeta,
                texmeta, tex_lo, tex_hi, tex_pack, tex_pal, fbc, fbd]
    if sky_mode:
        in_specs += [
            pl.BlockSpec((1, 8, sky_static.vpad), pin(I, Z, Z),
                         memory_space=pltpu.SMEM),
        ]
        operands += [skyprep]
    if n_tr:
        ntp = trprep.tctrl.shape[-1]
        in_specs += [
            pl.BlockSpec((1, N_TCTRL, ntp), pin(I, Z, Z),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, N_TFS, ntp), pin(I, Z, Z),
                         memory_space=pltpu.SMEM),
        ]
        operands += [trprep.tctrl, trprep.tfscal]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, gh, 128), pin(I, Z, Z)),
            pl.BlockSpec((1, gh, 128), pin(I, Z, Z)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_inst, gh, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_inst, gh, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((gh, 128), jnp.int32),
                        pltpu.VMEM((ch, 128), jnp.int32),
                        pltpu.SMEM((gh // ch, max((n_tex + 31) >> 5, 1)),
                                   jnp.int32)]
        + ([pltpu.VMEM((gh, 128), jnp.float32),
            pltpu.VMEM((gh, 128), jnp.float32)]
           if "nobc" not in debug
           else [])
        + ([pltpu.VMEM((ch, 128), jnp.int32)] if sky_mode else [])
        + ([pltpu.VMEM((3 * ch, 128), jnp.float32)]
           if sky_mode and (sky_static.skybox.sun.enabled
                            or sky_static.skybox.moon.enabled) else []),
        # (cdepth: fbd still passed, but only an 8-row block is DMA'd)
        interpret=interpret,
    )(*operands)
    return out[0], out[1]


def to_layout(a, width: int):
    """(I, H, W) -> (I, NG*H, 128): width padded to NG lane groups."""
    n_inst, h, w = a.shape
    ngl = -(-width // 128)
    pad = ngl * 128 - w
    a = jnp.pad(a, ((0, 0), (0, 0), (0, pad)))
    return a.reshape(n_inst, h, ngl, 128).transpose(0, 2, 1, 3).reshape(
        n_inst, ngl * h, 128)


def from_layout(g, width: int, height: int):
    """(I, NG*H, 128) -> (I, H, W)."""
    n_inst = g.shape[0]
    ngl = -(-width // 128)
    return g.reshape(n_inst, ngl, height, 128).transpose(0, 2, 1, 3).reshape(
        n_inst, height, ngl * 128)[..., :width]

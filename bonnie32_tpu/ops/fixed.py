"""PS1 GTE fixed-point lattice math, vectorized for TPU.

Replicates, as exact integer operations on int32/int64 arrays, the reference's
fixed-point pipeline (`/root/reference/src/rasterizer/fixed.rs`):

  * 4.12 fixed-point (`Fixed32`, fixed.rs:107): 12 fractional bits in i32
    storage with wrapping adds and (i64 >> 12) multiply.
  * the 257-entry UNR reciprocal table (fixed.rs:20-31) generated from
    table[i] = max(0, ((0x40000/(i+0x100)) + 1)/2 - 0x101).
  * the UNR Newton-Raphson division `div_unr` (fixed.rs:178-230):
    clz-normalize -> table lookup -> two NR iterations -> multiply by the
    dividend -> shift by (36 - z) with rounding -> clamp -> sign.
  * the full projection pipeline `transform_to_camera_space` (fixed.rs:362),
    `project_to_screen` (fixed.rs:390) and `project_fixed` (fixed.rs:424):
    integer screen coordinates (vertex snapping) and the data-dependent UNR
    error are the source of authentic PS1 jitter.

All functions operate elementwise on arrays of any shape and are `vmap`/`jit`
friendly.  int32 arithmetic wraps two's-complement in XLA, matching Rust's
`wrapping_*` semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np

_I32 = jnp.int32
_I64 = jnp.int64
_U32 = jnp.uint32
_U64 = jnp.uint64
_F32 = jnp.float32

FRAC_BITS = 12
ONE = 1 << FRAC_BITS  # 4096


def _build_unr_table() -> np.ndarray:
    """The PS1 GTE UNR reciprocal table (fixed.rs:20-31), 257 u8 entries."""
    i = np.arange(257, dtype=np.int64)
    quotient = 0x40000 // (i + 0x100)
    val = (quotient + 1) // 2 - 0x101
    return np.maximum(val, 0).astype(np.int64)


UNR_TABLE = _build_unr_table()
_UNR_TABLE_DEV = jnp.asarray(UNR_TABLE, dtype=_U64)


def from_f32(f):
    """Fixed32::from_f32 (fixed.rs:125): (f * 4096.0) as i32.

    Rust `as i32` truncates toward zero and saturates; NaN maps to 0.
    """
    f = jnp.asarray(f, _F32)
    scaled = f * jnp.float32(ONE)
    # Truncate toward zero in f64 (all i32-range values exact in f64), then
    # saturate like Rust `as`.
    t = jnp.trunc(scaled.astype(jnp.float64))
    t = jnp.where(jnp.isnan(t), 0.0, t)
    t = jnp.clip(t, -2147483648.0, 2147483647.0)
    return t.astype(_I64).astype(_I32)


def from_int(n):
    """Fixed32::from_int (fixed.rs:119): n << 12 (wrapping)."""
    return (jnp.asarray(n, _I32) << FRAC_BITS).astype(_I32)


def to_f32(x):
    """Fixed32::to_f32 (fixed.rs:131): x as f32 / 4096.0."""
    return jnp.asarray(x, _I32).astype(_F32) / jnp.float32(ONE)


def floor(x):
    """Fixed32::floor (fixed.rs:137): arithmetic >> 12."""
    return jnp.asarray(x, _I32) >> FRAC_BITS


def mul_fixed(a, b):
    """Fixed32::mul_fixed (fixed.rs:161): ((a as i64 * b as i64) >> 12) as i32.

    The i64 product is exact; the final truncation to i32 wraps (Rust `as`).
    """
    a64 = jnp.asarray(a, _I32).astype(_I64)
    b64 = jnp.asarray(b, _I32).astype(_I64)
    return ((a64 * b64) >> FRAC_BITS).astype(_I32)


def add(a, b):
    """Wrapping i32 add (fixed.rs:233-239)."""
    return (jnp.asarray(a, _I32) + jnp.asarray(b, _I32)).astype(_I32)


def sub(a, b):
    """Wrapping i32 sub (fixed.rs:241-247)."""
    return (jnp.asarray(a, _I32) - jnp.asarray(b, _I32)).astype(_I32)


def div_unr(num, den):
    """PS1 GTE UNR division (fixed.rs:178-230), elementwise.

    Both arguments are 4.12 fixed-point int32; the result is 4.12 int32 with
    the authentic ~2-3 bit data-dependent error pattern.
    """
    num = jnp.asarray(num, _I32)
    den = jnp.asarray(den, _I32)

    result_negative = (num < 0) != (den < 0)
    # unsigned_abs: abs in i64 space handles i32::MIN correctly.
    n_abs = jnp.abs(num.astype(_I64)).astype(_U64)
    d_abs32 = jnp.abs(den.astype(_I64)).astype(_U32)

    # clz of the 32-bit absolute divisor (fixed.rs:192). den==0 handled at end.
    safe_d = jnp.where(d_abs32 == 0, _U32(1), d_abs32)
    z64 = jax.lax.clz(safe_d).astype(_U64)

    d_norm = d_abs32.astype(_U64) << z64
    d16 = d_norm >> jnp.uint64(16)  # in [0x8000, 0xFFFF]

    # Table lookup: index = (d16 - 0x7FC0) >> 7, clamped to 256 (fixed.rs:200).
    table_idx = jnp.minimum((d16 - jnp.uint64(0x7FC0)) >> jnp.uint64(7), jnp.uint64(256))
    u_val = _UNR_TABLE_DEV[table_idx.astype(_I32)] + jnp.uint64(0x101)

    # Two Newton-Raphson iterations (fixed.rs:204-205).  No wrapping occurs:
    # d16*u <= 0xFFFF * 0x200 = 0x1FFFE00 < 0x2000080.
    nr1 = (jnp.uint64(0x2000080) - d16 * u_val) >> jnp.uint64(8)
    nr2 = (jnp.uint64(0x80) + nr1 * u_val) >> jnp.uint64(8)

    raw = n_abs * nr2
    shift = jnp.uint64(36) - z64  # z in [0,31] -> shift in [5,36], always < 64
    rounding = jnp.uint64(1) << (shift - jnp.uint64(1))
    magnitude = (raw + rounding) >> shift
    magnitude = jnp.minimum(magnitude, jnp.uint64(0x7FFFFFFF))

    signed = jnp.where(result_negative,
                       -magnitude.astype(_I64),
                       magnitude.astype(_I64)).astype(_I32)
    return jnp.where(den == 0, _I32(0), signed)


# =============================================================================
# PS1-style projection pipeline (fixed.rs:350-441)
# =============================================================================


def transform_to_camera_space(world_pos, camera_pos, basis):
    """fixed.rs:362: fixed-point relative position dotted with fixed basis.

    world_pos: (..., 3) f32;  camera_pos: (3,) or (..., 3) f32;
    basis: (3, 3) f32 rows (basis_x, basis_y, basis_z).
    Returns (..., 3) int32 4.12 camera-space coordinates.

    Operation order matches FixedVec3::dot (fixed.rs:311): x*bx + y*by + z*bz
    with left-associated wrapping adds.
    """
    wp = from_f32(world_pos)
    cp = from_f32(jnp.broadcast_to(jnp.asarray(camera_pos, _F32), wp.shape))
    rel = sub(wp, cp)
    b = from_f32(basis)  # (3,3) int32

    def dot_row(row):
        t0 = mul_fixed(rel[..., 0], row[..., 0])
        t1 = mul_fixed(rel[..., 1], row[..., 1])
        t2 = mul_fixed(rel[..., 2], row[..., 2])
        return add(add(t0, t1), t2)

    cx = dot_row(b[0])
    cy = dot_row(b[1])
    cz = dot_row(b[2])
    return jnp.stack([cx, cy, cz], axis=-1)


def project_to_screen(cam_fixed, width: int, height: int):
    """fixed.rs:390: 4.12 camera space -> integer screen coords + fixed depth.

    cam_fixed: (..., 3) int32.  Returns (sx, sy, depth_fixed) int32 arrays.
    """
    distance = from_f32(jnp.float32(5.0))          # 20480
    scale = from_f32(jnp.float32(4.0))             # 16384
    viewport_scale = from_f32(jnp.float32((min(width, height) / 2.0) * 0.75))
    half_w = from_int(width // 2)
    half_h = from_int(height // 2)

    cx, cy, cz = cam_fixed[..., 0], cam_fixed[..., 1], cam_fixed[..., 2]
    denom = add(cz, distance)
    near_zero = jnp.abs(denom) < 256  # ~0.0625 in 4.12 (fixed.rs:406)

    proj_x = div_unr(mul_fixed(cx, scale), denom)
    proj_y = div_unr(mul_fixed(cy, scale), denom)

    sx = floor(add(mul_fixed(proj_x, viewport_scale), half_w))
    sy = floor(add(mul_fixed(proj_y, viewport_scale), half_h))

    sx = jnp.where(near_zero, floor(half_w), sx)
    sy = jnp.where(near_zero, floor(half_h), sy)
    return sx, sy, cz


def project_fixed(world_pos, camera_pos, basis, width: int, height: int):
    """fixed.rs:424: full fixed pipeline, world -> integer screen coords.

    Returns (sx, sy, depth_f32) where depth is the fixed camera-z as f32
    (depth.to_f32()), matching the Rust return convention.
    """
    cam = transform_to_camera_space(world_pos, camera_pos, basis)
    sx, sy, depth = project_to_screen(cam, width, height)
    return sx, sy, to_f32(depth)

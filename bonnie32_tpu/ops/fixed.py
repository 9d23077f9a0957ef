"""PS1 GTE fixed-point lattice math, vectorized for TPU.

Replicates, as exact 32-bit integer array operations, the reference's
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

IMPLEMENTATION NOTE: everything here is pure 32-bit integer arithmetic
(16-bit-limb long multiplication for the 64-bit products).  XLA:TPU emulates
int64 by SCALARIZING — compile time explodes linearly with array size (a
700-vertex projection took minutes to compile) — whereas int32/uint32 ops
vectorize normally.  The limb forms are exact: products are reconstructed as
(hi32, lo32) pairs and shifted as bit ranges, so wrapping semantics match the
reference's i64 math bit-for-bit (validated against the scalar golden model).
"""

import jax
import jax.numpy as jnp
import numpy as np

_I32 = jnp.int32
_U32 = jnp.uint32
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
_UNR_TABLE_DEV = jnp.asarray(UNR_TABLE, dtype=_U32)


def from_f32(f):
    """Fixed32::from_f32 (fixed.rs:125): (f * 4096.0) as i32.

    Rust `as i32` truncates toward zero and saturates; NaN maps to 0.
    Pure f32/i32: the f32 values representable in [2^31-128, 2^31) are
    exactly {2147483520}, so clipping to that bound loses nothing, and
    anything >= 2^31 saturates to i32::MAX explicitly.
    """
    f = jnp.asarray(f, _F32)
    scaled = f * jnp.float32(ONE)
    t = jnp.trunc(scaled)
    t = jnp.where(jnp.isnan(t), 0.0, t)
    clipped = jnp.clip(t, -2147483648.0, 2147483520.0)
    i = clipped.astype(_I32)
    return jnp.where(t >= 2147483648.0, _I32(2147483647), i)


def from_int(n):
    """Fixed32::from_int (fixed.rs:119): n << 12 (wrapping)."""
    return (jnp.asarray(n, _I32) << FRAC_BITS).astype(_I32)


def to_f32(x):
    """Fixed32::to_f32 (fixed.rs:131): x as f32 / 4096.0."""
    return jnp.asarray(x, _I32).astype(_F32) / jnp.float32(ONE)


def floor(x):
    """Fixed32::floor (fixed.rs:137): arithmetic >> 12."""
    return jnp.asarray(x, _I32) >> FRAC_BITS


def _mul64(a, b):
    """Full 64-bit product of two i32 (two's complement), as (hi, lo) uint32.

    Signed product mod 2^64 equals the unsigned product of the bit patterns
    plus sign-correction terms: p_signed = p_unsigned - 2^32*(a<0 ? b : 0)
    - 2^32*(b<0 ? a : 0) (mod 2^64), which only affects the hi word.
    """
    a = jnp.asarray(a, _I32)
    b = jnp.asarray(b, _I32)
    au = a.astype(_U32)
    bu = b.astype(_U32)
    a0 = au & 0xFFFF
    a1 = au >> 16
    b0 = bu & 0xFFFF
    b1 = bu >> 16

    p00 = a0 * b0                      # <= (2^16-1)^2 < 2^32, exact in u32
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1

    # lo = p00 + ((p01 + p10) << 16), carries tracked manually
    mid = p01 + (p10 & 0xFFFFFFFF)     # may wrap: detect carry
    mid_carry = (mid < p01).astype(_U32)
    lo = p00 + (mid << 16)
    lo_carry = (lo < p00).astype(_U32)
    hi = p11 + (mid >> 16) + (mid_carry << 16) + lo_carry
    # sign correction for two's-complement interpretation
    hi = hi - jnp.where(a < 0, bu, _U32(0)) - jnp.where(b < 0, au, _U32(0))
    return hi, lo


def _shr64(hi, lo, shift):
    """(hi:lo) logical >> shift (0 <= shift <= 63), returns (hi, lo) u32."""
    shift = jnp.asarray(shift, _U32)
    s = shift & 31
    big = shift >= 32
    # note: x >> 32 is undefined per-lane; mask handles s in [0,31] only
    lo_small = jnp.where(s == 0, lo, (lo >> s) | (hi << ((32 - s) & 31)))
    hi_small = hi >> s
    lo_big = hi >> s
    return (jnp.where(big, _U32(0), hi_small),
            jnp.where(big, lo_big, lo_small))


def _add64(hi, lo, add_hi, add_lo):
    lo2 = lo + add_lo
    carry = (lo2 < lo).astype(_U32)
    return hi + add_hi + carry, lo2


def mul_fixed(a, b):
    """Fixed32::mul_fixed (fixed.rs:161): ((a as i64 * b as i64) >> 12) as i32.

    Truncation to i32 wraps (Rust `as`), so the result is simply bits 12..43
    of the 64-bit two's-complement product — pure bit extraction, no sign
    cases.
    """
    hi, lo = _mul64(a, b)
    return ((lo >> FRAC_BITS) | (hi << (32 - FRAC_BITS))).astype(_I32)


def add(a, b):
    """Wrapping i32 add (fixed.rs:233-239)."""
    return (jnp.asarray(a, _I32) + jnp.asarray(b, _I32)).astype(_I32)


def sub(a, b):
    """Wrapping i32 sub (fixed.rs:241-247)."""
    return (jnp.asarray(a, _I32) - jnp.asarray(b, _I32)).astype(_I32)


def div_unr(num, den):
    """PS1 GTE UNR division (fixed.rs:178-230), elementwise, 32-bit only.

    Both arguments are 4.12 fixed-point int32; the result is 4.12 int32 with
    the authentic ~2-3 bit data-dependent error pattern.
    """
    num = jnp.asarray(num, _I32)
    den = jnp.asarray(den, _I32)

    result_negative = (num < 0) != (den < 0)
    # unsigned_abs in u32 (two's complement negate handles i32::MIN).
    nu = num.astype(_U32)
    du = den.astype(_U32)
    n_abs = jnp.where(num < 0, (~nu) + _U32(1), nu)
    d_abs = jnp.where(den < 0, (~du) + _U32(1), du)

    # clz of the 32-bit absolute divisor (fixed.rs:192). den==0 handled at end.
    safe_d = jnp.where(d_abs == 0, _U32(1), d_abs)
    z = jax.lax.clz(safe_d.astype(_I32)).astype(_U32)

    # d16 = top 16 bits of the normalized divisor (in [0x8000, 0xFFFF]).
    d16 = (safe_d << z) >> _U32(16)

    # Table lookup: index = (d16 - 0x7FC0) >> 7, clamped to 256 (fixed.rs:200).
    # The 257-entry UNR table is formula-generated (fixed.rs:20-31), so the
    # entry is COMPUTED in-register instead of gathered — XLA gathers are
    # erratic on TPU and this sits in the per-vertex projection hot path
    # (PLAN_PERF.md fact #3).  quotient = 0x40000 // (idx + 0x100): the
    # divisor is in [256, 512], so non-integer quotients sit >= 1/512 from
    # an integer while the f32 divide errs <= 2 ulp (~2.4e-4) — trunc is
    # exact (test_fixed.py asserts all 257 entries match the table).
    table_idx = jnp.minimum((d16 - _U32(0x7FC0)) >> _U32(7), _U32(256))
    q = jnp.trunc(_F32(float(0x40000))
                  / (table_idx + _U32(0x100)).astype(_F32)).astype(_U32)
    u_val = jnp.maximum((q + _U32(1)) >> _U32(1), _U32(0x101))

    # Two Newton-Raphson iterations (fixed.rs:204-205); all intermediates
    # < 2^26 so u32 is exact.
    nr1 = (_U32(0x2000080) - d16 * u_val) >> _U32(8)
    nr2 = (_U32(0x80) + nr1 * u_val) >> _U32(8)   # < 2^18

    # raw = n_abs(31b) * nr2(18b): 49-bit product as (hi, lo) u32 limbs.
    nl = n_abs & 0xFFFF
    nh = n_abs >> 16                     # < 2^15
    rl = nr2 & 0xFFFF
    rh = nr2 >> 16                       # <= 3
    p_ll = nl * rl                       # < 2^32 (65535^2), exact
    p_hl = nh * rl                       # < 2^31
    p_lh = nl * rh                       # tiny
    p_hh = nh * rh                       # tiny
    mid = p_hl + p_lh                    # < 2^32, no wrap (2^31 + 2^18)
    lo = p_ll + (mid << 16)
    lo_carry = (lo < p_ll).astype(_U32)
    hi = p_hh + (mid >> 16) + lo_carry

    # rounding add: 1 << (shift-1), shift in [5, 36]
    shift = _U32(36) - z
    r_is_lo = shift <= 32                # shift-1 in [4,31] -> low word
    r_lo = jnp.where(r_is_lo, _U32(1) << ((shift - 1) & 31), _U32(0))
    r_hi = jnp.where(r_is_lo, _U32(0), _U32(1) << ((shift - 33) & 31))
    hi, lo = _add64(hi, lo, r_hi, r_lo)
    sh_hi, sh_lo = _shr64(hi, lo, shift)

    # clamp to i32::MAX (fixed.rs:223)
    over = (sh_hi != 0) | (sh_lo > _U32(0x7FFFFFFF))
    magnitude = jnp.where(over, _U32(0x7FFFFFFF), sh_lo)

    signed = jnp.where(result_negative,
                       (~magnitude) + _U32(1), magnitude).astype(_I32)
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

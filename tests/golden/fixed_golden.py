"""Scalar golden model of the PS1 GTE fixed-point math.

An independent, maximally-literal transcription of the semantics of
`/root/reference/src/rasterizer/fixed.rs` using Python arbitrary-precision
ints masked to the appropriate widths.  Used only by tests to validate the
vectorized TPU implementation (bonnie32_tpu/ops/fixed.py).
"""

import numpy as np

MASK32 = 0xFFFFFFFF
MASK64 = 0xFFFFFFFFFFFFFFFF


def _i32(x: int) -> int:
    """Wrap to signed 32-bit."""
    x &= MASK32
    return x - (1 << 32) if x >= (1 << 31) else x


def _sar32(x: int, n: int) -> int:
    """Arithmetic shift right of a signed 32-bit value."""
    return _i32(x) >> n  # Python >> on negative ints is arithmetic


UNR_TABLE = []
for i in range(257):
    div = i + 256
    quotient = 262144 // div
    val = (quotient + 1) // 2 - 257
    UNR_TABLE.append(val if val > 0 else 0)


def from_f32(f: float) -> int:
    """(f * 4096.0) as i32 — f32 multiply, truncate-saturate cast."""
    scaled = np.float32(f) * np.float32(4096.0)
    if np.isnan(scaled):
        return 0
    if scaled >= 2147483648.0:
        return 2147483647
    if scaled <= -2147483648.0:
        return -2147483648
    return int(scaled)  # trunc toward zero


def from_int(n: int) -> int:
    return _i32(n << 12)


def to_f32(x: int) -> float:
    return float(np.float32(np.float32(x) / np.float32(4096.0)))


def floor(x: int) -> int:
    return _sar32(x, 12)


def mul_fixed(a: int, b: int) -> int:
    result = (a * b) >> 12  # i64 product, arithmetic shift
    return _i32(result)


def add(a: int, b: int) -> int:
    return _i32(a + b)


def sub(a: int, b: int) -> int:
    return _i32(a - b)


def div_unr(num: int, den: int) -> int:
    """fixed.rs:178-230, literal."""
    if den == 0:
        return 0
    result_negative = (num < 0) != (den < 0)
    n = abs(num)  # unsigned_abs as u64
    d = abs(den)
    if d == 0:
        return 0

    # leading_zeros of u32
    z = 32 - d.bit_length()
    d_norm = (d << z) & MASK64
    d16 = d_norm >> 16

    table_idx = min(((d16 - 0x7FC0) & MASK64) >> 7, 256)
    u_val = UNR_TABLE[table_idx] + 0x101

    nr1 = ((0x2000080 - d16 * u_val) & MASK64) >> 8
    nr2 = ((0x80 + nr1 * u_val) & MASK64) >> 8

    raw = (n * nr2) & MASK64
    shift = (36 - z) & 0xFFFFFFFF

    if shift < 64:
        rounding = (1 << (shift - 1)) if shift > 0 else 0
        magnitude = ((raw + rounding) & MASK64) >> shift
    else:
        magnitude = 0

    clamped = min(magnitude, 0x7FFFFFFF)
    return -clamped if result_negative else clamped


def transform_to_camera_space(world_pos, camera_pos, basis_x, basis_y, basis_z):
    """fixed.rs:362 — all args float 3-tuples; returns int 4.12 3-tuple."""
    rel = [sub(from_f32(w), from_f32(c)) for w, c in zip(world_pos, camera_pos)]

    def dot(row):
        t0 = mul_fixed(rel[0], from_f32(row[0]))
        t1 = mul_fixed(rel[1], from_f32(row[1]))
        t2 = mul_fixed(rel[2], from_f32(row[2]))
        return add(add(t0, t1), t2)

    return (dot(basis_x), dot(basis_y), dot(basis_z))


def project_to_screen(cam, width: int, height: int):
    """fixed.rs:390 — cam is int 4.12 3-tuple."""
    distance = from_f32(5.0)
    scale = from_f32(4.0)
    viewport_scale = from_f32((min(width, height) / 2.0) * 0.75)
    half_w = from_int(width // 2)
    half_h = from_int(height // 2)

    cx, cy, cz = cam
    denom = add(cz, distance)
    if abs(denom) < 256:
        return (floor(half_w), floor(half_h), cz)

    proj_x = div_unr(mul_fixed(cx, scale), denom)
    proj_y = div_unr(mul_fixed(cy, scale), denom)

    sx = floor(add(mul_fixed(proj_x, viewport_scale), half_w))
    sy = floor(add(mul_fixed(proj_y, viewport_scale), half_h))
    return (sx, sy, cz)


def project_fixed(world_pos, camera_pos, basis_x, basis_y, basis_z,
                  width: int, height: int):
    """fixed.rs:424."""
    cam = transform_to_camera_space(world_pos, camera_pos, basis_x, basis_y, basis_z)
    sx, sy, depth = project_to_screen(cam, width, height)
    return (sx, sy, to_f32(depth))

"""PS1 RGB555 color lattice operations, vectorized for TPU.

Replicates the integer color pipeline of the reference
(`/root/reference/src/rasterizer/types.rs` and `render.rs`) as elementwise
int32 array ops:

  * Color15 pack/unpack (types.rs:20-160): `sRRRRRGG GGGBBBBB`, bit 15 = STP
    (semi-transparency), 0x0000 = transparent color key.
  * 5->8 bit expansion (v<<3)|(v>>2) (types.rs:141, render.rs:1161).
  * texture modulation (tex * vertex)/128 in 8-bit space (render.rs:1624).
  * the PS1 4x4 dither matrix and dither-quantize rule (render.rs:1150-1182).
  * RGB555 blending in 5-bit space (render.rs:1093-1145).

Colors travel as int32 lanes (native VPU width); u8/u16 semantics are enforced
by masking.  All functions are shape-polymorphic and jit/vmap friendly.
"""

import jax.numpy as jnp
import numpy as np

from ..config import BlendMode

_I32 = jnp.int32

TRANSPARENT = 0x0000
BLACK_DRAWABLE = 0x8000
WHITE = 0x7FFF
STP_BIT = 0x8000

# PS1 GPU dither matrix (render.rs:1150-1155), signed offsets -4..+3.
PS1_DITHER_MATRIX = np.array(
    [[-4, 0, -3, 1],
     [2, -2, 3, -1],
     [-3, 1, -4, 0],
     [3, -1, 2, -2]], dtype=np.int32)


def pack15(r5, g5, b5, stp=None):
    """Color15::new / new_semi (types.rs:41-56). Inputs clamped to 0-31."""
    r5 = jnp.minimum(jnp.asarray(r5, _I32), 31)
    g5 = jnp.minimum(jnp.asarray(g5, _I32), 31)
    b5 = jnp.minimum(jnp.asarray(b5, _I32), 31)
    c = (r5 << 10) | (g5 << 5) | b5
    if stp is not None:
        c = jnp.where(stp, c | STP_BIT, c)
    return c


def r5(c):
    return (jnp.asarray(c, _I32) >> 10) & 0x1F


def g5(c):
    return (jnp.asarray(c, _I32) >> 5) & 0x1F


def b5(c):
    return jnp.asarray(c, _I32) & 0x1F


def is_transparent(c):
    """types.rs:100 — the all-zero word is the color key."""
    return jnp.asarray(c, _I32) == 0


def is_semi_transparent(c):
    """types.rs:106 — bit 15."""
    return (jnp.asarray(c, _I32) & STP_BIT) != 0


def expand_5_to_8(v5):
    """(v5 << 3) | (v5 >> 2): 0->0, 31->255 (render.rs:1161)."""
    v5 = jnp.asarray(v5, _I32)
    return (v5 << 3) | (v5 >> 2)


def r8(c):
    return expand_5_to_8(r5(c))


def g8(c):
    return expand_5_to_8(g5(c))


def b8(c):
    return expand_5_to_8(b5(c))


def from_rgb888(r, g, b):
    """Color15::from_rgb888 (types.rs:60): quantize by >> 3."""
    return pack15(jnp.asarray(r, _I32) >> 3,
                  jnp.asarray(g, _I32) >> 3,
                  jnp.asarray(b, _I32) >> 3)


def to_rgba_channels(c):
    """Color15::to_rgba (types.rs:220): transparent -> (0,0,0,0)."""
    c = jnp.asarray(c, _I32)
    t = is_transparent(c)
    zero = jnp.zeros_like(c)
    return (jnp.where(t, zero, r8(c)),
            jnp.where(t, zero, g8(c)),
            jnp.where(t, zero, b8(c)),
            jnp.where(t, zero, jnp.full_like(c, 255)))


def modulate8(tex8, vertex8):
    """(tex * vertex) / 128, clamped to 255 (render.rs:1624-1626).

    8-bit-space modulation as used by rasterize_triangle_15; integer division
    truncates.
    """
    return jnp.minimum((jnp.asarray(tex8, _I32) * jnp.asarray(vertex8, _I32)) // 128, 255)


def dither_offset(x, y):
    """PS1_DITHER_MATRIX[y & 3][x & 3] (render.rs:1174)."""
    m = jnp.asarray(PS1_DITHER_MATRIX)
    return m[jnp.asarray(y, _I32) & 3, jnp.asarray(x, _I32) & 3]


def dither_and_quantize8(v8, offset):
    """((v8 + offset) >> 3).clamp(0, 31) (render.rs:1177).

    Bounds are explicit i32: python ints become weak i64 scalars under x64,
    which Mosaic's i64->i32 convert lowering cannot handle (recurses).
    """
    v = (jnp.asarray(v8, _I32) + offset) >> 3
    return jnp.minimum(jnp.maximum(v, _I32(0)), _I32(31))


def quantize8(v8):
    """Plain truncation v8 >> 3 (render.rs:1653)."""
    return jnp.asarray(v8, _I32) >> 3


def blend_rgb555(front8, back8, mode):
    """PS1 blend in 5-bit space (render.rs:1093-1145), elementwise.

    front8/back8: tuples of (r, g, b) int32 8-bit channels.
    mode: int32 array of BlendMode codes (may be per-pixel or scalar).
    Returns (r8, g8, b8) expanded back to 8-bit with a PLAIN left shift
    (render.rs:1143-1144 uses `r5 << 3`, not the `|>>2` expansion).
    """
    mode = jnp.asarray(mode, _I32)

    f = [jnp.asarray(v, _I32) >> 3 for v in front8]
    b = [jnp.asarray(v, _I32) >> 3 for v in back8]

    out = []
    for fc, bc in zip(f, b):
        avg = jnp.minimum((bc + fc) // 2, 31)
        add_ = jnp.minimum(bc + fc, 31)
        sub_ = jnp.maximum(bc - fc, 0)
        addq = jnp.minimum(bc + fc // 4, 31)
        v5 = jnp.where(mode == BlendMode.AVERAGE, avg,
             jnp.where(mode == BlendMode.ADD, add_,
             jnp.where(mode == BlendMode.SUBTRACT, sub_,
             jnp.where(mode == BlendMode.ADD_QUARTER, addq,
             jnp.where(mode == BlendMode.ERASE, bc, fc)))))
        out.append(v5 << 3)
    return tuple(out)


def pack_rgba8(r, g, b, a):
    """Pack four 8-bit channels into one int32 word (r | g<<8 | b<<16 | a<<24).

    Byte order matches the reference framebuffer's RGBA Vec<u8> layout
    (render.rs:10-14) when viewed little-endian.
    """
    return (jnp.asarray(r, _I32)
            | (jnp.asarray(g, _I32) << 8)
            | (jnp.asarray(b, _I32) << 16)
            | (jnp.asarray(a, _I32) << 24))


def unpack_rgba8(word):
    w = jnp.asarray(word, _I32)
    return (w & 0xFF), ((w >> 8) & 0xFF), ((w >> 16) & 0xFF), ((w >> 24) & 0xFF)

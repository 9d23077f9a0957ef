"""Scalar golden model of the RGB555 color pipeline.

Literal transcription of `/root/reference/src/rasterizer/types.rs` (Color15)
and `render.rs` (dither, blend) semantics, for validating the vectorized ops.
"""

PS1_DITHER_MATRIX = [
    [-4, 0, -3, 1],
    [2, -2, 3, -1],
    [-3, 1, -4, 0],
    [3, -1, 2, -2],
]

OPAQUE, AVERAGE, ADD, SUBTRACT, ADD_QUARTER, ERASE = range(6)


def r5(c): return (c >> 10) & 0x1F
def g5(c): return (c >> 5) & 0x1F
def b5(c): return c & 0x1F


def expand_5_to_8(v):
    return ((v << 3) | (v >> 2)) & 0xFF


def r8(c): return expand_5_to_8(r5(c))
def g8(c): return expand_5_to_8(g5(c))
def b8(c): return expand_5_to_8(b5(c))


def new_semi(r, g, b, semi):
    c = (min(r, 31) << 10) | (min(g, 31) << 5) | min(b, 31)
    if semi:
        c |= 0x8000
    return c


def modulate8(tex8, vertex8):
    """render.rs:1624: (tex8 * vertex8) / 128 clamped to 255 (u32 math)."""
    return min((tex8 * vertex8) // 128, 255)


def dither_and_quantize(r8v, g8v, b8v, x, y):
    """render.rs:1173-1182."""
    offset = PS1_DITHER_MATRIX[y & 3][x & 3]

    def q(v):
        return max(0, min(31, (v + offset) >> 3))
    return q(r8v), q(g8v), q(b8v)


def blend_rgb555(front_r, front_g, front_b, back_r, back_g, back_b, mode):
    """render.rs:1093-1145."""
    f = [front_r >> 3, front_g >> 3, front_b >> 3]
    b = [back_r >> 3, back_g >> 3, back_b >> 3]
    out = []
    for fc, bc in zip(f, b):
        if mode == OPAQUE:
            v = fc
        elif mode == AVERAGE:
            v = min((bc + fc) // 2, 31)
        elif mode == ADD:
            v = min(bc + fc, 31)
        elif mode == SUBTRACT:
            v = max(bc - fc, 0)
        elif mode == ADD_QUARTER:
            v = min(bc + fc // 4, 31)
        else:  # ERASE
            v = bc
        out.append((v << 3) & 0xFF)
    return tuple(out)

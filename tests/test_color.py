"""Exhaustive parity tests for the RGB555 color lattice ops."""

import numpy as np
import jax.numpy as jnp

from bonnie32_tpu.ops import color as col
from bonnie32_tpu.config import BlendMode
from golden import color_golden as gold


def test_unpack_expand_exhaustive():
    """All 2^16 Color15 words: channel extraction and 5->8 expansion."""
    c = np.arange(65536, dtype=np.int32)
    jc = jnp.asarray(c)

    def gr8(v):  # vectorized golden expansion
        v5 = (v >> 10) & 0x1F
        return (v5 << 3) | (v5 >> 2)

    def gg8(v):
        v5 = (v >> 5) & 0x1F
        return (v5 << 3) | (v5 >> 2)

    def gb8(v):
        v5 = v & 0x1F
        return (v5 << 3) | (v5 >> 2)

    np.testing.assert_array_equal(np.asarray(col.r5(jc)), (c >> 10) & 0x1F)
    np.testing.assert_array_equal(np.asarray(col.r8(jc)), gr8(c))
    np.testing.assert_array_equal(np.asarray(col.g8(jc)), gg8(c))
    np.testing.assert_array_equal(np.asarray(col.b8(jc)), gb8(c))
    np.testing.assert_array_equal(np.asarray(col.is_transparent(jc)), c == 0)
    np.testing.assert_array_equal(np.asarray(col.is_semi_transparent(jc)),
                                  (c & 0x8000) != 0)
    # spot-check the scalar golden agrees with the vectorized golden
    for v in [0, 1, 0x7FFF, 0x8000, 0xFFFF, 0x1234]:
        assert gold.r8(v) == gr8(np.int32(v))
        assert gold.g8(v) == gg8(np.int32(v))
        assert gold.b8(v) == gb8(np.int32(v))


def test_modulate_exhaustive():
    """All (tex8, vertex8) pairs: 256 x 256."""
    t, v = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
    ours = np.asarray(col.modulate8(jnp.asarray(t), jnp.asarray(v)))
    theirs = np.minimum((t * v) // 128, 255)
    np.testing.assert_array_equal(ours, theirs)


def test_dither_quantize_exhaustive():
    """All 8-bit values x all 16 matrix positions."""
    v = np.arange(256, dtype=np.int32)
    for y in range(4):
        for x in range(4):
            off = col.dither_offset(jnp.int32(x), jnp.int32(y))
            assert int(off) == gold.PS1_DITHER_MATRIX[y & 3][x & 3]
            ours = np.asarray(col.dither_and_quantize8(jnp.asarray(v), off))
            theirs = np.array([max(0, min(31, (int(i) + int(off)) >> 3)) for i in v])
            np.testing.assert_array_equal(ours, theirs)


def test_blend_modes_exhaustive_5bit():
    """All 32x32 (front5, back5) pairs x all 6 modes, per channel rule."""
    f5, b5 = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    f8 = (f5 << 3) | (f5 >> 2)
    b8 = (b5 << 3) | (b5 >> 2)
    for mode in BlendMode:
        ours = col.blend_rgb555(
            (jnp.asarray(f8), jnp.asarray(f8), jnp.asarray(f8)),
            (jnp.asarray(b8), jnp.asarray(b8), jnp.asarray(b8)),
            jnp.int32(int(mode)))
        ours_r = np.asarray(ours[0])
        theirs = np.empty_like(ours_r)
        for i in range(32):
            for j in range(32):
                theirs[i, j] = gold.blend_rgb555(
                    int(f8[i, j]), 0, 0, int(b8[i, j]), 0, 0, int(mode))[0]
        np.testing.assert_array_equal(ours_r, theirs, err_msg=str(mode))


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    r, g, b, a = [rng.integers(0, 256, 1000).astype(np.int32) for _ in range(4)]
    w = col.pack_rgba8(jnp.asarray(r), jnp.asarray(g), jnp.asarray(b), jnp.asarray(a))
    rr, gg, bb, aa = col.unpack_rgba8(w)
    np.testing.assert_array_equal(np.asarray(rr), r)
    np.testing.assert_array_equal(np.asarray(gg), g)
    np.testing.assert_array_equal(np.asarray(bb), b)
    np.testing.assert_array_equal(np.asarray(aa), a)


def test_to_rgba_transparent_key():
    c = jnp.asarray(np.array([0x0000, 0x8000, 0x7FFF], np.int32))
    r, g, b, a = col.to_rgba_channels(c)
    np.testing.assert_array_equal(np.asarray(a), [0, 255, 255])
    np.testing.assert_array_equal(np.asarray(r), [0, 0, 255])

"""Exact MXU-based gathers (one-hot matmuls).

TPU dynamic gathers of per-pixel indices are slow (~0.5 ms per 77k-element
gather on v5e), and the MXU's default f32 matmul precision is bf16-truncated.
These helpers express gathers as one-hot matmuls with
`jax.lax.Precision.HIGHEST`, which IS exact for one-hot selection: the bf16x3
operand split covers all 24 mantissa bits, the single nonzero column sums
exactly, and zero terms cannot perturb it.  Verified bit-equal to direct
gathers over randomized tables on hardware; ~5-10x faster at 320x240 scale.
"""

import jax
import jax.numpy as jnp

_F32 = jnp.float32
_I32 = jnp.int32

_HI = jax.lax.Precision.HIGHEST


def onehot_rows(table, idx):
    """table (T, C) f32; idx (...,) i32 in [0, T) -> (..., C) f32, exact."""
    t = table.shape[0]
    flat = idx.reshape(-1)
    oh = jax.nn.one_hot(flat, t, dtype=_F32)
    out = jnp.einsum("pt,tc->pc", oh, table, precision=_HI)
    return out.reshape(idx.shape + (table.shape[1],))


def onehot_values_u16(data, idx):
    """data (A,) i32 holding u16 values, A % 128 == 0; idx (...,) i32.

    Two-stage one-hot: row select via 8-bit plane matmuls (plane values are
    integers <= 255, exactly representable at default MXU precision), then a
    lane select.  Exact; ~8x faster than a direct gather at 320x240 scale.
    """
    a = data.shape[0]
    assert a % 128 == 0, "atlas data must be padded to a multiple of 128"
    r = a // 128
    lo8 = (data & 0xFF).reshape(r, 128).astype(_F32)
    hi8 = ((data >> 8) & 0xFF).reshape(r, 128).astype(_F32)

    flat = idx.reshape(-1)
    row = flat // 128
    lane = flat % 128
    oh_row = jax.nn.one_hot(row, r, dtype=_F32)
    oh_lane = jax.nn.one_hot(lane, 128, dtype=_F32)
    r_lo = jnp.einsum("pr,rk->pk", oh_row, lo8)
    r_hi = jnp.einsum("pr,rk->pk", oh_row, hi8)
    v_lo = jnp.sum(r_lo * oh_lane, axis=-1).astype(_I32)
    v_hi = jnp.sum(r_hi * oh_lane, axis=-1).astype(_I32)
    return (v_lo | (v_hi << 8)).reshape(idx.shape)


def onehot_values_u32(data, idx):
    """data (A,) i32 holding u32 bit patterns, A % 128 == 0; idx (...,) i32.

    Four 8-bit plane matmuls (plane values <= 255 are exact at default MXU
    precision); exact reconstruction of the 32-bit word.
    """
    a = data.shape[0]
    assert a % 128 == 0
    r = a // 128
    planes = [((data >> (8 * k)) & 0xFF).reshape(r, 128).astype(_F32)
              for k in range(4)]

    flat = idx.reshape(-1)
    row = flat // 128
    lane = flat % 128
    oh_row = jax.nn.one_hot(row, r, dtype=_F32)
    oh_lane = jax.nn.one_hot(lane, 128, dtype=_F32)
    out = jnp.zeros(flat.shape, _I32)
    for k, p in enumerate(planes):
        rk = jnp.einsum("pr,rk->pk", oh_row, p)
        vk = jnp.sum(rk * oh_lane, axis=-1).astype(_I32)
        out = out | (vk << (8 * k))
    return out.reshape(idx.shape)


# Atlases larger than this use direct gathers (one-hot row matrix would be
# too large); revisit with the Pallas kernel.
ONEHOT_ATLAS_LIMIT = 32768

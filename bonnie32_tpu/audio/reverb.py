"""PS1 SPU hardware reverb on TPU.

Replicates `/root/reference/src/tracker/psx_reverb.rs`: the nocash-spec SPU
reverb — IIR same-side/different-side wall reflections, 4 comb filters, 2
cascaded all-pass filters over a circular buffer, processed at 22050 Hz
half-rate with Q15 saturating arithmetic — as a `lax.scan` over samples with
the reverb work buffers carried as state.

The recurrence is inherently sequential per stream; parallelism comes from
batching independent streams (vmap leading axis), matching the framework's
instance-parallel design.  All arithmetic is int32 (Q15), bit-faithful to
the reference (validated against a scalar golden transcription).
"""

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .spu_tables import REVERB_PRESETS, REVERB_ORDER

_I32 = jnp.int32
_F32 = jnp.float32

BUFFER_SIZE = 0x20000  # psx_reverb.rs:280

# preset parameter vector layout (32 registers; psx_reverb.rs:70-105)
_IDX = dict(d_apf1=0, d_apf2=1, v_iir=2, v_comb1=3, v_comb2=4, v_comb3=5,
            v_comb4=6, v_wall=7, v_apf1=8, v_apf2=9, m_l_same=10, m_r_same=11,
            m_l_comb1=12, m_r_comb1=13, m_l_comb2=14, m_r_comb2=15,
            d_l_same=16, d_r_same=17, m_l_diff=18, m_r_diff=19,
            m_l_comb3=20, m_r_comb3=21, m_l_comb4=22, m_r_comb4=23,
            d_l_diff=24, d_r_diff=25, m_l_apf1=26, m_r_apf1=27,
            m_l_apf2=28, m_r_apf2=29, v_l_in=30, v_r_in=31)


def preset_params(reverb_type: int) -> np.ndarray:
    """Preset registers as int32 with i16 sign interpretation for volumes."""
    raw = np.asarray(REVERB_PRESETS[REVERB_ORDER[reverb_type]], np.int64)
    out = raw.copy()
    for name in ("v_iir", "v_comb1", "v_comb2", "v_comb3", "v_comb4",
                 "v_wall", "v_apf1", "v_apf2", "v_l_in", "v_r_in"):
        i = _IDX[name]
        v = raw[i]
        out[i] = v - 0x10000 if v >= 0x8000 else v
    return out.astype(np.int32)


class ReverbState(NamedTuple):
    buffer_l: jnp.ndarray  # (BUFFER_SIZE,) i32 (i16 values)
    buffer_r: jnp.ndarray
    pos: jnp.ndarray       # () i32
    accum: jnp.ndarray     # () f32 fractional 22.05 kHz accumulator


def init_state() -> ReverbState:
    return ReverbState(
        buffer_l=jnp.zeros(BUFFER_SIZE, _I32),
        buffer_r=jnp.zeros(BUFFER_SIZE, _I32),
        pos=jnp.asarray(0, _I32),
        accum=jnp.float32(0.0),
    )


def _mul_vol(sample, volume):
    """(sample * volume) >> 15, clamped to i16 (psx_reverb.rs:383)."""
    return jnp.clip((sample * volume) >> 15, -32768, 32767)


def _clamp16(x):
    return jnp.clip(x, -32768, 32767)


def process(state: ReverbState, left, right, reverb_type_params,
            wet_level, output_volume=1.0, rate_ratio=2.0,
            enabled=True) -> Tuple[ReverbState, jnp.ndarray, jnp.ndarray]:
    """Process f32 sample arrays through the reverb (psx_reverb.rs:477-520).

    left/right: (N,) f32 in [-1, 1].  reverb_type_params: (32,) i32 preset
    registers (see preset_params).  rate_ratio: output rate / 22050.
    Returns (new_state, left_out, right_out).
    """
    p = jnp.asarray(reverb_type_params, _I32)
    wet = jnp.asarray(wet_level, _F32)
    dry = 1.0 - wet
    vol = jnp.asarray(output_volume, _F32)
    enabled = jnp.asarray(enabled)

    def reg(name):
        return p[_IDX[name]]

    def sample22k(carry, lr_in):
        buf_l, buf_r, pos = carry
        l_in16, r_in16 = lr_in

        def rd(buf, off):
            return buf[(pos + off) % BUFFER_SIZE]

        def wr(buf, off, val):
            return buf.at[(pos + off) % BUFFER_SIZE].set(val)

        l_in = _mul_vol(l_in16, reg("v_l_in"))
        r_in = _mul_vol(r_in16, reg("v_r_in"))

        # same-side reflections (psx_reverb.rs:394-405)
        d_l_same = rd(buf_l, reg("d_l_same"))
        m_l_same_prev = rd(buf_l, (reg("m_l_same") - 2) & 0xFFFF)
        l_same_in = l_in + _mul_vol(d_l_same, reg("v_wall"))
        l_same = _mul_vol(l_same_in - m_l_same_prev, reg("v_iir")) + m_l_same_prev
        buf_l = wr(buf_l, reg("m_l_same"), _clamp16(l_same))

        d_r_same = rd(buf_r, reg("d_r_same"))
        m_r_same_prev = rd(buf_r, (reg("m_r_same") - 2) & 0xFFFF)
        r_same_in = r_in + _mul_vol(d_r_same, reg("v_wall"))
        r_same = _mul_vol(r_same_in - m_r_same_prev, reg("v_iir")) + m_r_same_prev
        buf_r = wr(buf_r, reg("m_r_same"), _clamp16(r_same))

        # different-side reflections (psx_reverb.rs:407-419)
        d_r_diff = rd(buf_r, reg("d_r_diff"))
        m_l_diff_prev = rd(buf_l, (reg("m_l_diff") - 2) & 0xFFFF)
        l_diff_in = l_in + _mul_vol(d_r_diff, reg("v_wall"))
        l_diff = _mul_vol(l_diff_in - m_l_diff_prev, reg("v_iir")) + m_l_diff_prev
        buf_l = wr(buf_l, reg("m_l_diff"), _clamp16(l_diff))

        d_l_diff = rd(buf_l, reg("d_l_diff"))
        m_r_diff_prev = rd(buf_r, (reg("m_r_diff") - 2) & 0xFFFF)
        r_diff_in = r_in + _mul_vol(d_l_diff, reg("v_wall"))
        r_diff = _mul_vol(r_diff_in - m_r_diff_prev, reg("v_iir")) + m_r_diff_prev
        buf_r = wr(buf_r, reg("m_r_diff"), _clamp16(r_diff))

        # comb filters (psx_reverb.rs:421-439)
        l_out = (_mul_vol(rd(buf_l, reg("m_l_comb1")), reg("v_comb1"))
                 + _mul_vol(rd(buf_l, reg("m_l_comb2")), reg("v_comb2"))
                 + _mul_vol(rd(buf_l, reg("m_l_comb3")), reg("v_comb3"))
                 + _mul_vol(rd(buf_l, reg("m_l_comb4")), reg("v_comb4")))
        r_out = (_mul_vol(rd(buf_r, reg("m_r_comb1")), reg("v_comb1"))
                 + _mul_vol(rd(buf_r, reg("m_r_comb2")), reg("v_comb2"))
                 + _mul_vol(rd(buf_r, reg("m_r_comb3")), reg("v_comb3"))
                 + _mul_vol(rd(buf_r, reg("m_r_comb4")), reg("v_comb4")))

        # all-pass 1 (psx_reverb.rs:441-451)
        l_ap1 = rd(buf_l, (reg("m_l_apf1") - reg("d_apf1")) & 0xFFFF)
        l_out = l_out - _mul_vol(l_ap1, reg("v_apf1"))
        buf_l = wr(buf_l, reg("m_l_apf1"), _clamp16(l_out))
        l_out = _mul_vol(l_out, reg("v_apf1")) + l_ap1

        r_ap1 = rd(buf_r, (reg("m_r_apf1") - reg("d_apf1")) & 0xFFFF)
        r_out = r_out - _mul_vol(r_ap1, reg("v_apf1"))
        buf_r = wr(buf_r, reg("m_r_apf1"), _clamp16(r_out))
        r_out = _mul_vol(r_out, reg("v_apf1")) + r_ap1

        # all-pass 2 (psx_reverb.rs:453-463)
        l_ap2 = rd(buf_l, (reg("m_l_apf2") - reg("d_apf2")) & 0xFFFF)
        l_out = l_out - _mul_vol(l_ap2, reg("v_apf2"))
        buf_l = wr(buf_l, reg("m_l_apf2"), _clamp16(l_out))
        l_out = _mul_vol(l_out, reg("v_apf2")) + l_ap2

        r_ap2 = rd(buf_r, (reg("m_r_apf2") - reg("d_apf2")) & 0xFFFF)
        r_out = r_out - _mul_vol(r_ap2, reg("v_apf2"))
        buf_r = wr(buf_r, reg("m_r_apf2"), _clamp16(r_out))
        r_out = _mul_vol(r_out, reg("v_apf2")) + r_ap2

        pos = (pos + 1) % BUFFER_SIZE
        return (buf_l, buf_r, pos), (_clamp16(l_out), _clamp16(r_out))

    def step(carry, lr):
        buf_l, buf_r, pos, accum, last_l, last_r = carry
        l, r = lr
        accum = accum + 1.0 / rate_ratio

        def do_process(args):
            buf_l, buf_r, pos, accum, _, _ = args
            l16 = jnp.clip(jnp.trunc(l * 32767.0), -32768, 32767).astype(_I32)
            r16 = jnp.clip(jnp.trunc(r * 32767.0), -32768, 32767).astype(_I32)
            (buf_l, buf_r, pos), (lw, rw) = sample22k((buf_l, buf_r, pos),
                                                      (l16, r16))
            return buf_l, buf_r, pos, accum - 1.0, lw, rw

        ticked = accum >= 1.0
        buf_l, buf_r, pos, accum, last_l, last_r = jax.lax.cond(
            ticked, do_process, lambda a: a,
            (buf_l, buf_r, pos, accum, last_l, last_r))

        # The reference mixes ONLY on 22.05 kHz ticks; other samples pass
        # through unmodified (psx_reverb.rs:495-519 writes inside the loop).
        lw = last_l.astype(_F32) / 32767.0
        rw = last_r.astype(_F32) / 32767.0
        out_l = jnp.where(enabled & ticked, (l * dry + lw * wet) * vol, l)
        out_r = jnp.where(enabled & ticked, (r * dry + rw * wet) * vol, r)
        return (buf_l, buf_r, pos, accum, last_l, last_r), (out_l, out_r)

    init = (state.buffer_l, state.buffer_r, state.pos, state.accum,
            jnp.asarray(0, _I32), jnp.asarray(0, _I32))
    (buf_l, buf_r, pos, accum, _, _), (out_l, out_r) = jax.lax.scan(
        step, init, (jnp.asarray(left, _F32), jnp.asarray(right, _F32)))
    return (ReverbState(buffer_l=buf_l, buffer_r=buf_r, pos=pos, accum=accum),
            out_l, out_r)

"""PS1 SPU Gaussian resampler on TPU.

Replicates the 4-tap Gaussian interpolation resampler of
`/root/reference/src/tracker/audio.rs:176-345`: downsample-by-averaging to
the SPU pitch rate, then re-interpolate at 44.1 kHz with the hardware's
512-entry Gaussian ROM indexed by bits 4-11 of the pitch counter — the
characteristic warm/muffled PS1 sound.

Sequential recurrence as `lax.scan`; batch independent streams with vmap.
"""

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .spu_tables import GAUSSIAN_TABLE

_F32 = jnp.float32
_I32 = jnp.int32

_TABLE = jnp.asarray(np.asarray(GAUSSIAN_TABLE, np.int32))

PITCH_NATIVE = 0x1000
PITCH_22K = 0x0800
PITCH_11K = 0x0400
PITCH_5K = 0x0200


class ResamplerState(NamedTuple):
    history_l: jnp.ndarray   # (4,) f32
    history_r: jnp.ndarray   # (4,) f32
    pitch_counter: jnp.ndarray  # () i32
    accum_l: jnp.ndarray     # () f32
    accum_r: jnp.ndarray     # () f32
    accum_count: jnp.ndarray  # () i32


def init_state() -> ResamplerState:
    return ResamplerState(
        history_l=jnp.zeros(4, _F32), history_r=jnp.zeros(4, _F32),
        pitch_counter=jnp.asarray(0, _I32),
        accum_l=jnp.float32(0.0), accum_r=jnp.float32(0.0),
        accum_count=jnp.asarray(0, _I32))


def _gauss(samples, gauss_idx):
    """audio.rs:252-268: table taps [0xFF-i], [0x1FF-i], [0x100+i], [i]."""
    g0 = _TABLE[0xFF - gauss_idx].astype(_F32)
    g1 = _TABLE[0x1FF - gauss_idx].astype(_F32)
    g2 = _TABLE[0x100 + gauss_idx].astype(_F32)
    g3 = _TABLE[gauss_idx].astype(_F32)
    return (g0 * samples[0] + g1 * samples[1] + g2 * samples[2]
            + g3 * samples[3]) / 32768.0


def process(state: ResamplerState, left, right, pitch: int,
            enabled=True) -> Tuple[ResamplerState, jnp.ndarray, jnp.ndarray]:
    """audio.rs:280-345.  pitch is static (0x1000/0x0800/0x0400/0x0200)."""
    if not (0 < pitch < PITCH_NATIVE):
        return state, jnp.asarray(left, _F32), jnp.asarray(right, _F32)

    ratio = PITCH_NATIVE // pitch
    enabled = jnp.asarray(enabled)

    def step(carry, lr):
        hl, hr, pc, al, ar, ac = carry
        l, r = lr
        al = al + l
        ar = ar + r
        ac = ac + 1

        def push(args):
            hl, hr, al, ar, ac = args
            cnt = ac.astype(_F32)
            avg_l = jnp.clip(al / cnt, -1.5, 1.5)
            avg_r = jnp.clip(ar / cnt, -1.5, 1.5)
            hl = jnp.concatenate([hl[1:], avg_l[None]])
            hr = jnp.concatenate([hr[1:], avg_r[None]])
            return hl, hr, jnp.float32(0.0), jnp.float32(0.0), jnp.asarray(0, _I32)

        hl, hr, al, ar, ac = jax.lax.cond(
            ac >= ratio, push, lambda a: a, (hl, hr, al, ar, ac))

        pc = pc + pitch
        gidx = (pc >> 4) & 0xFF
        out_l = jnp.clip(_gauss(hl, gidx), -1.5, 1.5)
        out_r = jnp.clip(_gauss(hr, gidx), -1.5, 1.5)
        pc = jnp.where(pc >= 0x1000, pc & 0xFFF, pc)

        out_l = jnp.where(enabled, out_l, l)
        out_r = jnp.where(enabled, out_r, r)
        return (hl, hr, pc, al, ar, ac), (out_l, out_r)

    init = (state.history_l, state.history_r, state.pitch_counter,
            state.accum_l, state.accum_r, state.accum_count)
    (hl, hr, pc, al, ar, ac), (out_l, out_r) = jax.lax.scan(
        step, init, (jnp.asarray(left, _F32), jnp.asarray(right, _F32)))
    return (ResamplerState(history_l=hl, history_r=hr, pitch_counter=pc,
                           accum_l=al, accum_r=ar, accum_count=ac),
            out_l, out_r)

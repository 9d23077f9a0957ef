"""Sample-based SoundFont synthesizer (the rustysynth-subset voice model).

Replaces the placeholder oscillator bank for song rendering when a
SoundFont is loaded, mirroring the reference's synthesis path
(`/root/reference/src/tracker/audio.rs:516-700`: rustysynth Synthesizer
fed by tracker note_on/note_off, rendered in blocks).  Implemented
generators (the set rustysynth's voice model applies to every note):

  * sample playback with loop modes 0 (none), 1 (continuous),
    3 (loop while key held), linear interpolation;
  * pitch: (key - rootKey) * scaleTuning + coarseTune*100 + fineTune
    cents, times sampleRate ratio;
  * DAHDSR volume envelope (timecents stages; attack linear in
    amplitude, decay/release linear in dB, sustain in centibels);
  * initialAttenuation (centibels), velocity curve (vel/127)^2,
    stereo pan (-500..500, constant-power).

The per-voice math is vectorized over the whole note duration (positions
are an affine ramp, the loop is a modulo, the envelope piecewise) — a
form that runs equally well in numpy on host or jnp on device.
"""

import math
from typing import List, NamedTuple, Optional, Tuple

import numpy as np

from .sf2 import Region, SoundFont

F32 = np.float32


def _timecents_to_sec(tc: int) -> float:
    """2^(tc/1200); the spec's -32768 'instant' floor maps to 0."""
    if tc <= -12000:
        return 0.0
    return float(2.0 ** (tc / 1200.0))


def region_pitch_ratio(region: Region, sf: SoundFont, key: int,
                       out_rate: int) -> float:
    cents = ((key - region.root_key) * region.scale_tuning
             + region.coarse_tune * 100 + region.fine_tune)
    sr = sf.sample_headers[region.sample].sample_rate
    return float(2.0 ** (cents / 1200.0)) * sr / out_rate


def envelope(region: Region, n_on: int, n_total: int,
             out_rate: int) -> np.ndarray:
    """DAHDSR amplitude envelope over n_total frames, key released at
    frame n_on.  Attack ramps linearly in amplitude; decay/release ramp
    linearly in dB (exponential amplitude); sustain holds at
    -sustain_cB/10 dB."""
    t = np.arange(n_total, dtype=np.float64) / out_rate
    t_delay = _timecents_to_sec(region.delay_vol_env)
    t_attack = _timecents_to_sec(region.attack_vol_env)
    t_hold = _timecents_to_sec(region.hold_vol_env)
    t_decay = _timecents_to_sec(region.decay_vol_env)
    t_release = _timecents_to_sec(region.release_vol_env)
    sus_db = min(max(region.sustain_vol_env, 0), 1440) / 10.0

    a0 = t_delay
    a1 = a0 + t_attack
    h1 = a1 + t_hold
    d1 = h1 + t_decay

    # held portion
    amp = np.zeros(n_total, np.float64)
    in_attack = (t >= a0) & (t < a1)
    if t_attack > 0:
        amp[in_attack] = (t[in_attack] - a0) / t_attack
    amp[(t >= a1) & (t < h1)] = 1.0
    in_decay = (t >= h1) & (t < d1)
    if t_decay > 0:
        frac = (t[in_decay] - h1) / t_decay
        amp[in_decay] = 10.0 ** (-sus_db * frac / 20.0)
    sus_amp = 10.0 ** (-sus_db / 20.0)
    amp[t >= d1] = sus_amp

    # release from the level at note-off
    if n_on < n_total:
        level_off = amp[n_on] if n_on > 0 else 0.0
        tr = t[n_on:] - t[n_on]
        if t_release > 0:
            # -100 dB over t_release scaled from current level (linear dB)
            rel = level_off * 10.0 ** (-100.0 * (tr / t_release) / 20.0)
        else:
            rel = np.zeros(n_total - n_on)
        rel[tr >= t_release] = 0.0
        amp[n_on:] = np.minimum(amp[n_on:], rel)
    return amp.astype(F32)


def sample_positions(region: Region, ratio: float, n_total: int,
                     key_held_frames: int) -> Tuple[np.ndarray, np.ndarray]:
    """(positions f64, active mask) for n_total output frames.

    Loop modes: 0/2 play start..end once; 1 loops [start_loop, end_loop)
    forever; 3 loops while the key is held, then runs to `end`."""
    pos = region.start + np.arange(n_total, dtype=np.float64) * ratio
    mode = region.sample_modes
    loop_len = max(region.end_loop - region.start_loop, 1)
    if mode == 1:
        over = pos >= region.end_loop
        pos = np.where(over,
                       region.start_loop
                       + np.mod(pos - region.start_loop, loop_len), pos)
        active = np.ones(n_total, bool)
    elif mode == 3:
        held = np.arange(n_total) < key_held_frames
        wrapped = np.where(pos >= region.end_loop,
                           region.start_loop
                           + np.mod(pos - region.start_loop, loop_len), pos)
        # after release, continue from the wrapped position at release
        # time and run linearly to the sample end
        if key_held_frames < n_total and key_held_frames > 0:
            p_rel = wrapped[key_held_frames - 1]
            tail = p_rel + (np.arange(n_total - key_held_frames) + 1) * ratio
            pos = np.concatenate([wrapped[:key_held_frames], tail])
        else:
            pos = wrapped
        active = pos < region.end
        active[:min(key_held_frames, n_total)] = True
    else:
        active = pos < region.end
    return pos, active


def render_voice(sf: SoundFont, region: Region, key: int, vel: int,
                 n_on: int, n_total: int, out_rate: int
                 ) -> Tuple[np.ndarray, float, float]:
    """One voice's mono signal over n_total frames plus (left, right)
    gains.  n_on = frames until note-off."""
    ratio = region_pitch_ratio(region, sf, key, out_rate)
    pos, active = sample_positions(region, ratio, n_total, n_on)

    smp = sf.samples
    i0 = np.clip(pos.astype(np.int64), 0, len(smp) - 1)
    i1 = np.clip(i0 + 1, 0, len(smp) - 1)
    frac = (pos - np.floor(pos)).astype(np.float64)
    wave = (smp[i0] * (1.0 - frac) + smp[i1] * frac) / 32768.0

    env = envelope(region, n_on, n_total, out_rate)
    att_db = min(max(region.initial_attenuation, 0), 1440) / 10.0
    vgain = (vel / 127.0) ** 2 * 10.0 ** (-att_db / 20.0)
    sig = (wave * env * active * vgain).astype(F32)

    # constant-power pan, -500..500 -> 0..1
    p = (min(max(region.pan, -500), 500) + 500) / 1000.0
    gl = math.cos(p * math.pi / 2.0)
    gr = math.sin(p * math.pi / 2.0)
    return sig, gl, gr


class NoteEvent(NamedTuple):
    start_frame: int
    off_frame: int           # key release frame (absolute)
    end_frame: int           # render cutoff (absolute, incl. release tail)
    key: int
    vel: int
    bank: int
    program: int


def render_events(sf: SoundFont, events: List[NoteEvent], n_frames: int,
                  out_rate: int) -> Tuple[np.ndarray, np.ndarray]:
    """Mix note events into stereo f32 buffers."""
    left = np.zeros(n_frames, F32)
    right = np.zeros(n_frames, F32)
    for ev in events:
        preset = sf.find_preset(ev.bank, ev.program)
        if preset is None:
            continue
        n_total = min(ev.end_frame, n_frames) - ev.start_frame
        if n_total <= 0:
            continue
        n_on = max(min(ev.off_frame, ev.end_frame) - ev.start_frame, 0)
        for region in preset.regions:
            if not (region.key_lo <= ev.key <= region.key_hi
                    and region.vel_lo <= ev.vel <= region.vel_hi):
                continue
            sig, gl, gr = render_voice(sf, region, ev.key, ev.vel,
                                       n_on, n_total, out_rate)
            sl = ev.start_frame
            left[sl:sl + n_total] += sig * F32(gl)
            right[sl:sl + n_total] += sig * F32(gr)
    return left, right

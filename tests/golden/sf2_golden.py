"""Scalar (per-sample python loop) oracle for the SF2 voice model.

Implements the same SoundFont semantics as bonnie32_tpu/audio/sf2_synth.py
— pitch ratio, loop modes, linear interpolation, DAHDSR envelope,
attenuation/velocity/pan — one output frame at a time, with no vectorized
shortcuts, so structural bugs in the vectorized path can't self-confirm.
"""

import math


def timecents_to_sec(tc):
    if tc <= -12000:
        return 0.0
    return 2.0 ** (tc / 1200.0)


def render_voice_scalar(samples, sample_rate_sf, region, key, vel,
                        n_on, n_total, out_rate):
    """region: audio.sf2.Region.  Returns list of mono floats."""
    cents = ((key - region.root_key) * region.scale_tuning
             + region.coarse_tune * 100 + region.fine_tune)
    ratio = (2.0 ** (cents / 1200.0)) * sample_rate_sf / out_rate

    t_delay = timecents_to_sec(region.delay_vol_env)
    t_attack = timecents_to_sec(region.attack_vol_env)
    t_hold = timecents_to_sec(region.hold_vol_env)
    t_decay = timecents_to_sec(region.decay_vol_env)
    t_release = timecents_to_sec(region.release_vol_env)
    sus_db = min(max(region.sustain_vol_env, 0), 1440) / 10.0
    sus_amp = 10.0 ** (-sus_db / 20.0)
    att_db = min(max(region.initial_attenuation, 0), 1440) / 10.0
    vgain = (vel / 127.0) ** 2 * 10.0 ** (-att_db / 20.0)

    a0 = t_delay
    a1 = a0 + t_attack
    h1 = a1 + t_hold
    d1 = h1 + t_decay

    def held_env(tt):
        if tt < a0:
            return 0.0
        if tt < a1:
            return (tt - a0) / t_attack if t_attack > 0 else 1.0
        if tt < h1:
            return 1.0
        if tt < d1:
            frac = (tt - h1) / t_decay
            return 10.0 ** (-sus_db * frac / 20.0)
        return sus_amp

    t_off = n_on / out_rate
    level_off = held_env((n_on) / out_rate) if n_on > 0 else 0.0

    loop_len = max(region.end_loop - region.start_loop, 1)
    mode = region.sample_modes

    out = []
    # mode-3 tail bookkeeping (matches sample_positions): the position at
    # the LAST held frame continues linearly afterwards
    p_rel = None
    for i in range(n_total):
        pos = region.start + i * ratio
        active = True
        if mode == 1:
            if pos >= region.end_loop:
                pos = region.start_loop + math.fmod(
                    pos - region.start_loop, loop_len)
        elif mode == 3:
            if i < n_on:
                if pos >= region.end_loop:
                    pos = region.start_loop + math.fmod(
                        pos - region.start_loop, loop_len)
                p_last_held = pos
                if i == n_on - 1:
                    p_rel = pos
            else:
                base = p_rel if p_rel is not None else region.start
                pos = base + (i - (n_on - 1)) * ratio
                active = pos < region.end
        else:
            active = pos < region.end

        i0 = int(pos)
        i0 = min(max(i0, 0), len(samples) - 1)
        i1 = min(i0 + 1, len(samples) - 1)
        frac = pos - math.floor(pos)
        wave = (samples[i0] * (1.0 - frac) + samples[i1] * frac) / 32768.0

        tt = i / out_rate
        env = held_env(tt)
        if i >= n_on:
            tr = tt - t_off
            if t_release > 0 and tr < t_release:
                rel = level_off * 10.0 ** (-100.0 * (tr / t_release) / 20.0)
            else:
                rel = 0.0
            env = min(env, rel)

        out.append(wave * env * vgain * (1.0 if active else 0.0))
    return out

"""Scalar (per-sample python loop) oracle for the SF2 voice model.

Implements the same SoundFont semantics as bonnie32_tpu/audio/sf2_synth.py
— pitch ratio, loop modes, linear interpolation, DAHDSR envelopes, the
mod/vib LFOs, the per-block resonant low-pass, tremolo, and
attenuation/velocity/pan — one output frame at a time, with no vectorized
shortcuts, so structural bugs in the vectorized path can't self-confirm.
"""

import math

BLOCK = 64
CENTS_REF_HZ = 8.176


def timecents_to_sec(tc):
    if tc <= -12000:
        return 0.0
    return 2.0 ** (tc / 1200.0)


def lfo_at(delay_tc, freq_cents, tt):
    """Triangle LFO (0 until delay, then 0 -> 1 -> -1 -> 0 per period)."""
    delay = timecents_to_sec(delay_tc)
    if tt < delay:
        return 0.0
    freq = CENTS_REF_HZ * 2.0 ** (freq_cents / 1200.0)
    phase = math.fmod((tt - delay) * freq, 1.0)
    if phase < 0.25:
        return 4.0 * phase
    if phase < 0.75:
        return 2.0 - 4.0 * phase
    return 4.0 * phase - 4.0


def mod_env_at(region, key, tt, t_off):
    """Modulation envelope value at time tt (linear attack/decay/release,
    sustain = 1 - sustainModEnv/1000)."""
    t_delay = timecents_to_sec(region.delay_mod_env)
    t_attack = timecents_to_sec(region.attack_mod_env)
    t_hold = timecents_to_sec(
        region.hold_mod_env + region.keynum_to_mod_hold * (60 - key))
    t_decay = timecents_to_sec(
        region.decay_mod_env + region.keynum_to_mod_decay * (60 - key))
    t_release = timecents_to_sec(region.release_mod_env)
    sus = min(max(1.0 - region.sustain_mod_env / 1000.0, 0.0), 1.0)
    a0 = t_delay
    a1 = a0 + t_attack
    h1 = a1 + t_hold
    d1 = h1 + t_decay

    def held(x):
        if x < a0:
            return 0.0
        if x < a1:
            return (x - a0) / t_attack if t_attack > 0 else 0.0
        if x < h1:
            return 1.0
        if x < d1:
            frac = (x - h1) / t_decay
            return sus + (1.0 - sus) * (1.0 - frac)
        return sus

    v = held(tt)
    if tt >= t_off:
        level_off = held(t_off) if t_off > 0 else 0.0
        if t_release > 0:
            rel = level_off * max(1.0 - (tt - t_off) / t_release, 0.0)
        else:
            rel = 0.0
        v = min(v, rel)
    return v


def render_voice_scalar(samples, sample_rate_sf, region, key, vel,
                        n_on, n_total, out_rate):
    """region: audio.sf2.Region.  Returns list of mono floats."""
    cents = ((key - region.root_key) * region.scale_tuning
             + region.coarse_tune * 100 + region.fine_tune)
    ratio = (2.0 ** (cents / 1200.0)) * sample_rate_sf / out_rate

    t_delay = timecents_to_sec(region.delay_vol_env)
    t_attack = timecents_to_sec(region.attack_vol_env)
    t_hold = timecents_to_sec(
        region.hold_vol_env + region.keynum_to_vol_hold * (60 - key))
    t_decay = timecents_to_sec(
        region.decay_vol_env + region.keynum_to_vol_decay * (60 - key))
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

    # --- modulators (mirror sf2_synth._has_modulators) ---
    fc0_hz = CENTS_REF_HZ * 2.0 ** (region.initial_filter_fc / 1200.0)
    modulated = (fc0_hz < 0.499 * out_rate
                 or region.mod_lfo_to_pitch != 0
                 or region.vib_lfo_to_pitch != 0
                 or region.mod_env_to_pitch != 0
                 or region.mod_lfo_to_volume != 0
                 or region.mod_lfo_to_filter_fc < 0
                 or region.mod_env_to_filter_fc < 0)
    pitch_mod = modulated and (region.mod_lfo_to_pitch
                               or region.vib_lfo_to_pitch
                               or region.mod_env_to_pitch)
    filter_on = modulated and (fc0_hz < 0.499 * out_rate
                               or region.mod_lfo_to_filter_fc
                               or region.mod_env_to_filter_fc)
    trem_on = modulated and region.mod_lfo_to_volume != 0

    def pitch_cents_at(tt):
        return (region.mod_lfo_to_pitch
                * lfo_at(region.delay_mod_lfo, region.freq_mod_lfo, tt)
                + region.vib_lfo_to_pitch
                * lfo_at(region.delay_vib_lfo, region.freq_vib_lfo, tt)
                + region.mod_env_to_pitch
                * mod_env_at(region, key, tt, t_off))

    q_linear = max(10.0 ** (region.initial_filter_q / 200.0),
                   math.sqrt(0.5))

    # pass 1: positions (cumulative ramp with per-block rates) + raw wave
    raw = []
    actives = []
    r = 0.0        # cumulative ramp (matches cumsum([0, rates[:-1]]))
    r_rel = None   # ramp value at frame n_on - 1 (mode-3 tail base)
    p_rel = None
    rate_cache = {}
    for i in range(n_total):
        if i > 0:
            j = i - 1
            if pitch_mod:
                b = j // BLOCK
                if b not in rate_cache:
                    cb = pitch_cents_at((b * BLOCK) / out_rate)
                    rate_cache[b] = ratio * 2.0 ** (cb / 1200.0)
                r += rate_cache[b]
            else:
                r += ratio
        pos = region.start + r
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
                if i == n_on - 1:
                    p_rel = pos
                    r_rel = r
            else:
                if p_rel is not None:
                    pos = p_rel + (r - r_rel)
                active = pos < region.end
        else:
            active = pos < region.end

        i0 = int(pos)
        i0 = min(max(i0, 0), len(samples) - 1)
        i1 = min(i0 + 1, len(samples) - 1)
        frac = pos - math.floor(pos)
        raw.append((samples[i0] * (1.0 - frac)
                    + samples[i1] * frac) / 32768.0)
        actives.append(active)

    # pass 2: per-block low-pass (DF-I history carried across blocks)
    if filter_on:
        filt = []
        x1 = x2 = y1 = y2 = 0.0
        for b0 in range(0, n_total, BLOCK):
            blk = raw[b0:b0 + BLOCK]
            tb = (b0 // BLOCK) * BLOCK / out_rate
            cents = (region.mod_lfo_to_filter_fc
                     * lfo_at(region.delay_mod_lfo, region.freq_mod_lfo, tb)
                     + region.mod_env_to_filter_fc
                     * mod_env_at(region, key, tb, t_off))
            fc = fc0_hz * 2.0 ** (cents / 1200.0)
            if fc >= 0.499 * out_rate:
                filt.extend(blk)
                if len(blk) >= 2:
                    x2, x1 = blk[-2], blk[-1]
                    y2, y1 = blk[-2], blk[-1]
                continue
            w = 2.0 * math.pi * fc / out_rate
            alpha = math.sin(w) / (2.0 * q_linear)
            cosw = math.cos(w)
            a0f = 1.0 + alpha
            fb0 = (1 - cosw) / 2 / a0f
            fb1 = (1 - cosw) / a0f
            fb2 = (1 - cosw) / 2 / a0f
            fa1 = -2 * cosw / a0f
            fa2 = (1 - alpha) / a0f
            for x in blk:
                y = fb0 * x + fb1 * x1 + fb2 * x2 - fa1 * y1 - fa2 * y2
                filt.append(y)
                x2, x1 = x1, x
                y2, y1 = y1, y
        raw = filt

    out = []
    for i in range(n_total):
        wave = raw[i]
        if trem_on:
            tb = (i // BLOCK) * BLOCK / out_rate
            db = 0.1 * region.mod_lfo_to_volume * lfo_at(
                region.delay_mod_lfo, region.freq_mod_lfo, tb)
            wave = wave * 10.0 ** (db / 20.0)

        tt = i / out_rate
        env = held_env(tt)
        if i >= n_on:
            tr = tt - t_off
            if t_release > 0 and tr < t_release:
                rel = level_off * 10.0 ** (-100.0 * (tr / t_release) / 20.0)
            else:
                rel = 0.0
            env = min(env, rel)

        out.append(wave * env * vgain * (1.0 if actives[i] else 0.0))
    return out

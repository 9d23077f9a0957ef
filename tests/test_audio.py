"""Audio: song IO, SPU reverb and resampler parity, song rendering."""

import glob

import numpy as np
import jax
import jax.numpy as jnp

from bonnie32_tpu.audio import song as song_mod
from bonnie32_tpu.audio import reverb as rvb
from bonnie32_tpu.audio import resampler as rsp
from bonnie32_tpu.audio import engine

from golden import audio_golden as gold

SONGS = "/root/reference/assets/samples/songs"


def test_load_sample_songs():
    files = sorted(glob.glob(f"{SONGS}/*.ron"))
    assert len(files) >= 3
    for f in files:
        s = song_mod.load_song(f)
        assert s.bpm > 0
        assert len(s.patterns) >= 1
        assert len(s.arrangement) >= 1
        assert s.total_rows() > 0
        # round trip
        import tempfile, os
        with tempfile.NamedTemporaryFile(suffix=".ron", delete=False) as tf:
            song_mod.save_song(s, tf.name)
            s2 = song_mod.load_song(tf.name)
            os.unlink(tf.name)
        assert s2.bpm == s.bpm
        assert s2.total_rows() == s.total_rows()
        p1 = s.patterns[0].channels[0]
        p2 = s2.patterns[0].channels[0]
        assert [n.pitch for n in p1] == [n.pitch for n in p2]


def test_reverb_matches_golden():
    rng = np.random.default_rng(0)
    n = 2000
    left = (rng.standard_normal(n) * 0.3).astype(np.float32)
    right = (rng.standard_normal(n) * 0.3).astype(np.float32)

    params = rvb.preset_params(1)  # Room
    pdict = {k: int(params[v]) for k, v in rvb._IDX.items()}

    g = gold.GoldReverb(pdict)
    gl, gr = g.process(left.copy(), right.copy(), wet=0.5)

    state = rvb.init_state()
    _, jl, jr = jax.jit(rvb.process)(
        state, jnp.asarray(left), jnp.asarray(right), jnp.asarray(params),
        jnp.float32(0.5))
    np.testing.assert_allclose(np.asarray(jl), gl, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jr), gr, atol=1e-6)
    # reverb actually does something
    assert not np.allclose(np.asarray(jl), left)


def test_reverb_off_passthrough():
    left = np.linspace(-0.5, 0.5, 500).astype(np.float32)
    state = rvb.init_state()
    _, jl, jr = rvb.process(state, jnp.asarray(left), jnp.asarray(left),
                            jnp.asarray(rvb.preset_params(0)),
                            jnp.float32(0.5), enabled=False)
    np.testing.assert_array_equal(np.asarray(jl), left)


def test_resampler_matches_golden():
    rng = np.random.default_rng(1)
    n = 3000
    left = (rng.standard_normal(n) * 0.4).astype(np.float32)
    right = (rng.standard_normal(n) * 0.4).astype(np.float32)

    for pitch in (rsp.PITCH_22K, rsp.PITCH_11K):
        g = gold.GoldResampler(pitch)
        gl, gr = g.process(left.copy(), right.copy())
        st = rsp.init_state()
        _, jl, jr = jax.jit(rsp.process, static_argnames=("pitch",))(
            st, jnp.asarray(left), jnp.asarray(right), pitch=pitch)
        np.testing.assert_allclose(np.asarray(jl), gl, atol=2e-6,
                                   err_msg=f"pitch {pitch:#x}")
        np.testing.assert_allclose(np.asarray(jr), gr, atol=2e-6)
        # muffling: high-frequency energy reduced
        def hf(x):
            return np.abs(np.diff(x)).mean()
        assert hf(np.asarray(jl)) < hf(left)


def test_render_sample_song():
    files = sorted(glob.glob(f"{SONGS}/*.ron"))
    s = song_mod.load_song(files[0])
    left, right = engine.render_song(s, seconds=1.0)
    assert left.shape == (44100,)
    assert np.abs(left).max() > 0.01, "song renders audible output"
    assert np.abs(left).max() <= 2.0

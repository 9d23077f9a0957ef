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


# ---------------------------------------------------------------------------
# Song browser (song_browser.rs)
# ---------------------------------------------------------------------------

def test_song_browser_discovery_and_flow(tmp_path):
    from bonnie32_tpu.audio import song as song_mod
    from bonnie32_tpu.audio.song_browser import (SongBrowser, SongCategory,
                                                 SongInfo,
                                                 discover_songs_from_dir,
                                                 next_available_song_name)

    d = tmp_path / "songs"
    d.mkdir()
    s = song_mod.Song(name="t")
    song_mod.save_song(s, str(d / "song_002.ron"))
    song_mod.save_song(s, str(d / "alpha.ron"))
    found = discover_songs_from_dir(str(d), SongCategory.SAMPLE)
    assert [f.name for f in found] == ["alpha", "song_002"]

    assert next_available_song_name(found, []).endswith("song_003.ron")
    assert next_available_song_name([], []).endswith("song_001.ron")

    br = SongBrowser()
    br.open(found)
    br.select(1)
    assert br.is_sample_selected()
    loaded = br.load_selected(song_mod.load_song)
    assert loaded is not None and not br.open_flag


def test_song_browser_user_listing_and_delete(tmp_path):
    from bonnie32_tpu.audio import song as song_mod
    from bonnie32_tpu.audio.song_browser import (SongBrowser,
                                                 USER_SONGS_PATH)
    from bonnie32_tpu.storage import Storage
    from bonnie32_tpu.storage.local import LocalStorage

    storage = Storage(local=LocalStorage(base_dir=str(tmp_path)))
    s = song_mod.Song(name="t")
    p = tmp_path / USER_SONGS_PATH
    p.mkdir(parents=True)
    song_mod.save_song(s, str(p / "mine.ron"))
    br = SongBrowser()
    br.open([], storage=storage)
    assert br.is_loading_user_songs() or True
    for _ in range(50):
        br.poll()
        if not br.is_loading_user_songs():
            break
    assert [u.name for u in br.user_songs] == ["mine"]
    br.select(0)
    assert br.is_user_selected()
    assert br.delete_selected(storage)
    assert br.user_songs == []

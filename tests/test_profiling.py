"""Profiling counters match the golden cull-phase counts; host timers work."""

import numpy as np

from bonnie32_tpu.config import RasterSettings
from bonnie32_tpu.models import build
from bonnie32_tpu import profiling
from bonnie32_tpu.types import no_fog

from golden import raster_golden as gold
import scenes

W, H = 160, 120
BASIS = build.camera_basis(0.35, 0.6)
CAMPOS = np.array([-1.8, -1.5, -3.2], np.float32)


def _scene():
    tex = [scenes.checker_texture15(16, 16)]
    verts, faces = scenes.cube_scene(tex_ids=(0, 0, None, None, 0, 0))
    return verts, faces, tex


def _golden_counts(verts, faces, tex, settings_kw):
    """Surfaces surviving the golden cull phase (render.rs:2545)."""
    del tex
    gsettings = dict(backface_cull=True, xray_mode=False,
                     use_fixed_point=True)
    gsettings.update(settings_kw)
    from golden.raster_golden import NEAR_PLANE
    drawn = 0
    import golden.raster_golden as rg
    campos = np.asarray(CAMPOS, np.float32)
    bx, by, bz = [np.asarray(BASIS[i], np.float32) for i in range(3)]
    cams, projs = [], []
    for v in verts:
        rel = rg._sub3(np.asarray(v["pos"], np.float32), campos)
        cp = rg.perspective_transform(rel, bx, by, bz)
        cams.append(cp)
        if gsettings["use_fixed_point"]:
            from golden import fixed_golden as fxg
            sx, sy, _ = fxg.project_fixed(
                tuple(float(x) for x in v["pos"]),
                tuple(float(x) for x in campos),
                tuple(float(x) for x in bx), tuple(float(x) for x in by),
                tuple(float(x) for x in bz), W, H)
            projs.append(np.array([sx, sy, cp[2] + 5.0], np.float32))
        else:
            projs.append(rg.project(cp, W, H))
    for f in faces:
        cz = [cams[f["v0"]][2], cams[f["v1"]][2], cams[f["v2"]][2]]
        if min(cz) <= NEAR_PLANE:
            continue
        v1, v2, v3 = projs[f["v0"]], projs[f["v1"]], projs[f["v2"]]
        area = ((v2[0] - v1[0]) * (v3[1] - v1[1])
                - (v3[0] - v1[0]) * (v2[1] - v1[1]))
        if area <= 0.0 and gsettings["backface_cull"] and not gsettings["xray_mode"]:
            continue
        drawn += 1
    return drawn


def test_raster_stats_match_golden_counts():
    verts, faces, tex = _scene()
    s = RasterSettings.game()
    mesh, fa = scenes.to_jax_scene(verts, faces)
    atlas = build.build_atlas(tex)
    cam = build.make_camera(CAMPOS, BASIS)
    lights = build.lights_from_list(scenes.DEFAULT_LIGHT_SPECS, ambient=s.ambient)
    st = profiling.raster_stats(mesh, fa, atlas, cam, lights, no_fog(), s, W, H)

    want = _golden_counts(verts, faces, tex, {})
    assert int(st.triangles_drawn) == want
    assert int(st.triangles_in) == len(faces)
    assert int(st.opaque_drawn) + int(st.transparent_drawn) == want
    assert int(st.backfaces_culled) == len(faces) - want


def test_raster_stats_no_cull():
    verts, faces, tex = _scene()
    s = RasterSettings.game(backface_cull=False)
    mesh, fa = scenes.to_jax_scene(verts, faces)
    atlas = build.build_atlas(tex)
    cam = build.make_camera(CAMPOS, BASIS)
    lights = build.lights_from_list([], ambient=s.ambient)
    st = profiling.raster_stats(mesh, fa, atlas, cam, lights, no_fog(), s, W, H)
    # every face in front of the near plane draws
    assert int(st.triangles_drawn) == len(faces)


def test_profiler_phases():
    prof = profiling.Profiler()
    with prof.phase("a"):
        sum(range(1000))
    with prof.phase("a"):
        sum(range(1000))
    with prof.phase("b"):
        pass
    t = prof.timings
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert t.ms["a"] >= 0.0
    assert t.total_ms == t.ms["a"] + t.ms["b"]
    assert "a" in prof.summary()

    other = profiling.FrameTimings()
    other.add("a", 0.001)
    t.accumulate(other)
    assert t.counts["a"] == 3

    got = prof.reset()
    assert got is t and prof.timings.ms == {}


def test_profiler_timed_device():
    import jax.numpy as jnp
    prof = profiling.Profiler()
    out = prof.timed("matmul", lambda: jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    assert out.shape == (64, 64)
    assert prof.timings.ms["matmul"] > 0

    off = profiling.Profiler(enabled=False)
    off.timed("x", lambda: 1)
    assert off.timings.ms == {}

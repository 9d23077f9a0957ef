"""Modeler 4-panel viewport (modeler/viewport.rs): pane layout, ortho
camera bases/controls, and real-pipeline renders of a mesh in all four
views composited into one frame."""

import numpy as np
import jax.numpy as jnp

from bonnie32_tpu.config import RasterSettings
from bonnie32_tpu.models import build, modeler_viewport as mv
from bonnie32_tpu.types import FrameBuffers
from bonnie32_tpu.ui import Rect, UiContext

import scenes


def _scene():
    tex = [scenes.checker_texture15(16, 16, with_black=False)]
    verts, faces = scenes.cube_scene(tex_ids=(0, 0, 0, 0, 0, 0))
    mesh, fa = scenes.to_jax_scene(verts, faces)
    atlas = build.build_atlas(tex)
    lights = build.lights_from_list(scenes.DEFAULT_LIGHT_SPECS)
    return mesh, fa, atlas, lights


def test_pane_layout_quad_and_maximize():
    vp = mv.ModelerViewports()
    rects = vp.pane_rects(Rect(0, 0, 320, 240))
    assert len(rects) == 4
    assert rects[mv.ViewportId.TOP] == Rect(0, 0, 160, 120)
    assert rects[mv.ViewportId.SIDE] == Rect(160, 120, 160, 120)
    vp.single_pane = mv.ViewportId.PERSPECTIVE
    rects = vp.pane_rects(Rect(0, 0, 320, 240))
    assert list(rects) == [mv.ViewportId.PERSPECTIVE]
    assert rects[mv.ViewportId.PERSPECTIVE].w == 320


def test_ortho_bases_match_reference():
    # camera.rs:27-74 exact rows
    np.testing.assert_array_equal(
        mv.ORTHO_BASES[mv.ViewportId.TOP],
        [[-1, 0, 0], [0, 0, 1], [0, 1, 0]])
    np.testing.assert_array_equal(
        mv.ORTHO_BASES[mv.ViewportId.FRONT],
        [[1, 0, 0], [0, 1, 0], [0, 0, -1]])
    np.testing.assert_array_equal(
        mv.ORTHO_BASES[mv.ViewportId.SIDE],
        [[0, 0, 1], [0, 1, 0], [-1, 0, 0]])


def test_ortho_camera_pan_zoom():
    cam = mv.OrthoCamera(zoom=0.5)
    cam.pan(10.0, -4.0)
    assert cam.center == (-20.0, -8.0)
    cam.zoom_by(2.0)
    assert cam.zoom == 1.0


def test_render_all_views_and_composite():
    mesh, fa, atlas, lights = _scene()
    vp = mv.ModelerViewports()
    for cam in vp.cameras.values():
        cam.zoom = 40.0          # cube is ~2 world units
    settings = RasterSettings.modeler() \
        if hasattr(RasterSettings, "modeler") else RasterSettings.game()
    bounds = Rect(0, 0, 320, 240)
    frames = mv.render_all_views(vp, mesh, fa, atlas, lights, settings,
                                 bounds, pane_h=120, pane_w=160)
    assert set(frames) == {mv.ViewportId.TOP, mv.ViewportId.FRONT,
                           mv.ViewportId.SIDE, mv.ViewportId.PERSPECTIVE}
    for view, fb in frames.items():
        w = np.asarray(fb.color)
        assert (w != w.reshape(-1)[0]).any(), f"{view} pane is empty"

    ctx = UiContext()
    ctx.begin_frame(0, 0, False)
    mv.composite_views(ctx, vp, frames, bounds)
    out = ctx.paint(FrameBuffers(color=jnp.zeros((240, 320), jnp.int32),
                                 depth=jnp.zeros((240, 320), jnp.float32)))
    w = np.asarray(out.color)
    # every quadrant carries pixels
    assert (w[:120, :160] != 0).any() and (w[:120, 160:] != 0).any()
    assert (w[120:, :160] != 0).any() and (w[120:, 160:] != 0).any()


def test_skeleton_overlay_renders_over_mesh():
    # rigging view (modeler/viewport.rs:1407): bone octahedrons composite
    # z-tested over the mesh pass
    from bonnie32_tpu.models.modeler import ModelerState

    st = ModelerState()
    st.ensure_skeleton()
    st.create_child_bone(0)
    vp = mv.ModelerViewports()
    # frame the 0..400-unit bone chain
    vp.perspective.distance = 1200.0
    vp.perspective.target = (0.0, 200.0, 0.0)
    mesh, fa, atlas, lights = _scene()
    base = mv.render_view(vp, mv.ViewportId.PERSPECTIVE, mesh, fa, atlas,
                          lights, RasterSettings.modeler(), 120, 160)
    fb = mv.render_view_with_skeleton(
        vp, mv.ViewportId.PERSPECTIVE, mesh, fa, atlas, lights,
        RasterSettings.modeler(), 120, 160, st.skeleton())
    changed = int((np.asarray(fb.color) != np.asarray(base.color)).sum())
    assert changed > 5      # bone octahedrons composited on top


def test_project_arrays_merges_visible_parts():
    from bonnie32_tpu.models.modeler import ModelerState

    st = ModelerState()
    st.add_part()
    # second part: a shifted cube
    from bonnie32_tpu.models.mesh import EditableMesh
    st.project.objects[1].mesh = EditableMesh.cube(256.0)
    mesh, fa, atlas = mv.project_arrays(st.project)
    v_all = int(mesh.pos.shape[0])
    st.project.objects[1].visible = False
    mesh2, fa2, _ = mv.project_arrays(st.project)
    assert v_all > int(mesh2.pos.shape[0])      # hidden part excluded
    # renders through the pipeline
    vp = mv.ModelerViewports()
    vp.perspective.distance = 1500.0
    lights = build.lights_from_list([])
    fb = mv.render_view(vp, mv.ViewportId.PERSPECTIVE, mesh, fa, atlas,
                        lights, RasterSettings.modeler(), 120, 160)
    assert int((np.asarray(fb.color) != 0).sum()) > 50

"""Top-level mesh rendering — the TPU equivalent of `render_mesh_15`.

Composes the vertex/cull/fog stage (ops/surface.py) with a rasterizer:
  * depth_mode="harmonic": the parity path (ops/raster_ref.py), literal
    reference semantics.
  * depth_mode="inv": inverse-z depth, no per-pixel divisions — the fast
    ordering-equivalent default.

Reference: `/root/reference/src/rasterizer/render.rs:2302` (render_mesh_15).
Wireframe phases (render.rs:2573-2633) run after the solid passes when the
settings enable them; in wireframe_overlay mode the solid passes are skipped
entirely (render.rs:2550).
"""

import functools

import jax

from .config import RasterSettings
from .types import (CameraArrays, FaceArrays, Fog, FrameBuffers, Lights,
                    MeshArrays, TextureAtlas)
from .ops.surface import build_surfaces
from .ops.raster_ref import rasterize_surfaces
from .ops.raster_fast import rasterize_surfaces_fast
from .ops.wireframe import render_wireframes


def _fast_ok(settings: RasterSettings) -> bool:
    return (settings.use_zbuffer and not settings.xray_mode
            and settings.ortho_projection is None)


def _wireframes_on(settings: RasterSettings) -> bool:
    return ((settings.backface_cull and settings.backface_wireframe)
            or settings.wireframe_overlay)


@functools.partial(jax.jit, static_argnames=("settings", "depth_mode"))
def render_mesh_15(fb: FrameBuffers, mesh: MeshArrays, faces: FaceArrays,
                   atlas: TextureAtlas, camera: CameraArrays, lights: Lights,
                   fog: Fog, settings: RasterSettings,
                   depth_mode: str = "fast") -> FrameBuffers:
    """depth_mode:
    * "fast": visibility-reduction path (falls back to "inv" when the
      settings require ordered compositing: painter's, x-ray, ortho).
    * "inv": sequential compositor, inverse-z depth.
    * "harmonic": sequential compositor, literal reference z semantics.
    """
    height, width = fb.color.shape
    if depth_mode == "fast" and _fast_ok(settings):
        mode = "fast"
    elif depth_mode == "fast":
        # Ortho depth can be <= 0, where inverse-z ordering breaks — use the
        # literal harmonic-z semantics there (render.rs:1545 divides 1/z
        # regardless of projection).
        mode = "harmonic" if settings.ortho_projection is not None else "inv"
    else:
        mode = depth_mode

    if not settings.wireframe_overlay:
        surfaces = build_surfaces(mesh, faces, atlas, camera, lights, fog,
                                  settings, width, height)
        if mode == "fast":
            fb = rasterize_surfaces_fast(fb, surfaces, atlas, settings)
        else:
            fb = rasterize_surfaces(fb, surfaces, atlas, settings,
                                    depth_mode=mode)

    if _wireframes_on(settings):
        wf_mode = "inv" if mode == "fast" else mode
        fb = render_wireframes(fb, mesh, faces, camera, fog, settings,
                               depth_mode=wf_mode)
    return fb

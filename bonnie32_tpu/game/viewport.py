"""Game viewport rendering: fb sizing, skybox/clear, scene, presentation.

The headless counterpart of the reference's `draw_test_viewport`
(`/root/reference/src/game/renderer.rs:20-230`): size the framebuffer from
the resolution settings (:34-49), render the world through the unified
scene path, and report where the frame lands inside the viewport rect
(:183-199).  The GPU texture upload at renderer.rs:179 becomes "return the
framebuffer" — host code (tests, encoders, displays) consumes the array.
"""

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import RasterSettings
from ..types import CameraArrays, FrameBuffers
from ..models import scene as scene_mod
from ..ops import raster_ref
from .runtime import viewport_fb_size, present_rect

# Letterbox bar color (renderer.rs:202): rgb(10, 10, 12).
LETTERBOX_RGBA = (10, 10, 12, 255)


class ViewportFrame(NamedTuple):
    fb: FrameBuffers          # (H, W) packed RGBA8 color + depth
    fb_size: Tuple[int, int]  # (W, H)
    dest: Tuple[float, float, float, float]  # draw x, y, w, h in the rect


def render_game_view(scene: scene_mod.CompiledScene, cam: CameraArrays,
                     settings: RasterSettings,
                     rect: Tuple[float, float, float, float],
                     sky=None, depth_mode: str = "fast") -> ViewportFrame:
    """One game-view frame sized per `low_resolution`/`stretch_to_fill`.

    rect: (x, y, w, h) of the viewport in screen units.  Returns the
    rendered framebuffer plus the destination rectangle (letterboxed in
    4:3 mode) — renderer.rs:34-49 and :183-214.
    """
    x, y, w, h = rect
    fb_w, fb_h = viewport_fb_size(settings, w, h)
    fb = raster_ref.new_framebuffer(fb_h, fb_w, depth_mode="inv")
    if sky is not None:
        from ..ops import skybox as sky_ops
        fb = sky_ops.render_skybox(fb, sky, cam)
    fb = scene_mod.render_level(fb, scene, cam, settings,
                                depth_mode=depth_mode)
    dest = present_rect(settings, fb_w, fb_h, x, y, w, h)
    return ViewportFrame(fb=fb, fb_size=(fb_w, fb_h), dest=dest)

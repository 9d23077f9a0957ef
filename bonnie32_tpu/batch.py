"""Batched rendering: a leading instance axis over render_mesh_15.

N independent 320x240 instances (own camera, own framebuffer, shared scene)
rasterize in one TPU program — the core of the headless rollout/datagen
harness (SURVEY.md section 2.8, BASELINE.json north star).
"""

import functools

import jax
import jax.numpy as jnp

from .config import RasterSettings
from .types import FrameBuffers, CameraArrays
from .ops import raster_ref
from . import render as render_mod


def batched_framebuffers(n: int, height: int, width: int,
                         depth_mode: str = "fast",
                         clear_color: int = 0) -> FrameBuffers:
    dm = "inv" if depth_mode == "fast" else depth_mode
    fb = raster_ref.new_framebuffer(height, width, depth_mode=dm,
                                    clear_color=clear_color)
    return FrameBuffers(
        color=jnp.broadcast_to(fb.color, (n,) + fb.color.shape),
        depth=jnp.broadcast_to(fb.depth, (n,) + fb.depth.shape),
    )


@functools.partial(jax.jit,
                   static_argnames=("settings", "depth_mode", "instance_chunk"))
def render_batch(fbs: FrameBuffers, mesh, faces, atlas,
                 cameras: CameraArrays, lights, fog,
                 settings: RasterSettings,
                 depth_mode: str = "fast",
                 instance_chunk: int = 128) -> FrameBuffers:
    """vmap of render_mesh_15 over (framebuffer, camera).

    Instances are processed in chunks of `instance_chunk` via lax.map: the
    fast path's one-hot resolve materializes ~12 MB of per-pixel attributes
    per instance, so an unchunked 1024-wide vmap would need >11 GB of HBM
    temps.  Chunking bounds peak memory at chunk-size cost with no
    throughput loss (the per-chunk batch already saturates the chip).
    """
    fn = functools.partial(render_mod.render_mesh_15,
                           settings=settings, depth_mode=depth_mode)
    inner = jax.vmap(
        lambda fb, cam: fn(fb, mesh, faces, atlas, cam, lights, fog))

    n = fbs.color.shape[0]
    if instance_chunk is None or n <= instance_chunk:
        return inner(fbs, cameras)
    assert n % instance_chunk == 0, (n, instance_chunk)
    g = n // instance_chunk

    def regroup(t):
        return jax.tree_util.tree_map(
            lambda x: x.reshape((g, instance_chunk) + x.shape[1:]), t)

    out = jax.lax.map(lambda args: inner(*args),
                      (regroup(fbs), regroup(cameras)))
    return jax.tree_util.tree_map(
        lambda x: x.reshape((n,) + x.shape[2:]), out)


def batched_cameras(positions, bases) -> CameraArrays:
    """positions (N, 3), bases (N, 3, 3) -> batched CameraArrays."""
    return CameraArrays(position=jnp.asarray(positions, jnp.float32),
                        basis=jnp.asarray(bases, jnp.float32))

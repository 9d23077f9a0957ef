#!/usr/bin/env python
"""Benchmark: batched 320x240 instance rendering throughput on one chip.

Headline metric (BASELINE.json north star): independent 320x240 game
instances rendered per second per chip, against the target of 1024 instances
at 60 FPS-equivalent (61440 instance-frames/s).

Scene: BASELINE.json config #1 — a textured low-poly mesh (cube, 12 tris)
spinning under orbit cameras, PS1-authentic settings (fixed-point projection,
RGB555, Gouraud, dithering, z-buffer), one camera per instance, camera
animation on device.

Prints ONE JSON line.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import bonnie32_tpu  # noqa: F401  (enables x64)
from bonnie32_tpu.config import RasterSettings, WIDTH, HEIGHT
from bonnie32_tpu.models import build
from bonnie32_tpu import batch
from bonnie32_tpu.ops import camera as cam_ops
from bonnie32_tpu.types import no_fog

sys.path.insert(0, "tests")
import scenes  # noqa: E402

TARGET_INSTANCE_FPS = 1024 * 60  # BASELINE.json


def main():
    n_instances = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    tex = [scenes.checker_texture15(32, 32, with_black=True)]
    verts, faces = scenes.cube_scene(tex_ids=(0, 0, 0, 0, 0, 0))
    mesh, fa = scenes.to_jax_scene(verts, faces)
    atlas = build.build_atlas(tex)
    lights = build.lights_from_list(scenes.DEFAULT_LIGHT_SPECS)
    fog = no_fog()
    settings = RasterSettings.game()

    base_angles = jnp.arange(n_instances, dtype=jnp.float32) * 0.01

    @jax.jit
    def frame(t):
        cams = cam_ops.orbit_cameras(base_angles + t * 0.031, 0.35, 3.5)
        fbs = batch.batched_framebuffers(n_instances, HEIGHT, WIDTH)
        out = batch.render_batch(fbs, mesh, fa, atlas, cams, lights, fog,
                                 settings)
        return out.color

    # Warmup / compile.
    frame(jnp.float32(0.0)).block_until_ready()
    frame(jnp.float32(1.0)).block_until_ready()

    t0 = time.perf_counter()
    for i in range(iters):
        out = frame(jnp.float32(2.0 + i))
    out.block_until_ready()
    dt = time.perf_counter() - t0

    batched_fps = iters / dt
    instance_fps = batched_fps * n_instances
    print(json.dumps({
        "metric": "instance_frames_per_sec_320x240",
        "value": round(instance_fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(instance_fps / TARGET_INSTANCE_FPS, 4),
        "detail": {
            "n_instances": n_instances,
            "batched_fps": round(batched_fps, 3),
            "ms_per_batched_frame": round(1000 * dt / iters, 2),
            "triangles_per_mesh": 12,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()

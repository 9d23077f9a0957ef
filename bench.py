#!/usr/bin/env python
"""Benchmark: batched 320x240 game-instance throughput on one chip.

Headline (BASELINE.json north star / config #5): independent 320x240 game
instances per second per chip for the FULL fused frame — souls-like game tick
+ cylinder collision + third-person camera + sector-level rasterization
(Cave.ron sample level, PS1-authentic settings) — vs the target of
1024 instances at 60 FPS-equivalent (61440 instance-frames/s).

detail also reports config #1 (spinning textured mesh, raster only) and
triangle throughput.

Prints ONE JSON line.
"""

import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np


def timed(fn, iters):
    fn()  # warmup (compile)
    fn()
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    import jax
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / iters


def main():
    n_instances = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import jax
    import jax.numpy as jnp
    import bonnie32_tpu  # noqa: F401
    from bonnie32_tpu.config import RasterSettings, WIDTH, HEIGHT
    from bonnie32_tpu.models import build
    from bonnie32_tpu import batch, rollout
    from bonnie32_tpu.game import step as stp
    from bonnie32_tpu.ops import camera as cam_ops
    from bonnie32_tpu.types import no_fog
    import scenes

    settings = RasterSettings.game()
    target = 1024 * 60

    # ---- config #5: fused datagen on the Cave sample level ----
    level, env, spawn = rollout.demo_env()
    states = rollout.initial_states(level, spawn, n_instances)
    rng = np.random.default_rng(0)
    ang = rng.uniform(0, 2 * np.pi, n_instances).astype(np.float32)
    acts = stp.Actions(
        move_x=jnp.asarray(np.sin(ang)), move_y=jnp.asarray(np.cos(ang)),
        cam_x=jnp.zeros(n_instances, jnp.float32),
        cam_y=jnp.zeros(n_instances, jnp.float32),
        sprint=jnp.zeros(n_instances, bool),
        jump=jnp.zeros(n_instances, bool))

    state_box = [states]

    def datagen_frame():
        st, fbs = rollout.step_and_render(state_box[0], env, acts, settings)
        state_box[0] = st
        return fbs.color

    dt_datagen = timed(datagen_frame, iters)
    datagen_ifps = n_instances / dt_datagen

    # triangles per level frame (post-compile): valid faces x rooms average
    tris = int(np.asarray(env.scene.faces.valid).sum())

    # ---- config #1: spinning textured cube, raster only ----
    # config #1 uses a black-free texture: the clean visibility path
    # (color-keyable textures route through the slower keyed pass)
    tex = [scenes.checker_texture15(32, 32, with_black=False)]
    verts, faces = scenes.cube_scene(tex_ids=(0, 0, 0, 0, 0, 0))
    mesh, fa = scenes.to_jax_scene(verts, faces)
    atlas = build.build_atlas(tex)
    lights = build.lights_from_list(scenes.DEFAULT_LIGHT_SPECS)
    fog = no_fog()
    base_angles = jnp.arange(n_instances, dtype=jnp.float32) * 0.01
    tbox = [0.0]

    def cube_frame():
        tbox[0] += 1.0
        cams = cam_ops.orbit_cameras(base_angles + tbox[0] * 0.031, 0.35, 3.5)
        fbs = batch.batched_framebuffers(n_instances, HEIGHT, WIDTH)
        return batch.render_batch(fbs, mesh, fa, atlas, cams, lights, fog,
                                  settings).color

    dt_cube = timed(cube_frame, iters)
    cube_ifps = n_instances / dt_cube

    print(json.dumps({
        "metric": "game_instance_frames_per_sec_320x240",
        "value": round(datagen_ifps, 1),
        "unit": "instance-frames/s/chip",
        "vs_baseline": round(datagen_ifps / target, 4),
        "detail": {
            "n_instances": n_instances,
            "datagen_ms_per_batched_frame": round(1000 * dt_datagen, 2),
            "level_triangles": tris,
            "mtris_per_sec": round(datagen_ifps * tris / 1e6, 2),
            "cube_raster_only_ifps": round(cube_ifps, 1),
            "cube_ms_per_batched_frame": round(1000 * dt_cube, 2),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()

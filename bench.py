#!/usr/bin/env python
"""Benchmark: batched 320x240 game-instance throughput on one chip.

Headline (BASELINE.json north star / config #5): independent 320x240 game
instances per second per chip for the FULL fused frame — souls-like game tick
+ cylinder collision + third-person camera + sector-level rasterization
(Cave.ron sample level, PS1-authentic settings) — vs the target of
1024 instances at 60 FPS-equivalent (61440 instance-frames/s).

detail also reports config #1 (spinning textured mesh, raster only) and
triangle throughput.

Methodology: the remote-TPU tunnel has a ~27 ms host<->device sync latency
and an asynchronous dispatch queue, so per-call wall timing measures
latency, not throughput.  Frames are therefore CHAINED on device (each
frame's state feeds the next; a scalar from each framebuffer joins a
carried accumulator) and timed as the slope between a short and a long
chain — pipeline throughput, which is what a datagen consumer sees.

Prints ONE JSON line.
"""

import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np


def slope_time(run, k1=3, k2=13):
    """Seconds per iteration from the (k2 - k1) chain-length slope."""
    run(2)  # compile + warm
    t0 = time.perf_counter()
    run(k1)
    t1 = time.perf_counter()
    run(k2)
    t2 = time.perf_counter()
    per = ((t2 - t1) - (t1 - t0)) / (k2 - k1)
    return max(per, 1e-9)


def main():
    n_instances = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    k_long = int(sys.argv[2]) if len(sys.argv) > 2 else 10

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
    n = n_instances

    # ---- config #5: fused datagen on the Cave sample level ----
    level, env, spawn = rollout.demo_env()
    states0 = rollout.initial_states(level, spawn, n)
    rng = np.random.default_rng(0)
    ang = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    acts = stp.Actions(
        move_x=jnp.asarray(np.sin(ang)), move_y=jnp.asarray(np.cos(ang)),
        cam_x=jnp.zeros(n, jnp.float32), cam_y=jnp.zeros(n, jnp.float32),
        sprint=jnp.zeros(n, bool), jump=jnp.zeros(n, bool))

    def run_datagen(k):
        states = states0
        acc = jnp.float32(0)
        for _ in range(k):
            states, fbs = rollout.step_and_render(states, env, acts, settings)
            acc = acc + fbs.color[0, 0, 0]
        return float(acc)

    dt_datagen = slope_time(run_datagen, k2=k_long)
    datagen_ifps = n / dt_datagen

    tris = int(np.asarray(env.scene.faces.valid).sum())

    # ---- config #1: spinning textured cube, raster only ----
    tex = [scenes.checker_texture15(32, 32, with_black=False)]
    verts, faces = scenes.cube_scene(tex_ids=(0, 0, 0, 0, 0, 0))
    mesh, fa = scenes.to_jax_scene(verts, faces)
    atlas = build.build_atlas(tex)
    lights = build.lights_from_list(scenes.DEFAULT_LIGHT_SPECS)
    fog = no_fog()
    base_angles = jnp.arange(n, dtype=jnp.float32) * 0.01
    fbs0 = batch.batched_framebuffers(n, HEIGHT, WIDTH)

    cube_frame = jax.jit(lambda t: batch.render_batch(
        fbs0, mesh, fa, atlas,
        cam_ops.orbit_cameras(base_angles + t * 0.031, 0.35, 3.5),
        lights, fog, settings).color)

    def run_cube(k):
        t = jnp.float32(0)
        acc = jnp.float32(0)
        for _ in range(k):
            color = cube_frame(t + acc * 1e-30)
            t = t + 1.0
            acc = acc + color[0, 0, 0]
        return float(acc)

    dt_cube = slope_time(run_cube, k2=k_long)
    cube_ifps = n / dt_cube

    print(json.dumps({
        "metric": "game_instance_frames_per_sec_320x240",
        "value": round(datagen_ifps, 1),
        "unit": "instance-frames/s/chip",
        "vs_baseline": round(datagen_ifps / target, 4),
        "detail": {
            "n_instances": n,
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

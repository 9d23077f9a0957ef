#!/usr/bin/env python
"""Benchmark: batched 320x240 game-instance throughput on one chip.

Headline (BASELINE.json north star / config #5): independent 320x240 game
instances per second per chip for the FULL fused frame — souls-like game
tick + cylinder collision + third-person camera + skybox + sector-level
rasterization through the batched Pallas kernel (Cave.ron sample level,
PS1-authentic settings) — vs the target of 1024 instances at 60
FPS-equivalent (61440 instance-frames/s).  Run at N=1024 by default.

detail adds config #1 (spinning textured cube, raster only, same batched
kernel) and config #3 (Cathedral, the largest multi-room sample level).

Methodology (v3, PLAN_PERF.md): the remote-TPU tunnel has a ~27 ms
host<->device sync latency and an asynchronous dispatch queue, so per-call
wall timing measures latency, not throughput.  Frames are CHAINED ON
DEVICE inside a jitted `lax.fori_loop` with a dynamic trip count (each
frame's state feeds the next; a scalar from each framebuffer joins a
carried accumulator) and timed as the slope between a short and a long
chain — device pipeline throughput, which is what a scan-based datagen
consumer sees, with zero per-frame host dispatch in the measured region.

Prints ONE JSON line.
"""

import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np


def slope_time(run, k1=5, k2=25, rounds=2):
    """Seconds per iteration from the (k2 - k1) chain-length slope;
    min-of-rounds on both ends to reject tunnel-sync jitter."""
    run(2)  # compile + warm
    ts = {k1: [], k2: []}
    for _ in range(rounds):
        for k in (k1, k2):
            t0 = time.perf_counter()
            run(k)
            ts[k].append(time.perf_counter() - t0)
    per = (min(ts[k2]) - min(ts[k1])) / (k2 - k1)
    return max(per, 1e-9)


def chain_runner(frame_fn, carry0):
    """frame_fn: (i, carry) -> (carry, scalar). Returns run(k) that chains
    k frames on device inside one jitted fori_loop."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def chain(k):
        def body(i, st):
            carry, acc = st
            carry, v = frame_fn(i, carry)
            return (carry, acc + v.astype(jnp.float32))

        _, acc = lax.fori_loop(0, k, body, (carry0, jnp.float32(0)))
        return acc

    return lambda k: float(chain(jnp.int32(k)))


def datagen_rate(level_path, n, settings, k_long):
    import jax.numpy as jnp
    from bonnie32_tpu import rollout
    from bonnie32_tpu.game import step as stp

    level, env, spawn = rollout.demo_env(level_path, flat=True)
    states0 = rollout.initial_states(level, spawn, n)
    rng = np.random.default_rng(0)
    ang = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    acts = stp.Actions(
        move_x=jnp.asarray(np.sin(ang)), move_y=jnp.asarray(np.cos(ang)),
        cam_x=jnp.zeros(n, jnp.float32), cam_y=jnp.zeros(n, jnp.float32),
        sprint=jnp.zeros(n, bool), jump=jnp.zeros(n, bool))

    def frame(i, states):
        states, fbs = rollout.step_and_render(states, env, acts, settings)
        return states, fbs.color[0, 0, 0]

    run = chain_runner(frame, states0)
    dt = slope_time(run, k2=k_long)
    tris = int(np.asarray(env.scene.faces.valid).sum())
    return n / dt, dt, tris


def main():
    n_instances = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    k_long = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    import jax
    import jax.numpy as jnp
    import bonnie32_tpu  # noqa: F401
    from bonnie32_tpu.config import RasterSettings, WIDTH, HEIGHT
    from bonnie32_tpu.models import scene_flat
    from bonnie32_tpu.ops import camera as cam_ops
    from bonnie32_tpu.ops import raster_ref
    import scenes

    settings = RasterSettings.game()
    target = 1024 * 60
    n = n_instances
    interp = jax.default_backend() not in ("tpu", "axon")

    # ---- config #5 (headline): fused datagen on the Cave sample level ----
    cave = "/root/reference/assets/samples/levels/Cave.ron"
    datagen_ifps, dt_datagen, tris = datagen_rate(cave, n, settings, k_long)

    # ---- config #1: spinning textured cube, raster only, batched kernel --
    tex = [scenes.checker_texture15(32, 32, with_black=False)]
    verts, faces = scenes.cube_scene(tex_ids=(0, 0, 0, 0, 0, 0))
    flat, static = scene_flat.compile_scene_flat(
        verts, faces, tex, scenes.DEFAULT_LIGHT_SPECS)
    base_angles = np.arange(n, dtype=np.float32) * 0.01
    fb0 = raster_ref.new_framebuffer(HEIGHT, WIDTH, depth_mode="inv")
    fbs0 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), fb0)

    def cube_frame(i, t):
        cams = cam_ops.orbit_cameras(
            jnp.asarray(base_angles) + t * 0.031, 0.35, 3.5)
        out = scene_flat.render_level_flat(fbs0, flat, static, cams,
                                           settings, height=HEIGHT,
                                           width=WIDTH, interpret=interp)
        return t + 1.0 + out.color[0, 0, 0].astype(jnp.float32) * 1e-30, \
            out.color[0, 0, 0]

    run_cube = chain_runner(cube_frame, jnp.float32(0))
    dt_cube = slope_time(run_cube, k2=k_long)
    cube_ifps = n / dt_cube

    # ---- config #2: transparent-heavy cube (sequential compositor) ------
    # Half the cube's faces use a PS1 blend mode, so they route through the
    # back-to-front masked compositor (scene_flat._transparent_pass) after
    # the kernel — measures the transparency path VERDICT r02 flagged as
    # unbenchmarked.
    tfaces = [dict(f, blend_mode=(1 if i % 2 else 0))
              for i, f in enumerate(faces)]
    tflat, tstatic = scene_flat.compile_scene_flat(
        verts, tfaces, tex, scenes.DEFAULT_LIGHT_SPECS)
    n2 = n   # headline N since round 5 (the in-kernel phase-3 composite
    #          took this path from ~314 ifps to >60k, so it can afford it)
    fbs2 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n2,) + x.shape), fb0)
    base2 = np.arange(n2, dtype=np.float32) * 0.01

    def transp_frame(i, t):
        cams = cam_ops.orbit_cameras(
            jnp.asarray(base2) + t * 0.031, 0.35, 3.5)
        out = scene_flat.render_level_flat(fbs2, tflat, tstatic, cams,
                                           settings, height=HEIGHT,
                                           width=WIDTH, interpret=interp)
        return t + 1.0 + out.color[0, 0, 0].astype(jnp.float32) * 1e-30, \
            out.color[0, 0, 0]

    try:
        n_transp = len(tstatic.transparent_idx)
        run_transp = chain_runner(transp_frame, jnp.float32(0))
        dt_transp = slope_time(run_transp, k2=k_long)
        transp_ifps = n2 / dt_transp
    except Exception as e:
        n_transp, transp_ifps = 0, 0.0
        print(f"# transparent config failed: {e!r}", file=sys.stderr)

    # ---- config #2 proper: mixed flat + textured triangle batch with
    # vertex snapping (use_fixed_point) and RGB555 dithering toggles ----
    mverts, mfaces = scenes.cube_scene(tex_ids=(0, 0, 0, None, None, 0))
    mixed_ifps = {}
    for tag, s2 in (("snap_dither", settings),
                    ("float_nodither",
                     RasterSettings.game(use_fixed_point=False,
                                         dithering=False))):
        try:
            mflat, mstatic = scene_flat.compile_scene_flat(
                mverts, mfaces, tex, scenes.DEFAULT_LIGHT_SPECS)

            def mixed_frame(i, t, mflat=mflat, mstatic=mstatic, s2=s2):
                cams = cam_ops.orbit_cameras(
                    jnp.asarray(base_angles) + t * 0.031, 0.35, 3.5)
                color = scene_flat.render_level_flat(
                    fbs0, mflat, mstatic, cams, s2, height=HEIGHT,
                    width=WIDTH, interpret=interp).color
                return t + 1.0 + color[0, 0, 0].astype(jnp.float32) * 1e-30, \
                    color[0, 0, 0]

            run_mixed = chain_runner(mixed_frame, jnp.float32(0))
            mixed_ifps[tag] = round(n / slope_time(run_mixed, k2=k_long), 1)
        except Exception as e:
            mixed_ifps[tag] = 0.0
            print(f"# mixed config {tag} failed: {e!r}", file=sys.stderr)

    # ---- config #3: Cathedral (largest multi-room sample) ----
    cathedral = "/root/reference/assets/samples/levels/Cathedral.ron"
    n3 = n   # headline N since round 5 (VERDICT r4 weak #5)
    try:
        cath_ifps, dt_cath, cath_tris = datagen_rate(
            cathedral, n3, settings, k_long)
    except Exception as e:  # keep the headline even if the level changes
        cath_ifps, dt_cath, cath_tris = 0.0, 0.0, 0
        print(f"# cathedral config failed: {e!r}", file=sys.stderr)

    # ---- with-skybox datagen: Dungeon ships a real skybox, so this row
    # cannot ride the constant-background shortcut (VERDICT r03 §5) ----
    dungeon = "/root/reference/assets/samples/levels/Dungeon.ron"
    n4 = n   # headline N since round 5 (in-kernel sky)
    try:
        dun_ifps, _, dun_tris = datagen_rate(dungeon, n4, settings, k_long)
    except Exception as e:
        dun_ifps, dun_tris = 0.0, 0
        print(f"# dungeon config failed: {e!r}", file=sys.stderr)

    # ---- config #4: full game-loop frame at N=1 (end-to-end single
    # instance: souls-like tick + camera + level render), fps ----
    try:
        single_ifps, _, _ = datagen_rate(cave, 1, settings, k_long)
    except Exception as e:
        single_ifps = 0.0
        print(f"# single-instance config failed: {e!r}", file=sys.stderr)

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
            "transparent_cube_ifps": round(transp_ifps, 1),
            "transparent_faces": n_transp,
            "transparent_n_instances": n2,
            "mixed_batch_ifps": mixed_ifps,
            "cathedral_ifps": round(cath_ifps, 1),
            "cathedral_n_instances": n3,
            "cathedral_triangles": cath_tris,
            "dungeon_skybox_ifps": round(dun_ifps, 1),
            "dungeon_n_instances": n4,
            "dungeon_triangles": dun_tris,
            "single_instance_fps": round(single_ifps, 1),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-5 probe: decompose the with-skybox datagen cost (Dungeon).

BENCH_r04: dungeon_skybox_ifps = 602.8 at N=256 (~1.66 ms/inst) vs Cave
(no sky) 14.5k.  The suspects (VERDICT r4 item 3): the per-pixel XLA
gather into the 1024x2048 sky LUT (ops/skybox.py render_skybox_layout),
the per-pixel direction math (sqrt/arccos/arctan2), and the kernel's
fb_layout_color DMA path.  The `parts` knob isolates each pass.

    timeout 1700 python scripts/perf_sky.py [n_instances] [level.ron]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

K1, K2, ROUNDS = 5, 45, 3


def measure(runs: dict) -> dict:
    for r in runs.values():
        r(2)
    t = {name: {K1: [], K2: []} for name in runs}
    for _ in range(ROUNDS):
        for k in (K1, K2):
            for name, r in runs.items():
                t0 = time.perf_counter()
                r(k)
                t[name][k].append(time.perf_counter() - t0)
    return {name: max((min(d[K2]) - min(d[K1])) / (K2 - K1), 1e-9)
            for name, d in t.items()}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    level_path = (sys.argv[2] if len(sys.argv) > 2 else
                  "/root/reference/assets/samples/levels/Dungeon.ron")

    import jax
    import jax.numpy as jnp
    from jax import lax
    import bonnie32_tpu  # noqa: F401
    from bonnie32_tpu.config import RasterSettings, WIDTH, HEIGHT
    from bonnie32_tpu import rollout
    from bonnie32_tpu.game import step as stp
    from bonnie32_tpu.ops import skybox as sky_ops

    print(f"# device: {jax.devices()[0]}  n={n}", flush=True)
    settings = RasterSettings.game()

    level, env, spawn = rollout.demo_env(level_path, flat=True)
    assert env.sky is not None, "level has no skybox"
    print(f"# level={level_path.rsplit('/', 1)[-1]} "
          f"T={env.flat_static.n_faces}", flush=True)

    states0 = rollout.initial_states(level, spawn, n)
    rng = np.random.default_rng(0)
    ang = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    acts = stp.Actions(
        move_x=jnp.asarray(np.sin(ang)), move_y=jnp.asarray(np.cos(ang)),
        cam_x=jnp.zeros(n, jnp.float32), cam_y=jnp.zeros(n, jnp.float32),
        sprint=jnp.zeros(n, bool), jump=jnp.zeros(n, bool))

    states_w = states0
    for _ in range(20):
        states_w = jax.vmap(lambda s, a: stp.tick(
            s, env.grid, env.params, a, 1.0 / 60.0))(states_w, acts)
    game_cams = jax.vmap(lambda s: stp.character_camera(
        s, env.params))(states_w)
    game_cams = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(jax.device_get(x))), game_cams)

    def perturb(t):
        return jax.tree_util.tree_map(
            lambda x: x + t * jnp.float32(1e-30), game_cams)

    runs = {}

    def add_chain(name, frame_fn):
        @jax.jit
        def chain(k):
            def body(i, carry):
                t, acc = carry
                v = frame_fn(t + acc * 1e-30)
                return (t + 1.0, acc + v)

            _, acc = lax.fori_loop(0, k, body,
                                   (jnp.float32(0), jnp.float32(0)))
            return acc

        runs[name] = lambda k: float(chain(jnp.int32(k)))

    # sky-only variants (no rasterizer): isolate LUT gather / direction
    # math / mountains+stars on the layout grid
    for name, parts in (("sky_full", "lut mtn stars"),
                        ("sky_lut", "lut"),
                        ("sky_nolut", "mtn stars"),
                        ("sky_none", "none")):
        def frame(t, parts=parts):
            skyc = jax.vmap(lambda c: sky_ops.render_skybox_layout(
                env.sky, c, HEIGHT, WIDTH, parts=parts))(perturb(t))
            return skyc[0, 0, 0].astype(jnp.float32)

        add_chain(name, frame)

    # full datagen (sky + kernel) and datagen with the sky forced off
    @jax.jit
    def chain_datagen(k):
        def body(i, carry):
            states, acc = carry
            states, fbs = rollout.step_and_render(states, env, acts,
                                                  settings)
            return (states, acc + fbs.color[0, 0, 0].astype(jnp.float32))

        _, acc = lax.fori_loop(0, k, body, (states0, jnp.float32(0)))
        return acc

    runs["datagen"] = lambda k: float(chain_datagen(jnp.int32(k)))

    env_nosky = env._replace(sky=None)

    @jax.jit
    def chain_nosky(k):
        def body(i, carry):
            states, acc = carry
            states, fbs = rollout.step_and_render(states, env_nosky, acts,
                                                  settings)
            return (states, acc + fbs.color[0, 0, 0].astype(jnp.float32))

        _, acc = lax.fori_loop(0, k, body, (states0, jnp.float32(0)))
        return acc

    runs["datagen_nosky"] = lambda k: float(chain_nosky(jnp.int32(k)))

    # ---- round-5 in-kernel sky decomposition ----
    # skyprep: the per-instance (8, vpad) scalar table build alone
    def frame_skyprep(t):
        sp = jax.vmap(lambda c: sky_ops.prep_sky_scal(
            env.sky, c, WIDTH, HEIGHT))(perturb(t))
        return sp[0, 0, 0]

    add_chain("skyprep", frame_skyprep)

    # starpost: the star post pass alone on fixed layout planes
    ngl = -(-WIDTH // 128)
    gh = ngl * HEIGHT
    colorL0 = jnp.zeros((n, gh, 128), jnp.int32)
    depthL0 = jnp.zeros((n, gh, 128), jnp.float32)

    def frame_starpost(t):
        out = jax.vmap(lambda cl, d, cm: sky_ops.scatter_stars_layout(
            cl, d, env.sky, cm, HEIGHT, WIDTH))(
                colorL0, depthL0, perturb(t))
        return out[0, 0, 0].astype(jnp.float32)

    add_chain("starpost", frame_starpost)

    # datagen with stars disabled (isolates the star post pass inside
    # the full fused step)
    import dataclasses
    sb2 = dataclasses.replace(
        env.sky.kstat.skybox,
        stars=dataclasses.replace(env.sky.kstat.skybox.stars,
                                  enabled=False))
    env_ns = env._replace(sky=sky_ops.build_sky_tables(sb2))

    @jax.jit
    def chain_dg_nostars(k):
        def body(i, carry):
            states, acc = carry
            states, fbs = rollout.step_and_render(states, env_ns, acts,
                                                  settings)
            return (states, acc + fbs.color[0, 0, 0].astype(jnp.float32))

        _, acc = lax.fori_loop(0, k, body, (states0, jnp.float32(0)))
        return acc

    runs["dg_nostars"] = lambda k: float(chain_dg_nostars(jnp.int32(k)))

    # ---- in-kernel sky render decomposition (round-5 session 4):
    # full / no-mountains / flat-base knobs on the render-only path ----
    from bonnie32_tpu.models import scene_flat
    from bonnie32_tpu.ops import raster_ref
    fb0 = raster_ref.new_framebuffer(HEIGHT, WIDTH, depth_mode="inv")
    fbs0 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), fb0)
    for name, dbg in (("ik_render", ""), ("ik_nomtn", "nomtn"),
                      ("ik_flatsky", "flatsky nomtn"),
                      ("ik_nosky", None)):
        def frame(t, dbg=dbg):
            out = scene_flat.render_level_flat(
                fbs0, env.flat, env.flat_static, perturb(t), settings,
                height=HEIGHT, width=WIDTH,
                debug=dbg if dbg is not None else "",
                sky=env.sky if dbg is not None else None)
            return out.color[0, 0, 0].astype(jnp.float32)

        add_chain(name, frame)

    rates = measure(runs)
    for name, dt in rates.items():
        print(f"{name:14s} {1000*dt:8.2f} ms/frame  "
              f"{dt/n*1e6:7.2f} us/inst  {n/dt:9.0f} ifps", flush=True)


if __name__ == "__main__":
    main()

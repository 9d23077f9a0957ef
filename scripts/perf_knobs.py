#!/usr/bin/env python
"""Round-5 kernel tile-knob sweep on hardware (ch / wb / fb debug tokens).

Measures render-only us/inst on Cave (N=128) and Cathedral (N=64) for a
grid of phase-2 chunk heights (chK), phase-1 window heights (wbK) and
phase-1 face unrolls (fbK).  v3 slope methodology (see perf_phase.py).

    timeout 1700 python scripts/perf_knobs.py [n] [level.ron] [variants...]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

K1, K2, ROUNDS = 5, 45, 3

DEFAULT_VARIANTS = [
    "", "fb2", "fb8", "wb16", "wb16 fb4", "ch48", "ch48 wb16",
    "ch16", "ch24 wb8 fb4", "ch48 fb8",
]


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
    args = [a for a in sys.argv[1:] if a != "--cube"]
    cube = "--cube" in sys.argv[1:]
    n = int(args[0]) if args else 128
    level_path = (args[1] if len(args) > 1
                  else "/root/reference/assets/samples/levels/Cave.ron")
    variants = args[2:] or DEFAULT_VARIANTS

    import jax
    import jax.numpy as jnp
    from jax import lax
    import bonnie32_tpu  # noqa: F401
    from bonnie32_tpu.config import RasterSettings, WIDTH, HEIGHT
    from bonnie32_tpu.models import scene_flat
    from bonnie32_tpu.ops import raster_ref
    from bonnie32_tpu import rollout
    from bonnie32_tpu.game import step as stp

    print(f"# device: {jax.devices()[0]}  n={n}", flush=True)
    settings = RasterSettings.game()

    if cube:
        sys.path.insert(0, "tests")
        import scenes
        from bonnie32_tpu.ops import camera as cam_ops
        tex = [scenes.checker_texture15(32, 32, with_black=False)]
        verts, faces = scenes.cube_scene(tex_ids=(0, 0, 0, 0, 0, 0))
        flat, static = scene_flat.compile_scene_flat(
            verts, faces, tex, scenes.DEFAULT_LIGHT_SPECS)
        base_angles = np.arange(n, dtype=np.float32) * 0.01
        game_cams = cam_ops.orbit_cameras(
            jnp.asarray(base_angles), 0.35, 3.5)
        print(f"# cube scene T={static.n_faces} t_pad={static.t_pad}",
              flush=True)
    else:
        level, env, spawn = rollout.demo_env(level_path, flat=True)
        flat, static = env.flat, env.flat_static
        print(f"# level={level_path.rsplit('/', 1)[-1]} T={static.n_faces} "
              f"t_pad={static.t_pad}", flush=True)

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

    fb0 = raster_ref.new_framebuffer(HEIGHT, WIDTH, depth_mode="inv")
    fbs0 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), fb0)

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

    gh = HEIGHT * -(-WIDTH // 128)
    for dbg in variants:
        # chunk height must divide the per-group row count; the window
        # height must divide the frame height
        ch = next((int(t[2:]) for t in dbg.split()
                   if t.startswith("ch") and t[2:].isdigit()), 24)
        wb = next((int(t[2:]) for t in dbg.split()
                   if t.startswith("wb") and t[2:].isdigit()), 8)
        if gh % ch or HEIGHT % ch or HEIGHT % wb or wb > ch:
            print(f"# skip '{dbg}' (ch={ch}/wb={wb} invalid)", flush=True)
            continue

        def frame(t, dbg=dbg):
            out = scene_flat.render_level_flat(
                fbs0, flat, static, perturb(t), settings,
                height=HEIGHT, width=WIDTH, debug=dbg)
            return out.color[0, 0, 0].astype(jnp.float32)

        add_chain(dbg or "default", frame)

    rates = measure(runs)
    for name, dt in rates.items():
        print(f"{name:14s} {1000*dt:8.2f} ms/frame  "
              f"{dt/n*1e6:7.2f} us/inst  {n/dt:9.0f} ifps", flush=True)


if __name__ == "__main__":
    main()

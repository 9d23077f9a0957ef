#!/usr/bin/env python
"""Round-3 tile sweep: phase-2 chunk rows (ch), phase-1 window rows (wb),
and the cdepth DMA cut, measured on the real chip with the chained-slope
method (PLAN_PERF.md item 8).

    timeout 1700 python scripts/perf_tiles.py [n] [level.ron] [variants...] &
"""

import sys
import time

sys.path.insert(0, ".")

K1, K2, ROUNDS = 5, 45, 3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    level_path = (sys.argv[2] if len(sys.argv) > 2
                  else "/root/reference/assets/samples/levels/Cave.ron")
    variants = sys.argv[3:] or ["", "ch48", "ch80", "ch120", "wb16",
                                "cdepth", "ch120 wb16 cdepth"]

    import jax
    import jax.numpy as jnp
    from jax import lax
    import numpy as np
    import bonnie32_tpu  # noqa: F401
    from bonnie32_tpu.config import RasterSettings, WIDTH, HEIGHT
    from bonnie32_tpu.models import scene_flat
    from bonnie32_tpu.ops import raster_ref
    from bonnie32_tpu import rollout
    from bonnie32_tpu.game import step as stp

    print(f"# device: {jax.devices()[0]}  n={n}", flush=True)
    settings = RasterSettings.game()
    level, env, spawn = rollout.demo_env(level_path, flat=True)
    flat, static = env.flat, env.flat_static
    print(f"# level={level_path.rsplit('/', 1)[-1]} T={static.n_faces} "
          f"t_pad={static.t_pad} Ra={static.atlas_rows} "
          f"NT={static.n_textures}", flush=True)

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
    game_cams = jax.tree_util.tree_map(jnp.asarray, jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x)), game_cams))

    fb0 = raster_ref.new_framebuffer(HEIGHT, WIDTH, depth_mode="inv")
    fbs0 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), fb0)

    def perturb(t):
        return jax.tree_util.tree_map(
            lambda x: x + t * jnp.float32(1e-30), game_cams)

    runs = {}
    for dbg in variants:
        @jax.jit
        def chain(k, dbg=dbg):
            def body(i, carry):
                t, acc = carry
                out = scene_flat.render_level_flat(
                    fbs0, flat, static, perturb(t + acc * 1e-30), settings,
                    height=HEIGHT, width=WIDTH, debug=dbg)
                return (t + 1.0, acc + out.color[0, 0, 0].astype(jnp.float32))
            _, acc = lax.fori_loop(0, k, body,
                                   (jnp.float32(0), jnp.float32(0)))
            return acc
        runs[dbg or "base"] = (lambda k, c=chain: float(c(jnp.int32(k))))

    for r in runs.values():
        r(2)
    t = {name: {K1: [], K2: []} for name in runs}
    for _ in range(ROUNDS):
        for k in (K1, K2):
            for name, r in runs.items():
                t0 = time.perf_counter()
                r(k)
                t[name][k].append(time.perf_counter() - t0)
    for name, d in t.items():
        dt = max((min(d[K2]) - min(d[K1])) / (K2 - K1), 1e-9)
        print(f"{name:22s} {1000*dt:8.2f} ms/frame  {dt/n*1e6:7.2f} us/inst"
              f"  {n/dt:9.0f} ifps", flush=True)


if __name__ == "__main__":
    main()

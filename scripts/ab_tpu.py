#!/usr/bin/env python
"""On-device A/B exactness check: render the sample levels at 4 game
cameras with and without a debug-token kernel variant and count pixel
diffs.  TPU doesn't contract FMAs, so variants that reorder code but
keep expressions identical must be BIT-exact here (CPU interpret shows
ULP seams from XLA:CPU fusion — see CLAUDE.md conventions).

    timeout 1700 python scripts/ab_tpu.py "skipmiss" [level.ron ...]
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np


def main():
    debug = sys.argv[1] if len(sys.argv) > 1 else "skipmiss"
    levels = sys.argv[2:] or ["Cave.ron", "Cathedral.ron", "Dungeon.ron"]

    import jax
    import jax.numpy as jnp
    from bonnie32_tpu.config import RasterSettings, WIDTH, HEIGHT
    from bonnie32_tpu.models import scene_flat
    from bonnie32_tpu.ops import raster_ref
    from bonnie32_tpu import rollout
    from bonnie32_tpu.game import step as stp

    print(f"# device: {jax.devices()[0]}  debug={debug!r}", flush=True)
    settings = RasterSettings.game()
    n = 4
    bad = 0
    for name in levels:
        path = f"/root/reference/assets/samples/levels/{name}"
        level, env, spawn = rollout.demo_env(path, flat=True)
        flat, static = env.flat, env.flat_static
        states = rollout.initial_states(level, spawn, n)
        rng = np.random.default_rng(1)
        ang = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
        acts = stp.Actions(
            move_x=jnp.asarray(np.sin(ang)), move_y=jnp.asarray(np.cos(ang)),
            cam_x=jnp.zeros(n, jnp.float32), cam_y=jnp.zeros(n, jnp.float32),
            sprint=jnp.zeros(n, bool), jump=jnp.zeros(n, bool))
        for _ in range(20):
            states = jax.vmap(lambda s, a: stp.tick(
                s, env.grid, env.params, a, 1.0 / 60.0))(states, acts)
        cams = jax.vmap(lambda s: stp.character_camera(
            s, env.params))(states)
        fb0 = raster_ref.new_framebuffer(HEIGHT, WIDTH, depth_mode="inv")
        fbs = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (n,) + x.shape), fb0)
        out1 = scene_flat.render_level_flat(
            fbs, flat, static, cams, settings, height=HEIGHT, width=WIDTH)
        out2 = scene_flat.render_level_flat(
            fbs, flat, static, cams, settings, height=HEIGHT, width=WIDTH,
            debug=debug)
        dc = int((np.asarray(out1.color) != np.asarray(out2.color)).sum())
        dd = int((np.asarray(out1.depth) != np.asarray(out2.depth)).sum())
        ok = "OK" if dc == 0 and dd == 0 else "DIFF"
        bad += dc + dd
        print(f"{name}: color {dc} depth {dd} {ok}", flush=True)
    print("rc_pixels=", bad, flush=True)


if __name__ == "__main__":
    main()

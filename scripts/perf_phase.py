#!/usr/bin/env python
"""Round-3 probe: where do the us/inst go on Cave under REAL game cameras?

Methodology v3: the frame chain runs ON DEVICE inside a jitted
lax.fori_loop with a dynamic trip count — one compile per variant, zero
per-frame host dispatch, so the ~ms host/tunnel noise that corrupted the
eager-chain measurements cancels exactly in the (K2-K1) slope.

    timeout 1700 python scripts/perf_phase.py [n_instances] [level.ron] &
"""

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    level_path = (sys.argv[2] if len(sys.argv) > 2
                  else "/root/reference/assets/samples/levels/Cave.ron")

    import jax
    import jax.numpy as jnp
    from jax import lax
    import bonnie32_tpu  # noqa: F401
    from bonnie32_tpu.config import RasterSettings, WIDTH, HEIGHT
    from bonnie32_tpu.models import scene_flat
    from bonnie32_tpu.ops import raster_batch as rb
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

    # warm 20 steps to spread instances through the level, freeze cameras
    states_w = states0
    for _ in range(20):
        states_w = jax.vmap(lambda s, a: stp.tick(
            s, env.grid, env.params, a, 1.0 / 60.0))(states_w, acts)
    game_cams = jax.vmap(lambda s: stp.character_camera(
        s, env.params))(states_w)
    game_cams = jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x)), game_cams)
    game_cams = jax.tree_util.tree_map(jnp.asarray, game_cams)

    fb0 = raster_ref.new_framebuffer(HEIGHT, WIDTH, depth_mode="inv")
    fbs0 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), fb0)

    def perturb(t):
        # tiny per-frame dependence so XLA can't hoist the frame out of
        # the loop; does not change what the cameras look at
        return jax.tree_util.tree_map(
            lambda x: x + t * jnp.float32(1e-30), game_cams)

    runs = {}

    def add_chain(name, frame_fn):
        """frame_fn: (t, acc) -> scalar contribution; chained on device."""
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

    for name, dbg in (("render", ""), ("novis", "novis"),
                      ("nop2", "nophase2"), ("glue", "novis nophase2"),
                      ("notex", "notex")):
        def frame(t, dbg=dbg):
            out = scene_flat.render_level_flat(
                fbs0, flat, static, perturb(t), settings,
                height=HEIGHT, width=WIDTH, debug=dbg)
            return out.color[0, 0, 0].astype(jnp.float32)

        add_chain(name, frame)

    # constant-background path A/B (round-3 clear_color change): same
    # render with the framebuffer DMAs + layout transposes skipped
    def frame_bg(t):
        out = scene_flat.render_level_flat(
            fbs0, flat, static, perturb(t), settings,
            height=HEIGHT, width=WIDTH, background=0)
        return out.color[0, 0, 0].astype(jnp.float32)

    add_chain("render_bg", frame_bg)

    def frame_prep(t):
        cams = perturb(t)
        surf = jax.vmap(lambda c: scene_flat.build_surfaces_flat(
            flat, c, settings, WIDTH, HEIGHT))(cams)
        prep = jax.vmap(lambda s: rb.prep_instance(
            s, flat.atlas, settings, WIDTH, HEIGHT, static.t_pad))(surf)
        return prep.fscal[0, 0, 0].astype(jnp.float32)

    add_chain("prep", frame_prep)

    def frame_surf(t):
        cams = perturb(t)
        surf = jax.vmap(lambda c: scene_flat.build_surfaces_flat(
            flat, c, settings, WIDTH, HEIGHT))(cams)
        return surf.sx[0, 0, 0].astype(jnp.float32)

    add_chain("surf", frame_surf)

    # glue decomposition (round 5): the same surf+prep+kernel work as
    # render_bg, but reading the LAYOUT output directly (kraw), with the
    # color transpose only (kraw_flc), and with both transposes
    # (kraw_flcd == render_bg minus dispatch) — isolates the from_layout
    # cost inside the ~9.6 us/inst glue figure.
    def _kernel_raw(t):
        cams = perturb(t)
        surf = jax.vmap(lambda c: scene_flat.build_surfaces_flat(
            flat, c, settings, WIDTH, HEIGHT))(cams)
        prep = jax.vmap(lambda s: rb.prep_instance(
            s, flat.atlas, settings, WIDTH, HEIGHT, static.t_pad,
            group_id=flat.f_group))(surf)
        fbc = jnp.zeros((n, 8, 128), jnp.int32)
        fbd = jnp.zeros((n, 8, 128), jnp.float32)
        return rb.rasterize_batch(
            fbc, fbd, prep, flat.keyrows, flat.texmeta, flat.tex_lo,
            flat.tex_hi, flat.tex_pack, flat.tex_pal, settings,
            WIDTH, HEIGHT, static.t_pad, static.n_textures,
            static.atlas_rows, static.key_wrows,
            atlas_rows_data=static.atlas_rows_data, tex_enc=static.tex_enc,
            clear_color=0)

    def frame_kraw(t):
        color, depth = _kernel_raw(t)
        return color[0, 0, 0].astype(jnp.float32)

    add_chain("kraw", frame_kraw)

    def frame_kraw_flc(t):
        color, depth = _kernel_raw(t)
        c = rb.from_layout(color, WIDTH, HEIGHT)
        return c[0, 0, 0].astype(jnp.float32)

    add_chain("kraw_flc", frame_kraw_flc)

    def frame_kraw_flcd(t):
        color, depth = _kernel_raw(t)
        c = rb.from_layout(color, WIDTH, HEIGHT)
        d = rb.from_layout(depth, WIDTH, HEIGHT)
        return c[0, 0, 0].astype(jnp.float32) + d[0, 0, 0]

    add_chain("kraw_flcd", frame_kraw_flcd)

    # datagen: full fused step chained on device (states carried)
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

    @jax.jit
    def chain_step(k):
        def body(i, carry):
            states, acc = carry
            states = jax.vmap(lambda s, a: stp.tick(
                s, env.grid, env.params, a, 1.0 / 60.0))(states, acts)
            cams = jax.vmap(lambda s: stp.character_camera(
                s, env.params))(states)
            return (states, acc + cams.position[0, 0])

        _, acc = lax.fori_loop(0, k, body, (states0, jnp.float32(0)))
        return acc

    runs["steponly"] = lambda k: float(chain_step(jnp.int32(k)))

    rates = measure(runs)
    for name, dt in rates.items():
        print(f"{name:9s} {1000*dt:8.2f} ms/frame  "
              f"{dt/n*1e6:7.2f} us/inst  {n/dt:9.0f} ifps", flush=True)


if __name__ == "__main__":
    main()

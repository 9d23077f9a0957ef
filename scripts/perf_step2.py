#!/usr/bin/env python
"""Round-5 step decomposition (v3 slope): where do steponly's us/inst go?

Variants:
  full      tick + character_camera (the steponly line)
  tickonly  tick without the camera
  nocollide tick with move_and_slide replaced by plain integration
  camonly   character_camera only (no tick)
  full_T    tick + camera with N-LAST state storage (vmap in_axes=-1):
            the per-instance leaves become (E, 3, N)-shaped so the batch
            axis lands on TPU lanes instead of (N, 16, 3) tiles that use
            3 of 128 lanes

    timeout 900 python scripts/perf_step2.py [n] [level.ron]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

K1, K2, ROUNDS = 5, 45, 3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    level_path = (sys.argv[2] if len(sys.argv) > 2
                  else "/root/reference/assets/samples/levels/Cave.ron")

    import jax
    import jax.numpy as jnp
    from jax import lax
    import bonnie32_tpu  # noqa: F401
    from bonnie32_tpu import rollout
    from bonnie32_tpu.game import step as stp
    from bonnie32_tpu.game import collision as gcol

    print(f"# device: {jax.devices()[0]}  n={n}  "
          f"level={level_path.rsplit('/', 1)[-1]}", flush=True)
    level, env, spawn = rollout.demo_env(level_path)
    states0 = rollout.initial_states(level, spawn, n)
    rng = np.random.default_rng(0)
    ang = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    acts = stp.Actions(
        move_x=jnp.asarray(np.sin(ang)), move_y=jnp.asarray(np.cos(ang)),
        cam_x=jnp.zeros(n, jnp.float32), cam_y=jnp.zeros(n, jnp.float32),
        sprint=jnp.zeros(n, bool), jump=jnp.zeros(n, bool))

    dt = 1.0 / 60.0

    def tick_nocollide(s, a):
        s = stp._player_input(s, env.params, a, jnp.float32(dt))
        pos = s.pos + s.vel * jnp.float32(dt)
        return s._replace(pos=pos, time=s.time + jnp.float32(dt))

    def tick_center_only(s, a):
        s = stp._player_input(s, env.params, a, jnp.float32(dt))

        def solve(pos, vel, radius, height, step_h, grounded, room, vvel):
            out = gcol.collide_cylinder(env.grid, pos, vel, radius, height,
                                        step_h, grounded, room, vvel,
                                        env.params.gravity, jnp.float32(dt))
            return out.position, out.grounded, out.room, \
                out.vertical_velocity

        new_pos, g2, r2, v2 = jax.vmap(solve)(
            s.pos, s.vel, s.radius, s.height, s.step_height,
            s.grounded, s.room, s.vertical_velocity)
        cm = (s.has_controller & s.alive)[:, None]
        return s._replace(pos=jnp.where(cm, new_pos, s.pos))

    variants = {}

    def add(name, body_fn):
        @jax.jit
        def chain(k):
            def body(i, carry):
                states, acc = carry
                states, out = body_fn(states)
                return (states, acc + out)

            _, acc = lax.fori_loop(0, k, body, (states0, jnp.float32(0)))
            return acc

        variants[name] = lambda k: float(chain(jnp.int32(k)))

    def full(states):
        states = jax.vmap(lambda s, a: stp.tick(
            s, env.grid, env.params, a, dt))(states, acts)
        cams = jax.vmap(lambda s: stp.character_camera(
            s, env.params))(states)
        return states, cams.position[0, 0]

    def tickonly(states):
        states = jax.vmap(lambda s, a: stp.tick(
            s, env.grid, env.params, a, dt))(states, acts)
        return states, states.pos[0, 0, 0]

    def nocollide(states):
        states = jax.vmap(tick_nocollide)(states, acts)
        return states, states.pos[0, 0, 0]

    def camonly(states):
        cams = jax.vmap(lambda s: stp.character_camera(
            s, env.params))(states)
        st2 = states._replace(time=states.time + cams.position[:, 0] * 1e-30)
        return st2, cams.position[0, 0]

    add("full", full)
    add("tickonly", tickonly)
    add("nocollide", nocollide)
    add("camonly", camonly)

    # ---- entity-capacity scaling: the datagen states carry 16 ECS slots
    # but only the player has a controller; collision solves all 16 ----
    for cap in (4, 2):
        states_c = rollout.initial_states(level, spawn, n, capacity=cap)

        @jax.jit
        def chain_c(k, states_c=states_c):
            def body(i, carry):
                states, acc = carry
                states = jax.vmap(lambda s, a: stp.tick(
                    s, env.grid, env.params, a, dt))(states, acts)
                cams = jax.vmap(lambda s: stp.character_camera(
                    s, env.params))(states)
                return (states, acc + cams.position[0, 0])

            _, acc = lax.fori_loop(0, k, body, (states_c, jnp.float32(0)))
            return acc

        variants[f"full_cap{cap}"] = (
            lambda k, c=chain_c: float(c(jnp.int32(k))))

    # ---- N-last storage: same tick/camera code, batch axis moved to the
    # TRAILING dim so XLA's (sublane, lane) tiling puts N on lanes ----
    states0_T = jax.tree_util.tree_map(
        lambda x: jnp.moveaxis(x, 0, -1), states0)
    acts_T = acts  # leaves are (N,): axis -1 == axis 0

    @jax.jit
    def chain_T(k):
        def body(i, carry):
            states, acc = carry
            states = jax.vmap(
                lambda s, a: stp.tick(s, env.grid, env.params, a, dt),
                in_axes=-1, out_axes=-1)(states, acts_T)
            cams = jax.vmap(lambda s: stp.character_camera(s, env.params),
                            in_axes=-1, out_axes=-1)(states)
            return (states, acc + cams.position[0, 0])

        _, acc = lax.fori_loop(0, k, body, (states0_T, jnp.float32(0)))
        return acc

    variants["full_T"] = lambda k: float(chain_T(jnp.int32(k)))

    for v in variants.values():
        v(2)
    t = {name: {K1: [], K2: []} for name in variants}
    for _ in range(ROUNDS):
        for k in (K1, K2):
            for name, r in variants.items():
                t0 = time.perf_counter()
                r(k)
                t[name][k].append(time.perf_counter() - t0)
    for name, d in t.items():
        dt_s = max((min(d[K2]) - min(d[K1])) / (K2 - K1), 1e-9)
        print(f"{name:10s} {1000*dt_s:8.3f} ms/frame  "
              f"{dt_s/n*1e6:7.3f} us/inst", flush=True)


if __name__ == "__main__":
    main()

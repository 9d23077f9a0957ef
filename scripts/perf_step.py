#!/usr/bin/env python
"""Focused steponly probe (v3 slope method): game tick + camera only.

    timeout 900 python scripts/perf_step.py [n] [level.ron]
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

    run = lambda k: float(chain_step(jnp.int32(k)))  # noqa: E731
    run(2)
    t = {K1: [], K2: []}
    for _ in range(ROUNDS):
        for k in (K1, K2):
            t0 = time.perf_counter()
            run(k)
            t[k].append(time.perf_counter() - t0)
    dt = max((min(t[K2]) - min(t[K1])) / (K2 - K1), 1e-9)
    print(f"steponly {1000*dt:8.2f} ms/frame  {dt/n*1e6:7.2f} us/inst  "
          f"{n/dt:9.0f} ifps", flush=True)


if __name__ == "__main__":
    main()

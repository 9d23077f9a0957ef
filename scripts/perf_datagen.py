#!/usr/bin/env python
"""Round-3 probe: datagen overhead — eager step_and_render vs one jitted
step, at N=128 and N=1024.

    timeout 1700 python scripts/perf_datagen.py &
"""

import functools
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np

K1, K2, ROUNDS = 3, 13, 3


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
    import jax
    import jax.numpy as jnp
    import bonnie32_tpu  # noqa: F401
    from bonnie32_tpu.config import RasterSettings
    from bonnie32_tpu import rollout
    from bonnie32_tpu.game import step as stp

    print(f"# device: {jax.devices()[0]}", flush=True)
    settings = RasterSettings.game()

    level, env, spawn = rollout.demo_env(
        "/root/reference/assets/samples/levels/Cave.ron", flat=True)
    print(f"# env.sky is None: {env.sky is None}", flush=True)

    @functools.partial(jax.jit, static_argnames=("settings",))
    def jstep(states, env, acts, settings):
        return rollout.step_and_render(states, env, acts, settings)

    for n in (128, 1024):
        states0 = rollout.initial_states(level, spawn, n)
        rng = np.random.default_rng(0)
        ang = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
        acts = stp.Actions(
            move_x=jnp.asarray(np.sin(ang)), move_y=jnp.asarray(np.cos(ang)),
            cam_x=jnp.zeros(n, jnp.float32), cam_y=jnp.zeros(n, jnp.float32),
            sprint=jnp.zeros(n, bool), jump=jnp.zeros(n, bool))

        def run_eager(k, states0=states0, acts=acts):
            states = states0
            acc = jnp.float32(0)
            for _ in range(k):
                states, fbs = rollout.step_and_render(states, env, acts,
                                                      settings)
                acc = acc + fbs.color[0, 0, 0]
            return float(acc)

        def run_jit(k, states0=states0, acts=acts):
            states = states0
            acc = jnp.float32(0)
            for _ in range(k):
                states, fbs = jstep(states, env, acts, settings)
                acc = acc + fbs.color[0, 0, 0]
            return float(acc)

        rates = measure({"eager": run_eager, "jit": run_jit})
        for name, dt in rates.items():
            print(f"n={n:5d} {name:6s} {1000*dt:8.2f} ms/frame  "
                  f"{dt/n*1e6:7.2f} us/inst  {n/dt:9.0f} ifps", flush=True)


if __name__ == "__main__":
    main()

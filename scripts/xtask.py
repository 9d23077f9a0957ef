#!/usr/bin/env python
"""Repo task runner — the TPU-native counterpart of the reference's
`xtask/src/main.rs` (build/deploy helper) + `.github/workflows` CI.

Tasks:
    python scripts/xtask.py test        fast correctness subset (~2 min)
    python scripts/xtask.py test-all    full suite (virtual 8-CPU mesh)
    python scripts/xtask.py dryrun      multi-chip sharding dry run
    python scripts/xtask.py smoke      one CPU end-to-end datagen frame
    python scripts/xtask.py package     build the sdist/wheel
    python scripts/xtask.py ci          test + dryrun + smoke (the CI gate)

Every task is a plain subprocess so CI systems can call this file as
their single entry point (scripts/ci.sh does).
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The fast gate: one file per subsystem, all CPU-cheap.
FAST_TESTS = [
    "tests/test_fixed.py",
    "tests/test_color.py",
    "tests/test_ecs.py",
    "tests/test_editor_state.py",
    "tests/test_modeler.py",
    "tests/test_widgets.py",
    "tests/test_storage.py",
    "tests/test_audio.py",
]


def run(cmd, **kw) -> int:
    print(f"[xtask] {' '.join(cmd)}", flush=True)
    return subprocess.call(cmd, cwd=ROOT, **kw)


def task_test() -> int:
    return run([sys.executable, "-m", "pytest", "-q", *FAST_TESTS])


def task_test_all() -> int:
    return run([sys.executable, "-m", "pytest", "-q", "tests/"])


def task_dryrun() -> int:
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               JAX_PLATFORMS="cpu")
    return run([sys.executable, "-m", "bonnie32_tpu.parallel.dryrun", "8"],
               env=env)


def task_smoke() -> int:
    """One full datagen step end-to-end on CPU (tiny shapes)."""
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import jax.numpy as jnp\n"
        "from bonnie32_tpu import rollout\n"
        "from bonnie32_tpu.config import RasterSettings\n"
        "from bonnie32_tpu.game import step as stp\n"
        "level, env, spawn = rollout.demo_env()\n"
        "n = 4\n"
        "states = rollout.initial_states(level, spawn, n)\n"
        "acts = stp.Actions(move_x=jnp.ones(n), move_y=jnp.zeros(n),\n"
        "                   cam_x=jnp.zeros(n), cam_y=jnp.zeros(n),\n"
        "                   sprint=jnp.zeros(n, bool),\n"
        "                   jump=jnp.zeros(n, bool))\n"
        "st, fbs = rollout.step_and_render(states, env, acts,\n"
        "    RasterSettings.game(), height=48, width=64)\n"
        "assert fbs.color.shape == (n, 48, 64)\n"
        "print('smoke OK:', fbs.color.shape)\n")
    return run([sys.executable, "-c", code])


def task_package() -> int:
    rc = run([sys.executable, "-m", "pip", "wheel", "--no-deps",
              "--no-build-isolation", "-w", "dist", "."])
    if rc == 0:
        import glob
        print("[xtask] built:", glob.glob(os.path.join(ROOT, "dist", "*")))
    return rc


def task_ci() -> int:
    for t in (task_test, task_dryrun, task_smoke):
        rc = t()
        if rc != 0:
            return rc
    print("[xtask] CI gate green")
    return 0


TASKS = {"test": task_test, "test-all": task_test_all,
         "dryrun": task_dryrun, "smoke": task_smoke,
         "package": task_package, "ci": task_ci}


def main() -> int:
    if len(sys.argv) != 2 or sys.argv[1] not in TASKS:
        print(__doc__)
        return 2
    return TASKS[sys.argv[1]]()


if __name__ == "__main__":
    sys.exit(main())

"""Multi-chip sharding: the fused step over an 8-device instance mesh must
equal the unsharded result (SURVEY.md section 2.8 — pure DP over instances).

Runs on the virtual 8-device CPU mesh from conftest.py; the driver's
__graft_entry__.dryrun_multichip exercises the same path in a subprocess.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bonnie32_tpu.config import RasterSettings
from bonnie32_tpu import rollout
from bonnie32_tpu.game import step as stp
from bonnie32_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def cave_env():
    level, env, spawn = rollout.demo_env()
    return level, env, spawn


def _actions(n):
    ang = jnp.arange(n, dtype=jnp.float32)
    return stp.Actions(
        move_x=jnp.sin(ang), move_y=jnp.cos(ang),
        cam_x=jnp.zeros(n), cam_y=jnp.zeros(n),
        sprint=jnp.zeros(n, bool), jump=jnp.zeros(n, bool))


def test_sharded_step_equals_unsharded(cave_env):
    level, env, spawn = cave_env
    n_dev = min(len(jax.devices()), 8)
    assert n_dev == 8, f"conftest should provide 8 CPU devices, got {n_dev}"
    n = n_dev * 2
    states = rollout.initial_states(level, spawn, n)
    acts = _actions(n)
    settings = RasterSettings.game()

    ref_states, ref_fbs = rollout.step_and_render(
        states, env, acts, settings, height=24, width=32,
        instance_chunk=None)

    mesh = pmesh.instance_mesh(jax.devices()[:n_dev])
    sh_states, sh_fbs = rollout.step_and_render(
        pmesh.shard_instances(states, mesh),
        pmesh.replicate(env, mesh),
        pmesh.shard_instances(acts, mesh),
        settings, height=24, width=32, instance_chunk=None)

    # Output really is distributed over the mesh...
    assert len(sh_fbs.color.sharding.device_set) == n_dev
    # ...and bit-identical to the single-device run.
    np.testing.assert_array_equal(np.asarray(sh_fbs.color),
                                  np.asarray(ref_fbs.color))
    np.testing.assert_array_equal(np.asarray(sh_states.pos),
                                  np.asarray(ref_states.pos))


def test_multistep_rollout_sharded(cave_env):
    """Several chained sharded steps keep the instance axis sharded (no
    resharding churn between steps)."""
    level, env, spawn = cave_env
    mesh = pmesh.instance_mesh(jax.devices()[:8])
    n = 16
    states = pmesh.shard_instances(rollout.initial_states(level, spawn, n),
                                   mesh)
    env_r = pmesh.replicate(env, mesh)
    acts = pmesh.shard_instances(_actions(n), mesh)
    settings = RasterSettings.game()

    for _ in range(3):
        states, fbs = rollout.step_and_render(
            states, env_r, acts, settings, height=24, width=32,
            instance_chunk=None)
    assert len(states.pos.sharding.device_set) == 8
    assert np.isfinite(np.asarray(states.pos)).all()


def test_flat_kernel_path_shards_via_shard_map(cave_env):
    """The batched Pallas path can't be auto-partitioned by XLA SPMD;
    pmesh.sharded_step_and_render shard_maps it over the instance mesh
    and must reproduce the unsharded result bit-for-bit."""
    level, _, spawn = cave_env
    from bonnie32_tpu.models import texture_pack as tp
    textures = tp.load_texture_packs(
        "/root/reference/assets/samples/texture-packs")
    resolve = tp.make_resolver(textures)
    env = rollout.build_env(level, textures, resolve, flat=True)
    assert env.flat is not None

    n_dev = min(len(jax.devices()), 8)
    n = n_dev * 2
    states = rollout.initial_states(level, spawn, n)
    acts = _actions(n)
    settings = RasterSettings.game()
    H, W = 24, 32

    ref_states, ref_fbs = rollout.step_and_render(
        states, env, acts, settings, height=H, width=W,
        instance_chunk=None)

    mesh = pmesh.instance_mesh(jax.devices()[:n_dev])
    step = pmesh.sharded_step_and_render(mesh, env, settings, H, W)
    sh_states, sh_fbs = step(pmesh.shard_instances(states, mesh),
                             pmesh.shard_instances(acts, mesh))

    assert len(sh_fbs.color.sharding.device_set) == n_dev
    np.testing.assert_array_equal(np.asarray(sh_fbs.color),
                                  np.asarray(ref_fbs.color))
    np.testing.assert_array_equal(np.asarray(sh_states.pos),
                                  np.asarray(ref_states.pos))

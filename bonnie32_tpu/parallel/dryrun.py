"""Standalone multi-chip dry run: shard the FULL fused step over an
n-device instance mesh and verify it against the unsharded run.

Run as ``python -m bonnie32_tpu.parallel.dryrun <n_devices>`` with
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=<n>``
(the launcher in __graft_entry__.py sets these).  Must import jax only
after the env is in place, so all backend initialization sees the virtual
CPU mesh — the round-1 failure mode was touching the real TPU client here
(MULTICHIP_r01.json: libtpu AOT mismatch).

Validates the framework's scaling axis (SURVEY.md section 2.8): pure data
parallelism over independent game instances; scene data replicated; XLA
inserts no collectives in the hot path.
"""

import os
import sys


def main(n_devices: int) -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")

    devices = jax.devices("cpu")
    assert len(devices) >= n_devices, (
        f"need {n_devices} virtual CPU devices, have {len(devices)}; "
        "set XLA_FLAGS=--xla_force_host_platform_device_count")
    devices = devices[:n_devices]

    from bonnie32_tpu.config import RasterSettings
    from bonnie32_tpu import rollout
    from bonnie32_tpu.game import step as stp
    from bonnie32_tpu.parallel import mesh as pmesh

    dev_mesh = pmesh.instance_mesh(devices)

    n = n_devices * 2
    level, env, spawn = rollout.demo_env()
    states = rollout.initial_states(level, spawn, n)
    ang = jnp.arange(n, dtype=jnp.float32)
    acts = stp.Actions(
        move_x=jnp.sin(ang), move_y=jnp.cos(ang),
        cam_x=jnp.zeros(n), cam_y=jnp.zeros(n),
        sprint=jnp.zeros(n, bool), jump=jnp.zeros(n, bool))
    settings = RasterSettings.game()

    # Unsharded baseline (single device).
    ref_states, ref_fbs = rollout.step_and_render(
        states, env, acts, settings, height=24, width=32,
        instance_chunk=None)
    ref_color = np.asarray(ref_fbs.color)

    # Sharded run over the instance mesh.
    sh_states = pmesh.shard_instances(states, dev_mesh)
    sh_env = pmesh.replicate(env, dev_mesh)
    sh_acts = pmesh.shard_instances(acts, dev_mesh)
    out_states, fbs = rollout.step_and_render(
        sh_states, sh_env, sh_acts, settings, height=24, width=32,
        instance_chunk=None)
    fbs.color.block_until_ready()

    assert fbs.color.shape == (n, 24, 32), fbs.color.shape
    shard_axes = {d for d, s in enumerate(fbs.color.sharding.spec) if s}
    np.testing.assert_array_equal(np.asarray(fbs.color), ref_color)
    np.testing.assert_allclose(
        np.asarray(out_states.pos), np.asarray(ref_states.pos), rtol=1e-6)
    print(f"dryrun_multichip OK: {n} game instances (step+render) over "
          f"{n_devices} devices, sharding {fbs.color.sharding}, "
          f"sharded axes {shard_axes or '{replicated}'}, "
          f"output == unsharded baseline")

    # The flagship batched-Pallas path shards via shard_map (XLA auto-SPMD
    # cannot partition a pallas_call); verify it too.
    from bonnie32_tpu.models import texture_pack as tp
    textures = tp.load_texture_packs(
        "/root/reference/assets/samples/texture-packs")
    resolve = tp.make_resolver(textures)
    fenv = rollout.build_env(level, textures, resolve, flat=True)
    fref_states, fref_fbs = rollout.step_and_render(
        states, fenv, acts, settings, height=24, width=32,
        instance_chunk=None)
    step = pmesh.sharded_step_and_render(dev_mesh, fenv, settings, 24, 32)
    fsh_states, fsh_fbs = step(pmesh.shard_instances(states, dev_mesh),
                               pmesh.shard_instances(acts, dev_mesh))
    np.testing.assert_array_equal(np.asarray(fsh_fbs.color),
                                  np.asarray(fref_fbs.color))
    assert len(fsh_fbs.color.sharding.device_set) == n_devices
    print(f"dryrun_multichip OK: batched Pallas path (shard_map) over "
          f"{n_devices} devices == unsharded baseline")

    # Realistic-shape compile check (VERDICT r2 weak #5): the same
    # sharded program at the production framebuffer size and a real
    # instance count must BUILD — no execution/timing claims (CPU would
    # take minutes per frame; the bench measures the real chip).
    n_full = max(n_devices * 8, 64)
    full_states = rollout.initial_states(level, spawn, n_full)
    angf = jnp.arange(n_full, dtype=jnp.float32)
    full_acts = stp.Actions(
        move_x=jnp.sin(angf), move_y=jnp.cos(angf),
        cam_x=jnp.zeros(n_full), cam_y=jnp.zeros(n_full),
        sprint=jnp.zeros(n_full, bool), jump=jnp.zeros(n_full, bool))
    full_step = pmesh.sharded_step_and_render(dev_mesh, fenv, settings,
                                              240, 320)
    full_step.lower(pmesh.shard_instances(full_states, dev_mesh),
                    pmesh.shard_instances(full_acts, dev_mesh)).compile()
    print(f"dryrun_multichip OK: 320x240 N={n_full} shard_map program "
          f"compiled over {n_devices} devices")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)

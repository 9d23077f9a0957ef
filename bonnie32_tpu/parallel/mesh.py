"""Instance-axis sharding over a jax.sharding.Mesh.

The reference is a single-process interactive app; the scaling axis of the
TPU build is *batch parallelism over independent game instances*
(SURVEY.md section 2.8).  Instances never communicate, so the mesh is a pure
data-parallel axis: per-instance state (framebuffers, cameras, ECS state,
action streams) shards along axis 0 with `P("inst")`; scene data (geometry,
atlas, lights) replicates.  XLA inserts no collectives in the hot path —
exactly the embarrassingly-parallel layout the workload calls for; ICI/DCN
only carry host I/O.
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

INSTANCE_AXIS = "inst"


def instance_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D device mesh over the instance axis."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(devices, (INSTANCE_AXIS,))


def shard_instances(tree, mesh: Mesh):
    """Place per-instance pytrees: leading axis sharded over the mesh."""
    def put(x):
        spec = P(INSTANCE_AXIS, *([None] * (jnp.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)


def replicate(tree, mesh: Mesh):
    """Place shared pytrees fully replicated."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(put, tree)


def instance_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P(INSTANCE_AXIS, *([None] * (ndim - 1))))


def sharded_step_and_render(mesh: Mesh, env, settings, height, width,
                            dt: float = 1.0 / 60.0):
    """Multi-chip datagen step for the batched Pallas path.

    XLA's automatic SPMD cannot partition a pallas_call, so the fused
    step wraps in shard_map: each device runs the full kernel on its
    instance shard; scene tables close over and replicate.  Returns a
    jitted (states, actions) -> (states, framebuffers) whose inputs and
    outputs are sharded along the instance axis.
    """
    import functools

    from jax.experimental.shard_map import shard_map

    from .. import rollout

    spec = P(INSTANCE_AXIS)

    def local_step(states, actions):
        return rollout.step_and_render(states, env, actions, settings,
                                       height=height, width=width,
                                       dt=dt, instance_chunk=None)

    sharded = shard_map(local_step, mesh=mesh,
                        in_specs=(spec, spec), out_specs=(spec, spec),
                        check_rep=False)
    return jax.jit(sharded)

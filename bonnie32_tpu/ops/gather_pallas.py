"""Fast arbitrary-table gather as a Pallas kernel.

XLA:TPU's gather lowering is erratic for the per-pixel table lookups this
renderer needs (texels, key-bit words, per-surface attributes): measured
anywhere from 0.03 ms to 40 ms for the same 77k-element lookup depending on
fusion context.  Mosaic's `take_along_axis` hits the hardware dynamic-gather
unit (~210 G elem/s) but only supports same-shape operands with a 128-lane
range.

`select_gather` lifts that to arbitrary table sizes: the table is reshaped to
(G, 128) groups; the kernel loops over groups (static G), broadcasting each
group's row and lane-gathering, keeping the value whose group matches the
index's high bits.  Cost: G row-gathers per index block — for the small
tables of this workload (<= 32k entries) that's microseconds per frame.

Works under vmap (instances batch into the grid) and inside fori_loop bodies.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32 = jnp.int32

_LANES = 128
_BLOCK_ROWS = 512  # rows of 128 indices per grid step


def _lane_take(operand, lane_idx):
    """take_along_axis(operand, lane_idx, axis=1) with i32 indices.

    (jnp.take_along_axis force-converts indices to int64 under x64, which
    Mosaic rejects; this builds the identical gather with i32.)
    """
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return jax.lax.gather(
        operand, lane_idx[..., None].astype(_I32), dnums, (1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _kernel(table_ref, idx_ref, out_ref, *, groups):
    idx = idx_ref[:]
    group = idx >> 7          # // 128
    lane = idx & 127
    rows = idx.shape[0]
    acc = jnp.zeros(idx.shape, table_ref.dtype)
    for g in range(groups):
        row = jnp.broadcast_to(table_ref[g][None, :], (rows, _LANES))
        sel = _lane_take(row, lane)
        acc = jnp.where(group == g, sel, acc)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=())
def select_gather(table, idx):
    """table (A,) -> out[...] = table[idx[...]]; idx int32 in [0, A).

    Out-of-range indices return arbitrary in-range data (callers mask).
    """
    a = table.shape[0]
    groups = -(-a // _LANES)
    table2 = jnp.zeros((groups * _LANES,), table.dtype).at[:a].set(table)
    table2 = table2.reshape(groups, _LANES)

    shape = idx.shape
    n = idx.size
    rows = -(-n // _LANES)
    pad_rows = -(-rows // 8) * 8
    flat = jnp.zeros((pad_rows * _LANES,), _I32).at[:n].set(
        idx.reshape(-1).astype(_I32))
    flat = jnp.clip(flat, 0, a - 1).reshape(pad_rows, _LANES)

    out = pl.pallas_call(
        functools.partial(_kernel, groups=groups),
        out_shape=jax.ShapeDtypeStruct((pad_rows, _LANES), table.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table2, flat)
    return out.reshape(-1)[:n].reshape(shape)

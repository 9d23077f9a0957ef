"""Per-frame event queues as fixed-capacity device buffers.

Reference: `/root/reference/src/game/event.rs` — EventQueue<T> (:21) with
push/drain/clear and the Events aggregate (:69) holding damage/death/
spawn/checkpoint/door/item/collision/respawn queues, cleared every frame
(runtime.rs:482).

TPU design: each queue is (count, columns...) with masked pushes; a push
past capacity drops (the reference Vec would grow — capacity is sized for
a frame's worth of events, and `dropped` counts any overflow so tests can
assert none occurred).  All ops are jittable and vmap over instances.
"""

from typing import NamedTuple

import jax.numpy as jnp

_F32 = jnp.float32
_I32 = jnp.int32


class EventQueue(NamedTuple):
    """One typed queue: i32 payload lanes (entities, amounts, discriminants)
    plus an f32 vector lane for positions."""

    count: jnp.ndarray    # () i32
    dropped: jnp.ndarray  # () i32
    a: jnp.ndarray        # (C,) i32 (e.g. target/entity)
    b: jnp.ndarray        # (C,) i32 (e.g. source/amount)
    c: jnp.ndarray        # (C,) i32 (e.g. amount/discriminant)
    pos: jnp.ndarray      # (C, 3) f32


def new_queue(capacity: int = 32) -> EventQueue:
    return EventQueue(count=jnp.asarray(0, _I32),
                      dropped=jnp.asarray(0, _I32),
                      a=jnp.zeros(capacity, _I32),
                      b=jnp.zeros(capacity, _I32),
                      c=jnp.zeros(capacity, _I32),
                      pos=jnp.zeros((capacity, 3), _F32))


def push(q: EventQueue, a=0, b=0, c=0, pos=(0.0, 0.0, 0.0),
         enabled=True) -> EventQueue:
    """Masked push (event.rs:33).  No-op when `enabled` is False."""
    cap = q.a.shape[0]
    enabled = jnp.asarray(enabled, bool)
    fits = enabled & (q.count < cap)
    idx = jnp.where(fits, q.count, 0)

    def put(arr, val):
        cur = arr[idx]
        return arr.at[idx].set(jnp.where(fits, jnp.asarray(val, arr.dtype),
                                         cur))

    return EventQueue(
        count=q.count + fits.astype(_I32),
        dropped=q.dropped + (enabled & ~fits).astype(_I32),
        a=put(q.a, a), b=put(q.b, b), c=put(q.c, c),
        pos=q.pos.at[idx].set(jnp.where(fits, jnp.asarray(pos, _F32),
                                        q.pos[idx])))


def push_many(q: EventQueue, mask, a=None, b=None, c=None,
              pos=None) -> EventQueue:
    """Append all masked rows in index order (compaction via stable sort)."""
    n = mask.shape[0]
    cap = q.a.shape[0]
    mask = jnp.asarray(mask, bool)
    # stable order: selected rows first, in original order
    order = jnp.argsort(jnp.where(mask, jnp.arange(n), n + jnp.arange(n)),
                        stable=True).astype(_I32)
    k = jnp.sum(mask.astype(_I32))
    slot = q.count + jnp.arange(n, dtype=_I32)      # destination per rank
    ok = (jnp.arange(n) < k) & (slot < cap)
    dst = jnp.where(ok, slot, cap)                  # cap = drop row

    def scat(arr, vals):
        if vals is None:
            vals = jnp.zeros(n, arr.dtype)
        vals = jnp.asarray(vals, arr.dtype)[order]
        return arr.at[dst].set(vals, mode="drop")

    newq = EventQueue(
        count=jnp.minimum(q.count + k, cap),
        dropped=q.dropped + jnp.maximum(q.count + k - cap, 0),
        a=scat(q.a, a), b=scat(q.b, b), c=scat(q.c, c),
        pos=(q.pos if pos is None
             else q.pos.at[dst].set(jnp.asarray(pos, _F32)[order],
                                    mode="drop")))
    return newq


def clear(q: EventQueue) -> EventQueue:
    """event.rs:49 — counts reset; storage reused."""
    return q._replace(count=jnp.asarray(0, _I32),
                      dropped=jnp.asarray(0, _I32))


class Events(NamedTuple):
    """event.rs:69 — aggregate.  Lane meanings:
    damage:      a=target, b=source, c=amount, pos=hit position
    death:       a=entity, c=team, pos=death position
    pickup:      a=item entity, b=collector, c=amount, (subtype in b of item)
    door:        a=door, b=opener, c=1 opened / 0 blocked
    checkpoint:  a=checkpoint, b=player
    collision:   a=entity A, b=entity B
    respawn:     a=player, pos=respawn position
    spawn:       a=new entity, c=kind
    """

    damage: EventQueue
    death: EventQueue
    pickup: EventQueue
    door: EventQueue
    checkpoint: EventQueue
    collision: EventQueue
    respawn: EventQueue
    spawn: EventQueue


def new_events(capacity: int = 32) -> Events:
    return Events(*(new_queue(capacity) for _ in range(8)))


def clear_all(ev: Events) -> Events:
    """runtime.rs:482 — end-of-frame clear."""
    return Events(*(clear(q) for q in ev))

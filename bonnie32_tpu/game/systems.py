"""ECS systems: health/damage, combat overlap, interactions, transforms.

Reference behavior:
  * Health::damage / heal / i-frames — `/root/reference/src/game/
    components.rs:103-142`.
  * tick() system order — `/root/reference/src/game/runtime.rs:405-482`:
    controllers -> plain velocity integration -> global transforms ->
    i-frame tick -> despawn flush -> event clear.
  * Hitbox/Hurtbox + Team filtering — components.rs:146-215.  The reference
    declares the storages and spawns hitboxes/hurtboxes (world.rs:288) but
    leaves the overlap system for the game layer; `combat_system` here is
    the batched sphere-overlap damage pass built on those exact components.
  * Door/Key/Checkpoint/Item semantics — components.rs:278-351.

All systems are jittable and vmap over a leading instance axis.
"""

from typing import Tuple

import jax.numpy as jnp

from . import events as ev
from .state import (AI_DEAD, GameState, KIND_CHECKPOINT, KIND_DOOR,
                    KIND_ITEM, KIND_KEY, TEAM_NEUTRAL)

_F32 = jnp.float32
_I32 = jnp.int32


# ---------------------------------------------------------------------------
# Health (components.rs:103-142)
# ---------------------------------------------------------------------------

def apply_damage(state: GameState, target, amount, source=-1,
                 iframes: float = 0.0, events: ev.Events = None):
    """Health::damage — no-op during i-frames; clamps at 0.

    Returns (state, died, events).  `iframes` seconds are granted on a
    successful hit (set_invincible).
    """
    has = state.has_health[target] & state.alive[target]
    vulnerable = has & (state.invincibility[target] <= 0.0)
    new_hp = jnp.maximum(state.hp[target] - jnp.asarray(amount, _I32), 0)
    hp = jnp.where(vulnerable, new_hp, state.hp[target])
    died = vulnerable & (hp == 0) & (state.hp[target] > 0)
    state = state._replace(
        hp=state.hp.at[target].set(hp),
        invincibility=state.invincibility.at[target].set(
            jnp.where(vulnerable, _F32(iframes),
                      state.invincibility[target])))
    if events is not None:
        events = events._replace(
            damage=ev.push(events.damage, a=target, b=source, c=amount,
                           pos=state.pos[target], enabled=vulnerable),
            death=ev.push(events.death, a=target, c=state.team[target],
                          pos=state.pos[target], enabled=died))
    return state, died, events


def heal(state: GameState, target, amount) -> GameState:
    """Health::heal — clamps at max."""
    has = state.has_health[target] & state.alive[target]
    hp = jnp.minimum(state.hp[target] + jnp.asarray(amount, _I32),
                     state.max_hp[target])
    return state._replace(hp=state.hp.at[target].set(
        jnp.where(has, hp, state.hp[target])))


def tick_invincibility(state: GameState, dt) -> GameState:
    """tick_invincibility (components.rs:140) — saturating countdown.
    The reference counts frames; we hold seconds and subtract dt."""
    return state._replace(
        invincibility=jnp.maximum(state.invincibility - jnp.asarray(dt, _F32),
                                  0.0))


# ---------------------------------------------------------------------------
# Combat: hitbox vs hurtbox sphere overlap with team filtering
# ---------------------------------------------------------------------------

def combat_system(state: GameState, events: ev.Events, dt,
                  iframes: float = 0.5):
    """All active hitboxes vs all hurtboxes, O(E^2) vectorized.

    Team rule (components.rs:209): same-team pairs never damage; NEUTRAL
    damages everyone.  Damage = hitbox.damage * hurtbox.multiplier
    (truncated), attributed to the hitbox's owner when set.
    """
    e = state.alive.shape[0]
    pos = state.pos
    d = pos[:, None, :] - pos[None, :, :]
    dist_sq = jnp.sum(d * d, axis=-1)                       # (E, E)
    reach = state.hitbox_radius[:, None] + state.hurtbox_radius[None, :]
    overlap = dist_sq <= reach * reach

    att_ok = state.alive & state.hitbox_active & (state.hitbox_radius > 0)
    vic_ok = state.alive & (state.hurtbox_radius > 0) & state.has_health \
        & (state.invincibility <= 0.0)
    teams_differ = ((state.team[:, None] != state.team[None, :])
                    | (state.team[:, None] == TEAM_NEUTRAL))
    not_self = ~jnp.eye(e, dtype=bool)
    not_owner = state.owner[:, None] != jnp.arange(e, dtype=_I32)[None, :]

    hits = (overlap & att_ok[:, None] & vic_ok[None, :] & teams_differ
            & not_self & not_owner)                          # (E_att, E_vic)

    dmg_pair = jnp.trunc(state.hitbox_damage[:, None].astype(_F32)
                         * state.hurtbox_mult[None, :]).astype(_I32)
    dmg_taken = jnp.sum(jnp.where(hits, dmg_pair, 0), axis=0)  # per victim
    was_hit = jnp.any(hits, axis=0)

    hp = jnp.maximum(state.hp - dmg_taken, 0)
    died = was_hit & (hp == 0) & (state.hp > 0)
    state = state._replace(
        hp=jnp.where(was_hit, hp, state.hp),
        invincibility=jnp.where(was_hit, _F32(iframes),
                                state.invincibility),
        ai_state=jnp.where(died, AI_DEAD, state.ai_state))

    # attribution: first attacker index per victim (argmax over bool col)
    first_att = jnp.argmax(hits, axis=0).astype(_I32)
    src = jnp.where(state.owner[first_att] >= 0, state.owner[first_att],
                    first_att)
    events = events._replace(
        damage=ev.push_many(events.damage, was_hit,
                            a=jnp.arange(e, dtype=_I32), b=src,
                            c=dmg_taken, pos=pos),
        death=ev.push_many(events.death, died,
                           a=jnp.arange(e, dtype=_I32), c=state.team,
                           pos=pos))
    return state, events


# ---------------------------------------------------------------------------
# Interactions (components.rs:278-351)
# ---------------------------------------------------------------------------

def try_open_door(state: GameState, door, opener, held_keys,
                  events: ev.Events):
    """Door::required_key check: opens if unlocked or the key is held.

    held_keys: (K,) i32 key types owned by the opener (-1 padding).
    """
    is_door = state.alive[door] & (state.kind[door] == KIND_DOOR)
    was_open = state.door_open[door]
    need = state.door_key[door]
    have = (need < 0) | jnp.any(held_keys == need)
    opened = is_door & ~was_open & have
    state = state._replace(door_open=state.door_open.at[door].set(
        was_open | opened))
    # one event per attempt on a closed door: c=1 opened, c=0 blocked
    events = events._replace(door=ev.push(
        events.door, a=door, b=opener, c=opened.astype(_I32),
        pos=state.pos[door], enabled=is_door & ~was_open))
    return state, opened, events


def activate_checkpoint(state: GameState, checkpoint, player,
                        events: ev.Events):
    """Checkpoint::is_activated + respawn point = pos + offset."""
    is_cp = state.alive[checkpoint] & (state.kind[checkpoint]
                                       == KIND_CHECKPOINT)
    newly = is_cp & ~state.checkpoint_active[checkpoint]
    state = state._replace(
        checkpoint_active=state.checkpoint_active.at[checkpoint].set(
            state.checkpoint_active[checkpoint] | is_cp))
    events = events._replace(checkpoint=ev.push(
        events.checkpoint, a=checkpoint, b=player,
        pos=state.pos[checkpoint] + state.respawn_offset[checkpoint],
        enabled=newly))
    return state, events


def collect_item(state: GameState, item, collector, events: ev.Events):
    """ItemType semantics: HealthPickup heals item_amount; keys land in the
    pickup queue (b lane carries key_type) for the inventory layer."""
    is_item = state.alive[item] & ((state.kind[item] == KIND_ITEM)
                                   | (state.kind[item] == KIND_KEY))
    amount = state.item_amount[item]
    state = heal(state, collector,
                 jnp.where(is_item, amount, 0))
    events = events._replace(pickup=ev.push(
        events.pickup, a=item, b=state.key_type[item], c=amount,
        pos=state.pos[item], enabled=is_item))
    # collected items despawn
    state = state._replace(
        alive=state.alive.at[item].set(state.alive[item] & ~is_item))
    return state, events


# ---------------------------------------------------------------------------
# Movement / transforms (runtime.rs:449-470)
# ---------------------------------------------------------------------------

def integrate_velocities(state: GameState, dt) -> GameState:
    """Plain velocity integration for entities WITHOUT controllers
    (runtime.rs:449-460); controller entities move via move_and_slide."""
    move = (state.alive & ~state.has_controller)[:, None]
    return state._replace(
        pos=jnp.where(move, state.pos + state.vel * jnp.asarray(dt, _F32),
                      state.pos))


def global_positions(state: GameState) -> jnp.ndarray:
    """GlobalTransform pass (runtime.rs:464): one parent level deep, like
    the reference's single-pass update (children read last frame's parent
    for deeper chains)."""
    has_parent = state.parent >= 0
    pidx = jnp.maximum(state.parent, 0)
    return jnp.where(has_parent[:, None], state.pos[pidx] + state.pos,
                     state.pos)

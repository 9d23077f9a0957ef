"""SoA ECS state: fixed-capacity entity tables as a pytree.

The reference's mini-ECS (game/world.rs:22, entity.rs, component.rs) uses
generational indices over Vec<Option<T>> storages; the TPU equivalent is
struct-of-arrays with alive masks and generation counters — identical
semantics, fully vmap-able over a leading instance axis.

Entity kinds (game/components.rs:223-380 marker components):
0 none, 1 player, 2 enemy, 3 projectile, 4 item, 5 door, 6 checkpoint,
7 spawn point.
"""

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

_F32 = jnp.float32
_I32 = jnp.int32

KIND_NONE, KIND_PLAYER, KIND_ENEMY, KIND_PROJECTILE, KIND_ITEM, \
    KIND_DOOR, KIND_CHECKPOINT, KIND_SPAWN, KIND_KEY = range(9)

# Team (components.rs:209): Neutral damages everyone.
TEAM_NEUTRAL, TEAM_PLAYER, TEAM_ENEMY = range(3)

# AiState (components.rs:358).
AI_IDLE, AI_PATROL, AI_CHASE, AI_ATTACK, AI_RECOVER, AI_FLEE, AI_DEAD = \
    range(7)

# EnemyType (components.rs:231).
ENEMY_GRUNT, ENEMY_ARCHER, ENEMY_HEAVY, ENEMY_SWARM, ENEMY_ELITE, \
    ENEMY_BOSS = range(6)


class GameState(NamedTuple):
    """One game instance's ECS + camera state (batch with vmap)."""

    # entity allocator (game/entity.rs)
    alive: jnp.ndarray        # (E,) bool
    generation: jnp.ndarray   # (E,) i32
    kind: jnp.ndarray         # (E,) i32

    # transforms + velocity (game/transform.rs, components.rs:41)
    pos: jnp.ndarray          # (E, 3) f32
    vel: jnp.ndarray          # (E, 3) f32

    # CharacterController (components.rs:52)
    has_controller: jnp.ndarray  # (E,) bool
    radius: jnp.ndarray          # (E,) f32
    height: jnp.ndarray          # (E,) f32
    step_height: jnp.ndarray     # (E,) f32
    grounded: jnp.ndarray        # (E,) bool
    room: jnp.ndarray            # (E,) i32
    facing: jnp.ndarray          # (E,) f32
    vertical_velocity: jnp.ndarray  # (E,) f32

    # Health w/ i-frames (components.rs:103)
    has_health: jnp.ndarray   # (E,) bool
    hp: jnp.ndarray           # (E,) i32
    max_hp: jnp.ndarray       # (E,) i32
    invincibility: jnp.ndarray  # (E,) f32 seconds remaining

    # rotation for Transform (game/transform.rs) — Y yaw is `facing` for
    # controllers; this is the full local euler for rendered props
    rot: jnp.ndarray          # (E, 3) f32
    parent: jnp.ndarray       # (E,) i32 hierarchy (-1 = root, world.rs:225)

    # Combat (components.rs:146-215): sphere hitbox/hurtbox per entity
    team: jnp.ndarray            # (E,) i32 (0 neutral, 1 player, 2 enemy)
    hitbox_active: jnp.ndarray   # (E,) bool
    hitbox_radius: jnp.ndarray   # (E,) f32
    hitbox_damage: jnp.ndarray   # (E,) i32
    hurtbox_radius: jnp.ndarray  # (E,) f32 (0 = no hurtbox)
    hurtbox_mult: jnp.ndarray    # (E,) f32 damage multiplier

    # Interaction (components.rs:278-351)
    door_open: jnp.ndarray       # (E,) bool
    door_key: jnp.ndarray        # (E,) i32 required key (-1 = unlocked)
    key_type: jnp.ndarray        # (E,) i32 (keys + key items)
    item_amount: jnp.ndarray     # (E,) i32 (heal/currency payload)
    checkpoint_active: jnp.ndarray   # (E,) bool
    respawn_offset: jnp.ndarray      # (E, 3) f32
    spawned_entity: jnp.ndarray  # (E,) i32 spawn-point child (-1 = none)
    ai_state: jnp.ndarray        # (E,) i32 (components.rs:358 AiState)
    owner: jnp.ndarray           # (E,) i32 projectile owner (-1)
    subtype: jnp.ndarray         # (E,) i32 EnemyType/ItemType discriminant

    # player + character camera (runtime.rs:129-190)
    player: jnp.ndarray         # () i32 entity index, -1 = none
    char_cam_yaw: jnp.ndarray   # () f32
    char_cam_pitch: jnp.ndarray  # () f32
    jump_was_down: jnp.ndarray  # () bool (edge detect for action_pressed)
    time: jnp.ndarray           # () f32 elapsed seconds


def new_state(capacity: int = 64) -> GameState:
    e = capacity
    return GameState(
        alive=jnp.zeros(e, bool),
        generation=jnp.zeros(e, _I32),
        kind=jnp.zeros(e, _I32),
        pos=jnp.zeros((e, 3), _F32),
        vel=jnp.zeros((e, 3), _F32),
        has_controller=jnp.zeros(e, bool),
        radius=jnp.zeros(e, _F32),
        height=jnp.zeros(e, _F32),
        step_height=jnp.zeros(e, _F32),
        grounded=jnp.zeros(e, bool),
        room=jnp.zeros(e, _I32),
        facing=jnp.zeros(e, _F32),
        vertical_velocity=jnp.zeros(e, _F32),
        has_health=jnp.zeros(e, bool),
        hp=jnp.zeros(e, _I32),
        max_hp=jnp.zeros(e, _I32),
        invincibility=jnp.zeros(e, _F32),
        rot=jnp.zeros((e, 3), _F32),
        parent=jnp.full(e, -1, _I32),
        team=jnp.zeros(e, _I32),
        hitbox_active=jnp.zeros(e, bool),
        hitbox_radius=jnp.zeros(e, _F32),
        hitbox_damage=jnp.zeros(e, _I32),
        hurtbox_radius=jnp.zeros(e, _F32),
        hurtbox_mult=jnp.ones(e, _F32),
        door_open=jnp.zeros(e, bool),
        door_key=jnp.full(e, -1, _I32),
        key_type=jnp.full(e, -1, _I32),
        item_amount=jnp.zeros(e, _I32),
        checkpoint_active=jnp.zeros(e, bool),
        respawn_offset=jnp.zeros((e, 3), _F32),
        spawned_entity=jnp.full(e, -1, _I32),
        ai_state=jnp.zeros(e, _I32),
        owner=jnp.full(e, -1, _I32),
        subtype=jnp.zeros(e, _I32),
        player=jnp.asarray(-1, _I32),
        char_cam_yaw=jnp.float32(0.0),
        char_cam_pitch=jnp.float32(0.2),  # runtime.rs:230
        jump_was_down=jnp.asarray(False),
        time=jnp.float32(0.0),
    )


def spawn(state: GameState, kind: int, pos, hp: int = 0,
          controller=None, **fields) -> GameState:
    """Allocate into the first free slot (EntityAllocator free-list semantics:
    reuse lowest free index, bump generation — entity.rs:64-151).

    `fields` sets any per-entity scalar/vector column at the new index
    (e.g. team=..., hurtbox_radius=..., door_key=...).
    """
    free = jnp.argmin(state.alive)  # first False
    e = free

    def seti(arr, val):
        return arr.at[e].set(val)

    state = state._replace(
        alive=seti(state.alive, True),
        generation=state.generation.at[e].add(1),
        kind=seti(state.kind, kind),
        pos=state.pos.at[e].set(jnp.asarray(pos, _F32)),
        vel=state.vel.at[e].set(jnp.zeros(3, _F32)),
        has_health=seti(state.has_health, hp > 0),
        hp=seti(state.hp, hp),
        max_hp=seti(state.max_hp, hp),
        invincibility=seti(state.invincibility, 0.0),
        rot=state.rot.at[e].set(jnp.zeros(3, _F32)),
        parent=seti(state.parent, -1),
        team=seti(state.team, TEAM_NEUTRAL),
        hitbox_active=seti(state.hitbox_active, False),
        hitbox_radius=seti(state.hitbox_radius, 0.0),
        hitbox_damage=seti(state.hitbox_damage, 0),
        hurtbox_radius=seti(state.hurtbox_radius, 0.0),
        hurtbox_mult=seti(state.hurtbox_mult, 1.0),
        door_open=seti(state.door_open, False),
        door_key=seti(state.door_key, -1),
        key_type=seti(state.key_type, -1),
        item_amount=seti(state.item_amount, 0),
        checkpoint_active=seti(state.checkpoint_active, False),
        respawn_offset=state.respawn_offset.at[e].set(jnp.zeros(3, _F32)),
        spawned_entity=seti(state.spawned_entity, -1),
        ai_state=seti(state.ai_state, AI_IDLE),
        owner=seti(state.owner, -1),
        subtype=seti(state.subtype, 0),
    )
    if controller is not None:
        radius, height, step_height = controller
        state = state._replace(
            has_controller=seti(state.has_controller, True),
            radius=seti(state.radius, radius),
            height=seti(state.height, height),
            step_height=seti(state.step_height, step_height),
            grounded=seti(state.grounded, False),
            room=seti(state.room, 0),
            facing=seti(state.facing, 0.0),
            vertical_velocity=seti(state.vertical_velocity, 0.0),
        )
    for name, val in fields.items():
        arr = getattr(state, name)
        state = state._replace(
            **{name: arr.at[e].set(jnp.asarray(val, arr.dtype))})
    return state, e


def spawn_player(state: GameState, pos, player_settings, hp: int = 100):
    """World::spawn_player (game/world.rs:264): controller + health +
    hurtbox(radius) + player marker."""
    state, e = spawn(state, KIND_PLAYER, pos, hp=hp,
                     controller=(player_settings.radius,
                                 player_settings.height,
                                 player_settings.step_height),
                     team=TEAM_PLAYER,
                     hurtbox_radius=player_settings.radius)
    return state._replace(player=jnp.asarray(e, _I32)), e


def spawn_enemy(state: GameState, pos, hp: int,
                enemy_type: int = ENEMY_GRUNT):
    """world.rs:278 — health + velocity + unit-sphere hurtbox."""
    return spawn(state, KIND_ENEMY, pos, hp=hp, team=TEAM_ENEMY,
                 subtype=enemy_type, hurtbox_radius=1.0)


def spawn_projectile(state: GameState, pos, velocity, damage: int, owner,
                     team: int = TEAM_NEUTRAL):
    """world.rs:288 — velocity + 0.5-sphere hitbox, damage attributed to
    owner."""
    state, e = spawn(state, KIND_PROJECTILE, pos, team=team,
                     hitbox_active=True, hitbox_radius=0.5,
                     hitbox_damage=damage, owner=owner)
    return state._replace(vel=state.vel.at[e].set(
        jnp.asarray(velocity, _F32))), e


def spawn_door(state: GameState, pos, required_key: int = -1):
    """world.rs:297 — closed door, optionally keyed."""
    return spawn(state, KIND_DOOR, pos, door_key=required_key)


def spawn_checkpoint(state: GameState, pos):
    """world.rs:307 — inactive, respawn offset (0, 1, 0)."""
    return spawn(state, KIND_CHECKPOINT, pos,
                 respawn_offset=jnp.asarray([0.0, 1.0, 0.0], _F32))


def despawn(state: GameState, e) -> GameState:
    return state._replace(
        alive=state.alive.at[e].set(False),
        kind=state.kind.at[e].set(KIND_NONE),
        has_controller=state.has_controller.at[e].set(False),
        has_health=state.has_health.at[e].set(False),
        hitbox_active=state.hitbox_active.at[e].set(False),
        hurtbox_radius=state.hurtbox_radius.at[e].set(0.0),
    )


def entity_ref(state: GameState, e):
    """Generational handle (entity.rs:20): (index, generation)."""
    return jnp.asarray(e, _I32), state.generation[e]


def is_ref_alive(state: GameState, ref) -> jnp.ndarray:
    """Stale handles (reused slot bumped the generation) read as dead."""
    idx, gen = ref
    return state.alive[idx] & (state.generation[idx] == gen)

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
    KIND_DOOR, KIND_CHECKPOINT, KIND_SPAWN = range(8)


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
        player=jnp.asarray(-1, _I32),
        char_cam_yaw=jnp.float32(0.0),
        char_cam_pitch=jnp.float32(0.2),  # runtime.rs:230
        jump_was_down=jnp.asarray(False),
        time=jnp.float32(0.0),
    )


def spawn(state: GameState, kind: int, pos, hp: int = 0,
          controller=None) -> GameState:
    """Allocate into the first free slot (EntityAllocator free-list semantics:
    reuse lowest free index, bump generation — entity.rs:64-151)."""
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
    return state, e


def spawn_player(state: GameState, pos, player_settings, hp: int = 100):
    """World::spawn_player (game/world.rs:264) + player marker."""
    state, e = spawn(state, KIND_PLAYER, pos, hp=hp,
                     controller=(player_settings.radius,
                                 player_settings.height,
                                 player_settings.step_height))
    return state._replace(player=jnp.asarray(e, _I32)), e


def despawn(state: GameState, e) -> GameState:
    return state._replace(
        alive=state.alive.at[e].set(False),
        kind=state.kind.at[e].set(KIND_NONE),
        has_controller=state.has_controller.at[e].set(False),
        has_health=state.has_health.at[e].set(False),
    )

"""The fused game step: input -> controller -> physics -> camera.

Replicates, as one jittable function over the ECS pytree:
  * handle_player_input (game/renderer.rs:310-418): souls-like camera-
    relative movement, smooth facing turn, sprint via dodge-hold, grounded
    jump with sprint multiplier, right-stick camera orbit.
  * GameToolState::tick (game/runtime.rs:405-482): controller system
    (move_and_slide per controller entity), velocity integration for
    non-controller entities, health i-frame tick.
  * update_character_camera (game/runtime.rs:318-350): third-person orbit
    camera around the player with spherical offset and look-at basis.

Everything is per-instance pure state -> state; batch with vmap and shard
over the instance mesh for fleet-scale rollouts.
"""

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..types import CameraArrays
from .collision import CollisionGrid, PlayerParams, move_and_slide
from .state import GameState

_F32 = jnp.float32

LOOK_SENSITIVITY = 2.5  # renderer.rs:319
TURN_SPEED = 10.0       # renderer.rs:381
TAU = 2.0 * math.pi


class Actions(NamedTuple):
    """Per-instance input snapshot (Elden-Ring layout, input/actions.rs)."""

    move_x: jnp.ndarray   # () f32 left stick x
    move_y: jnp.ndarray   # () f32 left stick y (forward +)
    cam_x: jnp.ndarray    # () f32 right stick x
    cam_y: jnp.ndarray    # () f32 right stick y
    sprint: jnp.ndarray   # () bool (Dodge held)
    jump: jnp.ndarray     # () bool (Jump held; edge-detected inside)


def zero_actions() -> Actions:
    return Actions(move_x=jnp.float32(0), move_y=jnp.float32(0),
                   cam_x=jnp.float32(0), cam_y=jnp.float32(0),
                   sprint=jnp.asarray(False), jump=jnp.asarray(False))


def _player_input(state: GameState, params: PlayerParams, actions: Actions,
                  dt) -> GameState:
    """renderer.rs:310-418."""
    actions = Actions(
        move_x=jnp.asarray(actions.move_x, _F32),
        move_y=jnp.asarray(actions.move_y, _F32),
        cam_x=jnp.asarray(actions.cam_x, _F32),
        cam_y=jnp.asarray(actions.cam_y, _F32),
        sprint=jnp.asarray(actions.sprint, bool),
        jump=jnp.asarray(actions.jump, bool),
    )
    # camera orbit from right stick (renderer.rs:336-342)
    stick_len = jnp.sqrt(actions.cam_x ** 2 + actions.cam_y ** 2)
    yaw = state.char_cam_yaw - jnp.where(
        stick_len > 0.0, actions.cam_x * LOOK_SENSITIVITY * dt, 0.0)
    pitch = jnp.clip(
        state.char_cam_pitch - jnp.where(
            stick_len > 0.0, actions.cam_y * LOOK_SENSITIVITY * dt, 0.0),
        params.camera_pitch_min, params.camera_pitch_max)

    p = jnp.maximum(state.player, 0)
    has_player = state.player >= 0

    # camera-relative movement (renderer.rs:345-398)
    fwd = jnp.stack([jnp.sin(yaw), jnp.cos(yaw)])       # xz
    right = jnp.stack([jnp.cos(yaw), -jnp.sin(yaw)])    # xz
    ls_len = jnp.sqrt(actions.move_x ** 2 + actions.move_y ** 2)
    mv = jnp.where(ls_len > 0.1,
                   fwd * actions.move_y + right * (-actions.move_x),
                   jnp.zeros(2, _F32))
    mv_len = jnp.sqrt(mv[0] ** 2 + mv[1] ** 2)
    moving = mv_len > 0.1
    sprinting = actions.sprint & moving

    safe_len = jnp.where(mv_len == 0, _F32(1.0), mv_len)
    dirv = mv / safe_len

    # smooth facing toward movement (renderer.rs:374-384)
    target_facing = jnp.arctan2(dirv[0], dirv[1])
    facing = state.facing[p]
    diff = jnp.mod(target_facing - facing, TAU)
    diff = jnp.where(diff > math.pi, diff - TAU, diff)
    new_facing = facing + diff * TURN_SPEED * dt
    facing_out = jnp.where(moving & has_player, new_facing, facing)

    speed = jnp.where(sprinting, params.run_speed, params.walk_speed)
    vx = jnp.where(moving, dirv[0] * speed, 0.0)
    vz = jnp.where(moving, dirv[1] * speed, 0.0)

    vel = state.vel
    vel = vel.at[p, 0].set(jnp.where(has_player, vx, vel[p, 0]))
    vel = vel.at[p, 2].set(jnp.where(has_player, vz, vel[p, 2]))

    # jump on edge press while grounded (renderer.rs:401-416)
    jump_pressed = actions.jump & ~state.jump_was_down
    can_jump = jump_pressed & state.grounded[p] & has_player
    jump_vel = jnp.where(sprinting,
                         params.jump_velocity * params.sprint_jump_multiplier,
                         params.jump_velocity)
    vvel = state.vertical_velocity.at[p].set(
        jnp.where(can_jump, jump_vel, state.vertical_velocity[p]))
    grounded = state.grounded.at[p].set(
        jnp.where(can_jump, False, state.grounded[p]))

    return state._replace(
        char_cam_yaw=yaw, char_cam_pitch=pitch,
        facing=state.facing.at[p].set(jnp.where(has_player, facing_out,
                                                state.facing[p])),
        vel=vel, vertical_velocity=vvel, grounded=grounded,
        jump_was_down=actions.jump)


def tick(state: GameState, grid: CollisionGrid, params: PlayerParams,
         actions: Actions, dt) -> GameState:
    """One simulation frame (runtime.rs:405-482)."""
    dt = jnp.asarray(dt, _F32)
    state = _player_input(state, params, actions, dt)

    # --- controller system: move_and_slide per controller entity ---
    def solve(pos, vel, radius, height, step_h, grounded, room, vvel):
        return move_and_slide(grid, pos, vel, radius, height, step_h,
                              grounded, room, vvel, params.gravity, dt)

    new_pos, new_grounded, new_room, new_vvel = jax.vmap(solve)(
        state.pos, state.vel, state.radius, state.height, state.step_height,
        state.grounded, state.room, state.vertical_velocity)

    ctrl = state.has_controller & state.alive
    cm = ctrl[:, None]
    pos = jnp.where(cm, new_pos, state.pos)
    grounded = jnp.where(ctrl, new_grounded, state.grounded)
    room = jnp.where(ctrl, new_room, state.room)
    vvel = jnp.where(ctrl, new_vvel, state.vertical_velocity)

    # --- plain velocity integration for non-controller entities ---
    plain = state.alive & ~state.has_controller
    pos = jnp.where(plain[:, None], state.pos + state.vel * dt, pos)

    # --- health i-frames (components.rs:103; tick_invincibility) ---
    inv = jnp.where(state.has_health,
                    jnp.maximum(state.invincibility - dt, 0.0),
                    state.invincibility)

    return state._replace(pos=pos, grounded=grounded, room=room,
                          vertical_velocity=vvel, invincibility=inv,
                          time=state.time + dt)


def character_camera(state: GameState, params: PlayerParams) -> CameraArrays:
    """update_character_camera (runtime.rs:318-350)."""
    p = jnp.maximum(state.player, 0)
    player_pos = state.pos[p]
    look_at = player_pos + jnp.stack(
        [_F32(0.0), params.camera_vertical_offset, _F32(0.0)])

    yaw = state.char_cam_yaw
    pitch = state.char_cam_pitch
    hd = params.camera_distance * jnp.cos(pitch)
    vo = params.camera_distance * jnp.sin(pitch)
    cam_pos = look_at + jnp.stack([-jnp.sin(yaw) * hd, vo, -jnp.cos(yaw) * hd])

    to_target = look_at - cam_pos
    norm = jnp.sqrt(jnp.sum(to_target ** 2))
    to_target = to_target / jnp.where(norm == 0, _F32(1.0), norm)
    rot_y = jnp.arctan2(to_target[0], to_target[2])
    rot_x = jnp.arcsin(-to_target[1])

    # Camera::update_basis (camera.rs:76-91)
    cx, sx = jnp.cos(rot_x), jnp.sin(rot_x)
    cy, sy = jnp.cos(rot_y), jnp.sin(rot_y)
    bz = jnp.stack([cx * sy, -sx, cx * cy])
    up = jnp.asarray([0.0, -1.0, 0.0], _F32)
    bx = jnp.cross(up, bz)
    bxn = jnp.sqrt(jnp.sum(bx ** 2))
    bx = bx / jnp.where(bxn == 0, _F32(1.0), bxn)
    by = jnp.cross(bz, bx)
    return CameraArrays(position=cam_pos.astype(_F32),
                        basis=jnp.stack([bx, by, bz]).astype(_F32))

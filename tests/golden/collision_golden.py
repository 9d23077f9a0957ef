"""Scalar golden model of cylinder collision (game/collision.rs:37-193),
using the host Level.get_floor_info queries."""

import numpy as np

TERMINAL_VELOCITY = 4000.0


def collide_cylinder(level, position, velocity, radius, height, step_height,
                     grounded, room, vert_vel, gravity, dt):
    px, py, pz = position
    nx = px + velocity[0] * dt
    nz = pz + velocity[2] * dt

    if not grounded:
        vert_vel = max(vert_vel - gravity * dt, -TERMINAL_VELOCITY)
    ny = py + vert_vel * dt

    new_pos = [nx, ny, nz]
    hit_wall = False
    hit_ceiling = False
    out_grounded = False
    current_room = room

    info = level.get_floor_info(new_pos, room if room >= 0 else None)
    if info is not None:
        current_room = info.room
        foot = new_pos[1]
        head = new_pos[1] + height
        if foot < info.floor:
            if info.floor - foot <= step_height:
                new_pos[1] = info.floor
                out_grounded = True
            else:
                new_pos[0] = px
                new_pos[2] = pz
                hit_wall = True
        elif foot <= info.floor + 1.0:
            out_grounded = True
            new_pos[1] = info.floor
        if head > info.ceiling:
            new_pos[1] = info.ceiling - height
            hit_ceiling = True
    else:
        new_pos = [px, py, pz]
        hit_wall = True
        out_grounded = grounded
        vert_vel = 0.0

    corners = [
        (new_pos[0] - radius, new_pos[1], new_pos[2] - radius),
        (new_pos[0] + radius, new_pos[1], new_pos[2] - radius),
        (new_pos[0] + radius, new_pos[1], new_pos[2] + radius),
        (new_pos[0] - radius, new_pos[1], new_pos[2] + radius),
    ]
    for corner in corners:
        ci = level.get_floor_info(corner, current_room)
        if ci is not None:
            if ci.floor - new_pos[1] > step_height:
                ix = level.get_floor_info((corner[0], new_pos[1], new_pos[2]),
                                          current_room)
                if ix is not None and ix.floor - new_pos[1] > step_height:
                    new_pos[0] = px
                    hit_wall = True
                iz = level.get_floor_info((new_pos[0], new_pos[1], corner[2]),
                                          current_room)
                if iz is not None and iz.floor - new_pos[1] > step_height:
                    new_pos[2] = pz
                    hit_wall = True
        else:
            new_pos[0] = px
            new_pos[2] = pz
            hit_wall = True

    return dict(position=tuple(new_pos), grounded=out_grounded,
                room=current_room, hit_wall=hit_wall,
                hit_ceiling=hit_ceiling, vertical_velocity=vert_vel)


def move_and_slide(level, position, velocity, radius, height, step_height,
                   grounded, room, vert_vel, gravity, dt):
    out = collide_cylinder(level, position, velocity, radius, height,
                           step_height, grounded, room, vert_vel, gravity, dt)
    if out["grounded"] or out["hit_ceiling"]:
        out["vertical_velocity"] = 0.0
    return out

"""Sector collision: level geometry compiled to device grids + cylinder solve.

The reference queries `Level::get_floor_info` (world/geometry.rs:3597) through
pointer-chasing room/sector lookups; here the level compiles once into padded
(R, GX, GZ) height tables and the query is pure gather + interpolation math,
fully vmap-able over (instances, entities, probe points).

`collide_cylinder` / `move_and_slide` replicate game/collision.rs:37-193:
accumulated gravity with terminal velocity, center floor/ceiling test with
step-up, 4-corner wall probes with per-axis pushback (sequentially carried,
as the reference mutates the position inside the corner loop), and the
void-as-wall fallback.
"""

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.level import Level, SECTOR_SIZE

_F32 = jnp.float32
_I32 = jnp.int32

TERMINAL_VELOCITY = 4000.0  # game/components.rs:39


class CollisionGrid(NamedTuple):
    """Padded per-room sector tables.

    The hot-path layout is the two PACKED tables: XLA gather dispatch is
    the dominant cost of a floor query (PLAN_PERF round-4: steponly
    scaled with level size through ~10 separate table gathers per probe
    point), so every per-sector scalar lives in one (R*GX*GZ, 16) f32
    row and every per-room scalar in one (R, 8) row — a query is then
    exactly two fused gathers.  The unpacked fields are kept for editor
    and debug consumers."""

    room_pos: jnp.ndarray      # (R, 3) f32
    bounds_min: jnp.ndarray    # (R, 3) f32 room-relative
    bounds_max: jnp.ndarray    # (R, 3) f32
    width: jnp.ndarray         # (R,) i32
    depth: jnp.ndarray         # (R,) i32
    has_sector: jnp.ndarray    # (R, GX, GZ) bool
    has_floor: jnp.ndarray     # (R, GX, GZ) bool
    floor_heights: jnp.ndarray  # (R, GX, GZ, 4) f32 [NW, NE, SE, SW]
    floor_split: jnp.ndarray   # (R, GX, GZ) i32 0=NwSe 1=NeSw
    has_ceiling: jnp.ndarray   # (R, GX, GZ) bool
    ceil_heights: jnp.ndarray  # (R, GX, GZ, 4) f32
    ceil_split: jnp.ndarray    # (R, GX, GZ) i32
    # packed hot-path tables (see _SEC_* / _ROOM_* column constants)
    sector_tab: jnp.ndarray    # (R*GX*GZ, 16) f32
    room_tab: jnp.ndarray      # (R, 8) f32


# sector_tab columns
_SC_HAS_SECTOR = 0
_SC_HAS_FLOOR = 1
_SC_FH = slice(2, 6)
_SC_FSPLIT = 6
_SC_HAS_CEIL = 7
_SC_CH = slice(8, 12)
_SC_CSPLIT = 12

# room_tab columns
_RC_POS = slice(0, 3)
_RC_WIDTH = 3
_RC_DEPTH = 4


class PlayerParams(NamedTuple):
    """PlayerSettings (world/geometry.rs:2177) as device scalars."""

    radius: jnp.ndarray
    height: jnp.ndarray
    step_height: jnp.ndarray
    walk_speed: jnp.ndarray
    run_speed: jnp.ndarray
    gravity: jnp.ndarray
    jump_velocity: jnp.ndarray
    sprint_jump_multiplier: jnp.ndarray
    camera_distance: jnp.ndarray
    camera_vertical_offset: jnp.ndarray
    camera_pitch_min: jnp.ndarray
    camera_pitch_max: jnp.ndarray


def player_params(level: Level) -> PlayerParams:
    s = level.player_settings
    f = jnp.float32
    return PlayerParams(
        radius=f(s.radius), height=f(s.height), step_height=f(s.step_height),
        walk_speed=f(s.walk_speed), run_speed=f(s.run_speed),
        gravity=f(s.gravity), jump_velocity=f(s.jump_velocity),
        sprint_jump_multiplier=f(s.sprint_jump_multiplier),
        camera_distance=f(s.camera_distance),
        camera_vertical_offset=f(s.camera_vertical_offset),
        camera_pitch_min=f(s.camera_pitch_min),
        camera_pitch_max=f(s.camera_pitch_max),
    )


def compile_collision(level: Level) -> CollisionGrid:
    r = max(len(level.rooms), 1)
    gx = max((room.width for room in level.rooms), default=1)
    gz = max((room.depth for room in level.rooms), default=1)

    room_pos = np.zeros((r, 3), np.float32)
    bmin = np.zeros((r, 3), np.float32)
    bmax = np.zeros((r, 3), np.float32)
    width = np.zeros(r, np.int32)
    depth = np.zeros(r, np.int32)
    has_sector = np.zeros((r, gx, gz), bool)
    has_floor = np.zeros((r, gx, gz), bool)
    fh = np.zeros((r, gx, gz, 4), np.float32)
    fs = np.zeros((r, gx, gz), np.int32)
    has_ceil = np.zeros((r, gx, gz), bool)
    ch = np.zeros((r, gx, gz, 4), np.float32)
    cs = np.zeros((r, gx, gz), np.int32)

    for i, room in enumerate(level.rooms):
        room_pos[i] = room.position
        bmin[i] = room.bounds_min
        bmax[i] = room.bounds_max
        width[i] = room.width
        depth[i] = room.depth
        for x, z, sector in room.iter_sectors():
            has_sector[i, x, z] = True
            if sector.floor is not None:
                has_floor[i, x, z] = True
                fh[i, x, z] = sector.floor.heights
                fs[i, x, z] = sector.floor.split_direction
            if sector.ceiling is not None:
                has_ceil[i, x, z] = True
                ch[i, x, z] = sector.ceiling.heights
                cs[i, x, z] = sector.ceiling.split_direction

    sector_tab = np.zeros((r * gx * gz, 16), np.float32)
    flat = lambda a: a.reshape(r * gx * gz, -1)  # noqa: E731
    sector_tab[:, _SC_HAS_SECTOR] = flat(has_sector)[:, 0]
    sector_tab[:, _SC_HAS_FLOOR] = flat(has_floor)[:, 0]
    sector_tab[:, _SC_FH] = flat(fh)
    sector_tab[:, _SC_FSPLIT] = flat(fs)[:, 0]
    sector_tab[:, _SC_HAS_CEIL] = flat(has_ceil)[:, 0]
    sector_tab[:, _SC_CH] = flat(ch)
    sector_tab[:, _SC_CSPLIT] = flat(cs)[:, 0]
    room_tab = np.zeros((r, 8), np.float32)
    room_tab[:, _RC_POS] = room_pos
    room_tab[:, _RC_WIDTH] = width
    room_tab[:, _RC_DEPTH] = depth

    return CollisionGrid(
        room_pos=jnp.asarray(room_pos), bounds_min=jnp.asarray(bmin),
        bounds_max=jnp.asarray(bmax), width=jnp.asarray(width),
        depth=jnp.asarray(depth), has_sector=jnp.asarray(has_sector),
        has_floor=jnp.asarray(has_floor), floor_heights=jnp.asarray(fh),
        floor_split=jnp.asarray(fs), has_ceiling=jnp.asarray(has_ceil),
        ceil_heights=jnp.asarray(ch), ceil_split=jnp.asarray(cs),
        sector_tab=jnp.asarray(sector_tab), room_tab=jnp.asarray(room_tab),
    )


def _interpolate_height(heights, split, u, v):
    """HorizontalFace::interpolate_height (geometry.rs:1283), f32."""
    u = jnp.clip(u, 0.0, 1.0)
    v = jnp.clip(v, 0.0, 1.0)
    h0, h1, h2, h3 = (heights[..., 0], heights[..., 1],
                      heights[..., 2], heights[..., 3])
    # NwSe split
    nwse_t1 = h0 + u * (h1 - h0) + v * (h2 - h1)
    nwse_t2 = h0 + u * (h2 - h3) + v * (h3 - h0)
    nwse = jnp.where(u >= v, nwse_t1, nwse_t2)
    # NeSw split
    nesw_t1 = h0 + u * (h1 - h0) + v * (h3 - h0)
    nesw_t2 = h3 + u * (h2 - h3) + (1.0 - v) * (h1 - h2)
    nesw = jnp.where(u + v <= 1.0, nesw_t1, nesw_t2)
    return jnp.where(split == 0, nwse, nesw)


def find_room_at(grid: CollisionGrid, point, hint):
    """Level::find_room_at_with_hint (geometry.rs:3576): hint first, else
    first containing room in index order.  Returns -1 if none."""
    rel = point[None, :] - grid.room_pos  # (R, 3)
    inside = jnp.all((rel >= grid.bounds_min) & (rel <= grid.bounds_max),
                     axis=-1)
    n = grid.room_pos.shape[0]
    idxs = jnp.arange(n, dtype=_I32)
    first = jnp.min(jnp.where(inside, idxs, n)).astype(_I32)
    first = jnp.where(first >= n, _I32(-1), first)
    hint_ok = (hint >= 0) & (hint < n) & inside[jnp.clip(hint, 0, n - 1)]
    return jnp.where(hint_ok, hint, first)


class FloorQuery(NamedTuple):
    found: jnp.ndarray
    room: jnp.ndarray
    floor: jnp.ndarray
    ceiling: jnp.ndarray
    sector_x: jnp.ndarray
    sector_z: jnp.ndarray


def get_floor_info(grid: CollisionGrid, point, hint) -> FloorQuery:
    """Level::get_floor_info (geometry.rs:3597-3643) on device tables.

    Exactly two gathers per query (room row, sector row) — the packed
    tables make the whole probe one fused lookup + elementwise math,
    instead of ~10 separate XLA gathers whose dispatch dominated the
    game-step cost (PLAN_PERF round-4 steponly line)."""
    room = find_room_at(grid, point, hint)
    safe = jnp.maximum(room, 0)
    rrow = grid.room_tab[safe]                      # (8,) gather 1
    rp = rrow[_RC_POS]
    local_x = point[0] - rp[0]
    local_z = point[2] - rp[2]
    sx = jnp.floor(local_x / SECTOR_SIZE).astype(_I32)
    sz = jnp.floor(local_z / SECTOR_SIZE).astype(_I32)

    # width/depth are small ints, exact in f32
    in_grid = ((sx >= 0) & (sz >= 0)
               & (sx.astype(_F32) < rrow[_RC_WIDTH])
               & (sz.astype(_F32) < rrow[_RC_DEPTH]))
    n_gx = grid.has_sector.shape[1]
    n_gz = grid.has_sector.shape[2]
    gx = jnp.clip(sx, 0, n_gx - 1)
    gz = jnp.clip(sz, 0, n_gz - 1)
    srow = grid.sector_tab[(safe * n_gx + gx) * n_gz + gz]  # (16,) gather 2
    has_sec = srow[_SC_HAS_SECTOR] > 0.5
    found = (room >= 0) & in_grid & has_sec

    u = (local_x - sx.astype(_F32) * SECTOR_SIZE) / SECTOR_SIZE
    v = (local_z - sz.astype(_F32) * SECTOR_SIZE) / SECTOR_SIZE

    fl = _interpolate_height(srow[_SC_FH], srow[_SC_FSPLIT], u, v)
    floor_y = jnp.where(srow[_SC_HAS_FLOOR] > 0.5, rp[1] + fl, rp[1])
    cl = _interpolate_height(srow[_SC_CH], srow[_SC_CSPLIT], u, v)
    ceil_y = jnp.where(srow[_SC_HAS_CEIL] > 0.5, rp[1] + cl,
                       rp[1] + 2048.0)
    return FloorQuery(found=found, room=room, floor=floor_y, ceiling=ceil_y,
                      sector_x=sx, sector_z=sz)


class CollideOut(NamedTuple):
    position: jnp.ndarray
    grounded: jnp.ndarray
    room: jnp.ndarray
    hit_wall: jnp.ndarray
    hit_ceiling: jnp.ndarray
    vertical_velocity: jnp.ndarray


def collide_cylinder(grid: CollisionGrid, position, velocity, radius, height,
                     step_height, grounded_in, room_in, vert_vel_in,
                     gravity, dt) -> CollideOut:
    """game/collision.rs:37-165, vectorizable over a leading batch."""
    new_x = position[0] + velocity[0] * dt
    new_z = position[2] + velocity[2] * dt

    vert_vel = jnp.where(
        grounded_in, vert_vel_in,
        jnp.maximum(vert_vel_in - gravity * dt, -TERMINAL_VELOCITY))
    new_y = position[1] + vert_vel * dt
    new_pos = jnp.stack([new_x, new_y, new_z])

    info = get_floor_info(grid, new_pos, room_in)
    current_room = jnp.where(info.found, info.room, room_in)

    # --- center test (collision.rs:66-111) ---
    foot = new_pos[1]
    head = new_pos[1] + height
    height_diff = info.floor - foot
    step_up = (foot < info.floor) & (height_diff <= step_height)
    wall_block = (foot < info.floor) & (height_diff > step_height)
    on_ground = ~(foot < info.floor) & (foot <= info.floor + 1.0)

    y1 = jnp.where(step_up | on_ground, info.floor, new_pos[1])
    x1 = jnp.where(wall_block, position[0], new_pos[0])
    z1 = jnp.where(wall_block, position[2], new_pos[2])
    grounded = step_up | on_ground
    hit_wall = wall_block

    hit_ceiling = (head > info.ceiling)
    y1 = jnp.where(hit_ceiling, info.ceiling - height, y1)

    # void fallback (collision.rs:102-111)
    x1 = jnp.where(info.found, x1, position[0])
    y1 = jnp.where(info.found, y1, position[1])
    z1 = jnp.where(info.found, z1, position[2])
    grounded = jnp.where(info.found, grounded, grounded_in)
    hit_wall = hit_wall | ~info.found
    hit_ceiling = hit_ceiling & info.found
    vert_vel = jnp.where(info.found, vert_vel, 0.0)

    pos1 = jnp.stack([x1, y1, z1])

    # --- 4 corner probes (collision.rs:113-148), corners fixed from pos1,
    # per-axis pushback carried sequentially like the reference loop.
    #
    # The reference's loop is data-dependent (the z-probe sees the x-probe's
    # pushback, collision.rs:129-143) — but the carried x/z can only ever be
    # pos1 or the pushed-back original position, so every probe point the
    # loop COULD query comes from a closed 20-point set.  TPU-first: one
    # batched get_floor_info over all 20 points (a single fused gather
    # round per table instead of 12 sequential rounds — XLA gather
    # dispatch dominated steponly time, PLAN_PERF.md round-3), then the
    # sequential pushback logic runs as pure selects over the precomputed
    # results, carrying "is it still pos1?" booleans.  Bit-exact: the same
    # queries on the same points, in the same order.
    cxs = jnp.stack([pos1[0] - radius, pos1[0] + radius,
                     pos1[0] + radius, pos1[0] - radius])   # (4,)
    czs = jnp.stack([pos1[2] - radius, pos1[2] - radius,
                     pos1[2] + radius, pos1[2] + radius])   # (4,)
    y1v = jnp.broadcast_to(pos1[1], (4,))
    corner_pts = jnp.stack([cxs, y1v, czs], axis=-1)          # (4, 3)
    # x-probes: (corner.x, pos1.y, cz) for cz in {pos1.z, position.z}
    px0 = jnp.stack([cxs, y1v, jnp.broadcast_to(pos1[2], (4,))], axis=-1)
    px1 = jnp.stack([cxs, y1v, jnp.broadcast_to(position[2], (4,))], axis=-1)
    # z-probes: (cx, pos1.y, corner.z) for cx in {pos1.x, position.x}
    pz0 = jnp.stack([jnp.broadcast_to(pos1[0], (4,)), y1v, czs], axis=-1)
    pz1 = jnp.stack([jnp.broadcast_to(position[0], (4,)), y1v, czs], axis=-1)
    pts = jnp.concatenate([corner_pts, px0, px1, pz0, pz1])   # (20, 3)
    q = jax.vmap(lambda pt: get_floor_info(grid, pt, current_room))(pts)
    q_blocked = q.found & ((q.floor - pos1[1]) > step_height)
    ci_found = q.found[0:4]
    ci_blocked = q_blocked[0:4]
    px_blocked = (q_blocked[4:8], q_blocked[8:12])
    pz_blocked = (q_blocked[12:16], q_blocked[16:20])

    def corner_step(carry, k):
        cx_orig, cz_orig, hw = carry   # True => pushed back to position.x/.z
        blocked = ci_blocked[k]
        x_block = blocked & jnp.where(cz_orig, px_blocked[1][k],
                                      px_blocked[0][k])
        cx_orig = cx_orig | x_block
        z_block = blocked & jnp.where(cx_orig, pz_blocked[1][k],
                                      pz_blocked[0][k])
        cz_orig = cz_orig | z_block
        void = ~ci_found[k]
        cx_orig = cx_orig | void
        cz_orig = cz_orig | void
        hw = hw | x_block | z_block | void
        return (cx_orig, cz_orig, hw), None

    f = jnp.asarray(False)
    (cx_orig, cz_orig, hit_wall), _ = jax.lax.scan(
        corner_step, (f, f, hit_wall), jnp.arange(4, dtype=_I32))

    final = jnp.stack([jnp.where(cx_orig, position[0], pos1[0]),
                       pos1[1],
                       jnp.where(cz_orig, position[2], pos1[2])])
    return CollideOut(position=final, grounded=grounded, room=current_room,
                      hit_wall=hit_wall, hit_ceiling=hit_ceiling,
                      vertical_velocity=vert_vel)


def move_and_slide(grid: CollisionGrid, position, velocity, radius, height,
                   step_height, grounded, room, vert_vel, gravity, dt):
    """game/collision.rs:170-193: collide + controller state update."""
    out = collide_cylinder(grid, position, velocity, radius, height,
                           step_height, grounded, room, vert_vel, gravity, dt)
    new_vert = jnp.where(out.grounded | out.hit_ceiling, 0.0,
                         out.vertical_velocity)
    return out.position, out.grounded, out.room, new_vert

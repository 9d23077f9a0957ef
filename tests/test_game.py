"""Game runtime tests: device collision vs scalar golden; full step behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bonnie32_tpu.models import level as L
from bonnie32_tpu.game import collision as C
from bonnie32_tpu.game import state as ST
from bonnie32_tpu.game import step as SP

from golden import collision_golden as gold

LEVELS = "/root/reference/assets/samples/levels"


def _load(name="Cave.ron"):
    level = L.load_level(f"{LEVELS}/{name}")
    return level, C.compile_collision(level), C.player_params(level)


def _spawn_pos(level):
    r0 = level.rooms[0]
    for x, z, s in r0.iter_sectors():
        if s.floor is not None:
            px = float(r0.position[0]) + (x + 0.5) * 1024.0
            pz = float(r0.position[2]) + (z + 0.5) * 1024.0
            fi = level.get_floor_info((px, 0.0, pz))
            return np.array([px, fi.floor, pz], np.float32)
    raise AssertionError("no floor")


def test_floor_info_device_matches_host():
    level, grid, _ = _load()
    rng = np.random.default_rng(0)
    r0 = level.rooms[0]
    lo = np.asarray(r0.position) + np.asarray(r0.bounds_min)
    hi = np.asarray(r0.position) + np.asarray(r0.bounds_max)
    pts = rng.uniform(lo - 500, hi + 500, (500, 3)).astype(np.float32)

    q = jax.vmap(lambda p: C.get_floor_info(grid, p, jnp.int32(-1)))(
        jnp.asarray(pts))
    found = np.asarray(q.found)
    floor = np.asarray(q.floor)
    ceil = np.asarray(q.ceiling)
    room = np.asarray(q.room)

    for i, p in enumerate(pts):
        fi = level.get_floor_info(p)
        if fi is None:
            assert not found[i], (i, p, floor[i])
        else:
            assert found[i], (i, p)
            assert room[i] == fi.room
            np.testing.assert_allclose(floor[i], fi.floor, rtol=1e-6, atol=1e-3)
            np.testing.assert_allclose(ceil[i], fi.ceiling, rtol=1e-6, atol=1e-3)


def test_move_and_slide_matches_golden_walk():
    level, grid, params = _load()
    s = level.player_settings
    rng = np.random.default_rng(1)
    pos = _spawn_pos(level) + np.array([0, 10, 0], np.float32)

    gpos = tuple(float(x) for x in pos)
    jpos = jnp.asarray(pos)
    g_grounded = j_grounded = False
    g_room = j_room = 0
    g_vv = j_vv = 0.0
    dt = 1.0 / 60.0

    solve = jax.jit(lambda p, v, g, r, vv: C.move_and_slide(
        grid, p, v, jnp.float32(s.radius), jnp.float32(s.height),
        jnp.float32(s.step_height), g, r, vv, jnp.float32(s.gravity),
        jnp.float32(dt)))

    for i in range(120):
        ang = rng.uniform(0, 2 * np.pi)
        speed = rng.choice([0.0, s.walk_speed, s.run_speed])
        vel = np.array([np.sin(ang) * speed, 0.0, np.cos(ang) * speed],
                       np.float32)

        gout = gold.move_and_slide(level, gpos, vel, s.radius, s.height,
                                   s.step_height, g_grounded, g_room, g_vv,
                                   s.gravity, dt)
        gpos, g_grounded, g_room, g_vv = (gout["position"], gout["grounded"],
                                          gout["room"],
                                          gout["vertical_velocity"])

        jp, jg, jr, jv = solve(jpos, jnp.asarray(vel),
                               jnp.asarray(j_grounded), jnp.int32(j_room),
                               jnp.float32(j_vv))
        jpos, j_grounded, j_room, j_vv = jp, bool(jg), int(jr), float(jv)

        np.testing.assert_allclose(np.asarray(jpos), np.asarray(gpos, np.float32),
                                   atol=0.5, err_msg=f"step {i}")
        assert j_grounded == g_grounded, f"step {i} grounded"
        assert j_room == g_room, f"step {i} room"


def test_full_tick_walk_and_jump():
    level, grid, params = _load()
    state = ST.new_state(16)
    pos = _spawn_pos(level) + np.array([0, 500, 0], np.float32)
    state, pidx = ST.spawn_player(state, pos, level.player_settings)
    assert int(state.player) == pidx

    dt = 1.0 / 60.0
    tick = jax.jit(lambda st, a: SP.tick(st, grid, params, a, dt))

    # fall to the ground
    a = SP.zero_actions()
    for _ in range(60):
        state = tick(state, a)
    assert bool(state.grounded[pidx]), "player should land"
    y_ground = float(state.pos[pidx, 1])

    # walk forward: position must change, stay on ground
    a = a._replace(move_y=jnp.float32(1.0))
    p0 = np.asarray(state.pos[pidx])
    for _ in range(30):
        state = tick(state, a)
    p1 = np.asarray(state.pos[pidx])
    assert np.linalg.norm(p1[[0, 2]] - p0[[0, 2]]) > 100.0, "player walks"
    # (may have walked off a ledge — grounded not asserted here)

    # jump from rest: leaves ground, gains height, lands again
    a = SP.zero_actions()
    for _ in range(150):  # settle / land from any ledge drop
        state = tick(state, a)
    assert bool(state.grounded[pidx]), "player settles before jump"
    ground_y = float(state.pos[pidx, 1])
    state = tick(state, a._replace(jump=jnp.asarray(True)))
    assert not bool(state.grounded[pidx]), "jump leaves the ground"
    peak = float(state.pos[pidx, 1])
    for _ in range(120):
        state = tick(state, a)
        peak = max(peak, float(state.pos[pidx, 1]))
    assert peak > ground_y + 50.0, "jump gained height"
    assert bool(state.grounded[pidx]), "player lands after jump"

    # walls must contain the player within the level
    a = SP.zero_actions()._replace(move_y=jnp.float32(1.0),
                                   sprint=jnp.asarray(True))
    for _ in range(600):
        state = tick(state, a)
    p = np.asarray(state.pos[pidx])
    fi = level.get_floor_info(p)
    assert fi is not None, f"player escaped the level: {p}"


def test_character_camera_looks_at_player():
    level, grid, params = _load()
    state = ST.new_state(8)
    state, pidx = ST.spawn_player(state, (1000.0, 0.0, 2000.0),
                                  level.player_settings)
    cam = SP.character_camera(state, params)
    look_at = np.asarray(state.pos[pidx]) + np.array(
        [0, level.player_settings.camera_vertical_offset, 0], np.float32)
    to_target = look_at - np.asarray(cam.position)
    to_target /= np.linalg.norm(to_target)
    np.testing.assert_allclose(np.asarray(cam.basis[2]), to_target, atol=1e-5)
    d = np.linalg.norm(np.asarray(cam.position) - look_at)
    np.testing.assert_allclose(d, level.player_settings.camera_distance,
                               rtol=1e-5)


def test_batched_instances_diverge():
    """N instances with different actions evolve independently under vmap."""
    level, grid, params = _load()
    base = ST.new_state(8)
    pos = _spawn_pos(level)
    base, pidx = ST.spawn_player(base, pos, level.player_settings)

    n = 8
    states = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), base)
    angles = jnp.arange(n, dtype=jnp.float32) / n * 2 * np.pi
    acts = SP.zero_actions()._replace(
        move_x=jnp.sin(angles), move_y=jnp.cos(angles),
        cam_x=jnp.zeros(n), cam_y=jnp.zeros(n),
        sprint=jnp.zeros(n, bool), jump=jnp.zeros(n, bool))

    dt = 1.0 / 60.0
    step = jax.jit(jax.vmap(lambda st, a: SP.tick(st, grid, params, a, dt)))
    for _ in range(90):
        states = step(states, acts)
    p = np.asarray(states.pos[:, pidx])
    spread = np.ptp(p[:, [0, 2]], axis=0)
    assert (spread > 100).all(), f"instances should diverge: {spread}"

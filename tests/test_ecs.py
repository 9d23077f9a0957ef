"""Extended ECS: generational handles, events, combat, interactions."""

import numpy as np
import jax
import jax.numpy as jnp

from bonnie32_tpu.game import events as ev
from bonnie32_tpu.game import state as st
from bonnie32_tpu.game import systems as sys_


def test_generational_handles():
    """entity.rs:20 — stale handles die when the slot is reused."""
    s = st.new_state(8)
    s, e = st.spawn(s, st.KIND_ENEMY, (0.0, 0.0, 0.0), hp=5)
    ref = st.entity_ref(s, e)
    assert bool(st.is_ref_alive(s, ref))
    s = st.despawn(s, e)
    assert not bool(st.is_ref_alive(s, ref))
    # slot reuse bumps generation -> old ref still dead
    s, e2 = st.spawn(s, st.KIND_ITEM, (1.0, 0.0, 0.0))
    assert int(e2) == int(e)  # lowest free index reused
    assert not bool(st.is_ref_alive(s, ref))
    assert bool(st.is_ref_alive(s, st.entity_ref(s, e2)))


def test_event_queue_push_clear():
    q = ev.new_queue(4)
    q = ev.push(q, a=7, b=8, c=9, pos=(1.0, 2.0, 3.0))
    q = ev.push(q, a=1, enabled=False)     # masked off
    q = ev.push(q, a=2)
    assert int(q.count) == 2
    assert q.a[:2].tolist() == [7, 2]
    np.testing.assert_allclose(np.asarray(q.pos[0]), [1, 2, 3])
    # overflow drops and counts
    for i in range(5):
        q = ev.push(q, a=i)
    assert int(q.count) == 4 and int(q.dropped) == 3
    q = ev.clear(q)
    assert int(q.count) == 0 and int(q.dropped) == 0


def test_event_queue_push_many():
    q = ev.new_queue(8)
    mask = jnp.asarray([False, True, False, True, True])
    q = ev.push_many(q, mask, a=jnp.arange(5, dtype=jnp.int32),
                     c=jnp.arange(5, dtype=jnp.int32) * 10)
    assert int(q.count) == 3
    assert q.a[:3].tolist() == [1, 3, 4]      # original order kept
    assert q.c[:3].tolist() == [10, 30, 40]
    # appends after existing entries
    q = ev.push_many(q, jnp.asarray([True, False, False, False, False]),
                     a=jnp.full(5, 9, jnp.int32))
    assert int(q.count) == 4 and int(q.a[3]) == 9


def test_damage_iframes_death():
    s = st.new_state(8)
    s, e = st.spawn_enemy(s, (0.0, 0.0, 0.0), hp=10)
    evs = ev.new_events(8)
    s, died, evs = sys_.apply_damage(s, e, 4, iframes=0.5, events=evs)
    assert int(s.hp[e]) == 6 and not bool(died)
    # i-frames block the next hit (Health::damage early-out)
    s, died, evs = sys_.apply_damage(s, e, 4, events=evs)
    assert int(s.hp[e]) == 6
    assert int(evs.damage.count) == 1
    # tick i-frames away, kill
    s = sys_.tick_invincibility(s, 1.0)
    s, died, evs = sys_.apply_damage(s, e, 99, events=evs)
    assert int(s.hp[e]) == 0 and bool(died)
    assert int(evs.death.count) == 1 and int(evs.death.a[0]) == int(e)
    # heal clamps at max
    s = sys_.heal(s, e, 1000)
    assert int(s.hp[e]) == 10


def test_combat_system_team_filtering():
    s = st.new_state(8)
    s, player = st.spawn(s, st.KIND_PLAYER, (0.0, 0.0, 0.0), hp=20,
                         team=st.TEAM_PLAYER, hurtbox_radius=1.0)
    s, enemy = st.spawn(s, st.KIND_ENEMY, (1.0, 0.0, 0.0), hp=20,
                        team=st.TEAM_ENEMY, hurtbox_radius=1.0)
    # enemy sword hitbox overlapping the player
    s, sword = st.spawn(s, st.KIND_PROJECTILE, (0.5, 0.0, 0.0),
                        team=st.TEAM_ENEMY, hitbox_active=True,
                        hitbox_radius=0.6, hitbox_damage=5, owner=enemy)
    evs = ev.new_events(8)
    s2, evs = sys_.combat_system(s, evs, 1.0 / 60.0)
    # player takes damage; enemy (same team as sword, and its owner) doesn't
    assert int(s2.hp[player]) == 15
    assert int(s2.hp[enemy]) == 20
    assert int(evs.damage.count) == 1
    assert int(evs.damage.a[0]) == int(player)
    assert int(evs.damage.b[0]) == int(enemy)  # attributed to owner
    # i-frames: a second pass doesn't double-dip
    s3, evs = sys_.combat_system(s2, evs, 1.0 / 60.0)
    assert int(s3.hp[player]) == 15


def test_combat_multiplier_and_death_event():
    s = st.new_state(8)
    s, victim = st.spawn(s, st.KIND_ENEMY, (0.0, 0.0, 0.0), hp=6,
                         team=st.TEAM_ENEMY, hurtbox_radius=1.0,
                         hurtbox_mult=2.0)  # weak point
    s, _ = st.spawn(s, st.KIND_PROJECTILE, (0.2, 0.0, 0.0),
                    team=st.TEAM_PLAYER, hitbox_active=True,
                    hitbox_radius=0.5, hitbox_damage=3)
    evs = ev.new_events(8)
    s, evs = sys_.combat_system(s, evs, 1.0 / 60.0)
    assert int(s.hp[victim]) == 0            # 3 * 2.0 = 6
    assert int(evs.death.count) == 1
    assert int(s.ai_state[victim]) == st.AI_DEAD


def test_doors_and_keys():
    s = st.new_state(8)
    s, door = st.spawn_door(s, (0.0, 0.0, 0.0), required_key=3)
    evs = ev.new_events(8)
    no_keys = jnp.full(4, -1, jnp.int32)
    s, opened, evs = sys_.try_open_door(s, door, 0, no_keys, evs)
    assert not bool(opened) and not bool(s.door_open[door])
    assert int(evs.door.count) == 1 and int(evs.door.c[0]) == 0  # blocked
    with_key = jnp.asarray([3, -1, -1, -1], jnp.int32)
    s, opened, evs = sys_.try_open_door(s, door, 0, with_key, evs)
    assert bool(opened) and bool(s.door_open[door])
    assert int(evs.door.c[1]) == 1
    # already open: no further event
    s, opened, evs = sys_.try_open_door(s, door, 0, with_key, evs)
    assert not bool(opened) and int(evs.door.count) == 2

    # unlocked door opens without keys (world.rs:297 required_key=None)
    s, door2 = st.spawn_door(s, (1.0, 0.0, 0.0))
    s, opened, evs = sys_.try_open_door(s, door2, 0, no_keys, evs)
    assert bool(opened)


def test_checkpoint_and_items():
    s = st.new_state(8)
    s, cp = st.spawn_checkpoint(s, (5.0, 0.0, 5.0))
    s, player = st.spawn(s, st.KIND_PLAYER, (0.0, 0.0, 0.0), hp=10)
    s = s._replace(hp=s.hp.at[player].set(4))
    evs = ev.new_events(8)
    s, evs = sys_.activate_checkpoint(s, cp, player, evs)
    assert bool(s.checkpoint_active[cp])
    assert int(evs.checkpoint.count) == 1
    np.testing.assert_allclose(np.asarray(evs.checkpoint.pos[0]),
                               [5.0, 1.0, 5.0])  # +respawn offset
    # re-activation doesn't re-fire
    s, evs = sys_.activate_checkpoint(s, cp, player, evs)
    assert int(evs.checkpoint.count) == 1

    s, potion = st.spawn(s, st.KIND_ITEM, (0.0, 0.0, 0.0), item_amount=5)
    s, evs = sys_.collect_item(s, potion, player, evs)
    assert int(s.hp[player]) == 9            # healed
    assert not bool(s.alive[potion])         # consumed
    assert int(evs.pickup.count) == 1 and int(evs.pickup.c[0]) == 5

    evs = ev.clear_all(evs)
    assert int(evs.pickup.count) == 0


def test_projectile_and_parenting():
    s = st.new_state(8)
    s, owner = st.spawn_enemy(s, (0.0, 0.0, 0.0), hp=5)
    s, proj = st.spawn_projectile(s, (0.0, 0.0, 0.0), (2.0, 0.0, 0.0), 3,
                                  owner, team=st.TEAM_ENEMY)
    assert int(s.owner[proj]) == int(owner)
    s2 = sys_.integrate_velocities(s, 0.5)
    np.testing.assert_allclose(np.asarray(s2.pos[proj]), [1.0, 0.0, 0.0])

    # hierarchy: child offset composes with parent (one level)
    s2 = s2._replace(parent=s2.parent.at[proj].set(owner))
    s2 = s2._replace(pos=s2.pos.at[owner].set(jnp.asarray([10.0, 0.0, 0.0], jnp.float32)))
    gp = sys_.global_positions(s2)
    np.testing.assert_allclose(np.asarray(gp[proj]), [11.0, 0.0, 0.0])


def test_systems_vmap_over_instances():
    """Everything batches over a leading instance axis."""
    def build(seed):
        s = st.new_state(8)
        s, a = st.spawn(s, st.KIND_PLAYER, (0.0, 0.0, 0.0), hp=10,
                        team=st.TEAM_PLAYER, hurtbox_radius=1.0)
        s, _ = st.spawn(s, st.KIND_PROJECTILE,
                        (jnp.float32(seed), 0.0, 0.0), team=st.TEAM_ENEMY,
                        hitbox_active=True, hitbox_radius=0.5,
                        hitbox_damage=4)
        return s

    batched = jax.tree.map(lambda *xs: jnp.stack(xs),
                           build(0.2), build(5.0))  # hit / miss

    def run(s):
        evs = ev.new_events(4)
        s, evs = sys_.combat_system(s, evs, 1.0 / 60.0)
        return s.hp[0], evs.damage.count

    hp, n = jax.vmap(run)(batched)
    assert hp.tolist() == [6, 10]
    assert n.tolist() == [1, 0]
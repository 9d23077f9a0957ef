"""Headless batched rollout: fused game step + third-person render.

The TPU version of the reference's frame loop (SURVEY.md section 3.1):
`tick` (game/runtime.rs:405) + character camera (runtime.rs:318) +
`render_scene` (scene.rs:180) — with a leading instance axis so thousands of
independent game instances step and rasterize per program, ready to shard
over an instance mesh (parallel/mesh.py).  This is BASELINE.json config #5.
"""

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .config import RasterSettings, WIDTH, HEIGHT
from .types import FrameBuffers
from .models.level import Level
from .models import scene as scene_mod
from .models import texture_pack as tp
from .game import collision as col
from .game import state as st
from .game import step as stp
from .ops import raster_ref


class RolloutEnv(NamedTuple):
    scene: scene_mod.CompiledScene
    grid: col.CollisionGrid
    params: col.PlayerParams
    sky: "object"              # ops.skybox.SkyTables, or None (no skybox);
                               # None vs not-None is part of the pytree
                               # STRUCTURE, so jitted code can branch on it
    flat: "object" = None      # models.scene_flat.FlatScene, or None
    flat_static: "object" = None  # FlatSceneStatic (hashable, static facts)


# flat_static is compile-time data (face counts, pad sizes, transparent
# list) — keep it out of the traced leaves so jit can specialize on it.
jax.tree_util.register_pytree_node(
    RolloutEnv,
    lambda e: ((e.scene, e.grid, e.params, e.sky, e.flat),
               (e.flat_static,)),
    lambda aux, ch: RolloutEnv(*ch, flat_static=aux[0]),
)


def build_env(level: Level, textures, resolve, light_specs=None,
              asset_library=None, user_textures=None,
              flat: bool = False) -> RolloutEnv:
    """`flat=True` additionally compiles the level for the batched Pallas
    kernel path (models/scene_flat.py) — the throughput configuration used
    by bench.py on real TPU hardware."""
    from .models.skybox import Skybox
    from .models import scene_flat
    from .ops import skybox as sky_ops

    sky_cfg = Skybox.from_ron(level.skybox) if level.skybox else None
    sky = sky_ops.build_sky_tables(sky_cfg) if sky_cfg else None
    fscene = fstatic = None
    if flat:
        fscene, fstatic = scene_flat.compile_level_flat(
            level, textures, resolve, light_specs=light_specs,
            asset_library=asset_library, user_textures=user_textures)
    return RolloutEnv(
        scene=scene_mod.compile_level(level, textures, resolve,
                                      light_specs=light_specs,
                                      asset_library=asset_library,
                                      user_textures=user_textures),
        grid=col.compile_collision(level),
        params=col.player_params(level),
        sky=sky,
        flat=fscene,
        flat_static=fstatic,
    )


def initial_states(level: Level, spawn_pos, n_instances: int,
                   capacity: int = 4) -> st.GameState:
    """N identical instances with a spawned player (batch axis 0).

    `capacity` sizes the fixed SoA entity tables.  The datagen scenario
    spawns only the player, yet `tick` solves collision for EVERY slot
    (fixed shapes — dead lanes cost the same as live ones), so the
    default pads the spawned population 4x rather than carrying 16
    slots: measured v5e, the 16-slot step was 6.5 us/inst at N=1024 —
    a third of the whole frame budget — and scales ~linearly with
    capacity.  Callers that spawn more entities pass a bigger capacity
    (the interactive runtime sizes its own state)."""
    base = st.new_state(capacity)
    base, _ = st.spawn_player(base, spawn_pos, level.player_settings)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_instances,) + x.shape).copy(), base)


@functools.partial(jax.jit,
                   static_argnames=("settings", "height", "width", "dt",
                                    "instance_chunk"))
def step_and_render(states: st.GameState, env: RolloutEnv,
                    actions: stp.Actions, settings: RasterSettings,
                    height: int = HEIGHT, width: int = WIDTH,
                    dt: float = 1.0 / 60.0, instance_chunk: int = 128):
    """One batched frame: tick every instance, update its character camera,
    rasterize its view.  Returns (new_states, framebuffers)."""

    states = jax.vmap(
        lambda s, a: stp.tick(s, env.grid, env.params, a, dt))(states, actions)
    cams = jax.vmap(lambda s: stp.character_camera(s, env.params))(states)

    n = states.alive.shape[0]

    from .models import scene_flat
    from .ops import raster_batch as rb
    if (env.flat is not None and env.flat_static is not None
            and height % 8 == 0      # _tile_sizes adapts ch/wb down to 8
            and scene_flat.kernel_path_ok(env.flat_static, settings)):
        fb0 = raster_ref.new_framebuffer(height, width, depth_mode="inv")
        fbs = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (n,) + x.shape), fb0)
        interpret = jax.default_backend() not in ("tpu", "axon")
        if env.sky is not None:
            from .ops import skybox as sky_ops
            if sky_ops.sky_kernel_ok(env.sky, env.flat_static, settings):
                # in-kernel sky (round 5): the kernel synthesizes the
                # background per chunk (fully-covered chunks skip it) and
                # stars post-compose on still-background pixels — no
                # per-instance sky buffer, no full-frame sky evaluation
                fbs = scene_flat.render_level_flat(
                    fbs, env.flat, env.flat_static, cams, settings,
                    height=height, width=width, interpret=interpret,
                    sky=env.sky)
            else:
                # sky-buffer path: the sky renders straight into kernel
                # layout (no per-instance transposes) and the depth
                # plane is implicitly the cleared inverse-z buffer
                skyc = jax.vmap(lambda c: sky_ops.render_skybox_layout(
                    env.sky, c, height, width))(cams)
                fbs = scene_flat.render_level_flat(
                    fbs, env.flat, env.flat_static, cams, settings,
                    height=height, width=width, interpret=interpret,
                    fb_layout_color=skyc)
        else:
            fbs = scene_flat.render_level_flat(
                fbs, env.flat, env.flat_static, cams, settings,
                height=height, width=width, interpret=interpret,
                background=0)   # new_framebuffer's clear word
        return states, fbs

    def render_one(cam):
        fb = raster_ref.new_framebuffer(height, width, depth_mode="inv")
        if env.sky is not None:
            from .ops import skybox as sky_ops
            fb = sky_ops.render_skybox(fb, env.sky, cam)
        return scene_mod.render_level(fb, env.scene, cam, settings,
                                      depth_mode="fast")

    if instance_chunk is None or n <= instance_chunk:
        fbs = jax.vmap(render_one)(cams)
    else:
        assert n % instance_chunk == 0
        g = n // instance_chunk
        cams_g = jax.tree_util.tree_map(
            lambda x: x.reshape((g, instance_chunk) + x.shape[1:]), cams)
        fbs = jax.lax.map(lambda c: jax.vmap(render_one)(c), cams_g)
        fbs = jax.tree_util.tree_map(
            lambda x: x.reshape((n,) + x.shape[2:]), fbs)
    return states, fbs


def demo_env(level_path="/root/reference/assets/samples/levels/Cave.ron",
             flat: bool = False):
    """Convenience: Cave level + all sample packs."""
    from .models import level as L

    level = L.load_level(level_path)
    textures = tp.load_texture_packs(
        "/root/reference/assets/samples/texture-packs")
    resolve = tp.make_resolver(textures)
    env = build_env(level, textures, resolve, flat=flat)
    # first sector with a floor = spawn
    r0 = level.rooms[0]
    spawn = None
    for x, z, s in r0.iter_sectors():
        if s.floor is not None:
            px = float(r0.position[0]) + (x + 0.5) * 1024.0
            pz = float(r0.position[2]) + (z + 0.5) * 1024.0
            fi = level.get_floor_info((px, 0.0, pz))
            spawn = (px, fi.floor + 10.0, pz)
            break
    return level, env, spawn

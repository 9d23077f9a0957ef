#!/usr/bin/env python
"""End-to-end demo: batched game instances exploring the Cave sample
level, composited with the in-frame debug overlay and options menu into
a contact-sheet PNG.

    python scripts/demo.py out.png [n_steps] [--tpu]

Drives the full stack: level load -> collision grid + scene compile ->
souls-like tick -> character camera -> skybox + rasterization ->
UI overlay -> PNG.  Runs on CPU by default (a few minutes of XLA
compiles); --tpu uses the real chip and the batched Pallas kernel.
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/demo.png"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    use_tpu = "--tpu" in sys.argv

    import jax
    if not use_tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from bonnie32_tpu import rollout
    from bonnie32_tpu.config import RasterSettings
    from bonnie32_tpu.game import overlay as ov
    from bonnie32_tpu.game import step as stp
    from bonnie32_tpu.game.runtime import GameToolState
    from bonnie32_tpu.input import InputState
    from bonnie32_tpu.input.state import VirtualGamepad, VirtualKeyboard
    from bonnie32_tpu.profiling import FrameTimings
    from bonnie32_tpu.ui import Rect, UiContext

    n = 4
    level, env, spawn = rollout.demo_env(flat=use_tpu)
    states = rollout.initial_states(level, spawn, n)
    rng = np.random.default_rng(7)
    settings = RasterSettings.game()

    import time
    t0 = time.perf_counter()
    for step in range(n_steps):
        ang = rng.uniform(0, 2 * np.pi)
        acts = stp.Actions(
            move_x=jnp.asarray(np.sin(ang + np.arange(n)), jnp.float32),
            move_y=jnp.asarray(np.cos(ang + np.arange(n) * 0.7),
                               jnp.float32),
            cam_x=jnp.full(n, 0.15, jnp.float32),
            cam_y=jnp.zeros(n, jnp.float32),
            sprint=jnp.zeros(n, bool),
            jump=jnp.asarray(np.arange(n) % 4 == step % 4))
        states, fbs = rollout.step_and_render(states, env, acts, settings,
                                              instance_chunk=None)
    dt = time.perf_counter() - t0
    print(f"{n_steps} steps x {n} instances in {dt:.1f}s")

    # overlay on instance 0, options menu on instance 1
    game = GameToolState(grid=env.grid, params=env.params)
    game.show_debug_overlay = True
    inp = InputState(VirtualKeyboard(), VirtualGamepad())
    timings = FrameTimings()
    timings.add("render", dt / max(n_steps, 1))
    timings.add("input", 0.001)

    tiles = []
    for i in range(n):
        fb = jax.tree_util.tree_map(lambda x: x[i], fbs)
        ctx = UiContext()
        ctx.begin_frame(0, 0, False)
        if i == 0:
            ov.draw_debug_overlay(ctx, game, Rect(0, 0, 320, 240), inp,
                                  fps=60.0, timings=timings)
        elif i == 1:
            game.options_menu_open = True
            ov.draw_debug_menu(ctx, game, Rect(0, 0, 320, 240), inp)
        fb = ctx.paint(fb)
        w = np.asarray(fb.color)
        tiles.append(np.stack([w & 0xFF, (w >> 8) & 0xFF,
                               (w >> 16) & 0xFF], -1).astype(np.uint8))

    game_quad = np.concatenate([np.concatenate(tiles[:2], axis=1),
                                np.concatenate(tiles[2:], axis=1)], axis=0)

    # --- tool screens (640x480 each): editor w/ live viewport content,
    # modeler w/ 4-pane renders + skeleton, tracker instruments ---
    from bonnie32_tpu.editor.layout import EditorLayout, draw_editor
    from bonnie32_tpu.editor.state import (EditorState, SectorFace,
                                           Selection)
    from bonnie32_tpu.editor import viewport_render as vr
    from bonnie32_tpu.models import modeler_viewport as mv
    from bonnie32_tpu.models import build as mbuild
    from bonnie32_tpu.models.modeler import ModelerState
    from bonnie32_tpu.models.modeler_layout import (ModelerLayout,
                                                    draw_modeler)
    from bonnie32_tpu.audio.state import TrackerState
    from bonnie32_tpu.audio import tracker_ui as tu
    from bonnie32_tpu.ops import raster_ref

    def screen_tile(draw):
        ctx = UiContext()
        ctx.begin_frame(0, 0, False)
        draw(ctx)
        fb = raster_ref.new_framebuffer(480, 640, depth_mode="inv")
        fb = ctx.paint(fb)
        w = np.asarray(fb.color)
        return np.stack([w & 0xFF, (w >> 8) & 0xFF, (w >> 16) & 0xFF],
                        -1).astype(np.uint8)

    es = EditorState(level)
    room0 = level.rooms[0]
    cell = next(((x, z) for x, z, sec in room0.iter_sectors()
                 if sec.floor is not None), (0, 0))
    es.selection = Selection(kind="sector_face", room=0, x=cell[0],
                             z=cell[1], face=SectorFace(kind="floor"))
    es.camera_mode = "orbit"
    es.orbit_distance = 5000.0
    es.center_camera_on_selection()

    from bonnie32_tpu.models import texture_pack as tp
    packs = tp.load_texture_packs(
        "/root/reference/assets/samples/texture-packs")

    def draw_editor_screen(ctx):
        layout = EditorLayout()
        rects = draw_editor(ctx, layout, es, Rect(0, 0, 640, 480),
                            textures=packs)
        vp = rects["viewport"]
        vfb = vr.render_editor_viewport(es, env.scene, int(vp.w),
                                        int(vp.h))
        ctx.commands.append(("image", (vp.x, vp.y),
                             np.asarray(vfb.color)))

    ms = ModelerState()
    ms.ensure_skeleton()
    ms.create_child_bone(0)

    def draw_modeler_screen(ctx):
        layout = ModelerLayout()
        rects = draw_modeler(ctx, layout, ms, Rect(0, 0, 640, 480))
        vps = mv.ModelerViewports()
        verts, mfaces = ms.mesh.to_render_data_textured()
        pos = np.array([v["pos"] for v in verts], np.float32)
        mesh = mbuild.make_mesh_arrays(
            pos, uv=np.array([v["uv"] for v in verts], np.float32),
            normal=np.array([v["normal"] for v in verts], np.float32),
            color=np.array([v["color"] for v in verts], np.int32))
        fa = mbuild.make_face_arrays(np.array(
            [(f["v0"], f["v1"], f["v2"]) for f in mfaces], np.int32))
        atlas = mbuild.build_atlas([(np.full((1, 1), 0x7FFF, np.uint16),
                                     0)])
        lights = mbuild.lights_from_list([])
        frames = mv.render_all_views(vps, mesh, fa, atlas, lights,
                                     RasterSettings.modeler(),
                                     rects["viewport"])
        mv.composite_views(ctx, vps, frames, rects["viewport"])

    ts = TrackerState()

    def draw_tracker_screen(ctx):
        tu.draw_tracker_screen(ctx, ts, Rect(0, 0, 640, 480),
                               tab=tu.TrackerTab.INSTRUMENTS,
                               presets=[(0, 0, "Piano"), (0, 24, "Guitar")],
                               sel={"inst": 0})

    screens = [game_quad, screen_tile(draw_editor_screen),
               screen_tile(draw_modeler_screen),
               screen_tile(draw_tracker_screen)]
    sheet = np.concatenate([np.concatenate(screens[:2], axis=1),
                            np.concatenate(screens[2:], axis=1)], axis=0)
    Image.fromarray(sheet).save(out_path)
    print(f"wrote {out_path} ({sheet.shape[1]}x{sheet.shape[0]})")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-3 perf probe: texture-major packed texel fetch vs round-2 paths.

Measures render-only throughput for cube / Cave / Cathedral under several
kernel fetch variants, plus on-device exactness (pixel diff counts).

Methodology (PLAN_PERF.md round-3 revision): the tunnel sync (~27 ms) has
tens-of-ms jitter AND the chip drifts between multi-minute "modes", so
short chains and single-shot slopes are garbage.  Protocol:
  * long chains (k2 - k1 = 40 frames) so compute dominates sync jitter,
  * all variants interleaved in one round-robin, several rounds,
  * min per (variant, chain length) across rounds, slope of the mins.

    timeout 1700 python scripts/perf_fetch.py [n_instances] &
"""

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np

K1, K2, ROUNDS = 5, 45, 3


def measure(runs: dict) -> dict:
    """runs: name -> run(k).  Returns name -> sec/frame."""
    for r in runs.values():
        r(2)   # compile + warm
    t = {name: {K1: [], K2: []} for name in runs}
    for _ in range(ROUNDS):
        for k in (K1, K2):
            for name, r in runs.items():
                t0 = time.perf_counter()
                r(k)
                t[name][k].append(time.perf_counter() - t0)
    return {name: max((min(d[K2]) - min(d[K1])) / (K2 - K1), 1e-9)
            for name, d in t.items()}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128

    import jax
    import jax.numpy as jnp
    import bonnie32_tpu  # noqa: F401
    from bonnie32_tpu.config import RasterSettings, WIDTH, HEIGHT
    from bonnie32_tpu.models import scene_flat
    from bonnie32_tpu.ops import camera as cam_ops
    from bonnie32_tpu.ops import raster_ref
    from bonnie32_tpu.models import level as L
    from bonnie32_tpu.models import texture_pack as tp
    import scenes

    print(f"# device: {jax.devices()[0]}  n={n}", flush=True)
    settings = RasterSettings.game()
    packs = tp.load_texture_packs(
        "/root/reference/assets/samples/texture-packs")
    resolve = tp.make_resolver(packs)

    VARIANTS = ("", "gate", "dirfetch", "notex")

    def report(name, rates, outs, n_i):
        for dbg, dt in rates.items():
            print(f"{name:10s} {dbg:9s} {1000*dt:8.2f} ms/frame  "
                  f"{dt/n_i*1e6:7.2f} us/inst  {n_i/dt:9.0f} ifps",
                  flush=True)
        for k in outs:
            if k in ("dirfetch", "notex"):
                continue
            diffs = int((outs[k] != outs["dirfetch"]).sum())
            print(f"{name:10s} {k or 'texmajor'}-vs-dirfetch diffs: {diffs}",
                  flush=True)

    def bench_scene(name, flat, static, make_cams, n_i):
        fb0 = raster_ref.new_framebuffer(HEIGHT, WIDTH, depth_mode="inv")
        fbs0 = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (n_i,) + x.shape), fb0)

        runs, outs = {}, {}
        for dbg in VARIANTS:
            def frame(t, dbg=dbg):
                out = scene_flat.render_level_flat(
                    fbs0, flat, static, make_cams(t), settings,
                    height=HEIGHT, width=WIDTH, debug=dbg)
                return out.color

            frame = jax.jit(frame)

            def run(k, frame=frame):
                t = jnp.float32(0)
                acc = jnp.float32(0)
                for _ in range(k):
                    color = frame(t + acc * 1e-30)
                    t = t + 1.0
                    acc = acc + color[0, 0, 0]
                return float(acc)

            runs[dbg or "texmajor"] = run
            if dbg != "notex":
                outs[dbg or "texmajor"] = np.asarray(frame(jnp.float32(1.0)))
        report(name, measure(runs), outs, n_i)

    def level_cfg(name):
        level = L.load_level(
            f"/root/reference/assets/samples/levels/{name}.ron")
        flat, static = scene_flat.compile_level_flat(level, packs, resolve)
        r0 = level.rooms[0]
        pos = None
        for x, z, s in r0.iter_sectors():
            if s.floor is not None:
                px = float(r0.position[0]) + (x + 0.5) * 1024.0
                pz = float(r0.position[2]) + (z + 0.5) * 1024.0
                fi = level.get_floor_info((px, 0.0, pz))
                pos = (px, fi.floor - 800.0, pz)
                break
        return flat, static, pos

    base = np.arange(n, dtype=np.float32) * 0.013

    tex = [scenes.checker_texture15(32, 32, with_black=False)]
    verts, faces = scenes.cube_scene(tex_ids=(0, 0, 0, 0, 0, 0))
    cflat, cstatic = scene_flat.compile_scene_flat(
        verts, faces, tex, scenes.DEFAULT_LIGHT_SPECS)
    bench_scene("cube", cflat, cstatic,
                lambda t: cam_ops.orbit_cameras(
                    jnp.asarray(base) + t * 0.031, 0.35, 3.5), n)

    for name, dist in (("Cave", 2200.0), ("Cathedral", 2200.0),
                       ("CaveIn", 600.0)):
        flat, static, pos = level_cfg(name.replace("In", ""))
        tgt = jnp.asarray(pos, jnp.float32)
        bench_scene(name, flat, static,
                    lambda t, tgt=tgt, dist=dist: cam_ops.orbit_cameras(
                        jnp.asarray(base) + t * 0.031, 0.30, dist,
                        target=tgt), n)


if __name__ == "__main__":
    main()

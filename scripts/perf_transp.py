#!/usr/bin/env python
"""Round-5 probe: transparent-path throughput (bench config #2 shape).

Measures the half-transparent cube at N (default 256) through
render_level_flat, comparing the in-kernel phase-3 compositor against the
sequential masked compositor ("seqtrans"), plus the x-ray mode path.

    timeout 1700 python scripts/perf_transp.py [n]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

K1, K2, ROUNDS = 5, 45, 3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256

    import jax
    import jax.numpy as jnp
    from jax import lax
    import bonnie32_tpu  # noqa: F401
    from bonnie32_tpu.config import RasterSettings, WIDTH, HEIGHT
    from bonnie32_tpu.models import scene_flat
    from bonnie32_tpu.ops import camera as cam_ops
    from bonnie32_tpu.ops import raster_ref
    from tests import scenes

    print(f"# device: {jax.devices()[0]}  n={n}", flush=True)
    settings = RasterSettings.game()

    verts, faces = scenes.cube_scene(tex_ids=(0, 0, 0, 0, 0, 0))
    tex = [scenes.checker_texture15(32, 32, with_black=False)]
    tfaces = [dict(f, blend_mode=(1 if i % 2 else 0))
              for i, f in enumerate(faces)]
    tflat, tstatic = scene_flat.compile_scene_flat(
        verts, tfaces, tex, scenes.DEFAULT_LIGHT_SPECS)
    print(f"# transparent faces: {len(tstatic.transparent_idx)}", flush=True)

    fb0 = raster_ref.new_framebuffer(HEIGHT, WIDTH, depth_mode="inv")
    fbs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), fb0)
    base = np.arange(n, dtype=np.float32) * 0.01

    runs = {}

    def add(name, dbg="", s=settings):
        @jax.jit
        def chain(k, dbg=dbg, s=s):
            def body(i, carry):
                t, acc = carry
                cams = cam_ops.orbit_cameras(
                    jnp.asarray(base) + t * 0.031, 0.35, 3.5)
                out = scene_flat.render_level_flat(
                    fbs, tflat, tstatic, cams, s,
                    height=HEIGHT, width=WIDTH, debug=dbg)
                return (t + 1.0
                        + out.color[0, 0, 0].astype(jnp.float32) * 1e-30,
                        acc + out.color[0, 0, 0].astype(jnp.float32))

            _, acc = lax.fori_loop(0, k, body,
                                   (jnp.float32(0), jnp.float32(0)))
            return acc

        runs[name] = lambda k: float(chain(jnp.int32(k)))

    add("kernel_tr")
    add("seq_tr", dbg="seqtrans")
    add("xray", s=RasterSettings.game(xray_mode=True))

    for r in runs.values():
        r(2)
    t = {name: {K1: [], K2: []} for name in runs}
    for _ in range(ROUNDS):
        for k in (K1, K2):
            for name, r in runs.items():
                t0 = time.perf_counter()
                r(k)
                t[name][k].append(time.perf_counter() - t0)
    for name, d in t.items():
        dt = max((min(d[K2]) - min(d[K1])) / (K2 - K1), 1e-9)
        print(f"{name:12s} {1000*dt:8.2f} ms/frame  "
              f"{dt/n*1e6:7.2f} us/inst  {n/dt:9.0f} ifps", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""On-hardware bit-exactness check: batched Pallas kernel vs the
sequential oracle path, full 320x240, 4 in-level cameras per level.

TPU does not contract FMAs (PLAN_PERF fact 7), so the budget here is
ZERO pixel diffs — unlike the CPU tests' seam budgets.

    timeout 1700 python scripts/check_parity_tpu.py [levels...]
"""

import sys

sys.path.insert(0, ".")

import numpy as np

DEFAULT_LEVELS = ["Cave.ron", "Cathedral.ron", "Dungeon.ron"]
LEVELS = "/root/reference/assets/samples/levels"
PACKS = "/root/reference/assets/samples/texture-packs"


def _cams(level, n, build, jnp, jax):
    fi_pos = []
    r0 = level.rooms[0]
    for x, z, s in r0.iter_sectors():
        if s.floor is not None:
            px = float(r0.position[0]) + (x + 0.5) * 1024.0
            pz = float(r0.position[2]) + (z + 0.5) * 1024.0
            fi = level.get_floor_info((px, 0.0, pz))
            fi_pos.append((px, fi.floor - 800.0, pz))
            if len(fi_pos) >= n:
                break
    while len(fi_pos) < n:
        fi_pos.append(fi_pos[-1])
    cams = []
    for i, p in enumerate(fi_pos):
        basis = build.camera_basis(0.1 + 0.2 * i, 0.7 * i)
        cams.append(build.make_camera(np.asarray(p, np.float32), basis))
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)


def main():
    names = sys.argv[1:] or DEFAULT_LEVELS

    import jax
    import jax.numpy as jnp
    import bonnie32_tpu  # noqa: F401
    from bonnie32_tpu.config import RasterSettings, WIDTH, HEIGHT
    from bonnie32_tpu.models import level as L
    from bonnie32_tpu.models import scene as scene_mod
    from bonnie32_tpu.models import scene_flat
    from bonnie32_tpu.models import texture_pack as tp
    from bonnie32_tpu.models import build
    from bonnie32_tpu.ops import raster_ref

    print(f"# device: {jax.devices()[0].device_kind}", flush=True)
    textures = tp.load_texture_packs(PACKS)
    resolve = tp.make_resolver(textures)
    settings = RasterSettings.game()
    fail = 0
    for name in names:
        level = L.load_level(f"{LEVELS}/{name}")
        flat, static = scene_flat.compile_level_flat(level, textures,
                                                     resolve)
        seq = scene_mod.compile_level(level, textures, resolve)
        if not scene_flat.kernel_path_ok(static, settings):
            print(f"{name}: kernel_path_ok=False, skipped", flush=True)
            continue

        n = 4
        cams = _cams(level, n, build, jnp, jax)
        fb0 = raster_ref.new_framebuffer(HEIGHT, WIDTH, depth_mode="inv")
        fbs = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (n,) + x.shape), fb0)
        out = scene_flat.render_level_flat(fbs, flat, static, cams,
                                           settings, height=HEIGHT,
                                           width=WIDTH)
        ref = jax.vmap(lambda c: scene_mod.render_level(
            fb0, seq, c, settings, depth_mode="fast"))(cams)
        # color is a packed (n, H, W) int plane
        c_new = np.asarray(jax.device_get(out.color))
        c_ref = np.asarray(jax.device_get(ref.color))
        nz = int((c_ref != c_ref.reshape(n, -1)[:, :1, None]).sum())
        diffs = int((c_new != c_ref).sum())
        status = "OK" if diffs == 0 else "FAIL"
        if diffs:
            fail = 1
        print(f"{name}: {diffs} pixel diffs over {n} cams "
              f"(nonbg {nz}/{c_ref.size}) {status}", flush=True)

        # in-kernel sky vs the sky-buffer path (round 5): the kernel's
        # minimax acos/atan2 differ from XLA's by ~1e-5 rad, so the
        # budget is ±1 u8 step on a small pixel fraction (not zero)
        if level.skybox is not None:
            from bonnie32_tpu.ops import skybox as sky_ops
            from bonnie32_tpu.models.skybox import Skybox
            tables = sky_ops.build_sky_tables(Skybox.from_ron(level.skybox))
            if not sky_ops.sky_kernel_ok(tables, static, settings):
                print(f"{name}: sky_kernel_ok=False, sky check skipped",
                      flush=True)
                continue
            skyc = jax.vmap(lambda c: sky_ops.render_skybox_layout(
                tables, c, HEIGHT, WIDTH))(cams)
            s_ref = scene_flat.render_level_flat(
                fbs, flat, static, cams, settings, height=HEIGHT,
                width=WIDTH, fb_layout_color=skyc)
            s_new = scene_flat.render_level_flat(
                fbs, flat, static, cams, settings, height=HEIGHT,
                width=WIDTH, sky=tables)
            a = np.asarray(jax.device_get(s_ref.color))
            b = np.asarray(jax.device_get(s_new.color))
            step = 0
            for s in (0, 8, 16, 24):
                step = max(step, int(np.abs(
                    ((a >> s) & 255).astype(int)
                    - ((b >> s) & 255).astype(int)).max()))
            sd = int((a != b).sum())
            ok = step <= 1 and sd <= a.size * 0.01
            if not ok:
                fail = 1
            print(f"{name}: sky kernel-vs-buffer {sd} diffs "
                  f"(max step {step}) {'OK' if ok else 'FAIL'}",
                  flush=True)
    sys.exit(fail)


if __name__ == "__main__":
    main()

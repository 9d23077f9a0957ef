"""Batched rendering + instance-axis sharding tests (8-device CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp

from bonnie32_tpu.config import RasterSettings
from bonnie32_tpu.models import build
from bonnie32_tpu import batch
from bonnie32_tpu.render import render_mesh_15
from bonnie32_tpu.ops import raster_ref
from bonnie32_tpu.parallel import mesh as pmesh
from bonnie32_tpu.types import no_fog

import scenes

H, W = 60, 80


def _scene():
    tex = [scenes.checker_texture15(16, 16, with_black=True)]
    verts, faces = scenes.cube_scene(tex_ids=(0, 0, 0, None, None, 0))
    mesh, fa = scenes.to_jax_scene(verts, faces)
    atlas = build.build_atlas(tex)
    lights = build.lights_from_list(scenes.DEFAULT_LIGHT_SPECS)
    return mesh, fa, atlas, lights


def _cameras(n):
    pos, bas = [], []
    for i in range(n):
        yaw = 0.3 + 0.4 * i
        basis = build.camera_basis(0.3, yaw)
        # orbit camera: stay ~3.5 world units behind the cube along -bz
        p = (-3.5 * basis[2]).astype(np.float32)
        pos.append(p)
        bas.append(basis)
    return batch.batched_cameras(np.stack(pos), np.stack(bas))


def test_batch_matches_single():
    mesh, fa, atlas, lights = _scene()
    settings = RasterSettings.game()
    n = 4
    cams = _cameras(n)
    fbs = batch.batched_framebuffers(n, H, W)
    out = batch.render_batch(fbs, mesh, fa, atlas, cams, lights, no_fog(),
                             settings)
    out_np = np.asarray(out.color)
    assert out_np.shape == (n, H, W)

    for i in range(n):
        fb1 = raster_ref.new_framebuffer(H, W, depth_mode="inv")
        cam1 = jax.tree_util.tree_map(lambda x: x[i], cams)
        single = render_mesh_15(fb1, mesh, fa, atlas, cam1, lights, no_fog(),
                                settings, depth_mode="fast")
        ndiff = int((out_np[i] != np.asarray(single.color)).sum())
        # XLA:CPU FMA contraction can flip depth near-ties on triangle
        # seams between differently-compiled programs; bit-exact on TPU.
        budget = 0 if jax.devices()[0].platform in ("tpu", "axon") else 4
        assert ndiff <= budget, f"instance {i}: {ndiff} differing pixels"
    # different cameras must give different images
    assert not np.array_equal(out_np[0], out_np[1])


def test_batch_sharded_over_mesh():
    mesh, fa, atlas, lights = _scene()
    settings = RasterSettings.game()
    n = 8
    dev_mesh = pmesh.instance_mesh()
    assert len(dev_mesh.devices.ravel()) == 8

    cams = _cameras(n)
    fbs = batch.batched_framebuffers(n, H, W)

    fbs_s = pmesh.shard_instances(fbs, dev_mesh)
    cams_s = pmesh.shard_instances(cams, dev_mesh)
    scene_r = pmesh.replicate((mesh, fa, atlas, lights, no_fog()), dev_mesh)
    mesh_r, fa_r, atlas_r, lights_r, fog_r = scene_r

    out = batch.render_batch(fbs_s, mesh_r, fa_r, atlas_r, cams_s, lights_r,
                             fog_r, settings)
    out.color.block_until_ready()

    # result equals unsharded run
    ref = batch.render_batch(fbs, mesh, fa, atlas, cams, lights, no_fog(),
                             settings)
    np.testing.assert_array_equal(np.asarray(out.color), np.asarray(ref.color))

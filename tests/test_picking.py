"""Ray picking / viewport geometry: inverse-projection roundtrips, ray
queries, near-plane clipping, Mat4 — mirrors ray.rs + math.rs behavior."""

import numpy as np
import jax.numpy as jnp

from bonnie32_tpu.config import NEAR_PLANE, OrthoProjection
from bonnie32_tpu.models import build
from bonnie32_tpu.ops import picking as pk

W, H = 320, 240
BASIS = np.asarray(build.camera_basis(0.3, 0.7), np.float32)
CAMPOS = np.array([1.0, -2.0, -5.0], np.float32)


def _gold_screen_to_ray(sx, sy, width, height, campos, basis):
    """Scalar transcription of ray.rs:46-101."""
    vs = min(width, height) / 2.0 * 0.75
    us = 5.0 - 1.0
    ndc_x = (sx - width / 2.0) / vs
    ndc_y = (sy - height / 2.0) / vs
    cd = np.array([ndc_x / us, ndc_y / us, 1.0], np.float32)
    wd = cd[0] * basis[0] + cd[1] * basis[1] + cd[2] * basis[2]
    return campos, wd / np.linalg.norm(wd)


def test_screen_ray_matches_reference_formula():
    """screen_to_ray reproduces ray.rs exactly.  NOTE the reference anchors
    the ray at the camera position even though the projection's true inverse
    line is laterally offset by ndc*DISTANCE/us (ray.rs:44-45 documents the
    virtual-camera convergence); we reproduce that behavior, not the exact
    inverse."""
    rng = np.random.default_rng(0)
    pts = (rng.standard_normal((32, 3)) * 3.0).astype(np.float32)
    pts[:, 2] = np.abs(pts[:, 2]) + 2.0
    world = CAMPOS + pts @ BASIS  # cam space -> world (rows are axes)

    sx, sy, cam_z, ok = pk.world_to_screen(world, CAMPOS, BASIS, W, H)
    assert bool(np.all(np.asarray(ok)))
    np.testing.assert_allclose(np.asarray(cam_z), pts[:, 2], rtol=1e-5)

    o, d = pk.screen_to_ray(sx, sy, W, H, CAMPOS, BASIS)
    o, d = np.asarray(o), np.asarray(d)
    for i in range(len(world)):
        go, gd = _gold_screen_to_ray(float(np.asarray(sx)[i]),
                                     float(np.asarray(sy)[i]),
                                     W, H, CAMPOS, BASIS)
        np.testing.assert_allclose(o[i], go, atol=1e-6)
        np.testing.assert_allclose(d[i], gd, atol=1e-6)

    # Direction parallels the true inverse line: offsetting the origin to
    # the virtual view plane point makes the ray pass through the world
    # point (checks the ndc/us slope is right even though origin isn't).
    vs = min(W, H) / 2.0 * 0.75
    us = 4.0
    ndc = np.stack([(np.asarray(sx) - W / 2.0) / vs,
                    (np.asarray(sy) - H / 2.0) / vs], axis=-1)
    plane_cam = np.concatenate([ndc * 5.0 / us,
                                np.zeros((len(ndc), 1))], axis=-1)
    true_origin = CAMPOS + plane_cam.astype(np.float32) @ BASIS
    v = world - true_origin
    t = np.sum(v * d, axis=-1)
    closest = true_origin + t[:, None] * d
    assert np.linalg.norm(world - closest, axis=-1).max() < 2e-2


def test_screen_ray_ortho_roundtrip():
    ortho = OrthoProjection(zoom=24.0, center_x=1.5, center_y=-0.5)
    rng = np.random.default_rng(1)
    pts = (rng.standard_normal((16, 3)) * 4.0).astype(np.float32)
    world = CAMPOS + pts @ BASIS
    sx, sy, _, ok = pk.world_to_screen_ortho(world, CAMPOS, BASIS, W, H,
                                             ortho.zoom, ortho.center_x,
                                             ortho.center_y)
    o, d = pk.screen_to_ray_auto(sx, sy, W, H, CAMPOS, BASIS, ortho)
    # parallel rays along basis z
    np.testing.assert_allclose(np.asarray(d), np.tile(BASIS[2], (16, 1)),
                               atol=1e-6)
    v = world - np.asarray(o)
    t = np.sum(v * np.asarray(d), axis=-1)
    closest = np.asarray(o) + t[:, None] * np.asarray(d)
    assert np.linalg.norm(world - closest, axis=-1).max() < 1e-3


def test_ray_plane_and_line():
    t, ok = pk.ray_plane_intersection([0, 0, 10.0], [0, 0, -1.0],
                                      [0, 0, 0.0], [0, 0, 1.0])
    assert bool(ok) and abs(float(t) - 10.0) < 1e-3
    # parallel -> invalid
    _, ok = pk.ray_plane_intersection([0, 0, 10.0], [1, 0, 0.0],
                                      [0, 0, 0.0], [0, 0, 1.0])
    assert not bool(ok)
    # behind origin -> invalid
    _, ok = pk.ray_plane_intersection([0, 0, 10.0], [0, 0, 1.0],
                                      [0, 0, 0.0], [0, 0, 1.0])
    assert not bool(ok)

    # ray toward x-axis line: closest point straight below origin
    p, s, ok = pk.ray_line_closest_point([3.0, 5.0, 0.0], [0.0, -1.0, 0.0],
                                         [0.0, 0.0, 0.0], [1.0, 0.0, 0.0])
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(p), [3.0, 0.0, 0.0], atol=1e-5)
    assert abs(float(s) - 3.0) < 1e-5
    # parallel lines -> invalid
    _, _, ok = pk.ray_line_closest_point([0, 1, 0.0], [1, 0, 0.0],
                                         [0, 0, 0.0], [1, 0, 0.0])
    assert not bool(ok)


def test_ray_circle_angle():
    # circle in xy-plane, ref = +x; ray from above hitting (0, r, 0) -> +90deg
    ang, ok = pk.ray_circle_angle([0.0, 2.0, 5.0], [0.0, 0.0, -1.0],
                                  [0.0, 0.0, 0.0], [0.0, 0.0, 1.0],
                                  [1.0, 0.0, 0.0])
    assert bool(ok)
    np.testing.assert_allclose(float(ang), np.pi / 2, atol=1e-5)
    # dead-center hit -> invalid
    _, ok = pk.ray_circle_angle([0.0, 0.0, 5.0], [0.0, 0.0, -1.0],
                                [0.0, 0.0, 0.0], [0.0, 0.0, 1.0],
                                [1.0, 0.0, 0.0])
    assert not bool(ok)


def test_pick_triangle():
    tris = jnp.asarray(np.array([
        [[-1, -1, 5], [1, -1, 5], [0, 1, 5]],     # hit at t=5
        [[-1, -1, 3], [1, -1, 3], [0, 1, 3]],     # hit at t=3 (nearer)
        [[10, 10, 4], [11, 10, 4], [10, 11, 4]],  # miss
    ], np.float32))
    idx, t, hit = pk.pick_triangle([0.0, 0.0, 0.0], [0.0, 0.0, 1.0], tris)
    assert bool(hit) and int(idx) == 1 and abs(float(t) - 3.0) < 1e-5
    # all masked out -> no hit
    idx, _, hit = pk.pick_triangle([0.0, 0.0, 0.0], [0.0, 0.0, 1.0], tris,
                                   valid=jnp.zeros(3, bool))
    assert not bool(hit) and int(idx) == -1


def test_point_helpers():
    d = pk.point_to_segment_distance(5.0, 5.0, 0.0, 0.0, 10.0, 0.0)
    assert abs(float(d) - 5.0) < 1e-5
    d = pk.point_to_segment_distance(-3.0, 4.0, 0.0, 0.0, 10.0, 0.0)
    assert abs(float(d) - 5.0) < 1e-5            # clamps to endpoint
    d = pk.point_to_segment_distance(3.0, 4.0, 1.0, 1.0, 1.0, 1.0)
    assert abs(float(d) - np.hypot(2, 3)) < 1e-5  # degenerate segment
    assert bool(pk.point_in_triangle_2d(5.0, 3.0, 0, 0, 10, 0, 5, 10))
    assert not bool(pk.point_in_triangle_2d(-1.0, 3.0, 0, 0, 10, 0, 5, 10))
    u, v, w = pk.barycentric_2d([5.0, 10 / 3, 0.0], [0.0, 0, 0],
                                [10.0, 0, 0], [5.0, 10, 0])
    np.testing.assert_allclose([float(u), float(v), float(w)],
                               [1 / 3, 1 / 3, 1 / 3], atol=1e-5)
    u, _, _ = pk.barycentric_2d([0.0, 0, 0], [0.0, 0, 0], [0.0, 0, 0],
                                [0.0, 0, 0])
    assert float(u) == -1.0                      # degenerate


def _bary_ok(tri, w, orig):
    """output corners == weight-combination of original corners."""
    recon = w @ orig
    np.testing.assert_allclose(np.asarray(tri), np.asarray(recon), atol=1e-5)


def test_clip_triangle_cases():
    o = np.array([[0.0, 0.0, 5.0], [1.0, 0.0, 5.0], [0.0, 1.0, 5.0]],
                 np.float32)
    tris, w, valid = pk.clip_triangle_to_near_plane(o[0], o[1], o[2])
    assert bool(valid[0]) and not bool(valid[1])
    np.testing.assert_allclose(np.asarray(tris[0]), o)

    # all behind -> culled
    b = o.copy()
    b[:, 2] = -1.0
    _, _, valid = pk.clip_triangle_to_near_plane(b[0], b[1], b[2])
    assert not bool(valid[0]) and not bool(valid[1])

    # one in front -> single clipped triangle on the near plane
    m = o.copy()
    m[1, 2] = -2.0
    m[2, 2] = -2.0
    tris, w, valid = pk.clip_triangle_to_near_plane(m[0], m[1], m[2])
    assert bool(valid[0]) and not bool(valid[1])
    t0 = np.asarray(tris[0])
    np.testing.assert_allclose(t0[1:, 2], NEAR_PLANE, atol=1e-5)
    _bary_ok(tris[0], w[0], m)

    # two in front -> quad split into two triangles
    m2 = o.copy()
    m2[0, 2] = -2.0
    tris, w, valid = pk.clip_triangle_to_near_plane(m2[0], m2[1], m2[2])
    assert bool(valid[0]) and bool(valid[1])
    _bary_ok(tris[0], w[0], m2)
    _bary_ok(tris[1], w[1], m2)
    # clipped corners sit on the near plane
    assert abs(float(tris[0][1, 2]) - NEAR_PLANE) < 1e-5
    assert abs(float(tris[1][0, 2]) - NEAR_PLANE) < 1e-5
    assert abs(float(tris[1][1, 2]) - NEAR_PLANE) < 1e-5


def test_clip_edge():
    (a, b), vis = pk.clip_edge_to_near_plane([0, 0, 5.0], [0, 0, -5.0])
    assert bool(vis)
    np.testing.assert_allclose(float(np.asarray(b)[2]), NEAR_PLANE, atol=1e-6)
    _, vis = pk.clip_edge_to_near_plane([0, 0, -5.0], [0, 0, -1.0])
    assert not bool(vis)


def test_mat4():
    m = pk.mat4_from_position_rotation([1.0, 2.0, 3.0], [0.0, 0.0, 90.0])
    p = pk.mat4_transform_point(m, [1.0, 0.0, 0.0])
    # rotate (1,0,0) by +90deg about z -> (0,1,0), then translate
    np.testing.assert_allclose(np.asarray(p), [1.0, 3.0, 3.0], atol=1e-5)
    ident = pk.mat4_mul(pk.mat4_identity(), pk.mat4_identity())
    np.testing.assert_allclose(np.asarray(ident), np.eye(4))
    # ZYX order: rotation about x then y then z composes as Rz @ Ry @ Rx
    rx, ry, rz = [np.asarray(pk.mat4_rotation(v)) for v in
                  ([30.0, 0, 0], [0, 40.0, 0], [0, 0, 50.0])]
    both = np.asarray(pk.mat4_rotation([30.0, 40.0, 50.0]))
    np.testing.assert_allclose(both, rz @ ry @ rx, atol=1e-5)
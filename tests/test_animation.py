"""Rigged-model animation: euler rotation, bone chains, sampling, viz."""

import numpy as np
import jax.numpy as jnp

from bonnie32_tpu.models import animation as an


def make_arm():
    """3-bone chain: upper arm (root) -> forearm -> hand."""
    return [
        an.RigBone(name="upper", parent=None, local_position=(0, 10, 0),
                   local_rotation=(0, 0, 0), length=30.0),
        an.RigBone(name="fore", parent=0, local_position=(0, 30, 0),
                   local_rotation=(0, 0, 45.0), length=20.0),
        an.RigBone(name="hand", parent=1, local_position=(0, 20, 0),
                   local_rotation=(30.0, 0, 0), length=8.0),
    ]


def test_rotate_by_euler_roundtrip():
    rng = np.random.default_rng(0)
    v = rng.standard_normal((16, 3)).astype(np.float32)
    for rot in [(0, 0, 0), (35, 0, 0), (0, 0, -70), (25, 0, 40)]:
        r = jnp.asarray(rot, jnp.float32)
        out = an.rotate_by_euler(v, jnp.broadcast_to(r, (16, 3)))
        back = an.inverse_rotate_by_euler(out, jnp.broadcast_to(r, (16, 3)))
        np.testing.assert_allclose(np.asarray(back), v, atol=1e-5)
        # length preserved
        np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1),
                                   np.linalg.norm(v, axis=-1), rtol=1e-5)
    # y rotation ignored (state.rs:31 early-out checks x/z only)
    out = an.rotate_by_euler(v, jnp.broadcast_to(
        jnp.asarray([0.0, 90.0, 0.0], jnp.float32), (16, 3)))
    np.testing.assert_allclose(np.asarray(out), v, atol=1e-6)


def test_bone_world_transform_chain():
    bones = make_arm()
    pos, rot = an.bone_world_transform(bones, 0)
    np.testing.assert_allclose(pos, [0, 10, 0], atol=1e-5)
    pos1, rot1 = an.bone_world_transform(bones, 1)
    np.testing.assert_allclose(pos1, [0, 40, 0], atol=1e-5)  # parent rot=0
    np.testing.assert_allclose(rot1, [0, 0, 45.0], atol=1e-5)
    # hand offset (0,20,0) rotated by accumulated z=45: y -> (sin, cos)*20
    pos2, rot2 = an.bone_world_transform(bones, 2)
    s = np.sin(np.radians(45.0)) * 20
    c = np.cos(np.radians(45.0)) * 20
    np.testing.assert_allclose(pos2, [s, 40 + c, 0], atol=1e-4)
    np.testing.assert_allclose(rot2, [30.0, 0, 45.0], atol=1e-5)


def test_pose_bones_matches_scalar():
    bones = make_arm()
    parent, lp, lr, ln = an.bones_to_arrays(bones)
    wp, wr = an.pose_bones(parent, lp, lr)
    for i in range(3):
        gp, gr = an.bone_world_transform(bones, i)
        np.testing.assert_allclose(np.asarray(wp[i]), gp, atol=1e-4)
        np.testing.assert_allclose(np.asarray(wr[i]), gr, atol=1e-4)
    # tips too
    tips = an.bone_tips(wp, wr, ln)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(tips[i]),
                                   an.bone_tip_position(bones, i), atol=1e-3)


def test_pose_offsets():
    bones = make_arm()
    pose = [an.BoneTransform(), an.BoneTransform(rotation=(0, 0, 45.0)),
            an.BoneTransform()]
    _, rot = an.bone_world_transform(bones, 2, pose)
    np.testing.assert_allclose(rot, [30.0, 0, 90.0], atol=1e-5)
    parent, lp, lr, ln = an.bones_to_arrays(bones)
    pr = jnp.asarray([[0, 0, 0], [0, 0, 45.0], [0, 0, 0]], jnp.float32)
    _, wr = an.pose_bones(parent, lp, lr, pose_rot=pr)
    np.testing.assert_allclose(np.asarray(wr[2]), [30.0, 0, 90.0], atol=1e-4)


def test_animation_keyframes_and_sampling():
    anim = an.Animation(name="walk", fps=10, looping=True)
    kf0 = an.Keyframe.new(0, 2)
    kf10 = an.Keyframe.new(10, 2)
    kf10.transforms[0] = an.BoneTransform(position=(10.0, 0, 0),
                                          rotation=(0, 0, 90.0))
    anim.set_keyframe(kf10)
    anim.set_keyframe(kf0)          # out-of-order insert -> sorted
    assert [k.frame for k in anim.keyframes] == [0, 10]
    assert anim.last_frame() == 10
    assert anim.duration() == 1.0

    mid = anim.sample(0.5)          # frame 5 -> halfway
    np.testing.assert_allclose(mid[0].position, (5.0, 0, 0))
    np.testing.assert_allclose(mid[0].rotation, (0, 0, 45.0))
    np.testing.assert_allclose(mid[1].position, (0, 0, 0))

    # looping wraps: t=1.25 -> frame 2.5
    wrap = anim.sample(1.25)
    np.testing.assert_allclose(wrap[0].position, (2.5, 0, 0))

    # non-looping clamps at the end
    anim.looping = False
    end = anim.sample(99.0)
    np.testing.assert_allclose(end[0].position, (10.0, 0, 0))

    # replace + remove
    kf10b = an.Keyframe.new(10, 2)
    anim.set_keyframe(kf10b)
    assert len(anim.keyframes) == 2
    anim.remove_keyframe(10)
    assert anim.last_frame() == 0


def test_animation_ron_roundtrip():
    anim = an.Animation(name="idle", fps=24, looping=False)
    kf = an.Keyframe.new(5, 1)
    kf.transforms[0] = an.BoneTransform(position=(1, 2, 3),
                                        rotation=(4, 5, 6))
    anim.set_keyframe(kf)
    d = anim.to_ron()
    back = an.Animation.from_ron(d)
    assert back.name == "idle" and back.fps == 24 and not back.looping
    assert back.keyframes[0].frame == 5
    np.testing.assert_allclose(back.keyframes[0].transforms[0].position,
                               (1, 2, 3))


def test_skeleton_to_triangles():
    bones = make_arm()
    verts, faces = an.skeleton_to_triangles(bones)
    assert len(verts) == 18 and len(faces) == 24   # 6 verts + 8 tris per bone
    assert verts[0]["color"] == an.BONE_COLOR_ROOT
    assert verts[6]["color"] == an.BONE_COLOR_DEFAULT
    # renders through the golden model without error
    from golden import raster_golden as gold
    fb = gold.new_framebuffer(64, 48)
    gset = dict(affine_textures=True, use_zbuffer=True, shading=0,
                backface_cull=True, ambient=1.0, dithering=False,
                xray_mode=False, use_fixed_point=False, ortho=None)
    basis = np.eye(3, dtype=np.float32) * np.float32(1.0)
    basis[0, 0] = -1.0  # simple front view basis
    gold.render_mesh_15(fb, verts, faces, [],
                        dict(position=np.array([0, -30, -200], np.float32),
                             basis=basis), gset, [])
    assert (fb["pixels"][..., 3] == 255).any()


def test_rigged_model():
    from bonnie32_tpu.models.mesh import EditableMesh
    m = an.RiggedModel.from_mesh("hero", EditableMesh.cube(2.0))
    assert m.parts[0].name == "root"
    assert m.animations[0].name == "Action"
    b = an.RigBone(name="spine", length=100.0)
    assert b.display_width() == 20.0     # clamp floor
    b2 = an.RigBone(name="leg", length=2000.0)
    assert b2.display_width() == 200.0   # clamp ceil
    b3 = an.RigBone(name="w", width=55.0)
    assert b3.display_width() == 55.0
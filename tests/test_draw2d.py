"""2D draw utilities vs scalar transcriptions of the Framebuffer methods."""

import numpy as np
import jax.numpy as jnp

from bonnie32_tpu.models import build
from bonnie32_tpu.ops import draw2d
from bonnie32_tpu.types import CameraArrays, FrameBuffers

from golden import raster_golden as gold

W, H = 64, 48


def fresh(color_word=0, depth=5.0):
    return FrameBuffers(color=jnp.full((H, W), color_word, jnp.int32),
                        depth=jnp.full((H, W), depth, jnp.float32))


def unpack(fb):
    w = np.asarray(fb.color)
    return np.stack([(w >> 0) & 0xFF, (w >> 8) & 0xFF,
                     (w >> 16) & 0xFF, (w >> 24) & 0xFF], -1).astype(np.uint8)


def gold_fb(fill=(0, 0, 0, 0)):
    fb = gold.new_framebuffer(W, H)
    fb["pixels"][:] = fill
    return fb


def test_clears():
    fb = draw2d.clear(fresh(), (10, 20, 30))
    pix = unpack(fb)
    assert np.all(pix == (10, 20, 30, 255))
    assert np.all(np.asarray(fb.depth) == np.float32(3.4028235e38))

    fb = draw2d.clear_transparent(fresh(123))
    assert np.all(np.asarray(fb.color) == 0)

    fb = draw2d.clear_gradient(fresh(), (200, 100, 0), (0, 50, 250))
    pix = unpack(fb)
    # top/bottom rows exact; middle rows = truncating lerp (render.rs:60)
    assert np.all(pix[0, :, :3] == (200, 100, 0))
    assert np.all(pix[-1, :, :3] == (0, 50, 250))
    t = 10 / (H - 1)
    want = tuple(int(np.float32(c0) * np.float32(1 - t)
                     + np.float32(c1) * np.float32(t))
                 for c0, c1 in ((200, 0), (100, 50), (0, 250)))
    assert tuple(pix[10, 0, :3]) == want


def test_rects():
    fb = draw2d.draw_filled_rect(fresh(), 10, 5, 20, 15, (255, 0, 0))
    pix = unpack(fb)
    assert np.all(pix[5:16, 10:21, 0] == 255)
    assert pix[4, 10, 0] == 0 and pix[5, 21, 0] == 0

    fb = draw2d.draw_rect(fresh(), 20, 15, 10, 5, (0, 255, 0))  # swapped
    pix = unpack(fb)
    assert np.all(pix[5, 10:21, 1] == 255)
    assert np.all(pix[15, 10:21, 1] == 255)
    assert np.all(pix[5:16, 10, 1] == 255)
    assert pix[8, 12, 1] == 0  # interior untouched

    # alpha fill blends with background (render.rs:646 formula)
    base = draw2d.clear(fresh(), (100, 100, 100))
    fb = draw2d.draw_filled_rect(base, 0, 0, 5, 5, (200, 0, 0), alpha=128)
    pix = unpack(fb)
    want_r = (200 * 128 + 100 * 127) // 255
    want_g = (0 * 128 + 100 * 127) // 255
    assert tuple(pix[2, 2, :3]) == (want_r, want_g, want_g)


def test_circle_matches_golden():
    jfb = draw2d.draw_circle(fresh(), 30, 20, 7, (9, 8, 7))
    pix = unpack(jfb)
    # scalar transcription (render.rs:631)
    mask = np.zeros((H, W), bool)
    for y in range(max(20 - 7, 0), min(20 + 7, H - 1) + 1):
        for x in range(max(30 - 7, 0), min(30 + 7, W - 1) + 1):
            if (x - 30) ** 2 + (y - 20) ** 2 <= 49:
                mask[y, x] = True
    assert np.array_equal(pix[..., 0] == 9, mask)


def test_lines_match_golden():
    segs = [(2, 2, 60, 40), (60, 2, 2, 40), (5, 40, 5, 2), (0, 0, 63, 0),
            (-10, -5, 70, 50)]
    ex = jnp.asarray([[a, c] for a, _, c, _ in segs], jnp.int32)
    ey = jnp.asarray([[b, d] for _, b, _, d in segs], jnp.int32)
    jfb = draw2d.draw_lines(fresh(), ex, ey, (1, 2, 3))
    pix = unpack(jfb)

    gfb = gold_fb()
    for (x0, y0, x1, y1) in segs:
        gold.draw_line(gfb, x0, y0, x1, y1, (1, 2, 3))
    assert np.array_equal(pix, gfb["pixels"])


def test_alpha_lines_sequential_blend():
    segs = [(0, 10, 63, 10), (0, 10, 63, 10)]  # same line twice: double blend
    ex = jnp.asarray([[a, c] for a, _, c, _ in segs], jnp.int32)
    ey = jnp.asarray([[b, d] for _, b, _, d in segs], jnp.int32)
    base = draw2d.clear(fresh(), (0, 0, 0))
    jfb = draw2d.draw_lines_alpha(base, ex, ey, (255, 255, 255), 100)
    pix = unpack(jfb)
    once = (255 * 100 + 0 * 155) // 255
    twice = (255 * 100 + once * 155) // 255
    assert pix[10, 30, 0] == twice  # sequential compose, not single blend


def test_thick_line():
    fb = draw2d.draw_thick_line(fresh(), 10, 24, 54, 24, 5, (50, 60, 70))
    pix = unpack(fb)
    # horizontal band: rows 22..25 inclusive covered at center (+-2.5 around
    # y=24 with +0.5 pixel centers)
    assert np.all(pix[22:26, 30, 0] == 50)
    assert pix[20, 30, 0] == 0 and pix[28, 30, 0] == 0
    # thickness 1 falls back to Bresenham
    fb1 = draw2d.draw_thick_line(fresh(), 10, 24, 54, 24, 1, (50, 60, 70))
    assert np.all(unpack(fb1)[24, 10:55, 0] == 50)


def _camera():
    basis = np.asarray(build.camera_basis(0.35, 0.6), np.float32)
    return CameraArrays(position=jnp.asarray([-1.8, -1.5, -3.2], jnp.float32),
                        basis=jnp.asarray(basis))


def test_floor_grid_draws():
    # downward-looking camera (positive pitch looks up in this convention)
    basis = np.asarray(build.camera_basis(-0.5, 0.3), np.float32)
    cam = CameraArrays(position=jnp.asarray([0.0, -4.0, -6.0], jnp.float32),
                       basis=jnp.asarray(basis))
    fb = draw2d.draw_floor_grid(fresh(), cam, y=0.0, spacing=1.0, extent=4.0)
    pix = unpack(fb)
    grid_px = np.all(pix[..., :3] == (60, 60, 70), axis=-1).sum()
    zaxis_px = np.all(pix[..., :3] == (60, 60, 140), axis=-1).sum()
    xaxis_px = np.all(pix[..., :3] == (140, 60, 60), axis=-1).sum()
    assert grid_px > 100 and zaxis_px > 5 and xaxis_px > 5


def test_3d_lines_clipped_vs_golden():
    """Segments fully in front: matches world_to_screen + draw_line."""
    cam = _camera()
    p0 = np.array([[-2.0, 0.0, 2.0], [1.0, -1.0, 3.0]], np.float32)
    p1 = np.array([[2.0, 0.0, 2.0], [1.0, 1.0, 5.0]], np.float32)
    fb = draw2d.draw_3d_lines_clipped(fresh(), p0, p1, cam, (7, 7, 7))
    pix = unpack(fb)

    gfb = gold_fb()
    campos = np.asarray(cam.position)
    basis = np.asarray(cam.basis)
    for a, b in zip(p0, p1):
        pts = []
        for p in (a, b):
            rel = p - campos
            c = np.array([rel @ basis[0], rel @ basis[1], rel @ basis[2]],
                         np.float32)
            vs = min(W, H) / 2.0 * 0.75
            denom = c[2] + 5.0
            sx = (c[0] * 4.0 / denom) * vs + W / 2.0
            sy = (c[1] * 4.0 / denom) * vs + H / 2.0
            pts.append((int(sx), int(sy)))
        gold.draw_line(gfb, pts[0][0], pts[0][1], pts[1][0], pts[1][1],
                       (7, 7, 7))
    assert np.array_equal(pix, gfb["pixels"])


def test_create_test_cube_renders():
    verts, faces = draw2d.create_test_cube()
    assert len(verts) == 24 and len(faces) == 12
    assert faces[0]["tex_id"] == 0

def test_3d_alpha_lines_depth_bias():
    from bonnie32_tpu.ops.draw2d import draw_lines_3d_alpha
    # geometry at depth 1.0 in harmonic mode
    fb = FrameBuffers(color=jnp.zeros((H, W), jnp.int32),
                      depth=jnp.full((H, W), 1.0, jnp.float32))
    ex = jnp.asarray([[5, 50]], jnp.int32)
    ey = jnp.asarray([[10, 10]], jnp.int32)
    # line exactly at z=1.0: bias 0.995 pulls it in front -> draws
    ez = jnp.asarray([[1.0, 1.0]], jnp.float32)
    out = draw_lines_3d_alpha(fb, ex, ey, ez, (255, 255, 255), 128)
    pix = unpack(out)
    assert pix[10, 20, 0] == 128  # (255*128 + 0*127)//255
    # depth unchanged (no z write)
    assert float(out.depth[10, 20]) == 1.0
    # line behind geometry doesn't draw
    ez_far = jnp.asarray([[5.0, 5.0]], jnp.float32)
    out2 = draw_lines_3d_alpha(fb, ex, ey, ez_far, (255, 255, 255), 128)
    assert unpack(out2)[10, 20, 0] == 0


def test_wireframe_cylinder():
    from bonnie32_tpu.ops.draw2d import draw_wireframe_cylinder
    cam = _camera()
    fb = FrameBuffers(color=jnp.zeros((H, W), jnp.int32),
                      depth=jnp.full((H, W), 3.4e38, jnp.float32))
    out = draw_wireframe_cylinder(fb, cam, (0.0, -1.0, 0.0), 0.8, 2.0,
                                  segments=12, rgb=(80, 255, 120))
    pix = unpack(out)
    lit = np.all(pix[..., :3] == (80, 255, 120), axis=-1)
    assert lit.sum() > 40                       # rings + verticals visible
    assert float(out.depth.max()) == np.float32(3.4e38)  # no depth writes
    # occluded by near geometry: nothing drawn
    fb2 = FrameBuffers(color=jnp.zeros((H, W), jnp.int32),
                       depth=jnp.zeros((H, W), jnp.float32))
    out2 = draw_wireframe_cylinder(fb2, cam, (0.0, -1.0, 0.0), 0.8, 2.0)
    assert int(out2.color.sum()) == 0


def test_scanline_triangle_matches_scalar():
    """draw_filled_triangle_scanline vs a literal scalar transcription of
    draw_filled_triangle_3d (viewport_3d.rs:6295-6356)."""
    rng = np.random.default_rng(7)

    def scalar_fill(pix, p0, p1, p2, rgb):
        pts = sorted([p0, p1, p2], key=lambda p: p[1])
        (x0, y0), (x1, y1), (x2, y2) = pts
        if y2 == y0:
            return
        total = np.float32(y2 - y0)
        for y in range(max(y0, 0), min(y2, H - 1) + 1):
            second = y > y1 or y1 == y0
            seg = np.float32(y2 - y1) if second else np.float32(y1 - y0)
            if seg == 0.0:
                continue
            alpha = np.float32(y - y0) / total
            beta = (np.float32(y - y1) / seg if second
                    else np.float32(y - y0) / seg)
            ax = np.float32(x0) + np.float32(x2 - x0) * alpha
            bx = (np.float32(x1) + np.float32(x2 - x1) * beta if second
                  else np.float32(x0) + np.float32(x1 - x0) * beta)
            if ax > bx:
                ax, bx = bx, ax
            xs = max(int(ax), 0)
            xe = min(int(bx), W - 1)
            for x in range(xs, xe + 1):
                pix[y, x] = rgb

    for _ in range(12):
        p = [(int(rng.integers(-10, W + 10)), int(rng.integers(-10, H + 10)))
             for _ in range(3)]
        fb = fresh()
        out = draw2d.draw_filled_triangle_scanline(fb, p[0], p[1], p[2],
                                                   (210, 90, 40))
        got = unpack(out)[..., :3]
        want = np.zeros((H, W, 3), np.int32)
        scalar_fill(want, p[0], p[1], p[2], (210, 90, 40))
        assert (got == want).all(), f"scanline mismatch for {p}"

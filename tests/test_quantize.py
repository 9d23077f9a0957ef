"""Color quantizer parity vs the scalar golden transcription of
modeler/quantize.rs, plus behavioral tests ported from its unit tests."""

import numpy as np

from bonnie32_tpu.models import quantize as q

from golden import quantize_golden as gold


def random_image(w, h, ncolors, seed, alpha_holes=True):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    idx = rng.integers(0, ncolors, size=(h, w))
    img = np.zeros((h, w, 4), np.uint8)
    img[..., :3] = pal[idx]
    img[..., 3] = 255
    if alpha_holes:
        holes = rng.random((h, w)) < 0.1
        img[holes, 3] = 0
    return img


def check_parity(img, depth, opts, gopts, lab_tol=0):
    h, w = img.shape[:2]
    res = q.quantize_image(img, w, h, depth=depth, opts=opts)
    gidx, gclut = gold.quantize_image(img, w, h, q.depth_colors(depth), gopts)
    if lab_tol == 0:
        assert res.clut.colors == gclut, "palette mismatch"
        np.testing.assert_array_equal(res.texture.indices,
                                      np.asarray(gidx, np.uint8))
    else:
        # LAB float conversions may differ by 1 ulp between the scalar f32
        # transcription and vectorized numpy; allow tiny channel slack.
        for a, b in zip(res.clut.colors, gclut):
            for sh in (10, 5, 0):
                assert abs(((a >> sh) & 31) - ((b >> sh) & 31)) <= lab_tol
        mism = np.mean(np.asarray(res.texture.indices)
                       != np.asarray(gidx, np.uint8))
        assert mism < 0.02, f"index mismatch {mism:.2%}"
    return res


def test_parity_standard_bpp8():
    img = random_image(24, 16, 600, seed=0)
    check_parity(img, 1, q.QuantizeOptions(), gold.default_opts())


def test_parity_standard_bpp4():
    img = random_image(16, 16, 200, seed=1)
    check_parity(img, 0, q.QuantizeOptions(), gold.default_opts())


def test_parity_preserve_detail():
    img = random_image(20, 20, 300, seed=2)
    check_parity(img, 0, q.QuantizeOptions(mode=q.MODE_PRESERVE_DETAIL),
                 gold.default_opts(mode="preserve_detail"))


def test_parity_smooth():
    img = random_image(20, 20, 300, seed=3)
    check_parity(img, 0, q.QuantizeOptions(mode=q.MODE_SMOOTH),
                 gold.default_opts(mode="smooth"))


def test_parity_options():
    img = random_image(20, 20, 400, seed=4)
    opts = q.QuantizeOptions(perceptual_weight=0.7, saturation_bias=0.5,
                             pre_quantize=1, min_bucket_fraction=0.01)
    gopts = gold.default_opts(perceptual_weight=0.7, saturation_bias=0.5,
                              pre_quantize=1, min_bucket_fraction=0.01)
    check_parity(img, 1, opts, gopts)


def test_parity_lab():
    img = random_image(16, 12, 250, seed=5)
    check_parity(img, 0, q.QuantizeOptions(use_lab=True),
                 gold.default_opts(use_lab=True), lab_tol=1)


def test_quantize_simple():
    """quantize.rs:769 — all opaque pixels get index > 0."""
    rgba = np.array([[255, 0, 0, 255], [0, 255, 0, 255],
                     [0, 0, 255, 255], [255, 255, 0, 255]], np.uint8)
    res = q.quantize_image(rgba, 2, 2, depth=0, name="Test")
    assert res.texture.width == 2 and res.texture.height == 2
    assert res.texture.indices.shape == (4,)
    assert (res.texture.indices > 0).all()
    # colors are distinct enough that each should survive
    looked = [res.clut.colors[i] for i in res.texture.indices]
    assert len(set(looked)) == 4


def test_quantize_transparency():
    """quantize.rs:789 — transparent pixel -> index 0, clut[0] transparent."""
    rgba = np.array([[255, 0, 0, 255], [0, 255, 0, 255],
                     [0, 0, 255, 255], [0, 0, 0, 0]], np.uint8)
    res = q.quantize_image(rgba, 2, 2, depth=0)
    assert res.texture.indices[3] == 0
    assert res.clut.colors[0] == q.TRANSPARENT15


def test_lab_roundtrip():
    """quantize.rs:804 — LAB conversion roundtrips within 2/255."""
    cols = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                     [128, 128, 128], [255, 255, 255], [0, 0, 0]], np.uint8)
    back = q.lab_to_rgb888(q.rgb888_to_lab(cols))
    assert np.abs(cols.astype(int) - back.astype(int)).max() <= 2


def test_few_colors_short_circuit():
    """<= max unique colors: palette is exactly the sorted unique set."""
    rgba = np.zeros((8, 8, 4), np.uint8)
    rgba[..., 3] = 255
    rgba[:4, :, 0] = 255          # red half
    rgba[4:, :, 2] = 255          # blue half
    res = q.quantize_image(rgba, 8, 8, depth=0)
    used = sorted(set(res.clut.colors[i] for i in res.texture.indices))
    assert used == [0x001F, 0x7C00]


def test_optimal_depth_and_unique_count():
    img = random_image(10, 10, 8, seed=6, alpha_holes=False)
    n = q.count_unique_colors(img)
    assert 1 <= n <= 8
    assert q.optimal_clut_depth(n) == 0
    assert q.optimal_clut_depth(15) == 0
    assert q.optimal_clut_depth(16) == 1
    assert q.count_unique_colors(np.zeros((4, 4), np.uint8)) == 0

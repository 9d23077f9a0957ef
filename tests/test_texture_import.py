"""Texture import pipeline (texture/import.rs): resize modes, atlas
cells, crop selection, quantized preview, finalize to UserTexture."""

import numpy as np

from bonnie32_tpu.models.user_texture import UserTexture
from bonnie32_tpu.texture import (ResizeMode, TextureImportState,
                                  atlas_dimensions, extract_atlas_cell,
                                  extract_selection, resize_to_target)
from bonnie32_tpu.ops import color as color_ops


def color15_to_rgb888(c):
    return (int(color_ops.r8(c)), int(color_ops.g8(c)), int(color_ops.b8(c)))


def _gradient(h, w):
    rgba = np.zeros((h, w, 4), np.uint8)
    rgba[..., 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    rgba[..., 1] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
    rgba[..., 3] = 255
    return rgba


def test_resize_stretch_and_fit_pad():
    src = _gradient(20, 40)
    out = resize_to_target(src, 32, ResizeMode.STRETCH)
    assert out.shape == (32, 32, 4) and out[..., 3].min() == 255

    padded = resize_to_target(src, 32, ResizeMode.FIT_PAD)
    assert padded.shape == (32, 32, 4)
    # 2:1 source fit into a square: top/bottom bands transparent
    assert padded[0, :, 3].max() == 0 and padded[-1, :, 3].max() == 0
    assert padded[16, :, 3].min() == 255


def test_resize_crop_center_covers():
    src = _gradient(20, 40)
    out = resize_to_target(src, 32, ResizeMode.CROP_CENTER)
    assert out.shape == (32, 32, 4)
    assert out[..., 3].min() == 255          # no padding anywhere


def test_atlas_cells_and_bounds():
    src = _gradient(64, 96)
    assert atlas_dimensions(96, 64, 32) == (3, 2)
    cell = extract_atlas_cell(src, 32, 2, 1)
    np.testing.assert_array_equal(cell, src[32:64, 64:96])
    assert extract_atlas_cell(src, 32, 3, 0) is None   # past the edge


def test_extract_selection():
    src = _gradient(16, 16)
    sel = extract_selection(src, (4, 2, 8, 6))
    np.testing.assert_array_equal(sel, src[2:8, 4:12])


def test_load_image_auto_depth():
    st = TextureImportState()
    # two-color image → Bpp4
    img = np.zeros((8, 8, 4), np.uint8)
    img[..., 3] = 255
    img[:4, :, 0] = 255
    st.load_image(img)
    assert st.active and st.depth == 0 and st.unique_colors == 2
    # a rich gradient → Bpp8
    st.load_image(_gradient(32, 32))
    assert st.depth == 1 and st.unique_colors > 15


def test_preview_and_finalize_round_trip():
    st = TextureImportState()
    img = np.zeros((16, 16, 4), np.uint8)
    img[..., 3] = 255
    img[:8, :] = (255, 0, 0, 255)
    img[8:, :] = (0, 0, 255, 255)
    st.load_image(img)
    st.target_size = 16
    st.generate_preview()
    assert not st.preview_dirty
    assert st.preview_indices.shape == (256,)

    tex = st.finalize(tex_id=7, name="imported")
    assert isinstance(tex, UserTexture)
    assert tex.width == tex.height == 16 and tex.id == 7
    t15 = tex.to_texture15()
    top = color15_to_rgb888(int(t15[2, 8]))
    bot = color15_to_rgb888(int(t15[13, 8]))
    assert top[0] > 200 and top[2] < 50       # red half stayed red
    assert bot[2] > 200 and bot[0] < 50       # blue half stayed blue


def test_atlas_mode_previews_selected_cell():
    st = TextureImportState()
    img = np.zeros((64, 64, 4), np.uint8)
    img[..., 3] = 255
    img[:32, :32] = (255, 0, 0, 255)       # cell (0,0) red
    img[:32, 32:] = (0, 255, 0, 255)       # cell (1,0) green
    img[32:, :] = (0, 0, 255, 255)
    st.load_image(img)
    st.atlas_mode = True
    st.atlas_cell_size = 32
    st.atlas_selected = (1, 0)
    st.target_size = 32
    assert st.source_for_preview().shape == (32, 32, 4)
    tex = st.finalize(1, "cell")
    rgb = color15_to_rgb888(int(tex.to_texture15()[16, 16]))
    assert rgb[1] > 200 and rgb[0] < 50       # the green cell


def test_crop_selection_feeds_preview():
    st = TextureImportState()
    st.load_image(_gradient(32, 32))
    st.crop_selection = (0, 0, 8, 8)
    assert st.source_for_preview().shape == (8, 8, 4)
    st.reset()
    assert not st.active and st.source_rgba is None

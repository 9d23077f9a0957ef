"""Asset browser (modeler/model_browser.rs): discovery with namespaced
keys, selection state, orbit preview camera, and a rendered preview of a
shipped sample asset."""

import numpy as np

from bonnie32_tpu.editor.model_browser import (AssetBrowser, AssetCategory,
                                               AssetInfo,
                                               discover_assets_from_dir)
from bonnie32_tpu.models import asset as A
from bonnie32_tpu.models import user_texture as UT

SAMPLES = "/root/reference/assets/samples"


def test_discovery_and_keys():
    infos = discover_assets_from_dir(f"{SAMPLES}/assets",
                                     AssetCategory.SAMPLE)
    assert len(infos) >= 1
    assert all(i.category == AssetCategory.SAMPLE for i in infos)
    assert infos[0].library_key.startswith("sample:")
    assert discover_assets_from_dir("/nonexistent",
                                    AssetCategory.USER) == []


def test_browser_selection_state():
    infos = discover_assets_from_dir(f"{SAMPLES}/assets",
                                     AssetCategory.SAMPLE)
    b = AssetBrowser()
    b.open_with_assets(infos, [])
    assert b.open and b.selected() is None
    info = b.select(AssetCategory.SAMPLE, 0)
    assert info is not None and b.selected() == info
    assert b.select(AssetCategory.USER, 0) is None   # empty section
    b.close()
    assert not b.open


def test_orbit_controls():
    b = AssetBrowser()
    y0, p0, d0 = b.orbit_yaw, b.orbit_pitch, b.orbit_distance
    assert (y0, p0, d0) == (0.5, 0.3, 4096.0)   # reference defaults
    b.orbit(10, 300)
    assert b.orbit_pitch == 1.4                 # clamped
    b.zoom(0.01)
    assert b.orbit_distance == 256.0            # clamped

    cam = b.preview_camera()
    # camera sits orbit_distance away from the center
    center = np.asarray(b.orbit_center, np.float32)
    d = np.linalg.norm(np.asarray(cam.position) - center)
    np.testing.assert_allclose(d, b.orbit_distance, rtol=1e-5)


def test_preview_renders_sample_asset():
    infos = discover_assets_from_dir(f"{SAMPLES}/assets",
                                     AssetCategory.SAMPLE)
    asset = A.load_asset(infos[0].path)
    utex = UT.TextureLibrary([f"{SAMPLES}/textures"])
    b = AssetBrowser()
    fb = b.render_preview(asset, user_textures=utex, height=120, width=160)
    w = np.asarray(fb.color)
    assert (w != w.reshape(-1)[0]).sum() > 100, "asset preview is empty"

"""Ortho-plane visualization: plane order, panel layout, color coding."""

import numpy as np

from ffn_tpu.utils import ortho_plane_visualization as opv


def _vol():
    rng = np.random.RandomState(0)
    vol = rng.randn(7, 9, 11)
    vol[2, 3, 4] = np.nan
    return vol


def test_cut_planes_shapes_and_crosshair():
    vol = _vol()
    planes = opv.cut_ortho_planes(vol, center=(3, 4, 5), cross_hair=True)
    assert planes[0].shape == (9, 11)   # yx
    assert planes[1].shape == (7, 11)   # zx
    assert planes[2].shape == (7, 9)    # zy
    raw = vol[3]
    assert np.isclose(planes[0][0, 0], raw[0, 0])
    assert np.isclose(planes[0][4, 0], raw[4, 0] * 0.5)      # row dimmed
    assert np.isclose(planes[0][4, 5], raw[4, 5] * 0.25)     # intersection
    # Without cross_hair the planes are views of the raw data.
    plain = opv.cut_ortho_planes(vol, center=(3, 4, 5))
    np.testing.assert_array_equal(plain[1], vol[:, 4])


def test_concat_panel_layout():
    vol = _vol()
    panel = opv.concat_ortho_planes(opv.cut_ortho_planes(vol))
    assert panel.shape == (9 + 1 + 7, 11 + 1 + 7)
    np.testing.assert_allclose(panel[:9, :11], vol[3], equal_nan=True)
    np.testing.assert_allclose(panel[10:, :11], vol[:, 4], equal_nan=True)
    np.testing.assert_allclose(panel[:9, 12:], vol[:, :, 5].T,
                               equal_nan=True)
    # Gutters stay zero.
    assert (panel[9, :] == 0).all() and (panel[:, 11] == 0).all()


def test_normalize_image_color_coding():
    img = np.array([[-2.0, 0.0, np.nan], [1.0, 4.0, -1.0]])
    for act in (None, "tanh", "sig"):
        rgb = opv.normalize_image(img.copy(), act)
        assert rgb.shape == (2, 3, 3)
        assert rgb[0, 2, 1] == 1.0 and rgb[0, 0, 1] == 0.0  # green == NaN
        # red encodes negatives (tanh keeps the sign — reference quirk).
        assert abs(rgb[0, 0, 0]) > 0.0
        assert rgb[1, 1, 2] > 0.0                           # blue: positive
    # None-mode extrema map to exactly 1.
    rgb = opv.normalize_image(img.copy(), None)
    assert np.isclose(rgb[0, 0, 0], 1.0) and np.isclose(rgb[1, 1, 2], 1.0)
    # Input is not mutated (NaN preserved for the caller).
    assert np.isnan(img[0, 2])

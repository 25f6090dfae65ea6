import numpy as np

from ffn_tpu.training import augmentation
from ffn_tpu.training import section_augment
from ffn_tpu.utils import ortho_plane_visualization as viz


def test_permute_and_reflect_consistent_across_arrays():
    rng = np.random.RandomState(0)
    t = augmentation.PermuteAndReflect(rank=5, permutable_axes=[2, 3],
                                       reflectable_axes=[1, 2, 3],
                                       rng=np.random.RandomState(1))
    a = rng.randn(1, 4, 5, 6, 1)
    b = a * 2
    out_a, out_b = t(a, b)
    np.testing.assert_allclose(out_b, out_a * 2)
    assert sorted(out_a.shape) == sorted(a.shape)


def test_permute_axes_restricted():
    # Only axes 2, 3 may be exchanged: axis 1 extent stays put.
    t = augmentation.PermuteAndReflect(rank=5, permutable_axes=[2, 3],
                                       reflectable_axes=[],
                                       rng=np.random.RandomState(0))
    a = np.zeros((1, 4, 5, 6, 1))
    for _ in range(10):
        out = t(a)
        assert out.shape[1] == 4
        assert sorted(out.shape[2:4]) == [5, 6]


def test_rotation_identity():
    vol = np.random.RandomState(0).rand(9, 9, 9)
    out = augmentation.apply_rotation(vol, np.eye(3))
    np.testing.assert_allclose(out, vol, atol=1e-6)


def test_rotation_90deg():
    vol = np.zeros((9, 9, 9))
    vol[4, 4, 6] = 1.0  # +x of center
    # Rotation by 90 degrees around z: x -> y (zyx axis order).
    mat = np.array([[1.0, 0, 0], [0, 0, 1], [0, -1, 0]])
    out = augmentation.apply_rotation(vol, mat, order=0)
    assert out[4, 6, 4] == 1.0


def test_misalignment_slip_and_translate():
    rng = np.random.RandomState(0)
    patch = rng.rand(1, 8, 16, 16, 1)
    labels = patch.copy()
    mask = np.ones_like(patch)
    p, l, m, z = section_augment.misalignment(
        patch, labels, mask, (6, 12, 12), (6, 12, 12), (6, 12, 12),
        max_offset=3, slip_ratio=0.5, rng=np.random.RandomState(3))
    assert p.shape == (1, 6, 12, 12, 1)
    # Same transform applied to all arrays.
    np.testing.assert_allclose(p, l)
    assert z >= -1


def test_missing_section():
    patch = np.full((1, 10, 8, 8, 1), 100.0)
    out, z_indices = section_augment.missing_section(
        patch, max_indices_ratio=0.3, fill_value=7.0,
        full_prob=1.0, rng=np.random.RandomState(0))
    assert (out[:, z_indices] == 7.0).all()
    untouched = [z for z in range(10) if z not in np.atleast_1d(z_indices)]
    assert (out[:, untouched] == 100.0).all()


def test_out_of_focus_preserves_mean():
    rng = np.random.RandomState(0)
    patch = rng.rand(1, 6, 32, 32, 1) * 100
    out, z_idx = section_augment.out_of_focus_section(
        patch, max_indices_ratio=0.5, max_filter_stdev=3.0,
        full_prob=1.0, rng=np.random.RandomState(5))
    for z in np.atleast_1d(z_idx):
        assert abs(out[0, z].mean() - patch[0, z].mean()) < 5
        assert out[0, z].std() <= patch[0, z].std() + 1e-6


def test_grayscale_perturb_range():
    patch = np.random.RandomState(0).randint(
        0, 255, (1, 4, 8, 8, 1)).astype(np.float32)
    out, applied = section_augment.grayscale_perturb(
        patch, 0.5, 0.5, rng=np.random.RandomState(1))
    assert applied == 1
    assert out.min() >= 0 and out.max() <= 255


def test_elastic_warp_shape_and_change():
    rng = np.random.RandomState(0)
    patch = rng.rand(2, 32, 32, 1)
    out = section_augment.elastic_warp_2d(
        patch, 0.2, 0.05, rng=np.random.RandomState(2))
    assert out.shape == patch.shape
    assert not np.allclose(out, patch)


def test_affine_transform_identity_limits():
    patch = np.random.RandomState(0).rand(1, 16, 16, 1)
    out = section_augment.affine_transform_2d(
        patch, 0.0, 0.0, 0.0, rng=np.random.RandomState(0))
    np.testing.assert_allclose(out, patch, atol=1e-5)


def test_ortho_planes():
    vol = np.random.RandomState(0).rand(8, 10, 12)
    planes = viz.cut_ortho_planes(vol)
    assert planes[0].shape == (10, 12)
    assert planes[1].shape == (8, 12)
    assert planes[2].shape == (8, 10)
    panel = viz.concat_ortho_planes(planes)
    assert panel.shape == (10 + 1 + 8, 12 + 1 + 8)


def test_normalize_image_nan_channel():
    img = np.array([[1.0, -1.0], [np.nan, 0.0]])
    rgb = viz.normalize_image(img)
    assert rgb.shape == (2, 2, 3)
    assert rgb[1, 0, 1] == 1.0  # nan -> green
    assert rgb[0, 0, 2] > 0     # positive -> blue
    assert rgb[0, 1, 0] > 0     # negative -> red


def test_tracker_slice_images():
    from scipy.special import logit as _logit
    from ffn_tpu.training import tracker as tracker_lib
    tr = tracker_lib.EvalTracker((9, 9, 9), image_summaries=True)
    labels = np.random.RandomState(0).rand(1, 9, 9, 9, 1)
    logits = np.random.RandomState(1).randn(1, 9, 9, 9, 1)
    tr.add_patch(labels, logits, np.ones_like(labels), coord=(1, 2, 3))
    pngs = tr.slice_image_pngs()
    assert set(pngs) == {"final_xy", "final_xz", "final_yz"}
    for tag, images in pngs.items():
        assert len(images) == 1
        coord, png = images[0]
        assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_find_peaks_deterministic():
    """The seeded noise makes peak ordering reproducible run-to-run."""
    from ffn_tpu.ops import peaks as peaks_lib
    dt = np.random.RandomState(5).rand(30, 30, 30).astype(np.float32)
    a = peaks_lib.find_peaks_with_noise(dt, min_distance=3,
                                        threshold_abs=0, threshold_rel=0)
    b = peaks_lib.find_peaks_with_noise(dt, min_distance=3,
                                        threshold_abs=0, threshold_rel=0)
    np.testing.assert_array_equal(a, b)
    assert len(a) > 0

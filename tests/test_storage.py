import os

import numpy as np
import pytest

from ffn_tpu.inference import storage
from ffn_tpu.proto import inference_pb2


def test_quantize_dequantize_roundtrip():
    prob = np.linspace(0.001, 0.999, 100).astype(np.float32)
    q = storage.quantize_probability(prob)
    assert q.dtype == np.uint8
    assert (q > 0).all()
    dq = storage.dequantize_probability(q)
    # The reference quantizes with 254 bins but dequantizes with scale 1/255,
    # so the roundtrip error bound is slightly above one bin width.
    np.testing.assert_allclose(dq, prob, atol=0.0065)


def test_quantize_nan_maps_to_zero_and_back():
    prob = np.array([np.nan, 0.5, 1.0])
    q = storage.quantize_probability(prob)
    assert q[0] == 0
    dq = storage.dequantize_probability(q)
    assert np.isnan(dq[0])
    assert not np.isnan(dq[1:]).any()


def test_quantize_matches_reference_digitize_semantics():
    # Reference: np.digitize(prob, np.linspace(0, 1, 255)); bucket 0 unused.
    prob = np.array([0.0, 1e-9, 0.5, 1.0])
    q = storage.quantize_probability(prob)
    expected = np.digitize(prob, np.linspace(0.0, 1.0, 255)).astype(np.uint8)
    np.testing.assert_array_equal(q, expected)


def test_atomic_file(tmp_path):
    target = tmp_path / "sub" / "file.bin"
    with storage.atomic_file(str(target)) as f:
        f.write(b"hello")
    assert target.read_bytes() == b"hello"
    # Overwrite.
    with storage.atomic_file(str(target)) as f:
        f.write(b"world")
    assert target.read_bytes() == b"world"
    # No temp litter.
    assert sorted(os.listdir(tmp_path / "sub")) == ["file.bin"]


def test_subvolume_path_scheme():
    # corner is zyx; path components are x, y; file name is x_y_z.
    p = storage.subvolume_path("/out", (1, 2, 3), "npz")
    assert p == "/out/3/2/seg-3_2_1.npz"
    lp = storage.legacy_subvolume_path("/out", (1, 2, 3), "npz")
    assert lp == "/out/seg-3_2_1.npz"
    assert storage.get_corner_from_path(p) == (1, 2, 3)


def test_save_and_load_segmentation(tmp_path):
    out_dir = str(tmp_path)
    corner = (0, 0, 0)
    seg = np.zeros((20, 20, 20), dtype=np.int32)
    seg[2:8, 2:8, 2:8] = 1
    seg[12:18, 12:18, 12:18] = 5
    origins = {1: storage.OriginInfo((3, 3, 3), 10, 1.0),
               5: storage.OriginInfo((14, 14, 14), 20, 2.0)}
    storage.save_subvolume(seg, origins,
                           storage.segmentation_path(out_dir, corner))

    loaded, loaded_origins = storage.load_segmentation(
        out_dir, corner, split_cc=True, min_size=0)
    assert loaded.dtype == np.uint64
    # Two disconnected objects -> two distinct ids with matched sizes.
    ids, counts = np.unique(loaded[loaded > 0], return_counts=True)
    assert len(ids) == 2
    assert sorted(counts) == [216, 216]
    assert len(loaded_origins) == 2
    starts = sorted(o.start_zyx for o in loaded_origins.values())
    assert starts == [(3, 3, 3), (14, 14, 14)]


def test_load_segmentation_min_size(tmp_path):
    out_dir = str(tmp_path)
    corner = (0, 0, 0)
    seg = np.zeros((10, 10, 10), dtype=np.int32)
    seg[0:1, 0:1, 0:2] = 1   # 2 voxels (dust)
    seg[5:9, 5:9, 5:9] = 2   # 64 voxels
    storage.save_subvolume(seg, {},
                           storage.segmentation_path(out_dir, corner))
    loaded, _ = storage.load_segmentation(out_dir, corner, min_size=10)
    assert (np.unique(loaded) > 0).sum() == 1


def test_threshold_segmentation(tmp_path):
    out_dir = str(tmp_path)
    corner = (0, 0, 0)
    seg = np.ones((4, 4, 4), dtype=np.int32)
    storage.save_subvolume(seg, {},
                           storage.segmentation_path(out_dir, corner))
    prob = np.full((4, 4, 4), 0.7, dtype=np.float32)
    prob[0] = 0.2
    with storage.atomic_file(
            storage.object_prob_path(out_dir, corner)) as fd:
        np.savez_compressed(fd, qprob=storage.quantize_probability(prob))
    loaded, _ = storage.load_segmentation(out_dir, corner, threshold=0.5,
                                          split_cc=False)
    assert (loaded[0] == 0).all()
    assert (loaded[1:] == 1).all()


def test_coordinate_expression_mask():
    cfg = inference_pb2.MaskConfig()
    cfg.coordinate_expression.expression = "(x > 2) & (y < 3)"
    mask = storage.build_mask([cfg], corner=(0, 0, 0), subvol_size=(4, 4, 4))
    z, y, x = np.mgrid[0:4, 0:4, 0:4]
    np.testing.assert_array_equal(mask, (x > 2) & (y < 3))


def test_coordinate_expression_rejects_evil():
    cfg = inference_pb2.MaskConfig()
    cfg.coordinate_expression.expression = "__import__('os').system('true')"
    with pytest.raises(ValueError):
        storage.build_mask([cfg], corner=(0, 0, 0), subvol_size=(2, 2, 2))


def test_image_mask():
    cfg = inference_pb2.MaskConfig()
    chan = cfg.image.channels.add()
    chan.channel = 0
    chan.min_value = 0.5
    chan.max_value = 2.0
    image = np.zeros((3, 3, 3), dtype=np.float32)
    image[1] = 1.0
    mask = storage.build_mask([cfg], corner=(0, 0, 0), subvol_size=(3, 3, 3),
                              image=image)
    assert mask[1].all()
    assert not mask[0].any() and not mask[2].any()


def test_hdf5_decorated_volume(tmp_path):
    import h5py
    path = str(tmp_path / "vol.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("raw", data=np.arange(27).reshape(3, 3, 3))
    settings = inference_pb2.DecoratedVolume()
    settings.hdf5 = path + ":raw"
    vol = storage.decorated_volume(settings)
    assert vol.shape == (3, 3, 3)
    assert vol[1, 1, 1] == 13

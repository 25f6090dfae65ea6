import numpy as np

from ffn_tpu.input import volume as volume_lib
from ffn_tpu.utils import bounding_box


def make_config(tmp_path, rotation=None, oob=False):
    import h5py
    img = np.random.RandomState(0).randint(
        0, 255, (40, 40, 40)).astype(np.uint8)
    seg = np.zeros((40, 40, 40), np.uint64)
    seg[10:30, 10:30, 10:30] = 3
    with h5py.File(str(tmp_path / "d.h5"), "w") as f:
        f.create_dataset("img", data=img)
        f.create_dataset("seg", data=seg)

    volumes = {
        "em": volume_lib.VolumeConfig(
            paths={"v": f"{tmp_path}/d.h5:img"},
            load_shape=(13, 13, 13), photometric=True),
        "seg": volume_lib.VolumeConfig(
            paths={"v": f"{tmp_path}/d.h5:seg"},
            load_shape=(13, 13, 13)),
    }
    if oob:
        volumes["oob"] = volume_lib.VolumeConfig(
            paths={"v": f"{tmp_path}/d.h5:img"},
            load_shape=(13, 13, 13), oob_mask=True)
    return volume_lib.InputConfig(
        sampling=volume_lib.SamplingConfig(bounding_boxes={
            "v": [bounding_box.BoundingBox(start=(15, 15, 15),
                                           size=(10, 10, 10))]}),
        volumes=volumes,
        augmentation=volume_lib.AugmentationConfig(
            rotation=rotation,
            contrast_factor_range=(0.9, 1.1),
            brightness_factor_range=(-5, 5)))


def test_pipeline_yields_examples(tmp_path):
    config = make_config(tmp_path)
    it = volume_lib.load_and_augment_subvolumes(config)
    for _ in range(3):
        ex = next(it)
        assert set(ex) == {"em", "seg"}
        assert ex["em"].shape == (1, 13, 13, 13, 1)
        assert ex["seg"].shape == (1, 13, 13, 13, 1)
        # Center sampled inside the labeled region -> some label present.
        assert (ex["seg"] > 0).any()


def test_oob_mask(tmp_path):
    config = make_config(tmp_path, oob=True)
    ex = next(volume_lib.load_and_augment_subvolumes(config))
    # Fully in-bounds for these sampling boxes.
    assert (ex["oob"] == 1.0).all()


def test_rotation(tmp_path):
    config = make_config(tmp_path, rotation="3d")
    ex = next(volume_lib.load_and_augment_subvolumes(config))
    assert ex["seg"].dtype == np.uint64
    assert ex["em"].shape == (1, 13, 13, 13, 1)

"""Declarative volumetric input pipeline (the ffn/input equivalent).

Config surface parity with the reference's ffn/input/volume.py dataclasses
(AugmentationConfig :46, SamplingConfig :79, VolumeConfig :94,
InputConfig :129) — but actually runnable: the reference's `_load_data`
raises NotImplementedError for real volumes and references undefined
symbols (volume.py:191-212,400,407; OSS-stripped internal code). This
implementation samples from bounding boxes or coordinate files, reads
h5/numpy volumes, applies permute/reflect + rotation + photometric
augmentations, and yields numpy example dicts.
"""

from __future__ import annotations

import dataclasses
import random
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import numpy as np

from ffn_tpu.training import augmentation as augmentation_lib
from ffn_tpu.training import inputs as inputs_lib
from ffn_tpu.utils import bounding_box as bbox_lib


@dataclasses.dataclass
class AugmentationConfig:
    """How to modify the loaded data. Axes refer to (b, z, y, x, c)."""

    permutable_axes: Sequence[int] = (2, 3)
    reflectable_axes: Sequence[int] = (1, 2, 3)
    # '2d' or '3d' to enable rotation augmentation (int64 segmentation
    # arrays are resampled with nearest-neighbor order).
    rotation: Optional[str] = None
    contrast_factor_range: Optional[tuple] = None
    brightness_factor_range: Optional[tuple] = None
    # 'foreground' | 'background' | None
    apply_adjustment_to: Optional[str] = None


@dataclasses.dataclass
class SamplingConfig:
    """Where to sample example centers from."""

    # volname -> list of BoundingBoxes to sample centers from (XYZ).
    bounding_boxes: Optional[Dict[str, Sequence[bbox_lib.BoundingBox]]] = \
        None
    # Coordinate file pattern (.npz or TFRecord), as produced by
    # build_coordinates.py.
    coordinate_files: Optional[str] = None


@dataclasses.dataclass
class VolumeConfig:
    """A source of volumetric data."""

    # volname -> "path:dataset" (h5) or numpy arrays directly.
    paths: Dict[str, Any]
    # XYZ shape to load, centered on the sampled location.
    load_shape: Sequence[int]
    default_value: Any = None
    # Generate an in-bounds mask instead of loading data.
    oob_mask: bool = False
    # Apply photometric augmentations to this volume.
    photometric: bool = False
    # volname -> path of "old,new" relabel map files (uint64 volumes).
    relabel_maps: Optional[Dict[str, str]] = None

    def open_volumes(self) -> Dict[str, Any]:
        import h5py

        out = {}
        for name, path in self.paths.items():
            if isinstance(path, str):
                file_path, dataset = path.split(":")
                out[name] = h5py.File(file_path, "r")[dataset]
            else:
                out[name] = path
        return out


@dataclasses.dataclass
class InputConfig:
    """An input pipeline: sampling + named volumes + augmentation."""

    sampling: SamplingConfig
    volumes: Dict[str, VolumeConfig]
    augmentation: AugmentationConfig = dataclasses.field(
        default_factory=AugmentationConfig)
    seed: int = 0


def _sample_centers(config: InputConfig) -> Iterator[tuple]:
    """Yields (center_xyz, volname) forever."""
    rng = random.Random(config.seed)
    if config.sampling.coordinate_files:
        yield from inputs_lib.load_patch_coordinates(
            config.sampling.coordinate_files, shuffle=True,
            rng=rng)
    elif config.sampling.bounding_boxes:
        items = [(name, box)
                 for name, boxes in config.sampling.bounding_boxes.items()
                 for box in boxes]
        while True:
            name, box = items[rng.randrange(len(items))]
            center = np.array([rng.randrange(int(s), int(e))
                               for s, e in zip(box.start, box.end)],
                              np.int64)
            yield center, name
    else:
        raise ValueError("SamplingConfig must define bounding_boxes or "
                         "coordinate_files")


def _load_relabel_map(path: str):
    pairs = np.loadtxt(path, delimiter=",", dtype=np.uint64, ndmin=2)
    return pairs[:, 0], pairs[:, 1]


def load_and_augment_subvolumes(config: InputConfig
                                ) -> Iterator[Dict[str, np.ndarray]]:
    """Yields {volume_key: (1, z, y, x, 1) array} example dicts forever."""
    open_vols = {key: vc.open_volumes()
                 for key, vc in config.volumes.items()}
    relabels = {}
    for key, vc in config.volumes.items():
        if vc.relabel_maps:
            relabels[key] = {name: _load_relabel_map(p)
                             for name, p in vc.relabel_maps.items()}

    aug = config.augmentation
    np_rng = np.random.RandomState(config.seed)
    transform = augmentation_lib.PermuteAndReflect(
        rank=5, permutable_axes=list(aug.permutable_axes),
        reflectable_axes=list(aug.reflectable_axes), rng=np_rng)

    for center, volname in _sample_centers(config):
        example = {}
        ok = True
        for key, vc in config.volumes.items():
            if volname not in open_vols[key]:
                ok = False
                break
            volume = open_vols[key][volname]
            load_shape = vc.load_shape
            if vc.oob_mask:
                size = np.array(load_shape[::-1])
                start = np.array(center[::-1]) - size // 2
                shape = np.array(volume.shape[-3:])
                zz, yy, xx = np.mgrid[
                    start[0]:start[0] + size[0],
                    start[1]:start[1] + size[1],
                    start[2]:start[2] + size[2]]
                mask = ((zz >= 0) & (zz < shape[0]) & (yy >= 0)
                        & (yy < shape[1]) & (xx >= 0) & (xx < shape[2]))
                example[key] = mask[np.newaxis, ..., np.newaxis].astype(
                    np.float32)
                continue
            if not inputs_lib.coordinates_in_bounds(center, load_shape,
                                                    volume.shape):
                ok = False
                break
            data = inputs_lib.load_from_numpylike(center, volume,
                                                  load_shape)
            if key in relabels and volname in relabels[key]:
                from ffn_tpu.inference import segmentation as seg_lib
                orig, new = relabels[key][volname]
                data = seg_lib.relabel(data.astype(np.uint64), orig, new)
            example[key] = data[np.newaxis, ..., np.newaxis]
        if not ok:
            continue

        # Shared geometric augmentation across all volumes of the example.
        perm, flips = transform.sample()
        for key in example:
            example[key] = transform.apply(example[key], perm, flips)

        if aug.rotation:
            mat = augmentation_lib.random_rotation_matrix_3d(np_rng)
            for key in example:
                data = example[key][0, ..., 0]
                order = 0 if data.dtype.kind in "ui" else 1
                rotated = augmentation_lib.apply_rotation(
                    data.astype(np.float32) if order else data, mat,
                    order=order)
                example[key] = rotated[np.newaxis, ..., np.newaxis].astype(
                    example[key].dtype)

        # Photometric augmentation on designated volumes.
        for key, vc in config.volumes.items():
            if not vc.photometric or key not in example:
                continue
            data = example[key].astype(np.float32)
            if aug.contrast_factor_range:
                lo, hi = aug.contrast_factor_range
                data = augmentation_lib.random_contrast(data, np_rng, lo,
                                                        hi)
            if aug.brightness_factor_range:
                lo, hi = aug.brightness_factor_range
                data = data + np_rng.uniform(lo, hi)
            example[key] = data
        yield example

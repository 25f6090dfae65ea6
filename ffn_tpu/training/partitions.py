"""Partition computation for class-balanced training coordinate sampling.

Parity with the reference's compute_partitions.py: per-label summed-volume
tables, active-fraction quantization into uint8 partition ids, exclusion
regions/masks. The per-threshold assignment loop is replaced by a single
digitize (the reference's own TODO, compute_partitions.py:191).
"""

from __future__ import annotations

from typing import Optional, Sequence

from absl import logging
import numpy as np

from ffn_tpu.inference import segmentation as segmentation_lib
from ffn_tpu.inference import storage
from ffn_tpu.utils import bounding_box

IGNORE_PARTITION = 255


def summed_volume_table(val: np.ndarray) -> np.ndarray:
    """3d summed-volume (integral image) table with zero padding."""
    val = val.astype(np.int32)
    svt = val.cumsum(axis=0).cumsum(axis=1).cumsum(axis=2)
    return np.pad(svt, [[1, 0], [1, 0], [1, 0]], mode="constant")


def query_summed_volume(svt: np.ndarray, diam) -> np.ndarray:
    """Box sums of the original array over windows of size `diam` (zyx),
    VALID mode (only voxels with full context)."""
    return (
        svt[diam[0]:, diam[1]:, diam[2]:]
        - svt[diam[0]:, diam[1]:, :-diam[2]]
        - svt[diam[0]:, :-diam[1], diam[2]:]
        - svt[:-diam[0], diam[1]:, diam[2]:]
        + svt[:-diam[0], :-diam[1], diam[2]:]
        + svt[:-diam[0], diam[1]:, :-diam[2]]
        + svt[diam[0]:, :-diam[1], :-diam[2]]
        - svt[:-diam[0], :-diam[1], :-diam[2]])


def load_mask(mask_configs, box, lom_diam_zyx):
    if mask_configs is None:
        return None
    mask = storage.build_mask(mask_configs.masks, box.start[::-1],
                              box.size[::-1])
    svt = summed_volume_table(mask)
    return query_summed_volume(svt, lom_diam_zyx) >= 1


def compute_partitions(seg_array: np.ndarray,
                       thresholds: Sequence[float],
                       lom_radius: Sequence[int],
                       id_whitelist: Optional[Sequence[int]] = None,
                       exclusion_regions=None,
                       mask_configs=None,
                       min_size: int = 10000):
    """Quantizes per-voxel active-LOM-fraction into partition ids.

    Args:
      seg_array: (z, y, x) segmentation
      thresholds: ascending activation-fraction thresholds
      lom_radius: LOM radii as (x, y, z)
      id_whitelist: object ids to process (default: all)
      exclusion_regions: list of (x, y, z, r) spheres to mark 255
      mask_configs: MaskConfigs proto; masked LOMs are marked 255
      min_size: minimum object size in voxels

    Returns:
      (corner_xyz, uint8 partitions array (VALID-cropped)).
    """
    seg_array = segmentation_lib.clear_dust(seg_array, min_size=min_size)
    assert seg_array.ndim == 3

    lom_radius = np.array(lom_radius)
    lom_radius_zyx = lom_radius[::-1]
    lom_diam_zyx = 2 * lom_radius_zyx + 1

    def _sel(i):
        return slice(None) if i == 0 else slice(i, -i)

    valid_sel = tuple(_sel(x) for x in lom_radius_zyx)
    output = np.zeros(seg_array[valid_sel].shape, dtype=np.uint8)
    corner = lom_radius

    if exclusion_regions is not None:
        sz, sy, sx = output.shape
        hz, hy, hx = np.mgrid[:sz, :sy, :sx]
        hz += corner[2]
        hy += corner[1]
        hx += corner[0]
        for x, y, z, r in exclusion_regions:
            sphere = (hx - x) ** 2 + (hy - y) ** 2 + (hz - z) ** 2 <= r ** 2
            output[sphere] = IGNORE_PARTITION

    labels = set(np.unique(seg_array))
    if id_whitelist is not None:
        labels &= {int(v) for v in id_whitelist}
    logging.info("Labels to process: %d", len(labels))

    mask = load_mask(
        mask_configs,
        bounding_box.BoundingBox(start=(0, 0, 0),
                                 size=seg_array.shape[::-1]),
        lom_diam_zyx)
    if mask is not None:
        output[mask] = IGNORE_PARTITION

    fov_volume = np.prod(lom_diam_zyx)
    thresholds = np.asarray(thresholds, np.float64)
    for label in sorted(labels):
        if label == 0:
            continue
        object_mask = seg_array == label
        svt = summed_volume_table(object_mask)
        active_fraction = query_summed_volume(svt, lom_diam_zyx) / fov_volume
        assert active_fraction.shape == output.shape

        object_mask = object_mask[valid_sel]
        # Partition id: 1 + number of thresholds below the fraction
        # (fraction < thresholds[0] -> 1, ..., >= thresholds[-1] -> len+1);
        # equivalent to the reference's sequential threshold loop.
        part = np.searchsorted(thresholds, active_fraction,
                               side="right").astype(np.uint8) + 1
        write = object_mask & (output == 0)
        output[write] = part[write]
        logging.info("Done processing %d", label)

    logging.info("Nonzero values: %d", np.sum(output > 0))
    return corner, output


def adjust_bboxes(bboxes, lom_radius):
    ret = []
    for bbox in bboxes:
        bbox = bbox.adjusted_by(start=lom_radius, end=-lom_radius)
        if np.all(bbox.size > 0):
            ret.append(bbox)
    return ret

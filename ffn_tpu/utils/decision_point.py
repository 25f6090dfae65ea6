"""Decision points: where pairs of segments (almost) touch.

Parity with the reference's ffn/utils/decision_point.py:28-125: watershed-
expand the segmentation, compare 7 neighbor shifts, and pick for every
segment pair the closest touching point (the candidate location for
resegmentation / agglomeration scoring).
"""

from __future__ import annotations

import itertools
from typing import Optional, Sequence

import numpy as np
import pandas as pd
from scipy import ndimage

from ffn_tpu.inference import segmentation as segmentation_lib
from ffn_tpu.utils import bounding_box
from ffn_tpu.utils import labels


def find_decision_points(
        seg: np.ndarray, voxel_size: Sequence[float],
        max_distance: Optional[float] = None,
        subvol_box: Optional[bounding_box.BoundingBox] = None,
        optimize_sparse: bool = False,
        sparse_noise_threshold: int = 0):
    """Returns {(id_a, id_b): (distance, (x, y, z) point)}.

    Args:
      seg: 3d uint64 segmentation
      voxel_size: physical voxel size (x, y, z)
      max_distance: max distance between segment and decision point
      subvol_box: restrict the search (the full array still feeds the EDT)
      optimize_sparse: early-out when < 2 segments exist
      sparse_noise_threshold: ignore segments smaller than this when
        counting for the early-out
    """
    if optimize_sparse:
        ids, counts = np.unique(seg, return_counts=True)
        significant = ids[(ids > 0) & (counts >= max(
            sparse_noise_threshold, 1))]
        if len(significant) <= 1:
            return {}

    expanded_seg, edt = labels.watershed_expand(
        seg, voxel_size[::-1], max_distance)
    if subvol_box is not None:
        expanded_seg = expanded_seg[subvol_box.to_slice()]
        edt = edt[subvol_box.to_slice()]

    a = expanded_seg
    dataframes = []
    # 7 offsets cover all neighbor relations within a 2x2x2 block.
    for off in itertools.product((0, -1), (0, -1), (0, -1)):
        if off == (0, 0, 0):
            continue
        b = ndimage.shift(expanded_seg, off, order=0)
        touching = (a > 0) & (b > 0) & (a != b)
        if not np.any(touching):
            continue
        edt2 = np.roll(edt, off, (0, 1, 2))
        mean_edt = (edt[touching] + edt2[touching]) / 2

        ab = np.array([a[touching], b[touching]], dtype=np.uint64)
        ab.sort(axis=0)
        z, y, x = np.where(touching)
        dataframes.append(pd.DataFrame({
            "a": ab[0, :], "b": ab[1, :], "dist": mean_edt,
            "x": x, "y": y, "z": z}))

    if not dataframes:
        return {}

    df = pd.concat(dataframes)
    min_points = df[df.groupby(["a", "b"])["dist"].transform("min")
                    == df["dist"]]

    ret = {}
    for (pa, pb), data in min_points.groupby(["a", "b"]):
        points = np.array(data[["x", "y", "z"]])
        dist = np.array(data["dist"])[0]
        # Pick the min-distance point closest to their centroid.
        idx = np.argmin(np.sum(
            np.square(points - np.mean(points, axis=0)), axis=1))
        ret[(int(pa), int(pb))] = (float(dist), points[idx])
    return ret

"""Label-volume helpers (the connectomics.segmentation.labels subset the
reference depends on), on scipy only."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from scipy import ndimage

from ffn_tpu.inference.segmentation import make_contiguous  # re-export


def watershed_expand(seg: np.ndarray, voxel_size: Sequence[float],
                     max_distance: Optional[float] = None):
    """Expands labels into the background by euclidean nearest-label.

    Args:
      seg: labeled array (0 = background)
      voxel_size: physical voxel size, same axis order as seg (zyx for
        (z, y, x) arrays; callers pass xyz reversed)
      max_distance: cap on the expansion distance (physical units)

    Returns:
      (expanded labels, edt) where edt[v] is the distance from v to the
      nearest originally-labeled voxel.
    """
    background = seg == 0
    edt, indices = ndimage.distance_transform_edt(
        background, sampling=voxel_size, return_indices=True)
    expanded = seg[tuple(indices)]
    if max_distance is not None:
        expanded = np.where(edt <= max_distance, expanded, 0)
    return expanded, edt


def compute_overlap_counts(a: np.ndarray, b: np.ndarray) -> dict:
    """{(a_id, b_id): count} over aligned flat label arrays.

    Replaces the reference's google-internal pywrapsegment_util
    (resegmentation_analysis.py:27,143).
    """
    a = np.asarray(a).ravel().astype(np.uint64)
    b = np.asarray(b).ravel().astype(np.uint64)
    if a.shape != b.shape:
        raise ValueError("arrays must have the same size")
    joint = (a << np.uint64(32)) | b
    unique, counts = np.unique(joint, return_counts=True)
    return {(int(k >> np.uint64(32)), int(k & np.uint64(0xFFFFFFFF))):
            int(c) for k, c in zip(unique, counts)}

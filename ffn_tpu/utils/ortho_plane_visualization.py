"""Orthogonal-plane visualization of 3d volumes.

Parity with the reference's ffn/utils/ortho_plane_visualization.py:28-134:
cut three axis-orthogonal planes through a point, assemble them into one
2d panel, and NaN-aware color normalization.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from scipy.special import expit


def cut_ortho_planes(vol: np.ndarray,
                     center: Optional[Sequence[int]] = None,
                     cross_hair: bool = False) -> list:
    """Cuts the yx, zx, zy planes through `center` of a zyx(c) volume."""
    if center is None:
        center = np.array(vol.shape[:3]) // 2

    planes = []
    for axis, ix in enumerate(center):
        cut_slice = [slice(None)] * 3
        cut_slice[axis] = ix
        planes.append(vol[tuple(cut_slice)])
        if cross_hair:
            plane = planes[-1].copy()
            i = 0
            for ax, c in enumerate(center):
                if ax != axis:
                    view = np.rollaxis(plane, i)
                    view[c] = view[c] * 0.5
                    i += 1
            planes[-1] = plane
    return planes


def concat_ortho_planes(planes: Sequence[np.ndarray]) -> np.ndarray:
    """Assembles the yx/zx/zy planes into one 2d panel."""
    assert len(planes) == 3
    h_yx, w_yx = planes[0].shape[0], planes[0].shape[1]
    h_zx, w_zx = planes[1].shape[0], planes[1].shape[1]
    h_zy, w_zy = planes[2].shape[1], planes[2].shape[0]
    assert h_yx == h_zy
    assert w_yx == w_zx
    assert h_zx == w_zy

    height = h_yx + 1 + h_zx
    width = w_yx + 1 + w_zy
    channel = planes[0].shape[2:]
    ret = np.zeros((height, width) + channel, dtype=planes[0].dtype)
    ret[:h_yx, :w_yx] = planes[0]          # yx top left
    ret[-h_zx:, :w_zx] = planes[1]         # zx bottom left
    ret[:h_zy, -w_zy:] = np.swapaxes(planes[2], 0, 1)  # zy top right
    return ret


def normalize_image(img2d: np.ndarray,
                    act: Optional[str] = None) -> np.ndarray:
    """Maps an unbounded grey image to RGB in [0, 1].

    Red encodes negative values, blue positive, green NaN.
    """
    img2d = np.array(img2d, dtype=np.float32)
    nan_mask = np.isnan(img2d)
    img2d[nan_mask] = 0
    lo, hi = img2d.min(), img2d.max()
    img_rgb = np.zeros(img2d.shape + (3,), dtype=np.float32)
    if act == "tanh":
        img_rgb[~nan_mask, 0] = np.tanh(np.clip(img2d, lo, 0))[~nan_mask]
        img_rgb[~nan_mask, 2] = np.tanh(np.clip(img2d, 0, hi))[~nan_mask]
    elif act == "sig":
        img_rgb[~nan_mask, 0] = expit(img2d[~nan_mask])
        img_rgb[~nan_mask, 2] = img_rgb[~nan_mask, 0]
    else:
        if lo < 0:
            img_rgb[~nan_mask, 0] = (np.clip(img2d, lo, 0) / lo)[~nan_mask]
        if hi > 0:
            img_rgb[~nan_mask, 2] = (np.clip(img2d, 0, hi) / hi)[~nan_mask]
    img_rgb[nan_mask, 1] = 1.0
    return img_rgb

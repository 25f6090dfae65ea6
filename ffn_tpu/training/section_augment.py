"""ssEM "section" augmentations (SNEMI3D-style defect simulation).

Parity with the reference's ffn/training/augmentation.py:524-1154:
elastic warp, 2d affine, slip/translation misalignment, missing section,
out-of-focus blur and grayscale/gamma perturbation. The reference's
implementation depends on skimage and google-internal TF ops
(augmentation.py:27-30); this one runs on scipy only.

Arrays are (b, z, y, x, c). Augmentations operate on oversized inputs and
center-crop to the final shapes, so defects can move data into view.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from scipy import ndimage
from scipy.interpolate import griddata


def _center_crop(data: np.ndarray, final_zyx) -> np.ndarray:
    shape = np.array(data.shape[1:-1])
    final = np.array(final_zyx)
    start = shape // 2 - final // 2
    sel = tuple([slice(None)]
                + [slice(s, s + f) for s, f in zip(start, final)]
                + [slice(None)])
    return data[sel]


def _edge_pad(data: np.ndarray, target_zyx) -> np.ndarray:
    shape = np.array(data.shape[1:-1])
    target = np.array(target_zyx)
    delta = target - shape
    pre = delta // 2
    post = delta - pre
    paddings = [(0, 0)] + list(zip(pre, post)) + [(0, 0)]
    return np.pad(data, paddings, mode="edge")


def elastic_warp_2d(patch: np.ndarray, num_control_points_ratio: float,
                    deformation_stdev_ratio: float, mode: str = "reflect",
                    rng: Optional[np.random.RandomState] = None
                    ) -> np.ndarray:
    """Applies the same 2d elastic deformation to every (y, x) slice.

    patch: (b, y, x, c).
    """
    rng = rng or np.random
    ny = max(int(num_control_points_ratio * patch.shape[1]), 1)
    nx = max(int(num_control_points_ratio * patch.shape[2]), 1)
    y = np.linspace(0, patch.shape[1], ny)
    x = np.linspace(0, patch.shape[2], nx)
    coords = np.array([(y0, x0) for y0 in y for x0 in x])
    deformation_stdev = deformation_stdev_ratio * np.min(patch.shape)
    deformed = coords + rng.normal(0, deformation_stdev, coords.shape)
    grid_y, grid_x = np.mgrid[0:patch.shape[1], 0:patch.shape[2]]
    grid = griddata(coords, deformed, (grid_y, grid_x), method="cubic",
                    fill_value=0)
    warp_coords = np.array((grid[:, :, 0], grid[:, :, 1]))

    out = np.zeros(patch.shape, dtype=patch.dtype)
    for b in range(patch.shape[0]):
        for c in range(patch.shape[3]):
            out[b, :, :, c] = ndimage.map_coordinates(
                patch[b, :, :, c], warp_coords, order=1, mode=mode)
    return out


def affine_transform_2d(patch: np.ndarray, rotation_max: float,
                        scale_max: float, shear_max: float,
                        mode: str = "reflect",
                        rng: Optional[np.random.RandomState] = None
                        ) -> np.ndarray:
    """Applies one random 2d affine transform to every (y, x) slice.

    patch: (b, y, x, c). Uses the (scale, rotation, shear) parametrization
    of skimage.AffineTransform: the matrix maps output coords to input.
    """
    rng = rng or np.random
    rotation = (rng.rand() * 2 - 1) * rotation_max
    scale = 1 - (rng.rand(2) * 2 - 1) * scale_max
    shear = (rng.rand() * 2 - 1) * shear_max
    sx, sy = scale[0], scale[1] * np.cos(shear)
    # skimage AffineTransform matrix (maps (x, y, 1) -> (x', y', 1)).
    matrix = np.array([
        [sx * np.cos(rotation), -sy * np.sin(rotation + shear), 0],
        [sx * np.sin(rotation), sy * np.cos(rotation + shear), 0],
        [0, 0, 1]])
    # map_coordinates wants the inverse map on (row=y, col=x).
    inv = np.linalg.inv(matrix)
    rows, cols = np.mgrid[0:patch.shape[1], 0:patch.shape[2]]
    xy1 = np.stack([cols.ravel(), rows.ravel(),
                    np.ones(rows.size)], axis=0)
    src = inv @ xy1
    warp_coords = np.array([src[1].reshape(rows.shape),
                            src[0].reshape(rows.shape)])
    out = np.zeros(patch.shape, dtype=patch.dtype)
    for b in range(patch.shape[0]):
        for c in range(patch.shape[3]):
            out[b, :, :, c] = ndimage.map_coordinates(
                patch[b, :, :, c], warp_coords, order=1, mode=mode)
    return out


def misalignment(patch, labels, mask, patch_final_zyx, labels_final_zyx,
                 mask_final_zyx, max_offset: int, slip_ratio: float,
                 skip_ratio: float = 0,
                 rng: Optional[np.random.RandomState] = None):
    """Slip/translation misalignment; returns (patch, labels, mask, z)."""
    rng = rng or np.random
    patch, labels, mask = patch.copy(), labels.copy(), mask.copy()
    if rng.rand() < skip_ratio:
        return (_center_crop(patch, patch_final_zyx),
                _center_crop(labels, labels_final_zyx),
                _center_crop(mask, mask_final_zyx), -1)

    zyx_max = np.array([patch.shape, labels.shape,
                        mask.shape]).max(axis=0)[1:-1]
    padded = [_edge_pad(patch, zyx_max), _edge_pad(labels, zyx_max),
              _edge_pad(mask, zyx_max)]

    offset_y, offset_x = rng.randint(-max_offset, max_offset + 1, 2)
    z_start = rng.randint(0, zyx_max[0])
    is_slip = rng.rand() < slip_ratio

    results = []
    for d in padded:
        if is_slip:
            d[:, z_start] = np.roll(d[:, z_start], offset_y, 1)
            d[:, z_start] = np.roll(d[:, z_start], -offset_x, 2)
        else:
            d[:, z_start:] = np.roll(d[:, z_start:], offset_y, 2)
            d[:, z_start:] = np.roll(d[:, z_start:], -offset_x, 3)
        results.append(d)
    return (_center_crop(results[0], patch_final_zyx),
            _center_crop(results[1], labels_final_zyx),
            _center_crop(results[2], mask_final_zyx), z_start)


def _quadrant_replace(patch, z, replacement, quadrant_prob, rng):
    """Replaces random (y, x) quadrants of the z-slice with replacement."""
    cy = patch.shape[2] // 2
    cx = patch.shape[3] // 2
    for ys, xs in ((slice(None, cy), slice(None, cx)),
                   (slice(None, cy), slice(cx, None)),
                   (slice(cy, None), slice(None, cx)),
                   (slice(cy, None), slice(cx, None))):
        if rng.rand() < quadrant_prob:
            patch[:, z, ys, xs, :] = replacement[:, ys, xs, :]


def missing_section(patch, max_indices_ratio: float, skip_ratio: float = 0,
                    fill_value=None, max_fill_val: float = 256,
                    full_prob: float = 0.5, quadrant_prob: float = 0.5,
                    rng: Optional[np.random.RandomState] = None):
    """Replaces random sections (or quadrants) with a constant value."""
    rng = rng or np.random
    patch = patch.copy()
    if rng.rand() < skip_ratio:
        return patch, -1
    max_indices = max(int(max_indices_ratio * patch.shape[1]), 1)
    num_indices = rng.randint(1, max_indices + 1)
    z_indices = rng.choice(patch.shape[1], num_indices, replace=False)
    fill_val = (fill_value if fill_value is not None
                else rng.rand() * max_fill_val)
    fill_array = np.full(patch[:, 0].shape, fill_val, patch.dtype)
    for z in z_indices:
        if rng.rand() < full_prob:
            patch[:, z] = fill_val
        else:
            _quadrant_replace(patch, z, fill_array, quadrant_prob, rng)
    return patch, z_indices


def out_of_focus_section(patch, max_indices_ratio: float,
                         max_filter_stdev: float, skip_ratio: float = 0,
                         full_prob: float = 0.5,
                         quadrant_prob: float = 0.5,
                         rng: Optional[np.random.RandomState] = None):
    """Gaussian-blurs random sections (or quadrants)."""
    rng = rng or np.random
    patch = patch.copy()
    if rng.rand() < skip_ratio:
        return patch, -1
    max_indices = max(int(max_indices_ratio * patch.shape[1]), 1)
    num_indices = rng.randint(1, max_indices + 1)
    z_indices = rng.choice(patch.shape[1], num_indices, replace=False)
    filter_stdev = rng.rand() * max_filter_stdev
    for z in z_indices:
        blurred = np.stack(
            [ndimage.gaussian_filter(patch[b, z], filter_stdev)
             for b in range(patch.shape[0])])
        if rng.rand() < full_prob:
            patch[:, z] = blurred
        else:
            _quadrant_replace(patch, z, blurred, quadrant_prob, rng)
    return patch, z_indices


def grayscale_perturb(patch, max_contrast_factor: float,
                      max_brightness_factor: float, skip_ratio: float = 0,
                      max_val: float = 255, full_prob: float = 0.5,
                      rng: Optional[np.random.RandomState] = None):
    """Brightness/contrast + gamma perturbation (whole volume or per z)."""
    rng = rng or np.random
    patch = patch.copy()
    if rng.rand() < skip_ratio:
        return patch, 0

    def perturb_fn(data):
        contrast = 1 + (rng.rand() - 0.5) * max_contrast_factor
        brightness = (rng.rand() - 0.5) * max_brightness_factor
        power = 2.0 ** (rng.rand() * 2 - 1)
        normalized = data.astype(np.float32) / max_val
        adjusted = normalized * contrast + brightness
        gamma = np.clip(adjusted, 0, 1) ** power
        return (gamma * max_val).astype(data.dtype)

    if rng.rand() < full_prob:
        return perturb_fn(patch), 1
    for z in range(patch.shape[1]):
        patch[:, z] = perturb_fn(patch[:, z])
    return patch, 1


def apply_section_augmentations(
        patch, labels, mask, patch_final_zyx, labels_final_zyx,
        mask_final_zyx,
        elastic_prob: float = 0.0,
        affine_prob: float = 0.0,
        misalign_prob: float = 0.0,
        missing_prob: float = 0.0,
        blur_prob: float = 0.0,
        grayscale_prob: float = 0.0,
        max_offset: int = 8, slip_ratio: float = 0.5,
        rng: Optional[np.random.RandomState] = None):
    """Applies the full ssEM defect-simulation stack with given rates.

    Returns (patch, labels, mask) center-cropped to the final shapes.
    """
    rng = rng or np.random.RandomState()

    if rng.rand() < elastic_prob:
        b, z, y, x, c = patch.shape
        flat = patch.reshape(b * z, y, x, c)
        patch = elastic_warp_2d(flat, 0.15, 0.05, rng=rng).reshape(
            patch.shape)
    if rng.rand() < affine_prob:
        b, z, y, x, c = patch.shape
        flat = patch.reshape(b * z, y, x, c)
        patch = affine_transform_2d(flat, 0.2, 0.1, 0.1, rng=rng).reshape(
            patch.shape)
    patch, labels, mask, _ = misalignment(
        patch, labels, mask, patch_final_zyx, labels_final_zyx,
        mask_final_zyx, max_offset=max_offset, slip_ratio=slip_ratio,
        skip_ratio=1.0 - misalign_prob, rng=rng)
    if rng.rand() < missing_prob:
        patch, _ = missing_section(patch, 0.1, rng=rng)
    if rng.rand() < blur_prob:
        patch, _ = out_of_focus_section(patch, 0.1, 3.0, rng=rng)
    if rng.rand() < grayscale_prob:
        patch, _ = grayscale_perturb(patch, 0.3, 0.3, rng=rng)
    return patch, labels, mask

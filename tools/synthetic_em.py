"""Synthetic EM-like volumes for benchmarking and system tests.

Generates a Voronoi-cell phantom: bright cell interiors separated by dark
membranes (the dominant EM contrast the FFN model keys on), with per-cell
intensity variation and speckle noise. Returns both the image and the
ground-truth cell labels, so object-level agreement of a segmentation run
can be scored without real (non-redistributable) EM data.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage
from scipy.spatial import cKDTree


def make_volume(size: int = 250, num_cells: int = 120,
                membrane_value: float = 40.0,
                membrane_halfwidth: float = 4.0,
                interior_value: float = 140.0,
                texture_sigma: float = 2.5, texture_amp: float = 35.0,
                noise_sigma: float = 25.0, seed: int = 0,
                chunk: int = 32, voxel_size=(1.0, 1.0, 1.0),
                radius_sigma: float = 0.0):
    """Returns (uint8 image (z, y, x), uint32 cell labels).

    The texture/contrast defaults were calibrated so the shipped fib25
    ConvStack respects the phantom membranes (predicted POM stays within
    the ground-truth cell for ~90% of voxels at membrane-adjacent FOVs).

    Two knobs select a second morphology family (defaults reproduce the
    round-2 phantom bit-for-bit):
      voxel_size   (z, y, x) physical size of one voxel. Cell geometry
                   is isotropic in PHYSICAL space, so e.g. (2, 1, 1)
                   yields z-flattened cells and z-thinned membranes in
                   index space — the anisotropic-ssEM look.
      radius_sigma lognormal spread of per-cell additive Voronoi
                   weights (Apollonius diagram): 0 = classic Voronoi
                   (near-uniform cell sizes); 0.5 gives a broad
                   cell-size distribution (small cells nested between
                   large ones).
    """
    rng = np.random.RandomState(seed)
    voxel_size = np.asarray(voxel_size, np.float32)
    sites = rng.rand(num_cells, 3) * size * voxel_size
    radii = None
    if radius_sigma > 0:
        # Additive weights on the scale of the mean inter-site spacing.
        spacing = (float(np.prod(voxel_size)) * size ** 3
                   / num_cells) ** (1.0 / 3.0)
        radii = (0.5 * spacing
                 * np.exp(rng.randn(num_cells) * radius_sigma
                          - 0.5 * radius_sigma ** 2)).astype(np.float32)
    tree = cKDTree(sites)
    # With additive weights the weighted-nearest site is found among the
    # k Euclidean-nearest (exact for weight spreads small vs spacing).
    k = 2 if radii is None else min(num_cells, 12)

    image = np.empty((size, size, size), np.float32)
    labels = np.empty((size, size, size), np.uint32)

    # Chunked queries keep peak memory bounded.
    for z0 in range(0, size, chunk):
        z1 = min(size, z0 + chunk)
        zz, yy, xx = np.mgrid[z0:z1, 0:size, 0:size]
        pts = np.stack([zz.ravel(), yy.ravel(), xx.ravel()],
                       axis=1).astype(np.float32) * voxel_size
        dists, idx = tree.query(pts, k=k)
        if radii is not None:
            dists = dists - radii[idx]
            order = np.argsort(dists, axis=1)
            dists = np.take_along_axis(dists, order, axis=1)
            idx = np.take_along_axis(idx, order, axis=1)
        d1, d2 = dists[:, 0], dists[:, 1]
        nearest = idx[:, 0]

        # Distance to the Voronoi boundary ~ (d2 - d1) / 2.
        boundary_dist = (d2 - d1) * 0.5
        membrane = np.clip(boundary_dist / membrane_halfwidth, 0.0, 1.0)
        vals = membrane_value + (interior_value - membrane_value) * membrane
        shape = (z1 - z0, size, size)
        image[z0:z1] = vals.reshape(shape)
        # Ground truth leaves the membrane unlabeled (label 0), like real
        # EM ground truth — cells are the interiors only.
        labels[z0:z1] = np.where(membrane >= 0.5, nearest + 1,
                                 0).reshape(shape)

    # Organelle-like low-frequency texture inside cells (not on membranes).
    texture = ndimage.gaussian_filter(
        rng.randn(size, size, size).astype(np.float32), texture_sigma)
    texture *= texture_amp / max(texture.std(), 1e-6)
    interior_frac = np.clip(
        (image - membrane_value) / max(interior_value - membrane_value,
                                       1e-6), 0, 1)
    image += texture * interior_frac

    image += rng.randn(*image.shape).astype(np.float32) * noise_sigma
    image = np.clip(image, 0, 255).astype(np.uint8)
    return image, labels


def make_volume_b(size: int = 250, seed: int = 0, num_cells=None,
                  **kwargs):
    """The second phantom morphology ("B"): anisotropic voxels
    (z twice as coarse, the ssEM geometry) + a broad lognormal
    cell-size distribution. Same imaging model as morphology A.

    Default cell count keeps the physical cell density of morphology A
    (120 cells / 250^3 isotropic voxels), so the index-space volume
    holds more, flatter, size-varied cells.
    """
    if num_cells is None:
        num_cells = max(8, int(round(2 * 120 * (size / 250.0) ** 3)))
    kwargs.setdefault("voxel_size", (2.0, 1.0, 1.0))
    kwargs.setdefault("radius_sigma", 0.5)
    return make_volume(size=size, seed=seed, num_cells=num_cells,
                       **kwargs)


def object_level_agreement(seg_a: np.ndarray, seg_b: np.ndarray,
                           min_size: int = 1000) -> float:
    """Fraction of seg_a objects (>= min_size) whose best-overlap partner
    in seg_b covers >= 50% of them and vice versa (bidirectional match)."""
    from ffn_tpu.utils import labels as labels_lib

    counts = labels_lib.compute_overlap_counts(seg_a, seg_b)
    totals_a = {}
    totals_b = {}
    best = {}  # a -> (count, b) over nonzero b
    for (a, b), c in counts.items():
        if a:
            totals_a[a] = totals_a.get(a, 0) + c
        if b:
            totals_b[b] = totals_b.get(b, 0) + c
        if a and b and c > best.get(a, (0, None))[0]:
            best[a] = (c, b)

    matched = 0
    considered = 0
    for a, total in totals_a.items():
        if total < min_size:
            continue
        considered += 1
        best_c, best_b = best.get(a, (0, None))
        if best_b is None:
            continue
        if best_c / total >= 0.5 and best_c / totals_b[best_b] >= 0.5:
            matched += 1
    return matched / max(considered, 1)

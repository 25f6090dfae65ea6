"""Seed policies: iterators over (z, y, x) starting points for flood fill.

Semantics parity with the reference's ffn/inference/seed.py (all 13
policies). Differences by design:
  - EDT comes from ffn_tpu.ops.edt (bundled C++/scipy) instead of the `edt`
    pip package; peak finding from ffn_tpu.ops.peaks instead of skimage.
  - PolicyInvertOrigins sorts dict items correctly (the reference's
    seed.py:467 calls .sort() on dict_items — broken under py3).
Deterministic tie-breaking noise matches the reference exactly
(RandomState(42) * 1e-4) so seed ordering is reproducible.
"""

from __future__ import annotations

import itertools
import threading
import weakref
from typing import Any, Sequence

from absl import logging
import numpy as np
from scipy import ndimage

from ffn_tpu.inference import storage
from ffn_tpu.ops import edt as edt_lib
from ffn_tpu.ops import image as image_ops
from ffn_tpu.ops import peaks as peaks_lib


class BaseSeedPolicy:
    """Base class for seed policies."""

    def __init__(self, canvas, **kwargs):
        logging.info("Deleting unused BaseSeedPolicy kwargs: %s", kwargs)
        del kwargs
        self.canvas = weakref.proxy(canvas)
        self.coords: np.ndarray | None = None  # (N, 3), zyx
        self.idx = 0

    def init_coords(self):
        raise NotImplementedError()

    def __iter__(self):
        return self

    def __next__(self):
        """Next seed point as (z, y, x); filters points too close to the
        image border."""
        if self.coords is None:
            self.init_coords()
            if self.coords is None:
                raise StopIteration()
            if self.coords.size:
                margin = np.array(self.canvas.margin)[np.newaxis, ...]
                self.coords = self.coords[np.all(
                    (self.coords - margin >= 0) &
                    (self.coords + margin < self.canvas.shape), axis=1), :]

        while self.idx < self.coords.shape[0]:
            curr = self.coords[self.idx, :]
            self.idx += 1
            return tuple(int(v) for v in curr)
        raise StopIteration()

    def get_state(self, previous=False):
        """Pickleable state; `previous` rewinds one seed for in-progress
        segment checkpointing."""
        if previous:
            return self.coords, max(0, self.idx - 1)
        return self.coords, self.idx

    def set_state(self, state):
        self.coords, self.idx = state

    def get_exclusion_mask(self):
        """Voxels invalid for seeding (already segmented or masked)."""
        mask = self.canvas.segmentation > 0
        if self.canvas.restrictor is not None:
            if self.canvas.restrictor.mask is not None:
                mask |= self.canvas.restrictor.mask
            if self.canvas.restrictor.seed_mask is not None:
                mask |= self.canvas.restrictor.seed_mask
        return mask


_find_peaks = peaks_lib.find_peaks_with_noise


class PolicyPeaks(BaseSeedPolicy):
    """Peaks of the distance transform of adaptive-thresholded edges.

    3d Sobel -> Gaussian adaptive threshold -> anisotropic EDT ->
    peak_local_max, ascending zyx order (seed.py:142-199).
    """

    # Bound concurrent peak computations (temporary memory spike).
    _sem = threading.Semaphore(4)

    def init_coords(self):
        logging.info("peaks: starting")
        filt_edges = image_ops.adaptive_edge_mask(
            np.asarray(self.canvas.image, dtype=np.float32))

        mask = self.get_exclusion_mask()

        # Prevent border effects in the distance transform.
        if self.canvas.restrictor is not None:
            if self.canvas.restrictor.mask is not None:
                filt_edges[self.canvas.restrictor.mask] = 1
            if self.canvas.restrictor.seed_mask is not None:
                filt_edges[self.canvas.restrictor.seed_mask] = 1

        if np.all(filt_edges == 1):
            return

        with PolicyPeaks._sem:
            logging.info("peaks: filtering done")
            dt = edt_lib.edt(1 - filt_edges,
                             anisotropy=self.canvas.voxel_size_zyx
                             ).astype(np.float32)
            logging.info("peaks: edt done")
            dt[mask] = -1
            dt[~np.isfinite(dt)] = -1

            idxs = _find_peaks(dt, min_distance=3, threshold_abs=0,
                               threshold_rel=0)
            idxs = np.array(sorted((z, y, x) for z, y, x in idxs))
            logging.info("peaks: found %d local maxima", idxs.shape[0])
            self.coords = idxs


class PolicyPeaks2d(BaseSeedPolicy):
    """Per-z-slice 2d edge-distance peaks (seed.py:202-280)."""

    def __init__(self, canvas, min_distance=7, threshold_abs=2.5,
                 sort_cmp="ascending", **kwargs):
        super().__init__(canvas, **kwargs)
        self.min_distance = min_distance
        self.threshold_abs = threshold_abs
        self.sort_reverse = sort_cmp.strip().lower().startswith("de")

    def init_coords(self):
        logging.info("2d peaks: starting")
        all_idxs = None
        for z in range(self.canvas.image.shape[0]):
            image_2d = np.asarray(self.canvas.image[z, :, :],
                                  dtype=np.float32)
            filt_edges = image_ops.adaptive_edge_mask(image_2d)

            if (self.canvas.restrictor is not None and
                    self.canvas.restrictor.mask is not None):
                filt_edges[self.canvas.restrictor.mask[z, :, :]] = 1

            dt = edt_lib.edt(1 - filt_edges).astype(np.float32)
            idxs = _find_peaks(dt, min_distance=self.min_distance,
                               threshold_abs=self.threshold_abs,
                               threshold_rel=0)
            zs = np.full((idxs.shape[0], 1), z, dtype=np.int64)
            idxs = np.concatenate((zs, idxs), axis=1)
            all_idxs = idxs if all_idxs is None else \
                np.concatenate((all_idxs, idxs))

        self.coords = np.array(
            sorted([(z, y, x) for z, y, x in all_idxs],
                   reverse=self.sort_reverse))
        logging.info("2d peaks: found %d total local maxima",
                     self.coords.shape[0])


class PolicyFillEmptySpace(BaseSeedPolicy):
    """Peaks of the distance transform of unsegmented space."""

    def init_coords(self):
        dt = edt_lib.edt(self.canvas.segmentation == 0).astype(np.float32)
        # threshold_abs < 1 avoids seeding inside already-segmented areas.
        idxs = _find_peaks(dt, min_distance=2, threshold_abs=0.5,
                           threshold_rel=0)
        self.coords = np.array(sorted((z, y, x) for z, y, x in idxs))


class PolicyMax(BaseSeedPolicy):
    """All points, in descending order of image intensity."""

    def init_coords(self):
        idxs = np.mgrid[[slice(0, x) for x in self.canvas.image.shape]]
        sort_idx = np.argsort(np.asarray(self.canvas.image).flat)[::-1]
        self.coords = np.array(
            list(zip(*[idx.flat[sort_idx] for idx in idxs])))


class PolicyMaxPeaks(BaseSeedPolicy):
    """Local peaks of image intensity."""

    def __init__(self, canvas, min_distance=3, threshold_abs=0,
                 threshold_rel=0, **kwargs):
        super().__init__(canvas, **kwargs)
        self.min_distance = min_distance
        self.threshold_abs = threshold_abs
        self.threshold_rel = threshold_rel

    def init_coords(self):
        img = np.asarray(self.canvas.image, dtype=np.float32).copy()
        img[self.get_exclusion_mask()] = 0
        idxs = _find_peaks(img, min_distance=self.min_distance,
                           threshold_abs=self.threshold_abs,
                           threshold_rel=self.threshold_rel)
        self.coords = np.array(sorted((z, y, x) for z, y, x in idxs))


class PolicyImagePeaks3D2D(BaseSeedPolicy):
    """3d image peaks followed by per-slice 2d image peaks."""

    def __init__(self, canvas, min_distance_2d=2, min_distance_3d=4,
                 **kwargs):
        super().__init__(canvas, **kwargs)
        self._min_distance_2d = min_distance_2d
        self._min_distance_3d = min_distance_3d

    def init_coords(self):
        img = np.asarray(self.canvas.image)
        coords3d = []
        if self._min_distance_3d >= 0:
            coords3d = peaks_lib.peak_local_max(
                img, min_distance=self._min_distance_3d).tolist()
        coords2d = []
        if self._min_distance_2d >= 0:
            for z in range(img.shape[0]):
                for y, x in peaks_lib.peak_local_max(
                        img[z, ...], min_distance=self._min_distance_2d):
                    coords2d.append((z, y, x))
        self.coords = np.array(coords3d + coords2d)


class PolicyImagePeaks2DDisk(BaseSeedPolicy):
    """2d image peaks with a disk footprint and euclidean spacing."""

    def __init__(self, canvas, min_distance_2d=3, threshold_rel=0.5,
                 disk_radius=1, **kwargs):
        super().__init__(canvas, **kwargs)
        self._min_distance_2d = min_distance_2d
        self._threshold_rel = threshold_rel
        self._disk_radius = disk_radius

    def init_coords(self):
        img = np.asarray(self.canvas.image)
        footprint = peaks_lib.disk_footprint(self._disk_radius)
        coords = []
        for z in range(img.shape[0]):
            for y, x in peaks_lib.peak_local_max(
                    img[z, ...], min_distance=self._min_distance_2d,
                    p_norm=2, threshold_rel=self._threshold_rel,
                    exclude_border=True, footprint=footprint):
                coords.append((z, y, x))
        self.coords = np.array(coords)


class PolicyGrid3d(BaseSeedPolicy):
    """Uniform 3d grid with multiple interleaved offsets."""

    def __init__(self, canvas, step=16, offsets=(0, 8, 4, 12, 2, 10, 14),
                 **kwargs):
        super().__init__(canvas, **kwargs)
        self.step = step
        self.offsets = offsets

    def init_coords(self):
        coords = []
        for offset in self.offsets:
            for z in range(offset, self.canvas.image.shape[0], self.step):
                for y in range(offset, self.canvas.image.shape[1],
                               self.step):
                    for x in range(offset, self.canvas.image.shape[2],
                                   self.step):
                        coords.append((z, y, x))
        self.coords = np.array(coords)


class PolicyGrid2d(BaseSeedPolicy):
    """Uniform 2d grid over every z slice."""

    def __init__(self, canvas, step=16, offsets=(0, 8, 4, 12, 2, 6, 10, 14),
                 **kwargs):
        super().__init__(canvas, **kwargs)
        self.step = step
        self.offsets = offsets

    def init_coords(self):
        coords = []
        for offset in self.offsets:
            for z in range(self.canvas.image.shape[0]):
                for y in range(offset, self.canvas.image.shape[1],
                               self.step):
                    for x in range(offset, self.canvas.image.shape[2],
                                   self.step):
                        coords.append((z, y, x))
        self.coords = np.array(coords)


class PolicyInvertOrigins(BaseSeedPolicy):
    """Origins of a previous run, in reverse order."""

    def __init__(self, canvas, corner=None, segmentation_dir=None, **kwargs):
        super().__init__(canvas, **kwargs)
        self.corner = corner
        self.segmentation_dir = segmentation_dir

    def init_coords(self):
        origins = storage.load_origins(self.segmentation_dir, self.corner)
        points = sorted(origins.items(), reverse=True)
        self.coords = np.array([origin_info.start_zyx
                                for _, origin_info in points])


class PolicyDenseSeeds(BaseSeedPolicy):
    """Every voxel of a thresholded (optionally eroded) image."""

    def __init__(self, canvas: Any, threshold: float = 0.5,
                 num_erosions: int = 0, invert: bool = False, **kwargs):
        super().__init__(canvas, **kwargs)
        self._threshold = threshold
        self._num_erosions = num_erosions
        self._invert = invert

    def init_coords(self):
        x = np.asarray(self.canvas.image) > self._threshold
        if self._invert:
            x = ~x
        for _ in range(self._num_erosions):
            x = ndimage.binary_erosion(x)
        self.coords = np.array(np.where(x)).T


class ReverseCoords(BaseSeedPolicy):
    """Wraps another policy, reversing its seed order."""

    def __init__(self, canvas, policy_to_reverse: str, **policy_kwargs):
        super().__init__(canvas)
        policy_cls = globals()[policy_to_reverse]
        self._policy = policy_cls(canvas, **policy_kwargs)

    def init_coords(self):
        self.coords = np.array(list(self._policy)[::-1])


class SequentialPolicies(BaseSeedPolicy):
    """Chains several policies in sequence."""

    def __init__(self, canvas,
                 policies: Sequence[tuple[str, dict[str, Any]]], **kwargs):
        del kwargs
        super().__init__(canvas)
        self._policies = [globals()[name](canvas, **kw)
                          for name, kw in policies]

    def init_coords(self):
        self.coords = np.array(list(itertools.chain(*self._policies)))

    def get_state(self, previous=False):
        return [p.get_state(previous=previous) for p in self._policies]

    def set_state(self, state):
        for s, policy in zip(state, self._policies):
            policy.set_state(s)

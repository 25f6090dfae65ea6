"""FFN field-of-view movement policies.

Semantics parity with the reference's ffn/inference/movement.py:
get_scored_move_offsets (:42), FaceMaxMovementPolicy (:166, FIFO deque +
delta-quantized dedup), MovementRestrictor (:247). All coordinate triples
are ZYX.

TPU difference: the device flood-fill engine computes the per-face maxima
inside the jitted step (see ffn_tpu.inference.engine), so policies accept
precomputed (score, offset) pairs via `update_scored`; `update` with a full
probability map reproduces the host path bit-for-bit and doubles as the
test oracle.
"""

from __future__ import annotations

import json
import weakref
from collections import deque
from typing import Optional

import numpy as np
from scipy.special import logit

from ffn_tpu.models import registry
from ffn_tpu.utils import bounding_box as bbox_lib


def get_scored_move_offsets(deltas, prob_map, threshold=0.9):
    """Yields (score, (z, y, x) offset) moves from cuboid-face maxima.

    For each axis with delta > 0 and each direction, takes the plane of the
    probability map at +/-delta from the center, finds its maximum, and
    yields the move to that voxel if the maximum clears the threshold.
    Offsets are relative to the center of prob_map.
    """
    center = np.array(prob_map.shape) // 2
    assert center.size == 3
    subvol_sel = [slice(c - dx, c + dx + 1)
                  for c, dx in zip(center, deltas)]

    done = set()
    for axis, axis_delta in enumerate(deltas):
        if axis_delta == 0:
            continue
        for axis_offset in (-axis_delta, axis_delta):
            face_sel = subvol_sel[:]
            face_sel[axis] = axis_offset + center[axis]
            face_prob = prob_map[tuple(face_sel)]
            shape = face_prob.shape

            face_pos = np.unravel_index(face_prob.argmax(), shape)
            score = face_prob[face_pos]
            if score < threshold:
                continue

            relative_pos = [face_pos[0] - shape[0] // 2,
                            face_pos[1] - shape[1] // 2]
            relative_pos.insert(axis, axis_offset)
            ret = (score, tuple(relative_pos))
            if ret not in done:
                done.add(ret)
                yield ret


class BaseMovementPolicy:
    """Base class for movement policy queues."""

    def __init__(self, canvas, scored_coords, deltas):
        self.canvas = weakref.proxy(canvas)
        self.scored_coords = scored_coords
        self.deltas = np.array(deltas)

    def __len__(self):
        return len(self.scored_coords)

    def __iter__(self):
        return self

    def __next__(self):
        raise StopIteration()

    def append(self, item):
        self.scored_coords.append(item)

    def update(self, prob_map, position):
        raise NotImplementedError()

    def get_state(self):
        raise NotImplementedError()

    def restore_state(self, state):
        raise NotImplementedError()

    def reset_state(self, start_pos):
        raise NotImplementedError()


class FaceMaxMovementPolicy(BaseMovementPolicy):
    """FIFO of face-maximum candidates with delta-grid deduplication."""

    def __init__(self, canvas, deltas=(4, 8, 8), score_threshold=0.9):
        self.done_rounded_coords = set()
        self.score_threshold = score_threshold
        self._start_pos = None
        super().__init__(canvas, deque([]), deltas)

    def reset_state(self, start_pos):
        self.scored_coords = deque([])
        self.done_rounded_coords = set()
        self._start_pos = start_pos

    def get_state(self):
        return [(self.scored_coords, self.done_rounded_coords,
                 self._start_pos)]

    def restore_state(self, state):
        (self.scored_coords, self.done_rounded_coords,
         self._start_pos) = state[0]
        self.scored_coords = deque(self.scored_coords)
        self.done_rounded_coords = set(self.done_rounded_coords)

    def __next__(self):
        """Pops until a valid position is found; StopIteration when empty."""
        while self.scored_coords:
            _, coord = self.scored_coords.popleft()
            coord = tuple(coord)
            if self.quantize_pos(coord) in self.done_rounded_coords:
                continue
            if self.canvas.is_valid_pos(coord):
                return coord
        raise StopIteration()

    def quantize_pos(self, pos):
        """Quantizes a position to the delta lattice centered on the segment
        origin (so all directions are treated symmetrically)."""
        rel_pos = np.array(pos) - self._start_pos
        coord = (rel_pos + self.deltas // 2) // np.maximum(self.deltas, 1)
        return tuple(coord)

    def update(self, prob_map, position):
        """Queues face-maximum moves computed from a full probability map."""
        scored = sorted(
            get_scored_move_offsets(self.deltas, prob_map,
                                    threshold=self.score_threshold),
            reverse=True)
        self.update_scored(scored, position)

    def update_scored(self, scored_offsets, position):
        """Queues precomputed (score, zyx offset) moves (device fast path).

        `scored_offsets` must be sorted by descending score, matching the
        reference's ordering (movement.py:218).
        """
        qpos = self.quantize_pos(position)
        self.done_rounded_coords.add(qpos)
        for score, rel_coord in scored_offsets:
            coord = [int(rel_coord[i] + position[i]) for i in range(3)]
            self.scored_coords.append((score, coord))


def get_policy_fn(request, model_info):
    """Builds a movement-policy factory from an InferenceRequest proto."""
    if request.movement_policy_name:
        policy_class = globals().get(request.movement_policy_name)
        if policy_class is None:
            policy_class = registry.import_symbol(
                request.movement_policy_name,
                default_packages="ffn_tpu.inference")
    else:
        policy_class = FaceMaxMovementPolicy

    kwargs = json.loads(request.movement_policy_args) \
        if request.movement_policy_args else {}
    if "deltas" not in kwargs:
        kwargs["deltas"] = list(model_info.deltas[::-1])  # xyz -> zyx
    if "score_threshold" not in kwargs:
        kwargs["score_threshold"] = float(
            logit(request.inference_options.move_threshold))
    return lambda canvas: policy_class(canvas, **kwargs)


class MovementRestrictor:
    """Excludes masked voxels / distorted regions from segmentation."""

    def __init__(self, mask: Optional[np.ndarray] = None,
                 shift_mask: Optional[np.ndarray] = None,
                 shift_mask_fov: Optional[bbox_lib.BoundingBox] = None,
                 shift_mask_threshold: int = 4,
                 shift_mask_scale: int = 1,
                 seed_mask: Optional[np.ndarray] = None):
        """Args:
          mask: (z, y, x); positive values exclude voxels from segmentation
          shift_mask: (2, z, y, x) 2d shift vector field
          shift_mask_fov: XYZ box around large shifts where movement is
            restricted (start may be negative)
          shift_mask_threshold: shift magnitude at/above which a location is
            excluded
          shift_mask_scale: how much larger shift-mask pixels are vs data
          seed_mask: (z, y, x); positive values exclude seed placement
        """
        self.mask = mask
        self.seed_mask = seed_mask
        self._shift_mask_scale = shift_mask_scale
        self.shift_mask = None
        if shift_mask is not None:
            self.shift_mask = (
                np.max(np.abs(shift_mask), axis=0) >= shift_mask_threshold)
            assert shift_mask_fov is not None
            self._fov_pre_offset = shift_mask_fov.start[::-1]
            self._fov_post_offset = shift_mask_fov.end[::-1] - 1

    def dense_invalid_mask(self, shape_zyx) -> Optional[np.ndarray]:
        """Evaluates is_valid_pos at EVERY voxel of a (z, y, x) volume;
        returns a bool array (True = excluded) or None if unrestricted.

        The shift-mask check is a windowed any() query around each
        position; evaluated densely via a summed-volume table (one O(1)
        8-term query per voxel, vectorized with per-axis index arrays —
        the window bounds along each axis depend only on that axis's
        coordinate). This is what lets device-resident engines fold the
        whole restrictor into a per-voxel blocked volume (hop path)
        instead of querying windows per move (ref movement.py:247-336).
        """
        if self.mask is None and self.shift_mask is None:
            return None
        invalid = np.zeros(tuple(shape_zyx), bool)
        if self.mask is not None:
            invalid |= self.mask.astype(bool)
        if self.shift_mask is not None:
            from ffn_tpu.training.partitions import summed_volume_table
            svt = summed_volume_table(self.shift_mask.astype(np.int64))
            sm_shape = self.shift_mask.shape
            bounds = []
            for axis in range(3):
                pos = np.arange(shape_zyx[axis])
                lo = np.maximum(pos + self._fov_pre_offset[axis], 0)
                hi = pos + self._fov_post_offset[axis]
                if axis > 0:   # y/x live on the scaled shift-mask grid
                    lo = lo // self._shift_mask_scale
                    hi = hi // self._shift_mask_scale
                lo = np.clip(lo, 0, sm_shape[axis])
                hi = np.clip(hi + 1, 0, sm_shape[axis])
                bounds.append((lo, np.maximum(hi, lo)))
            (zl, zh), (yl, yh), (xl, xh) = bounds

            def S(a, b, c):
                return svt[a[:, None, None], b[None, :, None],
                           c[None, None, :]]

            count = S(zh, yh, xh)
            count -= S(zl, yh, xh)
            count -= S(zh, yl, xh)
            count -= S(zh, yh, xl)
            count += S(zl, yl, xh)
            count += S(zl, yh, xl)
            count += S(zh, yl, xl)
            count -= S(zl, yl, xl)
            invalid |= count > 0
        return invalid

    def is_valid_seed(self, pos) -> bool:
        if self.seed_mask is not None and self.seed_mask[pos]:
            return False
        return True

    def is_valid_pos(self, pos) -> bool:
        if self.mask is not None and self.mask[pos]:
            return False

        if self.shift_mask is not None:
            np_pos = np.array(pos)
            fov_low = np.maximum(np_pos + self._fov_pre_offset, 0)
            fov_high = np_pos + self._fov_post_offset
            start = fov_low // self._shift_mask_scale
            end = fov_high // self._shift_mask_scale
            if np.any(self.shift_mask[
                    fov_low[0]:(fov_high[0] + 1),
                    start[1]:(end[1] + 1),
                    start[2]:(end[2] + 1)]):
                return False
        return True

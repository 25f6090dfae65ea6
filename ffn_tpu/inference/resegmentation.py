"""Resegmentation: re-running flood fill from deep seeds inside candidate
merge partners, to score agglomeration decisions.

Output/behavior contract matches the reference's
ffn/inference/resegmentation.py: EDT-max seed selection with exclusion
radius (:37), output path scheme `id_a-id_b_at_x_y_z.npz` with md5 subdirs
(:48), canvas setup clearing the two segments (:82-175), the
retry-until-recovered loop (:193-277), and the saved npz schema
(probs/raw_probs/deletes/histories/start_points/...). The implementation
is organized around three small components: a SeedSelector that owns the
distance map, a RecoveryCriterion for the analysis-box test, and a result
accumulator.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
from typing import Optional

from absl import logging
import numpy as np
from scipy.special import expit

from ffn_tpu.inference import storage
from ffn_tpu.inference.counters import timer_counter
from ffn_tpu.utils import bounding_box


class SeedSelector:
    """Draws flood-fill restart points from the deep interior of a mask.

    Owns a Euclidean distance transform of the mask; every draw takes the
    current EDT argmax and clears an exclusion box around it so later
    draws spread out. Boxes at the canvas margin (insufficient FFN
    context) and around the decision point are pre-cleared.
    """

    def __init__(self, mask: np.ndarray, voxel_size, margin_zyx,
                 exclusion_radius, point_zyx=None,
                 init_exclusion_radius=None):
        from ffn_tpu.ops import edt as edt_lib
        with np.errstate(all="ignore"):
            self._dists = edt_lib.edt(mask, anisotropy=voxel_size)
        self._er = exclusion_radius
        mz, my, mx = (int(v) for v in margin_zyx)
        for axis, m in enumerate((mz, my, mx)):
            if m <= 0:
                continue
            lo = [slice(None)] * 3
            hi = [slice(None)] * 3
            lo[axis] = slice(0, m)
            hi[axis] = slice(-m, None)
            self._dists[tuple(lo)] = 0
            self._dists[tuple(hi)] = 0
        if init_exclusion_radius is not None and point_zyx is not None:
            self._clear_box(point_zyx, init_exclusion_radius)

    def _clear_box(self, center_zyx, radius):
        z, y, x = (int(v) for v in center_zyx)
        self._dists[max(z - radius.z, 0):z + radius.z + 1,
                    max(y - radius.y, 0):y + radius.y + 1,
                    max(x - radius.x, 0):x + radius.x + 1] = 0

    def draw(self):
        """Returns the deepest remaining point (z, y, x) and excludes its
        neighborhood from future draws."""
        pos = np.unravel_index(int(np.argmax(self._dists)),
                               self._dists.shape)
        self._clear_box(pos, self._er)
        return pos


@dataclasses.dataclass
class RecoveryCriterion:
    """Decides whether a resegmentation attempt recovered its object,
    measured inside the analysis box. With a recovery fraction the test is
    relative to the object's size; otherwise absolute (min_segment_size)."""

    analysis_slice: tuple
    segment_threshold: float
    recovery_fraction: float
    min_segment_size: int

    def recovered_voxels(self, prob: np.ndarray, mask: np.ndarray) -> int:
        crop_prob = prob[self.analysis_slice]
        crop_mask = mask[self.analysis_slice]
        return int(np.sum((crop_prob >= self.segment_threshold)
                          & crop_mask))

    def is_recovered(self, prob: np.ndarray, mask: np.ndarray) -> bool:
        got = self.recovered_voxels(prob, mask)
        if self.recovery_fraction > 0:
            want = max(int(np.sum(mask[self.analysis_slice])), 1)
            return got / want >= self.recovery_fraction
        return got >= self.min_segment_size


def get_starting_location(dists, exclusion_radius):
    """Argmax of a caller-owned distance map; clears an exclusion box
    around it (thin compatibility wrapper over SeedSelector logic)."""
    z, y, x = np.unravel_index(int(np.argmax(dists)), tuple(dists.shape))
    er = exclusion_radius
    dists[max(z - er.z, 0):z + er.z + 1,
          max(y - er.y, 0):y + er.y + 1,
          max(x - er.x, 0):x + er.x + 1] = 0
    return z, y, x


def get_target_path(request, point_num: int) -> Optional[str]:
    """Output path for one resegmentation point; None if already done."""
    pair = request.points[point_num]
    parts = [request.output_directory]
    if request.subdir_digits > 1:
        digest = hashlib.md5()
        digest.update(str(pair.id_a).encode())
        digest.update(str(pair.id_b).encode())
        parts.append(digest.hexdigest()[:request.subdir_digits])
    out_dir = os.path.join(*parts)
    os.makedirs(out_dir, exist_ok=True)

    p = pair.point
    path = os.path.join(
        out_dir, f"{pair.id_a}-{pair.id_b}_at_{p.x}_{p.y}_{p.z}.npz")
    if os.path.exists(path):
        logging.info("Output already exists: %s", path)
        return None
    return path


def get_canvas(point, radius, runner):
    """Creates the canvas around a decision point ((z,y,x) + radius)."""
    corner = np.asarray(point) - np.asarray(radius)
    size = 2 * np.asarray(radius) + 1
    end = corner + size
    seg_shape = np.asarray(runner.init_seg_volume.shape[-3:])
    if np.any(corner < 0) or np.any(end >= seg_shape):
        logging.error("Not enough context for: %d, %d, %d; corner: %r; "
                      "end: %r", point[2], point[1], point[0], corner, end)
        return None, None
    return runner.make_canvas(tuple(corner), tuple(size),
                              keep_history=True,
                              keep_probability_maps=True,
                              force_serial=True)


class _ResultWriter:
    """Accumulates per-object resegmentation outputs and writes the npz."""

    def __init__(self, num_objects: int):
        self.raw_probs = []
        self.probs = []
        self.deletes = []
        self.histories = []
        self.start_points = [[] for _ in range(num_objects)]

    def record_attempt(self, obj_index: int, start_zyx):
        z, y, x = start_zyx
        self.start_points[obj_index].append((x, y, z))

    def record_probabilities(self, canvas, unalign):
        qprob = storage.quantize_probability(expit(canvas.seed))
        self.raw_probs.append(qprob)
        self.probs.append(unalign(qprob))
        self.deletes.append(np.array(canvas.history_deleted))
        self.histories.append(np.array(canvas.history))

    def save(self, path, request, canvas, is_shift):
        logging.info("saving results to %s", path)
        with storage.atomic_file(path) as fd:
            np.savez_compressed(
                fd,
                probs=np.array(self.probs),
                raw_probs=np.array(self.raw_probs),
                deletes=np.array(self.deletes, dtype=object),
                histories=np.array(self.histories, dtype=object),
                start_points=np.array(self.start_points, dtype=object),
                request=request.SerializeToString(),
                counters=canvas.counters.dumps_np(),
                corner_zyx=canvas.corner_zyx,
                is_shift=is_shift)
        logging.info(".. save complete")


def _analysis_slice(request, radius_zyx, canvas) -> tuple:
    """Slice of the canvas used for recovery scoring: the analysis_radius
    box around the decision point, or the whole canvas."""
    if request.HasField("analysis_radius"):
        ar = request.analysis_radius
        box = bounding_box.BoundingBox(
            start=(radius_zyx[2] - ar.x, radius_zyx[1] - ar.y,
                   radius_zyx[0] - ar.z),
            size=(2 * ar.x + 1, 2 * ar.y + 1, 2 * ar.z + 1))
    else:
        box = bounding_box.BoundingBox((0, 0, 0), canvas.image.shape[::-1])
    return box.to_slice()


def process_point(request, runner, point_num: int, voxel_size):
    """Runs resegmentation for one decision point.

    For each of the (one or two) objects at the point: erase it from the
    canvas, restart flood fill from its deepest remaining location, and
    retry from successively shallower starts until the object is
    recovered (or max_retry_iters draws are spent). Saves probability
    maps + movement histories for downstream analysis.
    """
    with timer_counter(runner.counters, "resegmentation"):
        target_path = get_target_path(request, point_num)
        if target_path is None:
            return

        pair = request.points[point_num]
        point_zyx = (pair.point.z, pair.point.y, pair.point.x)
        radius_zyx = (request.radius.z, request.radius.y, request.radius.x)
        canvas, alignment = get_canvas(point_zyx, radius_zyx, runner)
        if canvas is None:
            logging.warning("Could not get a canvas object.")
            return

        is_endpoint = not pair.HasField("id_b")
        masks = [canvas.segmentation == canvas.local_id(pair.id_a)]
        if not is_endpoint:
            masks.append(canvas.segmentation == canvas.local_id(pair.id_b))
        if any(not m.any() for m in masks):
            logging.warning("Segments (%d, %d) not found in input at %r.",
                            pair.id_a, pair.id_b, point_zyx)
            return

        # Erase the objects under study; keep everything else as context
        # (endpoint mode studies a single object on a blank canvas).
        if is_endpoint:
            canvas.segmentation[:] = 0
            canvas.seg_prob[:] = 0
        else:
            for m in masks:
                canvas.segmentation[m] = 0
                canvas.seg_prob[m] = 0

        local_point = (
            alignment.transform(np.array([point_zyx]).T)[:, 0]
            - np.asarray(canvas.corner_zyx))

        options = request.inference.inference_options
        criterion = RecoveryCriterion(
            analysis_slice=_analysis_slice(request, radius_zyx, canvas),
            segment_threshold=options.segment_threshold,
            recovery_fraction=request.segment_recovery_fraction,
            min_segment_size=options.min_segment_size)

        def unalign(prob):
            return alignment.align_and_crop(
                canvas.corner_zyx, prob, alignment.corner, alignment.size,
                forward=False)

        results = _ResultWriter(len(masks))
        is_shift = (canvas.restrictor is not None
                    and canvas.restrictor.shift_mask is not None
                    and bool(np.any(canvas.restrictor.shift_mask)))

        for i, mask in enumerate(masks):
            logging.info("processing object %d", i)
            with timer_counter(canvas.counters, "edt"):
                selector = SeedSelector(
                    mask, voxel_size, canvas.margin,
                    request.exclusion_radius,
                    point_zyx=local_point,
                    init_exclusion_radius=(
                        request.init_exclusion_radius
                        if request.HasField("init_exclusion_radius")
                        else None))

            attempted = False
            recovered = False
            final_prob = None
            for _ in range(request.max_retry_iters):
                start = selector.draw()
                if not mask[start]:
                    continue  # deepest remaining point left the object
                logging.info(".. starting segmentation at (xyz): %d %d %d",
                             start[2], start[1], start[0])
                canvas.segment_at(start)
                attempted = True
                results.record_attempt(i, start)
                final_prob = expit(canvas.seed)
                if criterion.is_recovered(final_prob, mask):
                    recovered = True
                    break

            if attempted:
                results.record_probabilities(canvas, unalign)

            if request.terminate_early:
                if not recovered:
                    break
                # Pair mode with a recovery fraction: if object A's fill
                # already failed to recover object B, B's own run is moot.
                if (request.segment_recovery_fraction > 0 and i == 0
                        and len(masks) > 1 and final_prob is not None
                        and not criterion.is_recovered(final_prob,
                                                       masks[1])):
                    break

    results.save(target_path, request, canvas, is_shift)


def process(request, runner, voxel_size=(1, 1, 1)):
    """Processes every point in a ResegmentationRequest."""
    for i, _ in enumerate(request.points):
        logging.info("processing %d/%d", i, len(request.points))
        process_point(request, runner, i, voxel_size)

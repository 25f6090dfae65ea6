"""Resegmentation: re-running flood fill from deep seeds inside candidate
merge partners, to score agglomeration decisions.

Parity with the reference's ffn/inference/resegmentation.py: EDT-max seed
selection with exclusion radius (:37), output path scheme
`id_a-id_b_at_x_y_z.npz` with md5 subdirs (:48), canvas setup clearing the
two segments (:82-175), the retry-until-recovered loop (:193-277), and the
saved npz schema (probs/raw_probs/deletes/histories/start_points/...).
"""

from __future__ import annotations

import hashlib
import os

from absl import logging
import numpy as np
from scipy import ndimage
from scipy.special import expit

from ffn_tpu.inference import storage
from ffn_tpu.inference.counters import timer_counter
from ffn_tpu.utils import bounding_box


def get_starting_location(dists, exclusion_radius):
    """Argmax of the distance map; clears an exclusion box around it."""
    z, y, x = np.unravel_index(np.argmax(dists), tuple(dists.shape))
    er = exclusion_radius
    dists[max(z - er.z, 0):z + er.z + 1,
          max(y - er.y, 0):y + er.y + 1,
          max(x - er.x, 0):x + er.x + 1] = 0
    return z, y, x


def get_target_path(request, point_num: int):
    """Output path for one resegmentation point; None if already done."""
    output_dir = request.output_directory
    id_a = request.points[point_num].id_a
    id_b = request.points[point_num].id_b

    if request.subdir_digits > 1:
        m = hashlib.md5()
        m.update(str(id_a).encode())
        m.update(str(id_b).encode())
        output_dir = os.path.join(output_dir,
                                  m.hexdigest()[:request.subdir_digits])
    os.makedirs(output_dir, exist_ok=True)

    dp = request.points[point_num].point
    target_path = os.path.join(output_dir, "%d-%d_at_%d_%d_%d.npz" % (
        id_a, id_b, dp.x, dp.y, dp.z))
    if os.path.exists(target_path):
        logging.info("Output already exists: %s", target_path)
        return None
    return target_path


def get_canvas(point, radius, runner):
    """Creates the canvas around a decision point ((z,y,x) + radius)."""
    origin = np.array(point)
    radius = np.array(radius)
    corner = origin - radius
    subvol_size = radius * 2 + 1
    end = subvol_size + corner

    if (np.any(corner < 0)
            or runner.init_seg_volume.shape[1] <= end[0]
            or runner.init_seg_volume.shape[2] <= end[1]
            or runner.init_seg_volume.shape[3] <= end[2]):
        logging.error("Not enough context for: %d, %d, %d; corner: %r; "
                      "end: %r", point[2], point[1], point[0], corner, end)
        return None, None

    return runner.make_canvas(tuple(corner), tuple(subvol_size),
                              keep_history=True,
                              keep_probability_maps=True,
                              force_serial=True)


def process_point(request, runner, point_num: int, voxel_size):
    """Runs resegmentation for one point.

    Args:
      request: ResegmentationRequest proto
      runner: inference Runner (started with init_segmentation)
      point_num: index into request.points
      voxel_size: (z, y, x) physical voxel size
    """
    with timer_counter(runner.counters, "resegmentation"):
        target_path = get_target_path(request, point_num)
        if target_path is None:
            return

        curr = request.points[point_num]
        point = curr.point.z, curr.point.y, curr.point.x
        radius = (request.radius.z, request.radius.y, request.radius.x)
        canvas, alignment = get_canvas(point, radius, runner)
        if canvas is None:
            logging.warning("Could not get a canvas object.")
            return

        def unalign_prob(prob):
            return alignment.align_and_crop(
                canvas.corner_zyx, prob, alignment.corner, alignment.size,
                forward=False)

        is_shift = (canvas.restrictor is not None
                    and canvas.restrictor.shift_mask is not None
                    and np.any(canvas.restrictor.shift_mask))
        is_endpoint = not curr.HasField("id_b")

        seg_a = canvas.segmentation == canvas.local_id(curr.id_a)
        size_a = np.sum(seg_a)
        if is_endpoint:
            size_b = -1
            todo = [seg_a]
        else:
            seg_b = canvas.segmentation == canvas.local_id(curr.id_b)
            size_b = np.sum(seg_b)
            todo = [seg_a, seg_b]

        if size_a == 0 or size_b == 0:
            logging.warning(
                "Segments (%d, %d) not found in input at %r.",
                curr.id_a, curr.id_b, point)
            return

        if is_endpoint:
            canvas.seg_prob[:] = 0
            canvas.segmentation[:] = 0
        else:
            # Clear the two segments; keep everything else as context.
            canvas.segmentation[seg_a] = 0
            canvas.segmentation[seg_b] = 0
            canvas.seg_prob[seg_a] = 0
            canvas.seg_prob[seg_b] = 0

        transformed_point = alignment.transform(np.array([point]).T)
        tz, ty, tx = transformed_point[:, 0]
        oz, oy, ox = canvas.corner_zyx
        tz -= oz
        ty -= oy
        tx -= ox

        raw_probs = []
        probs = []
        deletes = []
        histories = []
        start_points = [[], []]

        if request.HasField("analysis_radius"):
            ar = request.analysis_radius
            analysis_box = bounding_box.BoundingBox(
                start=(radius[2] - ar.x, radius[1] - ar.y,
                       radius[0] - ar.z),
                size=(2 * ar.x + 1, 2 * ar.y + 1, 2 * ar.z + 1))
        else:
            analysis_box = bounding_box.BoundingBox(
                (0, 0, 0), canvas.image.shape[::-1])

        options = request.inference.inference_options
        for i, seg in enumerate(todo):
            logging.info("processing object %d", i)
            with timer_counter(canvas.counters, "edt"):
                from ffn_tpu.ops import edt as edt_lib
                dists = edt_lib.edt(seg, anisotropy=voxel_size)
                # No seeding where context is insufficient.
                dists[:canvas.margin[0], :, :] = 0
                dists[:, :canvas.margin[1], :] = 0
                dists[:, :, :canvas.margin[2]] = 0
                dists[-canvas.margin[0]:, :, :] = 0
                dists[:, -canvas.margin[1]:, :] = 0
                dists[:, :, -canvas.margin[2]:] = 0

            if request.HasField("init_exclusion_radius"):
                ier = request.init_exclusion_radius
                dists[tz - ier.z:tz + ier.z + 1,
                      ty - ier.y:ty + ier.y + 1,
                      tx - ier.x:tx + ier.x + 1] = 0

            seg_prob = None
            recovered = False
            crop_prob = None

            for _ in range(request.max_retry_iters):
                z0, y0, x0 = get_starting_location(
                    dists, request.exclusion_radius)
                if not seg[z0, y0, x0]:
                    continue

                logging.info(".. starting segmentation at (xyz): "
                             "%d %d %d", x0, y0, z0)
                canvas.segment_at((z0, y0, x0))
                seg_prob = expit(canvas.seed)
                start_points[i].append((x0, y0, z0))

                recovered = True
                crop_seg = seg[analysis_box.to_slice()]
                crop_prob = seg_prob[analysis_box.to_slice()]
                start_size = np.sum(crop_seg)
                segmented_voxels = np.sum(
                    (crop_prob >= options.segment_threshold) & crop_seg)
                if request.segment_recovery_fraction > 0:
                    if (segmented_voxels / start_size
                            >= request.segment_recovery_fraction):
                        break
                elif segmented_voxels >= options.min_segment_size:
                    break
                recovered = False

            if seg_prob is not None:
                qprob = storage.quantize_probability(seg_prob)
                raw_probs.append(qprob)
                probs.append(unalign_prob(qprob))
                deletes.append(np.array(canvas.history_deleted))
                histories.append(np.array(canvas.history))

            if request.terminate_early:
                if not recovered:
                    break
                if (request.segment_recovery_fraction > 0 and i == 0
                        and len(todo) > 1 and crop_prob is not None):
                    seg2 = todo[1]
                    crop_seg2 = seg2[analysis_box.to_slice()]
                    size2 = np.sum(crop_seg2)
                    segmented_voxels2 = np.sum(
                        (crop_prob >= options.segment_threshold)
                        & crop_seg2)
                    if (segmented_voxels2 / size2
                            < request.segment_recovery_fraction):
                        break

    logging.info("saving results to %s", target_path)
    with storage.atomic_file(target_path) as fd:
        np.savez_compressed(
            fd,
            probs=np.array(probs),
            raw_probs=np.array(raw_probs),
            deletes=np.array(deletes, dtype=object),
            histories=np.array(histories, dtype=object),
            start_points=np.array(start_points, dtype=object),
            request=request.SerializeToString(),
            counters=canvas.counters.dumps(),
            corner_zyx=canvas.corner_zyx,
            is_shift=is_shift)
    logging.info(".. save complete")


def process(request, runner, voxel_size=(1, 1, 1)):
    """Processes every point in a ResegmentationRequest."""
    num_points = len(request.points)
    for i in range(num_points):
        logging.info("processing %d/%d", i, num_points)
        process_point(request, runner, i, voxel_size)

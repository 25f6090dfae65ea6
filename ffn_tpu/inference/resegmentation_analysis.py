"""Analysis of resegmentation results -> agglomeration decisions.

Functional parity with the reference's
ffn/inference/resegmentation_analysis.py (:30-260), which imports
google-internal modules and cannot run as shipped; overlap counting here
goes through ffn_tpu.utils.labels.compute_overlap_counts instead of
pywrapsegment_util. Accept/reject calibration rules are documented in the
reference's doc/manual.md:194-216.

Structure: resegmentation.process_point writes one npz per analyzed
point (see resegmentation.py); `PointResult.load` parses it back into
arrays, and the two `evaluate_*` entry points reduce those arrays plus
the base segmentation into result protos.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Sequence, Tuple

from absl import logging
import numpy as np
from scipy import ndimage

from ffn_tpu.inference import storage
from ffn_tpu.proto import resegmentation_pb2
from ffn_tpu.utils import labels as labels_lib


class InvalidBaseSegmentationError(Exception):
    pass


class IncompleteResegmentationError(Exception):
    pass


_FILENAME_RE = re.compile(r"(\d+)-(\d+)_at_(\d+)_(\d+)_(\d+)")


def parse_resegmentation_filename(filename: str):
    """Extracts (id_a, id_b, x, y, z) from a resegmentation npz name."""
    logging.info("processing: %s", filename)
    match = _FILENAME_RE.search(filename)
    if match is None:
        raise ValueError(f"unparseable resegmentation filename: "
                         f"{filename}")
    return tuple(int(g) for g in match.groups())


def _centered_slices(center_zyx: Sequence[int],
                     radius_zyx: Sequence[int]) -> Tuple[slice, ...]:
    """Slices of the closed box center +- radius (per axis, zyx)."""
    return tuple(slice(c - r, c + r + 1)
                 for c, r in zip(center_zyx, radius_zyx))


def _drop_channel(seg: np.ndarray) -> np.ndarray:
    return seg[0, ...] if seg.ndim == 4 else seg


def _max_edt(mask: np.ndarray, sampling) -> float:
    """Largest distance-to-background inside the mask (physical units).
    Proxy for 'how thick is the recovered object' (manual.md:203)."""
    return float(ndimage.distance_transform_edt(
        mask, sampling=sampling).max())


def compute_iou(reseg: np.ndarray) -> float:
    """Jaccard index of two object masks, shape [2, z, y, x]."""
    return (np.sum(reseg[0, ...] & reseg[1, ...])
            / float(np.sum(np.max(reseg, axis=0))))


@dataclasses.dataclass
class PointResult:
    """One resegmentation npz, parsed (written by
    resegmentation.process_point)."""
    id_a: int
    id_b: int
    center_xyz: Tuple[int, int, int]
    prob: np.ndarray          # (n_obj, z, y, x) float, NaN -> 0
    deletes: np.ndarray       # (n_obj, n_moves) deleted-voxel counts
    histories: np.ndarray     # (n_obj, n_moves, 3) executed moves (zyx)
    start_points: np.ndarray  # (n_obj, n_tries, 3) seed positions (xyz)

    @classmethod
    def load(cls, filename: str) -> "PointResult":
        id_a, id_b, x, y, z = parse_resegmentation_filename(filename)
        with open(filename, "rb") as f:
            data = np.load(f, allow_pickle=True)
            prob = np.nan_to_num(
                storage.dequantize_probability(data["probs"]))
            return cls(id_a=id_a, id_b=id_b, center_xyz=(x, y, z),
                       prob=prob, deletes=data["deletes"],
                       histories=data["histories"],
                       start_points=data["start_points"])

    def crop_to_analysis_box(self, reseg_radius, analysis_radius):
        """The probability maps cover center +- reseg_radius; analysis
        happens on the smaller center +- analysis_radius box. Returns
        (cropped prob, offset of the analysis box inside the maps)."""
        offset = np.asarray(reseg_radius) - np.asarray(analysis_radius)
        box = tuple(slice(o, o + 2 * r + 1)
                    for o, r in zip(offset, analysis_radius))
        return self.prob[(slice(None),) + box], offset


def evaluate_segmentation_result(reseg, dels, moves, delta, analysis_r,
                                 seg1, seg2, sampling, result):
    """Fills a SegmentResult proto: how much of each original object the
    resegmented mask recovers, and which moves deleted voxels inside the
    analysis box."""
    result.max_edt = _max_edt(reseg, sampling)
    moves = np.asarray(moves)
    if moves.size > 0:
        # Moves are recorded in reseg-map coordinates; count deletions
        # from moves whose FOV center landed inside the analysis box.
        lo = np.asarray(delta)
        hi = lo + 2 * np.asarray(analysis_r)
        inside = np.all((moves >= lo) & (moves <= hi), axis=1)
        result.deleted_voxels = int(np.sum(np.asarray(dels)[inside]))

    result.num_voxels = int(np.sum(reseg))
    result.segment_a_consistency = float(np.sum(reseg[seg1])) / np.sum(seg1)
    result.segment_b_consistency = float(np.sum(reseg[seg2])) / np.sum(seg2)


def evaluate_endpoint_resegmentation(filename, seg_volume,
                                     resegmentation_radius,
                                     threshold: float = 0.5):
    """Evaluates an endpoint (single-object extension) resegmentation;
    returns EndpointResegmentationResult."""
    point = PointResult.load(filename)
    x, y, z = point.center_xyz
    radius_zyx = tuple(resegmentation_radius)

    result = resegmentation_pb2.EndpointResegmentationResult()
    result.id = point.id_a
    result.start.x, result.start.y, result.start.z = x, y, z
    sr = result.segmentation_radius
    sr.z, sr.y, sr.x = radius_zyx

    orig_seg = _drop_channel(
        seg_volume[(slice(0, 1),) + _centered_slices((z, y, x),
                                                     radius_zyx)])
    if not np.any(orig_seg == point.id_a):
        raise InvalidBaseSegmentationError()

    new_mask = point.prob[0, ...] >= threshold
    result.num_voxels = int(np.sum(new_mask))

    overlaps = labels_lib.compute_overlap_counts(
        orig_seg.ravel(), new_mask.astype(np.uint64).ravel())
    for (old, new), count in overlaps.items():
        if not new:
            continue
        result.overlaps[old].num_overlapping = count
        result.overlaps[old].num_original = int(np.sum(orig_seg == old))
        if old == point.id_a:
            result.source.CopyFrom(result.overlaps[old])
    return result


def evaluate_pair_resegmentation(filename, seg_volume,
                                 resegmentation_radius, analysis_radius,
                                 voxel_size, threshold: float = 0.5):
    """Evaluates a segment-pair resegmentation; returns
    PairResegmentationResult (IoU + consistency + deleted-voxel stats)."""
    point = PointResult.load(filename)
    if point.prob.shape[0] != 2:
        raise IncompleteResegmentationError()
    assert point.prob.ndim == 4
    x, y, z = point.center_xyz

    result = resegmentation_pb2.PairResegmentationResult()
    result.id_a, result.id_b = point.id_a, point.id_b
    result.point.x, result.point.y, result.point.z = x, y, z
    sr = result.segmentation_radius
    sr.z, sr.y, sr.x = tuple(resegmentation_radius)

    # Seed origins of the final (successful) attempt, reseg-map -> global.
    map_corner_xyz = np.array([x, y, z]) - np.array(
        resegmentation_radius)[::-1]
    for origin_proto, tries in ((result.eval.from_a.origin,
                                 point.start_points[0]),
                                (result.eval.from_b.origin,
                                 point.start_points[1])):
        global_xyz = np.asarray(tries[-1], np.int64) + map_corner_xyz
        origin_proto.x, origin_proto.y, origin_proto.z = (
            int(v) for v in global_xyz)

    analysis_r = np.asarray(analysis_radius)
    r = result.eval.radius
    r.z, r.y, r.x = (int(v) for v in analysis_r)

    base = _drop_channel(
        seg_volume[(slice(0, 1),) + _centered_slices((z, y, x),
                                                     analysis_r)])
    masks = {"a": base == point.id_a, "b": base == point.id_b}
    result.eval.num_voxels_a = int(np.sum(masks["a"]))
    result.eval.num_voxels_b = int(np.sum(masks["b"]))
    if not (result.eval.num_voxels_a and result.eval.num_voxels_b):
        raise InvalidBaseSegmentationError()
    result.eval.max_edt_a = _max_edt(masks["a"], voxel_size)
    result.eval.max_edt_b = _max_edt(masks["b"], voxel_size)

    prob, offset = point.crop_to_analysis_box(resegmentation_radius,
                                              analysis_r)
    reseg = prob >= threshold
    result.eval.iou = compute_iou(reseg)

    for i, seg_result in enumerate((result.eval.from_a,
                                    result.eval.from_b)):
        evaluate_segmentation_result(
            reseg[i, ...], point.deletes[i], point.histories[i], offset,
            analysis_r, masks["a"], masks["b"], voxel_size, seg_result)
    return result

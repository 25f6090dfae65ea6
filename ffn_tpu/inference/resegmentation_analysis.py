"""Analysis of resegmentation results -> agglomeration decisions.

Parity with the reference's ffn/inference/resegmentation_analysis.py
(:30-260). The reference file imports google-internal modules and cannot
run as shipped; this version replaces pywrapsegment_util with
ffn_tpu.utils.labels.compute_overlap_counts. Accept/reject calibration
rules are documented in the reference's doc/manual.md:194-216.
"""

from __future__ import annotations

import re

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


def compute_iou(reseg: np.ndarray) -> float:
    """Jaccard index of two object masks, shape [2, z, y, x]."""
    return (np.sum(reseg[0, ...] & reseg[1, ...])
            / float(np.sum(np.max(reseg, axis=0))))


def evaluate_segmentation_result(reseg, dels, moves, delta, analysis_r,
                                 seg1, seg2, sampling, result):
    """Populates a SegmentResult proto comparing reseg to the originals."""
    result.max_edt = float(ndimage.distance_transform_edt(
        reseg, sampling=sampling).max())
    moves = np.asarray(moves)
    dels = np.asarray(dels)
    if moves.size > 0:
        corner0_zyx = np.array(delta)
        corner1_zyx = np.array(delta) + 2 * np.array(analysis_r)
        mask = np.all((moves >= corner0_zyx[np.newaxis, ...])
                      & (moves <= corner1_zyx[np.newaxis, ...]), axis=1)
        result.deleted_voxels = int(np.sum(dels[mask]))

    result.num_voxels = int(np.sum(reseg))
    result.segment_a_consistency = float(np.sum(reseg[seg1])) / np.sum(seg1)
    result.segment_b_consistency = float(np.sum(reseg[seg2])) / np.sum(seg2)


def parse_resegmentation_filename(filename: str):
    logging.info("processing: %s", filename)
    id1, id2, x, y, z = [
        int(t) for t in
        re.search(r"(\d+)-(\d+)_at_(\d+)_(\d+)_(\d+)", filename).groups()]
    return id1, id2, x, y, z


def evaluate_endpoint_resegmentation(filename, seg_volume,
                                     resegmentation_radius,
                                     threshold: float = 0.5):
    """Evaluates endpoint resegmentation; returns
    EndpointResegmentationResult."""
    id1, _, x, y, z = parse_resegmentation_filename(filename)

    result = resegmentation_pb2.EndpointResegmentationResult()
    result.id = id1
    result.start.x, result.start.y, result.start.z = x, y, z
    sr = result.segmentation_radius
    sr.z, sr.y, sr.x = resegmentation_radius

    with open(filename, "rb") as f:
        data = np.load(f, allow_pickle=True)
        prob = storage.dequantize_probability(data["probs"])
        prob = np.nan_to_num(prob)

    orig_seg = seg_volume[0,
                          (z - sr.z):(z + sr.z + 1),
                          (y - sr.y):(y + sr.y + 1),
                          (x - sr.x):(x + sr.x + 1)]
    if orig_seg.ndim == 4:
        orig_seg = orig_seg[0, ...]
    seg1 = orig_seg == id1
    if not np.any(seg1):
        raise InvalidBaseSegmentationError()

    new_seg = prob[0, ...] >= threshold
    result.num_voxels = int(np.sum(new_seg))

    overlaps = labels_lib.compute_overlap_counts(
        orig_seg.ravel(), new_seg.astype(np.uint64).ravel())
    for (old, new), v in overlaps.items():
        if not new:
            continue
        result.overlaps[old].num_overlapping = v
        result.overlaps[old].num_original = int(np.sum(orig_seg == old))
        if old == id1:
            result.source.CopyFrom(result.overlaps[old])
    return result


def evaluate_pair_resegmentation(filename, seg_volume,
                                 resegmentation_radius, analysis_radius,
                                 voxel_size, threshold: float = 0.5):
    """Evaluates a segment-pair resegmentation; returns
    PairResegmentationResult (IoU + consistency + deleted-voxel stats)."""
    id1, id2, x, y, z = parse_resegmentation_filename(filename)

    result = resegmentation_pb2.PairResegmentationResult()
    result.id_a, result.id_b = id1, id2
    result.point.x, result.point.y, result.point.z = x, y, z
    sr = result.segmentation_radius
    sr.z, sr.y, sr.x = resegmentation_radius

    with open(filename, "rb") as f:
        data = np.load(f, allow_pickle=True)
        prob = storage.dequantize_probability(data["probs"])
        prob = np.nan_to_num(prob)
        dels = data["deletes"]
        moves = data["histories"]      # z, y, x
        start_points = data["start_points"]  # x, y, z

    if prob.shape[0] != 2:
        raise IncompleteResegmentationError()
    assert prob.ndim == 4

    corner = np.array([x - sr.x, y - sr.y, z - sr.z])
    origin_a = np.array(start_points[0][-1], dtype=np.int64) + corner
    origin_b = np.array(start_points[1][-1], dtype=np.int64) + corner
    oa = result.eval.from_a.origin
    oa.x, oa.y, oa.z = (int(v) for v in origin_a)
    ob = result.eval.from_b.origin
    ob.x, ob.y, ob.z = (int(v) for v in origin_b)

    analysis_r = np.array(analysis_radius)
    r = result.eval.radius
    r.z, r.y, r.x = (int(v) for v in analysis_r)

    seg = seg_volume[0,
                     (z - analysis_r[0]):(z + analysis_r[0] + 1),
                     (y - analysis_r[1]):(y + analysis_r[1] + 1),
                     (x - analysis_r[2]):(x + analysis_r[2] + 1)]
    if seg.ndim == 4:
        seg = seg[0, ...]
    seg1 = seg == id1
    seg2 = seg == id2
    result.eval.num_voxels_a = int(np.sum(seg1))
    result.eval.num_voxels_b = int(np.sum(seg2))
    if result.eval.num_voxels_a == 0 or result.eval.num_voxels_b == 0:
        raise InvalidBaseSegmentationError()

    result.eval.max_edt_a = float(ndimage.distance_transform_edt(
        seg1, sampling=voxel_size).max())
    result.eval.max_edt_b = float(ndimage.distance_transform_edt(
        seg2, sampling=voxel_size).max())

    delta = np.array(resegmentation_radius) - analysis_r
    prob = prob[:,
                delta[0]:(delta[0] + 2 * analysis_r[0] + 1),
                delta[1]:(delta[1] + 2 * analysis_r[1] + 1),
                delta[2]:(delta[2] + 2 * analysis_r[2] + 1)]
    reseg = prob >= threshold
    result.eval.iou = compute_iou(reseg)

    evaluate_segmentation_result(
        reseg[0, ...], dels[0], moves[0], delta, analysis_r, seg1, seg2,
        voxel_size, result.eval.from_a)
    evaluate_segmentation_result(
        reseg[1, ...], dels[1], moves[1], delta, analysis_r, seg1, seg2,
        voxel_size, result.eval.from_b)
    return result

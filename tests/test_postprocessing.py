"""Consensus, decision points, overlap counting, watershed expand."""

import numpy as np

from ffn_tpu.inference import consensus
from ffn_tpu.inference import storage
from ffn_tpu.proto import consensus_pb2
from ffn_tpu.utils import bounding_box
from ffn_tpu.utils import decision_point
from ffn_tpu.utils import labels


def test_watershed_expand():
    seg = np.zeros((10, 10, 10), np.uint64)
    seg[2, 2, 2] = 1
    seg[7, 7, 7] = 2
    expanded, edt = labels.watershed_expand(seg, (1, 1, 1))
    assert expanded[0, 0, 0] == 1
    assert expanded[9, 9, 9] == 2
    assert edt[2, 2, 2] == 0
    assert edt[3, 2, 2] == 1
    # Distance cap.
    capped, _ = labels.watershed_expand(seg, (1, 1, 1), max_distance=2.0)
    assert capped[5, 5, 5] == 0


def test_compute_overlap_counts():
    a = np.array([0, 1, 1, 2, 2, 2])
    b = np.array([0, 1, 3, 3, 3, 0])
    counts = labels.compute_overlap_counts(a, b)
    assert counts[(1, 1)] == 1
    assert counts[(1, 3)] == 1
    assert counts[(2, 3)] == 2
    assert counts[(2, 0)] == 1
    assert counts[(0, 0)] == 1


def test_decision_points():
    seg = np.zeros((20, 20, 20), np.uint64)
    seg[5:9, 5:15, 5:15] = 1
    seg[11:15, 5:15, 5:15] = 2   # 2 voxels gap along z
    points = decision_point.find_decision_points(seg, (1, 1, 1))
    assert (1, 2) in points
    dist, point = points[(1, 2)]
    x, y, z = point
    # The decision point lies in the gap between the slabs.
    assert 8 <= z <= 11
    assert dist <= 1.5


def test_decision_points_sparse_early_out():
    seg = np.zeros((10, 10, 10), np.uint64)
    seg[2:5, 2:5, 2:5] = 7
    assert decision_point.find_decision_points(
        seg, (1, 1, 1), optimize_sparse=True) == {}


def test_consensus_split(tmp_path):
    # Two runs: run1 merges two objects that run2 separates.
    dir1 = str(tmp_path / "run1")
    dir2 = str(tmp_path / "run2")
    out = str(tmp_path / "out")
    corner = (0, 0, 0)

    v1 = np.zeros((12, 12, 12), np.uint32)
    v1[2:10, 2:10, 2:5] = 1
    v1[2:10, 2:10, 6:10] = 1    # one id spanning both blocks
    v2 = np.zeros_like(v1)
    v2[2:10, 2:10, 2:5] = 5
    v2[2:10, 2:10, 6:10] = 9    # two ids

    storage.save_subvolume(
        v1, {1: storage.OriginInfo((3, 3, 3), 5, 0.5)},
        storage.segmentation_path(dir1, corner))
    storage.save_subvolume(v2, {}, storage.segmentation_path(dir2, corner))

    request = consensus_pb2.ConsensusRequest()
    request.segmentation1.directory = dir1
    request.segmentation2.directory = dir2
    request.segmentation_output_dir = out
    request.type = consensus_pb2.ConsensusRequest.CONSENSUS_SPLIT

    cons = consensus.save_consensus(corner, request)
    ids = np.unique(cons[cons > 0])
    assert len(ids) == 2
    # Saved and loadable.
    seg, origins = storage.load_segmentation(out, corner, split_cc=False)
    assert len(np.unique(seg[seg > 0])) == 2
    # Idempotent second call.
    assert consensus.save_consensus(corner, request) is None

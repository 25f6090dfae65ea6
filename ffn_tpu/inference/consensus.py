"""Consensus between two segmentation runs.

Parity with the reference's ffn/inference/consensus.py (:30-96): the
CONSENSUS_SPLIT mode intersects two segmentations (typically forward and
reverse seed-order runs) so only voxels both runs agree on keep a label —
the standard FFN oversegmentation-for-safety step.
"""

from __future__ import annotations

from absl import logging
import numpy as np

from ffn_tpu.inference import segmentation
from ffn_tpu.inference import storage
from ffn_tpu.proto import consensus_pb2


def compute_consensus_for_segmentations(v1, v2, request):
    """Computes consensus between two segmentation arrays (v1 modified)."""
    if request.type == consensus_pb2.ConsensusRequest.CONSENSUS_SPLIT:
        segmentation.split_segmentation_by_intersection(
            v1, v2, request.split_min_size)
        v1 = segmentation.reduce_id_bits(v1)
    else:
        raise ValueError(f"Unsupported mode: {request.type}")
    return v1


def compute_consensus(corner, request):
    """Computes consensus for one subvolume.

    Args:
      corner: (z, y, x) lower corner of the subvolume
      request: ConsensusRequest proto

    Returns:
      (consensus segmentation array, {id: OriginInfo}).
    """
    v1, v1_origins = storage.load_segmentation_from_source(
        request.segmentation1, corner)
    logging.info("consensus: v1 data loaded")
    v2, _ = storage.load_segmentation_from_source(
        request.segmentation2, corner)
    logging.info("consensus: v2 data loaded")

    v1 = compute_consensus_for_segmentations(v1, v2, request)

    relabeled_origins = {}
    for seg_id in np.unique(v1):
        seg_id = int(seg_id)
        if seg_id == 0:
            continue
        if seg_id in v1_origins:
            relabeled_origins[seg_id] = v1_origins[seg_id]
    return v1, relabeled_origins


def save_consensus(corner, request):
    """Computes and saves consensus for one subvolume (idempotent)."""
    import os

    seg_path = storage.segmentation_path(
        request.segmentation_output_dir, corner)
    if os.path.exists(seg_path):
        return None
    cons, origins = compute_consensus(corner, request)
    storage.save_subvolume(cons, origins, seg_path,
                           request=request.SerializeToString())
    return cons

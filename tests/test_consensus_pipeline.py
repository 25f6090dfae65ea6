"""Forward/reverse seed-order consensus pipeline (ref manual.md:129-142):
forward run -> PolicyInvertOrigins reverse run -> CONSENSUS_SPLIT,
end to end through the runner and per-subvolume npz files."""

import json
import os

import numpy as np

from ffn_tpu.inference import consensus as consensus_lib
from ffn_tpu.inference import runner as runner_lib
from ffn_tpu.inference import storage
from ffn_tpu.proto import consensus_pb2

from test_sharded_inference import make_setup


def test_forward_reverse_consensus_pipeline(tmp_path):
    request, _ = make_setup(tmp_path)
    request.concurrent_requests = 4
    corner, size = (0, 0, 0), (36, 36, 72)

    runner = runner_lib.Runner()
    runner.start(request)
    runner.run(corner, size, keep_probability_maps=False)
    fwd_dir = request.segmentation_output_dir
    fwd_seg, fwd_origins = storage.load_segmentation(fwd_dir, corner,
                                                     split_cc=False)
    assert len(fwd_origins) >= 3

    # Reverse pass: seeds = forward origins, visited in reverse order.
    rev = type(request)()
    rev.CopyFrom(request)
    rev.segmentation_output_dir = str(tmp_path / "seg_rev")
    rev.seed_policy = "PolicyInvertOrigins"
    rev.seed_policy_args = json.dumps({"segmentation_dir": fwd_dir})
    runner2 = runner_lib.Runner()
    runner2.start(rev)
    runner2.run(corner, size, keep_probability_maps=False)
    rev_seg, rev_origins = storage.load_segmentation(
        rev.segmentation_output_dir, corner, split_cc=False)
    assert len(rev_origins) >= 1
    # Every reverse origin came from the forward run's origin set (a
    # reverse flood can claim another origin's territory first, so the
    # reverse run may have FEWER objects — that is the point: consensus
    # splits those mergers back).
    fwd_starts = {tuple(int(v) for v in o.start_zyx)
                  for o in fwd_origins.values()}
    rev_starts = {tuple(int(v) for v in o.start_zyx)
                  for o in rev_origins.values()}
    assert rev_starts <= fwd_starts

    creq = consensus_pb2.ConsensusRequest()
    creq.segmentation1.directory = fwd_dir
    creq.segmentation2.directory = rev.segmentation_output_dir
    creq.segmentation_output_dir = str(tmp_path / "seg_cons")
    creq.type = consensus_pb2.ConsensusRequest.CONSENSUS_SPLIT
    creq.split_min_size = 5
    cons = consensus_lib.save_consensus(corner, creq)

    # CONSENSUS_SPLIT keeps only voxels BOTH runs labeled, split by the
    # (fwd, rev) id pair — reverse-run mergers come back apart.
    assert cons is not None
    both = (fwd_seg > 0) & (rev_seg > 0)
    assert np.all(both[cons > 0]), "consensus kept a disagreed voxel"
    assert (cons > 0).sum() >= 0.9 * both.sum()   # only dust removed
    # Consensus ids REFINE the (fwd, rev) id pairs: every output id
    # comes from exactly one pair (a pair may split into several ids —
    # the connected-component split inside CONSENSUS_SPLIT).
    sel = cons > 0
    pairs = set(zip(cons[sel].ravel().tolist(),
                    zip(fwd_seg[sel].ravel().tolist(),
                        rev_seg[sel].ravel().tolist())))
    assert len({c for c, _ in pairs}) == len(pairs)

    # Saved output is loadable + idempotent (second save is a no-op).
    loaded, origins = storage.load_segmentation(
        creq.segmentation_output_dir, corner, split_cc=False)
    assert (loaded > 0).sum() == (cons > 0).sum()
    assert consensus_lib.save_consensus(corner, creq) is None

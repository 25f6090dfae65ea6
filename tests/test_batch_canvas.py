"""BatchCanvas vs serial Canvas: same objects, same voxels."""

import numpy as np
from scipy.special import logit

from ffn_tpu.inference import batch_canvas as batch_canvas_lib
from ffn_tpu.inference import canvas as canvas_lib
from ffn_tpu.inference import engine as engine_lib
from ffn_tpu.models import oracle

from test_canvas_e2e import (DELTAS, FOV, GridSeeds, make_image,
                             make_options)


def make_engine(opts):
    model = oracle.ThresholdOracleModel(fov_size=[FOV] * 3,
                                        deltas=list(DELTAS))
    eng = engine_lib.FloodFillEngine(
        model, {}, pad_value=float(logit(opts.pad_value)),
        move_threshold=float(logit(opts.move_threshold)),
        disco_seed_threshold=opts.disco_seed_threshold)
    return model, eng


def segmentations_equivalent(a, b):
    """Same foreground and a bijective id mapping."""
    a = a.copy()
    b = b.copy()
    a[a < 0] = 0
    b[b < 0] = 0
    np.testing.assert_array_equal(a > 0, b > 0)
    pairs = set(zip(a[a > 0].ravel().tolist(), b[b > 0].ravel().tolist()))
    assert len({p[0] for p in pairs}) == len(pairs)
    assert len({p[1] for p in pairs}) == len(pairs)


def run_batch(lanes):
    image = make_image()
    opts = make_options()
    model, eng = make_engine(opts)
    bc = batch_canvas_lib.BatchCanvas(model.info, eng, image, opts,
                                      lanes=lanes, candidates_per_step=4)
    bc.segment_all(seed_policy=GridSeeds)
    return bc


def run_serial():
    image = make_image()
    opts = make_options()
    model, eng = make_engine(opts)
    cv = canvas_lib.Canvas(model.info, eng, image, opts)
    cv.segment_all(seed_policy=GridSeeds)
    return cv


def test_single_lane_matches_serial_canvas():
    bc = run_batch(lanes=1)
    cv = run_serial()
    segmentations_equivalent(bc.segmentation, cv.segmentation)
    # Iteration counts per object match too (same FIFO decisions).
    bc_iters = sorted(o.iters for o in bc.origins.values())
    cv_iters = sorted(o.iters for o in cv.origins.values())
    assert bc_iters == cv_iters


def test_multi_lane_matches_serial_on_separated_objects():
    # Multi-lane scheduling may start objects from different seeds than
    # the serial order (deferred-seed scheduling), which shifts the exact
    # voxel coverage under the tie-heavy oracle model; require
    # object-level equivalence and near-identical foreground instead.
    bc = run_batch(lanes=4)
    cv = run_serial()
    a = np.maximum(bc.segmentation, 0)
    b = np.maximum(cv.segmentation, 0)
    assert len(np.unique(a[a > 0])) == len(np.unique(b[b > 0]))
    inter = ((a > 0) & (b > 0)).sum()
    union = ((a > 0) | (b > 0)).sum()
    assert inter / union > 0.95
    # Majority-overlap matching is a bijection.
    from ffn_tpu.parallel import stitching
    pairs = stitching.match_ids_in_overlap(a.astype(np.uint64),
                                           b.astype(np.uint64), 0.5)
    assert len(pairs) == len(np.unique(a[a > 0]))


def test_batch_canvas_origins_and_overlaps():
    bc = run_batch(lanes=2)
    assert len(bc.origins) == 2
    for sid, info in bc.origins.items():
        assert bc.segmentation[tuple(info.start_zyx)] == sid
        assert info.iters > 0
    assert set(bc.overlaps) == set(bc.origins)

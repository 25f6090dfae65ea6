"""HopBatchCanvas (device-resident movement) vs serial/batched canvases."""

import numpy as np
from scipy.special import logit

from ffn_tpu.inference import batch_canvas as batch_canvas_lib
from ffn_tpu.inference import canvas as canvas_lib
from ffn_tpu.inference import hop_canvas as hop_canvas_lib
from ffn_tpu.inference import hop_engine as hop_engine_lib
from ffn_tpu.models import oracle

from test_batch_canvas import segmentations_equivalent
from test_canvas_e2e import (DELTAS, FOV, GridSeeds, make_image,
                             make_options)


def make_hop_engine(opts, queue_capacity=4096):
    model = oracle.ThresholdOracleModel(fov_size=[FOV] * 3,
                                        deltas=list(DELTAS))
    eng = hop_engine_lib.HopEngine(
        model, {}, pad_value=float(logit(opts.pad_value)),
        move_threshold=float(logit(opts.move_threshold)),
        disco_seed_threshold=opts.disco_seed_threshold,
        queue_capacity=queue_capacity)
    return model, eng


def run_hop(lanes, hops, compact_window=None, **kwargs):
    image = make_image()
    opts = make_options()
    model, eng = make_hop_engine(opts)
    hc = hop_canvas_lib.HopBatchCanvas(model.info, eng, image, opts,
                                       lanes=lanes, hops=hops, **kwargs)
    if compact_window is not None:
        hc._compact_window = compact_window
    hc.segment_all(seed_policy=GridSeeds)
    return hc


def run_serial():
    image = make_image()
    opts = make_options()
    model = oracle.ThresholdOracleModel(fov_size=[FOV] * 3,
                                        deltas=list(DELTAS))
    from ffn_tpu.inference import engine as engine_lib
    eng = engine_lib.FloodFillEngine(
        model, {}, pad_value=float(logit(opts.pad_value)),
        move_threshold=float(logit(opts.move_threshold)),
        disco_seed_threshold=opts.disco_seed_threshold)
    cv = canvas_lib.Canvas(model.info, eng, image, opts)
    cv.segment_all(seed_policy=GridSeeds)
    return cv


def test_single_lane_hops_match_serial_canvas():
    hc = run_hop(lanes=1, hops=8)
    cv = run_serial()
    segmentations_equivalent(hc.segmentation, cv.segmentation)
    hc_iters = sorted(o.iters for o in hc.origins.values())
    cv_iters = sorted(o.iters for o in cv.origins.values())
    assert hc_iters == cv_iters


def test_single_lane_hop_count_invariance():
    # The hop count is a scheduling knob, not a semantic one.
    a = run_hop(lanes=1, hops=3)
    b = run_hop(lanes=1, hops=17)
    np.testing.assert_array_equal(a.segmentation, b.segmentation)


def test_multi_lane_hops_object_equivalence():
    hc = run_hop(lanes=4, hops=8)
    cv = run_serial()
    a = np.maximum(hc.segmentation, 0)
    b = np.maximum(cv.segmentation, 0)
    assert len(np.unique(a[a > 0])) == len(np.unique(b[b > 0]))
    inter = ((a > 0) & (b > 0)).sum()
    union = ((a > 0) | (b > 0)).sum()
    assert inter / union > 0.95


def test_hop_matches_round_based_batch_canvas():
    # lanes=1: both paths must make identical FIFO decisions.
    hc = run_hop(lanes=1, hops=5)
    image = make_image()
    opts = make_options()
    from test_batch_canvas import make_engine
    model, eng = make_engine(opts)
    bc = batch_canvas_lib.BatchCanvas(model.info, eng, image, opts,
                                      lanes=1, candidates_per_step=4)
    bc.segment_all(seed_policy=GridSeeds)
    np.testing.assert_array_equal(hc.segmentation, bc.segmentation)


def test_iter_cap():
    hc = run_hop(lanes=2, hops=4, max_iters_per_segment=3)
    assert hc.counters["iter-cap-hit"].value > 0
    for info in hc.origins.values():
        assert info.iters <= 3


def test_bf16_seed_storage_equivalent_objects():
    """bf16 POM storage must produce the same objects on the oracle
    model (its logit levels are far from the thresholds, so bf16
    rounding cannot flip decisions)."""
    import jax.numpy as jnp

    image = make_image()
    opts = make_options()
    model, _ = make_hop_engine(opts)
    from ffn_tpu.inference import hop_engine as hel
    eng = hel.HopEngine(
        model, {}, pad_value=float(logit(opts.pad_value)),
        move_threshold=float(logit(opts.move_threshold)),
        disco_seed_threshold=opts.disco_seed_threshold,
        queue_capacity=4096, seed_dtype=jnp.bfloat16)
    from ffn_tpu.inference import hop_canvas as hcl
    hc = hcl.HopBatchCanvas(model.info, eng, image, opts, lanes=2, hops=8)
    hc.segment_all(seed_policy=GridSeeds)
    ref = run_hop(lanes=2, hops=8)
    np.testing.assert_array_equal(
        np.maximum(hc.segmentation, 0) > 0,
        np.maximum(ref.segmentation, 0) > 0)


def test_tail_compaction_preserves_results():
    """When seeds run out and most lanes idle, the canvas shrinks the
    lane batch; segmentation must be unaffected."""
    ref = run_hop(lanes=2, hops=4)
    # A 1-round window so the short post-exhaustion tail of this small
    # fixture still exercises compaction (production keeps the longer
    # default window).
    # seed_screening=False: with pre-screened seeds this small fixture
    # finishes before a post-exhaustion idle tail can form; compaction
    # targets exactly the unscreened tail dynamics.
    hc = run_hop(lanes=12, hops=4, compact_window=1,
                 seed_screening=False)
    assert hc.lanes < 12, "compaction did not trigger"
    a = np.maximum(hc.segmentation, 0)
    b = np.maximum(ref.segmentation, 0)
    assert len(np.unique(a[a > 0])) == len(np.unique(b[b > 0]))


def test_device_finalize_object_equivalence():
    """Single-canvas device-finalize (claims + verdicts + reseed in
    kernel) produces the same objects and coverage as host finalize."""
    dev = run_hop(lanes=4, hops=8, device_finalize=True)
    host = run_hop(lanes=4, hops=8, device_finalize=False)
    a = np.maximum(dev.segmentation, 0)
    b = np.maximum(host.segmentation, 0)
    assert len(np.unique(a[a > 0])) == len(np.unique(b[b > 0]))
    assert len(dev.origins) == len(host.origins)
    inter = ((a > 0) & (b > 0)).sum()
    union = ((a > 0) | (b > 0)).sum()
    assert inter / union > 0.95
    # Per-object 1:1 mapping (majority both ways).
    for x, y in ((a, b), (b, a)):
        for oid in np.unique(x[x > 0]):
            votes = y[x == oid].astype(np.int64)
            votes = votes[votes > 0]
            assert votes.size
            assert np.bincount(votes).max() / votes.size > 0.98


def test_compaction_off_switch_bit_exact(monkeypatch):
    """FFN_TPU_COMPACT=0 (the bit-exact replication switch for TPU/bf16
    runs; doc/parity_map.md deviations) forces the full-batch conv.
    On CPU/f32 both paths must produce identical segmentations, and the
    switch must actually select the single-bucket program."""
    ref = run_hop(lanes=4, hops=8)
    monkeypatch.setenv("FFN_TPU_COMPACT", "0")
    off = run_hop(lanes=4, hops=8)
    assert not off.engine.conv_compact
    assert ref.engine.conv_compact
    np.testing.assert_array_equal(off.segmentation, ref.segmentation)

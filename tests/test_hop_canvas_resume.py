"""HopBatchCanvas kill-and-resume: device-resident movement state
(FIFO queue, dedup grid, POM regions) survives a worker death; also
covers restoring a legacy round-based BatchCanvas checkpoint into hop
mode."""

import numpy as np
import pytest

from ffn_tpu.inference import batch_canvas as batch_canvas_lib
from ffn_tpu.inference import hop_canvas as hop_canvas_lib

from test_batch_canvas import make_engine
from test_canvas_e2e import GridSeeds, make_image, make_options
from test_hop_canvas import make_hop_engine, run_hop


class _Die(Exception):
    pass


def _interrupted_hop_canvas(cpoint, lanes=4, hops=3, die_after=4,
                            **kwargs):
    image = make_image()
    opts = make_options()
    model, eng = make_hop_engine(opts)
    hc = hop_canvas_lib.HopBatchCanvas(
        model.info, eng, image, opts, lanes=lanes, hops=hops,
        checkpoint_path=cpoint, checkpoint_interval_sec=1e-9, **kwargs)
    rounds = {"n": 0}
    orig = hc.save_checkpoint

    def save_and_maybe_die():
        orig(cpoint)
        rounds["n"] += 1
        if rounds["n"] >= die_after:
            raise _Die()

    hc.save_checkpoint = lambda path: save_and_maybe_die()
    with pytest.raises(_Die):
        hc.segment_all(seed_policy=GridSeeds)
    return hc, rounds


def test_hop_kill_and_resume_reproduces_segmentation(tmp_path):
    cpoint = str(tmp_path / "cpoint.npz")
    uninterrupted = run_hop(lanes=4, hops=3)

    hc, rounds = _interrupted_hop_canvas(cpoint)
    assert any(lane.num_iters > 0 for lane in hc._lanes) or hc.origins

    opts = make_options()
    model2, eng2 = make_hop_engine(opts)
    hc2 = hop_canvas_lib.HopBatchCanvas(
        model2.info, eng2, make_image(), opts, lanes=4, hops=3)
    hc2.restore_checkpoint(cpoint)
    in_flight = sum(1 for lane in hc2._lanes
                    if lane.state == batch_canvas_lib._RUNNING)
    hc2.segment_all(seed_policy=GridSeeds)

    np.testing.assert_array_equal(
        np.maximum(hc2.segmentation, 0),
        np.maximum(uninterrupted.segmentation, 0))
    assert sorted(o.iters for o in hc2.origins.values()) == \
        sorted(o.iters for o in uninterrupted.origins.values())
    assert in_flight > 0 or rounds["n"] >= 4


def test_legacy_batch_checkpoint_restores_into_hop_mode(tmp_path):
    """A worker upgraded from round-based to hop mode resumes a
    mid-flight round-based checkpoint without losing lane state."""
    cpoint = str(tmp_path / "cpoint.npz")
    image = make_image()
    opts = make_options()

    # Interrupted round-based run (lanes=1 so FIFO decisions are
    # identical across modes).
    model, eng = make_engine(opts)
    bc = batch_canvas_lib.BatchCanvas(
        model.info, eng, image, opts, lanes=1, candidates_per_step=4)
    rounds = {"n": 0}

    def save_and_maybe_die():
        batch_canvas_lib.BatchCanvas.save_checkpoint(bc, cpoint)
        rounds["n"] += 1
        if rounds["n"] >= 6:
            raise _Die()

    bc._maybe_save_checkpoint = save_and_maybe_die
    with pytest.raises(_Die):
        bc.segment_all(seed_policy=GridSeeds)

    model2, eng2 = make_hop_engine(opts)
    hc = hop_canvas_lib.HopBatchCanvas(
        model2.info, eng2, make_image(), opts, lanes=1, hops=4)
    hc.restore_checkpoint(cpoint)
    hc.segment_all(seed_policy=GridSeeds)

    # Must match the uninterrupted serial-order result.
    reference = run_hop(lanes=1, hops=4)
    np.testing.assert_array_equal(
        np.maximum(hc.segmentation, 0),
        np.maximum(reference.segmentation, 0))


def test_hop_kill_and_resume_device_finalize(tmp_path):
    """Device-finalize canvases checkpoint (claims merged to host) and
    resume: the restored run finishes with equivalent objects."""
    cpoint = str(tmp_path / "cpoint.npz")
    uninterrupted = run_hop(lanes=4, hops=3, device_finalize=True)

    hc, rounds = _interrupted_hop_canvas(cpoint, device_finalize=True)
    assert any(lane.num_iters > 0 for lane in hc._lanes) or hc.origins

    opts = make_options()
    model2, eng2 = make_hop_engine(opts)
    hc2 = hop_canvas_lib.HopBatchCanvas(
        model2.info, eng2, make_image(), opts, lanes=4, hops=3,
        device_finalize=True)
    hc2.restore_checkpoint(cpoint)
    hc2.segment_all(seed_policy=GridSeeds)

    a = np.maximum(hc2.segmentation, 0)
    b = np.maximum(uninterrupted.segmentation, 0)
    assert len(np.unique(a[a > 0])) == len(np.unique(b[b > 0]))
    inter = ((a > 0) & (b > 0)).sum()
    union = ((a > 0) | (b > 0)).sum()
    assert inter / union > 0.95

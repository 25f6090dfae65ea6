"""BatchCanvas kill-and-resume: in-flight lane state survives a worker
death and the resumed run reproduces the uninterrupted segmentation
(parity bar: the serial canvas cpoints / ref inference.py:728-843)."""

import numpy as np
import pytest

from ffn_tpu.inference import batch_canvas as batch_canvas_lib

from test_batch_canvas import make_engine, run_batch
from test_canvas_e2e import GridSeeds, make_image, make_options


class _Die(Exception):
    pass


def test_kill_and_resume_reproduces_segmentation(tmp_path):
    cpoint = str(tmp_path / "cpoint.npz")
    uninterrupted = run_batch(lanes=4)

    # Interrupted run: checkpoint every round, die after a few rounds with
    # lanes mid-flight.
    image = make_image()
    opts = make_options()
    model, eng = make_engine(opts)
    bc = batch_canvas_lib.BatchCanvas(
        model.info, eng, image, opts, lanes=4, candidates_per_step=4,
        checkpoint_path=cpoint, checkpoint_interval_sec=1e-9)
    rounds = {"n": 0}
    orig = bc.save_checkpoint

    def save_and_maybe_die():
        orig(cpoint)
        rounds["n"] += 1
        if rounds["n"] >= 4:
            raise _Die()

    bc.save_checkpoint = lambda path: save_and_maybe_die()
    with pytest.raises(_Die):
        bc.segment_all(seed_policy=GridSeeds)
    # The death left work undone (something in flight or seeds unread).
    assert any(lane.num_iters > 0 for lane in bc._lanes) or bc.origins

    # Fresh process equivalent: new canvas + engine, restore, finish.
    model2, eng2 = make_engine(opts)
    bc2 = batch_canvas_lib.BatchCanvas(
        model2.info, eng2, make_image(), opts, lanes=4,
        candidates_per_step=4)
    bc2.restore_checkpoint(cpoint)
    in_flight = sum(1 for lane in bc2._lanes
                    if lane.state == batch_canvas_lib._RUNNING)
    bc2.segment_all(seed_policy=GridSeeds)

    # Exact reproduction of the uninterrupted run.
    np.testing.assert_array_equal(
        np.maximum(bc2.segmentation, 0),
        np.maximum(uninterrupted.segmentation, 0))
    assert sorted(o.iters for o in bc2.origins.values()) == \
        sorted(o.iters for o in uninterrupted.origins.values())
    # And the test actually exercised mid-flight restore at least once.
    assert in_flight > 0 or rounds["n"] >= 4

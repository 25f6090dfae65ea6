"""screen_seeds: batched dud-seed verdicts and the padded-batch buckets.

The screen evaluates the FIRST FFN update for each candidate on a fresh
canvas and reports whether the origin stays above the move threshold —
exactly the second-pop DONE_WEAK check (hop_engine.screen_seeds). Calls
are padded to fixed program sizes; results must not depend on which
bucket (SCREEN_BATCH_SMALL vs SCREEN_BATCH) a call lands in.
"""

import numpy as np

from ffn_tpu.inference import hop_engine as hop_engine_lib

from test_canvas_e2e import make_image, make_options
from test_hop_canvas import make_hop_engine


def _candidates(image, n, rng):
    lo = np.array([s // 2 for s in (17, 17, 17)])
    hi = np.array(image.shape) - lo - 1
    return np.stack(
        [rng.randint(lo[d], hi[d], size=n) for d in range(3)],
        axis=1).astype(np.int32)


def test_screen_verdicts_bucket_invariant():
    opts = make_options()
    model, eng = make_hop_engine(opts)
    image = make_image()
    img_dev = eng.put_image(image)
    rng = np.random.RandomState(0)
    small_n = eng.SCREEN_BATCH_SMALL
    cands = _candidates(image, small_n + 8, rng)

    # Whole batch: exceeds the small bucket -> big program.
    big = eng.screen_seeds(img_dev, cands, opts.init_activation)
    # Same candidates in two small-bucket calls.
    small = np.concatenate([
        eng.screen_seeds(img_dev, cands[:small_n], opts.init_activation),
        eng.screen_seeds(img_dev, cands[small_n:], opts.init_activation),
    ])
    np.testing.assert_array_equal(big, small)
    # The oracle model fills cells: interior candidates are strong,
    # so the screen must not reject everything.
    assert big.any()


def test_screen_matches_lane_weak_verdict():
    """A screened-weak candidate is exactly one a fresh lane would kill
    as DONE_WEAK; a screened-strong candidate keeps running."""
    opts = make_options()
    model, eng = make_hop_engine(opts)
    image = make_image()
    img_dev = eng.put_image(image)
    blocked = eng.put_blocked(np.zeros(image.shape, np.uint8))
    rng = np.random.RandomState(1)
    cands = _candidates(image, 12, rng)
    strong = eng.screen_seeds(img_dev, cands, opts.init_activation)

    state = eng.init_lane_state(len(cands), image.shape)
    state = eng.reseed_lanes(state, np.ones(len(cands), bool),
                             cands, opts.init_activation)
    state, aux = eng.run_hops(img_dev, blocked, state, 2)
    weak_lane = aux["status"] == hop_engine_lib.DONE_WEAK
    np.testing.assert_array_equal(~strong, weak_lane)

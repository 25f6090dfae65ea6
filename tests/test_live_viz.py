"""Live notebook visualization: frame rendering + canvas hook."""

import numpy as np

from ffn_tpu.inference import canvas as canvas_lib
from ffn_tpu.inference import live_viz

from test_batch_canvas import make_engine
from test_canvas_e2e import make_image, make_options


class FrameSink:
    """Stands in for DynamicImage's notebook display."""

    def __init__(self):
        self.frames = []

    def update(self, pil_image):
        self.frames.append(np.asarray(pil_image))


def test_visualize_state_renders_rgb_frame():
    seed = np.random.RandomState(0).randn(24, 24, 24).astype(np.float32)
    seed[3, 5, 7] = np.nan

    class QueuePolicy:
        scored_coords = None

    sink = FrameSink()
    live_viz.visualize_state(seed, (12, 12, 12), QueuePolicy(), sink)
    (frame,) = sink.frames
    assert frame.ndim == 3 and frame.shape[2] == 3
    assert frame.dtype == np.uint8
    # The FoV marker is painted red.
    assert (frame[12, 12] == (255, 0, 0)).all()


def test_grid_scored_policy_appends_grid_panel():
    seed = np.zeros((24, 24, 24), np.float32)

    class GridPolicy:
        scored_coords = np.random.RandomState(1).rand(6, 6, 6).astype(
            np.float32)
        deltas = (4, 4, 4)

    class QueuePolicy:
        scored_coords = None

    sink = FrameSink()
    live_viz.visualize_state(seed, (12, 12, 12), QueuePolicy(), sink)
    live_viz.visualize_state(seed, (12, 12, 12), GridPolicy(), sink)
    base, with_grid = sink.frames
    assert with_grid.shape[1] > base.shape[1]
    assert with_grid.shape[0] == base.shape[0]


def test_canvas_segment_at_updates_dynamic_image():
    image = make_image()
    opts = make_options()
    model, eng = make_engine(opts)
    cv = canvas_lib.Canvas(model.info, eng, image, opts)
    cv.init_seed((8, 8, 8))
    cv.reset_state((8, 8, 8), reset_extents=True)
    cv.movement_policy.append(
        (cv.movement_policy.score_threshold * 2, (8, 8, 8)))
    sink = FrameSink()
    iters = cv.segment_at((8, 8, 8), dynamic_image=sink,
                          vis_update_every=2)
    assert iters > 0
    assert len(sink.frames) == iters // 2

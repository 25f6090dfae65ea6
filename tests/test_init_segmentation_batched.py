"""Batched canvases accept init_segmentation volumes (previously only
the serial Canvas implemented the hook) and hop mode mirrors the
preloaded claims into the device blocked volume."""

import numpy as np
from scipy.special import logit

from ffn_tpu.inference import hop_canvas as hop_canvas_lib

from test_canvas_e2e import GridSeeds, make_image, make_options
from test_hop_canvas import make_hop_engine


def test_init_segmentation_blocks_hop_lanes():
    image = make_image()
    opts = make_options()
    model, eng = make_hop_engine(opts)
    hc = hop_canvas_lib.HopBatchCanvas(model.info, eng, image, opts,
                                       lanes=2, hops=6)

    # Pre-segment the L-shaped blob region with a fake prior volume.
    vol = np.zeros((1,) + image.shape, np.uint64)
    vol[0, 6:12, 6:30, 6:12] = 7
    vol[0, 6:12, 24:30, 6:24] = 7
    hc.init_segmentation_from_volume(vol, (0, 0, 0), image.shape)
    assert hc._max_id == 1  # relabeled contiguous

    hc.segment_all(seed_policy=GridSeeds)
    # The preloaded object survives untouched; only the separate cube
    # gets a new id.
    pre = hc.segmentation[8, 8, 8]
    assert pre == 1
    new_ids = set(np.unique(hc.segmentation[hc.segmentation > 1]))
    assert len(new_ids) == 1
    assert hc.segmentation[26, 26, 26] in new_ids
    # No new object overlaps the preloaded one.
    assert hc.local_to_global_ids[1] == 7

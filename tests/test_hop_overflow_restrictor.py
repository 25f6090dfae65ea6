"""Hop-path hardening: queue-overflow stalls (no silent truncation),
blocked-region writes at volume faces, dense shift-mask restrictors, and
restrictor skip-counter attribution."""

import numpy as np
import pytest
from scipy.special import logit

from ffn_tpu.inference import batch_canvas as batch_canvas_lib
from ffn_tpu.inference import hop_canvas as hop_canvas_lib
from ffn_tpu.inference import movement
from ffn_tpu.utils import bounding_box as bbox_lib

from test_batch_canvas import make_engine, segmentations_equivalent
from test_canvas_e2e import GridSeeds, make_image, make_options
from test_hop_canvas import make_hop_engine, run_hop


def test_update_blocked_region_upper_face():
    """Regression: clamping the bucketed write near an upper volume face
    must not displace the region (free voxels blocked / claims lost)."""
    opts = make_options()
    model, eng = make_hop_engine(opts)
    shape = (70, 72, 74)
    blocked = eng.put_blocked(np.zeros(shape, np.uint8))
    region = (np.arange(5 * 7 * 9).reshape(5, 7, 9) % 2).astype(np.uint8)
    start = (65, 63, 61)   # clamped bucket start, region at upper corner
    blocked = eng.update_blocked_region(blocked, start, region)
    expect = np.zeros(shape, np.uint8)
    expect[65:70, 63:70, 61:70] = region
    np.testing.assert_array_equal(np.asarray(blocked), expect)

    # Interior writes still land exactly (and OR with existing bits).
    blocked = eng.update_blocked_region(blocked, (3, 4, 5), region)
    expect[3:8, 4:11, 5:14] |= region
    np.testing.assert_array_equal(np.asarray(blocked), expect)


def test_tiny_queue_capacity_no_truncation():
    """A queue capacity far below the object's frontier size forces
    stall/drain/spill cycles; the object must still be segmented
    completely (pre-fix: silent push drops truncated it)."""
    image = make_image()
    opts = make_options()
    model, eng = make_hop_engine(opts, queue_capacity=16)
    hc = hop_canvas_lib.HopBatchCanvas(model.info, eng, image, opts,
                                       lanes=1, hops=8)
    hc.segment_all(seed_policy=GridSeeds)
    assert hc.counters["queue-stall-drains"].value > 0

    ref = run_hop(lanes=1, hops=8)
    a = np.maximum(hc.segmentation, 0)
    b = np.maximum(ref.segmentation, 0)
    # Pop order deviates from strict FIFO only while a spill is pending,
    # so coverage (not voxel-for-voxel labels) is the invariant.
    np.testing.assert_array_equal(a > 0, b > 0)
    assert len(np.unique(a[a > 0])) == len(np.unique(b[b > 0]))


def _shift_restrictor(shape, scale=1):
    """Shift mask whose over-threshold pixels sit in a y-band; the
    windowed query then forbids FOV moves near that band."""
    sm = np.zeros((2,) + tuple(s // scale for s in shape), np.float32)
    sm[0, :, 12 // scale, :] = 9.0   # strong shift along one y plane
    fov = bbox_lib.BoundingBox(start=(-2, -2, -2), size=(5, 5, 5))
    return movement.MovementRestrictor(
        shift_mask=sm, shift_mask_fov=fov, shift_mask_threshold=4,
        shift_mask_scale=scale)


def test_dense_invalid_mask_matches_windowed_query():
    rng = np.random.RandomState(0)
    shape = (18, 20, 16)
    scale = 2
    sm = (rng.rand(2, 18, 10, 8) * 6).astype(np.float32)
    fov = bbox_lib.BoundingBox(start=(-3, -4, -2), size=(7, 9, 5))
    r = movement.MovementRestrictor(shift_mask=sm, shift_mask_fov=fov,
                                    shift_mask_threshold=4,
                                    shift_mask_scale=scale)
    dense = r.dense_invalid_mask(shape)
    for z in range(shape[0]):
        for y in range(shape[1]):
            for x in range(shape[2]):
                assert dense[z, y, x] == (
                    not r.is_valid_pos((z, y, x))), (z, y, x)


def test_dense_invalid_mask_includes_plain_mask():
    shape = (8, 8, 8)
    mask = np.zeros(shape, np.uint8)
    mask[2, 3, 4] = 1
    r = movement.MovementRestrictor(mask=mask)
    dense = r.dense_invalid_mask(shape)
    assert dense[2, 3, 4] and dense.sum() == 1
    assert movement.MovementRestrictor().dense_invalid_mask(shape) is None


def test_hop_shift_mask_matches_round_based():
    """The hop path accepts shift-mask restrictors (pre-fix it raised
    NotImplementedError) and reproduces the round-based path exactly,
    including the restrictor skip counter."""
    image = make_image()
    opts = make_options()

    model, eng = make_hop_engine(opts)
    hc = hop_canvas_lib.HopBatchCanvas(
        model.info, eng, image, opts, lanes=1, hops=5,
        restrictor=_shift_restrictor(image.shape))
    hc.segment_all(seed_policy=GridSeeds)

    model2, eng2 = make_engine(opts)
    bc = batch_canvas_lib.BatchCanvas(
        model2.info, eng2, image, opts, lanes=1, candidates_per_step=4,
        restrictor=_shift_restrictor(image.shape))
    bc.segment_all(seed_policy=GridSeeds)

    segmentations_equivalent(hc.segmentation, bc.segmentation)
    # Counter totals differ between the paths by design (the round-based
    # canvas validates queue entries eagerly at pending-refill, the hop
    # path lazily at pop — entries never popped are never counted), but
    # the ATTRIBUTION must hold: restrictor skips land in
    # skip_restriced_pos, and the restricted band is never segmented.
    assert hc.counters["skip_restriced_pos"].value > 0
    assert bc.counters["skip_restriced_pos"].value > 0
    # Restricted positions gate FOV centers: no origin may sit in the
    # band (finalized masks may still overlap it via the +-pred/2 write
    # margin, exactly as in the round-based path / the reference).
    dense = _shift_restrictor(image.shape).dense_invalid_mask(image.shape)
    for info in hc.origins.values():
        assert not dense[tuple(info.start_zyx)]


def test_restore_into_fewer_lanes_keeps_objects(tmp_path):
    """Restoring a checkpoint into a smaller lane count re-floods the
    dropped lanes' objects from their seeds instead of losing them."""
    from test_hop_canvas_resume import _interrupted_hop_canvas

    cpoint = str(tmp_path / "cpoint.npz")
    hc, _ = _interrupted_hop_canvas(cpoint, lanes=4, hops=3, die_after=4)
    dropped = [tuple(int(v) for v in lane.start_pos)
               for lane in hc._lanes[2:]
               if lane.state == batch_canvas_lib._RUNNING
               and lane.num_iters > 0]

    opts = make_options()
    model2, eng2 = make_hop_engine(opts)
    hc2 = hop_canvas_lib.HopBatchCanvas(
        model2.info, eng2, make_image(), opts, lanes=2, hops=3)
    hc2.restore_checkpoint(cpoint)
    for pos in dropped:
        assert pos in hc2._deferred
    hc2.segment_all(seed_policy=GridSeeds)

    ref = run_hop(lanes=4, hops=3)
    a = np.maximum(hc2.segmentation, 0)
    b = np.maximum(ref.segmentation, 0)
    assert len(np.unique(a[a > 0])) == len(np.unique(b[b > 0]))
    inter = ((a > 0) & (b > 0)).sum()
    union = ((a > 0) | (b > 0)).sum()
    assert inter / union > 0.95


def test_stale_spill_cleared_on_kernel_finalize():
    """Device-finalize mode: a lane whose object dies DONE_CAP while the
    host holds spilled queue entries is finalized IN KERNEL (the hold
    flag only blocks DONE_EMPTY finalization), so the spill goes stale.
    apply_finalize_rows must discard it, not requeue it into the lane's
    NEXT object. On a single canvas the kernel's claimed-at-pop check
    absorbs most stale entries (they waste requeue churn); in the fused
    driver the lane can be REBOUND TO ANOTHER SUBVOLUME, where slot-A
    coordinates are unclaimed in slot B's segmentation and the flood
    corrupts — this test drives the single-canvas scenario end to end
    (cap with 20+ spilled entries, next object seeded from the FIFO)
    and asserts no object ever spans two image components; the unit
    test below pins the spill-clearing contract itself."""
    from ffn_tpu.inference import seed as seed_lib

    # L-blob (stalls the 16-entry queue and hits the 30-iter cap with
    # spill pending, leaving an unclaimed remainder that nothing later
    # re-seeds) + three well-separated cubes (~20 iters each: they
    # finish DONE_EMPTY under the cap) for the other lane and the
    # post-cap kernel reseeds.
    cubes_yx = [(24, 24), (6, 24), (24, 6), (6, 42), (24, 42), (6, 6)]
    image = np.full((36, 36, 60), -1.0, np.float32)
    image[6:12, 6:30, 6:12] = 1.0
    image[6:12, 24:30, 6:24] = 1.0
    for y, x in cubes_yx:
        image[24:30, y:y + 6, x:x + 6] = 1.0

    class BlobThenCubes(seed_lib.BaseSeedPolicy):
        def init_coords(self):
            self.coords = np.array(
                [(8, 26, 8)] + [(26, y + 2, x + 2) for y, x in cubes_yx])

    opts = make_options()
    model, eng = make_hop_engine(opts, queue_capacity=16)
    hc = hop_canvas_lib.HopBatchCanvas(
        model.info, eng, image, opts, lanes=2, hops=4,
        device_finalize=True, max_iters_per_segment=30)
    assert hc.device_finalize
    hc.segment_all(seed_policy=BlobThenCubes)
    # The scenario actually occurred: stall-drain spilled entries AND
    # the iteration cap fired.
    assert hc.counters["queue-stall-drains"].value > 0
    assert hc.counters["iter-cap-hit"].value > 0

    # No object may span the L-blob and a cube: cross-component voxels
    # can only come from stale spill requeued into a later object.
    seg = np.maximum(hc.segmentation, 0)
    blob_l = np.zeros_like(seg, bool)
    blob_l[6:12, 6:30, 6:12] = True
    blob_l[6:12, 24:30, 6:24] = True
    cubes = np.zeros_like(seg, bool)
    for y, x in cubes_yx:
        cubes[24:30, y:y + 6, x:x + 6] = True
    for oid in np.unique(seg[seg > 0]):
        vox = seg == oid
        assert not ((vox & blob_l).any() and (vox & cubes).any()), oid


def test_apply_finalize_rows_clears_spill():
    """Unit contract: ANY finalization log row for a lane clears its
    host-held spill (the kernel finalized the lane's object, so the
    spilled queue entries belong to a dead object)."""
    from ffn_tpu.inference import hop_engine as hop_engine_lib

    class FakeLane:
        spill = [(1.0, (3, 3, 3))]

    lane = FakeLane()
    row = np.array([0, 0, 5, 5, 5, 10, 0, hop_engine_lib.DONE_CAP,
                    hop_engine_lib.FIN_WEAK, 0], np.int64)
    hop_canvas_lib.apply_finalize_rows([row], [lane], lambda k: None)
    assert lane.spill == []

"""Cross-subvolume lane filling (parallel.multi_canvas): one engine
batch advances objects from several subvolumes at once."""

import h5py
import numpy as np
from google.protobuf import text_format

from ffn_tpu.inference import runner as runner_lib
from ffn_tpu.inference import storage
from ffn_tpu.parallel import multi_canvas, sharded_inference
from ffn_tpu.proto import inference_pb2
from ffn_tpu.utils import bounding_box

from test_sharded_inference import make_setup


def _fg(seg):
    return np.maximum(seg, 0) > 0


def test_fused_driver_matches_independent_runs(tmp_path, monkeypatch):
    """Each subvolume's fused output must cover the same voxels with the
    same number of objects as an independent single-subvolume hop run."""
    # The standalone HopBatchCanvas always screens seeds; pin the fused
    # driver's screen policy to match (device-finalize defaults to
    # unscreened FIFO seeds — covered by the parametrized finalize-
    # parity test below).
    monkeypatch.setenv("FFN_TPU_SCREEN", "1")
    request, outer = make_setup(tmp_path)
    request.concurrent_requests = 8
    calc = bounding_box.OrderlyOverlappingCalculator(
        outer, [40, 36, 36], [8, 0, 0])
    tasks = []
    for i in range(calc.num_sub_boxes()):
        box = calc.index_to_sub_box(i)
        tasks.append((tuple(box.start[::-1]), tuple(box.size[::-1])))
    assert len(tasks) == 2

    runner = runner_lib.Runner()
    runner.start(request)
    driver = multi_canvas.MultiSubvolumeHopDriver(
        runner, tasks, lanes=8, slots=2, hops=4)
    assert driver.run() == 2

    # Independent per-subvolume runs into a separate output dir.
    request2 = inference_pb2.InferenceRequest()
    request2.CopyFrom(request)
    request2.segmentation_output_dir = str(tmp_path / "seg_ref")
    runner2 = runner_lib.Runner()
    runner2.start(request2)
    for corner, size in tasks:
        runner2.run(corner, size, keep_probability_maps=False)

    for corner, _ in tasks:
        seg_fused, org_fused = storage.load_segmentation(
            request.segmentation_output_dir, corner, split_cc=False)
        seg_ref, org_ref = storage.load_segmentation(
            request2.segmentation_output_dir, corner, split_cc=False)
        # The fused driver schedules lanes across subvolumes, so the
        # deferral order — and with it WHICH of an object's seeds
        # becomes its flood origin — can differ from the standalone run.
        # A different origin shifts moving-FOV reachability at the
        # margins by a few voxels (verified: the mismatches here are
        # margin voxels of objects whose recorded origins differ, the
        # same deviation class as lanes=4 vs lanes=8 on one canvas).
        # Object identity and coverage must still agree closely.
        a, b = _fg(seg_fused), _fg(seg_ref)
        mismatch = (a != b).sum() / max(a.sum(), 1)
        assert mismatch < 0.02, mismatch
        assert len(org_fused) == len(org_ref)


import pytest


@pytest.mark.parametrize("screen", ["0", "1"], ids=["unscreened",
                                                    "screened"])
def test_device_finalize_matches_host_finalize(tmp_path, monkeypatch,
                                               screen):
    """In-kernel finalization (claims + reseed in the hop program) must
    produce the same segmentation as the host-finalize path: identical
    voxel labels up to id naming, identical object count and origins.

    Parametrized over the seed-screen policy so both paths run the SAME
    policy: screened (the host-mode default) and unscreened (the
    device-finalize default — duds are killed by the kernel's DONE_WEAK
    finalize instead of a separate screen program)."""
    monkeypatch.setenv("FFN_TPU_SCREEN", screen)
    # Pin the seed-supply watermark: the adaptive multiplier reacts to
    # the kernel FIFO's consumption, a signal only the device-finalize
    # path has, so leaving it adaptive would compare the two paths
    # under DIFFERENT seed schedules (supply is a scheduling input,
    # like the lane count — both sides must match for the oracle to be
    # meaningful).
    monkeypatch.setenv("FFN_TPU_SCREEN_WATERMARK",
                       "2.0" if screen == "1" else "3.0")
    request, outer = make_setup(tmp_path)
    request.concurrent_requests = 8
    calc = bounding_box.OrderlyOverlappingCalculator(
        outer, [40, 36, 36], [8, 0, 0])
    tasks = [
        (tuple(calc.index_to_sub_box(i).start[::-1]),
         tuple(calc.index_to_sub_box(i).size[::-1]))
        for i in range(calc.num_sub_boxes())]

    segs = {}
    for devfin in (True, False):
        req = inference_pb2.InferenceRequest()
        req.CopyFrom(request)
        req.segmentation_output_dir = str(tmp_path / f"seg_{devfin}")
        runner = runner_lib.Runner()
        runner.start(req)
        driver = multi_canvas.MultiSubvolumeHopDriver(
            runner, tasks, lanes=8, slots=2, hops=4,
            device_finalize=devfin)
        assert driver.run() == len(tasks)
        segs[devfin] = {
            corner: storage.load_segmentation(
                req.segmentation_output_dir, corner, split_cc=False)
            for corner, _ in tasks}

    for corner, _ in tasks:
        seg_dev, org_dev = segs[True][corner]
        seg_host, org_host = segs[False][corner]
        # Seed scheduling order differs (FIFO vs round-boundary
        # assignment), so WHICH of an object's candidate seeds becomes
        # its flood origin — and with it margin reachability — can
        # shift by a few voxels, the same deviation class as the fused
        # vs standalone comparison above. Object identity and coverage
        # must agree closely.
        assert len(org_dev) == len(org_host)
        a, b = _fg(seg_dev), _fg(seg_host)
        mismatch = (a != b).sum() / max(a.sum(), 1)
        # Unscreened FIFOs shift seed timing more (duds occupy lanes at
        # different instants), so a different candidate seed can win an
        # object's flood race; a shifted origin moves the moving-FOV
        # reachability margin by up to deltas voxels per face (verified:
        # the mismatch voxels here are margin shells of objects whose
        # recorded origins differ). Tiny test objects amplify the
        # fraction.
        assert mismatch < (0.06 if screen == "0" else 0.02), mismatch
        # Every device object maps 1:1 onto a host object (majority
        # vote both ways).
        for seg_x, seg_y in ((seg_dev, seg_host), (seg_host, seg_dev)):
            for oid in np.unique(seg_x[seg_x > 0]):
                votes = seg_y[seg_x == oid].astype(np.int64)
                votes = votes[votes > 0]
                assert votes.size, oid
                top = np.bincount(votes).max()
                assert top / votes.size > 0.98, (oid, top / votes.size)


def test_fused_driver_sharded_mesh_parity(tmp_path):
    """The PRODUCTION path on a mesh: MultiSubvolumeHopDriver with
    device-finalize, lane state sharded over 8 (virtual) devices, image
    /blocked stacks + finalize state replicated, must produce the
    segmentation of the single-device fused run — object-for-object
    with identical voxels and origins (pure batched compute over the
    lane axis; the finalize loop gathers across shards)."""
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices; see conftest.py")

    request, outer = make_setup(tmp_path)
    request.concurrent_requests = 8
    calc = bounding_box.OrderlyOverlappingCalculator(
        outer, [40, 36, 36], [8, 0, 0])
    tasks = [
        (tuple(calc.index_to_sub_box(i).start[::-1]),
         tuple(calc.index_to_sub_box(i).size[::-1]))
        for i in range(calc.num_sub_boxes())]

    segs = {}
    for label, mesh in (
            ("single", None),
            ("mesh", Mesh(np.array(jax.devices()[:8]), ("data",)))):
        req = inference_pb2.InferenceRequest()
        req.CopyFrom(request)
        req.segmentation_output_dir = str(tmp_path / f"seg_{label}")
        runner = runner_lib.Runner()
        runner.start(req)
        driver = multi_canvas.MultiSubvolumeHopDriver(
            runner, tasks, lanes=8, slots=2, hops=4,
            device_finalize=True, mesh=mesh)
        assert driver.run() == len(tasks)
        segs[label] = [
            storage.load_segmentation(req.segmentation_output_dir,
                                      corner, split_cc=False)
            for corner, _ in tasks]

    for (seg_1, org_1), (seg_8, org_8) in zip(segs["single"],
                                              segs["mesh"]):
        np.testing.assert_array_equal(seg_1, seg_8)
        assert set(org_1) == set(org_8)
        for oid in org_1:
            assert tuple(org_1[oid].start_zyx) == \
                tuple(org_8[oid].start_zyx)


def test_fused_driver_slot_reload(tmp_path):
    """More subvolumes than slots: finished slots reload from the task
    queue and everything still gets segmented."""
    request, outer = make_setup(tmp_path)
    request.concurrent_requests = 6
    calc = bounding_box.OrderlyOverlappingCalculator(
        outer, [24, 36, 36], [8, 0, 0])
    tasks = [
        (tuple(calc.index_to_sub_box(i).start[::-1]),
         tuple(calc.index_to_sub_box(i).size[::-1]))
        for i in range(calc.num_sub_boxes())]
    assert len(tasks) >= 3

    runner = runner_lib.Runner()
    runner.start(request)
    driver = multi_canvas.MultiSubvolumeHopDriver(
        runner, tasks, lanes=6, slots=2, hops=4)
    assert driver.run() == len(tasks)
    for corner, _ in tasks:
        seg, _ = storage.load_segmentation(
            request.segmentation_output_dir, corner, split_cc=False)
        assert seg.shape is not None

    # Idempotency: a second pass saves nothing.
    driver2 = multi_canvas.MultiSubvolumeHopDriver(
        runner, tasks, lanes=6, slots=2, hops=4)
    assert driver2.run() == 0


def test_fused_worker_with_stitching(tmp_path):
    """run_worker_fused plugs into the sharded pipeline: outputs stitch
    into one global id space with objects joined across the split."""
    request, outer = make_setup(tmp_path)
    request.concurrent_requests = 8
    driver = sharded_inference.ShardedInferenceDriver(
        request, outer, subvol_size_xyz=(40, 36, 36),
        overlap_xyz=(8, 0, 0), seed_handoff=True)
    assert driver.run_worker_fused(lanes=8, slots=2, hops=4) == 2
    assert driver.pending_indices() == []

    stitcher = driver.stitch(min_overlap_fraction=0.5)
    out = stitcher.assemble(None)
    assert out.shape == (36, 36, 72)
    bar_left = out[18, 18, 12]
    bar_right = out[18, 18, 60]
    assert bar_left != 0 and bar_left == bar_right
    cube_l = out[8, 8, 8]
    cube_r = out[28, 28, 64]
    assert cube_l != 0 and cube_r != 0
    assert len({int(bar_left), int(cube_l), int(cube_r)}) == 3


def test_fused_driver_with_init_segmentation(tmp_path):
    """The fused driver accepts init_segmentation requests (regression:
    SlotCanvas._refresh_blocked used to dereference driver.slots[k]
    before the slot was published, crashing on the first load). The
    preloaded object must survive and block re-segmentation."""
    request, outer = make_setup(tmp_path)
    request.concurrent_requests = 8
    # Prior segmentation claiming the left cube.
    prior = np.zeros((1, 36, 36, 72), np.uint64)
    prior[0, 4:12, 4:12, 4:12] = 9
    with h5py.File(str(tmp_path / "prior.h5"), "w") as f:
        f.create_dataset("seg", data=prior)
    request.init_segmentation.hdf5 = f"{tmp_path}/prior.h5:seg"

    calc = bounding_box.OrderlyOverlappingCalculator(
        outer, [40, 36, 36], [8, 0, 0])
    tasks = [
        (tuple(calc.index_to_sub_box(i).start[::-1]),
         tuple(calc.index_to_sub_box(i).size[::-1]))
        for i in range(calc.num_sub_boxes())]

    runner = runner_lib.Runner()
    runner.start(request)
    driver = multi_canvas.MultiSubvolumeHopDriver(
        runner, tasks, lanes=8, slots=2, hops=4)
    assert driver.run() == 2

    seg, _ = storage.load_segmentation(
        request.segmentation_output_dir, tasks[0][0], split_cc=False)
    # The preloaded cube keeps its (global) id; the bar still gets
    # segmented as a new object.
    assert seg[8, 8, 8] != 0
    assert seg[18, 18, 12] != 0
    assert seg[8, 8, 8] != seg[18, 18, 12]

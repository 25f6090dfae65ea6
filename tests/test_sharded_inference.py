"""Sharded inference over subvolumes + global stitching."""

import h5py
import numpy as np
from google.protobuf import text_format

from ffn_tpu.inference import storage
from ffn_tpu.parallel import sharded_inference, stitching
from ffn_tpu.proto import inference_pb2
from ffn_tpu.utils import bounding_box


def make_setup(tmp_path):
    # 72x36x36 volume: one bar crossing the subvolume split at x=36,
    # plus one cube per half.
    shape = (36, 36, 72)  # zyx
    img = np.zeros(shape, np.uint8)
    img[14:22, 14:22, 10:62] = 200   # long bar across the split
    img[4:12, 4:12, 4:12] = 200      # cube in left half
    img[24:32, 24:32, 60:68] = 200   # cube in right half
    with h5py.File(str(tmp_path / "vol.h5"), "w") as f:
        f.create_dataset("raw", data=img)

    request = inference_pb2.InferenceRequest()
    text_format.Parse(f"""
image {{ hdf5: "{tmp_path}/vol.h5:raw" }}
image_mean: 100
image_stddev: 50
seed_policy: "PolicyGrid3d"
seed_policy_args: "{{\\"step\\": 4, \\"offsets\\": [0]}}"
model_name: "oracle.ThresholdOracleModel"
model_args: "{{\\"fov_size\\": [9, 9, 9], \\"deltas\\": [2, 2, 2]}}"
segmentation_output_dir: "{tmp_path}/seg"
inference_options {{
  init_activation: 0.95 pad_value: 0.05 move_threshold: 0.9
  min_boundary_dist {{ x: 1 y: 1 z: 1 }}
  segment_threshold: 0.6 min_segment_size: 5
}}""", request)
    outer = bounding_box.BoundingBox(start=(0, 0, 0), size=(72, 36, 36))
    return request, outer


def test_sharded_inference_and_stitching(tmp_path):
    request, outer = make_setup(tmp_path)
    driver = sharded_inference.ShardedInferenceDriver(
        request, outer, subvol_size_xyz=(40, 36, 36),
        overlap_xyz=(8, 0, 0), seed_handoff=False)
    assert driver.num_subvolumes() == 2
    assert driver.pending_indices() == [0, 1]

    # Two "workers" each take their shard.
    driver.run_worker(worker_id=0, num_workers=2)
    driver.run_worker(worker_id=1, num_workers=2)
    assert driver.pending_indices() == []

    # Idempotency: re-running processes nothing.
    assert driver.run_worker(worker_id=0, num_workers=2) == 0

    # Stitch into a global id space.
    stitcher = driver.stitch(min_overlap_fraction=0.5)
    out = stitcher.assemble(None)
    assert out.shape == (36, 36, 72)

    # The bar carries ONE global id across the split.
    bar_left = out[18, 18, 12]
    bar_right = out[18, 18, 60]
    assert bar_left != 0
    assert bar_left == bar_right

    # The cubes are distinct objects.
    cube_l = out[8, 8, 8]
    cube_r = out[28, 28, 64]
    assert cube_l != 0 and cube_r != 0
    assert len({int(bar_left), int(cube_l), int(cube_r)}) == 3


def test_seed_handoff_policy(tmp_path):
    request, outer = make_setup(tmp_path)
    driver = sharded_inference.ShardedInferenceDriver(
        request, outer, subvol_size_xyz=(40, 36, 36),
        overlap_xyz=(8, 0, 0), seed_handoff=True)
    # Run sequentially on one worker: subvolume 1 starts after 0 finished
    # and inherits its origins as priority seeds.
    driver.run_worker(worker_id=0, num_workers=1)
    assert driver.pending_indices() == []
    # Outputs exist and the policy name was swapped in.
    assert request.seed_policy == "PolicyNeighborOriginsThenPeaks"
    seg, origins = storage.load_segmentation(
        str(tmp_path / "seg"), (0, 0, 32), split_cc=False)
    assert len(origins) >= 1


def test_union_find_long_chain_and_by_size():
    """Pod-scale merge chains: no recursion limit, near-flat trees."""
    uf = stitching.UnionFind()
    n = 50_000  # far beyond Python's default recursion limit
    for i in range(n - 1):
        uf.union(i, i + 1)
    root = uf.find(0)
    assert uf.find(n - 1) == root
    assert uf.find(n // 2) == root
    # Path halving flattened the walked paths.
    assert sum(1 for k, v in uf.parent.items() if k != v) >= 1

"""Drives the run_inference.py CLI end-to-end on a synthetic volume."""

import os
import subprocess
import sys

import h5py
import numpy as np

from ffn_tpu.inference import storage

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_request(tmp_path):
    img = np.full((36, 36, 36), 0, np.uint8)
    img[6:12, 6:30, 6:12] = 200
    img[6:12, 24:30, 6:24] = 200
    img[24:30, 24:30, 24:30] = 200
    vol_path = str(tmp_path / "vol.h5")
    with h5py.File(vol_path, "w") as f:
        f.create_dataset("raw", data=img)

    out_dir = str(tmp_path / "seg")
    request = f"""
image {{ hdf5: "{vol_path}:raw" }}
image_mean: 100
image_stddev: 50
seed_policy: "PolicyGrid3d"
seed_policy_args: "{{\\"step\\": 4, \\"offsets\\": [0]}}"
model_name: "oracle.ThresholdOracleModel"
model_args: "{{\\"fov_size\\": [9, 9, 9], \\"deltas\\": [2, 2, 2]}}"
segmentation_output_dir: "{out_dir}"
inference_options {{
  init_activation: 0.95
  pad_value: 0.05
  move_threshold: 0.9
  min_boundary_dist {{ x: 1 y: 1 z: 1 }}
  segment_threshold: 0.6
  min_segment_size: 5
}}
"""
    req_path = tmp_path / "request.pbtxt"
    req_path.write_text(request)
    return str(req_path), out_dir


def run_cli(req_path, box):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "run_inference.py"),
         f"--inference_request=@{req_path}", f"--bounding_box={box}"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600)


def test_cli_end_to_end(tmp_path):
    req_path, out_dir = make_request(tmp_path)
    box = "start { x: 0 y: 0 z: 0 } size { x: 36 y: 36 z: 36 }"
    result = run_cli(req_path, box)
    assert result.returncode == 0, result.stderr[-3000:]

    seg, origins = storage.load_segmentation(out_dir, (0, 0, 0),
                                             split_cc=False)
    ids = np.unique(seg[seg > 0])
    assert len(ids) == 2
    assert len(origins) == 2
    # The L-shaped object: both bars carry the same id.
    assert seg[8, 8, 8] == seg[8, 27, 20]
    assert seg[26, 26, 26] != seg[8, 8, 8]

    # Probability map saved and loadable.
    prob_path = storage.object_prob_path(out_dir, (0, 0, 0))
    assert os.path.exists(prob_path)
    with open(prob_path, "rb") as f:
        qprob = np.load(f)["qprob"]
    assert (qprob[seg > 0] > 128).all()

    # Counters dumped.
    assert os.path.exists(os.path.join(out_dir, "counters.txt"))

    # Idempotency: a second run skips the existing subvolume quickly.
    mtime = os.path.getmtime(storage.segmentation_path(out_dir, (0, 0, 0)))
    result2 = run_cli(req_path, box)
    assert result2.returncode == 0
    assert os.path.getmtime(
        storage.segmentation_path(out_dir, (0, 0, 0))) == mtime

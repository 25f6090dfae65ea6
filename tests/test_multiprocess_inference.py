"""Multi-worker inference through the run_sharded_inference.py CLI.

Two REAL worker processes run concurrently against the same output
directory (the shared filesystem is the only coordination medium, the
reference's own distribution model — ref doc/manual.md:107-117), then a
stitch process builds the global ID space. Verifies: disjoint shards,
idempotent retries, and a border-crossing object carrying one global id.
"""

import os
import subprocess
import sys

import numpy as np
from google.protobuf import text_format

from ffn_tpu.inference import storage

from test_sharded_inference import make_setup

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_request(request, tmp_path):
    path = str(tmp_path / "request.pbtxt")
    with open(path, "w") as f:
        f.write(text_format.MessageToString(request))
    return path


def _cli(req_path, outer, extra):
    bbox = ("start { x: %d y: %d z: %d } size { x: %d y: %d z: %d }"
            % (*outer.start, *outer.size))
    return [sys.executable, os.path.join(REPO, "run_sharded_inference.py"),
            f"--inference_request=@{req_path}",
            f"--bounding_box={bbox}",
            "--subvolume_size=40,36,36", "--overlap=8,0,0",
            "--lanes=8", "--slots=2", "--hops=4"] + extra


def test_two_worker_inference_and_stitch(tmp_path):
    request, outer = make_setup(tmp_path)
    request.concurrent_requests = 8
    req_path = _write_request(request, tmp_path)
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")

    # Two concurrent worker processes, one shard each.
    procs = [
        subprocess.Popen(
            _cli(req_path, outer,
                 [f"--worker_id={wid}", "--num_workers=2"]),
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for wid in (0, 1)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for wid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {wid}:\n{out[-3000:]}"
        assert "1 subvolumes saved (2 total)" in out, out[-2000:]

    # Both subvolumes exist; ids/origins loadable.
    for corner in ((0, 0, 0), (0, 0, 32)):
        seg, origins = storage.load_segmentation(
            request.segmentation_output_dir, corner, split_cc=False)
        assert len(origins) > 0
        assert (seg > 0).any()

    # Idempotency: a rerun saves nothing.
    rerun = subprocess.run(
        _cli(req_path, outer, ["--worker_id=0", "--num_workers=2"]),
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600)
    assert rerun.returncode == 0, rerun.stdout + rerun.stderr
    assert "0 subvolumes saved" in rerun.stdout

    # Stitch in a third process, writing the assembled global volume.
    out_npz = str(tmp_path / "global.npz")
    stitch = subprocess.run(
        _cli(req_path, outer, ["--mode=stitch", f"--output={out_npz}"]),
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600)
    assert stitch.returncode == 0, stitch.stdout + stitch.stderr
    with np.load(out_npz) as data:
        out = data["segmentation"]
    assert out.shape == (36, 36, 72)
    bar_left, bar_right = out[18, 18, 12], out[18, 18, 60]
    assert bar_left != 0 and bar_left == bar_right
    cube_l, cube_r = out[8, 8, 8], out[28, 28, 64]
    assert cube_l != 0 and cube_r != 0
    assert len({int(bar_left), int(cube_l), int(cube_r)}) == 3

#!/usr/bin/env python3
"""Pod-scale sharded FFN inference: decomposition, workers, stitching.

The reference recommends distributing whole-dataset inference through an
external task queue of subvolumes, each run by run_inference.py, and
leaves global ID reconciliation explicitly unimplemented (ref
doc/manual.md:107-127). This CLI ships the whole pipeline in-framework:

  - subvolume decomposition with overlap (ref utils/bounding_box.py
    OrderlyOverlappingCalculator semantics);
  - idempotent worker shards: subvolume index % num_workers == worker_id,
    finished subvolumes skipped — elastic restarts and retries are safe,
    and a shared filesystem is the only coordination medium (the
    reference's own model);
  - seed handoff: origins of finished neighboring subvolumes are flooded
    first so border-crossing objects stay consistent;
  - fused multi-subvolume execution: one engine batch advances objects
    from all of this worker's loaded subvolumes at once (the per-chip
    occupancy answer; parallel/multi_canvas.py);
  - overlap stitching into one global ID space (--mode=stitch).

Workers: run N copies with --worker_id=0..N-1 --num_workers=N (one per
host/chip). When all finish, run once with --mode=stitch.

Example:
  python run_sharded_inference.py --inference_request="$(cat req.pbtxt)" \
    --bounding_box 'start { x: 0 y: 0 z: 0 } size { x: 500 y: 500 z: 500 }' \
    --subvolume_size 165,165,165 --overlap 48,48,48 \
    --worker_id=0 --num_workers=4
  python run_sharded_inference.py ... --mode=stitch --output=global.npz
"""

import os
import time

from absl import app as absl_app
from absl import flags
from google.protobuf import text_format

from ffn_tpu.utils import platform as platform_lib

platform_lib.apply_env()

import numpy as np

from ffn_tpu.inference import flags as inference_flags  # noqa: E402
from ffn_tpu.proto import bounding_box_pb2  # noqa: E402
from ffn_tpu.utils import bounding_box  # noqa: E402

FLAGS = flags.FLAGS

flags.DEFINE_string(
    "bounding_box", None,
    "BoundingBox proto in text format defining the OUTER volume.")
flags.DEFINE_string("subvolume_size", "165,165,165",
                    "Subvolume size, xyz, comma-separated.")
flags.DEFINE_string("overlap", "48,48,48",
                    "Inter-subvolume overlap, xyz, comma-separated.")
flags.DEFINE_integer("worker_id", 0, "This worker's shard index.")
flags.DEFINE_integer("num_workers", 1, "Total number of workers.")
flags.DEFINE_enum("mode", "worker", ["worker", "stitch"],
                  "worker: process this shard's subvolumes; "
                  "stitch: build the global ID space from finished "
                  "outputs and optionally write the assembled volume.")
flags.DEFINE_bool("fused", True,
                  "Process this worker's subvolumes concurrently in one "
                  "engine batch (multi_canvas). False = one at a time.")
flags.DEFINE_integer("lanes", 64, "Concurrent flood-fill lanes (fused).")
flags.DEFINE_integer("slots", 4, "Loaded subvolumes per batch (fused).")
flags.DEFINE_integer("hops", 16, "FFN moves per device round (fused).")
flags.DEFINE_bool("seed_handoff", True,
                  "Flood origins inherited from finished neighbor "
                  "subvolumes first.")
flags.DEFINE_float("min_overlap_fraction", 0.5,
                   "Stitch threshold: fraction of a segment's overlap "
                   "voxels that must map to one partner segment.")
flags.DEFINE_string("output", "",
                    "stitch mode: where to write the assembled global "
                    "volume (.npz with key 'segmentation', or .h5 path "
                    "of the form file.h5:dataset). Empty = only the ID "
                    "map is built and summary stats are printed.")


def _xyz(s):
    v = [int(x) for x in s.split(",")]
    if len(v) != 3:
        raise ValueError(f"need 3 comma-separated ints, got {s!r}")
    return v


def main(unused_argv):
    from ffn_tpu.parallel import sharded_inference

    request = inference_flags.request_from_flags()
    os.makedirs(request.segmentation_output_dir, exist_ok=True)

    bbox = bounding_box_pb2.BoundingBox()
    text_format.Parse(FLAGS.bounding_box, bbox)
    outer = bounding_box.BoundingBox(bbox)

    driver = sharded_inference.ShardedInferenceDriver(
        request, outer, subvol_size_xyz=_xyz(FLAGS.subvolume_size),
        overlap_xyz=_xyz(FLAGS.overlap),
        seed_handoff=FLAGS.seed_handoff)
    n = driver.num_subvolumes()

    if FLAGS.mode == "worker":
        start = time.time()
        if FLAGS.fused:
            done = driver.run_worker_fused(
                worker_id=FLAGS.worker_id, num_workers=FLAGS.num_workers,
                lanes=FLAGS.lanes, slots=FLAGS.slots, hops=FLAGS.hops)
        else:
            done = driver.run_worker(worker_id=FLAGS.worker_id,
                                     num_workers=FLAGS.num_workers)
        print(f"worker {FLAGS.worker_id}/{FLAGS.num_workers}: "
              f"{done} subvolumes saved ({n} total) in "
              f"{time.time() - start:.1f} s")
        return

    pending = driver.pending_indices()
    if pending:
        raise SystemExit(
            f"stitch: {len(pending)}/{n} subvolumes not finished yet "
            f"(first pending index: {pending[0]})")
    stitcher = driver.stitch(
        min_overlap_fraction=FLAGS.min_overlap_fraction)
    if not FLAGS.output:
        merged = sum(len(v) for v in getattr(
            stitcher, "_local_ids", {}).values()) if hasattr(
            stitcher, "_local_ids") else None
        print(f"stitch: ID space built over {n} subvolumes"
              + (f" ({merged} local ids)" if merged else ""))
        return
    out = stitcher.assemble(None)
    if ".h5:" in FLAGS.output or FLAGS.output.endswith(".h5"):
        import h5py
        path, _, dset = FLAGS.output.partition(":")
        with h5py.File(path, "a") as f:
            if (dset or "segmentation") in f:
                del f[dset or "segmentation"]
            f.create_dataset(dset or "segmentation", data=out,
                             compression="gzip")
    else:
        with open(FLAGS.output, "wb") as fd:
            np.savez_compressed(fd, segmentation=out)
    print(f"stitch: assembled {out.shape} volume with "
          f"{len(np.unique(out)) - 1} objects -> {FLAGS.output}")



def app():
    absl_app.run(main)


if __name__ == "__main__":
    app()

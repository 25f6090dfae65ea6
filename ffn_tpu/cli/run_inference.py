#!/usr/bin/env python3
"""Runs FFN inference within a dense bounding box.

CLI parity with the reference's run_inference.py: accepts the same
--inference_request text proto and --bounding_box flags, writes the same
seg-X_Y_Z.npz / .prob outputs and a counters dump.

Inference is performed by the TPU-native flood-fill engine; see
ffn_tpu/inference/engine.py.
"""

import os
import time

from absl import app as absl_app
from absl import flags
from google.protobuf import text_format

from ffn_tpu.utils import platform as platform_lib

platform_lib.apply_env()

from ffn_tpu.inference import flags as inference_flags
from ffn_tpu.inference import runner as runner_lib
from ffn_tpu.inference import storage
from ffn_tpu.proto import bounding_box_pb2
from ffn_tpu.utils import bounding_box

FLAGS = flags.FLAGS

flags.DEFINE_string(
    "bounding_box", None,
    "BoundingBox proto in text format defining the area to segment.")


def main(unused_argv):
    request = inference_flags.request_from_flags()

    if not os.path.exists(request.segmentation_output_dir):
        os.makedirs(request.segmentation_output_dir, exist_ok=True)

    bbox = bounding_box_pb2.BoundingBox()
    text_format.Parse(FLAGS.bounding_box, bbox)
    box = bounding_box.BoundingBox(bbox)

    runner = runner_lib.Runner()
    runner.start(request)
    corner = tuple(int(v) for v in box.start[::-1])
    size = tuple(int(v) for v in box.size[::-1])

    start_time = time.time()
    runner.run(corner, size)
    elapsed = time.time() - start_time
    print(f"Elapsed: {elapsed:.1f} s")

    counter_path = os.path.join(request.segmentation_output_dir,
                                "counters.txt")
    if not os.path.exists(counter_path):
        runner.counters.dump(counter_path)



def app():
    flags.mark_flag_as_required("bounding_box")
    flags.mark_flag_as_required("inference_request")
    absl_app.run(main)


if __name__ == "__main__":
    app()

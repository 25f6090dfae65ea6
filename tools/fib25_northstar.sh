#!/usr/bin/env bash
# FIB-25 north-star run: segment training_sample2 (250^3) with the
# shipped fib25 weights and score object-level agreement against the
# reference's golden output (ref README.md:70-131; BASELINE.md north
# star: <60 s on one TPU v5p chip at >=95% agreement).
#
# The raw FIB-25 image volumes are NOT redistributable and live at
# gs://ffn-flyem-fib25; this environment has no network egress, so the
# script degrades to a documented dry run when the data is absent.
# The moment the data (or network) is available, running this script
# unchanged produces the headline number.
#
# Usage: tools/fib25_northstar.sh [DATA_DIR]
#   DATA_DIR: directory holding training_sample2/grayscale_maps.h5
#             (default: third_party/neuroproof_examples)

set -euo pipefail
cd "$(dirname "$0")/.."

DATA_DIR="${1:-third_party/neuroproof_examples}"
IMG="$DATA_DIR/training_sample2/grayscale_maps.h5"
GOLDEN="${GOLDEN:-/root/reference/results/fib25/sample-training2.npz}"
OUT_DIR="${OUT_DIR:-results/fib25/training2}"
CKPT="models/fib25/model-27465036.npz"   # shipped, TF-free

if [ ! -f "$IMG" ]; then
  cat <<EOF
[dry run] FIB-25 image data not found at: $IMG

To fetch it (needs gcloud + network):
  gcloud auth application-default login
  gcloud storage rsync --recursive --exclude ".*.gz" \\
      gs://ffn-flyem-fib25/ "$DATA_DIR"

Then re-run: tools/fib25_northstar.sh "$DATA_DIR"
EOF
  # Everything that CAN run without the image data still runs, so the
  # recipe itself is exercised: checkpoint + request + golden loading.
  python - <<'PY'
from google.protobuf import text_format
from ffn_tpu.proto import inference_pb2
from ffn_tpu.inference import runner, storage
import os, tempfile, numpy as np

params = runner.load_model_params("models/fib25/model-27465036.npz")
assert params["params"]["conv0_a"]["kernel"].shape == (3, 3, 3, 2, 32)
req = inference_pb2.InferenceRequest()
text_format.Parse(
    open("configs/inference_training_sample2.pbtxt").read(), req)
golden = os.environ.get("GOLDEN",
                        "/root/reference/results/fib25/sample-training2.npz")
if os.path.exists(golden):
    with tempfile.TemporaryDirectory() as d:
        os.symlink(golden, os.path.join(d, "seg-0_0_0.npz"))
        seg, origins = storage.load_segmentation(d, (0, 0, 0))
    print(f"[dry run] golden loads: {seg.shape}, "
          f"{len(np.unique(seg[seg > 0]))} objects, "
          f"{len(origins)} origins")
print("[dry run] checkpoint + request + golden all load; only the "
      "image data is missing.")
PY
  exit 0
fi

echo "== segmenting training_sample2 250^3 with the shipped checkpoint =="
time python run_inference.py \
  --inference_request="$(cat configs/inference_training_sample2.pbtxt)" \
  --bounding_box 'start { x:0 y:0 z:0 } size { x:250 y:250 z:250 }'

echo "== scoring object-level agreement vs the golden output =="
python - <<PY
import os, tempfile
import numpy as np
from ffn_tpu.inference import storage
from tools import synthetic_em

seg, _ = storage.load_segmentation("$OUT_DIR", (0, 0, 0))
with tempfile.TemporaryDirectory() as d:
    os.symlink("$GOLDEN", os.path.join(d, "seg-0_0_0.npz"))
    gold, _ = storage.load_segmentation(d, (0, 0, 0))
agreement = synthetic_em.object_level_agreement(gold, seg)
print(f"object-level agreement vs golden: {agreement:.4f} "
      f"(north star >= 0.95)")
PY

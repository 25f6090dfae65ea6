#!/usr/bin/env python3
"""Generates the demo phantom volume used by configs/inference_phantom.pbtxt.

Writes /tmp/ffn_tpu_demo/phantom.h5 with `raw` (uint8 EM-like image) and
`gt` (uint64 ground-truth cell labels) datasets. Deterministic: the same
volume as tools/e2e_bench.py's default eval phantom.

Env knobs: DEMO_SIZE (default 250), DEMO_OUT (output h5 path).
"""

import os
import sys

import h5py

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from tools import synthetic_em  # noqa: E402


def main():
    size = int(os.environ.get("DEMO_SIZE", "250"))
    out = os.environ.get("DEMO_OUT", "/tmp/ffn_tpu_demo/phantom.h5")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    image, gt = synthetic_em.make_volume(size=size)
    with h5py.File(out, "w") as f:
        f.create_dataset("raw", data=image)
        f.create_dataset("gt", data=gt)
    print(f"wrote {out}: raw+gt, {size}^3")


if __name__ == "__main__":
    main()

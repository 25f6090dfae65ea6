#!/usr/bin/env python3
"""Constructs the canonical fused driver and prints the warmup mark
breakdown (which device program / alloc inside
MultiSubvolumeHopDriver.warmup costs what), then exits without running
any round. Use to attribute t_warmup_s from the e2e breakdown.

Env knobs mirror tools/e2e_fused_bench.py (F_CKPT required).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    from absl import logging as absl_logging
    absl_logging.set_verbosity(absl_logging.INFO)
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import h5py
    import numpy as np
    from tools.quality_eval import build_request, make_phantom
    from ffn_tpu.parallel import sharded_inference, multi_canvas
    from ffn_tpu.inference import runner as runner_lib
    from ffn_tpu.utils import bounding_box

    ckpt = os.environ["F_CKPT"]
    size = int(os.environ.get("F_SIZE", "250"))
    lanes = int(os.environ.get("F_LANES", "192"))
    slots = int(os.environ.get("F_SLOTS", "8"))
    sub = int(os.environ.get("F_SUB", "165"))
    overlap = int(os.environ.get("F_OVERLAP", "48"))
    hops = int(os.environ.get("F_HOPS", "16"))
    pad = int(os.environ.get("F_PAD_IMAGE", "16"))
    workdir = os.environ.get("F_WORKDIR", "/tmp/ffn_tpu_fused")
    os.makedirs(workdir, exist_ok=True)

    vol_path, _ = make_phantom(workdir, size)
    if pad:
        padded_path = vol_path.replace(".h5", f"_pad{pad}.h5")
        if not os.path.exists(padded_path):
            with h5py.File(vol_path, "r") as f:
                raw = f["raw"][...]
            raw = np.pad(raw, pad, mode="reflect")
            with h5py.File(padded_path, "w") as f:
                f.create_dataset("raw", data=raw)
        vol_path = padded_path
    full = size + 2 * pad

    out_dir = os.path.join(workdir, f"warmprobe_{time.time():.0f}")
    request = build_request(vol_path, out_dir, ckpt, lanes,
                            os.environ.get("F_DTYPE", "bf16"))
    outer = bounding_box.BoundingBox(start=(0, 0, 0), size=(full,) * 3)
    sharded = sharded_inference.ShardedInferenceDriver(
        request, outer, subvol_size_xyz=(sub,) * 3,
        overlap_xyz=(overlap,) * 3, seed_handoff=True)

    runner = runner_lib.Runner()
    runner.start(request)

    # Stop after construction: warmup runs in __init__.
    t_construct = {}
    orig_run = multi_canvas.MultiSubvolumeHopDriver.run

    def stop_after_construct(self):
        t_construct["t_warmup"] = self.stats.get("t_warmup", -1.0)
        return 0

    multi_canvas.MultiSubvolumeHopDriver.run = stop_after_construct
    t0 = time.time()
    sharded.run_worker_fused(runner=runner, lanes=lanes, slots=slots,
                             hops=hops, device_finalize=True)
    wall = time.time() - t0
    multi_canvas.MultiSubvolumeHopDriver.run = orig_run
    print(json.dumps({"metric": "warmup_marks",
                      "construct_s": round(wall, 1),
                      "t_warmup_s": round(
                          t_construct.get("t_warmup", -1.0), 1)}),
          flush=True)


if __name__ == "__main__":
    main()

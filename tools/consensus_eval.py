#!/usr/bin/env python3
"""Forward/reverse seed-order consensus: closing the raw batched-vs-
serial agreement gap.

Raw (fragment-including) agreement between the batched and serial
inference paths is limited by membrane-gap fragments whose placement
depends on seed ordering in BOTH paths; the reference ships
forward/reverse consensus for exactly this (ref doc/manual.md:129-142).
This tool runs the full recipe for each path:

  forward run (PolicyPeaks) ->
  reverse run (PolicyInvertOrigins over the forward origins) ->
  CONSENSUS_SPLIT intersection (consensus.py)

and reports RAW object-level agreement between the two paths'
consensus segmentations (plus each one's GT agreement), demonstrating
that consensus — not a restricted metric — reconciles the paths.

Env knobs: C_CKPT (required), C_SIZE (100), C_LANES (48), C_DTYPE
(bf16), C_PAD_IMAGE (16), C_MAX_ITERS (4000), C_MIN_SIZE (1000),
C_SPLIT_MIN (1000), C_WORKDIR.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from tools import synthetic_em
    from tools.quality_eval import build_request, make_phantom
    from ffn_tpu.inference import consensus as consensus_lib
    from ffn_tpu.inference import runner as runner_lib
    from ffn_tpu.inference import storage
    from ffn_tpu.proto import consensus_pb2

    ckpt = os.environ["C_CKPT"]
    size = int(os.environ.get("C_SIZE", "100"))
    lanes = int(os.environ.get("C_LANES", "48"))
    dtype = os.environ.get("C_DTYPE", "bf16")
    pad = int(os.environ.get("C_PAD_IMAGE", "16"))
    split_min = int(os.environ.get("C_SPLIT_MIN", "1000"))
    workdir = os.environ.get("C_WORKDIR", "/tmp/ffn_tpu_consensus")
    os.makedirs(workdir, exist_ok=True)

    # Held-out phantom (quality_eval's batched-vs-serial fixture seed).
    vol_path, gt = make_phantom(workdir, size, seed=11)
    if pad:
        import h5py
        padded_path = vol_path.replace(".h5", f"_pad{pad}.h5")
        if not os.path.exists(padded_path):
            with h5py.File(vol_path, "r") as f:
                raw = f["raw"][...]
            raw = np.pad(raw, pad, mode="reflect")
            with h5py.File(padded_path, "w") as f:
                f.create_dataset("raw", data=raw)
        vol_path = padded_path
    full = size + 2 * pad
    corner = (0, 0, 0)

    def segment(tag, n_lanes, seed_policy=None, seed_policy_args=None):
        out_dir = os.path.join(workdir, f"{tag}_{time.time():.0f}")
        request = build_request(vol_path, out_dir, ckpt, n_lanes, dtype)
        if seed_policy:
            request.seed_policy = seed_policy
            request.seed_policy_args = json.dumps(seed_policy_args or {})
        runner = runner_lib.Runner()
        max_iters = int(os.environ.get("C_MAX_ITERS", "4000"))
        if max_iters:
            runner.canvas_defaults["max_iters_per_segment"] = max_iters
        runner.start(request)
        t0 = time.time()
        runner.run(corner, (full,) * 3, keep_probability_maps=False)
        fovs = int(runner.counters["fov-moves"].value) or int(
            runner.counters["predict-calls"].value)  # serial path
        print(f"{tag}: {time.time() - t0:.0f} s, {fovs} FOVs",
              flush=True)
        return out_dir

    results = {}
    for tag, n_lanes in (("batched", lanes), ("serial", 1)):
        fwd = segment(f"{tag}_fwd", n_lanes)
        rev = segment(f"{tag}_rev", n_lanes,
                      seed_policy="PolicyInvertOrigins",
                      seed_policy_args={"segmentation_dir": fwd})
        creq = consensus_pb2.ConsensusRequest()
        creq.segmentation1.directory = fwd
        creq.segmentation2.directory = rev
        creq.type = consensus_pb2.ConsensusRequest.CONSENSUS_SPLIT
        creq.split_min_size = split_min
        cons, _ = consensus_lib.compute_consensus(corner, creq)
        if pad:
            cons = cons[pad:-pad, pad:-pad, pad:-pad]
        results[tag] = cons.astype(np.uint64)
        fwd_seg, _ = storage.load_segmentation(fwd, corner,
                                               split_cc=False)
        if pad:
            fwd_seg = fwd_seg[pad:-pad, pad:-pad, pad:-pad]
        results[f"{tag}_fwd_seg"] = fwd_seg.astype(np.uint64)

    raw_pre = synthetic_em.object_level_agreement(
        results["serial_fwd_seg"], results["batched_fwd_seg"])
    raw_post = synthetic_em.object_level_agreement(
        results["serial"], results["batched"])
    gt64 = gt.astype(np.uint64)
    print(json.dumps({
        "metric": "consensus_forward_reverse",
        "ckpt": ckpt, "size": size, "pad": pad, "lanes": lanes,
        "split_min_size": split_min,
        "raw_agreement_pre_consensus": round(float(raw_pre), 4),
        "raw_agreement_post_consensus": round(float(raw_post), 4),
        "gt_agreement_batched_consensus": round(float(
            synthetic_em.object_level_agreement(gt64,
                                                results["batched"])), 4),
        "gt_agreement_serial_consensus": round(float(
            synthetic_em.object_level_agreement(gt64,
                                                results["serial"])), 4),
        "target_post": 0.95,
    }), flush=True)


if __name__ == "__main__":
    main()

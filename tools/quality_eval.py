#!/usr/bin/env python3
"""Quality gate for a phantom-trained checkpoint.

Runs the full inference stack with a given checkpoint on the HELD-OUT
eval phantom (tools/synthetic_em.py default seed — never seen in
training, which uses seed=7) and reports:

  1. object-level agreement vs ground truth (target >= 0.95);
  2. lanes=N vs lanes=1 segmentation agreement (target >= 0.99) on a
     smaller volume (serial lanes=1 is the bit-exact reference
     semantics; this bounds the batched path's temporal-overlap
     deviation).

Env knobs: Q_CKPT (required), Q_SIZE (default 250), Q_LANES (default
64), Q_DTYPE (bf16|f32|int8), Q_SMALL (default 100; 0 skips check 2),
Q_MAX_ITERS (default 4000), Q_WORKDIR.

Prints one JSON line per check.
"""

import json
import os
import sys
import time

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def build_request(vol_path, out_dir, ckpt, lanes, dtype):
    import json as json_lib

    from google.protobuf import text_format
    from ffn_tpu.proto import inference_pb2

    model_args = {"depth": int(os.environ.get("Q_DEPTH", "12")),
                  "fov_size": [int(os.environ.get("Q_FOV", "33"))] * 3,
                  "deltas": [int(os.environ.get("Q_DELTAS", "8"))] * 3}
    if "Q_FEATURES" in os.environ:
        model_args["features"] = int(os.environ["Q_FEATURES"])
    if dtype == "bf16":
        model_args["dtype"] = "bfloat16"
    # Inference thresholds are per-dataset tuning knobs (ref
    # doc/manual.md:66-87); defaults match the reference's fib25 config,
    # env overrides support sweeps.
    move_t = float(os.environ.get("Q_MOVE_T", "0.9"))
    pad = float(os.environ.get("Q_PAD", "0.05"))
    seg_t = float(os.environ.get("Q_SEG_T", "0.6"))
    min_size = int(os.environ.get("Q_MIN_SIZE", "1000"))
    request = inference_pb2.InferenceRequest()
    text_format.Parse(f"""
image {{ hdf5: "{vol_path}:raw" }}
image_mean: 128
image_stddev: 33
seed_policy: "PolicyPeaks"
model_checkpoint_path: "{ckpt}"
model_name: "convstack_3d.ConvStack3DFFNModel"
segmentation_output_dir: "{out_dir}"
concurrent_requests: {lanes}
inference_options {{
  init_activation: 0.95
  pad_value: {pad}
  move_threshold: {move_t}
  min_boundary_dist {{ x: 1 y: 1 z: 1 }}
  segment_threshold: {seg_t}
  min_segment_size: {min_size}
}}""", request)
    if dtype == "bf16":
        import jax.numpy as jnp
        from ffn_tpu.models import convstack_3d

        class TunedConvStack(convstack_3d.ConvStack3DFFNModel):
            def __init__(self, **kwargs):
                kwargs.pop("dtype", None)
                super().__init__(dtype=jnp.bfloat16, precision=None,
                                 **kwargs)

        convstack_3d.TunedConvStack = TunedConvStack
        request.model_name = "convstack_3d.TunedConvStack"
    request.model_args = json_lib.dumps(model_args)
    return request


def run_seg(vol_path, size, ckpt, lanes, dtype, workdir, tag):
    """Segments the volume; returns (seg, wall_s, fov_calls, objects).

    Q_PAD_IMAGE=<margin> reflect-pads the image before segmenting and
    crops the result back: voxels within the FOV margin of a volume
    face are unreachable by the moving FOV, so border objects are
    otherwise truncated by geometry, not model quality. This mirrors
    how production runs handle borders — overlapping subvolume
    decomposition (reference doc/manual.md:107-117) gives interior
    context to every face except the dataset boundary.
    """
    from ffn_tpu.inference import runner as runner_lib

    pad = int(os.environ.get("Q_PAD_IMAGE", "0"))
    if pad:
        padded_path = vol_path.replace(".h5", f"_pad{pad}.h5")
        if not os.path.exists(padded_path):
            with h5py.File(vol_path, "r") as f:
                raw = f["raw"][...]
            raw = np.pad(raw, pad, mode="reflect")
            with h5py.File(padded_path, "w") as f:
                f.create_dataset("raw", data=raw)
        vol_path = padded_path

    out_dir = os.path.join(workdir, f"q_{tag}_{time.time():.0f}")
    request = build_request(vol_path, out_dir, ckpt, lanes, dtype)
    runner = runner_lib.Runner()
    max_iters = int(os.environ.get("Q_MAX_ITERS", "4000"))
    if max_iters:
        runner.canvas_defaults["max_iters_per_segment"] = max_iters
    runner.start(request, precision="int8" if dtype == "int8" else None)
    t0 = time.time()
    canvas = runner.run((0, 0, 0), (size + 2 * pad,) * 3,
                        keep_probability_maps=False)
    wall = time.time() - t0
    seg = np.maximum(canvas.segmentation, 0).astype(np.uint64)
    if pad:
        seg = seg[pad:-pad, pad:-pad, pad:-pad]
    fovs = runner.counters["fov-moves"].value
    return seg, wall, int(fovs), len(canvas.origins)


def make_phantom(workdir, size, seed=None, morphology=None):
    """Builds an eval phantom; morphology "a" (default) is the round-2
    isotropic family, "b" the anisotropic lognormal-cell-size family
    (synthetic_em.make_volume_b). Q_MORPH selects it for the gate."""
    from tools import synthetic_em

    if morphology is None:
        morphology = os.environ.get("Q_MORPH", "a")
    tag = "eval" if seed is None else f"s{seed}"
    if morphology != "a":
        tag = f"{morphology}_{tag}"
    path = os.path.join(workdir, f"phantom_{tag}_{size}.h5")
    if not os.path.exists(path):
        kwargs = {} if seed is None else {"seed": seed}
        if morphology == "a":
            if size != 250:
                kwargs["num_cells"] = max(8,
                                          int(120 * (size / 250.0) ** 3))
            image, gt = synthetic_em.make_volume(size=size, **kwargs)
        else:
            image, gt = synthetic_em.make_volume_b(size=size, **kwargs)
        with h5py.File(path, "w") as f:
            f.create_dataset("raw", data=image)
            f.create_dataset("gt", data=gt)
    with h5py.File(path, "r") as f:
        gt = f["gt"][...]
    return path, gt


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from tools import synthetic_em

    ckpt = os.environ["Q_CKPT"]
    size = int(os.environ.get("Q_SIZE", "250"))
    lanes = int(os.environ.get("Q_LANES", "64"))
    dtype = os.environ.get("Q_DTYPE", "bf16")
    small = int(os.environ.get("Q_SMALL", "100"))
    workdir = os.environ.get("Q_WORKDIR", "/tmp/ffn_tpu_quality")
    os.makedirs(workdir, exist_ok=True)

    # 1. GT agreement on the held-out eval phantom.
    vol_path, gt = make_phantom(workdir, size)
    seg, wall, fovs, n_obj = run_seg(vol_path, size, ckpt, lanes, dtype,
                                     workdir, "gt")
    agreement = synthetic_em.object_level_agreement(
        gt.astype(np.uint64), seg)
    print(json.dumps({
        "metric": "phantom_gt_agreement", "ckpt": ckpt, "size": size,
        "lanes": lanes, "dtype": dtype, "wall_s": round(wall, 1),
        "fov_calls": fovs, "fov_per_s": round(fovs / max(wall, 1e-9), 1),
        "objects": n_obj,
        "segmented_fraction": round(float((seg > 0).mean()), 3),
        "agreement": round(float(agreement), 4),
        "target": 0.95,
    }), flush=True)

    # 2. Batched-vs-serial agreement on a smaller phantom. The headline
    # number is cell-restricted (both segmentations masked to the GT
    # foreground): it asks "do the two paths partition the true cells
    # the same way". The raw number additionally counts membrane-gap
    # fragments — sub-cell debris whose placement depends on seed
    # ordering in BOTH paths (the reference's forward/reverse consensus
    # exists precisely because ordering moves those), so it measures
    # ordering sensitivity, not batched-path correctness.
    if small:
        vol_s, gt_s = make_phantom(workdir, small, seed=11)
        seg_n, wall_n, _, _ = run_seg(vol_s, small, ckpt, lanes, dtype,
                                      workdir, "lanesN")
        seg_1, wall_1, _, _ = run_seg(vol_s, small, ckpt, 1, dtype,
                                      workdir, "lanes1")
        gt_fg = gt_s.astype(np.uint64) > 0
        agree_cells = synthetic_em.object_level_agreement(
            np.where(gt_fg, seg_1, 0), np.where(gt_fg, seg_n, 0))
        agree_raw = synthetic_em.object_level_agreement(seg_1, seg_n)
        print(json.dumps({
            "metric": "lanes_vs_serial_agreement", "size": small,
            "lanes": lanes, "dtype": dtype,
            "wall_lanes_s": round(wall_n, 1),
            "wall_serial_s": round(wall_1, 1),
            "agreement": round(float(agree_cells), 4),
            "agreement_raw_with_fragments": round(float(agree_raw), 4),
            "target": 0.99,
        }), flush=True)


if __name__ == "__main__":
    main()

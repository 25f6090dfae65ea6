#!/usr/bin/env python3
"""Headline end-to-end benchmark: segment a 250^3 volume with the shipped
fib25 ConvStack3D checkpoint through the full inference stack
(PolicyPeaks seeding -> batched flood fill -> npz outputs).

The FIB-25 image data is not redistributable (gs:// only); a synthetic
EM-like phantom with known ground-truth cells stands in, so this measures
the true system wall-clock (the reference's comparable number: ~420 s on a
P100 for training2 250^3) plus an object-level agreement proxy against
the phantom's ground truth.

Env knobs: E2E_SIZE (default 250), E2E_LANES (default 48),
E2E_DTYPE (f32|bf16, default bf16), E2E_PRECISION (default|highest),
E2E_CKPT (checkpoint path; default the shipped fib25 TF1 checkpoint),
E2E_DEPTH (default 12), E2E_MAX_ITERS (default 2000, 0 = unlimited).
"""

import json
import os
import sys
import time

import h5py
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

    from google.protobuf import text_format
    from tools import synthetic_em
    from ffn_tpu.inference import runner as runner_lib
    from ffn_tpu.proto import inference_pb2
    from ffn_tpu.utils import labels as labels_lib

    size = int(os.environ.get("E2E_SIZE", "250"))
    # 48 lanes measured fastest for ~120-object 250^3 volumes (more
    # lanes mostly idle behind the seed supply: RESULTS.md round 2);
    # bf16 POM storage is the production default at this shape.
    lanes = int(os.environ.get("E2E_LANES", "48"))
    os.environ.setdefault("FFN_TPU_SEED_DTYPE", "bf16")
    dtype = os.environ.get("E2E_DTYPE", "bf16")
    precision = os.environ.get("E2E_PRECISION", "default")

    workdir = os.environ.get("E2E_WORKDIR", "/tmp/ffn_tpu_e2e")
    os.makedirs(workdir, exist_ok=True)
    vol_path = os.path.join(workdir, f"phantom_{size}.h5")
    if not os.path.exists(vol_path):
        print("generating phantom volume...", flush=True)
        image, gt = synthetic_em.make_volume(size=size)
        with h5py.File(vol_path, "w") as f:
            f.create_dataset("raw", data=image)
            f.create_dataset("gt", data=gt)
    with h5py.File(vol_path, "r") as f:
        gt = f["gt"][...]

    out_dir = os.path.join(
        workdir, f"seg_{size}_{lanes}_{dtype}_{precision}_{time.time():.0f}")

    ckpt = os.environ.get(
        "E2E_CKPT",
        "/root/reference/models/fib25/model.ckpt-27465036")
    depth = int(os.environ.get("E2E_DEPTH", "12"))
    model_args = {"depth": depth, "fov_size": [33, 33, 33],
                  "deltas": [8, 8, 8]}
    if dtype == "bf16":
        model_args["dtype"] = "bfloat16"

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
  pad_value: 0.05
  move_threshold: 0.9
  min_boundary_dist {{ x: 1 y: 1 z: 1 }}
  segment_threshold: 0.6
  min_segment_size: 1000
}}""", request)
    import json as json_lib
    request.model_args = json_lib.dumps(model_args)

    # Model wrapper needs dtype/precision objects; patch via registry-level
    # kwargs is messy — use a shim model name instead.
    if dtype == "bf16" or precision == "highest":
        import jax.numpy as jnp
        from jax import lax
        from ffn_tpu.models import convstack_3d

        class TunedConvStack(convstack_3d.ConvStack3DFFNModel):
            def __init__(self, **kwargs):
                kwargs.pop("dtype", None)
                super().__init__(
                    dtype=jnp.bfloat16 if dtype == "bf16" else jnp.float32,
                    precision=(lax.Precision.HIGHEST
                               if precision == "highest" else None),
                    **kwargs)

        convstack_3d.TunedConvStack = TunedConvStack
        request.model_name = "convstack_3d.TunedConvStack"

    runner = runner_lib.Runner()
    max_iters = int(os.environ.get("E2E_MAX_ITERS", "2000"))
    if max_iters:
        runner.canvas_defaults["max_iters_per_segment"] = max_iters
    t0 = time.time()
    runner.start(request,
                 precision="int8" if dtype == "int8" else None)
    t_start = time.time() - t0
    print(f"runner.start: {t_start:.1f}s", flush=True)

    t0 = time.time()
    canvas = runner.run((0, 0, 0), (size, size, size),
                        keep_probability_maps=False)
    wall = time.time() - t0

    seg = canvas.segmentation
    n_objects = len(canvas.origins)
    voxels = int((seg > 0).sum())
    fov_calls = runner.counters["fov-moves"].value

    agreement = synthetic_em.object_level_agreement(
        gt.astype(np.uint64), np.maximum(seg, 0).astype(np.uint64))

    result = {
        "metric": "training2_250_wallclock_proxy",
        "size": size, "lanes": lanes, "dtype": dtype,
        "precision": precision,
        "wall_s": round(wall, 1),
        "startup_s": round(t_start, 1),
        "objects": n_objects,
        "segmented_voxels": voxels,
        "segmented_fraction": round(voxels / seg.size, 3),
        "fov_calls": int(fov_calls),
        "fov_per_s": round(fov_calls / wall, 1) if wall else 0,
        "gt_object_agreement": round(agreement, 3),
        "reference_p100_wall_s": 420,
        "speedup_vs_p100": round(420.0 / wall, 2) if wall else 0,
    }
    print(json.dumps(result))
    # Wall-time breakdown of the big phases (ms).
    breakdown = {}
    for name in ("predict", "finalize", "seed-policy", "save_checkpoint",
                 "segment_all"):
        value = runner.counters[f"{name}-time-ms"].value
        if value:
            breakdown[name] = int(value)
    print(json.dumps({"metric": "e2e_time_breakdown_ms", **breakdown}))
    counters_path = os.path.join(out_dir, "counters.txt")
    runner.counters.dump(counters_path)
    print(f"counters: {counters_path}")


if __name__ == "__main__":
    main()

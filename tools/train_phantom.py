#!/usr/bin/env python3
"""Trains an FFN on the synthetic EM phantom, end to end:

  phantom generation -> compute_partitions -> build_coordinates ->
  scan-trainer on TPU -> npz checkpoint

The resulting checkpoint feeds tools/e2e_bench.py (E2E_CKPT=...) for a
full-quality headline run: unlike the fib25 net (trained on real FIB-25
EM), a phantom-trained net respects the phantom's membranes, so the
benchmark measures both speed and segmentation quality.

Env knobs: PH_SIZE (train volume, default 200), PH_STEPS (default 3000),
PH_BATCH (default 8), PH_DEPTH (default 12), PH_WORKDIR, PH_MORPH
("a" = isotropic Voronoi phantom, "b" = anisotropic lognormal family —
synthetic_em.make_volume_b).
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
    from absl import logging as absl_logging
    absl_logging.set_verbosity(absl_logging.INFO)
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from tools import synthetic_em
    from ffn_tpu.training import optimizer as optimizer_lib
    from ffn_tpu.training import partitions
    from ffn_tpu.training import train_lib, train_loop

    size = int(os.environ.get("PH_SIZE", "200"))
    init = os.environ.get("PH_INIT", "ref")
    if init == "he":
        # He init escapes the deep-residual identity plateau far faster
        # than the reference's TruncatedNormal(0.01) (see RESULTS.md);
        # same compiled program, different starting params.
        import flax.linen as nn
        from ffn_tpu.models import convstack_3d
        convstack_3d._KERNEL_INIT = nn.initializers.he_normal()
    steps = int(os.environ.get("PH_STEPS", "3000"))
    batch = int(os.environ.get("PH_BATCH", "8"))
    depth = int(os.environ.get("PH_DEPTH", "12"))
    # Scalar = isotropic; "x,y,z" = anisotropic (match deltas to the
    # dataset's voxel anisotropy, as the reference does for ssEM — e.g.
    # morphology B's (2,1,1) zyx voxels want fov 17,17,9 / deltas 6,6,3).
    def _axes(env, default):
        raw = os.environ.get(env, default)
        vals = [int(v) for v in raw.split(",")]
        return tuple(vals * 3 if len(vals) == 1 else vals)

    fov = _axes("PH_FOV", "33")      # xyz
    delta = _axes("PH_DELTA", "8")   # xyz
    features = int(os.environ.get("PH_FEATURES", "32"))
    workdir = os.environ.get("PH_WORKDIR", "/tmp/ffn_tpu_phantom_train")
    os.makedirs(workdir, exist_ok=True)

    morph = os.environ.get("PH_MORPH", "a")
    suffix = "" if morph == "a" else f"_{morph}"
    vol_path = os.path.join(workdir, f"train_{size}{suffix}.h5")
    if not os.path.exists(vol_path):
        print("generating training phantom...", flush=True)
        # Different RNG seed than the eval phantom in e2e_bench.
        if morph == "b":
            image, gt = synthetic_em.make_volume_b(size=size, seed=7)
        else:
            image, gt = synthetic_em.make_volume(
                size=size, seed=7,
                num_cells=max(8, int(120 * (size / 250) ** 3)))
        with h5py.File(vol_path, "w") as f:
            f.create_dataset("raw", data=image)
            f.create_dataset("seg", data=gt.astype(np.uint64))

    coords_path = os.path.join(workdir, f"coords{suffix}.npz")
    if not os.path.exists(coords_path):
        print("computing partitions + coordinates...", flush=True)
        with h5py.File(vol_path, "r") as f:
            seg = f["seg"][...]
        # lom_radius is xyz, like fov/delta (partitions.py:65).
        lom_radius = tuple(f // 2 + d for f, d in zip(fov, delta))
        corner, parts = partitions.compute_partitions(
            seg.astype(np.uint64),
            thresholds=[0.025, 0.05, 0.075, 0.1, 0.2, 0.3, 0.4, 0.5,
                        0.6, 0.7, 0.8, 0.9],
            lom_radius=lom_radius, min_size=1000)
        # Class-balanced resampled coordinate list (margin = lom radius
        # inside the VALID-cropped partition map, like build_coordinates).
        rng = np.random.RandomState(0)
        totals = {}
        rows = {}
        for val in np.unique(parts):
            if val in (0, 255):
                continue
            flat = np.flatnonzero(parts == val)
            totals[val] = len(flat)
            rows[val] = flat
        max_count = max(totals.values())
        all_rows = []
        for val, flat in rows.items():
            flat = flat[rng.permutation(len(flat))]
            reps = -(-max_count // len(flat))
            all_rows.append(np.tile(flat, reps)[:max_count])
        all_rows = np.concatenate(all_rows)
        rng.shuffle(all_rows)
        z, y, x = np.unravel_index(all_rows, parts.shape)
        centers = np.stack([x + corner[0], y + corner[1], z + corner[2]],
                           axis=1).astype(np.int64)
        np.savez_compressed(
            coords_path, center=centers,
            label_volume_name=np.array(["v"] * len(centers)))
        print(f"{len(centers)} coordinates", flush=True)

    config = train_lib.TrainConfig(
        fov_size=fov, deltas=delta, depth=depth,
        features=features,
        batch_size=batch,
        precision=os.environ.get("PH_PRECISION", "bf16"),
        remat=os.environ.get("PH_REMAT", "0") == "1",
        ema_decay=float(os.environ.get("PH_EMA", "0.999")),
        optimizer=optimizer_lib.OptimizerConfig(
            optimizer="adam",
            learning_rate=float(os.environ.get("PH_LR", "1e-3"))))
    data = train_loop.DataConfig(
        train_coords=coords_path,
        data_volumes=f"v:{vol_path}:raw",
        label_volumes=f"v:{vol_path}:seg",
        image_mean=128.0, image_stddev=33.0)
    train_dir = os.environ.get("PH_TRAIN_DIR",
                               os.path.join(workdir, "train"))
    loop = train_loop.LoopConfig(
        train_dir=train_dir,
        max_steps=steps, summary_every_steps=50,
        checkpoint_every_steps=int(os.environ.get("PH_CKPT_EVERY", "500")),
        max_to_keep=int(os.environ.get("PH_MAX_KEEP", "5")),
        keep_every_n_steps=int(os.environ.get("PH_KEEP_EVERY", "2000")),
        stall_timeout_secs=float(os.environ.get("PH_STALL_TIMEOUT",
                                                "900")))

    trainer = os.environ.get("PH_TRAINER", "host_loop")
    t0 = time.time()
    run = (train_loop.run_training_host_loop if trainer == "host_loop"
           else train_loop.run_training)
    summaries = run(
        "convstack_3d.ConvStack3DFFNModel",
        json.dumps({"depth": depth, "fov_size": list(fov),
                    "deltas": list(delta), "features": features}),
        config, data, loop)
    wall = time.time() - t0
    print(json.dumps({
        "metric": "phantom_training",
        "steps": steps, "batch": batch, "depth": depth,
        "wall_s": round(wall, 1),
        "steps_per_s": round(steps / wall, 2),
        "fov_updates_per_s": round(steps * batch * 27 / wall, 1),
        **{k: round(float(v), 4) for k, v in summaries.items()
           if k in ("eval/patch_loss", "eval/f1", "moves/correct",
                    "moves/spurious", "moves/missed")},
    }))
    print("checkpoint dir:", os.path.join(train_dir, "ckpt"))


if __name__ == "__main__":
    main()

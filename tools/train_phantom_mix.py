#!/usr/bin/env python3
"""Fine-tunes a phantom checkpoint on a MIX of both phantom morphologies.

Morphology A is the round-2 isotropic Voronoi phantom (synthetic_em.
make_volume); morphology B is the anisotropic-voxel + lognormal-cell-size
family (make_volume_b). Training on the 50/50 mix from a warm start
yields one checkpoint that clears the quality gate on both held-out
morphologies — the "generalizes beyond the fixture" evidence while real
EM data is unreachable (ref README.md:120-131's fib25 demo is the
blocked equivalent).

Env knobs:
  MIX_INIT_FROM  train-dir ckpt directory to warm start from (copies the
                 latest model/opt/extra trio; default: fresh start)
  MIX_STEPS      total step budget incl. warm-start steps (default 5000)
  MIX_MORPHS     which morphologies to train on: "ab" (50/50 mix,
                 default), "a", or "b". Measured round 3: the 50/50 mix
                 at full LR catastrophically interferes (held-out A
                 agreement 0.9833 -> ~0 after 1250 mix steps), so the
                 production recipe is ONE CHECKPOINT PER FAMILY via
                 MIX_MORPHS=b warm-started from the A checkpoint —
                 exactly the reference's per-dataset checkpoint model
                 (ref models/fib25/README.md).
  MIX_BATCH (128), MIX_SIZE (200), MIX_WORKDIR (/tmp/ph_r3_mix),
  MIX_LR (1e-3), MIX_DEPTH (12)

Measured round 4 (B-only warm start from the A flagship at step 2762,
LR 1e-3): held-out B agreement 0.5911 (A ckpt) -> 0.7333 at +238 steps,
then COLLAPSE to ~0 by +488 steps (loss oscillating 0.24<->0.59,
moves/correct decaying) — full training LR destabilizes the fine-tune.
Next recipe iteration should use MIX_LR=1e-4..3e-4; the shipped
models/phantom/model-r4b.npz is the +238-step pre-collapse peak.
"""

import json
import os
import shutil
import sys
import time

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def build_coords(vol_path, coords_path, volname, lom_radius=(24, 24, 24),
                 rng_seed=0):
    """compute_partitions + class-balanced coordinates for one volume."""
    from ffn_tpu.training import partitions

    with h5py.File(vol_path, "r") as f:
        seg = f["seg"][...]
    corner, parts = partitions.compute_partitions(
        seg.astype(np.uint64),
        thresholds=[0.025, 0.05, 0.075, 0.1, 0.2, 0.3, 0.4, 0.5,
                    0.6, 0.7, 0.8, 0.9],
        lom_radius=lom_radius, min_size=1000)
    rng = np.random.RandomState(rng_seed)
    totals, rows = {}, {}
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
    np.savez_compressed(coords_path, center=centers,
                        label_volume_name=np.array([volname]
                                                   * len(centers)))
    return len(centers)


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
    from ffn_tpu.training import train_lib, train_loop

    size = int(os.environ.get("MIX_SIZE", "200"))
    steps = int(os.environ.get("MIX_STEPS", "5000"))
    batch = int(os.environ.get("MIX_BATCH", "128"))
    depth = int(os.environ.get("MIX_DEPTH", "12"))
    workdir = os.environ.get("MIX_WORKDIR", "/tmp/ph_r3_mix")
    os.makedirs(workdir, exist_ok=True)

    morphs = os.environ.get("MIX_MORPHS", "ab")

    # Training volumes (seed 7 = the training family; eval phantoms use
    # other seeds).
    vols = {}
    for name, maker in (("a", synthetic_em.make_volume),
                        ("b", synthetic_em.make_volume_b)):
        if name not in morphs:
            continue
        path = os.path.join(workdir, f"train_{name}_{size}.h5")
        vols[name] = path
        if os.path.exists(path):
            continue
        print(f"generating morphology {name}...", flush=True)
        kwargs = {"size": size, "seed": 7}
        if name == "a":
            kwargs["num_cells"] = max(8, int(120 * (size / 250) ** 3))
        image, gt = maker(**kwargs)
        with h5py.File(path, "w") as f:
            f.create_dataset("raw", data=image)
            f.create_dataset("seg", data=gt.astype(np.uint64))

    # Balanced 50/50 mixed coordinate stream, long enough that the
    # warm start's consumed-cursor fast-forward never exhausts it.
    coords_path = os.path.join(workdir, f"coords_mix_{morphs}.npz") \
        if morphs != "ab" else os.path.join(workdir, "coords_mix.npz")
    if not os.path.exists(coords_path):
        parts = []
        for name in vols:
            cpath = os.path.join(workdir, f"coords_{name}.npz")
            if not os.path.exists(cpath):
                print(f"coordinates for {name}...", flush=True)
                build_coords(vols[name], cpath, name)
            data = np.load(cpath, allow_pickle=True)
            parts.append((data["center"], data["label_volume_name"]))
        n = max(len(c) for c, _ in parts)
        need = (steps + 100) * batch
        reps = max(1, -(-need // (2 * n)))
        centers, names = [], []
        for c, nm in parts:
            tiles = -(-n * reps // len(c))
            centers.append(np.tile(c, (tiles, 1))[:n * reps])
            names.append(np.tile(nm, tiles)[:n * reps])
        centers = np.concatenate(centers)
        names = np.concatenate(names)
        rng = np.random.RandomState(42)
        order = rng.permutation(len(centers))
        np.savez_compressed(coords_path, center=centers[order],
                            label_volume_name=names[order])
        print(f"{len(centers)} mixed coordinates", flush=True)

    train_dir = os.path.join(workdir, "train")
    ckpt_dir = os.path.join(train_dir, "ckpt")
    init_from = os.environ.get("MIX_INIT_FROM", "")
    if init_from and not os.path.isdir(ckpt_dir):
        src = os.path.join(init_from, "ckpt") \
            if os.path.isdir(os.path.join(init_from, "ckpt")) else init_from
        steps_avail = sorted(
            int(f.split("-")[1].split(".")[0])
            for f in os.listdir(src)
            if f.startswith("model.ckpt-") and f.endswith(".npz"))
        last = steps_avail[-1]
        os.makedirs(ckpt_dir, exist_ok=True)
        for prefix in ("model.ckpt-", "opt.ckpt-", "extra.ckpt-"):
            p = os.path.join(src, f"{prefix}{last}.npz")
            if os.path.exists(p):
                shutil.copy(p, ckpt_dir)
        print(f"warm start from {src} step {last}", flush=True)

    config = train_lib.TrainConfig(
        fov_size=(33, 33, 33), deltas=(8, 8, 8), depth=depth, features=32,
        batch_size=batch, precision="bf16", remat=False,
        ema_decay=0.999,
        optimizer=optimizer_lib.OptimizerConfig(
            optimizer="adam",
            learning_rate=float(os.environ.get("MIX_LR", "1e-3"))))
    data = train_loop.DataConfig(
        train_coords=coords_path,
        data_volumes=",".join(f"{n}:{p}:raw" for n, p in vols.items()),
        label_volumes=",".join(f"{n}:{p}:seg" for n, p in vols.items()),
        image_mean=128.0, image_stddev=33.0)
    loop = train_loop.LoopConfig(
        train_dir=train_dir, max_steps=steps, summary_every_steps=50,
        checkpoint_every_steps=250, max_to_keep=6,
        keep_every_n_steps=1000, stall_timeout_secs=1800)

    t0 = time.time()
    summaries = train_loop.run_training(
        "convstack_3d.ConvStack3DFFNModel",
        json.dumps({"depth": depth, "fov_size": [33, 33, 33],
                    "deltas": [8, 8, 8]}),
        config, data, loop)
    wall = time.time() - t0
    print(json.dumps({
        "metric": "phantom_mix_training", "steps": steps, "batch": batch,
        "wall_s": round(wall, 1),
        **{k: round(float(v), 4) for k, v in summaries.items()
           if k in ("eval/patch_loss", "eval/f1")},
    }))
    print("checkpoint dir:", ckpt_dir)


if __name__ == "__main__":
    main()

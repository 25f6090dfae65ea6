#!/usr/bin/env python3
"""Probes scan-trainer compile + step time at the flagship config on the
real TPU. Env knobs: PB_BATCH (16), PB_DEPTH (12), PB_PRECISION (bf16),
PB_REMAT (1), PB_STEPS (5)."""

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
    import jax.numpy as jnp

    from ffn_tpu.models import convstack_3d
    from ffn_tpu.training import optimizer as optimizer_lib
    from ffn_tpu.training import precision as precision_lib
    from ffn_tpu.training import train_lib

    batch = int(os.environ.get("PB_BATCH", "16"))
    depth = int(os.environ.get("PB_DEPTH", "12"))
    prec = os.environ.get("PB_PRECISION", "bf16")
    remat = os.environ.get("PB_REMAT", "1") == "1"
    packed = os.environ.get("PB_PACKED", "0") == "1"
    n_steps = int(os.environ.get("PB_STEPS", "5"))

    print(f"devices: {jax.devices()}", flush=True)
    config = train_lib.TrainConfig(
        fov_size=(33, 33, 33), deltas=(8, 8, 8), depth=depth, features=32,
        batch_size=batch, precision=prec, remat=remat,
        optimizer=optimizer_lib.OptimizerConfig(optimizer="adam",
                                                learning_rate=1e-3))
    policy = precision_lib.get_policy(prec)
    model = convstack_3d.ConvStack3DFFNModel(
        fov_size=[33, 33, 33], deltas=[8, 8, 8], depth=depth, features=32,
        dtype=policy.compute_dtype,
        precision=None if prec != "f32" else None)
    tx = optimizer_lib.optimizer_from_config(config.optimizer)
    state, _ = train_lib.create_train_state(model, config)
    step = train_lib.make_scan_train_step(model, tx, config)

    info = model.info
    canvas = tuple(int(v)
                   for v in train_lib.train_canvas_size(info, config)[::-1])
    label_canvas = tuple(
        int(v) for v in train_lib.train_labels_size(info, config)[::-1])
    rng = np.random.RandomState(0)
    seeds = train_lib.make_seed_canvas(batch, canvas, config.seed_pad,
                                       config.seed_init)
    images = rng.randn(batch, *canvas, 1).astype(np.float32)
    labels = np.full((batch, *label_canvas, 1), 0.95, np.float32)
    weights = np.ones_like(labels)
    offsets = train_lib.fixed_offsets_zyx(info)

    params, opt_state = state.params, state.opt_state
    ema, scale = state.ema_params, state.scale_state

    if packed:
        step = train_lib.make_scan_train_step_packed(model, tx, config)
        image_u8 = rng.randint(0, 255, (batch, *canvas, 1)).astype(np.uint8)
        lom_u8 = (rng.rand(batch, *label_canvas, 1) > 0.5).astype(np.uint8)

        def run_one():
            nonlocal params, opt_state, ema, scale
            params, opt_state, ema, scale, metrics = step(
                params, opt_state, ema, scale, jnp.asarray(image_u8),
                jnp.asarray(lom_u8), jnp.asarray(offsets))
            return metrics
    else:
        def run_one():
            nonlocal params, opt_state, ema, scale
            params, opt_state, ema, scale, out_seeds, metrics = step(
                params, opt_state, ema, scale, jnp.asarray(seeds),
                jnp.asarray(images), jnp.asarray(labels),
                jnp.asarray(weights), jnp.asarray(offsets))
            return metrics

    t0 = time.time()
    metrics = run_one()
    losses = np.asarray(metrics["loss"])
    compile_s = time.time() - t0
    print(f"first step (compile+run): {compile_s:.1f}s", flush=True)

    # NOTE: jax.block_until_ready does not synchronize on the axon tunnel
    # (returns at enqueue-ack); a host read of the metrics forces true
    # completion, so the timing below is honest end-to-end step time.
    t0 = time.time()
    for _ in range(n_steps):
        metrics = run_one()
        losses = np.asarray(metrics["loss"])
    dt = (time.time() - t0) / n_steps
    print(json.dumps({
        "metric": "scan_step_tpu", "batch": batch, "depth": depth,
        "precision": prec, "remat": remat, "packed": packed,
        "compile_s": round(compile_s, 1),
        "step_s": round(dt, 3),
        "fov_updates_per_s": round(batch * len(offsets) / dt, 1),
        "loss_mean": round(float(losses.mean()), 4),
        "finite": bool(np.isfinite(losses).all()),
    }), flush=True)


if __name__ == "__main__":
    main()

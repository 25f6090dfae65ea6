#!/usr/bin/env python3
"""Micro-benchmark of HopEngine.screen_seeds on the production shape.

Measures compile time and steady-state per-call latency of the seed
pre-screening program at the fused-driver shape (8 slots x 165^3, 256
candidates), to attribute the e2e t_screen cost (fixed per-call
overhead vs conv-bound) before optimizing.

Env: PS_BATCH (256), PS_SLOTS (8), PS_SUB (165), PS_CALLS (10),
PS_CKPT (models/phantom/model-r2.npz).
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

    import jax.numpy as jnp
    from scipy.special import logit

    from ffn_tpu.inference import hop_engine, runner as runner_lib
    from ffn_tpu.models import convstack_3d

    B = int(os.environ.get("PS_BATCH", "256"))
    K = int(os.environ.get("PS_SLOTS", "8"))
    sub = int(os.environ.get("PS_SUB", "165"))
    calls = int(os.environ.get("PS_CALLS", "10"))
    ckpt = os.environ.get("PS_CKPT", "models/phantom/model-r2.npz")

    model = convstack_3d.ConvStack3DFFNModel(
        fov_size=[33, 33, 33], deltas=[8, 8, 8], depth=12,
        features=32, dtype=jnp.bfloat16)
    params = runner_lib.load_model_params(ckpt)

    engine = hop_engine.HopEngine(
        model, params, pad_value=float(logit(0.05)),
        move_threshold=float(logit(0.9)), disco_seed_threshold=-1.0)

    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(K, sub, sub, sub).astype(np.float32))
    margin = 17
    pos = rng.randint(margin, sub - margin, size=(B, 3)).astype(np.int32)
    sv = rng.randint(0, K, size=B).astype(np.int32)

    t0 = time.time()
    out = engine.screen_seeds(image, pos, 0.95, sv=sv)
    t_first = time.time() - t0

    times = []
    for _ in range(calls):
        pos = rng.randint(margin, sub - margin,
                          size=(B, 3)).astype(np.int32)
        sv = rng.randint(0, K, size=B).astype(np.int32)
        t0 = time.time()
        out = engine.screen_seeds(image, pos, 0.95, sv=sv)
        times.append(time.time() - t0)
    times = np.array(times)
    print(json.dumps({
        "metric": "screen_seeds_probe", "batch": B, "slots": K,
        "sub": sub, "first_call_s": round(t_first, 3),
        "median_call_ms": round(float(np.median(times)) * 1000, 1),
        "min_call_ms": round(float(times.min()) * 1000, 1),
        "per_cand_us": round(
            float(np.median(times)) / B * 1e6, 1),
        "strong_frac": round(float(out.mean()), 3),
    }), flush=True)


if __name__ == "__main__":
    main()

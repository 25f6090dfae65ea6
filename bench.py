#!/usr/bin/env python3
"""Benchmark: FOV inference throughput of the flood-fill engine.

Prints ONE JSON line:
  {"metric": "fov_steps_per_sec_per_chip", "value": N, "unit": "FOV/s",
   "vs_baseline": R}

Measures the production hot path (engine.select_step: on-device candidate
selection -> conv stack -> disco mask -> scatter -> face-max scoring, with
only scalar-sized host traffic) for the flagship ConvStack3D (depth 12,
33^3 FOV, fib25 configuration) on a 250^3 canvas with BENCH_BATCH
concurrent lanes.

Baseline derivation (vs_baseline): the reference segments training2 250^3
in ~420 s on a P100 (README.md:130-131); at roughly 1e5 FOV inferences for
that volume this is ~240 FOV/s. vs_baseline = ours / 240.

Env knobs: BENCH_BATCH (lanes, default 120), BENCH_STEPS (default 30),
BENCH_CANVAS (default 250), BENCH_PRECISION (default|highest),
BENCH_DTYPE (f32|bf16|int8), BENCH_MODE (hops|select),
BENCH_HOPS (default 16), BENCH_SEED_DTYPE (f32|bf16 POM storage).

BENCH_MODE=hops (default) measures the device-resident movement path
(hop_engine.run_hops: pop-until-valid from the on-device FIFO -> conv
stack -> disco mask -> scatter -> face scoring -> push, BENCH_HOPS moves
per host round trip). BENCH_MODE=select measures the round-based
candidate-select path (one move per round trip).
"""

import json
import os
import sys
import time

import numpy as np


def _init_backend_with_retry():
    """Return a live jax module, retrying backend init with backoff.

    The tunneled TPU backend has transient outages (round 3 lost its
    perf capture to one).  Poll jax.devices() with exponential backoff
    for up to BENCH_INIT_TIMEOUT seconds (default 900); on final
    failure emit a structured JSON error line instead of a traceback so
    the driver records a parseable artifact.
    """
    deadline = time.time() + float(
        os.environ.get("BENCH_INIT_TIMEOUT", "900"))
    delay = 5.0
    last_err = None
    while True:
        try:
            import jax
            devs = jax.devices()
            if devs:
                return jax
            last_err = "jax.devices() returned no devices"
        except Exception as e:  # backend init raises RuntimeError
            last_err = f"{type(e).__name__}: {e}"
        if time.time() >= deadline:
            print(json.dumps({
                "metric": "fov_steps_per_sec_per_chip",
                "error": "tpu_unavailable",
                "detail": str(last_err)[:500],
                "value": None,
                "unit": "FOV/s",
                "vs_baseline": None,
            }))
            sys.exit(0)
        print(f"bench: backend unavailable ({last_err}); retrying in "
              f"{delay:.0f}s", file=sys.stderr, flush=True)
        time.sleep(delay)
        delay = min(delay * 1.7, 60.0)


def main():
    jax = _init_backend_with_retry()
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from ffn_tpu.inference import engine as engine_lib
    from ffn_tpu.inference import hop_engine as hop_engine_lib
    from ffn_tpu.models import convstack_3d

    # 120 lanes: the largest batch whose seed buffers (2x while-loop
    # copies at 250^3 f32) fit 16 GB HBM alongside the program workspace.
    batch = int(os.environ.get("BENCH_BATCH", "120"))
    steps = int(os.environ.get("BENCH_STEPS", "30"))
    canvas = int(os.environ.get("BENCH_CANVAS", "250"))
    mode = os.environ.get("BENCH_MODE", "hops")
    hops = int(os.environ.get("BENCH_HOPS", "16"))
    # bf16 POM storage halves per-lane HBM -> ~2x the feasible lane count.
    seed_dtype = (jnp.bfloat16
                  if os.environ.get("BENCH_SEED_DTYPE") == "bf16"
                  else jnp.float32)
    precision = (jax.lax.Precision.HIGHEST
                 if os.environ.get("BENCH_PRECISION") == "highest"
                 else None)
    bench_dtype = os.environ.get("BENCH_DTYPE", "bf16")
    dtype = jnp.float32 if bench_dtype == "f32" else jnp.bfloat16

    model = convstack_3d.ConvStack3DFFNModel(
        fov_size=[33, 33, 33], deltas=[8, 8, 8], depth=12, features=32,
        precision=precision, dtype=dtype)
    params = model.init_params(jax.random.PRNGKey(0))
    if bench_dtype == "int8":
        # Quantized MXU fast path (ops/quantized.py).
        from ffn_tpu.ops import quantized
        qmodel = quantized.QuantizedConvStack3DModel(model)
        params = qmodel.prepare(params)
        model = qmodel
    rng = np.random.RandomState(0)
    image = rng.randn(canvas, canvas, canvas).astype(np.float32)
    lo, hi = canvas // 4, canvas - canvas // 4
    positions = rng.randint(lo, hi, size=(batch, 3)).astype(np.int32)

    if mode == "hops":
        # A move threshold below any logit keeps every lane executing a
        # real pop->conv->push cycle each hop regardless of model output,
        # so this measures steady-state throughput of the production
        # device program.
        eng = hop_engine_lib.HopEngine(
            model, params, pad_value=-2.944, move_threshold=-1e6,
            disco_seed_threshold=-1.0, seed_dtype=seed_dtype)
        image_dev = eng.put_image(image)
        blocked = eng.put_blocked(np.zeros(image.shape, np.uint8))
        state = eng.init_lane_state(batch, image.shape)
        state = eng.reseed_lanes(state, np.ones(batch, bool), positions,
                                 2.944)

        def reseed_dead(state, aux):
            dead = aux["status"] != hop_engine_lib.RUNNING
            if dead.any():
                fresh = rng.randint(lo, hi, size=(batch, 3)).astype(
                    np.int32)
                state = eng.reseed_lanes(state, dead, fresh, 2.944)
            return state

        state, aux = eng.run_hops(image_dev, blocked, state, hops)
        state = reseed_dead(state, aux)

        t0 = time.time()
        executed = 0
        round_times = []
        round_execs = []
        for _ in range(steps):
            rt0 = time.time()
            state, aux = eng.run_hops(image_dev, blocked, state, hops)
            nexec = int(aux["executed"].sum())
            round_times.append(time.time() - rt0)
            round_execs.append(nexec)
            executed += nexec
            state = reseed_dead(state, aux)
        elapsed = time.time() - t0
        fov_per_sec = executed / elapsed
        # Noise-stable companion metric: the tunnel is multi-tenant, so
        # a single slow round can halve the wall-clock FOV/s.  The
        # median round time is robust to those spikes and comparable
        # across rounds.
        med = float(np.median(round_times))
        med_fov = float(np.median(round_execs)) / med if med else 0.0
        extra = {
            "engine_s_per_round_median": round(med, 4),
            "fov_per_s_median_round": round(med_fov, 2),
            "rounds": steps,
            "hops_per_round": hops,
            "lanes": batch,
        }
    else:
        eng = engine_lib.FloodFillEngine(
            model, params, pad_value=-2.944, move_threshold=2.197,
            disco_seed_threshold=0.0, seed_dtype=seed_dtype)
        image_dev = eng.put_image(image)
        seeds = eng.new_seed_batch(batch, image.shape)
        seeds = eng.reset_lanes(seeds, np.ones(batch, bool), positions,
                                2.944)

        K = 4
        start_pos = positions.copy()
        active = np.ones(batch, bool)
        ignore = np.ones(batch, bool)

        def make_cands():
            base = rng.randint(17, canvas - 17, size=(batch, 1, 3))
            return np.broadcast_to(base, (batch, K, 3)).astype(np.int32)

        # Warm up / compile.
        seeds, aux = eng.select_step(image_dev, seeds, make_cands(),
                                     start_pos, active, ignore)
        jax.block_until_ready(seeds)

        t0 = time.time()
        for _ in range(steps):
            seeds, aux = eng.select_step(image_dev, seeds, make_cands(),
                                         start_pos, active, ignore)
        jax.block_until_ready(seeds)
        elapsed = time.time() - t0
        fov_per_sec = steps * batch / elapsed
        extra = {}
    baseline = 240.0
    out = {
        "metric": "fov_steps_per_sec_per_chip",
        "value": round(fov_per_sec, 2),
        "unit": "FOV/s",
        "vs_baseline": round(fov_per_sec / baseline, 2),
    }
    out.update(extra)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

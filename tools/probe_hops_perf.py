#!/usr/bin/env python3
"""Microbenchmark: per-round run_hops cost, single vs stacked images.

Isolates the cost of the multi-subvolume stacked-image path (4-D
dynamic-slice gathers keyed by LaneState.sv) against the plain 3-D
path at identical lane counts and seed shapes, plus the round-2
reference point (120 lanes x 250^3).

All lanes flood a uniform bright volume (the movement queue never
empties), so every hop executes a full conv batch — the steady-state
upper bound the e2e run should approach.
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
    import jax.numpy as jnp
    from scipy.special import logit

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from ffn_tpu.inference import hop_engine as hop_engine_lib
    from ffn_tpu.models import convstack_3d

    class Tuned(convstack_3d.ConvStack3DFFNModel):
        def __init__(self, **kw):
            super().__init__(dtype=jnp.bfloat16, precision=None, **kw)

    model = Tuned(fov_size=[33, 33, 33], deltas=[8, 8, 8], depth=12,
                  features=32)
    ckpt = os.environ.get("P_CKPT")
    if ckpt:
        from ffn_tpu.models import params_io
        params = params_io.load_params_npz(ckpt)
    else:
        params = model.init_params(jax.random.PRNGKey(0))
    eng = hop_engine_lib.HopEngine(
        model, params, pad_value=float(logit(0.05)),
        move_threshold=float(logit(0.9)),
        disco_seed_threshold=0.0, seed_dtype=jnp.bfloat16)

    hops = int(os.environ.get("P_HOPS", "16"))
    rng = np.random.RandomState(0)

    def bench(tag, lanes, shape, K):
        # Membrane-free normalized "interior" texture: a real checkpoint
        # floods it indefinitely, so every hop executes a move per lane
        # (P_CKPT), or pass no checkpoint for the idle-lane conv floor.
        img3 = ((140.0 + rng.randn(*shape).astype(np.float32) * 10.0)
                - 128.0) / 33.0
        if K:
            image = eng.put_stack([img3] * K, shape, np.float32)
            blocked = eng.put_stack([None] * K, shape, np.uint8)
            sv = (np.arange(lanes) % K).astype(np.int32)
            shapes = np.tile(np.array(shape, np.int32), (K, 1))
        else:
            image = eng.put_image(img3)
            blocked = eng.put_blocked(np.zeros(shape, np.uint8))
            sv = None
            shapes = None
        state = eng.init_lane_state(lanes, shape)
        pos = rng.randint(40, min(shape) - 40,
                          (lanes, 3)).astype(np.int32)
        state = eng.reseed_lanes(state, np.ones(lanes, bool), pos,
                                 float(logit(0.95)), sv=sv)
        # Warm-up (compile) + 3 timed rounds.
        state, aux = eng.run_hops(image, blocked, state, hops,
                                  shapes=shapes)
        t0 = time.time()
        n = 3
        ex = 0
        for _ in range(n):
            state, aux = eng.run_hops(image, blocked, state, hops,
                                      shapes=shapes)
            ex += int(aux["executed"].sum())
        dt = (time.time() - t0) / n
        print(json.dumps({
            "metric": "hops_perf", "tag": tag, "lanes": lanes,
            "shape": shape[0], "K": K or 1, "hops": hops,
            "round_ms": round(dt * 1000, 1),
            "hop_ms": round(dt * 1000 / hops, 1),
            "executed_per_round": ex // n,
            "fov_per_s": round(ex / n / dt, 0),
        }), flush=True)

    which = os.environ.get("P_WHICH", "all")
    if which in ("all", "stack"):
        bench("stacked_k8", 192, (165, 165, 165), 8)
    if which in ("all", "flat"):
        bench("flat_same_shape", 192, (165, 165, 165), 0)
    if which in ("all", "r2"):
        bench("r2_reference", 120, (250, 250, 250), 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Lower the device-finalize hop program and hash its HLO text.

Diagnoses persistent-compile-cache misses across runs: if two separate
processes print different hashes, the traced program itself is
nondeterministic (constant ordering, hash-seeded iteration, etc.) and
the cache can never hit. Dumps the StableHLO text to
/tmp/hlo_<pid>.txt for diffing.

Usage: JAX_PLATFORMS=cpu python tools/probe_hlo_stability.py
"""

import functools
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from ffn_tpu.models import params_io
    from ffn_tpu.models import convstack_3d
    from ffn_tpu.inference import hop_engine as hop_engine_lib

    def logit(p):
        return float(np.log(p / (1 - p)))

    ckpt = os.environ.get("P_CKPT", "models/phantom/model-r2.npz")
    params = params_io.load_params_npz(ckpt)
    model = convstack_3d.ConvStack3DFFNModel(
        fov_size=[33, 33, 33], deltas=[8, 8, 8], depth=12, features=32,
        dtype=jnp.bfloat16, precision=None)

    eng = hop_engine_lib.HopEngine(
        model, params, pad_value=logit(0.05),
        move_threshold=logit(0.9),
        disco_seed_threshold=0.0, seed_dtype=jnp.bfloat16)

    lanes = int(os.environ.get("P_LANES", "48"))
    shape = (int(os.environ.get("P_SHAPE", "65")),) * 3
    K = int(os.environ.get("P_SLOTS", "4"))
    hops = int(os.environ.get("P_HOPS", "16"))
    max_iters = int(os.environ.get("P_MAX_ITERS", "4000"))

    state = eng.init_lane_state(lanes, shape)
    fstate = eng.init_finalize_state(K, lanes, shape)
    image = jnp.zeros((K,) + shape, jnp.float32)
    blocked = jnp.zeros((K,) + shape, jnp.uint8)
    shapes = jnp.tile(jnp.array(shape, jnp.int32)[None], (K, 1))
    fin_opts = jnp.zeros((3,), jnp.float32)
    opts = jnp.asarray(eng._opts_host)

    fn = jax.jit(
        functools.partial(eng._run_hops_impl, hops=hops,
                          max_iters=max_iters, device_finalize=True),
        donate_argnums=(2, 5))
    lowered = fn.lower(image, blocked, state, opts, shapes, fstate,
                       fin_opts)
    text = lowered.as_text()
    h = hashlib.sha256(text.encode()).hexdigest()
    out = f"/tmp/hlo_{os.getpid()}.txt"
    with open(out, "w") as f:
        f.write(text)
    print(f"pid={os.getpid()} lines={len(text.splitlines())} "
          f"sha256={h} dump={out}", flush=True)


if __name__ == "__main__":
    main()

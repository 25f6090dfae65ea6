#!/usr/bin/env python3
"""Splits the fused-driver warmup cost: Python trace/lower vs XLA
compile vs persistent-cache hit, at the production hop-program shape.

Run twice (two processes): if the second run's compile is not ~instant,
the persistent cache is missing and the log (jax_explain_cache_misses)
says why. Usage: python tools/probe_warmup_cost.py
"""

import functools
import logging as pylog
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def main():
    t_imp0 = time.time()
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_explain_cache_misses", True)
    pylog.basicConfig(level=pylog.INFO, stream=sys.stderr)
    pylog.getLogger("jax._src.compiler").setLevel(pylog.DEBUG)
    pylog.getLogger("jax._src.compilation_cache").setLevel(pylog.DEBUG)

    from scipy.special import logit
    from ffn_tpu.models import params_io
    from ffn_tpu.models import convstack_3d
    from ffn_tpu.inference import hop_engine as hop_engine_lib
    t_imp = time.time() - t_imp0

    t0 = time.time()
    ckpt = os.environ.get("P_CKPT", "models/phantom/model-r2.npz")
    params = params_io.load_params_npz(ckpt)
    model = convstack_3d.ConvStack3DFFNModel(
        fov_size=[33, 33, 33], deltas=[8, 8, 8], depth=12, features=32,
        dtype=jnp.bfloat16, precision=None)
    eng = hop_engine_lib.HopEngine(
        model, params, pad_value=float(logit(0.05)),
        move_threshold=float(logit(0.9)),
        disco_seed_threshold=0.0, seed_dtype=jnp.bfloat16)
    t_build = time.time() - t0

    lanes = int(os.environ.get("P_LANES", "192"))
    shape = (int(os.environ.get("P_SHAPE", "165")),) * 3
    K = int(os.environ.get("P_SLOTS", "8"))
    hops = int(os.environ.get("P_HOPS", "16"))
    max_iters = int(os.environ.get("P_MAX_ITERS", "4000"))

    t0 = time.time()
    state = eng.init_lane_state(lanes, shape)
    fstate = eng.init_finalize_state(K, lanes, shape)
    image = jnp.zeros((K,) + shape, jnp.float32)
    blocked = jnp.zeros((K,) + shape, jnp.uint8)
    shapes = jnp.tile(jnp.array(shape, jnp.int32)[None], (K, 1))
    fin_opts = jnp.zeros((3,), jnp.float32)
    opts = jnp.asarray(eng._opts_host)
    jax.block_until_ready((state, fstate, image, blocked))
    t_alloc = time.time() - t0

    fn = jax.jit(
        functools.partial(eng._run_hops_impl, hops=hops,
                          max_iters=max_iters, device_finalize=True),
        donate_argnums=(2, 5))
    t0 = time.time()
    lowered = fn.lower(image, blocked, state, opts, shapes, fstate,
                       fin_opts)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    del compiled
    print(f"platform={jax.devices()[0].platform} imp={t_imp:.1f} "
          f"build={t_build:.1f} alloc={t_alloc:.1f} "
          f"lower={t_lower:.1f} compile={t_compile:.1f}", flush=True)


if __name__ == "__main__":
    main()

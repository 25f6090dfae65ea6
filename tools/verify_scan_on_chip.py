#!/usr/bin/env python3
"""On-chip scan-trainer parity: one packed depth-12 train step on the
real TPU vs the same step on CPU (the host oracle already pins CPU
semantics in tests/test_training.py).

Prints one JSON line with max param/metric deltas. bf16 convs on TPU vs
f32 on CPU bound the comparison at bf16 resolution; the pass bar is the
update-magnitude-relative tolerance below.

Env: VS_BATCH (default 8), VS_DEPTH (default 12), VS_PRECISION (bf16).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def run_one(platform, batch, depth, prec):
    import subprocess

    code = f"""
import sys, json
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
if {platform!r} == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from ffn_tpu.models import convstack_3d
from ffn_tpu.training import optimizer as optimizer_lib
from ffn_tpu.training import precision as precision_lib
from ffn_tpu.training import train_lib

config = train_lib.TrainConfig(
    fov_size=(33, 33, 33), deltas=(8, 8, 8), depth={depth},
    features=32, batch_size={batch}, precision={prec!r},
    optimizer=optimizer_lib.OptimizerConfig(optimizer="adam",
                                            learning_rate=1e-3))
policy = precision_lib.get_policy({prec!r})
model = convstack_3d.ConvStack3DFFNModel(
    fov_size=[33, 33, 33], deltas=[8, 8, 8], depth={depth}, features=32,
    dtype=policy.compute_dtype, precision=None)
tx = optimizer_lib.optimizer_from_config(config.optimizer)
state, _ = train_lib.create_train_state(model, config)
step = train_lib.make_scan_train_step_packed(model, tx, config)
info = model.info
canvas = tuple(int(v) for v in train_lib.train_canvas_size(info, config)[::-1])
lab = tuple(int(v) for v in train_lib.train_labels_size(info, config)[::-1])
rng = np.random.RandomState(0)
image_u8 = rng.randint(0, 255, ({batch}, *canvas, 1)).astype(np.uint8)
lom_u8 = (rng.rand({batch}, *lab, 1) > 0.5).astype(np.uint8)
offsets = train_lib.fixed_offsets_zyx(info)
params, opt_state, ema, scale, metrics = step(
    state.params, state.opt_state, state.ema_params, state.scale_state,
    jnp.asarray(image_u8), jnp.asarray(lom_u8), jnp.asarray(offsets))
out = {{
    "loss": np.asarray(metrics["loss"]).tolist(),
    "patch_loss": float(np.asarray(metrics["patch_loss"])),
    "tp": int(metrics["tp"]), "fp": int(metrics["fp"]),
}}
np.savez("/tmp/scan_parity_{platform}.npz",
         **{{f"p{{i}}": np.asarray(x)
            for i, x in enumerate(jax.tree.leaves(params))}})
print(json.dumps(out))
"""
    res = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=3600)
    assert res.returncode == 0, res.stderr[-3000:]
    return json.loads(res.stdout.strip().splitlines()[-1])


def main():
    batch = int(os.environ.get("VS_BATCH", "8"))
    depth = int(os.environ.get("VS_DEPTH", "12"))
    prec = os.environ.get("VS_PRECISION", "bf16")

    tpu = run_one("tpu", batch, depth, prec)
    cpu = run_one("cpu", batch, depth, prec)

    a = np.load("/tmp/scan_parity_tpu.npz")
    b = np.load("/tmp/scan_parity_cpu.npz")
    pdelta = max(float(np.abs(a[k] - b[k]).max()) for k in a.files)
    loss_delta = float(np.max(np.abs(np.array(tpu["loss"])
                                     - np.array(cpu["loss"]))))
    result = {
        "metric": "scan_step_tpu_vs_cpu", "batch": batch, "depth": depth,
        "precision": prec,
        "max_param_delta": round(pdelta, 6),
        "max_offset_loss_delta": round(loss_delta, 6),
        "patch_loss_delta": round(abs(tpu["patch_loss"]
                                      - cpu["patch_loss"]), 6),
        "tp_match": tpu["tp"] == cpu["tp"],
        "ok": bool(pdelta < 5e-3 and loss_delta < 5e-2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

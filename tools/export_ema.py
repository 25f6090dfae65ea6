#!/usr/bin/env python3
"""Exports the EMA parameters of a training checkpoint as a standard
model npz (loadable by run_inference.py / Runner).

The scan trainer checkpoints EMA params as flat leaves in
extra.ckpt-<step>.npz (training/train_loop.py:_save_extra); inference
wants a params tree. This reattaches the leaves to the model checkpoint's
tree structure.

Usage: python tools/export_ema.py <ckpt_dir> <step> <out.npz>
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import jax

    from ffn_tpu.models import params_io

    ckpt_dir, step, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    params = params_io.load_params_npz(
        f"{ckpt_dir}/model.ckpt-{step}.npz")
    extra = np.load(f"{ckpt_dir}/extra.ckpt-{step}.npz")
    leaves, treedef = jax.tree.flatten(params)
    ema_keys = [k for k in extra.files if k.startswith("ema")]
    if not ema_keys:
        raise SystemExit(f"no EMA leaves in extra.ckpt-{step}.npz "
                         "(training ran with ema_decay=0?)")
    assert len(ema_keys) == len(leaves), (len(ema_keys), len(leaves))
    ema_leaves = [np.asarray(extra[f"ema{i}"],
                             dtype=l.dtype).reshape(np.shape(l))
                  for i, l in enumerate(leaves)]
    params_io.save_params_npz(jax.tree.unflatten(treedef, ema_leaves),
                              out)
    print(f"EMA params of step {step} -> {out}")


if __name__ == "__main__":
    main()

"""TF1 checkpoint -> Flax parameter conversion.

Converts the reference's tf_slim ConvStack3D checkpoints (variable scope
'seed_update/convN_{a,b}/{weights,biases}', e.g. the shipped
models/fib25/model.ckpt-27465036) into ConvStack3D Flax params. TF conv3d
kernels are (kd, kh, kw, in, out) — identical to flax.linen.Conv — so the
conversion is a pure name re-map with no transposes.

TensorFlow is imported lazily and only needed by this module; the rest of
the framework has no TF dependency.
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np


def read_tf1_checkpoint(ckpt_path: str) -> Mapping[str, np.ndarray]:
    """Reads all variables of a TF1 checkpoint into numpy arrays."""
    import tensorflow as tf  # deferred; heavy

    reader = tf.train.load_checkpoint(ckpt_path)
    return {name: reader.get_tensor(name)
            for name in reader.get_variable_to_shape_map()}


def convstack_params_from_tf(
        tf_vars: Mapping[str, np.ndarray],
        scope: str = "seed_update") -> dict:
    """Builds ConvStack3D flax variables from TF1 checkpoint tensors."""
    params = {}
    pattern = re.compile(
        rf"^{re.escape(scope)}/(conv[0-9]+_[ab]|conv_lom)/(weights|biases)$")
    for name, value in tf_vars.items():
        m = pattern.match(name)
        if not m:
            continue
        layer, kind = m.groups()
        entry = params.setdefault(layer, {})
        if kind == "weights":
            entry["kernel"] = np.asarray(value, dtype=np.float32)
        else:
            entry["bias"] = np.asarray(value, dtype=np.float32)
    if "conv_lom" not in params:
        raise ValueError(
            f"no ConvStack3D variables under scope {scope!r} in checkpoint")
    for layer, entry in params.items():
        if set(entry) != {"kernel", "bias"}:
            raise ValueError(f"incomplete layer {layer}: {set(entry)}")
    return {"params": params}


def load_convstack_checkpoint(ckpt_path: str,
                              scope: str = "seed_update") -> dict:
    """One-shot: TF1 checkpoint path -> flax variables for ConvStack3D."""
    return convstack_params_from_tf(read_tf1_checkpoint(ckpt_path),
                                    scope=scope)


def infer_depth(params: dict) -> int:
    """Infers the conv-stack depth from converted params."""
    layers = params["params"]
    idx = [int(m.group(1)) for name in layers
           if (m := re.match(r"conv(\d+)_a$", name))]
    return max(idx) + 1

"""Flat npz serialization of flax parameter trees."""

from __future__ import annotations

import numpy as np
import jax

from ffn_tpu.inference import storage


def _flatten(tree, prefix=""):
    out = {}
    for key, value in tree.items():
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(value, dict):
            out.update(_flatten(value, path))
        else:
            out[path] = np.asarray(value)
    return out


def _unflatten(flat):
    tree = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def save_params_npz(params, path: str):
    """Saves a flax variable tree as a flat compressed npz."""
    params = jax.tree.map(np.asarray, params)
    with storage.atomic_file(path) as fd:
        np.savez_compressed(fd, **_flatten(params))


def load_params_npz(path: str):
    with open(path, "rb") as f:
        data = np.load(f)
        return _unflatten({k: data[k] for k in data.files})

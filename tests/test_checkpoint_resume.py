"""Checkpoint completeness: EMA + data-cursor + RNG resume, keep
policies, and preemption-aware save-and-exit.

The bar (ref jax/train.py:423-521, 689-701 semantics): a killed-and-
resumed run must continue EXACTLY as the uninterrupted run — same
coordinates (none replayed, none skipped), same augmentation draws, same
EMA trajectory.
"""

import json
import os
import signal
import threading

import h5py
import numpy as np
import pytest

import jax

from ffn_tpu.models import params_io
from ffn_tpu.training import optimizer as optimizer_lib
from ffn_tpu.training import train_lib, train_loop


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ckptdata")
    rng = np.random.RandomState(0)
    shape = (40, 40, 40)
    seg = np.zeros(shape, np.uint64)
    seg[4:20, 4:20, 4:20] = 1
    seg[22:38, 22:38, 22:38] = 2
    img = rng.randint(0, 255, shape).astype(np.uint8)
    vol = str(tmp / "data.h5")
    with h5py.File(vol, "w") as f:
        f.create_dataset("seg", data=seg)
        f.create_dataset("img", data=img)
    # A coordinate list comfortably inside bounds plus a few
    # out-of-bounds entries (they exercise the filter-replay logic).
    centers = []
    for z in (12, 20, 28):
        for y in (12, 20, 28):
            for x in (12, 20, 28):
                centers.append((x, y, z))
    centers += [(2, 2, 2), (39, 39, 39)]  # filtered out (out of bounds)
    centers = np.array(centers * 20, np.int64)
    np.savez_compressed(str(tmp / "coords.npz"), center=centers,
                        label_volume_name=np.array(["v"] * len(centers)))
    return tmp


def _configs(tmp, train_dir, max_steps, **loop_kwargs):
    config = train_lib.TrainConfig(
        fov_size=(9, 9, 9), deltas=(2, 2, 2), depth=1, features=2,
        batch_size=2, ema_decay=0.9,
        optimizer=optimizer_lib.OptimizerConfig(optimizer="adam",
                                                learning_rate=0.003))
    data = train_loop.DataConfig(
        train_coords=str(tmp / "coords.npz"),
        data_volumes=f"v:{tmp}/data.h5:img",
        label_volumes=f"v:{tmp}/data.h5:seg",
        image_mean=128.0, image_stddev=33.0)
    loop = train_loop.LoopConfig(
        train_dir=str(train_dir), max_steps=max_steps,
        summary_every_steps=100, checkpoint_every_steps=100,
        **loop_kwargs)
    return config, data, loop


MODEL = "convstack_3d.ConvStack3DFFNModel"
ARGS = json.dumps({"depth": 1, "features": 2, "fov_size": [9, 9, 9],
                   "deltas": [2, 2, 2]})


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree.leaves(tree)]


def test_kill_and_resume_matches_uninterrupted(dataset, tmp_path):
    # Uninterrupted run: 4 steps.
    config, data, loop = _configs(dataset, tmp_path / "a", 4)
    train_loop.run_training(MODEL, ARGS, config, data, loop)
    a_params = params_io.load_params_npz(
        str(tmp_path / "a" / "ckpt" / "model.ckpt-4.npz"))
    a_extra = np.load(str(tmp_path / "a" / "ckpt" / "extra.ckpt-4.npz"))

    # Interrupted run: 2 steps, then a fresh process-equivalent resume
    # (new loop objects) to 4.
    config, data, loop = _configs(dataset, tmp_path / "b", 2)
    train_loop.run_training(MODEL, ARGS, config, data, loop)
    b2 = np.load(str(tmp_path / "b" / "ckpt" / "extra.ckpt-2.npz"))
    # The data cursor advanced exactly 2 steps x batch 2 examples.
    assert int(b2["consumed"]) == 4

    config, data, loop = _configs(dataset, tmp_path / "b", 4)
    train_loop.run_training(MODEL, ARGS, config, data, loop)
    b_params = params_io.load_params_npz(
        str(tmp_path / "b" / "ckpt" / "model.ckpt-4.npz"))
    b_extra = np.load(str(tmp_path / "b" / "ckpt" / "extra.ckpt-4.npz"))

    # Identical final params: proves no coordinate was replayed/skipped
    # and the augmentation + shuffle RNG streams stayed aligned.
    for a, b in zip(_leaves(a_params), _leaves(b_params)):
        np.testing.assert_allclose(a, b, atol=1e-6)
    # Identical EMA continuation.
    a_ema = [a_extra[k] for k in sorted(a_extra)
             if k.startswith("ema")]
    b_ema = [b_extra[k] for k in sorted(b_extra) if k.startswith("ema")]
    assert a_ema, "EMA params missing from checkpoint"
    for a, b in zip(a_ema, b_ema):
        np.testing.assert_allclose(a, b, atol=1e-6)
    assert int(b_extra["consumed"]) == 8


def test_keep_policy(dataset, tmp_path):
    config, data, loop = _configs(
        dataset, tmp_path / "k", 6, max_to_keep=2, keep_every_n_steps=3)
    loop = train_loop.LoopConfig(
        train_dir=loop.train_dir, max_steps=6, summary_every_steps=100,
        checkpoint_every_steps=1, max_to_keep=2, keep_every_n_steps=3)
    train_loop.run_training(MODEL, ARGS, config, data, loop)
    kept = train_loop._ckpt_steps(str(tmp_path / "k" / "ckpt"))
    # Newest 2 (5, 6) plus preserved multiples of 3 (3; 6 already kept).
    assert kept == [3, 5, 6]


def test_preemption_saves_and_exits(dataset, tmp_path):
    config, data, loop = _configs(dataset, tmp_path / "p", 10_000)
    timer = threading.Timer(1.5, signal.raise_signal, (signal.SIGTERM,))
    timer.start()
    try:
        train_loop.run_training(MODEL, ARGS, config, data, loop)
    finally:
        timer.cancel()
    steps = train_loop._ckpt_steps(str(tmp_path / "p" / "ckpt"))
    # Exited long before max_steps, with a checkpoint written.
    assert steps and steps[-1] < 10_000


def test_stall_watchdog_exits_42():
    """A wedged loop (no beats) gets stack-dumped and exits 42."""
    import subprocess
    import sys

    code = """
import time
from ffn_tpu.training.train_loop import _StallWatchdog
w = _StallWatchdog(1.0)
w.beat()
time.sleep(60)   # never beats again -> watchdog must fire
"""
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=60,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 42, (proc.returncode, proc.stderr[-500:])
    assert "Thread" in proc.stderr or "File" in proc.stderr  # stack dump

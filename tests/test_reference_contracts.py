"""Contract tests pinning public surfaces against reference artifacts.

The reference ships three durable artifacts that users hold in hand when
they switch frameworks (ref README.md:70-131):

  1. the canonical InferenceRequest pbtxt
     (ref configs/inference_training_sample2.pbtxt) — must parse with
     our generated protos (wire compatibility);
  2. the golden demo segmentation
     (ref results/fib25/sample-training2.npz, keys
     segmentation/counters/request/origins) — must load through
     storage.load_segmentation, including its google3-pickled origins;
  3. the trained fib25 checkpoint (ref models/fib25/) — conversion is
     regression-pinned by the SHIPPED TF-free npz
     (models/fib25/model-27465036.npz) plus a stored input->logits
     golden fixture, so no TensorFlow is needed at test time.

These run in CI on every change: a proto field renumbering, a path-
scheme edit, or a converter regression fails here first.
"""

import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
REF_PBTXT = os.path.join(REF, "configs/inference_training_sample2.pbtxt")
REF_GOLDEN = os.path.join(REF, "results/fib25/sample-training2.npz")
SHIPPED_FIB25 = os.path.join(REPO, "models/fib25/model-27465036.npz")
GOLDEN_LOGITS = os.path.join(REPO, "tests/golden/fib25_logits_golden.npz")

ref_needed = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference artifacts not on disk")


@ref_needed
def test_reference_pbtxt_parses_with_our_protos():
    from google.protobuf import text_format
    from ffn_tpu.proto import inference_pb2

    req = inference_pb2.InferenceRequest()
    with open(REF_PBTXT) as f:
        text_format.Parse(f.read(), req)

    assert req.image.hdf5.endswith("grayscale_maps.h5:raw")
    assert req.image_mean == 128 and req.image_stddev == 33
    assert req.seed_policy == "PolicyPeaks"
    assert req.model_name == "convstack_3d.ConvStack3DFFNModel"
    args = json.loads(req.model_args)
    assert args == {"depth": 12, "fov_size": [33, 33, 33],
                    "deltas": [8, 8, 8]}
    opts = req.inference_options
    assert opts.init_activation == pytest.approx(0.95)
    assert opts.pad_value == pytest.approx(0.05)
    assert opts.move_threshold == pytest.approx(0.9)
    assert opts.segment_threshold == pytest.approx(0.6)
    assert opts.min_segment_size == 1000
    assert (opts.min_boundary_dist.x, opts.min_boundary_dist.y,
            opts.min_boundary_dist.z) == (1, 1, 1)


@ref_needed
def test_reference_golden_npz_loads(tmp_path):
    """The reference's golden output loads through load_segmentation.

    The file is a renamed seg-0_0_0.npz (legacy layout); its origins
    dict was pickled under a google3 module path — the compat unpickler
    must map it onto our OriginInfo.
    """
    from ffn_tpu.inference import storage

    os.symlink(REF_GOLDEN, tmp_path / "seg-0_0_0.npz")
    seg, origins = storage.load_segmentation(
        str(tmp_path), (0, 0, 0), split_cc=False, min_size=0)
    assert seg.shape == (250, 250, 250)
    assert seg.dtype == np.uint64
    ids = np.unique(seg[seg > 0])
    assert len(ids) > 50  # the demo volume holds hundreds of objects
    assert origins, "origins dict must survive the google3 pickle"
    info = next(iter(origins.values()))
    assert hasattr(info, "start_zyx") and hasattr(info, "iters")
    # Origin ids refer to segment ids actually present.
    assert set(origins).issuperset(set(int(i) for i in ids))


@ref_needed
def test_reference_golden_load_origins(tmp_path):
    from ffn_tpu.inference import storage

    os.symlink(REF_GOLDEN, tmp_path / "seg-0_0_0.npz")
    origins = storage.load_origins(str(tmp_path), (0, 0, 0))
    assert origins
    info = next(iter(origins.values()))
    assert len(info.start_zyx) == 3


def _params_from_npz(path):
    f = np.load(path)
    params = {}
    for k in f.files:
        parts = k.split("/")
        d = params
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = f[k]
    return params


def test_shipped_fib25_npz_loads_through_runner():
    """model_checkpoint_path pointing at the shipped npz just works."""
    from ffn_tpu.inference import runner as runner_lib

    params = runner_lib.load_model_params(SHIPPED_FIB25)
    assert params["params"]["conv0_a"]["kernel"].shape == (3, 3, 3, 2, 32)


def test_shipped_fib25_npz_structure():
    params = _params_from_npz(SHIPPED_FIB25)
    layers = params["params"]
    assert layers["conv0_a"]["kernel"].shape == (3, 3, 3, 2, 32)
    assert layers["conv_lom"]["kernel"].shape == (1, 1, 1, 32, 1)
    from ffn_tpu.models import tf_checkpoint
    assert tf_checkpoint.infer_depth(params) == 12


def test_shipped_fib25_npz_logits_golden():
    """The shipped TF-free fib25 weights reproduce the stored logits.

    Pins the whole chain (converter output + ConvStack3D math) without
    needing TensorFlow: the fixture was generated on CPU at HIGHEST
    precision from the shipped npz, which was itself converted from
    ref models/fib25/model.ckpt-27465036 (conversion vs TF is covered
    by test_convstack.py when TF is available).
    """
    import jax.numpy as jnp
    from ffn_tpu.models import convstack_3d

    params = _params_from_npz(SHIPPED_FIB25)
    fx = np.load(GOLDEN_LOGITS)
    model = convstack_3d.ConvStack3DFFNModel(
        fov_size=[33, 33, 33], deltas=[8, 8, 8], depth=12, features=32)
    out = model.apply(params, jnp.asarray(fx["image"]),
                      jnp.asarray(fx["seed_logits"]))
    np.testing.assert_allclose(np.asarray(out, np.float32), fx["logits"],
                               atol=2e-4)

"""int8 quantized inference path: exactness, fidelity, engine integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from scipy.special import logit

from ffn_tpu.inference import engine as engine_lib
from ffn_tpu.models import convstack_3d
from ffn_tpu.ops import quantized


def small_model(depth=2):
    return convstack_3d.ConvStack3DFFNModel(
        fov_size=[9, 9, 9], deltas=[2, 2, 2], depth=depth, features=8)


def test_qconv3d_exact_on_representable_values():
    """With activations/weights exactly on the int8 grid, the quantized
    conv equals the float conv bit-for-bit (modulo f32 accumulation)."""
    rng = np.random.RandomState(0)
    B, S, Cin, Cout = 1, 7, 4, 6
    x = rng.randint(-127, 128, (B, S, S, S, Cin)).astype(np.float32)
    x.flat[0] = 127.0  # pin the dynamic absmax to 127 -> scale 1
    kernel = rng.randint(-127, 128, (3, 3, 3, Cin, Cout)).astype(
        np.float32)
    kernel[..., :][0, 0, 0, 0, :] = 127.0  # per-channel absmax = 127
    bias = rng.randn(Cout).astype(np.float32)

    layers = quantized.fold_convstack_params(
        {"params": {"c": {"kernel": kernel, "bias": bias}}})
    got = np.asarray(quantized.qconv3d(jnp.asarray(x), layers["c"]))

    ref = jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=jax.lax.Precision.HIGHEST) + bias
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-5, atol=1e-2)


def test_quantized_stack_matches_float_logits():
    """Random-init small stack: int8 logits track f32 logits closely and
    move decisions agree."""
    model = small_model(depth=3)
    params = model.init_params(jax.random.PRNGKey(1))
    qmodel = quantized.QuantizedConvStack3DModel(model)
    qparams = qmodel.prepare(params)

    rng = np.random.RandomState(0)
    image = rng.randn(2, 9, 9, 9, 1).astype(np.float32)
    seed = np.full((2, 9, 9, 9, 1), logit(0.05), np.float32)
    seed[:, 4, 4, 4, :] = logit(0.95)

    f32 = np.asarray(model.apply(params, jnp.asarray(image),
                                 jnp.asarray(seed)))
    q = np.asarray(qmodel.apply(qparams, jnp.asarray(image),
                                jnp.asarray(seed)))
    assert q.shape == f32.shape
    # The seed-additive structure means errors are in the *update*;
    # random-init updates are tiny, so compare the updates directly.
    err = np.abs((q - seed) - (f32 - seed))
    assert err.max() < 0.05, err.max()
    # Thresholded decisions at the move threshold agree.
    t = logit(0.9)
    agree = np.mean((q >= t) == (f32 >= t))
    assert agree > 0.999


def test_quantized_model_through_engine():
    model = small_model(depth=2)
    params = model.init_params(jax.random.PRNGKey(0))
    qmodel = quantized.QuantizedConvStack3DModel(model)
    qparams = qmodel.prepare(params)
    eng = engine_lib.FloodFillEngine(
        qmodel, qparams, pad_value=float(logit(0.05)),
        move_threshold=float(logit(0.9)), disco_seed_threshold=-1.0)
    image = np.random.RandomState(0).randn(24, 24, 24).astype(np.float32)
    image_dev = eng.put_image(image)
    seed = eng.new_seed_buffer(image.shape)
    seed = eng.reset_seed(seed, (12, 12, 12), float(logit(0.95)))
    seed, patch = eng.step(image_dev, seed, np.array((12, 12, 12),
                                                     np.int32))
    assert patch.shape == (9, 9, 9)
    assert np.isfinite(patch).all()


def test_runner_start_int8(tmp_path):
    """Runner builds the quantized engine via precision='int8'."""
    import h5py
    from ffn_tpu.inference import runner as runner_lib
    from ffn_tpu.proto import inference_pb2
    from google.protobuf import text_format

    with h5py.File(str(tmp_path / "v.h5"), "w") as f:
        f.create_dataset("raw", data=np.zeros((20, 20, 20), np.uint8))
    request = inference_pb2.InferenceRequest()
    text_format.Parse(f"""
image {{ hdf5: "{tmp_path}/v.h5:raw" }}
image_mean: 128 image_stddev: 33
model_name: "convstack_3d.ConvStack3DFFNModel"
model_args: "{{\\"depth\\": 2, \\"features\\": 8, \\"fov_size\\": [9, 9, 9], \\"deltas\\": [2, 2, 2]}}"
segmentation_output_dir: "{tmp_path}/out"
inference_options {{
  init_activation: 0.95 pad_value: 0.05 move_threshold: 0.9
  segment_threshold: 0.6 min_segment_size: 5
}}""", request)
    runner = runner_lib.Runner()
    runner.start(request, precision="int8")
    assert isinstance(runner.model, quantized.QuantizedConvStack3DModel)

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ffn_tpu.models import convstack_3d
from ffn_tpu.models import model_info as model_info_lib
from ffn_tpu.models import registry

FIB25_CKPT = "/root/reference/models/fib25/model.ckpt-27465036"


def small_model(depth=2, fov=9):
    return convstack_3d.ConvStack3DFFNModel(
        fov_size=[fov, fov, fov], deltas=[2, 2, 2], depth=depth, features=4)


def test_shapes_and_param_count():
    model = small_model()
    params = model.init_params()
    n = sum(p.size for p in jax.tree.leaves(params))
    assert n == convstack_3d.convstack_grid_params(2, 4)
    image = jnp.zeros((3, 9, 9, 9, 1))
    seed = jnp.zeros((3, 9, 9, 9, 1))
    out = model.apply(params, image, seed)
    assert out.shape == (3, 9, 9, 9, 1)


def test_additive_seed_update():
    # With zero weights everywhere, output == input seed (pure residual).
    model = small_model()
    params = model.init_params()
    params = jax.tree.map(jnp.zeros_like, params)
    seed = jnp.array(np.random.RandomState(0).randn(1, 9, 9, 9, 1),
                     jnp.float32)
    image = jnp.zeros((1, 9, 9, 9, 1))
    out = model.apply(params, image, seed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seed))


def test_model_info():
    model = small_model()
    info = model.info
    assert tuple(info.deltas) == (2, 2, 2)
    assert tuple(info.pred_mask_size) == (9, 9, 9)
    assert info.additive
    shifts = model_info_lib.shift_collection(info.deltas)
    assert len(shifts) == 26


def test_registry():
    cls = registry.import_symbol("convstack_3d.ConvStack3DFFNModel")
    assert cls is convstack_3d.ConvStack3DFFNModel


def test_numpy_reference_parity():
    """ConvStack3D must match a direct numpy implementation of the
    reference's math (conv0_a+relu -> conv0_b -> pre-ReLU residual blocks
    -> relu -> 1x1x1 conv)."""
    from scipy import ndimage

    model = small_model(depth=2, fov=7)
    params = model.init_params(jax.random.PRNGKey(7))
    p = jax.tree.map(np.asarray, params)["params"]

    rng = np.random.RandomState(1)
    image = rng.randn(1, 7, 7, 7, 1).astype(np.float32)
    seed = rng.randn(1, 7, 7, 7, 1).astype(np.float32)

    def conv3d(x, kernel, bias):
        # x: (z, y, x, cin); kernel: (kd, kh, kw, cin, cout). SAME padding.
        kd, kh, kw, cin, cout = kernel.shape
        out = np.zeros(x.shape[:3] + (cout,), np.float32)
        xp = np.pad(x, ((kd // 2,) * 2, (kh // 2,) * 2, (kw // 2,) * 2,
                        (0, 0)))
        for dz in range(kd):
            for dy in range(kh):
                for dx in range(kw):
                    patch = xp[dz:dz + x.shape[0], dy:dy + x.shape[1],
                               dx:dx + x.shape[2], :]
                    out += patch @ kernel[dz, dy, dx]
        return out + bias

    net = np.concatenate([image[0], seed[0]], axis=-1)
    net = np.maximum(conv3d(net, p["conv0_a"]["kernel"],
                            p["conv0_a"]["bias"]), 0)
    net = conv3d(net, p["conv0_b"]["kernel"], p["conv0_b"]["bias"])
    for i in range(1, 2):
        res = net
        net = np.maximum(net, 0)
        net = np.maximum(conv3d(net, p[f"conv{i}_a"]["kernel"],
                                p[f"conv{i}_a"]["bias"]), 0)
        net = conv3d(net, p[f"conv{i}_b"]["kernel"], p[f"conv{i}_b"]["bias"])
        net = net + res
    net = np.maximum(net, 0)
    logits = conv3d(net, p["conv_lom"]["kernel"], p["conv_lom"]["bias"])
    expected = seed[0] + logits

    out = model.apply(params, jnp.asarray(image), jnp.asarray(seed))
    np.testing.assert_allclose(np.asarray(out)[0], expected, atol=1e-4)


@pytest.mark.skipif(
    not __import__("os").path.exists(FIB25_CKPT + ".index"),
    reason="fib25 checkpoint not available")
def test_fib25_checkpoint_conversion():
    from ffn_tpu.models import tf_checkpoint

    variables = tf_checkpoint.load_convstack_checkpoint(FIB25_CKPT)
    assert tf_checkpoint.infer_depth(variables) == 12
    layers = variables["params"]
    assert layers["conv0_a"]["kernel"].shape == (3, 3, 3, 2, 32)
    assert layers["conv_lom"]["kernel"].shape == (1, 1, 1, 32, 1)

    model = convstack_3d.ConvStack3DFFNModel(
        fov_size=[33, 33, 33], deltas=[8, 8, 8], depth=12, features=32)
    # Converted params must typecheck against the module structure.
    ref = model.init_params()
    ref_shapes = jax.tree.map(lambda a: a.shape, ref)
    got_shapes = jax.tree.map(lambda a: a.shape, variables)
    assert ref_shapes == got_shapes

    # A real forward step: planting a strong seed in the center must produce
    # a high-probability region around the center for plausible EM-like
    # input; at minimum the output must be finite and seed-biased.
    rng = np.random.RandomState(0)
    image = rng.randn(1, 33, 33, 33, 1).astype(np.float32)
    seed = np.full((1, 33, 33, 33, 1), np.log(0.05 / 0.95), np.float32)
    seed[0, 16, 16, 16, 0] = np.log(0.95 / 0.05)
    out = np.asarray(model.apply(params=variables, image=jnp.asarray(image),
                                 seed=jnp.asarray(seed)))
    assert np.isfinite(out).all()
    assert out.shape == (1, 33, 33, 33, 1)

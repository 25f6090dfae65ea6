"""Mixed-precision policy + dynamic loss scaling tests."""

import numpy as np

import jax
import jax.numpy as jnp

from ffn_tpu.models import convstack_3d
from ffn_tpu.training import optimizer as optimizer_lib
from ffn_tpu.training import precision as precision_lib
from ffn_tpu.training import train_lib


def test_policy_lookup():
    assert precision_lib.get_policy("f32").compute_dtype == jnp.float32
    assert precision_lib.get_policy("bf16").compute_dtype == jnp.bfloat16
    assert precision_lib.get_policy("f16").use_loss_scale
    assert not precision_lib.get_policy("bf16").use_loss_scale
    try:
        precision_lib.get_policy("int4")
        assert False
    except ValueError:
        pass


def test_dynamic_loss_scale_shrinks_on_nonfinite():
    s = precision_lib.DynamicLossScale.init(initial_scale=1024.0)
    s = s.adjust(jnp.bool_(False))
    assert float(s.scale) == 512.0
    assert int(s.counter) == 0
    # Never drops below 1.
    s = precision_lib.DynamicLossScale.init(initial_scale=1.0)
    s = s.adjust(jnp.bool_(False))
    assert float(s.scale) == 1.0


def test_dynamic_loss_scale_grows_after_interval():
    s = precision_lib.DynamicLossScale.init(initial_scale=8.0,
                                            growth_interval=3)
    for _ in range(2):
        s = s.adjust(jnp.bool_(True))
        assert float(s.scale) == 8.0
    s = s.adjust(jnp.bool_(True))
    assert float(s.scale) == 16.0
    assert int(s.counter) == 0


def test_loss_scale_roundtrip_in_jit():
    """DynamicLossScale is a pytree: carry through jit + scale/unscale."""
    s = precision_lib.DynamicLossScale.init(initial_scale=64.0)

    @jax.jit
    def f(scale_state, x):
        loss = scale_state.scale_loss(x)
        grads = {"w": loss * 2.0}
        grads = scale_state.unscale(grads)
        finite = precision_lib.all_finite(grads)
        return scale_state.adjust(finite), grads

    s2, grads = f(s, jnp.float32(3.0))
    np.testing.assert_allclose(float(grads["w"]), 6.0, rtol=1e-6)
    assert float(s2.scale) == 64.0


def test_all_finite_and_select_tree():
    good = {"a": jnp.ones(3), "b": jnp.zeros(2)}
    bad = {"a": jnp.array([1.0, np.inf, 0.0]), "b": jnp.zeros(2)}
    assert bool(precision_lib.all_finite(good))
    assert not bool(precision_lib.all_finite(bad))
    out = precision_lib.select_tree(jnp.bool_(False), bad, good)
    np.testing.assert_array_equal(np.asarray(out["a"]), np.ones(3))


def _tiny_setup(precision):
    config = train_lib.TrainConfig(
        fov_size=(5, 5, 5), deltas=(1, 1, 1), depth=1, features=2,
        batch_size=2, precision=precision,
        optimizer=optimizer_lib.OptimizerConfig(optimizer="sgd",
                                                learning_rate=0.01))
    policy = precision_lib.get_policy(precision)
    model = convstack_3d.ConvStack3DFFNModel(
        fov_size=[5, 5, 5], deltas=[1, 1, 1], depth=1, features=2,
        dtype=policy.compute_dtype, precision=None)
    return config, model


def _tiny_batch(config, model, rng):
    info = model.info
    canvas = tuple(int(v)
                   for v in train_lib.train_canvas_size(info, config)[::-1])
    B = config.batch_size
    seeds = train_lib.make_seed_canvas(B, canvas, config.seed_pad,
                                       config.seed_init)
    images = rng.randn(B, *canvas, 1).astype(np.float32)
    labels = np.full((B, *canvas, 1), 0.95, np.float32)
    weights = np.ones_like(labels)
    return seeds, images, labels, weights


def _run_one_step(precision):
    config, model = _tiny_setup(precision)
    tx = optimizer_lib.optimizer_from_config(config.optimizer)
    state, _ = train_lib.create_train_state(model, config)
    step = train_lib.make_scan_train_step(model, tx, config)
    rng = np.random.RandomState(0)
    seeds, images, labels, weights = _tiny_batch(config, model, rng)
    offsets = train_lib.fixed_offsets_zyx(model.info)
    return step(state.params, state.opt_state, state.ema_params,
                state.scale_state, jnp.asarray(seeds), jnp.asarray(images),
                jnp.asarray(labels), jnp.asarray(weights),
                jnp.asarray(offsets))


def test_scan_trainer_bf16_policy():
    params, _, _, scale_state, seeds, metrics = _run_one_step("bf16")
    # Params remain f32 storage.
    for leaf in jax.tree.leaves(params):
        assert leaf.dtype == jnp.float32
    assert np.isfinite(np.asarray(metrics["loss"])).all()
    assert np.asarray(metrics["grads_finite"]).all()
    # NoOp scale for bf16.
    assert isinstance(scale_state, precision_lib.NoOpLossScale)


def test_scan_trainer_f16_policy_scales_and_trains():
    params, _, _, scale_state, seeds, metrics = _run_one_step("f16")
    assert isinstance(scale_state, precision_lib.DynamicLossScale)
    # Reported loss is the UNSCALED loss.
    assert np.asarray(metrics["loss"])[0] < 10.0
    assert np.asarray(metrics["grads_finite"]).all()
    assert (np.asarray(metrics["loss_scale"]) >= 1.0).all()


def test_scan_trainer_skips_nonfinite_update():
    """Inject a NaN into the image; grads go NaN; params must not change."""
    config, model = _tiny_setup("f32")
    tx = optimizer_lib.optimizer_from_config(config.optimizer)
    state, _ = train_lib.create_train_state(model, config)
    step = train_lib.make_scan_train_step(model, tx, config)
    rng = np.random.RandomState(0)
    seeds, images, labels, weights = _tiny_batch(config, model, rng)
    images = images.copy()
    images[:] = np.nan
    offsets = train_lib.fixed_offsets_zyx(model.info)
    params, opt_state, _, _, _, metrics = step(
        state.params, state.opt_state, state.ema_params, state.scale_state,
        jnp.asarray(seeds), jnp.asarray(images), jnp.asarray(labels),
        jnp.asarray(weights), jnp.asarray(offsets))
    assert not np.asarray(metrics["grads_finite"]).any()
    p0 = jax.tree.leaves(model.init_params(jax.random.PRNGKey(0)))
    for a, b in zip(jax.tree.leaves(params), p0):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

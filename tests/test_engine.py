import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ffn_tpu.inference import engine as engine_lib
from ffn_tpu.models import convstack_3d

FOV = 9
PAD = np.log(0.05 / 0.95)
MOVE_T = np.log(0.9 / 0.1)


def make_engine(disco=-1.0, depth=1, features=2):
    model = convstack_3d.ConvStack3DFFNModel(
        fov_size=[FOV] * 3, deltas=[2, 2, 2], depth=depth, features=features)
    params = model.init_params(jax.random.PRNGKey(3))
    eng = engine_lib.FloodFillEngine(
        model, params, pad_value=PAD, move_threshold=MOVE_T,
        disco_seed_threshold=disco)
    return model, params, eng


def numpy_update(model, params, image, seed, pos, disco, keep=None):
    """Reference-semantics oracle for one update_at step (numpy control,
    model math on device — the model itself is already parity-tested)."""
    off = FOV // 2
    start = np.array(pos) - off
    end = start + FOV
    sel = tuple(slice(s, e) for s, e in zip(start, end))
    logit_seed = np.array(seed[sel])
    logit_seed[np.isnan(logit_seed)] = np.float32(PAD)
    img = image[sel]

    logits = np.array(model.apply(
        params, jnp.asarray(img[None, ..., None]),
        jnp.asarray(logit_seed[None, ..., None])))[0, ..., 0]

    if disco >= 0:
        old_seed = seed[sel]
        if np.mean(logits >= MOVE_T) > disco:
            with np.errstate(invalid="ignore"):
                mask = (old_seed < 0.0) & (logits > old_seed)
            logits[mask] = old_seed[mask]
    seed[sel] = logits
    return logits


@pytest.mark.parametrize("disco", [-1.0, 0.0, 0.25])
def test_step_matches_numpy_oracle(disco):
    model, params, eng = make_engine(disco=disco)
    rng = np.random.RandomState(0)
    image = rng.randn(24, 24, 24).astype(np.float32)

    seed_np = np.full(image.shape, np.nan, np.float32)
    pos0 = (12, 12, 12)
    seed_np[pos0] = 3.0

    image_dev = eng.put_image(image)
    seed_dev = eng.new_seed_buffer(image.shape)
    seed_dev = eng.reset_seed(seed_dev, pos0, 3.0)

    # Several chained steps at different positions: the scatter and the NaN
    # handling must stay consistent with the oracle throughout.
    for pos in [(12, 12, 12), (12, 14, 12), (10, 12, 13)]:
        seed_dev, patch = eng.step(image_dev, seed_dev, pos)
        expected = numpy_update(model, params, image, seed_np, pos, disco)
        np.testing.assert_allclose(patch, expected, atol=1e-5)
        np.testing.assert_allclose(np.asarray(seed_dev), seed_np, atol=1e-5,
                                   equal_nan=True)


def test_reset_seed():
    _, _, eng = make_engine()
    seed = eng.new_seed_buffer((10, 10, 10))
    seed = eng.reset_seed(seed, (3, 4, 5), 2.5)
    host = np.asarray(seed)
    assert host[3, 4, 5] == 2.5
    assert np.isnan(np.delete(host.ravel(), np.ravel_multi_index(
        (3, 4, 5), (10, 10, 10)))).all()


def test_nan_voxels_fed_as_pad_value():
    # A model with zero weights returns seed unchanged => the patch equals
    # the NaN->pad-substituted input seed.
    model, params, eng = make_engine()
    params0 = jax.tree.map(jnp.zeros_like, params)
    eng0 = engine_lib.FloodFillEngine(
        model, params0, pad_value=PAD, move_threshold=MOVE_T,
        disco_seed_threshold=-1.0)
    image = np.zeros((16, 16, 16), np.float32)
    seed = eng0.new_seed_buffer(image.shape)
    seed = eng0.reset_seed(seed, (8, 8, 8), 3.0)
    _, patch = eng0.step(eng0.put_image(image), seed, (8, 8, 8))
    expected = np.full((FOV,) * 3, np.float32(PAD))
    expected[FOV // 2, FOV // 2, FOV // 2] = 3.0
    np.testing.assert_allclose(patch, expected, atol=1e-6)


def test_step_batch_matches_sequential():
    model, params, eng = make_engine(disco=0.0)
    rng = np.random.RandomState(1)
    image = rng.randn(20, 20, 20).astype(np.float32)
    image_dev = eng.put_image(image)

    B = 3
    seeds = eng.new_seed_batch(B, image.shape)
    positions = np.array([[10, 10, 10], [9, 9, 9], [11, 10, 9]], np.int32)
    for b in range(B):
        seeds = eng.reset_seed_lane(seeds, b, positions[b], 3.0)

    active = np.array([True, True, False])
    new_seeds, patches = eng.step_batch(image_dev, seeds, positions, active)

    # Compare each active lane against the single-object step.
    for b in range(B):
        seed_b = eng.new_seed_buffer(image.shape)
        seed_b = eng.reset_seed(seed_b, positions[b], 3.0)
        ref_seed, ref_patch = eng.step(image_dev, seed_b, positions[b])
        if active[b]:
            np.testing.assert_allclose(patches[b], ref_patch, atol=1e-5)
            np.testing.assert_allclose(np.asarray(new_seeds[b]),
                                       np.asarray(ref_seed), atol=1e-5,
                                       equal_nan=True)
        else:
            # Inactive lane seed untouched.
            host = np.asarray(new_seeds[b])
            assert np.isnan(host).sum() == host.size - 1

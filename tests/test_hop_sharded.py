"""Hop engine under mesh sharding: lanes sharded over the data axis.

The device-resident movement program is pure batched compute over the
lane axis (image/blocked replicated), so sharding LaneState over a mesh
runs each device's lane shard independently — the multi-chip layout for
batched flood fill on one shared subvolume.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from scipy.special import logit

from ffn_tpu.inference import hop_engine as hop_engine_lib
from ffn_tpu.models import oracle

from test_canvas_e2e import DELTAS, FOV, make_image, make_options


def _shard_state(state, mesh):
    lanes = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, lanes), state)


def test_run_hops_sharded_matches_single_device():
    opts = make_options()
    model = oracle.ThresholdOracleModel(fov_size=[FOV] * 3,
                                        deltas=list(DELTAS))
    eng = hop_engine_lib.HopEngine(
        model, {}, pad_value=float(logit(opts.pad_value)),
        move_threshold=float(logit(opts.move_threshold)),
        disco_seed_threshold=opts.disco_seed_threshold,
        queue_capacity=512)

    image = make_image().astype(np.float32)
    B = 8
    rng = np.random.RandomState(0)
    pos = rng.randint(6, image.shape[0] - 6, size=(B, 3)).astype(np.int32)

    def run(shard):
        img = eng.put_image(image)
        blocked = eng.put_blocked(np.zeros(image.shape, np.uint8))
        state = eng.init_lane_state(B, image.shape)
        if shard:
            mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
            repl = NamedSharding(mesh, P())
            img = jax.device_put(img, repl)
            blocked = jax.device_put(blocked, repl)
            state = _shard_state(state, mesh)
        state = eng.reseed_lanes(state, np.ones(B, bool), pos,
                                 float(logit(opts.init_activation)))
        state, aux = eng.run_hops(img, blocked, state, hops=6)
        return np.asarray(state.seeds), aux

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices; see conftest.py")
    eng._run_hops_cache.clear()
    seeds_1, aux_1 = run(shard=False)
    eng._run_hops_cache.clear()
    seeds_8, aux_8 = run(shard=True)
    np.testing.assert_array_equal(np.isnan(seeds_1), np.isnan(seeds_8))
    np.testing.assert_allclose(np.nan_to_num(seeds_1),
                               np.nan_to_num(seeds_8), rtol=0, atol=1e-6)
    np.testing.assert_array_equal(aux_1["status"], aux_8["status"])
    np.testing.assert_array_equal(aux_1["iters"], aux_8["iters"])
    np.testing.assert_array_equal(aux_1["executed"], aux_8["executed"])


def test_lane_state_is_a_pytree():
    model = oracle.ThresholdOracleModel(fov_size=[FOV] * 3,
                                        deltas=list(DELTAS))
    eng = hop_engine_lib.HopEngine(model, {}, pad_value=-2.9,
                                   move_threshold=2.2,
                                   disco_seed_threshold=-1.0,
                                   queue_capacity=64)
    state = eng.init_lane_state(2, (32, 32, 32))
    leaves = jax.tree.leaves(state)
    assert len(leaves) == len(dataclasses.fields(state))

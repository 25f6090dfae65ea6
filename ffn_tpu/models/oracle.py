"""Deterministic rule-based FFN models for tests and smoke runs.

These replace a trained network with an analytic rule, so engine/canvas
semantics can be validated against independent numpy oracles without
checkpoints (the reference has no equivalent; its tests require the shipped
TF checkpoint).
"""

from __future__ import annotations

import jax.numpy as jnp

from ffn_tpu.models import model_info as model_info_lib


class ThresholdOracleModel:
    """Predicts +logit_scale where image > threshold, else -logit_scale.

    A perfectly confident membrane-free segmenter: flood fill covers exactly
    the connected component of {image > threshold} reachable by the movement
    policy. Ignores the input seed.
    """

    dim = 3

    def __init__(self, fov_size=None, deltas=None, batch_size=None,
                 threshold: float = 0.0, logit_scale: float = 10.0,
                 **kwargs):
        del kwargs
        self.info = model_info_lib.ModelInfo(
            deltas=deltas, pred_mask_size=fov_size,
            input_seed_size=fov_size, input_image_size=fov_size,
            additive=False)
        self.batch_size = batch_size
        self.threshold = threshold
        self.logit_scale = logit_scale

    def init_params(self, rng=None):
        del rng
        return {}

    def apply(self, params, image, seed):
        del params, seed
        return jnp.where(image > self.threshold, self.logit_scale,
                         -self.logit_scale).astype(jnp.float32)

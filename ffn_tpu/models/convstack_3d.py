"""Residual 3D conv-stack FFN models in Flax.

Math parity with the reference's ffn/training/models/convstack_3d.py:26-56
(_predict_object_mask) and :83-95 (seed update): conv0_a(+relu) ->
conv0_b -> depth-1 pre-ReLU residual blocks -> relu -> 1x1x1 conv_lom; the
logit update is added to the input seed. Also provides ResConvStack, the
deeper layernorm variant used by the reference's LICONN notebook
(connectomics.jax.models.convstack.ResConvStack).

TPU notes: channels-last NDHWC layout (z=D, y=H, x=W); the `dtype` knob
selects the compute dtype (bfloat16 halves HBM traffic and engages the MXU
natively; params remain float32).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

from ffn_tpu.models import model_info as model_info_lib

# The reference trains with TruncatedNormal(stddev=0.01)
# (convstack_3d.py:24-25).
_KERNEL_INIT = nn.initializers.truncated_normal(stddev=0.01)


class ConvStack3D(nn.Module):
    """The residual conv stack computing the seed (POM) logit update.

    Input: (batch, z, y, x, 2) — image and seed concatenated channel-wise.
    Output: (batch, z, y, x, 1) — logit update to be added to the seed.
    """

    depth: int = 9
    features: Union[int, Sequence[int]] = 32
    dtype: jnp.dtype = jnp.float32
    # Default HIGHEST: jax's default conv precision is reduced (bf16-class)
    # even in f32, which shifts POM logits by ~1e-2 over 12 layers — enough
    # to flip thresholded move decisions vs the reference. Use
    # precision=None + dtype=bfloat16 for the fast TPU path.
    precision: Optional[lax.Precision] = lax.Precision.HIGHEST

    @nn.compact
    def __call__(self, x):
        if isinstance(self.features, int):
            feats = [self.features] * (2 * self.depth)
        else:
            feats = list(self.features)

        def conv(n_out, name, kernel=(3, 3, 3)):
            return nn.Conv(n_out, kernel, padding="SAME", name=name,
                           dtype=self.dtype, precision=self.precision,
                           kernel_init=_KERNEL_INIT)

        x = x.astype(self.dtype)
        net = nn.relu(conv(feats[0], "conv0_a")(x))
        net = conv(feats[1], "conv0_b")(net)

        for i in range(1, self.depth):
            residual = net
            net = nn.relu(net)
            net = nn.relu(conv(feats[2 * i], f"conv{i}_a")(net))
            net = conv(feats[2 * i + 1], f"conv{i}_b")(net)
            net = net + residual

        net = nn.relu(net)
        logits = nn.Conv(1, (1, 1, 1), padding="SAME", name="conv_lom",
                         dtype=self.dtype, precision=self.precision,
                         kernel_init=_KERNEL_INIT)(net)
        return logits.astype(jnp.float32)


class ResConvStack(nn.Module):
    """Deeper pre-activation residual stack with optional LayerNorm.

    Equivalent of connectomics.jax.models.convstack.ResConvStack as used by
    the reference's jax_ffn_inference_liconn notebook (depth=20, layernorm).
    """

    depth: int = 20
    features: int = 32
    use_layernorm: bool = True
    dtype: jnp.dtype = jnp.float32
    precision: Optional[lax.Precision] = lax.Precision.HIGHEST

    @nn.compact
    def __call__(self, x):
        def conv(n_out, name):
            return nn.Conv(n_out, (3, 3, 3), padding="SAME", name=name,
                           dtype=self.dtype, precision=self.precision,
                           kernel_init=_KERNEL_INIT)

        x = x.astype(self.dtype)
        net = nn.relu(conv(self.features, "conv0_a")(x))
        net = conv(self.features, "conv0_b")(net)

        for i in range(1, self.depth):
            residual = net
            if self.use_layernorm:
                net = nn.LayerNorm(dtype=self.dtype, name=f"ln{i}")(net)
            net = nn.relu(net)
            net = nn.relu(conv(self.features, f"conv{i}_a")(net))
            net = conv(self.features, f"conv{i}_b")(net)
            net = net + residual

        net = nn.relu(net)
        logits = nn.Conv(1, (1, 1, 1), padding="SAME", name="conv_lom",
                         dtype=self.dtype, precision=self.precision,
                         kernel_init=_KERNEL_INIT)(net)
        return logits.astype(jnp.float32)


class ConvStack3DFFNModel:
    """FFN model wrapper: geometry + the jittable apply function.

    Mirrors the reference's ConvStack3DFFNModel constructor signature
    (convstack_3d.py:59-81) so `model_args` JSON from InferenceRequest
    protos applies unchanged.
    """

    dim = 3

    def __init__(self, fov_size=None, deltas=None, batch_size=None,
                 depth: int = 9, features=32, dtype=jnp.float32,
                 precision=lax.Precision.HIGHEST, **kwargs):
        del kwargs
        self.info = model_info_lib.ModelInfo(
            deltas=deltas, pred_mask_size=fov_size, input_seed_size=fov_size,
            input_image_size=fov_size, additive=True)
        self.batch_size = batch_size
        self.depth = depth
        self.features = features
        self.module = ConvStack3D(depth=depth, features=features, dtype=dtype,
                                  precision=precision)

    def init_params(self, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        fov_zyx = tuple(int(v) for v in self.info.input_image_size[::-1])
        dummy = jnp.zeros((1,) + fov_zyx + (2,), jnp.float32)
        return self.module.init(rng, dummy)

    def apply(self, params, image, seed):
        """One FFN step: returns updated seed logits.

        Args:
          params: flax variables
          image: (batch, z, y, x, 1) normalized image patch
          seed: (batch, z, y, x, 1) POM logits

        Returns:
          (batch, z, y, x, 1) updated POM logits (seed + predicted update).
        """
        net = jnp.concatenate([image, seed.astype(image.dtype)], axis=-1)
        update = self.module.apply(params, net)
        return seed + update


def convstack_grid_params(depth: int, features: int) -> int:
    """Parameter count (for memory planning)."""
    n = 3 ** 3 * 2 * features + features          # conv0_a
    n += 3 ** 3 * features * features + features  # conv0_b
    n += (depth - 1) * 2 * (3 ** 3 * features * features + features)
    n += features + 1                             # conv_lom
    return n


def make_model_info(fov_size, deltas) -> model_info_lib.ModelInfo:
    return model_info_lib.ModelInfo(
        deltas=deltas, pred_mask_size=fov_size, input_seed_size=fov_size,
        input_image_size=fov_size, additive=True)

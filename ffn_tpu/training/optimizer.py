"""Optax optimizer factory.

Parity with the reference's ffn/training/optimizer.py (:20-128): the same
optimizer set {momentum, sgd, adagrad, adam, rmsprop}, defaults, staircase
exponential LR decay, and the reference's per-entry gradient value clip of
+/-0.7 (model.py:127-145). Sync vs async SGD is not a concept here: on a
TPU mesh, gradients are always averaged across data-parallel shards inside
the jitted step (the XLA equivalent of sync SGD, without a PS tier).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import optax


@dataclasses.dataclass
class OptimizerConfig:
    optimizer: str = "sgd"
    learning_rate: float = 0.001
    momentum: float = 0.9
    learning_rate_decay_factor: Optional[float] = None
    decay_steps: Optional[int] = None
    rmsprop_decay: float = 0.9
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    epsilon: float = 1e-8
    # The reference clips each gradient entry to +/- this value.
    max_gradient_entry_mag: float = 0.7


def schedule_from_config(config: OptimizerConfig):
    if (config.learning_rate_decay_factor is not None
            and config.decay_steps is not None):
        return optax.exponential_decay(
            init_value=config.learning_rate,
            transition_steps=config.decay_steps,
            decay_rate=config.learning_rate_decay_factor,
            staircase=True)
    return config.learning_rate


def optimizer_from_config(config: OptimizerConfig
                          ) -> optax.GradientTransformation:
    lr = schedule_from_config(config)
    name = config.optimizer
    if name == "momentum":
        core = optax.sgd(lr, momentum=config.momentum)
    elif name == "sgd":
        core = optax.sgd(lr)
    elif name == "adagrad":
        core = optax.adagrad(lr)
    elif name == "adam":
        core = optax.adam(lr, b1=config.adam_beta1, b2=config.adam_beta2,
                          eps=config.epsilon)
    elif name == "rmsprop":
        core = optax.rmsprop(lr, decay=config.rmsprop_decay,
                             momentum=config.momentum, eps=config.epsilon)
    else:
        raise ValueError(f"Unknown optimizer: {name}")

    transforms = []
    if config.max_gradient_entry_mag > 0:
        transforms.append(
            optax.clip(config.max_gradient_entry_mag))
    transforms.append(core)
    return optax.chain(*transforms)

"""Mixed-precision training policy + dynamic loss scaling.

TPU-native equivalent of the reference's jmp-based mixed precision
(/root/reference/ffn/jax/train.py:195-223): a compute-dtype policy
(params stay f32, convs run in bfloat16 on the MXU) plus a dynamic loss
scale with skip-nonfinite updates.

On TPU, bfloat16 has the same exponent range as float32, so loss scaling
is rarely *required* (unlike fp16 on GPU) — but the reference treats it
as part of the training contract and it guards the rare overflow in the
backward pass, so the full machinery is provided. `DynamicLossScale` is
a pytree carried through the jitted train step:

    scale = DynamicLossScale.init()
    loss = scale.scale(loss)                  # inside loss_fn
    grads = scale.unscale(grads)              # after value_and_grad
    finite = all_finite(grads)
    scale = scale.adjust(finite)              # grow/shrink the scale
    # ...apply the update only where `finite` (see select_tree)

Everything is branch-free (jnp.where), so it jits and scans cleanly.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Dtype policy: what to cast where.

    param_dtype: storage dtype of the model parameters (always f32 here).
    compute_dtype: dtype convolutions/matmuls run in.
    output_dtype: dtype of logits handed to the loss (f32 for stability).
    """
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.float32
    output_dtype: Any = jnp.float32

    @property
    def use_loss_scale(self) -> bool:
        # bf16 shares f32's exponent range; scaling only matters for fp16.
        return self.compute_dtype == jnp.float16

    def cast_to_compute(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


_POLICIES = {
    "f32": Policy(),
    "bf16": Policy(compute_dtype=jnp.bfloat16),
    "f16": Policy(compute_dtype=jnp.float16),
}


def get_policy(name: str) -> Policy:
    """Parses a policy name ("f32" | "bf16" | "f16")."""
    try:
        return _POLICIES[name]
    except KeyError:
        raise ValueError(
            f"unknown precision policy {name!r}; "
            f"one of {sorted(_POLICIES)}") from None


@jax.tree_util.register_pytree_node_class
class DynamicLossScale:
    """Dynamic loss scale state (a pytree; carried through jit/scan).

    Grows the scale 2x after `growth_interval` consecutive finite steps;
    halves it (>= 1) on any non-finite gradient.
    """

    def __init__(self, scale, counter, growth_interval=2000):
        self.scale = scale
        self.counter = counter
        self.growth_interval = growth_interval

    @classmethod
    def init(cls, initial_scale: float = 2.0 ** 15,
             growth_interval: int = 2000) -> "DynamicLossScale":
        return cls(jnp.float32(initial_scale), jnp.int32(0),
                   growth_interval)

    def tree_flatten(self):
        return (self.scale, self.counter), (self.growth_interval,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def scale_loss(self, loss):
        return loss * self.scale.astype(loss.dtype)

    def unscale(self, tree):
        inv = (1.0 / self.scale)
        return jax.tree.map(lambda g: g * inv.astype(g.dtype), tree)

    def adjust(self, grads_finite) -> "DynamicLossScale":
        grow = self.counter + 1 >= self.growth_interval
        new_scale = jnp.where(
            grads_finite,
            jnp.where(grow, self.scale * 2.0, self.scale),
            jnp.maximum(self.scale * 0.5, 1.0))
        new_counter = jnp.where(grads_finite & ~grow, self.counter + 1, 0)
        return DynamicLossScale(new_scale, new_counter,
                                self.growth_interval)


@jax.tree_util.register_pytree_node_class
class NoOpLossScale:
    """Identity loss scale for f32/bf16 policies; same interface."""

    def __init__(self):
        pass

    @classmethod
    def init(cls, *a, **k) -> "NoOpLossScale":
        return cls()

    def tree_flatten(self):
        return (), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls()

    @property
    def scale(self):
        return jnp.float32(1.0)

    def scale_loss(self, loss):
        return loss

    def unscale(self, tree):
        return tree

    def adjust(self, grads_finite) -> "NoOpLossScale":
        del grads_finite
        return self


def loss_scale_for(policy: Policy):
    return (DynamicLossScale.init() if policy.use_loss_scale
            else NoOpLossScale.init())


def all_finite(tree) -> jax.Array:
    """True iff every element of every leaf is finite."""
    leaves = jax.tree.leaves(tree)
    if not leaves:
        return jnp.bool_(True)
    return jnp.stack(
        [jnp.isfinite(leaf).all() for leaf in leaves]).all()


def select_tree(pred, on_true, on_false):
    """Branch-free per-leaf select: where(pred, on_true, on_false)."""
    return jax.tree.map(
        lambda t, f: jnp.where(pred, t, f), on_true, on_false)

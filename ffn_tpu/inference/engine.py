"""Device-resident flood-fill engine.

This replaces the reference's thread/queue batching executor
(ffn/inference/executor.py) entirely. The reference keeps the seed (POM)
array on the host and round-trips 33^3 patches through queues to batch
them onto the accelerator; here the seed lives in device HBM and one jitted
XLA program performs patch gather (dynamic_slice) -> conv stack -> additive
POM update -> disco-seed oversegmentation mask -> scatter
(dynamic_update_slice), per step. The host receives only the updated patch
(for movement bookkeeping) — a single small transfer per step instead of a
queue round-trip, and no executor threads.

Batched mode runs B independent objects ("lanes"), each with its own seed
buffer, through one vmapped program — the TPU-native replacement for the
reference's `concurrent_requests` canvas threads.

Semantics parity: Canvas.update_at (inference.py:386-441), including the
exact NaN-as-unvisited handling ((x > NaN) == False) and logit-space
thresholds.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class FloodFillEngine:
    """Jitted single-object and batched flood-fill step programs.

    Args:
      model: object with `.apply(params, image, seed) -> updated_seed`
        ((B, z, y, x, 1) arrays) and `.info` (ModelInfo).
      params: model variables (device-resident after first use).
      pad_value: logit-space value substituted for unvisited (NaN) voxels.
      move_threshold: logit-space move threshold.
      disco_seed_threshold: probability-space threshold from
        InferenceOptions; < 0 disables the disco-seed mask.
    """

    def __init__(self, model, params, *, pad_value: float,
                 move_threshold: float, disco_seed_threshold: float):
        self.model = model
        self.params = params
        self.info = model.info
        self._pad_value = float(pad_value)
        self._move_threshold = float(move_threshold)
        self._disco_threshold = float(disco_seed_threshold)

        # ZYX geometry.
        self._seed_size = tuple(int(v)
                                for v in self.info.input_seed_size[::-1])
        self._image_size = tuple(int(v)
                                 for v in self.info.input_image_size[::-1])
        self._pred_size = tuple(int(v)
                                for v in self.info.pred_mask_size[::-1])
        self._pred_delta = tuple(
            (s - p) // 2 for s, p in zip(self._seed_size, self._pred_size))

        self._step = jax.jit(self._step_impl, donate_argnums=(1,))
        self._step_batch = jax.jit(self._step_batch_impl, donate_argnums=(1,))
        self._reset = jax.jit(self._reset_impl, donate_argnums=(0,))
        self._reset_lane = jax.jit(self._reset_lane_impl, donate_argnums=(0,))

    # -- device programs ----------------------------------------------------

    def _apply_model(self, image_patch, seed_patch):
        """One FFN update on a patch pair; returns the pred-size patch that
        must be written back into the seed, plus the input seed patch."""
        init_mask = jnp.isnan(seed_patch)
        seed_in = jnp.where(init_mask, self._pad_value, seed_patch)

        updated = self.model.apply(
            self.params, image_patch[None, ..., None],
            seed_in[None, ..., None])[0, ..., 0]

        # Crop to the predicted output region.
        if self._pred_size != self._seed_size:
            sel = tuple(slice(d, d + p) for d, p in
                        zip(self._pred_delta, self._pred_size))
            logits = updated[sel]
            old_seed = seed_patch[sel]
        else:
            logits = updated
            old_seed = seed_patch

        if self._disco_threshold >= 0:
            # Bias towards oversegmentation: never reverse disconnectedness
            # predictions. (old_seed < th) is False for NaN, excluding
            # previously-unvisited voxels — exact reference semantics
            # (inference.py:416-436).
            th_max = 0.0  # logit(0.5)
            frac = jnp.mean(
                (logits >= self._move_threshold).astype(jnp.float32))
            apply_mask = frac > self._disco_threshold
            mask = (old_seed < th_max) & (logits > old_seed)
            logits = jnp.where(apply_mask & mask, old_seed, logits)
        return logits

    def _step_impl(self, image, seed, pos):
        """pos: int32[3] FoV center (zyx). Returns (new_seed, patch)."""
        margin = jnp.array([s // 2 for s in self._image_size], jnp.int32)
        img_start = pos - margin
        image_patch = jax.lax.dynamic_slice(image, img_start,
                                            self._image_size)
        seed_off = jnp.array([s // 2 for s in self._seed_size], jnp.int32)
        seed_start = pos - seed_off
        seed_patch = jax.lax.dynamic_slice(seed, seed_start, self._seed_size)

        logits = self._apply_model(image_patch, seed_patch)

        write_start = seed_start + jnp.array(self._pred_delta, jnp.int32)
        new_seed = jax.lax.dynamic_update_slice(seed, logits, write_start)
        return new_seed, logits

    def _step_batch_impl(self, image, seeds, pos, active):
        """Batched step over B lanes.

        Args:
          image: (Z, Y, X) shared image.
          seeds: (B, Z, Y, X) per-lane seed buffers.
          pos: (B, 3) int32 FoV centers.
          active: (B,) bool; inactive lanes are left untouched.

        Returns:
          (new_seeds, patches (B, *pred_size)).
        """
        def one(seed, p):
            new_seed, logits = self._step_impl(image, seed, p)
            return new_seed, logits

        new_seeds, patches = jax.vmap(one)(seeds, pos)
        keep = active.reshape((-1,) + (1,) * (seeds.ndim - 1))
        new_seeds = jnp.where(keep, new_seeds, seeds)
        return new_seeds, patches

    def _reset_impl(self, seed, pos, init_activation):
        """Clears the seed to NaN and plants init_activation at pos."""
        seed = jnp.full_like(seed, jnp.nan)
        return seed.at[pos[0], pos[1], pos[2]].set(init_activation)

    def _reset_lane_impl(self, seeds, lane, pos, init_activation):
        """Batched variant: resets one lane of (B, Z, Y, X) seeds."""
        cleared = jnp.full(seeds.shape[1:], jnp.nan, seeds.dtype)
        cleared = cleared.at[pos[0], pos[1], pos[2]].set(init_activation)
        return seeds.at[lane].set(cleared)

    # -- host API -------------------------------------------------------------

    def new_seed_buffer(self, shape) -> jax.Array:
        return jnp.full(shape, jnp.nan, jnp.float32)

    def new_seed_batch(self, batch: int, shape) -> jax.Array:
        return jnp.full((batch,) + tuple(shape), jnp.nan, jnp.float32)

    def put_image(self, image: np.ndarray) -> jax.Array:
        return jnp.asarray(np.ascontiguousarray(image, dtype=np.float32))

    def reset_seed(self, seed: jax.Array, pos, init_activation: float):
        return self._reset(seed, jnp.asarray(pos, jnp.int32),
                           jnp.float32(init_activation))

    def reset_seed_lane(self, seeds: jax.Array, lane: int, pos,
                        init_activation: float):
        return self._reset_lane(seeds, lane, jnp.asarray(pos, jnp.int32),
                                jnp.float32(init_activation))

    def step(self, image: jax.Array, seed: jax.Array, pos):
        """One flood-fill step. Returns (new_seed, patch as np.ndarray).

        The patch is the pred-size POM update written at `pos` (the caller
        uses it to update its host mirror and the movement policy).
        """
        new_seed, patch = self._step(image, seed,
                                     jnp.asarray(pos, jnp.int32))
        return new_seed, np.asarray(patch)

    def step_batch(self, image: jax.Array, seeds: jax.Array,
                   pos: np.ndarray, active: np.ndarray):
        new_seeds, patches = self._step_batch(
            image, seeds, jnp.asarray(pos, jnp.int32),
            jnp.asarray(active, bool))
        return new_seeds, np.asarray(patches)

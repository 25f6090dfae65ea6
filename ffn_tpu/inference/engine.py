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
                 move_threshold: float, disco_seed_threshold: float,
                 seed_dtype=jnp.float32):
        self.model = model
        self.params = params
        self.info = model.info
        self._pad_value = float(pad_value)
        self._move_threshold = float(move_threshold)
        self._disco_threshold = float(disco_seed_threshold)
        # The thresholds enter every device program as ONE traced f32
        # vector (pad, move, disco) rather than baked constants: two
        # engines that differ only in thresholds (per-dataset tuning
        # sweeps, doc/manual.md:66-87) then share every compiled
        # program — on a tunneled backend each avoided compile is
        # tens of seconds.
        self._opts_host = np.array(
            [self._pad_value, self._move_threshold,
             self._disco_threshold], np.float32)
        # POM (seed) buffer storage dtype. bfloat16 halves HBM per lane —
        # at 250^3 that is the difference between 120 and 240 concurrent
        # lanes — at the cost of rounding stored logits to bf16 (may flip
        # near-threshold move decisions vs the f32 reference semantics).
        self.seed_dtype = jnp.dtype(seed_dtype)

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
        self._reset_lanes = jax.jit(self._reset_lanes_impl,
                                    donate_argnums=(0,))

    # -- device programs ----------------------------------------------------

    def _apply_model(self, image_patch, seed_patch, opts):
        """One FFN update on a patch pair; returns the pred-size patch that
        must be written back into the seed. opts is the traced f32[3]
        (pad_value, move_threshold, disco_threshold) vector."""
        init_mask = jnp.isnan(seed_patch)
        seed_in = jnp.where(init_mask, opts[0].astype(seed_patch.dtype),
                            seed_patch)

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

        # Bias towards oversegmentation: never reverse disconnectedness
        # predictions. (old_seed < th) is False for NaN, excluding
        # previously-unvisited voxels — exact reference semantics
        # (inference.py:416-436). disco_threshold < 0 disables the mask
        # (evaluated on device so the program is threshold-independent).
        th_max = 0.0  # logit(0.5)
        frac = jnp.mean((logits >= opts[1]).astype(jnp.float32))
        apply_mask = (opts[2] >= 0) & (frac > opts[2])
        mask = (old_seed < th_max) & (logits > old_seed)
        return jnp.where(apply_mask & mask, old_seed, logits)

    def _step_impl(self, image, seed, pos, opts):
        """pos: int32[3] FoV center (zyx). Returns (new_seed, patch)."""
        margin = jnp.array([s // 2 for s in self._image_size], jnp.int32)
        img_start = pos - margin
        image_patch = jax.lax.dynamic_slice(image, img_start,
                                            self._image_size)
        seed_off = jnp.array([s // 2 for s in self._seed_size], jnp.int32)
        seed_start = pos - seed_off
        seed_patch = jax.lax.dynamic_slice(seed, seed_start, self._seed_size)

        logits = self._apply_model(image_patch, seed_patch, opts)

        write_start = seed_start + jnp.array(self._pred_delta, jnp.int32)
        new_seed = jax.lax.dynamic_update_slice(
            seed, logits.astype(seed.dtype), write_start)
        return new_seed, logits

    def _step_batch_impl(self, image, seeds, pos, active, opts):
        """Batched step over B lanes.

        Args:
          image: (Z, Y, X) shared image.
          seeds: (B, Z, Y, X) per-lane seed buffers.
          pos: (B, 3) int32 FoV centers.
          active: (B,) bool; inactive lanes are left untouched.

        Returns:
          (new_seeds, patches (B, *pred_size)).

        Inactivity is handled with a patch-sized select before the scatter
        (NOT a full-buffer where, which would read+write every lane's whole
        seed volume each step).
        """
        def one(seed, p, act):
            margin = jnp.array([s // 2 for s in self._image_size],
                               jnp.int32)
            image_patch = jax.lax.dynamic_slice(image, p - margin,
                                                self._image_size)
            seed_off = jnp.array([s // 2 for s in self._seed_size],
                                 jnp.int32)
            seed_start = p - seed_off
            seed_patch = jax.lax.dynamic_slice(seed, seed_start,
                                               self._seed_size)

            logits = self._apply_model(image_patch, seed_patch, opts)

            write_start = seed_start + jnp.array(self._pred_delta,
                                                 jnp.int32)
            old = jax.lax.dynamic_slice(seed, write_start, self._pred_size)
            patch = jnp.where(act, logits.astype(seed.dtype), old)
            new_seed = jax.lax.dynamic_update_slice(seed, patch,
                                                    write_start)
            return new_seed, logits

        return jax.vmap(one)(seeds, pos, active)

    def _face_scores(self, patch):
        """Face maxima of a pred-size patch: the device-side equivalent of
        movement.get_scored_move_offsets (same math; filtering/sorting and
        dedup stay on the host, which sees the identical values).

        Returns (scores (6,), rel_offsets (6, 3) int32); axes ordered
        (z-, z+, y-, y+, x-, x+). Faces of zero-delta axes get -inf.
        """
        deltas = tuple(int(d) for d in self.info.deltas[::-1])  # zyx
        center = tuple(s // 2 for s in self._pred_size)
        scores = []
        offsets = []
        for axis, d in enumerate(deltas):
            for sign in (-1, 1):
                if d == 0:
                    scores.append(jnp.float32(-jnp.inf))
                    offsets.append(jnp.zeros((3,), jnp.int32))
                    continue
                sel = [slice(c - dd, c + dd + 1)
                       for c, dd in zip(center, deltas)]
                sel[axis] = center[axis] + sign * d
                face = patch[tuple(sel)]
                flat = face.reshape(-1)
                idx = jnp.argmax(flat)
                score = flat[idx]
                f0 = idx // face.shape[1]
                f1 = idx % face.shape[1]
                rel2 = [f0 - face.shape[0] // 2, f1 - face.shape[1] // 2]
                rel = rel2[:axis] + [sign * d] + rel2[axis:]
                scores.append(score)
                offsets.append(jnp.stack(
                    [jnp.asarray(r, jnp.int32) for r in rel]))
        return jnp.stack(scores), jnp.stack(offsets)

    def _select_step_impl(self, image, seeds, candidates, start_pos,
                          active, ignore_threshold, opts):
        """Batched step with on-device candidate selection.

        Per lane: drop candidates whose current seed value is below the
        move threshold (the reference's pop-until-valid, evaluated against
        the same seed state), run the FFN update at the first valid one,
        and score the faces of the updated patch. Only scalar-sized data
        crosses to the host.

        Args:
          image: (Z, Y, X)
          seeds: (B, Z, Y, X)
          candidates: (B, K, 3) int32; K queued positions per lane in FIFO
            order (pad unused entries arbitrarily within bounds)
          start_pos: (B, 3) int32 segment origin per lane
          active: (B,) bool
          ignore_threshold: (B,) bool; take candidate 0 unconditionally
            (used for the first step of a fresh segment)

        Returns:
          (new_seeds, aux) where aux = dict(
            executed (B,) bool, chosen (B,) int32 (-1 if none valid),
            start_ok (B,) bool, scores (B, 6), offsets (B, 6, 3),
            pos (B, 3) — the executed position).
        """
        move_t = opts[1]

        def one(seed, cands, start, act, ignore):
            start_val = seed[start[0], start[1], start[2]]
            start_ok = (start_val >= move_t) | ignore

            def cand_value(k):
                c = cands[k]
                return seed[c[0], c[1], c[2]]

            K = cands.shape[0]
            vals = jax.vmap(cand_value)(jnp.arange(K))
            ok = vals >= move_t
            ok = ok.at[0].set(ok[0] | ignore)
            chosen = jnp.argmax(ok)          # first True
            any_ok = ok.any()
            chosen = jnp.where(any_ok, chosen, -1)
            executed = act & start_ok & any_ok
            pos = cands[jnp.maximum(chosen, 0)]

            margin = jnp.array([s // 2 for s in self._image_size],
                               jnp.int32)
            image_patch = jax.lax.dynamic_slice(image, pos - margin,
                                                self._image_size)
            seed_off = jnp.array([s // 2 for s in self._seed_size],
                                 jnp.int32)
            seed_start = pos - seed_off
            seed_patch = jax.lax.dynamic_slice(seed, seed_start,
                                               self._seed_size)
            logits = self._apply_model(image_patch, seed_patch, opts)

            write_start = seed_start + jnp.array(self._pred_delta,
                                                 jnp.int32)
            old = jax.lax.dynamic_slice(seed, write_start, self._pred_size)
            patch = jnp.where(executed, logits.astype(seed.dtype), old)
            new_seed = jax.lax.dynamic_update_slice(seed, patch,
                                                    write_start)
            scores, offsets = self._face_scores(patch)
            scores = jnp.where(executed, scores, -jnp.inf)
            return new_seed, executed, chosen, start_ok, scores, offsets, \
                pos

        new_seeds, executed, chosen, start_ok, scores, offsets, pos = \
            jax.vmap(one)(seeds, candidates, start_pos, active,
                          ignore_threshold)
        # Pack everything into ONE f32 array: each host<->device transfer
        # is a round trip on the tunnel (~tens of ms), so per-step traffic
        # must be a single buffer each way.
        packed = jnp.concatenate([
            executed.astype(jnp.float32)[:, None],
            chosen.astype(jnp.float32)[:, None],
            start_ok.astype(jnp.float32)[:, None],
            scores,
            offsets.reshape(offsets.shape[0], -1).astype(jnp.float32),
            pos.astype(jnp.float32),
        ], axis=1)
        return new_seeds, packed

    def _reset_lanes_impl(self, seeds, reset_mask, pos, init_activation):
        """Resets the lanes selected by reset_mask (B,) to a fresh seed at
        pos (B, 3)."""
        def one(seed, reset, p):
            # Scalar-broadcast blank; a full-size cleared intermediate
            # would double the dominant HBM allocation (see _reseed).
            seed = jnp.where(reset, jnp.asarray(jnp.nan, seed.dtype), seed)
            val = jnp.where(reset, jnp.asarray(init_activation, seed.dtype),
                            seed[p[0], p[1], p[2]])
            return seed.at[p[0], p[1], p[2]].set(val)

        return jax.vmap(one)(seeds, reset_mask, pos)

    def _reset_impl(self, seed, pos, init_activation):
        """Clears the seed to NaN and plants init_activation at pos."""
        seed = jnp.full_like(seed, jnp.nan)
        return seed.at[pos[0], pos[1], pos[2]].set(
            jnp.asarray(init_activation, seed.dtype))

    def _reset_lane_impl(self, seeds, lane, pos, init_activation):
        """Batched variant: resets one lane of (B, Z, Y, X) seeds."""
        cleared = jnp.full(seeds.shape[1:], jnp.nan, seeds.dtype)
        cleared = cleared.at[pos[0], pos[1], pos[2]].set(
            jnp.asarray(init_activation, seeds.dtype))
        return seeds.at[lane].set(cleared)

    # -- host API -------------------------------------------------------------

    def new_seed_buffer(self, shape) -> jax.Array:
        return jnp.full(shape, jnp.nan, self.seed_dtype)

    def new_seed_batch(self, batch: int, shape) -> jax.Array:
        return jnp.full((batch,) + tuple(shape), jnp.nan, self.seed_dtype)

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
                                     jnp.asarray(pos, jnp.int32),
                                     jnp.asarray(self._opts_host))
        return new_seed, np.asarray(patch)

    def step_batch(self, image: jax.Array, seeds: jax.Array,
                   pos: np.ndarray, active: np.ndarray):
        new_seeds, patches = self._step_batch(
            image, seeds, jnp.asarray(pos, jnp.int32),
            jnp.asarray(active, bool), jnp.asarray(self._opts_host))
        return new_seeds, np.asarray(patches)

    def select_step(self, image: jax.Array, seeds: jax.Array,
                    candidates: np.ndarray, start_pos: np.ndarray,
                    active: np.ndarray, ignore_threshold: np.ndarray):
        """Batched candidate-selecting step; see _select_step_impl.

        Returns (new_seeds, aux dict of host numpy arrays). Host traffic is
        one packed upload and one packed download per step.
        """
        B = candidates.shape[0]
        packed_in = np.concatenate([
            np.asarray(candidates, np.int32).reshape(B, -1),
            np.asarray(start_pos, np.int32).reshape(B, 3),
            np.asarray(active, np.int32).reshape(B, 1),
            np.asarray(ignore_threshold, np.int32).reshape(B, 1),
        ], axis=1)
        new_seeds, packed = self._select_step_packed(
            image, seeds, jnp.asarray(packed_in))
        packed = np.asarray(packed)
        aux = {
            "executed": packed[:, 0] > 0,
            "chosen": packed[:, 1].astype(np.int32),
            "start_ok": packed[:, 2] > 0,
            "scores": packed[:, 3:9],
            "offsets": packed[:, 9:27].reshape(B, 6, 3).astype(np.int32),
            "pos": packed[:, 27:30].astype(np.int32),
        }
        return new_seeds, aux

    def _select_step_packed(self, image, seeds, packed_in):
        """jit wrapper: unpacks the single upload buffer."""
        if not hasattr(self, "_select_step_packed_jit"):
            def fn(image, seeds, packed_in, opts):
                B = seeds.shape[0]
                K = (packed_in.shape[1] - 5) // 3
                candidates = packed_in[:, :3 * K].reshape(B, K, 3)
                start_pos = packed_in[:, 3 * K:3 * K + 3]
                active = packed_in[:, 3 * K + 3] > 0
                ignore = packed_in[:, 3 * K + 4] > 0
                return self._select_step_impl(image, seeds, candidates,
                                              start_pos, active, ignore,
                                              opts)

            self._select_step_packed_jit = jax.jit(fn, donate_argnums=(1,))
        return self._select_step_packed_jit(image, seeds, packed_in,
                                            jnp.asarray(self._opts_host))

    def reset_lanes(self, seeds: jax.Array, reset_mask: np.ndarray,
                    pos: np.ndarray, init_activation: float):
        return self._reset_lanes(seeds, jnp.asarray(reset_mask, bool),
                                 jnp.asarray(pos, jnp.int32),
                                 jnp.float32(init_activation))

    def lane_seed(self, seeds: jax.Array, lane: int) -> np.ndarray:
        """Downloads one lane's full seed buffer (used at finalization)."""
        return np.asarray(seeds[lane])

    def lane_seed_region(self, seeds: jax.Array, lane: int, start_zyx,
                         size_zyx):
        """Downloads a sub-box of one lane's seed buffer.

        Sizes are bucketed to multiples of 64 (clipped to the volume) so
        only a handful of region shapes ever compile; returns
        (region ndarray, actual_start) where actual_start accounts for the
        dynamic_slice clamping near volume edges.
        """
        shape = seeds.shape[1:]
        bucket = tuple(min(s, ((int(v) + 63) // 64) * 64)
                       for v, s in zip(size_zyx, shape))
        start = np.minimum(np.maximum(np.asarray(start_zyx, np.int64), 0),
                           np.array(shape) - np.array(bucket))

        cache = getattr(self, "_region_fns", None)
        if cache is None:
            cache = self._region_fns = {}
        if bucket not in cache:
            def fn(seeds, lane, start, _bucket=bucket):
                lane_buf = jax.lax.dynamic_index_in_dim(
                    seeds, lane, axis=0, keepdims=False)
                # Host side always sees f32 (numpy has no bfloat16).
                return jax.lax.dynamic_slice(lane_buf, start,
                                             _bucket).astype(jnp.float32)

            cache[bucket] = jax.jit(fn)
        region = cache[bucket](seeds, jnp.int32(lane),
                               jnp.asarray(start, jnp.int32))
        return np.asarray(region), start

    def lane_mask_region(self, seeds: jax.Array, lane: int, start_zyx,
                         size_zyx, seg_threshold: float, start_pos):
        """Thresholded finalization download: uint8 (seed >= threshold)
        mask of a sub-box plus the origin's weak-seed verdict.

        4x less host traffic than lane_seed_region (f32) — finalization
        transfers dominate wall time on runs with many objects, and the
        canvas only needs the thresholded mask unless it keeps
        probability maps. Bucketing as in lane_seed_region. NaN
        (unvisited) thresholds to False, matching the host-side
        `region >= threshold` semantics on NaN.

        Returns (mask uint8 ndarray, actual_start, start_ok bool).
        """
        shape = seeds.shape[1:]
        bucket = tuple(min(s, ((int(v) + 63) // 64) * 64)
                       for v, s in zip(size_zyx, shape))
        start = np.minimum(np.maximum(np.asarray(start_zyx, np.int64), 0),
                           np.array(shape) - np.array(bucket))

        cache = getattr(self, "_mask_region_fns", None)
        if cache is None:
            cache = self._mask_region_fns = {}
        if bucket not in cache:
            def fn(seeds, lane, start, thr, spos, opts,
                   _bucket=bucket):
                lane_buf = jax.lax.dynamic_index_in_dim(
                    seeds, lane, axis=0, keepdims=False)
                region = jax.lax.dynamic_slice(lane_buf, start, _bucket)
                mask = (region >= thr.astype(region.dtype)).astype(
                    jnp.uint8)
                sv = lane_buf[spos[0], spos[1], spos[2]]
                start_ok = sv >= opts[1].astype(sv.dtype)
                return mask, start_ok

            cache[bucket] = jax.jit(fn)
        mask, start_ok = cache[bucket](
            seeds, jnp.int32(lane), jnp.asarray(start, jnp.int32),
            jnp.float32(seg_threshold),
            jnp.asarray(start_pos, jnp.int32),
            jnp.asarray(self._opts_host))
        return np.asarray(mask), start, bool(start_ok)

    def lane_mask_regions(self, seeds: jax.Array, lanes, starts_zyx,
                          sizes_zyx, seg_threshold: float,
                          start_positions):
        """Batched lane_mask_region: ONE device call + host transfer per
        distinct (shape bucket, count bucket) instead of one per lane.
        Finalization downloads dominate ingest wall time on object-dense
        rounds (each per-lane call pays a full tunnel round trip); a
        round's finalizers usually share one or two shape buckets, so
        this collapses ~dozens of round trips into a couple.

        Returns a list of (mask uint8, actual_start, start_ok) in input
        order — element i identical to lane_mask_region(lanes[i], ...).
        """
        shape = seeds.shape[1:]
        n = len(lanes)
        groups = {}
        results = [None] * n
        for i in range(n):
            bucket = tuple(min(s, ((int(v) + 63) // 64) * 64)
                           for v, s in zip(sizes_zyx[i], shape))
            start = np.minimum(
                np.maximum(np.asarray(starts_zyx[i], np.int64), 0),
                np.array(shape) - np.array(bucket))
            groups.setdefault(bucket, []).append(
                (i, int(lanes[i]), start,
                 np.asarray(start_positions[i], np.int64)))

        cache = getattr(self, "_mask_regions_fns", None)
        if cache is None:
            cache = self._mask_regions_fns = {}
        for bucket, items in groups.items():
            # Count bucketed to powers of two so only a few batch sizes
            # ever compile; the pad repeats the last entry.
            m = len(items)
            mpad = 1 << (m - 1).bit_length()
            key = (bucket, mpad)
            if key not in cache:
                def fn(seeds, lis, starts, thr, sposs, opts,
                       _bucket=bucket):
                    def one(li, start, spos):
                        lane_buf = jax.lax.dynamic_index_in_dim(
                            seeds, li, axis=0, keepdims=False)
                        region = jax.lax.dynamic_slice(lane_buf, start,
                                                       _bucket)
                        mask = (region >= thr.astype(region.dtype)
                                ).astype(jnp.uint8)
                        sv = lane_buf[spos[0], spos[1], spos[2]]
                        return mask, sv >= opts[1].astype(sv.dtype)

                    return jax.vmap(one)(lis, starts, sposs)

                cache[key] = jax.jit(fn)
            pad = items + [items[-1]] * (mpad - m)
            lis = jnp.asarray([it[1] for it in pad], jnp.int32)
            sts = jnp.asarray(np.stack([it[2] for it in pad]), jnp.int32)
            sps = jnp.asarray(np.stack([it[3] for it in pad]), jnp.int32)
            masks, oks = cache[key](seeds, lis, sts,
                                    jnp.float32(seg_threshold), sps,
                                    jnp.asarray(self._opts_host))
            masks = np.asarray(masks)
            oks = np.asarray(oks)
            for j, (i, _, start, _) in enumerate(items):
                results[i] = (masks[j], start, bool(oks[j]))
        return results

    def set_lane_seed_region(self, seeds: jax.Array, lane: int, start_zyx,
                             region: np.ndarray) -> jax.Array:
        """Uploads a sub-box into one lane's seed buffer (checkpoint
        restore). Bucketed like lane_seed_region; the bucket padding is
        NaN, so this must target a freshly-NaN lane (new_seed_batch)."""
        shape = seeds.shape[1:]
        bucket = tuple(min(s, ((int(v) + 63) // 64) * 64)
                       for v, s in zip(region.shape, shape))
        start = np.minimum(np.maximum(np.asarray(start_zyx, np.int64), 0),
                           np.array(shape) - np.array(bucket))
        padded = np.full(bucket, np.nan, np.float32)
        padded[tuple(slice(0, s) for s in region.shape)] = region

        cache = getattr(self, "_set_region_fns", None)
        if cache is None:
            cache = self._set_region_fns = {}
        if bucket not in cache:
            def fn(seeds, lane, start, padded):
                lane_buf = jax.lax.dynamic_index_in_dim(
                    seeds, lane, axis=0, keepdims=False)
                lane_buf = jax.lax.dynamic_update_slice(
                    lane_buf, padded.astype(seeds.dtype), start)
                return jax.lax.dynamic_update_index_in_dim(
                    seeds, lane_buf, lane, axis=0)

            cache[bucket] = jax.jit(fn, donate_argnums=(0,))
        return cache[bucket](seeds, jnp.int32(lane),
                             jnp.asarray(start, jnp.int32),
                             jnp.asarray(padded))

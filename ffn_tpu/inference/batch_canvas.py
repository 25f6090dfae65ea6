"""Batched multi-seed flood-fill canvas.

Segments B objects ("lanes") concurrently on one subvolume through the
engine's candidate-selecting device program: per step, each lane submits
its K front-of-queue movement candidates; the device drops the ones below
the move threshold (the reference's pop-until-valid, against the same seed
state), runs the FFN update at the first valid one, and returns face-max
scores — so the host round-trip carries only scalars.

This is the TPU-native replacement for the reference's
`concurrent_requests` canvas threads + batching executor
(ffn/inference/executor.py:211-344): instead of N threads filling a batch
through queues, N independent objects advance inside one jitted program.

Semantics parity with Canvas.segment_all/segment_at for each individual
object (movement FIFO order, delta-lattice dedup, logit thresholds,
weak-seed/min-size rejection, origins/overlaps bookkeeping). Deviation by
design: objects whose flood fills overlap *in time* do not see each
other's voxels until one of them is finalized (the reference serializes
objects within a subvolume, so late objects always see earlier ones).
Contested voxels still go to whichever object finalizes first — the same
arbitration rule the reference applies, at lane granularity. Use lanes=1
(or Canvas) for bit-exact reference behaviour.
"""

from __future__ import annotations

import time
from typing import Optional

from absl import logging
import numpy as np
from scipy.special import expit, logit

from ffn_tpu.inference import movement
from ffn_tpu.inference import seed as seed_lib
from ffn_tpu.inference import storage
from ffn_tpu.inference.counters import Counters, TimedIter, timer_counter
from ffn_tpu.proto import inference_pb2

MSEC_IN_SEC = 1000

_IDLE = 0
_RUNNING = 1


class _SeedPool:
    """Array-backed ordered pool of candidate seed positions.

    Keeps the list-of-(z, y, x)-tuples API the checkpoint and canvas code
    uses (append/extend/iter/len/in) while exposing a dense (N, 3) int64
    view (`arr`) for the vectorized draw/validation paths — rebuilding an
    ndarray from a python list of thousands of tuples every round was a
    measured host hotspot at production seed-supply rates.
    """

    __slots__ = ("_buf", "_n")

    def __init__(self, items=None):
        if items is None or (hasattr(items, "__len__")
                             and len(items) == 0):
            self._buf = np.zeros((64, 3), np.int64)
            self._n = 0
        else:
            arr = np.asarray(items, np.int64).reshape(-1, 3)
            self._buf = np.ascontiguousarray(arr)
            self._n = len(arr)

    @property
    def arr(self) -> np.ndarray:
        """Dense (N, 3) int64 view of the pool, in insertion order."""
        return self._buf[:self._n]

    def _grow(self, extra: int):
        need = self._n + extra
        if need > len(self._buf):
            cap = max(need, 2 * len(self._buf))
            buf = np.zeros((cap, 3), np.int64)
            buf[:self._n] = self._buf[:self._n]
            self._buf = buf

    def append(self, pos):
        self._grow(1)
        self._buf[self._n] = pos
        self._n += 1

    def extend(self, items):
        items = np.asarray(list(items), np.int64).reshape(-1, 3)
        self._grow(len(items))
        self._buf[self._n:self._n + len(items)] = items
        self._n += len(items)

    def replace(self, arr):
        """Replaces the contents with the rows of `arr` (no copy kept)."""
        arr = np.asarray(arr, np.int64).reshape(-1, 3)
        self._buf = np.ascontiguousarray(arr)
        self._n = len(arr)

    def __len__(self):
        return self._n

    def __bool__(self):
        return self._n > 0

    def __iter__(self):
        for row in self._buf[:self._n]:
            yield tuple(int(v) for v in row)

    def __contains__(self, pos):
        pos = np.asarray(pos, np.int64)
        return bool(np.any(np.all(self._buf[:self._n] == pos, axis=1)))


class _SpacedAccept:
    """Order-exact greedy spacing filter for one draw phase.

    A candidate conflicts when |cand - p| <= pred on every axis for any
    already-accepted p (the same box metric two seeds assigned in one
    round must clear — consecutive policy seeds cluster). Conflicts
    against the accepts known at construction are ONE vectorized test;
    accepts made during the phase are checked in python and folded back
    into the vectorized base every 32, so per-candidate cost stays flat
    however many candidates the phase scans.
    """

    __slots__ = ("cands", "pred", "base_conf", "new")

    def __init__(self, cands, base, pred):
        self.cands = np.asarray(cands, np.int64).reshape(-1, 3)
        self.pred = tuple(int(v) for v in np.broadcast_to(pred, (3,)))
        self.base_conf = self._conflicts(base)
        self.new = []

    def _conflicts(self, picked) -> np.ndarray:
        picked = np.asarray(picked, np.int64).reshape(-1, 3)
        if not len(picked) or not len(self.cands):
            return np.zeros(len(self.cands), bool)
        pred = np.asarray(self.pred, np.int64)
        return np.any(np.all(
            np.abs(self.cands[:, None, :] - picked[None, :, :]) <= pred,
            axis=2), axis=1)

    def conflicted(self, i: int) -> bool:
        if self.base_conf[i]:
            return True
        if not self.new:
            return False
        cz, cy, cx = (int(v) for v in self.cands[i])
        pz, py, px = self.pred
        for z, y, x in self.new:
            if abs(z - cz) <= pz and abs(y - cy) <= py \
                    and abs(x - cx) <= px:
                return True
        return False

    def accepted(self, pos):
        self.new.append(tuple(int(v) for v in pos))
        if len(self.new) >= 32:
            self.base_conf |= self._conflicts(np.asarray(self.new))
            self.new.clear()


class _Lane:
    __slots__ = ("state", "start_pos", "queue", "done_cells", "min_pos",
                 "max_pos", "num_iters", "t_start", "pending", "spill")

    def __init__(self):
        self.state = _IDLE
        self.start_pos = None
        self.queue = []        # FIFO of (score, (z, y, x))
        self.done_cells = set()
        self.min_pos = None
        self.max_pos = None
        self.num_iters = 0
        self.t_start = 0.0
        self.pending = []      # candidates currently submitted to device
        self.spill = []        # hop path: host-side queue-overflow spill


class BatchCanvas:
    """Segments a subvolume with B concurrent flood-fill lanes."""

    _allocate_seed_batch = True

    def __init__(self, model_info, engine, image, options,
                 lanes: int = 8, candidates_per_step: int = 4,
                 max_iters_per_segment: int = 0,
                 voxel_size_zyx=(1, 1, 1), counters=None, restrictor=None,
                 corner_zyx=None, keep_probability_maps=False,
                 checkpoint_path=None, checkpoint_interval_sec=0):
        self.engine = engine
        self.image = np.ascontiguousarray(image, dtype=np.float32)
        self.voxel_size_zyx = voxel_size_zyx
        self.lanes = lanes
        self.K = candidates_per_step
        # Safety valve for runaway objects (0 = unlimited, the reference
        # semantics): a lane exceeding this many FFN iterations is
        # finalized with whatever it has filled.
        self.max_iters_per_segment = max_iters_per_segment

        self.options = inference_pb2.InferenceOptions()
        self.options.CopyFrom(options)
        for attr in ("init_activation", "pad_value", "move_threshold",
                     "segment_threshold"):
            setattr(self.options, attr,
                    float(logit(getattr(self.options, attr))))

        self.counters = counters if counters is not None else Counters()
        self.corner_zyx = corner_zyx
        self.shape = self.image.shape
        self.restrictor = restrictor if restrictor is not None else \
            movement.MovementRestrictor()

        self._pred_size = np.array(model_info.pred_mask_size[::-1])
        self._input_seed_size = np.array(model_info.input_seed_size[::-1])
        self._input_image_size = np.array(model_info.input_image_size[::-1])
        self.margin = self._input_image_size // 2
        self._deltas_zyx = np.array(model_info.deltas[::-1])

        self.segmentation = np.zeros(self.shape, np.int32)
        self.keep_probability_maps = keep_probability_maps
        self.seg_prob = np.zeros(self.shape, np.uint8) \
            if keep_probability_maps else None

        self._image_dev = self._put_image_dev()
        # Subclasses with their own lane-state layout (HopBatchCanvas)
        # suppress this allocation: a transiently-live duplicate of the
        # multi-GB seed batch is the difference between fitting HBM and
        # OOM at production lane counts.
        self._seeds_dev = engine.new_seed_batch(lanes, self.shape) \
            if self._allocate_seed_batch else None
        self._lanes = [_Lane() for _ in range(lanes)]

        self.origins = {}
        self.overlaps = {}
        # Seeds postponed because an active lane was flooding nearby.
        self._deferred = _SeedPool()
        self._max_id = 0
        self.global_to_local_ids = {}
        self.local_to_global_ids = {}
        self.seed_policy = None
        self._seed_policy_state = None
        self.checkpoint_path = checkpoint_path
        self.checkpoint_interval_sec = checkpoint_interval_sec
        self.checkpoint_last = time.time()

    # Seed policies access canvas.segmentation/restrictor/margin/shape/image.

    def _put_image_dev(self):
        """Uploads the subvolume image; multi-subvolume drivers override
        to place it into a slot of a shared (K, Z, Y, X) stack."""
        return self.engine.put_image(self.image)

    def log_info(self, s, *args):
        logging.info(s, *args)

    def init_segmentation_from_volume(self, volume, corner, end,
                                      align_and_crop=None):
        """Seeds the shared segmentation from an existing volume (same
        semantics as Canvas.init_segmentation_from_volume)."""
        from ffn_tpu.inference import canvas as canvas_lib
        canvas_lib.init_segmentation_common(self, volume, corner, end,
                                            align_and_crop)

    def get_next_segment_id(self) -> int:
        self._max_id += 1
        while self._max_id in self.origins:
            self._max_id += 1
        return self._max_id

    # -- host-side candidate filtering (mirrors Canvas.is_valid_pos minus
    #    the seed-value check, which runs on device) -------------------------

    def _pos_in_bounds(self, pos) -> bool:
        p = np.asarray(pos)
        return bool(np.all(p - self.margin >= 0)
                    and np.all(p + self.margin < self.shape))

    def _host_valid(self, lane: _Lane, pos) -> bool:
        if self._quantize(lane, pos) in lane.done_cells:
            return False
        if not self._pos_in_bounds(pos):
            self.counters["skip_invalid_pos"].Increment()
            return False
        if self.segmentation[tuple(pos)] > 0:
            self.counters["skip_invalid_pos"].Increment()
            return False
        if not self.restrictor.is_valid_pos(tuple(pos)):
            self.counters["skip_restriced_pos"].Increment()
            return False
        return True

    def _quantize(self, lane: _Lane, pos):
        rel = np.asarray(pos) - lane.start_pos
        d = self._deltas_zyx
        return tuple((rel + d // 2) // np.maximum(d, 1))

    def _active_lane_boxes(self):
        """(N, 2, 3) array of [lo, hi] claim bboxes of running lanes."""
        boxes = []
        for lane in self._lanes:
            if lane.state != _RUNNING:
                continue
            boxes.append((lane.min_pos - self._pred_size // 2,
                          lane.max_pos + self._pred_size // 2))
        if not boxes:
            return np.zeros((0, 2, 3), np.int64)
        return np.array(boxes)

    def _near_active(self, positions, boxes) -> np.ndarray:
        """(N,) bool: positions inside any running lane's claim bbox.
        Seeding there would duplicate that lane's flood fill; such seeds
        are deferred until the lane finalizes."""
        if not len(boxes) or not len(positions):
            return np.zeros(len(positions), bool)
        p = np.asarray(positions)[:, None, :]          # (N, 1, 3)
        lo = boxes[None, :, 0, :]                      # (1, L, 3)
        hi = boxes[None, :, 1, :]
        return np.any(np.all((p >= lo) & (p <= hi), axis=2), axis=1)

    def _valid_seed_batch(self, positions: np.ndarray) -> np.ndarray:
        """Vectorized _valid_seed_pos over (N, 3) candidates.

        Exactness: the filters are independent across candidates — the
        only side effect, marking a window-rejected candidate's voxel
        -1, never flips a later candidate's verdict (claim checks test
        > 0). Counters and -1 markers match a sequential scan. The
        per-candidate python path was ~1 ms each, a measured hotspot at
        production FIFO rates (tens of thousands of validations per
        250^3 run between the pool revalidation and the draw path).
        """
        positions = np.asarray(positions, np.int64).reshape(-1, 3)
        n = len(positions)
        if n == 0:
            return np.zeros(0, bool)
        ok = np.ones(n, bool)

        in_bounds = (np.all(positions - self.margin >= 0, axis=1)
                     & np.all(positions + self.margin < self.shape,
                              axis=1))
        ok &= in_bounds
        # Claimed check only where in bounds (fancy-index is safe there).
        idx = tuple(positions[ok].T)
        claimed = np.zeros(n, bool)
        claimed[ok] = self.segmentation[idx] > 0
        self.counters["skip_invalid_pos"].IncrementBy(
            int((~in_bounds).sum() + claimed.sum()))
        ok &= ~claimed

        if ok.any() and (self.restrictor.mask is not None
                         or self.restrictor.shift_mask is not None
                         or self.restrictor.seed_mask is not None):
            restricted = np.zeros(n, bool)
            for i in np.flatnonzero(ok):
                p = tuple(positions[i])
                if not (self.restrictor.is_valid_pos(p)
                        and self.restrictor.is_valid_seed(p)):
                    restricted[i] = True
            self.counters["skip_restriced_pos"].IncrementBy(
                int(restricted.sum()))
            ok &= ~restricted

        if ok.any():
            offs = getattr(self, "_mbd_offs", None)
            if offs is None:
                mbd = self.options.min_boundary_dist
                mbd = np.array([mbd.z, mbd.y, mbd.x])
                # One gather over the (2*mbd+1)^3 neighborhood of every
                # surviving candidate (all in bounds up to `margin` >=
                # mbd clipping; clip indices to the volume).
                offs = np.stack(np.meshgrid(
                    *[np.arange(-m, m + 1) for m in mbd],
                    indexing="ij"), axis=-1).reshape(-1, 3)
                self._mbd_offs = offs
            live = np.flatnonzero(ok)
            nb = positions[live][:, None, :] + offs[None, :, :]
            np.clip(nb, 0, np.asarray(self.shape) - 1, out=nb)
            vals = self.segmentation[nb[..., 0], nb[..., 1], nb[..., 2]]
            near = (vals > 0).any(axis=1)
            for i in live[near]:
                self.segmentation[tuple(positions[i])] = -1
            ok[live[near]] = False
        return ok

    def _valid_seed_pos(self, pos) -> bool:
        """Seed-level filters from Canvas.segment_all (:559-581)."""
        if not self._pos_in_bounds(pos):
            self.counters["skip_invalid_pos"].Increment()
            return False
        if self.segmentation[pos] > 0:
            self.counters["skip_invalid_pos"].Increment()
            return False
        if not (self.restrictor.is_valid_pos(pos)
                and self.restrictor.is_valid_seed(pos)):
            self.counters["skip_restriced_pos"].Increment()
            return False
        mbd = self.options.min_boundary_dist
        mbd = np.array([mbd.z, mbd.y, mbd.x])
        low = np.array(pos) - mbd
        high = np.array(pos) + mbd + 1
        sel = tuple(slice(max(int(s), 0), int(e))
                    for s, e in zip(low, high))
        if np.any(self.segmentation[sel] > 0):
            self.segmentation[pos] = -1
            return False
        return True

    # -- checkpointing ---------------------------------------------------------
    # Same role as the serial Canvas cpoints (and the reference's
    # inference.py:728-843): a killed worker resumes the subvolume with
    # every lane's in-flight flood fill intact, not just finalized objects.

    def save_checkpoint(self, path: str):
        self.log_info("Saving batch-canvas checkpoint to %s.", path)
        with timer_counter(self.counters, "save_checkpoint"):
            lanes_state = []
            deferred = list(self._deferred)
            for li, lane in enumerate(self._lanes):
                if lane.state != _RUNNING or lane.num_iters <= 0:
                    # A lane that has not executed an FFN step yet has no
                    # device state worth saving — its seed goes back into
                    # the deferred pool so the resumed run re-seeds it.
                    if lane.state == _RUNNING:
                        deferred.append(tuple(int(v)
                                              for v in lane.start_pos))
                    lanes_state.append(None)
                    continue
                sel_start = np.maximum(
                    lane.min_pos - self._pred_size // 2, 0)
                sel_end = np.minimum(
                    lane.max_pos + self._pred_size // 2 + 1, self.shape)
                region, region_start = self._lane_region(
                    li, sel_start, sel_end - sel_start)
                lanes_state.append({
                    "start_pos": np.asarray(lane.start_pos),
                    "queue": lane.queue,
                    "pending": lane.pending,
                    "done_cells": np.array(sorted(lane.done_cells),
                                           np.int64).reshape(-1, 3),
                    "min_pos": np.asarray(lane.min_pos),
                    "max_pos": np.asarray(lane.max_pos),
                    "num_iters": lane.num_iters,
                    "region": region,
                    "region_start": np.asarray(region_start),
                })
            seed_policy_state = None
            if self.seed_policy is not None:
                seed_policy_state = self.seed_policy.get_state()
            aux = {}
            if self.keep_probability_maps:
                aux["seg_qprob"] = self.seg_prob
            with storage.atomic_file(path) as fd:
                np.savez_compressed(
                    fd,
                    segmentation=self.segmentation,
                    origins=self.origins,
                    overlaps=self.overlaps,
                    deferred=np.array(deferred, np.int64).reshape(-1, 3),
                    lanes=np.asarray(lanes_state, dtype=object),
                    seed_policy_state=np.asarray(seed_policy_state,
                                                 dtype=object),
                    counters=self.counters.dumps_np(),
                    **aux)
        self.log_info("Batch-canvas checkpoint saved.")

    def restore_checkpoint(self, path: str) -> int:
        self.log_info("Restoring batch-canvas checkpoint: %s", path)
        with open(path, "rb") as f:
            data = np.load(f, allow_pickle=True)
            self.segmentation[...] = data["segmentation"]
            if self.keep_probability_maps and "seg_qprob" in data:
                self.seg_prob[...] = data["seg_qprob"]
            self.origins = data["origins"].item()
            self.overlaps = data["overlaps"].item()
            self._deferred = _SeedPool(data["deferred"])
            self._max_id = int(np.max(self.segmentation, initial=0))
            self._seed_policy_state = data["seed_policy_state"]
            self.counters.loads_np(data["counters"])
            for li, saved in enumerate(data["lanes"]):
                if saved is None or li >= self.lanes:
                    continue
                lane = self._lanes[li]
                lane.state = _RUNNING
                lane.start_pos = np.asarray(saved["start_pos"])
                lane.queue = [(float(s), tuple(int(v) for v in p))
                              for s, p in saved["queue"]]
                lane.pending = [(float(s), tuple(int(v) for v in p))
                                for s, p in saved["pending"]]
                lane.done_cells = {tuple(int(v) for v in row)
                                   for row in saved["done_cells"]}
                lane.min_pos = np.asarray(saved["min_pos"])
                lane.max_pos = np.asarray(saved["max_pos"])
                lane.num_iters = int(saved["num_iters"])
                lane.t_start = time.time()
                self._seeds_dev = self.engine.set_lane_seed_region(
                    self._seeds_dev, li, saved["region_start"],
                    saved["region"])
        self.log_info("Batch-canvas checkpoint restored (%d lanes "
                      "in flight).", sum(1 for lane in self._lanes
                                         if lane.state == _RUNNING))
        return 0

    def _maybe_save_checkpoint(self):
        if self.checkpoint_path is None or \
                self.checkpoint_interval_sec <= 0:
            return
        if time.time() - self.checkpoint_last < self.checkpoint_interval_sec:
            return
        self.save_checkpoint(self.checkpoint_path)
        self.checkpoint_last = time.time()

    # -- seed scheduling (shared with HopBatchCanvas) --------------------------

    def _draw_seeds(self, n: int, seed_iter, seeds_exhausted: bool,
                    relax_threshold: Optional[int] = None):
        """Draws up to n fresh, valid seed positions: retries deferred
        seeds whose region is now free, then draws from the policy.
        Returns (positions, seeds_exhausted).

        relax_threshold: when n exceeds it, deferred seeds are
        speculatively flooded even near active lanes (see below); None
        disables relaxation.

        Every phase validates its candidates in ONE vectorized pass and
        resolves seed-vs-seed spacing through _SpacedAccept, preserving
        the sequential accept order exactly (claims only grow, so
        validating a candidate the scan below never reaches drops it no
        later than its eventual sequential validation would). The
        per-candidate python path cost ~1 ms each and dominated the
        seed-supply rate at production lane counts — the supply cap that
        left lanes idle mid-round."""
        available = []
        if n <= 0:
            return available, seeds_exhausted

        boxes = self._active_lane_boxes()
        # Retry seeds deferred earlier (their region was being flooded
        # by another lane at the time): still-near ones stay deferred,
        # free invalid ones drop, free valid spaced ones are accepted.
        if self._deferred:
            deferred = self._deferred.arr
            near = self._near_active(deferred, boxes)
            valid = np.zeros(len(deferred), bool)
            free = np.flatnonzero(~near)
            if len(free):
                valid[free] = self._valid_seed_batch(deferred[free])
            sp = _SpacedAccept(deferred, available, self._pred_size)
            keep = np.ones(len(deferred), bool)
            near_l, valid_l = near.tolist(), valid.tolist()
            for i in range(len(deferred)):
                if len(available) >= n:
                    break
                if near_l[i] or sp.conflicted(i):
                    continue   # stays deferred
                keep[i] = False
                if valid_l[i]:
                    pos = tuple(int(v) for v in deferred[i])
                    available.append(pos)
                    sp.accepted(pos)
            self._deferred.replace(deferred[keep])
        # Fresh draws from the policy, validated in chunks sized to the
        # remaining demand. Each chunk item adds at most one seed to
        # `available`, so the chunk can never overshoot `n` — iterator
        # order is preserved with nothing drawn ahead and discarded.
        while len(available) < n and not seeds_exhausted:
            want = n - len(available)
            if hasattr(seed_iter, "draw_batch"):
                chunk = seed_iter.draw_batch(want)
                seeds_exhausted = len(chunk) < want
            else:
                chunk = []
                while len(chunk) < want:
                    try:
                        chunk.append(tuple(next(seed_iter)))
                    except StopIteration:
                        seeds_exhausted = True
                        break
            if not len(chunk):
                break
            arr = np.asarray(chunk, np.int64).reshape(-1, 3)
            valid = self._valid_seed_batch(arr)
            near = self._near_active(arr, boxes)
            sp = _SpacedAccept(arr, available, self._pred_size)
            near_l, valid_l = near.tolist(), valid.tolist()
            for i in range(len(arr)):
                if not valid_l[i]:
                    continue
                pos = tuple(int(v) for v in arr[i])
                if near_l[i] or sp.conflicted(i):
                    # A running lane (or a seed picked this round) is
                    # already flooding this region; retry once it
                    # finalizes (usually rejected as already-segmented
                    # then — matching serial ordering — but not
                    # dropped).
                    self._deferred.append(pos)
                    continue
                available.append(pos)
                sp.accepted(pos)

        # Relaxed deferral: when most lanes would sit idle, the conv
        # slots they'd occupy are free anyway — better to speculatively
        # flood deferred seeds than run the batch hollow. A speculative
        # lane whose seed point ends up inside another object's claim is
        # rejected at finalization (the serial-ordering outcome), so
        # semantics are unchanged; the only cost is duplicate compute
        # that idle slots donate.
        if len(available) < n and relax_threshold is not None \
                and n > relax_threshold and self._deferred:
            deferred = self._deferred.arr
            valid = self._valid_seed_batch(deferred)
            sp = _SpacedAccept(deferred, available, self._pred_size)
            keep = np.ones(len(deferred), bool)
            valid_l = valid.tolist()
            for i in range(len(deferred)):
                if len(available) >= n:
                    break
                if sp.conflicted(i):
                    continue   # stays deferred
                keep[i] = False
                if valid_l[i]:
                    pos = tuple(int(v) for v in deferred[i])
                    available.append(pos)
                    sp.accepted(pos)
                    self.counters["relaxed-deferral-seeds"].Increment()
            self._deferred.replace(deferred[keep])
        return available, seeds_exhausted

    def _assign_fresh_seeds(self, seed_iter, seeds_exhausted: bool):
        """Picks seeds for idle lanes; returns
        (assignments [(lane_index, pos_zyx)], seeds_exhausted)."""
        idle = [li for li, lane in enumerate(self._lanes)
                if lane.state == _IDLE]
        available, seeds_exhausted = self._draw_seeds(
            len(idle), seed_iter, seeds_exhausted,
            relax_threshold=self.lanes // 2)
        return list(zip(idle, available)), seeds_exhausted

    def _start_lane(self, li: int, pos) -> "_Lane":
        """Initializes the host-side mirror of a fresh lane."""
        lane = self._lanes[li]
        lane.state = _RUNNING
        lane.start_pos = np.array(pos)
        lane.queue = []
        lane.done_cells = set()
        lane.min_pos = np.array(pos)
        lane.max_pos = np.array(pos)
        lane.num_iters = 0
        lane.t_start = time.time()
        lane.pending = []
        lane.spill = []
        self.log_info("lane %d: starting segmentation at %r (zyx)", li,
                      tuple(pos))
        return lane

    # -- main loop -------------------------------------------------------------

    def segment_all(self, seed_policy=seed_lib.PolicyPeaks,
                    partial_segment_iters: int = 0):
        del partial_segment_iters  # lane progress is restored per lane
        self.seed_policy = seed_policy(self)
        if self._seed_policy_state is not None:
            self.seed_policy.set_state(self._seed_policy_state)
            self._seed_policy_state = None
        seed_iter = TimedIter(self.seed_policy, self.counters,
                              "seed-policy")
        seeds_exhausted = False

        B, K = self.lanes, self.K
        start_pos = np.zeros((B, 3), np.int32)
        active = np.zeros(B, bool)
        ignore = np.zeros(B, bool)
        candidates = np.zeros((B, K, 3), np.int32)
        safe_pos = np.array(self.margin, np.int32)  # in-bounds dummy

        with timer_counter(self.counters, "segment_all"):
            while True:
                self._maybe_save_checkpoint()
                # 1. Assign fresh seeds to idle lanes.
                reset_mask = np.zeros(B, bool)
                reset_pos = np.zeros((B, 3), np.int32)
                assignments, seeds_exhausted = self._assign_fresh_seeds(
                    seed_iter, seeds_exhausted)
                for li, pos in assignments:
                    lane = self._start_lane(li, pos)
                    lane.pending = [
                        (self.options.move_threshold * 2, tuple(pos))]
                    reset_mask[li] = True
                    reset_pos[li] = pos

                if reset_mask.any():
                    self._seeds_dev = self.engine.reset_lanes(
                        self._seeds_dev, reset_mask, reset_pos,
                        self.options.init_activation)

                # 2. Build candidate batches.
                for li, lane in enumerate(self._lanes):
                    active[li] = False
                    ignore[li] = False
                    candidates[li] = safe_pos
                    if lane.state != _RUNNING:
                        continue
                    if (self.max_iters_per_segment > 0 and
                            lane.num_iters >= self.max_iters_per_segment):
                        self.counters["iter-cap-hit"].Increment()
                        self._finalize(li, lane)
                        continue
                    # Re-validate held-over candidates: the reference checks
                    # dedup/segmentation at pop time, i.e. after every
                    # executed move, so pending entries must be re-screened
                    # each round (all but the first entry of a fresh lane,
                    # which bypasses filters like the reference's seed).
                    if lane.num_iters > 0:
                        lane.pending = [
                            (s, p) for (s, p) in lane.pending
                            if self._host_valid(lane, p)]
                    # Refill pending from the FIFO with host-valid entries.
                    while len(lane.pending) < K and lane.queue:
                        score, pos = lane.queue.pop(0)
                        if self._host_valid(lane, pos):
                            lane.pending.append((score, pos))
                    if not lane.pending:
                        # Queue exhausted: the object is complete.
                        self._finalize(li, lane)
                        continue
                    active[li] = True
                    ignore[li] = lane.num_iters == 0
                    start_pos[li] = lane.start_pos
                    for k, (_, pos) in enumerate(lane.pending[:K]):
                        candidates[li, k] = pos
                    for k in range(len(lane.pending), K):
                        candidates[li, k] = lane.pending[-1][1]

                if not active.any():
                    if seeds_exhausted:
                        break
                    continue

                # 3. One device step for all lanes.
                with timer_counter(self.counters, "predict"):
                    self._seeds_dev, aux = self.engine.select_step(
                        self._image_dev, self._seeds_dev, candidates,
                        start_pos, active, ignore)

                # 4. Integrate results.
                for li, lane in enumerate(self._lanes):
                    if not active[li]:
                        continue
                    if not aux["start_ok"][li]:
                        self.counters["seed_got_too_weak"].Increment()
                        self._finalize(li, lane, weak=True)
                        continue
                    chosen = int(aux["chosen"][li])
                    n_pending = min(len(lane.pending), K)
                    if chosen < 0 or chosen >= n_pending:
                        # All submitted candidates were below threshold.
                        self.counters["skip_threshold"].IncrementBy(
                            n_pending)
                        del lane.pending[:n_pending]
                        if not lane.pending and not lane.queue:
                            self._finalize(li, lane)
                        continue
                    # Candidates before the chosen one failed the threshold.
                    self.counters["skip_threshold"].IncrementBy(chosen)
                    pos = tuple(int(v) for v in aux["pos"][li])
                    del lane.pending[:chosen + 1]
                    lane.done_cells.add(self._quantize(lane, pos))
                    lane.min_pos = np.minimum(lane.min_pos, pos)
                    lane.max_pos = np.maximum(lane.max_pos, pos)
                    lane.num_iters += 1
                    self.counters["fov-moves"].Increment()

                    # Queue face-max moves (desc score, as the reference
                    # sorts them; identical (score, offset) pairs dedup).
                    scored = []
                    seen = set()
                    for f in range(6):
                        score = float(aux["scores"][li, f])
                        if score < self.options.move_threshold:
                            continue
                        rel = tuple(int(v)
                                    for v in aux["offsets"][li, f])
                        item = (score, rel)
                        if item in seen:
                            continue
                        seen.add(item)
                        scored.append(item)
                    scored.sort(reverse=True)
                    for score, rel in scored:
                        new_pos = tuple(int(rel[i] + pos[i])
                                        for i in range(3))
                        lane.queue.append((score, new_pos))

        self.log_info("Segmentation done.")

    def _lane_region(self, li: int, sel_start, size_zyx):
        """Downloads a sub-box of one lane's POM buffer."""
        return self.engine.lane_seed_region(self._seeds_dev, li, sel_start,
                                            size_zyx)

    def _lane_mask_region(self, li: int, sel_start, size_zyx, start_pos):
        """Thresholded finalization download (uint8 mask + weak-seed
        verdict); see engine.lane_mask_region."""
        return self.engine.lane_mask_region(
            self._seeds_dev, li, sel_start, size_zyx,
            self.options.segment_threshold, start_pos)

    def _post_segment(self, sid: int, sel, mask) -> None:
        """Hook called after a new segment id is written (HopBatchCanvas
        mirrors the claim into the device blocked volume)."""

    def _finalize(self, li: int, lane: _Lane, weak: bool = False,
                  too_small: bool = False):
        """Thresholds a finished lane's POM into the shared segmentation.

        weak=True marks a lane the device already rejected (origin seed
        below the move threshold); too_small=True one whose device-side
        thresholded voxel count (engine.lane_verdicts) is below
        min_segment_size. Both rejections are recorded without
        downloading the POM region — those downloads otherwise dominate
        wall time on runs with many noise seeds (the verdict count is an
        upper bound on the post-masking count, so the outcome matches
        the full path exactly)."""
        lane.state = _IDLE
        t_seg = time.time() - lane.t_start
        num_iters = lane.num_iters
        pos = tuple(int(v) for v in lane.start_pos)
        if num_iters <= 0:
            self.counters["invalid-other-time-ms"].IncrementBy(
                t_seg * MSEC_IN_SEC)
            return

        if weak:
            if self.segmentation[pos] == 0:
                self.segmentation[pos] = -1
            self.log_info("lane %d: failed, weak seed", li)
            self.counters["invalid-weak-time-ms"].IncrementBy(
                t_seg * MSEC_IN_SEC)
            return

        if self.segmentation[pos] > 0:
            # Another lane finalized an object covering this lane's seed
            # point: under serial ordering this seed would never have
            # started. Dropping the lane (instead of carving a residual
            # segment out of the overlap) keeps batched results
            # consistent with the serial canvas.
            self.log_info("lane %d: seed claimed by segment %d, dropped",
                          li, int(self.segmentation[pos]))
            self.counters["seed-claimed-drops"].Increment()
            self.counters["invalid-other-time-ms"].IncrementBy(
                t_seg * MSEC_IN_SEC)
            return

        if too_small:
            if self.segmentation[pos] == 0:
                self.segmentation[pos] = -1
            self.log_info("lane %d: failed, too small (device count)",
                          li)
            self.counters["invalid-small-time-ms"].IncrementBy(
                t_seg * MSEC_IN_SEC)
            return

        # Download only the visited bounding box (bucketed shapes) — a full
        # lane is ~64 MB over the tunnel, the bbox of a typical object is a
        # small fraction of that. (A bbox-based min-size pre-gate is NOT
        # useful here: the bbox includes the ±pred_size/2 write margins,
        # ≥33³ voxels for the flagship model — always above realistic
        # min_segment_size values.) Without probability maps, only the
        # thresholded uint8 mask crosses the tunnel (4x less traffic than
        # the f32 logits — finalization transfers dominate wall time on
        # object-dense volumes).
        sel_start = np.maximum(lane.min_pos - self._pred_size // 2, 0)
        sel_end = np.minimum(lane.max_pos + self._pred_size // 2 + 1,
                             self.shape)
        region = None
        with timer_counter(self.counters, "finalize"):
            if self.keep_probability_maps:
                region, region_start = self._lane_region(
                    li, sel_start, sel_end - sel_start)
                seed_at_start = region[tuple(
                    int(p - r) for p, r in zip(pos, region_start))]
                start_ok = bool(seed_at_start >=
                                self.options.move_threshold)
                with np.errstate(invalid="ignore"):
                    mask_buf = region >= self.options.segment_threshold
            else:
                mask_buf, region_start, start_ok = self._lane_mask_region(
                    li, sel_start, sel_end - sel_start, pos)
                mask_buf = mask_buf > 0

        def region_view(buf, global_sel_start, global_sel_end):
            return buf[tuple(
                slice(int(s - r), int(e - r))
                for s, e, r in zip(global_sel_start, global_sel_end,
                                   region_start))]

        # Weak original seed?
        if not start_ok:
            if self.segmentation[pos] == 0:
                self.segmentation[pos] = -1
            self.log_info("lane %d: failed, weak seed", li)
            self.counters["invalid-weak-time-ms"].IncrementBy(
                t_seg * MSEC_IN_SEC)
            return

        sel = tuple(slice(int(s), int(e))
                    for s, e in zip(sel_start, sel_end))
        mask = region_view(mask_buf, sel_start, sel_end)
        raw_segmented_voxels = int(np.sum(mask))

        overlapped_ids, counts = np.unique(self.segmentation[sel][mask],
                                           return_counts=True)
        valid = overlapped_ids > 0
        overlapped_ids = overlapped_ids[valid]
        counts = counts[valid]

        mask &= self.segmentation[sel] <= 0
        actual = int(np.sum(mask))
        if actual < self.options.min_segment_size:
            if self.segmentation[pos] == 0:
                self.segmentation[pos] = -1
            self.log_info("lane %d: failed, too small: %d", li, actual)
            self.counters["invalid-small-time-ms"].IncrementBy(
                t_seg * MSEC_IN_SEC)
            return

        self.counters["voxels-segmented"].IncrementBy(actual)
        self.counters["voxels-overlapping"].IncrementBy(
            raw_segmented_voxels - actual)

        sid = self.get_next_segment_id()
        self.segmentation[sel][mask] = sid
        if self.keep_probability_maps:
            self.seg_prob[sel][mask] = storage.quantize_probability(
                expit(region_view(region, sel_start, sel_end)[mask]))
        self.overlaps[sid] = np.array([overlapped_ids, counts])
        self.origins[sid] = storage.OriginInfo(pos, num_iters, t_seg)
        self._post_segment(sid, sel, mask)
        self.counters["valid-time-ms"].IncrementBy(t_seg * MSEC_IN_SEC)
        self.log_info("lane %d: created supervoxel:%d seed(zyx):%s size:%d "
                      "iters:%d", li, sid, pos, actual, num_iters)

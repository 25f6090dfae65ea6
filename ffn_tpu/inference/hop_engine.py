"""Device-resident movement policy: multi-hop flood fill.

The round-based engine (engine.FloodFillEngine.select_step) still pays one
host round trip per FOV move: the host owns the movement FIFO, the dedup
set, and the validity checks, so the device can only execute one move per
upload/download. On a tunneled or remote accelerator that round trip —
not the conv stack — bounds sustained throughput.

This module moves the *entire* movement policy into device memory:

  - per-lane FIFO queue of scored candidate positions (fixed-capacity
    ring buffer),
  - per-lane visited-cell dedup grid (the delta-quantized `done_cells`
    set of movement.FaceMaxMovementPolicy as a dense bitmap),
  - shared `claimed` volume (segmentation > 0, updated by the host after
    each finalization) and optional restrictor mask volume,
  - weak-seed and iteration-cap checks.

One jitted program (`run_hops`) then executes H pop->FFN->score->push
hops per invocation; the host sees only a small per-lane status array
per round, plus the finalization region downloads it already performed.
Pop-time semantics (validity checks evaluated when a candidate is
popped, not when it is pushed) match batch_canvas/the reference's
Canvas.segment_at loop (ref inference.py:460-533, movement.py:166-222),
so lanes=1 reproduces the serial canvas exactly.

Checks evaluated on device per pop, mirroring BatchCanvas._host_valid +
the seed-value threshold (ref inference.py:312-346):
  bounds (image margin), claimed (segmentation > 0), restrictor
  (mask/shift-mask, precomputed densely — see
  MovementRestrictor.dense_invalid_mask), visited-cell dedup, seed
  logit >= move_threshold. Claimed and restricted are separate bits of
  the `blocked` volume so skip counters attribute exactly.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ffn_tpu.inference.engine import FloodFillEngine

# Lane status codes (device <-> host contract).
IDLE = 0
RUNNING = 1
DONE_EMPTY = 2   # movement queue exhausted -> object complete
DONE_WEAK = 3    # origin seed fell below the move threshold
DONE_CAP = 4     # hit max_iters_per_segment
STALLED_FULL = 5  # queue too full to accept a move's pushes; host drains
DONE_FINALIZED = 6  # device-finalize mode: object finalized in kernel,
                    # seed FIFO was empty -> lane idles until refilled

# Device-finalize outcome codes (log rows; see FinalizeState.log).
FIN_SEGMENTED = 1
FIN_WEAK = 2        # origin below move threshold at finalize
FIN_TOO_SMALL = 3   # post-masking voxel count < min_segment_size
FIN_CLAIMED = 4     # another object claimed the seed position first
FIN_INVALID = 5     # zero executed moves (never a real flood)

# Bit codes of the `blocked` volume (uint8). Separate bits keep the
# reference's skip-counter attribution (skip_invalid vs
# skip_restriced_pos) exact on device.
BLOCKED_CLAIMED = 1     # segmentation > 0 (or init-segmentation load)
BLOCKED_RESTRICTED = 2  # movement restrictor (mask and/or shift mask)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LaneState:
    """Device-resident per-lane flood-fill state (a pytree of arrays).

    Positions are in the coordinate frame of the lane's own subvolume:
    `sv` binds each lane to a slot of the (K, Z, Y, X) image/blocked
    stacks passed to run_hops, so one engine batch advances objects
    from several subvolumes at once (single-subvolume callers pass 3-D
    volumes and leave sv at 0)."""
    seeds: jax.Array        # (B, Z, Y, X) f32 POM logits, NaN = unvisited
    sv: jax.Array           # (B,) int32 subvolume slot of each lane
    qpos: jax.Array         # (B, Q, 3) int32 candidate positions (zyx)
    qscore: jax.Array       # (B, Q) f32 candidate scores
    head: jax.Array         # (B,) int32 ring-buffer read cursor
    tail: jax.Array         # (B,) int32 ring-buffer write cursor
    done: jax.Array         # (B, G, G, G) uint8 visited-cell dedup grid
    start: jax.Array        # (B, 3) int32 segment origin
    minp: jax.Array         # (B, 3) int32 visited bbox low
    maxp: jax.Array         # (B, 3) int32 visited bbox high
    iters: jax.Array        # (B,) int32 executed FFN moves
    status: jax.Array       # (B,) int32 lane status code
    fresh: jax.Array        # (B,) bool: next pop bypasses all checks
    overflow: jax.Array     # (B,) int32 dropped pushes (ring full)
    skip_threshold: jax.Array   # (B,) int32 pops discarded: weak seed value
    skip_invalid: jax.Array     # (B,) int32 pops discarded: bounds/claimed
    skip_restricted: jax.Array  # (B,) int32 pops discarded: restrictor


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FinalizeState:
    """Device-resident finalization state (device-finalize mode).

    With it, `run_hops` finalizes finished objects IN KERNEL — claims
    are written to the on-device segmentation immediately (zero-round
    staleness, so duplicate floods die as soon as the first finisher
    claims), and the freed lane reseeds itself from a screened-seed
    FIFO without waiting for the round boundary. The host sees one
    small log download per round instead of per-object region
    downloads; the segmentation crosses the link once, at subvolume
    save. Replaces the reference's host-side Canvas.segment_at
    bookkeeping (ref inference.py:460-570) with a device contract.
    """
    seg: jax.Array       # (K, Z, Y, X) int32 segmentation (claims)
    next_sid: jax.Array  # (K,) int32 next segment id per slot
    fifo_pos: jax.Array  # (S, 3) int32 screened seeds (round-transient)
    fifo_sv: jax.Array   # (S,) int32 slot of each FIFO seed
    fifo_n: jax.Array    # () int32 valid entries this round
    fifo_head: jax.Array  # () int32 consumed entries
    log: jax.Array       # (L, 10) int32 per-finalization rows:
    #   [sv, sid(0 if not segmented), z, y, x, iters, voxels, lane
    #    status, outcome code, lane index]
    log_n: jax.Array     # () int32 rows written this round
    hold: jax.Array      # (B,) bool: host holds spilled queue entries
    #   for this lane; the kernel must NOT finalize it on DONE_EMPTY
    claimed: jax.Array   # (K,) int32 FIFO seeds skipped at pop this
    #   round (claimed between host screening and the kernel's
    #   zero-staleness recheck) — the device analog of the host path's
    #   _valid_seed_pos skip counting at assignment time


class HopEngine(FloodFillEngine):
    """FloodFillEngine plus the device-resident movement programs."""

    def __init__(self, model, params, *, pad_value: float,
                 move_threshold: float, disco_seed_threshold: float,
                 queue_capacity: int = 32768, **kwargs):
        super().__init__(model, params, pad_value=pad_value,
                         move_threshold=move_threshold,
                         disco_seed_threshold=disco_seed_threshold,
                         **kwargs)
        self.queue_capacity = int(queue_capacity)
        self._run_hops_cache = {}
        # Conv compaction (batch the model over executing lanes only)
        # is a pure win on FLOPs but on TPU/bf16 it is NOT bit-exact
        # with the uncompacted kernel: conv batch size shifts bf16
        # per-sample numerics slightly, which can flip a handful of
        # face-max move choices (measured: 108,054 vs 107,946 FOV calls
        # on the 250^3 fused e2e; agreement identical to 4 decimals).
        # FFN_TPU_COMPACT=0 disables it for bit-exact replication runs
        # (doc/parity_map.md "deviations"). CPU/f32 is bit-exact either
        # way (parity tests cover both).
        self.conv_compact = os.environ.get(
            "FFN_TPU_COMPACT", "1") != "0"

    # -- state setup ---------------------------------------------------------

    def grid_geometry(self, shape_zyx):
        """Dedup-grid size/offset for a volume shape: cells are
        floor((pos - start + delta//2) / delta) + offset, always in
        [0, G)."""
        deltas = np.maximum(np.array(self.info.deltas[::-1]), 1)
        span = np.ceil(np.array(shape_zyx) / deltas).astype(int)
        grid = 2 * span + 3
        offset = span + 1
        return tuple(int(g) for g in grid), tuple(int(o) for o in offset)

    def init_lane_state(self, lanes: int, shape_zyx) -> LaneState:
        grid, _ = self.grid_geometry(shape_zyx)
        B, Q = lanes, self.queue_capacity
        z = lambda *s: jnp.zeros(s, jnp.int32)
        return LaneState(
            seeds=jnp.full((B,) + tuple(shape_zyx), jnp.nan,
                           self.seed_dtype),
            sv=z(B),
            qpos=jnp.zeros((B, Q, 3), jnp.int32),
            qscore=jnp.zeros((B, Q), jnp.float32),
            head=z(B), tail=z(B),
            done=jnp.zeros((B,) + grid, jnp.uint8),
            start=z(B, 3), minp=z(B, 3), maxp=z(B, 3),
            iters=z(B),
            status=jnp.zeros((B,), jnp.int32),
            fresh=jnp.zeros((B,), bool),
            overflow=z(B), skip_threshold=z(B), skip_invalid=z(B),
            skip_restricted=z(B))

    def init_finalize_state(self, K: int, lanes: int, shape_zyx,
                            fifo_capacity: int = 0) -> FinalizeState:
        """Allocates device-finalize state for K subvolume slots.

        The log is sized so it can never overflow within one round:
        every kernel finalization consumes a lane that was RUNNING, and
        lanes only (re)enter RUNNING via host reseed (<= B per round)
        or kernel reseed (each consumes >= 1 FIFO entry, <= S per
        round)."""
        S = int(fifo_capacity) or max(2 * lanes, 256)
        L = S + lanes + 4
        if K > 17:
            # The packed-round header row carries [log_n, fifo_head,
            # claimed[0..K)] in the aux array's 19 columns.
            raise ValueError(f"device-finalize supports <= 17 slots "
                             f"(got {K})")
        z = lambda *s: jnp.zeros(s, jnp.int32)
        return FinalizeState(
            seg=jnp.zeros((K,) + tuple(shape_zyx), jnp.int32),
            next_sid=jnp.ones((K,), jnp.int32),
            fifo_pos=z(S, 3), fifo_sv=z(S),
            fifo_n=jnp.int32(0), fifo_head=jnp.int32(0),
            log=z(L, 10), log_n=jnp.int32(0),
            hold=jnp.zeros((lanes,), bool),
            claimed=z(K))

    def round_prep(self, fstate: FinalizeState, pos: np.ndarray,
                   sv: np.ndarray, hold: np.ndarray) -> FinalizeState:
        """Loads this round's screened-seed FIFO, resets the log, and
        sets the per-lane hold flags (one jitted donated call)."""
        S = fstate.fifo_pos.shape[0]
        n = len(pos)
        if n > S:
            raise ValueError(f"fifo overflow: {n} > {S}")
        pos_p = np.zeros((S, 3), np.int32)
        sv_p = np.zeros((S,), np.int32)
        pos_p[:n] = pos
        sv_p[:n] = sv
        if not hasattr(self, "_round_prep_fn"):
            def fn(fstate, pos, sv, n, hold):
                return dataclasses.replace(
                    fstate, fifo_pos=pos, fifo_sv=sv, fifo_n=n,
                    fifo_head=jnp.int32(0), log_n=jnp.int32(0),
                    hold=hold,
                    claimed=jnp.zeros_like(fstate.claimed))

            self._round_prep_fn = jax.jit(fn, donate_argnums=(0,))
        return self._round_prep_fn(
            fstate, jnp.asarray(pos_p), jnp.asarray(sv_p),
            jnp.int32(n), jnp.asarray(hold, bool))

    def drain_log(self, fstate: FinalizeState):
        """Downloads this round's finalization rows (host bookkeeping),
        the FIFO consumption cursor, and the per-slot count of FIFO
        seeds the kernel skipped as already-claimed. Returns
        (rows (N, 10) int64, fifo_head int, claimed (K,) int64)."""
        n = int(np.asarray(fstate.log_n))
        head = int(np.asarray(fstate.fifo_head))
        claimed = np.asarray(fstate.claimed).astype(np.int64)
        if n == 0:
            return np.zeros((0, 10), np.int64), head, claimed
        return (np.asarray(fstate.log)[:n].astype(np.int64), head,
                claimed)

    def reset_slot_seg(self, fstate: FinalizeState, slot: int,
                       next_sid: int = 1) -> FinalizeState:
        """Clears one slot's device segmentation and id counter (slot
        reload). next_sid sets the first id the kernel will assign —
        drivers pass max(init-segmentation ids) + 1 so device ids never
        collide with preloaded ones."""
        if not hasattr(self, "_reset_seg_fn"):
            def fn(fstate, k, sid0):
                zeros = jnp.zeros(fstate.seg.shape[1:], jnp.int32)
                return dataclasses.replace(
                    fstate,
                    seg=jax.lax.dynamic_update_slice(
                        fstate.seg, zeros[None], (k, 0, 0, 0)),
                    next_sid=fstate.next_sid.at[k].set(sid0))

            self._reset_seg_fn = jax.jit(fn, donate_argnums=(0,))
        return self._reset_seg_fn(fstate, jnp.int32(slot),
                                  jnp.int32(next_sid))

    def slice_slot_seg(self, fstate: FinalizeState, slot: int,
                       size_zyx) -> jax.Array:
        """Dispatches the cropped slot-segmentation slice WITHOUT
        materializing; callers start its D2H and collect off-thread so
        the save overlaps the next hop rounds."""
        return jax.lax.dynamic_slice(
            fstate.seg, (slot, 0, 0, 0),
            (1,) + tuple(int(v) for v in size_zyx))

    def download_slot_seg(self, fstate: FinalizeState, slot: int,
                          size_zyx) -> np.ndarray:
        """Downloads one slot's segmentation, cropped to its true
        size (ONE transfer per subvolume — replaces the host path's
        per-object region downloads)."""
        return np.asarray(self.slice_slot_seg(fstate, slot, size_zyx))[0]

    def put_blocked(self, blocked: np.ndarray) -> jax.Array:
        """Uploads the claimed/restricted uint8 volume (1 = excluded)."""
        return jnp.asarray(np.ascontiguousarray(blocked, np.uint8))

    def put_stack(self, arrays, shape_zyx, dtype, fill=0.0) -> jax.Array:
        """Uploads a (K, Z, Y, X) stack of subvolumes; entries smaller
        than shape_zyx are padded with `fill` (multi-subvolume drivers
        forbid moves into the padding via run_hops' `shapes`)."""
        K = len(arrays)
        stack = np.full((K,) + tuple(shape_zyx), fill, dtype)
        for k, a in enumerate(arrays):
            if a is None:
                continue
            stack[k][tuple(slice(0, s) for s in a.shape)] = a
        return jnp.asarray(stack)

    def update_stack_slot(self, stack: jax.Array, slot: int,
                          volume, fill=0.0) -> jax.Array:
        """Replaces one slot of a (K, Z, Y, X) stack in place (donated),
        padding the volume to the slot shape. A pre-padded jax.Array of
        the full slot shape is used as-is — drivers prefetch-pad and
        device_put the image off-thread so the H2D transfer rides
        behind hop rounds instead of blocking the slot reload."""
        shape = stack.shape[1:]
        if (isinstance(volume, jax.Array)
                and tuple(volume.shape) == tuple(shape)
                and volume.dtype == stack.dtype):
            padded = volume
        else:
            padded = np.full(shape, fill, np.dtype(stack.dtype))
            padded[tuple(slice(0, s) for s in volume.shape)] = volume
        cache = getattr(self, "_stack_fns", None)
        if cache is None:
            cache = self._stack_fns = {}
        key = (tuple(stack.shape), str(stack.dtype))
        if key not in cache:
            def fn(stack, slot, patch):
                return jax.lax.dynamic_update_slice(
                    stack, patch[None], (slot,) + (0,) * 3)

            cache[key] = jax.jit(fn, donate_argnums=(0,))
        return cache[key](stack, jnp.int32(slot), jnp.asarray(padded))

    def update_blocked_region(self, blocked: jax.Array, start_zyx,
                              region: np.ndarray,
                              slot: int = 0) -> jax.Array:
        """ORs a sub-box into the blocked volume (after a finalization).

        Accepts a (Z, Y, X) volume or a (K, Z, Y, X) stack (`slot`
        selects the subvolume). Bucketed to a small set of shapes like
        lane_seed_region. The bucket start is clamped so the slice stays
        in bounds; the region is embedded at its true offset inside the
        padded bucket (orig_start - clamped_start), so clamping near the
        upper faces never displaces the write."""
        shape = blocked.shape[-3:]
        bucket = tuple(min(s, ((int(v) + 63) // 64) * 64)
                       for v, s in zip(region.shape, shape))
        orig_start = np.asarray(start_zyx, np.int64)
        start = np.minimum(np.maximum(orig_start, 0),
                           np.array(shape) - np.array(bucket))
        off = orig_start - start
        padded = np.zeros(bucket, np.uint8)
        padded[tuple(slice(int(o), int(o) + s)
                     for o, s in zip(off, region.shape))] = region
        if blocked.ndim == 4:
            start = np.concatenate([[int(slot)], start])
            bucket = (1,) + bucket
            padded = padded[None]

        cache = getattr(self, "_blocked_fns", None)
        if cache is None:
            cache = self._blocked_fns = {}
        if bucket not in cache:
            def fn(blocked, start, patch):
                old = jax.lax.dynamic_slice(blocked, start, patch.shape)
                return jax.lax.dynamic_update_slice(
                    blocked, old | patch, start)

            cache[bucket] = jax.jit(fn, donate_argnums=(0,))
        return cache[bucket](blocked, jnp.asarray(start, jnp.int32),
                             jnp.asarray(padded))

    # -- reseed --------------------------------------------------------------

    def reseed_lanes(self, state: LaneState, reset_mask: np.ndarray,
                     pos: np.ndarray, init_activation: float,
                     sv: Optional[np.ndarray] = None) -> LaneState:
        """Resets the selected lanes to a fresh segment at pos: clears the
        seed buffer and dedup grid, plants the initial activation, and
        queues the origin as the (unconditionally accepted) first move.
        sv rebinds reset lanes to a subvolume slot (multi-subvolume
        drivers); None keeps each lane's current binding."""
        if sv is None:
            # Host copy: state is donated, so aliasing state.sv as a
            # second argument would reuse a donated buffer.
            sv = np.asarray(state.sv)
        return self._reseed(state, jnp.asarray(reset_mask, bool),
                            jnp.asarray(pos, jnp.int32),
                            jnp.float32(init_activation),
                            jnp.asarray(self._opts_host),
                            jnp.asarray(sv, jnp.int32))

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def _reseed(self, state: LaneState, reset, pos, init_activation, opts,
                sv):
        def one_seed(seed, r, p):
            # Scalar-broadcast blank (NOT a full-size cleared buffer +
            # where: that materializes a seed-sized NaN intermediate,
            # which at production lane counts doubles the dominant HBM
            # allocation and OOMs).
            seed = jnp.where(r, jnp.asarray(jnp.nan, seed.dtype), seed)
            val = jnp.where(r, jnp.asarray(init_activation, seed.dtype),
                            seed[p[0], p[1], p[2]])
            return seed.at[p[0], p[1], p[2]].set(val)

        def one_done(done, r):
            return jnp.where(r, jnp.asarray(0, done.dtype), done)

        seeds = jax.vmap(one_seed)(state.seeds, reset, pos)
        done = jax.vmap(one_done)(state.done, reset)
        qpos = state.qpos.at[:, 0, :].set(
            jnp.where(reset[:, None], pos, state.qpos[:, 0, :]))
        big = 2.0 * jnp.abs(opts[1]) + 1.0   # definitely above threshold
        qscore = state.qscore.at[:, 0].set(
            jnp.where(reset, big, state.qscore[:, 0]))
        sel = lambda a, b: jnp.where(reset, a, b)
        sel3 = lambda a, b: jnp.where(reset[:, None], a, b)
        zeros = jnp.zeros_like(state.head)
        return LaneState(
            seeds=seeds, sv=sel(sv, state.sv), qpos=qpos, qscore=qscore,
            head=sel(zeros, state.head), tail=sel(zeros + 1, state.tail),
            done=done, start=sel3(pos, state.start),
            minp=sel3(pos, state.minp), maxp=sel3(pos, state.maxp),
            iters=sel(zeros, state.iters),
            status=sel(zeros + RUNNING, state.status),
            fresh=jnp.where(reset, True, state.fresh),
            overflow=sel(zeros, state.overflow),
            skip_threshold=sel(zeros, state.skip_threshold),
            skip_invalid=sel(zeros, state.skip_invalid),
            skip_restricted=sel(zeros, state.skip_restricted))

    # -- the hop program -----------------------------------------------------

    def run_hops(self, image: jax.Array, blocked: jax.Array,
                 state: LaneState, hops: int, max_iters: int = 0,
                 shapes: Optional[np.ndarray] = None, sync: bool = True,
                 fstate: Optional[FinalizeState] = None,
                 fin_opts: Optional[np.ndarray] = None):
        """Executes up to `hops` FFN moves per running lane on device.

        image/blocked are (Z, Y, X) volumes or (K, Z, Y, X) stacks of K
        subvolumes (lanes bind to slots via state.sv). `shapes` gives
        each slot's ACTUAL (z, y, x) extent for the bounds check — edge
        subvolumes smaller than the stack shape are padded, and moves
        must never enter the padding; defaults to the full stack shape.

        With `fstate` (device-finalize mode), finished lanes are
        finalized in kernel (claims written to fstate.seg immediately)
        and reseeded from fstate's screened-seed FIFO mid-round;
        `fin_opts` must be float32 [segment_threshold, min_segment_size,
        init_activation]. Returns (state, fstate, aux) in that mode,
        (state, aux) otherwise.

        aux is a dict of small host arrays: status, iters, minp, maxp,
        queue_len, overflow, the three skip counters, executed, pops,
        and (stacks only) sv.
        """
        if shapes is None:
            K = image.shape[0] if image.ndim == 4 else 1
            shapes = np.tile(np.array(state.seeds.shape[1:], np.int32),
                             (K, 1))
        fin = fstate is not None
        key = (hops, int(max_iters), fin)
        if key not in self._run_hops_cache:
            self._run_hops_cache[key] = jax.jit(
                functools.partial(self._run_hops_impl, hops=hops,
                                  max_iters=int(max_iters),
                                  device_finalize=fin),
                donate_argnums=(2, 5) if fin else (2,))
        if fin:
            if fin_opts is None:
                raise ValueError("device-finalize mode needs fin_opts")
            state, fstate, packed = self._run_hops_cache[key](
                image, blocked, state, jnp.asarray(self._opts_host),
                jnp.asarray(shapes, jnp.int32), fstate,
                jnp.asarray(fin_opts, jnp.float32))
            if not sync:
                return state, fstate, packed
            B = state.status.shape[0]
            return state, fstate, self.unpack_aux(
                np.asarray(packed)[:B])
        state, packed = self._run_hops_cache[key](
            image, blocked, state, jnp.asarray(self._opts_host),
            jnp.asarray(shapes, jnp.int32))
        if not sync:
            # Async round pipelining: the caller materializes later via
            # unpack_aux (the device keeps executing; the host can
            # dispatch more work — e.g. seed screening — meanwhile).
            return state, packed
        return state, self.unpack_aux(packed)

    @staticmethod
    def unpack_aux(packed) -> dict:
        """Materializes run_hops' packed per-lane aux into host arrays
        (blocks until the device round has finished)."""
        # int32 end to end: casting cumulative counters through f32 would
        # lose exactness above 2^24 on long unlimited-iteration lanes.
        packed = np.asarray(packed)
        aux = {
            "status": packed[:, 0],
            "iters": packed[:, 1],
            "minp": packed[:, 2:5].astype(np.int64),
            "maxp": packed[:, 5:8].astype(np.int64),
            "queue_len": packed[:, 8],
            "overflow": packed[:, 9],
            "skip_threshold": packed[:, 10].astype(np.int64),
            "skip_invalid": packed[:, 11].astype(np.int64),
            "skip_restricted": packed[:, 12].astype(np.int64),
            "executed": packed[:, 13].astype(np.int64),
            "pops": packed[:, 14].astype(np.int64),
        }
        if packed.shape[1] > 15:
            aux["sv"] = packed[:, 15]
        if packed.shape[1] > 16:
            # Current segment origin per lane — with in-kernel reseed
            # the host can no longer derive it from its own bookkeeping.
            aux["start"] = packed[:, 16:19].astype(np.int64)
        return aux

    @staticmethod
    def unpack_round(packed, lanes: int, slots: int):
        """Materializes a device-finalize round's SINGLE packed output
        into (aux, log rows, fifo_head, claimed). Layout (all int32):
        rows [0, lanes) per-lane aux, row `lanes` the header
        [log_n, fifo_head, claimed[0..slots)], then the (padded)
        finalization log. One D2H transfer replaces the five separate
        materializations of unpack_aux + drain_log — on the tunneled
        runtime each materialization is a network round trip."""
        packed = np.asarray(packed)
        aux = HopEngine.unpack_aux(packed[:lanes])
        header = packed[lanes]
        log_n, fifo_head = int(header[0]), int(header[1])
        claimed = header[2:2 + slots].astype(np.int64)
        rows = packed[lanes + 1:lanes + 1 + log_n, :10].astype(np.int64)
        return aux, rows, fifo_head, claimed

    def _run_hops_impl(self, image, blocked, state: LaneState, opts,
                       shapes, fstate=None, fin_opts=None, *, hops,
                       max_iters, device_finalize=False):
        if image.ndim == 3:   # single-subvolume callers pass 3-D volumes
            image = image[None]
            blocked = blocked[None]
        Q = self.queue_capacity
        move_t = opts[1]
        pad_shape = jnp.array(state.seeds.shape[1:], jnp.int32)
        margin = jnp.array([s // 2 for s in self._image_size], jnp.int32)
        deltas = jnp.maximum(
            jnp.array(self.info.deltas[::-1], jnp.int32), 1)
        _, grid_off = self.grid_geometry(state.seeds.shape[1:])
        grid_off = jnp.array(grid_off, jnp.int32)

        def cell_of(pos, start):
            return (pos - start + deltas // 2) // deltas + grid_off

        def pop_one(seg, seed, sv, shape, qpos, qscore, head, tail, done,
                    start, fresh, running, skip_t, skip_i, skip_r):
            """Advances head until a valid candidate; returns
            (found, pos, head, counters...). No-op for non-running
            lanes (their queue state must stay intact for
            checkpointing, and dead lanes must not burn counters)."""

            def checks(pos):
                in_bounds = (jnp.all(pos - margin >= 0)
                             & jnp.all(pos + margin < shape))
                safe = jnp.clip(pos, 0, pad_shape - 1)
                code = blocked[sv, safe[0], safe[1], safe[2]]
                is_blocked = (code & BLOCKED_CLAIMED) > 0
                if seg is not None:   # device-finalize claims
                    is_blocked |= seg[sv, safe[0], safe[1], safe[2]] > 0
                is_restricted = (code & BLOCKED_RESTRICTED) > 0
                c = cell_of(pos, start)
                is_done = done[c[0], c[1], c[2]] > 0
                seed_val = seed[safe[0], safe[1], safe[2]]
                weak = ~(seed_val >= move_t)   # NaN counts as weak
                return in_bounds, is_blocked, is_restricted, is_done, weak

            def cond(carry):
                head, found = carry[0], carry[1]
                return running & (head < tail) & ~found

            # Windowed drain: each iteration examines the next W queue
            # entries at once (vectorized gathers) and jumps head past
            # the leading invalid run. Semantically identical to the
            # one-entry-per-iteration pop (same first-valid winner, same
            # counter attribution), but the vmapped while_loop's depth —
            # which every lane pays, set by the WORST lane's stale run
            # (observed up to ~800 pops in one lane-round) — drops by W.
            W = 16

            def body(carry):
                head, found, pos, st, si, sr = carry
                idx = head + jnp.arange(W, dtype=head.dtype)
                in_q = idx < tail
                cand = qpos[idx % Q]
                (in_bounds, is_blocked, is_restricted, is_done,
                 weak) = jax.vmap(checks)(cand)
                ok = (fresh | (in_bounds & ~is_blocked & ~is_restricted
                               & ~is_done & ~weak)) & in_q
                any_ok = jnp.any(ok)
                first = jnp.argmax(ok)
                n_bad = jnp.where(any_ok, first,
                                  jnp.sum(in_q.astype(jnp.int32)))
                consumed = (jnp.arange(W) < n_bad) & in_q
                # Counter attribution mirrors BatchCanvas._host_valid:
                # dedup discards are uncounted; bounds/claimed ->
                # skip_invalid; restrictor -> skip_restricted;
                # below-threshold -> skip_threshold.
                bad_pos = ~in_bounds | is_blocked
                counted = consumed & ~is_done
                st = st + jnp.sum(jnp.int32(counted & ~bad_pos
                                            & ~is_restricted & weak))
                si = si + jnp.sum(jnp.int32(counted & bad_pos))
                sr = sr + jnp.sum(jnp.int32(counted & ~bad_pos
                                            & is_restricted))
                return (head + n_bad, any_ok,
                        jnp.where(any_ok, cand[first], pos), st, si, sr)

            init = (head, jnp.bool_(False), start, skip_t, skip_i, skip_r)
            head0 = head
            head, found, pos, skip_t, skip_i, skip_r = jax.lax.while_loop(
                cond, body, init)
            pops = head - head0 + jnp.int32(found)
            head = head + jnp.int32(found)   # consume the chosen entry
            return found, pos, head, skip_t, skip_i, skip_r, pops

        def finalize_one(state, fstate, li):
            """Finalizes lane li's object into the device segmentation
            (mirroring BatchCanvas._finalize's verdict order: weak ->
            seed-claimed drop -> min-size -> segment) and reseeds the
            lane from the screened-seed FIFO, popping until an
            unclaimed candidate or exhaustion. Sequential across lanes
            (the enclosing while-loop), so two same-hop finishers
            arbitrate exactly like consecutive host finalizations."""
            seg_t, min_size, init_act = (fin_opts[0], fin_opts[1],
                                         fin_opts[2])
            sv = state.sv[li]
            start = state.start[li]
            status = state.status[li]
            iters = state.iters[li]
            seed = jax.lax.dynamic_index_in_dim(state.seeds, li, 0,
                                                keepdims=False)
            seg_sv = jax.lax.dynamic_index_in_dim(fstate.seg, sv, 0,
                                                  keepdims=False)
            blk_sv = jax.lax.dynamic_index_in_dim(blocked, sv, 0,
                                                  keepdims=False)
            # Reseed-only lanes (IDLE at round start, or already
            # finalized with an empty FIFO earlier): no object to
            # finalize — skip the claim write and the log row.
            do_fin = ((status == DONE_EMPTY) | (status == DONE_WEAK)
                      | (status == DONE_CAP))
            origin_val = seed[start[0], start[1], start[2]]
            start_ok = origin_val >= move_t.astype(seed.dtype)
            claimed_at = ((seg_sv[start[0], start[1], start[2]] > 0)
                          | ((blk_sv[start[0], start[1], start[2]]
                              & BLOCKED_CLAIMED) > 0))
            weak = (status == DONE_WEAK) | ~start_ok
            invalid = iters <= 0
            cand_fin = do_fin & ~invalid & ~weak & ~claimed_at
            sid = fstate.next_sid[sv]

            def mask_of():
                # NaN (unvisited) compares False; padding stays NaN, so
                # the mask can never claim outside the slot's extent.
                return ((seed >= seg_t.astype(seed.dtype))
                        & (seg_sv == 0)
                        & ((blk_sv & BLOCKED_CLAIMED) == 0))

            # The claim mask, voxel count, and segmentation write touch
            # the whole subvolume (tens of MB) — but duds and
            # reseed-only lanes, the vast majority of finalize_one
            # calls, decide their verdict from the status/origin checks
            # alone, so the heavy work runs under a scalar branch.
            nvox = jax.lax.cond(
                cand_fin,
                lambda: jnp.sum(mask_of().astype(jnp.int32)),
                lambda: jnp.int32(0))
            ok = cand_fin & (nvox >= min_size.astype(jnp.int32))
            seg = jax.lax.cond(
                ok,
                lambda s: jax.lax.dynamic_update_slice(
                    s, jnp.where(mask_of(), sid, seg_sv)[None],
                    (sv, 0, 0, 0)),
                lambda s: s, fstate.seg)
            next_sid = fstate.next_sid.at[sv].add(
                ok.astype(jnp.int32))
            outcome = jnp.where(
                invalid, FIN_INVALID,
                jnp.where(ok, FIN_SEGMENTED,
                          jnp.where(weak, FIN_WEAK,
                                    jnp.where(claimed_at, FIN_CLAIMED,
                                              FIN_TOO_SMALL))))
            ln = jnp.minimum(fstate.log_n, fstate.log.shape[0] - 1)
            row = jnp.stack([
                sv, jnp.where(ok, sid, 0), start[0], start[1], start[2],
                iters, nvox, status, outcome, li]).astype(jnp.int32)
            row = jnp.where(do_fin, row, fstate.log[ln])
            log = jax.lax.dynamic_update_slice(fstate.log, row[None],
                                               (ln, 0))

            # Pop the FIFO until an unclaimed seed or exhaustion. The
            # claim check runs against the JUST-updated segmentation, so
            # a seed inside the object finalized a microsecond ago is
            # discarded — zero-staleness arbitration the host's
            # round-granular revalidation cannot match.
            def pop_cond(c):
                h, got = c[0], c[1]
                return (h < fstate.fifo_n) & ~got

            def pop_body(c):
                h, _, pos, psv = c
                cand = fstate.fifo_pos[h]
                csv = fstate.fifo_sv[h]
                free = ((seg[csv, cand[0], cand[1], cand[2]] == 0)
                        & ((blocked[csv, cand[0], cand[1], cand[2]]
                            & BLOCKED_CLAIMED) == 0))
                return (h + 1, free, jnp.where(free, cand, pos),
                        jnp.where(free, csv, psv))

            head, got, pos2, sv2 = jax.lax.while_loop(
                pop_cond, pop_body,
                (fstate.fifo_head, jnp.bool_(False), start, sv))
            # Entries advanced past were claimed since screening; count
            # them per slot (host parity: _valid_seed_pos counts the
            # same event at host assignment time).
            fidx = jnp.arange(fstate.fifo_sv.shape[0], dtype=jnp.int32)
            skipped = ((fidx >= fstate.fifo_head)
                       & (fidx < head - got.astype(jnp.int32)))
            claimed = fstate.claimed.at[fstate.fifo_sv].add(
                skipped.astype(jnp.int32))

            # Reset lane li: plant the init activation on a blank seed.
            # The buffer's only non-NaN voxels are the finished object's
            # pred-patch writes, whose union is bounded by the tracked
            # visited bbox [minp, maxp] widened by the patch extent — so
            # for the dominant reseed case (a dud that ran a hop or two)
            # a small static NaN block over that dirty box replaces the
            # full lane-buffer blank (~40x less HBM traffic per reseed
            # at 165^3 slots). Objects wider than the block fall back to
            # the full blank.
            pred_np = np.asarray(self._pred_size, np.int32)
            soff_np = np.asarray([s // 2 for s in self._seed_size],
                                 np.int32)
            off0_np = np.asarray(self._pred_delta, np.int32) - soff_np
            dims_np = np.asarray(seed.shape, np.int32)
            delt_np = np.maximum(np.asarray(self.info.deltas[::-1],
                                            np.int32), 1)
            sblk = tuple(np.minimum(pred_np + 2 * delt_np, dims_np))
            span = state.maxp[li] - state.minp[li]
            small = jnp.all(span <= jnp.asarray(sblk) - pred_np)
            corner = state.minp[li] + off0_np

            def blank_small(seeds):
                block = jnp.full((1, *sblk), jnp.nan, seed.dtype)
                return jax.lax.dynamic_update_slice(
                    seeds, block, (li, corner[0], corner[1], corner[2]))

            def blank_full(seeds):
                block = jnp.full((1, *seed.shape), jnp.nan, seed.dtype)
                return jax.lax.dynamic_update_slice(
                    seeds, block, (li, 0, 0, 0))

            seeds = jax.lax.cond(
                got,
                lambda s: jax.lax.cond(small, blank_small, blank_full,
                                       s),
                lambda s: s, state.seeds)
            seeds = seeds.at[li, pos2[0], pos2[1], pos2[2]].set(
                jnp.where(got, init_act.astype(seed.dtype),
                          seeds[li, pos2[0], pos2[1], pos2[2]]))
            done_li = jax.lax.dynamic_index_in_dim(state.done, li, 0,
                                                   keepdims=False)
            done_new = jnp.where(got, jnp.zeros_like(done_li), done_li)
            done = jax.lax.dynamic_update_slice(
                state.done, done_new[None], (li, 0, 0, 0))
            big = 2.0 * jnp.abs(move_t) + 1.0
            qpos = state.qpos.at[li, 0, :].set(
                jnp.where(got, pos2, state.qpos[li, 0, :]))
            qscore = state.qscore.at[li, 0].set(
                jnp.where(got, big, state.qscore[li, 0]))
            sel = jnp.where
            state = LaneState(
                seeds=seeds, sv=state.sv.at[li].set(sel(got, sv2, sv)),
                qpos=qpos, qscore=qscore,
                head=state.head.at[li].set(
                    sel(got, 0, state.head[li])),
                tail=state.tail.at[li].set(
                    sel(got, 1, state.tail[li])),
                done=done,
                start=state.start.at[li].set(sel(got, pos2, start)),
                minp=state.minp.at[li].set(sel(got, pos2,
                                               state.minp[li])),
                maxp=state.maxp.at[li].set(sel(got, pos2,
                                               state.maxp[li])),
                iters=state.iters.at[li].set(0),
                status=state.status.at[li].set(
                    sel(got, RUNNING, DONE_FINALIZED)),
                fresh=state.fresh.at[li].set(got),
                overflow=state.overflow,
                # Cumulative within the round (host deltas attribute to
                # the lane's end-of-round slot; documented approximation
                # in multi-subvolume batches).
                skip_threshold=state.skip_threshold,
                skip_invalid=state.skip_invalid,
                skip_restricted=state.skip_restricted)
            fstate = FinalizeState(
                seg=seg, next_sid=next_sid,
                fifo_pos=fstate.fifo_pos, fifo_sv=fstate.fifo_sv,
                fifo_n=fstate.fifo_n, fifo_head=head,
                log=log, log_n=fstate.log_n + do_fin.astype(jnp.int32),
                hold=fstate.hold, claimed=claimed)
            return state, fstate

        def finalize_pass(state, fstate):
            """Sequentially finalizes every lane that finished
            (DONE_EMPTY without host-held spill, DONE_WEAK, DONE_CAP)
            and refills idle lanes (IDLE / DONE_FINALIZED) from the
            seed FIFO. Finalizations run first so their claims land
            before reseeds consume FIFO entries. Zero-iteration when
            nothing finished and no refill is possible — the common
            case costs two reduces over B flags.

            Same-hop dud kill: weak/capped running lanes are detected
            HERE (the same origin-voxel / iteration checks lane_pre
            applies) rather than one hop later, so the trailing pass
            of the hop that weakened a seed finalizes it and reseeds
            the lane in time for the NEXT hop's conv. Without this a
            dud cost 2 hops per executed move (execute, then a
            detection hop); in the supply-rich dud-heavy phases that
            halved executed moves per lane-round."""
            running = state.status == RUNNING
            capped = running & (max_iters > 0) & (
                state.iters >= max_iters)
            origin_vals = jax.vmap(
                lambda seed, s: seed[s[0], s[1], s[2]])(
                    state.seeds, state.start)
            # Promoted comparison, exactly as lane_pre's weak check.
            weak_now = (running & ~capped & ~state.fresh
                        & ~(origin_vals >= move_t))
            status = jnp.where(
                capped, DONE_CAP,
                jnp.where(weak_now, DONE_WEAK, state.status))
            state = dataclasses.replace(state, status=status)
            nmask = (((state.status == DONE_EMPTY) & ~fstate.hold)
                     | (state.status == DONE_WEAK)
                     | (state.status == DONE_CAP))
            rmask = ((state.status == IDLE)
                     | (state.status == DONE_FINALIZED))

            def cond(c):
                state, fstate, nmask, rmask = c
                return jnp.any(nmask) | (
                    jnp.any(rmask)
                    & (fstate.fifo_head < fstate.fifo_n))

            def body(c):
                state, fstate, nmask, rmask = c
                has_n = jnp.any(nmask)
                li = jnp.where(has_n, jnp.argmax(nmask),
                               jnp.argmax(rmask))
                state, fstate = finalize_one(state, fstate, li)
                return (state, fstate, nmask.at[li].set(False),
                        rmask.at[li].set(False))

            state, fstate, _, _ = jax.lax.while_loop(
                cond, body, (state, fstate, nmask, rmask))
            return state, fstate

        def hop(carry):
            state, fstate, executed_total, pops_total = carry
            # Finalize/reseed at hop ENTRY so refilled lanes execute
            # this hop's conv. A trailing finalize_pass after the last
            # hop handles same-round finishers, so the only DONE_*
            # statuses the host can observe at a round boundary are
            # DONE_EMPTY under a host hold (spill pending) and
            # STALLED_FULL; this entry pass mainly reseeds idle lanes
            # from a FIFO the host loaded after the trailing pass ran.
            if device_finalize:
                state, fstate = finalize_pass(state, fstate)
            seg_now = fstate.seg if device_finalize else None
            lane_shapes = shapes[state.sv]   # (B, 3) actual extents
            def lane_pre(seed, sv, shape, qpos, qscore, head, tail, done,
                         start, minp, maxp, iters, status, fresh, skip_t,
                         skip_i, skip_r):
                running = status == RUNNING
                capped = running & (max_iters > 0) & (iters >= max_iters)
                status = jnp.where(capped, DONE_CAP, status)
                running = running & ~capped

                seed_val = seed[start[0], start[1], start[2]]
                weak = running & ~fresh & ~(seed_val >= move_t)
                status = jnp.where(weak, DONE_WEAK, status)
                running = running & ~weak

                # A move pushes up to 6 candidates; with fewer free slots
                # the lane STALLS for host draining instead of silently
                # dropping pushes (no object truncation, ever).
                full = running & (tail - head > Q - 6)
                status = jnp.where(full, STALLED_FULL, status)
                running = running & ~full

                found, pos, head, skip_t, skip_i, skip_r, pops = \
                    pop_one(seg_now, seed, sv, shape, qpos, qscore, head,
                            tail, done, start, fresh, running, skip_t,
                            skip_i, skip_r)
                found = found & running
                status = jnp.where(running & ~found, DONE_EMPTY, status)
                # Clamp so the dummy slice for idle lanes is in-bounds.
                pos = jnp.clip(pos, margin, shape - 1 - margin)
                return (pos, found, head, status, skip_t, skip_i, skip_r,
                        pops)

            (pos, execute, head, status, skip_t, skip_i, skip_r,
             pops) = jax.vmap(
                lane_pre)(state.seeds, state.sv, lane_shapes,
                          state.qpos, state.qscore,
                          state.head, state.tail, state.done, state.start,
                          state.minp, state.maxp, state.iters,
                          state.status, state.fresh,
                          state.skip_threshold, state.skip_invalid,
                          state.skip_restricted)

            seed_off = jnp.array([s // 2 for s in self._seed_size],
                                 jnp.int32)

            def lane_patches(seed, sv, pos):
                seed_start = pos - seed_off
                image_patch = jax.lax.dynamic_slice(
                    image, jnp.concatenate([sv[None], pos - margin]),
                    (1,) + tuple(self._image_size))[0]
                seed_patch = jax.lax.dynamic_slice(seed, seed_start,
                                                   self._seed_size)
                return image_patch, seed_patch

            img_p, seed_p = jax.vmap(lane_patches)(state.seeds, state.sv,
                                                   pos)

            # Conv compaction: in a typical fused-driver hop only ~40%
            # of lanes execute a move (the rest drained their queue, are
            # between objects, or idle on an empty FIFO), yet the model
            # batch — the hop's dominant FLOPs — used to run over all B
            # lanes. Sort executing lanes first (stable argsort on the
            # execute flag), pick the smallest power-of-two-ish bucket
            # that covers them, and run the conv on that bucket only;
            # results scatter back by lane id. Non-executing lanes get
            # zero logits, masked out by `execute` downstream exactly as
            # the garbage conv outputs were before. Per-sample conv
            # results are independent of batch size, so move sequences
            # are unchanged.
            B_l = pos.shape[0]
            exec_first = jnp.argsort(jnp.logical_not(execute),
                                     stable=True)
            n_exec = jnp.sum(execute.astype(jnp.int32))
            # FFN_TPU_COMPACT=0: full-batch conv only — bit-exact with
            # pre-compaction kernels on TPU/bf16 (see __init__).
            buckets = sorted({max(1, B_l // 8), max(1, B_l // 4),
                              max(1, B_l // 2), B_l}) \
                if self.conv_compact else [B_l]

            def conv_bucket(S):
                def run(_):
                    sel = exec_first[:S]
                    lg = jax.vmap(
                        lambda ip, sp: self._apply_model(ip, sp, opts))(
                            img_p[sel], seed_p[sel])
                    out = jnp.zeros((B_l,) + lg.shape[1:], lg.dtype)
                    return out.at[sel].set(lg)
                return run

            def pick(i):
                if i == len(buckets) - 1:
                    return conv_bucket(buckets[i])
                return lambda _: jax.lax.cond(
                    n_exec <= buckets[i], conv_bucket(buckets[i]),
                    pick(i + 1), None)

            logits_all = pick(0)(None)

            def lane_exec(seed, sv, done, start, minp, maxp, iters, pos,
                          execute, logits):
                seed_start = pos - seed_off
                write_start = seed_start + jnp.array(self._pred_delta,
                                                     jnp.int32)
                old = jax.lax.dynamic_slice(seed, write_start,
                                            self._pred_size)
                patch = jnp.where(execute, logits.astype(seed.dtype), old)
                seed = jax.lax.dynamic_update_slice(seed, patch,
                                                    write_start)

                c = cell_of(pos, start)
                done = done.at[c[0], c[1], c[2]].set(
                    jnp.where(execute, jnp.uint8(1), done[c[0], c[1],
                                                         c[2]]))
                minp = jnp.where(execute, jnp.minimum(minp, pos), minp)
                maxp = jnp.where(execute, jnp.maximum(maxp, pos), maxp)
                iters = iters + jnp.int32(execute)

                # Face-max scoring, sorted desc by (score, rel) with
                # exact Python-tuple tie-breaking and adjacent-duplicate
                # dedup (batch_canvas.py's push loop semantics).
                scores, offsets = self._face_scores(patch)
                scores = scores.astype(jnp.float32)
                keep = execute & (scores >= move_t)
                order = jnp.lexsort((-offsets[:, 2], -offsets[:, 1],
                                     -offsets[:, 0], -scores))
                scores, offsets, keep = (scores[order], offsets[order],
                                         keep[order])
                dup = jnp.concatenate([
                    jnp.zeros((1,), bool),
                    (scores[1:] == scores[:-1])
                    & jnp.all(offsets[1:] == offsets[:-1], axis=1)])
                keep = keep & ~dup
                return seed, done, minp, maxp, iters, scores, offsets, keep

            (seeds, done, minp, maxp, iters, scores6, offsets6, keep6) = \
                jax.vmap(lane_exec)(
                    state.seeds, state.sv, state.done, state.start,
                    state.minp, state.maxp, state.iters, pos, execute,
                    logits_all)
            qpos, qscore = state.qpos, state.qscore
            tail, overflow = state.tail, state.overflow

            # Push loop (unrolled over the 6 faces), vectorized over lanes.
            for k in range(scores6.shape[1]):
                full = tail - head >= Q
                do = keep6[:, k] & ~full
                slot = tail % Q
                new_pos = pos + offsets6[:, k, :]
                qpos = qpos.at[jnp.arange(qpos.shape[0]), slot, :].set(
                    jnp.where(do[:, None], new_pos,
                              qpos[jnp.arange(qpos.shape[0]), slot, :]))
                qscore = qscore.at[jnp.arange(qscore.shape[0]), slot].set(
                    jnp.where(do, scores6[:, k],
                              qscore[jnp.arange(qscore.shape[0]), slot]))
                tail = tail + do.astype(jnp.int32)
                overflow = overflow + (keep6[:, k] & full).astype(jnp.int32)

            new_state = LaneState(
                seeds=seeds, sv=state.sv, qpos=qpos, qscore=qscore,
                head=head, tail=tail, done=done, start=state.start,
                minp=minp, maxp=maxp, iters=iters, status=status,
                fresh=state.fresh & ~execute,
                overflow=overflow, skip_threshold=skip_t,
                skip_invalid=skip_i, skip_restricted=skip_r)
            if device_finalize:
                new_state, fstate = finalize_pass(new_state, fstate)
            return (new_state, fstate,
                    executed_total + execute.astype(jnp.int32),
                    pops_total + pops)

        # A while-loop (not lax.scan): XLA reliably updates the multi-GB
        # seed buffers in place inside while bodies, whereas a scan carry
        # double-buffers them — at 128 lanes x 250^3 x f32 that is the
        # difference between fitting in HBM and OOM.
        def cond(carry_i):
            carry, i = carry_i
            st = carry[0].status
            # Early round exit when no lane can progress: lanes not
            # RUNNING need HOST work (stall drain, held spill) unless
            # the entry finalize_pass can still act on them — finalize a
            # finished lane or reseed an idle one from the FIFO (same
            # progress condition as finalize_pass itself). Burning the
            # remaining hops would run the conv batch on garbage for
            # zero executed moves (the supply-starved tail of a
            # subvolume paid full rounds for it).
            alive = jnp.any(st == RUNNING)
            if device_finalize:
                fst = carry[1]
                nmask = (((st == DONE_EMPTY) & ~fst.hold)
                         | (st == DONE_WEAK) | (st == DONE_CAP))
                rmask = (st == IDLE) | (st == DONE_FINALIZED)
                alive = alive | jnp.any(nmask) | (
                    jnp.any(rmask) & (fst.fifo_head < fst.fifo_n))
            return (i < hops) & alive

        def body(carry_i):
            carry, i = carry_i
            return hop(carry), i + 1

        zeros_b = jnp.zeros((state.head.shape[0],), jnp.int32)
        (state, fstate, executed, pops_sum), _ = jax.lax.while_loop(
            cond, body, ((state, fstate, zeros_b, zeros_b),
                         jnp.int32(0)))
        packed = jnp.concatenate([
            state.status[:, None],
            state.iters[:, None],
            state.minp,
            state.maxp,
            (state.tail - state.head)[:, None],
            state.overflow[:, None],
            state.skip_threshold[:, None],
            state.skip_invalid[:, None],
            state.skip_restricted[:, None],
            executed[:, None],
            pops_sum[:, None],
            state.sv[:, None],
            state.start,
        ], axis=1)
        if device_finalize:
            # Fold the finalize outputs (log counters + rows) into the
            # SAME packed array: on a tunneled runtime every host
            # materialization is a network round trip, so one D2H per
            # round beats aux + log + log_n + fifo_head + claimed as
            # five transfers (unpack with unpack_round).
            C = packed.shape[1]
            K = fstate.claimed.shape[0]
            header = jnp.zeros((C,), jnp.int32)
            header = header.at[0].set(fstate.log_n)
            header = header.at[1].set(fstate.fifo_head)
            header = jax.lax.dynamic_update_slice(header,
                                                  fstate.claimed, (2,))
            logp = jnp.pad(fstate.log,
                           ((0, 0), (0, C - fstate.log.shape[1])))
            packed = jnp.concatenate([packed, header[None], logp],
                                     axis=0)
            return state, fstate, packed
        return state, packed

    SCREEN_BATCH = 256
    SCREEN_BATCH_SMALL = 64

    def screen_seeds(self, image: jax.Array, positions: np.ndarray,
                     init_activation: float,
                     sv: Optional[np.ndarray] = None) -> np.ndarray:
        """Batched dud-seed screening: evaluates the FIRST FFN update for
        each candidate seed (fresh canvas, init activation at the
        center) and returns whether the origin stays above the move
        threshold — exactly the check that would kill the lane as
        DONE_WEAK on its second pop. About half of PolicyPeaks' seeds on
        membrane-noise peaks fail it; screening them in one conv batch
        costs one hop-equivalent per SCREEN_BATCH candidates instead of
        a lane slot each for a whole round.

        image: (Z, Y, X) volume or (K, Z, Y, X) stack; sv gives each
        candidate's slot (default 0). Returns (N,) bool (True = strong).
        """
        if image.ndim == 3:
            image = image[None]
        positions = np.asarray(positions, np.int32).reshape(-1, 3)
        N = len(positions)
        if sv is None:
            sv = np.zeros(N, np.int32)
        if not hasattr(self, "_screen_fn"):
            margin = np.array([s // 2 for s in self._image_size],
                              np.int32)
            seed_off = np.array([s // 2 for s in self._seed_size],
                                np.int32)
            pred_c = tuple(s // 2 for s in self._pred_size)

            def fn(image, pos, sv, opts, init_act):
                fresh = jnp.full(self._seed_size, jnp.nan, jnp.float32)
                fresh = fresh.at[tuple(seed_off)].set(init_act)

                def one(p, s):
                    img = jax.lax.dynamic_slice(
                        image, jnp.concatenate([s[None], p - margin]),
                        (1,) + tuple(self._image_size))[0]
                    logits = self._apply_model(img, fresh, opts)
                    return logits[pred_c] >= opts[1]

                return jax.vmap(one)(pos, sv)

            self._screen_fn = jax.jit(fn)

        out = np.zeros(N, bool)
        B = self.SCREEN_BATCH
        for i in range(0, N, B):
            strong = self.screen_seeds_async(
                image, positions[i:i + B], init_activation,
                sv=np.asarray(sv[i:i + B], np.int32))
            n = min(B, N - i)
            out[i:i + B] = np.asarray(strong)[:n]
        return out

    def screen_seeds_async(self, image: jax.Array, positions: np.ndarray,
                           init_activation: float,
                           sv: Optional[np.ndarray] = None) -> jax.Array:
        """Dispatches ONE padded screen batch (<= SCREEN_BATCH
        candidates) and returns the device bool array WITHOUT
        materializing — callers pipeline the screen behind an in-flight
        hop round and collect with np.asarray at the next boundary.
        Element i of the result corresponds to positions[i]; the pad
        tail repeats the last candidate and must be discarded.
        """
        if image.ndim == 3:
            image = image[None]
        if not hasattr(self, "_screen_fn"):
            self.screen_seeds(image, np.zeros((0, 3), np.int32),
                              init_activation)   # builds _screen_fn
        positions = np.asarray(positions, np.int32).reshape(-1, 3)
        n = len(positions)
        B = self.SCREEN_BATCH
        if n > B or n == 0:
            raise ValueError(f"screen_seeds_async takes 1..{B} "
                             f"candidates, got {n}")
        if sv is None:
            sv = np.zeros(n, np.int32)
        sv = np.asarray(sv, np.int32)
        # Two padded program sizes: production screen calls average
        # ~50 candidates (watermark top-ups), so padding every call to
        # SCREEN_BATCH wastes ~3x the conv compute the candidates need.
        # The small bucket costs one extra compile, once.
        B = B if n > self.SCREEN_BATCH_SMALL else self.SCREEN_BATCH_SMALL
        if n < B:   # pad to the fixed batch (one compiled program)
            positions = np.concatenate(
                [positions, np.tile(positions[-1:], (B - n, 1))])
            sv = np.concatenate([sv, np.tile(sv[-1:], B - n)])
        return self._screen_fn(
            image, jnp.asarray(positions), jnp.asarray(sv),
            jnp.asarray(self._opts_host), jnp.float32(init_activation))

    def lane_verdicts(self, state: LaneState, blocked: jax.Array,
                      segment_threshold: float, move_threshold: float):
        """One small device call per round answering, for EVERY lane:
        (UNCLAIMED voxels >= segment_threshold in its seed buffer,
        origin seed value >= move_threshold). Finalization uses it as a
        pre-gate: weak or too-small lanes are rejected WITHOUT
        downloading their region mask — on object-dense volumes those
        downloads dominate wall time (thousands of noise seeds, each ~a
        full host<->device round trip). Claimed voxels are excluded
        because membrane-gap duds mostly overlap already-claimed cells;
        the blocked volume is at most one round stale (claims only
        grow), so the count stays an upper bound on the full path's
        post-masking count and the gate's outcome matches it exactly.

        Returns (counts (B,) int64, start_ok (B,) bool) as host arrays.
        """
        if blocked.ndim == 3:
            blocked = blocked[None]
        if not hasattr(self, "_verdict_fn"):
            def fn(seeds, sv, starts, blocked, seg_t, move_t):
                def one(seed, sv, start):
                    free = (blocked[sv] & BLOCKED_CLAIMED) == 0
                    count = jnp.sum(
                        ((seed >= seg_t.astype(seed.dtype)) & free)
                        .astype(jnp.int32))
                    ok = seed[start[0], start[1], start[2]] >= \
                        move_t.astype(seed.dtype)
                    return count, ok
                return jax.vmap(one, in_axes=(0, 0, 0))(seeds, sv,
                                                        starts)

            self._verdict_fn = jax.jit(fn)
        counts, ok = self._verdict_fn(
            state.seeds, state.sv, state.start, blocked,
            jnp.float32(segment_threshold), jnp.float32(move_threshold))
        return (np.asarray(counts).astype(np.int64),
                np.asarray(ok).astype(bool))

    def compact_lanes(self, state: LaneState, keep) -> Optional[LaneState]:
        """Returns a new LaneState holding only the lanes in `keep`, or
        None if the gather does not fit in device memory.

        Used to shrink the batch for the end-of-subvolume tail: when a
        handful of objects remain, every hop still pays the full-width
        conv batch; gathering the live lanes into a smaller state makes
        tail rounds proportionally cheaper (run_hops recompiles once per
        distinct lane count; the persistent cache amortizes it).

        The copy runs as one jitted program of n unrolled dynamic
        slices (compiled once per lane count, indices passed as data) —
        an eager `a[idx]` gather lowers with a multi-GB scratch temp at
        production shapes (measured: 12.9 GB temp for a 120->58 lane
        compaction of 250^3 seeds, an instant OOM), while per-lane
        dynamic slices are plain copies whose peak is input + output.
        That peak is checked against the device's free memory first
        (the input cannot be donated: on an allocation failure donated
        buffers are already invalidated, and the caller must keep using
        the full-width state when compaction does not fit)."""
        keep = np.asarray(keep, np.int32)
        n = len(keep)
        leaves = jax.tree.leaves(state)
        in_bytes = sum(leaf.size * leaf.dtype.itemsize for leaf in leaves)
        out_bytes = sum(
            (leaf.size // leaf.shape[0]) * leaf.dtype.itemsize * n
            for leaf in leaves)
        try:
            stats = next(iter(state.seeds.devices())).memory_stats() or {}
        except Exception:   # backends without memory introspection
            stats = {}
        limit = stats.get("bytes_limit", 0)
        if limit:
            if stats.get("bytes_in_use", 0) + 1.5 * out_bytes > limit:
                return None
        elif in_bytes > 2 << 30 and out_bytes > 0.25 * in_bytes:
            # No memory introspection and a state big enough that the
            # copy could plausibly exhaust an accelerator: only compact
            # when the copy is a small fraction of the state, so
            # input + output + copy temps stay well under any budget the
            # input already fit. Small states always compact.
            return None
        cache = getattr(self, "_compact_cache", None)
        if cache is None:
            cache = self._compact_cache = {}
        key = (n, tuple(state.seeds.shape), str(state.seeds.dtype))
        if key not in cache:
            def fn(s, idx):
                def one(a):
                    rows = [jax.lax.dynamic_index_in_dim(
                        a, idx[j], axis=0, keepdims=True)
                        for j in range(n)]
                    return jnp.concatenate(rows, axis=0)
                return jax.tree.map(one, s)

            cache[key] = jax.jit(fn)
        try:
            # Materialize before handing back: the input was NOT donated,
            # so an allocation failure here leaves the caller's state
            # intact and compaction is simply skipped.
            out = cache[key](state, jnp.asarray(keep))
            jax.block_until_ready(out.seeds)
            return out
        except jax.errors.JaxRuntimeError as e:
            msg = str(e).lower()
            if "resource" in msg or "memory" in msg:
                return None
            raise

    # -- checkpoint support --------------------------------------------------

    def download_lane_queue(self, state: LaneState, lane: int):
        """Returns (positions (N, 3), scores (N,)) of the lane's pending
        FIFO entries, oldest first (for checkpointing)."""
        head = int(np.asarray(state.head[lane]))
        tail = int(np.asarray(state.tail[lane]))
        qpos = np.asarray(state.qpos[lane])
        qscore = np.asarray(state.qscore[lane])
        idx = np.arange(head, tail) % self.queue_capacity
        return qpos[idx], qscore[idx]

    def upload_lane_queue(self, state: LaneState, lane: int,
                          positions: np.ndarray, scores: np.ndarray,
                          ) -> LaneState:
        """Replaces one lane's queue contents (checkpoint restore)."""
        n = len(positions)
        if n > self.queue_capacity:
            raise ValueError(f"queue overflow on restore: {n}")
        qpos = np.asarray(state.qpos[lane]).copy()
        qscore = np.asarray(state.qscore[lane]).copy()
        qpos[:n] = positions
        qscore[:n] = scores
        return dataclasses.replace(
            state,
            qpos=state.qpos.at[lane].set(jnp.asarray(qpos)),
            qscore=state.qscore.at[lane].set(jnp.asarray(qscore)),
            head=state.head.at[lane].set(0),
            tail=state.tail.at[lane].set(n))

    def download_lane_done(self, state: LaneState, lane: int) -> np.ndarray:
        return np.asarray(state.done[lane])

    def upload_lane_done(self, state: LaneState, lane: int,
                         done: np.ndarray) -> LaneState:
        return dataclasses.replace(
            state, done=state.done.at[lane].set(jnp.asarray(done)))

"""Cross-subvolume lane filling: one engine batch, many subvolumes.

A single subvolume holds only so many objects; on object-sparse volumes
the lanes of a HopBatchCanvas starve long before the conv batch is full
(measured round 2: ~7% sustained occupancy on a ~120-cell 250^3 volume).
The per-worker fix mirrors the reference's own scaling story — many
INDEPENDENT subvolumes in flight (ref doc/manual.md:107-117 recommends a
task queue of subvolumes per worker) — but fuses them into ONE device
batch: the engine's image/blocked volumes become (K, Z, Y, X) stacks,
each lane binds to a slot via LaneState.sv, and idle lanes are refilled
from whichever subvolume still has seed supply. A finished subvolume is
written out and its slot is immediately reloaded with the next pending
one, so the batch never drains between subvolumes.

Semantics: objects in different subvolumes are independent by
construction (the reference's embarrassing parallelism); within one
subvolume the behavior is exactly HopBatchCanvas's (same deferral rules,
same finalization arbitration), with the lane count per subvolume varying
dynamically with seed supply. Recovery is driver-level: subvolume outputs
are idempotent (finished npz files are skipped on retry), the
mid-subvolume lane checkpoints of the single-subvolume path are not
carried over to the fused driver.

Sizing note (HBM): per-lane seed buffers dominate. Splitting a volume
into K subvolumes shrinks every lane's buffer by ~K, so the fused driver
supports far more lanes than a monolithic canvas of the same volume —
the double win that makes sustained throughput approach bench peak.
"""

from __future__ import annotations

import os
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Optional, Sequence

from absl import logging
import numpy as np

from ffn_tpu.inference import batch_canvas as batch_canvas_lib
from ffn_tpu.inference import hop_canvas as hop_canvas_lib
from ffn_tpu.inference import hop_engine as hop_engine_lib
from ffn_tpu.inference import storage

_IDLE = batch_canvas_lib._IDLE
_RUNNING = batch_canvas_lib._RUNNING


class SlotCanvas(hop_canvas_lib.HopBatchCanvas):
    """Host-side bookkeeping of ONE subvolume inside the fused driver.

    Owns the subvolume-local state (segmentation, origins, counters,
    deferred seeds, finalization) while the device lane state, image and
    blocked stacks live on the driver and are shared by all slots. Lane
    indices are global; _active_lane_boxes and ingest routing filter by
    the driver's lane->slot binding.
    """

    _allocate_seed_batch = False

    def __init__(self, driver, slot_index: int, model_info, engine, image,
                 options, **kwargs):
        self.driver = driver
        self.slot_index = slot_index
        # Bypass HopBatchCanvas.__init__: slots must not allocate their
        # own LaneState / blocked volume.
        batch_canvas_lib.BatchCanvas.__init__(
            self, model_info, engine, image, options,
            lanes=driver.lanes, **kwargs)
        self.hops = driver.hops
        self._lanes = driver._lanes   # global lane objects (shared)
        self.seed_iter = None
        self.seeds_exhausted = False
        self.screened_ready = []   # pre-screened strong seeds (driver)

    # Device state lives on the driver; HopBatchCanvas methods
    # (drain/spill/requeue, region downloads) see it through this
    # property, so they work unchanged on the shared LaneState.
    @property
    def _state(self):
        return self.driver._state

    @_state.setter
    def _state(self, value):
        self.driver._state = value

    def _put_image_dev(self):
        return None   # the driver uploads into the shared image stack

    def _grid_shape(self):
        # The dedup grid on device is sized for the PADDED slot shape.
        return self.driver.slot_shape

    def _active_lane_boxes(self):
        boxes = []
        for li, lane in enumerate(self._lanes):
            if self.driver.lane_slot[li] != self.slot_index:
                continue
            if lane.state != _RUNNING:
                continue
            boxes.append((lane.min_pos - self._pred_size // 2,
                          lane.max_pos + self._pred_size // 2))
        if not boxes:
            return np.zeros((0, 2, 3), np.int64)
        return np.array(boxes)

    def _post_segment(self, sid, sel, mask):
        region = mask.astype(np.uint8)
        start = [s.start for s in sel]
        self.driver._blocked_dev = self.engine.update_blocked_region(
            self.driver._blocked_dev, start, region,
            slot=self.slot_index)

    def _refresh_blocked(self):
        self.driver.refresh_slot_blocked(self.slot_index)

    def log_info(self, s, *args):
        logging.info("[slot %d] " + s, self.slot_index, *args)


class MultiSubvolumeHopDriver:
    """Drives K concurrent subvolumes through one shared lane batch.

    tasks: sequence of (corner_zyx, size_zyx) subvolumes (already
    filtered to pending work). The driver processes them all, keeping at
    most `slots` loaded at once, and saves each finished subvolume
    through runner.save_segmentation (idempotent npz outputs).
    """

    def __init__(self, runner, tasks: Sequence, lanes: int = 64,
                 slots: int = 4, hops: int = 16,
                 keep_probability_maps: bool = False,
                 device_finalize: bool = True,
                 mesh=None):
        """mesh: optional jax.sharding.Mesh; lane state is sharded over
        its first axis and image/blocked stacks + finalize state are
        replicated — the multi-chip layout (each device runs its lane
        shard's convs; the sequential finalize loop gathers across
        shards). `lanes` must divide evenly by the mesh size. Output is
        identical to the single-device run (pure batched compute over
        the lane axis; asserted by tests/test_multi_canvas.py)."""
        self.mesh = mesh
        self.runner = runner
        self.engine = runner.engine
        if not isinstance(self.engine, hop_engine_lib.HopEngine):
            raise TypeError("MultiSubvolumeHopDriver needs a HopEngine")
        self.tasks = deque(
            (tuple(int(v) for v in c), tuple(int(v) for v in s))
            for c, s in tasks)
        self.lanes = int(lanes)
        self.hops = int(hops)
        self.K = max(1, min(int(slots), len(self.tasks)))
        self.keep_probability_maps = keep_probability_maps
        self.max_iters_per_segment = int(
            runner.canvas_defaults.get("max_iters_per_segment", 0))

        # Common padded slot shape: elementwise max over task sizes.
        sizes = np.array([s for _, s in self.tasks], np.int64)
        self.slot_shape = tuple(int(v) for v in sizes.max(axis=0))

        self._lanes = [batch_canvas_lib._Lane()
                       for _ in range(self.lanes)]
        self.lane_slot = np.full(self.lanes, -1, np.int32)
        self._skip_base = np.zeros((self.lanes, 3), np.int64)
        self._state = self.engine.init_lane_state(self.lanes,
                                                  self.slot_shape)
        self._image_dev = self.engine.put_stack(
            [None] * self.K, self.slot_shape, np.float32)
        # Empty slots are fully claimed so a stale lane could never move
        # there (defense in depth; no lane binds to an empty slot).
        self._blocked_dev = self.engine.put_stack(
            [None] * self.K, self.slot_shape, np.uint8,
            fill=hop_engine_lib.BLOCKED_CLAIMED)
        self.shapes = np.tile(np.array(self.slot_shape, np.int32),
                              (self.K, 1))
        # Device-finalize mode: finished objects are finalized IN KERNEL
        # (claims written to an on-device segmentation, freed lanes
        # reseeded mid-round from a screened-seed FIFO); the host ingests
        # a small log per round and downloads each slot's segmentation
        # ONCE at save. Requires skipping POM downloads, so it is
        # incompatible with keep_probability_maps.
        self.device_finalize = bool(device_finalize) \
            and not keep_probability_maps
        self._fstate = None
        self._fifo_entries = []      # this round's FIFO (slot, pos) rows
        self._fifo_consumed_est = 0  # last round's kernel consumption
        if self.device_finalize:
            # FIFO sized for full-round reseed demand: seed lifetimes on
            # object-sparse volumes are ~2-3 hops, so one 16-hop round
            # can consume ~hops/2 seeds per lane. A FIFO at 2x lanes
            # capped loading at ~0.8 seeds/lane/round — the measured
            # reason lanes sat dead for most of the round (2.8 of 16
            # hops executed) while the conv batch ran at full width.
            self._fstate = self.engine.init_finalize_state(
                self.K, self.lanes, self.slot_shape,
                fifo_capacity=max(8 * self.lanes, 512))
        if mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec
            if self.lanes % mesh.devices.size:
                raise ValueError(
                    f"lanes={self.lanes} must divide over the "
                    f"{mesh.devices.size}-device mesh")
            lane_sh = NamedSharding(mesh, PartitionSpec(
                mesh.axis_names[0]))
            repl = NamedSharding(mesh, PartitionSpec())
            self._state = jax.tree.map(
                lambda x: jax.device_put(x, lane_sh), self._state)
            self._image_dev = jax.device_put(self._image_dev, repl)
            self._blocked_dev = jax.device_put(self._blocked_dev, repl)
            if self._fstate is not None:
                self._fstate = jax.tree.map(
                    lambda x: jax.device_put(x, repl), self._fstate)
        # Seed screening (the separate dud-culling conv program) made
        # sense when a dud cost a whole lane-round; with in-kernel
        # finalize + mid-round FIFO reseed a dud costs 1-2 hops before
        # the kernel kills it as DONE_WEAK and reseeds the lane, while
        # each screen call serializes a padded conv batch between hop
        # rounds AND blocks the host on its verdicts (measured 250^3
        # fused e2e: 149.8 s of t_screen for 598.7 s wall). Default:
        # screens off in device-finalize mode, on in host mode (where a
        # dud still wastes a lane for a full round).
        env_screen = os.environ.get("FFN_TPU_SCREEN")
        if env_screen is not None:
            self.screen_enabled = env_screen != "0"
        else:
            self.screen_enabled = not self.device_finalize
        # Seed-supply watermark (in units of lanes). A fixed multiplier
        # was measured two-sided: 1x starved the FIFO (lanes executed
        # 2.8/16 hops), 6x added +16% speculative convs for no gain —
        # and the right value depends on seed lifetimes, which vary by
        # dataset and run phase (fresh subvolume vs tail). Unless the
        # env pins it, the multiplier adapts each round on the kernel's
        # own FIFO consumption: a fully-drained FIFO raises it (supply
        # was the binding constraint), a half-unconsumed one decays it
        # toward the default (drawing further ahead only floods seeds
        # that claims would have culled).
        env_wm = os.environ.get("FFN_TPU_SCREEN_WATERMARK")
        self._wm_default = float(env_wm) if env_wm is not None else (
            2.0 if self.screen_enabled else 3.0)
        self._wm_mult = self._wm_default
        self._wm_adaptive = env_wm is None
        self.slots: list = [None] * self.K
        self._slot_meta: list = [None] * self.K   # (corner, size, alignment)
        self._next_serve = 0   # round-robin cursor for seed allocation
        self._pending_screens = []   # in-flight dud-screen batches
        self._policy_pool = ThreadPoolExecutor(
            max_workers=4, thread_name_prefix="seed-policy")
        # Slot IO runs off the round loop: saves collect their (already
        # dispatched) device slice and write npz on the io pool; loads
        # prefetch the next subvolume's h5 read + normalization on the
        # SINGLE-worker load pool (h5py handles are not safe for
        # concurrent reads, so every load routes through it).
        self._io_pool = ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="slot-save")
        self._load_pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="slot-load")
        self._save_futs = []
        self._prefetch = {}   # corner -> Future(load_subvolume_inputs)
        self._prefetch_next()   # overlap the first loads with setup
        self.completed = 0
        # Wall-time breakdown + occupancy accounting (driver-level;
        # per-subvolume counters live on the slots).
        self.stats = {"rounds": 0, "executed": 0, "lane_rounds": 0,
                      "running_lane_rounds": 0, "t_hops": 0.0,
                      "t_ingest": 0.0, "t_seed": 0.0, "t_load": 0.0,
                      "t_reseed": 0.0}
        if self.tasks and os.environ.get("FFN_TPU_WARMUP", "1") != "0":
            self.warmup()

    def warmup(self):
        """Compiles every device program the round loop will use BEFORE
        the first round, so no measured round pays a compile. The
        round-4 straggler accounting attributed 38% of the fused 250^3
        wall to rounds above p90, and the p99/max tail was first-use
        compiles: run_hops itself, the save path's cropped slice at each
        distinct edge-subvolume size, and the slot-stack update shapes.
        Compiles run synchronously at dispatch (that is the warming),
        but NOTHING here materializes a device result: the warmup
        round's device execution proceeds asynchronously while run()
        loads slots and materializes seed policies (sobel/EDT/peaks
        host work), and the first real round queues behind it through
        its data dependencies. t_warmup therefore measures trace +
        compile/cache-load + dispatch only. Semantically a no-op: all
        lanes are idle, the FIFO is empty, and the slot-stack writes
        re-write the constructor's fill values. Thresholds (fin_opts /
        options) are traced arguments, so the dummy values here compile
        the same programs the real rounds reuse."""
        import time

        engine = self.engine
        t0 = time.time()
        marks = [("start", t0)]
        mark = lambda name: marks.append((name, time.time()))
        if self.device_finalize:
            # The hop program (the big compile). All-idle lanes + an
            # empty FIFO make this an empty round on device.
            self._state, self._fstate, packed = engine.run_hops(
                self._image_dev, self._blocked_dev, self._state,
                self.hops, self.max_iters_per_segment,
                shapes=self.shapes, sync=False, fstate=self._fstate,
                fin_opts=np.zeros(3, np.float32))
            mark("run_hops")
            # unpack_round is pure numpy (no device program to warm):
            # calling it here only BLOCKED construction on the warmup
            # round's device execution — measured as the dominant
            # warmup mark (333 s on a contended tunnel window). The
            # warmup round now executes asynchronously while run()
            # loads slots and materializes seed policies; the first
            # real round queues behind it via data dependencies.
            mark("unpack")
            self._fstate = engine.round_prep(
                self._fstate, np.zeros((0, 3), np.int32),
                np.zeros((0,), np.int32), np.zeros(self.lanes, bool))
            mark("round_prep")
            self._fstate = engine.reset_slot_seg(self._fstate, 0, 1)
            mark("reset_slot_seg")
            # The save path's cropped slice: one program per DISTINCT
            # task size (edge subvolumes differ from interior ones, so
            # without this the first save of each size compiled inside
            # a measured round).
            for size in sorted({tuple(int(v) for v in s)
                                for _, s in self.tasks}):
                # Dispatch-only: compiling the slice program is the
                # point (jit compiles synchronously at dispatch);
                # neither materializing the multi-MB crop (a blocking
                # D2H) nor block_until_ready (which transitively waits
                # for the warmup hop round through the fstate data
                # dependency) is needed to warm it.
                engine.slice_slot_seg(self._fstate, 0, size)
                mark(f"slice{size}")
        else:
            self._state, packed = engine.run_hops(
                self._image_dev, self._blocked_dev, self._state,
                self.hops, self.max_iters_per_segment,
                shapes=self.shapes, sync=False)
            # (unpack_aux is pure numpy — nothing to warm; calling it
            # would block construction on the warmup round.)
            # reseed (an all-False mask is the identity) + the
            # finalization pre-gate.
            self._state = engine.reseed_lanes(
                self._state, np.zeros(self.lanes, bool),
                np.zeros((self.lanes, 3), np.int32), 0.0,
                sv=np.maximum(self.lane_slot, 0))
            engine.lane_verdicts(self._state, self._blocked_dev,
                                 0.0, 0.0)
        if self.screen_enabled:
            for n in (1, engine.SCREEN_BATCH):
                # Dispatch-only: the compile happens at dispatch;
                # materializing the verdicts would block on the queue.
                engine.screen_seeds_async(
                    self._image_dev, np.zeros((n, 3), np.int32), 0.0,
                    sv=np.zeros(n, np.int32))
        # Slot-stack update programs (the first slot load would compile
        # them; the writes below restore the constructor's fill values).
        self._image_dev = engine.update_stack_slot(
            self._image_dev, 0, np.zeros(self.slot_shape, np.float32))
        mark("stack_image")
        self._blocked_dev = engine.update_stack_slot(
            self._blocked_dev, 0,
            np.full(self.slot_shape, hop_engine_lib.BLOCKED_CLAIMED,
                    np.uint8),
            fill=hop_engine_lib.BLOCKED_CLAIMED)
        mark("stack_blocked")
        self.stats["t_warmup"] = time.time() - t0
        # Per-mark anatomy rides in stats so e2e artifacts can report
        # WHERE warmup time goes (compile vs cache load vs alloc),
        # not just the total.
        self.stats["warmup_marks"] = {
            n: round(b - a, 1)
            for (_, a), (n, b) in zip(marks, marks[1:])}
        logging.info(
            "driver warmup: %.1f s (%d programs precompiled): %s",
            self.stats["t_warmup"],
            len(engine._run_hops_cache) + 4,
            " ".join(f"{n}={b - a:.1f}" for (_, a), (n, b)
                     in zip(marks, marks[1:])))

    # -- slot loading / saving ------------------------------------------------

    def refresh_slot_blocked(self, k: int):
        slot = self.slots[k]
        self._blocked_dev = self.engine.update_stack_slot(
            self._blocked_dev, k, slot._build_blocked(),
            fill=hop_engine_lib.BLOCKED_CLAIMED)

    def _prefetch_load(self, corner, size):
        """Load-pool work for one pending subvolume: h5 read + align +
        normalize, then pad to the slot shape and START the image's H2D
        transfer. By the time _load_next_into consumes the future the
        18 MB (at 165^3) f32 upload has ridden behind hop rounds
        instead of serializing inside the round loop (a measured
        t_load hotspot)."""
        inputs = self.runner.load_subvolume_inputs(corner, size)
        if inputs is None:
            return None
        import jax
        img = inputs["image"]
        padded = np.zeros(self.slot_shape, np.float32)
        padded[tuple(slice(0, s) for s in img.shape)] = img
        inputs["image_dev"] = jax.device_put(padded)
        return inputs

    def _prefetch_next(self, depth: int = 2):
        """Submits h5-read+normalize for the next pending task(s) to the
        load pool so reloads find their inputs already materialized."""
        request = self.runner.request
        pending = sum(1 for f in self._prefetch.values() if not f.done())
        for corner, size in self.tasks:
            if pending >= depth:
                break
            if corner in self._prefetch:
                continue
            seg_path = storage.segmentation_path(
                request.segmentation_output_dir, corner)
            if os.path.exists(seg_path):
                continue
            self._prefetch[corner] = self._load_pool.submit(
                self._prefetch_load, corner, size)
            pending += 1

    def _load_next_into(self, k: int) -> bool:
        """Loads the next pending subvolume into slot k; False if none
        (or all remaining were masked/already done). Loads block (the
        prefetch pool usually has the inputs ready) so the task -> slot
        binding stays deterministic — segmentation output must not vary
        with host IO timing (the mesh-parity test asserts two runs are
        voxel-identical)."""
        request = self.runner.request
        while self.tasks:
            corner, size = self.tasks.popleft()
            seg_path = storage.segmentation_path(
                request.segmentation_output_dir, corner)
            if os.path.exists(seg_path):
                continue
            fut = self._prefetch.pop(corner, None)
            if fut is None:
                # Route through the load pool anyway: it serializes all
                # h5 access on one thread.
                fut = self._load_pool.submit(
                    self._prefetch_load, corner, size)
            inputs = fut.result()
            self._prefetch_next()
            if inputs is None:   # fully masked
                continue
            slot = SlotCanvas(
                self, k, self.runner._model_info, self.engine,
                inputs["image"], request.inference_options,
                restrictor=inputs["restrictor"],
                counters=inputs["counters"],
                corner_zyx=inputs["dst_corner"],
                keep_probability_maps=self.keep_probability_maps,
                max_iters_per_segment=self.max_iters_per_segment)
            # Publish the slot BEFORE loading an init segmentation:
            # SlotCanvas._refresh_blocked (called from
            # init_segmentation_from_volume) resolves itself through
            # driver.slots[k].
            self.slots[k] = slot
            if request.HasField("init_segmentation"):
                slot.init_segmentation_from_volume(
                    self.runner.init_seg_volume, inputs["src_corner"],
                    inputs["src_bbox"].end[::-1],
                    inputs["align_and_crop"])
            self._slot_meta[k] = (corner, size, inputs["alignment"])
            self.shapes[k] = np.array(slot.shape, np.int32)
            self._image_dev = self.engine.update_stack_slot(
                self._image_dev, k, inputs.get("image_dev", slot.image))
            self.refresh_slot_blocked(k)
            if self.device_finalize:
                # Device ids continue above any init-segmentation ids.
                self._fstate = self.engine.reset_slot_seg(
                    self._fstate, k, next_sid=slot._max_id + 1)
            policy = self.runner.get_seed_policy(corner, size)
            slot.seed_policy = policy(slot)
            slot.seed_iter = iter(slot.seed_policy)
            slot.seeds_exhausted = False
            # Materialize the policy's coordinates (sobel/EDT/peaks,
            # ~1.5 s host work per subvolume) off-thread so it overlaps
            # device rounds; _assign_seeds joins before the first draw.
            slot._policy_fut = self._policy_pool.submit(
                slot.seed_policy._materialize)
            logging.info("slot %d <- subvolume %r size %r (%d pending)",
                         k, corner, size, len(self.tasks))
            return True
        return False

    def _slot_finished(self, k: int) -> bool:
        slot = self.slots[k]
        if slot is None:
            return False
        if not slot.seeds_exhausted or slot._deferred:
            return False
        if getattr(slot, "screened_ready", None):
            return False   # banked strong seeds still to flood
        if any(ref is slot for cands, *_ in self._pending_screens
               for _, ref, _ in cands):
            return False   # screen verdicts still in flight
        return not any(
            lane.state == _RUNNING
            for li, lane in enumerate(self._lanes)
            if self.lane_slot[li] == k)

    def _save_slot(self, k: int):
        """Detaches slot k and saves it OFF the round loop: the device
        slice is dispatched (and its D2H started) here, but the
        materialize + merge + npz write run on the io pool so the next
        subvolume's rounds aren't blocked behind host IO. Correctness:
        fstate arrays are immutable, so the slice captures this
        subvolume's final segmentation even though the slot is reset for
        its successor immediately after; the detached SlotCanvas is
        owned solely by the worker from here on."""
        slot = self.slots[k]
        corner, _, alignment = self._slot_meta[k]
        seg_dev = None
        if self.device_finalize:
            # ONE device transfer per subvolume replaces the host path's
            # per-object region downloads. Host-side -1 markers (weak /
            # too-small seeds) and init-segmentation ids are preserved
            # where the kernel claimed nothing.
            seg_dev = self.engine.slice_slot_seg(self._fstate, k,
                                                 slot.shape)
            seg_dev.copy_to_host_async()
        out_dir = self.runner.request.segmentation_output_dir
        seg_path = storage.segmentation_path(out_dir, corner)
        prob_path = storage.object_prob_path(out_dir, corner)

        def finish():
            if seg_dev is not None:
                seg = np.asarray(seg_dev)[0]
                claimed = seg > 0
                slot.segmentation[claimed] = seg[claimed]
            self.runner.save_segmentation(slot, alignment, seg_path,
                                          prob_path)
            logging.info("slot %d: subvolume %r saved (%d objects)", k,
                         corner, len(slot.origins))

        self._save_futs.append(self._io_pool.submit(finish))
        self.slots[k] = None
        self._slot_meta[k] = None
        self.completed += 1

    def _harvest_saves(self, wait: bool = False):
        """Propagates io-pool exceptions; with wait=True joins them all
        (run() exit — outputs must be durable before returning)."""
        pending = []
        for fut in self._save_futs:
            if wait or fut.done():
                fut.result()   # raises the worker's exception, if any
            else:
                pending.append(fut)
        self._save_futs = pending

    # -- seed scheduling ------------------------------------------------------

    def _slot_order(self, active):
        """Active slots round-robin from the one after the last served,
        with materialized-policy slots first (only block on a pending
        policy when it is the sole supply)."""
        order = [k for k in
                 list(range(self._next_serve, self.K))
                 + list(range(self._next_serve))
                 if k in active]
        ready = [k for k in order
                 if getattr(self.slots[k], "_policy_fut", None) is None
                 or self.slots[k]._policy_fut.done()]
        if ready:
            order = ready + [k for k in order if k not in ready]
        return order

    def _assign_seeds(self, idle, active):
        """Distributes idle lanes across active slots from the
        PRE-SCREENED pools (survivors of the device dud screen,
        revalidated because claims may have landed since screening).
        Pools are refilled asynchronously: _dispatch_screens draws
        candidates and enqueues the screen conv batch behind the
        in-flight hop round; _collect_screens banks the verdicts at the
        next round boundary. Fair under scarcity: round-robin from the
        slot after the last one served."""
        assignments = []   # (lane_index, slot_index, pos)
        remaining = list(idle)
        for k in self._slot_order(active):
            slot = self.slots[k]
            ready = getattr(slot, "screened_ready", None) or []
            while remaining and ready:
                pos = ready.pop(0)
                if not slot._valid_seed_pos(tuple(pos)):
                    continue   # claimed since screening
                li = remaining.pop(0)
                assignments.append((li, k, pos))
                self._next_serve = (k + 1) % self.K
            slot.screened_ready = ready
        return assignments

    def _collect_screens(self, drain: bool = False):
        """Banks the verdicts of LANDED screen batches: duds get the
        same weak-seed outcome the lane path would record; survivors
        join their slot's screened_ready pool. Batches whose slot was
        saved and reloaded since dispatch are dropped (the verdicts were
        computed against the previous subvolume's image).

        A batch dispatched during round N rides the device queue behind
        round N's hop program, so it is guaranteed finished (and its
        async D2H landed) once round N+1's packed result has
        materialized — collecting only batches two round-boundaries old
        never blocks the host on screen compute (the eager collect cost
        a measured 62 s of blocking on the 250^3 fused run). `drain`
        collects everything regardless (the supply-starved path needs
        the verdicts NOW and has no round to hide behind)."""
        import time as _time

        if not self._pending_screens:
            return
        t0 = _time.time()
        ready, pending = [], []
        for entry in self._pending_screens:
            # Stamped with stats["rounds"] at dispatch; the counter
            # increments once per completed round, so a stamp two below
            # the current value means a later hop program (which ran
            # AFTER this batch on the device queue) has already
            # materialized.
            if drain or entry[2] < self.stats["rounds"] - 1:
                ready.append(entry)
            else:
                pending.append(entry)
        self._pending_screens = pending
        for cands, strong_dev, _ in ready:
            strong = np.asarray(strong_dev)
            for (k, slot_ref, pos), ok in zip(cands, strong):
                slot = self.slots[k]
                if slot is not slot_ref:
                    continue
                if not ok:
                    # Same outcome the lane path records for a weak
                    # seed, minus the wasted lane-round.
                    p = tuple(int(v) for v in pos)
                    if slot.segmentation[p] == 0:
                        slot.segmentation[p] = -1
                    slot.counters["seed_got_too_weak"].Increment()
                    slot.counters["screened-weak-seeds"].Increment()
                else:
                    slot.screened_ready.append(pos)
        dt = _time.time() - t0
        self.stats["t_screen"] = self.stats.get("t_screen", 0.0) + dt
        self.stats["collect_calls"] = self.stats.get(
            "collect_calls", 0) + 1
        self.stats["t_screen_max"] = max(
            self.stats.get("t_screen_max", 0.0), dt)

    def _dispatch_screens(self, active, relax_quota=0, force=False):
        """Draws fresh candidates and dispatches their dud-screen conv
        batches WITHOUT materializing: dispatched right after a hop
        round, the screens ride the same device queue, so their compute
        and the host's draw work both hide behind the round instead of
        serializing after it. Draw-time lane boxes / claims are at most
        one round stale — the deferral heuristic tolerates that, and
        _assign_seeds revalidates every survivor before use.

        Refills to a watermark of `lanes` banked-or-in-flight seeds;
        skips dispatching tiny batches (the program is padded to
        SCREEN_BATCH, so a 10-candidate call costs the same device time
        as 256) unless `force` (the supply-starved path needs progress).

        The relaxed (deferral-bypassing) pass is capped at
        `relax_quota` — the number of lanes that actually sat hollow
        this round (`force` lifts the cap). Refilling the whole
        watermark speculatively floods seeds inside still-running
        lanes' boxes, duplicating their work: measured on the 250^3
        fused e2e, an uncapped relax pass inflated FOV calls 84k -> 123k
        (+47%) for the same segmentation. Returns the number of
        candidates dispatched."""
        import time as _time

        order = self._slot_order(active)
        if not order:
            return 0
        banked = sum(len(getattr(self.slots[k], "screened_ready", []))
                     for k in order)
        in_flight = sum(len(c) for c, *_ in self._pending_screens)
        # Device-finalize mode: the round's FIFO entries are neither
        # banked nor assigned yet; estimate how many will come back
        # using last round's kernel consumption (the force path covers
        # under-estimates).
        fifo_est = max(0, len(self._fifo_entries)
                       - self._fifo_consumed_est)
        # Watermark of banked-or-in-flight seeds. Seed lifetimes on
        # object-sparse volumes are ~2-3 hops, so a 16-hop round can
        # consume several seeds per lane; a 1x-lanes watermark was the
        # measured supply throttle (FIFO drained dry every round, lanes
        # executed 2.8 of 16 hops). 3x lifts the 250^3 fused run from
        # 305 s/0.9667 to 253 s/0.9833; 6x adds +16% speculative convs
        # for no further gain. Screened mode banks one round of extra
        # latency for the lazy verdict collect.
        watermark = int(self.lanes * self._wm_mult)
        need = watermark - banked - in_flight - fifo_est
        if need <= 0:
            return 0
        # Small top-ups: with screens they waste a padded conv program,
        # so defer until demand accumulates; without screens a draw is
        # pure host work and any supply helps.
        if (self.screen_enabled and not force
                and need < min(32, self.lanes)):
            return 0

        def join_policy(slot):
            fut = getattr(slot, "_policy_fut", None)
            if fut is not None:
                fut.result()
                slot._policy_fut = None

        dispatched = 0
        relax_left = need if force else min(relax_quota, need)
        while need > 0:
            demand = min(need, self.engine.SCREEN_BATCH)
            cands = []   # (slot_index, slot_ref, pos)
            # Two passes: strict deferral first, then relaxed up to the
            # quota (threshold 0: when lanes actually went hollow,
            # speculative flooding of deferred seeds beats hollow
            # batches — idle conv slots donate the duplicate compute).
            for relax in (False, True):
                if len(cands) >= demand:
                    break
                if relax and relax_left <= 0:
                    break
                cap = demand if not relax \
                    else min(demand, len(cands) + relax_left)
                # Both passes split their quota across slots (a single
                # slot taking the whole relax quota would starve later
                # slots every round under seed scarcity).
                share = max(1, (cap - len(cands)) // len(order))
                for k in order:
                    if len(cands) >= cap:
                        break
                    slot = self.slots[k]
                    join_policy(slot)
                    t_d = _time.time()
                    before = len(cands)
                    seeds, slot.seeds_exhausted = slot._draw_seeds(
                        min(share, cap - len(cands)), slot.seed_iter,
                        slot.seeds_exhausted,
                        relax_threshold=0 if relax else None)
                    self.stats["t_draw"] = self.stats.get(
                        "t_draw", 0.0) + _time.time() - t_d
                    for pos in seeds:
                        cands.append((k, slot, pos))
                    if relax:
                        relax_left -= len(cands) - before
            if not cands:
                break
            if not self.screen_enabled:
                # Bank unscreened: the kernel's DONE_WEAK finalize is
                # the same verdict the screen would have computed, at
                # 1-2 in-round hops per dud instead of a dedicated
                # program dispatch.
                for k, slot, pos in cands:
                    slot.screened_ready.append(pos)
                dispatched += len(cands)
                need -= len(cands)
                continue
            positions = np.array([p for _, _, p in cands], np.int32)
            sv = np.array([k for k, _, _ in cands], np.int32)
            init_act = self.slots[order[0]].options.init_activation
            strong_dev = self.engine.screen_seeds_async(
                self._image_dev, positions, init_act, sv=sv)
            # Start the verdicts' D2H as soon as the screen program
            # finishes so _collect_screens reads a landed buffer instead
            # of paying a tunnel round trip per batch.
            strong_dev.copy_to_host_async()
            self._pending_screens.append(
                (cands, strong_dev, self.stats["rounds"]))
            self.stats["screen_calls"] = self.stats.get(
                "screen_calls", 0) + 1
            self.stats["screen_cands"] = self.stats.get(
                "screen_cands", 0) + len(cands)
            dispatched += len(cands)
            need -= len(cands)
        return dispatched

    # -- device-finalize round plumbing ---------------------------------------

    def _fin_opts(self):
        """fin_opts vector for run_hops (thresholds already in logit
        space — slot options convert once at canvas construction)."""
        slot = next(s for s in self.slots if s is not None)
        o = slot.options
        return np.array([o.segment_threshold, o.min_segment_size,
                         o.init_activation], np.float32)

    def _prep_round_fifo(self, active):
        """Loads this round's screened-seed FIFO from the banked pools
        (revalidated against host state; the kernel re-checks claims
        with zero staleness at pop time) and sets the per-lane hold
        flags (lanes with host-held spill must not be finalized in
        kernel). Round-robin across slots for fairness under scarcity.
        Returns (n_loaded, n_idle_unfilled)."""
        S = self._fstate.fifo_pos.shape[0]
        entries = []
        order = self._slot_order(active)
        # One vectorized validation per slot pool (the per-candidate
        # python check was ~1 ms each — a measured host hotspot at
        # production FIFO rates). Validating the surplus early is
        # harmless: claims only grow, so an invalid candidate stays
        # invalid, and survivors are revalidated by the kernel at pop.
        pools = {}
        for k in order:
            pool = self.slots[k].screened_ready
            self.slots[k].screened_ready = []
            if not pool:
                pools[k] = []
                continue
            ok = self.slots[k]._valid_seed_batch(np.asarray(pool))
            pools[k] = [pos for pos, o in zip(pool, ok) if o]
        cursors = {k: 0 for k in order}
        progressed = True
        while len(entries) < S and progressed:
            progressed = False
            for k in order:
                if cursors[k] < len(pools[k]):
                    entries.append((k, pools[k][cursors[k]]))
                    cursors[k] += 1
                    progressed = True
                if len(entries) >= S:
                    break
        for k in order:   # FIFO full: keep the surplus banked
            self.slots[k].screened_ready.extend(pools[k][cursors[k]:])
        if entries:
            # Advance the fairness cursor (host mode advances it in
            # _assign_seeds; without this the device-finalize draw and
            # relax passes would always serve slot order 0..K-1).
            self._next_serve = (entries[-1][0] + 1) % self.K
        pos = np.array([p for _, p in entries],
                       np.int32).reshape(-1, 3)
        sv = np.array([k for k, _ in entries], np.int32)
        hold = np.array([bool(lane.spill) for lane in self._lanes],
                        bool)
        self._fstate = self.engine.round_prep(self._fstate, pos, sv,
                                              hold)
        self._fifo_entries = entries
        idle = sum(1 for lane in self._lanes if lane.state == _IDLE)
        return len(entries), max(0, idle - len(entries))

    def _rebank_fifo(self, fifo_head: int):
        """Returns unconsumed FIFO entries to the front of their slots'
        banked pools (they were drawn earliest) and records the round's
        consumption for the dispatch watermark."""
        self._fifo_consumed_est = fifo_head
        leftover = self._fifo_entries[fifo_head:]
        self._fifo_entries = []
        if not leftover:
            return
        by_slot = {}
        for k, pos in leftover:
            by_slot.setdefault(k, []).append(pos)
        for k, back in by_slot.items():
            slot = self.slots[k]
            if slot is not None:
                slot.screened_ready = back + slot.screened_ready

    def _ingest_device(self, aux, rows):
        """Device-finalize ingest: applies the kernel's finalization log
        to host bookkeeping (origins, counters, weak markers) and
        refreshes the host lane mirrors from aux. The only per-lane
        device interaction left is the rare queue-stall drain."""
        import dataclasses as _dc
        import jax.numpy as _jnp

        overflowed = int(aux["overflow"].sum())
        if overflowed:
            raise AssertionError(
                f"device queue dropped {overflowed} pushes despite the "
                "stall gate")

        hop_canvas_lib.apply_finalize_rows(
            rows, self._lanes, lambda k: self.slots[k])

        skips = np.stack([aux["skip_threshold"], aux["skip_invalid"],
                          aux["skip_restricted"]], axis=1)
        delta = skips - self._skip_base
        self._skip_base = skips

        status_host = None
        status_dirty = False
        for li, lane in enumerate(self._lanes):
            st = int(aux["status"][li])
            sv = int(aux["sv"][li])
            # Counter routing: per-lane round totals attribute to the
            # lane's end-of-round slot (documented approximation when a
            # lane served objects from two slots within one round).
            slot = self.slots[sv] if 0 <= sv < self.K else None
            if slot is not None and (st != hop_engine_lib.IDLE):
                slot.counters["fov-moves"].IncrementBy(
                    int(aux["executed"][li]))
                slot.counters["skip_threshold"].IncrementBy(
                    int(delta[li, 0]))
                slot.counters["skip_invalid_pos"].IncrementBy(
                    int(delta[li, 1]))
                slot.counters["skip_restriced_pos"].IncrementBy(
                    int(delta[li, 2]))
            # Host lane mirror: with in-kernel reseed the lane's object
            # identity comes from aux, not host bookkeeping.
            lane.start_pos = np.asarray(aux["start"][li])
            lane.min_pos = np.asarray(aux["minp"][li])
            lane.max_pos = np.asarray(aux["maxp"][li])
            lane.num_iters = int(aux["iters"][li])
            if st == hop_engine_lib.RUNNING:
                lane.state = _RUNNING
                self.lane_slot[li] = sv
            elif st == hop_engine_lib.STALLED_FULL:
                lane.state = _RUNNING
                self.lane_slot[li] = sv
                if status_host is None:
                    status_host = np.array(self._state.status)
                slot._drain_lane_queue(li, lane)
                status_host[li] = hop_engine_lib.RUNNING
                status_dirty = True
            elif st == hop_engine_lib.DONE_EMPTY:
                # Only reachable with hold set (host-held spill): the
                # kernel finalizes every other DONE lane in-round.
                self.lane_slot[li] = sv
                if lane.spill and slot._requeue_spill(li, lane):
                    lane.state = _RUNNING
                    if status_host is None:
                        status_host = np.array(self._state.status)
                    status_host[li] = hop_engine_lib.RUNNING
                    status_dirty = True
                else:
                    # Spill was entirely stale: the object is genuinely
                    # done. hold clears next round (spill is empty) and
                    # the kernel finalizes it at the next hop entry.
                    lane.state = _RUNNING
            else:   # IDLE / DONE_FINALIZED: lane waits for FIFO seeds
                lane.state = _IDLE
        if status_dirty:
            self._state = _dc.replace(self._state,
                                      status=_jnp.asarray(status_host))

    # -- main loop ------------------------------------------------------------

    def run(self):
        """Processes every task; returns the number of saved subvolumes."""
        import time

        engine = self.engine
        B = self.lanes
        init_activation = None
        trace = bool(int(os.environ.get("FFN_TPU_TRACE", "0")))

        while True:
            # 1. Save finished subvolumes, reload their slots.
            t0 = time.time()
            self._harvest_saves()
            for k in range(self.K):
                if self._slot_finished(k):
                    self._save_slot(k)
            t_sv = time.time()
            self.stats["t_save_disp"] = self.stats.get(
                "t_save_disp", 0.0) + t_sv - t0
            for k in range(self.K):
                if self.slots[k] is None:
                    self._load_next_into(k)
            self.stats["t_load"] += time.time() - t0
            active = [k for k in range(self.K)
                      if self.slots[k] is not None]
            if not active:
                break
            if init_activation is None:
                init_activation = \
                    self.slots[active[0]].options.init_activation

            # 2. Bank in-flight screen verdicts, then refill idle lanes:
            # device-finalize mode loads the round's seed FIFO (the
            # kernel reseeds lanes mid-round); host mode assigns seeds
            # to idle lanes at the round boundary.
            t0 = time.time()
            self._collect_screens()
            t_collect = time.time() - t0
            n_fifo = 0
            assignments = []
            if self.device_finalize:
                t0 = time.time()
                n_fifo, unfilled = self._prep_round_fifo(active)
                self.stats["t_seed"] += time.time() - t0
            else:
                t0 = time.time()   # collect time is booked to t_screen
                idle = [li for li, lane in enumerate(self._lanes)
                        if lane.state == _IDLE]
                assignments = self._assign_seeds(idle, active)
                # Lanes still hollow after the refill license next
                # round's relaxed (deferral-bypassing) draw, and no
                # more.
                unfilled = len(idle) - len(assignments)
                self.stats["t_seed"] += time.time() - t0
                if assignments:
                    t0 = time.time()
                    reset_mask = np.zeros(B, bool)
                    reset_pos = np.zeros((B, 3), np.int32)
                    new_sv = np.array(self.lane_slot)
                    for li, k, pos in assignments:
                        slot = self.slots[k]
                        slot._start_lane(li, pos)
                        reset_mask[li] = True
                        reset_pos[li] = pos
                        new_sv[li] = k
                        self.lane_slot[li] = k
                        self._skip_base[li] = 0
                    self._state = engine.reseed_lanes(
                        self._state, reset_mask, reset_pos,
                        init_activation, sv=np.maximum(new_sv, 0))
                    self.stats["t_reseed"] += time.time() - t0

            running = [li for li, lane in enumerate(self._lanes)
                       if lane.state == _RUNNING]
            if not running and n_fifo == 0:
                # Pools were empty. Force a blocking draw+screen (the
                # round it would normally hide behind doesn't exist);
                # verdicts are banked at the top of the next iteration.
                t0 = time.time()
                dispatched = self._dispatch_screens(active, force=True)
                # No hop round will age these batches out of the lazy
                # collect window — block for the verdicts right here
                # (the starved path has no device round to hide behind).
                self._collect_screens(drain=True)
                self.stats["t_seed"] += time.time() - t0
                self.stats["force_dispatches"] = self.stats.get(
                    "force_dispatches", 0) + 1
                if trace:
                    logging.info(
                        "[trace] starved: collect %.2fs assigned %d "
                        "force-dispatched %d", t_collect,
                        len(assignments), dispatched)
                if dispatched:
                    continue
                # No seeds anywhere right now: either every active slot
                # is exhausted (loop back to save/reload) or deferred
                # seeds will free up (they cannot: no lanes run), so
                # this only recurs when slots are truly finished.
                if all(self.slots[k] is None or self._slot_finished(k)
                       for k in range(self.K)) and not self.tasks:
                    for k in range(self.K):
                        if self.slots[k] is not None:
                            self._save_slot(k)
                    break
                continue

            # 3. One fused device round across all subvolumes,
            # dispatched WITHOUT materializing; the next refill's seed
            # drawing + dud-screen conv batches ride behind it on the
            # device queue, so host seed work and screen compute hide
            # inside the round instead of serializing after it. (No
            # short-round heuristic here: seed pre-screening already
            # culls the weak seeds that made fresh rounds wasteful.)
            hops = self.hops
            t0 = time.time()
            if self.device_finalize:
                self._state, self._fstate, packed_dev = engine.run_hops(
                    self._image_dev, self._blocked_dev, self._state,
                    hops, self.max_iters_per_segment,
                    shapes=self.shapes, sync=False,
                    fstate=self._fstate, fin_opts=self._fin_opts())
            else:
                self._state, packed_dev = engine.run_hops(
                    self._image_dev, self._blocked_dev, self._state,
                    hops, self.max_iters_per_segment,
                    shapes=self.shapes, sync=False)
            t1 = time.time()
            # Enqueue the round-result D2H copy BEFORE the screen
            # programs below: transfers and programs share one device
            # queue on the tunneled runtime, so issuing it here lets
            # unpack_round read a buffer that was copied out the moment
            # the round finished instead of waiting behind the screen
            # convs. In device-finalize mode the finalization log rides
            # inside the same packed array — ONE transfer per round.
            packed_dev.copy_to_host_async()
            self._dispatch_screens(active, relax_quota=unfilled)
            t2 = time.time()
            if self.device_finalize:
                aux, fin_rows, fin_head, fin_claimed = \
                    engine.unpack_round(packed_dev, B, self.K)
            else:
                aux = engine.unpack_aux(packed_dev)
            dt = time.time() - t0
            # t_hops = dispatch + device wait; the overlapped seed work
            # between them is charged to t_seed/t_draw.
            self.stats["t_hops"] += dt - (t2 - t1)
            self.stats["t_seed"] += t2 - t1
            self.stats.setdefault("round_times", []).append((hops, dt))
            self.stats["rounds"] += 1
            self.stats["executed"] += int(aux["executed"].sum())
            self.stats["pops"] = self.stats.get("pops", 0) + int(
                aux["pops"].sum())
            self.stats["max_lane_pops"] = max(
                self.stats.get("max_lane_pops", 0),
                int(aux["pops"].max()))
            self.stats["lane_rounds"] += B
            # Device-finalize: kernel reseeds mid-round, so lanes seeded
            # from this round's FIFO count toward occupancy (upper
            # bound; the exact number isn't known until drain).
            self.stats["running_lane_rounds"] += (
                min(B, len(running) + n_fifo) if self.device_finalize
                else len(running))

            # 4. Ingest, routing each lane to its owning slot.
            t0 = time.time()
            if self.device_finalize:
                rows, fifo_head = fin_rows, fin_head
                for k, c in enumerate(fin_claimed):
                    if c and self.slots[k] is not None:
                        self.slots[k].counters[
                            "skip_invalid_pos"].IncrementBy(int(c))
                t_drain = time.time() - t0
                self.stats["t_drain"] = self.stats.get(
                    "t_drain", 0.0) + t_drain
                loaded = len(self._fifo_entries)
                self.stats["fifo_loaded"] = self.stats.get(
                    "fifo_loaded", 0) + loaded
                self.stats["fifo_consumed"] = self.stats.get(
                    "fifo_consumed", 0) + fifo_head
                if self._wm_adaptive and loaded > 0:
                    # The kernel's own consumption is the supply signal
                    # (deterministic: fifo_head comes out of the packed
                    # round result, so adaptation cannot diverge between
                    # otherwise-identical runs). A drained FIFO only
                    # signals starvation when it was meaningfully sized:
                    # at a subvolume tail the pools run dry (loaded=2,
                    # consumed=2) and raising there would ratchet toward
                    # the cap, overdrawing speculative convs when fresh
                    # subvolumes load.
                    if fifo_head >= loaded and loaded >= self.lanes:
                        self._wm_mult = min(self._wm_mult * 1.5, 8.0)
                    elif fifo_head < loaded // 2:
                        self._wm_mult = max(self._wm_mult * 0.9,
                                            self._wm_default)
                    self.stats["wm_mult"] = round(self._wm_mult, 3)
                self._rebank_fifo(fifo_head)
                self._ingest_device(aux, rows)
            else:
                self._ingest(aux)
            t_ing = time.time() - t0
            self.stats["t_ingest"] += t_ing
            if trace:
                n_rows = len(rows) if self.device_finalize else -1
                fifo_used = fifo_head if self.device_finalize else -1
                logging.info(
                    "[trace] round %d: collect %.2f assign %d/%d "
                    "fifo_in %d hops(disp+wait) %.2f screen_disp %.2f "
                    "ingest %.2f fin_rows %d fifo_used %d pops %d "
                    "executed %d",
                    self.stats["rounds"], t_collect, len(assignments),
                    len(assignments) + unfilled, n_fifo,
                    dt - (t2 - t1), t2 - t1, t_ing, n_rows, fifo_used,
                    int(aux["pops"].sum()),
                    int(aux["executed"].sum()))

        self._harvest_saves(wait=True)
        return self.completed

    def _ingest(self, aux):
        import dataclasses as _dc
        import jax.numpy as _jnp

        overflowed = int(aux["overflow"].sum())
        if overflowed:
            raise AssertionError(
                f"device queue dropped {overflowed} pushes despite the "
                "stall gate")

        skips = np.stack([aux["skip_threshold"], aux["skip_invalid"],
                          aux["skip_restricted"]], axis=1)
        delta = skips - self._skip_base
        self._skip_base = skips

        status_host = None
        status_dirty = False
        # Batched weak/too-small verdicts for finalizing lanes (skips
        # their region downloads; identical outcomes to the full path).
        v_counts = v_ok = None
        if np.any((aux["status"] == hop_engine_lib.DONE_EMPTY)
                  | (aux["status"] == hop_engine_lib.DONE_CAP)):
            any_slot = next(s for s in self.slots if s is not None)
            v_counts, v_ok = self.engine.lane_verdicts(
                self._state, self._blocked_dev,
                any_slot.options.segment_threshold,
                any_slot.options.move_threshold)

            # Prefetch the round's finalization downloads in ONE batched
            # device call (engine.lane_mask_regions) instead of one
            # round trip per object. Candidates: lanes that will reach
            # the download in the loop below (done, verdict-approved,
            # seed not already claimed). A lane claimed later in this
            # round's sequential arbitration wastes its prefetch —
            # harmless; _finalize remains the arbiter.
            cand = []
            pred_half = None
            for li, lane in enumerate(self._lanes):
                if lane.state != _RUNNING:
                    continue
                status = int(aux["status"][li])
                if status not in (hop_engine_lib.DONE_EMPTY,
                                  hop_engine_lib.DONE_CAP):
                    continue
                if status == hop_engine_lib.DONE_EMPTY and lane.spill:
                    continue   # likely requeued, stays running
                if int(aux["iters"][li]) <= 0 or not v_ok[li]:
                    continue
                slot = self.slots[self.lane_slot[li]]
                if v_counts[li] < slot.options.min_segment_size:
                    continue
                pos = tuple(int(v) for v in lane.start_pos)
                if slot.segmentation[pos] > 0:
                    continue   # seed-claimed drop, no download needed
                if pred_half is None:
                    pred_half = slot._pred_size // 2
                minp = np.minimum(lane.min_pos, aux["minp"][li])
                maxp = np.maximum(lane.max_pos, aux["maxp"][li])
                sel_start = np.maximum(minp - pred_half, 0)
                sel_end = np.minimum(maxp + pred_half + 1, slot.shape)
                cand.append((li, slot, sel_start, sel_end - sel_start,
                             pos))
            if cand:
                regions = self.engine.lane_mask_regions(
                    self._state.seeds, [c[0] for c in cand],
                    [c[2] for c in cand], [c[3] for c in cand],
                    any_slot.options.segment_threshold,
                    [c[4] for c in cand])
                for (li, slot, *_), res in zip(cand, regions):
                    cache = getattr(slot, "_mask_region_cache", None)
                    if cache is None:
                        cache = slot._mask_region_cache = {}
                    cache[li] = res
        for li, lane in enumerate(self._lanes):
            if lane.state != _RUNNING:
                continue
            slot = self.slots[self.lane_slot[li]]
            slot.counters["fov-moves"].IncrementBy(
                int(aux["executed"][li]))
            slot.counters["skip_threshold"].IncrementBy(
                int(delta[li, 0]))
            slot.counters["skip_invalid_pos"].IncrementBy(
                int(delta[li, 1]))
            slot.counters["skip_restriced_pos"].IncrementBy(
                int(delta[li, 2]))
            lane.min_pos = np.minimum(lane.min_pos, aux["minp"][li])
            lane.max_pos = np.maximum(lane.max_pos, aux["maxp"][li])
            lane.num_iters = int(aux["iters"][li])
            status = int(aux["status"][li])
            if status == hop_engine_lib.RUNNING:
                continue
            if status == hop_engine_lib.STALLED_FULL:
                if status_host is None:
                    status_host = np.array(self._state.status)
                slot._drain_lane_queue(li, lane)
                status_host[li] = hop_engine_lib.RUNNING
                status_dirty = True
                continue
            if status == hop_engine_lib.DONE_EMPTY and lane.spill:
                if slot._requeue_spill(li, lane):
                    if status_host is None:
                        status_host = np.array(self._state.status)
                    status_host[li] = hop_engine_lib.RUNNING
                    status_dirty = True
                    continue
            weak = status == hop_engine_lib.DONE_WEAK
            too_small = False
            if weak:
                slot.counters["seed_got_too_weak"].Increment()
            elif v_counts is not None:
                if not v_ok[li]:
                    weak = True
                elif v_counts[li] < slot.options.min_segment_size:
                    too_small = True
            if status == hop_engine_lib.DONE_CAP:
                slot.counters["iter-cap-hit"].Increment()
            slot._finalize(li, lane, weak=weak, too_small=too_small)
        if status_dirty:
            self._state = _dc.replace(self._state,
                                      status=_jnp.asarray(status_host))
        # Prefetched downloads whose lane never reached _finalize's
        # download (e.g. seed claimed during this round's sequential
        # arbitration) must not leak into later rounds where the same
        # lane index holds a different object.
        for slot in self.slots:
            if slot is not None and getattr(slot, "_mask_region_cache",
                                            None):
                slot._mask_region_cache.clear()

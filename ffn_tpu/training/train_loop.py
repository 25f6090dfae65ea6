"""High-level training loop: data pipeline + scan trainer + checkpoints.

The driver behind train.py. Equivalent role to the reference's
train.py:309-429 (TF1) and ffn/jax/train.py:373-751 (JAX multi-host), built
on the scan trainer: one jitted program per batch covers every FOV move.

Multi-host: call jax.distributed.initialize() before run_training on each
host; the Mesh spans all devices and the per-host batch is
batch_size // process_count.
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
import time
from typing import Callable, Optional

from absl import logging
import jax
import jax.numpy as jnp
import numpy as np

from ffn_tpu.models import registry
from ffn_tpu.training import augmentation
from ffn_tpu.training import inputs as inputs_lib
from ffn_tpu.training import optimizer as optimizer_lib
from ffn_tpu.training import tracker as tracker_lib
from ffn_tpu.training import train_lib


@dataclasses.dataclass
class DataConfig:
    train_coords: str = ""
    data_volumes: str = ""    # name:path:dataset[,...]
    label_volumes: str = ""
    image_mean: float = 128.0
    image_stddev: float = 33.0
    permutable_axes: tuple = (1, 2)   # of the 3 spatial axes (z=0, y=1, x=2)
    reflectable_axes: tuple = (0, 1, 2)


@dataclasses.dataclass
class LoopConfig:
    train_dir: str = "/tmp/ffn_tpu_train"
    max_steps: int = 10000
    summary_every_steps: int = 100
    checkpoint_every_steps: int = 1000
    random_seed: int = 0
    # Checkpoint preservation: keep at most this many recent checkpoints
    # (0 = keep all) ...
    max_to_keep: int = 5
    # ... but never delete checkpoints whose step is a multiple of this
    # (0 = none preserved). Matches ref jax/train.py:355-371 semantics.
    keep_every_n_steps: int = 0
    # Failure detection: if no training step completes for this many
    # seconds (wedged accelerator RPC, dead data thread, ...), dump all
    # thread stacks to stderr and hard-exit with code 42 so a supervisor
    # can relaunch; training resumes exactly from the last checkpoint
    # (see _restore/_restore_extra). 0 disables.
    stall_timeout_secs: float = 0.0
    # Multi-host preemption flags are OR-ed with a process_allgather; at
    # millisecond step times that collective is measurable, so it can be
    # amortized to every N steps (all processes evaluate it at the SAME
    # steps, so they still stop together; preemption latency grows to at
    # most N steps). 1 = check every step.
    stop_check_every_steps: int = 1


class _StallWatchdog:
    """Hard-exits a wedged training process so a supervisor can restart.

    Soft failure detection (the SIGTERM preemption path) only works when
    the main loop still advances; a hung device RPC or a dead prefetch
    thread stalls the loop forever. This watchdog runs in a daemon
    thread, requires a `beat()` at least every `timeout` seconds, and on
    violation dumps all stacks (faulthandler) and os._exit(42).
    """

    EXIT_CODE = 42

    def __init__(self, timeout_secs: float):
        import threading
        self._timeout = timeout_secs
        self._last = time.time()
        self._stopped = False
        if timeout_secs > 0:
            t = threading.Thread(target=self._watch, daemon=True)
            t.start()

    def beat(self):
        self._last = time.time()

    def stop(self):
        self._stopped = True

    def _watch(self):
        import faulthandler
        import sys
        while not self._stopped:
            time.sleep(min(self._timeout / 4, 30.0))
            if self._stopped:
                return
            if time.time() - self._last > self._timeout:
                logging.error(
                    "No training progress for %.0f s — assuming a wedged "
                    "device/data pipeline; dumping stacks and exiting %d "
                    "for supervised restart.", self._timeout,
                    self.EXIT_CODE)
                faulthandler.dump_traceback(file=sys.stderr,
                                            all_threads=True)
                sys.stderr.flush()
                os._exit(self.EXIT_CODE)


class ExampleBatcher:
    """Yields full-canvas training batches for the scan trainer, with a
    resumable data-iterator cursor.

    The coordinate stream, bounds filter, and augmentation draws are all
    deterministic functions of (seed, #examples consumed), so
    `fast_forward(n)` reproduces the exact pipeline position of a run that
    consumed n examples — no coordinate is replayed or skipped on resume.
    """

    def __init__(self, data: DataConfig, config: train_lib.TrainConfig,
                 info, rng_seed: int = 0, packed: bool = False,
                 shard_index: int = 0, shard_count: int = 1,
                 aug_seed: Optional[int] = None):
        self._batch_size = config.batch_size
        self._packed = packed
        self._canvas_zyx = tuple(
            int(v) for v in train_lib.train_canvas_size(info, config)[::-1])
        image_zyx = tuple(
            int(v) for v in train_lib.train_image_size(info, config)[::-1])
        label_zyx = tuple(
            int(v) for v in train_lib.train_labels_size(info, config)[::-1])
        self._seed_pad = config.seed_pad
        self._seed_init = config.seed_init

        # Augmentation draws are per-process (decorrelated); the
        # coordinate stream seed is rng_seed and must be SHARED across
        # processes when shard_count > 1 (disjoint strided shards of one
        # deterministic stream).
        self._transform = augmentation.PermuteAndReflect(
            rank=5,
            permutable_axes=[a + 1 for a in data.permutable_axes],
            reflectable_axes=[a + 1 for a in data.reflectable_axes],
            rng=np.random.RandomState(
                rng_seed if aug_seed is None else aug_seed))

        def augment(*arrays):
            perm, flips = self._transform.sample()
            return tuple(self._transform.apply(a, perm, flips)
                         for a in arrays)

        self._raw_loader = inputs_lib.ExampleLoader(
            data.train_coords,
            image_volume_map=inputs_lib.parse_volume_map(data.data_volumes),
            label_volume_map=inputs_lib.parse_volume_map(data.label_volumes),
            image_size_xyz=image_zyx[::-1], label_size_xyz=label_zyx[::-1],
            image_mean=data.image_mean, image_stddev=data.image_stddev,
            augment=augment, seed=rng_seed, raw=packed,
            shard_index=shard_index, shard_count=shard_count)
        self._loader = None  # prefetch started lazily / after fast_forward

    def fast_forward(self, n_examples: int) -> None:
        """Positions the pipeline as if n_examples were already consumed.

        Must be called before the first batch (it advances the underlying
        streams directly, bypassing patch loads)."""
        assert self._loader is None, "fast_forward before first batch"
        if n_examples <= 0:
            return
        self._raw_loader.fast_forward(n_examples)
        for _ in range(n_examples):
            self._transform.sample()

    @property
    def consumed(self) -> int:
        """Examples handed to the trainer so far (the checkpoint cursor)."""
        return self._loader.consumed if self._loader is not None else 0

    def __call__(self):
        if self._loader is None:
            self._loader = inputs_lib.PrefetchingLoader(
                self._raw_loader, capacity=4 * self._batch_size)
        if self._packed:
            images, masks = [], []
            while len(images) < self._batch_size:
                img, mask, _, _, _ = self._loader()
                images.append(img)
                masks.append(mask)
            return np.concatenate(images), np.concatenate(masks)
        images, labels, weights = [], [], []
        while len(images) < self._batch_size:
            img, lab, w, _, _ = self._loader()
            images.append(img)
            labels.append(lab)
            weights.append(w)
        seeds = train_lib.make_seed_canvas(
            self._batch_size, self._canvas_zyx, self._seed_pad,
            self._seed_init)
        return (seeds, np.concatenate(images), np.concatenate(labels),
                np.concatenate(weights))


def make_example_batcher(data: DataConfig, config: train_lib.TrainConfig,
                         info, rng_seed: int = 0) -> ExampleBatcher:
    """Builds the batch callable (see ExampleBatcher)."""
    return ExampleBatcher(data, config, info, rng_seed=rng_seed)


def run_training(model_name: str, model_args: str,
                 config: train_lib.TrainConfig, data: DataConfig,
                 loop: LoopConfig,
                 mesh=None) -> dict:
    """Runs FFN training; returns final summaries.

    Multi-host: call jax.distributed.initialize() on every process before
    this function (train.py does it from --coordinator_address/... flags).
    The Mesh then spans all processes' devices; each process feeds
    batch_size/process_count examples from its own coordinate-stream
    shard, global batches are assembled via
    jax.make_array_from_process_local_data, gradients all-reduce inside
    the jitted step over ICI/DCN, and checkpoint/summary writes happen on
    process 0 only (ref jax/train.py:510,619-641 semantics, without the
    host<->device seed shuttling).
    """
    model_cls = registry.import_symbol(model_name)
    kwargs = json.loads(model_args) if model_args else {}
    kwargs.setdefault("fov_size", list(config.fov_size))
    kwargs.setdefault("deltas", list(config.deltas))
    kwargs.setdefault("depth", config.depth)
    kwargs.setdefault("features", config.features)
    if config.precision != "f32":
        # Mixed precision: convs run in the compute dtype; params stay f32
        # (precision.py). Drop HIGHEST so the MXU runs native bf16 passes.
        from ffn_tpu.training import precision as precision_lib
        policy = precision_lib.get_policy(config.precision)
        kwargs.setdefault("dtype", policy.compute_dtype)
        kwargs.setdefault("precision", None)
    model = model_cls(**kwargs)
    info = model.info

    if config.fov_policy not in ("fixed", "fixed_window"):
        raise NotImplementedError(
            f"the scan trainer drives static-offset policies (fixed, "
            f"fixed_window); got {config.fov_policy!r}. Use "
            f"run_training_host_loop for max_pred_moves/no_step.")

    n_proc = jax.process_count()
    proc = jax.process_index()
    is_chief = proc == 0
    if mesh is None:
        mesh = train_lib.make_data_mesh(batch_size=config.batch_size)
    tx = optimizer_lib.optimizer_from_config(config.optimizer)
    state, _ = train_lib.create_train_state(model, config)
    packed = config.packed_transfers
    step_fn = (train_lib.make_scan_train_step_packed if packed
               else train_lib.make_scan_train_step)(
        model, tx, config, mesh=mesh)

    from jax.sharding import NamedSharding, PartitionSpec as P
    repl_sharding = NamedSharding(mesh, P())
    data_sharding = NamedSharding(mesh, P("data"))

    if n_proc > 1:
        if config.batch_size % n_proc:
            raise ValueError(
                f"batch_size {config.batch_size} must divide evenly over "
                f"{n_proc} processes")
        local_config = dataclasses.replace(
            config, batch_size=config.batch_size // n_proc)
    else:
        local_config = config

    def put_batched(x):
        """Process-local numpy -> global batch-sharded device array."""
        if n_proc == 1:
            return jnp.asarray(x)
        return jax.make_array_from_process_local_data(data_sharding, x)

    def put_repl(tree):
        """Replicates a host pytree across the global mesh."""
        if n_proc == 1:
            return tree
        return jax.device_put(tree, repl_sharding)

    # Disjoint data sharding (ref inputs.py:35-63 @shards semantics at
    # row granularity): every process consumes a strided shard of ONE
    # deterministic coordinate stream — no coordinate is sampled by two
    # processes. Augmentation RNG is per-process.
    next_batch = ExampleBatcher(
        data, local_config, info, rng_seed=loop.random_seed,
        packed=packed, shard_index=proc, shard_count=n_proc,
        aug_seed=loop.random_seed + 7919 * proc)
    eval_shape = tuple(int(v)
                       for v in train_lib.train_eval_size(info, config)
                       [::-1])
    from ffn_tpu.models import model_info as mi
    tracker = tracker_lib.EvalTracker(
        eval_shape, shifts_xyz=mi.shift_collection(info.deltas))

    os.makedirs(loop.train_dir, exist_ok=True)
    params, opt_state, ema = state.params, state.opt_state, state.ema_params
    scale_state = state.scale_state
    shuffle_rng = np.random.RandomState(loop.random_seed)

    # Resume from the latest checkpoint if present: params, optimizer,
    # EMA, loss scale, offset-shuffle RNG, and the data-iterator cursor.
    start_step = 0
    consumed_base = 0
    ckpt_dir = os.path.join(loop.train_dir, "ckpt")
    latest = _latest_checkpoint(ckpt_dir)
    if latest is not None:
        start_step = latest
        params, opt_state = _restore(ckpt_dir, latest, opt_state)
        ema, scale_state, consumed_base = _restore_extra(
            ckpt_dir, latest, ema, scale_state, shuffle_rng)
        if consumed_base is None:
            # Old-format checkpoint without a data cursor: assume the
            # scan trainer's fixed consumption rate.
            consumed_base = start_step * local_config.batch_size
        if n_proc > 1 and not is_chief:
            # The extra file holds the CHIEF's cursor; other processes
            # consume at their own rate (bounds rejections differ per
            # shard) and read their own cursor file.
            cpath = os.path.join(ckpt_dir,
                                 f"cursor.ckpt-{latest}.p{proc}.npz")
            if os.path.exists(cpath):
                consumed_base = int(np.load(cpath)["consumed"])
            else:
                logging.warning(
                    "No per-process cursor for step %d (process %d); "
                    "assuming fixed consumption.", latest, proc)
                consumed_base = start_step * local_config.batch_size
        next_batch.fast_forward(consumed_base)
        logging.info("Resumed from step %d (data cursor %d)", start_step,
                     consumed_base)
    params, opt_state = put_repl(params), put_repl(opt_state)
    ema, scale_state = put_repl(ema), put_repl(scale_state)

    # Preemption handling: on SIGTERM/SIGINT, finish the current step,
    # checkpoint, and exit cleanly (ref jax/train.py:697-701). Multi-host:
    # the flag is OR-ed across processes so everyone exits together.
    stop = _PreemptionWatcher()
    watchdog = _StallWatchdog(loop.stall_timeout_secs)

    def stop_requested(step):
        if n_proc == 1:
            return stop.requested
        if (step + 1) % max(1, loop.stop_check_every_steps):
            # Amortized cadence: every process skips the collective at
            # the same steps, so the OR is still evaluated jointly.
            return False
        from jax.experimental import multihost_utils
        flags = multihost_utils.process_allgather(
            np.int32(stop.requested))
        return bool(np.any(flags))

    def save(step):
        if n_proc > 1 and not is_chief:
            # Non-chief processes persist only their own data cursor
            # (model/optimizer state is replicated; the chief writes it).
            os.makedirs(ckpt_dir, exist_ok=True)
            np.savez(
                os.path.join(ckpt_dir, f"cursor.ckpt-{step}.p{proc}.npz"),
                consumed=np.int64(consumed_base + next_batch.consumed))
            return
        _save(ckpt_dir, step, params, opt_state)
        _save_extra(ckpt_dir, step, ema, scale_state, shuffle_rng,
                    consumed_base + next_batch.consumed)
        _apply_keep_policy(ckpt_dir, loop)

    t_last = time.time()
    summaries = {}
    # The packed path pipelines host work against the device: metrics of
    # step N are consumed while step N+1 runs on device (jax async
    # dispatch), so tracker reads and batch assembly hide behind compute.
    pending = None  # (step, metrics, offsets) awaiting tracker ingestion

    def ingest(entry):
        if entry is None:
            return
        _, m, offs = entry
        _update_tracker_packed(tracker, m, offs)

    def emit_summary(step, metrics):
        nonlocal summaries, t_last
        summaries = tracker.get_summaries()
        losses = np.asarray(metrics["loss"])
        act = np.asarray(metrics["active"]) > 0
        dt = time.time() - t_last
        t_last = time.time()
        logging.info(
            "step %d loss %.4f moves/correct %.3f (%.2f steps/s)",
            step, float(losses[act].mean()),
            summaries["moves/correct"],
            loop.summary_every_steps / dt)
        if is_chief:
            _write_summaries(loop.train_dir, step, summaries)

    for step in range(start_step, loop.max_steps):
        offsets_np = train_lib.fixed_offsets_zyx(
            info, shuffle=config.shuffle_fov_moves, rng=shuffle_rng)
        offsets = put_repl(jnp.asarray(offsets_np))
        if packed:
            image_u8, lom_u8 = next_batch()
            params, opt_state, ema, scale_state, metrics = step_fn(
                params, opt_state, ema, scale_state, put_batched(image_u8),
                put_batched(lom_u8), offsets)
            # Device is now busy with THIS step; ingest the previous one.
            ingest(pending)
            pending = (step + 1, metrics, offsets_np)
        else:
            seeds, images, labels, weights = next_batch()
            params, opt_state, ema, scale_state, out_seeds, metrics = \
                step_fn(params, opt_state, ema, scale_state,
                        put_batched(seeds), put_batched(images),
                        put_batched(labels), put_batched(weights),
                        offsets)
            _update_tracker(tracker, metrics, offsets, labels, out_seeds,
                            weights)

        watchdog.beat()
        preempted = stop_requested(step)
        boundary = ((step + 1) % loop.summary_every_steps == 0
                    or (step + 1) % loop.checkpoint_every_steps == 0
                    or step + 1 == loop.max_steps or preempted)
        if boundary and packed and pending is not None:
            ingest(pending)   # flush so summaries/ckpts see this step
            pending = None

        if (step + 1) % loop.summary_every_steps == 0:
            emit_summary(step + 1, metrics)

        if (step + 1) % loop.checkpoint_every_steps == 0 or \
                step + 1 == loop.max_steps or preempted:
            save(step + 1)
        if preempted:
            logging.info("Preemption requested; checkpointed at step %d "
                         "and exiting.", step + 1)
            break

    watchdog.stop()
    return summaries


def run_training_host_loop(model_name: str, model_args: str,
                           config: train_lib.TrainConfig, data: DataConfig,
                           loop: LoopConfig) -> dict:
    """Host-loop trainer: reference-exact stepping (one jitted fwd/bwd per
    FOV batch, host seed write-back through the example engine).

    Compiles a far smaller program than the scan trainer — preferable on
    backends with slow compilation — at the cost of one host round trip
    per FOV move.
    """
    import jax.numpy as jnp
    from scipy.special import logit as np_logit

    from ffn_tpu.models import model_info as mi
    from ffn_tpu.training import examples as examples_lib
    from ffn_tpu.training import tracker as tracker_lib

    from ffn_tpu.training import precision as precision_lib

    model_cls = registry.import_symbol(model_name)
    kwargs = json.loads(model_args) if model_args else {}
    kwargs.setdefault("depth", config.depth)
    kwargs.setdefault("features", config.features)
    if config.precision != "f32":
        # Mixed precision, same recipe as the scan trainer: convs run in
        # the compute dtype, params stay f32, f16 adds loss scaling.
        policy = precision_lib.get_policy(config.precision)
        kwargs.setdefault("dtype", policy.compute_dtype)
        kwargs.setdefault("precision", None)
    model = model_cls(**kwargs)
    info = model.info

    state, tx = train_lib.create_train_state(model, config)
    params, opt_state = state.params, state.opt_state
    ema_params, scale_state = state.ema_params, state.scale_state
    step_fn = train_lib.make_fov_train_step(model, tx, config=config)

    canvas_zyx = tuple(int(v) for v in
                       train_lib.train_canvas_size(info, config)[::-1])
    image_zyx = tuple(int(v) for v in
                      train_lib.train_image_size(info, config)[::-1])
    label_zyx = tuple(int(v) for v in
                      train_lib.train_labels_size(info, config)[::-1])
    eval_shape = tuple(int(v) for v in
                       train_lib.train_eval_size(info, config)[::-1])
    tracker = tracker_lib.EvalTracker(
        eval_shape, shifts_xyz=mi.shift_collection(info.deltas))

    rng = np.random.RandomState(loop.random_seed)
    transform = augmentation.PermuteAndReflect(
        rank=5, permutable_axes=[a + 1 for a in data.permutable_axes],
        reflectable_axes=[a + 1 for a in data.reflectable_axes], rng=rng)

    def augment(image, labels, weights):
        perm, flips = transform.sample()
        return (transform.apply(image, perm, flips),
                transform.apply(labels, perm, flips),
                transform.apply(weights, perm, flips))

    loader = inputs_lib.ExampleLoader(
        data.train_coords,
        image_volume_map=inputs_lib.parse_volume_map(data.data_volumes),
        label_volume_map=inputs_lib.parse_volume_map(data.label_volumes),
        image_size_xyz=image_zyx[::-1], label_size_xyz=label_zyx[::-1],
        image_mean=data.image_mean, image_stddev=data.image_stddev,
        augment=augment, seed=loop.random_seed)
    loader = inputs_lib.PrefetchingLoader(loader,
                                          capacity=4 * config.batch_size)

    threshold = float(np_logit(config.threshold))
    shifts = mi.shift_collection(info.deltas)

    # FOV-movement policy dispatch, mirroring the reference's map
    # (ref train.py:359-372 {fixed, max_pred_moves, no_step} plus the
    # JAX trainer's fixed_window, ref jax/train.py:316-343).
    if config.fov_policy == "fixed":
        def policy_fn(i, s, l, t):
            return examples_lib.fixed_offsets(
                i, s, l, t, threshold=threshold, fov_shifts=shifts)
    elif config.fov_policy == "fixed_window":
        def policy_fn(i, s, l, t):
            return examples_lib.fixed_offsets_window(
                i, s, l, t, threshold=threshold, fov_shifts=shifts,
                radius=int(config.fixed_window_radius))
    elif config.fov_policy == "max_pred_moves":
        max_radius = np.array(info.deltas) * config.fov_moves
        def policy_fn(i, s, l, t):
            return examples_lib.max_pred_offsets(
                i, s, l, t, threshold=threshold, max_radius=max_radius)
    elif config.fov_policy == "no_step":
        policy_fn = examples_lib.no_offsets
    else:
        raise ValueError(f"unknown fov_policy {config.fov_policy!r}")

    def load_example():
        img, lab, w, coord, name = loader()
        # crop to canvas sizes expected by the example engine
        return img, lab, w, coord, name

    def make_gen():
        return examples_lib.get_example(
            load_example, tracker, info, policy_fn,
            seed_pad=config.seed_pad, seed_shape=canvas_zyx)

    batch_it = examples_lib.BatchExampleIter(
        make_gen, tracker, config.batch_size, info)

    os.makedirs(loop.train_dir, exist_ok=True)
    ckpt_dir = os.path.join(loop.train_dir, "ckpt")

    start_step = 0
    latest = _latest_checkpoint(ckpt_dir)
    if latest is not None:
        start_step = latest
        params, opt_state = _restore(ckpt_dir, latest, opt_state)
        ema_params, scale_state, _ = _restore_extra(
            ckpt_dir, latest, ema_params, scale_state, rng)
        logging.info("Resumed from step %d", start_step)

    # Note: the host-loop trainer's data position is NOT checkpointed —
    # examples span a variable number of steps (in-flight FOV queues), so
    # there is no well-defined cursor (the augmentation RNG state IS
    # restored). The scan trainer (run_training) is the exact-resume
    # path.
    stop = _PreemptionWatcher()
    t_last = time.time()
    summaries = {}
    for step in range(start_step, loop.max_steps):
        seeds, images, labels, weights = next(batch_it)
        (params, opt_state, ema_params, scale_state, logits,
         loss) = step_fn(
            params, opt_state, ema_params, scale_state,
            jnp.asarray(seeds), jnp.asarray(images),
            jnp.asarray(labels), jnp.asarray(weights))
        batch_it.update_seeds(np.asarray(logits, np.float32))

        if (step + 1) % loop.summary_every_steps == 0:
            summaries = tracker.get_summaries()
            dt = time.time() - t_last
            t_last = time.time()
            logging.info("step %d loss %.4f moves/correct %.3f "
                         "(%.2f steps/s)", step + 1, float(loss),
                         summaries["moves/correct"],
                         loop.summary_every_steps / dt)
            _write_summaries(loop.train_dir, step + 1, summaries)
        if (step + 1) % loop.checkpoint_every_steps == 0 or \
                step + 1 == loop.max_steps or stop.requested:
            _save(ckpt_dir, step + 1, params, opt_state)
            _save_extra(ckpt_dir, step + 1, ema_params, scale_state,
                        rng, 0)
            _apply_keep_policy(ckpt_dir, loop)
        if stop.requested:
            logging.info("Preemption requested; checkpointed at step %d "
                         "and exiting.", step + 1)
            break
    return summaries


def _update_tracker_packed(tracker, metrics, offsets):
    """Feeds the device-computed per-offset move stats AND eval-patch
    confusion/loss (computed on device by the packed step) into the host
    tracker — one small host read per step, no canvas download."""
    host = jax.device_get({k: metrics[k] for k in (
        "correct", "missed", "spurious", "patch_loss", "tp", "fp", "fn",
        "tn")})
    correct, missed, spurious = (host["correct"], host["missed"],
                                 host["spurious"])
    for i, off in enumerate(np.asarray(offsets)):
        off_xyz = tuple(int(v) for v in off[::-1])
        radius = int(np.linalg.norm(off_xyz))
        for stats in (tracker.moves, tracker.moves_by_radius[radius]):
            stats.total += int(correct[i] + missed[i] + spurious[i])
            stats.correct += int(correct[i])
            stats.missed += int(missed[i])
            stats.spurious += int(spurious[i])
    tracker.loss_sum += float(host["patch_loss"])
    tracker.loss_count += 1
    tracker.tp += int(host["tp"])
    tracker.fp += int(host["fp"])
    tracker.fn += int(host["fn"])
    tracker.tn += int(host["tn"])
    tracker.num_patches += 1


def _update_tracker(tracker, metrics, offsets, labels, out_seeds, weights):
    """Feeds device-computed per-offset stats into the host tracker."""
    correct = np.asarray(metrics["correct"])
    missed = np.asarray(metrics["missed"])
    spurious = np.asarray(metrics["spurious"])
    for i, off in enumerate(np.asarray(offsets)):
        off_xyz = tuple(int(v) for v in off[::-1])
        radius = int(np.linalg.norm(off_xyz))
        for stats in (tracker.moves, tracker.moves_by_radius[radius]):
            stats.total += int(correct[i] + missed[i] + spurious[i])
            stats.correct += int(correct[i])
            stats.missed += int(missed[i])
            stats.spurious += int(spurious[i])
    tracker.add_patch(labels, np.asarray(out_seeds)[
        :, :labels.shape[1], :labels.shape[2], :labels.shape[3], :],
        weights)


def _write_summaries(train_dir, step, summaries):
    path = os.path.join(train_dir, "summaries.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps({"step": step, **{
            k: float(v) for k, v in summaries.items()}}) + "\n")


class _PreemptionWatcher:
    """Converts SIGTERM/SIGINT into a 'save and exit after this step'
    request (preemption-aware training; ref jax/train.py:697-701)."""

    def __init__(self):
        import signal
        self.requested = False
        self._prev = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._prev[sig] = signal.signal(sig, self._handler)
            except ValueError:
                pass  # not the main thread (e.g. under a test runner)

    def _handler(self, signum, frame):
        del frame
        logging.warning("Signal %s received: checkpointing after the "
                        "current step.", signum)
        self.requested = True


def _ckpt_steps(ckpt_dir) -> list:
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("model.ckpt-") and name.endswith(".npz"):
            steps.append(int(name[len("model.ckpt-"):-len(".npz")]))
    return sorted(steps)


def _apply_keep_policy(ckpt_dir, loop: LoopConfig):
    """Deletes old checkpoints: keep the newest `max_to_keep`, plus every
    step multiple of `keep_every_n_steps` (ref jax/train.py:355-371)."""
    if loop.max_to_keep <= 0:
        return
    steps = _ckpt_steps(ckpt_dir)
    doomed = steps[:-loop.max_to_keep]
    for step in doomed:
        if loop.keep_every_n_steps and step % loop.keep_every_n_steps == 0:
            continue
        for prefix in ("model.ckpt-", "opt.ckpt-", "extra.ckpt-"):
            path = os.path.join(ckpt_dir, f"{prefix}{step}.npz")
            if os.path.exists(path):
                os.remove(path)
        for path in glob.glob(
                os.path.join(ckpt_dir, f"cursor.ckpt-{step}.p*.npz")):
            os.remove(path)


def _save_extra(ckpt_dir, step, ema, scale_state, shuffle_rng, consumed):
    """Persists EMA params, loss-scale state, offset-shuffle RNG state,
    and the data-iterator cursor."""
    arrays = {"consumed": np.int64(consumed)}
    s0, s1, s2, s3, s4 = shuffle_rng.get_state()
    arrays["rng_keys"] = np.asarray(s1)
    arrays["rng_meta"] = np.array([s2, s3, s4], np.float64)
    if ema is not None:
        for i, leaf in enumerate(jax.tree.leaves(
                jax.tree.map(np.asarray, ema))):
            arrays[f"ema{i}"] = leaf
    for i, leaf in enumerate(jax.tree.leaves(
            jax.tree.map(np.asarray, scale_state))):
        arrays[f"scale{i}"] = leaf
    path = os.path.join(ckpt_dir, f"extra.ckpt-{step}.npz")
    np.savez_compressed(path, **arrays)


def _restore_extra(ckpt_dir, step, ema_template, scale_template,
                   shuffle_rng):
    """Restores what _save_extra wrote; returns (ema, scale_state,
    consumed) — consumed is None for old-format checkpoints."""
    path = os.path.join(ckpt_dir, f"extra.ckpt-{step}.npz")
    if not os.path.exists(path):
        return ema_template, scale_template, None
    data = np.load(path)
    consumed = int(data["consumed"])
    meta = data["rng_meta"]
    shuffle_rng.set_state(("MT19937", data["rng_keys"], int(meta[0]),
                           int(meta[1]), float(meta[2])))
    ema = ema_template
    if ema_template is not None and "ema0" in data:
        leaves, treedef = jax.tree.flatten(ema_template)
        ema = jax.tree.unflatten(
            treedef, [np.asarray(data[f"ema{i}"], dtype=l.dtype)
                      .reshape(np.shape(l)) for i, l in enumerate(leaves)])
    scale_state = scale_template
    scale_leaves, scale_def = jax.tree.flatten(scale_template)
    if scale_leaves and "scale0" in data:
        scale_state = jax.tree.unflatten(
            scale_def, [np.asarray(data[f"scale{i}"], dtype=l.dtype)
                        .reshape(np.shape(l))
                        for i, l in enumerate(scale_leaves)])
    return ema, scale_state, consumed


def _save(ckpt_dir, step, params, opt_state):
    from ffn_tpu.models import params_io
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"model.ckpt-{step}.npz")
    params_io.save_params_npz(params, path)
    # Optimizer state is saved separately (flat npz of leaves).
    flat = jax.tree.leaves(jax.tree.map(np.asarray, opt_state))
    np.savez_compressed(os.path.join(ckpt_dir, f"opt.ckpt-{step}.npz"),
                        step=step,
                        **{f"leaf{i}": leaf for i, leaf in enumerate(flat)})


def _latest_checkpoint(ckpt_dir) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = _ckpt_steps(ckpt_dir)
    return steps[-1] if steps else None


def _restore(ckpt_dir, step, opt_state_template):
    """Restores (params, opt_state) written by _save."""
    from ffn_tpu.models import params_io
    params = params_io.load_params_npz(
        os.path.join(ckpt_dir, f"model.ckpt-{step}.npz"))
    opt_path = os.path.join(ckpt_dir, f"opt.ckpt-{step}.npz")
    opt_state = opt_state_template
    if os.path.exists(opt_path):
        data = np.load(opt_path)
        leaves, treedef = jax.tree.flatten(opt_state_template)
        restored = [data[f"leaf{i}"] for i in range(len(leaves))]
        restored = [np.asarray(r, dtype=l.dtype).reshape(np.shape(l))
                    for r, l in zip(restored, leaves)]
        opt_state = jax.tree.unflatten(treedef, restored)
    return params, opt_state

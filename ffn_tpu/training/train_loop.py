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


def make_example_batcher(data: DataConfig, config: train_lib.TrainConfig,
                         info, rng_seed: int = 0):
    """Builds a callable yielding full-canvas training batches.

    Returns batches of (seeds, images, labels, weights) canvases for the
    scan trainer.
    """
    canvas_zyx = tuple(int(v)
                       for v in train_lib.train_canvas_size(info, config)
                       [::-1])
    image_zyx = tuple(int(v)
                      for v in train_lib.train_image_size(info, config)
                      [::-1])
    label_zyx = tuple(int(v)
                      for v in train_lib.train_labels_size(info, config)
                      [::-1])

    rng = np.random.RandomState(rng_seed)
    transform = augmentation.PermuteAndReflect(
        rank=5,
        permutable_axes=[a + 1 for a in data.permutable_axes],
        reflectable_axes=[a + 1 for a in data.reflectable_axes],
        rng=rng)

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
        augment=augment, seed=rng_seed)
    loader = inputs_lib.PrefetchingLoader(loader,
                                          capacity=4 * config.batch_size)

    def next_batch():
        images, labels, weights = [], [], []
        while len(images) < config.batch_size:
            img, lab, w, _, _ = loader()
            images.append(img)
            labels.append(lab)
            weights.append(w)
        seeds = train_lib.make_seed_canvas(
            config.batch_size, canvas_zyx, config.seed_pad,
            config.seed_init)
        return (seeds, np.concatenate(images), np.concatenate(labels),
                np.concatenate(weights))

    return next_batch


def run_training(model_name: str, model_args: str,
                 config: train_lib.TrainConfig, data: DataConfig,
                 loop: LoopConfig,
                 mesh=None) -> dict:
    """Runs FFN training; returns final summaries."""
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

    if config.fov_policy not in ("fixed",):
        raise NotImplementedError(
            f"train_loop currently drives the scan trainer (fixed policy); "
            f"got {config.fov_policy!r}. Use training.examples for "
            f"host-loop policies.")

    if mesh is None:
        mesh = train_lib.make_data_mesh(batch_size=config.batch_size)
    tx = optimizer_lib.optimizer_from_config(config.optimizer)
    state, _ = train_lib.create_train_state(model, config)
    step_fn = train_lib.make_scan_train_step(model, tx, config, mesh=mesh)

    next_batch = make_example_batcher(data, config, info,
                                      rng_seed=loop.random_seed)
    eval_shape = tuple(int(v)
                       for v in train_lib.train_eval_size(info, config)
                       [::-1])
    from ffn_tpu.models import model_info as mi
    tracker = tracker_lib.EvalTracker(
        eval_shape, shifts_xyz=mi.shift_collection(info.deltas))

    os.makedirs(loop.train_dir, exist_ok=True)
    params, opt_state, ema = state.params, state.opt_state, state.ema_params
    scale_state = state.scale_state

    # Resume from the latest checkpoint if present.
    start_step = 0
    ckpt_dir = os.path.join(loop.train_dir, "ckpt")
    latest = _latest_checkpoint(ckpt_dir)
    if latest is not None:
        start_step = latest
        params, opt_state = _restore(ckpt_dir, latest, opt_state)
        logging.info("Resumed from step %d", start_step)

    shuffle_rng = np.random.RandomState(loop.random_seed)
    t_last = time.time()
    summaries = {}
    for step in range(start_step, loop.max_steps):
        seeds, images, labels, weights = next_batch()
        offsets = train_lib.fixed_offsets_zyx(
            info, shuffle=config.shuffle_fov_moves, rng=shuffle_rng)
        params, opt_state, ema, scale_state, out_seeds, metrics = step_fn(
            params, opt_state, ema, scale_state, jnp.asarray(seeds),
            jnp.asarray(images), jnp.asarray(labels), jnp.asarray(weights),
            jnp.asarray(offsets))

        _update_tracker(tracker, metrics, offsets, labels, out_seeds,
                        weights)

        if (step + 1) % loop.summary_every_steps == 0:
            summaries = tracker.get_summaries()
            losses = np.asarray(metrics["loss"])
            act = np.asarray(metrics["active"]) > 0
            dt = time.time() - t_last
            t_last = time.time()
            logging.info(
                "step %d loss %.4f moves/correct %.3f (%.2f steps/s)",
                step + 1, float(losses[act].mean()),
                summaries["moves/correct"],
                loop.summary_every_steps / dt)
            _write_summaries(loop.train_dir, step + 1, summaries)

        if (step + 1) % loop.checkpoint_every_steps == 0 or \
                step + 1 == loop.max_steps:
            _save(ckpt_dir, step + 1, params, opt_state)

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

    model_cls = registry.import_symbol(model_name)
    kwargs = json.loads(model_args) if model_args else {}
    model = model_cls(**kwargs)
    info = model.info

    tx = optimizer_lib.optimizer_from_config(config.optimizer)
    params = model.init_params()
    opt_state = tx.init(params)
    step_fn = train_lib.make_fov_train_step(model, tx)

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

    def load_example():
        img, lab, w, coord, name = loader()
        # crop to canvas sizes expected by the example engine
        return img, lab, w, coord, name

    def make_gen():
        return examples_lib.get_example(
            load_example, tracker, info,
            lambda i, s, l, t: examples_lib.fixed_offsets(
                i, s, l, t, threshold=threshold, fov_shifts=shifts),
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
        logging.info("Resumed from step %d", start_step)

    t_last = time.time()
    summaries = {}
    for step in range(start_step, loop.max_steps):
        seeds, images, labels, weights = next(batch_it)
        params, opt_state, logits, loss = step_fn(
            params, opt_state, jnp.asarray(seeds), jnp.asarray(images),
            jnp.asarray(labels), jnp.asarray(weights))
        batch_it.update_seeds(np.asarray(logits))

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
                step + 1 == loop.max_steps:
            _save(ckpt_dir, step + 1, params, opt_state)
    return summaries


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
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("model.ckpt-") and name.endswith(".npz"):
            steps.append(int(name[len("model.ckpt-"):-len(".npz")]))
    return max(steps) if steps else None


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

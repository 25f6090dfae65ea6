"""TPU-native FFN training.

Two trainers over the same model/optimizer/metrics:

1. **Scan trainer** (`make_scan_train_step`, the flagship): for the
   fixed-offsets FOV policy, the entire multi-move training example — seed
   gating, FOV crops, forward/backward, optimizer update, and seed
   write-back for every offset — is ONE jitted XLA program (lax.scan over
   the offset list, lane-predicated). This removes the reference's
   per-move sess.run host round-trip (train.py:389-426) and the
   host<->device seed copies of its JAX path (jax/train.py:619-686). The
   optimizer updates once per offset with the valid lanes, matching the
   reference's update cadence.

2. **Host-loop trainer** (`make_fov_train_step` + examples.BatchExampleIter):
   exact reference semantics for the data-dependent policies
   (max_pred_offsets, fixed_offsets_window); one jitted step per FOV batch
   with host write-back.

Both are data-parallel over a jax.sharding.Mesh: batch sharded over the
'data' axis, params/optimizer state replicated; gradient all-reduce is
XLA-inserted (ICI on TPU slices).

Training semantics parity notes: gradients flow only through the current
FOV (the seed input is stop_gradient-ed, as the reference's TF placeholder
feed implies); loss is weighted sigmoid CE (model.py:115-125); gradients
are value-clipped +/-0.7 (model.py:142-145).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from scipy.special import logit as np_logit

from ffn_tpu.models import model_info as model_info_lib
from ffn_tpu.training import optimizer as optimizer_lib
from ffn_tpu.training import precision as precision_lib


@dataclasses.dataclass
class TrainConfig:
    fov_size: Sequence[int] = (33, 33, 33)          # xyz
    deltas: Sequence[int] = (8, 8, 8)               # xyz
    depth: int = 12
    features: int = 32
    batch_size: int = 8
    fov_moves: int = 1
    fov_policy: str = "fixed"   # fixed | max_pred_moves | no_step |
    #                             fixed_window
    # fixed_window: a move is valid when ANY seed voxel within this
    # radius of the move target (on the delta shell) clears the
    # threshold — follows thin processes the exact-voxel test loses
    # (ref jax/train.py:316-343 passes radius=8). Must be <= fov//2.
    fixed_window_radius: int = 8
    threshold: float = 0.9      # move gate (probability space)
    seed_pad: float = 0.05
    seed_init: float = 0.95
    image_mean: float = 128.0
    image_stddev: float = 33.0
    shuffle_fov_moves: bool = False
    ema_decay: float = 0.0      # 0 disables EMA params
    # Mixed precision: "f32" | "bf16" (MXU-native) | "f16" (dynamic loss
    # scaling). Params always stay f32; see training/precision.py.
    precision: str = "f32"
    # Packed transfers (scan trainer): upload uint8 image + uint8 object
    # mask only; seed canvases, label softening, normalization, and eval
    # metrics all happen on device. ~10x less host<->device traffic —
    # essential when the interconnect is slow relative to compute.
    packed_transfers: bool = True
    label_softness: float = 0.05   # inputs.soften_labels default
    # Rematerialize the forward pass in the backward (jax.checkpoint):
    # trades ~33% more FLOPs for O(depth) less activation memory, allowing
    # larger batch on a fixed HBM budget.
    remat: bool = False
    optimizer: optimizer_lib.OptimizerConfig = dataclasses.field(
        default_factory=optimizer_lib.OptimizerConfig)


def fov_moves(config: TrainConfig) -> int:
    # One extra move for better fill of the eval area (train.py:155-159).
    if config.fov_policy == "max_pred_moves":
        return config.fov_moves + 1
    return config.fov_moves


def train_canvas_size(info, config: TrainConfig) -> np.ndarray:
    return (np.array(info.input_seed_size)
            + np.array(info.deltas) * 2 * fov_moves(config))


def train_image_size(info, config: TrainConfig) -> np.ndarray:
    return (np.array(info.input_image_size)
            + np.array(info.deltas) * 2 * fov_moves(config))


def train_labels_size(info, config: TrainConfig) -> np.ndarray:
    return (np.array(info.pred_mask_size)
            + np.array(info.deltas) * 2 * fov_moves(config))


def train_eval_size(info, config: TrainConfig) -> np.ndarray:
    return (np.array(info.pred_mask_size)
            + np.array(info.deltas) * 2 * config.fov_moves)


def fixed_offsets_zyx(info, shuffle: bool = False,
                      rng: Optional[np.random.RandomState] = None
                      ) -> np.ndarray:
    """(S, 3) int32 offsets: center first, then the 26 delta shifts (zyx)."""
    shifts = model_info_lib.shift_collection(info.deltas)  # xyz
    shifts = [s[::-1] for s in shifts]
    if shuffle:
        rng = rng or np.random.RandomState(0)
        order = rng.permutation(len(shifts))
        shifts = [shifts[i] for i in order]
    return np.array([(0, 0, 0)] + shifts, np.int32)


def sigmoid_ce(logits, labels):
    """Numerically stable sigmoid cross entropy."""
    return (jnp.maximum(logits, 0) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


@dataclasses.dataclass
class ScanTrainState:
    params: Any
    opt_state: Any
    ema_params: Any
    step: int
    scale_state: Any = None   # loss-scale pytree (precision.py)


def create_train_state(model, config: TrainConfig, rng=None
                       ) -> tuple[ScanTrainState, optax.GradientTransformation]:
    params = model.init_params(rng)
    tx = optimizer_lib.optimizer_from_config(config.optimizer)
    opt_state = tx.init(params)
    # A deep copy: ema and params are both donated to the jitted step and
    # must not alias the same buffers.
    ema = (jax.tree.map(lambda x: jnp.array(x), params)
           if config.ema_decay > 0 else None)
    policy = precision_lib.get_policy(config.precision)
    return ScanTrainState(params=params, opt_state=opt_state,
                          ema_params=ema, step=0,
                          scale_state=precision_lib.loss_scale_for(policy)
                          ), tx


def make_scan_train_step(model, tx: optax.GradientTransformation,
                         config: TrainConfig,
                         mesh: Optional[Mesh] = None):
    """Builds the jitted scan train step.

    Step signature:
      (params, opt_state, ema_params, scale_state, seeds, images, labels,
       weights, offsets)
      -> (params, opt_state, ema_params, scale_state, seeds, metrics)

    seeds/images: (B, cz, cy, cx, 1) canvases (canvas = fov + 2*deltas*moves)
    labels/weights: (B, lz, ly, lx, 1) canvases (label canvas size)
    scale_state: loss-scale pytree from create_train_state (NoOp for
      f32/bf16 policies; DynamicLossScale for f16).
    offsets: (S, 3) int32 zyx moves, center first.
    metrics: dict of scalars + (S,) per-offset arrays for the tracker.

    Non-finite gradients skip the update (and shrink the dynamic loss
    scale), matching the reference's jmp contract (jax/train.py:195-223).
    """
    body, _ = _scan_body(model, tx, config)

    def train_step(params, opt_state, ema_params, scale_state, seeds,
                   images, labels, weights, offsets):
        carry = (params, opt_state, ema_params, scale_state, seeds, images,
                 labels, weights)
        carry, metrics = jax.lax.scan(body, carry, offsets)
        params, opt_state, ema_params, scale_state, seeds, *_ = carry
        return params, opt_state, ema_params, scale_state, seeds, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0, 1, 2, 3, 4))

    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P("data"))
    return jax.jit(
        train_step,
        in_shardings=(repl, repl, repl, repl, batched, batched, batched,
                      batched, repl),
        out_shardings=(repl, repl, repl, repl, batched, repl),
        donate_argnums=(0, 1, 2, 3, 4))


def make_scan_train_step_packed(model, tx: optax.GradientTransformation,
                                config: TrainConfig,
                                mesh: Optional[Mesh] = None):
    """The minimum-transfer scan train step (the flagship TPU path).

    Signature:
      (params, opt_state, ema_params, scale_state, image_u8, lom_u8,
       offsets)
      -> (params, opt_state, ema_params, scale_state, metrics)

    image_u8: (B, cz, cy, cx, 1) uint8 raw image canvas.
    lom_u8:   (B, lz, ly, lx, 1) uint8 {0,1} local object mask canvas.

    Everything else is built on device: image normalization
    (config.image_mean/stddev), soft labels (config.label_softness),
    unit weights, logit-space seed canvases, and — after the offset scan —
    the eval-region patch metrics (loss + confusion counts), so only
    scalars flow back to the host. Versus the explicit-canvas step this
    moves ~10x less data per step, which dominates step time on slow
    host<->device links.
    """
    body, dims = _scan_body(model, tx, config)
    info = model.info
    canvas_zyx = tuple(int(v)
                       for v in train_canvas_size(info, config)[::-1])
    eval_zyx = tuple(int(v) for v in train_eval_size(info, config)[::-1])
    pad_logit = float(np_logit(config.seed_pad))
    init_logit = float(np_logit(config.seed_init))
    soft = float(config.label_softness)

    def center_crop(arr, size_zyx):
        start = [0] + [(s - t) // 2
                       for s, t in zip(arr.shape[1:4], size_zyx)] + [0]
        return jax.lax.dynamic_slice(arr, start,
                                     (arr.shape[0], *size_zyx, 1))

    def train_step(params, opt_state, ema_params, scale_state, image_u8,
                   lom_u8, offsets):
        b = image_u8.shape[0]
        images = ((image_u8.astype(jnp.float32) - config.image_mean)
                  / config.image_stddev)
        labels = jnp.where(lom_u8 > 0, jnp.float32(1.0 - soft),
                           jnp.float32(soft))
        weights = jnp.ones_like(labels)
        seeds = jnp.full((b, *canvas_zyx, 1), pad_logit, jnp.float32)
        center = tuple(s // 2 for s in canvas_zyx)
        seeds = seeds.at[:, center[0], center[1], center[2], :].set(
            init_logit)

        carry = (params, opt_state, ema_params, scale_state, seeds, images,
                 labels, weights)
        carry, metrics = jax.lax.scan(body, carry, offsets)
        params, opt_state, ema_params, scale_state, seeds, *_ = carry

        # Eval-region patch metrics on device (tracker.add_patch math).
        lab_eval = center_crop(labels, eval_zyx)
        logit_eval = center_crop(seeds, eval_zyx)
        ce = sigmoid_ce(logit_eval, lab_eval)
        pred_pos = logit_eval > 0.0
        true_pos = lab_eval > 0.5
        metrics = dict(metrics)
        metrics["patch_loss"] = ce.mean()
        metrics["tp"] = jnp.sum(pred_pos & true_pos)
        metrics["fp"] = jnp.sum(pred_pos & ~true_pos)
        metrics["fn"] = jnp.sum(~pred_pos & true_pos)
        metrics["tn"] = jnp.sum(~pred_pos & ~true_pos)
        return params, opt_state, ema_params, scale_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0, 1, 2, 3))

    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P("data"))
    return jax.jit(
        train_step,
        in_shardings=(repl, repl, repl, repl, batched, batched, repl),
        out_shardings=(repl, repl, repl, repl, repl),
        donate_argnums=(0, 1, 2, 3))


def _scan_body(model, tx: optax.GradientTransformation,
               config: TrainConfig):
    """Shared per-offset scan body for both scan-step variants."""
    info = model.info
    fov_zyx = tuple(int(v) for v in info.input_seed_size[::-1])
    pred_zyx = tuple(int(v) for v in info.pred_mask_size[::-1])
    img_zyx = tuple(int(v) for v in info.input_image_size[::-1])
    move_t = float(np_logit(config.threshold))
    label_t = float(config.threshold)
    use_ema = config.ema_decay > 0
    apply_fn = (jax.checkpoint(model.apply) if config.remat
                else model.apply)

    def crop(arr, off, size_zyx):
        b = arr.shape[0]
        center = jnp.array([s // 2 for s in arr.shape[1:4]], jnp.int32)
        start = center + off - jnp.array([s // 2 for s in size_zyx],
                                         jnp.int32)
        return jax.lax.dynamic_slice(
            arr, (0, start[0], start[1], start[2], 0),
            (b, *size_zyx, 1))

    def center_value(arr, off):
        center = jnp.array([s // 2 for s in arr.shape[1:4]], jnp.int32)
        pos = center + off
        vals = jax.lax.dynamic_slice(
            arr, (0, pos[0], pos[1], pos[2], 0),
            (arr.shape[0], 1, 1, 1, 1))
        return vals.reshape(arr.shape[0])

    use_window = config.fov_policy == "fixed_window"
    if use_window:
        # Static delta-shell coordinates relative to the canvas center
        # (zyx): the voxels the windowed validity test may consult
        # (examples.fixed_offsets_window / ref examples.py:201-276).
        radius = int(config.fixed_window_radius)
        d = np.maximum(np.array(info.deltas[::-1], np.int64), 0)
        hz, hy, hx = np.meshgrid(*(np.arange(-v, v + 1) for v in d),
                                 indexing="ij")
        on_shell = ((np.abs(hz) == d[0]) | (np.abs(hy) == d[1])
                    | (np.abs(hx) == d[2]))
        shell_zyx = jnp.asarray(np.stack(
            [hz[on_shell], hy[on_shell], hx[on_shell]], axis=1),
            jnp.int32)

    def window_any(arr, off, level):
        """(B,) any value >= level on the delta shell within +-radius of
        the move target. Shell gather indices are static; only the
        in-window mask depends on the (traced) offset."""
        center = jnp.array([s // 2 for s in arr.shape[1:4]], jnp.int32)
        pts = center[None, :] + shell_zyx           # (Nh, 3) constant
        vals = arr[:, pts[:, 0], pts[:, 1], pts[:, 2], 0]   # (B, Nh)
        in_window = jnp.all(jnp.abs(shell_zyx - off[None, :]) <= radius,
                            axis=1)
        return jnp.any((vals >= level) & in_window[None, :], axis=1)

    def body(carry, off):
        (params, opt_state, ema_params, scale_state, seeds, images, labels,
         weights) = carry

        valid = center_value(seeds, off) >= move_t          # (B,)
        wanted = center_value(labels, off) >= label_t       # (B,)
        if use_window:
            # The center move keeps the exact-voxel test (the reference
            # windows only the actual delta shifts).
            is_center = jnp.all(off == 0)
            valid = jnp.where(is_center, valid,
                              window_any(seeds, off, move_t))
            wanted = jnp.where(is_center, wanted,
                               window_any(labels, off, label_t))

        seed_patch = crop(seeds, off, fov_zyx)
        img_patch = crop(images, off, img_zyx)
        lab_patch = crop(labels, off, pred_zyx)
        w_patch = crop(weights, off, pred_zyx)

        valid_f = valid.astype(jnp.float32)
        denom = jnp.maximum(valid_f.sum(), 1.0)

        def loss_fn(p):
            logits = apply_fn(p, img_patch,
                              jax.lax.stop_gradient(seed_patch))
            ce = sigmoid_ce(logits, lab_patch) * w_patch
            per_lane = ce.mean(axis=(1, 2, 3, 4))
            loss = (per_lane * valid_f).sum() / denom
            return scale_state.scale_loss(loss), (loss, logits)

        (_, (loss, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grads = scale_state.unscale(grads)
        finite = precision_lib.all_finite(grads)
        scale_state = scale_state.adjust(finite)

        updates, new_opt_state = tx.update(grads, opt_state, params)
        # No-op when no lane is active this offset, or grads blew up.
        # where (not multiply): NaN updates must not poison the params.
        do_update = (valid_f.sum() > 0) & finite
        updates = jax.tree.map(
            lambda u: jnp.where(do_update, u, jnp.zeros_like(u)), updates)
        new_params = optax.apply_updates(params, updates)
        opt_state = precision_lib.select_tree(do_update, new_opt_state,
                                              opt_state)

        params = new_params
        if use_ema:
            d = config.ema_decay
            ema_params = jax.tree.map(
                lambda e, q: d * e + (1.0 - d) * q, ema_params, params)

        # Seed write-back for valid lanes only (write region = pred size,
        # centered like the input seed window).
        write = crop(seeds, off, pred_zyx)
        keep = valid.reshape(-1, 1, 1, 1, 1)
        patch_out = logits if pred_zyx == fov_zyx else \
            crop_logits_to_pred(logits)
        write = jnp.where(keep, patch_out, write)
        center = jnp.array([s // 2 for s in seeds.shape[1:4]], jnp.int32)
        start = center + off - jnp.array([s // 2 for s in pred_zyx],
                                         jnp.int32)
        seeds = jax.lax.dynamic_update_slice(
            seeds, write, (0, start[0], start[1], start[2], 0))

        metrics = {
            "loss": loss,
            "active": valid_f.sum(),
            "correct": jnp.sum(valid & wanted),
            "missed": jnp.sum(wanted & ~valid),
            "spurious": jnp.sum(valid & ~wanted),
            "grads_finite": finite,
            "loss_scale": scale_state.scale,
        }
        return ((params, opt_state, ema_params, scale_state, seeds, images,
                 labels, weights), metrics)

    def crop_logits_to_pred(logits):
        delta = [(f - p) // 2 for f, p in zip(fov_zyx, pred_zyx)]
        return jax.lax.dynamic_slice(
            logits, (0, delta[0], delta[1], delta[2], 0),
            (logits.shape[0], *pred_zyx, 1))

    dims = {"fov_zyx": fov_zyx, "pred_zyx": pred_zyx, "img_zyx": img_zyx}
    return body, dims


def make_fov_train_step(model, tx: optax.GradientTransformation,
                        mesh: Optional[Mesh] = None, config=None):
    """Single-FOV jitted step for the host-loop trainer (exact reference
    semantics for data-dependent policies).

    Without config (legacy):
      (params, opt_state, seed, image, label, weights) ->
          (params, opt_state, updated_seed, loss)

    With config, the step carries the same training features as the scan
    trainer — EMA params, loss scaling with non-finite-update skipping:
      (params, opt_state, ema_params, scale_state, seed, image, label,
       weights) -> (params, opt_state, ema_params, scale_state,
                    updated_seed, loss)
    (Mixed-precision compute is a model property — construct the model
    with dtype=policy.compute_dtype as run_training does.)
    """
    if config is None:
        def train_step(params, opt_state, seed, image, labels, weights):
            def loss_fn(p):
                logits = model.apply(p, image,
                                     jax.lax.stop_gradient(seed))
                ce = sigmoid_ce(logits, labels) * weights
                return ce.mean(), logits

            (loss, logits), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, logits, loss

        donate = (0, 1)
        shard_sig = ("r", "r", "b", "b", "b", "b")
        out_sig = ("r", "r", "b", "r")
    else:
        use_ema = config.ema_decay > 0

        def train_step(params, opt_state, ema_params, scale_state, seed,
                       image, labels, weights):
            def loss_fn(p):
                logits = model.apply(p, image,
                                     jax.lax.stop_gradient(seed))
                ce = sigmoid_ce(logits, labels) * weights
                loss = ce.mean()
                return scale_state.scale_loss(loss), (loss, logits)

            (_, (loss, logits)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            grads = scale_state.unscale(grads)
            finite = precision_lib.all_finite(grads)
            scale_state = scale_state.adjust(finite)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            # where (not multiply): NaN updates must not poison params.
            updates = jax.tree.map(
                lambda u: jnp.where(finite, u, jnp.zeros_like(u)),
                updates)
            params = optax.apply_updates(params, updates)
            opt_state = precision_lib.select_tree(finite, new_opt_state,
                                                  opt_state)
            if use_ema:
                d = config.ema_decay
                ema_params = jax.tree.map(
                    lambda e, q: d * e + (1.0 - d) * q, ema_params,
                    params)
            return (params, opt_state, ema_params, scale_state, logits,
                    loss)

        donate = (0, 1, 2, 3)
        shard_sig = ("r", "r", "r", "r", "b", "b", "b", "b")
        out_sig = ("r", "r", "r", "r", "b", "r")

    if mesh is None:
        return jax.jit(train_step, donate_argnums=donate)
    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P("data"))
    pick = {"r": repl, "b": batched}
    return jax.jit(
        train_step,
        in_shardings=tuple(pick[s] for s in shard_sig),
        out_shardings=tuple(pick[s] for s in out_sig),
        donate_argnums=donate)


def make_data_mesh(devices=None, batch_size: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices.

    If batch_size is given, uses the largest device count that divides it
    (a batch smaller than the device pool shouldn't fail — it just doesn't
    use every device). Multi-process: the subset is chosen per process so
    every process contributes the same number of devices (a mesh that
    spans only one host can't carry a cross-host data axis).
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if batch_size is not None:
        by_proc = {}
        for d in devices:
            by_proc.setdefault(d.process_index, []).append(d)
        n_proc = len(by_proc)
        per_proc = min(len(v) for v in by_proc.values())
        if batch_size % n_proc:
            raise ValueError(
                f"batch_size {batch_size} must divide over {n_proc} "
                f"processes")
        local_batch = batch_size // n_proc
        while local_batch % per_proc:
            per_proc -= 1
        devices = [d for proc in sorted(by_proc)
                   for d in by_proc[proc][:per_proc]]
    return Mesh(np.array(devices), ("data",))


def make_seed_canvas(batch: int, canvas_zyx, pad: float, init: float
                     ) -> np.ndarray:
    """Batch of logit-space seed canvases with active center voxels."""
    from ffn_tpu.training import mask as mask_lib
    return np_logit(mask_lib.make_seed(canvas_zyx, batch, pad=pad,
                                       seed=init)).astype(np.float32)

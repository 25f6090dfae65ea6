"""Inference run orchestration: request proto -> canvases -> saved npz.

Parity with the reference's ffn/inference/runner.py (Runner :58-544), with
the executor tier replaced by the device-resident FloodFillEngine. Also
fixes the reference's latent defects: no phantom TPUExecutor, and
partial_segment_iters is always defined on fresh runs (runner.py:518-533).

Checkpoint formats accepted for model_checkpoint_path:
  - TF1 checkpoints (the reference's format, e.g. models/fib25/...) via
    ffn_tpu.models.tf_checkpoint;
  - .npz flax param archives written by ffn_tpu.models.save_params;
  - orbax checkpoint directories written by the ffn_tpu trainer.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Optional, Tuple

from absl import logging
import numpy as np

from ffn_tpu.inference import align as align_lib
from ffn_tpu.inference import canvas as canvas_lib
from ffn_tpu.inference import engine as engine_lib
from ffn_tpu.inference import movement
from ffn_tpu.inference import seed as seed_lib
from ffn_tpu.inference import storage
from ffn_tpu.inference.counters import Counters, timer_counter
from ffn_tpu.models import registry
from ffn_tpu.utils import bounding_box

Tuple3i = Tuple[int, int, int]


def load_model_params(path: str):
    """Loads model params from TF1 / npz / orbax checkpoints."""
    if os.path.exists(path + ".index"):
        from ffn_tpu.models import tf_checkpoint
        return tf_checkpoint.load_convstack_checkpoint(path)
    if path.endswith(".npz") and os.path.exists(path):
        from ffn_tpu.models import params_io
        return params_io.load_params_npz(path)
    if os.path.isdir(path):
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(os.path.abspath(path))
    raise ValueError(f"unrecognized checkpoint: {path}")


class Runner:
    """Runs FFN inference over subvolumes of a dataset."""

    ALL_MASKED = 1

    def __init__(self):
        self.counters = Counters()
        # Extra kwargs merged into every canvas construction (e.g.
        # max_iters_per_segment for BatchCanvas).
        self.canvas_defaults = {}
        self.executor = None  # kept for API compat; unused (no executor tier)
        self.engine: Optional[engine_lib.FloodFillEngine] = None
        self.canvases = {}
        self._image_volume = None
        self.init_seg_volume = None
        self.shift_mask_volume = None
        self._aligner = align_lib.Aligner()
        self._mask_volumes = {}

    def start(self, request, batch_size: Optional[int] = None,
              precision: Optional[str] = None):
        """Opens volumes and builds the model + engine from the request.

        precision: None (model default) | "int8" — the quantized MXU fast
        path (ops/quantized.py), ~2x throughput at slightly reduced
        fidelity (the TPU analog of the reference's
        auto_mixed_precision inference, doc/manual.md:99-105). Also
        selectable via the FFN_TPU_PRECISION env var.
        """
        self.request = request
        if batch_size is not None:
            self.request.batch_size = batch_size
        logging.debug("Received request:\n%s", request)

        if precision is None:
            precision = os.environ.get("FFN_TPU_PRECISION") or None

        if not os.path.exists(request.segmentation_output_dir):
            os.makedirs(request.segmentation_output_dir, exist_ok=True)

        with timer_counter(self.counters, "init-model"):
            model_class = registry.import_symbol(request.model_name)
            model_args = json.loads(request.model_args) \
                if request.model_args else {}
            self.model = model_class(**model_args)
            self._model_info = self.model.info

        with timer_counter(self.counters, "load-params"):
            if request.model_checkpoint_path:
                self.model_params = load_model_params(
                    request.model_checkpoint_path)
            else:
                # Checkpoint-free run (oracle/random-init models).
                self.model_params = self.model.init_params()

        if precision == "int8":
            from ffn_tpu.ops import quantized
            qmodel = quantized.QuantizedConvStack3DModel(self.model)
            self.model_params = qmodel.prepare(self.model_params)
            self.model = qmodel

        opts = request.inference_options
        from scipy.special import logit as _logit
        import jax.numpy as jnp
        from ffn_tpu.inference import hop_engine
        # HopEngine is a strict superset of FloodFillEngine: it adds the
        # device-resident movement programs used by HopBatchCanvas while
        # keeping the round-based programs for Canvas/BatchCanvas.
        # FFN_TPU_SEED_DTYPE=bf16 halves per-lane POM HBM (doubles the
        # feasible concurrent_requests) at a small fidelity cost.
        seed_dtype = (jnp.bfloat16
                      if os.environ.get("FFN_TPU_SEED_DTYPE") == "bf16"
                      else jnp.float32)
        self.engine = hop_engine.HopEngine(
            self.model, self.model_params,
            pad_value=float(_logit(opts.pad_value)),
            move_threshold=float(_logit(opts.move_threshold)),
            disco_seed_threshold=float(opts.disco_seed_threshold)
            if opts.HasField("disco_seed_threshold") else
            float(opts.disco_seed_threshold),
            seed_dtype=seed_dtype)

        self._image_volume = storage.decorated_volume(request.image)
        assert self._image_volume is not None

        if request.HasField("init_segmentation"):
            self.init_seg_volume = storage.decorated_volume(
                request.init_segmentation)
        if request.HasField("shift_mask"):
            self.shift_mask_volume = storage.decorated_volume(
                request.shift_mask)

        self._aligner = align_lib.Aligner(request.alignment_options)

    def stop(self):
        self.canvases.clear()
        self.engine = None

    def __del__(self):
        try:
            self.stop()
        except Exception:
            pass

    def make_restrictor(self, corner, subvol_size, image, alignment):
        """Assembles the movement restrictor for a subvolume."""
        kwargs = {}
        if self.request.masks:
            mask = storage.build_mask(self.request.masks, corner,
                                      subvol_size, self._mask_volumes,
                                      image, alignment)
            if np.all(mask):
                logging.info("Everything masked.")
                return self.ALL_MASKED
            kwargs["mask"] = mask

        if self.request.seed_masks:
            mask = storage.build_mask(self.request.seed_masks, corner,
                                      subvol_size, self._mask_volumes,
                                      image, alignment)
            if np.all(mask):
                logging.info("All seeds masked.")
                return self.ALL_MASKED
            kwargs["seed_mask"] = mask

        if self.shift_mask_volume is not None:
            s = self.request.shift_mask_scale
            shift_corner = np.array(corner) // s
            shift_size = -(-np.array(subvol_size) // s)
            shift_alignment = alignment.rescaled(1.0 / s)
            src_corner, src_size = shift_alignment.expand_bounds(
                shift_corner, shift_size, forward=False)
            src_corner, src_size = storage.clip_subvolume_to_bounds(
                src_corner, src_size, self.shift_mask_volume)
            src_end = src_corner + src_size
            expanded = self.shift_mask_volume[
                :, src_corner[0]:src_end[0], src_corner[1]:src_end[1],
                src_corner[2]:src_end[2]]
            shift_mask = np.array([
                shift_alignment.align_and_crop(src_corner, expanded[i],
                                               shift_corner, shift_size)
                for i in range(2)])
            shift_mask_fov = bounding_box.BoundingBox(
                self.request.shift_mask_fov)
            kwargs.update({
                "shift_mask": shift_mask,
                "shift_mask_fov": shift_mask_fov,
                "shift_mask_scale": self.request.shift_mask_scale,
                "shift_mask_threshold": self.request.shift_mask_threshold,
            })
        return movement.MovementRestrictor(**kwargs) if kwargs else None

    def load_subvolume_inputs(self, corner: Tuple3i, subvol_size: Tuple3i,
                              subvol_counters=None):
        """Fetches + aligns + normalizes one subvolume's inputs.

        Returns None when the subvolume is fully masked, else a dict with
        image (normalized f32), restrictor, alignment, dst_corner,
        src_corner, src_bbox, align_and_crop. Shared by make_canvas and
        the multi-subvolume driver (parallel.multi_canvas)."""
        if subvol_counters is None:
            subvol_counters = self.counters.get_sub_counters()
        with timer_counter(subvol_counters, "load-image"):
            logging.info("Process subvolume: %r", corner)
            alignment = self._aligner.generate_alignment(corner, subvol_size)
            dst_corner, dst_size = alignment.expand_bounds(
                corner, subvol_size, forward=True)
            src_corner, src_size = alignment.expand_bounds(
                dst_corner, dst_size, forward=False)
            src_corner, src_size = storage.clip_subvolume_to_bounds(
                src_corner, src_size, self._image_volume)

            def get_data_3d(volume, bbox):
                slc = bbox.to_slice3d()
                if volume.ndim == 4:
                    slc = np.index_exp[0:1] + slc
                data = volume[slc]
                if data.ndim == 4:
                    data = data.squeeze(axis=0)
                return data

            src_bbox = bounding_box.BoundingBox(
                start=src_corner[::-1], size=src_size[::-1])
            src_image = get_data_3d(self._image_volume, src_bbox)

            def align_and_crop(image):
                return alignment.align_and_crop(
                    src_corner, image, dst_corner, dst_size, forward=True)

            image = align_and_crop(src_image)
            logging.info("Image data loaded, shape: %r.", image.shape)

        restrictor = self.make_restrictor(dst_corner, dst_size, image,
                                          alignment)
        if restrictor == self.ALL_MASKED:
            return None

        image = ((image.astype(np.float32) - self.request.image_mean)
                 / self.request.image_stddev)
        return dict(image=image, restrictor=restrictor,
                    alignment=alignment, dst_corner=dst_corner,
                    src_corner=src_corner, src_bbox=src_bbox,
                    align_and_crop=align_and_crop,
                    counters=subvol_counters)

    def make_canvas(self, corner: Tuple3i, subvol_size: Tuple3i,
                    force_serial: bool = False, **canvas_kwargs):
        """Builds the Canvas for a subvolume; returns (canvas, alignment).

        force_serial picks the serial Canvas even when concurrent_requests
        asks for batched lanes (used by resegmentation, which needs
        keep_history and exact serial semantics).
        """
        inputs = self.load_subvolume_inputs(corner, subvol_size)
        if inputs is None:
            return None, None
        image = inputs["image"]
        restrictor = inputs["restrictor"]
        alignment = inputs["alignment"]
        dst_corner = inputs["dst_corner"]
        src_corner = inputs["src_corner"]
        src_bbox = inputs["src_bbox"]
        align_and_crop = inputs["align_and_crop"]
        subvol_counters = inputs["counters"]

        lanes = max(1, self.request.concurrent_requests)
        if force_serial:
            lanes = 1
        if lanes > 1:
            # Batched multi-seed canvas: the reference's
            # concurrent_requests threads become device lanes. The
            # device-resident movement path (HopBatchCanvas) is the
            # default for every restrictor type (shift masks fold in via
            # MovementRestrictor.dense_invalid_mask); hops=0 (via
            # canvas_defaults or FFN_TPU_HOPS) forces round-based.
            merged = {**self.canvas_defaults, **canvas_kwargs}
            hops = int(merged.pop("hops",
                                  os.environ.get("FFN_TPU_HOPS", "16")))
            use_hops = hops > 0
            common = dict(
                lanes=lanes,
                counters=subvol_counters,
                restrictor=restrictor,
                corner_zyx=dst_corner,
                checkpoint_path=storage.checkpoint_path(
                    self.request.segmentation_output_dir, corner),
                checkpoint_interval_sec=self.request.checkpoint_interval)
            if use_hops:
                from ffn_tpu.inference import hop_canvas
                canvas = hop_canvas.HopBatchCanvas(
                    self._model_info, self.engine, image,
                    self.request.inference_options,
                    hops=hops, **common, **merged)
            else:
                from ffn_tpu.inference import batch_canvas
                canvas = batch_canvas.BatchCanvas(
                    self._model_info, self.engine, image,
                    self.request.inference_options,
                    **common, **merged)
            del merged
        else:
            canvas = canvas_lib.Canvas(
                self._model_info, self.engine, image,
                self.request.inference_options,
                counters=subvol_counters,
                restrictor=restrictor,
                movement_policy_fn=movement.get_policy_fn(
                    self.request, self._model_info),
                checkpoint_path=storage.checkpoint_path(
                    self.request.segmentation_output_dir, corner),
                checkpoint_interval_sec=self.request.checkpoint_interval,
                corner_zyx=dst_corner,
                **canvas_kwargs)

        if self.request.HasField("init_segmentation"):
            canvas.init_segmentation_from_volume(
                self.init_seg_volume, src_corner, src_bbox.end[::-1],
                align_and_crop)
        return canvas, alignment

    def get_seed_policy(self, corner, subvol_size):
        policy_cls = getattr(seed_lib, self.request.seed_policy)
        kwargs = {"corner": corner, "subvol_size": subvol_size}
        if self.request.seed_policy_args:
            kwargs.update(json.loads(self.request.seed_policy_args))
        return functools.partial(policy_cls, **kwargs)

    def save_segmentation(self, canvas, alignment, target_path, prob_path):
        """Saves the segmentation (+ quantized POM) of a finished canvas."""
        def unalign_image(im3d):
            if alignment is None:
                return im3d
            return alignment.align_and_crop(
                canvas.corner_zyx, im3d, alignment.corner, alignment.size,
                forward=False)

        def unalign_origins(origins, canvas_corner):
            out = {}
            for key, value in origins.items():
                zyx = np.array(value.start_zyx) + canvas_corner
                zyx = alignment.transform(zyx[:, np.newaxis],
                                          forward=False).squeeze()
                zyx -= canvas_corner
                out[key] = value._replace(start_zyx=tuple(zyx))
            return out

        canvas.segmentation[canvas.segmentation < 0] = 0
        storage.save_subvolume(
            unalign_image(canvas.segmentation),
            unalign_origins(canvas.origins, np.array(canvas.corner_zyx)),
            target_path,
            request=self.request.SerializeToString(),
            counters=canvas.counters.dumps(),
            overlaps=canvas.overlaps)

        if canvas.seg_prob is not None:
            prob = unalign_image(canvas.seg_prob)
            with storage.atomic_file(prob_path) as fd:
                np.savez_compressed(fd, qprob=prob)

    def run(self, corner: Tuple3i, subvol_size: Tuple3i,
            reset_counters=True, keep_probability_maps=True):
        """Runs FFN inference over one subvolume (idempotent)."""
        if reset_counters:
            self.counters.reset()

        out_dir = self.request.segmentation_output_dir
        seg_path = storage.segmentation_path(out_dir, corner)
        prob_path = storage.object_prob_path(out_dir, corner)
        cpoint_path = storage.checkpoint_path(out_dir, corner)

        if os.path.exists(seg_path):
            return None

        canvas, alignment = self.make_canvas(
            corner, subvol_size,
            keep_probability_maps=keep_probability_maps)
        if canvas is None:
            return None

        partial_segment_iters = 0
        if os.path.exists(cpoint_path):
            partial_segment_iters = canvas.restore_checkpoint(cpoint_path)

        if self.request.alignment_options.save_raw:
            image_path = storage.subvolume_path(out_dir, corner, "align")
            with storage.atomic_file(image_path) as fd:
                np.savez_compressed(fd, im=canvas.image)

        self.canvases[tuple(corner)] = canvas
        canvas.segment_all(
            seed_policy=self.get_seed_policy(corner, subvol_size),
            partial_segment_iters=partial_segment_iters)
        self.save_segmentation(canvas, alignment, seg_path, prob_path)
        del self.canvases[tuple(corner)]

        try:
            os.remove(cpoint_path)
        except OSError:
            pass
        return canvas

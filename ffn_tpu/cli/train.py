#!/usr/bin/env python3
"""Trains an FFN on a TPU mesh.

CLI parity with the reference's train.py flag surface (the TF1/parameter-
server flags --master/--ps_tasks/--task are gone by design: data
parallelism is a jax.sharding Mesh inside one SPMD program; run this once
per host with jax.distributed for multi-host).
"""

from absl import app as absl_app
from absl import flags

from ffn_tpu.utils import platform as platform_lib

platform_lib.apply_env()

from ffn_tpu.training import optimizer as optimizer_lib
from ffn_tpu.training import train_lib
from ffn_tpu.training import train_loop

FLAGS = flags.FLAGS

flags.DEFINE_string("train_coords", None,
                    "Coordinate file (GZIP TFRecord of tf.train.Example, "
                    "or .npz with center/label_volume_name).")
flags.DEFINE_string("data_volumes", None,
                    "Image volumes as <name>:<h5_path>:<dataset>[,...]")
flags.DEFINE_string("label_volumes", None,
                    "Label volumes as <name>:<h5_path>:<dataset>[,...]")
flags.DEFINE_string("model_name", "convstack_3d.ConvStack3DFFNModel",
                    "Model class to train.")
flags.DEFINE_string("model_args", None,
                    "JSON dict of model constructor kwargs.")
flags.DEFINE_string("train_dir", "/tmp/ffn_tpu_train",
                    "Where to save checkpoints and summaries.")
flags.DEFINE_integer("batch_size", 4, "Global training batch size.")
flags.DEFINE_integer("max_steps", 10000, "Number of batches to train for.")
flags.DEFINE_float("image_mean", None, "Image mean to subtract.")
flags.DEFINE_float("image_stddev", None, "Image stddev to divide by.")
flags.DEFINE_list("permutable_axes", ["1", "2"],
                  "Spatial axes that may be permuted (0=z, 1=y, 2=x).")
flags.DEFINE_list("reflectable_axes", ["0", "1", "2"],
                  "Spatial axes that may be reflected.")
flags.DEFINE_enum("fov_policy", "fixed",
                  ["fixed", "max_pred_moves", "no_step", "fixed_window"],
                  "FOV movement policy during training.")
flags.DEFINE_integer("fov_moves", 1, "Number of FOV moves per axis.")
flags.DEFINE_integer("fixed_window_radius", 8,
                     "fixed_window policy: acceptance window radius on "
                     "the delta shell around each move target.")
flags.DEFINE_float("threshold", 0.9,
                   "Seed probability gate for FOV moves.")
flags.DEFINE_boolean("shuffle_fov_moves", False,
                     "Shuffle the order of the 26 fixed shifts per batch.")
flags.DEFINE_integer("summary_rate_secs", 120, "(compat; unused)")
flags.DEFINE_integer("summary_every_steps", 100,
                     "Steps between summary lines.")
flags.DEFINE_integer("checkpoint_every_steps", 1000,
                     "Steps between checkpoints.")
flags.DEFINE_float("ema_decay", 0.0, "EMA decay for params (0 disables).")
flags.DEFINE_enum("precision", "f32", ["f32", "bf16", "f16"],
                  "Mixed-precision policy: compute dtype for the conv "
                  "stack (params stay f32); f16 adds dynamic loss "
                  "scaling. Equivalent to the reference's jmp policies "
                  "(ffn/jax/train.py:195-223).")
flags.DEFINE_boolean("remat", False,
                     "Rematerialize forward activations in the backward "
                     "pass (less memory, ~33% more FLOPs).")
flags.DEFINE_string("coordinator_address", None,
                    "host:port of process 0; enables multi-host training "
                    "(jax.distributed). On TPU pods with automatic "
                    "bootstrap, pass 'auto' to initialize without "
                    "explicit addresses.")
flags.DEFINE_integer("num_processes", None,
                     "Total process count for multi-host training.")
flags.DEFINE_integer("process_id", None,
                     "This process's index for multi-host training.")
flags.DEFINE_float("stall_timeout_secs", 0.0,
                   "If no step completes for this long, dump stacks and "
                   "exit 42 for supervised restart (0 disables). Resumes "
                   "from the last checkpoint on relaunch.")
flags.DEFINE_integer("random_seed", 0, "Seed for sampling/augmentation.")
flags.DEFINE_enum("trainer", "scan", ["scan", "host_loop"],
                  "scan: whole example fused into one XLA program "
                  "(fastest on TPU); host_loop: reference-style per-FOV "
                  "stepping (smaller compile, supports data-dependent "
                  "policies).")

# Optimizer flags (reference ffn/training/optimizer.py surface).
flags.DEFINE_enum("optimizer", "sgd",
                  ["momentum", "sgd", "adagrad", "adam", "rmsprop"],
                  "Which optimizer to use.")
flags.DEFINE_float("learning_rate", 0.001, "Initial learning rate.")
flags.DEFINE_float("momentum", 0.9, "Momentum.")
flags.DEFINE_float("learning_rate_decay_factor", None,
                   "Learning rate decay factor.")
flags.DEFINE_integer("decay_steps", None, "Steps between LR decays.")
flags.DEFINE_float("rmsprop_decay", 0.9, "Decay term for RMSProp.")
flags.DEFINE_float("adam_beta1", 0.9, "Gradient decay term for Adam.")
flags.DEFINE_float("adam_beta2", 0.999, "Gradient^2 decay term for Adam.")
flags.DEFINE_float("epsilon", 1e-8, "Epsilon for RMSProp/Adam.")


def main(argv):
    del argv
    import json

    if FLAGS.coordinator_address:
        import jax
        if FLAGS.coordinator_address == "auto":
            jax.distributed.initialize()  # TPU pod auto-bootstrap
        else:
            jax.distributed.initialize(
                coordinator_address=FLAGS.coordinator_address,
                num_processes=FLAGS.num_processes,
                process_id=FLAGS.process_id)
    model_args = json.loads(FLAGS.model_args) if FLAGS.model_args else {}
    fov_size = tuple(model_args.get("fov_size", (33, 33, 33)))
    deltas = tuple(model_args.get("deltas", (8, 8, 8)))

    config = train_lib.TrainConfig(
        fov_size=fov_size, deltas=deltas,
        depth=model_args.get("depth", 12),
        features=model_args.get("features", 32),
        batch_size=FLAGS.batch_size,
        fov_moves=FLAGS.fov_moves,
        fov_policy=FLAGS.fov_policy,
        fixed_window_radius=FLAGS.fixed_window_radius,
        threshold=FLAGS.threshold,
        shuffle_fov_moves=FLAGS.shuffle_fov_moves,
        ema_decay=FLAGS.ema_decay,
        precision=FLAGS.precision,
        remat=FLAGS.remat,
        image_mean=FLAGS.image_mean,
        image_stddev=FLAGS.image_stddev,
        optimizer=optimizer_lib.OptimizerConfig(
            optimizer=FLAGS.optimizer,
            learning_rate=FLAGS.learning_rate,
            momentum=FLAGS.momentum,
            learning_rate_decay_factor=FLAGS.learning_rate_decay_factor,
            decay_steps=FLAGS.decay_steps,
            rmsprop_decay=FLAGS.rmsprop_decay,
            adam_beta1=FLAGS.adam_beta1,
            adam_beta2=FLAGS.adam_beta2,
            epsilon=FLAGS.epsilon))

    data = train_loop.DataConfig(
        train_coords=FLAGS.train_coords,
        data_volumes=FLAGS.data_volumes,
        label_volumes=FLAGS.label_volumes,
        image_mean=FLAGS.image_mean,
        image_stddev=FLAGS.image_stddev,
        permutable_axes=tuple(int(x) for x in FLAGS.permutable_axes),
        reflectable_axes=tuple(int(x) for x in FLAGS.reflectable_axes))

    loop = train_loop.LoopConfig(
        train_dir=FLAGS.train_dir,
        max_steps=FLAGS.max_steps,
        summary_every_steps=FLAGS.summary_every_steps,
        checkpoint_every_steps=FLAGS.checkpoint_every_steps,
        random_seed=FLAGS.random_seed,
        stall_timeout_secs=FLAGS.stall_timeout_secs)

    if FLAGS.trainer == "host_loop":
        train_loop.run_training_host_loop(
            FLAGS.model_name, FLAGS.model_args or "", config, data, loop)
    else:
        train_loop.run_training(FLAGS.model_name, FLAGS.model_args or "",
                                config, data, loop)



def app():
    flags.mark_flag_as_required("train_coords")
    flags.mark_flag_as_required("data_volumes")
    flags.mark_flag_as_required("label_volumes")
    flags.mark_flag_as_required("image_mean")
    flags.mark_flag_as_required("image_stddev")
    absl_app.run(main)


if __name__ == "__main__":
    app()

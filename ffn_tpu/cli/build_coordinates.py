#!/usr/bin/env python3
"""Builds a class-balanced, shuffled coordinate file for FFN training.

CLI parity with the reference's build_coordinates.py: reads partition
volumes, resamples every partition class to the max class count, shuffles,
and writes (center xyz, volume name) records. Output format is chosen by
extension: GZIP TFRecord of tf.train.Example (reference-compatible,
readable by TF) for anything else, or a .npz archive (the native fast
path: center (N, 3) int64 + label_volume_name (N,) arrays).
"""

from collections import defaultdict

import h5py
import numpy as np
from absl import app as absl_app
from absl import flags
from absl import logging

from ffn_tpu.proto import example_pb2
from ffn_tpu.utils import tfrecord

FLAGS = flags.FLAGS

flags.DEFINE_list("partition_volumes", None,
                  "Partition volumes as <name>:<hdf5_path>:<dataset>")
flags.DEFINE_string("coordinate_output", None,
                    "Path to write coordinates to (.npz for the native "
                    "format, anything else for GZIP TFRecord).")
flags.DEFINE_list("margin", None,
                  "(z, y, x) voxels near the volume border to exclude from "
                  "sampling; normally the FFN training FoV radius + deltas.")
flags.DEFINE_integer("random_seed", 0, "Seed for resampling/shuffling.")

IGNORE_PARTITION = 255


def main(argv):
    del argv
    totals = defaultdict(int)     # partition -> voxel count
    indices = defaultdict(list)   # partition -> [(vol_id, flat index)]
    vol_labels = []
    vol_shapes = []
    mz, my, mx = [int(x) for x in FLAGS.margin]

    for i, partvol in enumerate(FLAGS.partition_volumes):
        name, path, dataset = partvol.split(":")
        with h5py.File(path, "r") as f:
            partitions = f[dataset][mz:-mz, my:-my, mx:-mx]
            vol_shapes.append(partitions.shape)
            vol_labels.append(name)
            uniques, counts = np.unique(partitions, return_counts=True)
            for val, cnt in zip(uniques, counts):
                if val == IGNORE_PARTITION:
                    continue
                totals[val] += cnt
                flat = np.flatnonzero(partitions == val)
                indices[val].append(
                    np.stack([np.full_like(flat, i), flat], axis=1))

    logging.info("Partition counts:")
    for k, v in sorted(totals.items()):
        logging.info(" %d: %d", k, v)

    logging.info("Resampling and shuffling coordinates.")
    rng = np.random.RandomState(FLAGS.random_seed)
    max_count = max(totals.values())
    resampled = []
    for val in indices:
        rows = np.concatenate(indices[val], axis=0)
        rows = rows[rng.permutation(len(rows))]
        # Tile up to max_count (class balancing by oversampling).
        reps = -(-max_count // len(rows))
        rows = np.tile(rows, (reps, 1))[:max_count]
        resampled.append(rows)
    all_rows = np.concatenate(resampled, axis=0)
    rng.shuffle(all_rows)

    logging.info("Saving %d coordinates.", len(all_rows))
    # Precompute centers.
    centers = np.zeros((len(all_rows), 3), np.int64)
    names = np.empty(len(all_rows), dtype=object)
    for row_idx, (i, coord_idx) in enumerate(all_rows):
        z, y, x = np.unravel_index(coord_idx, vol_shapes[i])
        centers[row_idx] = (mx + x, my + y, mz + z)
        names[row_idx] = vol_labels[i]

    if FLAGS.coordinate_output.endswith(".npz"):
        np.savez_compressed(FLAGS.coordinate_output, center=centers,
                            label_volume_name=names.astype(str))
    else:
        with tfrecord.RecordWriter(FLAGS.coordinate_output,
                                   compression="GZIP") as writer:
            for center, name in zip(centers, names):
                ex = example_pb2.Example()
                ex.features.feature["center"].int64_list.value.extend(
                    int(v) for v in center)
                ex.features.feature["label_volume_name"].bytes_list.value\
                    .append(name.encode("utf-8"))
                writer.write(ex.SerializeToString())



def app():
    flags.mark_flag_as_required("margin")
    flags.mark_flag_as_required("coordinate_output")
    flags.mark_flag_as_required("partition_volumes")
    absl_app.run(main)


if __name__ == "__main__":
    app()

#!/usr/bin/env python3
"""Computes the partition map for FFN training coordinate sampling.

CLI parity with the reference's compute_partitions.py: same flags, same
h5 output layout (uint8 dataset, fill 255, bounding_boxes / partition_counts
attrs).
"""

import h5py
import numpy as np
from absl import app as absl_app
from absl import flags
from google.protobuf import text_format

from ffn_tpu.proto import inference_pb2
from ffn_tpu.training import partitions
from ffn_tpu.utils import bounding_box

FLAGS = flags.FLAGS

flags.DEFINE_string("input_volume", None,
                    "Segmentation volume as <hdf5_path>:<dataset>")
flags.DEFINE_string("output_volume", None,
                    "Volume in which to save the partition map, as "
                    "<hdf5_path>:<dataset>")
flags.DEFINE_list("thresholds", None,
                  "List of activation voxel fractions used for partitioning.")
flags.DEFINE_list("lom_radius", None,
                  "Local Object Mask (LOM) radii as (x, y, z).")
flags.DEFINE_list("id_whitelist", None,
                  "Whitelist of object IDs for which to compute the "
                  "partition numbers.")
flags.DEFINE_list("exclusion_regions", None,
                  "List of (x, y, z, r) tuples specifying spherical regions "
                  "to mark as excluded (255).")
flags.DEFINE_string("mask_configs", None,
                    "MaskConfigs proto in text format. Masked LOM locations "
                    "are marked as excluded.")
flags.DEFINE_integer("min_size", 10000,
                     "Minimum number of voxels for a segment to be "
                     "considered for partitioning.")


def main(argv):
    del argv
    path, dataset = FLAGS.input_volume.split(":")
    with h5py.File(path, "r") as f:
        segmentation = f[dataset]
        bboxes = []
        for name, v in segmentation.attrs.items():
            if name.startswith("bounding_boxes"):
                for bbox in v:
                    bboxes.append(bounding_box.BoundingBox(bbox[0], bbox[1]))
        if not bboxes:
            bboxes.append(bounding_box.BoundingBox(
                start=(0, 0, 0), size=segmentation.shape[::-1]))

        shape = segmentation.shape
        lom_radius = [int(x) for x in FLAGS.lom_radius]

        mask_configs = None
        if FLAGS.mask_configs:
            mask_configs = inference_pb2.MaskConfigs()
            text_format.Parse(FLAGS.mask_configs, mask_configs)

        exclusion_regions = None
        if FLAGS.exclusion_regions:
            exclusion_regions = []
            for region in FLAGS.exclusion_regions:
                exclusion_regions.append(
                    tuple(float(v) for v in region.split(",")))

        id_whitelist = None
        if FLAGS.id_whitelist:
            id_whitelist = [int(v) for v in FLAGS.id_whitelist]

        corner, parts = partitions.compute_partitions(
            segmentation[...], [float(x) for x in FLAGS.thresholds],
            lom_radius, id_whitelist, exclusion_regions, mask_configs,
            FLAGS.min_size)

    bboxes = partitions.adjust_bboxes(bboxes, np.array(lom_radius))

    path, dataset = FLAGS.output_volume.split(":")
    with h5py.File(path, "w") as f:
        ds = f.create_dataset(dataset, shape=shape, dtype=np.uint8,
                              fillvalue=255, chunks=True,
                              compression="gzip")
        s = parts.shape
        ds[corner[2]:corner[2] + s[0],
           corner[1]:corner[1] + s[1],
           corner[0]:corner[0] + s[2]] = parts
        ds.attrs["bounding_boxes"] = [(b.start, b.size) for b in bboxes]
        ds.attrs["partition_counts"] = np.array(
            np.unique(parts, return_counts=True))



def app():
    flags.mark_flag_as_required("input_volume")
    flags.mark_flag_as_required("output_volume")
    flags.mark_flag_as_required("thresholds")
    flags.mark_flag_as_required("lom_radius")
    absl_app.run(main)


if __name__ == "__main__":
    app()

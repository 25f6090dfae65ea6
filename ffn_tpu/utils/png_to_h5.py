#!/usr/bin/env python3
"""Stacks PNG slices into an HDF5 volume.

Parity with the reference's ffn/utils/png_to_h5.py (whose
scipy.misc.imread dependency was removed from scipy years ago; PIL here).
Usage: python -m ffn_tpu.utils.png_to_h5 <glob> <output.h5> [dataset]
"""

from __future__ import annotations

import glob
import sys

import h5py
import numpy as np


def png_stack_to_h5(png_glob: str, output_path: str,
                    dataset: str = "raw") -> tuple:
    from PIL import Image

    paths = sorted(glob.glob(png_glob))
    if not paths:
        raise ValueError(f"no files match {png_glob!r}")
    slices = [np.asarray(Image.open(p).convert("L")) for p in paths]
    volume = np.stack(slices, axis=0)
    with h5py.File(output_path, "w") as f:
        f.create_dataset(dataset, data=volume, compression="gzip")
    return volume.shape


def main(argv):
    png_glob, output = argv[1], argv[2]
    dataset = argv[3] if len(argv) > 3 else "raw"
    shape = png_stack_to_h5(png_glob, output, dataset)
    print(f"wrote {shape} volume to {output}:{dataset}")


if __name__ == "__main__":
    main(sys.argv)

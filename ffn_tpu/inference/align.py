"""Subvolume alignment hooks.

Functional parity with the reference's ffn/inference/align.py (identity
Alignment :20-150, Aligner factory :153-172). Only identity alignment is
implemented; the class exists as the extension point for dataset-specific
realignment.
"""

from __future__ import annotations

import numpy as np

from ffn_tpu.proto import inference_pb2


class Alignment:
    """Identity alignment over a subvolume (corner/size are ZYX)."""

    def __init__(self, corner, size):
        self.corner = np.asarray(corner)
        self.size = np.asarray(size)

    def expand_bounds(self, corner, size, forward: bool = True):
        """Expands bounds to grab enough data for (un)alignment. Identity."""
        del forward
        return np.asarray(corner), np.asarray(size)

    def transform(self, points: np.ndarray, forward: bool = True):
        """Transforms a (3, N) array of zyx points. Identity."""
        del forward
        return np.asarray(points)

    def transform_shift_mask(self, corner, scale, mask, forward: bool = True):
        del corner, scale, forward
        return mask

    def align_and_crop(self, src_corner, image, dst_corner, dst_size,
                       forward: bool = True):
        """Pastes `image` (at src_corner) into a dst_size canvas at dst_corner.

        Voxels of the destination not covered by the source are zero.
        """
        del forward
        src_corner = np.asarray(src_corner)
        dst_corner = np.asarray(dst_corner)
        dst_size = np.asarray(dst_size)
        src_size = np.array(image.shape)

        out = np.zeros(tuple(dst_size), dtype=image.dtype)
        # Overlap between [src_corner, src_corner+src_size) and
        # [dst_corner, dst_corner+dst_size) in global coordinates.
        lo = np.maximum(src_corner, dst_corner)
        hi = np.minimum(src_corner + src_size, dst_corner + dst_size)
        if np.any(hi <= lo):
            return out
        src_sel = tuple(slice(int(l - c), int(h - c))
                        for l, h, c in zip(lo, hi, src_corner))
        dst_sel = tuple(slice(int(l - c), int(h - c))
                        for l, h, c in zip(lo, hi, dst_corner))
        out[dst_sel] = image[src_sel]
        return out

    def rescaled(self, factor):
        factor = np.asarray(factor)
        return Alignment((self.corner * factor).astype(int),
                         (self.size * factor).astype(int))


class Aligner:
    """Creates Alignment objects per the AlignmentOptions proto."""

    def __init__(self,
                 opts: inference_pb2.AlignmentOptions | None = None):
        if opts is None:
            opts = inference_pb2.AlignmentOptions()
            opts.type = inference_pb2.AlignmentOptions.NO_ALIGNMENT
        if opts.type not in (
                inference_pb2.AlignmentOptions.NO_ALIGNMENT,
                inference_pb2.AlignmentOptions.UNKNOWN_ALIGNMENT):
            raise ValueError(f"unsupported alignment type: {opts.type}")
        self.opts = opts

    def generate_alignment(self, corner, size) -> Alignment:
        return Alignment(corner, size)

"""Volume I/O and the FFN subvolume storage layout.

Functional parity with the reference's ffn/inference/storage.py:
decorated_volume (:74), atomic_file (:116), quantize/dequantize (:137/:146),
save_subvolume (:154), subvolume path scheme (:174-241), build_mask (:323),
load_segmentation (:414). Differences by design:
  - coordinate-expression masks go through a restricted AST evaluator instead
    of bare eval() (the reference's storage.py:361 security footgun);
  - file IO is plain POSIX (no tf.io.gfile dependency);
  - tensorstore volumes are supported via the DecoratedVolume.tensorstore
    field the reference references but never defined.
"""

from __future__ import annotations

import ast
import json
import os
import pickle
import re
import tempfile
from collections import namedtuple
from contextlib import contextmanager
from typing import Any, Optional

import glob as globlib
import logging
import numpy as np

from ffn_tpu.inference import align as align_lib
from ffn_tpu.inference import segmentation
from ffn_tpu.utils import bounding_box

OriginInfo = namedtuple("OriginInfo", ["start_zyx", "iters", "walltime_sec"])
Volume = Any


class _CompatUnpickler(pickle.Unpickler):
    """Unpickler that maps foreign OriginInfo classes onto ours.

    Segmentations written by the reference implementation pickle
    OriginInfo under module paths that do not exist here (the internal
    google3 storage module, or the OSS ffn.inference.storage).  The
    field layout is identical (ref storage.py:35), so resolve any class
    named OriginInfo to this module's namedtuple.
    """

    def find_class(self, module, name):
        if name == "OriginInfo":
            return OriginInfo
        return super().find_class(module, name)


def _read_origins_entry(npz_path):
    """Reads the 'origins' entry of a segmentation npz with class compat.

    np.load's internal pickle.load cannot be given a custom unpickler,
    so re-open the zip member directly.  Returns the {id: OriginInfo}
    dict, or {} if the file has no origins entry.
    """
    import zipfile
    from numpy.lib import format as npformat
    with zipfile.ZipFile(npz_path) as z:
        if "origins.npy" not in z.namelist():
            return {}
        with z.open("origins.npy") as f:
            version = npformat.read_magic(f)
            npformat._read_array_header(f, version)
            # latin1: the reference artifact was pickled by Python 2.
            arr = _CompatUnpickler(f, encoding="latin1").load()
    return arr.item() if isinstance(arr, np.ndarray) else arr


class SyncAdapter:
    """Presents a TensorStore as a synchronous numpy-like array."""

    def __init__(self, tstore):
        self.tstore = tstore

    def __getitem__(self, ind):
        return np.array(self.tstore[ind])

    def __getattr__(self, attr):
        return getattr(self.tstore, attr)

    def __repr__(self):
        return f"{self.__class__.__name__}({self.tstore!r})"


class NumpyArray(np.ndarray):
    """ndarray with a default value and a clear() method.

    Dense in-memory storage for inference state.
    """

    def __new__(cls, default_value=0, **kwargs):
        ret = super().__new__(cls, **kwargs)
        ret.default_value = default_value
        return ret

    def __init__(self, *args, **kwargs):
        del args, kwargs
        self.clear()

    def clear(self):
        self[...] = self.default_value


def decorated_volume(settings, **kwargs) -> Volume:
    """Opens the volume described by a DecoratedVolume proto.

    Returns an object supporting __getitem__, .shape and .ndim (3d or 4d).
    """
    del kwargs
    which = settings.WhichOneof("volume_path")
    if which == "volinfo":
        raise NotImplementedError("VolumeStore operations not available.")
    elif which == "hdf5":
        import h5py  # deferred: not needed for tensorstore-only use

        path = settings.hdf5.split(":")
        if len(path) != 2:
            raise ValueError(
                "hdf5 volume_path should be file_path:dataset_path, got: "
                + settings.hdf5)
        volume = h5py.File(path[0], "r")[path[1]]
    elif which == "tensorstore":
        import tensorstore as ts  # deferred

        volume = SyncAdapter(ts.open(json.loads(settings.tensorstore)).result())
    else:
        raise ValueError("A volume_path must be set.")

    if settings.HasField("decorator_specs"):
        raise NotImplementedError("decorator_specs not supported.")
    if volume.ndim not in (3, 4):
        raise ValueError("Volume must be 3d or 4d.")
    return volume


@contextmanager
def atomic_file(path: str, mode: str = "w+b"):
    """Atomically writes a file: temp file + rename-into-place."""
    directory = os.path.dirname(path)
    if directory:
        os.makedirs(directory, exist_ok=True)
    tmp = tempfile.NamedTemporaryFile(mode=mode, dir=directory or None,
                                      delete=False)
    try:
        yield tmp
        tmp.flush()
        os.fsync(tmp.fileno())
        tmp.close()
        os.replace(tmp.name, path)
    except BaseException:
        tmp.close()
        try:
            os.unlink(tmp.name)
        except OSError:
            pass
        raise


def quantize_probability(prob: np.ndarray) -> np.ndarray:
    """Quantizes probabilities in [0, 1] to uint8; NaN maps to 0.

    Bucket k (k >= 1) covers ((k-1)/255, k/255]; matches the reference's
    np.digitize(prob, linspace(0, 1, 255)) semantics exactly.
    """
    ret = np.digitize(prob, np.linspace(0.0, 1.0, 255))
    ret[np.isnan(prob)] = 0
    return ret.astype(np.uint8)


def dequantize_probability(prob: np.ndarray) -> np.ndarray:
    """Inverse of quantize_probability; 0 maps back to NaN."""
    dq = 1.0 / 255
    ret = ((prob - 0.5) * dq).astype(np.float32)
    ret[prob == 0] = np.nan
    return ret


def save_subvolume(labels, origins, output_path, **misc_items):
    """Saves a segmented subvolume as seg-X_Y_Z.npz (keys: segmentation,
    origins, plus any misc items)."""
    seg = segmentation.reduce_id_bits(np.asarray(labels))
    with atomic_file(output_path) as fd:
        np.savez_compressed(fd, segmentation=seg, origins=origins,
                            **misc_items)


# ---------------------------------------------------------------------------
# Subvolume path scheme: <dir>/<x>/<y>/seg-X_Y_Z.{npz,prob,cpoint}
# (corner args are ZYX; filenames are XYZ).
# ---------------------------------------------------------------------------

def legacy_subvolume_path(output_dir, corner, suffix):
    return os.path.join(output_dir, "seg-%s.%s" % (
        "_".join(str(int(x)) for x in corner[::-1]), suffix))


def subvolume_path(output_dir, corner, suffix):
    return os.path.join(
        output_dir, str(int(corner[2])), str(int(corner[1])),
        "seg-%s.%s" % ("_".join(str(int(x)) for x in corner[::-1]), suffix))


def get_corner_from_path(path) -> tuple:
    """Extracts the (z, y, x) corner from a subvolume file name."""
    match = re.search(r"(\d+)_(\d+)_(\d+).npz", os.path.basename(path))
    if match is None:
        raise ValueError(f"Unrecognized path: {path}")
    coord = tuple(int(x) for x in match.groups())
    return coord[::-1]


def get_existing_corners(segmentation_dir):
    corners = []
    for path in globlib.glob(os.path.join(segmentation_dir,
                                          "seg-*_*_*.npz")):
        corners.append(get_corner_from_path(path))
    for path in globlib.glob(os.path.join(segmentation_dir,
                                          "*/*/seg-*_*_*.npz")):
        corners.append(get_corner_from_path(path))
    return corners


def checkpoint_path(output_dir, corner):
    return subvolume_path(output_dir, corner, "cpoint")


def segmentation_path(output_dir, corner):
    return subvolume_path(output_dir, corner, "npz")


def object_prob_path(output_dir, corner):
    return subvolume_path(output_dir, corner, "prob")


def legacy_segmentation_path(output_dir, corner):
    return legacy_subvolume_path(output_dir, corner, "npz")


def legacy_object_prob_path(output_dir, corner):
    return legacy_subvolume_path(output_dir, corner, "prob")


def get_existing_subvolume_path(segmentation_dir, corner,
                                allow_cpoint=False) -> Optional[str]:
    """Path to an existing subvolume (current or legacy layout), or None."""
    target = segmentation_path(segmentation_dir, corner)
    if os.path.exists(target):
        return target
    target = legacy_segmentation_path(segmentation_dir, corner)
    if os.path.exists(target):
        return target
    if allow_cpoint:
        target = checkpoint_path(segmentation_dir, corner)
        if os.path.exists(target):
            return target
    return None


def threshold_segmentation(segmentation_dir, corner, labels, threshold):
    """Zeroes label voxels whose saved POM is below `threshold`."""
    prob_path = object_prob_path(segmentation_dir, corner)
    if not os.path.exists(prob_path):
        prob_path = legacy_object_prob_path(segmentation_dir, corner)
        if not os.path.exists(prob_path):
            raise ValueError(f"Cannot find probability map {prob_path}")
    with open(prob_path, "rb") as f:
        data = np.load(f)
        if "qprob" not in data:
            raise ValueError("Invalid FFN probability map.")
        prob = dequantize_probability(data["qprob"])
        labels[prob < threshold] = 0


def load_origins(segmentation_dir, corner):
    target = get_existing_subvolume_path(segmentation_dir, corner, False)
    if target is None:
        raise ValueError(
            f"Segmentation not found: {segmentation_dir}, {corner}")
    with open(target, "rb") as f:
        data = np.load(f, allow_pickle=True)
        try:
            return data["origins"].item()
        except (ModuleNotFoundError, AttributeError, KeyError):
            return _read_origins_entry(target)


def clip_subvolume_to_bounds(corner, size, volume):
    """Clips (corner, size) (ZYX) to the volume bounds."""
    volume_size = volume.shape
    if volume.ndim == 4:
        volume_size = volume_size[1:]
    vol_box = bounding_box.BoundingBox(start=(0, 0, 0), size=volume_size)
    sub_box = bounding_box.BoundingBox(start=corner, size=size)
    clipped = bounding_box.intersection(vol_box, sub_box)
    return clipped.start, clipped.size


# ---------------------------------------------------------------------------
# Safe coordinate-expression masks.
# ---------------------------------------------------------------------------

_ALLOWED_AST = (
    ast.Expression, ast.BoolOp, ast.BinOp, ast.UnaryOp, ast.Compare,
    ast.Name, ast.Load, ast.Constant, ast.And, ast.Or, ast.Not,
    ast.Add, ast.Sub, ast.Mult, ast.Div, ast.FloorDiv, ast.Mod, ast.Pow,
    ast.BitAnd, ast.BitOr, ast.BitXor, ast.Invert, ast.USub, ast.UAdd,
    ast.Lt, ast.LtE, ast.Gt, ast.GtE, ast.Eq, ast.NotEq, ast.Tuple,
    ast.Call, ast.Attribute,
)

_ALLOWED_FUNCS = {
    "abs": np.abs, "minimum": np.minimum, "maximum": np.maximum,
    "sqrt": np.sqrt, "logical_and": np.logical_and,
    "logical_or": np.logical_or, "logical_not": np.logical_not,
}


def eval_coordinate_expression(expression: str, z, y, x):
    """Evaluates a coordinate mask expression over z/y/x index arrays.

    Replaces the reference's bare eval() (storage.py:361) with a restricted
    AST walk: only arithmetic/comparison/boolean operators, the names
    x/y/z/np, and a numpy function whitelist are allowed.
    """
    tree = ast.parse(expression, mode="eval")
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_AST):
            raise ValueError(
                f"disallowed syntax in coordinate expression: "
                f"{type(node).__name__}")
        if isinstance(node, ast.Name) and node.id not in (
                "z", "y", "x", "np") and node.id not in _ALLOWED_FUNCS:
            raise ValueError(f"disallowed name: {node.id}")
        if isinstance(node, ast.Attribute):
            if not (isinstance(node.value, ast.Name)
                    and node.value.id == "np"
                    and node.attr in _ALLOWED_FUNCS):
                raise ValueError("only whitelisted np.<func> attributes "
                                 "are allowed")

    namespace = {"z": z, "y": y, "x": x, **_ALLOWED_FUNCS}
    namespace["np"] = type("np_whitelist", (), _ALLOWED_FUNCS)
    code = compile(tree, "<coordinate_expression>", "eval")
    return eval(code, {"__builtins__": {}}, namespace)  # noqa: S307


def build_mask(masks, corner, subvol_size, mask_volume_map=None,
               image: Optional[np.ndarray] = None, alignment=None):
    """Builds a boolean exclusion mask from MaskConfig protos.

    Args:
      masks: iterable of MaskConfig protos
      corner: ZYX lower corner of the subvolume
      subvol_size: ZYX size of the subvolume
      mask_volume_map: optional cache dict {serialized volume proto: volume}
      image: image ndarray, required for image-source masks
      alignment: optional Alignment

    Returns:
      boolean ndarray of shape subvol_size.
    """
    final_mask = None
    if mask_volume_map is None:
        mask_volume_map = {}
    if alignment is None:
        alignment = align_lib.Alignment(corner, subvol_size)

    src_corner, src_size = alignment.expand_bounds(
        corner, subvol_size, forward=False)
    for config in masks:
        curr_mask = np.zeros(tuple(subvol_size), dtype=bool)
        source_type = config.WhichOneof("source")
        if source_type == "coordinate_expression":
            z, y, x = np.mgrid[
                src_corner[0]:src_corner[0] + src_size[0],
                src_corner[1]:src_corner[1] + src_size[1],
                src_corner[2]:src_corner[2] + src_size[2]]
            bool_mask = eval_coordinate_expression(
                config.coordinate_expression.expression, z, y, x)
            curr_mask |= alignment.align_and_crop(
                src_corner, bool_mask, corner, subvol_size)
        else:
            if source_type == "image":
                assert image is not None
                channels = config.image.channels
                mask = image[np.newaxis, ...]
            elif source_type == "volume":
                channels = config.volume.channels
                key = config.volume.mask.SerializeToString()
                if key not in mask_volume_map:
                    mask_volume_map[key] = decorated_volume(config.volume.mask)
                volume = mask_volume_map[key]
                clipped_corner, clipped_size = clip_subvolume_to_bounds(
                    src_corner, src_size, volume)
                clipped_end = clipped_corner + clipped_size
                mask = volume[:,
                              clipped_corner[0]:clipped_end[0],
                              clipped_corner[1]:clipped_end[1],
                              clipped_corner[2]:clipped_end[2]]
            else:
                raise ValueError(f"Unsupported mask source: {source_type}")

            for chan_config in channels:
                channel_mask = mask[chan_config.channel, ...]
                channel_mask = alignment.align_and_crop(
                    src_corner, channel_mask, corner, subvol_size)
                if chan_config.values:
                    bool_mask = np.isin(channel_mask,
                                        list(chan_config.values))
                else:
                    bool_mask = ((channel_mask >= chan_config.min_value) &
                                 (channel_mask <= chan_config.max_value))
                if chan_config.invert:
                    bool_mask = np.logical_not(bool_mask)
                curr_mask |= bool_mask

        if config.invert:
            curr_mask = np.logical_not(curr_mask)
        final_mask = curr_mask if final_mask is None else \
            (final_mask | curr_mask)
    return final_mask


def load_segmentation(segmentation_dir, corner, allow_cpoint=False,
                      threshold=None, split_cc=True, min_size=0,
                      mask_config=None):
    """Loads an FFN subvolume segmentation.

    Returns:
      (uint64 segmentation array, {id: OriginInfo}).
    """
    target = get_existing_subvolume_path(segmentation_dir, corner,
                                         allow_cpoint)
    if target is None:
        raise ValueError(
            f"Segmentation not found, {segmentation_dir}, {corner!r}.")

    with open(target, "rb") as f:
        data = np.load(f, allow_pickle=True)
        if "segmentation" not in data:
            raise ValueError(
                f"FFN NPZ file {target} does not contain a segmentation.")
        seg = data["segmentation"]
        try:
            origins = data["origins"].item()
        except (ModuleNotFoundError, AttributeError, KeyError):
            # Reference-written files pickle OriginInfo under module
            # paths that do not exist here; re-read with class compat.
            origins = _read_origins_entry(target)
        output = seg.astype(np.uint64)
        logging.info("loading segmentation from: %s", target)

        if threshold is not None:
            threshold_segmentation(segmentation_dir, corner, output,
                                   threshold)
        if mask_config is not None:
            mask = build_mask(mask_config.masks, corner, seg.shape)
            output[mask] = 0

        if split_cc or min_size:
            new_to_old = segmentation.clean_up(
                output, split_cc, min_size, return_id_map=True)
            origins = {new_id: origins[old_id]
                       for new_id, old_id in new_to_old.items()
                       if old_id in origins}
    return output, origins


def load_segmentation_from_source(source, corner):
    """load_segmentation driven by a SegmentationSource proto."""
    kwargs = {}
    if source.HasField("threshold"):
        kwargs["threshold"] = source.threshold
    if source.HasField("split_cc"):
        kwargs["split_cc"] = source.split_cc
    if source.HasField("min_size"):
        kwargs["min_size"] = source.min_size
    if source.HasField("mask"):
        kwargs["mask_config"] = source.mask
    return load_segmentation(source.directory, corner, **kwargs)

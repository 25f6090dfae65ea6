"""Training input pipeline: coordinates -> volume patches -> examples.

TF-free equivalent of the reference's ffn/training/inputs.py + the data
assembly in train.py:202-286: shard-expanded coordinate files (TFRecord
GZIP of tf.train.Example, read via ffn_tpu.utils.tfrecord, or .npy),
h5/numpy random patch reads, center-label -> LOM -> soften_labels, and
per-volume offset/scale normalization. Host-side numpy with a background
prefetch thread; the device never sees this code.
"""

from __future__ import annotations

import itertools
import os
import queue as queue_lib
import random
import re
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

from ffn_tpu.proto import example_pb2
from ffn_tpu.utils import tfrecord


def expand_shards(pattern: str) -> list[str]:
    """Expands 'path@N' into N shard file names (reference inputs.py:35-63)."""
    m = re.search(r"@(\d+)$", pattern)
    if not m:
        return [pattern]
    num_shards = int(m.group(1))
    base = pattern[:m.start()]
    return [f"{base}-{i:05d}-of-{num_shards:05d}" for i in range(num_shards)]


def _read_coordinate_file(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Loads one coordinate file into (centers (N,3) int64, names (N,))."""
    if path.endswith(".npy") or path.endswith(".npz"):
        data = np.load(path, allow_pickle=False)
        names = np.array([n.decode() if isinstance(n, bytes) else str(n)
                          for n in data["label_volume_name"]])
        return data["center"].astype(np.int64), names
    centers, names = [], []
    for blob in tfrecord.read_records(path):
        ex = example_pb2.Example()
        ex.ParseFromString(blob)
        feats = ex.features.feature
        centers.append(np.array(feats["center"].int64_list.value,
                                np.int64))
        names.append(feats["label_volume_name"].bytes_list.value[0]
                     .decode())
    return np.array(centers, np.int64).reshape(-1, 3), np.array(names)


class CoordinateStream:
    """Infinite (center_xyz, volume_name) stream over coordinate files
    with a vectorized fast-forward.

    Draw order (files shuffled per epoch, rows shuffled per file) matches
    the historical generator exactly — it consumes the RNG with the same
    calls — so checkpointed data cursors stay valid across versions.
    """

    def __init__(self, coordinates_file_pattern: str, shuffle: bool = True,
                 rng: Optional[random.Random] = None,
                 shard_index: int = 0, shard_count: int = 1):
        """shard_index/shard_count: yield only every shard_count-th
        coordinate of the global deterministic sequence, starting at
        shard_index. Multi-host training gives each process a DISJOINT
        shard of the same stream (all processes must use the same rng
        seed so the underlying permutation is shared) — the reference's
        @shards file split (ref inputs.py:35-63, jax/train.py:525) at
        row granularity."""
        self._files = []
        for pattern in coordinates_file_pattern.split(","):
            self._files.extend(expand_shards(pattern))
        self._shuffle = shuffle
        self._rng = rng if rng is not None else random.Random(0)
        if not 0 <= shard_index < shard_count:
            raise ValueError(f"bad shard {shard_index}/{shard_count}")
        self._shard_index = int(shard_index)
        self._shard_count = int(shard_count)
        self._global_seen = 0   # coords in fully processed files
        self._epoch_files: list = []
        self._centers: Optional[np.ndarray] = None
        self._names: Optional[np.ndarray] = None
        self._pos = 0

    def _advance_file(self):
        if not self._epoch_files:
            self._epoch_files = list(self._files)
            if self._shuffle:
                self._rng.shuffle(self._epoch_files)
        path = self._epoch_files.pop(0)
        centers, names = _read_coordinate_file(path)
        # Reproduce the historical generator's RNG consumption exactly:
        # it shuffled a list of row indices (npz) / records (tfrecord).
        idx = list(range(len(centers)))
        if self._shuffle:
            self._rng.shuffle(idx)
        idx = np.asarray(idx, np.int64)
        if self._shard_count > 1:
            # This file covers global positions
            # [_global_seen, _global_seen + n); keep the rows belonging
            # to this shard (position % shard_count == shard_index).
            first = (self._shard_index - self._global_seen) \
                % self._shard_count
            idx = idx[first::self._shard_count]
        self._global_seen += len(centers)
        self._centers = centers[idx]
        self._names = names[idx]
        self._pos = 0

    def _exhausted(self) -> bool:
        return self._centers is None or self._pos >= len(self._centers)

    def __iter__(self):
        return self

    def __next__(self) -> tuple[np.ndarray, str]:
        while self._exhausted():
            self._advance_file()
        center = self._centers[self._pos]
        name = self._names[self._pos]
        self._pos += 1
        return center, str(name)

    def skip_valid(self, n: int, valid_fn) -> None:
        """Advances past the next n coordinates for which
        valid_fn(centers (M,3), names (M,)) -> bool (M,) holds, without
        yielding them. Vectorized: O(files touched), not O(n)."""
        while n > 0:
            while self._exhausted():
                self._advance_file()
            valid = np.asarray(
                valid_fn(self._centers[self._pos:], self._names[self._pos:]))
            passed = np.cumsum(valid)
            total = int(passed[-1]) if len(passed) else 0
            if total < n:
                n -= total
                self._pos = len(self._centers)
            else:
                self._pos += int(np.searchsorted(passed, n)) + 1
                n = 0


def load_patch_coordinates(coordinates_file_pattern: str,
                           shuffle: bool = True,
                           rng: Optional[random.Random] = None
                           ) -> Iterator[tuple[np.ndarray, str]]:
    """Yields (center_xyz int64[3], volume_name) from coordinate files.

    Supports the reference's GZIP TFRecord format and .npy/.npz archives
    with 'center' (N, 3) and 'label_volume_name' (N,) arrays.
    """
    return CoordinateStream(coordinates_file_pattern, shuffle=shuffle,
                            rng=rng)


def parse_volume_map(spec: str) -> dict:
    """Parses 'volname:path:dataset[,volname:path:dataset...]' into open
    h5 datasets (reference train.py:205-213)."""
    import h5py

    volume_map = {}
    for vol in spec.split(","):
        volname, path, dataset = vol.split(":")
        volume_map[volname] = h5py.File(path, "r")[dataset]
    return volume_map


def load_from_numpylike(coord_xyz, volume, size_xyz) -> np.ndarray:
    """Reads a centered patch from a numpy-like volume.

    Args:
      coord_xyz: (x, y, z) center
      volume: 3d (z, y, x) or 4d (c, z, y, x) array-like
      size_xyz: (x, y, z) patch size

    Returns:
      (z, y, x) ndarray (channel 0 for 4d volumes).
    """
    size = np.array(size_xyz[::-1])
    start = np.array(coord_xyz[::-1]) - size // 2
    sel = tuple(slice(int(s), int(s + d)) for s, d in zip(start, size))
    if getattr(volume, "ndim", 3) == 4:
        sel = (0,) + sel
    return np.asarray(volume[sel])


def soften_labels(bool_labels: np.ndarray, softness: float = 0.05
                  ) -> np.ndarray:
    """Converts a boolean object mask into soft labels (0.05 / 0.95)."""
    return np.where(bool_labels, np.float32(1.0 - softness),
                    np.float32(softness))


def center_lom(labels: np.ndarray) -> np.ndarray:
    """Local object mask: voxels sharing the center voxel's nonzero label."""
    center = tuple(np.array(labels.shape) // 2)
    center_label = labels[center]
    return np.logical_and(labels > 0, labels == center_label)


def coordinates_in_bounds(coord_xyz, size_xyz, volume_shape_zyx) -> bool:
    """Whether a centered patch fits entirely inside a volume."""
    size = np.array(size_xyz[::-1])
    start = np.array(coord_xyz[::-1]) - size // 2
    end = start + size
    shape = np.array(volume_shape_zyx[-3:])
    return bool(np.all(start >= 0) and np.all(end <= shape))


class ExampleLoader:
    """Assembles (image, soft labels, weights, coord, volname) examples."""

    def __init__(self, coordinates_file_pattern: str,
                 image_volume_map: dict, label_volume_map: dict,
                 image_size_xyz, label_size_xyz,
                 image_mean: float, image_stddev: float,
                 offset_scale_map: Optional[dict] = None,
                 augment: Optional[Callable] = None,
                 shuffle: bool = True, seed: int = 0,
                 raw: bool = False,
                 shard_index: int = 0, shard_count: int = 1):
        self._coords = CoordinateStream(
            coordinates_file_pattern, shuffle=shuffle,
            rng=random.Random(seed), shard_index=shard_index,
            shard_count=shard_count)
        # Debug/verification hook: append one "volname x y z" line per
        # example actually handed out (multi-host tests use it to prove
        # shard disjointness and exact resume).
        self._coord_log = os.environ.get("FFN_TPU_COORD_LOG") or None
        self._image_volume_map = image_volume_map
        self._label_volume_map = label_volume_map
        self._image_size = image_size_xyz
        self._label_size = label_size_xyz
        self._image_mean = image_mean
        self._image_stddev = image_stddev
        self._offset_scale_map = offset_scale_map or {}
        self._augment = augment
        self._lock = threading.Lock()
        # raw mode: emit uint8 image + uint8 object mask (no normalization
        # or label softening — those happen on device in the packed scan
        # trainer, train_lib.make_scan_train_step_packed).
        self._raw = raw

    def _valid_mask(self, centers: np.ndarray,
                    names: np.ndarray) -> np.ndarray:
        """Vectorized version of __call__'s bounds filter."""
        ok = np.zeros(len(centers), bool)
        for name in np.unique(names):
            sel = names == name
            c_zyx = centers[sel][:, ::-1]
            good = np.ones(int(sel.sum()), bool)
            for vol, size_xyz in (
                    (self._image_volume_map[str(name)], self._image_size),
                    (self._label_volume_map[str(name)], self._label_size)):
                size = np.asarray(size_xyz[::-1])
                shape = np.asarray(vol.shape[-3:])
                start = c_zyx - size // 2
                good &= np.all(start >= 0, axis=1) & \
                    np.all(start + size <= shape, axis=1)
            ok[sel] = good
        return ok

    def fast_forward(self, n_examples: int) -> None:
        """Advances the coordinate stream past n in-bounds examples.

        Replays the deterministic draw+filter sequence WITHOUT loading any
        patch data, so a resumed run continues from the exact coordinate
        the interrupted run would have used next (no replays, no skips).
        Role of the reference's t5x DatasetCheckpointHandler
        (ffn/jax/train.py:423-505), done the coordinate-stream way;
        vectorized, so even multi-million-example cursors restore in
        seconds.
        """
        if n_examples > 0:
            self._coords.skip_valid(n_examples, self._valid_mask)

    def __call__(self):
        while True:
            with self._lock:
                coord, volname = next(self._coords)
            image_vol = self._image_volume_map[volname]
            label_vol = self._label_volume_map[volname]
            if not coordinates_in_bounds(coord, self._image_size,
                                         image_vol.shape):
                continue
            if not coordinates_in_bounds(coord, self._label_size,
                                         label_vol.shape):
                continue

            if self._coord_log:
                with open(self._coord_log, "a") as f:
                    f.write(f"{volname} {coord[0]} {coord[1]} "
                            f"{coord[2]}\n")
            labels = load_from_numpylike(coord, label_vol, self._label_size)
            lom = center_lom(labels)
            image = load_from_numpylike(coord, image_vol, self._image_size)

            if self._raw:
                image = image.astype(np.uint8)[np.newaxis, ..., np.newaxis]
                mask = lom.astype(np.uint8)[np.newaxis, ..., np.newaxis]
                if self._augment is not None:
                    image, mask = self._augment(image, mask)
                return image, mask, None, coord, volname

            soft = soften_labels(lom)
            offset, scale = self._offset_scale_map.get(
                volname, (self._image_mean, self._image_stddev))
            image = (image.astype(np.float32) - offset) / scale

            # (1, z, y, x, 1) layout.
            image = image[np.newaxis, ..., np.newaxis]
            soft = soft[np.newaxis, ..., np.newaxis].astype(np.float32)
            weights = np.ones_like(soft)

            if self._augment is not None:
                image, soft, weights = self._augment(image, soft, weights)
            return image, soft, weights, coord, volname


class PrefetchingLoader:
    """Wraps a loader callable with a background prefetch queue.

    `consumed` counts examples handed to the CALLER (not merely
    prefetched); it is the data-iterator cursor saved in training
    checkpoints.
    """

    def __init__(self, loader: Callable, capacity: int = 16):
        self._loader = loader
        self._queue = queue_lib.Queue(maxsize=capacity)
        self.consumed = 0
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _fill(self):
        while True:
            try:
                item = (True, self._loader())
            except BaseException as e:  # surface in the consumer thread
                self._queue.put((False, e))
                return
            self._queue.put(item)

    def __call__(self):
        ok, item = self._queue.get()
        if not ok:
            raise RuntimeError("prefetch loader thread failed") from item
        self.consumed += 1
        return item

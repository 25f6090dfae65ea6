"""Thread-safe counters and timers for inference instrumentation.

Functional parity with the reference's ffn/inference/inference_utils.py
(StatCounter :32, Counters :90, timer_counter :153, TimedIter :181), plus the
CLAHE-free histogram matching helpers (:201-253) implemented on scipy only.
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict
from typing import Iterable, Iterator, Optional

import numpy as np

from ffn_tpu.proto import inference_pb2

MSEC_IN_SEC = 1000


class StatCounter:
    """A thread-safe integer counter that also propagates to a parent."""

    def __init__(self, update_cb=None, parent: Optional["StatCounter"] = None):
        self._value = 0
        self._lock = threading.Lock()
        self._update_cb = update_cb
        self._parent = parent

    def IncrementBy(self, x, export=True):
        with self._lock:
            self._value += int(x)
        if export and self._update_cb:
            self._update_cb()
        if self._parent is not None:
            self._parent.IncrementBy(x, export=export)

    def Increment(self, export=True):
        self.IncrementBy(1, export=export)

    def Set(self, x):
        with self._lock:
            self._value = int(x)
        if self._update_cb:
            self._update_cb()

    @property
    def value(self) -> int:
        with self._lock:
            return self._value

    def Get(self) -> int:
        return self.value

    def Reset(self):
        self.Set(0)


class Counters:
    """A registry of named StatCounters with optional parent propagation."""

    def __init__(self, parent: Optional["Counters"] = None):
        self._lock = threading.Lock()
        self._parent = parent
        self._counters: dict[str, StatCounter] = {}

    def __getitem__(self, name: str) -> StatCounter:
        with self._lock:
            counter = self._counters.get(name)
            if counter is None:
                parent_counter = None
                if self._parent is not None:
                    parent_counter = self._parent[name]
                counter = StatCounter(parent=parent_counter)
                self._counters[name] = counter
            return counter

    def get_sub_counters(self) -> "Counters":
        return Counters(parent=self)

    def reset(self):
        with self._lock:
            for counter in self._counters.values():
                counter.Reset()

    def __iter__(self):
        with self._lock:
            return iter(sorted(self._counters.items()))

    def dump(self, path: str):
        with open(path, "w") as f:
            for name, counter in self:
                f.write(f"{name}: {counter.value}\n")

    def dumps(self) -> bytes:
        """Serializes all counters into a TaskCounters proto string."""
        proto = inference_pb2.TaskCounters()
        for name, counter in self:
            entry = proto.counters.add()
            entry.name = name
            entry.value = counter.value
        return proto.SerializeToString()

    def loads(self, encoded: bytes):
        proto = inference_pb2.TaskCounters()
        encoded = bytes(encoded)
        try:
            proto.ParseFromString(encoded)
        except Exception:
            # Legacy npz checkpoints stored the proto as an S-dtype scalar,
            # which silently strips trailing NUL bytes — i.e. a final
            # varint 0. Re-append up to two zero bytes to recover.
            for pad in (b"\x00", b"\x00\x00"):
                try:
                    proto.ParseFromString(encoded + pad)
                    break
                except Exception:
                    continue
            else:
                raise
        for entry in proto.counters:
            self[entry.name].Set(entry.value)

    def dumps_np(self) -> "np.ndarray":
        """dumps() as a uint8 array — safe to round-trip through npz
        (S-dtype scalars strip trailing NULs; uint8 arrays do not)."""
        import numpy as np
        return np.frombuffer(self.dumps(), dtype=np.uint8)

    def loads_np(self, obj):
        """Accepts dumps_np() arrays or legacy bytes scalars."""
        import numpy as np
        arr = np.asarray(obj)
        if arr.dtype == np.uint8:
            self.loads(arr.tobytes())
        else:
            self.loads(arr.item() if arr.shape == () else bytes(obj))


@contextlib.contextmanager
def timer_counter(counters: Counters, name: str):
    """Counts calls ('<name>-calls') and wall time ('<name>-time-ms')."""
    t0 = time.time()
    try:
        yield
    finally:
        dt = time.time() - t0
        counters[name + "-calls"].Increment()
        counters[name + "-time-ms"].IncrementBy(dt * MSEC_IN_SEC)


class TimedIter:
    """Wraps an iterator, charging the time of each next() to a counter."""

    def __init__(self, it: Iterable, counters: Counters, name: str):
        self.it = iter(it)
        self.counters = counters
        self.name = name

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        with timer_counter(self.counters, self.name):
            return next(self.it)


def compute_histogram_lut(source_hist: np.ndarray,
                          ref_hist: np.ndarray) -> np.ndarray:
    """Returns a uint8 LUT matching source_hist's CDF to ref_hist's CDF."""
    src_cdf = np.cumsum(source_hist).astype(np.float64)
    src_cdf /= max(src_cdf[-1], 1.0)
    ref_cdf = np.cumsum(ref_hist).astype(np.float64)
    ref_cdf /= max(ref_cdf[-1], 1.0)
    lut = np.searchsorted(ref_cdf, src_cdf, side="left")
    return np.clip(lut, 0, 255).astype(np.uint8)


def match_histogram(image: np.ndarray, reference_histogram: np.ndarray,
                    mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Histogram-matches a uint8 image to a reference histogram."""
    if mask is not None:
        vals = image[~mask]
    else:
        vals = image
    hist = np.bincount(vals.ravel(), minlength=256)[:256]
    lut = compute_histogram_lut(hist, reference_histogram)
    return lut[image]

"""ctypes bindings for the native (C++) components.

Import `edt_native` from here; it is None when libffn_native.so has not
been built (python -m ffn_tpu.native.build). Callers fall back to scipy.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "libffn_native.so")


class _EdtNative:
    def __init__(self, lib):
        self._lib = lib
        self._lib.edt_f32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        self._lib.edt_f32.restype = None

    def edt(self, binary: np.ndarray, anisotropy, n_threads: int = 0
            ) -> np.ndarray:
        """Euclidean DT of a 3d binary array (distance to nearest zero)."""
        binary = np.ascontiguousarray(binary, dtype=np.uint8)
        if binary.ndim == 2:
            binary = binary[np.newaxis, ...]
            anisotropy = (1.0,) + tuple(anisotropy)
            squeeze = True
        else:
            squeeze = False
        assert binary.ndim == 3
        if n_threads <= 0:
            n_threads = os.cpu_count() or 1
        shape = np.array(binary.shape, np.int64)
        aniso = np.array(anisotropy, np.float32)
        out = np.empty(binary.shape, np.float32)
        self._lib.edt_f32(
            binary.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            shape.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            aniso.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            int(n_threads))
        return out[0] if squeeze else out


def _load():
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        return _EdtNative(ctypes.CDLL(_LIB_PATH))
    except OSError:
        return None


edt_native = _load()

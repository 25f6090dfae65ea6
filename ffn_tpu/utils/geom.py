"""Conversions between 3-vectors: protos, tuples and numpy arrays.

Functional parity with the reference's ffn/utils/geom_utils.py (see
/root/reference/ffn/utils/geom_utils.py:21-81).
"""

from __future__ import annotations

import numpy as np

from ffn_tpu.proto import vector_pb2


def to_vector3j(vec) -> vector_pb2.Vector3j:
    """Converts a 3-sequence / ndarray / Vector3j into a Vector3j proto."""
    if isinstance(vec, vector_pb2.Vector3j):
        out = vector_pb2.Vector3j()
        out.CopyFrom(vec)
        return out
    arr = np.asarray(vec)
    if arr.shape != (3,):
        raise ValueError(f"expected a 3-vector, got shape {arr.shape}")
    out = vector_pb2.Vector3j()
    out.x, out.y, out.z = int(arr[0]), int(arr[1]), int(arr[2])
    return out


def to_numpy3(vec, dtype=np.int64) -> np.ndarray:
    """Converts a Vector3j proto or 3-sequence into a numpy (3,) array."""
    if isinstance(vec, (vector_pb2.Vector3j, vector_pb2.Vector3f,
                        vector_pb2.Vector3d)):
        return np.array([vec.x, vec.y, vec.z], dtype=dtype)
    arr = np.asarray(vec, dtype=dtype)
    if arr.shape != (3,):
        raise ValueError(f"expected a 3-vector, got shape {arr.shape}")
    return arr


def to_tuple3(vec) -> tuple:
    """Converts a Vector3j proto or 3-sequence into a plain tuple."""
    return tuple(int(v) for v in to_numpy3(vec))


# Aliases matching the reference's naming for drop-in usage.
ToVector3j = to_vector3j
ToNumpy3Vector = to_numpy3
ToTuple3 = to_tuple3

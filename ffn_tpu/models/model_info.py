"""Geometric metadata for FFN models.

Parity with the reference's ffn/training/model.py:25-46 (ModelInfo) and
:75-81 (the 26-neighbor shift collection used by fixed-step training
policies). All triples are XYZ, matching the reference convention.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np


@dataclasses.dataclass
class ModelInfo:
    """Basic geometric information about an FFN network (arrays are XYZ)."""

    # How far the field of view moves along each axis.
    deltas: np.ndarray
    # Size of the predicted patch returned by the model.
    pred_mask_size: np.ndarray
    # Sizes of the seed and image input subvolumes for one prediction step.
    input_seed_size: np.ndarray
    input_image_size: np.ndarray
    # Whether the model's output is added to the input seed by the caller
    # (True for all models in this package).
    additive: bool = False

    def __post_init__(self):
        self.deltas = np.asarray(self.deltas)
        self.pred_mask_size = np.asarray(self.pred_mask_size)
        self.input_seed_size = np.asarray(self.input_seed_size)
        self.input_image_size = np.asarray(self.input_image_size)


def shift_collection(deltas: Sequence[int]) -> list[tuple[int, int, int]]:
    """All 26 (dx, dy, dz) single-step shifts for the fixed-offsets policy."""
    shifts = []
    for dx in (-deltas[0], 0, deltas[0]):
        for dy in (-deltas[1], 0, deltas[1]):
            for dz in (-deltas[2], 0, deltas[2]):
                if dx == 0 and dy == 0 and dz == 0:
                    continue
                shifts.append((dx, dy, dz))
    return shifts

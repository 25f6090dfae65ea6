"""Orthogonal-plane visualization of 3d volumes.

Same public contract as the reference's
ffn/utils/ortho_plane_visualization.py:28-134 (plane order yx/zx/zy, panel
layout with the zy plane transposed into the top-right, red=negative /
blue=positive / green=NaN color coding), implemented around an explicit
layout table and a signed-channel decomposition.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from scipy.special import expit


def _dim_crosshair(plane: np.ndarray, row: int, col: int) -> np.ndarray:
    """Returns a copy of `plane` with its crosshair row/column dimmed."""
    out = plane.copy()
    out[row, ...] = out[row, ...] * 0.5
    out[:, col, ...] = out[:, col, ...] * 0.5
    return out


def cut_ortho_planes(vol: np.ndarray,
                     center: Optional[Sequence[int]] = None,
                     cross_hair: bool = False) -> list:
    """Cuts the three axis-orthogonal planes of a zyx(c) volume through
    `center` (defaults to the volume center). Returns [yx, zx, zy]."""
    if center is None:
        center = tuple(int(s) // 2 for s in vol.shape[:3])
    cz, cy, cx = (int(v) for v in center[:3])

    # (plane, crosshair row index, crosshair column index) — the remaining
    # two center coordinates in the plane's own row/col order.
    cuts = (
        (vol[cz], cy, cx),   # yx
        (vol[:, cy], cz, cx),  # zx
        (vol[:, :, cx], cz, cy),  # zy
    )
    return [_dim_crosshair(plane, r, c) if cross_hair else plane
            for plane, r, c in cuts]


def concat_ortho_planes(planes: Sequence[np.ndarray]) -> np.ndarray:
    """Assembles [yx, zx, zy] planes into one 2d panel.

    Layout (1px gutters):  [ yx | zy^T ]
                           [ zx |      ]
    """
    yx, zx, zy = planes
    zy_t = np.swapaxes(zy, 0, 1)
    ny, nx = yx.shape[:2]
    nz = zx.shape[0]
    if zy_t.shape[0] != ny or zx.shape[1] != nx or zy_t.shape[1] != nz:
        raise AssertionError(
            f"inconsistent plane shapes: yx={yx.shape} zx={zx.shape} "
            f"zy={zy.shape}")

    panel = np.zeros((ny + 1 + nz, nx + 1 + nz) + yx.shape[2:],
                     dtype=yx.dtype)
    panel[:ny, :nx] = yx
    panel[ny + 1:, :nx] = zx
    panel[:ny, nx + 1:] = zy_t
    return panel


# act-name -> (negative-channel fn, positive-channel fn); lo/hi are the
# image extrema, used only by the normalizing (None) mode.
_CHANNEL_MAPS = {
    None: lambda lo, hi: (
        lambda v: np.clip(v, lo, 0) / lo if lo < 0 else np.zeros_like(v),
        lambda v: np.clip(v, 0, hi) / hi if hi > 0 else np.zeros_like(v)),
    "tanh": lambda lo, hi: (
        lambda v: np.tanh(np.clip(v, lo, 0)),
        lambda v: np.tanh(np.clip(v, 0, hi))),
    "sig": lambda lo, hi: (expit, expit),
}


def normalize_image(img2d: np.ndarray,
                    act: Optional[str] = None) -> np.ndarray:
    """Maps an unbounded grey image to RGB in [0, 1].

    Channel coding: red <- negative values, blue <- positive values,
    green <- NaN. `act` selects the scaling: None normalizes by the
    negative/positive extrema, 'tanh' and 'sig' squash absolutely.
    """
    img2d = np.array(img2d, dtype=np.float32)  # copy; NaNs are replaced
    nan = np.isnan(img2d)
    img2d[nan] = 0.0

    neg_fn, pos_fn = _CHANNEL_MAPS[act](img2d.min(), img2d.max())
    rgb = np.zeros(img2d.shape + (3,), np.float32)
    rgb[..., 0] = np.where(nan, 0.0, neg_fn(img2d))
    rgb[..., 2] = np.where(nan, 0.0, pos_fn(img2d))
    rgb[..., 1] = nan.astype(np.float32)
    return rgb

"""Live Jupyter visualization of flood-fill progress.

Counterpart of the reference's DynamicImage/visualize_state
(ffn/inference/inference.py:53-125): an in-place-updating notebook image
showing the ortho planes of the current POM through the FoV position,
with the seed marked and (for grid-scored movement policies) the
upsampled move-score grid alongside.
"""

from __future__ import annotations

from io import BytesIO

import numpy as np
from numpy.lib.stride_tricks import as_strided
from scipy.special import expit

from ffn_tpu.utils import ortho_plane_visualization as opv


class DynamicImage:
    """A notebook display slot that repaints in place."""

    def update(self, pil_image) -> None:
        from IPython import display  # deferred: notebook-only dependency

        display.clear_output(wait=True)
        buf = BytesIO()
        pil_image.save(buf, format="png")
        display.display(display.Image(buf.getvalue()))

    # Reference-compatible alias (inference.py:55).
    UpdateFromPIL = update


def heat_rgb(unit: np.ndarray) -> np.ndarray:
    """Maps [0,1] values to RGB uint8 (the gnuplot rgb1 palette:
    r=sqrt, g=cube, b=sine)."""
    unit = np.nan_to_num(np.clip(unit, 0.0, 1.0))  # NaN = unvisited -> 0
    rgb = np.dstack([np.sqrt(unit), unit ** 3, np.sin(unit * np.pi)])
    return (rgb * 250.0).astype(np.uint8)


def _panel(volume: np.ndarray, pos_zyx) -> np.ndarray:
    planes = opv.cut_ortho_planes(volume, center=pos_zyx, cross_hair=True)
    return opv.concat_ortho_planes(planes)


def _upsampled_grid_panel(policy, like_shape, pos_zyx) -> np.ndarray:
    """Expands a delta-grid score map to voxel resolution and panels it."""
    scores = policy.scored_coords
    zf, yf, xf = policy.deltas
    gz, gy, gx = scores.shape
    sz, sy, sx = scores.strides
    up = as_strided(scores, (gz, zf, gy, yf, gx, xf),
                    (sz, 0, sy, 0, sx, 0)).reshape(gz * zf, gy * yf,
                                                   gx * xf)
    cut = (np.array(up.shape) - np.array(like_shape)) // 2
    up = up[tuple(slice(c, c + s) for c, s in zip(cut, like_shape))]
    return _panel(up, pos_zyx) * 4  # x4: legibility, as the reference does


def visualize_state(seed_logits: np.ndarray, pos_zyx, movement_policy,
                    dynimage: DynamicImage) -> None:
    """Repaints `dynimage` with the segmentation state at `pos_zyx`."""
    from PIL import Image

    view = _panel(seed_logits, pos_zyx)
    if isinstance(getattr(movement_policy, "scored_coords", None),
                  np.ndarray):
        grid = _upsampled_grid_panel(movement_policy, seed_logits.shape,
                                     pos_zyx)
        view = np.concatenate((view, grid), axis=1)

    rgb = heat_rgb(expit(view))
    y, x = (int(v) for v in pos_zyx[1:])
    rgb[y - 1:y + 2, x - 1:x + 2] = (255, 0, 0)  # mark the FoV center
    dynimage.update(Image.fromarray(rgb))

"""Host-side image filters used by seed policies and augmentations.

Scipy-backed equivalents of the reference's ndimage usage (seed.py:157-163):
Sobel gradient magnitude and Gaussian adaptive threshold. These run once per
subvolume during seeding (not in the hot inference loop); a jitted variant
(`edges_jax`) is provided for device-side batch seeding.
"""

from __future__ import annotations

import functools

import numpy as np
from scipy import ndimage

import jax
import jax.numpy as jnp

# The reference's adaptive-threshold smoothing width (seed.py:161).
ADAPTIVE_THRESHOLD_SIGMA = 49.0 / 6.0


def sobel_magnitude(image: np.ndarray) -> np.ndarray:
    """N-d Sobel gradient magnitude (generic_gradient_magnitude(sobel))."""
    return ndimage.generic_gradient_magnitude(
        image.astype(np.float32), ndimage.sobel)


def gaussian(image: np.ndarray, sigma: float,
             mode: str = "reflect") -> np.ndarray:
    out = np.zeros(image.shape, dtype=np.float32)
    ndimage.gaussian_filter(image, sigma, output=out, mode=mode)
    return out


def adaptive_edge_mask(image: np.ndarray) -> np.ndarray:
    """Boolean mask of edges: sobel magnitude above its local Gaussian mean.

    Matches seed.py:156-164 (PolicyPeaks edge detection).
    """
    edges = sobel_magnitude(image)
    thresh = gaussian(edges, ADAPTIVE_THRESHOLD_SIGMA, mode="reflect")
    return edges > thresh


# ---------------------------------------------------------------------------
# Jitted device-side variants (for batched multi-subvolume seeding).
# ---------------------------------------------------------------------------

def _sobel_kernel_1d():
    deriv = jnp.array([-1.0, 0.0, 1.0])
    smooth = jnp.array([1.0, 2.0, 1.0])
    return deriv, smooth


def _conv1d(x, kernel, axis):
    """Reflect-padded 1d convolution along an axis of a 3d array."""
    k = kernel.shape[0]
    pad = k // 2
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[axis] = (pad, pad)
    xp = jnp.pad(x, pad_widths, mode="reflect")
    out = jnp.zeros_like(x)
    for i in range(k):
        sel = [slice(None)] * x.ndim
        sel[axis] = slice(i, i + x.shape[axis])
        out = out + kernel[i] * xp[tuple(sel)]
    return out


@functools.partial(jax.jit, static_argnames=("sigma_truncate",))
def edges_jax(image: jnp.ndarray, sigma_truncate: float = 4.0):
    """Jitted Sobel-magnitude + Gaussian adaptive threshold for 3d arrays.

    Numerically equivalent to adaptive_edge_mask up to the Gaussian kernel
    truncation (scipy truncates at 4 sigma by default; we match).
    """
    image = image.astype(jnp.float32)
    deriv, smooth = _sobel_kernel_1d()

    grad_sq = jnp.zeros_like(image)
    for axis in range(3):
        g = image
        for other in range(3):
            kernel = deriv if other == axis else smooth
            g = _conv1d(g, kernel, other)
        grad_sq = grad_sq + g * g
    edges = jnp.sqrt(grad_sq)

    sigma = ADAPTIVE_THRESHOLD_SIGMA
    radius = int(sigma_truncate * sigma + 0.5)
    xs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    kernel = jnp.exp(-0.5 * (xs / sigma) ** 2)
    kernel = kernel / kernel.sum()
    thresh = edges
    for axis in range(3):
        thresh = _conv1d(thresh, kernel, axis)
    return edges > thresh

"""Spatial filters: gaussian and median blur (NHWC, pure JAX).

Replaces torchvision ``gaussian_blur`` (`hdr_upscale_with_model.py:7,177`)
and kornia ``median_blur`` (`:12,206,223`; SURVEY.md section 2.7).  Both use
reflect padding to match the torch/kornia defaults.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _gaussian_kernel1d(kernel_size: int, sigma: float) -> np.ndarray:
    half = (kernel_size - 1) / 2.0
    x = np.arange(kernel_size, dtype=np.float64) - half
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(x: jnp.ndarray, kernel_size: int = 3,
                  sigma: float = 0.1) -> jnp.ndarray:
    """Separable gaussian blur; defaults match the reference's hot-pixel
    pre-filter (k=3, sigma=0.1, `hdr_upscale_with_model.py:177`)."""
    k = jnp.asarray(_gaussian_kernel1d(kernel_size, sigma))
    pad = kernel_size // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)), mode="reflect")
    # vertical pass: weighted sum of shifted slices (fuses into one kernel)
    h = x.shape[1]
    out = sum(k[i] * xp[:, i:i + h] for i in range(kernel_size))
    xp = jnp.pad(out, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    w = x.shape[2]
    out = sum(k[i] * xp[:, :, i:i + w] for i in range(kernel_size))
    return out


def median_blur(x: jnp.ndarray, kernel_size: int = 3) -> jnp.ndarray:
    """kxk median filter via sort over stacked shifted windows.

    For k=3 this stacks 9 shifted views and takes the middle order statistic
    — a fully vectorized, XLA-fusible formulation (no data-dependent control
    flow), replacing kornia ``median_blur`` (`hdr_upscale_with_model.py:206`).

    Borders use ZERO padding: kornia extracts windows with
    ``F.conv2d(..., padding=_compute_zero_padding(k))``, so border medians
    include implicit zeros — replicated for behavior parity (round 1 used
    reflect, a silent deviation).
    """
    pad = kernel_size // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    windows = jnp.stack(
        [xp[:, dy:dy + h, dx:dx + w]
         for dy in range(kernel_size) for dx in range(kernel_size)],
        axis=0)
    n = kernel_size * kernel_size
    return jnp.sort(windows, axis=0)[n // 2]

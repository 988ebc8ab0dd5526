"""Color science primitives (pure JAX, NHWC channel-last).

Replaces the reference's torch/kornia color math:
  - sign-preserving inverse sRGB EOTF (`hdr_vae_decode.py:1163-1203`)
  - unclamped YCbCr <-> RGB (`hdr_upscale_with_model.py:20-48` and kornia's
    rgb_to_ycbcr used at `:193-194`)

All functions are elementwise and fuse into surrounding kernels under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

# BT.601 YCbCr coefficients as used by kornia and the reference's custom
# inverse (`hdr_upscale_with_model.py:45-47`).
_YCBCR_DELTA = 0.5


def srgb_to_linear(srgb: jnp.ndarray) -> jnp.ndarray:
    """Sign-preserving inverse sRGB EOTF.

    The curve is applied to |x| and the sign restored, so negative values
    (shadow/compression artifacts) survive — the reference's explicit design
    (`hdr_vae_decode.py:1183-1201`).
    """
    a = jnp.abs(srgb)
    linear_part = a / 12.92
    gamma_part = jnp.power((a + 0.055) / 1.055, 2.4)
    out = jnp.where(a <= 0.04045, linear_part, gamma_part)
    return jnp.sign(srgb) * out


def linear_to_srgb(linear: jnp.ndarray) -> jnp.ndarray:
    """Sign-preserving forward sRGB OETF (inverse of :func:`srgb_to_linear`)."""
    a = jnp.abs(linear)
    lin_part = a * 12.92
    gamma_part = 1.055 * jnp.power(a, 1.0 / 2.4) - 0.055
    out = jnp.where(a <= 0.0031308, lin_part, gamma_part)
    return jnp.sign(linear) * out


def rgb_to_ycbcr(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB -> YCbCr (BT.601, unclamped), channel-last ``(..., 3)``.

    Matches kornia's ``rgb_to_ycbcr`` (used by the reference at
    `hdr_upscale_with_model.py:193-194`) but never clamps, so HDR luma and
    out-of-gamut chroma survive.
    """
    r = rgb[..., 0]
    g = rgb[..., 1]
    b = rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = (b - y) * 0.564 + _YCBCR_DELTA
    cr = (r - y) * 0.713 + _YCBCR_DELTA
    return jnp.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycbcr: jnp.ndarray) -> jnp.ndarray:
    """YCbCr -> RGB (unclamped), channel-last ``(..., 3)``.

    Coefficients 1.403 / 0.714 / 0.344 / 1.773 match the reference's own
    unclamped reimplementation (`hdr_upscale_with_model.py:37-48`), which it
    wrote specifically because kornia's version clamps.
    """
    y = ycbcr[..., 0]
    cb = ycbcr[..., 1] - _YCBCR_DELTA
    cr = ycbcr[..., 2] - _YCBCR_DELTA
    r = y + 1.403 * cr
    g = y - 0.714 * cr - 0.344 * cb
    b = y + 1.773 * cb
    return jnp.stack([r, g, b], axis=-1)


def luma(rgb: jnp.ndarray) -> jnp.ndarray:
    """BT.601 luma, channel-last; keeps a trailing singleton channel."""
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    return y[..., None]

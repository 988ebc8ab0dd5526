"""HDR-aware two-pass tiled upscaling.

Rebuild of `HDRUpscaleWithModel.upscale` (`hdr_upscale_with_model.py:148-263`,
SURVEY.md section 3.5):

  pass 1: tiled model over the UNCLAMPED input, output un-normalized by the
          inverse activation (the reference's forward hook `:79-107` becomes
          plain function composition — we own the model call);
  pass 2: tiled model over the input clamped to [-1, 1] (color-stable);
  recombine in YCbCr: luma from pass 1 (clamped to [0, 8] + 3x3 median),
          chroma from pass 2, unclamped ycbcr_to_rgb;
  optional small_blur (gaussian pre-filter + median post-filter) and
  local_fix (dark-area hotspot suppression via mask blend).

Each pass is one cached jit (static configs as hashable dataclasses); the
reversal function is selected from the architecture name with the
reference's mapping (`:266-279`).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp

from hdrvae.core.color import luma, rgb_to_ycbcr, ycbcr_to_rgb
from hdrvae.core.config import Precision, UpscaleConfig
from hdrvae.decode.modes import inverse_sigmoid, inverse_tanh
from hdrvae.models.zoo import (ModelConfig, upscaler_apply,
                               working_set_bytes_per_pixel)
from hdrvae.tiling.tiled import select_tile_size, tiled_apply
from hdrvae.upscale.filters import gaussian_blur, median_blur
from hdrvae.upscale.resize import common_upscale

Params = Dict[str, Any]

# Architecture -> inverse activation (`hdr_upscale_with_model.py:266-279`).
# ESRGAN-family and VAE-like models reverse with atanh; default is logit.
_ATANH_ARCHES = ("ESRGAN", "RealESRGAN", "SwinIR", "HAT")


def get_reversal_fn(architecture: str) -> Callable[[jnp.ndarray],
                                                   jnp.ndarray]:
    if architecture in _ATANH_ARCHES or "VAE" in architecture:
        return inverse_tanh
    return inverse_sigmoid


class UpscaleResult(NamedTuple):
    image: jnp.ndarray          # [B, sH, sW, 3] float32 HDR
    unclamped: jnp.ndarray      # pass-1 result (pre-recombine)
    clamped: jnp.ndarray        # pass-2 result


def _select_pass_tile(x: jnp.ndarray, model_cfg: ModelConfig,
                      cfg: UpscaleConfig, precision: Precision) -> int:
    tile = cfg.tiling.tile
    if cfg.tiling.hbm_budget_bytes is not None:
        # Static tile planning from the memory budget (replaces the
        # reference's halve-on-OOM retry); per-model working-set
        # estimate from the zoo.
        bpp = working_set_bytes_per_pixel(model_cfg, precision)
        tile = select_tile_size(
            x.shape[1], x.shape[2], bytes_per_pixel=bpp,
            hbm_budget_bytes=cfg.tiling.hbm_budget_bytes, preferred=tile,
            min_tile=cfg.tiling.min_tile)
    return tile


def _forward_with_reversal(params: Params, tile: jnp.ndarray,
                           model_cfg: ModelConfig, architecture: str,
                           precision: Precision) -> jnp.ndarray:
    """One tile through the model + inverse activation (the reference's
    forward hook `hdr_upscale_with_model.py:79-107` as composition).
    The single definition both execution paths share — the jitted pass
    and the per-tile progress loop must stay numerically identical."""
    out = upscaler_apply(params, tile, model_cfg, precision=precision)
    return get_reversal_fn(architecture)(out)


_tile_forward = functools.partial(
    jax.jit, static_argnames=("model_cfg", "architecture", "precision"))(
        _forward_with_reversal)


@functools.partial(jax.jit, static_argnames=("model_cfg", "cfg",
                                             "architecture", "precision"))
def _run_pass(params: Params, x: jnp.ndarray, model_cfg: ModelConfig,
              cfg: UpscaleConfig, architecture: str,
              precision: Precision) -> jnp.ndarray:
    tile = _select_pass_tile(x, model_cfg, cfg, precision)
    return tiled_apply(
        lambda t: _forward_with_reversal(params, t, model_cfg,
                                         architecture, precision),
        x, tile=tile, overlap=cfg.tiling.overlap, scale=model_cfg.scale,
        mode=cfg.tiling.seam_mode)


def _run_pass_progress(params: Params, x: jnp.ndarray,
                       model_cfg: ModelConfig, cfg: UpscaleConfig,
                       architecture: str, precision: Precision,
                       pbar) -> jnp.ndarray:
    """Pass with per-tile progress: host tile loop around the jitted
    per-tile forward (the reference's execution shape)."""
    tile = _select_pass_tile(x, model_cfg, cfg, precision)
    return tiled_apply(
        lambda t: _tile_forward(params, t, model_cfg, architecture,
                                precision),
        x, tile=tile, overlap=cfg.tiling.overlap, scale=model_cfg.scale,
        mode=cfg.tiling.seam_mode, pbar=pbar)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _recombine(unclamped: jnp.ndarray, clamped: jnp.ndarray,
               original: jnp.ndarray, cfg: UpscaleConfig) -> jnp.ndarray:
    y_detail = luma(unclamped)          # == rgb_to_ycbcr(...)[..., 0:1]
    y_stab = jnp.clip(y_detail, 0.0, cfg.luma_max)
    y_stab = median_blur(y_stab, kernel_size=3)
    cbcr = rgb_to_ycbcr(clamped)[..., 1:3]
    s_final = ycbcr_to_rgb(jnp.concatenate([y_stab, cbcr], axis=-1))
    if cfg.small_blur:
        s_final = median_blur(s_final, kernel_size=3)
    if cfg.local_fix:
        # dark-area hotspot suppression (`hdr_upscale_with_model.py:231-256`)
        y_orig = luma(original)
        h, w = s_final.shape[1], s_final.shape[2]
        y_scaled = common_upscale(y_orig, w, h, cfg.upscale_method)
        mask = (y_scaled < cfg.local_fix_threshold).astype(jnp.float32)
        conservative = jnp.clip(s_final, -1.0, 1.0)
        s_final = s_final * (1.0 - mask) + conservative * mask
    return s_final


def upscale_progress_total(image: jnp.ndarray, model_cfg: ModelConfig,
                           cfg: UpscaleConfig,
                           precision: Precision = Precision()) -> int:
    """Total progress steps of :func:`hdr_upscale` (2 passes x tiles) —
    the reference's get_tiled_scale_steps sizing
    (`hdr_upscale_with_model.py:122-125`)."""
    from hdrvae.tiling.tiled import num_tiles
    tile = _select_pass_tile(image, model_cfg, cfg, precision)
    return 2 * num_tiles(image.shape[1], image.shape[2], tile,
                         cfg.tiling.overlap, mode=cfg.tiling.seam_mode)


def hdr_upscale(params: Params, image: jnp.ndarray,
                model_cfg: ModelConfig,
                cfg: UpscaleConfig = UpscaleConfig(), *,
                architecture: str = "ESRGAN",
                precision: Precision = Precision(),
                pbar=None) -> UpscaleResult:
    """Upscale an HDR float image [B, H, W, 3] (NHWC).

    The model forward + inverse activation runs tiled (tile/overlap from
    ``cfg.tiling``, reference defaults 512/64); recombination happens on the
    stitched full-resolution tensors, exactly as the reference composes
    full-image YCbCr after tiled_scale.

    ``pbar`` (``update(n)`` protocol; size it with
    :func:`upscale_progress_total`) enables per-tile progress — the passes
    then run as host tile loops around the jitted per-tile forward instead
    of one fused program per pass.
    """
    if image.ndim != 4 or image.shape[-1] != 3:
        raise ValueError(f"expected [B, H, W, 3] image, got {image.shape}")
    image = image.astype(jnp.float32)

    in_filtered = image
    if cfg.small_blur:
        in_filtered = gaussian_blur(image, kernel_size=3, sigma=0.1)

    # pass 1: full HDR range; pass 2: color-stable clamped input
    clamped_in = jnp.clip(in_filtered, cfg.color_stable_min,
                          cfg.color_stable_max)
    if pbar is not None:
        s_unclamped = _run_pass_progress(params, in_filtered, model_cfg,
                                         cfg, architecture, precision, pbar)
        s_clamped = _run_pass_progress(params, clamped_in, model_cfg, cfg,
                                       architecture, precision, pbar)
    else:
        s_unclamped = _run_pass(params, in_filtered, model_cfg, cfg,
                                architecture, precision)
        s_clamped = _run_pass(params, clamped_in, model_cfg, cfg,
                              architecture, precision)

    s_final = _recombine(s_unclamped, s_clamped, in_filtered, cfg)
    return UpscaleResult(image=s_final.astype(jnp.float32),
                         unclamped=s_unclamped, clamped=s_clamped)

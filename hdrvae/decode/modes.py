"""The four HDR expansion modes as pure, fusible functions.

Re-implements the reference's expansion math (`hdr_vae_decode.py:927-1007`
and the mode dispatch at `:1106-1159`) as data-parallel JAX — no host
branches, no device syncs; everything fuses into the decode epilogue under
jit.  Data-dependent gates (HDR detection, highlight compression factor)
become in-graph scalar selects (SURVEY.md section 7, "Hard parts":
data-dependent control flow expressed with lax/where to stay fused).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax.numpy as jnp

from hdrvae.core.config import HDRDecodeConfig

# ---------------------------------------------------------------------------
# Inverse activations (`hdr_vae_decode.py:927-939`)
# ---------------------------------------------------------------------------


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """logit with the reference's eps=1e-7 saturation clamp."""
    clamped = jnp.clip(x, eps, 1.0 - eps)
    # log(c / (1-c)) — the exact torch.logit formula, for bit-level parity.
    return jnp.log(clamped / (1.0 - clamped))


def inverse_tanh(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """atanh with the reference's eps=1e-6 saturation clamp."""
    clamped = jnp.clip(x, -1.0 + eps, 1.0 - eps)
    return jnp.arctanh(clamped)


# Normalization-kind codes (the reference's NORMALIZATION_FUNCTION string,
# `hdr_vae_decode.py:890-897`, as an in-graph selector).
NORM_SIGMOID = 0
NORM_TANH = 1
NORM_CUSTOM = 2


def select_inverse(x: jnp.ndarray, norm_kind: jnp.ndarray,
                   cfg: HDRDecodeConfig = HDRDecodeConfig()) -> jnp.ndarray:
    """Apply the inverse activation selected by ``norm_kind`` (traced scalar).

    Computes both inverses and selects — both are cheap elementwise ops and
    selection keeps the whole epilogue in one fused kernel.  CUSTOM passes
    the input through (`hdr_vae_decode.py:1090-1093` fallback).
    """
    inv_sig = inverse_sigmoid(x, cfg.sigmoid_eps)
    inv_tanh = inverse_tanh(x, cfg.tanh_eps)
    return jnp.where(norm_kind == NORM_SIGMOID, inv_sig,
                     jnp.where(norm_kind == NORM_TANH, inv_tanh, x))


# ---------------------------------------------------------------------------
# Recovery map construction (`hdr_vae_decode.py:1076-1102`)
# ---------------------------------------------------------------------------


class RecoveryMaps(NamedTuple):
    has_hdr_data: jnp.ndarray        # 0-d bool: collapsed pre max > 1 + tol
    map_recovered: jnp.ndarray       # [B,H,W,3] rescaled inverse map
    map_recovered_aligned: jnp.ndarray  # [B,H,W,3] midtone-aligned EV map


def build_recovery_maps(standard_result: jnp.ndarray,
                        pre_collapsed: jnp.ndarray,
                        pre_stats: Dict[str, jnp.ndarray],
                        norm_kind: jnp.ndarray,
                        cfg: HDRDecodeConfig = HDRDecodeConfig()
                        ) -> RecoveryMaps:
    """The shared pre-computation of the exposure/adaptive/mathematical modes.

    - ``pre_collapsed`` is the MAX-pooled 3-channel pre-conv_out map; the HDR
      gate tests ITS max (`hdr_vae_decode.py:1065-1066,1078`).
    - ``pre_stats`` are the RAW (un-collapsed) pre-conv_out min/max/mean/std
      from the analysis pass (`hdr_vae_decode.py:862-865,1068`).
    - With HDR data: inverse-activate the standard result, min-max normalize,
      rescale into [pre_min, pre_max], then midtone-align so the mean maps to
      a neutral 1.0 multiplier (`:1095-1102`).
    - Without: map_recovered = pre_collapsed, aligned = 1.0 (`:1080-1081`).
    """
    has_hdr = jnp.max(pre_collapsed) > (1.0 + cfg.hdr_tol)

    recovered = select_inverse(standard_result, norm_kind, cfg)
    rec_min = jnp.min(recovered)
    rec_max = jnp.max(recovered)
    rec_norm = (recovered - rec_min) / (rec_max - rec_min)
    original_range = pre_stats["max"] - pre_stats["min"]
    rescaled = rec_norm * original_range + pre_stats["min"]
    aligned = rescaled - pre_stats["mean"] + 1.0

    ones = jnp.ones_like(pre_collapsed)
    map_recovered = jnp.where(has_hdr, rescaled, pre_collapsed)
    map_aligned = jnp.where(has_hdr, aligned, ones)
    return RecoveryMaps(has_hdr, map_recovered, map_aligned)


# ---------------------------------------------------------------------------
# The four modes
# ---------------------------------------------------------------------------


def conservative(ldr_linear: jnp.ndarray, pre_collapsed: jnp.ndarray,
                 expansion_factor: float | jnp.ndarray) -> jnp.ndarray:
    """smart_hdr_expansion (`hdr_vae_decode.py:941-980`): expand only where
    the pre-conv_out features exceeded 1.0:
    ``base + (pre - 1) * factor * base`` on the highlight mask."""
    highlight_mask = pre_collapsed > 1.0
    expansion = (pre_collapsed - 1.0) * expansion_factor * ldr_linear
    return jnp.where(highlight_mask, ldr_linear + expansion, ldr_linear)


def exposure(ldr_linear: jnp.ndarray, map_recovered: jnp.ndarray,
             cfg: HDRDecodeConfig = HDRDecodeConfig()) -> jnp.ndarray:
    """exposure_based_hdr (`hdr_vae_decode.py:982-1007`): EV map from the
    recovered features, applied as a 2^EV multiplier.

    The reference computes ``2 ** log2(clamp(map, 0.001))`` which is
    mathematically ``clamp(map, 0.001)``; we multiply by the clamp directly
    (fewer transcendentals, <=1 ulp difference).  The reference's
    ``max_stops`` argument is logged but unused in the math; preserved in
    the config for API parity.
    """
    multiplier = jnp.maximum(map_recovered, cfg.ev_floor)
    return ldr_linear * multiplier


def adaptive_recovery(ldr_linear: jnp.ndarray,
                      map_recovered_aligned: jnp.ndarray,
                      pre_stats: Dict[str, jnp.ndarray],
                      cfg: HDRDecodeConfig = HDRDecodeConfig()) -> jnp.ndarray:
    """Highlight-compressed recovery (`hdr_vae_decode.py:1114-1147`).

    Compresses aligned EV values above 1.0 by
    ``(pre_max - 1) / (aligned_max - 1)`` when the aligned map overshoots the
    analysis max; the compression factor is an in-graph scalar select.
    """
    aligned_max = jnp.max(map_recovered_aligned)
    needs_compression = jnp.logical_and(aligned_max > 1.0,
                                        aligned_max > pre_stats["max"])
    excess = aligned_max - 1.0
    target = pre_stats["max"] - 1.0
    factor = jnp.where(needs_compression, target / excess, 1.0)

    highlight_mask = (map_recovered_aligned > 1.0).astype(ldr_linear.dtype)
    compressed_highlights = (map_recovered_aligned - 1.0) * factor + 1.0
    map_compressed = (map_recovered_aligned * (1.0 - highlight_mask)
                      + compressed_highlights * highlight_mask)
    multiplier = jnp.maximum(map_compressed, cfg.ev_floor)
    return ldr_linear * multiplier


def mathematical_recovery(ldr_linear: jnp.ndarray,
                          map_recovered_aligned: jnp.ndarray,
                          cfg: HDRDecodeConfig = HDRDecodeConfig()
                          ) -> jnp.ndarray:
    """Full L-ratio recovery (`hdr_vae_decode.py:1149-1159`):
    ``ldr * 2^log2(clamp(aligned, 0.001))`` == ``ldr * clamp(aligned)``."""
    multiplier = jnp.maximum(map_recovered_aligned, cfg.ev_floor)
    return ldr_linear * multiplier


def apply_mode(mode: str, ldr_linear: jnp.ndarray,
               pre_collapsed: jnp.ndarray, maps: RecoveryMaps,
               pre_stats: Dict[str, jnp.ndarray],
               cfg: HDRDecodeConfig = HDRDecodeConfig()) -> jnp.ndarray:
    """Static (host-side) mode dispatch; the mode string is config, not data,
    so each mode compiles to its own minimal fused graph."""
    if mode == "conservative":
        # NOT the user's conservative_ev_multiplier: the reference node
        # never forwards it into intelligent_hdr_decode (`:97` vs `:1009`),
        # so the inner expansion factor is its default 1.0; the user value
        # scales the final image instead (`hdr_vae_decode.py:180-182`).
        return conservative(ldr_linear, pre_collapsed,
                            cfg.conservative_expansion_factor)
    if mode == "exposure":
        return exposure(ldr_linear, maps.map_recovered, cfg)
    if mode == "adaptive_recovery":
        return adaptive_recovery(ldr_linear, maps.map_recovered_aligned,
                                 pre_stats, cfg)
    if mode == "mathematical_recovery":
        return mathematical_recovery(ldr_linear, maps.map_recovered_aligned,
                                     cfg)
    raise ValueError(f"unknown hdr mode: {mode}")

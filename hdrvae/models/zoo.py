"""Upscale model zoo: checkpoint-schema dispatch + unified apply.

The reference loads ANY spandrel-supported upscaler
(`/root/reference/hdr_upscale_with_model.py:72-76`) and keys its HDR
reversal off the architecture name (`:266-279`).  hdrvae owns its model
implementations instead of a loader zoo, so "supported" means: the
checkpoint schema is recognized here and mapped onto one of the native
JAX forwards:

  - ESRGAN / RealESRGAN (RRDBNet, both public key schemas)
                                       -> models.rrdbnet
  - SwinIR (official schema, all four upsampler heads)
                                       -> models.swinir
  - Swin2SR (SwinV2 blocks: cosine attention + CPB-MLP, all five heads)
                                       -> models.swin2sr
  - HAT (official schema; HAB + OCAB hybrid attention)
                                       -> models.hat
  - Compact (SRVGGNetCompact: realesr-general-x4v3 / animevideov3)
                                       -> models.srvgg
  - SPAN (Swift Parameter-free Attention Network; Conv3XC fused at load)
                                       -> models.span
  - RealPLKSR (partial large-kernel blocks; PixelShuffle or DySample head)
                                       -> models.plksr

``load_upscale_model`` returns (params, model_cfg, architecture_name);
``upscaler_apply`` dispatches on the config type so the HDR upscale
pipeline is model-agnostic.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple, Union

import jax.numpy as jnp
import numpy as np

from hdrvae.core.config import Precision
from hdrvae.models.hat import (HATConfig, hat_apply, hat_from_state_dict,
                               is_hat_state_dict)
from hdrvae.models.plksr import (RealPLKSRConfig, is_realplksr_state_dict,
                                 realplksr_apply,
                                 realplksr_from_state_dict)
from hdrvae.models.rrdbnet import (RRDBNetConfig, rrdbnet_apply,
                                   rrdbnet_from_state_dict)
from hdrvae.models.span import (SPANConfig, is_span_state_dict,
                                span_apply, span_from_state_dict)
from hdrvae.models.srvgg import (SRVGGConfig, is_srvgg_state_dict,
                                 srvgg_apply, srvgg_from_state_dict)
from hdrvae.models.swin2sr import (Swin2SRConfig, is_swin2sr_state_dict,
                                   swin2sr_apply, swin2sr_from_state_dict)
from hdrvae.models.swinir import (SwinIRConfig, is_swinir_state_dict,
                                  swinir_apply, swinir_from_state_dict)

Params = Dict[str, Any]
ModelConfig = Union[RRDBNetConfig, SwinIRConfig, Swin2SRConfig, HATConfig,
                    SRVGGConfig, SPANConfig, RealPLKSRConfig]


def _load_state_dict(path: str) -> Mapping[str, Any]:
    if path.endswith(".safetensors"):
        from hdrvae.models.params import load_safetensors
        return load_safetensors(path)
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    # BasicSR-style wrappers
    if isinstance(sd, dict) and "params_ema" in sd:
        sd = sd["params_ema"]
    elif isinstance(sd, dict) and "params" in sd:
        sd = sd["params"]
    return sd


def load_upscale_model(path: str) -> Tuple[Params, ModelConfig, str]:
    """Load an upscaler checkpoint (.pth / .safetensors), detecting the
    architecture from its key schema.  The returned architecture name
    feeds the reversal-function choice
    (`hdr_upscale_with_model.py:266-279`: ESRGAN/RealESRGAN/SwinIR/HAT
    -> atanh, default logit)."""
    sd = _load_state_dict(path)
    # HAT first: its state dicts share SwinIR's residual_group.blocks
    # spine, so the SwinIR detector also matches them.
    if is_hat_state_dict(sd):
        params, cfg = hat_from_state_dict(sd)
        return params, cfg, "HAT"
    if is_swin2sr_state_dict(sd):
        params, cfg = swin2sr_from_state_dict(sd)
        # NOT in the reference's atanh list -> default logit reversal.
        return params, cfg, "Swin2SR"
    if is_swinir_state_dict(sd):
        params, cfg = swinir_from_state_dict(sd)
        return params, cfg, "SwinIR"
    if is_realplksr_state_dict(sd):
        params, cfg = realplksr_from_state_dict(sd)
        # NOT in the reference's atanh list -> default logit reversal.
        return params, cfg, "RealPLKSR"
    if is_span_state_dict(sd):
        params, cfg = span_from_state_dict(sd)
        # NOT in the reference's atanh list -> default logit reversal.
        return params, cfg, "SPAN"
    if is_srvgg_state_dict(sd):
        params, cfg = srvgg_from_state_dict(sd)
        # spandrel's name for SRVGGNetCompact; NOT in the reference's
        # atanh list -> takes the default logit reversal (`:266-279`).
        return params, cfg, "Compact"
    if "body.0.rdb1.conv1.weight" in sd or \
            "model.1.sub.0.RDB1.conv1.0.weight" in sd:
        from hdrvae.models.rrdbnet import detect_architecture
        params, cfg = rrdbnet_from_state_dict(sd)
        arch = "ESRGAN" if detect_architecture(sd) == "esrgan-old" \
            else "RealESRGAN"
        return params, cfg, arch
    raise ValueError(
        f"unsupported upscaler checkpoint schema "
        f"({_guess_architecture(sd)}); supported architectures: "
        "ESRGAN/RealESRGAN (RRDBNet), SwinIR, Swin2SR, HAT, Compact "
        "(SRVGGNetCompact), SPAN, RealPLKSR")


# Key fingerprints of spandrel-supported families hdrvae does not
# implement, so the rejection names what the user actually has.
_FOREIGN_FINGERPRINTS = (
    ("before_RG.1.weight", "looks like DAT"),
    ("residual_layer.0.residual_layer.0.layer.0.fn.0.weight",
     "looks like OmniSR"),
    ("unet1.conv1.conv.0.weight", "looks like RealCUGAN"),
    ("feats.1.lk.conv.weight", "original PLKSR (only RealPLKSR is "
                               "implemented)"),
)


def _guess_architecture(sd: Mapping[str, Any]) -> str:
    for key, name in _FOREIGN_FINGERPRINTS:
        if key in sd:
            return name
    head = ", ".join(sorted(sd)[:3])
    return f"unrecognized; first keys: {head}"


def upscaler_apply(params: Params, x: jnp.ndarray, cfg: ModelConfig, *,
                   precision: Precision = Precision()) -> jnp.ndarray:
    """Unified NHWC [B, H, W, C] -> [B, sH, sW, C] forward."""
    if isinstance(cfg, HATConfig):
        return hat_apply(params, x, cfg, precision=precision)
    if isinstance(cfg, SwinIRConfig):
        return swinir_apply(params, x, cfg, precision=precision)
    if isinstance(cfg, Swin2SRConfig):
        return swin2sr_apply(params, x, cfg, precision=precision)
    if isinstance(cfg, SPANConfig):
        return span_apply(params, x, cfg, precision=precision)
    if isinstance(cfg, RealPLKSRConfig):
        return realplksr_apply(params, x, cfg, precision=precision)
    if isinstance(cfg, SRVGGConfig):
        return srvgg_apply(params, x, cfg, precision=precision)
    if isinstance(cfg, RRDBNetConfig):
        return rrdbnet_apply(params, x, cfg, precision=precision)
    raise TypeError(f"unknown upscale model config {type(cfg).__name__}")


def working_set_bytes_per_pixel(cfg: ModelConfig,
                                precision: Precision) -> float:
    """Rough per-input-pixel activation working set, for the static
    tile-size planner (replaces the reference's halve-on-OOM retry)."""
    elsize = jnp.dtype(precision.storage_dtype).itemsize
    out_bytes = cfg.scale ** 2 * 3 * 4
    if isinstance(cfg, HATConfig):
        # qkv + mlp hidden like SwinIR, plus OCAB's unfolded k/v patches
        # (overlap_win/window)^2 ~ 2.25x the token count at overlap 0.5
        ratio = (cfg.overlap_win_size / cfg.window_size) ** 2
        width = cfg.embed_dim * (3 + cfg.mlp_ratio + 2 * ratio)
        return float(width * 2 * elsize + out_bytes)
    if isinstance(cfg, (SwinIRConfig, Swin2SRConfig)):
        # qkv (3x dim) + mlp hidden, live alongside the token stream
        width = cfg.embed_dim * (3 + cfg.mlp_ratio)
        return float(width * 2 * elsize + out_bytes)
    if isinstance(cfg, SRVGGConfig):
        # plain conv stack: two num_feat activations live at a time
        return float(cfg.num_feat * 2 * elsize + out_bytes)
    if isinstance(cfg, SPANConfig):
        # conv stack plus the 4x num_feat concat before conv_cat
        return float(cfg.num_feat * 6 * elsize + out_bytes)
    if isinstance(cfg, RealPLKSRConfig):
        # DCCM's 2x-dim hidden alongside the block skip
        return float(cfg.dim * 3 * elsize + out_bytes)
    # densest RRDB concat holds nf + 4*gc channels, live twice
    return float((cfg.nf + 4 * cfg.gc) * 2 * elsize + out_bytes)

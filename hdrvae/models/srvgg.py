"""SRVGGNetCompact ("Compact" / RealESRGAN-general) in functional JAX.

The reference upscales with ANY spandrel-supported model
(`/root/reference/hdr_upscale_with_model.py:72-76`); this family is the
Real-ESRGAN project's lightweight video/general models
(realesr-general-x4v3, realesr-animevideov3) — a plain VGG-style conv
stack with PReLU activations, a PixelShuffle head, and a nearest-upsample
residual base.  Spandrel's architecture name for it is "Compact", which
the reference's reversal map does NOT special-case
(`hdr_upscale_with_model.py:266-279`) — so it takes the default `logit`
reversal, reproduced by hdrvae's exact-name `_ATANH_ARCHES` check.

TPU-first notes: 3x3 convs over NHWC at a fixed 64-feature width — XLA's
conv emitter handles these at full tile occupancy (K=64 idles half the
MXU depth, but the whole model is ~20x cheaper than ESRGAN per pixel, so
no Pallas chain is warranted); PReLU fuses into the conv epilogue.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hdrvae.core.config import Precision
from hdrvae.models.layers import conv2d, init_conv2d
from hdrvae.models.params import conv_kernel_to_hwio, \
    to_np as _to_np
from hdrvae.models.swinir import _pixel_shuffle

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SRVGGConfig:
    in_channels: int = 3
    out_channels: int = 3
    num_feat: int = 64
    num_conv: int = 32          # hidden convs (body has num_conv + 2)
    scale: int = 4
    act: str = "prelu"          # "prelu" | "relu" | "leakyrelu"


def _act(x: jnp.ndarray, kind: str, weight) -> jnp.ndarray:
    if kind == "prelu":
        a = weight.astype(x.dtype)[None, None, None, :]
        return jnp.where(x >= 0, x, a * x)
    if kind == "leakyrelu":
        return jnp.where(x >= 0, x, 0.1 * x)
    return jax.nn.relu(x)


def _nearest(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """F.interpolate(mode="nearest", scale_factor=s) on NHWC."""
    return jnp.repeat(jnp.repeat(x, s, axis=1), s, axis=2)


def srvgg_apply(params: Params, x: jnp.ndarray, cfg: SRVGGConfig, *,
                precision: Precision = Precision()) -> jnp.ndarray:
    """[B, H, W, C] -> [B, sH, sW, C].  Matches BasicSR's
    SRVGGNetCompact.forward: body -> PixelShuffle -> + nearest(x)."""
    h = x
    for i in range(cfg.num_conv + 1):
        h = conv2d(h, params[f"conv{i}"], precision=precision)
        h = _act(h, cfg.act, params.get(f"act{i}"))
    h = conv2d(h, params["conv_last"], precision=precision)
    out = _pixel_shuffle(h, cfg.scale)
    return out + _nearest(x, cfg.scale)


def init_srvgg(key: jax.Array, cfg: SRVGGConfig = SRVGGConfig()) -> Params:
    keys = jax.random.split(key, cfg.num_conv + 2)
    params: Params = {}
    cin = cfg.in_channels
    for i in range(cfg.num_conv + 1):
        params[f"conv{i}"] = init_conv2d(keys[i], 3, 3, cin, cfg.num_feat)
        if cfg.act == "prelu":
            # torch PReLU init: constant 0.25
            params[f"act{i}"] = jnp.full((cfg.num_feat,), 0.25,
                                         jnp.float32)
        cin = cfg.num_feat
    params["conv_last"] = init_conv2d(
        keys[-1], 3, 3, cfg.num_feat,
        cfg.out_channels * cfg.scale * cfg.scale)
    return params


# ---------------------------------------------------------------------------
# Checkpoint loading (official BasicSR key schema)
# ---------------------------------------------------------------------------

_BODY_RE = re.compile(r"^body\.(\d+)\.(weight|bias)$")


def is_srvgg_state_dict(sd: Mapping[str, Any]) -> bool:
    """body.0.weight is a 4-D conv and there is no RRDB/Swin spine."""
    if "body.0.weight" not in sd:
        return False
    if any(k.startswith(("conv_first", "model.", "layers.",
                         "conv_body")) for k in sd):
        return False
    w = sd["body.0.weight"]
    return getattr(w, "ndim", len(getattr(w, "shape", ()))) == 4 or \
        len(w.shape) == 4


def srvgg_from_state_dict(sd: Mapping[str, Any]
                          ) -> Tuple[Params, SRVGGConfig]:
    """Official serialization: body.{2i} = conv, body.{2i+1} = PReLU
    weight [nf] (absent for ReLU variants); the LAST body entry is the
    conv to out_channels * scale**2."""
    idx = sorted({int(m.group(1)) for k in sd if (m := _BODY_RE.match(k))})
    conv_idx = [i for i in idx if sd[f"body.{i}.weight"].ndim == 4]
    act_idx = [i for i in idx if sd[f"body.{i}.weight"].ndim == 1]
    last = conv_idx[-1]
    nf = int(sd["body.0.weight"].shape[0])
    cin = int(sd["body.0.weight"].shape[1])
    cout_last = int(sd[f"body.{last}.weight"].shape[0])
    num_conv = len(conv_idx) - 2
    # out_channels == in_channels for every public Compact model; the
    # scale falls out of the PixelShuffle head's channel count.
    scale = int(round((cout_last // cin) ** 0.5))
    if cin * scale * scale != cout_last:
        raise ValueError(
            f"Compact head channels {cout_last} are not in_ch*scale^2 "
            f"(in_ch={cin})")
    cfg = SRVGGConfig(in_channels=cin, out_channels=cin, num_feat=nf,
                      num_conv=num_conv, scale=scale,
                      act="prelu" if act_idx else "relu")
    params: Params = {}
    for n, i in enumerate(conv_idx[:-1]):
        params[f"conv{n}"] = {
            "kernel": conv_kernel_to_hwio(_to_np(sd[f"body.{i}.weight"])),
            "bias": _to_np(sd[f"body.{i}.bias"])}
    for n, i in enumerate(act_idx):
        params[f"act{n}"] = jnp.asarray(_to_np(sd[f"body.{i}.weight"]),
                                        jnp.float32)
    params["conv_last"] = {
        "kernel": conv_kernel_to_hwio(_to_np(sd[f"body.{last}.weight"])),
        "bias": _to_np(sd[f"body.{last}.bias"])}
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return params, cfg

"""SPAN (Swift Parameter-free Attention Network) in functional JAX.

The reference upscales with ANY spandrel-supported model
(`/root/reference/hdr_upscale_with_model.py:72-76`); SPAN is the Swift
Parameter-free Attention Network for efficient SR (CVPR 2024 NTIRE
winner family), widely distributed on OpenModelDB.  Spandrel's
architecture name "SPAN" is NOT in the reference's atanh list
(`hdr_upscale_with_model.py:266-279`), so it takes the default `logit`
reversal.

Architecture (from the published description):

  - ``Conv3XC``: a re-parameterizable block — a 1x1 -> 3x3 -> 1x1 conv
    chain (gain-widened) plus a parallel 1x1 skip conv.  At inference
    the official code folds the chain and the skip into ONE dense 3x3
    conv every forward; here the fold happens once at load time
    (`_fuse_conv3xc`), so the TPU graph only ever sees plain 3x3 convs.
  - ``SPAB``: three Conv3XC with SiLU between, then the "parameter-free
    attention" gate ``(out3 + x) * (sigmoid(out3) - 0.5)``.
  - Six SPAB blocks; a 1x1 ``conv_cat`` over [feat, final, b1, last.out1];
    PixelShuffle head.

TPU-first notes: after load-time fusion the whole network is 3x3/1x1
convs + elementwise gates over a fixed 48-feature width — XLA's conv
emitters handle it; the sigmoid gate and SiLU fuse into conv epilogues.
Input normalization ``(x - rgb_mean) * img_range`` follows the official
module (enabled unless the checkpoint carries the ``no_norm`` buffer);
the output is NOT un-normalized, matching the official forward.
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

_RGB_MEAN = (0.4488, 0.4371, 0.4040)


@dataclasses.dataclass(frozen=True)
class SPANConfig:
    in_channels: int = 3
    out_channels: int = 3
    num_feat: int = 48
    num_blocks: int = 6
    scale: int = 4
    img_range: float = 255.0
    norm: bool = True


def _silu(x: jnp.ndarray) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(xf)).astype(x.dtype)


def _spab(x: jnp.ndarray, p: Params, precision: Precision):
    """SPAB: returns (gated out, out1) — out1 feeds the final concat for
    the last block."""
    out1 = conv2d(x, p["c1_r"], precision=precision)
    out2 = conv2d(_silu(out1), p["c2_r"], precision=precision)
    out3 = conv2d(_silu(out2), p["c3_r"], precision=precision)
    o3f = out3.astype(jnp.float32)
    sim_att = jax.nn.sigmoid(o3f) - 0.5
    out = ((o3f + x.astype(jnp.float32)) * sim_att).astype(x.dtype)
    return out, out1


def span_apply(params: Params, x: jnp.ndarray, cfg: SPANConfig, *,
               precision: Precision = Precision()) -> jnp.ndarray:
    """[B, H, W, C] -> [B, sH, sW, C]; official SPAN forward with the
    Conv3XC blocks pre-fused to plain 3x3 convs."""
    if cfg.norm and cfg.in_channels == 3:
        mean = jnp.asarray(_RGB_MEAN, jnp.float32)
        x = ((x.astype(jnp.float32) - mean) * cfg.img_range)
    x = x.astype(precision.storage_dtype)

    feat = conv2d(x, params["conv_1"], precision=precision)
    h = feat
    b1 = None
    last_out1 = None
    for i in range(cfg.num_blocks):
        h, out1 = _spab(h, params[f"block_{i + 1}"], precision)
        if i == 0:
            b1 = h
        last_out1 = out1
    final = conv2d(h, params["conv_2"], precision=precision)
    cat = jnp.concatenate([feat, final, b1, last_out1], axis=-1)
    out = conv2d(cat, params["conv_cat"], precision=precision)
    up = conv2d(out, params["upsampler"], precision=precision)
    return _pixel_shuffle(up, cfg.scale).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Initialization (fixtures) — already-fused layout
# ---------------------------------------------------------------------------


def init_span(key: jax.Array, cfg: SPANConfig = SPANConfig()) -> Params:
    keys = iter(jax.random.split(key, 64))
    nf = cfg.num_feat
    params: Params = {
        "conv_1": init_conv2d(next(keys), 3, 3, cfg.in_channels, nf)}
    for i in range(cfg.num_blocks):
        params[f"block_{i + 1}"] = {
            "c1_r": init_conv2d(next(keys), 3, 3, nf, nf),
            "c2_r": init_conv2d(next(keys), 3, 3, nf, nf),
            "c3_r": init_conv2d(next(keys), 3, 3, nf, nf),
        }
    params["conv_2"] = init_conv2d(next(keys), 3, 3, nf, nf)
    params["conv_cat"] = init_conv2d(next(keys), 1, 1, 4 * nf, nf)
    params["upsampler"] = init_conv2d(
        next(keys), 3, 3, nf, cfg.out_channels * cfg.scale ** 2)
    return params


# ---------------------------------------------------------------------------
# Checkpoint loading (official SPAN key schema) + Conv3XC fusion
# ---------------------------------------------------------------------------


def is_span_state_dict(sd: Mapping[str, Any]) -> bool:
    return "block_1.c1_r.sk.weight" in sd and "conv_cat.weight" in sd


def _fuse_conv3xc(sd: Mapping[str, Any], prefix: str) -> Params:
    """Fold Conv3XC's (1x1 -> 3x3 -> 1x1) chain + 1x1 skip into one
    dense 3x3 conv — the same algebra the official ``update_params``
    runs before every eval forward, done once at load time.

    OIHW composition: w12[m2,i,u,v] = sum_m w2[m2,m,u,v] * w1[m,i];
    w123[o,i,u,v] = sum_m2 w3[o,m2] * w12[m2,i,u,v]; biases propagate as
    b12 = w2.sum(taps) @ b1 + b2, b123 = w3 @ b12 + b3; the 1x1 skip
    pads into the 3x3 center tap.
    """
    w1 = _to_np(sd[f"{prefix}.conv.0.weight"])          # [cm, cin, 1, 1]
    w2 = _to_np(sd[f"{prefix}.conv.1.weight"])          # [cm2, cm, 3, 3]
    w3 = _to_np(sd[f"{prefix}.conv.2.weight"])          # [co, cm2, 1, 1]
    b1 = _to_np(sd[f"{prefix}.conv.0.bias"])
    b2 = _to_np(sd[f"{prefix}.conv.1.bias"])
    b3 = _to_np(sd[f"{prefix}.conv.2.bias"])
    sk_w = _to_np(sd[f"{prefix}.sk.weight"])            # [co, cin, 1, 1]
    sk_b = _to_np(sd[f"{prefix}.sk.bias"])

    w12 = np.einsum("nmuv,mi->niuv", w2, w1[:, :, 0, 0])
    w = np.einsum("on,niuv->oiuv", w3[:, :, 0, 0], w12)
    b12 = w2.sum(axis=(2, 3)) @ b1 + b2
    b = w3[:, :, 0, 0] @ b12 + b3
    w[:, :, 1, 1] += sk_w[:, :, 0, 0]
    b += sk_b
    return {"kernel": conv_kernel_to_hwio(w), "bias": b}


_BLOCK_RE = re.compile(r"^block_(\d+)\.")


def span_from_state_dict(sd: Mapping[str, Any]
                         ) -> Tuple[Params, SPANConfig]:
    """Build (params, config) from the official SPAN checkpoint schema,
    fusing every Conv3XC at load time."""
    if not is_span_state_dict(sd):
        raise ValueError("not a SPAN state dict")
    n_blocks = max(int(m.group(1)) for k in sd if (m := _BLOCK_RE.match(k)))
    sk1 = _to_np(sd["conv_1.sk.weight"])                # [nf, cin, 1, 1]
    nf, cin = int(sk1.shape[0]), int(sk1.shape[1])
    w_up = _to_np(sd["upsampler.0.weight"])
    # out = out_ch * scale^2; out_ch == in_ch for public SPAN models
    out_ch = cin
    scale = int(round((w_up.shape[0] // out_ch) ** 0.5))
    cfg = SPANConfig(in_channels=cin, out_channels=out_ch, num_feat=nf,
                     num_blocks=n_blocks, scale=scale,
                     norm="no_norm" not in sd)

    params: Params = {"conv_1": _fuse_conv3xc(sd, "conv_1")}
    for i in range(1, n_blocks + 1):
        params[f"block_{i}"] = {
            name: _fuse_conv3xc(sd, f"block_{i}.{name}")
            for name in ("c1_r", "c2_r", "c3_r")}
    params["conv_2"] = _fuse_conv3xc(sd, "conv_2")
    params["conv_cat"] = {
        "kernel": conv_kernel_to_hwio(_to_np(sd["conv_cat.weight"])),
        "bias": _to_np(sd["conv_cat.bias"])}
    params["upsampler"] = {
        "kernel": conv_kernel_to_hwio(_to_np(sd["upsampler.0.weight"])),
        "bias": _to_np(sd["upsampler.0.bias"])}
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return params, cfg

"""HAT (Hybrid Attention Transformer) super-resolution in functional JAX.

The reference's reversal map names HAT next to ESRGAN/RealESRGAN/SwinIR
(`/root/reference/hdr_upscale_with_model.py:266-279`, atanh reversal) and
loads it through spandrel (`:72-76`); this module implements the official
HAT network (XPixelGroup/HAT ``hat_arch.py``) so those checkpoints run
natively:

  - HAB blocks: shifted-window attention (SwinIR machinery reused from
    ``models.swinir``) PLUS a parallel Channel Attention Block, combined
    as ``shortcut + attn + conv_scale * cab``;
  - one OCAB (Overlapping Cross-Attention Block) per residual group:
    queries from ws-windows, keys/values from overlapping
    ``ws * (1 + overlap_ratio)`` windows extracted with an unfold;
  - pixelshuffle upsampler head (the only head the official network
    ships) with HAT's LeakyReLU conv_before_upsample (SwinIR uses ReLU
    there — a real difference, preserved).

TPU-first notes: everything is batched MXU matmuls over
[windows, heads, N, M] like the SwinIR port; the overlapping-window
unfold is pad + structured gathers (pure data movement — see
``_unfold_overlap`` on why ``conv_general_dilated_patches`` is a trap
here); channel attention's global pool is a single reduction.  Static
geometry (relative-position indices, shift masks) is trace-time numpy.
"""

from __future__ import annotations

import dataclasses
import functools
import re
from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hdrvae.core.config import Precision
from hdrvae.models.layers import conv2d, init_conv2d
from hdrvae.models.params import (conv_from_sd as _conv_from,
                                  conv_kernel_to_hwio,
                                  linear_from_sd as _lin_from,
                                  norm_affine_from_sd as _ln_from,
                                  to_np as _to_np)
from hdrvae.kernels.swin_attention import use_swin_kernel
from hdrvae.models.layers import _conv_precision
from hdrvae.models.swinir import (_RGB_MEAN, _gather_bias, _layer_norm,
                                  _linear, _pixel_shuffle,
                                  _relative_position_index,
                                  _shift_attn_mask, _window_attention,
                                  _window_merge, _window_partition)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class HATConfig:
    in_channels: int = 3
    out_channels: int = 3
    embed_dim: int = 180
    depths: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    num_heads: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    window_size: int = 16
    compress_ratio: int = 3
    squeeze_factor: int = 30
    # CAB mixing weight: an architecture constant of the official network
    # (never stored in checkpoints).
    conv_scale: float = 0.01
    overlap_ratio: float = 0.5
    mlp_ratio: float = 2.0
    upsampler: str = "pixelshuffle"
    resi_connection: str = "1conv"
    patch_norm: bool = True
    num_feat: int = 64
    scale: int = 4
    img_range: float = 1.0

    @property
    def overlap_win_size(self) -> int:
        return int(self.window_size * self.overlap_ratio) + self.window_size

    def with_small(self) -> "HATConfig":
        """Tiny fixture for tests (fast on 1 CPU core)."""
        return dataclasses.replace(
            self, embed_dim=16, depths=(2, 2), num_heads=(2, 2),
            window_size=4, compress_ratio=2, squeeze_factor=4,
            num_feat=8, scale=2)


@functools.lru_cache(maxsize=None)
def _rpi_oca(ws: int, wse: int) -> np.ndarray:
    """[ws*ws, wse*wse] indices into the (ws+wse-1)^2 OCAB bias table
    (official ``calculate_rpi_oca``)."""
    co = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                              indexing="ij")).reshape(2, -1)      # queries
    ce = np.stack(np.meshgrid(np.arange(wse), np.arange(wse),
                              indexing="ij")).reshape(2, -1)      # keys
    rel = ce[:, None, :] - co[:, :, None]                # [2, ws^2, wse^2]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    # ext - ori spans [-(ws-1), wse-1]; +(ws-1) zero-bases it and exactly
    # fills the (ws + wse - 1)^2 bias table (official calculate_rpi_oca).
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= ws + wse - 1
    return rel.sum(-1)


def _channel_attention(x: jnp.ndarray, p: Params,
                       precision: Precision) -> jnp.ndarray:
    """Squeeze-and-excitation over NHWC: global average pool -> 1x1 conv
    -> ReLU -> 1x1 conv -> sigmoid gate."""
    pooled = x.astype(jnp.float32).mean(axis=(1, 2), keepdims=True)
    y = conv2d(pooled.astype(x.dtype), p["down"], precision=precision)
    y = jax.nn.relu(y)
    y = conv2d(y, p["up"], precision=precision)
    return x * jax.nn.sigmoid(y.astype(jnp.float32)).astype(x.dtype)


def _cab(x: jnp.ndarray, p: Params, precision: Precision) -> jnp.ndarray:
    """Channel Attention Block: 3x3 conv (C -> C/compress) -> GELU ->
    3x3 conv (-> C) -> channel attention."""
    y = conv2d(x, p["conv1"], precision=precision)
    y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(
        precision.storage_dtype)
    y = conv2d(y, p["conv2"], precision=precision)
    return _channel_attention(y, p["attn"], precision)


def _hab(x: jnp.ndarray, p: Params, cfg: HATConfig, heads: int,
         shift: int, precision: Precision) -> jnp.ndarray:
    """Hybrid Attention Block on an NHWC grid: window attention and the
    CAB run in parallel off norm1; ``shortcut + attn + conv_scale*cab``
    (official ``HAB.forward``)."""
    b, h, w, c = x.shape
    ws = cfg.window_size
    shortcut = x
    y = _layer_norm(x, p["norm1"])
    conv_x = _cab(y, p["conv_block"], precision)
    if use_swin_kernel(precision, h, w, ws,
                       c // heads):
        # The whole HAB as the fused single-kernel Swin block (HAB
        # window attention is SwinIR's math with a shared rpi): LN1 +
        # qkv -> attention -> proj + residual + CAB residual + LN2 +
        # MLP.  Every piece past the CAB convs is pointwise per token,
        # so it commutes with the roll and runs in rolled image space;
        # window partition/merge happen in-register inside the kernel.
        from hdrvae.kernels.swin_attention import (pick_bwin,
                                                   swin_block_fused)
        n = ws * ws
        nww = w // ws
        xa = jnp.roll(x, (-shift, -shift), axis=(1, 2)) if shift else x
        cx = conv_x * cfg.conv_scale
        if shift:
            cx = jnp.roll(cx, (-shift, -shift), axis=(1, 2))
        bwin = pick_bwin(nww, n)
        out = swin_block_fused(xa, p["attn"], p["norm1"], p["norm2"],
                               p["mlp"], heads, ws=ws, shift=shift,
                               bias_hnn=_gather_bias(p["attn"], ws),
                               bwin=bwin, precision=precision,
                               extra=cx.astype(x.dtype))
        if shift:
            out = jnp.roll(out, (shift, shift), axis=(1, 2))
        return out
    ya = jnp.roll(y, (-shift, -shift), axis=(1, 2)) if shift else y
    wins = _window_partition(ya, ws)
    mask = _shift_attn_mask(h, w, ws, shift) if shift else None
    wins = _window_attention(wins, p["attn"], heads, ws, mask, precision,
                             rpi=_relative_position_index(ws))
    ya = _window_merge(wins, ws, h, w)
    if shift:
        ya = jnp.roll(ya, (shift, shift), axis=(1, 2))
    x = shortcut + ya + conv_x * cfg.conv_scale
    y = _layer_norm(x, p["norm2"])
    y = _linear(y, p["mlp"]["fc1"], precision)
    y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(
        precision.storage_dtype)
    y = _linear(y, p["mlp"]["fc2"], precision)
    return x + y


def _unfold_overlap(kv: jnp.ndarray, ws: int, wse: int) -> jnp.ndarray:
    """torch ``nn.Unfold(kernel=wse, stride=ws, padding=(wse-ws)//2)`` on
    NHWC input: [B, H, W, C] -> [B*nW, wse*wse, C] overlapping windows,
    token order (kh, kw) — torch's unfold layout transposed to
    channel-last.

    Implemented as pad + structured row/col gathers (pure data
    movement, ~(wse/ws)^2 x the feature map).  The obvious
    ``conv_general_dilated_patches`` lowers to a REAL convolution with
    C*wse^2 output channels on TPU — ~5.5 TFLOP per unfold at HAT-M's
    window 16 on a 256^2 tile, which made OCAB 8x the cost of all six
    HABs around it (PERF_NOTES 5.9)."""
    b, h, w, c = kv.shape
    pad = (wse - ws) // 2
    p = jnp.pad(kv, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    nh, nw = h // ws, w // ws
    ridx = (np.arange(nh)[:, None] * ws
            + np.arange(wse)[None, :]).reshape(-1)
    cidx = (np.arange(nw)[:, None] * ws
            + np.arange(wse)[None, :]).reshape(-1)
    p = jnp.take(p, ridx, axis=1)        # [B, nh*wse, W+2pad, C]
    p = jnp.take(p, cidx, axis=2)        # [B, nh*wse, nw*wse, C]
    p = p.reshape(b, nh, wse, nw, wse, c).transpose(0, 1, 3, 2, 4, 5)
    return p.reshape(b * nh * nw, wse * wse, c)


def _ocab(x: jnp.ndarray, p: Params, cfg: HATConfig, heads: int,
          precision: Precision) -> jnp.ndarray:
    """Overlapping Cross-Attention Block: q from ws-windows, k/v from
    wse-windows unfolded with stride ws (official ``OCAB.forward``)."""
    b, h, w, c = x.shape
    ws, wse = cfg.window_size, cfg.overlap_win_size
    hd = c // heads
    dtype = precision.compute_dtype
    shortcut = x
    y = _layer_norm(x, p["norm1"])
    qkv = _linear(y, p["qkv"], precision)                 # [B, H, W, 3C]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    qw = _window_partition(q, ws)                         # [BnW, ws^2, C]
    kw = _unfold_overlap(k, ws, wse)                      # [BnW, wse^2, C]
    vw = _unfold_overlap(v, ws, wse)
    nwb, nq, _ = qw.shape
    nk = wse * wse

    qh = qw.reshape(nwb, nq, heads, hd).transpose(0, 2, 1, 3)
    kh = kw.reshape(nwb, nk, heads, hd).transpose(0, 2, 1, 3)
    vh = vw.reshape(nwb, nk, heads, hd).transpose(0, 2, 1, 3)
    qh = qh * (hd ** -0.5)
    bias = p["relative_position_bias_table"][
        _rpi_oca(ws, wse).reshape(-1)]
    bias = bias.reshape(nq, nk, heads).transpose(2, 0, 1)
    from hdrvae.kernels.ocab import _HDP, ocab_attention, use_ocab_kernel
    if use_ocab_kernel(precision, hd, nq=nq, nk=nk):
        # scores + softmax + PV per (window, head) resident in VMEM —
        # the [nwb, heads, nq, nk] score tensor never exists in HBM
        pad = ((0, 0), (0, 0), (0, 0), (0, _HDP - hd))
        oh = ocab_attention(jnp.pad(qh, pad), jnp.pad(kh, pad),
                            jnp.pad(vh, pad),
                            bias.astype(jnp.float32),
                            compute_dtype=dtype,
                            storage_dtype=precision.storage_dtype)
        out = oh[..., :hd].transpose(0, 2, 1, 3).reshape(nwb, nq, c)
    else:
        attn = jnp.einsum("bhnd,bhmd->bhnm", qh.astype(dtype),
                          kh.astype(dtype),
                          precision=_conv_precision(precision),
                          preferred_element_type=jnp.float32)
        attn = attn + bias.astype(jnp.float32)[None]
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(dtype),
                         vh.astype(dtype),
                         precision=_conv_precision(precision),
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(nwb, nq, c)
    out = _linear(out.astype(precision.storage_dtype), p["proj"],
                  precision)
    x = shortcut + _window_merge(out, ws, h, w)
    y = _layer_norm(x, p["norm2"])
    y = _linear(y, p["mlp"]["fc1"], precision)
    y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(
        precision.storage_dtype)
    y = _linear(y, p["mlp"]["fc2"], precision)
    return x + y


def hat_apply(params: Params, x: jnp.ndarray,
              cfg: HATConfig = HATConfig(), *,
              precision: Precision = Precision()) -> jnp.ndarray:
    """Upscale NHWC [B, H, W, C] -> [B, scale*H, scale*W, C].

    The official network requires H/W divisible by window_size (its test
    harness pre-pads); like the SwinIR port this forward reflect-pads and
    crops so arbitrary tile sizes work in the HDR upscale pipeline.
    """
    b, h0, w0, c = x.shape
    ws = cfg.window_size
    pad_h = (-h0) % ws
    pad_w = (-w0) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                    mode="reflect")

    if cfg.in_channels == 3:
        mean = jnp.asarray(_RGB_MEAN, x.dtype)
        x = (x - mean) * cfg.img_range
    else:
        x = x * cfg.img_range
    x = x.astype(precision.storage_dtype)

    feat = conv2d(x, params["conv_first"], precision=precision)
    tok = feat
    if cfg.patch_norm:
        tok = _layer_norm(tok, params["patch_norm"])
    for li, layer in enumerate(params["layers"]):
        res = tok
        y = tok
        for bi, block in enumerate(layer["blocks"]):
            shift = 0 if bi % 2 == 0 else ws // 2
            y = _hab(y, block, cfg, cfg.num_heads[li], shift, precision)
        y = _ocab(y, layer["overlap_attn"], cfg, cfg.num_heads[li],
                  precision)
        tok = conv2d(y, layer["conv"], precision=precision) + res
    tok = _layer_norm(tok, params["norm"])
    body = conv2d(tok, params["conv_after_body"], precision=precision)
    feat = feat + body

    if cfg.upsampler != "pixelshuffle":
        raise ValueError(
            f"HAT ships only the pixelshuffle head, got {cfg.upsampler!r}")
    y = conv2d(feat, params["conv_before_upsample"], precision=precision)
    # HAT: LeakyReLU (torch default slope 0.01); SwinIR uses ReLU here.
    y = jnp.where(y >= 0, y, 0.01 * y)
    for up in params["upsample"]:
        r = int(round(np.sqrt(up["kernel"].shape[-1] // cfg.num_feat)))
        y = conv2d(y, up, precision=precision)
        y = _pixel_shuffle(y, r)
    y = conv2d(y, params["conv_last"], precision=precision)

    y = y.astype(jnp.float32) / cfg.img_range
    if cfg.in_channels == 3:
        y = y + jnp.asarray(_RGB_MEAN, jnp.float32)
    return y[:, :h0 * cfg.scale, :w0 * cfg.scale]


# ---------------------------------------------------------------------------
# Initialization (fixtures)
# ---------------------------------------------------------------------------


def init_hat(key: jax.Array, cfg: HATConfig = HATConfig()) -> Params:
    keys = iter(jax.random.split(key, 8192))
    dim = cfg.embed_dim

    def linear(cin, cout):
        return {"kernel": jax.random.normal(next(keys), (cin, cout),
                                            jnp.float32) * 0.02,
                "bias": jnp.zeros((cout,), jnp.float32)}

    def ln(c):
        return {"scale": jnp.ones((c,), jnp.float32),
                "bias": jnp.zeros((c,), jnp.float32)}

    def block(heads):
        n_bias = (2 * cfg.window_size - 1) ** 2
        return {
            "norm1": ln(dim), "norm2": ln(dim),
            "attn": {
                "qkv": linear(dim, 3 * dim),
                "proj": linear(dim, dim),
                "relative_position_bias_table": jax.random.normal(
                    next(keys), (n_bias, heads), jnp.float32) * 0.02,
            },
            "conv_block": {
                "conv1": init_conv2d(next(keys), 3, 3, dim,
                                     dim // cfg.compress_ratio),
                "conv2": init_conv2d(next(keys), 3, 3,
                                     dim // cfg.compress_ratio, dim),
                "attn": {
                    "down": init_conv2d(next(keys), 1, 1, dim,
                                        dim // cfg.squeeze_factor),
                    "up": init_conv2d(next(keys), 1, 1,
                                      dim // cfg.squeeze_factor, dim),
                },
            },
            "mlp": {"fc1": linear(dim, int(dim * cfg.mlp_ratio)),
                    "fc2": linear(int(dim * cfg.mlp_ratio), dim)},
        }

    def ocab(heads):
        n_bias = (cfg.window_size + cfg.overlap_win_size - 1) ** 2
        return {
            "norm1": ln(dim), "norm2": ln(dim),
            "qkv": linear(dim, 3 * dim),
            "proj": linear(dim, dim),
            "relative_position_bias_table": jax.random.normal(
                next(keys), (n_bias, heads), jnp.float32) * 0.02,
            "mlp": {"fc1": linear(dim, int(dim * cfg.mlp_ratio)),
                    "fc2": linear(int(dim * cfg.mlp_ratio), dim)},
        }

    params: Params = {
        "conv_first": init_conv2d(next(keys), 3, 3, cfg.in_channels, dim),
        "layers": [
            {"blocks": [block(cfg.num_heads[li])
                        for _ in range(cfg.depths[li])],
             "overlap_attn": ocab(cfg.num_heads[li]),
             "conv": init_conv2d(next(keys), 3, 3, dim, dim)}
            for li in range(len(cfg.depths))],
        "norm": ln(dim),
        "conv_after_body": init_conv2d(next(keys), 3, 3, dim, dim),
        "conv_before_upsample": init_conv2d(next(keys), 3, 3, dim,
                                            cfg.num_feat),
        "conv_last": init_conv2d(next(keys), 3, 3, cfg.num_feat,
                                 cfg.out_channels),
    }
    if cfg.patch_norm:
        params["patch_norm"] = ln(dim)
    ups = []
    s = cfg.scale
    while s > 1:
        r = 3 if s % 2 else 2
        ups.append(init_conv2d(next(keys), 3, 3, cfg.num_feat,
                               cfg.num_feat * r * r))
        s //= r
    params["upsample"] = ups
    return params


# ---------------------------------------------------------------------------
# Checkpoint loading (official HAT key schema)
# ---------------------------------------------------------------------------

_HAT_BLOCK_RE = re.compile(
    r"^layers\.(\d+)\.residual_group\.blocks\.(\d+)\.")


def is_hat_state_dict(sd: Mapping[str, Any]) -> bool:
    """HAT shares SwinIR's layers.N.residual_group.blocks.M spine; the
    CAB and OCAB keys are unique to it (check HAT before SwinIR)."""
    return any(".conv_block.cab." in k or ".overlap_attn." in k
               for k in sd)


# shared state-dict extractors (hdrvae.models.params)


def hat_from_state_dict(sd: Mapping[str, Any]) -> tuple[Params, HATConfig]:
    """Build (params, config) from the official HAT checkpoint schema,
    inferring every hyperparameter from tensor shapes/keys.  The
    ``relative_position_index_SA/OCA`` and ``attn_mask`` buffers some
    checkpoints carry are recomputed statics and ignored."""
    if not is_hat_state_dict(sd):
        raise ValueError("not a HAT state dict")

    n_layers = 1 + max(int(m.group(1)) for k in sd
                       if (m := _HAT_BLOCK_RE.match(k)))
    depths = tuple(
        1 + max(int(m.group(2)) for k in sd
                if (m := _HAT_BLOCK_RE.match(k)) and int(m.group(1)) == li)
        for li in range(n_layers))
    w_first = _to_np(sd["conv_first.weight"])
    embed_dim, in_ch = w_first.shape[0], w_first.shape[1]
    bias_tables = [
        _to_np(sd[f"layers.{li}.residual_group.blocks.0.attn."
                  f"relative_position_bias_table"])
        for li in range(n_layers)]
    num_heads = tuple(t.shape[1] for t in bias_tables)
    window_size = (int(round(np.sqrt(bias_tables[0].shape[0]))) + 1) // 2
    oca_rows = _to_np(sd["layers.0.residual_group.overlap_attn."
                         "relative_position_bias_table"]).shape[0]
    wse = int(round(np.sqrt(oca_rows))) + 1 - window_size
    overlap_ratio = (wse - window_size) / window_size
    cab0 = _to_np(sd["layers.0.residual_group.blocks.0.conv_block.cab.0"
                     ".weight"])
    compress_ratio = embed_dim // cab0.shape[0]
    ca_down = _to_np(sd["layers.0.residual_group.blocks.0.conv_block.cab.3"
                        ".attention.1.weight"])
    squeeze_factor = embed_dim // ca_down.shape[0]
    fc1 = _to_np(sd["layers.0.residual_group.blocks.0.mlp.fc1.weight"])
    mlp_ratio = fc1.shape[0] / embed_dim
    patch_norm = "patch_embed.norm.weight" in sd
    num_feat = _to_np(sd["conv_before_upsample.0.weight"]).shape[0]
    out_ch = _to_np(sd["conv_last.weight"]).shape[0]
    scale = 1
    for k in sorted(sd):
        if re.match(r"^upsample\.\d+\.weight$", k):
            r2 = _to_np(sd[k]).shape[0] // num_feat
            scale *= int(round(np.sqrt(r2)))

    cfg = HATConfig(in_channels=in_ch, out_channels=out_ch,
                    embed_dim=embed_dim, depths=depths,
                    num_heads=num_heads, window_size=window_size,
                    compress_ratio=compress_ratio,
                    squeeze_factor=squeeze_factor,
                    overlap_ratio=overlap_ratio, mlp_ratio=mlp_ratio,
                    patch_norm=patch_norm, num_feat=num_feat, scale=scale)

    layers = []
    for li in range(n_layers):
        blocks = []
        for bi in range(depths[li]):
            p = f"layers.{li}.residual_group.blocks.{bi}."
            blocks.append({
                "norm1": _ln_from(sd, p + "norm1"),
                "norm2": _ln_from(sd, p + "norm2"),
                "attn": {
                    "qkv": _lin_from(sd, p + "attn.qkv"),
                    "proj": _lin_from(sd, p + "attn.proj"),
                    "relative_position_bias_table": _to_np(
                        sd[p + "attn.relative_position_bias_table"]),
                },
                "conv_block": {
                    "conv1": _conv_from(sd, p + "conv_block.cab.0"),
                    "conv2": _conv_from(sd, p + "conv_block.cab.2"),
                    "attn": {
                        "down": _conv_from(
                            sd, p + "conv_block.cab.3.attention.1"),
                        "up": _conv_from(
                            sd, p + "conv_block.cab.3.attention.3"),
                    },
                },
                "mlp": {"fc1": _lin_from(sd, p + "mlp.fc1"),
                        "fc2": _lin_from(sd, p + "mlp.fc2")},
            })
        o = f"layers.{li}.residual_group.overlap_attn."
        layers.append({
            "blocks": blocks,
            "overlap_attn": {
                "norm1": _ln_from(sd, o + "norm1"),
                "norm2": _ln_from(sd, o + "norm2"),
                "qkv": _lin_from(sd, o + "qkv"),
                "proj": _lin_from(sd, o + "proj"),
                "relative_position_bias_table": _to_np(
                    sd[o + "relative_position_bias_table"]),
                "mlp": {"fc1": _lin_from(sd, o + "mlp.fc1"),
                        "fc2": _lin_from(sd, o + "mlp.fc2")},
            },
            "conv": _conv_from(sd, f"layers.{li}.conv"),
        })

    params: Params = {
        "conv_first": _conv_from(sd, "conv_first"),
        "layers": layers,
        "norm": _ln_from(sd, "norm"),
        "conv_after_body": _conv_from(sd, "conv_after_body"),
        "conv_before_upsample": _conv_from(sd, "conv_before_upsample.0"),
        "upsample": [
            _conv_from(sd, k[:-len(".weight")])
            for k in sorted(k for k in sd
                            if re.match(r"^upsample\.\d+\.weight$", k))],
        "conv_last": _conv_from(sd, "conv_last"),
    }
    if patch_norm:
        params["patch_norm"] = _ln_from(sd, "patch_embed.norm")

    params = jax.tree_util.tree_map(jnp.asarray, params)
    return params, cfg

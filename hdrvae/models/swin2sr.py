"""Swin2SR super-resolution transformer in functional JAX (NHWC).

The reference upscales with ANY spandrel-supported model
(`/root/reference/hdr_upscale_with_model.py:72-76`); Swin2SR checkpoints
(classical / lightweight / compressed-input / real-world SR and the JPEG
compression-artifact family) previously hit hdrvae's named rejection.
This module implements the Swin2SR forward — SwinIR's conv + RSTB + head
skeleton with SwinV2 transformer blocks — and loads the official
checkpoint key schema.

SwinV2 block differences from SwinIR v1 (all implemented here, shared
geometry helpers come from models/swinir.py):
  - cosine attention: q/k are L2-normalized per head and the similarity
    is scaled by a learned per-head ``logit_scale`` (clamp-exp at 100);
  - continuous position bias: a 2-layer MLP maps log-spaced relative
    coordinates to per-head biases, passed through 16*sigmoid — no
    learned bias table;
  - qkv has no Linear bias; separate q_bias/v_bias params (k bias zero);
  - res-post-norm: LayerNorm is applied to the attention/MLP branch
    OUTPUT before the residual add (v1 normalizes the input).

Swin2SR also adds the ``pixelshuffle_aux`` head (compressed-input SR):
a bicubic skip of the input through ``conv_bicubic`` joins the
pixel-shuffle path, with an auxiliary LR image bounced through
``conv_aux``/``conv_after_aux``.

The window attention runs through the fused Swin Pallas block kernel
(kernels/swin_attention.py) in TPU fast mode — swin_block_fused's
``post_norm``/``qk_scale`` options express the v2 differences (q/k
normalization + logit scale fold into the prologue, CPB bias rides the
v1 bias tables, res-post-norm reorders the epilogue) — and falls back
to the XLA einsum path elsewhere (use_swin_kernel gate).  Matmuls run in
Precision.compute_dtype with float32 accumulation; q/k normalization,
logit scaling, CPB MLP, and LayerNorm statistics are float32.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import re
from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hdrvae.core.config import Precision
from hdrvae.models.layers import _conv_precision, conv2d, init_conv2d
from hdrvae.models.params import (conv_from_sd as _conv_from,
                                  linear_from_sd as _lin_from,
                                  norm_affine_from_sd as _ln_from,
                                  to_np as _to_np)
from hdrvae.models.swinir import (_BLOCK_RE, _RGB_MEAN,
                                  _layer_norm, _linear, _pixel_shuffle,
                                  _relative_position_index,
                                  _shift_attn_mask, _window_merge,
                                  _window_partition)

Params = Dict[str, Any]

UPSAMPLERS = ("pixelshuffle", "pixelshuffle_aux", "pixelshuffledirect",
              "nearest+conv", "")

_CPB_HIDDEN = 512  # SwinV2 architecture constant


@dataclasses.dataclass(frozen=True)
class Swin2SRConfig:
    in_channels: int = 3
    out_channels: int = 3
    embed_dim: int = 180
    depths: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    num_heads: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 2.0
    upsampler: str = "pixelshuffle"
    resi_connection: str = "1conv"
    patch_norm: bool = True
    num_feat: int = 64          # upsampler intermediate width
    scale: int = 4
    img_range: float = 1.0

    def with_small(self) -> "Swin2SRConfig":
        """Tiny fixture for tests (fast on 1 CPU core)."""
        return dataclasses.replace(
            self, embed_dim=16, depths=(2, 2), num_heads=(2, 2),
            window_size=4, num_feat=8, scale=2)


# ---------------------------------------------------------------------------
# SwinV2 continuous position bias (static log-spaced coords, trace-time)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _cpb_coords_table(ws: int) -> np.ndarray:
    """[(2ws-1)^2, 2] log-spaced relative coordinates in [-1, 1]
    (SwinV2's sign(t) * log2(|8t| + 1) / log2(8), pretrained window 0 —
    i.e. normalized by the checkpoint's own window size)."""
    r = np.arange(-(ws - 1), ws, dtype=np.float32)
    t = np.stack(np.meshgrid(r, r, indexing="ij"), axis=-1)
    t = t / (ws - 1) * 8.0
    t = np.sign(t) * np.log2(np.abs(t) + 1.0) / np.log2(8.0)
    return t.reshape(-1, 2).astype(np.float32)


def _cpb_bias(p: Params, ws: int) -> jnp.ndarray:
    """Continuous position bias: cpb_mlp(coords) gathered by the v1
    relative-position index, through 16*sigmoid.  [heads, N, N], f32."""
    n = ws * ws
    t = jnp.asarray(_cpb_coords_table(ws))
    h1 = jax.nn.relu(t @ p["cpb_fc1"]["kernel"] + p["cpb_fc1"]["bias"])
    tbl = h1 @ p["cpb_fc2"]["kernel"]                    # [(2ws-1)^2, h]
    rpi = _relative_position_index(ws)
    bias = tbl[rpi.reshape(-1)].reshape(n, n, -1).transpose(2, 0, 1)
    return 16.0 * jax.nn.sigmoid(bias)


# ---------------------------------------------------------------------------
# SwinV2 block
# ---------------------------------------------------------------------------


def _window_attention_v2(x: jnp.ndarray, p: Params, heads: int, ws: int,
                         mask: np.ndarray | None,
                         precision: Precision) -> jnp.ndarray:
    """Cosine window attention (SwinV2): per-head L2-normalized q/k,
    learned logit scale clamped at 100, CPB bias."""
    nwb, n, c = x.shape
    hd = c // heads
    dtype = precision.compute_dtype

    qkv = _linear(x, p["qkv"], precision)                # [nWB, N, 3C]
    qkv = qkv.reshape(nwb, n, 3, heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]                     # [nWB, h, N, hd]
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qf = qf / jnp.maximum(
        jnp.linalg.norm(qf, axis=-1, keepdims=True), 1e-12)
    kf = kf / jnp.maximum(
        jnp.linalg.norm(kf, axis=-1, keepdims=True), 1e-12)
    attn = jnp.einsum("bhnd,bhmd->bhnm", qf.astype(dtype), kf.astype(dtype),
                      precision=_conv_precision(precision),
                      preferred_element_type=jnp.float32)
    scale = jnp.exp(jnp.minimum(p["logit_scale"].astype(jnp.float32),
                                math.log(100.0)))        # [h, 1, 1]
    attn = attn * scale[None]
    attn = attn + _cpb_bias(p, ws)[None]

    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(nwb // nw, nw, heads, n, n)
        attn = attn + jnp.asarray(mask)[None, :, None]
        attn = attn.reshape(nwb, heads, n, n)

    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(dtype),
                     v.astype(dtype),
                     precision=_conv_precision(precision),
                     preferred_element_type=jnp.float32)
    out = out.transpose(0, 2, 1, 3).reshape(nwb, n, c)
    return _linear(out.astype(precision.storage_dtype), p["proj"],
                   precision)


def _swin2_block_kernel(x: jnp.ndarray, p: Params, heads: int, ws: int,
                        shift: int, precision: Precision) -> jnp.ndarray:
    """The whole SwinV2 block as ONE Pallas call (swin_block_fused with
    post_norm + cosine attention): the raw (rolled) x is both kernel
    input and residual — v2 has no pre-norm, so nothing needs to
    commute with the roll; the clamped-exp logit scale folds into the
    normalized q inside the kernel and the CPB bias bakes into the
    resident tables."""
    from hdrvae.kernels.swin_attention import (pick_bwin,
                                               swin_block_fused)
    b, h, w, c = x.shape
    n = ws * ws
    nww = w // ws
    ya = jnp.roll(x, (-shift, -shift), axis=(1, 2)) if shift else x
    bwin = pick_bwin(nww, n)
    scale = jnp.exp(jnp.minimum(
        p["attn"]["logit_scale"].astype(jnp.float32),
        math.log(100.0))).reshape(heads)
    y = swin_block_fused(ya, p["attn"], p["norm1"], p["norm2"],
                         p["mlp"], heads, ws=ws, shift=shift,
                         bias_hnn=_cpb_bias(p["attn"], ws),
                         bwin=bwin, precision=precision,
                         post_norm=True, qk_scale=scale)
    if shift:
        y = jnp.roll(y, (shift, shift), axis=(1, 2))
    return y


def _swin2_block(x: jnp.ndarray, p: Params, heads: int, ws: int,
                 shift: int, precision: Precision) -> jnp.ndarray:
    """One SwinV2 block (res-post-norm) on an NHWC grid."""
    b, h, w, c = x.shape
    from hdrvae.kernels.swin_attention import use_swin_kernel
    if use_swin_kernel(precision, h, w, ws, c // heads):
        return _swin2_block_kernel(x, p, heads, ws, shift, precision)
    shortcut = x
    y = x
    if shift:
        y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
    wins = _window_partition(y, ws)
    mask = _shift_attn_mask(h, w, ws, shift) if shift else None
    wins = _window_attention_v2(wins, p["attn"], heads, ws, mask,
                                precision)
    y = _window_merge(wins, ws, h, w)
    if shift:
        y = jnp.roll(y, (shift, shift), axis=(1, 2))
    x = shortcut + _layer_norm(y, p["norm1"])
    # MLP with exact (erf) GELU, normalized POST-branch (v2)
    y = _linear(x, p["mlp"]["fc1"], precision)
    y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(
        precision.storage_dtype)
    y = _linear(y, p["mlp"]["fc2"], precision)
    return x + _layer_norm(y, p["norm2"])


def _rstb_conv(x: jnp.ndarray, p: Params,
               precision: Precision) -> jnp.ndarray:
    if "conv" in p:
        return conv2d(x, p["conv"], precision=precision)

    def lrelu(t):
        return jnp.where(t >= 0, t, 0.2 * t)

    y = lrelu(conv2d(x, p["conv0"], precision=precision))
    y = lrelu(conv2d(y, p["conv1"], precision=precision))
    return conv2d(y, p["conv2"], precision=precision)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _lrelu01(x: jnp.ndarray) -> jnp.ndarray:
    """nn.LeakyReLU() default slope 0.01 (Swin2SR's conv_before_upsample
    and conv_after_aux — NOT the 0.2 used inside the real-SR head)."""
    return jnp.where(x >= 0, x, 0.01 * x)


def swin2sr_apply(params: Params, x: jnp.ndarray,
                  cfg: Swin2SRConfig = Swin2SRConfig(), *,
                  precision: Precision = Precision()) -> jnp.ndarray:
    """Upscale NHWC [B, H, W, C] -> [B, scale*H, scale*W, C].

    Follows the official forward: reflect-pad H/W to window multiples,
    subtract the RGB mean and scale by img_range, shallow conv, RSTB
    stack (SwinV2 blocks) with a final LayerNorm, conv_after_body
    residual, upsampler head, un-normalize, crop to scale * original.
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
    x_in = x.astype(jnp.float32)   # aux head's bicubic skip / '' residual
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
            y = _swin2_block(y, block, cfg.num_heads[li], ws, shift,
                             precision)
        tok = _rstb_conv(y, layer, precision) + res
    tok = _layer_norm(tok, params["norm"])
    body = conv2d(tok, params["conv_after_body"], precision=precision)
    feat = feat + body

    def _shuffle_chain(y):
        for up in params["upsample"]:
            r = int(round(np.sqrt(up["kernel"].shape[-1] // cfg.num_feat)))
            y = conv2d(y, up, precision=precision)
            y = _pixel_shuffle(y, r)
        return y

    if cfg.upsampler == "pixelshuffle":
        # NOTE: LeakyReLU (default 0.01) here — SwinIR's same head uses ReLU
        y = _lrelu01(conv2d(feat, params["conv_before_upsample"],
                            precision=precision))
        y = _shuffle_chain(y)
        y = conv2d(y, params["conv_last"], precision=precision)
    elif cfg.upsampler == "pixelshuffle_aux":
        from hdrvae.upscale.resize import bicubic_torch
        bic = bicubic_torch(x_in, h0 * cfg.scale, w0 * cfg.scale)
        bic = conv2d(bic, params["conv_bicubic"], precision=precision)
        y = _lrelu01(conv2d(feat, params["conv_before_upsample"],
                            precision=precision))
        aux = conv2d(y, params["conv_aux"], precision=precision)
        y = _lrelu01(conv2d(aux, params["conv_after_aux"],
                            precision=precision))
        y = _shuffle_chain(y)
        y = y[:, :h0 * cfg.scale, :w0 * cfg.scale].astype(jnp.float32) \
            + bic.astype(jnp.float32)
        y = conv2d(y.astype(precision.storage_dtype), params["conv_last"],
                   precision=precision)
    elif cfg.upsampler == "pixelshuffledirect":
        y = conv2d(feat, params["upsample"][0], precision=precision)
        y = _pixel_shuffle(y, cfg.scale)
    elif cfg.upsampler == "nearest+conv":
        # real-SR head, scale-4 only in the official network; 0.01 slope
        # after conv_before_upsample, 0.2 for the up/hr convs
        from hdrvae.models.layers import nearest_upsample_2x
        y = _lrelu01(conv2d(feat, params["conv_before_upsample"],
                            precision=precision))

        def lrelu(t):
            return jnp.where(t >= 0, t, 0.2 * t)

        y = lrelu(conv2d(nearest_upsample_2x(y), params["conv_up1"],
                         precision=precision))
        y = lrelu(conv2d(nearest_upsample_2x(y), params["conv_up2"],
                         precision=precision))
        y = lrelu(conv2d(y, params["conv_hr"], precision=precision))
        y = conv2d(y, params["conv_last"], precision=precision)
    elif cfg.upsampler == "":
        # restoration head (JPEG CAR / denoise): conv_last + input residual
        y = conv2d(feat, params["conv_last"], precision=precision)
        y = x_in + y.astype(jnp.float32)
    else:
        raise ValueError(f"unknown upsampler {cfg.upsampler!r}")

    y = y.astype(jnp.float32) / cfg.img_range
    if cfg.in_channels == 3:
        y = y + jnp.asarray(_RGB_MEAN, jnp.float32)
    return y[:, :h0 * cfg.scale, :w0 * cfg.scale]


# ---------------------------------------------------------------------------
# Initialization (fixtures)
# ---------------------------------------------------------------------------


def init_swin2sr(key: jax.Array,
                 cfg: Swin2SRConfig = Swin2SRConfig()) -> Params:
    keys = iter(jax.random.split(key, 4096))
    dim = cfg.embed_dim

    def linear(cin, cout, bias=True):
        p = {"kernel": jax.random.normal(next(keys), (cin, cout),
                                         jnp.float32) * 0.02}
        if bias:
            p["bias"] = jnp.zeros((cout,), jnp.float32)
        return p

    def ln(c):
        return {"scale": jnp.ones((c,), jnp.float32),
                "bias": jnp.zeros((c,), jnp.float32)}

    def block(heads):
        return {
            "norm1": ln(dim), "norm2": ln(dim),
            "attn": {
                "qkv": linear(dim, 3 * dim),
                "proj": linear(dim, dim),
                "logit_scale": jnp.full((heads, 1, 1),
                                        float(np.log(10.0)), jnp.float32),
                "cpb_fc1": linear(2, _CPB_HIDDEN),
                "cpb_fc2": linear(_CPB_HIDDEN, heads, bias=False),
            },
            "mlp": {"fc1": linear(dim, int(dim * cfg.mlp_ratio)),
                    "fc2": linear(int(dim * cfg.mlp_ratio), dim)},
        }

    params: Params = {
        "conv_first": init_conv2d(next(keys), 3, 3, cfg.in_channels, dim),
        "layers": [
            {"blocks": [block(cfg.num_heads[li])
                        for _ in range(cfg.depths[li])],
             "conv": init_conv2d(next(keys), 3, 3, dim, dim)}
            for li in range(len(cfg.depths))],
        "norm": ln(dim),
        "conv_after_body": init_conv2d(next(keys), 3, 3, dim, dim),
    }
    if cfg.patch_norm:
        params["patch_norm"] = ln(dim)
    nf = cfg.num_feat

    def upseq():
        ups, s = [], cfg.scale
        while s > 1:
            r = 3 if s % 2 else 2
            ups.append(init_conv2d(next(keys), 3, 3, nf, nf * r * r))
            s //= r
        return ups

    if cfg.upsampler == "pixelshuffle":
        params["conv_before_upsample"] = init_conv2d(next(keys), 3, 3,
                                                     dim, nf)
        params["upsample"] = upseq()
        params["conv_last"] = init_conv2d(next(keys), 3, 3, nf,
                                          cfg.out_channels)
    elif cfg.upsampler == "pixelshuffle_aux":
        params["conv_bicubic"] = init_conv2d(next(keys), 3, 3,
                                             cfg.in_channels, nf)
        params["conv_before_upsample"] = init_conv2d(next(keys), 3, 3,
                                                     dim, nf)
        params["conv_aux"] = init_conv2d(next(keys), 3, 3, nf,
                                         cfg.out_channels)
        params["conv_after_aux"] = init_conv2d(next(keys), 3, 3, 3, nf)
        params["upsample"] = upseq()
        params["conv_last"] = init_conv2d(next(keys), 3, 3, nf,
                                          cfg.out_channels)
    elif cfg.upsampler == "pixelshuffledirect":
        params["upsample"] = [init_conv2d(
            next(keys), 3, 3, dim, cfg.out_channels * cfg.scale ** 2)]
    elif cfg.upsampler == "nearest+conv":
        params["conv_before_upsample"] = init_conv2d(next(keys), 3, 3,
                                                     dim, nf)
        params["conv_up1"] = init_conv2d(next(keys), 3, 3, nf, nf)
        params["conv_up2"] = init_conv2d(next(keys), 3, 3, nf, nf)
        params["conv_hr"] = init_conv2d(next(keys), 3, 3, nf, nf)
        params["conv_last"] = init_conv2d(next(keys), 3, 3, nf,
                                          cfg.out_channels)
    elif cfg.upsampler == "":
        params["conv_last"] = init_conv2d(next(keys), 3, 3, dim,
                                          cfg.out_channels)
    return params


# ---------------------------------------------------------------------------
# Checkpoint loading (official Swin2SR key schema)
# ---------------------------------------------------------------------------


def is_swin2sr_state_dict(sd: Mapping[str, Any]) -> bool:
    """Swin2SR = SwinIR's residual_group.blocks spine + SwinV2 attention
    params (logit_scale / cpb_mlp) instead of a learned bias table.
    Also recognizes the HuggingFace ``transformers`` export of the same
    network (``swin2sr.``-prefixed keys)."""
    if is_hf_swin2sr_state_dict(sd):
        return True
    if not any(_BLOCK_RE.match(k) for k in sd):
        return False
    return any(k.endswith(".attn.logit_scale") for k in sd)


# ---------------------------------------------------------------------------
# HuggingFace transformers schema (Swin2SRForImageSuperResolution)
# ---------------------------------------------------------------------------


def is_hf_swin2sr_state_dict(sd: Mapping[str, Any]) -> bool:
    """The ``transformers`` library's Swin2SR export: the body lives
    under a ``swin2sr.`` prefix (``caidas/swin2SR-*`` checkpoints)."""
    return "swin2sr.first_convolution.weight" in sd


def _check_identity_projection(w: np.ndarray, b: np.ndarray | None,
                               key: str) -> None:
    """The HF port inserts 1x1 'projection' convs into patch embedding
    that do not exist in the original network; converted checkpoints
    carry them as identity.  Anything else cannot be represented by the
    original forward — reject instead of silently dropping weights."""
    c = w.shape[0]
    ident = np.eye(c, dtype=np.float32).reshape(c, c, 1, 1)
    if w.shape != (c, c, 1, 1) or not np.allclose(w, ident, atol=1e-5) \
            or (b is not None and not np.allclose(b, 0.0, atol=1e-5)):
        raise ValueError(
            f"HF Swin2SR checkpoint has a non-identity patch "
            f"'projection' conv ({key}); the original Swin2SR network "
            "has no such layer, so this checkpoint cannot be mapped "
            "onto it")


def hf_swin2sr_to_original(sd: Mapping[str, Any],
                           window_size: int | None = None
                           ) -> Dict[str, Any]:
    """Convert a ``transformers`` Swin2SRForImageSuperResolution state
    dict to the original-repo key schema `swin2sr_from_state_dict`
    reads.

    HF checkpoints carry no geometry buffers (``relative_coords_table``
    / ``relative_position_index`` are non-persistent), so the window
    size cannot be inferred; every published ``caidas/swin2SR-*``
    checkpoint uses window 8 except the JPEG-CAR family's 7, and that
    default is applied unless ``window_size`` is given.  A synthetic
    coords-table buffer is emitted so downstream inference sees the
    chosen window.

    Note the HF FORWARD deviates from the original network in two skip
    paths (the aux head's bicubic skip convolves the raw instead of the
    normalized input; the ``''`` head adds the raw instead of the
    normalized input) — the WEIGHTS are pure renames, and hdrvae
    reproduces the original repo's semantics with them.
    """
    if not is_hf_swin2sr_state_dict(sd):
        raise ValueError("not an HF-transformers Swin2SR state dict")
    if "swin2sr.embeddings.position_embeddings" in sd:
        raise ValueError("Swin2SR checkpoints with ape=True (absolute "
                         "position embedding) are not supported")

    out: Dict[str, Any] = {}
    qkv_parts: Dict[str, Dict[str, np.ndarray]] = {}

    def put(k, v):
        out[k] = _to_np(v)

    _STATIC = {
        "swin2sr.first_convolution": "conv_first",
        "swin2sr.embeddings.patch_embeddings.layernorm": "patch_embed.norm",
        "swin2sr.layernorm": "norm",
        "swin2sr.conv_after_body": "conv_after_body",
        # heads (only the keys present for the checkpoint's head match)
        "upsample.conv_before_upsample": "conv_before_upsample.0",
        "upsample.final_convolution": "conv_last",
        "upsample.conv": "upsample.0",              # pixelshuffledirect
        "upsample.conv_up1": "conv_up1",
        "upsample.conv_up2": "conv_up2",
        "upsample.conv_hr": "conv_hr",
        "upsample.conv_bicubic": "conv_bicubic",
        "upsample.conv_aux": "conv_aux",
        "upsample.conv_after_aux.0": "conv_after_aux.0",
        "upsample.upsample.convolution": "upsample.0",   # scale-3 chain
        "final_convolution": "conv_last",           # '' restoration head
    }
    _BLK = {
        "attention.output.dense": "attn.proj",
        "attention.self.logit_scale": "attn.logit_scale",
        "attention.self.continuous_position_bias_mlp.0": "attn.cpb_mlp.0",
        "attention.self.continuous_position_bias_mlp.2": "attn.cpb_mlp.2",
        "layernorm_before": "norm1",
        "layernorm_after": "norm2",
        "intermediate.dense": "mlp.fc1",
        "output.dense": "mlp.fc2",
    }
    stage_re = re.compile(r"^swin2sr\.encoder\.stages\.(\d+)\.(.+)$")
    blk_re = re.compile(r"^layers\.(\d+)\.(.+)$")
    up_re = re.compile(r"^upsample\.upsample\.convolution_(\d+)\.(weight"
                       r"|bias)$")

    for key, val in sd.items():
        base, _, leaf = key.rpartition(".")
        if base.endswith("patch_embeddings.projection") or \
                base.endswith("patch_embed.projection"):
            if leaf == "weight":
                bias = sd.get(base + ".bias")
                _check_identity_projection(
                    _to_np(val),
                    None if bias is None else _to_np(bias), key)
            continue
        if base in _STATIC:
            put(f"{_STATIC[base]}.{leaf}", val)
            continue
        m = up_re.match(key)
        if m:   # 2^n pixel-shuffle chain: convolution_{i} -> upsample.{2i}
            put(f"upsample.{2 * int(m.group(1))}.{m.group(2)}", val)
            continue
        m = stage_re.match(key)
        if not m:
            raise ValueError(f"unrecognized HF Swin2SR key: {key}")
        li, rest = int(m.group(1)), m.group(2)
        if rest.startswith("conv."):            # 3conv residual variant
            put(f"layers.{li}.{rest}", val)
            continue
        mb = blk_re.match(rest)
        if not mb:
            raise ValueError(f"unrecognized HF Swin2SR key: {key}")
        bi, brest = int(mb.group(1)), mb.group(2)
        pfx = f"layers.{li}.residual_group.blocks.{bi}."
        bbase, _, bleaf = brest.rpartition(".")
        if bbase in ("attention.self.query", "attention.self.key",
                     "attention.self.value"):
            qkv_parts.setdefault(pfx, {})[
                f"{bbase.rsplit('.', 1)[1]}.{bleaf}"] = _to_np(val)
            continue
        if bbase in _BLK:
            put(f"{pfx}{_BLK[bbase]}.{bleaf}", val)
        elif brest in _BLK:                     # leaf-less (logit_scale)
            put(f"{pfx}{_BLK[brest]}", val)
        else:
            raise ValueError(f"unrecognized HF Swin2SR key: {key}")

    for pfx, parts in qkv_parts.items():
        out[pfx + "attn.qkv.weight"] = np.concatenate(
            [parts["query.weight"], parts["key.weight"],
             parts["value.weight"]], axis=0)
        out[pfx + "attn.q_bias"] = parts["query.bias"]
        out[pfx + "attn.v_bias"] = parts["value.bias"]

    # stage-level RSTB conv: HF stores it as stages.{i}.conv(.N) which the
    # loop above emitted as layers.{i}.conv(.N) — already original-named.
    if window_size is None:
        window_size = 7 if "conv_last.weight" in out and \
            "conv_before_upsample.0.weight" not in out and \
            "upsample.0.weight" not in out and \
            "conv_up1.weight" not in out else 8
        import logging
        logging.getLogger(__name__).info(
            "HF Swin2SR checkpoint carries no geometry buffers; assuming "
            "window_size=%d (pass window_size to override)", window_size)
    out["layers.0.residual_group.blocks.0.attn.relative_coords_table"] = \
        np.zeros((1, 2 * window_size - 1, 2 * window_size - 1, 2),
                 np.float32)
    return out


def swin2sr_from_state_dict(sd: Mapping[str, Any],
                            img_range: float | None = None
                            ) -> tuple[Params, Swin2SRConfig]:
    """Build (params, config) from the official Swin2SR checkpoint
    schema.  ``img_range`` is an architecture constant not stored in
    checkpoints: every public SR head uses 1.0; the scale-1 ``""`` head
    is the JPEG-CAR family, which ships with 255.0 — that default is
    applied (with a log note) and can be overridden."""
    if not is_swin2sr_state_dict(sd):
        raise ValueError("not a Swin2SR state dict")
    if is_hf_swin2sr_state_dict(sd):
        sd = hf_swin2sr_to_original(sd)
    if "absolute_pos_embed" in sd:
        raise ValueError("Swin2SR checkpoints with ape=True (absolute "
                         "position embedding) are not supported")
    if any(k.startswith(("conv_first_hf.", "layers_hf.")) for k in sd):
        raise ValueError(
            "Swin2SR 'pixelshuffle_hf' (high-frequency branch) "
            "checkpoints are not supported; supported heads: "
            f"{', '.join(repr(u) for u in UPSAMPLERS)}")

    n_layers = 1 + max(int(m.group(1)) for k in sd
                       if (m := _BLOCK_RE.match(k)))
    depths = tuple(
        1 + max(int(m.group(2)) for k in sd
                if (m := _BLOCK_RE.match(k)) and int(m.group(1)) == li)
        for li in range(n_layers))
    w_first = _to_np(sd["conv_first.weight"])
    embed_dim, in_ch = w_first.shape[0], w_first.shape[1]
    num_heads = tuple(
        _to_np(sd[f"layers.{li}.residual_group.blocks.0.attn."
                  f"logit_scale"]).shape[0] for li in range(n_layers))

    b0 = "layers.0.residual_group.blocks.0.attn."
    if b0 + "relative_coords_table" in sd:
        window_size = (_to_np(
            sd[b0 + "relative_coords_table"]).shape[1] + 1) // 2
    elif b0 + "relative_position_index" in sd:
        n = _to_np(sd[b0 + "relative_position_index"]).shape[0]
        window_size = int(round(np.sqrt(n)))
    else:
        import logging
        logging.getLogger(__name__).warning(
            "Swin2SR checkpoint carries no geometry buffers; assuming "
            "window_size=8 (every public SR family; the JPEG-CAR family "
            "uses 7)")
        window_size = 8
    fc1 = _to_np(sd["layers.0.residual_group.blocks.0.mlp.fc1.weight"])
    mlp_ratio = fc1.shape[0] / embed_dim
    patch_norm = "patch_embed.norm.weight" in sd
    resi = "3conv" if "layers.0.conv.0.weight" in sd else "1conv"

    def _shuffle_scale(num_feat):
        scale = 1
        for k in sorted(sd):
            if re.match(r"^upsample\.\d+\.weight$", k):
                r2 = _to_np(sd[k]).shape[0] // num_feat
                scale *= int(round(np.sqrt(r2)))
        return scale

    if "conv_bicubic.weight" in sd:
        upsampler = "pixelshuffle_aux"
        num_feat = _to_np(sd["conv_bicubic.weight"]).shape[0]
        out_ch = _to_np(sd["conv_last.weight"]).shape[0]
        scale = _shuffle_scale(num_feat)
    elif "conv_up1.weight" in sd:
        upsampler = "nearest+conv"
        num_feat = _to_np(sd["conv_up1.weight"]).shape[0]
        out_ch = _to_np(sd["conv_last.weight"]).shape[0]
        scale = 4   # hardcoded in the official network (conv_up1 + up2)
    elif "conv_before_upsample.0.weight" in sd:
        upsampler = "pixelshuffle"
        num_feat = _to_np(sd["conv_before_upsample.0.weight"]).shape[0]
        out_ch = _to_np(sd["conv_last.weight"]).shape[0]
        scale = _shuffle_scale(num_feat)
    elif "upsample.0.weight" in sd:
        upsampler = "pixelshuffledirect"
        num_feat = embed_dim
        w_up = _to_np(sd["upsample.0.weight"])
        out_ch = in_ch
        scale = int(round(np.sqrt(w_up.shape[0] // out_ch)))
    else:
        upsampler = ""
        num_feat = embed_dim
        out_ch = _to_np(sd["conv_last.weight"]).shape[0]
        scale = 1

    if img_range is None:
        img_range = 1.0
        if upsampler == "":
            import logging
            img_range = 255.0
            logging.getLogger(__name__).info(
                "scale-1 Swin2SR checkpoint: assuming the JPEG-CAR "
                "family's img_range=255.0 (pass img_range to override)")
    cfg = Swin2SRConfig(in_channels=in_ch, out_channels=out_ch,
                        embed_dim=embed_dim, depths=depths,
                        num_heads=num_heads, window_size=window_size,
                        mlp_ratio=mlp_ratio, upsampler=upsampler,
                        resi_connection=resi, patch_norm=patch_norm,
                        num_feat=num_feat, scale=scale,
                        img_range=img_range)

    layers = []
    for li in range(n_layers):
        blocks = []
        for bi in range(depths[li]):
            p = f"layers.{li}.residual_group.blocks.{bi}."
            q_bias = _to_np(sd[p + "attn.q_bias"])
            v_bias = _to_np(sd[p + "attn.v_bias"])
            qkv_bias = np.concatenate(
                [q_bias, np.zeros_like(q_bias), v_bias])
            blocks.append({
                "norm1": _ln_from(sd, p + "norm1"),
                "norm2": _ln_from(sd, p + "norm2"),
                "attn": {
                    "qkv": {"kernel": _to_np(sd[p + "attn.qkv.weight"]).T,
                            "bias": qkv_bias},
                    "proj": _lin_from(sd, p + "attn.proj"),
                    "logit_scale": _to_np(sd[p + "attn.logit_scale"]),
                    "cpb_fc1": {
                        "kernel": _to_np(
                            sd[p + "attn.cpb_mlp.0.weight"]).T,
                        "bias": _to_np(sd[p + "attn.cpb_mlp.0.bias"])},
                    "cpb_fc2": {
                        "kernel": _to_np(
                            sd[p + "attn.cpb_mlp.2.weight"]).T},
                },
                "mlp": {"fc1": _lin_from(sd, p + "mlp.fc1"),
                        "fc2": _lin_from(sd, p + "mlp.fc2")},
            })
        layer: Params = {"blocks": blocks}
        if resi == "1conv":
            layer["conv"] = _conv_from(sd, f"layers.{li}.conv")
        else:
            for j, idx in enumerate((0, 2, 4)):
                layer[f"conv{j}"] = _conv_from(sd, f"layers.{li}.conv.{idx}")
        layers.append(layer)

    params: Params = {
        "conv_first": _conv_from(sd, "conv_first"),
        "layers": layers,
        "norm": _ln_from(sd, "norm"),
        "conv_after_body": _conv_from(sd, "conv_after_body"),
    }
    if patch_norm:
        params["patch_norm"] = _ln_from(sd, "patch_embed.norm")
    if upsampler in ("pixelshuffle", "pixelshuffle_aux", "nearest+conv"):
        params["conv_before_upsample"] = _conv_from(
            sd, "conv_before_upsample.0")
        params["conv_last"] = _conv_from(sd, "conv_last")
    if upsampler == "pixelshuffle_aux":
        params["conv_bicubic"] = _conv_from(sd, "conv_bicubic")
        params["conv_aux"] = _conv_from(sd, "conv_aux")
        params["conv_after_aux"] = _conv_from(sd, "conv_after_aux.0")
    if upsampler in ("pixelshuffle", "pixelshuffle_aux"):
        params["upsample"] = [
            _conv_from(sd, k[:-len(".weight")])
            for k in sorted(k for k in sd
                            if re.match(r"^upsample\.\d+\.weight$", k))]
    elif upsampler == "nearest+conv":
        params["conv_up1"] = _conv_from(sd, "conv_up1")
        params["conv_up2"] = _conv_from(sd, "conv_up2")
        params["conv_hr"] = _conv_from(sd, "conv_hr")
    elif upsampler == "pixelshuffledirect":
        params["upsample"] = [_conv_from(sd, "upsample.0")]
    elif upsampler == "":
        params["conv_last"] = _conv_from(sd, "conv_last")

    params = jax.tree_util.tree_map(jnp.asarray, params)
    return params, cfg

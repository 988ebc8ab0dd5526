"""SwinIR super-resolution transformer in functional JAX (NHWC).

The reference upscales with ANY spandrel-supported model and its reversal
map special-cases SwinIR/HAT alongside ESRGAN
(`/root/reference/hdr_upscale_with_model.py:72-76,266-279`); hdrvae's zoo
was RRDBNet-only, so a user's SwinIR checkpoint that works on the
reference hard-failed here.  This module implements the SwinIR forward —
shallow conv feature, Residual Swin Transformer Blocks (window attention
with relative position bias, alternating shifted windows), and the three
public upsampler heads — and loads the official checkpoint key schema.

TPU-first notes: activations stay NHWC ([B, H, W, C], channels on the
lane dim); window partition is pure reshape/transpose; attention is
batched matmuls over [windows, heads, N, N] with N = window**2 (64 for
the standard window 8) — tiny sequences in huge batches.  On TPU in fast
mode the window attention runs as the fused Pallas kernel in
kernels/swin_attention.py (scores stay in VMEM; the XLA formulation's
layout copies and score HBM round trips dominate its profile,
PERF_NOTES.md section 5.6); the einsum path below remains the parity
reference and the non-TPU fallback.
Shift masks and relative-position indices are static numpy, computed at
trace time.  Matmuls run in Precision.compute_dtype with float32
accumulation; LayerNorm statistics are float32.
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
from hdrvae.kernels.swin_attention import use_swin_kernel
from hdrvae.models.layers import _conv_precision, conv2d, init_conv2d, \
    nearest_upsample_2x
from hdrvae.models.params import (conv_from_sd as _conv_from,
                                  conv_kernel_to_hwio,
                                  linear_from_sd as _lin_from,
                                  norm_affine_from_sd as _ln_from,
                                  to_np as _to_np)

Params = Dict[str, Any]

# ImageNet-ish RGB mean subtracted by every public 3-channel SwinIR
# (architecture constant, not stored in checkpoints).
_RGB_MEAN = (0.4488, 0.4371, 0.4040)

UPSAMPLERS = ("pixelshuffle", "pixelshuffledirect", "nearest+conv", "")


@dataclasses.dataclass(frozen=True)
class SwinIRConfig:
    in_channels: int = 3
    out_channels: int = 3
    embed_dim: int = 180
    depths: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    num_heads: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 2.0
    upsampler: str = "nearest+conv"
    resi_connection: str = "1conv"
    patch_norm: bool = True
    num_feat: int = 64          # upsampler intermediate width
    scale: int = 4
    img_range: float = 1.0

    def with_small(self) -> "SwinIRConfig":
        """Tiny fixture for tests (fast on 1 CPU core)."""
        return dataclasses.replace(
            self, embed_dim=16, depths=(2, 2), num_heads=(2, 2),
            window_size=4, num_feat=8, scale=2)


# ---------------------------------------------------------------------------
# Static window geometry (numpy, trace-time)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _relative_position_index(ws: int) -> np.ndarray:
    """[ws*ws, ws*ws] indices into the (2ws-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))          # [2, ws, ws]
    flat = coords.reshape(2, -1)                           # [2, N]
    rel = flat[:, :, None] - flat[:, None, :]              # [2, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.int64)          # [N, N, 2]
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)                                     # [N, N]


@functools.lru_cache(maxsize=None)
def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """[nW, N, N] additive mask (-100 across region boundaries) for
    shifted-window attention on an (h, w) grid."""
    img = np.zeros((h, w), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for vs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, vs] = cnt
            cnt += 1
    win = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)                         # [nW, N]
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, ws*ws, C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def _window_merge(x: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """[B*nW, ws*ws, C] -> [B, H, W, C]."""
    c = x.shape[-1]
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# Functional layers
# ---------------------------------------------------------------------------


def _layer_norm(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _linear(x: jnp.ndarray, p: Params,
            precision: Precision) -> jnp.ndarray:
    dtype = precision.compute_dtype
    y = jnp.einsum("...i,io->...o", x.astype(dtype),
                   p["kernel"].astype(dtype),
                   precision=_conv_precision(precision),
                   preferred_element_type=jnp.float32)
    return (y + p["bias"].astype(jnp.float32)).astype(
        precision.storage_dtype)


def _gather_bias(p: Params, ws: int,
                 rpi: np.ndarray | None = None) -> jnp.ndarray:
    """Relative-position bias from the table: [heads, N, N].  ``rpi``
    overrides the standard window index (HAT shares one precomputed rpi
    across all blocks)."""
    if rpi is None:
        rpi = _relative_position_index(ws)                 # [N, N]
    n = ws * ws
    bias = p["relative_position_bias_table"][rpi.reshape(-1)]
    heads = bias.shape[-1]
    return bias.reshape(n, n, heads).transpose(2, 0, 1)


def _window_attention(x: jnp.ndarray, p: Params, heads: int, ws: int,
                      mask: np.ndarray | None,
                      precision: Precision,
                      rpi: np.ndarray | None = None) -> jnp.ndarray:
    """x: [nWB, N, C] windows; relative position bias + optional shift
    mask; official SwinIR WindowAttention math.  Shared by HAT's HAB
    (which passes its precomputed ``rpi``)."""
    nwb, n, c = x.shape
    hd = c // heads
    dtype = precision.compute_dtype

    qkv = _linear(x, p["qkv"], precision)                  # [nWB, N, 3C]
    qkv = qkv.reshape(nwb, n, 3, heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]                       # [nWB, h, N, hd]
    q = q * (hd ** -0.5)
    attn = jnp.einsum("bhnd,bhmd->bhnm", q.astype(dtype), k.astype(dtype),
                      precision=_conv_precision(precision),
                      preferred_element_type=jnp.float32)

    bias = _gather_bias(p, ws, rpi)                        # [h, N, N]
    attn = attn + bias.astype(jnp.float32)[None]

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


def _swin_block_kernel(x: jnp.ndarray, p: Params, heads: int, ws: int,
                       shift: int, precision: Precision) -> jnp.ndarray:
    """The whole Swin block as ONE Pallas call on the image layout
    (window partition/merge happen in-register via sublane slices):
    the windows array, the slot qkv, and the attention-core output
    never exist in HBM; only the shift roll remains an XLA layout op.
    LN is pointwise, so it commutes with the roll — the RAW (rolled) x
    serves as both kernel input and residual."""
    from hdrvae.kernels.swin_attention import (pick_bwin,
                                               swin_block_fused)
    b, h, w, c = x.shape
    n = ws * ws
    nww = w // ws
    ya = jnp.roll(x, (-shift, -shift), axis=(1, 2)) if shift else x
    bwin = pick_bwin(nww, n)
    y = swin_block_fused(ya, p["attn"], p["norm1"], p["norm2"],
                         p["mlp"], heads, ws=ws, shift=shift,
                         bias_hnn=_gather_bias(p["attn"], ws),
                         bwin=bwin, precision=precision)
    if shift:
        y = jnp.roll(y, (shift, shift), axis=(1, 2))
    return y


def _swin_block(x: jnp.ndarray, p: Params, heads: int, ws: int,
                shift: int, precision: Precision) -> jnp.ndarray:
    """One SwinTransformerBlock on an NHWC grid ([B, H, W, C], H/W
    multiples of ws)."""
    b, h, w, c = x.shape
    if use_swin_kernel(precision, h, w, ws,
                       c // heads):
        return _swin_block_kernel(x, p, heads, ws, shift, precision)
    shortcut = x
    y = _layer_norm(x, p["norm1"])
    if shift:
        y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
    wins = _window_partition(y, ws)
    mask = _shift_attn_mask(h, w, ws, shift) if shift else None
    wins = _window_attention(wins, p["attn"], heads, ws, mask,
                             precision)
    y = _window_merge(wins, ws, h, w)
    if shift:
        y = jnp.roll(y, (shift, shift), axis=(1, 2))
    x = shortcut + y
    # MLP with exact (erf) GELU, torch nn.GELU default
    y = _layer_norm(x, p["norm2"])
    y = _linear(y, p["mlp"]["fc1"], precision)
    y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(
        precision.storage_dtype)
    y = _linear(y, p["mlp"]["fc2"], precision)
    return x + y


def _rstb_conv(x: jnp.ndarray, p: Params,
               precision: Precision) -> jnp.ndarray:
    """RSTB trailing conv: '1conv' (3x3) or '3conv' (3x3 -> lrelu ->
    1x1 -> lrelu -> 3x3, channel-bottlenecked)."""
    if "conv" in p:
        return conv2d(x, p["conv"], precision=precision)

    def lrelu(t):
        return jnp.where(t >= 0, t, 0.2 * t)

    y = lrelu(conv2d(x, p["conv0"], precision=precision))
    y = lrelu(conv2d(y, p["conv1"], precision=precision))
    return conv2d(y, p["conv2"], precision=precision)


def _pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """torch.nn.PixelShuffle on NHWC: channels r*r*C -> C, spatial x r.
    Channel order matches torch's NCHW semantics (C outer, then r, r)."""
    b, h, w, c = x.shape
    co = c // (r * r)
    x = x.reshape(b, h, w, co, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, co)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def swinir_apply(params: Params, x: jnp.ndarray,
                 cfg: SwinIRConfig = SwinIRConfig(), *,
                 precision: Precision = Precision()) -> jnp.ndarray:
    """Upscale NHWC [B, H, W, C] -> [B, scale*H, scale*W, C].

    Follows the official forward: reflect-pad H/W to window multiples,
    subtract the RGB mean and scale by img_range, shallow conv, RSTB
    stack with a final LayerNorm, conv_after_body residual, upsampler
    head, un-normalize, crop to scale * original size.
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
            y = _swin_block(y, block, cfg.num_heads[li], ws, shift,
                            precision)
        tok = _rstb_conv(y, layer, precision) + res
    tok = _layer_norm(tok, params["norm"])
    body = conv2d(tok, params["conv_after_body"], precision=precision)
    feat = feat + body

    if cfg.upsampler == "pixelshuffle":
        y = conv2d(feat, params["conv_before_upsample"],
                   precision=precision)
        y = jax.nn.relu(y)
        for up in params["upsample"]:
            # shuffle factor from the kernel shape (static)
            r = int(round(np.sqrt(up["kernel"].shape[-1] // cfg.num_feat)))
            y = conv2d(y, up, precision=precision)
            y = _pixel_shuffle(y, r)
        y = conv2d(y, params["conv_last"], precision=precision)
    elif cfg.upsampler == "pixelshuffledirect":
        y = conv2d(feat, params["upsample"][0], precision=precision)
        y = _pixel_shuffle(y, cfg.scale)
        # no conv_last: the upsample conv maps straight to out channels
    elif cfg.upsampler == "nearest+conv":
        # real-world SR head: conv_before_upsample is Sequential(conv,
        # LeakyReLU(default slope 0.01)); the up/hr convs use the module's
        # self.lrelu with slope 0.2 — two DIFFERENT slopes in the official
        # network, preserved here.
        y = conv2d(feat, params["conv_before_upsample"],
                   precision=precision)
        y = jnp.where(y >= 0, y, 0.01 * y)

        def lrelu(t):
            return jnp.where(t >= 0, t, 0.2 * t)

        y = lrelu(conv2d(nearest_upsample_2x(y), params["conv_up1"],
                         precision=precision))
        if cfg.scale == 4:
            y = lrelu(conv2d(nearest_upsample_2x(y), params["conv_up2"],
                             precision=precision))
        y = lrelu(conv2d(y, params["conv_hr"], precision=precision))
        y = conv2d(y, params["conv_last"], precision=precision)
    elif cfg.upsampler == "":
        # restoration head (scale 1): conv_last over body features + input
        y = conv2d(feat, params["conv_last"], precision=precision)
        y = x + y
    else:
        raise ValueError(f"unknown upsampler {cfg.upsampler!r}")

    y = y.astype(jnp.float32) / cfg.img_range
    if cfg.in_channels == 3:
        y = y + jnp.asarray(_RGB_MEAN, jnp.float32)
    return y[:, :h0 * cfg.scale, :w0 * cfg.scale]


# ---------------------------------------------------------------------------
# Initialization (fixtures)
# ---------------------------------------------------------------------------


def init_swinir(key: jax.Array,
                cfg: SwinIRConfig = SwinIRConfig()) -> Params:
    keys = iter(jax.random.split(key, 4096))
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
    if cfg.upsampler == "pixelshuffle":
        params["conv_before_upsample"] = init_conv2d(next(keys), 3, 3,
                                                     dim, nf)
        ups = []
        s = cfg.scale
        while s > 1:
            r = 3 if s % 2 else 2
            ups.append(init_conv2d(next(keys), 3, 3, nf, nf * r * r))
            s //= r
        params["upsample"] = ups
        params["conv_last"] = init_conv2d(next(keys), 3, 3, nf,
                                          cfg.out_channels)
    elif cfg.upsampler == "pixelshuffledirect":
        params["upsample"] = [init_conv2d(
            next(keys), 3, 3, dim, cfg.out_channels * cfg.scale ** 2)]
    elif cfg.upsampler == "nearest+conv":
        params["conv_before_upsample"] = init_conv2d(next(keys), 3, 3,
                                                     dim, nf)
        params["conv_up1"] = init_conv2d(next(keys), 3, 3, nf, nf)
        if cfg.scale == 4:
            params["conv_up2"] = init_conv2d(next(keys), 3, 3, nf, nf)
        params["conv_hr"] = init_conv2d(next(keys), 3, 3, nf, nf)
        params["conv_last"] = init_conv2d(next(keys), 3, 3, nf,
                                          cfg.out_channels)
    elif cfg.upsampler == "":
        params["conv_last"] = init_conv2d(next(keys), 3, 3, dim,
                                          cfg.out_channels)
    return params


# ---------------------------------------------------------------------------
# Checkpoint loading (official SwinIR key schema)
# ---------------------------------------------------------------------------

_BLOCK_RE = re.compile(
    r"^layers\.(\d+)\.residual_group\.blocks\.(\d+)\.")


def is_swinir_state_dict(sd: Mapping[str, Any]) -> bool:
    """SwinIR v1 spine.  Swin2SR shares the residual_group.blocks spine
    but replaces the learned relative_position_bias_table with a
    continuous-position MLP (attn.logit_scale / attn.cpb_mlp.*) — those
    checkpoints must NOT dispatch here (the zoo rejects them by name)."""
    if not any(_BLOCK_RE.match(k) for k in sd):
        return False
    return not any(k.endswith((".attn.logit_scale", ".attn.cpb_mlp.0.weight"))
                   for k in sd)


# shared state-dict extractors (hdrvae.models.params)


def swinir_from_state_dict(sd: Mapping[str, Any],
                           img_range: float | None = None
                           ) -> tuple[Params, SwinIRConfig]:
    """Build (params, config) from the official SwinIR checkpoint schema,
    inferring every hyperparameter that IS inferable from tensor
    shapes/keys.  ``img_range`` is not stored in checkpoints and is an
    architecture constant of the training config: every official SR
    family uses 1.0 (the default), but the scale-1 ``""``-head
    restoration families split — denoising ships with 1.0, JPEG-CAR
    (grayscale) with 255.0.  Pass ``img_range`` explicitly for CAR
    checkpoints; the ambiguous case logs a warning."""
    if not is_swinir_state_dict(sd):
        raise ValueError("not a SwinIR state dict")

    n_layers = 1 + max(int(m.group(1)) for k in sd
                       if (m := _BLOCK_RE.match(k)))
    depths = tuple(
        1 + max(int(m.group(2)) for k in sd
                if (m := _BLOCK_RE.match(k)) and int(m.group(1)) == li)
        for li in range(n_layers))
    w_first = _to_np(sd["conv_first.weight"])
    embed_dim, in_ch = w_first.shape[0], w_first.shape[1]
    bias_tables = [
        _to_np(sd[f"layers.{li}.residual_group.blocks.0.attn."
                  f"relative_position_bias_table"]) for li in
        range(n_layers)]
    num_heads = tuple(t.shape[1] for t in bias_tables)
    window_size = (int(round(np.sqrt(bias_tables[0].shape[0]))) + 1) // 2
    fc1 = _to_np(sd["layers.0.residual_group.blocks.0.mlp.fc1.weight"])
    mlp_ratio = fc1.shape[0] / embed_dim
    patch_norm = "patch_embed.norm.weight" in sd
    resi = "3conv" if "layers.0.conv.0.weight" in sd else "1conv"

    if "conv_up1.weight" in sd:
        upsampler = "nearest+conv"
        num_feat = _to_np(sd["conv_up1.weight"]).shape[0]
        scale = 4 if "conv_up2.weight" in sd else 2
        out_ch = _to_np(sd["conv_last.weight"]).shape[0]
        # real-world head also has conv_before_upsample (Sequential idx 0)
    elif "conv_before_upsample.0.weight" in sd:
        upsampler = "pixelshuffle"
        num_feat = _to_np(sd["conv_before_upsample.0.weight"]).shape[0]
        out_ch = _to_np(sd["conv_last.weight"]).shape[0]
        scale = 1
        for k in sorted(sd):
            if re.match(r"^upsample\.\d+\.weight$", k):
                r2 = _to_np(sd[k]).shape[0] // num_feat
                scale *= int(round(np.sqrt(r2)))
    elif "upsample.0.weight" in sd:
        upsampler = "pixelshuffledirect"
        num_feat = embed_dim
        w_up = _to_np(sd["upsample.0.weight"])
        # out = out_ch * scale^2; out_ch == in_ch for SR checkpoints
        out_ch = in_ch
        scale = int(round(np.sqrt(w_up.shape[0] // out_ch)))
    else:
        upsampler = ""
        num_feat = embed_dim
        out_ch = _to_np(sd["conv_last.weight"]).shape[0]
        scale = 1

    if img_range is None:
        img_range = 1.0
        if upsampler == "" and in_ch == 1:
            import logging
            logging.getLogger(__name__).warning(
                "grayscale scale-1 SwinIR checkpoint: img_range is not "
                "inferable (denoising models use 1.0, JPEG-CAR 255.0); "
                "defaulting to 1.0 — pass img_range=255.0 for CAR")
    cfg = SwinIRConfig(in_channels=in_ch, out_channels=out_ch,
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
            blocks.append({
                "norm1": _ln_from(sd, p + "norm1"),
                "norm2": _ln_from(sd, p + "norm2"),
                "attn": {
                    "qkv": _lin_from(sd, p + "attn.qkv"),
                    "proj": _lin_from(sd, p + "attn.proj"),
                    "relative_position_bias_table": _to_np(
                        sd[p + "attn.relative_position_bias_table"]),
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
    if upsampler == "nearest+conv":
        params["conv_before_upsample"] = _conv_from(
            sd, "conv_before_upsample.0")
        params["conv_up1"] = _conv_from(sd, "conv_up1")
        if scale == 4:
            params["conv_up2"] = _conv_from(sd, "conv_up2")
        params["conv_hr"] = _conv_from(sd, "conv_hr")
        params["conv_last"] = _conv_from(sd, "conv_last")
    elif upsampler == "pixelshuffle":
        params["conv_before_upsample"] = _conv_from(
            sd, "conv_before_upsample.0")
        params["upsample"] = [
            _conv_from(sd, k[:-len(".weight")])
            for k in sorted(k for k in sd
                            if re.match(r"^upsample\.\d+\.weight$", k))]
        params["conv_last"] = _conv_from(sd, "conv_last")
    elif upsampler == "pixelshuffledirect":
        params["upsample"] = [_conv_from(sd, "upsample.0")]
    else:
        params["conv_last"] = _conv_from(sd, "conv_last")

    params = jax.tree_util.tree_map(jnp.asarray, params)
    return params, cfg

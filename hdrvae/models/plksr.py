"""RealPLKSR (Partial Large-Kernel Super-Resolution) in functional JAX.

The reference upscales with ANY spandrel-supported model
(`/root/reference/hdr_upscale_with_model.py:72-76`); RealPLKSR is the
training-hardened variant of PLKSR (arXiv:2404.11848) used by the modern
community checkpoint families (4xNomosWebPhoto-RealPLKSR,
4xNomos2_realplksr_*).  Topology, transcribed from the published
architecture (neosr / spandrel `realplksr`):

  feats = conv3x3(in->dim)
          -> n_blocks x PLKBlock
          -> [Dropout2d (inference no-op, paramless)]
          -> conv3x3(dim -> out*scale^2)
  out   = to_img(feats(x) + repeat_interleave(x, scale^2, channel))

  PLKBlock(x) = x + GroupNorm(refine1x1(EA(PLK(DCCM(x)))))
    DCCM  = conv3x3(dim->2dim) -> Mish -> conv3x3(2dim->dim)
    PLK   = large-kernel (17x17) conv over the FIRST split_ratio*dim
            channels only; the rest pass through (partial conv)
    EA    = x * sigmoid(conv3x3(x))        (element-wise attention)

``to_img`` is PixelShuffle(scale), or DySample (ICCV'23 "lp" style,
groups=4: content-aware offsets + bilinear resampling) for the
`_dysample` checkpoint releases.

Spandrel's architecture name is "RealPLKSR", which the reference's
reversal map does NOT special-case (`hdr_upscale_with_model.py:266-279`)
so it takes the default `logit` reversal.

TPU-first notes: the 17x17 partial conv is the only unusual op — XLA
lowers it as a dense conv over the split slice (k*k*pdim->pdim dots, MXU
tiled); everything else is plain 3x3/1x1 convs at dim=64.  DySample's
bilinear gather runs once on the scale^2-wide head tensor — negligible
next to the 28-block body.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hdrvae.core.config import Precision
from hdrvae.models.layers import conv2d, group_norm, init_conv2d, \
    init_group_norm
from hdrvae.models.params import conv_from_sd as _conv, \
    to_np as _to_np
from hdrvae.models.swinir import _pixel_shuffle

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class RealPLKSRConfig:
    in_channels: int = 3
    out_channels: int = 3
    dim: int = 64
    n_blocks: int = 28
    scale: int = 4
    kernel_size: int = 17
    split_ratio: float = 0.25
    use_ea: bool = True
    # GroupNorm group count is not recoverable from checkpoint shapes
    # (affine params are [dim]); 4 is the published default.
    norm_groups: int = 4
    upsampler: str = "pixelshuffle"   # "pixelshuffle" | "dysample"
    dysample_groups: int = 4

    @property
    def pdim(self) -> int:
        return int(self.dim * self.split_ratio)

    def with_small(self) -> "RealPLKSRConfig":
        return dataclasses.replace(self, dim=16, n_blocks=3, kernel_size=7,
                                   norm_groups=2)


def _mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(jax.nn.softplus(x))


def _plk_block(params: Params, x: jnp.ndarray, cfg: RealPLKSRConfig,
               precision: Precision) -> jnp.ndarray:
    skip = x
    h = conv2d(x, params["mix0"], precision=precision)
    h = _mish(h.astype(jnp.float32)).astype(precision.storage_dtype)
    h = conv2d(h, params["mix1"], precision=precision)
    # partial large-kernel conv: first pdim channels only
    h1 = conv2d(h[..., :cfg.pdim], params["lk"], precision=precision)
    h = jnp.concatenate([h1, h[..., cfg.pdim:]], axis=-1)
    if cfg.use_ea:
        gate = jax.nn.sigmoid(
            conv2d(h, params["ea"], precision=precision)
            .astype(jnp.float32))
        h = h * gate.astype(h.dtype)
    h = conv2d(h, params["refine"], precision=precision)
    h = group_norm(h, params["norm"], num_groups=cfg.norm_groups,
                   eps=1e-5, precision=precision)
    return h + skip


def _dysample_init_pos(scale: int, groups: int) -> np.ndarray:
    """DySample's init_pos buffer as a flat [2*groups*scale^2] channel
    vector (replicates the published buffer construction exactly:
    meshgrid(ij) -> transpose(1,2) -> repeat over groups)."""
    h = (np.arange(scale) - (scale - 1) / 2.0) / scale
    m = np.stack(np.meshgrid(h, h, indexing="ij"))       # [2, s, s]
    m = m.transpose(0, 2, 1)                             # .transpose(1, 2)
    m = np.tile(m, (1, groups, 1))                       # [2, g*s, s]
    return m.reshape(-1).astype(np.float32)


def _bilinear_border_sample(img: jnp.ndarray, ix: jnp.ndarray,
                            iy: jnp.ndarray) -> jnp.ndarray:
    """F.grid_sample(mode=bilinear, padding_mode=border,
    align_corners=False) on absolute pixel coords.  img [H, W, C];
    ix/iy [h, w] float32 sample positions in pixel units."""
    h, w = img.shape[0], img.shape[1]
    ix = jnp.clip(ix, 0.0, w - 1.0)
    iy = jnp.clip(iy, 0.0, h - 1.0)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = (ix - x0)[..., None]
    fy = (iy - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)   # fx == 0 there: clamp is exact
    y1 = jnp.minimum(y0 + 1, h - 1)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy


def _dysample(params: Params, x: jnp.ndarray, cfg: RealPLKSRConfig,
              precision: Precision) -> jnp.ndarray:
    """DySample 'lp' upsampler (groups=g, dynamic scope): offsets from a
    1x1 conv gated by sigmoid(scope), pixel-shuffled to output
    resolution, bilinear border sampling of the per-group input.

    `2*(pos+off)/size - 1` followed by grid_sample's unnormalization
    `(c+1)*size/2 - 0.5` composes to `pos + off - 0.5`; computed
    directly (pos = index + 0.5, so sample position = index + off)."""
    b, h, w, c = x.shape
    s, g = cfg.scale, cfg.dysample_groups
    off = conv2d(x, params["offset"], precision=precision) \
        .astype(jnp.float32)
    if params.get("scope") is not None:
        scope = conv2d(x, params["scope"], precision=precision) \
            .astype(jnp.float32)
        off = off * jax.nn.sigmoid(scope) * 0.5
    else:
        off = off * 0.25      # published dyscope=False branch
    off = off + params["init_pos"].astype(jnp.float32)
    # channel layout [2, g*s*s] (torch .view(B, 2, -1, H, W))
    off = off.reshape(b, h, w, 2, g * s * s)
    # pixel-shuffle each axis map to output resolution: [b, sH, sW, g]
    off_x = _pixel_shuffle(off[..., 0, :], s)
    off_y = _pixel_shuffle(off[..., 1, :], s)
    # output pixel (h*s+i, w*s+j) samples around input pixel (h, w);
    # off_x/off_y already carry the sub-pixel grid via init_pos
    base_x = (jnp.arange(w * s, dtype=jnp.float32) // s)[None, None, :,
                                                         None]
    base_y = (jnp.arange(h * s, dtype=jnp.float32) // s)[None, :, None,
                                                         None]
    ix = base_x + off_x
    iy = base_y + off_y
    xg = x.astype(jnp.float32).reshape(b, h, w, g, c // g)
    # vmap over batch then group: img [H, W, cpg], coords [sH, sW]
    sample = jax.vmap(                       # over groups
        _bilinear_border_sample, in_axes=(2, 2, 2), out_axes=2)
    sample = jax.vmap(sample, in_axes=(0, 0, 0))   # over batch
    out = sample(xg, ix, iy)                # [b, sH, sW, g, cpg]
    out = out.reshape(b, h * s, w * s, c)
    out = conv2d(out.astype(precision.storage_dtype), params["end_conv"],
                 precision=precision)
    return out


def realplksr_apply(params: Params, x: jnp.ndarray, cfg: RealPLKSRConfig,
                    *, precision: Precision = Precision()) -> jnp.ndarray:
    """[B, H, W, C] -> [B, sH, sW, C].  feats(x) + channel-repeated x,
    then PixelShuffle / DySample."""
    h = conv2d(x, params["conv_first"], precision=precision)
    for blk in params["blocks"]:
        h = _plk_block(blk, h, cfg, precision)
    h = conv2d(h, params["conv_last"], precision=precision)
    skip = jnp.repeat(x.astype(h.dtype), cfg.scale * cfg.scale, axis=-1)
    h = h + skip
    if cfg.upsampler == "dysample":
        return _dysample(params["to_img"], h, cfg,
                         precision).astype(jnp.float32)
    return _pixel_shuffle(h, cfg.scale).astype(jnp.float32)


def init_realplksr(key: jax.Array,
                   cfg: RealPLKSRConfig = RealPLKSRConfig()) -> Params:
    n = cfg.n_blocks
    keys = jax.random.split(key, 5 * n + 6)
    params: Params = {
        "conv_first": init_conv2d(keys[0], 3, 3, cfg.in_channels, cfg.dim),
        "conv_last": init_conv2d(
            keys[1], 3, 3, cfg.dim,
            cfg.out_channels * cfg.scale * cfg.scale),
        "blocks": [],
    }
    for i in range(n):
        k = keys[2 + 5 * i: 7 + 5 * i]
        blk = {
            "mix0": init_conv2d(k[0], 3, 3, cfg.dim, cfg.dim * 2),
            "mix1": init_conv2d(k[1], 3, 3, cfg.dim * 2, cfg.dim),
            "lk": init_conv2d(k[2], cfg.kernel_size, cfg.kernel_size,
                              cfg.pdim, cfg.pdim),
            "refine": init_conv2d(k[3], 1, 1, cfg.dim, cfg.dim),
            "norm": init_group_norm(cfg.dim),
        }
        if cfg.use_ea:
            blk["ea"] = init_conv2d(k[4], 3, 3, cfg.dim, cfg.dim)
        params["blocks"].append(blk)
    if cfg.upsampler == "dysample":
        cin = cfg.out_channels * cfg.scale * cfg.scale
        och = 2 * cfg.dysample_groups * cfg.scale * cfg.scale
        kk = keys[-4:]
        scope = init_conv2d(kk[1], 1, 1, cin, och)
        scope["bias"] = jnp.zeros_like(scope["bias"])   # Conv2d(bias=False)
        params["to_img"] = {
            "offset": init_conv2d(kk[0], 1, 1, cin, och),
            "scope": scope,
            "end_conv": init_conv2d(kk[2], 1, 1, cin, cfg.out_channels),
            "init_pos": jnp.asarray(_dysample_init_pos(
                cfg.scale, cfg.dysample_groups)),
        }
    return params


# ---------------------------------------------------------------------------
# Checkpoint loading (official neosr/spandrel key schema)
# ---------------------------------------------------------------------------

_FEATS_RE = re.compile(r"^feats\.(\d+)\.")


def is_realplksr_state_dict(sd: Mapping[str, Any]) -> bool:
    """RealPLKSR: feats.1.lk.conv + feats.1.norm (the original PLKSR has
    no per-block GroupNorm — not supported here, detect and reject)."""
    return "feats.0.weight" in sd and "feats.1.lk.conv.weight" in sd and \
        "feats.1.norm.weight" in sd


def realplksr_from_state_dict(sd: Mapping[str, Any]
                              ) -> Tuple[Params, RealPLKSRConfig]:
    """Official serialization: feats.0 = first conv, feats.{1..n} =
    PLKBlocks (channel_mixer.0/.2, lk.conv, attn.f.0, refine, norm),
    feats.{n+2} = head conv (feats.{n+1} is the paramless Dropout2d);
    DySample checkpoints add to_img.{offset,scope,end_conv,init_pos}."""
    if "feats.0.weight" in sd and "feats.1.lk.conv.weight" in sd and \
            "feats.1.norm.weight" not in sd:
        raise ValueError(
            "original-PLKSR checkpoint (no per-block GroupNorm) — only "
            "the RealPLKSR variant is implemented")
    idx = sorted({int(m.group(1)) for k in sd if (m := _FEATS_RE.match(k))})
    block_idx = [i for i in idx if f"feats.{i}.lk.conv.weight" in sd]
    head = idx[-1]
    w0 = _to_np(sd["feats.0.weight"])
    dim, in_ch = int(w0.shape[0]), int(w0.shape[1])
    lk_w = _to_np(sd[f"feats.{block_idx[0]}.lk.conv.weight"])
    pdim, ksize = int(lk_w.shape[0]), int(lk_w.shape[2])
    use_ea = f"feats.{block_idx[0]}.attn.f.0.weight" in sd
    head_out = int(sd[f"feats.{head}.weight"].shape[0])
    dysample = "to_img.offset.weight" in sd
    if dysample:
        out_ch = int(sd["to_img.end_conv.weight"].shape[0])
    else:
        out_ch = in_ch
    scale = int(round((head_out // out_ch) ** 0.5))
    if out_ch * scale * scale != head_out:
        raise ValueError(
            f"RealPLKSR head channels {head_out} are not "
            f"out_ch*scale^2 (out_ch={out_ch})")
    cfg = RealPLKSRConfig(
        in_channels=in_ch, out_channels=out_ch, dim=dim,
        n_blocks=len(block_idx), scale=scale, kernel_size=ksize,
        split_ratio=pdim / dim, use_ea=use_ea,
        upsampler="dysample" if dysample else "pixelshuffle")
    params: Params = {
        "conv_first": _conv(sd, "feats.0"),
        "conv_last": _conv(sd, f"feats.{head}"),
        "blocks": [],
    }
    for i in block_idx:
        blk = {
            "mix0": _conv(sd, f"feats.{i}.channel_mixer.0"),
            "mix1": _conv(sd, f"feats.{i}.channel_mixer.2"),
            "lk": _conv(sd, f"feats.{i}.lk.conv"),
            "refine": _conv(sd, f"feats.{i}.refine"),
            "norm": {"scale": _to_np(sd[f"feats.{i}.norm.weight"]),
                     "bias": _to_np(sd[f"feats.{i}.norm.bias"])},
        }
        if use_ea:
            blk["ea"] = _conv(sd, f"feats.{i}.attn.f.0")
        params["blocks"].append(blk)
    if dysample:
        g = int(sd["to_img.offset.weight"].shape[0]) \
            // (2 * scale * scale)
        cfg = dataclasses.replace(cfg, dysample_groups=g)
        params["to_img"] = {
            "offset": _conv(sd, "to_img.offset"),
            "scope": (_conv(sd, "to_img.scope")
                      if "to_img.scope.weight" in sd else None),
            "end_conv": _conv(sd, "to_img.end_conv"),
            "init_pos": (_to_np(sd["to_img.init_pos"]).reshape(-1)
                         if "to_img.init_pos" in sd else
                         _dysample_init_pos(scale, g)),
        }
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return params, cfg

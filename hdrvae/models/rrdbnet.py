"""ESRGAN-family RRDBNet super-resolution model — functional JAX, NHWC.

Replaces the reference's spandrel model loading
(`hdr_upscale_with_model.py:6,72-76`; SURVEY.md section 2.7 "ESRGAN-zoo
loader") with an owned implementation: the RRDBNet topology (ESRGAN /
RealESRGAN) plus a state-dict loader that auto-detects both public key
schemas ("old arch" ``model.N...`` and "new arch" ``conv_first/body...``),
the network width/depth, and the upscale factor — the role spandrel's
architecture registry plays for the reference.

Topology: conv_first -> nb x RRDB (each 3 dense blocks of 5 convs,
LeakyReLU(0.2), residual scale 0.2) -> trunk conv (+ residual) ->
log2(scale) x [nearest 2x + conv + lrelu] -> conv_hr + lrelu -> conv_last.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from hdrvae.core.config import Precision
from hdrvae.models.layers import conv2d, init_conv2d, nearest_upsample_2x
from hdrvae.models.params import conv_kernel_to_hwio, to_np as _to_np

Params = Dict[str, Any]

_LRELU_SLOPE = 0.2
_RESIDUAL_SCALE = 0.2


@dataclasses.dataclass(frozen=True)
class RRDBNetConfig:
    in_channels: int = 3  # user-facing image channels (pre-unshuffle)
    out_channels: int = 3
    nf: int = 64          # feature width
    nb: int = 23          # number of RRDB blocks
    gc: int = 32          # dense growth channels
    scale: int = 4        # NET upscale factor (what tiling/callers see)
    # RealESRGAN x2/x1 variants pixel-unshuffle the input (3 -> 12 / 48
    # channels) and keep the internal 4x upsample stack, so the net scale
    # is 4/unshuffle (BasicSR RRDBNet's scale=2/1 branches).  conv_first
    # consumes in_channels * unshuffle**2 channels.
    unshuffle: int = 1

    @property
    def num_upsamples(self) -> int:
        return max(0, int(np.log2(self.scale * self.unshuffle)))

    def with_small(self) -> "RRDBNetConfig":
        return dataclasses.replace(self, nf=8, nb=2, gc=4, scale=2)


def _lrelu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= 0, x, _LRELU_SLOPE * x)


def _dense_block(x: jnp.ndarray, p: Params,
                 precision: Precision) -> jnp.ndarray:
    """ResidualDenseBlock_5C: 5 convs with dense concatenation."""
    feats = [x]
    for i in range(1, 5):
        y = _lrelu(conv2d(jnp.concatenate(feats, axis=-1), p[f"conv{i}"],
                          precision=precision))
        feats.append(y)
    y = conv2d(jnp.concatenate(feats, axis=-1), p["conv5"],
               precision=precision)
    return x + _RESIDUAL_SCALE * y


def _rrdb(x: jnp.ndarray, p: Params, precision: Precision) -> jnp.ndarray:
    h = _dense_block(x, p["rdb1"], precision)
    h = _dense_block(h, p["rdb2"], precision)
    h = _dense_block(h, p["rdb3"], precision)
    return x + _RESIDUAL_SCALE * h


def _pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """torch.nn.functional.pixel_unshuffle on NHWC: [B, H, W, C] ->
    [B, H/r, W/r, C*r*r] with torch's channel order (c*r*r + i*r + j),
    so converted conv_first kernels see the layout they were trained
    on."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // r, w // r, c * r * r)


def rrdbnet_apply(params: Params, x: jnp.ndarray,
                  cfg: RRDBNetConfig = RRDBNetConfig(), *,
                  precision: Precision = Precision()) -> jnp.ndarray:
    """Upscale NHWC [B, H, W, C] -> [B, scale*H, scale*W, C].

    On TPU in fast mode at batch 1 (``precision.upstack`` "auto"/
    "pallas") the network runs as the dense Pallas kernel chain
    (models.rrdbnet_pallas): concat-free dense blocks with fused
    LeakyReLU/residual epilogues (the 2x upsamples between conv_up
    stages stay in XLA — their 64-channel features are below the
    lane-tile the manual-DMA upsample kernel needs).
    """
    from hdrvae.models.rrdbnet_pallas import (rrdbnet_pallas_apply,
                                              rrdbnet_pallas_supported)
    if rrdbnet_pallas_supported(precision, x.shape[0], x.shape[2], cfg):
        return rrdbnet_pallas_apply(params, x[0], cfg,
                                    precision=precision)[None]
    if precision.upstack == "pallas":
        raise ValueError(
            "precision.upstack='pallas' requires fast mode, batch 1, "
            "width % 8 == 0, channel widths <= 128, unshuffle == 1, and "
            f"a TPU backend (got mode={precision.mode!r}, "
            f"batch={x.shape[0]}, width={x.shape[2]}, nf={cfg.nf}, "
            f"gc={cfg.gc}, unshuffle={cfg.unshuffle})")
    h0, w0 = x.shape[1], x.shape[2]
    if cfg.unshuffle > 1:
        # RealESRGANer's pre_process: reflect-pad to an unshuffle
        # multiple (BasicSR's RRDBNet itself assumes divisibility), then
        # torch-order pixel-unshuffle; output cropped back below.
        r = cfg.unshuffle
        pad_h, pad_w = (-h0) % r, (-w0) % r
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                        mode="reflect")
        x = _pixel_unshuffle(x, r)
    fea = conv2d(x, params["conv_first"], precision=precision)
    trunk = fea
    for block in params["body"]:
        trunk = _rrdb(trunk, block, precision)
    fea = fea + conv2d(trunk, params["conv_body"], precision=precision)
    for i in range(cfg.num_upsamples):
        fea = nearest_upsample_2x(fea)
        fea = _lrelu(conv2d(fea, params[f"conv_up{i + 1}"],
                            precision=precision))
    fea = _lrelu(conv2d(fea, params["conv_hr"], precision=precision))
    out = conv2d(fea, params["conv_last"], precision=precision)
    if cfg.unshuffle > 1:   # crop the pre-pad region (post_process)
        out = out[:, :h0 * cfg.scale, :w0 * cfg.scale]
    return out


# ---------------------------------------------------------------------------
# Initialization (fixtures)
# ---------------------------------------------------------------------------


def init_rrdbnet(key: jax.Array,
                 cfg: RRDBNetConfig = RRDBNetConfig()) -> Params:
    keys = iter(jax.random.split(key, 1024))
    nf, gc = cfg.nf, cfg.gc

    def dense() -> Params:
        p = {}
        for i in range(1, 5):
            p[f"conv{i}"] = init_conv2d(next(keys), 3, 3,
                                        nf + (i - 1) * gc, gc)
        p["conv5"] = init_conv2d(next(keys), 3, 3, nf + 4 * gc, nf)
        return p

    params: Params = {
        "conv_first": init_conv2d(next(keys), 3, 3,
                                  cfg.in_channels * cfg.unshuffle ** 2, nf),
        "body": [{"rdb1": dense(), "rdb2": dense(), "rdb3": dense()}
                 for _ in range(cfg.nb)],
        "conv_body": init_conv2d(next(keys), 3, 3, nf, nf),
        "conv_hr": init_conv2d(next(keys), 3, 3, nf, nf),
        "conv_last": init_conv2d(next(keys), 3, 3, nf, cfg.out_channels),
    }
    for i in range(cfg.num_upsamples):
        params[f"conv_up{i + 1}"] = init_conv2d(next(keys), 3, 3, nf, nf)
    return params


# ---------------------------------------------------------------------------
# Checkpoint loading with schema + hyperparameter detection
# ---------------------------------------------------------------------------

# old-arch ESRGAN serialization: model.0 = conv_first; model.1.sub.N = RRDB
# blocks; model.1.sub.<nb> = trunk conv; then alternating upsample convs at
# model.3, model.6, ...; model.<k> = conv_hr; model.<k+2> = conv_last.
_OLD_RDB_RE = re.compile(
    r"^model\.1\.sub\.(\d+)\.RDB(\d)\.conv(\d)\.0\.(weight|bias)$")
_NEW_RDB_RE = re.compile(
    r"^body\.(\d+)\.rdb(\d)\.conv(\d)\.(weight|bias)$")


def detect_architecture(sd: Mapping[str, Any]) -> str:
    if "model.0.weight" in sd:
        return "esrgan-old"
    if "conv_first.weight" in sd:
        return "esrgan-new"
    raise ValueError(
        "unrecognized upscale checkpoint schema; expected old-arch ESRGAN "
        "(model.0.weight ...) or new-arch RRDBNet (conv_first.weight ...)")


def _conv_from(sd, wkey: str, bkey: str) -> Params:
    # shared extractor, but this schema addresses weight/bias separately
    return {"kernel": conv_kernel_to_hwio(_to_np(sd[wkey])),
            "bias": _to_np(sd[bkey])}


def rrdbnet_from_state_dict(sd: Mapping[str, Any]
                            ) -> tuple[Params, RRDBNetConfig]:
    """Build (params, config) from either public ESRGAN key schema."""
    arch = detect_architecture(sd)

    if arch == "esrgan-new":
        nb = max(int(m.group(1))
                 for k in sd if (m := _NEW_RDB_RE.match(k))) + 1
        w_first = _to_np(sd["conv_first.weight"])
        nf = w_first.shape[0]
        in_ch = w_first.shape[1]
        gc = _to_np(sd["body.0.rdb1.conv1.weight"]).shape[0]
        out_ch = _to_np(sd["conv_last.weight"]).shape[0]
        ups = sorted(int(k.split(".")[0][7:]) for k in sd
                     if k.startswith("conv_up") and k.endswith(".weight"))
        # RealESRGAN x2/x1: conv_first consumes a pixel-unshuffled input
        # (out_ch*4 or out_ch*16 channels) while keeping the internal
        # upsample stack, so the net scale divides by the unshuffle
        # factor (spandrel's shape heuristic for the same checkpoints)
        unshuffle = 1
        if in_ch == out_ch * 4:
            unshuffle = 2
        elif in_ch == out_ch * 16:
            unshuffle = 4
        scale = 2 ** len(ups) // unshuffle
        cfg = RRDBNetConfig(in_channels=in_ch // unshuffle ** 2,
                            out_channels=out_ch, nf=nf,
                            nb=nb, gc=gc, scale=scale, unshuffle=unshuffle)
        params: Params = {
            "conv_first": _conv_from(sd, "conv_first.weight",
                                     "conv_first.bias"),
            "conv_body": _conv_from(sd, "conv_body.weight",
                                    "conv_body.bias"),
            "conv_hr": _conv_from(sd, "conv_hr.weight", "conv_hr.bias"),
            "conv_last": _conv_from(sd, "conv_last.weight",
                                    "conv_last.bias"),
            "body": [
                {f"rdb{j}": {f"conv{c}": _conv_from(
                    sd, f"body.{i}.rdb{j}.conv{c}.weight",
                    f"body.{i}.rdb{j}.conv{c}.bias")
                    for c in range(1, 6)} for j in range(1, 4)}
                for i in range(nb)],
        }
        for u in ups:
            params[f"conv_up{u}"] = _conv_from(
                sd, f"conv_up{u}.weight", f"conv_up{u}.bias")
    else:  # esrgan-old
        nb = max(int(m.group(1))
                 for k in sd if (m := _OLD_RDB_RE.match(k))) + 1
        w_first = _to_np(sd["model.0.weight"])
        nf = w_first.shape[0]
        in_ch = w_first.shape[1]
        gc = _to_np(sd["model.1.sub.0.RDB1.conv1.0.weight"]).shape[0]
        # indices of the remaining plain convs after the trunk
        plain = sorted(
            int(k.split(".")[1]) for k in sd
            if re.match(r"^model\.(\d+)\.weight$", k))
        # plain == [0, 3, 6, ..., hr, last]; drop conv_first
        tail = [i for i in plain if i != 0]
        up_idx, hr_idx, last_idx = tail[:-2], tail[-2], tail[-1]
        out_ch = _to_np(sd[f"model.{last_idx}.weight"]).shape[0]
        scale = 2 ** len(up_idx)
        cfg = RRDBNetConfig(in_channels=in_ch, out_channels=out_ch, nf=nf,
                            nb=nb, gc=gc, scale=scale)
        params = {
            "conv_first": _conv_from(sd, "model.0.weight", "model.0.bias"),
            "conv_body": _conv_from(sd, f"model.1.sub.{nb}.weight",
                                    f"model.1.sub.{nb}.bias"),
            "conv_hr": _conv_from(sd, f"model.{hr_idx}.weight",
                                  f"model.{hr_idx}.bias"),
            "conv_last": _conv_from(sd, f"model.{last_idx}.weight",
                                    f"model.{last_idx}.bias"),
            "body": [
                {f"rdb{j}": {f"conv{c}": _conv_from(
                    sd, f"model.1.sub.{i}.RDB{j}.conv{c}.0.weight",
                    f"model.1.sub.{i}.RDB{j}.conv{c}.0.bias")
                    for c in range(1, 6)} for j in range(1, 4)}
                for i in range(nb)],
        }
        for n, idx in enumerate(up_idx):
            params[f"conv_up{n + 1}"] = _conv_from(
                sd, f"model.{idx}.weight", f"model.{idx}.bias")

    params = jax.tree_util.tree_map(jnp.asarray, params)
    return params, cfg


def load_upscale_model(path: str):
    """Load an upscaler checkpoint — delegates to the model zoo
    (models.zoo), which dispatches on the key schema (ESRGAN old/new,
    SwinIR).  Kept here for backward compatibility; new code should
    import from hdrvae.models.zoo."""
    from hdrvae.models.zoo import load_upscale_model as _load
    return _load(path)

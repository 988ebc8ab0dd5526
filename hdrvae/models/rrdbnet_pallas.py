"""ESRGAN RRDBNet forward as the dense Pallas kernel chain.

The upscaler is the framework's heaviest compute: the reference runs the
spandrel ESRGAN model over every 512^2 tile TWICE (unclamped + clamped
passes, `hdr_upscale_with_model.py:180-186`), and a 23-block RRDBNet is
~33 MFLOP/pixel.  Its torch graph is dominated by dense blocks that
`torch.cat` 2-5 feature maps before every conv — on TPU each concat is a
full HBM round trip of the combined activation, and XLA's conv emitters
see awkward 96/128/160-channel shapes.

Here every conv runs as `kernels.conv3x3.dense_conv3x3`: the concat is
never materialized (per-input MXU contractions summed in the
accumulator), and LeakyReLU + the scaled residual adds fuse into the
conv epilogue.  ESRGAN's 3-64-channel features are below the lane tile,
so the halo comes from sliver BlockSpecs rather than the decoder
chain's manual DMAs (see `kernels.conv3x3._halo_specs`).  The only XLA
ops left inside the network are the RRDB-level `x + 0.2 * h` residual
adds and the two nearest-2x upsamples.

Numerics: float32 accumulation; LeakyReLU/residual math in float32
before the storage cast (the XLA path rounds to storage dtype between
conv and activation — same fast-mode band as the decoder chain,
documented in PERF_NOTES.md section 3).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from hdrvae.core.config import Precision
from hdrvae.kernels.conv3x3 import dense_conv3x3
from hdrvae.models.layers import nearest_upsample_2x

Params = Dict[str, Any]

_RESIDUAL_SCALE = 0.2


def _conv(p: Params, cdt):
    return p["kernel"].astype(cdt), p["bias"]


def _dense_block(x, p: Params, cdt, sdt):
    """ResidualDenseBlock_5C: 5 dense convs, concat-free."""
    feats = [x]
    for i in range(1, 5):
        k, b = _conv(p[f"conv{i}"], cdt)
        feats.append(dense_conv3x3(feats, k, b, act="lrelu",
                                   out_dtype=sdt))
    k, b = _conv(p["conv5"], cdt)
    return dense_conv3x3(feats, k, b, residual=x,
                         res_scale=_RESIDUAL_SCALE, out_dtype=sdt)


def _rrdb(x, p: Params, cdt, sdt):
    h = _dense_block(x, p["rdb1"], cdt, sdt)
    h = _dense_block(h, p["rdb2"], cdt, sdt)
    h = _dense_block(h, p["rdb3"], cdt, sdt)
    return (x.astype(jnp.float32)
            + _RESIDUAL_SCALE * h.astype(jnp.float32)).astype(sdt)


def rrdbnet_pallas_apply(params: Params, x: jnp.ndarray, cfg, *,
                         precision: Precision) -> jnp.ndarray:
    """One sample [H, W, C] -> [scale*H, scale*W, C] through the kernel
    chain.  Caller gates on (fast mode, TPU, W % 8 == 0)."""
    cdt = precision.compute_dtype
    sdt = precision.storage_dtype

    x = x.astype(cdt)
    k, b = _conv(params["conv_first"], cdt)
    fea = dense_conv3x3([x], k, b, out_dtype=sdt)
    trunk = fea
    for block in params["body"]:
        trunk = _rrdb(trunk, block, cdt, sdt)
    k, b = _conv(params["conv_body"], cdt)
    fea = dense_conv3x3([trunk], k, b, residual=fea, res_scale=1.0,
                        out_dtype=sdt)
    for i in range(cfg.num_upsamples):
        k, b = _conv(params[f"conv_up{i + 1}"], cdt)
        fea = dense_conv3x3([nearest_upsample_2x(fea[None])[0]], k, b,
                            act="lrelu", out_dtype=sdt)
    k, b = _conv(params["conv_hr"], cdt)
    fea = dense_conv3x3([fea], k, b, act="lrelu", out_dtype=sdt)
    k, b = _conv(params["conv_last"], cdt)
    return dense_conv3x3([fea], k, b, out_dtype=jnp.float32)


def rrdbnet_pallas_supported(precision: Precision, batch: int,
                             width: int, cfg=None) -> bool:
    import jax
    widths_ok = True
    if cfg is not None:
        # dense_conv3x3 keeps all output channels in one chunk; the
        # pixel-unshuffle prologue (RealESRGAN x2/x1) is XLA-only
        widths_ok = (max(cfg.nf, cfg.gc, cfg.out_channels) <= 128
                     and getattr(cfg, "unshuffle", 1) == 1)
    return (precision.mode == "fast" and batch == 1 and width % 8 == 0
            and width > 0 and widths_ok
            and jax.default_backend() == "tpu"
            and precision.upstack in ("auto", "pallas"))

"""Flux.1 AutoencoderKL decoder — functional JAX, NHWC, TPU-first.

The reference package never owns this network: it instruments ComfyUI's
decoder with forward hooks (`hdr_vae_decode.py:850-859`) and re-executes it
layer-by-layer in three "bypass" variants (`:443,:832,:1205`, ~530 LoC) just
to obtain the pre-`conv_out` feature map.  Because this framework owns the
decoder, a single jitted forward returns ``(rgb, pre_conv_out)`` and all of
the hook/bypass machinery collapses to the ``apply_conv_out`` flag
(SURVEY.md section 7, idiomatic inversion #1).

Topology (SURVEY.md section 2.6): conv_in -> mid(block_1, attn_1, block_2) ->
up stages traversed high-resolution-multiplier first, each with
``num_res_blocks + 1`` ResNet blocks and a nearest-2x upsample (except the
last) -> GroupNorm + SiLU -> conv_out.  The mid attention always RUNS here —
the reference skips it to dodge hangs (`hdr_vae_decode.py:514`), which this
build must not do (SURVEY.md section 5, long-context row).
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from hdrvae.core.config import DecoderConfig, Precision
from hdrvae.models.layers import (GNTape, conv2d, group_norm_silu,
                                  init_conv2d, init_group_norm,
                                  nearest_upsample_2x)
from hdrvae.kernels.attention import spatial_attention

Params = Dict[str, Any]


class DecodeOutput(NamedTuple):
    """One-forward outputs; replaces the reference's hook + double decode."""

    rgb: Optional[jnp.ndarray]       # [B, H, W, 3] in [0, 1]-ish, or None
    pre_conv_out: jnp.ndarray        # [B, H, W, 128] post norm_out + SiLU


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def resnet_block(x: jnp.ndarray, p: Params, *, num_groups: int,
                 precision: Precision, tape=None) -> jnp.ndarray:
    h = group_norm_silu(x, p["norm1"], num_groups=num_groups,
                        precision=precision, tape=tape)
    h = conv2d(h, p["conv1"], precision=precision)
    h = group_norm_silu(h, p["norm2"], num_groups=num_groups,
                        precision=precision, tape=tape)
    h = conv2d(h, p["conv2"], precision=precision)
    if "nin_shortcut" in p:
        x = conv2d(x, p["nin_shortcut"], precision=precision)
    out = x + h
    if tape is not None and hasattr(tape, "mask_output"):
        # shape-bucketed exactness: conv biases leak into the pad region;
        # re-zero so the next spatial op sees SAME-style zeros
        out = tape.mask_output(out)
    return out


def attn_block(x: jnp.ndarray, p: Params, *, num_groups: int,
               precision: Precision, tape=None) -> jnp.ndarray:
    """Single-head spatial self-attention with residual (mid-block attn).

    Uses plain GroupNorm (no SiLU) before the qkv projections, per the
    canonical AutoencoderKL AttnBlock.
    """
    from hdrvae.models.layers import group_norm
    h = group_norm(x, p["norm"], num_groups=num_groups,
                   precision=precision, tape=tape)
    q = conv2d(h, p["q"], precision=precision)
    k = conv2d(h, p["k"], precision=precision)
    v = conv2d(h, p["v"], precision=precision)
    key_valid = (tape.key_valid(x) if tape is not None
                 and hasattr(tape, "key_valid") else None)
    h = spatial_attention(q, k, v, precision=precision,
                          key_valid=key_valid)
    h = conv2d(h, p["proj_out"], precision=precision)
    return x + h


# ---------------------------------------------------------------------------
# Decoder forward
# ---------------------------------------------------------------------------


def decoder_head(params: Params, z: jnp.ndarray,
                 cfg: DecoderConfig = DecoderConfig(), *,
                 precision: Precision = Precision(),
                 preprocess_latent: bool = True,
                 tail_levels: int = 0,
                 tape=None) -> jnp.ndarray:
    """conv_in + mid (incl. GLOBAL attention) + up levels above
    ``tail_levels``, run whole-image.

    The head is the non-translation-local part of the decoder: mid-block
    attention sees every latent pixel, so no spatial tiling can be exact
    through it — but it runs at LATENT resolution, where the whole image is
    cheap.  Everything downstream (:func:`decoder_tail`) is conv/GN-only
    and shards spatially (hdrvae.sharding.mesh slab executor).  Output
    resolution: latent x 2^(num_levels - max(tail_levels, 1)) when
    tail_levels >= 1 (one 2x upsample per head level except level 0).
    """
    if preprocess_latent:
        # diffusers/ComfyUI latent scaling for Flux.1.
        z = z / cfg.scale_factor + cfg.shift_factor
    if tape is not None and hasattr(tape, "mask_output"):
        # shape-bucketed exactness: the shift_factor writes into the pad
        # region; conv_in must see zeros there (== SAME padding of the
        # unpadded decode)
        z = tape.mask_output(z)

    # Mixed tier with fast_head_levels > 0: conv_in + mid run in fast
    # bf16 (they sit at latent resolution, where the per-stage sweep in
    # PERF_NOTES.md section 6 measured negligible end-to-end error
    # contribution); each up level picks its own precision below.
    hp = precision.head_precision()
    x = conv2d(z, params["conv_in"], precision=hp)

    mid = params["mid"]
    x = resnet_block(x, mid["block_1"], num_groups=cfg.num_groups,
                     precision=hp, tape=tape)
    if cfg.attn_mid:
        x = attn_block(x, mid["attn_1"], num_groups=cfg.num_groups,
                       precision=hp, tape=tape)
    x = resnet_block(x, mid["block_2"], num_groups=cfg.num_groups,
                     precision=hp, tape=tape)

    # Up path: highest multiplier first (matches AutoencoderKL's
    # reversed(range(num_resolutions)) traversal).
    for level in reversed(range(tail_levels, cfg.num_levels)):
        x = _up_level(params["up"][level], x, level, cfg,
                      precision.for_level(level), tape)
    return x


def _up_level(up: Params, x: jnp.ndarray, level: int, cfg: DecoderConfig,
              precision: Precision, tape) -> jnp.ndarray:
    for j in range(cfg.num_res_blocks + 1):
        x = resnet_block(x, up["block"][j], num_groups=cfg.num_groups,
                         precision=precision, tape=tape)
    if level != 0:
        # NOTE: the subpixel decomposition (layers.upsample_conv_2x,
        # 2.25x fewer MACs) measured SLOWER on v5e (121 vs 97 ms
        # decoder at 1024^2) — four 2x2 convs + interleave lose to
        # XLA's single well-tiled 3x3; keeping the plain form.
        x = nearest_upsample_2x(x)
        x = conv2d(x, up["upsample"], precision=precision)
    return x


def tail_receptive_radius(cfg: DecoderConfig, tail_levels: int) -> int:
    """Receptive-field radius of :func:`decoder_tail` in TAIL-ENTRY pixels.

    Each 3x3 conv at resolution f x entry adds radius 1/f; each upsample
    doubles f.  A slab halo of this size makes halo-crop tiling EXACT for
    the entire tail conv stack (the conv half of SURVEY.md section 7's
    overlap-tiling hard part; GroupNorm's global statistics are the other
    half, handled by cross-slab reduction in the mesh executor).
    """
    rf = 0.0
    f = 1
    for level in reversed(range(tail_levels)):
        rf += 2 * (cfg.num_res_blocks + 1) / f
        if level != 0:
            f *= 2
            rf += 1.0 / f  # the upsample conv runs at the doubled resolution
    rf += 1.0 / f  # conv_out
    return max(1, int(math.ceil(rf)))


def decoder_tail(params: Params, x: jnp.ndarray,
                 cfg: DecoderConfig = DecoderConfig(), *,
                 precision: Precision = Precision(),
                 tail_levels: int = 0,
                 apply_conv_out: bool = True,
                 postprocess_output: bool = True,
                 tape=None) -> DecodeOutput:
    """Up levels ``tail_levels - 1 .. 0`` + norm_out/SiLU (+ conv_out) on a
    :func:`decoder_head` output (or a spatial slab of one).

    Purely translation-local except GroupNorm statistics, so the sharded
    slab executor runs it on row slabs with GN stats reduced across the
    mesh — exact whole-image statistics from per-slab partials.
    """
    for level in reversed(range(tail_levels)):
        x = _up_level(params["up"][level], x, level, cfg,
                      precision.for_level(level), tape)

    x = group_norm_silu(x, params["norm_out"], num_groups=cfg.num_groups,
                        precision=precision, tape=tape)
    # Stays in storage dtype (bf16 in fast mode): the epilogue's stats /
    # collapse passes over this [B, H, W, 128] map are HBM-bound, and f32
    # doubles their traffic.  Parity mode keeps float32.
    pre_conv_out = x.astype(precision.storage_dtype)

    rgb = None
    if apply_conv_out:
        rgb = conv2d(pre_conv_out, params["conv_out"], precision=precision)
        if postprocess_output:
            # Host-framework output mapping: clamp((x+1)/2, 0, 1).  The
            # clamp matches ComfyUI's process_output — the reference's
            # analysis relies on the exact [0, 1] post range to classify
            # SIGMOID and select logit recovery.
            rgb = rgb * cfg.output_scale + cfg.output_shift
            if cfg.output_clamp:
                rgb = jnp.clip(rgb, 0.0, 1.0)
        rgb = rgb.astype(jnp.float32)

    return DecodeOutput(rgb=rgb, pre_conv_out=pre_conv_out)


def decoder_apply(params: Params, z: jnp.ndarray,
                  cfg: DecoderConfig = DecoderConfig(), *,
                  precision: Precision = Precision(),
                  apply_conv_out: bool = True,
                  preprocess_latent: bool = True,
                  postprocess_output: bool = True,
                  tape=None) -> DecodeOutput:
    """Decode a latent ``z`` [B, h, w, z_channels] (NHWC).

    Returns both the standard image and the pre-conv_out feature map from ONE
    forward.  ``apply_conv_out=False`` is the declarative form of the
    reference's whole bypass subsystem ("decode without the final layer",
    `hdr_vae_decode.py:814-815,1320-1321`).

    Composition of :func:`decoder_head` and :func:`decoder_tail` with every
    up level in the head — the identical op sequence to a monolithic
    forward.

    On TPU in fast mode at batch 1 (``precision.upstack`` "auto"/
    "pallas"), the mid + up path runs as the fused Pallas kernel chain
    (models.pallas_tail) instead of the XLA layers: same math, no GN
    reduce->broadcast chains left in the XLA graph, 1.15-1.2x faster
    (PERF_NOTES.md section 3).
    """
    from hdrvae.models.pallas_tail import pallas_forward, upstack_supported
    if upstack_supported(precision, z.shape[0], tape, width=z.shape[2],
                         cfg=cfg):
        pre, moments = pallas_forward(params, z, cfg, precision=precision,
                                      preprocess_latent=preprocess_latent)
        inject = GNTape("inject", [(moments[0][None], moments[1][None])])
        return decoder_tail(params, pre[None], cfg, precision=precision,
                            tail_levels=0, apply_conv_out=apply_conv_out,
                            postprocess_output=postprocess_output,
                            tape=inject)
    if precision.upstack == "pallas":
        raise ValueError(
            "precision.upstack='pallas' requires fast mode, batch 1, no "
            "tape, a TPU backend, and 128-multiple channel widths "
            f"(got mode={precision.mode!r}, batch={z.shape[0]}, "
            f"tape={tape!r}, backend={jax.default_backend()!r}, "
            f"widths={sorted({cfg.ch * m for m in cfg.ch_mult})})")
    x = decoder_head(params, z, cfg, precision=precision,
                     preprocess_latent=preprocess_latent, tail_levels=0,
                     tape=tape)
    return decoder_tail(params, x, cfg, precision=precision, tail_levels=0,
                        apply_conv_out=apply_conv_out,
                        postprocess_output=postprocess_output, tape=tape)


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _init_resnet(key: jax.Array, cin: int, cout: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": init_group_norm(cin),
        "conv1": init_conv2d(k1, 3, 3, cin, cout),
        "norm2": init_group_norm(cout),
        "conv2": init_conv2d(k2, 3, 3, cout, cout),
    }
    if cin != cout:
        p["nin_shortcut"] = init_conv2d(k3, 1, 1, cin, cout)
    return p


def _init_attn(key: jax.Array, c: int) -> Params:
    kq, kk, kv, kp = jax.random.split(key, 4)
    return {
        "norm": init_group_norm(c),
        "q": init_conv2d(kq, 1, 1, c, c),
        "k": init_conv2d(kk, 1, 1, c, c),
        "v": init_conv2d(kv, 1, 1, c, c),
        "proj_out": init_conv2d(kp, 1, 1, c, c),
    }


def init_decoder(key: jax.Array,
                 cfg: DecoderConfig = DecoderConfig()) -> Params:
    """Randomly initialize a decoder pytree (test fixtures / cold start)."""
    keys = iter(jax.random.split(key, 256))
    block_in = cfg.block_in
    params: Params = {
        "conv_in": init_conv2d(next(keys), 3, 3, cfg.z_channels, block_in),
        "mid": {
            "block_1": _init_resnet(next(keys), block_in, block_in),
            "block_2": _init_resnet(next(keys), block_in, block_in),
        },
    }
    if cfg.attn_mid:
        params["mid"]["attn_1"] = _init_attn(next(keys), block_in)

    ups = {}
    cin = block_in
    for level in reversed(range(cfg.num_levels)):
        cout = cfg.ch * cfg.ch_mult[level]
        blocks = []
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(_init_resnet(next(keys), cin, cout))
            cin = cout
        up: Params = {"block": blocks}
        if level != 0:
            up["upsample"] = init_conv2d(next(keys), 3, 3, cout, cout)
        ups[level] = up
    params["up"] = ups

    c_final = cfg.pre_conv_out_channels
    params["norm_out"] = init_group_norm(c_final)
    params["conv_out"] = init_conv2d(next(keys), 3, 3, c_final,
                                     cfg.out_channels)
    return params


def param_count(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))

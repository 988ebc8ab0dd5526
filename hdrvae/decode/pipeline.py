"""The HDR decode pipeline — the reference's whole node as ONE fused graph.

The reference pipeline (`hdr_vae_decode.py:62-195`, SURVEY.md section 3.1)
decodes the latent 2-3 times (analysis pass with a hook, intelligent decode,
bypass fallback), syncs stats to host after every stage, and falls back
through threads with timeouts.  Owning the decoder inverts all of that:

  one decoder forward -> (rgb, pre_conv_out)
  -> in-graph analysis (stats + sigmoid/tanh classification)
  -> MAX-pool collapse + sRGB->linear + mode math  (fused epilogue)
  -> in-graph acceptance select (intelligent result vs raw-features tier)
  -> EV multiplier

Everything jits into a single XLA program; the only host sync is the final
(image, stats) fetch.  The reference's fallback *tiers* survive as an
explicit, declarative select: when the intelligent result has no HDR content
the raw pre-conv_out features (== what all three reference bypasses compute)
are used instead (SURVEY.md section 5, failure-detection row).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from hdrvae.core.color import srgb_to_linear
from hdrvae.core.config import DecoderConfig, HDRDecodeConfig, Precision
from hdrvae.core.stats import hdr_stats, stats_to_host
from hdrvae.decode.analysis import ConvOutAnalysis
from hdrvae.decode.modes import apply_mode, build_recovery_maps
from hdrvae.models.decoder import DecodeOutput, decoder_apply

Params = Dict[str, Any]


# Test hook: overrides decode.staged.STAGED_MIN_PIXELS for the staged
# auto-routing threshold in hdr_decode (None = use the real constant).
_STAGED_MIN_PIXELS_OVERRIDE = None


class HDRDecodeResult(NamedTuple):
    image: jnp.ndarray                    # [B, H, W, 3] float32 linear HDR
    standard: jnp.ndarray | None          # plain decode (None when
                                          # cfg.keep_standard=False)
    stats: Dict[str, Any]                 # nested in-graph stats
    used_fallback: jnp.ndarray            # 0-d bool: raw-features tier used


def hdr_epilogue_from_parts(rgb: jnp.ndarray, pre_collapsed: jnp.ndarray,
                            pre_stats: Dict[str, jnp.ndarray],
                            cfg: HDRDecodeConfig,
                            pre_first3: jnp.ndarray | None = None,
                            ev=None) -> Tuple[jnp.ndarray, jnp.ndarray,
                                              ConvOutAnalysis]:
    """Mode math + acceptance select from pre-computed parts.

    The tiled/sharded executors collapse each tile's 128-channel pre map to
    3 channels BEFORE stitching (pointwise, so it commutes with stitching)
    and combine the raw-pre statistics from per-tile partials — at 4K the
    raw stitched map would be a multi-GB tensor.

    ``pre_first3`` carries the first 3 raw pre-conv_out channels for the
    ``fallback_collapse="first3"`` tier (the reference simple_bypass's
    eye(3,C) projection, `hdr_vae_decode.py:1324-1329`).  Every execution
    path (whole-image, slab-sharded, tile-grid) supplies it when the config
    asks for first3 — the channels are pointwise in the pre map, so they
    stitch exactly like rgb.

    ``ev`` optionally overrides ``cfg.conservative_ev_multiplier`` with a
    TRACED scalar: ``hdr_decode`` passes it this way so a per-request
    multiplier (serving) does not enter the jit static key — with the
    multiplier baked into ``cfg``, every distinct float would recompile
    the whole program.  The result is bit-identical either way (one IEEE
    f32 multiply).
    """
    if cfg.fallback_collapse not in ("maxpool", "first3"):
        raise ValueError(
            f"unknown fallback_collapse {cfg.fallback_collapse!r}")
    if cfg.fallback_collapse == "first3" and pre_first3 is None:
        raise ValueError("fallback_collapse='first3' needs the raw pre-map "
                         "channels; the caller did not carry them")
    mode = cfg.canonical_mode()
    from hdrvae.core.stats import tensor_stats
    post_stats = tensor_stats(rgb)
    from hdrvae.decode.analysis import classify_normalization
    analysis = ConvOutAnalysis(pre_stats=pre_stats, post_stats=post_stats,
                               norm_kind=classify_normalization(post_stats))

    ldr_linear = srgb_to_linear(rgb)
    maps = build_recovery_maps(rgb, pre_collapsed, analysis.pre_stats,
                               analysis.norm_kind, cfg)
    intelligent = apply_mode(mode, ldr_linear, pre_collapsed, maps,
                             analysis.pre_stats, cfg)

    # Acceptance (`hdr_vae_decode.py:100-112`): keep the intelligent result
    # iff it produced HDR pixels or exceeds the 1.1 threshold; otherwise use
    # the raw pre-conv_out features (the bypass-tier output, already computed
    # in this same forward).
    has_hdr_pixels = jnp.any(intelligent > 1.0)
    accept = jnp.logical_or(has_hdr_pixels,
                            jnp.max(intelligent) > cfg.accept_max_threshold)
    # The formatted bypass-tier output (`hdr_vae_decode.py:443,1205`).
    fallback = (pre_first3 if cfg.fallback_collapse == "first3"
                else pre_collapsed)
    image = jnp.where(accept, intelligent, fallback)

    # EV multiplier applies to whichever tier won (`hdr_vae_decode.py:180-182`).
    image = image * (cfg.conservative_ev_multiplier if ev is None else ev)

    return image.astype(jnp.float32), jnp.logical_not(accept), analysis


def hdr_epilogue(rgb: jnp.ndarray, pre_conv_out: jnp.ndarray,
                 cfg: HDRDecodeConfig,
                 ev=None) -> Tuple[jnp.ndarray, jnp.ndarray,
                                   ConvOutAnalysis]:
    """Analysis + mode math + acceptance select on decoder outputs
    (whole-image form).  The collapse + raw statistics default to XLA's
    fused reductions; cfg.use_fused_epilogue opts into the experimental
    single-pass Pallas kernel (see kernels/epilogue.py for the measured
    trade-off)."""
    from hdrvae.kernels.epilogue import collapse_and_stats
    pre_collapsed, pre_stats = collapse_and_stats(
        pre_conv_out, use_fused=cfg.use_fused_epilogue)
    pre_first3 = (pre_conv_out[..., :3].astype(jnp.float32)
                  if cfg.fallback_collapse == "first3" else None)
    return hdr_epilogue_from_parts(rgb, pre_collapsed, pre_stats, cfg,
                                   pre_first3, ev)


def _decode_batched(params: Params, latent: jnp.ndarray,
                    decoder_cfg: DecoderConfig, precision: Precision,
                    tape=None) -> DecodeOutput:
    if latent.shape[0] > 1:
        # Decode batch entries SEQUENTIALLY: XLA:TPU convs at these shapes
        # run ~2.2x slower per image with batch >= 2 (measured 219 vs
        # 101 ms/img at 1024^2) — layout/scheduling pathology.  lax.map
        # keeps each forward at the batch-1 optimum; the epilogue still
        # sees the whole batch (reference semantics: stats span all
        # frames).
        def one(z):
            o = decoder_apply(params, z[None], decoder_cfg,
                              precision=precision, tape=tape)
            return o.rgb[0], o.pre_conv_out[0]
        rgb, pre = jax.lax.map(one, latent)
        return DecodeOutput(rgb=rgb, pre_conv_out=pre)
    return decoder_apply(params, latent, decoder_cfg,
                         precision=precision, tape=tape)


def _epilogue_and_stats(conv_out_params: Params, out: DecodeOutput,
                        latent: jnp.ndarray, cfg: HDRDecodeConfig,
                        precision: Precision, ev=None):
    """Epilogue + the stats record.  ``latent`` must be the UNPADDED
    latent so stats['input'] never includes pad pixels."""
    image, used_fallback, analysis = hdr_epilogue(out.rgb, out.pre_conv_out,
                                                  cfg, ev)
    stats = {
        "input": hdr_stats(latent),
        "pre": analysis.pre_stats,
        "post": analysis.post_stats,
        "norm_kind": analysis.norm_kind,
        "output": hdr_stats(image),
    }
    if cfg.full_analysis:
        # The reference's extended analysis record: conv_out re-applied
        # to the captured features alone (`hdr_vae_decode.py:877-881`)
        # and the layer's weight/bias stats (`:900-910`) — in-graph
        # reductions instead of hook captures + host syncs.
        from hdrvae.core.stats import tensor_stats
        from hdrvae.models.layers import conv2d
        conv_only = conv2d(out.pre_conv_out, conv_out_params,
                           precision=precision)
        stats["conv_only"] = tensor_stats(conv_only)
        stats["conv_weight"] = tensor_stats(conv_out_params["kernel"])
        stats["conv_bias"] = tensor_stats(conv_out_params["bias"])
    # Not returning the standard decode lets XLA reuse its buffer for the
    # HDR image instead of keeping both full-res float32 tensors live.
    standard = out.rgb if cfg.keep_standard else None
    return image, standard, stats, used_fallback


def _hdr_decode_jit(params: Params, latent: jnp.ndarray,
                    decoder_cfg: DecoderConfig, cfg: HDRDecodeConfig,
                    precision: Precision, ev=None):
    out = _decode_batched(params, latent, decoder_cfg, precision)
    return _epilogue_and_stats(params["conv_out"], out, latent, cfg,
                               precision, ev)


@functools.partial(jax.jit, static_argnames=("decoder_cfg", "cfg",
                                             "precision"))
def _hdr_decode_compiled(params, latent, decoder_cfg, cfg, precision,
                         ev=None):
    # `ev` is TRACED (not in static_argnames): see _split_ev.
    return _hdr_decode_jit(params, latent, decoder_cfg, cfg, precision, ev)


@functools.partial(jax.jit, static_argnames=("decoder_cfg", "precision"))
def _decoder_forward_bucketed(params, latent, valid_hw, decoder_cfg,
                              precision):
    """Zero-padded (bucket-shaped) decoder forward.  ``valid_hw`` is a
    TRACED [2] int32 array — PadMask only compares iotas against it and
    divides by the valid count, so every original resolution sharing a
    bucket reuses ONE compiled program (the point of bucketing; a static
    valid_hw would recompile the 49M-param decoder per original size).
    The PadMask tape keeps the pad region out of every GN statistic,
    attention softmax, and conv halo, making the bucketed decode EXACT
    for the valid region.  Returns PADDED (rgb, pre_conv_out); the
    caller crops outside jit and runs the (small, per-shape-compiled)
    epilogue program on the crop."""
    from hdrvae.models.layers import PadMask
    tape = PadMask(latent.shape[1], latent.shape[2],
                   valid_hw[0], valid_hw[1])
    out = _decode_batched(params, latent, decoder_cfg, precision, tape)
    return out.rgb, out.pre_conv_out


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def _epilogue_compiled(conv_out_params, out_rgb, pre_conv_out, latent,
                       cfg, precision, ev=None):
    """Standalone epilogue for the bucketed path: compiles per ORIGINAL
    shape, but is a few reductions + pointwise math — seconds, not the
    decoder's minutes."""
    out = DecodeOutput(rgb=out_rgb, pre_conv_out=pre_conv_out)
    return _epilogue_and_stats(conv_out_params, out, latent, cfg,
                               precision, ev)


def _split_ev(cfg: HDRDecodeConfig):
    """(cfg with multiplier 1.0, traced ev scalar).

    The EV multiplier is one pointwise f32 multiply; keeping it inside the
    static ``cfg`` means every distinct float compiles a NEW program — on
    the unbucketed path that is the full 49M-param decoder per value, an
    unbounded-recompile hazard for serving workloads that pass
    client-supplied multipliers.  Tracing it keeps one program per shape;
    the result is bit-identical (x * 1.0 folding included)."""
    ev = jnp.float32(cfg.conservative_ev_multiplier)
    if cfg.conservative_ev_multiplier != 1.0:
        cfg = dataclasses.replace(cfg, conservative_ev_multiplier=1.0)
    return cfg, ev


def hdr_decode(params: Params, latent: jnp.ndarray,
               decoder_cfg: DecoderConfig = DecoderConfig(),
               cfg: HDRDecodeConfig = HDRDecodeConfig(),
               precision: Precision = Precision(),
               *, shape_bucket: int = 0,
               pad_to: Tuple[int, int] | None = None) -> HDRDecodeResult:
    """Decode a latent to a linear HDR image.

    Args:
      params: decoder pytree (``init_decoder`` / ``load_decoder``).
      latent: [B, h, w, z_channels] NHWC (or [B, z, h, w] NCHW, detected and
        transposed for API compatibility with torch-layout callers).
      decoder_cfg / cfg / precision: static configs (hashable dataclasses).
      shape_bucket: when > 0, zero-pad the latent H/W up to multiples of
        this value and crop the output — bounding the number of compiled
        shapes for arbitrary-resolution serving (SURVEY.md section 7
        hard-parts, "recompilation storms").  The pad region is masked out
        of every GroupNorm statistic, attention softmax, and conv halo
        (models.layers.PadMask), so the bucketed decode is EXACT — it
        equals the unpadded decode to float noise.

    Returns an :class:`HDRDecodeResult`; ``stats`` remain device arrays.
    """
    zc = decoder_cfg.z_channels
    if latent.ndim != 4:
        raise ValueError(f"latent must be 4D, got shape {latent.shape}")
    if latent.shape[-1] != zc:
        if latent.shape[1] == zc:
            latent = jnp.transpose(latent, (0, 2, 3, 1))  # NCHW -> NHWC
        else:
            raise ValueError(
                f"latent shape {latent.shape} has no {zc}-channel axis "
                f"(expected NHWC or NCHW with z_channels={zc})")

    orig_h, orig_w = latent.shape[1], latent.shape[2]

    # Contract-tier large frames: the mixed tier's f32 activations exceed
    # single-chip HBM past ~2048^2-class outputs; route through the staged
    # slab-streamed executor (decode/staged.py), which computes the same
    # function with bounded peak memory.  Explicitly bucketed/padded calls
    # keep the whole-image program (serving owns its shape policy), as do
    # fast_head_levels configs (the staged executor runs the whole
    # decoder in the mixed tier).
    if (precision.mode == "mixed" and precision.fast_head_levels == 0
            and latent.shape[0] == 1
            and shape_bucket == 0 and pad_to is None
            and decoder_cfg.num_levels >= 2):
        from hdrvae.decode import staged as _staged
        s = decoder_cfg.spatial_scale
        threshold = _STAGED_MIN_PIXELS_OVERRIDE \
            or _staged.STAGED_MIN_PIXELS
        if (orig_h * s) * (orig_w * s) >= threshold:
            return _staged.staged_hdr_decode(params, latent, decoder_cfg,
                                             cfg, precision)

    orig_latent = latent
    valid_hw = None
    cfg, ev = _split_ev(cfg)
    if pad_to is not None:
        # explicit bucket target (decode.buckets.BucketPolicy.snap_hw).
        # A latent already AT the target still takes the bucketed program
        # (full-valid PadMask): serving callers rely on one decoder
        # program per bucket shape — routing exact-multiple latents to
        # the unbucketed program would compile every bucket twice and
        # make warmup pre-compile the wrong one.
        if pad_to[0] < orig_h or pad_to[1] < orig_w:
            raise ValueError(f"pad_to {pad_to} smaller than latent "
                             f"{(orig_h, orig_w)}")
        if pad_to != (orig_h, orig_w):
            latent = jnp.pad(latent, ((0, 0), (0, pad_to[0] - orig_h),
                                      (0, pad_to[1] - orig_w), (0, 0)))
        valid_hw = (orig_h, orig_w)
    elif shape_bucket > 0:
        pad_h = -orig_h % shape_bucket
        pad_w = -orig_w % shape_bucket
        if pad_h or pad_w:
            latent = jnp.pad(latent, ((0, 0), (0, pad_h), (0, pad_w),
                                      (0, 0)))
            valid_hw = (orig_h, orig_w)

    if valid_hw is not None:
        rgb, pre = _decoder_forward_bucketed(
            params, latent, jnp.asarray(valid_hw, jnp.int32),
            decoder_cfg, precision)
        # Crop to the valid region OUTSIDE jit (shapes can't be dynamic
        # in-graph), then run the small per-shape epilogue program so
        # its global reductions never see pad pixels.
        s = decoder_cfg.spatial_scale
        rgb = rgb[:, :orig_h * s, :orig_w * s]
        pre = pre[:, :orig_h * s, :orig_w * s]
        image, standard, stats, used_fallback = _epilogue_compiled(
            params["conv_out"], rgb, pre, orig_latent, cfg, precision, ev)
    else:
        image, standard, stats, used_fallback = _hdr_decode_compiled(
            params, latent, decoder_cfg, cfg, precision, ev)
    return HDRDecodeResult(image=image, standard=standard, stats=stats,
                           used_fallback=used_fallback)


def decode_summary(result: HDRDecodeResult) -> Dict[str, Any]:
    """One host sync: the reference's log vocabulary as a structured record
    (SURVEY.md section 5, metrics row)."""
    summary = stats_to_host(result.stats)
    summary["used_fallback"] = bool(result.used_fallback)
    from hdrvae.decode.analysis import NORM_NAMES
    summary["normalization"] = NORM_NAMES[int(summary.pop("norm_kind"))]
    return summary

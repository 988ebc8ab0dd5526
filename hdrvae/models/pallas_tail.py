"""The decoder up-stack as a chain of fused Pallas kernels.

Replaces the XLA conv emitters for the decoder's up path (the ~80% of
decode FLOPs below the mid block) with `kernels.conv3x3.fused_conv3x3`:
each kernel applies the GroupNorm affine + SiLU prologue, runs the 3x3
conv as nine MXU contractions, adds the ResNet residual (optionally
through the nin_shortcut projection), and emits the per-group (sum, sumsq)
of its output — the statistics the NEXT layer's GroupNorm needs.  Between
kernels only scalar-sized [G] moment math and the nearest-upsample remain
in XLA, so no XLA conv fusion ever borders a Pallas custom call (the
round-1 layout-trap condition, `kernels/epilogue.py:158-171`) and the
GroupNorm reduce->broadcast chains that destroy XLA's batched conv
layouts (PERF_NOTES.md section 1) disappear from the XLA graph entirely.

Numerics match the XLA fast path (`models.layers._gn_affine` fast mode):
float32 statistics via the one-pass E[x^2]-mean^2 identity over the
bf16-stored activations, float32 conv accumulation, bf16 storage.
Measured on 1x v5e: the standalone kernels run 1.1-1.65x faster than
XLA's convs at the decoder's shapes (see kernels/conv3x3.py).

Reference parity: this computes the same function as the torch decoder's
up path (`hdr_vae_decode.py:775-803` traverses it; the network itself is
ComfyUI's AutoencoderKL) — asserted against `decoder_tail` in
tests/test_kernels.py.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from hdrvae.core.config import DecoderConfig, Precision
from hdrvae.kernels.conv3x3 import (fused_conv3x3, pad_chain_input,
                                    upconv_gn_conv3x3, upsample_conv3x3,
                                    _MG)

Params = Dict[str, Any]
Moments = Tuple[jnp.ndarray, jnp.ndarray]    # (mean [G], var [G]) float32

_EPS = 1e-6

# Output-pixel count above which `upstack_apply` defaults to the
# folded-residual low-memory top level (see `_resnet_block`): the
# three-buffer peak (8 + 4 + 4 GB at 4096^2) scales with H*W and first
# exceeds the 15.75 GB v5e HBM between 3840^2 (14.1 GB) and 4096^2
# (16.08 GB, measured).
LOWMEM_MIN_PIXELS = 15_000_000


def _entry_moments(x: jnp.ndarray, num_groups: int) -> Moments:
    """Fast-mode GroupNorm moments of the up-stack entry (the head output):
    one XLA reduction at the Pallas chain's entry; every later layer's
    moments come from the kernels' emitted partials."""
    h, w, c = x.shape
    gs = c // num_groups
    xf = x.astype(jnp.float32)
    from hdrvae.models.layers import _group_onehot
    onehot = _group_onehot(c, num_groups)
    n = h * w * gs
    mean = jnp.einsum("hwc,cg->g", xf, onehot) / n
    sq = jnp.einsum("hwc,cg->g", jnp.square(xf), onehot) / n
    return mean, jnp.maximum(sq - jnp.square(mean), 0.0)


def _affine(p: Params, moments: Moments, num_groups: int
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold GroupNorm normalization + learned scale/bias into one
    per-channel (gamma, beta) pair (same algebra as layers._gn_affine)."""
    mean, var = moments
    c = p["scale"].shape[0]
    grp = jnp.arange(c) // (c // num_groups)
    rstd = jax.lax.rsqrt(var + _EPS)
    gamma = p["scale"].astype(jnp.float32) * rstd[grp]
    beta = p["bias"].astype(jnp.float32) - mean[grp] * gamma
    return gamma, beta


def _finalize(sums: Tuple[jnp.ndarray, jnp.ndarray], n: int) -> Moments:
    ssum, ssq = sums
    mean = ssum / n
    return mean, jnp.maximum(ssq / n - jnp.square(mean), 0.0)


class _StatScope:
    """Whole-image statistics: the kernels' emitted (sum, sumsq) cover
    everything; finalize divides by the local element count."""

    f = 1   # current layer resolution multiple vs the chain entry

    def owned_rows(self):
        return None

    def finalize(self, sums, h: int, w: int, gsz: int) -> Moments:
        return _finalize(sums, h * w * gsz)


class _SlabStatScope(_StatScope):
    """Exact whole-image statistics under slab sharding: each kernel
    emits partials over the rows this shard OWNS (`owned_rows`, scaled
    to the layer resolution), a psum over the mesh axis reconstructs the
    global sums, and finalize divides by the GLOBAL element count — the
    kernel-chain analog of sharding.mesh.SlabGNReducer."""

    def __init__(self, axis_name: str, bounds, entry_h: int):
        self.axis_name = axis_name
        self.bounds = jnp.asarray(bounds, jnp.int32)  # traced [2], entry res
        self.entry_h = entry_h                        # GLOBAL entry rows

    def owned_rows(self):
        return self.bounds * self.f

    def finalize(self, sums, h: int, w: int, gsz: int) -> Moments:
        ssum = jax.lax.psum(sums[0], self.axis_name)
        ssq = jax.lax.psum(sums[1], self.axis_name)
        return _finalize((ssum, ssq), (self.entry_h * self.f) * w * gsz)


def _resnet_block(x: jnp.ndarray, p: Params, moments: Moments,
                  cfg: DecoderConfig, precision: Precision,
                  scope: _StatScope = None, *,
                  padded_in: bool = False, padded_out: bool = False,
                  stream_upsample=None
                  ) -> Tuple[jnp.ndarray, Moments]:
    """One ResNet block as two fused kernels.  ``padded_in/out`` select
    the padded chain layout (kernels.conv3x3 module docstring); the
    intermediate conv1 output always stays padded (conv2 consumes it
    directly).

    ``stream_upsample`` — ``(up_kernel, up_bias)`` when ``x`` is the
    DOUBLE-row-padded LOW-RES map feeding the level's upsample
    (`_levels_apply` lowmem): the upsampled map is never materialized
    in HBM.  conv1 runs as the streaming `upconv_gn_conv3x3` kernel
    (per-block VMEM bands; ``moments`` are the upsampled map's, from
    the stats-only pass), and conv2's residual —
    ``nin_shortcut(conv_up(nearest(x)))``, linear end to end — is
    recomputed from the low-res map with the 1x1 FOLDED into the
    upsample conv's weights, ordered after conv1 by a pallas operand
    fence.  Peak HBM drops from three full-res buffers (8+4+4 GB at
    4096^2, 344 MB past v5e HBM) to ~12 GB (PERF_NOTES.md section 5)."""
    g = cfg.num_groups
    cdt = precision.compute_dtype
    scope = scope or _StatScope()
    stream = stream_upsample is not None
    if stream:
        assert "nin_shortcut" in p and scope.owned_rows() is None
        hh = (x.shape[0] - 4) * 2
        ww = (x.shape[1] - 2 * _MG) * 2
    else:
        hh = x.shape[0] - (2 if padded_in else 0)
        ww = x.shape[1] - (2 * _MG if padded_in else 0)

    g1, b1 = _affine(p["norm1"], moments, g)
    if stream:
        up_kernel, up_bias = stream_upsample
        h1, s1 = upconv_gn_conv3x3(
            x, up_kernel.astype(cdt), up_bias, g1, b1,
            p["conv1"]["kernel"].astype(cdt), p["conv1"]["bias"],
            emit_stats=True, num_groups=g,
            out_dtype=precision.storage_dtype,
            store_dtype=precision.storage_dtype)
    else:
        h1, s1 = fused_conv3x3(
            x, p["conv1"]["kernel"].astype(cdt), p["conv1"]["bias"],
            gamma=g1, beta=b1, emit_stats=True, num_groups=g,
            out_dtype=precision.storage_dtype,
            owned_rows=scope.owned_rows(),
            x_padded=padded_in, padded_out=True)
    c1 = h1.shape[-1]
    g2, b2 = _affine(p["norm2"], scope.finalize(s1, hh, ww, c1 // g), g)

    bias2 = p["conv2"]["bias"]
    res_kernel = None
    residual = x
    if stream:
        # proj(conv_up(nearest(x)) + b_up) + b_p ==
        #   conv_fold(nearest(x)) + (b_up @ Wp + b_p): both branches
        # linear, so the shortcut is one folded upsample conv from the
        # 2 GB low-res map instead of a 1x1 over the absent 8 GB one.
        # ``after=h1`` is a hard scheduling fence (a dummy pallas_call
        # operand): `optimization_barrier((x, h1))` is split per value
        # by the compiler, the joint ordering is lost, and the
        # scheduler hoists this recompute before conv1 (measured).
        wp = p["nin_shortcut"]["kernel"][0, 0].astype(jnp.float32)
        w_fold = jnp.einsum(
            "ijab,bc->ijac", up_kernel.astype(jnp.float32), wp).astype(cdt)
        b_fold = (up_bias.astype(jnp.float32) @ wp
                  + p["nin_shortcut"]["bias"].astype(jnp.float32))
        residual = upsample_conv3x3(
            x, w_fold, b_fold, emit_stats=False,
            out_dtype=precision.storage_dtype, x_padded=True,
            x_row_offset=1, padded_out=True, after=h1)
    elif "nin_shortcut" in p:
        # 1x1 projection fused into the second conv's epilogue; its bias
        # folds into the conv bias.
        res_kernel = p["nin_shortcut"]["kernel"][0, 0].astype(cdt)
        bias2 = bias2 + p["nin_shortcut"]["bias"]
    # Identity-add residuals (and the streamed fold, whose only consumer
    # is this conv) die here, block-aligned: let the output reuse their
    # buffer — one less full-res feature map live per block.
    donate = (res_kernel is None and padded_out
              and (stream or padded_in)
              and residual.dtype == precision.storage_dtype)
    y, s2 = fused_conv3x3(
        h1, p["conv2"]["kernel"].astype(cdt), bias2,
        gamma=g2, beta=b2, residual=residual, res_kernel=res_kernel,
        emit_stats=True, num_groups=g, out_dtype=precision.storage_dtype,
        owned_rows=scope.owned_rows(), x_padded=True,
        residual_padded=True if stream else padded_in,
        padded_out=padded_out, donate_residual=donate)
    c2 = y.shape[-1]
    return y, scope.finalize(s2, hh, ww, c2 // g)


def _levels_apply(params: Params, x: jnp.ndarray,
                  cfg: DecoderConfig, precision: Precision,
                  moments: Moments, scope: _StatScope, *,
                  hi: int, lo: int = 0,
                  padded_in: bool = False, padded_out: bool = False,
                  lowmem: bool = False
                  ) -> Tuple[jnp.ndarray, Moments]:
    """Up levels ``hi - 1 .. lo`` as the fused kernel chain.

    Activations stay in the padded chain layout between kernels (ONE
    XLA pad at entry when ``padded_in`` is False; the final kernel
    writes unpadded when ``padded_out`` is False).  ``lowmem`` engages
    the STREAMING top level (see `_resnet_block` ``stream_upsample``):
    the top level's upsampled map is computed as per-block VMEM bands —
    a stats-only pass for its GroupNorm moments, the fused
    `upconv_gn_conv3x3` for block 0's conv1, and a folded-weight
    recompute for its shortcut — instead of an 8 GB (at 4096^2) HBM
    buffer.  Costs ~one extra upsample conv (~6% of decode FLOPs at
    4K); drops peak HBM from 16.1 to ~12 GB."""
    cdt = precision.compute_dtype
    if not padded_in:
        x = pad_chain_input(x)
    pending_stream = None
    for level in reversed(range(lo, hi)):
        up = params["up"][level]
        level_last = level == lo
        for j in range(cfg.num_res_blocks + 1):
            final = (level_last and lo == 0
                     and j == cfg.num_res_blocks)
            x, moments = _resnet_block(
                x, up["block"][j], moments, cfg, precision, scope,
                padded_in=True, padded_out=padded_out or not final,
                stream_upsample=pending_stream if j == 0 else None)
        pending_stream = None
        if level != 0:
            # 2x nearest upsample fused into the conv (2x2-phase
            # decomposition, 2.25x fewer MACs; the upsampled map never
            # touches HBM).  Stats are emitted at the doubled resolution.
            scope.f *= 2
            final = level_last and lo > 0
            up_k = up["upsample"]["kernel"]
            up_b = up["upsample"]["bias"]
            if (lowmem and level - 1 == 0
                    and "nin_shortcut" in params["up"][0]["block"][0]):
                # Streaming top level: moments of the (absent) upsampled
                # map from a stats-only pass; the double-row-padded
                # low-res map becomes block 0's direct input.
                x = jnp.pad(x, ((1, 1), (0, 0), (0, 0)))
                sums = upsample_conv3x3(
                    x, up_k.astype(cdt), up_b, emit_stats=True,
                    num_groups=cfg.num_groups,
                    out_dtype=precision.storage_dtype, x_padded=True,
                    stats_only=True, x_row_offset=1)
                hl = x.shape[0] - 4
                wl = x.shape[1] - 2 * _MG
                moments = scope.finalize(sums, 2 * hl, 2 * wl,
                                         up_k.shape[-1] // cfg.num_groups)
                pending_stream = (up_k, up_b)
                continue
            x, sums = upsample_conv3x3(
                x, up_k.astype(cdt), up_b, emit_stats=True,
                num_groups=cfg.num_groups,
                out_dtype=precision.storage_dtype,
                owned_rows=scope.owned_rows(), x_padded=True,
                padded_out=padded_out or not final)
            h = x.shape[0] - (2 if (padded_out or not final) else 0)
            w = x.shape[1] - (2 * _MG if (padded_out or not final) else 0)
            moments = scope.finalize(sums, h, w,
                                     x.shape[-1] // cfg.num_groups)
    return x, moments


def upstack_apply(params: Params, x: jnp.ndarray,
                  cfg: DecoderConfig = DecoderConfig(), *,
                  precision: Precision = Precision.fast(),
                  moments: Moments = None,
                  lowmem: bool | None = None
                  ) -> Tuple[jnp.ndarray, Moments]:
    """Run every up level on one sample x [H, W, block_in] (a decoder_head
    output with ``tail_levels == num_levels``).

    Returns the pre-norm_out feature map [H*8, W*8, ch] and the GroupNorm
    moments of it — feed them to `decoder_tail` (tail_levels=0) through a
    GNTape("inject") so norm_out reuses the already-reduced statistics.
    ``moments`` are the GN moments of x if the producer already has them
    (the Pallas mid-stack emits them); None computes them here.
    ``lowmem`` — None picks automatically: the folded-residual recompute
    (`_resnet_block`) engages when the output exceeds LOWMEM_MIN_PIXELS
    (whole-image 4096^2 otherwise exceeds v5e HBM by 344 MB).
    """
    if moments is None:
        moments = _entry_moments(x, cfg.num_groups)
    if lowmem is None:
        f = 2 ** (cfg.num_levels - 1)
        lowmem = (x.shape[0] * f) * (x.shape[1] * f) >= LOWMEM_MIN_PIXELS
    return _levels_apply(params, x, cfg, precision, moments, _StatScope(),
                         hi=cfg.num_levels, lowmem=lowmem)


def upstack_slab_apply(params: Params, x: jnp.ndarray, bounds,
                       cfg: DecoderConfig = DecoderConfig(), *,
                       precision: Precision = Precision.fast(),
                       tail_levels: int,
                       axis_name: str,
                       entry_h: int,
                       moments: Moments = None,
                       padded_in: bool = False
                       ) -> Tuple[jnp.ndarray, Moments]:
    """The bottom ``tail_levels`` up levels on ONE ROW SLAB of a
    decoder_head output, inside shard_map, with exact whole-image
    GroupNorm statistics: every kernel emits (sum, sumsq) partials over
    only the rows this shard owns (``bounds``, traced int32 [lo, hi) at
    entry resolution) and a [G]-sized psum over ``axis_name``
    reconstructs the global moments — the kernel-chain counterpart of
    sharding.mesh.SlabGNReducer (per-slab partials instead of an extra
    whole-image stats forward).  ``entry_h`` is the GLOBAL entry height.

    Returns the slab's pre-norm_out features and the GLOBAL moments of
    the whole-image pre-norm_out map (already psum-reduced; feed through
    a GNTape("inject") to decoder_tail(tail_levels=0)).  ``moments`` are
    the global GN moments of the head output if the producer has them
    (pallas_head emits them); None computes them here with a masked
    psum."""
    scope = _SlabStatScope(axis_name, bounds, entry_h)
    if moments is None:
        xi = x[1:-1, _MG:-_MG] if padded_in else x
        h, w, c = xi.shape
        gs = c // cfg.num_groups
        rows = jnp.arange(h)
        lo, hi = scope.bounds[0], scope.bounds[1]
        mask = ((rows >= lo) & (rows < hi)).astype(
            jnp.float32)[:, None, None]
        xf = xi.astype(jnp.float32) * mask
        from hdrvae.models.layers import _group_onehot
        onehot = _group_onehot(c, cfg.num_groups)
        n = entry_h * w * gs
        mean = jax.lax.psum(jnp.einsum("hwc,cg->g", xf, onehot),
                            axis_name) / n
        sq = jax.lax.psum(jnp.einsum("hwc,cg->g", jnp.square(xf), onehot),
                          axis_name) / n
        moments = (mean, jnp.maximum(sq - jnp.square(mean), 0.0))
    return _levels_apply(params, x, cfg, precision, moments, scope,
                         hi=tail_levels, padded_in=padded_in)


def pallas_head(params: Params, z: jnp.ndarray,
                cfg: DecoderConfig = DecoderConfig(), *,
                precision: Precision = Precision.fast(),
                tail_levels: int,
                preprocess_latent: bool = True
                ) -> Tuple[jnp.ndarray, Moments]:
    """The slab decode's whole-image head — conv_in + mid + the up
    levels ABOVE ``tail_levels`` — as the kernel chain, on one sample.

    Running the head through the kernels matters beyond raw speed: with
    an XLA decoder_head feeding Pallas tail kernels, XLA's layout
    assignment propagates the custom calls' default-layout constraint
    back into the head's conv fusions and demotes them to degenerate
    T(1,128) layouts (measured 184 ms for ONE 1024^2x512 conv — the
    round-1 layout-trap failure mode at full scale).

    Returns (head output [H, W, C], its global GN moments)."""
    from hdrvae.models.layers import conv2d
    if preprocess_latent:
        z = z / cfg.scale_factor + cfg.shift_factor
    x = conv2d(z, params["conv_in"], precision=precision)[0]
    x, moments = midstack_apply(params, x, cfg, precision=precision)
    return _levels_apply(params, x, cfg, precision, moments, _StatScope(),
                         hi=cfg.num_levels, lo=tail_levels,
                         padded_out=True)


def _attn_block(x: jnp.ndarray, p: Params, moments: Moments,
                cfg: DecoderConfig, precision: Precision) -> jnp.ndarray:
    """Mid-block single-head spatial attention with the 1x1 q/k/v/proj
    convolutions as plain dots — no XLA conv emitter ever borders the
    Pallas custom calls (round-1 layout trap).  The pre-attention norm is
    plain GroupNorm (no SiLU), applied from the emitted moments."""
    from hdrvae.kernels.attention import spatial_attention
    h_, w_, c = x.shape
    gamma, beta = _affine(p["norm"], moments, cfg.num_groups)
    cdt = precision.compute_dtype
    sdt = precision.storage_dtype
    hn = (x.astype(jnp.float32) * gamma + beta).astype(sdt)
    flat = hn.reshape(h_ * w_, c).astype(cdt)

    def proj(name, inp):
        k = p[name]["kernel"][0, 0].astype(cdt)
        y = jnp.dot(inp, k, preferred_element_type=jnp.float32)
        return (y + p[name]["bias"]).astype(sdt).reshape(1, h_, w_, c)

    q = proj("q", flat)
    k = proj("k", flat)
    v = proj("v", flat)
    a = spatial_attention(q, k, v, precision=precision)
    af = a.reshape(h_ * w_, c).astype(cdt)
    o = jnp.dot(af, p["proj_out"]["kernel"][0, 0].astype(cdt),
                preferred_element_type=jnp.float32)
    o = o + p["proj_out"]["bias"]
    return (x.astype(jnp.float32) + o.reshape(h_, w_, c)).astype(sdt)


def midstack_apply(params: Params, x: jnp.ndarray,
                   cfg: DecoderConfig = DecoderConfig(), *,
                   precision: Precision = Precision.fast()
                   ) -> Tuple[jnp.ndarray, Moments]:
    """The decoder mid section (block_1, attn_1, block_2) on one sample
    x [H, W, block_in] (the conv_in output), with the resnet convs as
    fused Pallas kernels.  XLA's conv emitters schedule these 128x128
    b=1 shapes poorly (~2.3 ms each where the kernel takes ~0.5 ms).
    Returns the mid output and its GN moments for the up-stack entry."""
    moments = _entry_moments(x, cfg.num_groups)
    mid = params["mid"]
    x, moments = _resnet_block(x, mid["block_1"], moments, cfg, precision)
    if cfg.attn_mid:
        x = _attn_block(x, mid["attn_1"], moments, cfg, precision)
        moments = _entry_moments(x, cfg.num_groups)
    return _resnet_block(x, mid["block_2"], moments, cfg, precision)


def pallas_forward(params: Params, z: jnp.ndarray,
                   cfg: DecoderConfig = DecoderConfig(), *,
                   precision: Precision = Precision.fast(),
                   preprocess_latent: bool = True
                   ) -> Tuple[jnp.ndarray, Moments]:
    """Latent [1, h, w, zc] -> (pre-norm_out features [H, W, ch], GN
    moments): conv_in (XLA; tiny K), then mid + every up level as the
    fused kernel chain."""
    from hdrvae.models.layers import conv2d
    if preprocess_latent:
        z = z / cfg.scale_factor + cfg.shift_factor
    x = conv2d(z, params["conv_in"], precision=precision)[0]
    x, moments = midstack_apply(params, x, cfg, precision=precision)
    return upstack_apply(params, x, cfg, precision=precision,
                         moments=moments)


def upstack_supported(precision: Precision, batch: int, tape,
                      width: int = 0, cfg=None) -> bool:
    """The Pallas up-stack serves the fast-mode whole-image path; parity
    mode (f32/HIGHEST, two-pass statistics) and the PadMask/GNTape paths
    keep the XLA implementation.  ``width`` is the latent width: the
    kernels' slab DMAs need 8-column alignment (every real latent is
    128+; tiny test fixtures fall back to XLA).  When ``cfg`` is given,
    every mid/up channel width must be a multiple of 128: the chain
    kernels slice weight buffers at full-lane granularity, and Mosaic
    rejects sub-128-lane loads at compile time (measured: a ch=16
    fixture fails with "index in dimension 3 is a multiple of 128"
    while every Flux-class config — 128/256/512 — compiles)."""
    if cfg is not None:
        widths = {cfg.ch * m for m in cfg.ch_mult}
        if any(w % 128 != 0 for w in widths):
            return False
    return (precision.mode == "fast" and batch == 1 and tape is None
            and width % 8 == 0 and width > 0
            and jax.default_backend() == "tpu"
            and precision.upstack in ("auto", "pallas"))

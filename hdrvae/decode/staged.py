"""Staged single-device decode for the f32-activation (contract) tier.

The mixed tier (``Precision.mixed()`` — float32 activations, HIGH MXU
dots, rgb max-abs ~1e-4-class vs the reference; PERF_NOTES.md section 6)
is the configuration that meets BASELINE.md's ">=5x MP/s AND <=1e-3"
sentence.  But float32 activations at 4096^2 cannot be decoded
whole-image on one v5e chip: the level-0 ResNet blocks alone keep three
4096^2 x 128ch x 4 B maps (8.6 GB each) live, and the upsample junction
materializes a 4096^2 x 256ch map (17.2 GB) — far past the 15.75 GB HBM.
(The fast tier fits via bf16 storage + the streaming Pallas top level,
``models/pallas_tail.py``; "any bf16 anywhere" is measured at
1e-2-class error, so the contract tier cannot borrow that trick.)

This module is the contract tier's answer (VERDICT round-4 item 2): a
STAGED whole-image decode that never materializes a full-resolution
float32 map larger than one 128-channel buffer:

  1. HEAD (whole-image): conv_in + mid (global attention RUNS) + up
     levels above level 2, plus level 2's ResNet blocks — all at
     <= 1/16 output area, where f32 activations are cheap.  The head
     stops BEFORE level 2's upsample: whole-image, that upsample+conv
     peaks at three half-res 512-channel f32 maps (~25 GB at 4K with
     XLA's layout copy — measured OOM on the first build).
  2. JUNCTION INTO LEVEL 1 (row-slab streamed): the 2x-upsample conv
     and level-1 block 0 stream from the level-2 output in three passes
     — upsample stats, +conv1 stats, full — because GroupNorm needs
     whole-image statistics BEFORE the next conv can run (the same
     global-stats dependency SURVEY.md section 7 calls the tiled-decode
     hard part).  The upsampled map never exists in HBM; only block 0's
     output is materialized.  Level-1 blocks 1..n then run as
     stats-pass + full-pass pairs into fresh half-resolution buffers.
  3. JUNCTION INTO LEVEL 0 (row-slab streamed, one materialized
     buffer): same three-pass junction from the level-1 output; level-0
     blocks 1..n (128->128, identity residual) then rewrite the single
     full-resolution 128-channel buffer IN PLACE slab by slab, carrying
     a 2-row stash of overwritten halo rows.
  4. TAIL: norm_out + SiLU + conv_out + the HDR epilogue's collapse and
     statistics, streamed per slab into the [H, W, 3] outputs.

Every pass computes exactly the rows it owns (conv halos come from
guard rows: each buffer carries 2 zero rows top/bottom, which equal
SAME padding at the image boundary and old-value stashes elsewhere), so
per-pixel conv arithmetic is IDENTICAL to the whole-image decode; only
GroupNorm statistic summation order differs (slab partial sums — the
same decomposition the mesh slab executor psums, `sharding/mesh.py`
SlabGNReducer).  Asserted equal to the whole-image mixed decode in
tests/test_staged.py and on chip by `tpu_checks.py staged`.

Cost: the stats passes re-run conv1 once per block plus the junction
chain up to three times — ~1.6x the FLOPs of a flat decode (measured on
chip; PERF_NOTES.md section 7).  That buys the one capability x
fidelity cell the round-4 verdict found empty: contract-tier 4K on ONE
chip.  The reference analog is plain whole-image float32 decode
(`/root/reference/hdr_vae_decode.py:859`, `README.md:39,263`) — which
simply OOMs at these sizes on the reference's own 24 GB-class hardware.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from hdrvae.core.config import DecoderConfig, HDRDecodeConfig, Precision

Params = Dict[str, Any]

_EPS = 1e-6          # GroupNorm eps (models.layers default)
_G = 2               # guard rows per buffer end (>= max pass halo)

# Output-pixel count at/above which hdr_decode auto-routes the mixed tier
# through the staged path: the whole-image mixed decode is measured to fit
# one v5e at 2048^2 (README perf table) and the level-0 three-buffer f32
# peak grows linearly in pixels past HBM between there and 4K.
STAGED_MIN_PIXELS = 6_000_000


def _plan_rows(h: int, target: int, even: bool = False):
    """(slab_rows, n_slabs, ragged) for a height ``h`` pass.

    Prefers an exact divisor near ``target`` (every slab owns full rows).
    When the nearest divisor is degenerate (< target/4 — e.g. h = 8 * a
    prime, whose only small divisors are 1/2/4/8, which would explode
    the pass into hundreds of tiny sequential slabs), fall back to
    RAGGED slabs: fixed ``target``-row windows with the LAST window's
    start clamped to ``h - slab_rows`` — its overlap rows recompute
    bitwise-identical values (same inputs, same ops) and are masked out
    of the statistics.  ``even`` forces an even slab size (the junction
    passes halve the output start to index the low-res source)."""
    step = 2 if even else 1
    target = max(step, min((target // step) * step, h - h % step))
    best = None
    for s in range(step, h + 1, step):
        if h % s == 0 and (best is None
                           or abs(s - target) < abs(best - target)):
            best = s
    if best is not None and 4 * best >= target:
        return best, h // best, False
    return target, -(-h // target), True


def _finalize(ssum, ssq, n: int):
    mean = ssum / n
    return mean, jnp.maximum(ssq / n - jnp.square(mean), 0.0)


def _affine(p: Params, mean, var):
    """Fold GN normalization + learned scale/bias into per-channel
    (gamma, beta) — same algebra as layers._gn_affine / pallas_tail."""
    c = p["scale"].shape[0]
    g = mean.shape[0]
    grp = jnp.arange(c) // (c // g)
    rstd = jax.lax.rsqrt(var + _EPS)
    gamma = p["scale"].astype(jnp.float32) * rstd[grp]
    beta = p["bias"].astype(jnp.float32) - mean[grp] * gamma
    return gamma, beta


def _silu_affine(x, gamma, beta):
    y = x * gamma + beta
    return y * jax.nn.sigmoid(y)


def _conv_hv(x, p: Params, precision: Precision):
    """3x3 conv, VALID on height (halo rows supply the context), SAME on
    width — consumes 2 rows.  Unbatched [R, W, C]."""
    from hdrvae.models.layers import conv2d
    return conv2d(x[None], p, padding=((0, 0), (1, 1)),
                  precision=precision)[0]


def _conv1x1(x, p: Params, precision: Precision):
    from hdrvae.models.layers import conv2d
    return conv2d(x[None], p, precision=precision)[0]


def _nearest2x(x):
    r, w, c = x.shape
    x = jnp.broadcast_to(x[:, None, :, None, :], (r, 2, w, 2, c))
    return x.reshape(2 * r, 2 * w, c)


def _gstats(y, onehot, mp):
    return (jnp.einsum("hwc,cg->g", y, onehot, precision=mp),
            jnp.einsum("hwc,cg->g", jnp.square(y), onehot, precision=mp))


def _guard(x):
    """Add _G zero guard rows top and bottom (SAME-padding semantics at
    the image boundary for every slab window)."""
    return jnp.pad(x, ((_G, _G), (0, 0), (0, 0)))


def _zero_outside(y, start_row, height: int):
    """Zero rows of ``y`` whose GLOBAL row index (``start_row`` + local)
    falls outside [0, height) — the slab-chain equivalent of SAME conv
    padding applied to an intermediate (normalized) map: in the
    whole-image program those rows do not exist and the next conv sees
    zeros, while a slab window would otherwise see silu(beta) or values
    computed from guard zeros."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (y.shape[0],), 0) + start_row
    mask = (rows >= 0) & (rows < height)
    return y * mask[:, None, None].astype(y.dtype)


def _slab_start(i, s: int, h: int):
    """Global start row of slab ``i``: ``i*s`` clamped so the window stays
    in-bounds — only the LAST slab of a ragged plan actually clamps."""
    return jnp.minimum(i * s, h - s)


def _fresh_mask(y, i, out_s: int, start):
    """Zero rows a previous slab already produced (ragged last-slab
    overlap): window row r is fresh iff start + r >= i*out_s."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (y.shape[0],), 0)
    keep = rows >= (i * out_s - start)
    return y * keep[:, None, None].astype(y.dtype)


def _stats_pass(src, n_slabs: int, in_s: int, out_s: int, halo: int, fn,
                groups: int, mp, h_out: int
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Accumulate (sum, sumsq) of ``fn(window, lo)`` over all slabs; the
    output rows of each window are the slab's owned rows (ragged overlap
    rows masked from the statistics).  ``lo`` is the slab's global output
    start row (output resolution), for boundary masking inside fused
    chains."""
    onehot = _onehot_for(fn, groups)
    f = out_s // in_s

    def body(i, acc):
        lo_out = _slab_start(i, out_s, h_out)
        win = jax.lax.dynamic_slice_in_dim(
            src, _G + lo_out // f - halo, in_s + 2 * halo, 0)
        y = _fresh_mask(fn(win, lo_out), i, out_s, lo_out)
        s1, s2 = _gstats(y, onehot, mp)
        return acc[0] + s1, acc[1] + s2

    z = jnp.zeros((groups,), jnp.float32)
    return jax.lax.fori_loop(0, n_slabs, body, (z, z))


def _onehot_for(fn, groups: int):
    # onehot depends on the fn output channel count; probe with eval_shape
    # is overkill — callers pass channel count via fn.out_c instead.
    from hdrvae.models.layers import _group_onehot
    return _group_onehot(fn.out_c, groups)


def _map_pass(src, dst, n_slabs: int, in_s: int, out_s: int, halo: int,
              fn, groups: int, mp, h_out: int):
    """Write ``fn(window)`` rows into ``dst`` (guarded) and accumulate the
    output moments.  A ragged last slab overwrites its overlap rows with
    bitwise-identical values (same inputs, same ops) and masks them from
    the statistics."""
    onehot = _onehot_for(fn, groups)
    f = out_s // in_s

    def body(i, carry):
        dst, s1a, s2a = carry
        lo_out = _slab_start(i, out_s, h_out)
        win = jax.lax.dynamic_slice_in_dim(
            src, _G + lo_out // f - halo, in_s + 2 * halo, 0)
        y = fn(win, lo_out)
        dst = jax.lax.dynamic_update_slice(dst, y, (_G + lo_out, 0, 0))
        s1, s2 = _gstats(_fresh_mask(y, i, out_s, lo_out), onehot, mp)
        return dst, s1a + s1, s2a + s2

    z = jnp.zeros((groups,), jnp.float32)
    return jax.lax.fori_loop(0, n_slabs, body, (dst, z, z))


def _inplace_pass(buf, n_slabs: int, s: int, fn, groups: int, mp):
    """Rewrite ``buf`` slab by slab with ``fn`` (same shape, halo 2),
    stashing the 2 overwritten halo rows each iteration so every window
    sees OLD values — one live full-resolution buffer instead of two."""
    onehot = _onehot_for(fn, groups)
    w, c = buf.shape[1], buf.shape[2]

    def body(i, carry):
        buf, stash, s1a, s2a = carry
        lo = i * s
        tail = jax.lax.dynamic_slice_in_dim(buf, _G + lo, s + 2, 0)
        win = jnp.concatenate([stash, tail], axis=0)   # rows [lo-2, lo+s+2)
        new_stash = win[s:s + 2]                       # old rows [lo+s-2, lo+s)
        y = fn(win, lo)
        buf = jax.lax.dynamic_update_slice(buf, y, (_G + lo, 0, 0))
        s1, s2 = _gstats(y, onehot, mp)
        return buf, new_stash, s1a + s1, s2a + s2

    z = jnp.zeros((groups,), jnp.float32)
    stash0 = jnp.zeros((2, w, c), buf.dtype)
    return jax.lax.fori_loop(0, n_slabs, body, (buf, stash0, z, z))


def _with_out_c(fn, out_c: int):
    fn.out_c = out_c
    return fn


def _block_conv1_fn(p: Params, g1, b1, precision: Precision, height: int):
    """window [s+2, W, Cin] -> conv1 output rows [s, W, Cmid]."""
    def fn(win, lo):
        a = _zero_outside(_silu_affine(win, g1, b1), lo - 1, height)
        return _conv_hv(a, p["conv1"], precision)
    return _with_out_c(fn, p["conv1"]["kernel"].shape[3])


def _block_full_fn(p: Params, g1, b1, g2, b2, precision: Precision,
                   height: int):
    """window [s+4, W, Cin] -> block output rows [s, W, Cout]."""
    def fn(win, lo):
        a = _zero_outside(_silu_affine(win, g1, b1), lo - 2, height)
        h = _conv_hv(a, p["conv1"], precision)
        a = _zero_outside(_silu_affine(h, g2, b2), lo - 1, height)
        h = _conv_hv(a, p["conv2"], precision)
        x_own = win[2:-2]
        if "nin_shortcut" in p:
            res = _conv1x1(x_own, p["nin_shortcut"], precision)
        else:
            res = x_own
        return res + h
    return _with_out_c(fn, p["conv2"]["kernel"].shape[3])


def _up_fn(up_p: Params, precision: Precision):
    """low window [s2+2, W1, C] -> upsample-conv rows [2*s2, W, C].

    No boundary masking needed: the nearest-upsampled guard rows are true
    zeros (the source buffer's guards), which IS the SAME padding the
    whole-image upsample conv sees."""
    def fn(win, lo):
        u = _nearest2x(win)[1:-1]
        return _conv_hv(u, up_p, precision)
    return _with_out_c(fn, up_p["kernel"].shape[3])


def _up_conv1_fn(up_p: Params, b0: Params, gu, bu, precision: Precision,
                 height: int):
    """low window [s2+2, W1, C] -> level-0 block-0 conv1 rows [2*s2, ...]."""
    def fn(win, lo):
        u = _conv_hv(_nearest2x(win), up_p, precision)
        a = _zero_outside(_silu_affine(u, gu, bu), lo - 1, height)
        return _conv_hv(a, b0["conv1"], precision)
    return _with_out_c(fn, b0["conv1"]["kernel"].shape[3])


def _up_block_fn(up_p: Params, b0: Params, gu, bu, g2, b2,
                 precision: Precision, height: int):
    """low window [s2+4, W1, C] -> level-0 block-0 output rows [2*s2, ...]."""
    def fn(win, lo):
        u4 = _conv_hv(_nearest2x(win)[1:-1], up_p, precision)
        a = _zero_outside(_silu_affine(u4, gu, bu), lo - 2, height)
        h = _conv_hv(a, b0["conv1"], precision)
        a = _zero_outside(_silu_affine(h, g2, b2), lo - 1, height)
        h = _conv_hv(a, b0["conv2"], precision)
        x_own = u4[2:-2]
        if "nin_shortcut" in b0:
            res = _conv1x1(x_own, b0["nin_shortcut"], precision)
        else:
            res = x_own
        return res + h
    return _with_out_c(fn, b0["conv2"]["kernel"].shape[3])


def _staged_sameres_block(cur, blk: Params, moments, h: int, w: int,
                          g: int, mp, precision: Precision,
                          slab_rows: int, inplace: bool):
    """One ResNet block over a materialized guarded buffer: conv1 stats
    pass, then a full pass (into a fresh buffer, or rewriting ``cur`` in
    place when the block preserves channel width).  A ragged slab plan
    (awkward-divisor heights) forces the fresh-buffer form — the
    in-place stash assumes contiguous slab starts."""
    s, n, ragged = _plan_rows(h, slab_rows)
    g1, b1 = _affine(blk["norm1"], *moments)
    fn_s = _block_conv1_fn(blk, g1, b1, precision, h)
    ssum, ssq = _stats_pass(cur, n, s, s, 1, fn_s, g, mp, h)
    g2, b2 = _affine(blk["norm2"], *_finalize(ssum, ssq,
                                              h * w * (fn_s.out_c // g)))
    fn_f = _block_full_fn(blk, g1, b1, g2, b2, precision, h)
    if inplace and not ragged:
        assert fn_f.out_c == cur.shape[-1], \
            "in-place blocks must preserve channel width"
        cur, _, ssum, ssq = _inplace_pass(cur, n, s, fn_f, g, mp)
    else:
        dst = jnp.zeros((h + 2 * _G, w, fn_f.out_c), jnp.float32)
        cur, ssum, ssq = _map_pass(cur, dst, n, s, s, 2, fn_f, g, mp, h)
    return cur, _finalize(ssum, ssq, h * w * (fn_f.out_c // g))


def _staged_junction(cur, up_p: Params, b0: Params, h_in: int, w_in: int,
                     g: int, mp, precision: Precision, slab_rows: int):
    """The 2x-upsample conv + the next level's block 0, streamed from the
    low-resolution buffer in three passes (upsample stats, +conv1 stats,
    full) — the 2x-resolution upsampled map never exists in HBM.
    Returns (guarded block-0 output buffer at 2x res, its moments)."""
    hh, ww = 2 * h_in, 2 * w_in
    s0, n0, _ = _plan_rows(hh, 2 * max(1, slab_rows // 2), even=True)
    s2l = s0 // 2
    c_up = up_p["kernel"].shape[3]

    fn_up = _up_fn(up_p, precision)
    ssum, ssq = _stats_pass(cur, n0, s2l, s0, 1, fn_up, g, mp, hh)
    gu, bu = _affine(b0["norm1"], *_finalize(ssum, ssq,
                                             hh * ww * (c_up // g)))

    fn_uc1 = _up_conv1_fn(up_p, b0, gu, bu, precision, hh)
    ssum, ssq = _stats_pass(cur, n0, s2l, s0, 1, fn_uc1, g, mp, hh)
    g2, b2 = _affine(b0["norm2"], *_finalize(
        ssum, ssq, hh * ww * (fn_uc1.out_c // g)))

    fn_ub = _up_block_fn(up_p, b0, gu, bu, g2, b2, precision, hh)
    buf = jnp.zeros((hh + 2 * _G, ww, fn_ub.out_c), jnp.float32)
    buf, ssum, ssq = _map_pass(cur, buf, n0, s2l, s0, 2, fn_ub, g, mp, hh)
    return buf, _finalize(ssum, ssq, hh * ww * (fn_ub.out_c // g))


@functools.partial(jax.jit, static_argnames=("decoder_cfg", "precision",
                                             "slab_rows"))
def _staged_front_jit(params: Params, latent: jnp.ndarray,
                      decoder_cfg: DecoderConfig, precision: Precision,
                      slab_rows: int):
    """Head + staged levels down through the level-0 junction.  Returns
    the guarded level-0 block-0 output buffer and its moments.  The
    in-place level-0 block passes live in SEPARATE jits with the buffer
    donated: inside one program, XLA inserts a defensive full-buffer
    copy when a while-loop carry's input is also read by the preceding
    stats loop (measured: an 8 GB copy that pushed the 4K program 825 MB
    past HBM); cross-jit donation aliases it instead."""
    from hdrvae.models.decoder import decoder_head, resnet_block
    from hdrvae.models.layers import _group_onehot, _stats_precision

    dcfg = decoder_cfg
    g = dcfg.num_groups
    mp = _stats_precision(precision)
    levels = dcfg.num_levels

    def moments_of(x, c):
        onehot = _group_onehot(c, g)
        n = x.shape[0] * x.shape[1] * (c // g)
        s_, q_ = _gstats(x, onehot, mp)
        return _finalize(s_, q_, n)

    # ---- 1. whole-image head (levels >= 3 at <= 1/4 resolution) ---------
    # The head stops BEFORE level 2's upsample: at 4K-class outputs that
    # whole-image upsample+conv peaks at three 2048^2 x 512ch f32 maps
    # (~25 GB with XLA's layout copy — measured OOM), so level 2's blocks
    # run whole-image at 1024^2-class resolution and its upsample streams
    # through the level-1 junction below.
    u = decoder_head(params, latent, dcfg, precision=precision,
                     tail_levels=min(3, levels))
    if levels >= 3:
        for blk in params["up"][2]["block"]:
            u = resnet_block(u, blk, num_groups=g, precision=precision)
    u = u[0]

    # ---- 2. level 1 ------------------------------------------------------
    lvl1 = params["up"][1]
    if levels >= 3:
        # junction: level-2 upsample + level-1 block 0, streamed
        h2, w2 = u.shape[0], u.shape[1]
        cur, moments = _staged_junction(_guard(u),
                                        params["up"][2]["upsample"],
                                        lvl1["block"][0], h2, w2, g, mp,
                                        precision, slab_rows)
        h1, w1 = 2 * h2, 2 * w2
        rest1 = lvl1["block"][1:]
    else:
        h1, w1 = u.shape[0], u.shape[1]
        moments = moments_of(u, u.shape[-1])
        cur = _guard(u)
        rest1 = lvl1["block"]
    for blk in rest1:
        cur, moments = _staged_sameres_block(cur, blk, moments, h1, w1,
                                             g, mp, precision, slab_rows,
                                             inplace=False)

    # ---- 3. junction (level-1 2x upsample) + level-0 block 0 ------------
    buf, moments = _staged_junction(cur, lvl1["upsample"],
                                    params["up"][0]["block"][0], h1, w1,
                                    g, mp, precision, slab_rows)
    return buf, moments


@functools.partial(jax.jit, static_argnames=("precision", "num_groups",
                                             "slab_rows"))
def _staged_block_stats_jit(buf, blk: Params, moments, precision: Precision,
                            num_groups: int, slab_rows: int):
    """conv1-stats pass of one channel-preserving block: buf is read-only
    here; returns the four folded affines the in-place pass needs."""
    from hdrvae.models.layers import _stats_precision
    g = num_groups
    mp = _stats_precision(precision)
    h, w = buf.shape[0] - 2 * _G, buf.shape[1]
    s, n, _ = _plan_rows(h, slab_rows)
    g1, b1 = _affine(blk["norm1"], *moments)
    fn_s = _block_conv1_fn(blk, g1, b1, precision, h)
    ssum, ssq = _stats_pass(buf, n, s, s, 1, fn_s, g, mp, h)
    g2, b2 = _affine(blk["norm2"], *_finalize(ssum, ssq,
                                              h * w * (fn_s.out_c // g)))
    return g1, b1, g2, b2


@functools.partial(jax.jit, static_argnames=("precision", "num_groups",
                                             "slab_rows"),
                   donate_argnums=(0,))
def _staged_block_inplace_jit(buf, blk: Params, g1, b1, g2, b2,
                              precision: Precision, num_groups: int,
                              slab_rows: int):
    """In-place full pass of one channel-preserving block; ``buf`` is
    DONATED so the rewrite aliases the caller's buffer.  Exact-tiling
    slab plans only (the stash assumes contiguous starts); the driver
    routes ragged heights through :func:`_staged_block_map_jit`."""
    from hdrvae.models.layers import _stats_precision
    g = num_groups
    mp = _stats_precision(precision)
    h, w = buf.shape[0] - 2 * _G, buf.shape[1]
    s, n, ragged = _plan_rows(h, slab_rows)
    assert not ragged, "ragged plans use the map-pass block jit"
    fn_f = _block_full_fn(blk, g1, b1, g2, b2, precision, h)
    assert fn_f.out_c == buf.shape[-1], \
        "in-place blocks must preserve channel width"
    buf, _, ssum, ssq = _inplace_pass(buf, n, s, fn_f, g, mp)
    return buf, _finalize(ssum, ssq, h * w * (fn_f.out_c // g))


@functools.partial(jax.jit, static_argnames=("precision", "num_groups",
                                             "slab_rows"),
                   donate_argnums=(0,))
def _staged_block_map_jit(buf, blk: Params, g1, b1, g2, b2,
                          precision: Precision, num_groups: int,
                          slab_rows: int):
    """Ragged-height variant of the level-0 block pass: writes a fresh
    buffer (two full-resolution buffers live transiently — the memory
    price of an awkward-divisor height; ``buf`` is still donated so it
    frees as soon as the pass completes)."""
    from hdrvae.models.layers import _stats_precision
    g = num_groups
    mp = _stats_precision(precision)
    h, w = buf.shape[0] - 2 * _G, buf.shape[1]
    s, n, _ = _plan_rows(h, slab_rows)
    fn_f = _block_full_fn(blk, g1, b1, g2, b2, precision, h)
    dst = jnp.zeros((h + 2 * _G, w, fn_f.out_c), jnp.float32)
    dst, ssum, ssq = _map_pass(buf, dst, n, s, s, 2, fn_f, g, mp, h)
    return dst, _finalize(ssum, ssq, h * w * (fn_f.out_c // g))


@functools.partial(jax.jit, static_argnames=("decoder_cfg", "cfg",
                                             "precision", "slab_rows"),
                   donate_argnums=(0,))
def _staged_tail_jit(buf, norm_out_p: Params, conv_out_p: Params,
                     moments, latent: jnp.ndarray,
                     decoder_cfg: DecoderConfig, cfg: HDRDecodeConfig,
                     precision: Precision, slab_rows: int, ev):
    """norm_out + SiLU + conv_out + the HDR epilogue, streamed per slab;
    ``buf`` (the level-0 output) is donated — last use."""
    from hdrvae.decode.formatting import collapse_channels_maxpool
    from hdrvae.decode.pipeline import hdr_epilogue_from_parts

    dcfg = decoder_cfg
    hh, ww = buf.shape[0] - 2 * _G, buf.shape[1]
    s0, n0, _ = _plan_rows(hh, slab_rows)

    go, bo = _affine(norm_out_p, *moments)
    want_first3 = cfg.fallback_collapse == "first3"
    rgb = jnp.zeros((hh, ww, 3), jnp.float32)
    pre_c = jnp.zeros((hh, ww, 3), jnp.float32)
    pre3 = jnp.zeros((hh, ww, 3 if want_first3 else 0), jnp.float32)
    big = jnp.asarray(jnp.inf, jnp.float32)

    def tail_body(i, carry):
        rgb, pre_c, pre3, s1a, s2a, mn, mx = carry
        lo = _slab_start(i, s0, hh)
        win = jax.lax.dynamic_slice_in_dim(buf, _G + lo - 1, s0 + 2, 0)
        pre_win = _zero_outside(_silu_affine(win, go, bo), lo - 1, hh)
        y = _conv_hv(pre_win, conv_out_p, precision)
        y = y * dcfg.output_scale + dcfg.output_shift
        if dcfg.output_clamp:
            y = jnp.clip(y, 0.0, 1.0)
        rgb = jax.lax.dynamic_update_slice(rgb, y, (lo, 0, 0))
        pre_own = pre_win[1:-1]
        coll = collapse_channels_maxpool(pre_own[None])[0]
        pre_c = jax.lax.dynamic_update_slice(pre_c, coll, (lo, 0, 0))
        if want_first3:
            pre3 = jax.lax.dynamic_update_slice(pre3, pre_own[..., :3],
                                                (lo, 0, 0))
        # ragged overlap rows rewrite identical values above, but must
        # not double-count in the scalar statistics (min/max are
        # idempotent; the sums are not)
        fresh = _fresh_mask(pre_own, i, s0, lo)
        return (rgb, pre_c, pre3,
                s1a + jnp.sum(fresh), s2a + jnp.sum(jnp.square(fresh)),
                jnp.minimum(mn, jnp.min(pre_own)),
                jnp.maximum(mx, jnp.max(pre_own)))

    rgb, pre_c, pre3, s1a, s2a, mn, mx = jax.lax.fori_loop(
        0, n0, tail_body,
        (rgb, pre_c, pre3, jnp.float32(0), jnp.float32(0), big, -big))

    # float count: at 4096^2 x 128ch this is 2^31 and overflows the i32
    # weak-type path under jit
    n_pre = float(hh) * ww * buf.shape[-1]
    mean = s1a / n_pre
    var = jnp.maximum(s2a / n_pre - jnp.square(mean), 0.0)
    var = var * n_pre / max(n_pre - 1.0, 1.0)      # ddof=1 (torch .std)
    pre_stats = {"min": mn, "max": mx, "mean": mean, "std": jnp.sqrt(var)}

    image, used_fallback, analysis = hdr_epilogue_from_parts(
        rgb[None], pre_c[None], pre_stats, cfg,
        pre3[None] if want_first3 else None, ev)

    from hdrvae.core.stats import hdr_stats
    stats = {
        "input": hdr_stats(latent),
        "pre": analysis.pre_stats,
        "post": analysis.post_stats,
        "norm_kind": analysis.norm_kind,
        "output": hdr_stats(image),
    }
    if cfg.full_analysis:
        # param-derived part only, like the slab executor (the raw pre
        # map is never whole in memory to re-apply conv_out to)
        from hdrvae.core.stats import tensor_stats
        stats["conv_weight"] = tensor_stats(conv_out_p["kernel"])
        stats["conv_bias"] = tensor_stats(conv_out_p["bias"])
    return image, rgb[None], stats, used_fallback


def staged_hdr_decode(params: Params, latent: jnp.ndarray,
                      decoder_cfg: DecoderConfig = DecoderConfig(),
                      cfg: HDRDecodeConfig = HDRDecodeConfig(),
                      precision: Precision = Precision.mixed(),
                      *, slab_rows: int = 128):
    """Contract-tier decode of latents whose whole-image f32 activations
    exceed single-chip HBM (module docstring).  Same result contract as
    :func:`hdrvae.decode.pipeline.hdr_decode`.

    Requirements: batch 1, ``precision.mode == "mixed"`` (parity's
    two-pass centered variance does not decompose into one streamed
    accumulation; fast mode should use the cheaper Pallas lowmem path),
    ``num_levels >= 2``.
    """
    from hdrvae.decode.pipeline import HDRDecodeResult, _split_ev
    if precision.mode != "mixed":
        raise ValueError(
            f"staged decode serves the mixed (contract) tier; got mode="
            f"{precision.mode!r}.  Fast mode uses the Pallas streaming "
            "top level instead (models/pallas_tail.py lowmem).")
    if precision.fast_head_levels != 0:
        raise ValueError("staged decode runs the whole decoder in the "
                         "mixed tier (fast_head_levels must be 0)")
    zc = decoder_cfg.z_channels
    if latent.ndim != 4:
        raise ValueError(f"latent must be 4D, got shape {latent.shape}")
    if latent.shape[-1] != zc:
        if latent.shape[1] == zc:
            latent = jnp.transpose(latent, (0, 2, 3, 1))
        else:
            raise ValueError(
                f"latent shape {latent.shape} has no {zc}-channel axis")
    if latent.shape[0] != 1:
        raise ValueError("staged decode is batch-1 (a 4K-class frame is "
                         "already an HBM-scale workload)")
    if decoder_cfg.num_levels < 2:
        raise ValueError("staged decode needs num_levels >= 2")

    cfg2, ev = _split_ev(cfg)
    g = decoder_cfg.num_groups
    buf, moments = _staged_front_jit(params, latent, decoder_cfg,
                                     precision, slab_rows)
    # level-0 blocks 1..n: one stats jit (read-only) + one DONATING
    # in-place jit per block — both compile once and serve every block
    # (the block params are traced arguments, not closure constants).
    # Ragged heights route through the fresh-buffer map variant.
    _, _, ragged0 = _plan_rows(buf.shape[0] - 2 * _G, slab_rows)
    block_jit = (_staged_block_map_jit if ragged0
                 else _staged_block_inplace_jit)
    for blk in params["up"][0]["block"][1:]:
        affines = _staged_block_stats_jit(buf, blk, moments, precision,
                                          g, slab_rows)
        buf, moments = block_jit(buf, blk, *affines,
                                 precision, g, slab_rows)
    image, rgb, stats, used_fallback = _staged_tail_jit(
        buf, params["norm_out"], params["conv_out"], moments, latent,
        decoder_cfg, cfg2, precision, slab_rows, ev)
    return HDRDecodeResult(image=image,
                           standard=rgb if cfg.keep_standard else None,
                           stats=stats, used_fallback=used_fallback)

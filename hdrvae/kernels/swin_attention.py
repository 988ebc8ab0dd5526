"""Fused window-attention kernel for SwinIR-family models.

PERF_NOTES.md section 5.6: the SwinIR-M 512^2 tile pass is dominated not
by matmuls but by layout traffic — 335 copies (window partition/merge,
qkv/out head transposes) at ~195 ms plus ~100 ms of score-tensor HBM
round trips ([4096 windows, 6, 64, 64] f32 softmax chains).  This kernel
keeps the whole per-window attention — scores, bias+shift mask, softmax,
value matmul — in VMEM, so the score tensor never exists in HBM and the
per-head views come from sliver BlockSpecs instead of transposes.

Layout contract (chosen so no sub-128-lane slicing happens in-kernel —
the Mosaic trap PERF_NOTES sections 3-4 document):

  - The qkv projection is split at trace time into head-major
    ``[head][q|k|v]`` slot weights of 32 lanes each (head_dim 30 ->
    32-pad, `_prep_qkv_weights`), and qkv is carried as a 4-D
    [nwb, H*3, N, 32] array whose SLOT dim sits outside the tiled
    last-two dims: per-(window-block, head) q/k/v blocks are then
    (bwin, 1, N, 32) — the last block dim EQUALS the array dim, which
    Mosaic's lowering requires (a 32-lane sliver over a wider lane
    axis is rejected at lowering; interpret mode never checks this).
    The slot layout is produced directly by per-slot dots in the
    `ln_qkv` prologue — no XLA transpose and no in-kernel lane
    slicing anywhere.  Zero pad columns are exact (q.k adds 0;
    P @ v_pad = 0), and the proj consumes the padded layout with
    per-head partial dots (`_prep_proj_weights`).
  - Windows are processed in PAIRS packed block-diagonally into one
    [2N, 2N] score dot (N=64 tokens at window 8): M=N=128 fills the MXU
    tile, and the off-diagonal cross-window blocks are killed by a -1e9
    additive bias, which the softmax turns into exact zeros.
  - The relative-position bias and the shifted-window masks fold into
    per-class resident tables: class 0 = interior windows, class 1 =
    last-window-row band; the last-column delta is a separate resident
    [2N, 2N] table added under a scalar program-id predicate.  A corner
    window takes row + col masks additively (-200 instead of the
    reference's -100 on doubly-crossing pairs — identical after
    softmax, where any large negative underflows to 0).

Numerics: scores and softmax in float32 (same as the XLA path); the
probability matrix is cast to the compute dtype for the value matmul,
matching `swinir._window_attention` step for step.  The kernel is used
in fast mode only; parity mode keeps the XLA path that the
reference-fidelity suite pins at <=1e-3.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hdrvae.core.config import Precision

Params = Dict[str, Any]

_HDP = 32          # padded head dim (SwinIR-M: 30 -> 32; zero pad exact)
_NEG = -1e9


def _mxu_prec(dt):
    """In-kernel matmul precision.  Mosaic's DEFAULT f32 dot rounds the
    operands through bf16 MXU passes (~0.3% relative — measured on
    chip); request HIGHEST (exact multi-pass) for f32 operands.  bf16
    operands must keep DEFAULT: Mosaic rejects HIGHEST on a bf16 lhs
    ("Bad lhs type"), and bf16 MACs accumulate f32 either way.  Fast
    mode (bf16) is therefore unchanged; the f32 parity drives
    (tpu_checks) get true float32."""
    return (jax.lax.Precision.HIGHEST if jnp.dtype(dt) == jnp.float32
            else jax.lax.Precision.DEFAULT)

# Test seam: force interpret-mode execution of the kernel (CPU suites
# exercise the integrated kernel path without TPU hardware).
_INTERPRET = False


# ---------------------------------------------------------------------------
# Static mask pieces (numpy, trace-time)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _band_masks(ws: int, shift: int) -> Tuple[np.ndarray, np.ndarray]:
    """(mask_row, mask_col): [N, N] additive -100 masks for windows in
    the last window row / column of a shifted grid.

    After the roll by -shift, only windows touching the wrap boundary
    mix regions; within such a window the region label depends only on
    the window-local row (resp. col): local index < ws - shift is the
    pre-wrap band, >= is the wrapped band (`swinir._shift_attn_mask`
    region construction).  A corner window is row + col (see module
    docstring on the -200 equivalence)."""
    n = ws * ws
    loc = np.arange(n)
    r, c = loc // ws, loc % ws
    row_band = (r >= ws - shift).astype(np.int32)
    col_band = (c >= ws - shift).astype(np.int32)
    mrow = np.where(row_band[:, None] != row_band[None, :], -100.0, 0.0)
    mcol = np.where(col_band[:, None] != col_band[None, :], -100.0, 0.0)
    return mrow.astype(np.float32), mcol.astype(np.float32)


def _block_diag2(a: jnp.ndarray) -> jnp.ndarray:
    """[..., N, N] -> [..., 2N, 2N] with -1e9 off-diagonal blocks."""
    neg = jnp.full(a.shape, _NEG, a.dtype)
    top = jnp.concatenate([a, neg], axis=-1)
    bot = jnp.concatenate([neg, a], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


# ---------------------------------------------------------------------------
# Weight preparation (trace-time; folds the layout change into the
# projections so no transposes exist at runtime)
# ---------------------------------------------------------------------------


def _prep_qkv_weights(qkv: Params, heads: int, hd: int,
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[C, 3C] kernel, [3C] bias -> per-slot weights [heads*3, C, 32]
    and biases [heads*3, 1, 32] in head-major [head][q|k|v] slot order,
    32-padded head dim, softmax scale folded into q."""
    c = qkv["kernel"].shape[0]
    scale = hd ** -0.5
    w = qkv["kernel"].reshape(c, 3, heads, hd)
    b = qkv["bias"].reshape(3, heads, hd)
    w = w.at[:, 0].multiply(scale)
    b = b.at[0].multiply(scale)
    w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, _HDP - hd)))
    b = jnp.pad(b, ((0, 0), (0, 0), (0, _HDP - hd)))
    w = w.transpose(2, 1, 0, 3).reshape(heads * 3, c, _HDP)
    b = b.transpose(1, 0, 2).reshape(heads * 3, 1, _HDP)
    return w, b


def _prep_proj_weights(proj: Params, heads: int, hd: int) -> jnp.ndarray:
    """[C, C] kernel -> [heads, 32, C]: per-head row blocks scattered to
    the padded head-major layout (zero rows under the pad lanes)."""
    c = proj["kernel"].shape[1]
    w = proj["kernel"].reshape(heads, hd, c)
    return jnp.pad(w, ((0, 0), (0, _HDP - hd), (0, 0)))


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _attn_core_kernel(q_ref, k_ref, v_ref, b_ref, cm_ref, o_ref, *,
                      bwin: int, n: int, nww: int):
    """Grid (heads, nwb // bwin).  Blocks: q/k/v/o [bwin, 1, n, 32]
    per-slot views of the 4-D slot layout; b_ref [1, 1, 2n, 2n]
    bias(+row mask) table; cm_ref [2n, 2n] last-column delta."""
    wb = pl.program_id(1)
    is_last_col = (((wb + 1) * bwin) % nww == 0)
    bias2 = b_ref[0, 0]
    for i in range(bwin // 2):
        q2 = jnp.concatenate([q_ref[2 * i, 0], q_ref[2 * i + 1, 0]],
                             axis=0)
        k2 = jnp.concatenate([k_ref[2 * i, 0], k_ref[2 * i + 1, 0]],
                             axis=0)
        v2 = jnp.concatenate([v_ref[2 * i, 0], v_ref[2 * i + 1, 0]],
                             axis=0)
        s = jax.lax.dot_general(q2, k2, (((1,), (1,)), ((), ())),
                                precision=_mxu_prec(q2.dtype),
                                preferred_element_type=jnp.float32)
        s = s + bias2
        if i == bwin // 2 - 1:
            # the block's last window may be the grid's last column
            sel = jnp.where(is_last_col, 1.0, 0.0)
            s = s + cm_ref[...] * sel
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).astype(v_ref.dtype)
        o = jax.lax.dot_general(p, v2, (((1,), (0,)), ((), ())),
                                precision=_mxu_prec(p.dtype),
                                preferred_element_type=jnp.float32)
        o = o.astype(o_ref.dtype)
        o_ref[2 * i, 0] = o[:n]
        o_ref[2 * i + 1, 0] = o[n:]


def _attn_core(qkv_r: jnp.ndarray, tables: jnp.ndarray,
               colmask2: jnp.ndarray, *, heads: int, n: int, nwh: int,
               nww: int, bwin: int, shifted: bool,
               interpret: bool = False) -> jnp.ndarray:
    """qkv_r: [nwb, heads*3, n, 32] head-major padded slot qkv (scale
    folded); tables: [ncls, heads, 2n, 2n]; colmask2: [2n, 2n].
    Returns [nwb, heads, n, 32]."""
    nwb = qkv_r.shape[0]

    def row_cls(h, wb):
        if not shifted:
            return 0
        i_row = ((wb * bwin) // nww) % nwh
        return jnp.where(i_row == nwh - 1, 1, 0)

    kern = functools.partial(_attn_core_kernel, bwin=bwin, n=n, nww=nww)
    call = pl.pallas_call(
        kern,
        grid=(heads, nwb // bwin),
        in_specs=[
            pl.BlockSpec((bwin, 1, n, _HDP),
                         lambda h, wb: (wb, 3 * h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bwin, 1, n, _HDP),
                         lambda h, wb: (wb, 3 * h + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bwin, 1, n, _HDP),
                         lambda h, wb: (wb, 3 * h + 2, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * n, 2 * n),
                         lambda h, wb: (row_cls(h, wb), h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * n, 2 * n), lambda h, wb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bwin, 1, n, _HDP),
                               lambda h, wb: (wb, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nwb, heads, n, _HDP),
                                       qkv_r.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * nwb * heads * n * n * _HDP,
            bytes_accessed=2 * qkv_r.size * qkv_r.dtype.itemsize,
            transcendentals=nwb * heads * n * n,
        ),
        name="swin_window_attention",
        interpret=interpret or _INTERPRET,
    )
    return call(qkv_r, qkv_r, qkv_r, tables, colmask2)


# ---------------------------------------------------------------------------
# Companion kernels: fused LN1+qkv prologue and proj+LN2+MLP epilogue
#
# PERF_NOTES 5.6 buckets ~36 ms of LayerNorm and a tail of separate
# elementwise passes per SwinIR pass; XLA does not fuse LN into the
# adjacent projections.  These two kernels bracket the attention core so
# a whole Swin block runs as three Pallas calls on the windows layout —
# every intermediate (LN output, qkv, attention out, MLP hidden) exists
# in HBM at most once, with no layout changes between them.
#
# STATUS: production traffic goes through `swin_block_fused` below
# (the whole block in ONE call, 1.83x XLA vs this chain's 1.36x).
# The 3-kernel chain is deliberately RETAINED as the staged debugging
# tier: when the fused kernel miscompiles on new hardware or a new
# shape class, running the same math as three isolated calls (with
# their own parity tests) localizes which stage lowered wrong — this
# exact bisection is how the fused kernel's Mosaic failures were
# root-caused on the real chip.  Numerics of the stages are
# step-for-step identical to the fused kernel's.
# ---------------------------------------------------------------------------


def _erf_poly(x):
    """Abramowitz & Stegun 7.1.26 erf, |err| <= 1.5e-7.  Pallas TPU has
    no lowering for lax.erf (KernelType.TC: erf), so the exact-GELU
    epilogue uses this polynomial in-kernel; the XLA path keeps true
    erf, and the parity tests bound the difference (<=1e-6 in f32)."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    return s * (1.0 - poly * jnp.exp(-a * a))


def _ln(x32, gamma, beta, eps=1e-5):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


def _ln_qkv_kernel(x_ref, w_ref, b_ref, g_ref, be_ref, o_ref, *,
                   ws: int, bwin: int, n: int, nslots: int, cdt):
    """LN1 -> qkv projection, per window (M=n dots keep Mosaic off the
    outer-dim collapse path).  One dot per [head][q|k|v] slot writes the
    4-D slot layout directly — a single [n, H*3*32] dot would need an
    in-kernel lane-sliced store, which Mosaic rejects; the N=32 dots
    idle MXU lanes but the qkv matmul is ~2% of the pass.

    x_ref is an IMAGE-layout block [1, ws, bwin*ws, C] (one window row
    of bwin windows); the window partition happens in-register — a
    sublane slice at a multiple of ws plus a tile-exact [ws, ws, C] ->
    [n, C] reshape — so the [nwb, n, C] windows array never exists in
    HBM (the partition/merge copies were ~1/5 of the SwinIR-M tile
    pass, PERF_NOTES 5.6)."""
    for w in range(bwin):
        xw = x_ref[0, :, w * ws:(w + 1) * ws, :].reshape(n, -1)
        y = _ln(xw.astype(jnp.float32), g_ref[0], be_ref[0]).astype(cdt)
        for s in range(nslots):
            q = jax.lax.dot_general(y, w_ref[s],
                                    (((1,), (0,)), ((), ())),
                                    precision=_mxu_prec(cdt),
                                    preferred_element_type=jnp.float32)
            o_ref[w, s] = (q + b_ref[s]).astype(o_ref.dtype)


def _proj_mlp_kernel(*refs, ws: int, bwin: int, n: int, heads: int, cdt,
                     has_extra: bool):
    """attention-out -> proj -> +residual (+optional extra residual, the
    HAT CAB branch) -> LN2 -> fc1 -> exact GELU -> fc2 -> +residual.
    The proj is per-head partial dots over the [heads, n, 32] slot
    layout (a single [n, H*32] dot would need an in-kernel lane-sliced
    load of the 4-D core output).  The residual/extra inputs and the
    output are IMAGE-layout blocks [1, ws, bwin*ws, C]; the window
    merge is the in-register inverse of `_ln_qkv_kernel`'s partition."""
    if has_extra:
        (a_ref, x_ref, e_ref, wp_ref, bp_ref, g2_ref, be2_ref,
         w1_ref, b1_ref, w2_ref, b2_ref, o_ref) = refs
    else:
        (a_ref, x_ref, wp_ref, bp_ref, g2_ref, be2_ref,
         w1_ref, b1_ref, w2_ref, b2_ref, o_ref) = refs
        e_ref = None
    for w in range(bwin):
        proj = jax.lax.dot_general(
            a_ref[w, 0].astype(cdt), wp_ref[0],
            (((1,), (0,)), ((), ())),
            precision=_mxu_prec(cdt),
            preferred_element_type=jnp.float32)
        for h in range(1, heads):
            proj = proj + jax.lax.dot_general(
                a_ref[w, h].astype(cdt), wp_ref[h],
                (((1,), (0,)), ((), ())),
                precision=_mxu_prec(cdt),
                preferred_element_type=jnp.float32)
        xw = x_ref[0, :, w * ws:(w + 1) * ws, :].reshape(n, -1)
        x2 = xw.astype(jnp.float32) + proj + bp_ref[0]
        if e_ref is not None:
            ew = e_ref[0, :, w * ws:(w + 1) * ws, :].reshape(n, -1)
            x2 = x2 + ew.astype(jnp.float32)
        y = _ln(x2, g2_ref[0], be2_ref[0]).astype(cdt)
        h = jax.lax.dot_general(y, w1_ref[...].astype(cdt),
                                (((1,), (0,)), ((), ())),
                                precision=_mxu_prec(cdt),
                                preferred_element_type=jnp.float32)
        h = h + b1_ref[0]
        # exact-erf GELU (torch nn.GELU default) via the A&S polynomial
        h = 0.5 * h * (1.0 + _erf_poly(h * (2.0 ** -0.5)))
        out = jax.lax.dot_general(h.astype(cdt), w2_ref[...].astype(cdt),
                                  (((1,), (0,)), ((), ())),
                                  precision=_mxu_prec(cdt),
                                  preferred_element_type=jnp.float32)
        res = (x2 + out + b2_ref[0]).astype(o_ref.dtype)
        o_ref[0, :, w * ws:(w + 1) * ws, :] = res.reshape(ws, ws, -1)


def _resident(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda *_: (0,) * nd,
                        memory_space=pltpu.VMEM)


def ln_qkv(img: jnp.ndarray, p: Params, norm1: Params, heads: int, *,
           ws: int, bwin: int, precision: Precision,
           interpret: bool = False) -> jnp.ndarray:
    """img: [b, h, w, C] RAW feature map (pre-LN, rolled if shifted);
    returns head-major padded slot qkv [b*nwh*nww, heads*3, n, 32] with
    LN1 fused in and the window partition done in-register (no windows
    array in HBM)."""
    b, hh, ww_, c = img.shape
    n = ws * ws
    nwh, nww = hh // ws, ww_ // ws
    nwb = b * nwh * nww
    hd = c // heads
    cdt = precision.compute_dtype
    wq, bq = _prep_qkv_weights(p["qkv"], heads, hd)
    nslots = heads * 3
    ncb = nww // bwin
    call = pl.pallas_call(
        functools.partial(_ln_qkv_kernel, ws=ws, bwin=bwin, n=n,
                          nslots=nslots, cdt=cdt),
        grid=(b * nwh, ncb),
        in_specs=[
            pl.BlockSpec((1, ws, bwin * ws, c),
                         lambda i, j: (i // nwh, i % nwh, j, 0),
                         memory_space=pltpu.VMEM),
            _resident((nslots, c, _HDP)),
            _resident((nslots, 1, _HDP)),
            _resident((1, c)),
            _resident((1, c)),
        ],
        out_specs=pl.BlockSpec((bwin, nslots, n, _HDP),
                               lambda i, j: (i * ncb + j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nwb, nslots, n, _HDP),
                                       precision.storage_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nwb * n * c * heads * 3 * _HDP,
            bytes_accessed=img.size * img.dtype.itemsize * 4,
            transcendentals=0,
        ),
        name="swin_ln_qkv",
        interpret=interpret or _INTERPRET,
    )
    # matmul weights ship pre-cast to the compute dtype (bf16 in fast
    # mode): halves their resident VMEM + HBM traffic vs shipping f32
    # and casting per grid step (biases/LN affines stay f32 — they add
    # into f32 accumulators)
    return call(img, wq.astype(precision.compute_dtype),
                bq.astype(jnp.float32),
                norm1["scale"][None].astype(jnp.float32),
                norm1["bias"][None].astype(jnp.float32))


def proj_mlp(attn_out: jnp.ndarray, img: jnp.ndarray, p: Params,
             norm2: Params, mlp: Params, heads: int, *, ws: int,
             bwin: int, precision: Precision,
             extra: jnp.ndarray | None = None,
             interpret: bool = False) -> jnp.ndarray:
    """attn_out: [nwb, heads, n, 32] padded head-major core output;
    img: the block's RAW input feature map [b, h, w, C] (residual,
    rolled if shifted); ``extra``: an optional additional pre-scaled
    residual in the same image layout (HAT's ``conv_scale * cab``).
    Returns the block's output feature map [b, h, w, C] — the window
    merge happens in-register on the way out."""
    b, hh, ww_, c = img.shape
    n = ws * ws
    nwh, nww = hh // ws, ww_ // ws
    nwb = b * nwh * nww
    ncb = nww // bwin
    hd = c // heads
    cdt = precision.compute_dtype
    wp = _prep_proj_weights(p["proj"], heads, hd)
    hidden = mlp["fc1"]["kernel"].shape[1]
    img_spec = pl.BlockSpec((1, ws, bwin * ws, c),
                            lambda i, j: (i // nwh, i % nwh, j, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((bwin, heads, n, _HDP),
                     lambda i, j: (i * ncb + j, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        img_spec,
    ]
    args = [attn_out, img]
    if extra is not None:
        in_specs.append(img_spec)
        args.append(extra)
    in_specs += [
        _resident((heads, _HDP, c)),
        _resident((1, c)),
        _resident((1, c)),
        _resident((1, c)),
        _resident((c, hidden)),
        _resident((1, hidden)),
        _resident((hidden, c)),
        _resident((1, c)),
    ]
    # matmul weights pre-cast to compute dtype (see ln_qkv)
    args += [wp.astype(cdt),
             p["proj"]["bias"][None].astype(jnp.float32),
             norm2["scale"][None].astype(jnp.float32),
             norm2["bias"][None].astype(jnp.float32),
             mlp["fc1"]["kernel"].astype(cdt),
             mlp["fc1"]["bias"][None].astype(jnp.float32),
             mlp["fc2"]["kernel"].astype(cdt),
             mlp["fc2"]["bias"][None].astype(jnp.float32)]
    call = pl.pallas_call(
        functools.partial(_proj_mlp_kernel, ws=ws, bwin=bwin, n=n,
                          heads=heads, cdt=cdt,
                          has_extra=extra is not None),
        grid=(b * nwh, ncb),
        in_specs=in_specs,
        out_specs=img_spec,
        out_shape=jax.ShapeDtypeStruct((b, hh, ww_, c),
                                       precision.storage_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nwb * n * c * (heads * _HDP + 2 * hidden),
            bytes_accessed=img.size * img.dtype.itemsize * 4,
            transcendentals=nwb * n * hidden,
        ),
        name="swin_proj_mlp",
        interpret=interpret or _INTERPRET,
    )
    return call(*args)


# ---------------------------------------------------------------------------
# Single-kernel Swin block: LN1 + qkv + window attention + proj + LN2 +
# MLP in ONE pallas_call.
#
# The 3-kernel chain above still round-trips two intermediates through
# HBM per block: the slot qkv ([nwb, 3H, n, 32] — 3x the feature map)
# and the core output ([nwb, H, n, 32]), plus a second read of the
# feature map as the epilogue residual.  At SwinIR-M 512^2 that is
# ~900 MB of avoidable HBM traffic per block x 36 blocks.  Windows are
# independent, every weight fits VMEM resident, and one window block's
# whole live set is <2 MB — so the entire block body runs per grid
# step with nothing but the feature map crossing HBM.  Numerics are
# step-for-step the 3-kernel chain's (same slot layout, pair-packed
# score dots, f32 softmax, storage-dtype handoffs where the chain had
# HBM round trips).
# ---------------------------------------------------------------------------


def _block_fused_kernel(*refs, ws: int, bwin: int, n: int, heads: int,
                        nwh: int, ncb: int, cdt, sdt, shifted: bool,
                        has_extra: bool, post_norm: bool = False,
                        cosine: bool = False):
    """Grid (b*nwh, nww//bwin): one window row of bwin windows per
    step, image-layout blocks in and out (see `_ln_qkv_kernel` for the
    in-register partition).

    ``post_norm``/``cosine`` select the SwinV2 block (Swin2SR): qkv runs
    on the RAW input and norm1/norm2 move to the branch outputs
    (res-post-norm); q/k rows are L2-normalized after the bias add and
    q carries the clamped-exp logit scale (shipped broadcast to the
    padded slot lanes as ``qs_ref`` — zero pad lanes keep the row norm
    exact).  The score core, softmax, value dot, and proj are shared
    with v1; the v2 CPB bias arrives pre-baked in the same tables."""
    it = iter(refs)
    x_ref = next(it)                      # [1, ws, bwin*ws, C]
    e_ref = next(it) if has_extra else None
    wq_ref = next(it)                     # [3H, C, 32]
    bq_ref = next(it)                     # [3H, 1, 32]
    qs_ref = next(it) if cosine else None  # [H, 1, 32] q-slot scales
    g1_ref = next(it)                     # [1, C]
    be1_ref = next(it)
    tab_ref = next(it)                    # [ncls, H, 2n, 2n] f32
    cm_ref = next(it)                     # [2n, 2n] f32
    wp_ref = next(it)                     # [H, 32, C]
    bp_ref = next(it)                     # [1, C]
    g2_ref = next(it)
    be2_ref = next(it)
    w1_ref = next(it)                     # [C, hidden]
    b1_ref = next(it)                     # [1, hidden]
    w2_ref = next(it)                     # [hidden, C]
    b2_ref = next(it)                     # [1, C]
    o_ref = next(it)                      # [1, ws, bwin*ws, C]

    i = pl.program_id(0)
    j = pl.program_id(1)
    nslots = heads * 3

    # LN1 (v1) + per-slot qkv dots (slot layout lives in registers only)
    xws = []
    qkv = []
    for w in range(bwin):
        xw = x_ref[0, :, w * ws:(w + 1) * ws, :].reshape(n, -1)
        xws.append(xw)
        if post_norm:
            y = xw.astype(cdt)            # v2: attention on the raw input
        else:
            y = _ln(xw.astype(jnp.float32), g1_ref[0],
                    be1_ref[0]).astype(cdt)
        slots = []
        for s in range(nslots):
            q = jax.lax.dot_general(y, wq_ref[s],
                                    (((1,), (0,)), ((), ())),
                                    precision=_mxu_prec(cdt),
                                    preferred_element_type=jnp.float32)
            q = q + bq_ref[s]
            if cosine and s % 3 != 2:     # normalize q and k rows (f32)
                norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
                q = q / jnp.maximum(norm, 1e-12)
                if s % 3 == 0:
                    q = q * qs_ref[s // 3]
            slots.append(q.astype(sdt))
        qkv.append(slots)

    # attention core (scores never leave registers).  Windows with
    # n < 128 tokens are packed in PAIRS into block-diagonal [2n, 2n]
    # score dots to fill the MXU tile (the chain kernel's layout);
    # n >= 128 windows fill it alone and run unpaired — their
    # block-diag tables would also be 4x [n, n] and push the resident
    # table past VMEM at HAT's window 16 ([2, 6, 512, 512] f32 =
    # 12.6 MB).
    if shifted:
        cls = jnp.where(i % nwh == nwh - 1, 1, 0)
    else:
        cls = 0
    paired = n < 128
    outs = [[None] * heads for _ in range(bwin)]
    if paired:
        for pair in range(bwin // 2):
            wa, wb_ = 2 * pair, 2 * pair + 1
            for h in range(heads):
                q2 = jnp.concatenate([qkv[wa][3 * h], qkv[wb_][3 * h]],
                                     axis=0)
                k2 = jnp.concatenate([qkv[wa][3 * h + 1],
                                      qkv[wb_][3 * h + 1]], axis=0)
                v2 = jnp.concatenate([qkv[wa][3 * h + 2],
                                      qkv[wb_][3 * h + 2]], axis=0)
                s = jax.lax.dot_general(q2, k2,
                                        (((1,), (1,)), ((), ())),
                                        precision=_mxu_prec(q2.dtype),
                                        preferred_element_type=jnp.float32)
                s = s + tab_ref[cls, h]
                if pair == bwin // 2 - 1:
                    # the block's last window may be the grid's last col
                    sel = jnp.where(j == ncb - 1, 1.0, 0.0)
                    s = s + cm_ref[...] * sel
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                l = jnp.sum(p, axis=-1, keepdims=True)
                p = (p / l).astype(v2.dtype)
                o = jax.lax.dot_general(p, v2, (((1,), (0,)), ((), ())),
                                        precision=_mxu_prec(p.dtype),
                                        preferred_element_type=jnp.float32)
                o = o.astype(sdt)
                outs[wa][h] = o[:n]
                outs[wb_][h] = o[n:]
    else:
        for w in range(bwin):
            for h in range(heads):
                s = jax.lax.dot_general(qkv[w][3 * h], qkv[w][3 * h + 1],
                                        (((1,), (1,)), ((), ())),
                                        precision=_mxu_prec(qkv[w][3 * h].dtype),
                                        preferred_element_type=jnp.float32)
                s = s + tab_ref[cls, h]
                if w == bwin - 1:
                    sel = jnp.where(j == ncb - 1, 1.0, 0.0)
                    s = s + cm_ref[...] * sel
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                l = jnp.sum(p, axis=-1, keepdims=True)
                p = (p / l).astype(qkv[w][3 * h + 2].dtype)
                o = jax.lax.dot_general(p, qkv[w][3 * h + 2],
                                        (((1,), (0,)), ((), ())),
                                        precision=_mxu_prec(p.dtype),
                                        preferred_element_type=jnp.float32)
                outs[w][h] = o.astype(sdt)

    # proj + residual(s) + LN2 + MLP epilogue, per window.  v2
    # (post_norm) applies norm1 to the attention branch and norm2 to
    # the MLP branch before their residual adds.
    for w in range(bwin):
        proj = jax.lax.dot_general(outs[w][0].astype(cdt), wp_ref[0],
                                   (((1,), (0,)), ((), ())),
                                   precision=_mxu_prec(cdt),
                                   preferred_element_type=jnp.float32)
        for h in range(1, heads):
            proj = proj + jax.lax.dot_general(
                outs[w][h].astype(cdt), wp_ref[h],
                (((1,), (0,)), ((), ())),
                precision=_mxu_prec(cdt),
                preferred_element_type=jnp.float32)
        if post_norm:
            x2 = xws[w].astype(jnp.float32) + _ln(
                proj + bp_ref[0], g1_ref[0], be1_ref[0])
        else:
            x2 = xws[w].astype(jnp.float32) + proj + bp_ref[0]
        if e_ref is not None:
            ew = e_ref[0, :, w * ws:(w + 1) * ws, :].reshape(n, -1)
            x2 = x2 + ew.astype(jnp.float32)
        y = x2.astype(cdt) if post_norm else \
            _ln(x2, g2_ref[0], be2_ref[0]).astype(cdt)
        h1 = jax.lax.dot_general(y, w1_ref[...].astype(cdt),
                                 (((1,), (0,)), ((), ())),
                                 precision=_mxu_prec(cdt),
                                 preferred_element_type=jnp.float32)
        h1 = h1 + b1_ref[0]
        h1 = 0.5 * h1 * (1.0 + _erf_poly(h1 * (2.0 ** -0.5)))
        out = jax.lax.dot_general(h1.astype(cdt),
                                  w2_ref[...].astype(cdt),
                                  (((1,), (0,)), ((), ())),
                                  precision=_mxu_prec(cdt),
                                  preferred_element_type=jnp.float32)
        if post_norm:
            res = (x2 + _ln(out + b2_ref[0], g2_ref[0],
                            be2_ref[0])).astype(o_ref.dtype)
        else:
            res = (x2 + out + b2_ref[0]).astype(o_ref.dtype)
        o_ref[0, :, w * ws:(w + 1) * ws, :] = res.reshape(ws, ws, -1)


def swin_block_fused(img: jnp.ndarray, p: Params, norm1: Params,
                     norm2: Params, mlp: Params, heads: int, *,
                     ws: int, shift: int, bias_hnn: jnp.ndarray,
                     bwin: int, precision: Precision,
                     extra: jnp.ndarray | None = None,
                     post_norm: bool = False,
                     qk_scale: jnp.ndarray | None = None,
                     interpret: bool = False) -> jnp.ndarray:
    """One whole Swin block (LN1 -> window attention -> proj +
    residual [+ extra] -> LN2 -> MLP -> + residual) as a single Pallas
    call on the image layout.  ``img`` must already be rolled if
    ``shift`` (the shift only selects the mask tables here).

    ``post_norm=True`` + ``qk_scale`` ([heads] f32 clamped-exp logit
    scales) select the SwinV2 block body (Swin2SR): cosine attention
    with the scale folded into the normalized q, norm1/norm2 applied to
    the branch outputs; ``bias_hnn`` then carries the CPB-MLP bias
    (input-independent, so it bakes into the same resident tables)."""
    b, hh, ww_, c = img.shape
    n = ws * ws
    nwh, nww = hh // ws, ww_ // ws
    nwb = b * nwh * nww
    ncb = nww // bwin
    hd = c // heads
    cdt = precision.compute_dtype
    sdt = precision.storage_dtype
    wq, bq = _prep_qkv_weights(p["qkv"], heads, hd)
    wp = _prep_proj_weights(p["proj"], heads, hd)
    if n < 128:
        tables, colmask2 = build_bias_tables(bias_hnn, ws, shift, n)
    else:
        tables, colmask2 = build_bias_tables_unpaired(bias_hnn, ws,
                                                      shift, n)
    hidden = mlp["fc1"]["kernel"].shape[1]
    img_spec = pl.BlockSpec((1, ws, bwin * ws, c),
                            lambda i, j: (i // nwh, i % nwh, j, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [img_spec]
    args: list = [img]
    if extra is not None:
        in_specs.append(img_spec)
        args.append(extra)
    in_specs += [
        _resident((heads * 3, c, _HDP)),
        _resident((heads * 3, 1, _HDP)),
    ]
    args2 = [wq.astype(cdt), bq.astype(jnp.float32)]
    if qk_scale is not None:
        # q-slot scales broadcast across the padded lanes: [H, 1, 32]
        in_specs.append(_resident((heads, 1, _HDP)))
        args2.append(jnp.broadcast_to(
            qk_scale.astype(jnp.float32).reshape(heads, 1, 1),
            (heads, 1, _HDP)))
    in_specs += [
        _resident((1, c)),
        _resident((1, c)),
        _resident(tuple(tables.shape)),
        _resident(tuple(colmask2.shape)),
        _resident((heads, _HDP, c)),
        _resident((1, c)),
        _resident((1, c)),
        _resident((1, c)),
        _resident((c, hidden)),
        _resident((1, hidden)),
        _resident((hidden, c)),
        _resident((1, c)),
    ]
    args += args2 + [
        norm1["scale"][None].astype(jnp.float32),
        norm1["bias"][None].astype(jnp.float32),
        tables, colmask2,
        wp.astype(cdt),
        p["proj"]["bias"][None].astype(jnp.float32),
        norm2["scale"][None].astype(jnp.float32),
        norm2["bias"][None].astype(jnp.float32),
        mlp["fc1"]["kernel"].astype(cdt),
        mlp["fc1"]["bias"][None].astype(jnp.float32),
        mlp["fc2"]["kernel"].astype(cdt),
        mlp["fc2"]["bias"][None].astype(jnp.float32)]
    call = pl.pallas_call(
        functools.partial(_block_fused_kernel, ws=ws, bwin=bwin, n=n,
                          heads=heads, nwh=nwh, ncb=ncb, cdt=cdt,
                          sdt=sdt, shifted=bool(shift),
                          has_extra=extra is not None,
                          post_norm=post_norm,
                          cosine=qk_scale is not None),
        grid=(b * nwh, ncb),
        in_specs=in_specs,
        out_specs=img_spec,
        out_shape=jax.ShapeDtypeStruct((b, hh, ww_, c), sdt),
        cost_estimate=pl.CostEstimate(
            flops=(4 * nwb * heads * n * n * _HDP
                   + 2 * nwb * n * c * (heads * 4 * _HDP + 2 * hidden)),
            bytes_accessed=2 * img.size * img.dtype.itemsize,
            transcendentals=nwb * n * (heads * n + hidden),
        ),
        name="swin_block_fused",
        interpret=interpret or _INTERPRET,
    )
    return call(*args)


# ---------------------------------------------------------------------------
# Public entry: full window attention (qkv linear -> core -> proj)
# ---------------------------------------------------------------------------


def build_bias_tables(bias_hnn: jnp.ndarray, ws: int, shift: int,
                      n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(tables [ncls, H, 2n, 2n], colmask2 [2n, 2n]) for the attention
    core: block-diagonal bias with -1e9 off blocks; shifted grids add a
    last-row class and a last-column delta (module docstring)."""
    bias2 = _block_diag2(bias_hnn)                 # [H, 2n, 2n]
    if shift:
        mrow, mcol = _band_masks(ws, shift)
        tables = jnp.stack([bias2,
                            _block_diag2(bias_hnn + jnp.asarray(mrow))])
        colmask2 = jnp.zeros((2 * n, 2 * n), jnp.float32)
        colmask2 = colmask2.at[n:, n:].set(jnp.asarray(mcol))
    else:
        tables = bias2[None]
        colmask2 = jnp.zeros((2 * n, 2 * n), jnp.float32)
    return tables, colmask2


def build_bias_tables_unpaired(bias_hnn: jnp.ndarray, ws: int,
                               shift: int, n: int
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(tables [ncls, H, n, n], colmask [n, n]) for the UNPAIRED
    attention core of `swin_block_fused` (windows with n >= 128 tokens
    fill the MXU alone): class 0 = interior, class 1 = last window
    row; the last-column mask is a per-window additive delta."""
    if shift:
        mrow, mcol = _band_masks(ws, shift)
        tables = jnp.stack([bias_hnn, bias_hnn + jnp.asarray(mrow)])
        colmask = jnp.asarray(mcol)
    else:
        tables = bias_hnn[None]
        colmask = jnp.zeros((n, n), jnp.float32)
    return tables, colmask


def pick_bwin(nww: int, n: int = 64) -> int:
    """Largest supported windows-per-block that divides the window-grid
    width (keeps every block within one window row, pairs within the
    block) while bounding the block's VMEM token count (HAT's window 16
    has N=256 tokens/window — 4x SwinIR's).  0 means the kernel path
    cannot run (odd grid width)."""
    for b in (8, 4, 2):
        if b * n <= 512 and nww % b == 0:
            return b
    return 0


def swin_window_attention(wins: jnp.ndarray, p: Params, heads: int,
                          ws: int, grid_hw: Tuple[int, int], shift: int,
                          bias_hnn: jnp.ndarray, *,
                          precision: Precision,
                          interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for `swinir._window_attention` on the kernel
    path: wins [nwb, N, C] post-LN windows in (batch, row, col) order;
    bias_hnn [heads, N, N] gathered relative-position bias.  Returns
    [nwb, N, C] (proj applied)."""
    nwb, n, c = wins.shape
    hd = c // heads
    h_img, w_img = grid_hw
    nwh, nww = h_img // ws, w_img // ws
    bwin = pick_bwin(nww, n)
    dtype = precision.compute_dtype

    wq, bq = _prep_qkv_weights(p["qkv"], heads, hd)
    qkv_r = jnp.einsum("wnc,scd->wsnd", wins.astype(dtype),
                       wq.astype(dtype),
                       preferred_element_type=jnp.float32)
    qkv_r = (qkv_r + bq[None].astype(jnp.float32)).astype(
        precision.storage_dtype)

    tables, colmask2 = build_bias_tables(bias_hnn, ws, shift, n)

    out = _attn_core(qkv_r, tables, colmask2, heads=heads, n=n, nwh=nwh,
                     nww=nww, bwin=bwin, shifted=bool(shift),
                     interpret=interpret)

    wp = _prep_proj_weights(p["proj"], heads, hd)
    y = jnp.einsum("whnd,hdc->wnc", out.astype(dtype), wp.astype(dtype),
                   preferred_element_type=jnp.float32)
    y = y + p["proj"]["bias"].astype(jnp.float32)
    return y.astype(precision.storage_dtype)


def use_swin_kernel(precision: Precision, h_img: int, w_img: int,
                    ws: int, head_dim: int = _HDP) -> bool:
    """Kernel-path gate: TPU fast mode with an even window-grid width
    and head_dim <= the kernel's padded width (_prep_qkv_weights pads
    heads to 32 lanes; a wider checkpoint must fall back to XLA, not
    crash with a negative pad).  Parity mode keeps the XLA path (the
    reference-fidelity contract).  `precision.swin_attn` forces either
    executor ("xla" / "pallas")."""
    knob = getattr(precision, "swin_attn", "auto")
    if knob == "xla":
        return False
    n = ws * ws
    # score-dot lane alignment: paired cores dot [2n, 2n], unpaired
    # [n, n] — the kernel's head views are 32-lane slivers, so the score
    # width must be a multiple of 32 (validated: 2n=32/128, n=256).
    # Window sizes that misalign (e.g. Swin2SR JPEG-CAR's window 7,
    # n=49, paired dot 98 lanes) take the XLA path rather than feed
    # Mosaic register shapes it was never validated on.
    aligned = (2 * n) % 32 == 0 if n < 128 else n % 128 == 0
    ok = (h_img % ws == 0 and w_img % ws == 0 and head_dim <= _HDP
          and aligned and pick_bwin(w_img // ws, n) > 0)
    if knob == "pallas":
        assert ok, (
            f"swin_attn='pallas' but the {h_img}x{w_img} grid (window "
            f"{ws}, head_dim {head_dim}) is unsupported by the kernel")
        return True
    return (precision.mode == "fast" and jax.default_backend() == "tpu"
            and ok)

"""VMEM-resident cross-attention core for HAT's OCAB.

OCAB (Overlapping Cross-Attention Block, reference reversal map names
HAT at `/root/reference/hdr_upscale_with_model.py:266-279`) attends
ws^2 query tokens per window to wse^2 = (ws * (1 + overlap))^2 key
tokens from an overlapping unfold.  The XLA einsum path materialises
the score tensor [nwb, heads, nq, nk] in HBM twice (logits + softmax
probabilities) — ~0.9 GB each way for a 256^2 tile at HAT-M's window
16.  This kernel computes one (window, head) per grid step with the
scores resident in VMEM, so the score tensor never exists in HBM; the
relative-position bias table rides along as a resident [heads, nq, nk]
block indexed by the head grid axis.

The q/k/v layout work (LN, qkv linear, window partition, overlap
unfold, head split with the 32-lane pad) stays in XLA: OCAB is one
block per residual group (vs six HABs), so its layout traffic is a
small fraction of what the fused Swin-block kernel already removed —
the HBM score round trip is the part worth a kernel.

Numerics match `hat._ocab` step for step: scores and softmax in
float32, probabilities cast to the compute dtype for the value matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HDP = 32  # padded head dim (HAT-M: 30 -> 32; zero pad is exact)

# Test seam: force interpret-mode execution (CPU suites).  The Swin
# family seam (`swin_attention._INTERPRET`) is honoured too, so a test
# flipping the one seam covers every kernel a HAT forward reaches.
_INTERPRET = False


def _interpret_forced() -> bool:
    from hdrvae.kernels import swin_attention as _ska
    return _INTERPRET or _ska._INTERPRET


# VMEM bound for the resident [nq, nk] f32 blocks (scores in registers
# plus the double-buffered bias): HAT-M's window 16 (nq=256, nk=576,
# ~0.6 MB each) is the validated shape; a window-32 variant (nq=1024,
# nk=2304, ~9.4 MB each) would blow the 16 MB scoped-VMEM budget at
# Mosaic compile time, so the gate falls back to XLA above this cap.
_MAX_SCORE_ELEMS = 4 * 256 * 576


def use_ocab_kernel(precision, head_dim: int, nq: int = 0,
                    nk: int = 0) -> bool:
    """Kernel-path gate, mirroring `use_swin_kernel`: fast mode on TPU
    with head_dim <= the 32-lane pad and the score/bias blocks inside
    the VMEM budget (`_MAX_SCORE_ELEMS`); `precision.swin_attn` forces
    either executor (the knob governs the whole Swin/HAT kernel
    family).  OCAB has no window-grid divisibility constraint — the
    core consumes already-partitioned windows."""
    knob = getattr(precision, "swin_attn", "auto")
    if knob == "xla":
        return False
    ok = head_dim <= _HDP and nq * nk <= _MAX_SCORE_ELEMS
    if knob == "pallas":
        assert ok, (
            f"swin_attn='pallas' but OCAB shape is unsupported "
            f"(head_dim {head_dim} > {_HDP} or nq*nk {nq * nk} > "
            f"{_MAX_SCORE_ELEMS})")
        return True
    return (precision.mode == "fast" and jax.default_backend() == "tpu"
            and ok)


def _ocab_core_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, cdt):
    from hdrvae.kernels.swin_attention import _mxu_prec
    q = q_ref[0, 0]                                      # [nq, 32]
    k = k_ref[0, 0]                                      # [nk, 32]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            precision=_mxu_prec(q.dtype),
                            preferred_element_type=jnp.float32)
    s = s + b_ref[0]                                     # [nq, nk]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(cdt)
    o = jax.lax.dot_general(p, v.astype(cdt), (((1,), (0,)), ((), ())),
                            precision=_mxu_prec(cdt),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def ocab_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   bias_hqk: jnp.ndarray, *, compute_dtype,
                   storage_dtype, interpret: bool = False) -> jnp.ndarray:
    """Cross attention with additive bias, scores resident in VMEM.

    q: [nwb, heads, nq, 32] (scale already folded in), k/v:
    [nwb, heads, nk, 32] (head dim zero-padded to 32 — exact: q.k adds
    0 and P @ v_pad = 0), bias_hqk: [heads, nq, nk] float32.  Returns
    [nwb, heads, nq, 32] in ``storage_dtype``.
    """
    nwb, heads, nq, hdp = q.shape
    nk = k.shape[2]
    # heads is the OUTER grid axis so the [nq, nk] bias block's index
    # map is constant across the inner window sweep — Pallas fetches it
    # once per head, not once per step (at HAT-M 256^2 the difference
    # is ~3.5 MB vs ~900 MB of bias DMA per OCAB call).
    blk = lambda n: pl.BlockSpec((1, 1, n, hdp),
                                 lambda h, i: (i, h, 0, 0),
                                 memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, nq, nk), lambda h, i: (h, 0, 0),
                             memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_ocab_core_kernel, cdt=compute_dtype),
        grid=(heads, nwb),
        in_specs=[blk(nq), blk(nk), blk(nk), bias_spec],
        out_specs=blk(nq),
        out_shape=jax.ShapeDtypeStruct((nwb, heads, nq, hdp),
                                       storage_dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * nwb * heads * nq * nk * hdp,
            bytes_accessed=(q.size * q.dtype.itemsize
                            + 2 * k.size * k.dtype.itemsize
                            + q.size * jnp.dtype(storage_dtype).itemsize),
            transcendentals=nwb * heads * nq * nk,
        ),
        name="ocab_attention",
        interpret=interpret or _interpret_forced(),
    )
    return call(q.astype(compute_dtype), k.astype(compute_dtype),
                v.astype(compute_dtype), bias_hqk.astype(jnp.float32))

"""Spatial self-attention for the decoder mid block.

The reference SKIPS this attention in its bypass paths to dodge hangs
(`hdr_vae_decode.py:514,1287-1288`); the rebuild runs it correctly
(SURVEY.md section 5, long-context row).  At 2K output the mid block sees a
64x64 latent grid -> 4096 tokens of width 512; at 4K it is 16384 tokens,
where the O(N^2) score matrix (16384^2 f32 = 1 GiB) forces a flash-style
streaming kernel.

Two implementations:
  - ``spatial_attention_xla``: plain jnp einsum path; XLA tiles the matmuls
    onto the MXU.  Reference implementation; used on non-TPU backends and
    for small grids.
  - ``spatial_attention_pallas``: blocked flash-attention Pallas kernel with
    online softmax; O(N) memory.  Selected automatically on TPU for large N.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hdrvae.core.config import Precision

# Token count at/above which the pallas streaming kernel is used on TPU.
_PALLAS_MIN_TOKENS = 4096
_BLOCK_Q = 512
_BLOCK_K = 512


def _matmul_precision(precision: Precision):
    if precision.mode == "parity":
        return jax.lax.Precision.HIGHEST
    if precision.mode == "mixed":
        return jax.lax.Precision.HIGH
    return jax.lax.Precision.DEFAULT


def _dot3(a, b, dims):
    """3-pass bf16x3 dot (what jax.lax.Precision.HIGH does on the MXU),
    built from DEFAULT bf16 passes Mosaic can lower: each f32 operand
    splits into a bf16 hi part and a bf16 residual, and the three
    significant cross terms accumulate in f32 (~1e-6 relative — the
    mixed tier's contraction class).  The ah*bl/al*bh terms are the
    correction; al*bl is below f32 rounding and skipped, like HIGH."""
    def split(x):
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    ah, al = split(a)
    bh, bl = split(b)

    def d(x, y):
        return jax.lax.dot_general(
            x, y, dims, precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)

    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _as_dot_precision(precise) -> jax.lax.Precision:
    """``precise`` flag -> MXU dot precision.  Accepts the legacy bool
    (True == parity HIGHEST) or an explicit jax.lax.Precision (the mixed
    tier passes HIGH).  HIGH is remapped to HIGHEST here — Mosaic rejects
    HIGH dots ("Unsupported dot precision") — so the public kernel entry
    points are safe for any caller, not just the remapping wrapper in
    spatial_attention."""
    if isinstance(precise, jax.lax.Precision):
        if precise == jax.lax.Precision.HIGH:
            return jax.lax.Precision.HIGHEST
        return precise
    return (jax.lax.Precision.HIGHEST if precise
            else jax.lax.Precision.DEFAULT)


def spatial_attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                          precision: Precision = Precision(),
                          key_valid: jnp.ndarray | None = None
                          ) -> jnp.ndarray:
    """Single-head attention over flattened spatial dims.

    q, k, v: [B, H, W, C] -> output [B, H, W, C].  ``key_valid`` ([H, W]
    bool) masks invalid keys out of the softmax (shape-bucketed pad
    exclusion).
    """
    b, h, w, c = q.shape
    n = h * w
    scale = c ** -0.5
    qf = q.reshape(b, n, c).astype(jnp.float32)
    kf = k.reshape(b, n, c).astype(jnp.float32)
    vf = v.reshape(b, n, c).astype(jnp.float32)
    logits = jnp.einsum("bqc,bkc->bqk", qf * scale, kf,
                        precision=_matmul_precision(precision))
    if key_valid is not None:
        bias = jnp.where(key_valid.reshape(n), 0.0, -1e12)
        logits = logits + bias[None, None, :]
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bqk,bkc->bqc", weights, vf,
                     precision=_matmul_precision(precision))
    return out.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# Pallas flash attention (single head, no mask, no bias)
# ---------------------------------------------------------------------------


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                  scale: float, precise):
    """Grid (num_q, num_kv): Q block i against KV block j, online softmax
    carried in VMEM scratch across the j dimension.

    Only one (block_q, C) Q tile and one (block_k, C) K/V tile are resident
    in VMEM at a time — K/V stream through the Pallas pipeline instead of
    being materialized whole (a 16K-token mid block would need 2x32 MB of
    VMEM otherwise, over the ~16 MB budget)."""
    j = pl.program_id(1)
    n_kv = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[...].astype(jnp.float32) * scale
    k_blk = k_ref[...].astype(jnp.float32)
    v_blk = v_ref[...].astype(jnp.float32)
    # Mosaic honors matmul precision: HIGHEST gives true-f32 MXU passes
    # (measured 1e-7 rel) for the parity contract; DEFAULT is the fast
    # path.  HIGH (the mixed tier) is rejected by Mosaic, so it runs as
    # a MANUAL bf16x3 decomposition (_dot3): hi/lo splits + three
    # DEFAULT bf16 passes with f32 accumulation — the same arithmetic
    # XLA's HIGH performs, at half the cost of the 6-pass HIGHEST this
    # kernel used for mixed before round 5 (the mid attention at a 4K
    # latent is 262k tokens = 140 TFLOP; HIGHEST priced it at 4.4 s of
    # the staged decode).  Unlike an XLA-level manual split, Mosaic does
    # not algebraically fold the convert pairs (verified on chip: error
    # stays 1e-6-class, not 1-pass bf16's 1e-2).
    if precise == jax.lax.Precision.HIGH:
        s = _dot3(q, k_blk, (((1,), (1,)), ((), ())))
    else:
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                precision=_as_dot_precision(precise),
                                preferred_element_type=jnp.float32)
    m_prev = m_ref[...]
    l_prev = l_ref[...]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    if precise == jax.lax.Precision.HIGH:
        pv = _dot3(p, v_blk, (((1,), (0,)), ((), ())))
    else:
        pv = jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            precision=_as_dot_precision(precise),
            preferred_element_type=jnp.float32)
    acc_new = acc_ref[...] * alpha + pv
    acc_ref[...] = acc_new
    m_ref[...] = m_new
    l_ref[...] = l_new

    @pl.when(j == n_kv - 1)
    def _finalize():
        o_ref[...] = acc_ref[...] / l_ref[...]


def _flash_attention_2d(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                        scale: float, block_q: int, block_k: int,
                        precise=False) -> jnp.ndarray:
    """q, k: [N, Cqk]; v: [N, Cv]; N divisible by block sizes."""
    n, c_qk = q.shape
    c_v = v.shape[1]
    grid = (n // block_q, n // block_k)
    kernel = functools.partial(_flash_kernel, scale=scale, precise=precise)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, c_qk), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, c_qk), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, c_v), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_q, c_v), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c_v), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_q, c_v), jnp.float32),   # acc
            pltpu.VMEM((block_q, 1), jnp.float32),     # running max
            pltpu.VMEM((block_q, 1), jnp.float32),     # running sum
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * n * n * c_qk,
            bytes_accessed=4 * n * (2 * c_qk + 2 * c_v),
            transcendentals=n * n,
        ),
    )(q, k, v)


def spatial_attention_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                             *, block_q: int = _BLOCK_Q,
                             block_k: int = _BLOCK_K,
                             precise=False,
                             interpret: bool = False,
                             key_valid: jnp.ndarray | None = None
                             ) -> jnp.ndarray:
    """Flash attention over flattened spatial dims; [B,H,W,C] -> [B,H,W,C].

    N is padded up to a block multiple.  Padded keys — and keys masked by
    ``key_valid`` ([H, W] bool, shape-bucketed pad exclusion) — are
    neutralized by an extra bias feature: Q gains a constant-one channel
    and K a channel that is 0 for live keys and a large negative constant
    for dead ones, so dead scores underflow to zero weight after softmax.
    The softmax scale stays the true ``C**-0.5`` (passed explicitly; the
    extra channel does not change it).
    """
    b, h, w, c = q.shape
    n = h * w
    block_q = min(block_q, n)
    block_k = min(block_k, block_q)
    n_padded = -(-n // block_q) * block_q
    n_pad = n_padded - n
    scale = c ** -0.5
    need_flag = n_pad > 0 or key_valid is not None
    if (need_flag and c >= 512
            and _as_dot_precision(precise) != jax.lax.Precision.DEFAULT):
        # Scoped-VMEM guard: precise modes stream f32 blocks, and the
        # dead-key flag channel pads the lane dim 512 -> 640; at
        # block 512 that overflows the 16 MB scoped VMEM (measured
        # +940 KB at n=65536, C=512 — the bucketed mixed 2048 serving
        # shape).  Halving the key block drops the k/v/score working
        # set ~2.9 MB; the q block keeps its MXU-friendly 512 rows.
        block_k = min(block_k, 256)

    def single(qi, ki, vi):
        # precise mode streams f32 blocks; fast mode keeps the conv output
        # dtype (bf16) through HBM->VMEM — the kernel upcasts per block.
        dtype = (qi.dtype
                 if _as_dot_precision(precise) == jax.lax.Precision.DEFAULT
                 else jnp.float32)
        qf = qi.reshape(n, c).astype(dtype)
        kf = ki.reshape(n, c).astype(dtype)
        vf = vi.reshape(n, c).astype(dtype)
        if need_flag:
            if key_valid is not None:
                live = jnp.where(key_valid.reshape(n), 0.0, -1e12)
            else:
                live = jnp.zeros((n,), jnp.float32)
            flag = jnp.concatenate([
                live.astype(dtype),
                jnp.full((n_pad,), -1e12, dtype)])[:, None]
            qf = jnp.pad(qf, ((0, n_pad), (0, 0)))
            ones = jnp.ones((n_padded, 1), dtype)
            qf = jnp.concatenate([qf, ones], axis=1)
            kf = jnp.concatenate([jnp.pad(kf, ((0, n_pad), (0, 0))), flag],
                                 axis=1)
            vf = jnp.pad(vf, ((0, n_pad), (0, 0)))
        fn = functools.partial(_flash_attention_2d, scale=scale,
                               block_q=block_q, block_k=block_k,
                               precise=precise)
        if interpret:
            with pltpu.force_tpu_interpret_mode():
                out = fn(qf, kf, vf)
        else:
            out = fn(qf, kf, vf)
        return out[:n, :].reshape(h, w, c)

    return jax.vmap(single)(q, k, v)


def spatial_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                      precision: Precision = Precision(),
                      key_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Dispatch: Pallas flash kernel on TPU for large grids, XLA otherwise.

    The flash kernel is ~20-30x faster than the XLA einsum path (which
    materializes the N^2 score matrix in HBM) and O(N) memory.  Parity mode
    runs the kernel with HIGHEST-precision MXU dots (true f32, measured
    1e-7 rel vs an f32 reference — Mosaic honors the precision flag), so
    2K/4K parity decodes neither OOM nor lose accuracy.
    """
    n = q.shape[1] * q.shape[2]
    on_tpu = jax.default_backend() == "tpu"
    if (on_tpu and n >= _PALLAS_MIN_TOKENS and q.shape[-1] % 128 == 0
            and n % _BLOCK_Q == 0):
        # HIGH (the mixed tier) runs as the kernel's manual bf16x3
        # decomposition — Mosaic rejects HIGH dots, and HIGHEST's 6-pass
        # exactness priced the 262k-token 4K mid attention at 4.4 s
        # (round 5; _dot3 halves that at the tier's own error class).
        return spatial_attention_pallas(
            q, k, v, precise=_matmul_precision(precision),
            key_valid=key_valid)
    return spatial_attention_xla(q, k, v, precision=precision,
                                 key_valid=key_valid)

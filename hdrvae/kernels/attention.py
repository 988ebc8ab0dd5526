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
    return jax.lax.Precision.DEFAULT


def spatial_attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                          precision: Precision = Precision()) -> jnp.ndarray:
    """Single-head attention over flattened spatial dims.

    q, k, v: [B, H, W, C] -> output [B, H, W, C].
    """
    b, h, w, c = q.shape
    n = h * w
    scale = c ** -0.5
    qf = q.reshape(b, n, c).astype(jnp.float32)
    kf = k.reshape(b, n, c).astype(jnp.float32)
    vf = v.reshape(b, n, c).astype(jnp.float32)
    logits = jnp.einsum("bqc,bkc->bqk", qf * scale, kf,
                        precision=_matmul_precision(precision))
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bqk,bkc->bqc", weights, vf,
                     precision=_matmul_precision(precision))
    return out.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# Pallas flash attention (single head, no mask, no bias)
# ---------------------------------------------------------------------------


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_kv: int,
                  block_k: int):
    """One Q block against all KV blocks with online softmax."""
    q = q_ref[...].astype(jnp.float32) * scale  # [Bq, Cqk]
    bq = q.shape[0]
    c_v = o_ref.shape[1]

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v_blk,
                                    preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, c_v), jnp.float32)
    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, n_kv // block_k, body, (acc0, m0, l0))
    o_ref[...] = acc / l


def _flash_attention_2d(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                        scale: float, block_q: int,
                        block_k: int) -> jnp.ndarray:
    """q, k: [N, Cqk]; v: [N, Cv]; N divisible by block sizes."""
    n, c_qk = q.shape
    c_v = v.shape[1]
    grid = (n // block_q,)
    kernel = functools.partial(_flash_kernel, scale=scale, n_kv=n,
                               block_k=block_k)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, c_qk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, c_qk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, c_v), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_q, c_v), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c_v), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * n * c_qk // grid[0],
            bytes_accessed=4 * n * (2 * c_qk + 2 * c_v),
            transcendentals=n * n // grid[0],
        ),
    )(q, k, v)


def spatial_attention_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                             *, block_q: int = _BLOCK_Q,
                             block_k: int = _BLOCK_K,
                             interpret: bool = False) -> jnp.ndarray:
    """Flash attention over flattened spatial dims; [B,H,W,C] -> [B,H,W,C].

    N is padded up to a block multiple.  Padded keys are neutralized by an
    extra bias feature: Q gains a constant-one channel and K a channel that
    is 0 for real keys and a large negative constant for padded keys, so
    padded scores underflow to zero weight after softmax.  The softmax scale
    stays the true ``C**-0.5`` (passed explicitly; the extra channel does not
    change it).
    """
    b, h, w, c = q.shape
    n = h * w
    block_q = min(block_q, n)
    block_k = min(block_k, block_q)
    n_padded = -(-n // block_q) * block_q
    n_pad = n_padded - n
    scale = c ** -0.5

    def single(qi, ki, vi):
        qf = qi.reshape(n, c).astype(jnp.float32)
        kf = ki.reshape(n, c).astype(jnp.float32)
        vf = vi.reshape(n, c).astype(jnp.float32)
        if n_pad:
            qf = jnp.pad(qf, ((0, n_pad), (0, 0)))
            ones = jnp.ones((n_padded, 1), jnp.float32)
            qf = jnp.concatenate([qf, ones], axis=1)
            flag = jnp.concatenate([
                jnp.zeros((n, 1), jnp.float32),
                jnp.full((n_pad, 1), -1e12, jnp.float32)], axis=0)
            kf = jnp.concatenate([jnp.pad(kf, ((0, n_pad), (0, 0))), flag],
                                 axis=1)
            vf = jnp.pad(vf, ((0, n_pad), (0, 0)))
        fn = functools.partial(_flash_attention_2d, scale=scale,
                               block_q=block_q, block_k=block_k)
        if interpret:
            with pltpu.force_tpu_interpret_mode():
                out = fn(qf, kf, vf)
        else:
            out = fn(qf, kf, vf)
        return out[:n, :].reshape(h, w, c)

    return jax.vmap(single)(q, k, v)


def spatial_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                      precision: Precision = Precision()) -> jnp.ndarray:
    """Dispatch: Pallas flash kernel on TPU for large grids, XLA otherwise."""
    n = q.shape[1] * q.shape[2]
    on_tpu = jax.default_backend() == "tpu"
    if (on_tpu and n >= _PALLAS_MIN_TOKENS and q.shape[-1] % 128 == 0
            and n % _BLOCK_Q == 0):
        return spatial_attention_pallas(q, k, v)
    return spatial_attention_xla(q, k, v, precision=precision)

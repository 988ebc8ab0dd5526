"""Fused HDR-epilogue kernel: MAX-pool collapse + raw statistics in ONE
streamed pass over the pre-conv_out map.

The north-star design (BASELINE.json): "all four HDR expansion modes plus
the MAX-pool 128->3 channel collapse compile into the same fused decode
kernel to avoid extra HBM round-trips".  The mode math itself is cheap
elementwise work on the 3-channel result (XLA fuses it); the expensive part
is the [B, H, W, 128] pre map, which the XLA epilogue reads several times
(min/max/mean/std reductions + the collapse).  This kernel reads it ONCE,
emitting the collapsed map and partial sums; the host-side combine is a
handful of scalars.

Grid is 1-D over row-blocks; TPU grids execute sequentially, so the scalar
accumulators in SMEM scratch are race-free.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_M = 4096  # rows of the flattened [M, C] view per grid step


def _epilogue_kernel(pre_ref, collapsed_ref, mean_ref, m2_ref, min_ref,
                     max_ref, acc_ref, *, m_total: int, block_m: int,
                     bounds: Tuple[int, int, int, int]):
    """Accumulators use the Chan parallel-variance combine (n, mean, M2):
    numerically stable for |mean| >> std, unlike E[x^2]-mean^2 which
    catastrophically cancels in f32."""
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[0, 0] = 0.0          # running count n
        acc_ref[0, 1] = 0.0          # running mean
        acc_ref[0, 2] = 0.0          # running M2 = sum((x - mean)^2)
        acc_ref[0, 3] = jnp.inf      # min
        acc_ref[0, 4] = -jnp.inf     # max

    x = pre_ref[...].astype(jnp.float32)            # [block_m, C]
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + i * block_m
    valid = rows < m_total

    nb = jnp.sum(valid).astype(jnp.float32)
    xv = jnp.where(valid, x, 0.0)
    mean_b = jnp.sum(xv) / nb
    m2_b = jnp.sum(jnp.square(jnp.where(valid, x - mean_b, 0.0)))

    na = acc_ref[0, 0]
    mean_a = acc_ref[0, 1]
    delta = mean_b - mean_a
    n_new = na + nb
    acc_ref[0, 0] = n_new
    acc_ref[0, 1] = mean_a + delta * nb / n_new
    acc_ref[0, 2] += m2_b + jnp.square(delta) * na * nb / n_new
    acc_ref[0, 3] = jnp.minimum(acc_ref[0, 3],
                                jnp.min(jnp.where(valid, x, jnp.inf)))
    acc_ref[0, 4] = jnp.maximum(acc_ref[0, 4],
                                jnp.max(jnp.where(valid, x, -jnp.inf)))

    a, b, c, d = bounds
    r = jnp.max(x[:, a:b], axis=1)
    g = jnp.max(x[:, b:c], axis=1)
    bl = jnp.max(x[:, c:d], axis=1)
    # transposed [3, block_m] store: a 3-LANE minor dim would pad to 128
    # lanes in the tiled HBM layout (42x write amplification); 3 sublanes
    # pad only to 8.
    collapsed_ref[...] = jnp.stack([r, g, bl], axis=0).astype(
        collapsed_ref.dtype)

    @pl.when(i == n_blocks - 1)
    def _finalize():
        mean_ref[0, 0] = acc_ref[0, 1]
        m2_ref[0, 0] = acc_ref[0, 2]
        min_ref[0, 0] = acc_ref[0, 3]
        max_ref[0, 0] = acc_ref[0, 4]


def _collapse_bounds(c: int) -> Tuple[int, int, int, int]:
    if c == 128:
        return (0, 42, 84, 126)
    step = c // 3
    return (0, step, 2 * step, 3 * step)


def collapse_and_stats_pallas(pre: jnp.ndarray, *, interpret: bool = False
                              ) -> Tuple[jnp.ndarray,
                                         Dict[str, jnp.ndarray]]:
    """pre: [B, H, W, C] -> (collapsed [B, H, W, 3], stats dict).

    Stats match hdrvae.core.stats.tensor_stats semantics (ddof=1 std).
    """
    b, h, w, c = pre.shape
    m = b * h * w
    flat = pre.reshape(m, c)
    block_m = min(_BLOCK_M, m)
    grid = (pl.cdiv(m, block_m),)

    kernel = functools.partial(_epilogue_kernel, m_total=m,
                               block_m=block_m,
                               bounds=_collapse_bounds(c))
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((block_m, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((3, block_m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, m), pre.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=[pltpu.SMEM((1, 5), jnp.float32)],
        interpret=interpret,
    )
    collapsed_t, mean, m2, mn, mx = call(flat)
    collapsed = collapsed_t.T
    n = jnp.float32(m * c)
    var = m2[0, 0] / jnp.maximum(n - 1.0, 1.0)   # ddof=1, torch.std
    stats = {"min": mn[0, 0], "max": mx[0, 0], "mean": mean[0, 0],
             "std": jnp.sqrt(var)}
    return collapsed.reshape(b, h, w, 3), stats


def collapse_and_stats(pre: jnp.ndarray, *, use_fused: bool = False
                       ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Collapse + stats over the pre map.

    The fused Pallas single-pass kernel above is numerically sound (Chan
    variance combine) but MEASURED SLOWER than XLA's fused reductions
    end-to-end (197 ms vs 110 ms at 1024^2): 1024-row grid steps are too
    small to amortize, the scalar SMEM accumulation serializes the
    pipeline, and the 3-lane collapsed store wastes the VPU.  XLA already
    fuses the min/max/mean and collapse reads well, so the jnp path is the
    default; the kernel is selected by HDRDecodeConfig.use_fused_epilogue
    (a static jit argument, so toggling recompiles).

    ROOT CAUSE of the slowdown (profiled): the custom call's row-major
    operand layout constraint back-propagates into the decoder — XLA
    recompiles the level-0 conv fusions against the constrained layout and
    five of them balloon from ~6.5 ms to 8.2-35 ms each (~+85 ms), dwarfing
    anything the kernel saves.  Fixing this requires either a
    layout-agnostic kernel entry or keeping the whole epilogue inside the
    XLA fusion domain (the current default).

    Fast-mode semantics note: the Pallas call is a fusion barrier, so the
    kernel reads pre_conv_out at its DECLARED bf16 storage dtype; the XLA
    path can fuse through the cast and see pre-rounding f32 values.  The
    paths therefore differ by ~bf16 epsilon on the stats in fast mode
    (parity mode: 1e-4 agreement, reduction ordering only).
    """
    from hdrvae.core.stats import tensor_stats
    from hdrvae.decode.formatting import collapse_channels_maxpool

    c = pre.shape[-1]
    if (use_fused and jax.default_backend() == "tpu" and pre.ndim == 4
            and (c == 128 or (c % 3 == 0 and c >= 3))):
        return collapse_and_stats_pallas(pre)
    return collapse_channels_maxpool(pre), tensor_stats(pre)

"""conv_out transformation analysis as a traced pass.

Replaces the reference's hook-based instrumentation
(`hdr_vae_decode.py:837-925`): there, a forward hook captures the input to
`conv_out`, the full decode runs once for analysis and AGAIN for the actual
decode, and every statistic forces a device->host sync.  Here the decoder
returns ``(rgb, pre_conv_out)`` from one forward and all stats are in-graph
reductions; sigmoid/tanh classification is a pair of scalar comparisons that
stay on device (SURVEY.md sections 3.2 and 7, inversion #3).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax.numpy as jnp

from hdrvae.core.stats import tensor_stats
from hdrvae.decode.modes import NORM_CUSTOM, NORM_SIGMOID, NORM_TANH

NORM_NAMES = {NORM_SIGMOID: "SIGMOID", NORM_TANH: "TANH",
              NORM_CUSTOM: "CUSTOM"}


class ConvOutAnalysis(NamedTuple):
    """The analysis contract (`hdr_vae_decode.py:912-919`), minus the
    redundant tensors (pre_conv_out itself is returned by the decoder)."""

    pre_stats: Dict[str, jnp.ndarray]    # raw pre-conv_out min/max/mean/std
    post_stats: Dict[str, jnp.ndarray]   # final image stats
    norm_kind: jnp.ndarray               # 0-d int32: SIGMOID/TANH/CUSTOM


def classify_normalization(post_stats: Dict[str, jnp.ndarray],
                           tol: float = 1e-3) -> jnp.ndarray:
    """The reference's pattern detection (`hdr_vae_decode.py:890-897`):
    post range ~[0,1] -> SIGMOID; ~[-1,1] -> TANH; else CUSTOM."""
    near = lambda x, t: jnp.abs(x - t) < tol  # noqa: E731
    is_sigmoid = jnp.logical_and(near(post_stats["max"], 1.0),
                                 near(post_stats["min"], 0.0))
    is_tanh = jnp.logical_and(near(post_stats["max"], 1.0),
                              near(post_stats["min"], -1.0))
    return jnp.where(is_sigmoid, NORM_SIGMOID,
                     jnp.where(is_tanh, NORM_TANH,
                               NORM_CUSTOM)).astype(jnp.int32)


def analyze_conv_out(rgb: jnp.ndarray,
                     pre_conv_out: jnp.ndarray) -> ConvOutAnalysis:
    """Characterize the conv_out transformation from a single forward's
    outputs.  All returns are device arrays; pull them to host once via
    ``hdrvae.core.stats.stats_to_host`` if logging is wanted."""
    pre_stats = tensor_stats(pre_conv_out)
    post_stats = tensor_stats(rgb)
    norm_kind = classify_normalization(post_stats)
    return ConvOutAnalysis(pre_stats=pre_stats, post_stats=post_stats,
                           norm_kind=norm_kind)

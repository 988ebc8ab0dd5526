"""In-graph tensor statistics.

The reference computes min/max/mean/std + HDR/negative pixel counts with
host syncs after every stage (`hdr_vae_decode.py:862-873,100-104,188-193`) —
a device->host round-trip per stat.  Here all stats are reductions computed
inside the same jitted graph and returned once per call (SURVEY.md section 5,
"Metrics" row).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def tensor_stats(x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """min/max/mean/std of ``x`` as 0-d f32 arrays (one fused reduction set).

    ``std`` uses the unbiased (ddof=1) estimator to match ``torch.std``
    (`hdr_vae_decode.py:865`), guarded for single-element inputs.
    """
    xf = x.astype(jnp.float32)
    n = xf.size
    mean = jnp.mean(xf)
    if n > 1:
        var = jnp.sum(jnp.square(xf - mean)) / (n - 1)
    else:
        var = jnp.zeros((), jnp.float32)
    return {
        "min": jnp.min(xf),
        "max": jnp.max(xf),
        "mean": mean,
        "std": jnp.sqrt(var),
    }


def hdr_stats(x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """The reference's universal health metric: range + HDR/negative pixel
    counts (`hdr_vae_decode.py:188-193`; `linear_exr_export.py:257-259`)."""
    xf = x.astype(jnp.float32)
    return {
        "min": jnp.min(xf),
        "max": jnp.max(xf),
        "hdr_pixels": jnp.sum(xf > 1.0).astype(jnp.int32),
        "negative_pixels": jnp.sum(xf < 0.0).astype(jnp.int32),
    }


def stats_to_host(stats) -> Dict[str, float]:
    """Pull a (possibly nested) stats dict to host Python scalars — the one
    intentional device->host sync point per pipeline call."""
    out = {}
    for k, v in stats.items():
        if isinstance(v, dict):
            out[k] = stats_to_host(v)
        else:
            out[k] = float(v) if jnp.issubdtype(
                jnp.asarray(v).dtype, jnp.floating) else int(v)
    return out

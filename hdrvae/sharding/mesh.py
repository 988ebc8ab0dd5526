"""Device-mesh sharded decode — scaling via jax.sharding + ICI collectives.

The reference has NO distributed layer (SURVEY.md section 5: single device,
manual CUDA placement at `hdr_vae_decode.py:452-502`).  The TPU-native
scaling model (BASELINE.json config 5) is spatial data parallelism: the
overlap-tile grid is the parallel axis, tiles are sharded across the mesh
over ICI, the decoder weights are replicated, and the stitched image plus
the HDR epilogue's global reductions are produced by XLA-inserted
collectives (all-gather on the blend, psum-style reductions in the stats) —
no hand-written communication.

Design notes (How-to-Scale-Your-Model recipe): pick a mesh, annotate
shardings with NamedSharding, let XLA insert collectives.  The model is
~100 MB -> replication is free; only the tile axis shards (no TP/PP/EP
warranted, SURVEY.md section 5 parallelism row).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hdrvae.core.config import (DecoderConfig, HDRDecodeConfig, MeshConfig,
                                Precision)
from hdrvae.decode.pipeline import hdr_epilogue
from hdrvae.models.decoder import decoder_apply
from hdrvae.tiling.tiled import TilePlan, blend_tiles, extract_tiles, \
    plan_tiles

Params = Dict[str, Any]


def make_mesh(num_devices: Optional[int] = None,
              axis_name: str = "tiles",
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """A 1-D mesh over the tile/batch axis (v5e-4 -> shape (4,))."""
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis_name,))


def _pad_tiles(tiles: jnp.ndarray, multiple: int) -> Tuple[jnp.ndarray, int]:
    t = tiles.shape[0]
    pad = (-t) % multiple
    if pad:
        tiles = jnp.concatenate(
            [tiles, jnp.repeat(tiles[-1:], pad, axis=0)], axis=0)
    return tiles, pad


@functools.partial(jax.jit,
                   static_argnames=("decoder_cfg", "cfg", "precision",
                                    "plan", "mesh", "axis_name",
                                    "global_stats"))
def _sharded_decode_step(params: Params, tiles: jnp.ndarray,
                         stats_latent, decoder_cfg: DecoderConfig,
                         cfg: HDRDecodeConfig, precision: Precision,
                         plan: TilePlan, mesh: Mesh, axis_name: str,
                         global_stats: bool):
    """tiles: [T, B, th, tw, zc] sharded on T; returns the full image plus
    the epilogue outputs (replicated).

    With ``global_stats`` a whole-image (possibly downsampled) decode first
    collects a GroupNorm tape; every tile then normalizes with those shared
    statistics instead of its own — the two-phase answer to GroupNorm's
    global nature under tiling (SURVEY.md section 7 hard-parts).
    """
    tile_sharding = NamedSharding(mesh, P(axis_name))
    tiles = jax.lax.with_sharding_constraint(tiles, tile_sharding)

    collected = None
    if global_stats:
        from hdrvae.models.layers import GNTape
        collect_tape = GNTape("collect")
        decoder_apply(params, stats_latent, decoder_cfg,
                      precision=precision, apply_conv_out=False,
                      tape=collect_tape)
        collected = collect_tape.stats

    def decode_tile(tile):
        tape = None
        if collected is not None:
            from hdrvae.models.layers import GNTape
            tape = GNTape("inject", collected)
        out = decoder_apply(params, tile, decoder_cfg, precision=precision,
                            tape=tape)
        return out.rgb, out.pre_conv_out

    rgb_tiles, pre_tiles = jax.vmap(decode_tile)(tiles)

    scale = decoder_cfg.spatial_scale
    n_real = plan.num_tiles
    rgb = blend_tiles(rgb_tiles[:n_real], plan, scale=scale, mode="crop")
    pre = blend_tiles(pre_tiles[:n_real], plan, scale=scale, mode="crop")
    image, used_fallback, analysis = hdr_epilogue(rgb, pre, cfg)
    return image, rgb, used_fallback


def _downsample_latent(latent: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Area-average downsample (pads to a factor multiple first)."""
    if factor <= 1:
        return latent
    b, h, w, c = latent.shape
    ph, pw = -h % factor, -w % factor
    if ph or pw:
        latent = jnp.pad(latent, ((0, 0), (0, ph), (0, pw), (0, 0)),
                         mode="edge")
    b, h, w, c = latent.shape
    return latent.reshape(b, h // factor, factor, w // factor, factor,
                          c).mean(axis=(2, 4))


def sharded_tiled_decode(params: Params, latent: jnp.ndarray,
                         decoder_cfg: DecoderConfig = DecoderConfig(),
                         cfg: HDRDecodeConfig = HDRDecodeConfig(),
                         *, mesh: Optional[Mesh] = None,
                         latent_tile: int = 64, latent_overlap: int = 8,
                         norm_stats: str = "global",
                         stats_downsample: int = 1,
                         precision: Precision = Precision()) -> jnp.ndarray:
    """Overlap-tiled HDR decode sharded across a device mesh.

    latent: [B, h, w, zc] NHWC.  ``latent_tile``/``latent_overlap`` are in
    latent space (x8 in pixels; defaults 64/8 -> 512px tiles, 64px halo,
    matching the reference's pixel-space tiling constants).

    Seam strategy is halo-crop (exact for the conv stack) plus GroupNorm
    statistics control via ``norm_stats``:
      - "global" (default, stats_downsample=1): one whole-image decode
        collects a GN tape that every tile replays — tiles share EXACT
        whole-image statistics and the residual seam error is only the
        tile-local attention (~0.6%).  Costs one extra non-tiled forward,
        so it parallelizes decode without reducing peak memory.
      - "per_tile": each tile normalizes with its own stats — the
        memory-bounded mode for images whose whole-image activations would
        not fit HBM; larger (documented) seam error.
      - stats_downsample > 1 computes the tape from a downsampled whole
        decode: cheaper stats pass, EXPERIMENTAL — decoder activations are
        not scale-invariant, so injected variances can be badly off
        (measured on random weights); validate on real checkpoints before
        relying on it.
    """
    if norm_stats not in ("global", "per_tile"):
        raise ValueError(f"norm_stats must be 'global' or 'per_tile', "
                         f"got {norm_stats!r}")
    if mesh is None:
        mesh = make_mesh()
    axis_name = mesh.axis_names[0]
    n_dev = mesh.devices.size

    plan = plan_tiles(latent.shape[1], latent.shape[2], latent_tile,
                      latent_overlap)
    tiles = extract_tiles(latent, plan)       # [T, B, th, tw, zc]
    tiles, _ = _pad_tiles(tiles, n_dev)

    params = jax.device_put(
        params, NamedSharding(mesh, P()))     # replicate weights
    tiles = jax.device_put(
        tiles, NamedSharding(mesh, P(axis_name)))

    global_stats = norm_stats == "global"
    stats_latent = (_downsample_latent(latent, stats_downsample)
                    if global_stats else jnp.zeros((), jnp.float32))

    image, rgb, used_fallback = _sharded_decode_step(
        params, tiles, stats_latent, decoder_cfg, cfg, precision, plan,
        mesh, axis_name, global_stats)
    return image

"""Benchmark harness — prints ONE JSON line with the tracked metric.

Metric (BASELINE.md): HDR decode throughput in megapixels/sec at 1024x1024
output (128x128 Flux.1 latent -> full decode + fused HDR epilogue), on
whatever accelerator is available (the driver runs this on one real TPU
chip).  Baseline: the reference GPU node's derived 0.024 MP/s
(`README.md:262`: ~41 s for a 0.999 MP image).

Usage: python bench.py [--size 1024] [--runs 5] [--precision fast|parity]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

REFERENCE_MP_PER_S = 0.024  # BASELINE.md derived throughput


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=1024,
                        help="output image edge in pixels")
    parser.add_argument("--runs", type=int, default=5)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--precision", choices=("fast", "parity"),
                        default="fast")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--tiled", action="store_true",
                        help="benchmark the sharded/tiled decode path")
    parser.add_argument("--extra", action="store_true",
                        help="also print secondary metrics as extra lines")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from hdrvae.core.runtime import setup
    setup()  # persistent compilation cache

    from hdrvae.core.config import DecoderConfig, HDRDecodeConfig, Precision
    from hdrvae.decode.pipeline import _hdr_decode_compiled
    from hdrvae.models.decoder import init_decoder

    decoder_cfg = DecoderConfig()
    cfg = HDRDecodeConfig()
    precision = (Precision.fast() if args.precision == "fast"
                 else Precision.parity())

    latent_edge = args.size // decoder_cfg.spatial_scale
    params = init_decoder(jax.random.PRNGKey(0), decoder_cfg)
    latent = jax.random.normal(
        jax.random.PRNGKey(1), (args.batch, latent_edge, latent_edge,
                                decoder_cfg.z_channels), jnp.float32)

    if args.tiled:
        from hdrvae.sharding.mesh import make_mesh, sharded_tiled_decode
        mesh = make_mesh()

        def step(x):
            img = sharded_tiled_decode(
                params, x, decoder_cfg, cfg, mesh=mesh,
                norm_stats="per_tile", precision=precision)
            return x + img.mean() * 1e-6
    else:
        def step(x):
            image, rgb, stats, fb = _hdr_decode_compiled(
                params, x, decoder_cfg, cfg, precision)
            return x + image.mean() * 1e-6

    # Timing: chain steps through a data dependency and sync once with a
    # host fetch — per-call block_until_ready costs a readiness RPC on
    # remote backends and distorts per-step numbers.
    import numpy as np

    def sync(x):
        np.asarray(x.ravel()[0])

    t0 = time.perf_counter()
    x = latent
    for _ in range(max(1, args.warmup)):
        x = step(x)
    sync(x)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(args.runs):
        x = step(x)
    sync(x)
    best = (time.perf_counter() - t0) / args.runs
    times = [best]
    megapixels = args.batch * (args.size * args.size) / 1e6
    mp_per_s = megapixels / best

    result = {
        "metric": f"hdr_decode_mp_per_s_{args.size}"
                  + ("_tiled" if args.tiled else "")
                  + (f"_b{args.batch}" if args.batch > 1 else ""),
        "value": round(mp_per_s, 3),
        "unit": "MP/s",
        "vs_baseline": round(mp_per_s / REFERENCE_MP_PER_S, 1),
    }
    print(json.dumps(result))

    if args.extra:
        extra = {
            "device": str(jax.devices()[0]),
            "precision": args.precision,
            "best_s": round(best, 4),
            "mean_s": round(sum(times) / len(times), 4),
            "warmup_s": round(compile_s, 1),
        }
        print(json.dumps(extra), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

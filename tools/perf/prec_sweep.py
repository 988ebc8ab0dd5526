"""Per-stage precision sensitivity sweep on the real chip.

For each precision config: decode a full Flux-size 128x128 latent (1024^2
output), measure (a) max/mean abs error of the final HDR image vs the
parity pipeline for all four HDR modes, (b) steady-state MP/s of the full
hdr_decode program.  Writes /tmp/prec_sweep.json.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from hdrvae.core.runtime import setup
setup()

from hdrvae.core.config import DecoderConfig, HDRDecodeConfig, Precision
from hdrvae.decode.pipeline import _hdr_decode_compiled, hdr_epilogue
from hdrvae.models.decoder import decoder_apply, init_decoder

decoder_cfg = DecoderConfig()
params = init_decoder(jax.random.PRNGKey(0), decoder_cfg)
SIZE = 1024
edge = SIZE // decoder_cfg.spatial_scale
latent = jax.random.normal(jax.random.PRNGKey(1),
                           (1, edge, edge, decoder_cfg.z_channels),
                           jnp.float32)

import dataclasses
CONFIGS = [
    ("parity", Precision.parity()),
    ("mixed", Precision.mixed()),
    ("mixed-fh1", Precision.mixed(1)),
    ("mixed-fh2", Precision.mixed(2)),
    ("f32-default", dataclasses.replace(Precision.fast(),
                                        compute_dtype=jnp.float32,
                                        storage_dtype=jnp.float32,
                                        upstack="xla")),
    ("mixed-bf16store", dataclasses.replace(Precision.mixed(),
                                            storage_dtype=jnp.bfloat16)),
    ("fast", Precision.fast()),
]

MODES = ("conservative", "exposure", "adaptive_recovery",
         "mathematical_recovery")


def sync(x):
    np.asarray(np.ravel(np.asarray(x))[0])


def run_forward(prec):
    f = jax.jit(lambda p, z: decoder_apply(p, z, decoder_cfg,
                                           precision=prec))
    out = f(params, latent)
    rgb = np.asarray(out.rgb, np.float32)
    pre = np.asarray(out.pre_conv_out, np.float32)
    return rgb, pre


epi_cache = {}


def run_epilogue(rgb, pre, mode):
    cfg = HDRDecodeConfig(hdr_mode=mode)
    if mode not in epi_cache:
        epi_cache[mode] = jax.jit(
            lambda r, p: hdr_epilogue(r, p, cfg)[0])
    return np.asarray(epi_cache[mode](jnp.asarray(rgb), jnp.asarray(pre)))


def time_pipeline(prec, runs=5, warmup=2):
    cfg = HDRDecodeConfig()

    def step(x):
        image, rgb, stats, fb = _hdr_decode_compiled(
            params, x, decoder_cfg, cfg, prec)
        return x + image.mean() * 1e-6

    x = latent
    for _ in range(warmup):
        x = step(x)
    sync(x)
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        x = latent
        for _ in range(runs):
            x = step(x)
        sync(x)
        dt = (time.perf_counter() - t0) / runs
        best = dt if best is None else min(best, dt)
    return best


results = {}
ref = {}
for name, prec in CONFIGS:
    t0 = time.time()
    rgb, pre = run_forward(prec)
    row = {"rgb_shape": list(rgb.shape)}
    imgs = {m: run_epilogue(rgb, pre, m) for m in MODES}
    if name == "parity":
        ref = {"rgb": rgb, "pre": pre, "imgs": imgs}
    else:
        row["rgb_maxabs"] = float(np.abs(rgb - ref["rgb"]).max())
        row["pre_maxabs"] = float(np.abs(pre - ref["pre"]).max())
        for m in MODES:
            d = np.abs(imgs[m] - ref["imgs"][m])
            row[f"{m}_maxabs"] = float(d.max())
            row[f"{m}_meanabs"] = float(d.mean())
    sec = time_pipeline(prec)
    row["s_per_step"] = round(sec, 4)
    row["mp_per_s"] = round(SIZE * SIZE / 1e6 / sec, 2)
    row["wall_s"] = round(time.time() - t0, 1)
    results[name] = row
    print(name, json.dumps(row), flush=True)

with open("/tmp/prec_sweep.json", "w") as f:
    json.dump(results, f, indent=1)
print("DONE")

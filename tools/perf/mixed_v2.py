"""Verify the stats-DEFAULT mixed tier: error vs parity + speed at 1024^2."""
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
latent = jax.random.normal(jax.random.PRNGKey(1),
                           (1, 128, 128, decoder_cfg.z_channels),
                           jnp.float32)

MODES = ("conservative", "exposure", "adaptive_recovery",
         "mathematical_recovery")
epi = {m: jax.jit(lambda r, p, m=m: hdr_epilogue(
    r, p, HDRDecodeConfig(hdr_mode=m))[0]) for m in MODES}


def forward(prec):
    f = jax.jit(lambda p, z: decoder_apply(p, z, decoder_cfg,
                                           precision=prec))
    out = f(params, latent)
    return (np.asarray(out.rgb, np.float32),
            np.asarray(out.pre_conv_out, np.float32))


def sync(x):
    np.asarray(np.ravel(np.asarray(x))[0])


def time_pipeline(prec, runs=6):
    cfg = HDRDecodeConfig()

    def step(x):
        image, rgb, stats, fb = _hdr_decode_compiled(
            params, x, decoder_cfg, cfg, prec)
        return x + image.mean() * 1e-6

    x = latent
    for _ in range(2):
        x = step(x)
    sync(x)
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        x = latent
        for _ in range(runs):
            x = step(x)
        sync(x)
        best_i = (time.perf_counter() - t0) / runs
        best = best_i if best is None else min(best, best_i)
    return best


rgb_p, pre_p = forward(Precision.parity())
rgb_m, pre_m = forward(Precision.mixed())
row = {
    "rgb_maxabs": float(np.abs(rgb_m - rgb_p).max()),
    "pre_maxabs": float(np.abs(pre_m - pre_p).max()),
}
imgs_p = {m: np.asarray(epi[m](jnp.asarray(rgb_p), jnp.asarray(pre_p)))
          for m in MODES}
imgs_m = {m: np.asarray(epi[m](jnp.asarray(rgb_m), jnp.asarray(pre_m)))
          for m in MODES}
for m in MODES:
    d = np.abs(imgs_m[m] - imgs_p[m])
    row[f"{m}_maxabs"] = float(d.max())
    row[f"{m}_meanabs"] = float(d.mean())
    row[f"{m}_p999"] = float(np.quantile(d, 0.999))
sec = time_pipeline(Precision.mixed())
row["s_per_step"] = round(sec, 4)
row["mp_per_s"] = round(1024 * 1024 / 1e6 / sec, 2)
print(json.dumps(row, indent=1))
with open("/tmp/mixed_v2.json", "w") as f:
    json.dump(row, f, indent=1)

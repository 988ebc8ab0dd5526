"""Per-op device profile of the mixed-tier 1024^2 decode: where do the
286 ms go?  (HIGH convs price at 1.49x bf16 in isolation — /tmp probe —
so a naive model predicts ~170 ms; find the overhead.)"""
import json

import jax
import jax.numpy as jnp
import numpy as np

from hdrvae.core.runtime import setup
setup()

from hdrvae.core.config import DecoderConfig, HDRDecodeConfig, Precision
from hdrvae.decode.pipeline import _hdr_decode_compiled
from hdrvae.models.decoder import init_decoder
from hdrvae.utils.profiling import op_profile

decoder_cfg = DecoderConfig()
params = init_decoder(jax.random.PRNGKey(0), decoder_cfg)
edge = 128
latent = jax.random.normal(jax.random.PRNGKey(1),
                           (1, edge, edge, decoder_cfg.z_channels),
                           jnp.float32)
cfg = HDRDecodeConfig()

for name, prec in (("mixed", Precision.mixed()),
                   ("f32-default",
                    __import__("dataclasses").replace(
                        Precision.fast(), compute_dtype=jnp.float32,
                        storage_dtype=jnp.float32, upstack="xla"))):
    def step(z, prec=prec):
        img, rgb, stats, fb = _hdr_decode_compiled(params, z, decoder_cfg,
                                                   cfg, prec)
        return img
    rows = op_profile(step, latent, top=20)
    total = sum(ms for _, _, ms in rows)
    print(f"== {name}: top ops (sum {total:.1f} ms) ==", flush=True)
    for op, n, ms in rows:
        print(f"  {ms:8.1f} ms  x{n:<4d} {op}")

"""Condition probe: how sensitive is each HDR mode's output to a 1-ulp
input perturbation, at full scale, in PARITY (exact f32) mode?

If parity-vs-parity under a 1e-7 relative latent perturbation shows O(0.1)
max-abs in the logit/EV modes, then max-abs <=1e-3 on those modes is not a
meaningful cross-implementation contract at this scale — NO implementation
(including the reference vs an ulp-perturbed run of itself) can meet it.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from hdrvae.core.runtime import setup
setup()

from hdrvae.core.config import DecoderConfig, HDRDecodeConfig, Precision
from hdrvae.decode.pipeline import hdr_epilogue
from hdrvae.models.decoder import decoder_apply, init_decoder

decoder_cfg = DecoderConfig()
params = init_decoder(jax.random.PRNGKey(0), decoder_cfg)
edge = 1024 // decoder_cfg.spatial_scale
latent = jax.random.normal(jax.random.PRNGKey(1),
                           (1, edge, edge, decoder_cfg.z_channels),
                           jnp.float32)

MODES = ("conservative", "exposure", "adaptive_recovery",
         "mathematical_recovery")

prec = Precision.parity()
f = jax.jit(lambda p, z: decoder_apply(p, z, decoder_cfg, precision=prec))

epi = {m: jax.jit(lambda r, p, m=m: hdr_epilogue(
    r, p, HDRDecodeConfig(hdr_mode=m))[0]) for m in MODES}

results = {}
outs = {}
for name, scale in (("base", 1.0), ("perturbed", 1.0 + 1e-7)):
    out = f(params, latent * scale)
    rgb = np.asarray(out.rgb, np.float32)
    pre = np.asarray(out.pre_conv_out, np.float32)
    imgs = {m: np.asarray(epi[m](jnp.asarray(rgb), jnp.asarray(pre)))
            for m in MODES}
    outs[name] = (rgb, pre, imgs)

rgb_d = np.abs(outs["base"][0] - outs["perturbed"][0])
pre_d = np.abs(outs["base"][1] - outs["perturbed"][1])
results["rgb"] = {"max": float(rgb_d.max()), "mean": float(rgb_d.mean())}
results["pre"] = {"max": float(pre_d.max()), "mean": float(pre_d.mean())}
for m in MODES:
    d = np.abs(outs["base"][2][m] - outs["perturbed"][2][m])
    results[m] = {"max": float(d.max()), "mean": float(d.mean()),
                  "p999": float(np.quantile(d, 0.999))}
print(json.dumps(results, indent=1))
with open("/tmp/cond_probe.json", "w") as fo:
    json.dump(results, fo, indent=1)

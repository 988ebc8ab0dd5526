"""Golden-value regression tests (SURVEY.md section 4: the reference's QA
includes golden sample images; here numeric fingerprints of a fixed-seed
decode guard against silent numeric drift across refactors).

Golden values were produced by the torch-oracle-validated parity path
(M0 commit) on the CPU backend.  If an INTENTIONAL numeric change occurs,
regenerate with: python -m tests.test_golden
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from hdrvae.core.config import DecoderConfig, HDRDecodeConfig, Precision
from hdrvae.decode.pipeline import hdr_decode
from hdrvae.models.decoder import init_decoder

_GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                            "decode_fingerprint.json")

_SAMPLE_POINTS = [(0, 0, 0), (3, 7, 1), (8, 8, 2), (15, 15, 0), (12, 3, 1)]


def _fingerprint():
    cfg = DecoderConfig().with_small()
    params = init_decoder(jax.random.PRNGKey(123), cfg)
    latent = jax.random.normal(jax.random.PRNGKey(321), (1, 8, 8,
                                                         cfg.z_channels),
                               jnp.float32) * 2
    out = {}
    for mode in ("conservative", "exposure", "adaptive_recovery",
                 "mathematical_recovery"):
        img = np.asarray(hdr_decode(
            params, latent, cfg, HDRDecodeConfig(hdr_mode=mode),
            Precision.parity()).image)
        out[mode] = {
            "mean": float(img.mean()),
            "std": float(img.std()),
            "min": float(img.min()),
            "max": float(img.max()),
            "samples": [float(img[0, y, x, c])
                        for y, x, c in _SAMPLE_POINTS],
        }
    return out


def test_decode_fingerprint_stable():
    golden = json.load(open(_GOLDEN_PATH))
    current = _fingerprint()
    for mode, expected in golden.items():
        got = current[mode]
        for key in ("mean", "std", "min", "max"):
            assert abs(got[key] - expected[key]) <= \
                1e-4 * max(1.0, abs(expected[key])), (mode, key, got[key],
                                                      expected[key])
        for i, (g, e) in enumerate(zip(got["samples"],
                                       expected["samples"])):
            assert abs(g - e) <= 1e-4 * max(1.0, abs(e)), (mode, i, g, e)


if __name__ == "__main__":
    os.makedirs(os.path.dirname(_GOLDEN_PATH), exist_ok=True)
    with open(_GOLDEN_PATH, "w") as f:
        json.dump(_fingerprint(), f, indent=2)
    print(f"wrote {_GOLDEN_PATH}")

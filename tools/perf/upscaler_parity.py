"""Upscaler zoo in the CONTRACT tier on chip (VERDICT round-4 item 6).

The reference contract is float32 end-to-end for the upscale path too
(`/root/reference/README.md:39`; the node never downcasts,
`hdr_upscale_with_model.py:148-263`), but README's zoo rows were fast-tier
only.  This probe publishes the contract-fidelity story per family:

  - PARITY (f32/HIGHEST) tile-pass time on the real chip — the number a
    delivery deployment at reference fidelity pays, next to the fast row;
  - the on-chip parity deviation vs the same weights/input evaluated on
    the CPU backend at f32/HIGHEST (the CPU path is pinned against the
    real torch/HF implementations by tests/test_*_hf_oracle.py, so
    TPU-vs-CPU bounds the TPU-vs-torch-oracle error by composition).

Writes tools/perf/upscaler_parity.json and prints one row per family.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from hdrvae.core.runtime import setup


def _sync(y):
    # a scalar FETCH forces completion; block_until_ready through the
    # axon tunnel returns before the device work finishes (measured —
    # same reason bench.py's sync fetches)
    np.asarray(y.ravel()[0])


def _bench(step, x, runs):
    _sync(step(x))
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        _sync(step(x))
        best = min(best or 9e9, time.perf_counter() - t0)
    return best


def main() -> int:
    setup()
    assert jax.default_backend() == "tpu", "run on the chip"
    cpu = jax.devices("cpu")[0]
    from hdrvae.core.config import Precision

    families = []

    from hdrvae.models.rrdbnet import (RRDBNetConfig, init_rrdbnet,
                                       rrdbnet_apply)
    families.append(("ESRGAN", RRDBNetConfig(), init_rrdbnet,
                     rrdbnet_apply, 512))

    from hdrvae.models.swinir import SwinIRConfig, init_swinir, swinir_apply
    families.append(("SwinIR-M", SwinIRConfig(), init_swinir,
                     swinir_apply, 512))

    from hdrvae.models.hat import HATConfig, hat_apply, init_hat
    families.append(("HAT", HATConfig(), init_hat, hat_apply, 256))

    from hdrvae.models.swin2sr import (Swin2SRConfig, init_swin2sr,
                                       swin2sr_apply)
    families.append(("Swin2SR", Swin2SRConfig(), init_swin2sr,
                     swin2sr_apply, 512))

    rows = []
    for i, (name, cfg, init, apply_fn, tile_px) in enumerate(families):
        params = init(jax.random.PRNGKey(10 + i), cfg)
        tile = jax.random.normal(jax.random.PRNGKey(20 + i),
                                 (1, tile_px, tile_px, 3),
                                 jnp.float32) * 0.3

        times = {}
        for label, prec in (("parity", Precision.parity()),
                            ("fast", Precision.fast())):
            step = jax.jit(lambda t, p=prec: apply_fn(params, t, cfg,
                                                      precision=p))
            times[label] = _bench(step, tile, runs=2)

        # on-chip parity deviation vs the CPU f32/HIGHEST evaluation of
        # the SAME function (small tile keeps the 1-core CPU run bounded)
        small = np.asarray(tile[:, :128, :128])
        y_tpu = np.asarray(jax.jit(
            lambda t: apply_fn(params, t, cfg,
                               precision=Precision.parity()))(
            jnp.asarray(small)), np.float32)
        # committed CPU inputs -> the jit runs on the CPU backend
        params_cpu = jax.device_put(params, cpu)
        y_cpu = np.asarray(jax.jit(
            lambda p, t: apply_fn(p, t, cfg,
                                  precision=Precision.parity()))(
            params_cpu, jax.device_put(jnp.asarray(small), cpu)),
            np.float32)
        err = float(np.abs(y_tpu - y_cpu).max())

        mp_out = (tile_px * cfg.scale) ** 2 / 1e6
        row = {
            "family": name, "tile_px": tile_px, "scale": cfg.scale,
            "parity_s": round(times["parity"], 4),
            "fast_s": round(times["fast"], 4),
            "parity_mp_per_s": round(mp_out / times["parity"], 3),
            "fast_mp_per_s": round(mp_out / times["fast"], 3),
            "parity_vs_cpu_f32_maxabs_128": err,
        }
        rows.append(row)
        print(json.dumps(row))

    out = os.path.join(os.path.dirname(os.path.abspath(__file__))
                       if "__file__" in globals() else "tools/perf",
                       "upscaler_parity.json")
    with open(out, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "rows": rows}, f,
                  indent=1)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Round-5 probe: can a Pallas kernel chain serve the MIXED tier?

The mixed tier needs f32 activations and >=3-pass (bf16x3-class) MXU
contractions.  Mosaic accepts only DEFAULT and HIGHEST dot precisions
(HIGH is rejected at compile time — kernels/attention._as_dot_precision).
So a mixed Pallas chain is viable only if ONE of these holds:

  (a) Mosaic's f32 DEFAULT dot is numerically >= 3-pass (error well below
      1-pass bf16) at a price comparable to XLA's HIGH conv, or
  (b) Mosaic's f32 HIGHEST dot prices near XLA's HIGH (it should not —
      XLA's own HIGHEST conv measures 5x HIGH, PERF_NOTES 6.3).

This measures both on one decoder-class contraction (M=8192, K=256,
N=256 — a row-block of the 512^2 level-1 conv): wall time and max-abs
error vs the float64-free exact reference (f32 operands contracted at
XLA HIGHEST, which is exact for f32 inputs).  Writes
tools/perf/pallas_f32_dot_probe.json.
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hdrvae.core.runtime import setup

M, K, N = 8192, 256, 256
BM = 512


def _kernel(prec, x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32)


def pallas_dot(x, w, prec):
    return pl.pallas_call(
        functools.partial(_kernel, prec),
        grid=(M // BM,),
        in_specs=[pl.BlockSpec((BM, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((K, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BM, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
    )(x, w)


def bench(fn, *args, runs=20):
    y = fn(*args)
    y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(runs):
        y = fn(*args)
    y.block_until_ready()
    return (time.perf_counter() - t0) / runs, y


def main() -> int:
    setup()
    assert jax.default_backend() == "tpu"
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (M, K), jnp.float32)
    w = jax.random.normal(kw, (K, N), jnp.float32) * 0.05

    P = jax.lax.Precision
    exact = np.asarray(jax.jit(lambda a, b: jnp.dot(
        a, b, precision=P.HIGHEST, preferred_element_type=jnp.float32))(
        x, w), np.float32)
    scale = float(np.abs(exact).max())

    rows = {}

    def record(name, fn):
        try:
            dt, y = bench(jax.jit(fn), x, w)
            err = float(np.abs(np.asarray(y, np.float32) - exact).max())
            rows[name] = {"ms": round(dt * 1e3, 4),
                          "maxabs_vs_exact": err,
                          "rel": err / scale}
        except Exception as e:                       # Mosaic rejections
            rows[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(name, json.dumps(rows[name]))

    record("xla_f32_high", lambda a, b: jnp.dot(
        a, b, precision=P.HIGH, preferred_element_type=jnp.float32))
    record("xla_f32_default", lambda a, b: jnp.dot(
        a, b, precision=P.DEFAULT, preferred_element_type=jnp.float32))
    record("xla_bf16_default", lambda a, b: jnp.dot(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        precision=P.DEFAULT, preferred_element_type=jnp.float32))
    record("pallas_f32_default", lambda a, b: pallas_dot(a, b, P.DEFAULT))
    record("pallas_f32_highest", lambda a, b: pallas_dot(a, b, P.HIGHEST))
    record("pallas_f32_high", lambda a, b: pallas_dot(a, b, P.HIGH))

    out = os.path.join(os.path.dirname(__file__),
                       "pallas_f32_dot_probe.json")
    with open(out, "w") as f:
        json.dump({"shape": [M, K, N], "device": str(jax.devices()[0]),
                   "rows": rows}, f, indent=1)
    print("wrote", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

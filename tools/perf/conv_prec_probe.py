"""How does XLA:TPU price f32 conv precision, and can a manual hi/lo
bf16x3 decomposition beat lax.Precision.HIGH?

Times one decoder-class conv (512x512x256 -> 256, 3x3 SAME) at:
  bf16 DEFAULT (fast-mode reference)
  f32 DEFAULT / HIGH / HIGHEST
  manual 3-conv split: conv(xh,wh)+conv(xh,wl)+conv(xl,wh), all bf16
plus error of each vs the HIGHEST result.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from hdrvae.core.runtime import setup
setup()

H = W = 512
CIN = COUT = 256
DIMS = ("NHWC", "HWIO", "NHWC")

kx, kw = jax.random.split(jax.random.PRNGKey(0))
x = jax.random.normal(kx, (1, H, W, CIN), jnp.float32)
w = jax.random.normal(kw, (3, 3, CIN, COUT), jnp.float32) * 0.02


def conv(x, w, prec, dtype=jnp.float32):
    return jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), (1, 1), "SAME",
        dimension_numbers=DIMS, precision=prec,
        preferred_element_type=jnp.float32)


def split_hi_lo(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def conv_manual3(x, w):
    xh, xl = split_hi_lo(x)
    wh, wl = split_hi_lo(w)
    d = jax.lax.Precision.DEFAULT
    return (conv(xh, wh, d, jnp.bfloat16)
            + conv(xh, wl, d, jnp.bfloat16)
            + conv(xl, wh, d, jnp.bfloat16))


P = jax.lax.Precision
cases = {
    "f32_highest": jax.jit(lambda x, w: conv(x, w, P.HIGHEST)),
    "bf16_default": jax.jit(lambda x, w: conv(x, w, P.DEFAULT,
                                              jnp.bfloat16)),
    "f32_default": jax.jit(lambda x, w: conv(x, w, P.DEFAULT)),
    "f32_high": jax.jit(lambda x, w: conv(x, w, P.HIGH)),
    "manual3": jax.jit(conv_manual3),
}


def sync(y):
    np.asarray(jax.device_get(y[0, 0, 0, 0]))


ref = None
for name, fn in cases.items():
    y = fn(x, w)
    sync(y)
    # chained timing loop (tunnel rules: data-dependency chain, one fetch)
    runs = 20
    xx = x
    t0 = time.perf_counter()
    for _ in range(runs):
        y = fn(xx, w)
        xx = xx + y * 1e-9
    sync(xx)
    dt = (time.perf_counter() - t0) / runs
    ynp = np.asarray(fn(x, w), np.float32)
    if name == "f32_highest":
        ref = ynp
    err = float(np.abs(ynp - ref).max() / np.abs(ref).max()) if ref is not None else float("nan")
    print(f"{name:14s}: {dt*1e3:7.2f} ms   rel-err vs HIGHEST {err:.2e}",
          flush=True)

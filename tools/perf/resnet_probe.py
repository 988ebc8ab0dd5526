"""Price one level-0 resnet block (1024^2 x 128ch) under fast /
f32-default / mixed, and per-op profile the mixed one.  Finds where the
fused conv+GN HIGH overhead comes from."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from hdrvae.core.runtime import setup
setup()

import dataclasses

from hdrvae.core.config import DecoderConfig, Precision
from hdrvae.models.decoder import resnet_block, _init_resnet
from hdrvae.utils.profiling import op_profile

C = 128
H = W = 1024
p = _init_resnet(jax.random.PRNGKey(0), C, C)
x32 = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, C), jnp.float32)

cases = {
    "fast": Precision.fast(),
    "f32-default": dataclasses.replace(Precision.fast(),
                                       compute_dtype=jnp.float32,
                                       storage_dtype=jnp.float32,
                                       upstack="xla"),
    "mixed": Precision.mixed(),
}


def sync(y):
    np.asarray(jax.device_get(y.ravel()[0]))


for name, prec in cases.items():
    x_in = x32.astype(prec.storage_dtype)
    f = jax.jit(lambda t: resnet_block(t, p, num_groups=32,
                                       precision=prec))
    y = f(x_in)
    sync(y)
    runs = 10
    xx = x_in
    t0 = time.perf_counter()
    for _ in range(runs):
        xx = f(xx)
    sync(xx)
    dt = (time.perf_counter() - t0) / runs
    print(f"{name:12s}: {dt*1e3:7.2f} ms/block", flush=True)
    if name in ("mixed", "f32-default"):
        rows = op_profile(f, x_in, top=10)
        for op, n, ms in rows:
            print(f"    {ms:7.2f} ms x{n:<3d} {op}")

"""Test environment: force CPU backend with 8 virtual devices.

This is the standard JAX substitute for multi-chip testing without a real
cluster (SURVEY.md section 4e).  Must run before jax is imported anywhere.
"""

import os

# Hard override: the ambient environment presets JAX_PLATFORMS=axon (the
# real TPU tunnel) and a sitecustomize registers the axon backend at
# interpreter start, overriding the env var.  Backends initialize lazily,
# so steering jax.config back to CPU here (before any jax.devices() call)
# still works; XLA_FLAGS is read at backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# The suite is compile-dominated (hundreds of small jits on 1 CPU core);
# the persistent cache makes every run after the first fast.  Kept under
# a tests-specific dir so TPU/CLI cache entries are not mixed in.
from hdrvae.core import runtime  # noqa: E402

runtime.setup(os.path.expanduser("~/.cache/hdrvae/jax-tests"))

assert jax.device_count() >= 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()} on "
    f"{jax.default_backend()}")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from hdrvae.core.config import DecoderConfig  # noqa: E402


@pytest.fixture(scope="session")
def small_cfg() -> DecoderConfig:
    """Tiny Flux-shaped decoder: z=4ch, ch=16, 2 levels, attn on."""
    return DecoderConfig().with_small()


@pytest.fixture(scope="session")
def small_params(small_cfg):
    from hdrvae.models.decoder import init_decoder
    return init_decoder(jax.random.PRNGKey(0), small_cfg)


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same stream regardless of which
    # subset of the suite runs (order-independent determinism)
    return np.random.default_rng(1234)

"""Runtime setup: persistent compilation cache and platform helpers.

A 49M-param conv decoder takes O(minutes) to compile; the persistent cache
makes every process after the first start in milliseconds for known shapes.
Called by the CLI and bench entry points; library users can call
:func:`setup` themselves.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_DEFAULT_CACHE = os.path.expanduser("~/.cache/hdrvae/jax")


def setup(cache_dir: str | None = None) -> None:
    """Enable the persistent JAX compilation cache (idempotent).

    Disable with HDRVAE_NO_COMPILE_CACHE=1.
    """
    if os.environ.get("HDRVAE_NO_COMPILE_CACHE") == "1":
        return
    import jax

    cache_dir = cache_dir or os.environ.get("HDRVAE_COMPILE_CACHE",
                                            _DEFAULT_CACHE)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # config names can drift across jax versions
        logger.warning("could not enable the persistent compilation "
                       "cache: %s", e)

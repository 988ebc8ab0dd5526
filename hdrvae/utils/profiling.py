"""Tracing / profiling / numerics-debug utilities.

Replaces the reference's logging-based stage tracing (per-stage min/max
prints forcing device syncs, `hdr_vae_decode.py:506,511,873`; SURVEY.md
section 5 tracing row) with:

  - :func:`trace` — a `jax.profiler` trace context (view in TensorBoard /
    xprof), the structural replacement for print-profiling;
  - :class:`StageTimer` — coarse wall-clock stage timing that syncs ONCE
    per stage boundary, opt-in;
  - :func:`debug_nans` — scoped NaN checking for the logit/atanh edge cases
    (SURVEY.md section 5 race-detection row recommends jax_debug_nans).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Optional

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for the enclosed computation."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Wall-clock stage timer; each stage end blocks on a representative
    array (one sync per stage, not per stat)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.stages: Dict[str, float] = {}
        self._t0: Optional[float] = None
        self._name: Optional[str] = None

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.tree_util.tree_map(
                lambda x: x.block_until_ready()
                if hasattr(x, "block_until_ready") else x, block_on)
        self.stages[name] = time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.stages.values())
        lines = [f"total {total * 1e3:.1f} ms"]
        for name, dt in self.stages.items():
            lines.append(f"  {name}: {dt * 1e3:.1f} ms")
        return "\n".join(lines)


def op_profile(fn, *args, logdir: Optional[str] = None,
               top: int = 25) -> list:
    """Run ``fn(*args)`` once under a jax.profiler trace and return the
    aggregated per-op device times: a list of (name, count, total_ms)
    sorted by time, with fusion/kernel instance suffixes (``fusion.12``)
    merged per op class.

    This is how PERF_NOTES 5.10/5.12 were produced: XLA can hide a
    pathological lowering (an unfold that becomes a 5-TFLOP identity
    conv) behind a single innocuous op name — per-op totals surface it
    in one call.  Host-side frames (dispatch, fetches, python) are
    dropped.
    """
    import glob
    import gzip
    import json
    import os
    import re
    import tempfile

    logdir = logdir or tempfile.mkdtemp(prefix="hdrvae_prof_")
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready()
        if hasattr(x, "block_until_ready") else x, out)   # compile first
    jax.profiler.start_trace(logdir)
    try:
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready()
            if hasattr(x, "block_until_ready") else x, out)
    finally:
        jax.profiler.stop_trace()

    agg: Dict[str, list] = {}
    pattern = os.path.join(logdir, "**", "*.trace.json.gz")
    for path in glob.glob(pattern, recursive=True):
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        for e in data.get("traceEvents", []):
            if e.get("ph") != "X" or "dur" not in e:
                continue
            name = e.get("name", "?")
            if name.startswith(("$", "np.", "jit", "process_",
                                "PythonRefManager", "DevicePut")):
                continue
            key = re.sub(r"[.\d]+$", "", name)
            rec = agg.setdefault(key, [0, 0.0])
            rec[0] += 1
            rec[1] += e["dur"] / 1e3
    rows = sorted(((k, n, ms) for k, (n, ms) in agg.items()),
                  key=lambda r: -r[2])
    return rows[:top]


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped jax_debug_nans toggle (detects NaNs from saturated inverse
    activations during development)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)

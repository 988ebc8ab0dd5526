"""Tracing/profiling utilities (SURVEY.md section 5 tracing row)."""

import jax
import jax.numpy as jnp
import pytest

from hdrvae.utils.profiling import StageTimer, debug_nans, op_profile


def test_stage_timer_syncs_once_per_stage():
    t = StageTimer()
    with t.stage("a", block_on=None):
        x = jnp.ones((8, 8)) * 2.0
    with t.stage("b", block_on=x):
        x = x + 1.0
    assert set(t.stages) == {"a", "b"}
    assert all(dt >= 0.0 for dt in t.stages.values())
    assert "total" in t.report()


def test_stage_timer_disabled_records_nothing():
    t = StageTimer(enabled=False)
    with t.stage("a"):
        pass
    assert t.stages == {}


def test_debug_nans_scoped():
    prev = jax.config.jax_debug_nans
    with debug_nans(True):
        assert jax.config.jax_debug_nans is True
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.float32(-1.0)
                                          ).block_until_ready()
    assert jax.config.jax_debug_nans == prev


def test_op_profile_returns_sorted_rows(tmp_path):
    f = jax.jit(lambda x: jnp.tanh(x @ x) + 1.0)
    x = jnp.ones((64, 64))
    rows = op_profile(f, x, logdir=str(tmp_path), top=10)
    assert isinstance(rows, list)
    for name, n, ms in rows:
        assert isinstance(name, str) and n >= 1 and ms >= 0.0
    times = [ms for _, _, ms in rows]
    assert times == sorted(times, reverse=True)

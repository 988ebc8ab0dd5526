"""Pallas kernel tests (interpret mode on CPU — SURVEY.md section 4e)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hdrvae.kernels.attention import (spatial_attention_pallas,
                                      spatial_attention_xla)


class TestFlashAttention:
    @pytest.mark.parametrize("hw,c", [((16, 16), 128), ((20, 13), 128)])
    def test_matches_xla_reference(self, rng, hw, c):
        h, w = hw
        q, k, v = (jnp.asarray(rng.standard_normal((1, h, w, c)),
                               jnp.float32) for _ in range(3))
        ref = spatial_attention_xla(q, k, v)
        out = spatial_attention_pallas(q, k, v, block_q=128, block_k=128,
                                       interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_padding_path(self, rng):
        """Non-divisible N exercises the bias-channel padding mask."""
        q, k, v = (jnp.asarray(rng.standard_normal((1, 10, 10, 128)),
                               jnp.float32) for _ in range(3))
        ref = spatial_attention_xla(q, k, v)
        out = spatial_attention_pallas(q, k, v, block_q=64, block_k=64,
                                       interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_key_valid_mask(self, rng):
        """Masked keys (shape-bucketed pad exclusion) drop out of the
        softmax identically in the flag-channel Pallas path and the XLA
        bias path — both must equal plain attention over only the valid
        keys."""
        h, w, c = 16, 16, 128
        q, k, v = (jnp.asarray(rng.standard_normal((1, h, w, c)),
                               jnp.float32) for _ in range(3))
        valid_h, valid_w = 11, 13
        rows = jnp.arange(h)[:, None]
        cols = jnp.arange(w)[None, :]
        key_valid = (rows < valid_h) & (cols < valid_w)

        # ground truth: attention computed over ONLY the valid keys
        kv_idx = np.nonzero(np.asarray(key_valid).reshape(-1))[0]
        n = h * w
        qf = np.asarray(q).reshape(n, c)
        kf = np.asarray(k).reshape(n, c)[kv_idx]
        vf = np.asarray(v).reshape(n, c)[kv_idx]
        s = (qf * c ** -0.5) @ kf.T
        p = np.exp(s - s.max(axis=1, keepdims=True))
        truth = (p / p.sum(axis=1, keepdims=True)) @ vf

        xla = spatial_attention_xla(q, k, v, key_valid=key_valid)
        np.testing.assert_allclose(np.asarray(xla).reshape(n, c), truth,
                                   atol=2e-5, rtol=2e-5)
        pal = spatial_attention_pallas(q, k, v, block_q=64, block_k=64,
                                       interpret=True, key_valid=key_valid)
        np.testing.assert_allclose(np.asarray(pal).reshape(n, c), truth,
                                   atol=2e-5, rtol=2e-5)

    def test_extreme_logits_stable(self, rng):
        """Online softmax must stay finite with large score magnitudes."""
        q = jnp.asarray(rng.standard_normal((1, 8, 16, 128)) * 30,
                        jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 8, 16, 128)) * 30,
                        jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, 8, 16, 128)), jnp.float32)
        out = spatial_attention_pallas(q, k, v, block_q=128, block_k=128,
                                       interpret=True)
        assert np.isfinite(np.asarray(out)).all()
        ref = spatial_attention_xla(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-3)


class TestFusedEpilogue:
    def test_matches_reference_path(self, rng):
        """Fused collapse+stats kernel (interpret mode) == jnp reference."""
        from hdrvae.kernels.epilogue import collapse_and_stats_pallas
        from hdrvae.core.stats import tensor_stats
        from hdrvae.decode.formatting import collapse_channels_maxpool
        pre = jnp.asarray(rng.standard_normal((1, 5, 7, 128)) * 2,
                          jnp.float32)
        col, stats = collapse_and_stats_pallas(pre, interpret=True)
        ref_col = collapse_channels_maxpool(pre)
        ref_stats = tensor_stats(pre)
        np.testing.assert_array_equal(np.asarray(col), np.asarray(ref_col))
        for key in ("min", "max", "mean", "std"):
            np.testing.assert_allclose(float(stats[key]),
                                       float(ref_stats[key]), rtol=1e-5,
                                       atol=1e-6, err_msg=key)

    def test_non_divisible_rows(self, rng):
        """M not a multiple of the block size: tail masking is exact."""
        from hdrvae.kernels.epilogue import collapse_and_stats_pallas
        from hdrvae.core.stats import tensor_stats
        pre = jnp.asarray(rng.standard_normal((1, 3, 3, 12)), jnp.float32)
        col, stats = collapse_and_stats_pallas(pre, interpret=True)
        ref = tensor_stats(pre)
        np.testing.assert_allclose(float(stats["mean"]),
                                   float(ref["mean"]), rtol=1e-5)
        np.testing.assert_allclose(float(stats["max"]), float(ref["max"]))


@pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu",
    reason="Mosaic precision-flag behavior is only observable on real TPU")
def test_precise_flash_matches_f32_on_tpu(rng):
    """Guards the parity contract: the kernel's HIGHEST-precision dots must
    track the XLA f32-HIGHEST reference to ~1e-6 (if a Mosaic/jaxlib
    upgrade stops honoring the precision flag, this catches it)."""
    from hdrvae.core.config import Precision
    q, k, v = (jnp.asarray(rng.standard_normal((1, 64, 64, 512)),
                           jnp.float32) for _ in range(3))
    hi = np.asarray(spatial_attention_xla(q, k, v,
                                          precision=Precision.parity()))
    pa = np.asarray(spatial_attention_pallas(q, k, v, precise=True))
    rel = np.abs(pa - hi).max() / np.abs(hi).max()
    assert rel < 1e-5, rel


def test_fused_epilogue_variance_stability(rng):
    """|mean| >> std used to cancel catastrophically with E[x^2]-mean^2;
    the Chan combine must track the two-pass reference (review regression)."""
    from hdrvae.kernels.epilogue import collapse_and_stats_pallas
    from hdrvae.core.stats import tensor_stats
    pre = jnp.asarray(10.0 + 1e-3 * rng.standard_normal((1, 32, 32, 128)),
                      jnp.float32)
    _, stats = collapse_and_stats_pallas(pre, interpret=True)
    ref = tensor_stats(pre)
    np.testing.assert_allclose(float(stats["std"]), float(ref["std"]),
                               rtol=1e-3)
    np.testing.assert_allclose(float(stats["mean"]), float(ref["mean"]),
                               rtol=1e-6)


def test_flash_attention_three_pass_high():
    """The mixed tier's HIGH attention runs as the kernel's MANUAL bf16x3
    decomposition (_dot3 — Mosaic rejects HIGH dots).  In interpret mode
    the split arithmetic must land within the 3-pass error class of the
    exact f32 reference — far below 1-pass bf16's ~1e-2 (which would
    indicate the convert pairs got folded away)."""
    import jax
    from hdrvae.core.config import Precision
    from hdrvae.kernels.attention import spatial_attention_xla

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    shape = (1, 16, 16, 128)
    q = jax.random.normal(k1, shape) * 0.5
    k = jax.random.normal(k2, shape) * 0.5
    v = jax.random.normal(k3, shape)
    ref = spatial_attention_xla(q, k, v, precision=Precision.parity())
    out = spatial_attention_pallas(q, k, v, block_q=64, block_k=64,
                                   interpret=True,
                                   precise=jax.lax.Precision.HIGH)
    err = float(jnp.abs(out - ref).max())
    # 1.3e-6 measured: the bf16x3 class.  A folded split would collapse
    # to 1-pass bf16's ~1e-2 (on TPU; CPU interpret-mode DEFAULT dots
    # are exact f32, so only the upper bound is meaningful here — the
    # on-chip discrimination lives in tpu_checks.py check_attention).
    assert 1e-8 < err < 1e-4, f"3-pass attention error {err:.2e}"

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

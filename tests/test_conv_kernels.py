"""Pallas up-stack conv kernels vs the XLA layer implementations.

Runs in interpret mode on the CPU backend (tests/conftest.py forces CPU);
the real-chip numbers live in PERF_NOTES.md.  The float32 cases validate
the kernel MATH exactly (1e-5); the bf16 case bounds the fast-mode
rounding difference (the kernel adds the residual in f32 before the
storage cast, the XLA path after — documented in models/pallas_tail.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from hdrvae.core.config import DecoderConfig, Precision
from hdrvae.kernels.conv3x3 import conv3x3_pallas, fused_conv3x3
from hdrvae.models.decoder import decoder_head, decoder_tail, init_decoder
from hdrvae.models.layers import GNTape
from hdrvae.models.pallas_tail import upstack_apply

DIMS = ("NHWC", "HWIO", "NHWC")


def _xla_conv(x, k, b):
    y = jax.lax.conv_general_dilated(
        x[None].astype(jnp.float32), k.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=DIMS)
    return y[0] + b


def _rand(key, shape, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(key), shape,
                             jnp.float32) * scale


class TestConv3x3:
    @pytest.mark.parametrize("h,w,cin,cout,br,cb", [
        (16, 24, 8, 8, 4, None),
        (16, 16, 8, 16, 2, 8),      # cout chunked
        (12, 40, 16, 8, 4, None),   # unaligned w -> right-pad path
    ])
    def test_matches_xla(self, h, w, cin, cout, br, cb):
        x = _rand(0, (h, w, cin))
        k = _rand(1, (3, 3, cin, cout), 0.2)
        b = _rand(2, (cout,))
        ref = np.asarray(_xla_conv(x, k, b))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(conv3x3_pallas(x, k, b, block_rows=br,
                                            cout_block=cb))
        np.testing.assert_allclose(got, ref, atol=1e-5)

    # col-block counts 2 and 4 exercise the column-halo DMA variants
    @pytest.mark.parametrize("h,w,cin,cout,br,wb", [
        (8, 32, 8, 8, 4, 16),       # nj=2: first/last col windows
        (16, 64, 8, 8, 4, 16),      # nj=4: interior col windows too
    ])
    def test_column_blocked(self, h, w, cin, cout, br, wb):
        x = _rand(0, (h, w, cin))
        k = _rand(1, (3, 3, cin, cout), 0.2)
        b = _rand(2, (cout,))
        g = _rand(3, (cin,), 0.5)
        bt = _rand(4, (cin,), 0.5)
        z = x * g + bt
        z = z * jax.nn.sigmoid(z)
        ref = np.asarray(_xla_conv(z, k, b))
        with pltpu.force_tpu_interpret_mode():
            got, (ssum, ssq) = fused_conv3x3(
                x, k, b, gamma=g, beta=bt, emit_stats=True, num_groups=4,
                block_rows=br, block_cols=wb)
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)
        grouped = ref.reshape(h * w, 4, cout // 4)
        np.testing.assert_allclose(np.asarray(ssum),
                                   grouped.sum(axis=(0, 2)), rtol=1e-4)

    @pytest.mark.parametrize("h,w,br,wb", [(8, 32, 4, 16), (8, 48, 4, 16)])
    def test_column_blocked_upsample(self, h, w, br, wb):
        from hdrvae.kernels.conv3x3 import upsample_conv3x3
        cin = cout = 8
        x = _rand(0, (h, w, cin))
        k = _rand(1, (3, 3, cin, cout), 0.2)
        b = _rand(2, (cout,))
        up = jnp.broadcast_to(x[:, None, :, None, :], (h, 2, w, 2, cin))
        up = up.reshape(2 * h, 2 * w, cin)
        ref = np.asarray(_xla_conv(up, k, b))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(upsample_conv3x3(x, k, b, block_rows=br,
                                              block_cols=wb))
        np.testing.assert_allclose(got, ref, atol=1e-5)


class TestFusedConv:
    def _prologue_ref(self, x, gamma, beta):
        z = x * gamma + beta
        return z * jax.nn.sigmoid(z)

    def test_prologue(self):
        h, w, c = 16, 16, 8
        x, k, b = _rand(0, (h, w, c)), _rand(1, (3, 3, c, c), 0.2), _rand(2, (c,))
        gamma, beta = _rand(3, (c,), 0.5), _rand(4, (c,), 0.5)
        ref = np.asarray(_xla_conv(self._prologue_ref(x, gamma, beta), k, b))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fused_conv3x3(x, k, b, gamma=gamma, beta=beta,
                                           num_groups=4, block_rows=4))
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_residual_add_and_stats(self):
        h, w, c, g = 16, 16, 8, 4
        x, k, b = _rand(0, (h, w, c)), _rand(1, (3, 3, c, c), 0.2), _rand(2, (c,))
        r = _rand(5, (h, w, c))
        ref = np.asarray(_xla_conv(x, k, b)) + np.asarray(r)
        with pltpu.force_tpu_interpret_mode():
            got, (ssum, ssq) = fused_conv3x3(
                x, k, b, residual=r, emit_stats=True, num_groups=g,
                block_rows=4)
        got = np.asarray(got)
        np.testing.assert_allclose(got, ref, atol=1e-5)
        # group partials over channel groups of size c//g
        grouped = ref.reshape(h * w, g, c // g)
        np.testing.assert_allclose(np.asarray(ssum),
                                   grouped.sum(axis=(0, 2)), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ssq),
                                   np.square(grouped).sum(axis=(0, 2)),
                                   rtol=1e-5)

    def test_residual_projection(self):
        h, w, cin, cout = 16, 16, 16, 8
        x = _rand(0, (h, w, cin))
        k, b = _rand(1, (3, 3, cin, cout), 0.2), _rand(2, (cout,))
        rk = _rand(6, (cin, cout), 0.3)
        ref = np.asarray(_xla_conv(x, k, b)) + np.asarray(x) @ np.asarray(rk)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fused_conv3x3(x, k, b, residual=x,
                                           res_kernel=rk, num_groups=4,
                                           block_rows=4))
        np.testing.assert_allclose(got, ref, atol=1e-5)


class TestUpsampleConv:
    """Fused 2x-nearest-upsample + conv3x3 (phase decomposition) vs the
    XLA sequence upsample -> conv."""

    def _ref(self, x, k, b):
        h, w, c = x.shape
        up = jnp.broadcast_to(x[:, None, :, None, :], (h, 2, w, 2, c))
        up = up.reshape(2 * h, 2 * w, c)
        return np.asarray(_xla_conv(up, k, b))

    # block counts 1, 2, and >2 exercise all three halo-DMA variants
    @pytest.mark.parametrize("h,w,cin,cout,br,g", [
        (8, 16, 8, 8, 8, 4),     # n=1
        (8, 16, 8, 8, 4, 4),     # n=2
        (16, 16, 16, 8, 4, 4),   # n=4, channel change
    ])
    def test_matches_upsample_then_conv(self, h, w, cin, cout, br, g):
        from hdrvae.kernels.conv3x3 import upsample_conv3x3
        x = _rand(0, (h, w, cin))
        k = _rand(1, (3, 3, cin, cout), 0.2)
        b = _rand(2, (cout,))
        ref = self._ref(x, k, b)
        with pltpu.force_tpu_interpret_mode():
            got, (ssum, ssq) = upsample_conv3x3(
                x, k, b, emit_stats=True, num_groups=g, block_rows=br)
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)
        grouped = ref.reshape(4 * h * w, g, cout // g)
        np.testing.assert_allclose(np.asarray(ssum),
                                   grouped.sum(axis=(0, 2)), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(ssq),
                                   np.square(grouped).sum(axis=(0, 2)),
                                   rtol=1e-4)


    def test_act_epilogue(self):
        from hdrvae.kernels.conv3x3 import upsample_conv3x3
        h, w, c = 8, 16, 8
        x = _rand(0, (h, w, c))
        k = _rand(1, (3, 3, c, c), 0.2)
        b = _rand(2, (c,))
        conv = self._ref(x, k, b)
        ref = np.where(conv >= 0, conv, 0.2 * conv)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(upsample_conv3x3(x, k, b, act="lrelu",
                                              block_rows=4))
        np.testing.assert_allclose(got, ref, atol=1e-5)


class TestDenseConv:
    """Multi-input (concat-free) dense conv vs XLA concat + conv."""

    def test_multi_input_act_residual(self):
        from hdrvae.kernels.conv3x3 import dense_conv3x3
        h, w = 8, 16
        xs = [_rand(i, (h, w, c)) for i, c in enumerate((8, 8, 16))]
        cin, cout = 32, 8
        k = _rand(5, (3, 3, cin, cout), 0.2)
        b = _rand(6, (cout,))
        r = _rand(7, (h, w, cout))
        cat = jnp.concatenate(xs, axis=-1)
        conv = np.asarray(_xla_conv(cat, k, b))
        ref = np.asarray(r) + 0.2 * np.where(conv >= 0, conv, 0.2 * conv)
        with pltpu.force_tpu_interpret_mode():
            got = dense_conv3x3(xs, k, b, act="lrelu", residual=r,
                                res_scale=0.2, block_rows=4,
                                block_cols=8)
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)

    @pytest.mark.slow
    def test_rrdbnet_chain_matches_xla(self):
        import dataclasses
        from hdrvae.models.rrdbnet import (RRDBNetConfig, init_rrdbnet,
                                           rrdbnet_apply)
        from hdrvae.models.rrdbnet_pallas import rrdbnet_pallas_apply
        cfg = RRDBNetConfig().with_small()
        params = init_rrdbnet(jax.random.PRNGKey(0), cfg)
        x = _rand(1, (1, 8, 16, cfg.in_channels), 0.5)
        prec = Precision(compute_dtype=jnp.float32,
                         storage_dtype=jnp.float32, mode="fast")
        ref = np.asarray(rrdbnet_apply(params, x, cfg, precision=prec))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(rrdbnet_pallas_apply(params, x[0], cfg,
                                                  precision=prec)[None])
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=5e-5)


class TestPaddedChain:
    """Padded chain layout: x_padded / padded_out round trip (the
    full_c manual-output path for single-chunk couts included)."""

    def test_padded_roundtrip_small_cout(self):
        from hdrvae.kernels.conv3x3 import fused_conv3x3, pad_chain_input
        h, w, c = 8, 16, 8
        x = _rand(0, (h, w, c))
        k = _rand(1, (3, 3, c, c), 0.2)
        b = _rand(2, (c,))
        ref = np.asarray(_xla_conv(x, k, b))
        with pltpu.force_tpu_interpret_mode():
            yp = fused_conv3x3(pad_chain_input(x), k, b, x_padded=True,
                               padded_out=True, block_rows=4)
            # consume the padded output with a second kernel: identity
            # 3x3 (center tap) recovers the interior exactly
            ident = jnp.zeros((3, 3, c, c), jnp.float32).at[
                1, 1].set(jnp.eye(c))
            y = fused_conv3x3(yp, ident, jnp.zeros((c,)), x_padded=True,
                              padded_out=False, block_rows=4)
        np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)


class TestGates:
    """upstack='pallas' must RAISE when unsupported (silent XLA fallback
    makes kernel-path benchmarks lie) and 'auto'/'xla' must fall back."""

    def test_rrdbnet_pallas_raises_on_cpu(self):
        import dataclasses
        from hdrvae.models.rrdbnet import (RRDBNetConfig, init_rrdbnet,
                                           rrdbnet_apply)
        cfg = RRDBNetConfig().with_small()
        params = init_rrdbnet(jax.random.PRNGKey(0), cfg)
        x = _rand(0, (1, 8, 16, cfg.in_channels))
        prec = dataclasses.replace(Precision.fast(), upstack="pallas")
        with pytest.raises(ValueError, match="pallas"):
            rrdbnet_apply(params, x, cfg, precision=prec)
        # auto silently falls back on CPU
        out = rrdbnet_apply(params, x, cfg, precision=Precision.fast())
        assert out.shape == (1, 16, 32, cfg.out_channels)

    def test_supported_rejects_wide_channels(self):
        import dataclasses
        from hdrvae.models.rrdbnet import RRDBNetConfig
        from hdrvae.models.rrdbnet_pallas import rrdbnet_pallas_supported
        wide = dataclasses.replace(RRDBNetConfig(), nf=256)
        prec = dataclasses.replace(Precision.fast(), upstack="auto")
        assert not rrdbnet_pallas_supported(prec, 1, 512, wide)


class TestUpstack:
    """The full Pallas chain (conv_in + mid + up stack) vs the XLA
    decoder layers."""

    def _run(self, precision, small_cfg, latent_hw=8):
        from hdrvae.models.pallas_tail import pallas_forward
        params = init_decoder(jax.random.PRNGKey(0), small_cfg)
        z = _rand(1, (1, latent_hw, latent_hw, small_cfg.z_channels), 2.0)
        with pltpu.force_tpu_interpret_mode():
            pre, mom = pallas_forward(params, z, small_cfg,
                                      precision=precision)
        inject = GNTape("inject", [(mom[0][None], mom[1][None])])
        got = decoder_tail(params, pre[None], small_cfg, precision=precision,
                           tail_levels=0, tape=inject)

        x = decoder_head(params, z, small_cfg, precision=precision,
                         tail_levels=0)
        ref = decoder_tail(params, x, small_cfg, precision=precision,
                           tail_levels=0)
        return got, ref

    @pytest.mark.slow
    def test_f32_exact(self, small_cfg):
        """float32 fast-mode storage: identical math, 1e-5 agreement."""
        prec = Precision(compute_dtype=jnp.float32,
                         storage_dtype=jnp.float32, mode="fast")
        got, ref = self._run(prec, small_cfg)
        np.testing.assert_allclose(np.asarray(got.rgb, np.float32),
                                   np.asarray(ref.rgb, np.float32),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(got.pre_conv_out, np.float32),
                                   np.asarray(ref.pre_conv_out, np.float32),
                                   atol=2e-5)

    @pytest.mark.slow
    def test_lowmem_residual_fold(self, small_cfg):
        """The low-memory top level (residual branch recomputed from the
        pre-upsample map with the nin_shortcut FOLDED into the upsample
        conv's weights — models/pallas_tail.py `_resnet_block`) is the
        same linear function as keeping the upsampled map live: f32
        agreement to reassociation error.  This is the path that brings
        whole-image 4096^2 decode under v5e HBM (VERDICT round 2 item 4)."""
        params = init_decoder(jax.random.PRNGKey(0), small_cfg)
        x = _rand(1, (8, 8, small_cfg.ch * small_cfg.ch_mult[-1]), 2.0)
        prec = Precision(compute_dtype=jnp.float32,
                         storage_dtype=jnp.float32, mode="fast")
        with pltpu.force_tpu_interpret_mode():
            a, ma = upstack_apply(params, x, small_cfg, precision=prec,
                                  lowmem=False)
            b, mb = upstack_apply(params, x, small_cfg, precision=prec,
                                  lowmem=True)
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ma[0]), np.asarray(mb[0]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(ma[1]), np.asarray(mb[1]),
                                   atol=1e-6)

    @pytest.mark.slow
    def test_bf16_close(self, small_cfg):
        """bf16 storage: residual-add rounding differs by design; bound it
        at a few bf16 ulps of the activation scale."""
        got, ref = self._run(Precision.fast(), small_cfg)
        rp = np.asarray(ref.pre_conv_out, np.float32)
        gp = np.asarray(got.pre_conv_out, np.float32)
        scale = max(np.abs(rp).max(), 1.0)
        assert np.abs(gp - rp).max() <= 0.02 * scale
        r = np.asarray(ref.rgb, np.float32)
        g = np.asarray(got.rgb, np.float32)
        assert np.abs(g - r).max() <= 0.02


class TestJunctionTapOuter:
    """The conv2 loop-order variant of the streaming junction kernel
    (tap-outer: 9 MXU weight loads instead of 36) must be BIT-identical
    to the phase-outer order — same tap products accumulated in the same
    per-phase (di, dj) sequence."""

    def test_bit_identical(self):
        from hdrvae.kernels.conv3x3 import _MG, upconv_gn_conv3x3
        h, w, cin, cm, cout = 8, 16, 8, 8, 8
        x = _rand(0, (h + 4, w + 2 * _MG, cin))
        upk = _rand(1, (3, 3, cin, cm), 0.2)
        upb = _rand(2, (cm,))
        gamma, beta = _rand(3, (cm,), 0.5), _rand(4, (cm,), 0.5)
        k2, b2 = _rand(5, (3, 3, cm, cout), 0.2), _rand(6, (cout,))
        outs = []
        for tap_outer in (False, True):
            with pltpu.force_tpu_interpret_mode():
                y, (ssum, ssq) = upconv_gn_conv3x3(
                    x, upk, upb, gamma, beta, k2, b2, emit_stats=True,
                    num_groups=4, block_rows=4, block_cols=8,
                    tap_outer=tap_outer)
            outs.append((np.asarray(y), np.asarray(ssum),
                         np.asarray(ssq)))
        for a, b in zip(outs[0], outs[1]):
            np.testing.assert_array_equal(a, b)

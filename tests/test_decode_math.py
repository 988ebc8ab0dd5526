"""Unit tests for the pure HDR math (SURVEY.md section 4a): inverse
activations, sRGB, MAX-pool collapse, the four modes — goldened against a
literal numpy transcription of the reference equations."""

import jax.numpy as jnp
import numpy as np
import pytest

from hdrvae.core.color import (linear_to_srgb, rgb_to_ycbcr, srgb_to_linear,
                               ycbcr_to_rgb)
from hdrvae.core.config import HDRDecodeConfig
from hdrvae.decode import modes
from hdrvae.decode.formatting import collapse_channels_maxpool, to_nhwc_rgb


# --- numpy oracle: literal reference math ---------------------------------

def np_srgb_to_linear(x):
    a = np.abs(x)
    out = np.where(a <= 0.04045, a / 12.92, ((a + 0.055) / 1.055) ** 2.4)
    return np.sign(x) * out


def np_inverse_sigmoid(x, eps=1e-7):
    c = np.clip(x, eps, 1 - eps)
    return np.log(c / (1 - c))


def np_inverse_tanh(x, eps=1e-6):
    return np.arctanh(np.clip(x, -1 + eps, 1 - eps))


def np_maxpool_128_to_3(x_nhwc):
    r = x_nhwc[..., 0:42].max(-1)
    g = x_nhwc[..., 42:84].max(-1)
    b = x_nhwc[..., 84:126].max(-1)
    return np.stack([r, g, b], -1)


# --- tests -----------------------------------------------------------------

class TestInverseActivations:
    def test_inverse_sigmoid_matches(self, rng):
        x = rng.uniform(-0.2, 1.2, (4, 5)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(modes.inverse_sigmoid(jnp.asarray(x))),
            np_inverse_sigmoid(x), rtol=2e-4, atol=2e-4)  # XLA fast-log

    def test_inverse_tanh_matches(self, rng):
        x = rng.uniform(-1.5, 1.5, (4, 5)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(modes.inverse_tanh(jnp.asarray(x))),
            np_inverse_tanh(x), rtol=2e-4, atol=2e-4)  # XLA fast-atanh

    def test_saturation_is_finite(self):
        """eps clamps keep logit/atanh finite at exactly 0/1/-1
        (`hdr_vae_decode.py:929-938`)."""
        x = jnp.asarray([0.0, 1.0, 0.5], jnp.float32)
        assert np.isfinite(np.asarray(modes.inverse_sigmoid(x))).all()
        x = jnp.asarray([-1.0, 1.0, 0.0], jnp.float32)
        assert np.isfinite(np.asarray(modes.inverse_tanh(x))).all()

    def test_round_trips(self, rng):
        x = rng.uniform(0.05, 0.95, (8,)).astype(np.float32)
        back = 1.0 / (1.0 + np.exp(-np.asarray(
            modes.inverse_sigmoid(jnp.asarray(x)))))
        np.testing.assert_allclose(back, x, atol=2e-4)


class TestColor:
    def test_srgb_linear_matches_reference(self, rng):
        x = rng.uniform(-1.5, 2.0, (3, 4, 3)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(srgb_to_linear(jnp.asarray(x))),
            np_srgb_to_linear(x), rtol=2e-4, atol=1e-5)  # XLA fast-pow

    def test_srgb_sign_preserving(self):
        """Negatives survive the EOTF (`hdr_vae_decode.py:1183-1201`)."""
        x = jnp.asarray([-0.5, -0.01, 0.01, 0.5], jnp.float32)
        y = np.asarray(srgb_to_linear(x))
        assert (np.sign(y) == np.asarray([-1, -1, 1, 1])).all()

    def test_srgb_round_trip(self, rng):
        x = rng.uniform(-2, 2, (16,)).astype(np.float32)
        y = np.asarray(linear_to_srgb(srgb_to_linear(jnp.asarray(x))))
        np.testing.assert_allclose(y, x, atol=5e-4)

    def test_ycbcr_round_trip_unclamped(self, rng):
        """HDR values >1 and <0 must survive YCbCr round trip — the whole
        reason the reference reimplemented kornia's converter
        (`hdr_upscale_with_model.py:19-48`)."""
        x = rng.uniform(-2.0, 9.0, (2, 4, 4, 3)).astype(np.float32)
        y = np.asarray(ycbcr_to_rgb(rgb_to_ycbcr(jnp.asarray(x))))
        # The reference's inverse uses ROUNDED coefficients (1.403 vs
        # 1/0.713 = 1.40252...), so the round trip is only ~1e-3 exact;
        # we replicate its coefficients, not an idealized inverse.
        np.testing.assert_allclose(y, x, rtol=2e-3, atol=5e-3)

    def test_ycbcr_coefficients(self):
        """Inverse uses the reference's exact coefficients
        (`hdr_upscale_with_model.py:45-47`)."""
        ycbcr = jnp.asarray([[[[0.5, 0.6, 0.7]]]], jnp.float32)
        rgb = np.asarray(ycbcr_to_rgb(ycbcr))[0, 0, 0]
        y, cb, cr = 0.5, 0.6 - 0.5, 0.7 - 0.5
        np.testing.assert_allclose(
            rgb, [y + 1.403 * cr, y - 0.714 * cr - 0.344 * cb,
                  y + 1.773 * cb], rtol=1e-6)


class TestMaxPoolCollapse:
    def test_128_channel_special_case(self, rng):
        x = rng.standard_normal((1, 2, 2, 128)).astype(np.float32)
        out = np.asarray(collapse_channels_maxpool(jnp.asarray(x)))
        np.testing.assert_array_equal(out, np_maxpool_128_to_3(x))

    def test_drops_channels_126_127(self, rng):
        """The reference's slice bounds discard the last 2 of 128 channels
        (`hdr_vae_decode.py:231-233`) — replicated exactly."""
        x = np.zeros((1, 1, 1, 128), np.float32)
        x[..., 126] = 99.0
        x[..., 127] = 99.0
        out = np.asarray(collapse_channels_maxpool(jnp.asarray(x)))
        assert out.max() <= 0.0

    def test_generic_grouping(self, rng):
        x = rng.standard_normal((1, 2, 2, 30)).astype(np.float32)
        out = np.asarray(collapse_channels_maxpool(jnp.asarray(x)))
        np.testing.assert_array_equal(out[..., 0], x[..., 0:10].max(-1))
        np.testing.assert_array_equal(out[..., 2], x[..., 20:30].max(-1))

    def test_max_preserves_hdr_peaks(self):
        """MAX, not mean — 'averaging destroys HDR range'
        (`hdr_vae_decode.py:229-230`)."""
        x = np.full((1, 1, 1, 128), 0.1, np.float32)
        x[..., 7] = 5.0
        out = np.asarray(collapse_channels_maxpool(jnp.asarray(x)))
        assert out[..., 0] == pytest.approx(5.0)

    def test_identity_and_small_channels(self, rng):
        x3 = rng.standard_normal((1, 2, 2, 3)).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(collapse_channels_maxpool(jnp.asarray(x3))), x3)
        x1 = rng.standard_normal((1, 2, 2, 1)).astype(np.float32)
        out = np.asarray(collapse_channels_maxpool(jnp.asarray(x1)))
        assert out.shape[-1] == 3

    def test_to_nhwc_rgb_layouts(self, rng):
        nchw = rng.standard_normal((1, 3, 4, 5)).astype(np.float32)
        out = np.asarray(to_nhwc_rgb(jnp.asarray(nchw)))
        np.testing.assert_array_equal(out, nchw.transpose(0, 2, 3, 1))
        nchw128 = rng.standard_normal((1, 128, 4, 5)).astype(np.float32)
        out = np.asarray(to_nhwc_rgb(jnp.asarray(nchw128)))
        assert out.shape == (1, 4, 5, 3)
        hwc = rng.standard_normal((4, 5, 3)).astype(np.float32)
        assert to_nhwc_rgb(jnp.asarray(hwc)).shape == (1, 4, 5, 3)

    def test_to_nhwc_rgb_spatial_larger_than_channels(self, rng):
        """The realistic big-image cases: a 128-channel map whose spatial
        dims EXCEED the channel count must not have a spatial axis
        collapsed as channels (in either layout)."""
        nchw = rng.standard_normal((1, 128, 130, 140)).astype(np.float32)
        out = np.asarray(to_nhwc_rgb(jnp.asarray(nchw)))
        assert out.shape == (1, 130, 140, 3)
        expected = np.asarray(collapse_channels_maxpool(
            jnp.asarray(nchw.transpose(0, 2, 3, 1))))
        np.testing.assert_array_equal(out, expected)

        nhwc = rng.standard_normal((1, 130, 140, 128)).astype(np.float32)
        out = np.asarray(to_nhwc_rgb(jnp.asarray(nhwc)))
        assert out.shape == (1, 130, 140, 3)
        np.testing.assert_array_equal(
            out, np.asarray(collapse_channels_maxpool(jnp.asarray(nhwc))))

    def test_to_nhwc_rgb_square_spatial_tiebreak(self, rng):
        """Neither axis is 3 or 128: the equal spatial pair decides."""
        nchw = rng.standard_normal((1, 64, 48, 48)).astype(np.float32)
        assert to_nhwc_rgb(jnp.asarray(nchw)).shape == (1, 48, 48, 3)
        nhwc = rng.standard_normal((1, 48, 48, 64)).astype(np.float32)
        assert to_nhwc_rgb(jnp.asarray(nhwc)).shape == (1, 48, 48, 3)
        gray = rng.standard_normal((1, 6, 7, 1)).astype(np.float32)
        out = np.asarray(to_nhwc_rgb(jnp.asarray(gray)))
        assert out.shape == (1, 6, 7, 3)


class TestModes:
    """Mode math vs literal reference equations on synthetic maps."""

    def setup_method(self):
        rng = np.random.default_rng(7)
        self.cfg = HDRDecodeConfig()
        self.base = rng.uniform(0.0, 1.0, (1, 4, 4, 3)).astype(np.float32)
        self.pre = rng.uniform(0.2, 3.0, (1, 4, 4, 3)).astype(np.float32)

    def test_conservative_matches_reference_formula(self):
        """`hdr_vae_decode.py:966-969`: where(pre>1):
        base + (pre-1)*factor*base."""
        factor = 2.5
        out = np.asarray(modes.conservative(
            jnp.asarray(self.base), jnp.asarray(self.pre), factor))
        mask = self.pre > 1.0
        expected = np.where(
            mask, self.base + (self.pre - 1.0) * factor * self.base,
            self.base)
        np.testing.assert_allclose(out, expected, rtol=1e-6)

    def test_conservative_no_highlights_is_identity(self):
        pre_ldr = np.full_like(self.pre, 0.5)
        out = np.asarray(modes.conservative(
            jnp.asarray(self.base), jnp.asarray(pre_ldr), 3.0))
        np.testing.assert_array_equal(out, self.base)

    def test_exposure_matches_reference_formula(self):
        """`hdr_vae_decode.py:996-999`: ldr * 2^log2(clamp(map, 0.001))."""
        out = np.asarray(modes.exposure(
            jnp.asarray(self.base), jnp.asarray(self.pre), self.cfg))
        expected = self.base * np.power(
            2.0, np.log2(np.clip(self.pre, 0.001, None)))
        np.testing.assert_allclose(out, expected, rtol=1e-5)

    def test_mathematical_recovery_formula(self):
        aligned = self.pre - self.pre.mean() + 1.0
        out = np.asarray(modes.mathematical_recovery(
            jnp.asarray(self.base), jnp.asarray(aligned), self.cfg))
        expected = self.base * np.clip(aligned, 0.001, None)
        np.testing.assert_allclose(out, expected, rtol=1e-5)

    def test_adaptive_recovery_compresses_highlights(self):
        """`hdr_vae_decode.py:1114-1147` with compression engaged."""
        pre_stats = {"max": jnp.float32(2.0), "min": jnp.float32(-1.0),
                     "mean": jnp.float32(0.5)}
        aligned = np.array(
            [[[[0.5, 1.0, 4.0]]]], np.float32)  # max 4 > pre_max 2
        out = np.asarray(modes.adaptive_recovery(
            jnp.ones_like(jnp.asarray(aligned)), jnp.asarray(aligned),
            pre_stats, self.cfg))
        factor = (2.0 - 1.0) / (4.0 - 1.0)
        exp_map = np.where(aligned > 1.0, (aligned - 1.0) * factor + 1.0,
                           aligned)
        np.testing.assert_allclose(
            out, np.clip(exp_map, 0.001, None), rtol=1e-5)

    def test_adaptive_recovery_no_compression_when_within_range(self):
        pre_stats = {"max": jnp.float32(5.0), "min": jnp.float32(-1.0),
                     "mean": jnp.float32(0.5)}
        aligned = np.array([[[[0.5, 1.0, 3.0]]]], np.float32)
        out = np.asarray(modes.adaptive_recovery(
            jnp.ones_like(jnp.asarray(aligned)), jnp.asarray(aligned),
            pre_stats, self.cfg))
        np.testing.assert_allclose(out, np.clip(aligned, 0.001, None),
                                   rtol=1e-5)

    def test_recovery_maps_no_hdr_gate(self):
        """Without HDR data the aligned map is identically 1.0 and
        map_recovered is the collapsed pre map (`hdr_vae_decode.py:1080-1081`)."""
        pre_ldr = jnp.asarray(np.full((1, 2, 2, 3), 0.5, np.float32))
        std = jnp.asarray(np.full((1, 2, 2, 3), 0.5, np.float32))
        stats = {"max": jnp.float32(0.5), "min": jnp.float32(0.0),
                 "mean": jnp.float32(0.25), "std": jnp.float32(0.1)}
        maps = modes.build_recovery_maps(std, pre_ldr, stats,
                                         jnp.int32(modes.NORM_SIGMOID))
        assert not bool(maps.has_hdr_data)
        np.testing.assert_array_equal(np.asarray(maps.map_recovered_aligned),
                                      np.ones((1, 2, 2, 3), np.float32))
        np.testing.assert_array_equal(np.asarray(maps.map_recovered),
                                      np.asarray(pre_ldr))

    def test_recovery_maps_hdr_path(self):
        """With HDR data: inverse-activate, min-max rescale into
        [pre_min, pre_max], midtone-align (`hdr_vae_decode.py:1082-1102`)."""
        rng = np.random.default_rng(3)
        std = rng.uniform(0.05, 0.95, (1, 3, 3, 3)).astype(np.float32)
        pre = rng.uniform(0.5, 2.0, (1, 3, 3, 3)).astype(np.float32)
        pre[0, 0, 0, 0] = 2.5  # ensure gate opens
        stats = {"max": jnp.float32(2.5), "min": jnp.float32(-0.5),
                 "mean": jnp.float32(0.9), "std": jnp.float32(0.4)}
        maps = modes.build_recovery_maps(
            jnp.asarray(std), jnp.asarray(pre), stats,
            jnp.int32(modes.NORM_SIGMOID))
        assert bool(maps.has_hdr_data)
        rec = np_inverse_sigmoid(std)
        rec_n = (rec - rec.min()) / (rec.max() - rec.min())
        rescaled = rec_n * (2.5 - (-0.5)) + (-0.5)
        np.testing.assert_allclose(np.asarray(maps.map_recovered), rescaled,
                                   rtol=5e-4, atol=1e-4)  # XLA fast-log
        np.testing.assert_allclose(np.asarray(maps.map_recovered_aligned),
                                   rescaled - 0.9 + 1.0, rtol=5e-4,
                                   atol=1e-4)

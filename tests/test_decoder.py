"""Decoder parity + contract tests (SURVEY.md section 4b: small
randomly-initialized Flux-shaped decoder fixture)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from hdrvae.core.config import DecoderConfig, Precision
from hdrvae.models.decoder import decoder_apply, init_decoder, param_count
from hdrvae.models.params import (decoder_params_from_state_dict,
                                  decoder_params_to_state_dict)
from tests.torch_oracle import torch_decoder_from_jax


def _latent(rng, cfg, b=1, h=8, w=8):
    return rng.standard_normal((b, h, w, cfg.z_channels)).astype(np.float32)


class TestDecoderParity:
    def test_matches_torch_oracle(self, small_cfg, small_params, rng):
        """JAX decoder == independent torch implementation to <=1e-5
        (SURVEY.md section 7, build order M0)."""
        z = _latent(rng, small_cfg)
        oracle = torch_decoder_from_jax(small_params, small_cfg)
        rgb_t, pre_t = oracle(torch.from_numpy(z).permute(0, 3, 1, 2))

        out = decoder_apply(small_params, jnp.asarray(z), small_cfg,
                            precision=Precision.parity())
        rgb_j = np.asarray(out.rgb)
        pre_j = np.asarray(out.pre_conv_out)

        np.testing.assert_allclose(
            rgb_j, rgb_t.permute(0, 2, 3, 1).numpy(), atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(
            pre_j, pre_t.permute(0, 2, 3, 1).numpy(), atol=1e-5, rtol=1e-5)

    def test_state_dict_round_trip(self, small_cfg, small_params, rng):
        """pytree -> ldm state dict -> pytree is exact (loader inverse)."""
        sd = decoder_params_to_state_dict(small_params, small_cfg)
        # Exercise the prefix-stripping path that real checkpoints take.
        sd = {f"decoder.{k}": v for k, v in sd.items()}
        restored = decoder_params_from_state_dict(sd, small_cfg)
        z = jnp.asarray(_latent(rng, small_cfg))
        a = decoder_apply(small_params, z, small_cfg)
        b = decoder_apply(restored, z, small_cfg)
        np.testing.assert_array_equal(np.asarray(a.rgb), np.asarray(b.rgb))


class TestDecoderContract:
    def test_single_forward_returns_both(self, small_cfg, small_params, rng):
        """One forward -> (rgb, pre_conv_out); replaces the reference's
        hook + double-decode (`hdr_vae_decode.py:850-859,1022`)."""
        z = jnp.asarray(_latent(rng, small_cfg, h=4, w=4))
        out = decoder_apply(small_params, z, small_cfg)
        scale = small_cfg.spatial_scale
        assert out.rgb.shape == (1, 4 * scale, 4 * scale, 3)
        assert out.pre_conv_out.shape == (
            1, 4 * scale, 4 * scale, small_cfg.pre_conv_out_channels)

    def test_bypass_is_a_flag(self, small_cfg, small_params, rng):
        """apply_conv_out=False == the reference's 530-LoC bypass subsystem
        (`hdr_vae_decode.py:443,832,1205`)."""
        z = jnp.asarray(_latent(rng, small_cfg, h=4, w=4))
        full = decoder_apply(small_params, z, small_cfg)
        bypass = decoder_apply(small_params, z, small_cfg,
                               apply_conv_out=False)
        assert bypass.rgb is None
        np.testing.assert_array_equal(np.asarray(full.pre_conv_out),
                                      np.asarray(bypass.pre_conv_out))

    def test_jit_compiles(self, small_cfg, small_params, rng):
        z = jnp.asarray(_latent(rng, small_cfg, h=4, w=4))
        fn = jax.jit(lambda p, x: decoder_apply(p, x, small_cfg))
        out = fn(small_params, z)
        assert np.isfinite(np.asarray(out.rgb)).all()

    def test_full_flux_shape_param_count(self):
        """Full Flux.1 decoder has the canonical ~49.5M params."""
        cfg = DecoderConfig()
        params = init_decoder(jax.random.PRNGKey(0), cfg)
        n = param_count(params)
        assert 49_000_000 < n < 50_000_000, n

    def test_latent_preprocess(self, small_cfg, small_params, rng):
        """Flux scale/shift is applied before conv_in (diffusers semantics)."""
        z = jnp.asarray(_latent(rng, small_cfg, h=4, w=4))
        pre_applied = z / small_cfg.scale_factor + small_cfg.shift_factor
        a = decoder_apply(small_params, z, small_cfg)
        b = decoder_apply(small_params, pre_applied, small_cfg,
                          preprocess_latent=False)
        np.testing.assert_allclose(np.asarray(a.rgb), np.asarray(b.rgb),
                                   atol=1e-6)


def test_upsample_conv_subpixel_equivalence(rng):
    """upsample_conv_2x == nearest_upsample_2x + conv2d exactly (only the
    float summation grouping differs)."""
    import jax
    from hdrvae.core.config import Precision
    from hdrvae.models.layers import (conv2d, init_conv2d,
                                      nearest_upsample_2x, upsample_conv_2x)
    p = init_conv2d(jax.random.PRNGKey(3), 3, 3, 8, 16)
    x = jnp.asarray(rng.standard_normal((2, 5, 7, 8)), jnp.float32)
    ref = conv2d(nearest_upsample_2x(x), p, precision=Precision.parity())
    got = upsample_conv_2x(x, p, precision=Precision.parity())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-6, rtol=1e-6)


class TestConfigInference:
    """infer_decoder_config: topology from checkpoint shapes alone —
    the any-ComfyUI-VAE contract (`hdr_vae_decode.py:62-67`)."""

    def _sd_for(self, cfg, seed=0):
        params = init_decoder(jax.random.PRNGKey(seed), cfg)
        sd = decoder_params_to_state_dict(params, cfg)
        return {f"decoder.{k}": v for k, v in sd.items()}, params

    def test_flux_shaped(self):
        from hdrvae.models.params import infer_decoder_config
        import dataclasses
        cfg = dataclasses.replace(DecoderConfig(), ch=32, ch_mult=(1, 2),
                                  num_res_blocks=1)
        sd, _ = self._sd_for(cfg)
        got = infer_decoder_config(sd)
        assert got.z_channels == 16 and got.ch == 32
        assert got.ch_mult == (1, 2) and got.num_res_blocks == 1
        assert got.attn_mid and got.num_groups == 32
        # z=16 selects the Flux.1 latent constants
        assert got.scale_factor == pytest.approx(0.3611)
        assert got.shift_factor == pytest.approx(0.1159)

    def test_sd_family_shaped(self):
        """SD1.5/SDXL decoder shape: z=4, no mid-attn variant also works."""
        from hdrvae.models.params import infer_decoder_config
        import dataclasses
        cfg = dataclasses.replace(DecoderConfig(), z_channels=4, ch=32,
                                  ch_mult=(1, 2, 4), num_res_blocks=2,
                                  attn_mid=False)
        sd, params = self._sd_for(cfg)
        got = infer_decoder_config(sd)
        assert got.z_channels == 4 and got.ch_mult == (1, 2, 4)
        assert got.num_res_blocks == 2 and not got.attn_mid
        # z=4 selects the SD-family latent scaling (diffusers z/scale)
        assert got.scale_factor == pytest.approx(0.18215)
        assert got.shift_factor == 0.0
        # and the inferred config actually decodes the loaded weights
        restored = decoder_params_from_state_dict(sd, None)
        z = jnp.asarray(np.random.default_rng(0).standard_normal(
            (1, 4, 4, 4)).astype(np.float32))
        out = decoder_apply(restored, z, got)
        assert out.rgb.shape == (1, 16, 16, 3)

    def test_vae_load_infers_from_file(self, tmp_path):
        from safetensors.numpy import save_file
        from hdrvae.api.vae import VAE
        import dataclasses
        cfg = dataclasses.replace(DecoderConfig(), z_channels=4, ch=32,
                                  ch_mult=(1, 2), num_res_blocks=1)
        sd, params = self._sd_for(cfg)
        p = str(tmp_path / "vae.safetensors")
        save_file({k: np.asarray(v) for k, v in sd.items()}, p)
        vae = VAE.load(p)
        assert vae.config.z_channels == 4 and vae.config.ch == 32
        z = jnp.asarray(np.random.default_rng(1).standard_normal(
            (1, 4, 4, 4)).astype(np.float32))
        a = vae.decode(z)
        # same weights under the inferred config (the z=4 latent constants
        # differ from the fixture cfg's Flux defaults — that is the point)
        b = decoder_apply(params, z, vae.config)
        np.testing.assert_allclose(np.asarray(a.rgb), np.asarray(b.rgb),
                                   atol=2e-5, rtol=1e-5)

    def test_rejects_non_decoder_and_vq_topologies(self):
        from hdrvae.models.params import infer_decoder_config
        with pytest.raises(ValueError, match="missing"):
            infer_decoder_config({"encoder.conv_in.weight":
                                  np.zeros((4, 3, 3, 3))})
        import dataclasses
        cfg = dataclasses.replace(DecoderConfig(), ch=32, ch_mult=(1, 2),
                                  num_res_blocks=1)
        sd, _ = self._sd_for(cfg)
        sd["decoder.up.1.attn.0.norm.weight"] = np.zeros((64,))
        with pytest.raises(ValueError, match="per-level attention"):
            infer_decoder_config(sd)

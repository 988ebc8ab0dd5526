"""End-to-end HDR decode pipeline tests on the small decoder fixture
(SURVEY.md section 4b), including a full numpy oracle of the reference
pipeline semantics (`hdr_vae_decode.py:62-195,1009-1161`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hdrvae.core.config import HDRDecodeConfig, Precision
from hdrvae.decode.pipeline import decode_summary, hdr_decode
from hdrvae.models.decoder import decoder_apply


def _latent(rng, cfg, b=1, h=6, w=6):
    return jnp.asarray(
        rng.standard_normal((b, h, w, cfg.z_channels)).astype(np.float32) * 2)


# --- numpy oracle of the reference pipeline on (rgb, pre) inputs -----------

def reference_pipeline_oracle(rgb, pre, mode, ev_mult=1.0):
    """Literal transcription of intelligent_hdr_decode + acceptance +
    multiplier (`hdr_vae_decode.py:97-185,1009-1161`) on decoder outputs."""
    def srgb2lin(x):
        a = np.abs(x)
        return np.sign(x) * np.where(a <= 0.04045, a / 12.92,
                                     ((a + 0.055) / 1.055) ** 2.4)

    def inv_sigmoid(x):
        c = np.clip(x, 1e-7, 1 - 1e-7)
        return np.log(c / (1 - c))

    # raw pre stats (un-collapsed), torch-std (ddof=1)
    pre_stats = dict(min=pre.min(), max=pre.max(), mean=pre.mean(),
                     std=pre.std(ddof=1))
    post = dict(min=rgb.min(), max=rgb.max())
    if abs(post["max"] - 1) < 1e-3 and abs(post["min"]) < 1e-3:
        norm = "SIGMOID"
    elif abs(post["max"] - 1) < 1e-3 and abs(post["min"] + 1) < 1e-3:
        norm = "TANH"
    else:
        norm = "CUSTOM"

    # collapse (channels may be generic width for the small fixture)
    c = pre.shape[-1]
    if c == 128:
        bounds = (0, 42, 84, 126)
    else:
        step = c // 3
        bounds = (0, step, 2 * step, 3 * step)
    pre_c = np.stack([pre[..., bounds[0]:bounds[1]].max(-1),
                      pre[..., bounds[1]:bounds[2]].max(-1),
                      pre[..., bounds[2]:bounds[3]].max(-1)], -1)

    ldr = srgb2lin(rgb)
    has_hdr = pre_c.max() > 1 + 1e-3
    map_rec, aligned = pre_c, np.ones_like(pre_c)
    if has_hdr:
        if norm == "SIGMOID":
            rec = inv_sigmoid(rgb)
        elif norm == "TANH":
            rec = np.arctanh(np.clip(rgb, -1 + 1e-6, 1 - 1e-6))
        else:
            rec = rgb
        rec_n = (rec - rec.min()) / (rec.max() - rec.min())
        map_rec = rec_n * (pre_stats["max"] - pre_stats["min"]) + pre_stats["min"]
        aligned = map_rec - pre_stats["mean"] + 1.0

    if mode == "conservative":
        # expansion factor is ALWAYS 1.0 in the node path: simple_hdr_decode
        # never forwards the user multiplier into intelligent_hdr_decode
        # (`hdr_vae_decode.py:97` vs `:1009`); ev_mult scales the final
        # image below (`:180-182`).
        mask = pre_c > 1.0
        out = np.where(mask, ldr + (pre_c - 1) * 1.0 * ldr, ldr)
    elif mode == "exposure":
        out = ldr * np.power(2.0, np.log2(np.clip(map_rec, 0.001, None)))
    elif mode == "adaptive_recovery":
        amax = aligned.max()
        factor = 1.0
        if amax > 1.0 and amax > pre_stats["max"]:
            factor = (pre_stats["max"] - 1.0) / (amax - 1.0)
        mask = (aligned > 1.0).astype(np.float32)
        comp = (aligned - 1.0) * factor + 1.0
        m = aligned * (1 - mask) + comp * mask
        out = ldr * np.power(2.0, np.log2(np.clip(m, 0.001, None)))
    else:  # mathematical_recovery
        out = ldr * np.power(2.0, np.log2(np.clip(aligned, 0.001, None)))

    accept = (out > 1.0).sum() > 0 or out.max() > 1.1
    final = out if accept else pre_c
    return (final * ev_mult).astype(np.float32), accept, norm


@pytest.mark.parametrize("mode", ["conservative", "exposure",
                                  "adaptive_recovery",
                                  "mathematical_recovery"])
def test_pipeline_matches_reference_oracle(small_cfg, small_params, rng,
                                           mode):
    """Config 2 of BASELINE.json: all 4 modes vs the literal reference
    semantics, to <=1e-3 max-abs (the fidelity contract)."""
    latent = _latent(rng, small_cfg)
    out = decoder_apply(small_params, latent, small_cfg,
                        precision=Precision.parity())
    rgb = np.asarray(out.rgb)
    pre = np.asarray(out.pre_conv_out)
    expected, accept, norm = reference_pipeline_oracle(rgb, pre, mode,
                                                       ev_mult=1.5)

    cfg = HDRDecodeConfig(hdr_mode=mode, conservative_ev_multiplier=1.5)
    result = hdr_decode(small_params, latent, small_cfg, cfg,
                        Precision.parity())
    got = np.asarray(result.image)
    assert got.shape == expected.shape
    scale = max(1.0, float(np.abs(expected).max()))
    np.testing.assert_allclose(got, expected, atol=1e-3 * scale,
                               err_msg=f"mode={mode}")
    assert bool(result.used_fallback) == (not accept)


def test_mode_aliases(small_cfg, small_params, rng):
    """Old-graph modes map to current ones (SURVEY.md section 6 caveat)."""
    latent = _latent(rng, small_cfg, h=4, w=4)
    a = hdr_decode(small_params, latent, small_cfg,
                   HDRDecodeConfig(hdr_mode="aggressive"))
    b = hdr_decode(small_params, latent, small_cfg,
                   HDRDecodeConfig(hdr_mode="mathematical_recovery"))
    np.testing.assert_array_equal(np.asarray(a.image), np.asarray(b.image))

    with pytest.raises(ValueError, match="unknown hdr_mode"):
        hdr_decode(small_params, latent, small_cfg,
                   HDRDecodeConfig(hdr_mode="bogus"))


def test_nchw_latent_accepted(small_cfg, small_params, rng):
    """torch-layout callers pass NCHW; detected and transposed.  Uses h != w
    != z_channels so the two layouts are unambiguous."""
    nhwc = _latent(rng, small_cfg, h=4, w=6)
    nchw = jnp.transpose(nhwc, (0, 3, 1, 2))
    a = hdr_decode(small_params, nhwc, small_cfg)
    b = hdr_decode(small_params, nchw, small_cfg)
    np.testing.assert_array_equal(np.asarray(a.image), np.asarray(b.image))


def test_bad_latent_shapes_rejected(small_cfg, small_params):
    with pytest.raises(ValueError, match="4D"):
        hdr_decode(small_params, jnp.zeros((4, 4, 4)), small_cfg)
    with pytest.raises(ValueError, match="channel"):
        # no axis equals z_channels (=4), so layout detection cannot save it
        hdr_decode(small_params, jnp.zeros((1, 5, 5, 7)), small_cfg)


def test_decode_summary_single_sync(small_cfg, small_params, rng):
    """Stats arrive as one structured record with the reference's metric
    vocabulary (hdr/negative pixel counts, pre/post ranges)."""
    latent = _latent(rng, small_cfg, h=4, w=4)
    result = hdr_decode(small_params, latent, small_cfg)
    summary = decode_summary(result)
    assert {"input", "pre", "post", "output", "normalization",
            "used_fallback"} <= set(summary)
    assert isinstance(summary["output"]["hdr_pixels"], int)
    assert summary["normalization"] in ("SIGMOID", "TANH", "CUSTOM")


def test_ev_multiplier_applied(small_cfg, small_params, rng):
    latent = _latent(rng, small_cfg, h=4, w=4)
    base = hdr_decode(small_params, latent, small_cfg,
                      HDRDecodeConfig(hdr_mode="mathematical_recovery",
                                      conservative_ev_multiplier=1.0))
    scaled = hdr_decode(small_params, latent, small_cfg,
                        HDRDecodeConfig(hdr_mode="mathematical_recovery",
                                        conservative_ev_multiplier=2.0))
    np.testing.assert_allclose(np.asarray(scaled.image),
                               np.asarray(base.image) * 2.0, rtol=1e-6)


def test_keep_standard_false_drops_second_output(small_cfg, small_params,
                                                 rng):
    """keep_standard=False returns standard=None with an identical HDR
    image — the large-image memory knob (VERDICT round-2 item 4) must not
    perturb the result."""
    latent = _latent(rng, small_cfg, h=4, w=4)
    full = hdr_decode(small_params, latent, small_cfg, HDRDecodeConfig())
    lean = hdr_decode(small_params, latent, small_cfg,
                      HDRDecodeConfig(keep_standard=False))
    assert lean.standard is None and full.standard is not None
    np.testing.assert_array_equal(np.asarray(full.image),
                                  np.asarray(lean.image))


def test_shape_bucketing_exact(small_cfg, small_params, rng):
    """Bucketed decode compiles one padded shape for nearby resolutions and
    crops the output back.  The pad region is masked out of every GN
    statistic, attention softmax, and conv halo (PadMask), so the bucketed
    decode is EXACT — replacing the round-1 0.35 'doesn't explode'
    tolerance with a fidelity assertion (VERDICT round-1 item 9)."""
    latent5 = _latent(rng, small_cfg, h=5, w=7)
    exact = hdr_decode(small_params, latent5, small_cfg,
                       precision=Precision.parity())
    bucketed = hdr_decode(small_params, latent5, small_cfg,
                          precision=Precision.parity(), shape_bucket=8)
    assert bucketed.image.shape == exact.image.shape
    scale = max(1.0, float(np.abs(np.asarray(exact.image)).max()))
    err = np.abs(np.asarray(exact.image)
                 - np.asarray(bucketed.image)).max() / scale
    assert err < 1e-3, err

    # a second, different small size hits the SAME compiled shape
    latent6 = _latent(rng, small_cfg, h=6, w=6)
    out = hdr_decode(small_params, latent6, small_cfg,
                     precision=Precision.parity(), shape_bucket=8)
    assert out.image.shape[1:3] == (6 * small_cfg.spatial_scale,
                                    6 * small_cfg.spatial_scale)


@pytest.mark.slow
def test_batched_decode_matches_batched_forward(small_cfg, small_params,
                                                rng):
    """The batch>1 sequential lax.map branch must reproduce the plain
    batched decoder forward (regression guard for the b>1 code path; the
    throughput numbers in README ride on it)."""
    from hdrvae.models.decoder import decoder_apply
    from hdrvae.decode.pipeline import hdr_epilogue
    latent = _latent(rng, small_cfg, b=3, h=5, w=6)
    cfg = HDRDecodeConfig(hdr_mode="mathematical_recovery")
    result = hdr_decode(small_params, latent, small_cfg, cfg,
                        Precision.parity())
    out = decoder_apply(small_params, latent, small_cfg,
                        precision=Precision.parity())
    image_ref, _, _ = hdr_epilogue(out.rgb, out.pre_conv_out, cfg)
    np.testing.assert_allclose(np.asarray(result.image),
                               np.asarray(image_ref), atol=1e-5, rtol=1e-5)
    assert result.image.shape[0] == 3


def test_full_analysis_record(small_cfg):
    """cfg.full_analysis adds the reference's extended analysis record:
    conv_only_result stats (`hdr_vae_decode.py:877-881`) and conv_out
    weight/bias stats (`:900-910`)."""
    import dataclasses

    import jax

    from hdrvae.core.config import HDRDecodeConfig
    from hdrvae.core.stats import stats_to_host
    from hdrvae.decode.pipeline import decode_summary, hdr_decode
    from hdrvae.models.decoder import init_decoder
    from hdrvae.models.layers import conv2d

    params = init_decoder(jax.random.PRNGKey(0), small_cfg)
    z = jax.random.normal(jax.random.PRNGKey(1),
                          (1, 8, 8, small_cfg.z_channels))
    cfg = HDRDecodeConfig(full_analysis=True)
    res = hdr_decode(params, z, small_cfg, cfg)
    summary = decode_summary(res)
    for key in ("conv_only", "conv_weight", "conv_bias"):
        assert set(summary[key]) == {"min", "max", "mean", "std"}, key

    # conv_only is conv_out applied alone (no output postprocess): its
    # max must exceed the clamped-postprocessed post max when the raw
    # conv output leaves [0, 1] — check against an independent compute.
    from hdrvae.models.decoder import decoder_apply
    out = decoder_apply(params, z, small_cfg)
    raw = conv2d(out.pre_conv_out, params["conv_out"])
    import numpy as np
    expect = float(np.asarray(raw, np.float32).max())
    assert abs(summary["conv_only"]["max"] - expect) < 1e-4

    # default config omits the record
    res2 = hdr_decode(params, z, small_cfg, HDRDecodeConfig())
    assert "conv_only" not in res2.stats

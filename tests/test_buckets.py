"""Shape-bucket policy: DP planning + exact policy-padded decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hdrvae.decode.buckets import BucketPolicy, plan_buckets


def test_snap_and_overflow():
    p = BucketPolicy(edges=(16, 32, 64), overflow_multiple=64)
    assert p.snap(9) == 16
    assert p.snap(16) == 16
    assert p.snap(33) == 64
    assert p.snap(65) == 128          # overflow rounds to 64-multiple
    assert p.snap_hw(20, 50) == (32, 64)
    assert p.max_compiled_shapes == 9


def test_plan_buckets_minimizes_padding():
    # two tight clusters -> two buckets at the cluster maxima
    sizes = [(16, 16)] * 10 + [(64, 64)] * 10
    p = plan_buckets(sizes, max_buckets=2, multiple=8)
    assert p.edges == (16, 64)
    # one bucket forced -> everything pads to the max
    p1 = plan_buckets(sizes, max_buckets=1, multiple=8)
    assert p1.edges == (64,)


def test_plan_buckets_weighted_choice():
    """With a 3-bucket budget over three clusters the DP keeps all
    three; with 2 it merges the pair with the least padded mass."""
    sizes = [(16, 16)] * 100 + [(24, 24)] * 100 + [(64, 64)] * 1
    p3 = plan_buckets(sizes, max_buckets=3)
    assert p3.edges == (16, 24, 64)
    p2 = plan_buckets(sizes, max_buckets=2)
    # merging 64 into... 64 must stay (it is the max); merging 16->24
    # costs 100*8*2 pads, merging 24->64 costs 100*40*2 -> keep 24 split
    assert p2.edges == (24, 64)


@pytest.mark.slow
def test_policy_padded_decode_is_exact(small_cfg):
    from hdrvae.core.config import HDRDecodeConfig
    from hdrvae.decode.pipeline import hdr_decode
    from hdrvae.models.decoder import init_decoder

    params = init_decoder(jax.random.PRNGKey(0), small_cfg)
    z = jax.random.normal(jax.random.PRNGKey(1),
                          (1, 10, 12, small_cfg.z_channels))
    ref = hdr_decode(params, z, small_cfg, HDRDecodeConfig())
    pol = BucketPolicy(edges=(16,))
    got = hdr_decode(params, z, small_cfg, HDRDecodeConfig(),
                     pad_to=pol.snap_hw(10, 12))
    assert got.image.shape == ref.image.shape
    err = float(jnp.abs(got.image - ref.image).max())
    assert err <= 1e-4, f"policy-padded decode differs: {err:.3e}"


def test_pad_to_rejects_shrink(small_cfg):
    from hdrvae.core.config import HDRDecodeConfig
    from hdrvae.decode.pipeline import hdr_decode
    from hdrvae.models.decoder import init_decoder
    params = init_decoder(jax.random.PRNGKey(0), small_cfg)
    z = jnp.zeros((1, 16, 16, small_cfg.z_channels))
    with pytest.raises(ValueError):
        hdr_decode(params, z, small_cfg, HDRDecodeConfig(), pad_to=(8, 8))


def test_bucket_shares_one_decoder_compilation(small_cfg, small_params):
    """Different original sizes snapping to one bucket must reuse ONE
    compiled decoder program (valid_hw is a traced array, not a static
    arg — the whole point of bucketing)."""
    from hdrvae.core.config import HDRDecodeConfig
    from hdrvae.decode.pipeline import (_decoder_forward_bucketed,
                                        hdr_decode)
    cfg = HDRDecodeConfig()
    base = _decoder_forward_bucketed._cache_size()
    for h, w in ((10, 12), (11, 13), (9, 15)):
        z = jax.random.normal(jax.random.PRNGKey(h),
                              (1, h, w, small_cfg.z_channels))
        r = hdr_decode(params=small_params, latent=z,
                       decoder_cfg=small_cfg, cfg=cfg, pad_to=(18, 18))
        assert r.image.shape[1:3] == (h * small_cfg.spatial_scale,
                                      w * small_cfg.spatial_scale)
    assert _decoder_forward_bucketed._cache_size() == base + 1


def test_bucketed_input_stats_exclude_pad(small_cfg, small_params):
    """stats['input'] must describe the UNPADDED latent (a padded decode
    of an all-positive latent must not report min 0.0 from pad zeros)."""
    from hdrvae.core.config import HDRDecodeConfig
    from hdrvae.decode.pipeline import decode_summary, hdr_decode
    z = jnp.abs(jax.random.normal(
        jax.random.PRNGKey(3), (1, 10, 12, small_cfg.z_channels))) + 0.2
    got = hdr_decode(small_params, z, small_cfg, HDRDecodeConfig(),
                     pad_to=(16, 16))
    ref = hdr_decode(small_params, z, small_cfg, HDRDecodeConfig())
    gs, rs = decode_summary(got)["input"], decode_summary(ref)["input"]
    assert gs["min"] == rs["min"] > 0.0
    assert gs["max"] == rs["max"]
    assert gs["negative_pixels"] == rs["negative_pixels"] == 0

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

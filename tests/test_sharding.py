"""Multi-device sharding tests on the 8-device CPU mesh
(SURVEY.md section 4e)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hdrvae.core.config import DecoderConfig, HDRDecodeConfig, Precision
from hdrvae.decode.pipeline import hdr_decode
from hdrvae.sharding.mesh import make_mesh, sharded_tiled_decode


def _latent(rng, cfg, h, w):
    return jnp.asarray(
        rng.standard_normal((1, h, w, cfg.z_channels)).astype(np.float32)
        * 2)


def test_eight_virtual_devices():
    assert jax.device_count() >= 8, (
        "conftest must force 8 virtual CPU devices")


def test_sharded_equals_single_device(small_cfg, small_params, rng):
    """Sharding is a placement decision, not a math change: the tiled decode
    on an 8-device mesh must match the same tiled decode on 1 device."""
    latent = _latent(rng, small_cfg, 12, 12)
    kwargs = dict(latent_tile=8, latent_overlap=4,
                  precision=Precision.parity())
    one = sharded_tiled_decode(small_params, latent, small_cfg,
                               mesh=make_mesh(num_devices=1), **kwargs)
    eight = sharded_tiled_decode(small_params, latent, small_cfg,
                                 mesh=make_mesh(num_devices=8), **kwargs)
    np.testing.assert_allclose(np.asarray(one), np.asarray(eight),
                               atol=1e-5, rtol=1e-5)


def test_sharded_output_shape_and_finite(small_cfg, small_params, rng):
    latent = _latent(rng, small_cfg, 12, 12)
    out = sharded_tiled_decode(small_params, latent, small_cfg,
                               mesh=make_mesh(num_devices=8),
                               latent_tile=8, latent_overlap=4)
    scale = small_cfg.spatial_scale
    assert out.shape == (1, 12 * scale, 12 * scale, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_tiled_vs_whole_decode_seam_error(small_cfg, small_params, rng):
    """Tiled decode vs whole-image decode (config 3 seam check).

    Halo-crop makes the conv stack exact; the residual difference comes
    from GroupNorm statistics:
      - norm_stats="global" (stats_downsample=1): tiles replay EXACT
        whole-image stats -> near-exact reconstruction;
      - norm_stats="per_tile": the naive trade, larger error.
    (stats_downsample > 1 is experimental: decoder activations are not
    scale-invariant, so downsampled-stats injection is unvalidated.)
    """
    latent = _latent(rng, small_cfg, 16, 16)
    whole = np.asarray(hdr_decode(small_params, latent, small_cfg,
                                  HDRDecodeConfig(),
                                  Precision.parity()).image)
    signal = np.abs(whole).max()

    def run(**kw):
        out = sharded_tiled_decode(small_params, latent, small_cfg,
                                   HDRDecodeConfig(),
                                   mesh=make_mesh(num_devices=4),
                                   latent_tile=12, latent_overlap=8,
                                   precision=Precision.parity(), **kw)
        return np.abs(whole - np.asarray(out)).max() / signal

    err_exact = run(norm_stats="global", stats_downsample=1)
    err_tile = run(norm_stats="per_tile")

    # Exact global stats: the residual is conv-halo truncation plus the
    # mid-block attention seeing only its tile (attention is global; no
    # spatial tiling can be exact through it — the reference "solves" this
    # by skipping attention, `hdr_vae_decode.py:514`).  Measured ~0.6%.
    assert err_exact < 2e-2, f"exact-stats seam error {err_exact:.4f}"
    assert err_exact < err_tile, (err_exact, err_tile)
    assert err_tile < 0.5, f"per-tile seam error {err_tile:.3f}"


def test_uneven_tiles_padded(small_cfg, small_params, rng):
    """Tile count not divisible by device count still works (padding)."""
    latent = _latent(rng, small_cfg, 20, 12)  # 3x2 = 6 tiles on 8 devices
    out = sharded_tiled_decode(small_params, latent, small_cfg,
                               mesh=make_mesh(num_devices=8),
                               latent_tile=8, latent_overlap=4)
    assert out.shape[1:3] == (20 * small_cfg.spatial_scale,
                              12 * small_cfg.spatial_scale)


def test_graft_entry_contract():
    """The driver contract: entry() compiles; dryrun_multichip(8) runs."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    # compile-check only (full Flux decoder on CPU: lower+compile, no run)
    jax.jit(fn).lower(*args)

    ge.dryrun_multichip(8)


def test_irregular_tile_ownership_partitions(small_cfg, small_params, rng):
    """Clamped last tiles break the regular stride; the stats ownership
    boxes must still partition every pixel exactly once (regression for the
    double-counting found in review)."""
    from hdrvae.sharding.mesh import _crop_boxes
    from hdrvae.tiling.tiled import plan_tiles
    import numpy as np
    for h, w, tile, ov in [(13, 13, 8, 4), (16, 16, 12, 8), (20, 12, 8, 4),
                           (9, 17, 8, 2)]:
        plan = plan_tiles(h, w, tile, ov)
        scale = 2
        boxes = _crop_boxes(plan, scale)
        cover = np.zeros((h * scale, w * scale), np.int32)
        for (y, x0), (top, bottom, left, right) in zip(plan.positions,
                                                       boxes):
            cover[y * scale + top:y * scale + bottom,
                  x0 * scale + left:x0 * scale + right] += 1
        assert (cover == 1).all(), (h, w, tile, ov,
                                    int((cover != 1).sum()))


def test_irregular_tiles_stats_match_whole(small_cfg, small_params, rng):
    """13x13 latent (irregular grid) through the sharded path still matches
    whole decode with exact global stats.

    conservative mode: the inverse-activation modes amplify tiny tile-local
    attention differences enormously near clamp saturation (logit of values
    ~1e-7 from 1.0), so they are not a meaningful seam metric; conservative
    measures the actual stitching fidelity."""
    latent = _latent(rng, small_cfg, 13, 13)
    cfg = HDRDecodeConfig(hdr_mode="conservative")
    whole = np.asarray(hdr_decode(small_params, latent, small_cfg, cfg,
                                  Precision.parity()).image)
    tiled = np.asarray(sharded_tiled_decode(
        small_params, latent, small_cfg, cfg,
        mesh=make_mesh(num_devices=4), latent_tile=8, latent_overlap=4,
        precision=Precision.parity()))
    rel = np.abs(whole - tiled).max() / np.abs(whole).max()
    assert rel < 0.1, rel

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
    """Tile-grid decode vs whole-image decode (config 3 seam check).

    Halo-crop makes the conv stack exact; the residual difference comes
    from GroupNorm statistics and tile-local attention.  The EXACT path is
    the slab decode (test_slab_decode_* below); this documents the
    tile-grid executor's accuracy classes.
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

    err_exact = run(norm_stats="global")
    err_tile = run(norm_stats="per_tile")

    # Shared global stats: the residual is conv-halo truncation plus the
    # mid-block attention seeing only its tile (attention is global; the
    # reference "solves" this by skipping attention,
    # `hdr_vae_decode.py:514`; the slab decode solves it by running the
    # mid whole-image).  Measured ~0.6%.
    assert err_exact < 2e-2, f"exact-stats seam error {err_exact:.4f}"
    assert err_exact < err_tile, (err_exact, err_tile)


def test_slab_decode_exact(small_cfg, small_params, rng):
    """The sharded slab decode is EXACT vs the whole-image decode: head
    (incl. global mid attention) whole-image, tail on row slabs with
    GN statistics psum-reduced across the mesh (VERDICT round-1 item 2 —
    parity seam error < 1e-3, with room to spare)."""
    from hdrvae.sharding.mesh import sharded_slab_decode
    latent = _latent(rng, small_cfg, 16, 16)
    cfg = HDRDecodeConfig(hdr_mode="conservative")
    whole = hdr_decode(small_params, latent, small_cfg, cfg,
                       Precision.parity())
    slab = sharded_slab_decode(small_params, latent, small_cfg, cfg,
                               mesh=make_mesh(num_devices=4), tail_levels=1,
                               precision=Precision.parity())
    w, s = np.asarray(whole.image), np.asarray(slab.image)
    signal = max(1.0, float(np.abs(w).max()))
    err = np.abs(w - s).max() / signal
    assert err < 1e-3, f"slab seam error {err:.2e}"
    # the raw decode (pre mode math) should match to float noise
    err_rgb = np.abs(np.asarray(whole.standard)
                     - np.asarray(slab.standard)).max()
    assert err_rgb < 1e-4, f"raw rgb slab error {err_rgb:.2e}"
    assert bool(slab.used_fallback) == bool(whole.used_fallback)


def test_slab_decode_contract(small_cfg, small_params, rng):
    """sharded_slab_decode honors hdr_decode's result contract:
    keep_standard=False returns standard=None, and a latent with no
    z_channels axis raises the same API-level ValueError instead of an
    opaque conv shape error inside the jitted program."""
    from hdrvae.sharding.mesh import sharded_slab_decode
    latent = _latent(rng, small_cfg, 16, 16)
    cfg = HDRDecodeConfig(hdr_mode="conservative", keep_standard=False)
    slab = sharded_slab_decode(small_params, latent, small_cfg, cfg,
                               mesh=make_mesh(num_devices=4), tail_levels=1,
                               precision=Precision.parity())
    assert slab.standard is None
    assert np.isfinite(np.asarray(slab.image)).all()

    bad = np.zeros((1, 16, 16, small_cfg.z_channels + 1), np.float32)
    with pytest.raises(ValueError, match="channel axis"):
        sharded_slab_decode(small_params, bad, small_cfg,
                            HDRDecodeConfig(),
                            mesh=make_mesh(num_devices=4), tail_levels=1,
                            precision=Precision.parity())


@pytest.mark.parametrize("mode", ["mathematical_recovery", "exposure"])
def test_slab_decode_exact_all_tail_levels(small_cfg, small_params, rng,
                                           mode):
    """Exactness holds when EVERY up level is slab-sharded (tail_levels =
    num_levels) and across HDR modes whose epilogue reductions span the
    stitched image."""
    from hdrvae.sharding.mesh import sharded_slab_decode
    latent = _latent(rng, small_cfg, 32, 8)
    cfg = HDRDecodeConfig(hdr_mode=mode)
    whole = hdr_decode(small_params, latent, small_cfg, cfg,
                       Precision.parity())
    slab = sharded_slab_decode(small_params, latent, small_cfg, cfg,
                               mesh=make_mesh(num_devices=4),
                               tail_levels=small_cfg.num_levels,
                               precision=Precision.parity())
    w, s = np.asarray(whole.image), np.asarray(slab.image)
    signal = max(1.0, float(np.abs(w).max()))
    err = np.abs(w - s).max() / signal
    assert err < 1e-3, f"slab seam error {err:.2e} (mode={mode})"


@pytest.mark.slow
@pytest.mark.parametrize("tail_levels", [1, None])
def test_slab_decode_pallas_tail_matches_xla(small_cfg, small_params, rng,
                                             monkeypatch, tail_levels):
    """The kernel-chain slab tail (per-slab owned-row stat partials +
    psum, models.pallas_tail.upstack_slab_apply) computes the same
    function as the XLA slab tail with the SlabGNReducer tape.  Run in
    f32 fast mode, where the kernel math is bit-comparable (~1e-5)."""
    from jax.experimental.pallas import tpu as pltpu

    import hdrvae.models.pallas_tail as pt
    from hdrvae.sharding.mesh import sharded_slab_decode

    tail_levels = tail_levels or small_cfg.num_levels
    # permit the kernel path on the CPU test backend (interpret mode)
    monkeypatch.setattr(
        pt, "upstack_supported",
        lambda precision, batch, tape, width=0, cfg=None: (
            precision.mode == "fast" and batch == 1 and tape is None
            and width % 8 == 0 and width > 0
            and precision.upstack == "pallas"))

    latent = _latent(rng, small_cfg, 16, 16)
    cfg = HDRDecodeConfig(hdr_mode="conservative")
    f32fast = Precision(compute_dtype=jnp.float32,
                        storage_dtype=jnp.float32, mode="fast")
    import dataclasses
    xla = sharded_slab_decode(
        small_params, latent, small_cfg, cfg,
        mesh=make_mesh(num_devices=4), tail_levels=tail_levels,
        precision=dataclasses.replace(f32fast, upstack="xla"))
    with pltpu.force_tpu_interpret_mode():
        pal = sharded_slab_decode(
            small_params, latent, small_cfg, cfg,
            mesh=make_mesh(num_devices=4), tail_levels=tail_levels,
            precision=dataclasses.replace(f32fast, upstack="pallas"))
    np.testing.assert_allclose(np.asarray(pal.standard),
                               np.asarray(xla.standard), atol=5e-5)
    np.testing.assert_allclose(np.asarray(pal.image),
                               np.asarray(xla.image), atol=5e-4)


def test_slab_decode_single_device_degenerates(small_cfg, small_params,
                                               rng):
    """On a 1-device mesh the slab decode IS the whole-image decode (no
    halo waste) — the property that makes it the config-5 path on one
    chip."""
    from hdrvae.sharding.mesh import sharded_slab_decode
    latent = _latent(rng, small_cfg, 12, 12)
    whole = hdr_decode(small_params, latent, small_cfg, HDRDecodeConfig(),
                       Precision.parity())
    slab = sharded_slab_decode(small_params, latent, small_cfg,
                               HDRDecodeConfig(),
                               mesh=make_mesh(num_devices=1),
                               precision=Precision.parity())
    np.testing.assert_allclose(np.asarray(slab.image),
                               np.asarray(whole.image),
                               atol=1e-5, rtol=1e-5)


def test_slab_plan_partitions_rows():
    """Slab owned intervals partition the rows for awkward sizes."""
    from hdrvae.sharding.mesh import plan_slabs
    for h, n, halo in [(13, 4, 3), (16, 8, 2), (37, 5, 6), (8, 8, 1),
                       (64, 4, 10)]:
        plan = plan_slabs(h, n, halo)
        cover = np.zeros(h, np.int32)
        for (o0, o1), s in zip(plan.owned, plan.starts):
            assert 0 <= s <= h - plan.slab_h
            # owned interval must lie inside the slab
            assert s <= o0 and o1 <= s + plan.slab_h
            cover[o0:o1] += 1
        assert (cover == 1).all(), (h, n, halo)


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


def test_first3_fallback_uniform_across_executors(small_cfg, rng):
    """`fallback_collapse="first3"` works on EVERY execution path (VERDICT
    round-2 weak item 6: the tile-grid/slab executors used to raise): the
    same config decodes whole-image, slab-sharded, and tile-grid, all
    taking the first3 fallback tier.  Slab is exact vs whole-image; the
    tile-grid path is bounded by its documented GN/attention seam class."""
    from hdrvae.models.decoder import init_decoder
    from hdrvae.sharding.mesh import sharded_slab_decode

    params = init_decoder(jax.random.PRNGKey(11), small_cfg)
    # Squash norm_out so the intelligent result has no HDR pixels -> the
    # acceptance select takes the first3 fallback tier on all paths.
    params = dict(params)
    params["norm_out"] = dict(params["norm_out"])
    params["norm_out"]["scale"] = params["norm_out"]["scale"] * 0.05

    latent = _latent(rng, small_cfg, 16, 16)
    cfg = HDRDecodeConfig(hdr_mode="conservative",
                          conservative_ev_multiplier=2.0,
                          fallback_collapse="first3")

    whole = hdr_decode(params, latent, small_cfg, cfg, Precision.parity())
    assert bool(whole.used_fallback)

    slab = sharded_slab_decode(params, latent, small_cfg, cfg,
                               mesh=make_mesh(num_devices=4), tail_levels=1,
                               precision=Precision.parity())
    assert bool(slab.used_fallback)
    np.testing.assert_allclose(np.asarray(slab.image),
                               np.asarray(whole.image),
                               atol=1e-4, rtol=1e-4)

    tiled = sharded_tiled_decode(params, latent, small_cfg, cfg,
                                 mesh=make_mesh(num_devices=4),
                                 latent_tile=12, latent_overlap=4,
                                 precision=Precision.parity())
    signal = max(1.0, float(np.abs(np.asarray(whole.image)).max()))
    err = float(np.abs(np.asarray(tiled) - np.asarray(whole.image)).max())
    assert err <= 0.02 * signal, f"tile-grid first3 err {err:.3e}"


class TestShardedUpscale:
    """Mesh-sharded two-pass HDR upscale == the single-device pipeline
    (the upscaler is pure tile-DP: no cross-tile statistics)."""

    def _setup(self, tile, overlap):
        import dataclasses

        from hdrvae.core.config import (Precision, TilingConfig,
                                        UpscaleConfig)
        from hdrvae.models.rrdbnet import RRDBNetConfig, init_rrdbnet
        cfg_m = RRDBNetConfig(nf=8, gc=4, nb=1, scale=2)
        params = init_rrdbnet(jax.random.PRNGKey(0), cfg_m)
        ucfg = UpscaleConfig(tiling=TilingConfig(tile=tile,
                                                 overlap=overlap))
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.uniform(-0.3, 2.0, (1, 40, 48, 3)),
                          jnp.float32)
        return params, cfg_m, ucfg, img, Precision.parity()

    @pytest.mark.parametrize("seam", ["feather", "crop"])
    def test_matches_single_device(self, seam):
        import dataclasses

        from hdrvae.core.config import TilingConfig
        from hdrvae.sharding.mesh import make_mesh, sharded_hdr_upscale
        from hdrvae.upscale.pipeline import hdr_upscale

        params, cfg_m, ucfg, img, prec = self._setup(16, 4)
        ucfg = dataclasses.replace(
            ucfg, tiling=dataclasses.replace(ucfg.tiling, seam_mode=seam))
        ref = hdr_upscale(params, img, cfg_m, ucfg,
                          architecture="ESRGAN", precision=prec)
        mesh = make_mesh()
        got = sharded_hdr_upscale(params, img, cfg_m, ucfg,
                                  architecture="ESRGAN", mesh=mesh,
                                  precision=prec)
        err = float(jnp.abs(got.image - ref.image).max())
        assert err <= 1e-5, f"seam={seam}: max-abs {err:.3e}"

    @pytest.mark.slow
    def test_uneven_tile_count(self):
        """Tile count not divisible by the mesh size (pad path)."""
        from hdrvae.sharding.mesh import make_mesh, sharded_hdr_upscale
        from hdrvae.upscale.pipeline import hdr_upscale

        params, cfg_m, ucfg, img, prec = self._setup(24, 4)
        ref = hdr_upscale(params, img, cfg_m, ucfg,
                          architecture="ESRGAN", precision=prec)
        got = sharded_hdr_upscale(params, img, cfg_m, ucfg,
                                  architecture="ESRGAN",
                                  mesh=make_mesh(3), precision=prec)
        err = float(jnp.abs(got.image - ref.image).max())
        assert err <= 1e-5, f"max-abs {err:.3e}"

    @pytest.mark.slow
    def test_comfy_seam_matches_single_device(self):
        """Default comfy seam mode (reference tiled_scale semantics,
        variable-size edge tiles) through the sharded path."""
        from hdrvae.sharding.mesh import make_mesh, sharded_hdr_upscale
        from hdrvae.upscale.pipeline import hdr_upscale

        params, cfg_m, ucfg, img, prec = self._setup(16, 4)
        assert ucfg.tiling.seam_mode == "comfy"
        ref = hdr_upscale(params, img, cfg_m, ucfg,
                          architecture="ESRGAN", precision=prec)
        got = sharded_hdr_upscale(params, img, cfg_m, ucfg,
                                  architecture="ESRGAN", mesh=make_mesh(),
                                  precision=prec)
        err = float(jnp.abs(got.image - ref.image).max())
        assert err <= 1e-5, f"max-abs {err:.3e}"


def test_slab_decode_mixed_tier(small_params, small_cfg, rng):
    """The mixed fidelity-at-speed tier composes with the exact slab path:
    sharded-mixed == whole-image-mixed (plumbing through SlabGNReducer's
    non-parity branch and HIGH conv dots)."""
    from hdrvae.sharding.mesh import sharded_slab_decode
    latent = _latent(rng, small_cfg, 16, 16)
    whole = hdr_decode(small_params, latent, small_cfg,
                       HDRDecodeConfig(), Precision.mixed())
    slab = sharded_slab_decode(small_params, latent, small_cfg,
                               HDRDecodeConfig(),
                               mesh=make_mesh(num_devices=4), tail_levels=1,
                               precision=Precision.mixed())
    w, s = np.asarray(whole.image), np.asarray(slab.image)
    signal = max(1.0, float(np.abs(w).max()))
    assert np.abs(w - s).max() / signal < 1e-3


def test_bucketed_decode_mixed_tier(small_params, small_cfg, rng):
    """Shape-bucketed (PadMask) decode in the mixed tier stays exact."""
    latent = _latent(rng, small_cfg, 5, 7)
    plain = hdr_decode(small_params, latent, small_cfg,
                       precision=Precision.mixed())
    bucketed = hdr_decode(small_params, latent, small_cfg,
                          precision=Precision.mixed(), shape_bucket=8)
    err = np.abs(np.asarray(plain.image)
                 - np.asarray(bucketed.image)).max()
    assert err < 1e-4, err


@pytest.mark.parametrize("precision", [Precision.parity(),
                                       Precision.mixed()],
                         ids=["parity", "mixed"])
def test_slab_decode_exact_full_width(rng, precision):
    """FULL-WIDTH sharded equivalence (VERDICT round-4 weak item 2): the
    production DecoderConfig — z=16, ch=128, 512-channel mid, 4 levels,
    32 GN groups, the 42/42/42 maxpool bounds — through the slab path on
    a tiny non-square latent.  The toy ch=16 fixture cannot see
    channel-width/group arithmetic bugs (e.g. a wrong cpg divisor that
    only differs when C/G != 4); this closes that hole on CPU where a
    whole-image full-width decode at 8x10 is still cheap."""
    from hdrvae.models.decoder import init_decoder
    from hdrvae.sharding.mesh import sharded_slab_decode
    cfg = DecoderConfig()
    params = init_decoder(jax.random.PRNGKey(42), cfg)
    latent = _latent(rng, cfg, 8, 10)
    hcfg = HDRDecodeConfig()
    whole = hdr_decode(params, latent, cfg, hcfg, precision)
    slab = sharded_slab_decode(params, latent, cfg, hcfg,
                               mesh=make_mesh(num_devices=4),
                               tail_levels=2, precision=precision)
    err_rgb = np.abs(np.asarray(whole.standard)
                     - np.asarray(slab.standard)).max()
    assert err_rgb <= 1e-4, f"full-width raw rgb slab error {err_rgb:.2e}"
    w, s = np.asarray(whole.image), np.asarray(slab.image)
    signal = max(1.0, float(np.abs(w).max()))
    assert np.abs(w - s).max() / signal < 1e-3
    assert bool(slab.used_fallback) == bool(whole.used_fallback)


@pytest.mark.parametrize("precision", [Precision.parity(),
                                       Precision.mixed()],
                         ids=["parity", "mixed"])
@pytest.mark.parametrize("hw", [(13, 11), (9, 15), (16, 16)])
def test_slab_decode_bucketed(small_cfg, small_params, rng, precision, hw):
    """PadMask through the slab path (round 5): pad_to buckets the latent
    and the sharded decode stays EXACT for the valid region — one slab
    program per bucket shape serves every original resolution (the mesh
    serving recompile-storm answer).  (16, 16) is the already-at-target
    case, which must still run the bucketed program."""
    from hdrvae.sharding.mesh import sharded_slab_decode
    latent = _latent(rng, small_cfg, *hw)
    cfg = HDRDecodeConfig()
    whole = hdr_decode(small_params, latent, small_cfg, cfg, precision)
    buck = sharded_slab_decode(small_params, latent, small_cfg, cfg,
                               mesh=make_mesh(num_devices=4),
                               tail_levels=1, pad_to=(16, 16),
                               precision=precision)
    assert buck.image.shape == whole.image.shape
    err_rgb = np.abs(np.asarray(whole.standard)
                     - np.asarray(buck.standard)).max()
    assert err_rgb <= 1e-5, f"bucketed slab rgb error {err_rgb:.2e}"
    err = np.abs(np.asarray(whole.image) - np.asarray(buck.image)).max()
    assert err <= 1e-4, f"bucketed slab image error {err:.2e}"
    assert bool(buck.used_fallback) == bool(whole.used_fallback)


def test_slab_decode_bucketed_first3_and_ev(small_cfg, small_params, rng):
    """Bucketed slab path with the first3 fallback collapse and a non-1.0
    EV multiplier (the ev-split path through the parts epilogue)."""
    from hdrvae.sharding.mesh import sharded_slab_decode
    latent = _latent(rng, small_cfg, 10, 14)
    cfg = HDRDecodeConfig(fallback_collapse="first3",
                          conservative_ev_multiplier=2.5)
    whole = hdr_decode(small_params, latent, small_cfg, cfg,
                       Precision.mixed())
    buck = sharded_slab_decode(small_params, latent, small_cfg, cfg,
                               mesh=make_mesh(num_devices=4),
                               tail_levels=1, pad_to=(16, 16),
                               precision=Precision.mixed())
    err = np.abs(np.asarray(whole.image) - np.asarray(buck.image)).max()
    assert err <= 1e-4, f"bucketed first3/ev image error {err:.2e}"


def test_slab_decode_pad_to_validation(small_cfg, small_params, rng):
    from hdrvae.sharding.mesh import sharded_slab_decode
    latent = _latent(rng, small_cfg, 16, 16)
    with pytest.raises(ValueError, match="smaller than latent"):
        sharded_slab_decode(small_params, latent, small_cfg,
                            HDRDecodeConfig(),
                            mesh=make_mesh(num_devices=4),
                            pad_to=(8, 8))


def test_slab_decode_bucketed_full_width(rng):
    """Bucketed slab decode at the PRODUCTION DecoderConfig (512-ch mid,
    32 GN groups, 4 levels) on a tiny non-multiple latent: the
    SlabPadGNReducer channel/group/valid-region arithmetic at full width
    (the toy-width bucketed tests cannot see a wrong cpg divisor)."""
    from hdrvae.models.decoder import init_decoder
    from hdrvae.sharding.mesh import sharded_slab_decode
    cfg = DecoderConfig()
    params = init_decoder(jax.random.PRNGKey(43), cfg)
    latent = _latent(rng, cfg, 7, 9)
    hcfg = HDRDecodeConfig()
    whole = hdr_decode(params, latent, cfg, hcfg, Precision.mixed())
    buck = sharded_slab_decode(params, latent, cfg, hcfg,
                               mesh=make_mesh(num_devices=4),
                               tail_levels=2, pad_to=(8, 10),
                               precision=Precision.mixed())
    assert buck.image.shape == whole.image.shape
    err_rgb = np.abs(np.asarray(whole.standard)
                     - np.asarray(buck.standard)).max()
    assert err_rgb <= 1e-4, f"full-width bucketed rgb error {err_rgb:.2e}"
    err = np.abs(np.asarray(whole.image) - np.asarray(buck.image)).max()
    signal = max(1.0, float(np.abs(np.asarray(whole.image)).max()))
    assert err / signal <= 1e-3

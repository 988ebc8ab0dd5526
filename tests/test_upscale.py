"""Upscaler stack tests: RRDBNet parity, tiling seams, filters/resize,
and the two-pass HDR pipeline (SURVEY.md section 4d + config 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from hdrvae.core.config import Precision, TilingConfig, UpscaleConfig
from hdrvae.models.rrdbnet import (RRDBNetConfig, init_rrdbnet,
                                   rrdbnet_apply, rrdbnet_from_state_dict)
from hdrvae.tiling.tiled import (blend_tiles, extract_tiles, plan_tiles,
                                 select_tile_size, tiled_apply)
from hdrvae.upscale.filters import gaussian_blur, median_blur
from hdrvae.upscale.pipeline import get_reversal_fn, hdr_upscale
from hdrvae.upscale.resize import common_upscale
from tests.torch_oracle import TorchRRDBNet


@pytest.fixture(scope="module")
def up_cfg():
    return RRDBNetConfig().with_small()


@pytest.fixture(scope="module")
def up_params(up_cfg):
    return init_rrdbnet(jax.random.PRNGKey(5), up_cfg)


class TestRRDBNet:
    def test_matches_torch_oracle(self, up_cfg, up_params, rng):
        """JAX RRDBNet == independent torch ESRGAN implementation."""
        oracle = TorchRRDBNet(up_cfg)
        # load via the new-arch state-dict path (exercises the loader too)
        sd = {}
        for k, v in oracle.state_dict().items():
            sd[k] = v
        params, detected = rrdbnet_from_state_dict(sd)
        assert detected == up_cfg

        x = rng.standard_normal((1, 7, 9, 3)).astype(np.float32)
        out_t = oracle(torch.from_numpy(x).permute(0, 3, 1, 2))
        out_j = rrdbnet_apply(params, jnp.asarray(x), detected,
                              precision=Precision.parity())
        np.testing.assert_allclose(
            np.asarray(out_j), out_t.permute(0, 2, 3, 1).numpy(),
            atol=1e-5, rtol=1e-4)

    @pytest.mark.parametrize("unshuffle,scale", [(2, 2), (4, 1)])
    def test_pixel_unshuffle_variants(self, rng, unshuffle, scale):
        """RealESRGAN x2/x1 checkpoints: pixel-unshuffled conv_first
        input (12/48 channels), internal 4x upsample stack, net scale
        4/unshuffle — the loader must infer the factor from the channel
        shapes (spandrel's heuristic) and the forward must pad/crop
        non-multiple inputs like RealESRGANer's pre/post_process."""
        cfg = RRDBNetConfig(nf=8, nb=2, gc=4, scale=scale,
                            unshuffle=unshuffle)
        oracle = TorchRRDBNet(cfg)
        params, detected = rrdbnet_from_state_dict(
            dict(oracle.state_dict()))
        assert detected == cfg
        assert detected.scale == scale

        # multiple-of-unshuffle input: straight parity with BasicSR
        x = rng.standard_normal((1, 8, 12, 3)).astype(np.float32)
        out_t = oracle(torch.from_numpy(x).permute(0, 3, 1, 2))
        out_j = rrdbnet_apply(params, jnp.asarray(x), detected,
                              precision=Precision.parity())
        assert out_j.shape == (1, 8 * scale, 12 * scale, 3)
        np.testing.assert_allclose(
            np.asarray(out_j), out_t.permute(0, 2, 3, 1).numpy(),
            atol=1e-5, rtol=1e-4)

        # non-multiple input: reflect-pad + crop, output scale*(H, W)
        x = rng.standard_normal((1, 7, 9, 3)).astype(np.float32)
        out_j = rrdbnet_apply(params, jnp.asarray(x), detected,
                              precision=Precision.parity())
        assert out_j.shape == (1, 7 * scale, 9 * scale, 3)
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        pad_h, pad_w = (-7) % unshuffle, (-9) % unshuffle
        ref = oracle(torch.nn.functional.pad(
            xt, (0, pad_w, 0, pad_h), mode="reflect"))
        ref = ref[:, :, :7 * scale, :9 * scale]
        np.testing.assert_allclose(
            np.asarray(out_j), ref.permute(0, 2, 3, 1).numpy(),
            atol=1e-5, rtol=1e-4)

    def test_old_arch_keys_detected(self, up_cfg, up_params, rng):
        """Old-arch ESRGAN serialization (model.N.*) loads to the same
        network as the new-arch layout."""
        oracle = TorchRRDBNet(up_cfg)
        new_sd = dict(oracle.state_dict())
        old_sd = {}
        nb = up_cfg.nb
        # translate to model.N naming
        rename = {"conv_first": "model.0",
                  "conv_body": f"model.1.sub.{nb}",
                  "conv_up1": "model.3",
                  "conv_hr": "model.6", "conv_last": "model.8"}
        for k, v in new_sd.items():
            for new, old in rename.items():
                if k.startswith(new + "."):
                    old_sd[k.replace(new, old, 1)] = v
                    break
            else:
                # body.N.rdbJ.convC -> model.1.sub.N.RDBJ.convC.0
                parts = k.split(".")
                old_sd[f"model.1.sub.{parts[1]}.RDB{parts[2][3]}."
                       f"{parts[3]}.0.{parts[4]}"] = v
        params_old, cfg_old = rrdbnet_from_state_dict(old_sd)
        params_new, cfg_new = rrdbnet_from_state_dict(new_sd)
        assert cfg_old == cfg_new
        x = jnp.asarray(rng.standard_normal((1, 5, 5, 3)), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(rrdbnet_apply(params_old, x, cfg_old)),
            np.asarray(rrdbnet_apply(params_new, x, cfg_new)))

    def test_scale_factor(self, up_cfg, up_params, rng):
        x = jnp.asarray(rng.standard_normal((1, 6, 8, 3)), jnp.float32)
        out = rrdbnet_apply(up_params, x, up_cfg)
        assert out.shape == (1, 6 * up_cfg.scale, 8 * up_cfg.scale, 3)


class TestTiling:
    def test_plan_covers_image(self):
        plan = plan_tiles(100, 70, tile=32, overlap=8)
        covered = np.zeros((100, 70), bool)
        for y, x in plan.positions:
            covered[y:y + plan.tile_h, x:x + plan.tile_w] = True
        assert covered.all()

    def test_small_image_single_tile(self):
        plan = plan_tiles(20, 20, tile=512, overlap=64)
        assert plan.num_tiles == 1
        assert plan.tile_h == 20

    def test_comfy_exact_fit_single_tile(self):
        """ComfyUI's 'entire input fits in a single tile' early-out: a
        512^2 image with tile 512 is ONE un-feathered call, not a 2x2
        grid with overlap-wide slivers."""
        from hdrvae.tiling.tiled import plan_tiles_comfy
        plan = plan_tiles_comfy(512, 512, tile=512, overlap=64)
        assert plan.tiles == ((0, 0, 512, 512),)
        # ... but a single OVERSIZE axis tiles BOTH axes (the early-out
        # requires every dim to fit)
        plan2 = plan_tiles_comfy(512, 600, tile=512, overlap=64)
        assert len({y for y, _, _, _ in plan2.tiles}) > 1
        assert len({x for _, x, _, _ in plan2.tiles}) > 1

    def test_extract_blend_identity(self, rng):
        """Identity function through feather tiling reproduces the input."""
        x = jnp.asarray(rng.standard_normal((1, 50, 38, 3)), jnp.float32)
        out = tiled_apply(lambda t: t, x, tile=16, overlap=4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   atol=1e-5)

    def test_crop_mode_identity_exact(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 50, 38, 3)), jnp.float32)
        out = tiled_apply(lambda t: t, x, tile=16, overlap=4, mode="crop")
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_upscaling_function(self, rng):
        """2x per-tile upscale stitches to 2x global (scale plumbing)."""
        x = jnp.asarray(rng.standard_normal((1, 24, 20, 3)), jnp.float32)

        def up2(t):
            b, h, w, c = t.shape
            return jnp.broadcast_to(t[:, :, None, :, None, :],
                                    (b, h, 2, w, 2, c)).reshape(
                b, 2 * h, 2 * w, c)

        out = tiled_apply(up2, x, tile=8, overlap=2, scale=2)
        assert out.shape == (1, 48, 40, 3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(up2(x)),
                                   atol=1e-5)

    def test_conv_seams(self, rng):
        """Tiled vs untiled 3x3 conv chain (SURVEY.md section 4d).

        Feather mode (the reference's tiled_scale semantics) blends in
        tile-edge padding corruption weighted by the feather ramp, so on
        random weights/data the seam error is O(ramp * activation) — bounded
        relative to signal, not tiny.  Crop mode (halo exchange) is the
        seam-free strategy: with halo/2 >= receptive-field radius the
        interior is exact.  The decode path uses crop; the upscaler keeps
        feather for reference parity.
        """
        key = jax.random.PRNGKey(0)
        kernel = jax.random.normal(key, (3, 3, 3, 3), jnp.float32) * 0.3

        def conv(t):
            return jax.lax.conv_general_dilated(
                t, kernel, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def chain(t):
            return conv(conv(t))  # receptive field radius 2

        x = jnp.asarray(rng.standard_normal((1, 40, 40, 3)), jnp.float32)
        whole = np.asarray(chain(x))
        signal = np.abs(whole).std()
        tiled = np.asarray(tiled_apply(chain, x, tile=16, overlap=8))
        assert np.abs(whole - tiled).max() < signal  # bounded by signal

        # crop mode: halo//2 = 4 >= 2*rf -> interior exact
        tiled_crop = np.asarray(tiled_apply(chain, x, tile=16, overlap=8,
                                            mode="crop"))
        interior = np.abs(whole - tiled_crop)[:, 4:-4, 4:-4]
        assert interior.max() < 1e-5

    def test_select_tile_size(self):
        # generous budget -> preferred size
        assert select_tile_size(4096, 4096, bytes_per_pixel=1000,
                                hbm_budget_bytes=10**12) == 512
        # tight budget -> shrinks, respects floor
        t = select_tile_size(4096, 4096, bytes_per_pixel=1e6,
                             hbm_budget_bytes=2**30)
        assert 128 <= t < 512


class TestFiltersAndResize:
    def test_gaussian_matches_manual(self, rng):
        """Separable gaussian vs direct 2D convolution with the same
        normalized kernel (reflect padding, torchvision semantics)."""
        x = rng.standard_normal((1, 9, 11, 1)).astype(np.float32)
        ours = np.asarray(gaussian_blur(jnp.asarray(x), 3, 0.1))
        g = np.exp(-0.5 * (np.arange(3) - 1.0) ** 2 / 0.1 ** 2)
        g /= g.sum()
        k2d = np.outer(g, g)
        xp = np.pad(x[0, :, :, 0], 1, mode="reflect")
        manual = np.zeros((9, 11), np.float32)
        for i in range(9):
            for j in range(11):
                manual[i, j] = (xp[i:i + 3, j:j + 3] * k2d).sum()
        np.testing.assert_allclose(ours[0, :, :, 0], manual, atol=1e-5)

    def test_median_matches_manual(self, rng):
        x = rng.standard_normal((1, 7, 8, 1)).astype(np.float32)
        out = np.asarray(median_blur(jnp.asarray(x), 3))
        # zero padding: kornia's conv2d-unfold semantics
        xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        for i in range(7):
            for j in range(8):
                window = xp[0, i:i + 3, j:j + 3, 0]
                assert out[0, i, j, 0] == pytest.approx(
                    np.median(window), abs=1e-6)

    def test_median_kills_hot_pixel(self):
        x = np.zeros((1, 5, 5, 1), np.float32)
        x[0, 2, 2, 0] = 100.0
        out = np.asarray(median_blur(jnp.asarray(x), 3))
        assert out.max() == 0.0

    @pytest.mark.parametrize("method", ["nearest-exact", "bilinear",
                                        "bicubic", "area", "bislerp"])
    def test_resize_methods_run(self, rng, method):
        x = jnp.asarray(rng.standard_normal((1, 8, 6, 3)), jnp.float32)
        out = common_upscale(x, 12, 16, method)
        assert out.shape == (1, 16, 12, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_nearest_exact_matches_torch(self, rng):
        x = rng.standard_normal((1, 5, 7, 3)).astype(np.float32)
        ours = np.asarray(common_upscale(jnp.asarray(x), 14, 10,
                                         "nearest-exact"))
        theirs = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(10, 14),
            mode="nearest-exact").permute(0, 2, 3, 1).numpy()
        np.testing.assert_array_equal(ours, theirs)

    def test_area_matches_torch(self, rng):
        x = rng.standard_normal((1, 8, 12, 3)).astype(np.float32)
        ours = np.asarray(common_upscale(jnp.asarray(x), 6, 4, "area"))
        theirs = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(4, 6),
            mode="area").permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_area_large_image_precision(self, rng):
        """The old float32 double-cumsum formulation accumulated 0.037
        absolute error at 768^2 (values quantized to 1/32); the
        box-matrix formulation must match torch to float noise at a
        non-integer factor on a large image."""
        x = rng.standard_normal((1, 768, 768, 1)).astype(np.float32)
        ours = np.asarray(common_upscale(jnp.asarray(x), 512, 512,
                                         "area"))
        theirs = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(512, 512),
            mode="area").permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-5)

    def test_bilinear_downscale_matches_torch_no_antialias(self, rng):
        """common_upscale('bilinear') must match torch F.interpolate
        antialias=False semantics on a DOWNSCALE (jax.image.resize
        defaults to antialias=True, which diverges badly there)."""
        x = rng.standard_normal((1, 16, 12, 3)).astype(np.float32)
        ours = np.asarray(common_upscale(jnp.asarray(x), 6, 8,
                                         "bilinear"))
        theirs = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(8, 6),
            mode="bilinear", align_corners=False
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_bislerp_preserves_constant_image(self):
        x = jnp.full((1, 4, 4, 3), 2.5, jnp.float32)
        out = np.asarray(common_upscale(x, 8, 8, "bislerp"))
        np.testing.assert_allclose(out, 2.5, atol=1e-4)


class TestReversalSelection:
    def test_mapping(self):
        """`hdr_upscale_with_model.py:266-279`: ESRGAN-family -> atanh,
        VAE-ish -> atanh, unknown -> logit."""
        from hdrvae.decode.modes import inverse_sigmoid, inverse_tanh
        for arch in ("ESRGAN", "RealESRGAN", "SwinIR", "HAT", "SomeVAE"):
            assert get_reversal_fn(arch) is inverse_tanh
        assert get_reversal_fn("DAT") is inverse_sigmoid


class TestHDRUpscalePipeline:
    def test_end_to_end(self, up_cfg, up_params, rng):
        img = jnp.asarray(rng.uniform(-0.5, 3.0, (1, 12, 14, 3)),
                          jnp.float32)
        cfg = UpscaleConfig(tiling=TilingConfig(tile=8, overlap=2))
        res = hdr_upscale(up_params, img, up_cfg, cfg,
                          architecture="ESRGAN")
        s = up_cfg.scale
        assert res.image.shape == (1, 12 * s, 14 * s, 3)
        assert np.isfinite(np.asarray(res.image)).all()

    def test_luma_ceiling_respected(self, up_cfg, up_params, rng):
        """Pass-1 luma is clamped to [0, 8] before recombination
        (`hdr_upscale_with_model.py:202`)."""
        from hdrvae.core.color import rgb_to_ycbcr
        img = jnp.asarray(rng.uniform(0.0, 30.0, (1, 8, 8, 3)), jnp.float32)
        cfg = UpscaleConfig(tiling=TilingConfig(tile=8, overlap=2))
        res = hdr_upscale(up_params, img, up_cfg, cfg)
        y = np.asarray(rgb_to_ycbcr(res.image))[..., 0]
        assert y.max() <= 8.0 + 1e-3

    def test_local_fix_clamps_dark_areas(self, up_cfg, up_params, rng):
        img = jnp.asarray(rng.uniform(0.0, 0.05, (1, 8, 8, 3)), jnp.float32)
        cfg = UpscaleConfig(local_fix=True,
                            tiling=TilingConfig(tile=8, overlap=2))
        res = hdr_upscale(up_params, img, up_cfg, cfg)
        # everything is dark -> whole image masked -> clamped to [-1, 1]
        assert np.asarray(res.image).max() <= 1.0 + 1e-5
        assert np.asarray(res.image).min() >= -1.0 - 1e-5

    def test_small_blur_flag(self, up_cfg, up_params, rng):
        img = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)), jnp.float32)
        cfg = UpscaleConfig(small_blur=True,
                            tiling=TilingConfig(tile=8, overlap=2))
        res = hdr_upscale(up_params, img, up_cfg, cfg)
        assert np.isfinite(np.asarray(res.image)).all()

    def test_bad_input_rejected(self, up_cfg, up_params):
        with pytest.raises(ValueError, match="B, H, W, 3"):
            hdr_upscale(up_params, jnp.zeros((4, 4, 3)), up_cfg)


class TestBudgetedTiling:
    def test_hbm_budget_shrinks_tile(self, up_cfg, up_params, rng):
        """A tight hbm budget makes the pipeline pick a smaller tile; the
        output is still correct (same content as the unbudgeted run up to
        seam blending)."""
        img = jnp.asarray(rng.uniform(0, 1, (1, 20, 20, 3)), jnp.float32)
        free = UpscaleConfig(tiling=TilingConfig(tile=16, overlap=2))
        tight = UpscaleConfig(tiling=TilingConfig(
            tile=16, overlap=2, min_tile=4,
            hbm_budget_bytes=8 * 8 * 200))  # forces tiles below 16
        a = hdr_upscale(up_params, img, up_cfg, free)
        b = hdr_upscale(up_params, img, up_cfg, tight)
        assert a.image.shape == b.image.shape
        # interiors agree; seams differ only by feather blending
        diff = np.abs(np.asarray(a.image) - np.asarray(b.image))
        assert np.median(diff) < 0.05


class TestBicubicTorchParity:
    def test_matches_torch_bicubic(self, rng):
        x = rng.standard_normal((1, 7, 9, 3)).astype(np.float32)
        ours = np.asarray(common_upscale(jnp.asarray(x), 18, 14, "bicubic"))
        theirs = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(14, 18),
            mode="bicubic", align_corners=False,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)

    @pytest.mark.slow
    def test_downscale_matches_torch(self, rng):
        x = rng.standard_normal((1, 12, 16, 3)).astype(np.float32)
        ours = np.asarray(common_upscale(jnp.asarray(x), 8, 6, "bicubic"))
        theirs = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(6, 8),
            mode="bicubic", align_corners=False,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


class TestProgress:
    """Per-tile/per-frame progress (VERDICT round-1 missing item 4)."""

    def test_upscale_pbar_counts_and_matches(self, up_cfg, up_params, rng):
        from hdrvae.upscale.pipeline import upscale_progress_total

        class Counter:
            n = 0

            def update(self, k=1):
                self.n += k

        img = jnp.asarray(
            np.abs(rng.standard_normal((1, 20, 20, 3))).astype(np.float32))
        cfg = UpscaleConfig(tiling=TilingConfig(tile=8, overlap=2))
        total = upscale_progress_total(img, up_cfg, cfg)
        # comfy-semantics grid (the default seam_mode): starts every
        # tile-overlap=6 px -> 4 per axis (the last a clamped 2px sliver),
        # 4x4 tiles, two passes
        assert total == 2 * 16

        counter = Counter()
        with_pbar = hdr_upscale(up_params, img, up_cfg, cfg,
                                pbar=counter)
        assert counter.n == total
        without = hdr_upscale(up_params, img, up_cfg, cfg)
        np.testing.assert_allclose(np.asarray(with_pbar.image),
                                   np.asarray(without.image),
                                   atol=1e-5, rtol=1e-5)

    def test_export_pbar_per_frame(self, tmp_path, rng):
        from hdrvae.core.config import ExportConfig
        from hdrvae.io.export import export_linear

        class Counter:
            n = 0

            def update(self, k=1):
                self.n += k

        counter = Counter()
        imgs = rng.standard_normal((3, 6, 6, 3)).astype(np.float32)
        res = export_linear(imgs, ExportConfig(filename_prefix="p"),
                            default_output_dir=str(tmp_path), pbar=counter)
        assert res.error is None and counter.n == 3

    def test_progress_bar_renders(self, caplog):
        import logging
        from hdrvae.utils.progress import ProgressBar

        class FakeStream:
            def __init__(self):
                self.buf = []

            def write(self, s):
                self.buf.append(s)

            def flush(self):
                pass

            def isatty(self):
                return True

        stream = FakeStream()
        bar = ProgressBar(4, desc="t ", stream=stream)
        for _ in range(4):
            bar.update()
        assert any("4/4" in s for s in stream.buf)

        with caplog.at_level(logging.INFO):
            quiet = ProgressBar(8, stream=open("/dev/null", "w"))
            for _ in range(8):
                quiet.update()
        assert any("8/8" in r.getMessage() for r in caplog.records)


def test_feather_mask_tile_smaller_than_feather(rng):
    """A thin image dim (< overlap) while the other dim tiles: feather
    blending must produce overlapping ramps, not a broadcast crash."""
    from hdrvae.tiling.tiled import tiled_apply
    x = jnp.asarray(rng.standard_normal((1, 200, 10, 3)), jnp.float32)
    out = tiled_apply(lambda t: t, x, tile=64, overlap=16, mode="feather")
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)

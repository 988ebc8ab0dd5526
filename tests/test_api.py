"""Node-protocol API tests: INPUT_TYPES contracts must match the reference
exactly (they are the public API, SURVEY.md section 5 config row)."""

import os

import numpy as np
import pytest

import hdrvae
from hdrvae.api import folders
from hdrvae.api.nodes import (HDRUpscaleWithModel, HDRVAEDecode,
                              LinearEXRExport)
from hdrvae.api.vae import VAE


class TestRegistry:
    def test_node_mappings(self):
        assert set(hdrvae.NODE_CLASS_MAPPINGS) == {
            "HDRVAEDecode", "LinearEXRExport", "HDRUpscaleWithModel"}
        assert hdrvae.NODE_DISPLAY_NAME_MAPPINGS["HDRVAEDecode"] == \
            "HDR VAE Decode"
        assert hdrvae.NODE_CLASS_MAPPINGS["HDRVAEDecode"] is HDRVAEDecode


class TestContracts:
    def test_decode_contract(self):
        it = HDRVAEDecode.INPUT_TYPES()
        assert it["required"]["samples"] == ("LATENT",)
        assert it["required"]["vae"] == ("VAE",)
        modes, spec = it["optional"]["hdr_mode"]
        assert modes == ["conservative", "exposure", "adaptive_recovery",
                         "mathematical_recovery"]
        assert spec["default"] == "mathematical_recovery"
        _, ev = it["optional"]["conservative_ev_multiplier"]
        assert (ev["default"], ev["min"], ev["max"], ev["step"]) == \
            (1.0, 0.1, 10.0, 0.1)
        assert HDRVAEDecode.RETURN_TYPES == ("IMAGE",)
        assert HDRVAEDecode.FUNCTION == "simple_hdr_decode"
        assert HDRVAEDecode.CATEGORY == "latent"

    def test_export_contract(self):
        it = LinearEXRExport.INPUT_TYPES()
        assert "hdr_image" in it["required"]
        opt = it["optional"]
        assert opt["format"][0] == ["exr", "hdr"]
        assert opt["bit_depth"][0] == ["16bit", "32bit"]
        assert opt["compression"][0] == ["none", "rle", "zip", "piz",
                                         "pxr24"]
        assert opt["start_frame"][1]["default"] == 1001
        assert opt["frame_pad"][1] == {"default": 4, "min": 1, "max": 8}
        assert it["hidden"] == {"prompt": "PROMPT",
                                "extra_pnginfo": "EXTRA_PNGINFO"}
        assert LinearEXRExport.OUTPUT_NODE is True
        assert LinearEXRExport.RETURN_TYPES == ("STRING",)
        assert LinearEXRExport.CATEGORY == "image"

    def test_upscale_contract(self):
        it = HDRUpscaleWithModel.INPUT_TYPES()
        req = it["required"]
        assert req["upscale_method"][0] == [
            "nearest-exact", "bilinear", "area", "bicubic", "bislerp"]
        assert req["upscale_method"][1]["default"] == "bislerp"
        assert HDRUpscaleWithModel.CATEGORY == "HDR/Upscale"
        assert HDRUpscaleWithModel.FUNCTION == "upscale"


class TestNodeExecution:
    @pytest.mark.slow
    def test_decode_node_end_to_end(self, small_cfg, rng):
        """Drive the node exactly as a graph executor would."""
        vae = VAE.random_init(seed=3, config=small_cfg)
        latent = rng.standard_normal(
            (1, 6, 6, small_cfg.z_channels)).astype(np.float32) * 2
        node = HDRVAEDecode()
        (image,) = node.simple_hdr_decode(
            {"samples": latent}, vae, hdr_mode="mathematical_recovery",
            conservative_ev_multiplier=1.0)
        scale = small_cfg.spatial_scale
        assert image.shape == (1, 6 * scale, 6 * scale, 3)
        assert image.dtype == np.float32

    def test_builtin_vaedecode_matches_standard_image(self, small_cfg,
                                                      rng):
        """VAEDecode (the builtin-decode stand-in) now runs the bare
        decoder forward; it must equal the full pipeline's `standard`
        image exactly."""
        import jax.numpy as jnp

        from hdrvae.api.nodes import VAEDecode
        from hdrvae.core.config import HDRDecodeConfig
        from hdrvae.decode.pipeline import hdr_decode

        vae = VAE.random_init(seed=5, config=small_cfg)
        latent = rng.standard_normal(
            (1, 6, 6, small_cfg.z_channels)).astype(np.float32) * 2
        (got,) = VAEDecode().decode({"samples": latent}, vae)
        want = np.asarray(hdr_decode(
            vae.params, jnp.asarray(latent), vae.config,
            HDRDecodeConfig(), vae.precision).standard)
        np.testing.assert_allclose(got, want, atol=1e-5)
        # NCHW torch-layout latents keep working
        (got2,) = VAEDecode().decode(
            {"samples": latent.transpose(0, 3, 1, 2)}, vae)
        np.testing.assert_allclose(got2, want, atol=1e-5)

    def test_decode_accepts_torch_latent(self, small_cfg, rng):
        torch = pytest.importorskip("torch")
        vae = VAE.random_init(seed=3, config=small_cfg)
        latent = torch.randn(1, small_cfg.z_channels, 4, 4)  # NCHW torch
        node = HDRVAEDecode()
        (image,) = node.simple_hdr_decode({"samples": latent}, vae)
        assert image.shape[-1] == 3

    def test_export_node(self, tmp_path, monkeypatch, rng):
        monkeypatch.setenv("HDRVAE_OUTPUT_DIR", str(tmp_path))
        node = LinearEXRExport()
        img = rng.standard_normal((5, 7, 3)).astype(np.float32) * 4
        (path,) = node.export_linear_exr(
            img, filename_prefix="api", output_path="", format="exr",
            bit_depth="32bit", compression="zip", versioning=False)
        assert os.path.exists(path)
        from hdrvae.io import exr
        np.testing.assert_array_equal(exr.read_exr(path), img)

    def test_export_node_error_tuple(self, tmp_path, monkeypatch, rng):
        monkeypatch.setenv("HDRVAE_OUTPUT_DIR", str(tmp_path))
        node = LinearEXRExport()
        (ret,) = node.export_linear_exr(
            np.zeros((3,)), filename_prefix="bad", output_path="")
        assert ret.startswith("ERROR:")

    def test_upscale_node_with_checkpoint(self, tmp_path, monkeypatch, rng):
        """Full node path: write a torch checkpoint, register the folder,
        run the node."""
        torch = pytest.importorskip("torch")
        from hdrvae.models.rrdbnet import RRDBNetConfig
        from tests.torch_oracle import TorchRRDBNet
        cfg = RRDBNetConfig().with_small()
        model = TorchRRDBNet(cfg)
        mdir = tmp_path / "upscale_models"
        mdir.mkdir()
        torch.save(model.state_dict(), str(mdir / "tiny_x2.pth"))
        monkeypatch.setenv("HDRVAE_MODELS_DIR", str(tmp_path))

        assert "tiny_x2.pth" in HDRUpscaleWithModel.INPUT_TYPES()[
            "required"]["model_name"][0]
        node = HDRUpscaleWithModel()
        img = rng.uniform(0, 2, (1, 10, 12, 3)).astype(np.float32)
        (out,) = node.upscale(img, "tiny_x2.pth", small_blur=False,
                              local_fix=False, upscale_method="bilinear")
        assert out.shape == (1, 20, 24, 3)


class TestFolders:
    def test_missing_model_error(self):
        with pytest.raises(FileNotFoundError, match="HDRVAE_MODELS_DIR"):
            folders.get_full_path("upscale_models", "nope.pth")

    def test_filename_list_recurses_subdirectories(self, tmp_path,
                                                   monkeypatch):
        """ComfyUI's get_filename_list returns recursive relative paths
        — the common upscale_models/4x/model.pth layout must appear in
        the dropdown and resolve via get_full_path."""
        mdir = tmp_path / "upscale_models" / "4x"
        mdir.mkdir(parents=True)
        (mdir / "RealESRGAN_x4plus.pth").write_bytes(b"x")
        (tmp_path / "upscale_models" / "top.safetensors").write_bytes(b"y")
        monkeypatch.setenv("HDRVAE_MODELS_DIR", str(tmp_path))
        names = folders.get_filename_list("upscale_models")
        assert "4x/RealESRGAN_x4plus.pth" in names
        assert "top.safetensors" in names
        assert folders.get_full_path(
            "upscale_models", "4x/RealESRGAN_x4plus.pth").endswith(
                "RealESRGAN_x4plus.pth")

    def test_bare_root_lists_loose_files_only(self, tmp_path, monkeypatch):
        """The bare HDRVAE_MODELS_DIR root contributes only loose files:
        recursing there would duplicate the kind subdir's entries under a
        second relative path and list sibling kinds' checkpoints (a VAE)
        as selectable upscale models."""
        (tmp_path / "upscale_models" / "4x").mkdir(parents=True)
        (tmp_path / "upscale_models" / "4x" / "x.pth").write_bytes(b"x")
        (tmp_path / "vae").mkdir()
        (tmp_path / "vae" / "ae.safetensors").write_bytes(b"v")
        (tmp_path / "loose.pth").write_bytes(b"l")
        monkeypatch.setenv("HDRVAE_MODELS_DIR", str(tmp_path))
        names = folders.get_filename_list("upscale_models")
        assert names == ["4x/x.pth", "loose.pth"]


class TestComfyAdapter:
    def test_torch_returns(self, small_cfg, rng):
        torch = pytest.importorskip("torch")
        from hdrvae.api import comfy
        vae = VAE.random_init(seed=3, config=small_cfg)
        latent = rng.standard_normal(
            (1, 4, 4, small_cfg.z_channels)).astype(np.float32)
        node = comfy.NODE_CLASS_MAPPINGS["HDRVAEDecode"]()
        (image,) = node.simple_hdr_decode({"samples": latent}, vae)
        assert isinstance(image, torch.Tensor)
        assert image.dtype == torch.float32
        assert image.shape[-1] == 3


def test_output_dir_discovery_heuristic(tmp_path, monkeypatch):
    """The reference's ComfyUI-root tree walk
    (`linear_exr_export.py:443-463`): a directory holding custom_nodes +
    models marks the root; env var wins over discovery."""
    from hdrvae.api import folders

    root = tmp_path / "ComfyUI"
    (root / "custom_nodes" / "pack").mkdir(parents=True)
    (root / "models").mkdir()
    found = folders.discover_comfyui_output(str(root / "custom_nodes"
                                                / "pack"))
    assert found == str(root / "output")
    assert folders.discover_comfyui_output(str(tmp_path)) in (
        None, str(root / "output"))  # tmp_path itself is not a root

    monkeypatch.setenv("HDRVAE_OUTPUT_DIR", "/somewhere/else")
    assert folders.get_output_directory() == "/somewhere/else"


def test_node_python_defaults_match_input_types():
    """The FUNCTION's Python defaults must agree with the INPUT_TYPES
    declared defaults — graphs that omit optional widgets fall through
    to the Python signature, so two contradictory contracts would give
    API-format graphs different behavior than UI graphs."""
    import inspect
    import hdrvae
    for name, cls in hdrvae.NODE_CLASS_MAPPINGS.items():
        fn = getattr(cls, cls.FUNCTION)
        sig = inspect.signature(fn)
        it = cls.INPUT_TYPES()
        declared = {**it.get("required", {}), **it.get("optional", {})}
        for pname, spec in declared.items():
            if not (isinstance(spec, tuple) and len(spec) > 1
                    and isinstance(spec[1], dict) and "default" in spec[1]):
                continue
            param = sig.parameters.get(pname)
            if param is None or param.default is inspect.Parameter.empty:
                continue
            assert param.default == spec[1]["default"], (
                f"{name}.{pname}: Python default {param.default!r} != "
                f"declared {spec[1]['default']!r}")

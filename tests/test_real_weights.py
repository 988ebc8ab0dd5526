"""Real-checkpoint validation harness (activates when weights appear).

All other parity in this suite runs on random weights (torch oracles + the
reference's own code); no real `ae.safetensors` / ESRGAN `.pth` exists in
the build environment.  These tests close that gap the day weights appear:

    HDRVAE_MODELS_DIR=/path/to/models python -m pytest tests/test_real_weights.py -v

expecting (any subset activates its tests):

    $HDRVAE_MODELS_DIR/ae.safetensors          # Flux.1 VAE (decoder used)
    $HDRVAE_MODELS_DIR/RealESRGAN_x4plus.pth   # or any ESRGAN-family ckpt
                                               #   named *.pth/*.safetensors

What runs:
  - loader round trip + torch-oracle forward parity (<=1e-3) on the REAL
    weight statistics (random-weight parity can hide scale-dependent bugs),
  - the full HDR decode pipeline on a fixed latent, with a golden
    fingerprint (per-mode stats + pixel hash) RECORDED on first run into
    tests/golden/real_weights_*.json and COMPARED on every later run,
  - EXR export + read-back of the decoded image,
  - the two-pass HDR upscale on the real ESRGAN checkpoint.
"""

import hashlib
import json
import os

import jax
import numpy as np
import pytest

MODELS_DIR = os.environ.get("HDRVAE_MODELS_DIR", "")
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

VAE_PATH = os.path.join(MODELS_DIR, "ae.safetensors")


def _esrgan_path():
    if not MODELS_DIR or not os.path.isdir(MODELS_DIR):
        return None
    preferred = os.path.join(MODELS_DIR, "RealESRGAN_x4plus.pth")
    if os.path.isfile(preferred):
        return preferred
    for name in sorted(os.listdir(MODELS_DIR)):
        if name.endswith((".pth", ".safetensors")) and "esrgan" in \
                name.lower():
            return os.path.join(MODELS_DIR, name)
    return None


needs_vae = pytest.mark.skipif(
    not os.path.isfile(VAE_PATH),
    reason="set HDRVAE_MODELS_DIR with ae.safetensors to activate")
needs_esrgan = pytest.mark.skipif(
    _esrgan_path() is None,
    reason="set HDRVAE_MODELS_DIR with an ESRGAN .pth to activate")


def _fixed_latent(cfg, h=32, w=32):
    rng = np.random.default_rng(20260817)
    return (rng.standard_normal((1, h, w, cfg.z_channels))
            .astype(np.float32))


def _fingerprint(image: np.ndarray) -> dict:
    q = np.asarray(image, np.float16)  # quantize: robust to float noise
    return {
        "sha256_f16": hashlib.sha256(q.tobytes()).hexdigest(),
        "mean": float(image.mean()),
        "std": float(image.std()),
        "min": float(image.min()),
        "max": float(image.max()),
        "hdr_pixels": int((image > 1.0).sum()),
        "shape": list(image.shape),
    }


def _check_golden(name: str, got: dict, atol: float = 1e-3):
    """Record-on-first-run golden: compares stats within atol and reports
    hash drift; deleting the JSON re-records."""
    path = os.path.join(GOLDEN_DIR, f"real_weights_{name}.json")
    if not os.path.isfile(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            json.dump(got, f, indent=2, sort_keys=True)
        pytest.skip(f"golden recorded at {path}; rerun to compare")
    with open(path) as f:
        want = json.load(f)
    assert got["shape"] == want["shape"]
    assert got["hdr_pixels"] == want["hdr_pixels"], (
        f"{name}: hdr_pixels {got['hdr_pixels']} != {want['hdr_pixels']}")
    for k in ("mean", "std", "min", "max"):
        assert abs(got[k] - want[k]) <= atol * max(1.0, abs(want[k])), (
            f"{name}.{k}: {got[k]} vs golden {want[k]}")
    assert got["sha256_f16"] == want["sha256_f16"], (
        f"{name}: pixel hash drifted (stats within tolerance — "
        f"delete {path} to re-record if the change is intended)")


# ---------------------------------------------------------------------------
# Flux.1 VAE
# ---------------------------------------------------------------------------


@needs_vae
def test_real_vae_loads_and_matches_torch_oracle():
    from hdrvae.core.config import DecoderConfig, Precision
    from hdrvae.models.decoder import decoder_apply
    from hdrvae.models.params import load_decoder
    from tests.torch_oracle import torch_decoder_from_jax
    import torch

    cfg = DecoderConfig()
    params = load_decoder(VAE_PATH, cfg)
    latent = _fixed_latent(cfg, 16, 16)

    out = decoder_apply(params, latent, cfg, precision=Precision.parity())
    oracle = torch_decoder_from_jax(params, cfg)
    with torch.no_grad():
        rgb_t, pre_t = oracle(
            torch.from_numpy(np.transpose(latent, (0, 3, 1, 2)).copy()))
    rgb_t = np.transpose(rgb_t.numpy(), (0, 2, 3, 1))
    err = np.abs(np.asarray(out.rgb) - rgb_t).max()
    assert err <= 1e-3, f"real-weights decoder parity: {err:.3e}"


@needs_vae
@pytest.mark.parametrize("mode", ["conservative", "mathematical_recovery"])
def test_real_vae_hdr_decode_golden(mode):
    from hdrvae.core.config import DecoderConfig, HDRDecodeConfig, Precision
    from hdrvae.decode.pipeline import hdr_decode
    from hdrvae.models.params import load_decoder

    cfg = DecoderConfig()
    params = load_decoder(VAE_PATH, cfg)
    result = hdr_decode(params, _fixed_latent(cfg), cfg,
                        HDRDecodeConfig(hdr_mode=mode), Precision.parity())
    image = np.asarray(result.image)
    assert np.isfinite(image).all()
    _check_golden(f"decode_{mode}", _fingerprint(image))


@needs_vae
def test_real_vae_exr_roundtrip(tmp_path):
    from hdrvae.core.config import (DecoderConfig, ExportConfig,
                                    HDRDecodeConfig, Precision)
    from hdrvae.decode.pipeline import hdr_decode
    from hdrvae.io import exr as exr_io
    from hdrvae.io.export import export_linear
    from hdrvae.models.params import load_decoder

    cfg = DecoderConfig()
    params = load_decoder(VAE_PATH, cfg)
    result = hdr_decode(params, _fixed_latent(cfg), cfg,
                        HDRDecodeConfig(), Precision.parity())
    image = np.asarray(result.image)
    export = export_linear(
        image, ExportConfig(filename_prefix="real", output_path=str(
            tmp_path), bit_depth="32bit", compression="zip"),
        default_output_dir=str(tmp_path))
    assert export.error is None
    back = exr_io.read_exr(export.last)
    np.testing.assert_allclose(back, image[0], atol=1e-6)


# ---------------------------------------------------------------------------
# ESRGAN upscaler
# ---------------------------------------------------------------------------


@needs_esrgan
def test_real_esrgan_loads_and_matches_torch_oracle():
    import torch
    from hdrvae.core.config import Precision
    from hdrvae.models.rrdbnet import (detect_architecture,
                                       load_upscale_model, rrdbnet_apply)
    from tests.torch_oracle import TorchRRDBNet

    path = _esrgan_path()
    params, cfg, arch = load_upscale_model(path)

    rng = np.random.default_rng(7)
    x = np.clip(rng.standard_normal((1, 24, 24, 3)) * 0.2 + 0.4, 0, 1) \
        .astype(np.float32)
    got = np.asarray(rrdbnet_apply(params, x, cfg,
                                   precision=Precision.parity()))

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "params_ema" in sd:
        sd = sd["params_ema"]
    elif isinstance(sd, dict) and "params" in sd:
        sd = sd["params"]
    if detect_architecture(sd) != "esrgan-new":
        pytest.skip("torch oracle carries the new-arch schema only; the "
                    "old-arch loader is covered by its key-mapping tests")
    oracle = TorchRRDBNet(cfg)
    oracle.load_state_dict(sd)
    oracle.eval()
    with torch.no_grad():
        ref = oracle(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)).copy())).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))
    scale = max(1.0, float(np.abs(ref).max()))
    err = np.abs(got - ref).max()
    assert err <= 1e-3 * scale, f"real ESRGAN parity: {err:.3e}"


@needs_esrgan
def test_real_esrgan_hdr_upscale_golden():
    from hdrvae.core.config import UpscaleConfig
    from hdrvae.models.rrdbnet import load_upscale_model
    from hdrvae.upscale.pipeline import hdr_upscale
    import jax.numpy as jnp

    params, cfg, arch = load_upscale_model(_esrgan_path())
    rng = np.random.default_rng(20260817)
    image = np.abs(rng.standard_normal((1, 32, 32, 3))).astype(
        np.float32) * 0.5
    image[0, 4:8, 4:8] *= 6.0
    result = hdr_upscale(params, jnp.asarray(image), cfg,
                         UpscaleConfig(local_fix=True), architecture=arch)
    out = np.asarray(result.image)
    assert out.shape == (1, 32 * cfg.scale, 32 * cfg.scale, 3)
    assert np.isfinite(out).all()
    _check_golden("esrgan_upscale", _fingerprint(out))


def _all_upscaler_ckpts():
    if not MODELS_DIR or not os.path.isdir(MODELS_DIR):
        return []
    return [n for n in sorted(os.listdir(MODELS_DIR))
            if n.endswith((".pth", ".safetensors"))
            and n != "ae.safetensors"]


@pytest.mark.parametrize("name", _all_upscaler_ckpts() or ["<none>"])
def test_real_zoo_checkpoint_loads_and_upscales(name):
    """ANY upscaler checkpoint dropped into HDRVAE_MODELS_DIR must be
    detected by the zoo (ESRGAN/RealESRGAN/SwinIR/Swin2SR/HAT/Compact/
    SPAN/RealPLKSR key
    schemas), upscale a fixed image, pick a reversal per the reference's
    name map, and golden-fingerprint the result."""
    if name == "<none>":
        pytest.skip("set HDRVAE_MODELS_DIR with upscaler checkpoints")
    import jax.numpy as jnp
    from hdrvae.models.zoo import load_upscale_model, upscaler_apply
    from hdrvae.upscale.pipeline import get_reversal_fn

    params, cfg, arch = load_upscale_model(os.path.join(MODELS_DIR, name))
    rng = np.random.default_rng(11)
    x = np.clip(rng.standard_normal((1, 24, 24, 3)) * 0.2 + 0.4, 0, 1) \
        .astype(np.float32)
    y = np.asarray(upscaler_apply(params, jnp.asarray(x), cfg))
    assert y.shape == (1, 24 * cfg.scale, 24 * cfg.scale, 3)
    assert np.isfinite(y).all()
    get_reversal_fn(arch)   # raises on unknown arch names
    _check_golden(f"zoo_{os.path.splitext(name)[0]}", _fingerprint(y))

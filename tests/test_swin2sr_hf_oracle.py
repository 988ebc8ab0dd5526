"""Swin2SR vs the REAL transformers implementation (independent oracle).

Every other Swin2SR parity test compares hdrvae against
tests/torch_oracle.py's TorchSwin2SR — a transcription written alongside
the JAX port, so a shared misunderstanding of the architecture would
pass both.  The ``transformers`` library ships an independent port of
the original network (`transformers/models/swin2sr/modeling_swin2sr.py`,
converted from the official `caidas/swin2SR-*` checkpoints); these tests
convert a random-initialized HF model's state dict into the original-repo
key schema via `hf_swin2sr_to_original` and assert hdrvae reproduces the
HF forward.

Two knowing deviations of the HF FORWARD from the original network are
handled explicitly (the weights themselves are pure renames):

  - aux head: HF convolves the RAW input through conv_bicubic
    (`modeling_swin2sr.py`: `interpolate(pixel_values)` before
    `pad_and_normalize`); the original convolves the NORMALIZED input.
    The two differ exactly by the RGB-mean offset (a bias fold cannot
    equalize them: conv_bicubic zero-pads, so border pixels see fewer
    offset taps), so the aux test zeroes the mean on BOTH sides —
    HF's ``mean`` buffer and hdrvae's ``_RGB_MEAN`` — making raw ==
    normalized; everything else about the head compares exactly.
  - '' restoration head: HF adds the RAW input to the residual where the
    original adds the NORMALIZED input; with 1-channel (mean 0) and
    img_range=1 the two coincide, so that head is tested at 1 channel.

Both tests also pin the HF port's patch-'projection' convs (layers the
original network does not have) to identity — the same condition
`hf_swin2sr_to_original` enforces on real converted checkpoints.
"""

import numpy as np
import pytest
import torch

from hdrvae.core.config import Precision
from hdrvae.models.swin2sr import (hf_swin2sr_to_original,
                                   is_hf_swin2sr_state_dict,
                                   is_swin2sr_state_dict, swin2sr_apply,
                                   swin2sr_from_state_dict)

transformers = pytest.importorskip("transformers")


def _hf_model(upsampler, upscale, window=4, channels=3, image=12, seed=11):
    from transformers import Swin2SRConfig as HFConfig
    from transformers import Swin2SRForImageSuperResolution
    cfg = HFConfig(image_size=image, patch_size=1, num_channels=channels,
                   num_channels_out=channels, embed_dim=16,
                   depths=[2, 2], num_heads=[2, 2], window_size=window,
                   mlp_ratio=2.0, qkv_bias=True, upsampler=upsampler,
                   upscale=upscale, img_range=1.0,
                   resi_connection="1conv", hidden_act="gelu",
                   use_absolute_embeddings=False,
                   hidden_dropout_prob=0.0,
                   attention_probs_dropout_prob=0.0, drop_path_rate=0.0)
    model = Swin2SRForImageSuperResolution(cfg)
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "logit_scale" in name:
                # O(1..50) attention scale — 0.02-scale fixtures hide
                # precision/normalization bugs (PERF_NOTES 5.13)
                p.copy_(torch.log(
                    1.0 + 49.0 * torch.rand(p.shape, generator=gen)))
            elif "layernorm" in name or "norm" in name.split(".")[-2:][0]:
                if name.endswith("weight"):
                    p.copy_(1.0 + 0.3 * torch.randn(p.shape, generator=gen))
                else:
                    p.copy_(0.1 * torch.randn(p.shape, generator=gen))
            else:
                p.copy_(0.05 * torch.randn(p.shape, generator=gen))
        # the HF-only patch 'projection' convs must be identity for the
        # model to represent the original network
        for name, mod in model.named_modules():
            if name.endswith(("patch_embeddings.projection",
                              "patch_embed.projection")):
                c = mod.weight.shape[0]
                mod.weight.copy_(torch.eye(c).reshape(c, c, 1, 1))
                mod.bias.zero_()
    model.eval()
    return model


def _compare(model, h, w, channels=3, tol=2e-4):
    sd = {k: v for k, v in model.state_dict().items()}
    assert is_hf_swin2sr_state_dict(sd)
    converted = hf_swin2sr_to_original(
        sd, window_size=model.config.window_size)
    params, cfg = swin2sr_from_state_dict(converted, img_range=1.0)
    assert cfg.window_size == model.config.window_size
    assert cfg.scale == (model.config.upscale
                         if model.config.upsampler else 1)

    rng = np.random.default_rng(7)
    x = rng.uniform(0.0, 1.0, (1, h, w, channels)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)).copy())).reconstruction.numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))

    got = np.asarray(swin2sr_apply(params, x, cfg,
                                   precision=Precision.parity()))
    assert got.shape == ref.shape
    err = float(np.abs(got - ref).max())
    scale = max(1.0, float(np.abs(ref).max()))
    assert err <= tol * scale, \
        f"{model.config.upsampler!r}: max-abs {err:.3e} (scale {scale:.2f})"


@pytest.mark.parametrize("upsampler,upscale", [
    ("pixelshuffle", 2),
    ("pixelshuffle", 4),
    ("pixelshuffledirect", 2),
    ("nearest+conv", 4),
])
def test_hf_oracle_sr_heads(upsampler, upscale):
    _compare(_hf_model(upsampler, upscale), 12, 12)


def test_hf_oracle_window7():
    """Odd window (the JPEG-CAR geometry) through shift-3 blocks."""
    _compare(_hf_model("pixelshuffle", 2, window=7, image=14), 14, 14)


def test_hf_oracle_aux_head(monkeypatch):
    """Aux head with the RGB mean zeroed on both sides (see module
    docstring: HF's bicubic skip runs on the raw input)."""
    import hdrvae.models.swin2sr as m
    model = _hf_model("pixelshuffle_aux", 4)
    with torch.no_grad():
        model.swin2sr.mean.zero_()
    monkeypatch.setattr(m, "_RGB_MEAN", (0.0, 0.0, 0.0))
    _compare(model, 12, 12)


def test_hf_oracle_restoration_head():
    """'' head at 1 channel, where HF's raw-vs-normalized residual
    deviation vanishes (mean 0, img_range 1)."""
    _compare(_hf_model("", 1, channels=1), 12, 12, channels=1)


def test_hf_schema_loads_via_zoo(tmp_path):
    """An HF-format checkpoint file dispatches to Swin2SR in the zoo."""
    from hdrvae.models.zoo import load_upscale_model
    model = _hf_model("pixelshuffle", 2)
    path = tmp_path / "hf_swin2sr.pth"
    torch.save(model.state_dict(), path)
    sd = model.state_dict()
    assert is_swin2sr_state_dict(sd)
    params, cfg, arch = load_upscale_model(str(path))
    assert arch == "Swin2SR"
    # no geometry buffers in HF exports: documented default window 8
    assert cfg.window_size == 8


def test_hf_conversion_rejects_non_identity_projection():
    model = _hf_model("pixelshuffle", 2)
    sd = dict(model.state_dict())
    k = next(k for k in sd if k.endswith("patch_embeddings.projection"
                                         ".weight"))
    sd[k] = sd[k] + 0.5
    with pytest.raises(ValueError, match="projection"):
        hf_swin2sr_to_original(sd, window_size=4)


def test_hf_conversion_rejects_ape():
    model = _hf_model("pixelshuffle", 2)
    sd = dict(model.state_dict())
    sd["swin2sr.embeddings.position_embeddings"] = torch.zeros(1, 145, 16)
    with pytest.raises(ValueError, match="ape"):
        hf_swin2sr_to_original(sd, window_size=4)

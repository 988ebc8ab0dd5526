"""Swin2SR: torch-oracle parity, checkpoint-schema loading, zoo dispatch.

The reference runs any spandrel-supported upscaler
(`/root/reference/hdr_upscale_with_model.py:72-76`); Swin2SR is not in
its atanh list (`:266-279`) so it takes the default logit reversal.
hdrvae's JAX implementation must match the official network (transcribed
as TorchSwin2SR in tests/torch_oracle.py: SwinV2 cosine attention +
CPB-MLP bias + res-post-norm) and load the official key schema.
"""

import dataclasses

import jax
import numpy as np
import pytest
import torch

from hdrvae.core.config import Precision
from hdrvae.models.swin2sr import (Swin2SRConfig, init_swin2sr,
                                   is_swin2sr_state_dict, swin2sr_apply,
                                   swin2sr_from_state_dict)
from hdrvae.models.swinir import is_swinir_state_dict
from tests.torch_oracle import TorchSwin2SR

SMALL = Swin2SRConfig().with_small()


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _randomized_oracle(cfg, seed=5):
    oracle = TorchSwin2SR(cfg)
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in oracle.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    oracle.eval()
    return oracle


def _run_parity(cfg, h, w, tol=2e-4):
    oracle = _randomized_oracle(cfg)

    params, inferred = swin2sr_from_state_dict(oracle.state_dict(),
                                               img_range=cfg.img_range)
    if cfg.upsampler in ("pixelshuffledirect", ""):
        # no upsample-head feature width exists in these checkpoints
        cfg = dataclasses.replace(cfg, num_feat=inferred.num_feat)
    assert inferred == cfg, (inferred, cfg)

    rng = np.random.default_rng(3)
    x = rng.uniform(0.0, 1.0, (1, h, w, cfg.in_channels)).astype(
        np.float32)
    with torch.no_grad():
        ref = oracle(_nchw(x)).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))

    got = np.asarray(swin2sr_apply(params, x, cfg,
                                   precision=Precision.parity()))
    assert got.shape == ref.shape
    scale = max(1.0, float(np.abs(ref).max()))
    err = float(np.abs(got - ref).max())
    assert err <= tol * scale, f"{cfg.upsampler!r}: max-abs {err:.3e}"


@pytest.mark.parametrize("upsampler,scale", [
    ("pixelshuffle", 4),
    ("pixelshuffle", 2),
    ("pixelshuffle_aux", 4),
    ("pixelshuffledirect", 2),
    ("nearest+conv", 4),
    ("", 1),
])
def test_swin2sr_matches_torch_oracle(upsampler, scale):
    cfg = dataclasses.replace(SMALL, upsampler=upsampler, scale=scale)
    _run_parity(cfg, 12, 12)   # multiple of window 4: no pad; shift blocks


def test_swin2sr_padding_path():
    """Non-multiple-of-window sizes go through the reflect pad + crop
    (and, for the aux head, the bicubic skip resizes padded -> exact)."""
    cfg = dataclasses.replace(SMALL, upsampler="pixelshuffle", scale=2)
    _run_parity(cfg, 11, 13)


def test_swin2sr_aux_padding_path():
    cfg = dataclasses.replace(SMALL, upsampler="pixelshuffle_aux", scale=4)
    _run_parity(cfg, 10, 13)


def test_swin2sr_jpeg_car_window7_img_range255():
    """The JPEG-CAR family: window 7 (odd => shift 3), img_range 255,
    scale-1 '' head; the loader defaults img_range=255.0 for it."""
    cfg = dataclasses.replace(SMALL, upsampler="", scale=1,
                              window_size=7, img_range=255.0)
    oracle = _randomized_oracle(cfg)
    params, inferred = swin2sr_from_state_dict(oracle.state_dict())
    assert inferred.img_range == 255.0
    assert inferred.window_size == 7
    rng = np.random.default_rng(3)
    x = rng.uniform(0.0, 1.0, (1, 14, 14, 3)).astype(np.float32)
    with torch.no_grad():
        ref = np.transpose(oracle(_nchw(x)).numpy(), (0, 2, 3, 1))
    got = np.asarray(swin2sr_apply(params, x, inferred,
                                   precision=Precision.parity()))
    err = float(np.abs(got - ref).max())
    assert err <= 2e-4 * max(1.0, float(np.abs(ref).max())), err


def test_swin2sr_init_roundtrip():
    """init_swin2sr fixtures run through the forward at every upsampler."""
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 8, 9, 3)).astype(np.float32)
    for upsampler, scale in [("pixelshuffle", 2), ("pixelshuffle_aux", 2),
                             ("pixelshuffledirect", 2),
                             ("nearest+conv", 4), ("", 1)]:
        cfg = dataclasses.replace(SMALL, upsampler=upsampler, scale=scale)
        params = init_swin2sr(jax.random.PRNGKey(0), cfg)
        y = swin2sr_apply(params, x, cfg, precision=Precision.parity())
        assert y.shape == (2, 8 * scale, 9 * scale, 3)
        assert np.isfinite(np.asarray(y)).all()


def test_detect_swin2sr_schema():
    sd = _randomized_oracle(SMALL).state_dict()
    assert is_swin2sr_state_dict(sd)
    # v2 checkpoints must NOT dispatch to the v1 loader, and vice versa
    assert not is_swinir_state_dict(sd)
    assert not is_swin2sr_state_dict({"conv_first.weight": 0})


def test_zoo_dispatches_swin2sr(tmp_path):
    """load_upscale_model detects Swin2SR and names it for the (default
    logit) reversal choice."""
    from hdrvae.models.zoo import load_upscale_model
    from hdrvae.upscale.pipeline import get_reversal_fn

    oracle = _randomized_oracle(
        dataclasses.replace(SMALL, upsampler="pixelshuffle", scale=2))
    path = tmp_path / "swin2sr_small.pth"
    torch.save(oracle.state_dict(), path)
    params, cfg, arch = load_upscale_model(str(path))
    assert arch == "Swin2SR"
    assert isinstance(cfg, Swin2SRConfig)
    # not in the reference's atanh list -> logit
    fn = get_reversal_fn(arch)
    x = np.asarray(fn(np.float32(0.5)))
    assert abs(float(x)) < 1e-6   # logit(0.5) == 0


def test_swin2sr_rejects_hf_and_ape_checkpoints():
    """Unimplemented Swin2SR variants fail loudly, not with a key
    mismatch deep in the loader."""
    base = _randomized_oracle(SMALL).state_dict()
    hf = dict(base)
    hf["conv_first_hf.weight"] = torch.zeros(16, 3, 3, 3)
    with pytest.raises(ValueError, match="pixelshuffle_hf"):
        swin2sr_from_state_dict(hf)
    ape = dict(base)
    ape["absolute_pos_embed"] = torch.zeros(1, 4, 16)
    with pytest.raises(ValueError, match="ape"):
        swin2sr_from_state_dict(ape)

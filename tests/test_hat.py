"""HAT: torch-oracle parity, checkpoint-schema loading, zoo dispatch.

HAT is the last architecture the reference's reversal map names
(`/root/reference/hdr_upscale_with_model.py:266-279`, atanh) that hdrvae
did not run; the JAX implementation must match the official network
(transcribed as TorchHAT in tests/torch_oracle.py) and load the official
key schema.
"""

import dataclasses

import jax
import numpy as np
import pytest
import torch

from hdrvae.core.config import Precision
from hdrvae.models.hat import (HATConfig, hat_apply, hat_from_state_dict,
                               init_hat, is_hat_state_dict)
from tests.torch_oracle import TorchHAT

SMALL = HATConfig().with_small()


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _run_parity(cfg, h, w, tol=2e-4, seed=5):
    oracle = TorchHAT(cfg)
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in oracle.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    oracle.eval()

    params, inferred = hat_from_state_dict(oracle.state_dict())
    assert inferred == cfg, (inferred, cfg)

    rng = np.random.default_rng(3)
    x = rng.uniform(0.0, 1.0, (1, h, w, cfg.in_channels)).astype(
        np.float32)
    with torch.no_grad():
        ref = oracle(_nchw(x)).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))

    got = np.asarray(hat_apply(params, x, cfg,
                               precision=Precision.parity()))
    assert got.shape == ref.shape
    scale = max(1.0, float(np.abs(ref).max()))
    err = float(np.abs(got - ref).max())
    assert err <= tol * scale, f"max-abs {err:.3e}"


@pytest.mark.parametrize("scale", [4, 2])
def test_hat_matches_torch_oracle(scale):
    cfg = dataclasses.replace(SMALL, scale=scale)
    _run_parity(cfg, 12, 12)   # multiple of window 4: shift blocks active


def test_hat_padding_path():
    """Non-multiple-of-window sizes go through the reflect pad + crop."""
    _run_parity(dataclasses.replace(SMALL, scale=2), 11, 13)


def test_hat_x3_head_and_overlap_variants():
    """x3 pixelshuffle head; a different overlap_ratio changes the OCAB
    window and bias-table geometry end to end."""
    cfg = dataclasses.replace(SMALL, scale=3, overlap_ratio=0.5)
    _run_parity(cfg, 8, 8)
    cfg = dataclasses.replace(SMALL, scale=2, window_size=4,
                              overlap_ratio=1.0)
    _run_parity(cfg, 8, 8, seed=11)


def test_hat_init_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 8, 9, 3)).astype(np.float32)
    cfg = dataclasses.replace(SMALL, scale=2)
    params = init_hat(jax.random.PRNGKey(0), cfg)
    y = hat_apply(params, x, cfg, precision=Precision.parity())
    assert y.shape == (2, 16, 18, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_detect_hat_schema_and_zoo_precedence():
    """HAT shares SwinIR's block spine; the zoo must classify HAT first
    (its state dict also matches is_swinir_state_dict's regex)."""
    from hdrvae.models.swinir import is_swinir_state_dict
    sd = TorchHAT(SMALL).state_dict()
    assert is_hat_state_dict(sd)
    assert is_swinir_state_dict(sd)   # the spine overlap that forces order

    import io

    import torch as _torch

    from hdrvae.models.zoo import load_upscale_model
    buf = io.BytesIO()
    _torch.save(sd, buf)
    import os
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "hat_small.pth")
        with open(path, "wb") as f:
            f.write(buf.getvalue())
        params, cfg, arch = load_upscale_model(path)
    assert arch == "HAT"
    assert isinstance(cfg, HATConfig)


def test_hat_through_hdr_upscale_pipeline():
    """The two-pass HDR upscale pipeline runs a HAT model end to end
    (model-agnostic dispatch, tile planner included)."""
    from hdrvae.core.config import TilingConfig, UpscaleConfig
    from hdrvae.upscale.pipeline import hdr_upscale
    cfg = dataclasses.replace(SMALL, scale=2)
    params = init_hat(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    img = np.abs(rng.standard_normal((1, 12, 12, 3))).astype(np.float32)
    up_cfg = UpscaleConfig(tiling=TilingConfig(tile=8, overlap=2))
    res = hdr_upscale(params, img, cfg, up_cfg, architecture="HAT",
                      precision=Precision.parity())
    assert res.image.shape == (1, 24, 24, 3)
    assert np.isfinite(np.asarray(res.image)).all()


def test_buffers_in_state_dict_ignored():
    """Real HAT checkpoints may carry relative_position_index_SA/OCA and
    attn_mask buffers; the loader must ignore them."""
    sd = dict(TorchHAT(SMALL).state_dict())
    sd["relative_position_index_SA"] = torch.zeros(16, 16,
                                                   dtype=torch.long)
    sd["relative_position_index_OCA"] = torch.zeros(16, 36,
                                                    dtype=torch.long)
    params, cfg = hat_from_state_dict(sd)
    assert cfg.window_size == SMALL.window_size

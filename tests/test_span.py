"""SPAN: torch-oracle parity, Conv3XC fusion, schema loading, zoo dispatch.

The reference runs SPAN-family models through spandrel; the architecture
name "SPAN" is NOT in its atanh list
(`/root/reference/hdr_upscale_with_model.py:266-279`), so the HDR
reversal defaults to logit.  The torch oracle below uses the UNFUSED
Conv3XC form (1x1 -> 3x3 -> 1x1 chain + 1x1 skip, the official training
branch), so parity also validates hdrvae's load-time fusion algebra.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from hdrvae.core.config import Precision
from hdrvae.models.span import (SPANConfig, init_span, is_span_state_dict,
                                span_apply, span_from_state_dict)


class TorchConv3XC(nn.Module):
    """Official SPAN Conv3XC, training branch (unfused): zero-pad by 1,
    1x1 -> 3x3(valid) -> 1x1 chain, plus a parallel 1x1 skip."""

    def __init__(self, c_in, c_out, gain=2):
        super().__init__()
        self.sk = nn.Conv2d(c_in, c_out, 1, bias=True)
        self.conv = nn.Sequential(
            nn.Conv2d(c_in, c_in * gain, 1, bias=True),
            nn.Conv2d(c_in * gain, c_out * gain, 3, padding=0, bias=True),
            nn.Conv2d(c_out * gain, c_out, 1, bias=True),
        )

    def forward(self, x):
        x_pad = F.pad(x, (1, 1, 1, 1), "constant", 0)
        return self.conv(x_pad) + self.sk(x)


class TorchSPAB(nn.Module):
    def __init__(self, nf):
        super().__init__()
        self.c1_r = TorchConv3XC(nf, nf)
        self.c2_r = TorchConv3XC(nf, nf)
        self.c3_r = TorchConv3XC(nf, nf)

    def forward(self, x):
        out1 = self.c1_r(x)
        out2 = self.c2_r(F.silu(out1))
        out3 = self.c3_r(F.silu(out2))
        sim_att = torch.sigmoid(out3) - 0.5
        return (out3 + x) * sim_att, out1


class TorchSPAN(nn.Module):
    """Official SPAN forward, transcribed from its published definition
    (span_arch.py): conv_1 -> 6x SPAB -> conv_2 -> conv_cat over
    [feat, final, b1, last block's out1] -> PixelShuffle head.  Input
    normalization (x - rgb_mean) * img_range; no output un-norm."""

    def __init__(self, nf=48, n_blocks=6, scale=4, in_ch=3,
                 img_range=255.0):
        super().__init__()
        self.img_range = img_range
        self.register_buffer(
            "mean",
            torch.tensor([0.4488, 0.4371, 0.4040]).view(1, 3, 1, 1),
            persistent=False)
        self.conv_1 = TorchConv3XC(in_ch, nf)
        self.blocks = nn.ModuleList(TorchSPAB(nf) for _ in range(n_blocks))
        self.conv_2 = TorchConv3XC(nf, nf)
        self.conv_cat = nn.Conv2d(nf * 4, nf, 1, bias=True)
        self.up_conv = nn.Conv2d(nf, in_ch * scale * scale, 3, 1, 1)
        self.shuffle = nn.PixelShuffle(scale)

    def forward(self, x):
        x = (x - self.mean) * self.img_range
        feat = self.conv_1(x)
        h = feat
        b1 = None
        out1 = None
        for i, blk in enumerate(self.blocks):
            h, out1 = blk(h)
            if i == 0:
                b1 = h
        final = self.conv_2(h)
        out = self.conv_cat(torch.cat([feat, final, b1, out1], 1))
        return self.shuffle(self.up_conv(out))

    def state_dict_official(self):
        """Re-key to the official schema (block_N.*, upsampler.0.*)."""
        sd = {}
        for k, v in self.state_dict().items():
            k = k.replace("up_conv.", "upsampler.0.")
            for i in range(len(self.blocks)):
                k = k.replace(f"blocks.{i}.", f"block_{i + 1}.")
            sd[k] = v
        return sd


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


@pytest.mark.parametrize("scale,nf,n_blocks", [
    (4, 12, 6),
    (2, 8, 3),
])
def test_span_matches_torch_oracle(scale, nf, n_blocks):
    oracle = TorchSPAN(nf=nf, n_blocks=n_blocks, scale=scale)
    gen = torch.Generator().manual_seed(11)
    with torch.no_grad():
        for p in oracle.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.1)
    oracle.eval()

    sd = oracle.state_dict_official()
    assert is_span_state_dict(sd)
    params, cfg = span_from_state_dict(sd)
    assert cfg == SPANConfig(num_feat=nf, num_blocks=n_blocks, scale=scale)

    rng = np.random.default_rng(5)
    x = rng.uniform(0.0, 1.0, (1, 11, 9, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(_nchw(x)).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))

    got = np.asarray(span_apply(params, jnp.asarray(x), cfg,
                                precision=Precision.parity()))
    assert got.shape == ref.shape
    # img_range=255 amplifies activations ~100x; 1e-3 absolute here is
    # ~1e-5 relative to the feature scale, same band as the other zoos.
    err = float(np.abs(got - ref).max())
    assert err <= 2e-3, f"max-abs {err:.3e}"


def test_span_no_norm_flag():
    """Checkpoints carrying the no_norm buffer skip input normalization."""
    oracle = TorchSPAN(nf=8, n_blocks=2, scale=2)
    sd = oracle.state_dict_official()
    sd["no_norm"] = torch.zeros(1)
    _, cfg = span_from_state_dict(sd)
    assert not cfg.norm


def test_zoo_dispatch_and_reversal(tmp_path):
    """load_upscale_model -> ("SPAN", logit reversal)."""
    oracle = TorchSPAN(nf=8, n_blocks=2, scale=2)
    path = tmp_path / "span_x2.pth"
    torch.save(oracle.state_dict_official(), str(path))

    from hdrvae.models.zoo import load_upscale_model, upscaler_apply
    params, cfg, arch = load_upscale_model(str(path))
    assert arch == "SPAN"
    assert isinstance(cfg, SPANConfig) and cfg.scale == 2

    from hdrvae.upscale.pipeline import get_reversal_fn
    rev = get_reversal_fn(arch)
    probe = jnp.asarray([0.25], jnp.float32)
    np.testing.assert_allclose(np.asarray(rev(probe)),
                               np.log(np.asarray([1.0 / 3.0])), atol=1e-5)

    x = np.full((1, 8, 8, 3), 0.3, np.float32)
    y = np.asarray(upscaler_apply(params, jnp.asarray(x), cfg))
    assert y.shape == (1, 16, 16, 3)


def test_init_roundtrip():
    cfg = SPANConfig(num_feat=8, num_blocks=2, scale=2)
    params = init_span(jax.random.PRNGKey(0), cfg)
    y = span_apply(params, jnp.zeros((1, 8, 8, 3)), cfg)
    assert y.shape == (1, 16, 16, 3)


def test_hdr_upscale_two_pass_with_span():
    """The full two-pass HDR upscale pipeline runs a SPAN model."""
    from hdrvae.core.config import UpscaleConfig
    from hdrvae.upscale.pipeline import hdr_upscale
    cfg = SPANConfig(num_feat=8, num_blocks=2, scale=2)
    params = init_span(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(-0.2, 2.0, (1, 16, 16, 3)), jnp.float32)
    res = hdr_upscale(params, img, model_cfg=cfg,
                      cfg=UpscaleConfig(), architecture="SPAN",
                      precision=Precision.parity())
    assert res.image.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(res.image)).all()

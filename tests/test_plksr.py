"""RealPLKSR: torch-oracle parity, checkpoint-schema loading, zoo dispatch.

The reference runs any spandrel-supported upscaler
(`/root/reference/hdr_upscale_with_model.py:72-76`); RealPLKSR is the
modern community conv architecture (4xNomosWebPhoto etc.).  The oracle
below transcribes the published neosr/spandrel `realplksr` definition
(DCCM -> partial large-kernel conv -> EA -> refine -> GroupNorm residual
blocks; PixelShuffle or DySample-lp head).  "RealPLKSR" is not in the
reference's atanh list (`:266-279`) so it takes the default logit
reversal.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from hdrvae.core.config import Precision
from hdrvae.models.plksr import (RealPLKSRConfig, init_realplksr,
                                 is_realplksr_state_dict, realplksr_apply,
                                 realplksr_from_state_dict)


class _DCCM(nn.Sequential):
    def __init__(self, dim):
        super().__init__(nn.Conv2d(dim, dim * 2, 3, 1, 1), nn.Mish(),
                         nn.Conv2d(dim * 2, dim, 3, 1, 1))


class _PLKConv2d(nn.Module):
    def __init__(self, pdim, kernel_size):
        super().__init__()
        self.conv = nn.Conv2d(pdim, pdim, kernel_size, 1,
                              kernel_size // 2)
        self.idx = pdim

    def forward(self, x):
        x1, x2 = torch.split(x, [self.idx, x.size(1) - self.idx], dim=1)
        return torch.cat([self.conv(x1), x2], dim=1)


class _EA(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.f = nn.Sequential(nn.Conv2d(dim, dim, 3, 1, 1), nn.Sigmoid())

    def forward(self, x):
        return x * self.f(x)


class _PLKBlock(nn.Module):
    def __init__(self, dim, kernel_size, split_ratio, norm_groups,
                 use_ea=True):
        super().__init__()
        self.channel_mixer = _DCCM(dim)
        self.lk = _PLKConv2d(int(dim * split_ratio), kernel_size)
        self.attn = _EA(dim) if use_ea else nn.Identity()
        self.refine = nn.Conv2d(dim, dim, 1, 1, 0)
        self.norm = nn.GroupNorm(norm_groups, dim)

    def forward(self, x):
        x_skip = x
        x = self.channel_mixer(x)
        x = self.lk(x)
        x = self.attn(x)
        x = self.refine(x)
        x = self.norm(x)
        return x + x_skip


class _DySample(nn.Module):
    """DySample 'lp' with dynamic scope (the published buffer/reshape
    order, as embedded in the realplksr release)."""

    def __init__(self, in_channels, out_ch, scale, groups=4):
        super().__init__()
        out_channels = 2 * groups * scale ** 2
        self.scale, self.groups = scale, groups
        self.offset = nn.Conv2d(in_channels, out_channels, 1)
        self.scope = nn.Conv2d(in_channels, out_channels, 1, bias=False)
        self.end_conv = nn.Conv2d(in_channels, out_ch, 1)
        self.register_buffer("init_pos", self._init_pos())

    def _init_pos(self):
        h = torch.arange((-self.scale + 1) / 2,
                         (self.scale - 1) / 2 + 1) / self.scale
        return (torch.stack(torch.meshgrid([h, h], indexing="ij"))
                .transpose(1, 2).repeat(1, self.groups, 1)
                .reshape(1, -1, 1, 1))

    def forward(self, x):
        offset = self.offset(x) * self.scope(x).sigmoid() * 0.5 \
            + self.init_pos
        b, _, h, w = offset.shape
        offset = offset.view(b, 2, -1, h, w)
        coords_h = torch.arange(h) + 0.5
        coords_w = torch.arange(w) + 0.5
        coords = (torch.stack(torch.meshgrid([coords_w, coords_h],
                                             indexing="ij"))
                  .transpose(1, 2).unsqueeze(1).unsqueeze(0)
                  .type(x.dtype))
        normalizer = torch.tensor([w, h], dtype=x.dtype).view(1, 2, 1, 1, 1)
        coords = 2 * (coords + offset) / normalizer - 1
        coords = (F.pixel_shuffle(coords.reshape(b, -1, h, w), self.scale)
                  .view(b, 2, -1, self.scale * h, self.scale * w)
                  .permute(0, 2, 3, 4, 1).contiguous().flatten(0, 1))
        out = F.grid_sample(x.reshape(b * self.groups, -1, h, w), coords,
                            mode="bilinear", align_corners=False,
                            padding_mode="border")
        out = out.view(b, -1, self.scale * h, self.scale * w)
        return self.end_conv(out)


class TorchRealPLKSR(nn.Module):
    """Official realplksr forward: feats (conv / blocks / Dropout2d /
    conv) + repeat_interleave skip, PixelShuffle or DySample head."""

    def __init__(self, in_ch=3, out_ch=3, dim=64, n_blocks=28, scale=4,
                 kernel_size=17, split_ratio=0.25, use_ea=True,
                 norm_groups=4, dysample=False):
        super().__init__()
        self.scale = scale
        self.feats = nn.Sequential(
            *[nn.Conv2d(in_ch, dim, 3, 1, 1)]
            + [_PLKBlock(dim, kernel_size, split_ratio, norm_groups,
                         use_ea) for _ in range(n_blocks)]
            + [nn.Dropout2d(0)]
            + [nn.Conv2d(dim, out_ch * scale ** 2, 3, 1, 1)])
        if dysample and scale != 1:
            self.to_img = _DySample(in_ch * scale ** 2, out_ch, scale)
        else:
            self.to_img = nn.PixelShuffle(scale)

    def forward(self, x):
        x = self.feats(x) + torch.repeat_interleave(
            x, self.scale ** 2, dim=1)
        return self.to_img(x)


SMALL = dict(dim=16, n_blocks=3, kernel_size=7, split_ratio=0.25,
             norm_groups=4)


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _randomize(oracle, seed=7):
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in oracle.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.1)
    oracle.eval()
    return oracle


def _parity(oracle, expect_cfg, h=13, w=11, tol=2e-4):
    sd = oracle.state_dict()
    assert is_realplksr_state_dict(sd)
    params, cfg = realplksr_from_state_dict(sd)
    assert cfg == expect_cfg, (cfg, expect_cfg)

    rng = np.random.default_rng(3)
    x = rng.uniform(0.0, 1.0, (2, h, w, cfg.in_channels)).astype(
        np.float32)
    with torch.no_grad():
        ref = oracle(_nchw(x)).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))
    got = np.asarray(realplksr_apply(params, jnp.asarray(x), cfg,
                                     precision=Precision.parity()))
    assert got.shape == ref.shape
    scale = max(1.0, float(np.abs(ref).max()))
    err = float(np.abs(got - ref).max())
    assert err <= tol * scale, f"max-abs {err:.3e}"


@pytest.mark.parametrize("scale", [4, 2, 1])
def test_realplksr_matches_torch_oracle(scale):
    oracle = _randomize(TorchRealPLKSR(scale=scale, **SMALL))
    _parity(oracle, RealPLKSRConfig(scale=scale, **SMALL))


def test_realplksr_no_ea():
    oracle = _randomize(TorchRealPLKSR(scale=2, use_ea=False, **SMALL))
    _parity(oracle, RealPLKSRConfig(scale=2, use_ea=False, **SMALL))


def test_realplksr_dysample_matches_torch_oracle():
    oracle = _randomize(TorchRealPLKSR(scale=4, dysample=True, **SMALL))
    # offsets up to ~0.5 px after sigmoid gating; keep them in a real
    # checkpoint's regime rather than randn*0.1's
    _parity(oracle,
            RealPLKSRConfig(scale=4, upsampler="dysample", **SMALL),
            tol=5e-4)


def test_realplksr_rejects_original_plksr_schema():
    """Original PLKSR (no per-block norm) must fail loudly, not load
    wrong."""
    oracle = _randomize(TorchRealPLKSR(scale=2, **SMALL))
    sd = {k: v for k, v in oracle.state_dict().items()
          if ".norm." not in k}
    assert not is_realplksr_state_dict(sd)
    with pytest.raises(ValueError, match="RealPLKSR"):
        realplksr_from_state_dict(sd)


def test_realplksr_init_roundtrip():
    """init_realplksr's pytree matches the loader's layout (apply works
    on both) including the dysample head."""
    import jax
    cfg = dataclasses.replace(RealPLKSRConfig(scale=2, **SMALL),
                              upsampler="dysample")
    params = init_realplksr(jax.random.PRNGKey(0), cfg)
    y = realplksr_apply(params, jnp.zeros((1, 8, 8, 3)), cfg)
    assert y.shape == (1, 16, 16, 3)


def test_realplksr_zoo_dispatch(tmp_path):
    from hdrvae.models.zoo import load_upscale_model, upscaler_apply
    oracle = _randomize(TorchRealPLKSR(scale=2, **SMALL))
    path = tmp_path / "realplksr_x2.pth"
    torch.save(oracle.state_dict(), path)
    params, cfg, arch = load_upscale_model(str(path))
    assert arch == "RealPLKSR"
    assert isinstance(cfg, RealPLKSRConfig)
    y = upscaler_apply(params, jnp.zeros((1, 8, 8, 3)), cfg)
    assert y.shape == (1, 16, 16, 3)


def test_realplksr_hdr_reversal_is_logit():
    """Not in the reference's atanh list -> default logit
    (`hdr_upscale_with_model.py:266-279`)."""
    from hdrvae.decode.modes import inverse_sigmoid
    from hdrvae.upscale.pipeline import get_reversal_fn
    assert get_reversal_fn("RealPLKSR") is inverse_sigmoid


def test_zoo_rejects_foreign_schema_with_named_guess(tmp_path):
    """An unsupported spandrel-family checkpoint (e.g. DAT) must be
    rejected with the supported-architecture list and a best-effort
    name, not a key-mapping crash."""
    from hdrvae.models.zoo import load_upscale_model
    sd = {"conv_first.weight": torch.zeros(8, 3, 3, 3),
          "conv_first.bias": torch.zeros(8),
          "before_RG.1.weight": torch.zeros(8)}
    path = tmp_path / "dat.pth"
    torch.save(sd, path)
    with pytest.raises(ValueError, match="looks like DAT"):
        load_upscale_model(str(path))


def test_swin2sr_never_hits_the_v1_loader():
    """Swin2SR shares SwinIR's residual_group spine but uses
    logit_scale/cpb_mlp attention; it must route to the Swin2SR loader,
    never to the v1 SwinIR one (whose key mapping would KeyError)."""
    from hdrvae.models.swin2sr import is_swin2sr_state_dict
    from hdrvae.models.swinir import is_swinir_state_dict
    sd = {"conv_first.weight": torch.zeros(8, 3, 3, 3),
          "conv_first.bias": torch.zeros(8),
          "layers.0.residual_group.blocks.0.attn.logit_scale":
              torch.zeros(2, 1, 1),
          "layers.0.residual_group.blocks.0.attn.cpb_mlp.0.weight":
              torch.zeros(16, 2)}
    assert not is_swinir_state_dict(sd)
    assert is_swin2sr_state_dict(sd)

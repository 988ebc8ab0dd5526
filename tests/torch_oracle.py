"""Independent PyTorch implementation of the standard AutoencoderKL decoder,
used ONLY as a numerical test oracle for the JAX decoder.

This is the well-known ldm/Flux VAE decoder topology (SURVEY.md section 2.6),
written from the published architecture — not taken from the reference repo
(which contains no decoder implementation at all).
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

from hdrvae.core.config import DecoderConfig


class ResnetBlock(nn.Module):
    def __init__(self, cin: int, cout: int, num_groups: int):
        super().__init__()
        self.norm1 = nn.GroupNorm(num_groups, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(num_groups, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.nin_shortcut = (nn.Conv2d(cin, cout, 1)
                             if cin != cout else None)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.nin_shortcut is not None:
            x = self.nin_shortcut(x)
        return x + h


class AttnBlock(nn.Module):
    def __init__(self, c: int, num_groups: int):
        super().__init__()
        self.norm = nn.GroupNorm(num_groups, c, eps=1e-6)
        self.q = nn.Conv2d(c, c, 1)
        self.k = nn.Conv2d(c, c, 1)
        self.v = nn.Conv2d(c, c, 1)
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x):
        h = self.norm(x)
        q, k, v = self.q(h), self.k(h), self.v(h)
        b, c, hh, ww = q.shape
        q = q.reshape(b, c, hh * ww).permute(0, 2, 1)  # b n c
        k = k.reshape(b, c, hh * ww)                    # b c n
        w = torch.bmm(q, k) * (c ** -0.5)
        w = torch.softmax(w, dim=2)
        v = v.reshape(b, c, hh * ww)
        h = torch.bmm(v, w.permute(0, 2, 1))            # b c n
        h = h.reshape(b, c, hh, ww)
        return x + self.proj_out(h)


class Upsample(nn.Module):
    def __init__(self, c: int):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class UpLevel(nn.Module):
    def __init__(self, cin: int, cout: int, num_blocks: int, num_groups: int,
                 has_upsample: bool):
        super().__init__()
        blocks = []
        for _ in range(num_blocks):
            blocks.append(ResnetBlock(cin, cout, num_groups))
            cin = cout
        self.block = nn.ModuleList(blocks)
        self.upsample = Upsample(cout) if has_upsample else None


class Mid(nn.Module):
    def __init__(self, c: int, num_groups: int, attn: bool):
        super().__init__()
        self.block_1 = ResnetBlock(c, c, num_groups)
        self.attn_1 = AttnBlock(c, num_groups) if attn else None
        self.block_2 = ResnetBlock(c, c, num_groups)


class TorchDecoder(nn.Module):
    """Standard AutoencoderKL decoder; forward returns (rgb, pre_conv_out)."""

    def __init__(self, cfg: DecoderConfig):
        super().__init__()
        self.cfg = cfg
        block_in = cfg.block_in
        self.conv_in = nn.Conv2d(cfg.z_channels, block_in, 3, padding=1)
        self.mid = Mid(block_in, cfg.num_groups, cfg.attn_mid)
        ups = []
        cin = block_in
        for level in reversed(range(cfg.num_levels)):
            cout = cfg.ch * cfg.ch_mult[level]
            ups.insert(0, UpLevel(cin, cout, cfg.num_res_blocks + 1,
                                  cfg.num_groups, level != 0))
            cin = cout
        self.up = nn.ModuleList(ups)
        c_final = cfg.pre_conv_out_channels
        self.norm_out = nn.GroupNorm(cfg.num_groups, c_final, eps=1e-6)
        self.conv_out = nn.Conv2d(c_final, cfg.out_channels, 3, padding=1)

    @torch.no_grad()
    def forward(self, z, *, preprocess_latent=True, postprocess_output=True):
        cfg = self.cfg
        if preprocess_latent:
            z = z / cfg.scale_factor + cfg.shift_factor
        h = self.conv_in(z)
        h = self.mid.block_1(h)
        if self.mid.attn_1 is not None:
            h = self.mid.attn_1(h)
        h = self.mid.block_2(h)
        for level in reversed(range(cfg.num_levels)):
            lvl = self.up[level]
            for blk in lvl.block:
                h = blk(h)
            if lvl.upsample is not None:
                h = lvl.upsample(h)
        h = F.silu(self.norm_out(h))
        pre = h
        rgb = self.conv_out(pre)
        if postprocess_output:
            rgb = rgb * cfg.output_scale + cfg.output_shift
            if cfg.output_clamp:
                rgb = torch.clamp(rgb, 0.0, 1.0)
        return rgb, pre


def torch_decoder_from_jax(params, cfg: DecoderConfig) -> TorchDecoder:
    """Load our JAX pytree into the torch oracle via the ldm state dict."""
    from hdrvae.models.params import decoder_params_to_state_dict
    sd = decoder_params_to_state_dict(params, cfg)
    model = TorchDecoder(cfg)
    model.load_state_dict({k: torch.from_numpy(v.copy())
                           for k, v in sd.items()})
    model.eval()
    # Frozen like a deployed ComfyUI VAE.  The reference's simple_bypass
    # clones tensors under torch.inference_mode() and runs blocks in worker
    # THREADS (inference mode is thread-local, `hdr_vae_decode.py:1258-1294`);
    # with grad-requiring weights autograd would try to save those inference
    # tensors and error out.
    model.requires_grad_(False)
    return model


# ---------------------------------------------------------------------------
# RRDBNet oracle (standard ESRGAN topology, test-only)
# ---------------------------------------------------------------------------


class _RDB(nn.Module):
    def __init__(self, nf: int, gc: int):
        super().__init__()
        self.conv1 = nn.Conv2d(nf, gc, 3, padding=1)
        self.conv2 = nn.Conv2d(nf + gc, gc, 3, padding=1)
        self.conv3 = nn.Conv2d(nf + 2 * gc, gc, 3, padding=1)
        self.conv4 = nn.Conv2d(nf + 3 * gc, gc, 3, padding=1)
        self.conv5 = nn.Conv2d(nf + 4 * gc, nf, 3, padding=1)
        self.act = nn.LeakyReLU(0.2)

    def forward(self, x):
        x1 = self.act(self.conv1(x))
        x2 = self.act(self.conv2(torch.cat([x, x1], 1)))
        x3 = self.act(self.conv3(torch.cat([x, x1, x2], 1)))
        x4 = self.act(self.conv4(torch.cat([x, x1, x2, x3], 1)))
        x5 = self.conv5(torch.cat([x, x1, x2, x3, x4], 1))
        return x + 0.2 * x5


class _RRDB(nn.Module):
    def __init__(self, nf: int, gc: int):
        super().__init__()
        self.rdb1 = _RDB(nf, gc)
        self.rdb2 = _RDB(nf, gc)
        self.rdb3 = _RDB(nf, gc)

    def forward(self, x):
        return x + 0.2 * self.rdb3(self.rdb2(self.rdb1(x)))


class TorchRRDBNet(nn.Module):
    """New-arch RRDBNet with BasicSR-style key names."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.conv_first = nn.Conv2d(cfg.in_channels, cfg.nf, 3, padding=1)
        self.body = nn.ModuleList([_RRDB(cfg.nf, cfg.gc)
                                   for _ in range(cfg.nb)])
        self.conv_body = nn.Conv2d(cfg.nf, cfg.nf, 3, padding=1)
        for i in range(cfg.num_upsamples):
            setattr(self, f"conv_up{i + 1}",
                    nn.Conv2d(cfg.nf, cfg.nf, 3, padding=1))
        self.conv_hr = nn.Conv2d(cfg.nf, cfg.nf, 3, padding=1)
        self.conv_last = nn.Conv2d(cfg.nf, cfg.out_channels, 3, padding=1)
        self.act = nn.LeakyReLU(0.2)

    @torch.no_grad()
    def forward(self, x):
        fea = self.conv_first(x)
        trunk = fea
        for block in self.body:
            trunk = block(trunk)
        fea = fea + self.conv_body(trunk)
        for i in range(self.cfg.num_upsamples):
            fea = F.interpolate(fea, scale_factor=2.0, mode="nearest")
            fea = self.act(getattr(self, f"conv_up{i + 1}")(fea))
        fea = self.act(self.conv_hr(fea))
        return self.conv_last(fea)

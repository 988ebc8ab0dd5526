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
        self.conv_first = nn.Conv2d(
            cfg.in_channels * cfg.unshuffle ** 2, cfg.nf, 3, padding=1)
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
        if self.cfg.unshuffle > 1:
            # BasicSR RRDBNet's scale=2/1 branches (RealESRGAN x2/x1)
            x = F.pixel_unshuffle(x, self.cfg.unshuffle)
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


# ---------------------------------------------------------------------------
# SwinIR oracle (official module structure + key names, so real checkpoints
# load into it and state_dicts round-trip through hdrvae's loader)
# ---------------------------------------------------------------------------


class _SwinWindowAttention(nn.Module):
    def __init__(self, dim, window_size, num_heads):
        super().__init__()
        self.dim = dim
        self.window_size = window_size
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * window_size - 1) ** 2, num_heads))
        coords = torch.stack(torch.meshgrid(
            torch.arange(window_size), torch.arange(window_size),
            indexing="ij"))
        flat = torch.flatten(coords, 1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += window_size - 1
        rel[:, :, 1] += window_size - 1
        rel[:, :, 0] *= 2 * window_size - 1
        self.register_buffer("relative_position_index", rel.sum(-1))
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.softmax = nn.Softmax(dim=-1)

    def forward(self, x, mask=None):
        b_, n, c = x.shape
        qkv = self.qkv(x).reshape(b_, n, 3, self.num_heads,
                                  c // self.num_heads).permute(
                                      2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q * self.scale
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(n, n, -1)
        attn = attn + bias.permute(2, 0, 1).contiguous().unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, self.num_heads, n, n) + \
                mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.num_heads, n, n)
        attn = self.softmax(attn)
        x = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.proj(x)


class _SwinMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


def _win_part(x, ws):
    b, h, w, c = x.shape
    x = x.view(b, h // ws, ws, w // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, ws * ws, c)


def _win_rev(wins, ws, h, w):
    b = wins.shape[0] // (h * w // ws // ws)
    x = wins.view(b, h // ws, w // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(b, h, w, -1)


class _SwinBlock(nn.Module):
    def __init__(self, dim, num_heads, window_size, shift_size, mlp_ratio):
        super().__init__()
        self.window_size = window_size
        self.shift_size = shift_size
        self.norm1 = nn.LayerNorm(dim)
        self.attn = _SwinWindowAttention(dim, window_size, num_heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = _SwinMlp(dim, int(dim * mlp_ratio))

    def _mask(self, h, w, device):
        ws, ss = self.window_size, self.shift_size
        img = torch.zeros((1, h, w, 1), device=device)
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
            for vs in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
                img[:, hs, vs, :] = cnt
                cnt += 1
        mw = _win_part(img, ws).view(-1, ws * ws)
        am = mw.unsqueeze(1) - mw.unsqueeze(2)
        return am.masked_fill(am != 0, -100.0).masked_fill(am == 0, 0.0)

    def forward(self, x, x_size):
        h, w = x_size
        b, L, c = x.shape
        shortcut = x
        x = self.norm1(x).view(b, h, w, c)
        if self.shift_size > 0:
            x = torch.roll(x, (-self.shift_size, -self.shift_size), (1, 2))
            mask = self._mask(h, w, x.device)
        else:
            mask = None
        wins = _win_part(x, self.window_size)
        wins = self.attn(wins, mask)
        x = _win_rev(wins, self.window_size, h, w)
        if self.shift_size > 0:
            x = torch.roll(x, (self.shift_size, self.shift_size), (1, 2))
        x = shortcut + x.view(b, L, c)
        return x + self.mlp(self.norm2(x))


class _SwinGroup(nn.Module):
    def __init__(self, dim, depth, num_heads, window_size, mlp_ratio):
        super().__init__()
        self.blocks = nn.ModuleList([
            _SwinBlock(dim, num_heads, window_size,
                       0 if i % 2 == 0 else window_size // 2, mlp_ratio)
            for i in range(depth)])

    def forward(self, x, x_size):
        for blk in self.blocks:
            x = blk(x, x_size)
        return x


class _RSTB(nn.Module):
    def __init__(self, dim, depth, num_heads, window_size, mlp_ratio):
        super().__init__()
        self.residual_group = _SwinGroup(dim, depth, num_heads,
                                         window_size, mlp_ratio)
        self.conv = nn.Conv2d(dim, dim, 3, 1, 1)

    def forward(self, x, x_size):
        h, w = x_size
        b, L, c = x.shape
        y = self.residual_group(x, x_size)
        y = y.transpose(1, 2).view(b, c, h, w)
        y = self.conv(y)
        return y.flatten(2).transpose(1, 2) + x


class _PatchEmbed(nn.Module):
    def __init__(self, dim, patch_norm):
        super().__init__()
        self.norm = nn.LayerNorm(dim) if patch_norm else None

    def forward(self, x):
        x = x.flatten(2).transpose(1, 2)
        if self.norm is not None:
            x = self.norm(x)
        return x


class TorchSwinIR(nn.Module):
    """Official-schema SwinIR (upsampler 'nearest+conv' | 'pixelshuffle' |
    'pixelshuffledirect' | ''); NCHW in [0, 1], same mean/img_range
    handling as the published network."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        dim = cfg.embed_dim
        self.mean = torch.tensor([0.4488, 0.4371, 0.4040]).view(1, 3, 1, 1) \
            if cfg.in_channels == 3 else torch.zeros(1, 1, 1, 1)
        self.conv_first = nn.Conv2d(cfg.in_channels, dim, 3, 1, 1)
        self.patch_embed = _PatchEmbed(dim, cfg.patch_norm)
        self.layers = nn.ModuleList([
            _RSTB(dim, cfg.depths[i], cfg.num_heads[i], cfg.window_size,
                  cfg.mlp_ratio) for i in range(len(cfg.depths))])
        self.norm = nn.LayerNorm(dim)
        self.conv_after_body = nn.Conv2d(dim, dim, 3, 1, 1)
        nf = cfg.num_feat
        if cfg.upsampler == "nearest+conv":
            self.conv_before_upsample = nn.Sequential(
                nn.Conv2d(dim, nf, 3, 1, 1), nn.LeakyReLU(inplace=True))
            self.conv_up1 = nn.Conv2d(nf, nf, 3, 1, 1)
            if cfg.scale == 4:
                self.conv_up2 = nn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_hr = nn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_last = nn.Conv2d(nf, cfg.out_channels, 3, 1, 1)
            self.lrelu = nn.LeakyReLU(0.2, inplace=True)
        elif cfg.upsampler == "pixelshuffle":
            self.conv_before_upsample = nn.Sequential(
                nn.Conv2d(dim, nf, 3, 1, 1), nn.ReLU(inplace=True))
            ups, s = [], cfg.scale
            while s > 1:
                r = 3 if s % 2 else 2
                ups += [nn.Conv2d(nf, nf * r * r, 3, 1, 1),
                        nn.PixelShuffle(r)]
                s //= r
            self.upsample = nn.Sequential(*ups)
            self.conv_last = nn.Conv2d(nf, cfg.out_channels, 3, 1, 1)
        elif cfg.upsampler == "pixelshuffledirect":
            self.upsample = nn.Sequential(
                nn.Conv2d(dim, cfg.out_channels * cfg.scale ** 2, 3, 1, 1),
                nn.PixelShuffle(cfg.scale))
        else:
            self.conv_last = nn.Conv2d(dim, cfg.out_channels, 3, 1, 1)

    def forward_features(self, x):
        x_size = (x.shape[2], x.shape[3])
        t = self.patch_embed(x)
        for layer in self.layers:
            t = layer(t, x_size)
        t = self.norm(t)
        return t.transpose(1, 2).view(x.shape[0], -1, *x_size)

    @torch.no_grad()
    def forward(self, x):
        h0, w0 = x.shape[2], x.shape[3]
        ws = self.cfg.window_size
        mod_h, mod_w = (-h0) % ws, (-w0) % ws
        if mod_h or mod_w:
            x = F.pad(x, (0, mod_w, 0, mod_h), "reflect")
        x = (x - self.mean) * self.cfg.img_range
        if self.cfg.upsampler in ("nearest+conv",):
            x = self.conv_first(x)
            x = self.conv_after_body(self.forward_features(x)) + x
            x = self.conv_before_upsample(x)
            x = self.lrelu(self.conv_up1(
                F.interpolate(x, scale_factor=2, mode="nearest")))
            if self.cfg.scale == 4:
                x = self.lrelu(self.conv_up2(
                    F.interpolate(x, scale_factor=2, mode="nearest")))
            x = self.conv_last(self.lrelu(self.conv_hr(x)))
        elif self.cfg.upsampler == "pixelshuffle":
            x = self.conv_first(x)
            x = self.conv_after_body(self.forward_features(x)) + x
            x = self.conv_before_upsample(x)
            x = self.conv_last(self.upsample(x))
        elif self.cfg.upsampler == "pixelshuffledirect":
            x = self.conv_first(x)
            x = self.conv_after_body(self.forward_features(x)) + x
            x = self.upsample(x)
        else:
            xf = self.conv_first(x)
            res = self.conv_after_body(self.forward_features(xf)) + xf
            x = x + self.conv_last(res)
        x = x / self.cfg.img_range + self.mean
        return x[:, :, :h0 * self.cfg.scale, :w0 * self.cfg.scale]


# ---------------------------------------------------------------------------
# HAT oracle (official XPixelGroup/HAT hat_arch.py structure + key schema)
# ---------------------------------------------------------------------------


class _ChannelAttention(nn.Module):
    def __init__(self, num_feat, squeeze_factor):
        super().__init__()
        self.attention = nn.Sequential(
            nn.AdaptiveAvgPool2d(1),
            nn.Conv2d(num_feat, num_feat // squeeze_factor, 1, padding=0),
            nn.ReLU(inplace=True),
            nn.Conv2d(num_feat // squeeze_factor, num_feat, 1, padding=0),
            nn.Sigmoid())

    def forward(self, x):
        return x * self.attention(x)


class _CAB(nn.Module):
    def __init__(self, num_feat, compress_ratio, squeeze_factor):
        super().__init__()
        self.cab = nn.Sequential(
            nn.Conv2d(num_feat, num_feat // compress_ratio, 3, 1, 1),
            nn.GELU(),
            nn.Conv2d(num_feat // compress_ratio, num_feat, 3, 1, 1),
            _ChannelAttention(num_feat, squeeze_factor))

    def forward(self, x):
        return self.cab(x)


class _HATWindowAttention(nn.Module):
    """HAB attention: same math as Swin's but the relative-position index
    lives at the HAT top level (no per-module buffer in checkpoints)."""

    def __init__(self, dim, window_size, num_heads):
        super().__init__()
        self.window_size = window_size
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * window_size - 1) ** 2, num_heads))
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, rpi, mask=None):
        b_, n, c = x.shape
        qkv = self.qkv(x).reshape(b_, n, 3, self.num_heads,
                                  c // self.num_heads).permute(
                                      2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q * self.scale
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            rpi.view(-1)].view(n, n, -1)
        attn = attn + bias.permute(2, 0, 1).contiguous().unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, self.num_heads, n, n) + \
                mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.num_heads, n, n)
        attn = torch.softmax(attn, dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.proj(x)


class _HAB(nn.Module):
    def __init__(self, dim, num_heads, window_size, shift_size,
                 compress_ratio, squeeze_factor, conv_scale, mlp_ratio):
        super().__init__()
        self.window_size = window_size
        self.shift_size = shift_size
        self.conv_scale = conv_scale
        self.norm1 = nn.LayerNorm(dim)
        self.attn = _HATWindowAttention(dim, window_size, num_heads)
        self.conv_block = _CAB(dim, compress_ratio, squeeze_factor)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = _SwinMlp(dim, int(dim * mlp_ratio))

    def forward(self, x, x_size, rpi_sa, attn_mask):
        h, w = x_size
        b, L, c = x.shape
        shortcut = x
        x = self.norm1(x).view(b, h, w, c)
        conv_x = self.conv_block(x.permute(0, 3, 1, 2))
        conv_x = conv_x.permute(0, 2, 3, 1).contiguous().view(b, L, c)
        if self.shift_size > 0:
            shifted = torch.roll(x, (-self.shift_size, -self.shift_size),
                                 (1, 2))
            mask = attn_mask
        else:
            shifted = x
            mask = None
        wins = _win_part(shifted, self.window_size)
        wins = self.attn(wins, rpi_sa, mask)
        x = _win_rev(wins, self.window_size, h, w)
        if self.shift_size > 0:
            x = torch.roll(x, (self.shift_size, self.shift_size), (1, 2))
        attn_x = x.view(b, L, c)
        x = shortcut + attn_x + conv_x * self.conv_scale
        return x + self.mlp(self.norm2(x))


class _OCAB(nn.Module):
    def __init__(self, dim, window_size, overlap_ratio, num_heads,
                 mlp_ratio):
        super().__init__()
        self.dim = dim
        self.window_size = window_size
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.overlap_win_size = int(window_size * overlap_ratio) + \
            window_size
        self.norm1 = nn.LayerNorm(dim)
        self.qkv = nn.Linear(dim, dim * 3)
        self.unfold = nn.Unfold(
            kernel_size=(self.overlap_win_size, self.overlap_win_size),
            stride=window_size,
            padding=(self.overlap_win_size - window_size) // 2)
        self.relative_position_bias_table = nn.Parameter(torch.zeros(
            (window_size + self.overlap_win_size - 1) ** 2, num_heads))
        self.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = _SwinMlp(dim, int(dim * mlp_ratio))

    def forward(self, x, x_size, rpi):
        h, w = x_size
        b, L, c = x.shape
        ws, wse = self.window_size, self.overlap_win_size
        shortcut = x
        x = self.norm1(x).view(b, h, w, c)
        qkv = self.qkv(x).reshape(b, h, w, 3, c).permute(3, 0, 4, 1, 2)
        q = qkv[0].permute(0, 2, 3, 1)                     # b, h, w, c
        kv = torch.cat((qkv[1], qkv[2]), dim=1)            # b, 2c, h, w
        q_windows = _win_part(q, ws).view(-1, ws * ws, c)
        kv_windows = self.unfold(kv)                       # b, 2c*wse2, nw
        nw = kv_windows.shape[-1]
        kv_windows = kv_windows.view(
            b, 2, c, wse, wse, nw).permute(1, 0, 5, 3, 4, 2)
        kv_windows = kv_windows.reshape(2, b * nw, wse * wse, c)
        k_windows, v_windows = kv_windows[0], kv_windows[1]
        b_, nq, _ = q_windows.shape
        d = c // self.num_heads
        q = q_windows.reshape(b_, nq, self.num_heads, d).permute(
            0, 2, 1, 3)
        k = k_windows.reshape(b_, wse * wse, self.num_heads, d).permute(
            0, 2, 1, 3)
        v = v_windows.reshape(b_, wse * wse, self.num_heads, d).permute(
            0, 2, 1, 3)
        q = q * self.scale
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            rpi.view(-1)].view(ws * ws, wse * wse, -1)
        attn = attn + bias.permute(2, 0, 1).contiguous().unsqueeze(0)
        attn = torch.softmax(attn, dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b_, nq, self.dim)
        x = _win_rev(x, ws, h, w).view(b, L, self.dim)
        x = self.proj(x) + shortcut
        return x + self.mlp(self.norm2(x))


class _AttenBlocks(nn.Module):
    def __init__(self, dim, depth, num_heads, window_size, compress_ratio,
                 squeeze_factor, conv_scale, overlap_ratio, mlp_ratio):
        super().__init__()
        self.blocks = nn.ModuleList([
            _HAB(dim, num_heads, window_size,
                 0 if i % 2 == 0 else window_size // 2,
                 compress_ratio, squeeze_factor, conv_scale, mlp_ratio)
            for i in range(depth)])
        self.overlap_attn = _OCAB(dim, window_size, overlap_ratio,
                                  num_heads, mlp_ratio)

    def forward(self, x, x_size, params):
        for blk in self.blocks:
            x = blk(x, x_size, params["rpi_sa"], params["attn_mask"])
        return self.overlap_attn(x, x_size, params["rpi_oca"])


class _RHAG(nn.Module):
    def __init__(self, dim, depth, num_heads, window_size, compress_ratio,
                 squeeze_factor, conv_scale, overlap_ratio, mlp_ratio):
        super().__init__()
        self.residual_group = _AttenBlocks(
            dim, depth, num_heads, window_size, compress_ratio,
            squeeze_factor, conv_scale, overlap_ratio, mlp_ratio)
        self.conv = nn.Conv2d(dim, dim, 3, 1, 1)

    def forward(self, x, x_size, params):
        h, w = x_size
        b, L, c = x.shape
        y = self.residual_group(x, x_size, params)
        y = y.transpose(1, 2).view(b, c, h, w)
        y = self.conv(y)
        return y.flatten(2).transpose(1, 2) + x


class TorchHAT(nn.Module):
    """Official-schema HAT (pixelshuffle head); NCHW in [0, 1], same
    mean/img_range handling as the published network, reflect-padded to
    window multiples like the JAX forward (the official net requires
    pre-padded inputs)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        dim = cfg.embed_dim
        self.mean = torch.tensor([0.4488, 0.4371, 0.4040]).view(
            1, 3, 1, 1) if cfg.in_channels == 3 else torch.zeros(
            1, 1, 1, 1)
        self.conv_first = nn.Conv2d(cfg.in_channels, dim, 3, 1, 1)
        self.patch_embed = _PatchEmbed(dim, cfg.patch_norm)
        self.layers = nn.ModuleList([
            _RHAG(dim, cfg.depths[i], cfg.num_heads[i], cfg.window_size,
                  cfg.compress_ratio, cfg.squeeze_factor, cfg.conv_scale,
                  cfg.overlap_ratio, cfg.mlp_ratio)
            for i in range(len(cfg.depths))])
        self.norm = nn.LayerNorm(dim)
        self.conv_after_body = nn.Conv2d(dim, dim, 3, 1, 1)
        nf = cfg.num_feat
        # HAT: LeakyReLU here (SwinIR's pixelshuffle head uses ReLU)
        self.conv_before_upsample = nn.Sequential(
            nn.Conv2d(dim, nf, 3, 1, 1), nn.LeakyReLU(inplace=True))
        ups, s = [], cfg.scale
        while s > 1:
            r = 3 if s % 2 else 2
            ups += [nn.Conv2d(nf, nf * r * r, 3, 1, 1),
                    nn.PixelShuffle(r)]
            s //= r
        self.upsample = nn.Sequential(*ups)
        self.conv_last = nn.Conv2d(nf, cfg.out_channels, 3, 1, 1)

    def _statics(self, h, w, device):
        ws = self.cfg.window_size
        wse = int(ws * self.cfg.overlap_ratio) + ws
        coords = torch.stack(torch.meshgrid(
            torch.arange(ws), torch.arange(ws), indexing="ij"))
        flat = torch.flatten(coords, 1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += ws - 1
        rel[:, :, 1] += ws - 1
        rel[:, :, 0] *= 2 * ws - 1
        rpi_sa = rel.sum(-1)

        co = torch.stack(torch.meshgrid(
            torch.arange(ws), torch.arange(ws),
            indexing="ij")).flatten(1)
        ce = torch.stack(torch.meshgrid(
            torch.arange(wse), torch.arange(wse),
            indexing="ij")).flatten(1)
        rel = ce[:, None, :] - co[:, :, None]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += ws - 1
        rel[:, :, 1] += ws - 1
        rel[:, :, 0] *= ws + wse - 1
        rpi_oca = rel.sum(-1)

        ss = ws // 2
        img = torch.zeros((1, h, w, 1), device=device)
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
            for vs in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
                img[:, hs, vs, :] = cnt
                cnt += 1
        mw = _win_part(img, ws).view(-1, ws * ws)
        am = mw.unsqueeze(1) - mw.unsqueeze(2)
        am = am.masked_fill(am != 0, -100.0).masked_fill(am == 0, 0.0)
        return {"rpi_sa": rpi_sa.to(device), "rpi_oca": rpi_oca.to(device),
                "attn_mask": am}

    def forward_features(self, x):
        x_size = (x.shape[2], x.shape[3])
        params = self._statics(*x_size, x.device)
        t = self.patch_embed(x)
        for layer in self.layers:
            t = layer(t, x_size, params)
        t = self.norm(t)
        return t.transpose(1, 2).view(x.shape[0], -1, *x_size)

    @torch.no_grad()
    def forward(self, x):
        h0, w0 = x.shape[2], x.shape[3]
        ws = self.cfg.window_size
        mod_h, mod_w = (-h0) % ws, (-w0) % ws
        if mod_h or mod_w:
            x = F.pad(x, (0, mod_w, 0, mod_h), "reflect")
        x = (x - self.mean) * self.cfg.img_range
        x = self.conv_first(x)
        x = self.conv_after_body(self.forward_features(x)) + x
        x = self.conv_before_upsample(x)
        x = self.conv_last(self.upsample(x))
        x = x / self.cfg.img_range + self.mean
        return x[:, :, :h0 * self.cfg.scale, :w0 * self.cfg.scale]

# ---------------------------------------------------------------------------
# Swin2SR oracle (official mv-lab/swin2sr network_swin2sr.py structure +
# key schema; SwinV2 blocks: cosine attention, CPB-MLP bias, res-post-norm)
# ---------------------------------------------------------------------------

import numpy as np


class _SwinV2WindowAttention(nn.Module):
    def __init__(self, dim, window_size, num_heads,
                 pretrained_window_size=0):
        super().__init__()
        self.dim = dim
        self.window_size = window_size
        self.num_heads = num_heads
        self.logit_scale = nn.Parameter(
            torch.log(10 * torch.ones((num_heads, 1, 1))))
        self.cpb_mlp = nn.Sequential(nn.Linear(2, 512, bias=True),
                                     nn.ReLU(inplace=True),
                                     nn.Linear(512, num_heads, bias=False))
        rch = torch.arange(-(window_size - 1), window_size,
                           dtype=torch.float32)
        rcw = torch.arange(-(window_size - 1), window_size,
                           dtype=torch.float32)
        table = torch.stack(torch.meshgrid([rch, rcw], indexing="ij"))
        table = table.permute(1, 2, 0).contiguous().unsqueeze(0)
        denom = (pretrained_window_size - 1) if pretrained_window_size > 0 \
            else (window_size - 1)
        table[:, :, :, 0] /= denom
        table[:, :, :, 1] /= denom
        table *= 8
        table = torch.sign(table) * torch.log2(torch.abs(table) + 1.0) \
            / np.log2(8)
        self.register_buffer("relative_coords_table", table)
        coords = torch.stack(torch.meshgrid(
            torch.arange(window_size), torch.arange(window_size),
            indexing="ij"))
        flat = torch.flatten(coords, 1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += window_size - 1
        rel[:, :, 1] += window_size - 1
        rel[:, :, 0] *= 2 * window_size - 1
        self.register_buffer("relative_position_index", rel.sum(-1))
        self.qkv = nn.Linear(dim, dim * 3, bias=False)
        self.q_bias = nn.Parameter(torch.zeros(dim))
        self.v_bias = nn.Parameter(torch.zeros(dim))
        self.proj = nn.Linear(dim, dim)
        self.softmax = nn.Softmax(dim=-1)

    def forward(self, x, mask=None):
        b_, n, c = x.shape
        qkv_bias = torch.cat((self.q_bias,
                              torch.zeros_like(self.v_bias), self.v_bias))
        qkv = F.linear(x, self.qkv.weight, qkv_bias)
        qkv = qkv.reshape(b_, n, 3, self.num_heads, -1).permute(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = F.normalize(q, dim=-1) @ F.normalize(k, dim=-1).transpose(
            -2, -1)
        logit_scale = torch.clamp(
            self.logit_scale, max=torch.log(torch.tensor(1. / 0.01))).exp()
        attn = attn * logit_scale
        bias_table = self.cpb_mlp(self.relative_coords_table).view(
            -1, self.num_heads)
        bias = bias_table[self.relative_position_index.view(-1)].view(
            n, n, -1)
        bias = 16 * torch.sigmoid(bias.permute(2, 0, 1).contiguous())
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, self.num_heads, n, n) + \
                mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.num_heads, n, n)
        attn = self.softmax(attn)
        x = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.proj(x)


class _Swin2Block(nn.Module):
    """SwinV2 transformer block: attention/MLP first, LayerNorm applied to
    the branch OUTPUT (res-post-norm), cosine window attention."""

    def __init__(self, dim, num_heads, window_size, shift_size, mlp_ratio):
        super().__init__()
        self.window_size = window_size
        self.shift_size = shift_size
        self.norm1 = nn.LayerNorm(dim)
        self.attn = _SwinV2WindowAttention(dim, window_size, num_heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = _SwinMlp(dim, int(dim * mlp_ratio))

    def _mask(self, h, w, device):
        ws, ss = self.window_size, self.shift_size
        img = torch.zeros((1, h, w, 1), device=device)
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
            for vs in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
                img[:, hs, vs, :] = cnt
                cnt += 1
        mw = _win_part(img, ws).view(-1, ws * ws)
        am = mw.unsqueeze(1) - mw.unsqueeze(2)
        return am.masked_fill(am != 0, -100.0).masked_fill(am == 0, 0.0)

    def forward(self, x, x_size):
        h, w = x_size
        b, L, c = x.shape
        shortcut = x
        x = x.view(b, h, w, c)
        if self.shift_size > 0:
            x = torch.roll(x, (-self.shift_size, -self.shift_size), (1, 2))
            mask = self._mask(h, w, x.device)
        else:
            mask = None
        wins = _win_part(x, self.window_size)
        wins = self.attn(wins, mask)
        x = _win_rev(wins, self.window_size, h, w)
        if self.shift_size > 0:
            x = torch.roll(x, (self.shift_size, self.shift_size), (1, 2))
        x = shortcut + self.norm1(x.view(b, L, c))
        return x + self.norm2(self.mlp(x))


class _Swin2Group(nn.Module):
    def __init__(self, dim, depth, num_heads, window_size, mlp_ratio):
        super().__init__()
        self.blocks = nn.ModuleList([
            _Swin2Block(dim, num_heads, window_size,
                        0 if i % 2 == 0 else window_size // 2, mlp_ratio)
            for i in range(depth)])

    def forward(self, x, x_size):
        for blk in self.blocks:
            x = blk(x, x_size)
        return x


class _RSTB2(nn.Module):
    def __init__(self, dim, depth, num_heads, window_size, mlp_ratio):
        super().__init__()
        self.residual_group = _Swin2Group(dim, depth, num_heads,
                                          window_size, mlp_ratio)
        self.conv = nn.Conv2d(dim, dim, 3, 1, 1)

    def forward(self, x, x_size):
        h, w = x_size
        b, L, c = x.shape
        y = self.residual_group(x, x_size)
        y = y.transpose(1, 2).view(b, c, h, w)
        y = self.conv(y)
        return y.flatten(2).transpose(1, 2) + x


class TorchSwin2SR(nn.Module):
    """Official-schema Swin2SR (upsampler 'pixelshuffle' |
    'pixelshuffle_aux' | 'pixelshuffledirect' | 'nearest+conv' | '');
    NCHW in [0, 1].  Note vs SwinIR: conv_before_upsample uses LeakyReLU
    (SwinIR's pixelshuffle head uses ReLU), and 'nearest+conv' is the
    scale-4 real-SR head (conv_up1 + conv_up2 unconditionally)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        dim = cfg.embed_dim
        self.mean = torch.tensor([0.4488, 0.4371, 0.4040]).view(
            1, 3, 1, 1) if cfg.in_channels == 3 else torch.zeros(1, 1, 1, 1)
        self.conv_first = nn.Conv2d(cfg.in_channels, dim, 3, 1, 1)
        self.patch_embed = _PatchEmbed(dim, cfg.patch_norm)
        self.layers = nn.ModuleList([
            _RSTB2(dim, cfg.depths[i], cfg.num_heads[i], cfg.window_size,
                   cfg.mlp_ratio) for i in range(len(cfg.depths))])
        self.norm = nn.LayerNorm(dim)
        self.conv_after_body = nn.Conv2d(dim, dim, 3, 1, 1)
        nf = cfg.num_feat

        def _upseq(scale, width):
            ups, s = [], scale
            while s > 1:
                r = 3 if s % 2 else 2
                ups += [nn.Conv2d(width, width * r * r, 3, 1, 1),
                        nn.PixelShuffle(r)]
                s //= r
            return nn.Sequential(*ups)

        if cfg.upsampler == "pixelshuffle":
            self.conv_before_upsample = nn.Sequential(
                nn.Conv2d(dim, nf, 3, 1, 1), nn.LeakyReLU(inplace=True))
            self.upsample = _upseq(cfg.scale, nf)
            self.conv_last = nn.Conv2d(nf, cfg.out_channels, 3, 1, 1)
        elif cfg.upsampler == "pixelshuffle_aux":
            self.conv_bicubic = nn.Conv2d(cfg.in_channels, nf, 3, 1, 1)
            self.conv_before_upsample = nn.Sequential(
                nn.Conv2d(dim, nf, 3, 1, 1), nn.LeakyReLU(inplace=True))
            self.conv_aux = nn.Conv2d(nf, cfg.out_channels, 3, 1, 1)
            self.conv_after_aux = nn.Sequential(
                nn.Conv2d(3, nf, 3, 1, 1), nn.LeakyReLU(inplace=True))
            self.upsample = _upseq(cfg.scale, nf)
            self.conv_last = nn.Conv2d(nf, cfg.out_channels, 3, 1, 1)
        elif cfg.upsampler == "pixelshuffledirect":
            self.upsample = nn.Sequential(
                nn.Conv2d(dim, cfg.out_channels * cfg.scale ** 2, 3, 1, 1),
                nn.PixelShuffle(cfg.scale))
        elif cfg.upsampler == "nearest+conv":
            assert cfg.scale == 4
            self.conv_before_upsample = nn.Sequential(
                nn.Conv2d(dim, nf, 3, 1, 1), nn.LeakyReLU(inplace=True))
            self.conv_up1 = nn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_up2 = nn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_hr = nn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_last = nn.Conv2d(nf, cfg.out_channels, 3, 1, 1)
            self.lrelu = nn.LeakyReLU(0.2, inplace=True)
        else:
            self.conv_last = nn.Conv2d(dim, cfg.out_channels, 3, 1, 1)

    def forward_features(self, x):
        x_size = (x.shape[2], x.shape[3])
        t = self.patch_embed(x)
        for layer in self.layers:
            t = layer(t, x_size)
        t = self.norm(t)
        return t.transpose(1, 2).view(x.shape[0], -1, *x_size)

    @torch.no_grad()
    def forward(self, x):
        h0, w0 = x.shape[2], x.shape[3]
        ws = self.cfg.window_size
        mod_h, mod_w = (-h0) % ws, (-w0) % ws
        if mod_h or mod_w:
            x = F.pad(x, (0, mod_w, 0, mod_h), "reflect")
        x = (x - self.mean) * self.cfg.img_range
        up = self.cfg.upsampler
        scale = self.cfg.scale
        if up == "pixelshuffle":
            x = self.conv_first(x)
            x = self.conv_after_body(self.forward_features(x)) + x
            x = self.conv_before_upsample(x)
            x = self.conv_last(self.upsample(x))
        elif up == "pixelshuffle_aux":
            bicubic = F.interpolate(x, size=(h0 * scale, w0 * scale),
                                    mode="bicubic", align_corners=False)
            bicubic = self.conv_bicubic(bicubic)
            x = self.conv_first(x)
            x = self.conv_after_body(self.forward_features(x)) + x
            x = self.conv_before_upsample(x)
            aux = self.conv_aux(x)
            x = self.conv_after_aux(aux)
            x = self.upsample(x)[:, :, :h0 * scale, :w0 * scale] + \
                bicubic[:, :, :h0 * scale, :w0 * scale]
            x = self.conv_last(x)
        elif up == "pixelshuffledirect":
            x = self.conv_first(x)
            x = self.conv_after_body(self.forward_features(x)) + x
            x = self.upsample(x)
        elif up == "nearest+conv":
            x = self.conv_first(x)
            x = self.conv_after_body(self.forward_features(x)) + x
            x = self.conv_before_upsample(x)
            x = self.lrelu(self.conv_up1(
                F.interpolate(x, scale_factor=2, mode="nearest")))
            x = self.lrelu(self.conv_up2(
                F.interpolate(x, scale_factor=2, mode="nearest")))
            x = self.conv_last(self.lrelu(self.conv_hr(x)))
        else:
            xf = self.conv_first(x)
            res = self.conv_after_body(self.forward_features(xf)) + xf
            x = x + self.conv_last(res)
        x = x / self.cfg.img_range + self.mean
        return x[:, :, :h0 * scale, :w0 * scale]

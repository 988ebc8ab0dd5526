"""SwinIR/HAT's core Swin block vs transformers' independent v1 Swin.

Every other SwinIR/HAT parity test compares hdrvae against
tests/torch_oracle.py — a transcription written alongside the JAX port,
so a shared misunderstanding of the architecture would pass both.  The
``transformers`` library ships an independent implementation of the v1
Swin block (`transformers/models/swin/modeling_swin.py::SwinLayer`,
converted from the official Microsoft checkpoints) whose math is
identical to SwinIR's SwinTransformerBlock (pre-norm windowed attention
with a relative-position bias table, -100 additive shift masks, erf
GELU MLP — verified against the SwinIR paper's reference code): these
tests map a random-initialized HF layer's weights onto hdrvae's block
params and assert `_swin_block` reproduces the HF forward.

This is a block-level oracle (SwinLayer is the largest unit transformers
shares with SwinIR — the surrounding RSTB/upsampler structure is
SwinIR-specific and already covered by torch_oracle + checkpoint tests);
it independently pins the riskiest shared machinery: the relative
position index, the shift-window mask construction, qkv packing, and
the residual/LN order used by SwinIR, HAT, and the fused Pallas block.
"""

import numpy as np
import pytest
import torch

from hdrvae.core.config import Precision
from hdrvae.models.swinir import _swin_block

transformers = pytest.importorskip("transformers")


def _hf_layer(dim=16, heads=2, ws=4, res=(8, 8), shift=0, seed=3):
    from transformers import SwinConfig
    from transformers.models.swin.modeling_swin import SwinLayer
    cfg = SwinConfig(embed_dim=dim, depths=[1], num_heads=[heads],
                     window_size=ws, mlp_ratio=2.0, qkv_bias=True,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0, drop_path_rate=0.0,
                     hidden_act="gelu", layer_norm_eps=1e-5)
    layer = SwinLayer(cfg, dim=dim, input_resolution=res, num_heads=heads,
                      shift_size=shift)
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in layer.named_parameters():
            if "layernorm" in name:
                if name.endswith("weight"):
                    p.copy_(1.0 + 0.3 * torch.randn(p.shape, generator=gen))
                else:
                    p.copy_(0.1 * torch.randn(p.shape, generator=gen))
            elif "relative_position_bias_table" in name:
                p.copy_(0.5 * torch.randn(p.shape, generator=gen))
            else:
                p.copy_(0.05 * torch.randn(p.shape, generator=gen))
    layer.eval()
    return layer


def _to_block_params(layer):
    """HF SwinLayer state dict -> hdrvae swin-block param pytree.
    Pure renames + the qkv fuse (HF splits q/k/v into three Linears;
    hdrvae packs them [in, 3C] in q,k,v order)."""
    sd = {k: v.detach().numpy() for k, v in layer.state_dict().items()}
    att = "attention.self."

    def lin(prefix):
        return {"kernel": sd[prefix + ".weight"].T.copy(),
                "bias": sd[prefix + ".bias"].copy()}

    qkv_w = np.concatenate([sd[att + n + ".weight"].T
                            for n in ("query", "key", "value")], axis=1)
    qkv_b = np.concatenate([sd[att + n + ".bias"]
                            for n in ("query", "key", "value")])
    return {
        "norm1": {"scale": sd["layernorm_before.weight"],
                  "bias": sd["layernorm_before.bias"]},
        "attn": {
            "qkv": {"kernel": qkv_w.copy(), "bias": qkv_b.copy()},
            "proj": lin("attention.output.dense"),
            "relative_position_bias_table":
                sd[att + "relative_position_bias_table"].copy(),
        },
        "norm2": {"scale": sd["layernorm_after.weight"],
                  "bias": sd["layernorm_after.bias"]},
        "mlp": {"fc1": lin("intermediate.dense"),
                "fc2": lin("output.dense")},
    }


def _compare(layer, h, w, heads, ws, shift, tol=2e-5):
    dim = layer.layernorm_before.weight.shape[0]
    rng = np.random.default_rng(11)
    x = rng.normal(0.0, 1.0, (1, h, w, dim)).astype(np.float32)

    with torch.no_grad():
        ref = layer(torch.from_numpy(x.reshape(1, h * w, dim).copy()),
                    (h, w))[0].numpy().reshape(1, h, w, dim)

    params = _to_block_params(layer)
    got = np.asarray(_swin_block(np.asarray(x), params, heads, ws, shift,
                                 Precision.parity()))
    assert got.shape == ref.shape
    err = float(np.abs(got - ref).max())
    scale = max(1.0, float(np.abs(ref).max()))
    assert err <= tol * scale, f"max-abs {err:.3e} (scale {scale:.2f})"

    # the oracle must not be trivial: attention + MLP moved the input
    assert float(np.abs(ref - x).max()) > 0.05


def test_hf_oracle_unshifted():
    layer = _hf_layer(ws=4, res=(8, 8), shift=0)
    _compare(layer, 8, 8, heads=2, ws=4, shift=0)


def test_hf_oracle_shifted():
    """shift = ws//2 exercises the roll + the -100 boundary mask; a
    rectangular 8x12 grid makes the per-window mask classes distinct."""
    layer = _hf_layer(ws=4, res=(8, 12), shift=2)
    _compare(layer, 8, 12, heads=2, ws=4, shift=2)


def test_hf_oracle_window7_shifted():
    """Odd window (SwinIR-M's actual geometry is window 8, but Swin2SR
    JPEG-CAR and several HAT variants use odd windows) through shift-3:
    pins the (2ws-1)^2 bias-table index for odd ws."""
    layer = _hf_layer(dim=16, heads=4, ws=7, res=(14, 14), shift=3)
    _compare(layer, 14, 14, heads=4, ws=7, shift=3)


def test_hf_oracle_multihead_wide():
    """More windows than mask classes + 4 heads at head_dim 8."""
    layer = _hf_layer(dim=32, heads=4, ws=4, res=(16, 16), shift=2)
    _compare(layer, 16, 16, heads=4, ws=4, shift=2)

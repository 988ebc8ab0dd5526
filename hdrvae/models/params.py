"""Checkpoint loading: torch/safetensors state dicts -> JAX param pytrees.

Replaces the reference's reliance on ComfyUI's VAE loader and spandrel
(`hdr_upscale_with_model.py:72-76`; SURVEY.md section 2.7).  Weights are
converted once: conv kernels OIHW -> HWIO, linear weights [O, I] -> [I, O],
everything to float32 numpy, then device_put as a pytree.

Two key schemas are supported for the decoder:
  - "ldm" (ComfyUI / Black Forest Labs Flux.1 ae.safetensors):
    ``decoder.conv_in.weight``, ``decoder.mid.block_1.norm1.weight``,
    ``decoder.up.{level}.block.{j}...``, ``decoder.up.{level}.upsample.conv``
  - flat dicts without the leading ``decoder.`` prefix.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from hdrvae.core.config import DecoderConfig

Params = Dict[str, Any]


def to_np(t) -> np.ndarray:
    """Accept torch tensors, numpy arrays, or jax arrays."""
    if hasattr(t, "detach"):  # torch
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


_to_np = to_np


def conv_kernel_to_hwio(w: np.ndarray) -> np.ndarray:
    """OIHW (torch Conv2d) -> HWIO (jax NHWC conv)."""
    return np.transpose(w, (2, 3, 1, 0))


# Shared state-dict extractors for the upscaler-zoo loaders (one source
# of truth for tensor conversion across the model families).

def linear_from_sd(sd: Mapping[str, Any], prefix: str) -> Params:
    """torch nn.Linear -> {'kernel' [in, out], 'bias' [out]}."""
    return {"kernel": to_np(sd[prefix + ".weight"]).T,
            "bias": to_np(sd[prefix + ".bias"])}


def conv_from_sd(sd: Mapping[str, Any], prefix: str) -> Params:
    """torch nn.Conv2d -> {'kernel' HWIO, 'bias' [O]}; bias-free convs
    get explicit zeros (the conv2d epilogue always adds one)."""
    kernel = conv_kernel_to_hwio(to_np(sd[prefix + ".weight"]))
    if prefix + ".bias" in sd:
        bias = to_np(sd[prefix + ".bias"])
    else:
        bias = np.zeros((kernel.shape[-1],), np.float32)
    return {"kernel": kernel, "bias": bias}


def norm_affine_from_sd(sd: Mapping[str, Any], prefix: str) -> Params:
    """torch LayerNorm/GroupNorm affine -> {'scale', 'bias'}."""
    return {"scale": to_np(sd[prefix + ".weight"]),
            "bias": to_np(sd[prefix + ".bias"])}


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open
    out = {}
    with safe_open(path, framework="numpy") as f:
        for key in f.keys():
            out[key] = np.asarray(f.get_tensor(key))
    return out


def _strip_prefix(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Normalize to keys relative to the decoder root."""
    out = {}
    for k, v in sd.items():
        for prefix in ("first_stage_model.decoder.", "vae.decoder.",
                       "decoder."):
            if k.startswith(prefix):
                k = k[len(prefix):]
                break
        out[k] = v
    return out


def _conv(sd: Mapping[str, Any], name: str) -> Params:
    return {
        "kernel": conv_kernel_to_hwio(_to_np(sd[f"{name}.weight"])),
        "bias": _to_np(sd[f"{name}.bias"]),
    }


def _norm(sd: Mapping[str, Any], name: str) -> Params:
    return {
        "scale": _to_np(sd[f"{name}.weight"]),
        "bias": _to_np(sd[f"{name}.bias"]),
    }


def _attn_proj(sd: Mapping[str, Any], name: str) -> Params:
    """Attention q/k/v/proj_out may be stored as 1x1 convs (ldm) or linear."""
    w = _to_np(sd[f"{name}.weight"])
    if w.ndim == 4:  # 1x1 conv OIHW
        kernel = conv_kernel_to_hwio(w)
    else:  # linear [O, I] -> HWIO 1x1
        kernel = np.transpose(w, (1, 0))[None, None]
    return {"kernel": kernel, "bias": _to_np(sd[f"{name}.bias"])}


def _resnet(sd: Mapping[str, Any], name: str) -> Params:
    p = {
        "norm1": _norm(sd, f"{name}.norm1"),
        "conv1": _conv(sd, f"{name}.conv1"),
        "norm2": _norm(sd, f"{name}.norm2"),
        "conv2": _conv(sd, f"{name}.conv2"),
    }
    if f"{name}.nin_shortcut.weight" in sd:
        p["nin_shortcut"] = _conv(sd, f"{name}.nin_shortcut")
    return p


def _shape(t) -> tuple:
    return tuple(t.shape)


def infer_decoder_config(state_dict: Mapping[str, Any]) -> DecoderConfig:
    """Infer the decoder topology from an ldm-layout state dict (shapes only).

    The reference works with whatever VAE object the host framework hands it
    (`hdr_vae_decode.py:62-67` — Flux.1, SD1.5 and SDXL all share the
    AutoencoderKL decoder topology and differ only in widths/latent
    channels); this is the equivalent for checkpoints loaded directly.

    Latent scale/shift are NOT recoverable from weights: z_channels == 16
    selects the Flux.1 constants (0.3611 / 0.1159), z_channels == 4 the SD
    family's (0.18215 / 0, diffusers ``z / scale + shift`` semantics) —
    pass an explicit :class:`DecoderConfig` for SDXL's 0.13025 or any
    non-standard VAE.  GroupNorm group count is likewise conventional (32
    in every ldm release); it is reduced to the largest power of two that
    divides every feature width only when 32 does not.
    """
    sd = _strip_prefix(state_dict)
    try:
        block_in, z_channels = _shape(sd["conv_in.weight"])[:2]
        out_channels, pre_out = _shape(sd["conv_out.weight"])[:2]
    except KeyError as e:
        raise ValueError(f"not an AutoencoderKL decoder state dict "
                         f"(missing {e})") from None
    up_levels = set()
    block_counts: Dict[int, int] = {}
    for k in sd:
        if not k.startswith("up."):
            continue
        parts = k.split(".")
        level = int(parts[1])
        up_levels.add(level)
        if parts[2] == "attn":
            raise ValueError(
                "decoder has per-level attention blocks (VQ-style "
                "topology) — not supported; only the AutoencoderKL "
                "family (Flux.1 / SD / SDXL) is")
        if parts[2] == "block":
            j = int(parts[3])
            block_counts[level] = max(block_counts.get(level, -1), j)
    if not up_levels:
        raise ValueError("decoder state dict has no up.{level} stages")
    num_levels = max(up_levels) + 1
    if up_levels != set(range(num_levels)):
        raise ValueError(f"non-contiguous up levels: {sorted(up_levels)}")
    num_res_blocks = block_counts[0]  # decoder runs num_res_blocks + 1
    if any(c != num_res_blocks for c in block_counts.values()):
        raise ValueError(f"ragged block counts per level: {block_counts}")

    # Per-level output width from block.0.conv2 (always present, always
    # [block_out, block_out, 3, 3] in OIHW).
    widths = [int(_shape(sd[f"up.{lvl}.block.0.conv2.weight"])[0])
              for lvl in range(num_levels)]
    ch = widths[0]
    if any(w % ch for w in widths):
        raise ValueError(f"level widths {widths} are not multiples of the "
                         f"base width {ch}")
    ch_mult = tuple(w // ch for w in widths)
    if ch * ch_mult[-1] != block_in:
        raise ValueError(f"conv_in width {block_in} != ch*ch_mult[-1] = "
                         f"{ch * ch_mult[-1]}")
    if pre_out != ch * ch_mult[0]:
        raise ValueError(f"conv_out input width {pre_out} != ch*ch_mult[0]"
                         f" = {ch * ch_mult[0]}")

    num_groups = 32
    all_widths = set(widths) | {block_in}
    while num_groups > 1 and any(w % num_groups for w in all_widths):
        num_groups //= 2

    base = DecoderConfig()
    if z_channels == 16:
        scale, shift = base.scale_factor, base.shift_factor  # Flux.1
    elif z_channels == 4:
        scale, shift = 0.18215, 0.0  # SD 1.x/2.x family
    else:
        scale, shift = 1.0, 0.0
    import dataclasses as _dc
    return _dc.replace(
        base, z_channels=int(z_channels), ch=ch, ch_mult=ch_mult,
        num_res_blocks=int(num_res_blocks), out_channels=int(out_channels),
        attn_mid="mid.attn_1.norm.weight" in sd, num_groups=num_groups,
        scale_factor=scale, shift_factor=shift)


def decoder_params_from_state_dict(
        state_dict: Mapping[str, Any],
        cfg: DecoderConfig | None = None) -> Params:
    """Build the decoder param pytree from an ldm-layout state dict.

    ``cfg=None`` infers the topology from the checkpoint shapes
    (:func:`infer_decoder_config`).
    """
    if cfg is None:
        cfg = infer_decoder_config(state_dict)
    sd = _strip_prefix(state_dict)

    params: Params = {
        "conv_in": _conv(sd, "conv_in"),
        "mid": {
            "block_1": _resnet(sd, "mid.block_1"),
            "block_2": _resnet(sd, "mid.block_2"),
        },
        "norm_out": _norm(sd, "norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }
    if cfg.attn_mid:
        params["mid"]["attn_1"] = {
            "norm": _norm(sd, "mid.attn_1.norm"),
            "q": _attn_proj(sd, "mid.attn_1.q"),
            "k": _attn_proj(sd, "mid.attn_1.k"),
            "v": _attn_proj(sd, "mid.attn_1.v"),
            "proj_out": _attn_proj(sd, "mid.attn_1.proj_out"),
        }

    ups: Params = {}
    for level in range(cfg.num_levels):
        blocks = []
        for j in range(cfg.num_res_blocks + 1):
            blocks.append(_resnet(sd, f"up.{level}.block.{j}"))
        up: Params = {"block": blocks}
        if level != 0:
            up["upsample"] = _conv(sd, f"up.{level}.upsample.conv")
        ups[level] = up
    params["up"] = ups
    return jax.tree_util.tree_map(jnp.asarray, params)


def load_decoder(path: str,
                 cfg: DecoderConfig | None = None) -> Params:
    """Load an AutoencoderKL decoder from a safetensors checkpoint file.

    ``cfg=None`` infers the topology from the checkpoint (Flux.1, SD1.5,
    SDXL, ... — see :func:`infer_decoder_config`); use
    ``infer_decoder_config(load_safetensors(path))`` when the caller also
    needs the inferred config.
    """
    return decoder_params_from_state_dict(load_safetensors(path), cfg)


# ---------------------------------------------------------------------------
# Reverse direction: our pytree -> ldm-layout numpy state dict (for tests and
# for exporting fixtures that torch can consume)
# ---------------------------------------------------------------------------


def decoder_params_to_state_dict(params: Params,
                                 cfg: DecoderConfig = DecoderConfig()
                                 ) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}

    def put_conv(name: str, p: Params):
        # ascontiguousarray matters: safetensors' numpy save_file writes
        # the raw buffer of a strided view without applying the transpose
        # (silent corruption, verified on 0.8.0) — every tensor that may
        # reach save_file must be materialized C-order.
        sd[f"{name}.weight"] = np.ascontiguousarray(
            np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1)))
        sd[f"{name}.bias"] = np.asarray(p["bias"])

    def put_norm(name: str, p: Params):
        sd[f"{name}.weight"] = np.asarray(p["scale"])
        sd[f"{name}.bias"] = np.asarray(p["bias"])

    def put_resnet(name: str, p: Params):
        put_norm(f"{name}.norm1", p["norm1"])
        put_conv(f"{name}.conv1", p["conv1"])
        put_norm(f"{name}.norm2", p["norm2"])
        put_conv(f"{name}.conv2", p["conv2"])
        if "nin_shortcut" in p:
            put_conv(f"{name}.nin_shortcut", p["nin_shortcut"])

    put_conv("conv_in", params["conv_in"])
    put_resnet("mid.block_1", params["mid"]["block_1"])
    put_resnet("mid.block_2", params["mid"]["block_2"])
    if cfg.attn_mid:
        attn = params["mid"]["attn_1"]
        put_norm("mid.attn_1.norm", attn["norm"])
        for nm in ("q", "k", "v", "proj_out"):
            put_conv(f"mid.attn_1.{nm}", attn[nm])
    for level in range(cfg.num_levels):
        up = params["up"][level]
        for j, blk in enumerate(up["block"]):
            put_resnet(f"up.{level}.block.{j}", blk)
        if level != 0:
            put_conv(f"up.{level}.upsample.conv", up["upsample"])
    put_norm("norm_out", params["norm_out"])
    put_conv("conv_out", params["conv_out"])
    return sd

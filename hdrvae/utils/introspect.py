"""Model/checkpoint introspection — the developer-tooling counterpart of the
reference's `inspect_vae_architecture` / `print_model_structure`
(`hdr_vae_decode.py:359-441`, SURVEY.md component 16).

Because this framework owns its decoder, introspection reads param pytrees
and checkpoints directly rather than probing a foreign module tree for
sigmoid/tanh layers.
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np


def _walk(node: Any, prefix: str, rows: List[tuple]) -> None:
    if isinstance(node, dict):
        for k in sorted(node, key=str):
            _walk(node[k], f"{prefix}.{k}" if prefix else str(k), rows)
    elif isinstance(node, (list, tuple)):
        for i, v in enumerate(node):
            _walk(v, f"{prefix}.{i}", rows)
    else:
        arr = np.asarray(node)
        rows.append((prefix, tuple(arr.shape), str(arr.dtype), arr.size))


def describe_params(params: Dict[str, Any], name: str = "model",
                    max_rows: int = 0) -> str:
    """Human-readable parameter-tree summary with shapes and totals."""
    rows: List[tuple] = []
    _walk(params, "", rows)
    total = sum(r[3] for r in rows)
    lines = [f"{name}: {len(rows)} tensors, {total / 1e6:.2f}M params"]
    shown = rows if not max_rows else rows[:max_rows]
    width = max((len(r[0]) for r in shown), default=0)
    for path, shape, dtype, size in shown:
        lines.append(f"  {path:<{width}}  {str(shape):<22} {dtype:<10} "
                     f"{size:>10,}")
    if max_rows and len(rows) > max_rows:
        lines.append(f"  ... {len(rows) - max_rows} more")
    return "\n".join(lines)


def describe_state_dict(path: str) -> str:
    """Describe a checkpoint file (safetensors or torch) without loading it
    into a model: key schema detection + tensor inventory."""
    if path.endswith(".safetensors"):
        from hdrvae.models.params import load_safetensors
        sd = load_safetensors(path)
    else:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
        for nested in ("params_ema", "params", "state_dict"):
            if isinstance(sd, dict) and nested in sd:
                sd = sd[nested]
                break

    keys = sorted(sd)
    total = sum(int(np.prod(np.asarray(v).shape)) for v in sd.values())
    kind = "unknown"
    if any(k.startswith(("decoder.", "first_stage_model.decoder."))
           or k.startswith("conv_in.") for k in keys):
        kind = "vae-decoder (ldm layout)"
    elif any(k.startswith("model.0.") for k in keys):
        kind = "esrgan (old arch)"
    elif any(k.startswith("conv_first.") for k in keys):
        kind = "esrgan/rrdbnet (new arch)"

    lines = [f"{path}: {len(keys)} tensors, {total / 1e6:.2f}M params, "
             f"schema: {kind}"]
    for k in keys[:20]:
        arr = np.asarray(sd[k])
        lines.append(f"  {k}: {tuple(arr.shape)} {arr.dtype}")
    if len(keys) > 20:
        lines.append(f"  ... {len(keys) - 20} more")
    return "\n".join(lines)

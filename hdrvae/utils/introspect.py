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


def flatten_params(params: Any) -> List[tuple]:
    """[(dotted_path, leaf)] via jax's pytree traversal — the ONE
    flattener shared by introspection and `cli convert` (replaces two
    hand-rolled dict/list walkers)."""
    import jax
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        parts = []
        for e in path:
            if hasattr(e, "key"):
                parts.append(str(e.key))
            elif hasattr(e, "idx"):
                parts.append(str(e.idx))
            else:
                parts.append(str(e))
        out.append((".".join(parts), leaf))
    return out


def _walk(node: Any, prefix: str, rows: List[tuple]) -> None:
    for path, leaf in flatten_params(node):
        arr = np.asarray(leaf)
        rows.append((path, tuple(arr.shape), str(arr.dtype), arr.size))


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

    def _shape_dtype(v):
        # use metadata attributes: materializing via np.asarray copies
        # the whole tensor and raises outright on torch bfloat16
        shape = tuple(getattr(v, "shape", np.asarray(v).shape))
        return shape, str(getattr(v, "dtype", type(v).__name__))

    total = sum(int(np.prod(_shape_dtype(v)[0])) for v in sd.values())
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
        shape, dtype = _shape_dtype(sd[k])
        lines.append(f"  {k}: {shape} {dtype}")
    if len(keys) > 20:
        lines.append(f"  ... {len(keys) - 20} more")
    return "\n".join(lines)

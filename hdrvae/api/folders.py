"""Model-folder registry — the framework's ``folder_paths`` equivalent.

The reference resolves upscale checkpoints through ComfyUI's folder_paths
(`hdr_upscale_with_model.py:4,62,73`).  Here the search roots come from the
``HDRVAE_MODELS_DIR`` environment variable (colon-separated) plus any roots
registered programmatically; the output directory from ``HDRVAE_OUTPUT_DIR``
(default ``./output``, standing in for `linear_exr_export.py:431-472`'s
ComfyUI output-dir discovery).
"""

from __future__ import annotations

import os
from typing import Dict, List

_MODEL_EXTENSIONS = (".safetensors", ".pth", ".pt", ".ckpt")

_registered_roots: Dict[str, List[str]] = {}


def register_model_folder(kind: str, path: str) -> None:
    _registered_roots.setdefault(kind, []).append(path)


def get_model_folders(kind: str) -> List[str]:
    roots = list(_registered_roots.get(kind, []))
    env = os.environ.get("HDRVAE_MODELS_DIR", "")
    for root in filter(None, env.split(os.pathsep)):
        roots.append(os.path.join(root, kind))
        roots.append(root)
    return [r for r in roots if os.path.isdir(r)]


def get_filename_list(kind: str) -> List[str]:
    names = []
    for root in get_model_folders(kind):
        for name in sorted(os.listdir(root)):
            if name.lower().endswith(_MODEL_EXTENSIONS):
                names.append(name)
    return sorted(set(names))


def get_full_path(kind: str, name: str) -> str:
    for root in get_model_folders(kind):
        candidate = os.path.join(root, name)
        if os.path.exists(candidate):
            return candidate
    raise FileNotFoundError(
        f"model {name!r} not found under {kind!r} folders "
        f"{get_model_folders(kind) or '(none registered)'}; set "
        f"HDRVAE_MODELS_DIR or call register_model_folder()")


def get_output_directory() -> str:
    return os.environ.get("HDRVAE_OUTPUT_DIR", os.path.join(os.getcwd(),
                                                            "output"))

"""ComfyUI drop-in adapter.

The core node classes (`hdrvae.api.nodes`) exchange numpy arrays so any
host can drive them; ComfyUI specifically expects IMAGE sockets to carry
torch tensors.  This module wraps the registry with torch conversions at
the boundary — point ComfyUI's custom-node loader at a package whose
``__init__`` re-exports these mappings and the graphs that used the
reference pack (`/root/reference/workflow_examples/HDR_VAE_DECODE.json`)
run against the TPU framework.

Import requires torch (present wherever ComfyUI runs).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from hdrvae.api import nodes as _nodes


def _to_torch(value):
    import torch
    if isinstance(value, np.ndarray):
        # copy: jax-backed buffers are read-only and torch requires
        # writable memory
        return torch.from_numpy(np.array(value, copy=True))
    return value


def _wrap_outputs(out: Tuple) -> Tuple:
    return tuple(_to_torch(v) for v in out)


class HDRVAEDecode(_nodes.HDRVAEDecode):
    def simple_hdr_decode(self, *args, **kwargs):
        return _wrap_outputs(super().simple_hdr_decode(*args, **kwargs))


class LinearEXRExport(_nodes.LinearEXRExport):
    pass  # returns a filepath string — no conversion needed


class HDRUpscaleWithModel(_nodes.HDRUpscaleWithModel):
    def upscale(self, *args, **kwargs):
        return _wrap_outputs(super().upscale(*args, **kwargs))


NODE_CLASS_MAPPINGS = {
    "HDRVAEDecode": HDRVAEDecode,
    "LinearEXRExport": LinearEXRExport,
    "HDRUpscaleWithModel": HDRUpscaleWithModel,
}

NODE_DISPLAY_NAME_MAPPINGS = {
    "HDRVAEDecode": "HDR VAE Decode",
    "LinearEXRExport": "Linear EXR Export",
    "HDRUpscaleWithModel": "HDR Upscale with Model",
}

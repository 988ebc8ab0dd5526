"""hdrvae — TPU-native HDR VAE decode framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of the
`netocg/vae-decode-hdr` ComfyUI node pack: Flux.1 VAE decoding with HDR
recovery, overlap-tiled + mesh-sharded execution, ESRGAN-family HDR
upscaling, and linear EXR/HDR export (native C++ codec).

Node registry mirrors the reference's plugin bootstrap (`__init__.py:14-69`
incl. the DummyNode fallback so a host can always import the mappings).
"""

__version__ = "0.1.0"

try:
    from hdrvae.api.nodes import (HDRUpscaleWithModel, HDRVAEDecode,
                                  LinearEXRExport, PreviewImage, VAEDecode)
    _NODES_AVAILABLE = True
except Exception as _e:  # pragma: no cover - import-robustness fallback
    import logging
    logging.getLogger(__name__).error("failed to import HDR nodes: %s", _e)

    class DummyNode:  # noqa: D401 - matches reference stub contract
        @classmethod
        def INPUT_TYPES(cls):
            return {"required": {}}

        RETURN_TYPES = ("IMAGE",)
        FUNCTION = "dummy"
        CATEGORY = "latent"

        def dummy(self):
            return (None,)

    HDRVAEDecode = DummyNode
    LinearEXRExport = DummyNode
    HDRUpscaleWithModel = DummyNode
    VAEDecode = DummyNode
    PreviewImage = DummyNode
    _NODES_AVAILABLE = False

# The plugin contract: exactly the three HDR nodes, as in the reference
# pack's registry (`__init__.py:43-53`).  Host-framework builtins the
# reference's shipped workflows assume (VAEDecode, PreviewImage) live in a
# separate mapping so loading this pack into a real ComfyUI never shadows
# the host's own implementations; the graph executor merges both.
NODE_CLASS_MAPPINGS = {
    "HDRVAEDecode": HDRVAEDecode,
    "LinearEXRExport": LinearEXRExport,
    "HDRUpscaleWithModel": HDRUpscaleWithModel,
}

BUILTIN_NODE_MAPPINGS = {
    "VAEDecode": VAEDecode,
    "PreviewImage": PreviewImage,
}

NODE_DISPLAY_NAME_MAPPINGS = {
    "HDRVAEDecode": "HDR VAE Decode",
    "LinearEXRExport": "Linear EXR Export",
    "HDRUpscaleWithModel": "HDR Upscale with Model",
}

__all__ = ["NODE_CLASS_MAPPINGS", "BUILTIN_NODE_MAPPINGS",
           "NODE_DISPLAY_NAME_MAPPINGS", "__version__"]

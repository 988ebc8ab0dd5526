"""Node-protocol layer: the three public nodes with INPUT_TYPES contracts
identical to the reference package, so existing graph JSON (e.g.
`workflow_examples/HDR_VAE_DECODE.json`) remains satisfiable.

Contracts mirrored from:
  - HDRVAEDecode        `hdr_vae_decode.py:40-60`
  - LinearEXRExport     `linear_exr_export.py:90-118`
  - HDRUpscaleWithModel `hdr_upscale_with_model.py:58-69`

Tensors cross this boundary as numpy/jax NHWC float arrays (torch tensors
are accepted and converted); returns are numpy so any host framework can
consume them.
"""

from __future__ import annotations

import functools
import logging
from typing import Any, Dict, Optional, Tuple

import numpy as np

from hdrvae.api import folders
from hdrvae.api.vae import VAE
from hdrvae.core.config import (EXR_COMPRESSIONS, HDR_MODES,
                                UPSCALE_METHODS, ExportConfig,
                                HDRDecodeConfig, UpscaleConfig)
from hdrvae.decode.pipeline import decode_summary, hdr_decode
from hdrvae.io.export import export_linear, export_node_return
from hdrvae.models.rrdbnet import load_upscale_model
from hdrvae.upscale.pipeline import hdr_upscale

logger = logging.getLogger(__name__)


def _to_numpy(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().numpy()
    return np.asarray(x)


class HDRVAEDecode:
    """HDR VAE decode node (`hdr_vae_decode.py:23-60`)."""

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "samples": ("LATENT",),
                "vae": ("VAE",),
            },
            "optional": {
                "hdr_mode": (list(HDR_MODES),
                             {"default": "mathematical_recovery",
                              "tooltip":
                              "conservative: Gentle conservative_ev_multiplier "
                              "expansion, safest for general use \n "
                              "exposure: Natural exposure-based HDR for "
                              "compositing workflows \n "
                              "mathematical_recovery: Full mathematical "
                              "recovery, maximum range"}),
                "conservative_ev_multiplier": (
                    "FLOAT", {"default": 1.0, "min": 0.1, "max": 10.0,
                              "step": 0.1,
                              "tooltip": "Expansion multiplier for the "
                                         "conservative mode."}),
            },
        }

    RETURN_TYPES = ("IMAGE",)
    RETURN_NAMES = ("image",)
    FUNCTION = "simple_hdr_decode"
    CATEGORY = "latent"

    @classmethod
    def adapt_widgets(cls, widgets: list) -> Dict[str, Any]:
        """Map a positional widget list to kwargs, including the LEGACY
        4-widget signature shipped in the reference's example workflow
        (`workflow_examples/HDR_VAE_DECODE.json` widgets
        ``['conservative', 50, 1, False]`` = the old
        (hdr_mode, max_range, scale_factor, enable_negatives) params,
        SURVEY.md section 6 caveat).  scale_factor maps onto today's
        conservative_ev_multiplier; max_range/enable_negatives are gone."""
        if len(widgets) >= 4:
            return {"hdr_mode": widgets[0],
                    "conservative_ev_multiplier": float(widgets[2])}
        names = ("hdr_mode", "conservative_ev_multiplier")
        return dict(zip(names, widgets))

    def simple_hdr_decode(self, samples: Dict[str, Any], vae: VAE,
                          hdr_mode: str = "mathematical_recovery",
                          conservative_ev_multiplier: float = 1.0
                          ) -> Tuple[np.ndarray]:
        import jax.numpy as jnp
        latent = jnp.asarray(_to_numpy(samples["samples"]), jnp.float32)
        cfg = HDRDecodeConfig(
            hdr_mode=hdr_mode,
            conservative_ev_multiplier=conservative_ev_multiplier)
        result = hdr_decode(vae.params, latent, vae.config, cfg,
                            vae.precision)
        summary = decode_summary(result)
        logger.info("HDRVAEDecode: %s", summary)
        return (np.asarray(result.image),)


class LinearEXRExport:
    """Linear EXR/HDR export node (`linear_exr_export.py:81-118`)."""

    VERSION_TRACKER: Dict[str, int] = {}  # kept for API parity (unused
    # upstream too, `linear_exr_export.py:88`)

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "hdr_image": ("IMAGE", {"tooltip": "HDR image tensor with "
                                        "values potentially above 1.0"}),
                "filename_prefix": ("STRING", {
                    "default": "comfyUI",
                    "tooltip": "Base filename (without extension)"}),
            },
            "optional": {
                "versioning": ("BOOLEAN", {"default": False, "tooltip":
                               "Incremental versioning save. adding v001, "
                               "v002... to it's file name"}),
                "frame_sequence": ("BOOLEAN", {"default": False, "tooltip":
                                   "Save animation into multiple frames "
                                   "1001, 1002..."}),
                "start_frame": ("INT", {"default": 1001, "min": 0,
                                        "max": 99999999}),
                "frame_pad": ("INT", {"default": 4, "min": 1, "max": 8}),
                "output_path": ("STRING", {"default": "/HDR", "tooltip":
                                "Output path: Empty=default output, "
                                "/subfolder=output/subfolder, or full "
                                "custom path"}),
                "format": (["exr", "hdr"], {"default": "exr",
                                            "tooltip": "file format"}),
                "bit_depth": (["16bit", "32bit"], {
                    "default": "16bit",
                    "tooltip": "EXR precision: 32bit = maximum quality, "
                               "16bit = smaller files"}),
                "compression": (list(EXR_COMPRESSIONS), {
                    "default": "zip", "tooltip": "EXR compression type"}),
                "save_workflow": ("BOOLEAN", {
                    "default": False,
                    "tooltip": "Saves the workflow JSON to a sidecar file "
                               "next to the HDR image"}),
            },
            "hidden": {
                "prompt": "PROMPT",
                "extra_pnginfo": "EXTRA_PNGINFO",
            },
        }

    RETURN_TYPES = ("STRING",)
    RETURN_NAMES = ("filepath",)
    FUNCTION = "export_linear_exr"
    CATEGORY = "image"
    OUTPUT_NODE = True

    @classmethod
    def adapt_widgets(cls, widgets: list) -> Dict[str, Any]:
        """Positional widgets -> kwargs.  The reference's example workflow
        carries the LEGACY 6-widget signature
        ``['image', '/Test', 1, 'exr', '32bit', 'zip']`` =
        (filename_prefix, output_path, versioning, format, bit_depth,
        compression) — detected by the string in slot 1 (today slot 1 is
        the boolean ``versioning``)."""
        if len(widgets) >= 6 and isinstance(widgets[1], str):
            return {"filename_prefix": widgets[0],
                    "output_path": widgets[1],
                    "versioning": bool(widgets[2]),
                    "format": widgets[3],
                    "bit_depth": widgets[4],
                    "compression": widgets[5]}
        names = ("filename_prefix", "versioning", "frame_sequence",
                 "start_frame", "frame_pad", "output_path", "format",
                 "bit_depth", "compression", "save_workflow")
        return dict(zip(names, widgets))

    def export_linear_exr(self, hdr_image, filename_prefix: str = "comfyUI",
                          output_path: str = "/HDR", start_frame: int = 1001,
                          frame_pad: int = 4, versioning: bool = False,
                          frame_sequence: bool = False, format: str = "exr",
                          bit_depth: str = "16bit", compression: str = "zip",
                          save_workflow: bool = False,
                          prompt: Optional[dict] = None,
                          extra_pnginfo: Optional[dict] = None
                          ) -> Tuple[str]:
        cfg = ExportConfig(filename_prefix=filename_prefix,
                           versioning=versioning,
                           frame_sequence=frame_sequence,
                           start_frame=start_frame, frame_pad=frame_pad,
                           output_path=output_path, format=format,
                           bit_depth=bit_depth, compression=compression,
                           save_workflow=save_workflow)
        image = _to_numpy(hdr_image)
        pbar = None
        if image.ndim == 4 and image.shape[0] > 1:
            # per-frame progress, like the reference's ProgressBar
            # (`linear_exr_export.py:313-319`)
            from hdrvae.utils.progress import ProgressBar
            pbar = ProgressBar(image.shape[0], desc="export ")
        result = export_linear(
            image, cfg,
            default_output_dir=folders.get_output_directory(),
            prompt=prompt, extra_pnginfo=extra_pnginfo, pbar=pbar)
        return export_node_return(result)


@functools.lru_cache(maxsize=1)
def _standard_decode():
    """Jitted bare decoder forward (one compiled program per
    (cfg, precision, shape) — jax.jit's own cache keys the static args);
    going eager here would dispatch hundreds of conv/GN/attention ops
    per decode and forgo XLA fusion on the host-facing comparison node."""
    import jax

    from hdrvae.models.decoder import decoder_apply
    return jax.jit(decoder_apply, static_argnames=("cfg", "precision"))


class VAEDecode:
    """Standard (clamping) VAE decode — the host-framework builtin the
    reference workflow wires NEXT TO HDRVAEDecode for comparison
    (`workflow_examples/HDR_VAE_DECODE.json` node 10).  Provided so the
    reference's graphs run here without a host framework; this is the
    decode whose [0, 1] clamp destroys HDR (`README.md:41-60`)."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"samples": ("LATENT",), "vae": ("VAE",)}}

    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "decode"
    CATEGORY = "latent"

    def decode(self, samples: Dict[str, Any], vae: VAE
               ) -> Tuple[np.ndarray]:
        # standard decode only — run the bare decoder forward rather
        # than the full hdr_decode pipeline (whose recovery maps, mode
        # math, and stats would all be computed just to be discarded,
        # keeping a second full-res float32 buffer live)
        import jax.numpy as jnp

        latent = jnp.asarray(_to_numpy(samples["samples"]), jnp.float32)
        zc = vae.config.z_channels
        if latent.ndim == 4 and latent.shape[-1] != zc \
                and latent.shape[1] == zc:
            latent = jnp.transpose(latent, (0, 2, 3, 1))   # NCHW -> NHWC
        out = _standard_decode()(vae.params, latent, cfg=vae.config,
                                 precision=vae.precision)
        return (np.asarray(out.rgb, dtype=np.float32),)


class PreviewImage:
    """UI-less stand-in for the host framework's preview node: logs the
    image's HDR health stats (the reference's manual test oracle,
    `README.md:332`) and produces no outputs."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"images": ("IMAGE",)}}

    RETURN_TYPES = ()
    FUNCTION = "preview"
    CATEGORY = "image"
    OUTPUT_NODE = True

    def preview(self, images) -> Tuple:
        img = _to_numpy(images)
        logger.info("PreviewImage: shape=%s range=[%.4f, %.4f] "
                    "hdr_pixels=%d", img.shape, img.min(), img.max(),
                    int((img > 1.0).sum()))
        return ()


class HDRUpscaleWithModel:
    """HDR upscale node (`hdr_upscale_with_model.py:50-69`)."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "image": ("IMAGE",),
            "model_name": (folders.get_filename_list("upscale_models"),),
            "small_blur": ("BOOLEAN", {
                "default": False,
                "tooltip": "Apply small blur to avoid hot-pixels."}),
            "local_fix": ("BOOLEAN", {
                "default": False,
                "tooltip": "Apply local masking to suppress extreme "
                           "hotspots in dark areas."}),
            "upscale_method": (list(UPSCALE_METHODS), {
                "default": "bislerp",
                "tooltip": "method used by the local_fix"}),
        }}

    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "upscale"
    CATEGORY = "HDR/Upscale"

    # Loaded-checkpoint cache: the reference reloads the model from disk on
    # every node invocation (`hdr_upscale_with_model.py:149`); repeated
    # graph executions here reuse the converted pytree.
    _MODEL_CACHE: Dict[str, tuple] = {}

    def upscale(self, image, model_name: str, small_blur: bool,
                local_fix: bool, upscale_method: str) -> Tuple[np.ndarray]:
        import jax.numpy as jnp
        path = folders.get_full_path("upscale_models", model_name)
        cached = self._MODEL_CACHE.get(path)
        if cached is None:
            cached = load_upscale_model(path)
            self._MODEL_CACHE.clear()  # hold at most one model
            self._MODEL_CACHE[path] = cached
        params, model_cfg, arch = cached
        img = jnp.asarray(_to_numpy(image), jnp.float32)
        if img.ndim == 3:
            img = img[None]
        cfg = UpscaleConfig(small_blur=small_blur, local_fix=local_fix,
                            upscale_method=upscale_method)
        # per-tile progress across both passes, like the reference's
        # ProgressBar (`hdr_upscale_with_model.py:122-125`)
        from hdrvae.upscale.pipeline import upscale_progress_total
        from hdrvae.utils.progress import ProgressBar
        pbar = ProgressBar(upscale_progress_total(img, model_cfg, cfg),
                           desc="upscale ")
        result = hdr_upscale(params, img, model_cfg, cfg,
                             architecture=arch, pbar=pbar)
        return (np.asarray(result.image),)

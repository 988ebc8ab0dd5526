"""VAE handle — the framework's replacement for the host-framework VAE
object the reference instruments (`hdr_vae_decode.py:62-67` takes a ComfyUI
``vae``; SURVEY.md L0 row).

A handle owns the decoder params + config and exposes ``decode`` /
``decode_with_features``; node-layer code and user code share it.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from hdrvae.core.config import DecoderConfig, Precision
from hdrvae.models.decoder import DecodeOutput, decoder_apply, init_decoder
from hdrvae.models.params import load_decoder


@dataclasses.dataclass
class VAE:
    """Decoder weights + topology, loadable from Flux.1 ae.safetensors."""

    params: Dict[str, Any]
    config: DecoderConfig = DecoderConfig()
    precision: Precision = Precision()

    @classmethod
    def load(cls, path: str, config: DecoderConfig | None = None,
             precision: Precision = Precision()) -> "VAE":
        """Load from a safetensors checkpoint.

        ``config=None`` infers the topology from the checkpoint shapes —
        Flux.1 (z=16), SD1.5 (z=4), SDXL (z=4; pass an explicit config to
        override the latent scale 0.18215 -> 0.13025) all load directly,
        matching the reference's any-ComfyUI-VAE contract
        (`hdr_vae_decode.py:62-67`).
        """
        from hdrvae.models.params import (infer_decoder_config,
                                          load_safetensors)
        sd = load_safetensors(path)
        if config is None:
            config = infer_decoder_config(sd)
        from hdrvae.models.params import decoder_params_from_state_dict
        return cls(params=decoder_params_from_state_dict(sd, config),
                   config=config, precision=precision)

    @classmethod
    def random_init(cls, seed: int = 0,
                    config: DecoderConfig = DecoderConfig(),
                    precision: Precision = Precision()) -> "VAE":
        """Random weights — fixtures and cold-start testing.

        Initialization runs on CPU: it is hundreds of small ops, and on a
        remote accelerator each would pay a dispatch round trip; the pytree
        moves to the accelerator on first jitted use.
        """
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            params = init_decoder(jax.random.PRNGKey(seed), config)
        # Re-home to the default accelerator: CPU-created arrays are
        # COMMITTED to CPU and would silently drag every downstream jit
        # onto the CPU backend.
        params = jax.device_put(params, jax.devices()[0])
        return cls(params=params, config=config, precision=precision)

    def decode(self, latent: jnp.ndarray, *,
               apply_conv_out: bool = True) -> DecodeOutput:
        return decoder_apply(self.params, latent, self.config,
                             precision=self.precision,
                             apply_conv_out=apply_conv_out)

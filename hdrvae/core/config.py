"""Configuration dataclasses for the hdrvae framework.

These mirror the public API contracts of the reference node pack
(`/root/reference/hdr_vae_decode.py:41-55`, `linear_exr_export.py:91-112`,
`hdr_upscale_with_model.py:59-66`) while replacing the reference's ad-hoc
device/timeout/OOM machinery with static, trace-time configuration
(SURVEY.md section 5: "Fallback tiers become explicit config").
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Model architecture
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Flux.1 AutoencoderKL decoder topology.

    The reference never defines the decoder but hardcodes its structure
    (SURVEY.md section 2.6; `hdr_vae_decode.py:505,509-517,775-803,814`):
    conv_in -> mid(block_1, attn_1, block_2) -> 4 up stages -> GroupNorm(128)
    -> SiLU -> conv_out(128->3).  Here it is owned explicitly.
    """

    z_channels: int = 16           # Flux.1 latent channels
    ch: int = 128                  # base width
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2        # decoder uses num_res_blocks + 1 per level
    out_channels: int = 3
    attn_mid: bool = True          # mid-block spatial self-attention
    num_groups: int = 32           # GroupNorm groups
    dropout: float = 0.0

    # Latent pre-scaling applied before the decoder (diffusers semantics:
    # z / scale_factor + shift_factor).  Flux.1 constants.
    scale_factor: float = 0.3611
    shift_factor: float = 0.1159

    # Output mapping from decoder range [-1, 1] to image range [0, 1]
    # (the host framework's process_output: clamp((x+1)/2, 0, 1)).  The
    # clamp is what makes the reference's analysis see post range exactly
    # [0, 1] and classify the transform as SIGMOID — which in turn selects
    # the logit recovery path.  Disable output_clamp only for raw studies.
    output_scale: float = 0.5
    output_shift: float = 0.5
    output_clamp: bool = True

    @property
    def num_levels(self) -> int:
        return len(self.ch_mult)

    @property
    def block_in(self) -> int:
        """Channel width at the mid block (and the start of up stages)."""
        return self.ch * self.ch_mult[-1]

    @property
    def pre_conv_out_channels(self) -> int:
        """Width of the pre-conv_out feature map (128 for Flux.1)."""
        return self.ch * self.ch_mult[0]

    @property
    def spatial_scale(self) -> int:
        """Latent -> pixel spatial upsampling factor (8 for Flux.1)."""
        return 2 ** (self.num_levels - 1)

    def with_small(self) -> "DecoderConfig":
        """A tiny config for tests (fast on 1 CPU core)."""
        return dataclasses.replace(
            self, z_channels=4, ch=16, ch_mult=(1, 2), num_res_blocks=1,
            num_groups=4,
        )


FLUX_DECODER = DecoderConfig()


# ---------------------------------------------------------------------------
# HDR decode pipeline
# ---------------------------------------------------------------------------

HDR_MODES = ("conservative", "exposure", "adaptive_recovery",
             "mathematical_recovery")

# Aliases kept for old-graph compatibility (SURVEY.md section 6 caveat:
# README/example workflows reference "moderate"/"aggressive" modes from an
# older node version).
HDR_MODE_ALIASES = {
    "moderate": "conservative",
    "aggressive": "mathematical_recovery",
}


@dataclasses.dataclass(frozen=True)
class HDRDecodeConfig:
    """Parameters of the HDR decode pipeline.

    Mirrors `HDRVAEDecode.INPUT_TYPES` (`hdr_vae_decode.py:41-55`): modes and
    the single `conservative_ev_multiplier` float.  Adds explicit knobs that
    the reference hides in constants.
    """

    hdr_mode: str = "mathematical_recovery"
    conservative_ev_multiplier: float = 1.0

    # Inner expansion factor of the conservative mode.  The reference node
    # path never forwards the user multiplier into intelligent_hdr_decode
    # (`hdr_vae_decode.py:97` passes 4 args; the 5th defaults to 1.0 at
    # `:1009`), so smart_hdr_expansion always runs with factor 1.0 and the
    # user's conservative_ev_multiplier only scales the FINAL image
    # (`:180-182`).  Verified against the actual reference code in
    # tests/test_reference_fidelity.py.
    conservative_expansion_factor: float = 1.0

    # Channel collapse used for the fallback (bypass) tier image.
    # "maxpool" = the HDR-preserving 42/42/42 MAX collapse (what the
    # reference's `_format_tensor` applies to a 128-channel bypass output,
    # `hdr_vae_decode.py:226-255`); "first3" = take the first 3 channels
    # (what `simple_bypass_decode`'s eye(3,C) projection does,
    # `hdr_vae_decode.py:1324-1329`).  The intelligent path's recovery map
    # always uses maxpool (`:1042-1053`) regardless of this knob.
    fallback_collapse: str = "maxpool"

    # Acceptance threshold for the intelligent decode result
    # (`hdr_vae_decode.py:106`: hdr_pixels > 0 or max > 1.1).
    accept_max_threshold: float = 1.1

    # Full analysis record: also report conv_out re-applied alone
    # (`hdr_vae_decode.py:877-881` "conv_only_result") and the conv_out
    # weight/bias statistics the reference logs (`:900-910`).  Costs one
    # extra 128->3 conv over the pre map; whole-image path only (the
    # tiled/sharded executors report the param-derived weight/bias stats
    # but skip conv_only — per-tile logging analog).
    full_analysis: bool = False

    # HDR-data gate on the pre-conv_out map (`hdr_vae_decode.py:1076-1078`).
    hdr_tol: float = 1e-3

    # Inverse-activation epsilons (`hdr_vae_decode.py:931,938`).
    sigmoid_eps: float = 1e-7
    tanh_eps: float = 1e-6

    # log2 clamp floor for EV maps (`hdr_vae_decode.py:996,1145,1151`).
    ev_floor: float = 0.001

    # Exposure mode max stops (`hdr_vae_decode.py:982` default).
    max_stops: float = 20.0

    # Use the experimental fused Pallas collapse+stats kernel in the
    # epilogue (measured slower than XLA's fused reductions on v5e; see
    # kernels/epilogue.py).  A static jit argument — unlike an env var read
    # at trace time, toggling it recompiles instead of being silently
    # ignored by the jit cache.
    use_fused_epilogue: bool = False

    # Return the plain (standard) decode next to the HDR image.  The node
    # contract needs it (builtin VAEDecode parity) but it forces a second
    # full-resolution float32 output buffer to stay live through the
    # epilogue — at 4096^2 that is ~200 MB of HBM; large-image callers that
    # only want the HDR image can drop it (HDRDecodeResult.standard is then
    # None).
    keep_standard: bool = True

    def canonical_mode(self) -> str:
        mode = HDR_MODE_ALIASES.get(self.hdr_mode, self.hdr_mode)
        if mode not in HDR_MODES:
            raise ValueError(
                f"unknown hdr_mode {self.hdr_mode!r}; expected one of "
                f"{HDR_MODES} (or aliases {tuple(HDR_MODE_ALIASES)})")
        return mode


# ---------------------------------------------------------------------------
# Precision policy
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Precision:
    """Numerics policy.

    The reference contract is float32 end-to-end (`README.md:39,263`).  On
    TPU we keep parameters and accumulation in float32 and optionally run
    matmuls/convs in bfloat16 for throughput; `parity` pins everything to
    float32 with HIGHEST matmul precision for <=1e-3 reproducibility
    (SURVEY.md section 7 "Hard parts").
    """

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    # Inter-layer activation storage: bf16 in fast mode halves HBM traffic
    # (reductions/accumulation stay float32 either way).
    storage_dtype: jnp.dtype = jnp.float32
    # "fast" uses bf16 compute for conv/matmul; "parity" forces f32/HIGHEST;
    # "mixed" keeps f32 activations but runs MXU contractions at HIGH
    # (3-pass bf16x3) precision — the fidelity-at-speed tier (see mixed()).
    mode: str = "parity"
    # Number of decoder up levels (counting from the full-resolution level
    # 0) at/above which the HEAD runs in full fast mode (bf16 compute +
    # storage) while the tail keeps this object's dtypes/precision.  Only
    # meaningful for mode="mixed"; 0 = the whole decoder runs mixed.
    # Example: fast_head_levels=2 runs conv_in + mid + up levels 3 and 2
    # (the low-resolution half) in bf16 and levels 1, 0 + norm_out +
    # conv_out in f32/HIGH.
    fast_head_levels: int = 0
    # Conv-path executor: "auto" runs the decoder's mid + up path as
    # fused Pallas kernels (models.pallas_tail) on TPU in fast mode
    # (batch 1, whole-image; measured 1.15-1.2x the XLA layers, see
    # PERF_NOTES.md section 3), falling back to the XLA layers
    # otherwise; "xla" forces the XLA path; "pallas" asserts the kernel
    # path is used.
    upstack: str = "auto"
    # Window-attention executor for SwinIR-family upscalers: "auto" runs
    # the fused Pallas kernel (kernels.swin_attention) on TPU in fast
    # mode, the XLA einsum path otherwise; "xla" forces the einsum path;
    # "pallas" asserts the kernel path is used.  Measured on 1x v5e
    # (SwinIR-M x4, 512^2 tile, fast mode): 480 ms vs 586 ms XLA
    # (1.22x) — the kernel keeps scores in VMEM and drops the qkv/out
    # head transposes; window partition/merge/roll copies remain XLA.
    swin_attn: str = "auto"

    @classmethod
    def fast(cls) -> "Precision":
        return cls(compute_dtype=jnp.bfloat16, storage_dtype=jnp.bfloat16,
                   mode="fast")

    @classmethod
    def parity(cls) -> "Precision":
        return cls(mode="parity")

    @classmethod
    def mixed(cls, fast_head_levels: int = 0) -> "Precision":
        """The fidelity-at-speed tier (BASELINE.md couples ">=5x MP/s" with
        "max-abs <=1e-3 vs the reference EXR"; fast mode meets the first,
        parity the second — this tier meets BOTH with one configuration).

        Float32 activations end to end with MXU contractions at
        ``jax.lax.Precision.HIGH`` (3-pass bfloat16x3: each f32 operand is
        split hi+lo in bf16 and the cross terms accumulated in f32 — ~1e-6
        relative per dot, vs ~2e-3 for 1-pass DEFAULT and exact 6-pass
        HIGHEST).  ``fast_head_levels`` optionally runs the low-resolution
        head in full fast mode (see the field docstring); the measured
        error/speed trade-off per setting is in PERF_NOTES.md section 6.
        """
        return cls(mode="mixed", fast_head_levels=fast_head_levels)

    def head_precision(self) -> "Precision":
        """The Precision used for decoder levels >= fast_head_levels
        (identity unless mode="mixed" with fast_head_levels > 0)."""
        if self.mode != "mixed" or self.fast_head_levels <= 0:
            return self
        return dataclasses.replace(
            self, compute_dtype=jnp.bfloat16, storage_dtype=jnp.bfloat16,
            mode="fast", fast_head_levels=0)

    def for_level(self, level: int) -> "Precision":
        """Per-up-level Precision: fast for levels >= fast_head_levels."""
        if (self.mode == "mixed" and self.fast_head_levels > 0
                and level >= self.fast_head_levels):
            return self.head_precision()
        return self


# ---------------------------------------------------------------------------
# Tiling / sharding
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TilingConfig:
    """Static overlap-tile plan (replaces the OOM-retry loop at
    `hdr_upscale_with_model.py:120-145` with trace-time selection)."""

    tile: int = 512        # tile edge in INPUT pixel space (ComfyUI
    overlap: int = 64      # tile_x/tile_y semantics); overlap likewise.
                           # Only the blend feather width is output-space
                           # (overlap * scale, computed by the stitcher).
    min_tile: int = 128    # reference floor (`hdr_upscale_with_model.py:140`)
    # HBM budget used by the planner to pick a tile size (bytes).  None means
    # "use the configured tile size as-is".
    hbm_budget_bytes: Optional[int] = None
    # Seam strategy (tiling.tiled module docstring).  "comfy" replicates
    # ComfyUI tiled_scale's grid + blend exactly (the reference node's
    # observable behavior, validated in tests/test_reference_fidelity.py);
    # "feather" is the uniform-grid variant (single compiled tile shape);
    # "crop" is exact halo-crop for receptive fields <= overlap.
    seam_mode: str = "comfy"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for sharded decode (SURVEY.md section 5:
    batch + tile-grid sharding over ICI on a v5e-4)."""

    axis_name: str = "tiles"
    num_devices: Optional[int] = None  # None = all available


# ---------------------------------------------------------------------------
# Export
# ---------------------------------------------------------------------------

EXR_COMPRESSIONS = ("none", "rle", "zip", "piz", "pxr24")
EXPORT_FORMATS = ("exr", "hdr")
BIT_DEPTHS = ("16bit", "32bit")


@dataclasses.dataclass(frozen=True)
class ExportConfig:
    """Mirrors `LinearEXRExport.INPUT_TYPES` (`linear_exr_export.py:91-112`)."""

    filename_prefix: str = "comfyUI"
    versioning: bool = False
    frame_sequence: bool = False
    start_frame: int = 1001
    frame_pad: int = 4
    output_path: str = "/HDR"
    format: str = "exr"
    bit_depth: str = "16bit"
    compression: str = "zip"
    save_workflow: bool = False


# ---------------------------------------------------------------------------
# Upscale
# ---------------------------------------------------------------------------

UPSCALE_METHODS = ("nearest-exact", "bilinear", "area", "bicubic", "bislerp")


@dataclasses.dataclass(frozen=True)
class UpscaleConfig:
    """Mirrors `HDRUpscaleWithModel.INPUT_TYPES`
    (`hdr_upscale_with_model.py:59-66`)."""

    small_blur: bool = False
    local_fix: bool = False
    upscale_method: str = "bislerp"
    # Two-pass color-stability clamp range (`hdr_upscale_with_model.py:183-184`).
    color_stable_min: float = -1.0
    color_stable_max: float = 1.0
    # Luma stabilization ceiling (`hdr_upscale_with_model.py:202`).
    luma_max: float = 8.0
    # local_fix dark-area threshold (`hdr_upscale_with_model.py:245`).
    local_fix_threshold: float = 0.1
    tiling: TilingConfig = dataclasses.field(default_factory=TilingConfig)

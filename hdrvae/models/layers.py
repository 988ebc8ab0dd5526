"""Primitive NN layers as pure functions over param pytrees (NHWC).

TPU-first conventions:
  - NHWC activations (channels on the 128-wide lane dimension),
  - HWIO conv kernels,
  - float32 accumulation/statistics with optional bfloat16 compute AND
    bfloat16 inter-layer storage (halves HBM traffic; the usual TPU
    bottleneck — SURVEY.md north-star HBM notes) via Precision,
  - no Python-level control flow on traced values.

Param pytrees are plain nested dicts so they serialize to/from safetensors
and shard trivially with jax.sharding.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from hdrvae.core.config import Precision

Params = Dict[str, jnp.ndarray]

_DIMS = ("NHWC", "HWIO", "NHWC")


def _conv_precision(precision: Precision):
    if precision.mode == "parity":
        return jax.lax.Precision.HIGHEST
    if precision.mode == "mixed":
        # 3-pass bf16x3: ~1e-6 relative per contraction at ~3x the 1-pass
        # MXU cost — the fidelity-at-speed tier (Precision.mixed()).
        return jax.lax.Precision.HIGH
    return jax.lax.Precision.DEFAULT


def _stats_precision(precision: Precision):
    """MXU precision for GroupNorm STATISTICS contractions.

    Parity keeps HIGHEST (the bit-level f32 contract).  The mixed tier
    uses DEFAULT here, unlike its HIGH conv/matmul dots: the stats
    einsums contract the activation map against an EXACT 0/1 one-hot, so
    the only rounding is of the activations themselves — zero-mean RTNE
    noise that averages out over the n >= 1e5 elements behind each
    (batch, group) moment.  Measured on chip at 1024^2 (PERF_NOTES.md
    section 6): DEFAULT stats change mixed's rgb max-abs by <1e-5 while
    removing ~1/3 of the tier's runtime — the HIGH stats passes re-read
    every feature map 3x for accuracy the averaging already provides.
    """
    if precision.mode == "parity":
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def conv2d(x: jnp.ndarray, p: Params, *, stride: int = 1, padding: str = "SAME",
           precision: Precision = Precision()) -> jnp.ndarray:
    """2D convolution; p = {'kernel': HWIO, 'bias': [O]}.

    bf16 MXU inputs with float32 accumulation in fast mode; the bias add and
    the storage-dtype cast fuse into the conv epilogue.
    """
    kernel = p["kernel"]
    dtype = precision.compute_dtype
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype),
        window_strides=(stride, stride), padding=padding,
        dimension_numbers=_DIMS,
        precision=_conv_precision(precision),
        preferred_element_type=jnp.float32,
    )
    y = y + p["bias"].astype(jnp.float32)
    return y.astype(precision.storage_dtype)


class GNTape:
    """Records or replays GroupNorm statistics across a decoder forward.

    GroupNorm's whole-image statistics are the main tiled-decode fidelity
    risk (SURVEY.md section 7, "Hard parts"): per-tile stats differ from
    global stats.  A tape collected from a whole-image (or downsampled)
    decode can be injected into per-tile decodes so every tile normalizes
    with the same statistics — making halo-crop tiling near-exact.

    Entries are (mean, var) pairs of shape [B, G] in decoder GN-call order
    (static under jit, so the tape is an ordinary pytree input).
    """

    def __init__(self, mode: str = "off", stats=None):
        assert mode in ("off", "collect", "inject")
        self.mode = mode
        self.stats = list(stats) if stats is not None else []
        self._idx = 0

    def record(self, mean: jnp.ndarray, var: jnp.ndarray):
        if self.mode == "collect":
            self.stats.append((mean, var))

    def next_override(self):
        if self.mode != "inject":
            return None
        entry = self.stats[self._idx]
        self._idx += 1
        return entry


class PadMask:
    """Makes a zero-padded (shape-bucketed) decode EXACT: the pad region is
    excluded from GroupNorm statistics and re-zeroed after every layer that
    could write into it, so every conv sees the same implicit zeros at the
    valid boundary that SAME padding gives the unpadded decode, and nothing
    from the pad region ever bleeds into valid pixels.

    Duck-typed GN "tape" (``reduce_stats`` hook in :func:`_gn_affine`,
    ``mask_output`` consumed by the norm/resnet layers, ``key_valid`` by the
    attention block).  ``base_h/w`` are the PADDED dims at the tape's entry
    resolution (the latent for ``decoder_apply``) and must be static;
    ``valid_h/w`` (the real dims) may be python ints OR traced scalars —
    they are only ever compared against iotas and used as divisors, which
    is what lets one compiled program serve every original resolution in
    a bucket (decode.pipeline._decoder_forward_bucketed).
    """

    def __init__(self, base_h: int, base_w: int, valid_h: int,
                 valid_w: int):
        self.base_h, self.base_w = base_h, base_w
        self.valid_h, self.valid_w = valid_h, valid_w

    def _f(self, w: int) -> int:
        assert w % self.base_w == 0, (w, self.base_w)
        return w // self.base_w

    def _mask2d(self, h: int, w: int) -> jnp.ndarray:
        f = self._f(w)
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        return (rows < self.valid_h * f) & (cols < self.valid_w * f)

    def mask_output(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        return x * self._mask2d(h, w)[None, :, :, None].astype(x.dtype)

    def key_valid(self, x: jnp.ndarray) -> jnp.ndarray:
        """[H, W] bool validity map for attention keys at x's resolution."""
        return self._mask2d(x.shape[1], x.shape[2])

    def reduce_stats(self, xf: jnp.ndarray, onehot: jnp.ndarray, cpg: int,
                     precision: Precision):
        b, h, w, c = xf.shape
        f = self._f(w)
        mask = self._mask2d(h, w)[None, :, :, None].astype(jnp.float32)
        n_valid = (self.valid_h * f) * (self.valid_w * f) * cpg
        xm = xf * mask
        mp = _stats_precision(precision)
        mean = jnp.einsum("bhwc,cg->bg", xm, onehot, precision=mp) / n_valid
        if precision.mode == "parity":
            grp = jnp.arange(c) // cpg
            centered = (xf - mean[:, grp][:, None, None, :]) * mask
            var = jnp.einsum("bhwc,cg->bg", jnp.square(centered),
                             onehot, precision=mp) / n_valid
        else:
            sq = jnp.einsum("bhwc,cg->bg", jnp.square(xm), onehot,
                            precision=mp) / n_valid
            var = jnp.maximum(sq - jnp.square(mean), 0.0)
        return mean, var


def _group_onehot(c: int, g: int) -> jnp.ndarray:
    """[C, G] channel->group indicator (a tiny MXU contraction target)."""
    grp = jnp.arange(c) // (c // g)
    return jnp.zeros((c, g), jnp.float32).at[jnp.arange(c), grp].set(1.0)


def _gn_affine(x: jnp.ndarray, p: Params, num_groups: int, eps: float,
               tape: "GNTape | None", precision: Precision):
    """Lane-friendly GroupNorm core: per-(B, G) stats via a [C, G] one-hot
    contraction (no 5-D reshape — profiling showed the reshape/copy ops
    around the reshaped layout cost ~16% of decode time), normalization
    folded into a per-channel affine.

    Variance: fast mode uses the one-pass E[x^2]-mean^2 identity (one read
    of x; its cancellation error is far below bf16 storage noise for
    activation-scale data), parity mode the stable two-pass form.

    Returns (xf32, gamma [B, C], beta [B, C]).
    """
    b, h, w, c = x.shape
    g = num_groups
    cpg = c // g
    xf = x.astype(jnp.float32)
    onehot = _group_onehot(c, g)
    n = h * w * cpg

    reducer = tape if hasattr(tape, "reduce_stats") else None
    override = (tape.next_override()
                if tape is not None and reducer is None else None)
    if reducer is not None:
        # A cross-shard statistics reducer (duck-typed; see
        # sharding.mesh.SlabGNReducer): per-shard masked partial sums
        # psum-reduced over the mesh == exact whole-image GN statistics.
        mean, var = reducer.reduce_stats(xf, onehot, cpg, precision)
    elif override is not None:
        mean = override[0].astype(jnp.float32)   # [B, G]
        var = override[1].astype(jnp.float32)
    else:
        # statistics einsums honor parity's HIGHEST (the rounding enters
        # every activation through gamma/beta); mixed/fast use DEFAULT —
        # see _stats_precision for why that is accuracy-free here
        mp = _stats_precision(precision)
        mean = jnp.einsum("bhwc,cg->bg", xf, onehot, precision=mp) / n
        if precision.mode == "parity":
            grp = jnp.arange(c) // cpg
            centered = xf - mean[:, grp][:, None, None, :]
            var = jnp.einsum("bhwc,cg->bg", jnp.square(centered),
                             onehot, precision=mp) / n
        else:
            sq = jnp.einsum("bhwc,cg->bg", jnp.square(xf), onehot,
                            precision=mp) / n
            var = jnp.maximum(sq - jnp.square(mean), 0.0)
        if tape is not None:
            tape.record(mean, var)

    rstd = jax.lax.rsqrt(var + eps)              # [B, G]
    grp = jnp.arange(c) // cpg
    gamma = p["scale"].astype(jnp.float32) * rstd[:, grp]   # [B, C]
    beta = p["bias"].astype(jnp.float32) - mean[:, grp] * gamma
    return xf, gamma, beta


def group_norm(x: jnp.ndarray, p: Params, *, num_groups: int,
               eps: float = 1e-6, precision: Precision = Precision(),
               tape: "GNTape | None" = None) -> jnp.ndarray:
    """GroupNorm over NHWC; p = {'scale': [C], 'bias': [C]}.

    Statistics are float32 over (H, W, C/G); output is cast to the storage
    dtype (bf16 in fast mode) to halve the HBM round trip.
    """
    xf, gamma, beta = _gn_affine(x, p, num_groups, eps, tape,
                                 precision)
    out = xf * gamma[:, None, None, :] + beta[:, None, None, :]
    if tape is not None and hasattr(tape, "mask_output"):
        out = tape.mask_output(out)  # keep the pad region at exact zero
    return out.astype(precision.storage_dtype)


def group_norm_silu(x: jnp.ndarray, p: Params, *, num_groups: int,
                    eps: float = 1e-6, precision: Precision = Precision(),
                    tape: "GNTape | None" = None) -> jnp.ndarray:
    """Fused GroupNorm + SiLU epilogue (XLA fuses the elementwise tail)."""
    xf, gamma, beta = _gn_affine(x, p, num_groups, eps, tape,
                                 precision)
    y = xf * gamma[:, None, None, :] + beta[:, None, None, :]
    y = y * jax.nn.sigmoid(y)
    if tape is not None and hasattr(tape, "mask_output"):
        y = tape.mask_output(y)  # keep the pad region at exact zero
    return y.astype(precision.storage_dtype)


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x spatial upsample, NHWC."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def upsample_conv_2x(x: jnp.ndarray, p: Params, *,
                     precision: Precision = Precision()) -> jnp.ndarray:
    """nearest_upsample_2x followed by a 3x3 SAME conv, computed as four
    2x2 phase convolutions at LOW resolution (subpixel decomposition).

    With X_up[p, q] = X[p//2, q//2], output phase (di, dj) at low-res
    position (i, j) sums kernel taps that collapse onto the same low-res
    pixel, giving an exact 2x2 kernel per phase:
      di=0 rows: {i-1: K[0], i: K[1]+K[2]};  di=1 rows: {i: K[0]+K[1],
      i+1: K[2]}  (same along columns).
    16 low-res taps replace 9 high-res taps over 4x the pixels — 2.25x
    fewer MACs and no 4x-materialized intermediate.  Bit-level: only the
    summation grouping changes (<=1e-6).

    EVALUATED AND NOT USED: measured SLOWER than the plain
    nearest_upsample_2x + conv2d on v5e (121 vs 97 ms decoder at 1024^2) —
    four small 2x2 convs plus the phase interleave lose to XLA's single
    well-tiled 3x3 conv despite the MAC savings.  Kept (with its exactness
    test) as a documented optimization experiment.
    """
    kernel = p["kernel"].astype(jnp.float32)  # [3, 3, Cin, Cout]
    dtype = precision.compute_dtype
    xc = x.astype(dtype)

    # per-phase 2x2 kernels: rows (and cols) combine as
    # phase 0: [K0, K1+K2]  -> taps at offsets (-1, 0)
    # phase 1: [K0+K1, K2]  -> taps at offsets (0, +1)
    row0 = jnp.stack([kernel[0], kernel[1] + kernel[2]], axis=0)  # [2,3,...]
    row1 = jnp.stack([kernel[0] + kernel[1], kernel[2]], axis=0)
    rows = (row0, row1)

    def phase_kernel(di: int, dj: int) -> jnp.ndarray:
        r = rows[di]                                   # [2, 3, Cin, Cout]
        c0 = jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], axis=1)
        c1 = jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], axis=1)
        return (c0, c1)[dj]                            # [2, 2, Cin, Cout]

    # phase (0, *) needs the i-1 row -> pad top; (1, *) needs i+1 -> bottom
    pads = {0: (1, 0), 1: (0, 1)}
    outs = []
    for di in (0, 1):
        row_phases = []
        for dj in (0, 1):
            y = jax.lax.conv_general_dilated(
                xc, phase_kernel(di, dj).astype(dtype),
                window_strides=(1, 1),
                padding=(pads[di], pads[dj]),
                dimension_numbers=_DIMS,
                precision=_conv_precision(precision),
                preferred_element_type=jnp.float32,
            )
            row_phases.append(y)
        outs.append(jnp.stack(row_phases, axis=3))     # [B, H, W, 2, Cout]
    stacked = jnp.stack(outs, axis=2)                  # [B, H, 2, W, 2, C]
    b, h, _, w, _, cout = stacked.shape
    y = stacked.reshape(b, 2 * h, 2 * w, cout)
    y = y + p["bias"].astype(jnp.float32)
    return y.astype(precision.storage_dtype)


# ---------------------------------------------------------------------------
# Initializers (match torch defaults so randomly-initialized fixtures have
# comparable dynamics to real checkpoints)
# ---------------------------------------------------------------------------


def init_conv2d(key: jax.Array, kh: int, kw: int, cin: int, cout: int,
                dtype=jnp.float32) -> Params:
    """torch Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(+-sqrt(1/fan_in))."""
    wkey, bkey = jax.random.split(key)
    fan_in = cin * kh * kw
    bound = float(np.sqrt(1.0 / fan_in))
    kernel = jax.random.uniform(wkey, (kh, kw, cin, cout), dtype, -bound, bound)
    bias = jax.random.uniform(bkey, (cout,), dtype, -bound, bound)
    return {"kernel": kernel, "bias": bias}


def init_group_norm(c: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

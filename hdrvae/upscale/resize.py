"""Image resize methods for the local_fix path (NHWC, pure JAX).

The reference exposes five methods on the upscale node
(`hdr_upscale_with_model.py:65`: nearest-exact, bilinear, area, bicubic,
bislerp) and delegates to ComfyUI's ``common_upscale``.  This module owns
them:

  - nearest-exact / bilinear: torch semantics (align_corners=False,
    half-pixel centers); bicubic: explicit Keys a=-0.75 kernel matching
    torch (jax.image's cubic uses a=-0.5).
  - area: adaptive average pooling.
  - bislerp: bilinear weights applied as a spherical interpolation of
    normalized pixel vectors (ComfyUI's signature method) — magnitudes
    lerped, directions slerped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from hdrvae.core.config import UPSCALE_METHODS


def _resize_jax(x: jnp.ndarray, height: int, width: int,
                method: str) -> jnp.ndarray:
    # antialias=False: torch/ComfyUI F.interpolate semantics (the
    # reference never antialiases); jax.image.resize defaults to True,
    # which diverges on any downscale.
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, height, width, c), method=method,
                            antialias=False)


def bicubic_torch(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bicubic with the torch/ComfyUI kernel (Keys a = -0.75; jax.image's
    'cubic' uses a = -0.5, which diverges near edges — parity matters for
    the local_fix mask threshold)."""
    a = -0.75

    def kernel(t):
        t = jnp.abs(t)
        return jnp.where(
            t <= 1.0, (a + 2.0) * t ** 3 - (a + 3.0) * t ** 2 + 1.0,
            jnp.where(t < 2.0,
                      a * t ** 3 - 5.0 * a * t ** 2 + 8.0 * a * t - 4.0 * a,
                      0.0))

    def axis_weights(n_out, n_in):
        s = (jnp.arange(n_out) + 0.5) * n_in / n_out - 0.5
        base = jnp.floor(s).astype(jnp.int32)
        frac = s - base
        idx = base[:, None] + jnp.arange(-1, 3)[None, :]   # [n_out, 4]
        w = kernel(frac[:, None] - jnp.arange(-1, 3)[None, :])
        idx = jnp.clip(idx, 0, n_in - 1)                   # replicate edges
        return idx, w.astype(x.dtype)

    yi, yw = axis_weights(height, x.shape[1])
    xi, xw = axis_weights(width, x.shape[2])
    # rows: gather [B, n_out, 4, W, C] -> weighted sum
    rows = x[:, yi]                                        # [B,H',4,W,C]
    rows = jnp.einsum("bhkwc,hk->bhwc", rows, yw)
    cols = rows[:, :, xi]                                  # [B,H',W',4,C]
    return jnp.einsum("bhwkc,wk->bhwc", cols, xw)


def nearest_exact(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """torch 'nearest-exact': round(half-pixel source coordinate)."""
    b, h, w, c = x.shape
    ys = jnp.clip(jnp.floor((jnp.arange(height) + 0.5) * h / height),
                  0, h - 1).astype(jnp.int32)
    xs = jnp.clip(jnp.floor((jnp.arange(width) + 0.5) * w / width),
                  0, w - 1).astype(jnp.int32)
    return x[:, ys][:, :, xs]


@functools.lru_cache(maxsize=16)
def _area_weights(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] box-mean matrix for adaptive average pooling
    (torch integer boundaries: floor/ceil of i*n_in/n_out).  The cache
    is bounded: a long-lived server resizing arbitrary user resolutions
    would otherwise accumulate O(n_out*n_in) float32 matrices forever
    (a 3840->2048 axis entry alone is 31 MB)."""
    w = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        s = (i * n_in) // n_out
        e = -((-(i + 1) * n_in) // n_out)        # ceil
        w[i, s:e] = 1.0 / (e - s)
    return w


def area(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Adaptive average pooling (torch F.interpolate mode='area').

    Separable exact box-weight matrices built at trace time (float64
    boundary math in numpy) applied as two MXU contractions.  The
    previous formulation — a float32 double cumsum integral image —
    accumulated ulp error with pixel count: 0.037 absolute error at
    768^2, ~0.1-0.25 at 2-4K, enough to corrupt the local_fix mask."""
    b, h, w, c = x.shape
    if h % height == 0 and w % width == 0:
        fh, fw = h // height, w // width
        return x.reshape(b, height, fh, width, fw, c).mean(axis=(2, 4))
    wy = jnp.asarray(_area_weights(h, height))
    wx = jnp.asarray(_area_weights(w, width))
    rows = jnp.einsum("oh,bhwc->bowc", wy, x.astype(jnp.float32))
    return jnp.einsum("pw,bowc->bopc", wx, rows)


def bislerp(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """ComfyUI's ``bislerp`` (the node's default local_fix method), exact.

    Per output pixel the two horizontal bilinear neighbors are slerped in
    channel space, then the two resulting rows are slerped vertically
    (ComfyUI's width-pass-then-height-pass order; the passes commute with
    the row gather).  Slerp semantics replicated from ComfyUI's published
    algorithm, including its edge cases, validated <=1e-3 against a torch
    transcription in tests/test_reference_fidelity.py:

      - directions slerped (sin((1-r)w)/sin(w), sin(rw)/sin(w) weights),
        magnitudes LINEARLY interpolated;
      - zero-norm vectors contribute a zero direction (no epsilon floor);
      - nearly-parallel neighbors (dot > 1 - 1e-5): the result is a COPY of
        the first neighbor — ratio ignored, magnitude included;
      - nearly-opposite neighbors (dot < 1e-5 - 1): plain lerp of the raw
        vectors.

    Coordinate generation (``generate_bilinear_data``) reduces to torch
    half-pixel source coords clamped to [0, n-1]: c1 = floor(clip(s)),
    r = frac(clip(s)), c2 = min(c1 + 1, n - 1)."""
    b, h, w, c = x.shape
    x = x.astype(jnp.float32)

    def coords(n_out, n_in):
        s = (jnp.arange(n_out) + 0.5) * n_in / n_out - 0.5
        s = jnp.clip(s, 0, n_in - 1)
        lo = jnp.floor(s).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        frac = (s - lo).astype(jnp.float32)
        return lo, hi, frac

    y0, y1, fy = coords(height, h)
    x0, x1, fx = coords(width, w)

    def slerp(a, bb, t):
        # a, bb: [..., C]; t: [...] broadcastable ratio
        t = t[..., None]
        na = jnp.linalg.norm(a, axis=-1, keepdims=True)
        nb = jnp.linalg.norm(bb, axis=-1, keepdims=True)
        ua = jnp.where(na == 0.0, 0.0, a / jnp.where(na == 0.0, 1.0, na))
        ub = jnp.where(nb == 0.0, 0.0, bb / jnp.where(nb == 0.0, 1.0, nb))
        dot = jnp.sum(ua * ub, axis=-1, keepdims=True)
        omega = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
        so = jnp.sin(omega)
        safe_so = jnp.where(so == 0.0, 1.0, so)
        direction = (jnp.sin((1.0 - t) * omega) / safe_so * ua
                     + jnp.sin(t * omega) / safe_so * ub)
        res = direction * (na * (1.0 - t) + nb * t)
        res = jnp.where(dot > 1.0 - 1e-5, a, res)
        res = jnp.where(dot < 1e-5 - 1.0, a * (1.0 - t) + bb * t, res)
        return res

    # gather rows then columns (commutes with the per-row width pass)
    top = x[:, y0]       # [B, H', W, C]
    bot = x[:, y1]
    tl, tr = top[:, :, x0], top[:, :, x1]   # [B, H', W', C]
    bl, br = bot[:, :, x0], bot[:, :, x1]
    fxg = jnp.broadcast_to(fx[None, None, :], tl.shape[:-1])
    fyg = jnp.broadcast_to(fy[None, :, None], tl.shape[:-1])
    t_row = slerp(tl, tr, fxg)
    b_row = slerp(bl, br, fxg)
    return slerp(t_row, b_row, fyg)


def common_upscale(x: jnp.ndarray, width: int, height: int,
                   method: str) -> jnp.ndarray:
    """Resize NHWC ``x`` to (height, width) with one of the node's methods
    (the ComfyUI ``common_upscale`` role at `hdr_upscale_with_model.py:240`)."""
    if method not in UPSCALE_METHODS:
        raise ValueError(f"unknown upscale method {method!r}; expected one "
                         f"of {UPSCALE_METHODS}")
    if x.shape[1] == height and x.shape[2] == width:
        return x
    if method == "nearest-exact":
        return nearest_exact(x, height, width)
    if method == "bilinear":
        return _resize_jax(x, height, width, "bilinear")
    if method == "bicubic":
        return bicubic_torch(x, height, width)
    if method == "area":
        return area(x, height, width)
    return bislerp(x, height, width)

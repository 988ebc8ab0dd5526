"""Tensor formatting + the HDR-preserving MAX-pool channel collapse.

Re-implements the reference's `_format_tensor` (`hdr_vae_decode.py:197-357`)
for an NHWC-native framework.  The signature op is the 128->3 collapse:
channels 0-41 -> R, 42-83 -> G, 84-125 -> B, each reduced with a channel-wise
MAX ("averaging destroys HDR peaks", `hdr_vae_decode.py:226-255`).  Note the
reference drops channels 126-127; replicated exactly for parity.
"""

from __future__ import annotations

import jax.numpy as jnp


def collapse_channels_maxpool(x: jnp.ndarray) -> jnp.ndarray:
    """[..., C] -> [..., 3] HDR-preserving MAX-pool collapse.

    - C == 3: identity.
    - C == 128: the Flux special case (`hdr_vae_decode.py:231-241`):
      R = max(ch 0:42), G = max(ch 42:84), B = max(ch 84:126).
    - C == 1: broadcast to RGB (`hdr_vae_decode.py:348-350`).
    - C == 2: pad with the first channel.
    - otherwise: generic step = C // 3 grouping (`hdr_vae_decode.py:256-271`).
    """
    c = x.shape[-1]
    if c == 3:
        return x
    if c == 1:
        return jnp.concatenate([x, x, x], axis=-1)
    if c == 2:
        return jnp.concatenate([x, x[..., :1]], axis=-1)
    if c == 128:
        bounds = (0, 42, 84, 126)
    else:
        step = c // 3
        bounds = (0, step, 2 * step, 3 * step)
    r = jnp.max(x[..., bounds[0]:bounds[1]], axis=-1)
    g = jnp.max(x[..., bounds[1]:bounds[2]], axis=-1)
    b = jnp.max(x[..., bounds[2]:bounds[3]], axis=-1)
    return jnp.stack([r, g, b], axis=-1)


def _channels_last(shape) -> bool:
    """Layout guess for a 4D tensor where neither the second nor the last
    axis is 3 (the unambiguous cases are handled before this is called).

    The reference's rule (`hdr_vae_decode.py:219`: any 3 < shape[1] < 2000
    is NCHW) misreads every wide NHWC tensor; a plain size comparison
    misreads NCHW maps whose spatial dims exceed the channel count (e.g.
    [B, 128, 512, 512]).  Layered tie-breaks instead:

      1. exactly one axis is 128 -> that axis is channels (the Flux
         pre-conv_out signature width, `hdr_vae_decode.py:227`);
      2. equal spatial pair: [B, C, S, S] -> NCHW, [B, S, S, C] -> NHWC
         (square images are the overwhelmingly common decode shape);
      3. otherwise the SMALLER of the two candidate axes is channels,
         ties resolved NCHW (the reference's default order).
    """
    c_first, c_last = shape[1], shape[-1]
    if (c_first == 128) != (c_last == 128):
        return c_last == 128
    if shape[2] == shape[3] and shape[1] != shape[2]:
        return False                      # [B, C, S, S]
    if shape[1] == shape[2] and shape[2] != shape[3]:
        return True                       # [B, S, S, C]
    return c_last < c_first


def to_nhwc_rgb(x: jnp.ndarray) -> jnp.ndarray:
    """Normalize an arbitrary decode output to [B, H, W, 3] float32.

    Accepts 3D/4D tensors in either NHWC or NCHW per the reference's shape
    heuristics (`hdr_vae_decode.py:203-336`): a trailing dim of 3 means
    NHWC; a second dim of 3 means NCHW.  When NEITHER axis is 3 the layout
    is guessed by :func:`_channels_last` (see its docstring — the
    reference's own shape[1]-first rule misreads wide NHWC tensors), and
    wide channel dims are collapsed with the MAX-pool.
    """
    if x.ndim == 3:
        x = x[None]
    if x.ndim != 4:
        raise ValueError(f"expected 3D/4D image tensor, got shape {x.shape}")

    if x.shape[-1] == 3:
        out = x
    elif x.shape[1] == 3:
        out = jnp.transpose(x, (0, 2, 3, 1))
    elif x.shape[-1] in (1, 2):
        out = collapse_channels_maxpool(x)
    elif not _channels_last(x.shape):
        out = collapse_channels_maxpool(jnp.transpose(x, (0, 2, 3, 1)))
    else:
        out = collapse_channels_maxpool(x)

    # every branch above lands on exactly 3 channels
    # (collapse_channels_maxpool's contract)
    return out.astype(jnp.float32)

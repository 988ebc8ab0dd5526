"""Overlap-tiled execution with seam blending — the scaling substrate.

Re-designs `comfy.utils.tiled_scale` (used by the reference at
`hdr_upscale_with_model.py:110-146`) for XLA: the tile grid is STATIC
(computed from shapes at trace time), every tile runs through one compiled
function, and the OOM-retry loop (`:120-145`) is replaced by trace-time tile
planning from a memory budget (SURVEY.md section 7, inversion #5).

Three seam strategies:
  - ``comfy``: EXACT replication of ComfyUI ``comfy.utils.tiled_scale``'s
    published semantics (the function the reference delegates to at
    `hdr_upscale_with_model.py:127-135`): the tile grid starts every
    ``tile - overlap`` pixels with edge tiles CLAMPED to ``size - overlap``
    and truncated to the image (variable-size edge tiles), every tile is
    weighted by linear ramps of value ``(t+1)/feather`` on all four edges
    (``feather = round(overlap * scale)``), and the accumulated image is
    normalized by the accumulated weight.  Validated <=1e-3 against a torch
    transcription of the algorithm in tests/test_reference_fidelity.py.
  - ``feather``: hdrvae's uniform-grid variant (all tiles the same size, the
    last one shifted to fit) — one compiled tile shape instead of up to
    four, at the cost of exact reference parity in the blend regions.
  - ``crop``: halo-exchange style — each tile is computed with an
    ``overlap``-wide halo and only its interior is pasted.  Exact (seam-free)
    for translation-local functions whose receptive field <= overlap.

The stacked-tile form (``extract_tiles`` -> model -> ``blend_tiles``) is the
unit the mesh shards over ICI: tiles are data-parallel work items
(SURVEY.md section 5, parallelism row).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TilePlan:
    """Static tiling geometry for an (H, W) image."""

    height: int
    width: int
    tile_h: int
    tile_w: int
    overlap: int
    positions: Tuple[Tuple[int, int], ...]  # top-left (y, x) per tile

    @property
    def num_tiles(self) -> int:
        return len(self.positions)


def plan_tiles(height: int, width: int, tile: int, overlap: int) -> TilePlan:
    """Comfy-style grid: stride = tile - overlap, last tile clamped to fit.

    Tiles never exceed the image; small images get a single clamped tile.
    """
    tile_h = min(tile, height)
    tile_w = min(tile, width)
    if overlap >= tile:
        raise ValueError(f"overlap {overlap} must be < tile {tile}")

    def starts(size: int, t: int) -> List[int]:
        if size <= t:
            return [0]
        stride = t - overlap
        pos = list(range(0, size - t, stride)) + [size - t]
        # dedupe while preserving order
        seen, out = set(), []
        for p in pos:
            p = max(0, min(p, size - t))
            if p not in seen:
                seen.add(p)
                out.append(p)
        return out

    ys = starts(height, tile_h)
    xs = starts(width, tile_w)
    positions = tuple((y, x) for y in ys for x in xs)
    return TilePlan(height, width, tile_h, tile_w, overlap, positions)


@dataclasses.dataclass(frozen=True)
class ComfyTilePlan:
    """ComfyUI-semantics tile grid: variable-size edge tiles.

    ``tiles`` holds (y, x, th, tw) per tile, in ComfyUI's row-major
    emission order (duplicates included if the clamping produces them —
    the algorithm does not dedupe)."""

    height: int
    width: int
    overlap: int
    tiles: Tuple[Tuple[int, int, int, int], ...]

    @property
    def num_tiles(self) -> int:
        return len(self.tiles)


def plan_tiles_comfy(height: int, width: int, tile: int,
                     overlap: int) -> ComfyTilePlan:
    """ComfyUI ``tiled_scale`` grid semantics.  When the ENTIRE image
    fits one tile (H <= tile and W <= tile) the published algorithm
    early-outs with a single un-feathered model call ("handle entire
    input fitting in a single tile" in ``tiled_scale_multidim``).
    Otherwise: starts every ``tile - overlap``; each start clamped to
    ``max(0, min(size - overlap, start))``; tile length ``min(tile,
    size - pos)``.  Edge tiles shrink instead of shifting — including
    the overlap-wide sliver tiles the algorithm emits whenever ``size``
    exceeds the stride on either axis (e.g. a 513-wide image with tile
    512 yields sliver columns; a 512x600 image tiles BOTH axes, 512
    included, because only the both-axes-fit case takes the early-out)."""
    if overlap >= tile:
        raise ValueError(f"overlap {overlap} must be < tile {tile}")
    if height <= tile and width <= tile:
        return ComfyTilePlan(height, width, overlap,
                             ((0, 0, height, width),))

    def axis(size: int) -> List[Tuple[int, int]]:
        out = []
        for start in range(0, size, tile - overlap):
            pos = max(0, min(size - overlap, start))
            out.append((pos, min(tile, size - pos)))
        return out

    tiles = tuple((y, x, th, tw)
                  for y, th in axis(height) for x, tw in axis(width))
    return ComfyTilePlan(height, width, overlap, tiles)


def comfy_feather_mask(tile_h: int, tile_w: int, feather: int) -> np.ndarray:
    """ComfyUI's per-tile blend weight: for t in range(feather), row t and
    row (size-1-t) are each multiplied by (t+1)/feather, same along
    columns (multiplicative where the ramps overlap on small tiles)."""

    def ramp(n: int) -> np.ndarray:
        idx = np.arange(n, dtype=np.float32)
        up = np.where(idx < feather, (idx + 1) / feather, 1.0)
        down = np.where(idx >= n - feather, (n - idx) / feather, 1.0)
        return up * down

    return ramp(tile_h)[:, None] * ramp(tile_w)[None, :]


def tiled_apply_comfy(fn: Callable[[jnp.ndarray], jnp.ndarray],
                      x: jnp.ndarray, *, tile: int = 512, overlap: int = 64,
                      scale: int = 1, pbar=None) -> jnp.ndarray:
    """Apply ``fn`` over [B, H, W, C] with ComfyUI ``tiled_scale``'s exact
    grid and blending (see module docstring).  Up to four distinct tile
    shapes are produced; same-shape tiles run through one ``lax.map`` each
    so XLA compiles at most four model variants.  With ``pbar`` the tiles
    run as a host loop in emission order (per-tile progress)."""
    plan = plan_tiles_comfy(x.shape[1], x.shape[2], tile, overlap)

    outs: List[jnp.ndarray | None] = [None] * plan.num_tiles
    if pbar is not None:
        for i, (y, x0, th, tw) in enumerate(plan.tiles):
            outs[i] = fn(x[:, y:y + th, x0:x0 + tw, :])
            pbar.update(1)
    else:
        groups: Dict[Tuple[int, int], List[int]] = {}
        for i, (_, _, th, tw) in enumerate(plan.tiles):
            groups.setdefault((th, tw), []).append(i)
        for (th, tw), idxs in groups.items():
            stacked = jnp.stack([x[:, y:y + th, x0:x0 + tw, :]
                                 for (y, x0, _, _) in
                                 (plan.tiles[i] for i in idxs)], axis=0)
            if len(idxs) == 1:
                res = fn(stacked[0])[None]
            else:
                res = jax.lax.map(fn, stacked)
            for j, i in enumerate(idxs):
                outs[i] = res[j]

    return blend_tiles_comfy(outs, plan, scale=scale)


def blend_tiles_comfy(outs: List[jnp.ndarray], plan: ComfyTilePlan, *,
                      scale: int = 1) -> jnp.ndarray:
    """ComfyUI ``tiled_scale`` feather accumulation over per-tile outputs
    (emission order, variable tile shapes): weighted add + divide by
    accumulated weight."""
    if plan.tiles == ((0, 0, plan.height, plan.width),):
        # single-tile early-out: ComfyUI returns the model output
        # directly, no feather mask / divide round trip
        return outs[0].astype(jnp.float32)
    feather = round(plan.overlap * scale)
    b = outs[0].shape[0]
    c = outs[0].shape[-1]
    out_h, out_w = plan.height * scale, plan.width * scale
    acc = jnp.zeros((b, out_h, out_w, c), jnp.float32)
    weight = jnp.zeros((b, out_h, out_w, 1), jnp.float32)
    for (y, x0, th, tw), o in zip(plan.tiles, outs):
        mask = jnp.asarray(
            comfy_feather_mask(th * scale, tw * scale,
                               feather))[None, :, :, None]
        ys, xs = y * scale, x0 * scale
        acc = acc.at[:, ys:ys + th * scale, xs:xs + tw * scale, :].add(
            o.astype(jnp.float32) * mask)
        weight = weight.at[:, ys:ys + th * scale,
                           xs:xs + tw * scale, :].add(mask)
    # ComfyUI divides with no epsilon (every pixel is covered by >= 1 tile
    # whose ramp weight is >= 1/feather there).
    return acc / weight


def extract_tiles(x: jnp.ndarray, plan: TilePlan) -> jnp.ndarray:
    """[B, H, W, C] -> [T, B, th, tw, C] stacked tiles (static slices)."""
    tiles = [x[:, y:y + plan.tile_h, x0:x0 + plan.tile_w, :]
             for y, x0 in plan.positions]
    return jnp.stack(tiles, axis=0)


def _feather_mask(tile_h: int, tile_w: int, feather: int) -> np.ndarray:
    """Linear ramps on all four edges (the reference blends every tile edge
    and normalizes by accumulated weight, so borders stay correct)."""
    # index-based ramps so tiles SMALLER than the feather width (a thin
    # image dim while the other dim tiles) get overlapping up/down ramps
    # instead of a broadcast crash
    def ramp(n: int) -> np.ndarray:
        idx = np.arange(n, dtype=np.float32)
        up = np.where(idx < feather, (idx + 1) / (feather + 1), 1.0)
        down = np.where(idx >= n - feather, (n - idx) / (feather + 1), 1.0)
        return up * down

    if feather <= 0:
        return np.ones((tile_h, tile_w), np.float32)
    return ramp(tile_h)[:, None] * ramp(tile_w)[None, :]


def blend_tiles(tiles: jnp.ndarray, plan: TilePlan, *, scale: int = 1,
                mode: str = "feather") -> jnp.ndarray:
    """[T, B, s*th, s*tw, C] -> [B, s*H, s*W, C].

    ``scale`` is the per-tile spatial growth (the upscale_amount of
    `hdr_upscale_with_model.py:133`).
    """
    t, b, th, tw, c = tiles.shape
    out_h, out_w = plan.height * scale, plan.width * scale
    feather = plan.overlap * scale

    if mode == "feather":
        mask = jnp.asarray(_feather_mask(th, tw, feather))[None, :, :, None]
        acc = jnp.zeros((b, out_h, out_w, c), jnp.float32)
        weight = jnp.zeros((b, out_h, out_w, 1), jnp.float32)
        for i, (y, x0) in enumerate(plan.positions):
            ys, xs = y * scale, x0 * scale
            acc = acc.at[:, ys:ys + th, xs:xs + tw, :].add(tiles[i] * mask)
            weight = weight.at[:, ys:ys + th, xs:xs + tw, :].add(mask)
        return acc / jnp.maximum(weight, 1e-8)

    if mode == "crop":
        half = feather // 2
        out = jnp.zeros((b, out_h, out_w, c), jnp.float32)
        for i, (y, x0) in enumerate(plan.positions):
            ys, xs = y * scale, x0 * scale
            # interior bounds: keep halo only at image borders
            top = 0 if ys == 0 else half
            left = 0 if xs == 0 else half
            bottom = th if ys + th >= out_h else th - half
            right = tw if xs + tw >= out_w else tw - half
            out = out.at[:, ys + top:ys + bottom,
                         xs + left:xs + right, :].set(
                tiles[i][:, top:bottom, left:right, :])
        return out

    raise ValueError(f"unknown blend mode {mode!r}")


def tiled_apply(fn: Callable[[jnp.ndarray], jnp.ndarray], x: jnp.ndarray,
                *, tile: int = 512, overlap: int = 64, scale: int = 1,
                mode: str = "feather", pbar=None) -> jnp.ndarray:
    """Apply ``fn`` tile-by-tile over [B, H, W, C] with seam handling.

    ``fn`` maps [B, th, tw, C] -> [B, s*th, s*tw, C'].  Tiles run through
    ``lax.map`` so only one tile's activations are live at a time — the
    static-shape replacement for the reference's OOM-halving loop.  (The
    mesh-parallel stacked-tile form lives in hdrvae.sharding.mesh.)

    ``pbar`` (object with ``update(n)``) enables per-tile progress, the
    reference's ProgressBar surface (`hdr_upscale_with_model.py:125`); the
    tile loop then runs host-side (``fn`` should be jitted), trading the
    single fused program for reportability — exactly the reference's
    execution shape.
    """
    if mode == "comfy":
        return tiled_apply_comfy(fn, x, tile=tile, overlap=overlap,
                                 scale=scale, pbar=pbar)
    plan = plan_tiles(x.shape[1], x.shape[2], tile, overlap)
    tiles = extract_tiles(x, plan)
    if plan.num_tiles == 1:
        out = fn(tiles[0])
        if pbar is not None:
            pbar.update(1)
        return out
    if pbar is not None:
        outs = []
        for i in range(plan.num_tiles):
            outs.append(fn(tiles[i]))
            pbar.update(1)
        out = jnp.stack(outs, axis=0)
    else:
        out = jax.lax.map(fn, tiles)
    return blend_tiles(out, plan, scale=scale, mode=mode)


def num_tiles(height: int, width: int, tile: int, overlap: int,
              mode: str = "feather") -> int:
    """Tile count of the plan (for sizing progress bars up front —
    the reference's get_tiled_scale_steps equivalent)."""
    if mode == "comfy":
        return plan_tiles_comfy(height, width, tile, overlap).num_tiles
    return plan_tiles(height, width, tile, overlap).num_tiles


# ---------------------------------------------------------------------------
# Static tile-size selection from a memory budget
# ---------------------------------------------------------------------------


def select_tile_size(height: int, width: int, *, bytes_per_pixel: float,
                     hbm_budget_bytes: int, preferred: int = 512,
                     min_tile: int = 128, alignment: int = 64) -> int:
    """Pick the largest aligned tile <= preferred whose working set fits the
    budget — the trace-time replacement for the reference's halve-on-OOM
    retry (`hdr_upscale_with_model.py:137-144`, floor 128 kept)."""
    tile = min(preferred, max(height, width))
    tile = max(min_tile, -(-tile // alignment) * alignment)
    while tile > min_tile and tile * tile * bytes_per_pixel > \
            hbm_budget_bytes:
        tile = max(min_tile, (tile // 2 // alignment) * alignment)
    return tile

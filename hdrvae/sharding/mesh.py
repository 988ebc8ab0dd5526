"""Device-mesh sharded decode — scaling via jax.sharding + ICI collectives.

The reference has NO distributed layer (SURVEY.md section 5: single device,
manual CUDA placement at `hdr_vae_decode.py:452-502`).  The TPU-native
scaling model (BASELINE.json config 5) is spatial data parallelism: the
overlap-tile grid is the parallel axis, tiles are sharded across the mesh
over ICI, the decoder weights are replicated, and the stitched image plus
the HDR epilogue's global reductions are produced by XLA-inserted
collectives (all-gather on the blend, psum-style reductions in the stats) —
no hand-written communication.

Design notes (How-to-Scale-Your-Model recipe): pick a mesh, annotate
shardings with NamedSharding, let XLA insert collectives.  The model is
~100 MB -> replication is free; only the tile axis shards (no TP/PP/EP
warranted, SURVEY.md section 5 parallelism row).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hdrvae.core.config import (DecoderConfig, HDRDecodeConfig,
                                Precision)
from hdrvae.decode.formatting import collapse_channels_maxpool
from hdrvae.decode.pipeline import hdr_epilogue_from_parts
from hdrvae.models.decoder import (decoder_apply, decoder_head,
                                   decoder_tail, tail_receptive_radius)
from hdrvae.tiling.tiled import TilePlan, blend_tiles, extract_tiles, \
    plan_tiles

Params = Dict[str, Any]


def make_mesh(num_devices: Optional[int] = None,
              axis_name: str = "tiles",
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """A 1-D mesh over the tile/batch axis (v5e-4 -> shape (4,))."""
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis_name,))


def _replicate_params(params: Params, mesh: Mesh) -> Params:
    """Replicate weights over the mesh — skipping the ~100-200 MB
    transfer when a serving loop passes params already placed there.
    Empty trees pass through (nothing to place)."""
    leaves = jax.tree_util.tree_leaves(params)
    if not leaves:
        return params
    replicated = NamedSharding(mesh, P())
    if getattr(leaves[0], "sharding", None) != replicated:
        params = jax.device_put(params, replicated)
    return params


def _ownership_intervals(starts, tile_px: int, out_px: int, half: int):
    """Per-axis pixel intervals each tile OWNS after blend_tiles(mode='crop')
    overwrite order: tile k's interior is clipped where the NEXT tile's
    interior begins (later tiles .set over earlier ones), so the intervals
    partition the axis exactly — no pixel counted twice even when a clamped
    last tile breaks the regular stride."""
    intervals = []
    n = len(starts)
    for i, s in enumerate(starts):
        sp = s  # already pixel-space
        int_start = 0 if sp == 0 else sp + half
        int_end = out_px if sp + tile_px >= out_px else sp + tile_px - half
        if i + 1 < n:
            nxt = starts[i + 1]
            nxt_start = 0 if nxt == 0 else nxt + half
            int_end = min(int_end, nxt_start)
        intervals.append((int_start, int_end))
    return intervals


def _crop_boxes(plan: TilePlan, scale: int):
    """Per-tile owned (top, bottom, left, right) in tile-pixel space —
    matching exactly the pixels each tile contributes to the final stitched
    image under blend_tiles(mode='crop') overwrite semantics."""
    th, tw = plan.tile_h * scale, plan.tile_w * scale
    out_h, out_w = plan.height * scale, plan.width * scale
    half = (plan.overlap * scale) // 2
    ys = sorted({y * scale for y, _ in plan.positions})
    xs = sorted({x * scale for _, x in plan.positions})
    y_int = dict(zip(ys, _ownership_intervals(ys, th, out_h, half)))
    x_int = dict(zip(xs, _ownership_intervals(xs, tw, out_w, half)))
    boxes = []
    for y, x0 in plan.positions:
        ya, yb = y_int[y * scale]
        xa, xb = x_int[x0 * scale]
        # convert absolute intervals to tile-local coordinates
        boxes.append((ya - y * scale, yb - y * scale,
                      xa - x0 * scale, xb - x0 * scale))
    return boxes


def _pad_tiles(tiles: jnp.ndarray, multiple: int) -> Tuple[jnp.ndarray, int]:
    t = tiles.shape[0]
    pad = (-t) % multiple
    if pad:
        tiles = jnp.concatenate(
            [tiles, jnp.repeat(tiles[-1:], pad, axis=0)], axis=0)
    return tiles, pad


@functools.partial(jax.jit,
                   static_argnames=("decoder_cfg", "cfg", "precision",
                                    "plan", "mesh", "axis_name",
                                    "global_stats"))
def _sharded_decode_step(params: Params, tiles: jnp.ndarray,
                         stats_latent, decoder_cfg: DecoderConfig,
                         cfg: HDRDecodeConfig, precision: Precision,
                         plan: TilePlan, mesh: Mesh, axis_name: str,
                         global_stats: bool):
    """tiles: [T, B, th, tw, zc] sharded on T; returns the full image plus
    the epilogue outputs (replicated).

    With ``global_stats`` a whole-image decode first collects a GroupNorm
    tape; every tile then normalizes with those shared statistics instead
    of its own — the two-phase answer to GroupNorm's global nature under
    tiling (SURVEY.md section 7 hard-parts).
    """
    tile_sharding = NamedSharding(mesh, P(axis_name))
    tiles = jax.lax.with_sharding_constraint(tiles, tile_sharding)

    # Pallas custom calls must stay out of the SPMD-partitioned region on
    # a >1-device mesh (the slab executor's head comment below: the
    # partitioner either trips on them or demotes neighboring fusions to
    # degenerate layouts).  The slab path confines them to shard_map; this
    # tile executor runs decode_tile inside the partitioned jit, so on a
    # real mesh force the XLA upstack.  A 1-device mesh partitions
    # trivially and keeps the measured kernel-chain tile throughput
    # (NOTES_ROUND3 item 3).  An explicit upstack="pallas" request is
    # honored (and will assert inside decoder_apply if unsupported).
    if mesh.devices.size > 1 and precision.upstack == "auto":
        import dataclasses as _dc
        precision = _dc.replace(precision, upstack="xla")

    collected = None
    if global_stats:
        from hdrvae.models.layers import GNTape
        collect_tape = GNTape("collect")
        decoder_apply(params, stats_latent, decoder_cfg,
                      precision=precision, apply_conv_out=False,
                      tape=collect_tape)
        collected = collect_tape.stats

    want_first3 = cfg.fallback_collapse == "first3"
    scale = decoder_cfg.spatial_scale
    n_real = plan.num_tiles
    # per-tile interior crop boxes (pixel space) — the same regions
    # blend_tiles(mode="crop") pastes, so every pixel is counted exactly
    # once in the combined statistics.
    boxes = jnp.asarray(_crop_boxes(plan, scale), jnp.int32)
    boxes = jnp.concatenate(
        [boxes, jnp.zeros((tiles.shape[0] - n_real, 4), jnp.int32)], axis=0)

    def decode_tile(tile, box):
        tape = None
        if collected is not None:
            from hdrvae.models.layers import GNTape
            tape = GNTape("inject", collected)
        out = decoder_apply(params, tile, decoder_cfg, precision=precision,
                            tape=tape)
        # Collapse the 128-ch pre map to 3 channels HERE (pointwise ->
        # commutes with stitching): the raw stitched map at 4K would be a
        # multi-GB tensor.  Raw-pre statistics travel as per-tile partials
        # masked to the interior crop region.
        pre_f = out.pre_conv_out.astype(jnp.float32)
        h, w = pre_f.shape[1], pre_f.shape[2]
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        mask = ((rows >= box[0]) & (rows < box[1])
                & (cols >= box[2]) & (cols < box[3]))[None, :, :, None]
        cnt = jnp.sum(mask) * pre_f.shape[0] * pre_f.shape[3]
        masked = jnp.where(mask, pre_f, 0.0)
        partial = (jnp.sum(masked), jnp.sum(jnp.square(masked)),
                   jnp.min(jnp.where(mask, pre_f, jnp.inf)),
                   jnp.max(jnp.where(mask, pre_f, -jnp.inf)),
                   cnt.astype(jnp.float32))
        # first3 fallback channels are pointwise, so they stitch exactly
        # like rgb (the simple_bypass eye(3, C) projection,
        # `hdr_vae_decode.py:1324-1329`).
        pre3 = pre_f[..., :3] if want_first3 else pre_f[..., :0]
        return (out.rgb, collapse_channels_maxpool(out.pre_conv_out), pre3,
                partial)

    # Tiles are processed in device-count-sized chunks: lax.map runs chunks
    # SEQUENTIALLY (bounding live activations to one tile per device) while
    # vmap + the sharding constraint spreads each chunk across the mesh.
    # A plain vmap over all T tiles would batch every tile's activations
    # at once — tens of GB for a 4K image on one device.
    n_dev = mesh.devices.size
    t_total = tiles.shape[0]
    tiles_g = tiles.reshape((t_total // n_dev, n_dev) + tiles.shape[1:])
    boxes_g = boxes.reshape(t_total // n_dev, n_dev, 4)

    def chunk_fn(args):
        chunk, chunk_boxes = args
        chunk = jax.lax.with_sharding_constraint(chunk, tile_sharding)
        return jax.vmap(decode_tile)(chunk, chunk_boxes)

    rgb_g, prec_g, pre3_g, partials_g = jax.lax.map(chunk_fn,
                                                    (tiles_g, boxes_g))
    rgb_tiles = rgb_g.reshape((t_total,) + rgb_g.shape[2:])
    prec_tiles = prec_g.reshape((t_total,) + prec_g.shape[2:])
    pre3_tiles = pre3_g.reshape((t_total,) + pre3_g.shape[2:])
    partials = jax.tree_util.tree_map(
        lambda x: x.reshape((t_total,) + x.shape[2:]), partials_g)

    rgb = blend_tiles(rgb_tiles[:n_real], plan, scale=scale, mode="crop")
    pre_c = blend_tiles(prec_tiles[:n_real], plan, scale=scale, mode="crop")
    pre3 = (blend_tiles(pre3_tiles[:n_real], plan, scale=scale, mode="crop")
            if want_first3 else None)

    psum, psumsq, pmin, pmax, pcnt = partials
    n = jnp.sum(pcnt[:n_real])
    mean = jnp.sum(psum[:n_real]) / n
    var = jnp.maximum(jnp.sum(psumsq[:n_real]) / n - jnp.square(mean), 0.0)
    # unbiased (ddof=1) to match torch.std semantics of the analysis pass
    var = var * n / jnp.maximum(n - 1.0, 1.0)
    pre_stats = {
        "min": jnp.min(pmin[:n_real]),
        "max": jnp.max(pmax[:n_real]),
        "mean": mean,
        "std": jnp.sqrt(var),
    }
    image, used_fallback, analysis = hdr_epilogue_from_parts(
        rgb, pre_c, pre_stats, cfg, pre3)
    return image, rgb, used_fallback


# ---------------------------------------------------------------------------
# Slab-sharded EXACT decode (head whole-image, tail on row slabs + GN psum)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SlabPlan:
    """Static row-slab geometry at tail-entry resolution: n equal-shaped
    slabs whose OWNED row intervals partition [0, entry_h); each slab is
    extracted with a ``halo`` >= the tail's receptive radius so halo-crop
    is exact for the conv stack."""

    entry_h: int
    halo: int
    slab_h: int
    starts: Tuple[int, ...]                # slab top row (incl. halo)
    owned: Tuple[Tuple[int, int], ...]     # global owned row interval


def plan_slabs(entry_h: int, n: int, halo: int) -> SlabPlan:
    cuts = [round(i * entry_h / n) for i in range(n + 1)]
    widest = max(cuts[i + 1] - cuts[i] for i in range(n))
    # Round the slab height up to a multiple of 8: extra halo rows are
    # exact (cropped at stitch), and 8-row alignment keeps the Pallas
    # tail kernels' row-block choices off the br=1 cliff.
    slab_h = min(entry_h, ((widest + 2 * halo + 7) // 8) * 8)
    starts = tuple(min(max(cuts[i] - halo, 0), entry_h - slab_h)
                   for i in range(n))
    owned = tuple((cuts[i], cuts[i + 1]) for i in range(n))
    return SlabPlan(entry_h, halo, slab_h, starts, owned)


class SlabGNReducer:
    """Exact whole-image GroupNorm statistics under slab sharding.

    Duck-typed GN "tape" (hdrvae.models.layers._gn_affine looks for
    ``reduce_stats``): each device computes partial sums over the rows it
    OWNS (halo rows masked out so no pixel is counted twice) and a psum
    over the mesh axis reconstructs the whole-image mean/var — the
    per-tile-partials answer to GroupNorm's global statistics (SURVEY.md
    section 7 hard-parts; replaces the extra whole-image stats forward).

    The layer's resolution multiple is inferred from the width (slabs span
    the full image width, so ``w == entry_w * f`` exactly).
    """

    def __init__(self, axis_name: str, entry_h: int, entry_w: int,
                 top, bot):
        self.axis_name = axis_name
        self.entry_h = entry_h
        self.entry_w = entry_w
        self.top = top      # traced: this device's owned LOCAL row bounds
        self.bot = bot      # (at entry resolution)

    def _row_mask(self, h: int, f: int) -> jnp.ndarray:
        rows = jax.lax.broadcasted_iota(jnp.int32, (h,), 0)
        return ((rows >= self.top * f)
                & (rows < self.bot * f)).astype(jnp.float32)

    def _mask2d(self, h: int, w: int, f: int) -> jnp.ndarray:
        """[h, w] owned-AND-valid mask at resolution multiple f."""
        return jnp.broadcast_to(self._row_mask(h, f)[:, None], (h, w))

    def _n_global(self, f: int, w: int, cpg: int):
        return (self.entry_h * f) * w * cpg

    def reduce_stats(self, xf: jnp.ndarray, onehot: jnp.ndarray, cpg: int,
                     precision: Precision):
        b, h, w, c = xf.shape
        f = w // self.entry_w
        mask = self._mask2d(h, w, f)[None, :, :, None]
        n_global = self._n_global(f, w, cpg)
        xm = xf * mask
        from hdrvae.models.layers import _stats_precision
        mp = _stats_precision(precision)
        mean = jax.lax.psum(jnp.einsum("bhwc,cg->bg", xm, onehot,
                                       precision=mp),
                            self.axis_name) / n_global
        if precision.mode == "parity":
            grp = jnp.arange(c) // cpg
            centered = (xf - mean[:, grp][:, None, None, :]) * mask
            var = jax.lax.psum(
                jnp.einsum("bhwc,cg->bg", jnp.square(centered), onehot,
                           precision=mp),
                self.axis_name) / n_global
        else:
            sq = jax.lax.psum(
                jnp.einsum("bhwc,cg->bg", jnp.square(xm), onehot,
                           precision=mp),
                self.axis_name) / n_global
            var = jnp.maximum(sq - jnp.square(mean), 0.0)
        return mean, var


class SlabPadGNReducer(SlabGNReducer):
    """SlabGNReducer + PadMask semantics in one tape: exact whole-image GN
    statistics over the VALID region of a zero-padded (shape-bucketed)
    latent, under slab sharding (VERDICT round-4 item 7 — lets the mesh
    serving path bucket shapes instead of compiling per exact latent).

    Statistics partials count rows this slab owns that are also valid and
    columns inside the valid width; ``mask_output`` re-zeros the pad
    region after every norm/resnet output (exactly what PadMask does
    whole-image, here with the slab's GLOBAL row offset), so convs see
    SAME-style zeros at the valid boundary and nothing from the pad
    region bleeds into valid pixels.  ``valid_eh/valid_ew`` are traced
    scalars at entry resolution — one compiled program per bucket shape
    serves every original resolution in the bucket.

    The mid attention runs in the whole-image HEAD under a plain PadMask
    (key_valid), so this tape needs no attention hook.
    """

    def __init__(self, axis_name: str, entry_h: int, entry_w: int,
                 top, bot, start, valid_eh, valid_ew):
        super().__init__(axis_name, entry_h, entry_w, top, bot)
        self.start = start            # slab's global top row (entry res)
        self.valid_eh = valid_eh      # traced valid dims (entry res)
        self.valid_ew = valid_ew

    def _row_mask(self, h: int, f: int) -> jnp.ndarray:
        rows = jax.lax.broadcasted_iota(jnp.int32, (h,), 0)
        global_rows = rows + self.start * f
        return ((rows >= self.top * f) & (rows < self.bot * f)
                & (global_rows < self.valid_eh * f)).astype(jnp.float32)

    def _mask2d(self, h: int, w: int, f: int) -> jnp.ndarray:
        cols = jax.lax.broadcasted_iota(jnp.int32, (w,), 0)
        col_mask = (cols < self.valid_ew * f).astype(jnp.float32)
        return self._row_mask(h, f)[:, None] * col_mask[None, :]

    def _n_global(self, f: int, w: int, cpg: int):
        return (self.valid_eh * f) * (self.valid_ew * f) * cpg

    def mask_output(self, x: jnp.ndarray) -> jnp.ndarray:
        """Zero the PAD region (NOT the un-owned halo rows — those carry
        real values the conv halos need)."""
        b, h, w, c = x.shape
        f = w // self.entry_w
        rows = jax.lax.broadcasted_iota(jnp.int32, (h,), 0) + self.start * f
        cols = jax.lax.broadcasted_iota(jnp.int32, (w,), 0)
        valid = ((rows < self.valid_eh * f)[:, None]
                 & (cols < self.valid_ew * f)[None, :])
        return x * valid[None, :, :, None].astype(x.dtype)


@functools.partial(jax.jit,
                   static_argnames=("decoder_cfg", "cfg", "precision",
                                    "mesh", "tail_levels", "halo",
                                    "bucketed"))
def _slab_decode_step(params: Params, latent: jnp.ndarray, valid_hw,
                      decoder_cfg: DecoderConfig, cfg: HDRDecodeConfig,
                      precision: Precision, mesh: Mesh, tail_levels: int,
                      halo: int, ev, bucketed: bool = False):
    """``bucketed``: ``latent`` is zero-padded to a bucket shape and
    ``valid_hw`` (traced [2] int32) carries the real latent dims.  The
    head runs under a PadMask tape, the tail under SlabPadGNReducer, and
    the step returns the PADDED (rgb, pre_c, pre3, pre_stats) parts —
    the caller crops outside jit and runs the per-original-shape
    epilogue program (the same two-program structure as the whole-image
    bucketed path, decode.pipeline._decoder_forward_bucketed)."""
    axis_name = mesh.axis_names[0]
    n = mesh.devices.size

    from hdrvae.models.pallas_tail import (pallas_head, upstack_slab_apply,
                                           upstack_supported)
    use_pallas = (not bucketed and tail_levels >= 1
                  and latent.shape[0] == 1
                  and upstack_supported(precision, latent.shape[0], None,
                                        width=latent.shape[2],
                                        cfg=decoder_cfg))
    if precision.upstack == "pallas" and not use_pallas:
        raise ValueError(
            "precision.upstack='pallas' requires fast mode, batch 1, "
            "tail_levels >= 1, width % 8 == 0, a TPU backend, and "
            "128-multiple channel widths "
            f"(got mode={precision.mode!r}, batch={latent.shape[0]}, "
            f"tail_levels={tail_levels}, width={latent.shape[2]}, "
            f"widths={sorted({decoder_cfg.ch * m for m in decoder_cfg.ch_mult})})")

    # Head: conv_in + mid (global attention RUNS, whole-image — beating the
    # reference's attention-skip hack `hdr_vae_decode.py:514` on its own
    # ground) + coarse up levels, all at cheap low resolution.  On the
    # kernel path the whole head runs INSIDE shard_map, redundantly per
    # device — computationally identical to the XLA path (whose head the
    # SPMD partitioner replicates anyway), and it keeps every Pallas
    # custom call out of SPMD partitioning: a Pallas call in the
    # partitioned region either trips the partitioner (io_callback under
    # interpret mode) or demotes neighboring conv fusions to degenerate
    # layouts (pallas_head docstring; measured 184 ms for one conv).
    f_head = 2 ** (decoder_cfg.num_levels - max(tail_levels, 1))
    if use_pallas:
        entry_h = latent.shape[1] * f_head
        entry_w = latent.shape[2] * f_head
    else:
        head_tape = None
        if bucketed:
            from hdrvae.models.layers import PadMask
            head_tape = PadMask(latent.shape[1], latent.shape[2],
                                valid_hw[0], valid_hw[1])
        x = decoder_head(params, latent, decoder_cfg, precision=precision,
                         tail_levels=tail_levels, tape=head_tape)
        entry_h, entry_w = x.shape[1], x.shape[2]
    valid_eh = valid_hw[0] * f_head
    valid_ew = valid_hw[1] * f_head

    plan = plan_slabs(entry_h, n, halo)
    fo = 2 ** max(tail_levels - 1, 0)      # tail output resolution multiple

    bounds = jnp.asarray([[o0 - s, o1 - s]
                          for (o0, o1), s in zip(plan.owned, plan.starts)],
                         jnp.int32)
    starts = jnp.asarray(plan.starts, jnp.int32).reshape(n, 1)

    if not use_pallas:
        slabs = jnp.stack([x[:, s:s + plan.slab_h] for s in plan.starts], 0)
        slabs = jax.lax.with_sharding_constraint(
            slabs, NamedSharding(mesh, P(axis_name)))

    want_first3 = cfg.fallback_collapse == "first3"

    def tail_one(p, slab_or_latent, bnd, st):
        bnd = bnd[0]
        if bucketed:
            reducer = SlabPadGNReducer(axis_name, entry_h, entry_w,
                                       bnd[0], bnd[1], st[0, 0],
                                       valid_eh, valid_ew)
        else:
            reducer = SlabGNReducer(axis_name, entry_h, entry_w,
                                    bnd[0], bnd[1])
        if use_pallas:
            # Kernel-chain path: head per device, then this device's slab
            # with per-slab owned-row stat partials psum'd across the
            # mesh (models.pallas_tail.upstack_slab_apply) instead of the
            # XLA layers + SlabGNReducer tape.
            from hdrvae.models.layers import GNTape
            xh, head_moments = pallas_head(
                p, slab_or_latent, decoder_cfg, precision=precision,
                tail_levels=tail_levels)
            # xh is in the padded chain layout [entry_h+2, entry_w+16, C]
            # (interior at rows [1, entry_h+1)); the slab's own chain
            # window — interior rows [st, st+slab_h) plus its 1-row
            # frame — is padded rows [st, st + slab_h + 2), so the slab
            # slice IS already chain-layout (zero XLA copies beyond the
            # gather).
            slab = jax.lax.dynamic_slice_in_dim(
                xh, st[0, 0], plan.slab_h + 2, axis=0)
            pre, mom = upstack_slab_apply(
                p, slab, bnd, decoder_cfg, precision=precision,
                tail_levels=tail_levels, axis_name=axis_name,
                entry_h=entry_h, moments=head_moments, padded_in=True)
            inject = GNTape("inject", [(mom[0][None], mom[1][None])])
            out = decoder_tail(p, pre[None], decoder_cfg,
                               precision=precision, tail_levels=0,
                               tape=inject)
        else:
            out = decoder_tail(p, slab_or_latent[0], decoder_cfg,
                               precision=precision,
                               tail_levels=tail_levels, tape=reducer)
        pre_f = out.pre_conv_out.astype(jnp.float32)
        b, ho, wo, c = pre_f.shape
        mask = reducer._mask2d(ho, wo, fo)[None, :, :, None]
        n_pre = b * reducer._n_global(fo, wo, 1) * c
        masked = pre_f * mask
        s1 = jax.lax.psum(jnp.sum(masked), axis_name)
        s2 = jax.lax.psum(jnp.sum(jnp.square(masked)), axis_name)
        big = jnp.asarray(jnp.inf, jnp.float32)
        mn = jax.lax.pmin(jnp.min(jnp.where(mask > 0, pre_f, big)),
                          axis_name)
        mx = jax.lax.pmax(jnp.max(jnp.where(mask > 0, pre_f, -big)),
                          axis_name)
        n_pre = jnp.asarray(n_pre, jnp.float32)   # traced when bucketed
        mean = s1 / n_pre
        # one-pass variance; only logged (modes use min/max/mean), ddof=1
        var = jnp.maximum(s2 / n_pre - jnp.square(mean), 0.0)
        var = var * n_pre / jnp.maximum(n_pre - 1.0, 1.0)
        pre_stats = {"min": mn, "max": mx, "mean": mean,
                     "std": jnp.sqrt(var)}
        pre_c = collapse_channels_maxpool(pre_f)
        pre3 = pre_f[..., :3] if want_first3 else pre_c[..., :0]
        return out.rgb[None], pre_c[None], pre3[None], pre_stats

    first = latent if use_pallas else slabs
    rgb_s, prec_s, pre3_s, pre_stats = shard_map(
        tail_one, mesh=mesh,
        in_specs=(P(), P() if use_pallas else P(axis_name), P(axis_name),
                  P(axis_name)),
        out_specs=(P(axis_name), P(axis_name), P(axis_name), P()),
        check_vma=False)(params, first, bounds, starts)

    def stitch(t):
        pieces = [t[i][:, (o0 - s) * fo:(o1 - s) * fo]
                  for i, ((o0, o1), s) in enumerate(zip(plan.owned,
                                                        plan.starts))]
        return jnp.concatenate(pieces, axis=1)

    rgb = stitch(rgb_s)
    pre_c = stitch(prec_s)
    pre3 = stitch(pre3_s) if want_first3 else None

    if bucketed:
        # Padded parts out; the caller crops and runs the small
        # per-original-shape epilogue program (pre_stats are already
        # valid-region-exact from the masked partials).
        return rgb, pre_c, pre3, pre_stats

    image, used_fallback, analysis = hdr_epilogue_from_parts(
        rgb, pre_c, pre_stats, cfg, pre3, ev)
    from hdrvae.core.stats import hdr_stats
    stats = {
        "input": hdr_stats(latent),
        "pre": analysis.pre_stats,
        "post": analysis.post_stats,
        "norm_kind": analysis.norm_kind,
        "output": hdr_stats(image),
    }
    if cfg.full_analysis:
        # Param-derived part of the reference's extended analysis record
        # (`hdr_vae_decode.py:900-910`); conv_only is whole-image-only
        # (HDRDecodeConfig.full_analysis docstring).
        from hdrvae.core.stats import tensor_stats
        stats["conv_weight"] = tensor_stats(params["conv_out"]["kernel"])
        stats["conv_bias"] = tensor_stats(params["conv_out"]["bias"])
    return image, rgb, stats, used_fallback


@functools.partial(jax.jit, static_argnames=("cfg",))
def _epilogue_parts_compiled(conv_out_params, rgb, pre_c, pre3, pre_stats,
                             latent, cfg, ev):
    """Per-original-shape epilogue for the bucketed slab path: mode math
    + acceptance from already-cropped parts (small program — seconds to
    compile, unlike the slab decoder program the bucket shape shares)."""
    image, used_fallback, analysis = hdr_epilogue_from_parts(
        rgb, pre_c, pre_stats, cfg, pre3, ev)
    from hdrvae.core.stats import hdr_stats, tensor_stats
    stats = {
        "input": hdr_stats(latent),
        "pre": analysis.pre_stats,
        "post": analysis.post_stats,
        "norm_kind": analysis.norm_kind,
        "output": hdr_stats(image),
    }
    if cfg.full_analysis:
        stats["conv_weight"] = tensor_stats(conv_out_params["kernel"])
        stats["conv_bias"] = tensor_stats(conv_out_params["bias"])
    return image, stats, used_fallback


def sharded_slab_decode(params: Params, latent: jnp.ndarray,
                        decoder_cfg: DecoderConfig = DecoderConfig(),
                        cfg: HDRDecodeConfig = HDRDecodeConfig(),
                        *, mesh: Optional[Mesh] = None,
                        tail_levels: Optional[int] = None,
                        halo: Optional[int] = None,
                        pad_to: Optional[Tuple[int, int]] = None,
                        precision: Precision = Precision()):
    """EXACT sharded decode: head whole-image, tail on row slabs.

    The answer to tiled-decode fidelity (SURVEY.md section 7 hard parts;
    BASELINE.json config 5): the non-local parts (mid attention) run
    whole-image at latent resolution where they are cheap; the memory-heavy
    fine levels run on row slabs sharded over the mesh, with

      - conv exactness from a halo >= the tail receptive radius
        (models.decoder.tail_receptive_radius), and
      - GroupNorm exactness from cross-slab statistic reduction
        (SlabGNReducer psum) — NO extra whole-image stats forward.

    Per-device peak activation memory scales ~1/n_devices for the tail,
    which is where the full-resolution memory lives.  On a 1-device mesh
    this degenerates to the plain whole-image decode (no halo waste).

    ``pad_to`` (round-5): zero-pad the latent up to a bucket shape and
    decode EXACTLY via PadMask-through-the-slab-path (SlabPadGNReducer) —
    one compiled slab program per bucket shape serves every original
    resolution in the bucket, the answer to the mesh-serving recompile
    storm (serve.engine bucket snapping now composes with mesh=).

    Returns an ``HDRDecodeResult`` (same contract as ``hdr_decode``).
    """
    from hdrvae.decode.pipeline import HDRDecodeResult, _split_ev
    zc = decoder_cfg.z_channels
    if latent.ndim != 4:
        raise ValueError(f"latent must be 4D, got shape {latent.shape}")
    if latent.shape[-1] != zc:
        if latent.shape[1] == zc:
            latent = jnp.transpose(latent, (0, 2, 3, 1))  # NCHW -> NHWC
        else:
            raise ValueError(
                f"latent shape {latent.shape} has no {zc}-channel axis "
                f"(expected NHWC or NCHW with z_channels={zc})")
    if mesh is None:
        mesh = make_mesh()
    if tail_levels is None:
        # Fine levels hold the memory; two tail levels keep the whole-image
        # head at <= 1/16 of output area while sharding ~94% of the FLOPs
        # for the Flux topology.
        tail_levels = min(2, decoder_cfg.num_levels)
    if not 0 <= tail_levels <= decoder_cfg.num_levels:
        raise ValueError(f"tail_levels {tail_levels} out of range")
    if halo is None:
        halo = tail_receptive_radius(decoder_cfg, tail_levels)

    orig_h, orig_w = latent.shape[1], latent.shape[2]
    orig_latent = latent
    cfg2, ev = _split_ev(cfg)
    # A latent already AT the bucket target still takes the bucketed
    # program (full-valid mask) so serving keeps ONE program per bucket
    # shape — same policy as hdr_decode(pad_to=...).
    bucketed = pad_to is not None
    if pad_to is not None:
        if pad_to[0] < orig_h or pad_to[1] < orig_w:
            raise ValueError(f"pad_to {pad_to} smaller than latent "
                             f"{(orig_h, orig_w)}")
        if tuple(pad_to) != (orig_h, orig_w):
            latent = jnp.pad(latent, ((0, 0), (0, pad_to[0] - orig_h),
                                      (0, pad_to[1] - orig_w), (0, 0)))

    params = _replicate_params(params, mesh)
    latent = jax.device_put(latent, NamedSharding(mesh, P()))
    valid_hw = jnp.asarray([orig_h, orig_w], jnp.int32)

    if bucketed:
        rgb, pre_c, pre3, pre_stats = _slab_decode_step(
            params, latent, valid_hw, decoder_cfg, cfg2, precision, mesh,
            tail_levels, halo, ev, bucketed=True)
        s = decoder_cfg.spatial_scale
        rgb = rgb[:, :orig_h * s, :orig_w * s]
        pre_c = pre_c[:, :orig_h * s, :orig_w * s]
        if pre3 is not None:
            pre3 = pre3[:, :orig_h * s, :orig_w * s]
        image, stats, used_fallback = _epilogue_parts_compiled(
            params["conv_out"], rgb, pre_c, pre3, pre_stats, orig_latent,
            cfg2, ev)
    else:
        image, rgb, stats, used_fallback = _slab_decode_step(
            params, latent, valid_hw, decoder_cfg, cfg2, precision, mesh,
            tail_levels, halo, ev, bucketed=False)
    # same contract as hdr_decode (decode/pipeline.py): the standard
    # decode is only returned when asked for
    return HDRDecodeResult(image=image,
                           standard=rgb if cfg.keep_standard else None,
                           stats=stats, used_fallback=used_fallback)


def sharded_tiled_decode(params: Params, latent: jnp.ndarray,
                         decoder_cfg: DecoderConfig = DecoderConfig(),
                         cfg: HDRDecodeConfig = HDRDecodeConfig(),
                         *, mesh: Optional[Mesh] = None,
                         latent_tile: int = 64, latent_overlap: int = 8,
                         norm_stats: str = "global",
                         precision: Precision = Precision()) -> jnp.ndarray:
    """Overlap-tiled HDR decode sharded across a device mesh.

    latent: [B, h, w, zc] NHWC.  ``latent_tile``/``latent_overlap`` are in
    latent space (x8 in pixels; defaults 64/8 -> 512px tiles, 64px halo,
    matching the reference's pixel-space tiling constants).

    NOTE: for sharded DECODE prefer :func:`sharded_slab_decode` — exact
    through attention AND GroupNorm with no extra stats pass.  This tile-grid
    executor remains for square-tile workloads (it is the shape the
    upscaler shards in) and as the reference-semantics tiling.

    Seam strategy is halo-crop (exact for the conv stack) plus GroupNorm
    statistics control via ``norm_stats``:
      - "global" (default): one whole-image decode collects a GN tape that
        every tile replays — tiles share EXACT whole-image statistics and
        the residual seam error is only the tile-local attention (~0.6%).
        Costs one extra non-tiled forward, so it parallelizes decode
        without reducing peak memory.
      - "per_tile": each tile normalizes with its own stats — the
        memory-bounded mode for images whose whole-image activations would
        not fit HBM; larger (documented) seam error.
    (The experimental ``stats_downsample`` knob was REMOVED: downsampled
    stats injection produced garbage on random weights — decoder
    activations are not scale-invariant — and could not be validated
    without a real checkpoint.)
    """
    if norm_stats not in ("global", "per_tile"):
        raise ValueError(f"norm_stats must be 'global' or 'per_tile', "
                         f"got {norm_stats!r}")
    zc = decoder_cfg.z_channels
    if latent.ndim != 4:
        raise ValueError(f"latent must be 4D, got shape {latent.shape}")
    if latent.shape[-1] != zc:
        if latent.shape[1] == zc:
            latent = jnp.transpose(latent, (0, 2, 3, 1))  # NCHW -> NHWC
        else:
            raise ValueError(
                f"latent shape {latent.shape} has no {zc}-channel axis")
    if mesh is None:
        mesh = make_mesh()
    axis_name = mesh.axis_names[0]
    n_dev = mesh.devices.size

    plan = plan_tiles(latent.shape[1], latent.shape[2], latent_tile,
                      latent_overlap)
    tiles = extract_tiles(latent, plan)       # [T, B, th, tw, zc]
    tiles, _ = _pad_tiles(tiles, n_dev)

    params = _replicate_params(params, mesh)
    tiles = jax.device_put(
        tiles, NamedSharding(mesh, P(axis_name)))

    global_stats = norm_stats == "global"
    stats_latent = latent if global_stats else jnp.zeros((), jnp.float32)

    image, rgb, used_fallback = _sharded_decode_step(
        params, tiles, stats_latent, decoder_cfg, cfg, precision, plan,
        mesh, axis_name, global_stats)
    return image


# ---------------------------------------------------------------------------
# Mesh-sharded two-pass HDR upscale (DP over the tile grid)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit,
                   static_argnames=("model_cfg", "architecture",
                                    "precision", "mesh", "axis_name"))
def _sharded_upscale_step(params: Params, both: jnp.ndarray, model_cfg,
                          architecture: str, precision: Precision,
                          mesh: Mesh, axis_name: str) -> jnp.ndarray:
    """both: [2T_pad, B, th, tw, 3] sharded on the tile axis; each device
    maps its chunk through the model + inverse activation."""
    from hdrvae.models.zoo import upscaler_apply
    from hdrvae.upscale.pipeline import get_reversal_fn

    reversal = get_reversal_fn(architecture)

    def run_chunk(p, chunk):
        def one(t):
            return reversal(upscaler_apply(p, t, model_cfg,
                                           precision=precision))
        return jax.lax.map(one, chunk)

    return shard_map(run_chunk, mesh=mesh,
                     in_specs=(P(), P(axis_name)),
                     out_specs=P(axis_name),
                     check_vma=False)(params, both)


def sharded_hdr_upscale(params: Params, image: jnp.ndarray,
                        model_cfg, cfg=None, *,
                        architecture: str = "ESRGAN",
                        mesh: Optional[Mesh] = None,
                        precision: Precision = Precision()):
    """Two-pass HDR upscale with the tile grid sharded over a device mesh.

    The upscaler is perfectly data-parallel over tiles — unlike the
    decoder there are no cross-tile statistics (no GroupNorm tape, no
    psum), so BOTH passes' tiles (unclamped + clamped,
    `hdr_upscale_with_model.py:180-186`) are stacked on one axis and
    sharded across the mesh; each device runs its chunk through
    ``lax.map`` (batch-1 conv optimum, PERF_NOTES.md section 1) and only
    the stitched full-resolution tensors are assembled for the YCbCr
    recombination.  Semantics match :func:`hdrvae.upscale.pipeline.
    hdr_upscale` exactly (asserted in test_sharding.py).
    """
    from hdrvae.core.config import UpscaleConfig
    from hdrvae.upscale.filters import gaussian_blur
    from hdrvae.upscale.pipeline import (_recombine, _select_pass_tile,
                                         UpscaleResult)

    if cfg is None:
        cfg = UpscaleConfig()
    if image.ndim != 4 or image.shape[-1] != 3:
        raise ValueError(f"expected [B, H, W, 3] image, got {image.shape}")
    if mesh is None:
        mesh = make_mesh()
    axis_name = mesh.axis_names[0]
    n_dev = mesh.devices.size
    image = image.astype(jnp.float32)

    in_filtered = image
    if cfg.small_blur:
        in_filtered = gaussian_blur(image, kernel_size=3, sigma=0.1)
    clamped_in = jnp.clip(in_filtered, cfg.color_stable_min,
                          cfg.color_stable_max)

    tile = _select_pass_tile(in_filtered, model_cfg, cfg, precision)

    params = _replicate_params(params, mesh)
    shard = NamedSharding(mesh, P(axis_name))

    def run_both(t1, t2):
        """Stack both passes' tiles on the sharded axis, run, split."""
        both = jnp.concatenate([t1, t2], axis=0)
        both, _ = _pad_tiles(both, n_dev)
        both = jax.device_put(both, shard)
        out = _sharded_upscale_step(params, both, model_cfg, architecture,
                                    precision, mesh, axis_name)
        n = t1.shape[0]
        return out[:n], out[n:2 * n]

    if cfg.tiling.seam_mode == "comfy":
        # ComfyUI grid semantics: variable-size edge tiles — shard each
        # same-shape group (at most four model shapes, same grouping as
        # tiled_apply_comfy).  Grid + blending semantics live ONLY in
        # plan_tiles_comfy/blend_tiles_comfy (shared with tiled.py);
        # this branch re-implements just the stack/scatter mechanics,
        # and test_sharding asserts equality with the single-device
        # pipeline.
        from hdrvae.tiling.tiled import blend_tiles_comfy, plan_tiles_comfy
        plan_c = plan_tiles_comfy(image.shape[1], image.shape[2], tile,
                                  cfg.tiling.overlap)
        groups: Dict[Tuple[int, int], list] = {}
        for i, (_, _, th, tw) in enumerate(plan_c.tiles):
            groups.setdefault((th, tw), []).append(i)
        outs_u = [None] * plan_c.num_tiles
        outs_c = [None] * plan_c.num_tiles
        for (th, tw), idxs in groups.items():
            t1 = jnp.stack([in_filtered[:, y:y + th, x0:x0 + tw, :]
                            for (y, x0, _, _) in
                            (plan_c.tiles[i] for i in idxs)], axis=0)
            t2 = jnp.stack([clamped_in[:, y:y + th, x0:x0 + tw, :]
                            for (y, x0, _, _) in
                            (plan_c.tiles[i] for i in idxs)], axis=0)
            ou, oc = run_both(t1, t2)
            for j, i in enumerate(idxs):
                outs_u[i] = ou[j]
                outs_c[i] = oc[j]
        s_unclamped = blend_tiles_comfy(outs_u, plan_c,
                                        scale=model_cfg.scale)
        s_clamped = blend_tiles_comfy(outs_c, plan_c,
                                      scale=model_cfg.scale)
    else:
        plan = plan_tiles(image.shape[1], image.shape[2], tile,
                          cfg.tiling.overlap)
        ou, oc = run_both(extract_tiles(in_filtered, plan),
                          extract_tiles(clamped_in, plan))
        s_unclamped = blend_tiles(ou, plan, scale=model_cfg.scale,
                                  mode=cfg.tiling.seam_mode)
        s_clamped = blend_tiles(oc, plan, scale=model_cfg.scale,
                                mode=cfg.tiling.seam_mode)
    s_final = _recombine(s_unclamped, s_clamped, in_filtered, cfg)
    return UpscaleResult(image=s_final.astype(jnp.float32),
                         unclamped=s_unclamped, clamped=s_clamped)

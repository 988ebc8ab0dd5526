"""Pallas 3x3 SAME convolutions for the decoder up-stack (NHWC, bf16 MXU).

Motivation (PERF_NOTES.md sections 2-3): XLA:TPU's conv emitters run the
decoder's large up-stack convs at ~50% MXU with the GroupNorm statistic
reductions fused into their epilogues; the SAME-padding pre-pads and
nearest-upsample chains between convs add ~15% of device time in pure
data movement.  These kernels own the whole conv path so that

  * no XLA conv fusion ever borders a Pallas custom call (the round-1
    layout trap, `kernels/epilogue.py:158-171`): operands/results use
    only default-layout NHWC arrays;
  * SAME padding costs nothing: chain activations live in PADDED
    buffers [H+2, W+16, C] with the interior at rows [1, H+1), columns
    [8, W+8) and an *uninitialized* border (consumers zero or mask
    their slab frame), so every halo'd slab DMA is a single
    always-in-bounds descriptor — no `jnp.pad` copies in the XLA graph
    and no boundary-variant DMA branching (which cold-compiled 100x
    slower);
  * the 2x nearest upsample is fused into the following conv as a
    2x2-phase decomposition (2.25x fewer MACs than conv-on-upsampled,
    and the broadcast/reshape materialization disappears);
  * each conv can apply the previous GroupNorm's affine + SiLU as an
    in-place slab prologue and emit the per-group (sum, sumsq) of its
    output, so no GN reduce->broadcast chain remains in XLA (the b>=2
    layout pathology of PERF_NOTES.md section 1 never arises).

Decomposition: grid (row_blocks, col_blocks, cout_chunks); each (row,
col) block DMAs a halo'd slab [BR+2, WB+16, Cin] from the padded input
into VMEM (double-buffered, the next slab loads while this one
multiplies; stored column s of the slab holds image column
bj*WB - 8 + s, so every offset stays sublane-aligned) and accumulates
the nine (sixteen, for the upsample form) shifted [BR, WB, Cin] x
[Cin, CB] MXU contractions in float32.  Padded outputs are written with
a manual double-buffered DMA (interior offsets (1, 8) are not
BlockSpec-expressible); unpadded outputs (chain exits) use BlockSpec.
Column blocking keeps the working set in VMEM at real row-block sizes
even at 2048/4096 image widths, where a full-width slab would force
BR=1.

Reference behavior being replaced: the torch/cuDNN `F.conv2d` +
`F.interpolate` calls inside the reference's decoder substrate (ComfyUI
VAE; `hdr_vae_decode.py` delegates to `vae.first_stage_model.decoder`).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for picking block sizes.  v5e has 16 MiB of scoped VMEM
# per core; the models below account for every large buffer (including
# the whole-slab register materialization `xs[sl]`), so the budget can
# sit close to the physical limit.  Calibrated against a
# compiler-reported 16.5M allocation for a configuration the model put
# at 15.1M.
_VMEM_BUDGET = 15 * 1024 * 1024

# Column margin: stored column s of a padded buffer/slab holds image
# column s - _MG, so every DMA offset is a lane-tile multiple while the
# three tap alignments read at offsets {7, 8, 9}.
_MG = 8


def pad_chain_input(x: jnp.ndarray) -> jnp.ndarray:
    """[H, W, C] -> the padded chain layout [H+2, W+16, C] (XLA pad;
    used once per chain entry — everything downstream stays padded)."""
    return jnp.pad(x, ((1, 1), (_MG, _MG), (0, 0)))


def _slab_dma(x_hbm, xs, sems, slot, bi, bj, op, *, br, wb, row0=0,
              rows=None):
    """Start/wait the halo'd slab copy for block (bi, bj) from a PADDED
    input [H+2, W+16, Cin]: rows [row0 + bi*br, + (rows or br + 2)) x
    columns [bj*wb, bj*wb + wb + 16) — always in bounds, one
    descriptor.  ``row0``/``rows`` serve inputs carrying EXTRA row
    padding (the [H+4, W+16] double-padded layout of the streaming
    top level): row0=1 reads the same window as the default from a
    [H+4] buffer; rows=br+4 widens the window for 2-row halos."""
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(row0 + bi * br, rows or br + 2),
                 pl.ds(bj * wb, wb + 2 * _MG)],
        xs.at[slot],
        sems.at[slot])
    dma.start() if op == "start" else dma.wait()


def _zero_frames(xs, sl, bi, bj, *, nr, nj, br, wb, cin):
    """Zero the slab frame rows/columns that fall in the padded border
    (uninitialized memory) for image-boundary blocks.  Every kernel —
    with or without a prologue — runs this on its input slab: the
    prologue applies GN-affine+SiLU in place WITHOUT a border mask
    (the per-row where-mask it once carried was measured pure overhead
    once the frames are zeroed first), so this conditional zeroing is
    the only thing keeping stale garbage — even inf/nan — out of the
    border taps."""
    wm = wb + 2 * _MG

    @pl.when(bi == 0)
    def _top():
        xs[sl, pl.ds(0, 1)] = jnp.zeros((1, wm, cin), xs.dtype)

    @pl.when(bi == nr - 1)
    def _bot():
        xs[sl, pl.ds(br + 1, 1)] = jnp.zeros((1, wm, cin), xs.dtype)

    @pl.when(bj == 0)
    def _left():
        xs[sl, :, pl.ds(0, _MG)] = jnp.zeros((br + 2, _MG, cin), xs.dtype)

    @pl.when(bj == nj - 1)
    def _right():
        xs[sl, :, pl.ds(wb + _MG, _MG)] = jnp.zeros((br + 2, _MG, cin),
                                                    xs.dtype)


def _fused_conv_kernel(*refs, br: int, wb: int, cb: int, h: int, w: int,
                       prologue: bool, res: str, emit: bool, gs: int,
                       owned: bool, padded_out: bool, nc: int):
    """General conv step on a (row, col, cout-chunk) grid:

      y = conv3x3(silu(x * gamma + beta)) [+ r | + r @ rk] (+ bias)

    optionally emitting per-group (sum, sumsq) of y for the NEXT layer's
    GroupNorm.  The prologue is applied to the raw slab IN PLACE one row
    at a time (bounded f32 live set) with out-of-image rows/columns
    zeroed, so x is stored UNnormalized — exactly the decoder's
    dataflow, recomputing the halo's prologue instead of materializing
    the normalized map in HBM.
    """
    it = iter(refs)
    x_hbm = next(it)                     # padded [h+2, w+16, cin], ANY
    w_ref = next(it)
    b_ref = next(it)
    if prologue:
        g_ref = next(it)                 # [1, cin] f32
        bt_ref = next(it)                # [1, cin] f32
    r_hbm = next(it) if res != "none" else None   # padded residual, ANY
    rk_ref = next(it) if res == "proj" else None  # [cr, cout] resident
    bounds_ref = next(it) if owned else None      # [1, 2] int32 SMEM
    o_ref = next(it)                     # ANY (padded) or VMEM block
    if emit:
        ssum_ref = next(it)              # [n_chunks, gcb] accumulated
        ssq_ref = next(it)
    xs = next(it)
    sems = next(it)
    if res != "none":
        rs = next(it)                    # (2, br, wb, cr) residual slots
        rsems = next(it)
    if padded_out:
        os_ = next(it)                   # (2, br, wb, cb) output slots
        osems = next(it)

    bi = pl.program_id(0)
    bj = pl.program_id(1)
    co = pl.program_id(2)
    nr = pl.num_programs(0)
    nj = pl.num_programs(1)
    bid = bi * nj + bj
    step = bid * nc + co
    total = nr * nj * nc
    sl = bid % 2
    _, _, wm, cin = xs.shape             # wm = wb + 2*_MG

    def res_dma(slot, rbi, rbj, op):
        dma = pltpu.make_async_copy(
            r_hbm.at[pl.ds(1 + rbi * br, br),
                     pl.ds(_MG + rbj * wb, wb)],
            rs.at[slot], rsems.at[slot])
        dma.start() if op == "start" else dma.wait()

    @pl.when(jnp.logical_and(bid == 0, co == 0))
    def _warmup():
        _slab_dma(x_hbm, xs, sems, 0, 0, 0, "start", br=br, wb=wb)
        if res != "none":
            res_dma(0, 0, 0, "start")

    @pl.when(co == 0)
    def _sync():
        _slab_dma(x_hbm, xs, sems, sl, bi, bj, "wait", br=br, wb=wb)
        if res != "none":
            res_dma(sl, bi, bj, "wait")

        @pl.when(bid + 1 < nr * nj)
        def _prefetch():
            nbj = jnp.where(bj + 1 < nj, bj + 1, 0)
            nbi = jnp.where(bj + 1 < nj, bi, bi + 1)
            _slab_dma(x_hbm, xs, sems, (bid + 1) % 2, nbi, nbj, "start",
                      br=br, wb=wb)
            if res != "none":
                res_dma((bid + 1) % 2, nbi, nbj, "start")

        if prologue:
            # Normalize the slab IN PLACE, one row at a time: the f32
            # temporaries stay [1, wm, cin]-sized (Mosaic materializes
            # whole-vector elementwise chains, so a slab-sized f32 chain
            # would cost 2x the slab in VMEM and force tiny row blocks),
            # and the work happens once per block instead of once per
            # (block, cout-chunk) grid step.

            def _row(r, _):
                xr = xs[sl, pl.ds(r, 1)]          # [1, wm, cin]
                z = (xr.astype(jnp.float32) * g_ref[0][None, None, :]
                     + bt_ref[0][None, None, :])
                z = z * jax.nn.sigmoid(z)
                xs[sl, pl.ds(r, 1)] = z.astype(xs.dtype)
                return 0

            jax.lax.fori_loop(0, br + 2, _row, 0, unroll=False)

        # Out-of-image rows/columns (the padded border) are zeroed
        # AFTER the prologue as conditional border writes — stale
        # border memory and silu(gamma*0 + beta) != 0 must not leak
        # into the taps, and the conditional writes replace a per-row
        # iota/where mask (the same rewrite saved 30 ms/4K-call in the
        # junction kernel, PERF_NOTES 5.2).  Interior blocks' margins
        # hold valid neighbor halo data and are left untouched.
        _zero_frames(xs, sl, bi, bj, nr=nr, nj=nj, br=br, wb=wb,
                     cin=cin)

    slab = xs[sl]                         # [br+2, wm, cin]
    acc = None
    for di in range(3):
        for dj in range(3):
            patch = slab[di:di + br, _MG - 1 + dj:_MG - 1 + dj + wb, :]
            part = jax.lax.dot_general(
                patch, w_ref[di, dj, :, pl.ds(co * cb, cb)],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                              # [br, wb, cb]
            acc = part if acc is None else acc + part

    acc = acc + b_ref[0, pl.ds(co * cb, cb)].astype(jnp.float32)
    if res == "add":
        acc = acc + rs[sl, :, :, pl.ds(co * cb, cb)].astype(jnp.float32)
    elif res == "proj":
        acc = acc + jax.lax.dot_general(
            rs[sl], rk_ref[:, pl.ds(co * cb, cb)],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if padded_out:
        oslot = step % 2
        fc = nc == 1

        @pl.when(step >= 2)
        def _free():
            # Reclaim the slot written 2 steps ago (byte-counted wait;
            # identical transfer size every step).
            _out_dma(o_ref, os_, osems, oslot, bi, bj, co, "wait",
                     br=br, wb=wb, cb=cb, full_c=fc)

        y = acc.astype(os_.dtype)
        os_[oslot] = y
        _out_dma(o_ref, os_, osems, oslot, bi, bj, co, "start",
                 br=br, wb=wb, cb=cb, full_c=fc)

        @pl.when(step == total - 1)
        def _drain():
            _out_dma(o_ref, os_, osems, oslot, bi, bj, co, "wait",
                     br=br, wb=wb, cb=cb, full_c=fc)
            if total >= 2:
                _out_dma(o_ref, os_, osems, 1 - oslot, bi, bj, co,
                         "wait", br=br, wb=wb, cb=cb, full_c=fc)
    else:
        y = acc.astype(o_ref.dtype)
        o_ref[...] = y

    if emit:
        _emit_stats(y, ssum_ref, ssq_ref, bid, co, cb=cb, gs=gs,
                    bounds_ref=bounds_ref, row_base=bi * br)


def _out_dma(o_hbm, os_, osems, slot, bi, bj, co, op, *, br, wb, cb,
             full_c: bool = False):
    """Manual write of one output block into the padded output's
    interior: rows [1 + bi*br, +br), columns [8 + bj*wb, +wb) (both
    offsets legal: rows are the major dim, 8 + bj*wb is lane-aligned),
    channels [co*cb, +cb).  ``full_c``: the block spans every channel —
    skip the channel slice (HBM channel slices must be lane-tile (128)
    multiples, which cb < 128 single-chunk layouts are not)."""
    if full_c:
        dst = o_hbm.at[pl.ds(1 + bi * br, br), pl.ds(_MG + bj * wb, wb)]
    else:
        dst = o_hbm.at[pl.ds(1 + bi * br, br), pl.ds(_MG + bj * wb, wb),
                       pl.ds(co * cb, cb)]
    dma = pltpu.make_async_copy(os_.at[slot], dst, osems.at[slot])
    dma.start() if op == "start" else dma.wait()


def _emit_stats(y, ssum_ref, ssq_ref, bid, co, *, cb: int, gs: int,
                bounds_ref=None, row_base=None):
    """Accumulate per-group (sum, sumsq) of y [.., .., cb] as STORED
    (post storage-dtype rounding), matching the XLA fast path where GN
    re-reads the bf16 activation.  With ``bounds_ref`` ([1, 2] int32 in
    SMEM: owned [lo, hi) rows at this layer's resolution) only rows this
    shard OWNS contribute — the per-slab partials of an exact
    whole-image statistic under slab sharding (halo rows masked so no
    pixel is counted twice); ``row_base`` is the first output row of
    this grid step, ``bid`` the linear (row, col) block id."""
    gcb = cb // gs
    yf = y.astype(jnp.float32)
    if bounds_ref is not None:
        rows = jax.lax.broadcasted_iota(jnp.int32, yf.shape, 0) + row_base
        ok = jnp.logical_and(rows >= bounds_ref[0, 0],
                             rows < bounds_ref[0, 1])
        yf = jnp.where(ok, yf, 0.0)
    s1 = jnp.sum(yf, axis=(0, 1)).reshape(1, cb)
    s2 = jnp.sum(jnp.square(yf), axis=(0, 1)).reshape(1, cb)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (cb, gcb), 0) // gs
              == jax.lax.broadcasted_iota(jnp.int32, (cb, gcb), 1)
              ).astype(jnp.float32)
    g1 = jnp.dot(s1, onehot, preferred_element_type=jnp.float32)
    g2 = jnp.dot(s2, onehot, preferred_element_type=jnp.float32)

    @pl.when(bid == 0)
    def _init():
        ssum_ref[co, :] = g1[0]
        ssq_ref[co, :] = g2[0]

    @pl.when(bid > 0)
    def _acc():
        ssum_ref[co, :] += g1[0]
        ssq_ref[co, :] += g2[0]


def fused_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                  *, gamma: Optional[jnp.ndarray] = None,
                  beta: Optional[jnp.ndarray] = None,
                  residual: Optional[jnp.ndarray] = None,
                  res_kernel: Optional[jnp.ndarray] = None,
                  emit_stats: bool = False,
                  num_groups: int = 32,
                  out_dtype=None,
                  block_rows: Optional[int] = None,
                  block_cols: Optional[int] = None,
                  cout_block: Optional[int] = None,
                  owned_rows: Optional[jnp.ndarray] = None,
                  x_padded: bool = False,
                  residual_padded: bool = False,
                  padded_out: bool = False,
                  donate_residual: bool = False):
    """Fused up-stack conv step (see `_fused_conv_kernel`).

    ``donate_residual`` — alias the output onto the residual's buffer
    (`input_output_aliases`).  Safe because the residual is consumed
    BLOCK-ALIGNED (no halo: block (i, j) reads exactly the rows/cols it
    writes, and the write starts only after that block's read), so the
    in-place update never races the pipeline's prefetches.  Caller must
    guarantee the residual has no later consumers.  This is what keeps
    identity-residual levels at TWO live feature maps instead of three
    — at 4096^2 each is 4 GB and the difference decides whether
    whole-image decode fits HBM (PERF_NOTES.md section 5).

    x [H, W, Cin] — or, with ``x_padded``, the chain layout
    [H+2, W+16, Cin] (`pad_chain_input`); gamma/beta [Cin] f32 enable
    the GroupNorm-apply + SiLU prologue; residual [H, W, Cout] (padded
    iff ``residual_padded``) is added, or projected through
    ``res_kernel`` [Cr, Cout] first (the ResNet nin_shortcut — fold its
    bias into ``bias``).  With ``emit_stats`` the call also returns
    (sum, sumsq) per GroupNorm group of the OUTPUT, shape [G] each;
    ``owned_rows`` (traced int32 [2]: [lo, hi) at this layer's
    resolution) restricts the emitted statistics to the rows this slab
    shard owns.  With ``padded_out`` the result uses the chain layout
    with an UNINITIALIZED border (only feed it to other chain kernels).
    """
    if not x_padded:
        x = pad_chain_input(x)
    hp, wp, cin = x.shape
    h, w = hp - 2, wp - 2 * _MG
    assert kernel.shape[:3] == (3, 3, cin), (kernel.shape, x.shape)
    assert w % 8 == 0, w
    cout = kernel.shape[-1]
    out_dtype = out_dtype or x.dtype
    prologue = gamma is not None
    res = "none" if residual is None else (
        "proj" if res_kernel is not None else "add")
    if residual is not None and not residual_padded:
        residual = pad_chain_input(residual)
    gs = cout // num_groups if emit_stats else 1
    cb = cout_block or min(cout, 128)
    assert cout % cb == 0 and cb % gs == 0, (cout, cb, gs)
    nc = cout // cb
    gcb = cb // gs

    if block_rows:
        br, wb = block_rows, block_cols or w
    else:
        br, wb = pick_blocks(
            h, w, cin, cout, x.dtype.itemsize, cout_block=cb,
            prologue=prologue,
            res_channels=(residual.shape[-1] if residual is not None
                          else 0))
    assert h % br == 0 and w % wb == 0 and wb % 8 == 0, (h, br, w, wb)
    nj = w // wb
    cr = residual.shape[-1] if residual is not None else 0

    owned = owned_rows is not None
    kern = functools.partial(_fused_conv_kernel, br=br, wb=wb, cb=cb,
                             h=h, w=w, prologue=prologue, res=res,
                             emit=emit_stats, gs=gs, owned=owned,
                             padded_out=padded_out, nc=nc)

    vm = dict(memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((3, 3, cin, cout), lambda i, j, co: (0, 0, 0, 0),
                     **vm),
        pl.BlockSpec((1, cout), lambda i, j, co: (0, 0), **vm),
    ]
    operands = [x, kernel, bias.reshape(1, cout)]
    if prologue:
        in_specs += [pl.BlockSpec((1, cin), lambda i, j, co: (0, 0), **vm),
                     pl.BlockSpec((1, cin), lambda i, j, co: (0, 0), **vm)]
        operands += [gamma.astype(jnp.float32).reshape(1, cin),
                     beta.astype(jnp.float32).reshape(1, cin)]
    if res != "none":
        assert residual.shape == (h + 2, w + 2 * _MG, cr), residual.shape
        if res == "add":
            assert cr == cout, ("'add' residual channels must equal "
                                "cout; use res_kernel", cr, cout)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(residual)
    if res == "proj":
        assert res_kernel.shape == (cr, cout), res_kernel.shape
        in_specs.append(pl.BlockSpec((cr, cout), lambda i, j, co: (0, 0),
                                     **vm))
        operands.append(res_kernel)
    if owned:
        in_specs.append(pl.BlockSpec((1, 2), lambda i, j, co: (0, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(jnp.asarray(owned_rows, jnp.int32).reshape(1, 2))

    if padded_out:
        out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
        out_shape = [jax.ShapeDtypeStruct((h + 2, w + 2 * _MG, cout),
                                          out_dtype)]
    else:
        out_specs = [pl.BlockSpec((br, wb, cb),
                                  lambda i, j, co: (i, j, co), **vm)]
        out_shape = [jax.ShapeDtypeStruct((h, w, cout), out_dtype)]
    if emit_stats:
        out_specs += [pl.BlockSpec((nc, gcb), lambda i, j, co: (0, 0),
                                   **vm)] * 2
        out_shape += [jax.ShapeDtypeStruct((nc, gcb), jnp.float32)] * 2

    scratch = [
        pltpu.VMEM((2, br + 2, wb + 2 * _MG, cin), x.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if res != "none":
        scratch += [pltpu.VMEM((2, br, wb, cr), residual.dtype),
                    pltpu.SemaphoreType.DMA((2,))]
    if padded_out:
        scratch += [pltpu.VMEM((2, br, wb, cb), out_dtype),
                    pltpu.SemaphoreType.DMA((2,))]

    aliases = {}
    if donate_residual:
        assert (res == "add" and padded_out
                and residual.dtype == out_dtype), (res, padded_out)
        aliases = {3 + (2 if prologue else 0): 0}

    call = pl.pallas_call(
        kern,
        name=(f"fconv_{h}x{w}_{cin}to{cout}_br{br}w{wb}_{res}"
              + ("_gn" if prologue else "") + ("_st" if emit_stats else "")),
        grid=(h // br, nj, nc),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w * cin * cout * 9
            + (2 * h * w * cr * cout if res == "proj" else 0),
            bytes_accessed=(h * w * cin + 2 * h * w * cout)
            * x.dtype.itemsize + 9 * cin * cout * kernel.dtype.itemsize,
            transcendentals=h * w * cin if prologue else 0,
        ),
    )
    outs = call(*operands)
    if emit_stats:
        y, ssum, ssq = outs
        return y, (ssum.reshape(cout // gs), ssq.reshape(cout // gs))
    return outs[0]


# ---------------------------------------------------------------------------
# Fused 2x nearest-upsample + 3x3 conv (2x2-phase decomposition)
# ---------------------------------------------------------------------------

# Row/column tap sets of the phase decomposition: output pixel (2i+a, .)
# of conv3x3(nearest2x(x)) reads input rows {i-1+u : u, a as below} with
# the 3x3 taps partitioned per phase:
#   a=0: u=0 <- {W row 0},    u=1 <- {W rows 1,2}
#   a=1: u=0 <- {W rows 0,1}, u=1 <- {W row 2}
# (same for columns with b, v).  _PHASE_SELECT[a, u, di] = di in set.
# (numpy, NOT jnp: this module is lazily imported, possibly inside a jit
# trace, and a module-level jnp constant would leak that trace's tracer.)
_PHASE_SELECT = np.array(
    [[[1, 0, 0], [0, 1, 1]],
     [[1, 1, 0], [0, 0, 1]]], np.float32)


def phase_kernels(kernel: jnp.ndarray) -> jnp.ndarray:
    """Collapse a [3, 3, Cin, Cout] SAME-conv kernel into the sixteen
    [2, 2, 2, 2, Cin, Cout] (a, b, u, v) phase kernels of
    conv3x3 о nearest2x."""
    return jnp.einsum("aud,bve,decf->abuvcf", _PHASE_SELECT,
                      _PHASE_SELECT, kernel.astype(jnp.float32)
                      ).astype(kernel.dtype)


def _upsample_conv_kernel(*refs, br: int, wb: int, cb: int, h: int,
                          w: int, emit: bool, gs: int, owned: bool,
                          padded_out: bool, nc: int, act=None,
                          dep: bool = False, write_y: bool = True,
                          row0: int = 0, store_dtype=None):
    """One grid step of the fused upsample+conv: input block
    (bi, bj) -> output rows [2*bi*br, +2*br) x cols [2*bj*wb, +2*wb),
    all four phases accumulated from the (at most 9) shifted input
    patches and interleaved in-register.  ``write_y=False`` is the
    statistics-only pass of the streaming top level: y is computed and
    rounded to ``store_dtype`` for the emitted (sum, sumsq) but never
    leaves VMEM — the full-size output buffer does not exist."""
    it = iter(refs)
    x_hbm = next(it)
    k_ref = next(it)
    b_ref = next(it)
    bounds_ref = next(it) if owned else None
    if dep:
        next(it)   # `after` scheduling fence: never read
    o_ref = next(it) if write_y else None
    ssum_ref = next(it) if emit else None
    ssq_ref = next(it) if emit else None
    xs = next(it)
    sems = next(it)
    if write_y and padded_out:
        os_ = next(it)
        osems = next(it)

    bi = pl.program_id(0)
    bj = pl.program_id(1)
    co = pl.program_id(2)
    nr = pl.num_programs(0)
    nj = pl.num_programs(1)
    bid = bi * nj + bj
    step = bid * nc + co
    total = nr * nj * nc
    sl = bid % 2
    _, _, wm, cin = xs.shape

    @pl.when(jnp.logical_and(bid == 0, co == 0))
    def _warmup():
        _slab_dma(x_hbm, xs, sems, 0, 0, 0, "start", br=br, wb=wb,
                  row0=row0)

    @pl.when(co == 0)
    def _sync():
        _slab_dma(x_hbm, xs, sems, sl, bi, bj, "wait", br=br, wb=wb,
                  row0=row0)

        @pl.when(bid + 1 < nr * nj)
        def _prefetch():
            nbj = jnp.where(bj + 1 < nj, bj + 1, 0)
            nbi = jnp.where(bj + 1 < nj, bi, bi + 1)
            _slab_dma(x_hbm, xs, sems, (bid + 1) % 2, nbi, nbj, "start",
                      br=br, wb=wb, row0=row0)

        _zero_frames(xs, sl, bi, bj, nr=nr, nj=nj, br=br, wb=wb, cin=cin)

    slab = xs[sl]
    bias = b_ref[0, pl.ds(co * cb, cb)].astype(jnp.float32)
    phases = []
    for a in range(2):
        row_ph = []
        for b in range(2):
            acc = None
            for u in range(2):
                for v in range(2):
                    patch = slab[a + u:a + u + br,
                                 _MG - 1 + b + v:_MG - 1 + b + v + wb, :]
                    part = jax.lax.dot_general(
                        patch, k_ref[a, b, u, v],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                      # [br, wb, cb]
                    acc = part if acc is None else acc + part
            accb = acc + bias
            if act == "lrelu":
                accb = jnp.where(accb >= 0, accb, 0.2 * accb)
            row_ph.append(accb)
        phases.append(row_ph)

    # Interleave: out[2i+a, 2j+b] = phases[a][b][i, j].
    t0 = jnp.stack([phases[0][0], phases[0][1]], axis=2)  # [br, wb, 2, cb]
    t1 = jnp.stack([phases[1][0], phases[1][1]], axis=2)
    z = jnp.stack([t0, t1], axis=1)                      # [br, 2, wb, 2, cb]
    y32 = z.reshape(2 * br, 2 * wb, cb)

    if not write_y:
        y = y32.astype(store_dtype)
    elif padded_out:
        oslot = step % 2
        fc = nc == 1

        @pl.when(step >= 2)
        def _free():
            _up_out_dma(o_ref, os_, osems, oslot, bi, bj, co, "wait",
                        br=br, wb=wb, cb=cb, full_c=fc)

        y = y32.astype(os_.dtype)
        os_[oslot] = y
        _up_out_dma(o_ref, os_, osems, oslot, bi, bj, co, "start",
                    br=br, wb=wb, cb=cb, full_c=fc)

        @pl.when(step == total - 1)
        def _drain():
            _up_out_dma(o_ref, os_, osems, oslot, bi, bj, co, "wait",
                        br=br, wb=wb, cb=cb, full_c=fc)
            if total >= 2:
                _up_out_dma(o_ref, os_, osems, 1 - oslot, bi, bj, co,
                            "wait", br=br, wb=wb, cb=cb, full_c=fc)
    else:
        y = y32.astype(o_ref.dtype)
        o_ref[...] = y

    if emit:
        _emit_stats(y, ssum_ref, ssq_ref, bid, co, cb=cb, gs=gs,
                    bounds_ref=bounds_ref, row_base=2 * bi * br)


def _up_out_dma(o_hbm, os_, osems, slot, bi, bj, co, op, *, br, wb, cb,
                full_c: bool = False):
    if full_c:
        dst = o_hbm.at[pl.ds(1 + 2 * bi * br, 2 * br),
                       pl.ds(_MG + 2 * bj * wb, 2 * wb)]
    else:
        dst = o_hbm.at[pl.ds(1 + 2 * bi * br, 2 * br),
                       pl.ds(_MG + 2 * bj * wb, 2 * wb),
                       pl.ds(co * cb, cb)]
    dma = pltpu.make_async_copy(os_.at[slot], dst, osems.at[slot])
    dma.start() if op == "start" else dma.wait()


def upsample_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray,
                     bias: jnp.ndarray, *,
                     emit_stats: bool = False,
                     num_groups: int = 32,
                     out_dtype=None,
                     block_rows: Optional[int] = None,
                     block_cols: Optional[int] = None,
                     cout_block: Optional[int] = None,
                     owned_rows: Optional[jnp.ndarray] = None,
                     x_padded: bool = False,
                     padded_out: bool = False,
                     act: Optional[str] = None,
                     after: Optional[jnp.ndarray] = None,
                     stats_only: bool = False,
                     x_row_offset: int = 0):
    """conv3x3(nearest_upsample_2x(x)) + bias (then ``act``: None |
    "lrelu") as ONE kernel.

    ``stats_only`` — compute and round y block-by-block in VMEM purely
    to emit its per-group (sum, sumsq); the [2H, 2W, Cout] output is
    never allocated.  This is pass 1 of the streaming top level: the
    GroupNorm moments of the upsampled map without its 8 GB (at 4K)
    HBM footprint.  Returns just the (sum, sumsq) pair.
    ``x_row_offset`` — x carries extra leading pad rows (the
    [H+2+2k, W+16] layout shared with `upconv_gn_conv3x3`); the slab
    window shifts down by this many rows.

    ``after`` — optional scheduling fence: the array is wired in as an
    ANY-space operand the kernel never reads, creating a true data
    dependency so XLA cannot start this call before ``after`` is
    produced.  `optimization_barrier` is NOT enough — the compiler
    splits variadic barriers per value and the joint ordering is lost
    (measured in the 4K low-memory decode, models/pallas_tail.py).

    x [H, W, Cin] (or the padded chain layout with ``x_padded``) ->
    [2H, 2W, Cout] (padded chain layout with ``padded_out``).  2.25x
    fewer MACs than upsampling then convolving (16 phase taps over HxW
    vs 9 taps over 2Hx2W), and the upsampled map is never materialized
    in HBM.  ``kernel`` is the plain [3, 3, Cin, Cout] conv kernel; the
    phase collapse happens here.  ``owned_rows`` ([lo, hi) at OUTPUT
    resolution) restricts the emitted statistics to the rows this slab
    shard owns.
    """
    if not x_padded:
        x = pad_chain_input(x)
    hp, wp, cin = x.shape
    h, w = hp - 2 - 2 * x_row_offset, wp - 2 * _MG
    assert kernel.shape[:3] == (3, 3, cin), (kernel.shape, x.shape)
    assert w % 8 == 0, w
    assert not stats_only or emit_stats
    cout = kernel.shape[-1]
    out_dtype = out_dtype or x.dtype
    gs = cout // num_groups if emit_stats else 1
    cb = cout_block or min(cout, 128)
    assert cout % cb == 0 and cb % gs == 0, (cout, cb, gs)
    nc = cout // cb
    gcb = cb // gs

    if block_rows:
        br, wb = block_rows, block_cols or w
    else:
        br, wb = pick_blocks_upsample(h, w, cin, cout, x.dtype.itemsize,
                                      cout_block=cb)
    assert h % br == 0 and w % wb == 0 and wb % 8 == 0, (h, br, w, wb)
    nj = w // wb

    pk = phase_kernels(kernel)

    owned = owned_rows is not None
    kern = functools.partial(_upsample_conv_kernel, br=br, wb=wb, cb=cb,
                             h=h, w=w, emit=emit_stats, gs=gs,
                             owned=owned, padded_out=padded_out, nc=nc,
                             act=act, dep=after is not None,
                             write_y=not stats_only, row0=x_row_offset,
                             store_dtype=out_dtype)
    vm = dict(memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((2, 2, 2, 2, cin, cb),
                     lambda i, j, co: (0, 0, 0, 0, 0, co), **vm),
        pl.BlockSpec((1, cout), lambda i, j, co: (0, 0), **vm),
    ]
    operands = [x, pk, bias.reshape(1, cout)]
    if owned:
        in_specs.append(pl.BlockSpec((1, 2), lambda i, j, co: (0, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(jnp.asarray(owned_rows, jnp.int32).reshape(1, 2))
    if after is not None:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(after)
    if stats_only:
        out_specs, out_shape = [], []
    elif padded_out:
        out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
        out_shape = [jax.ShapeDtypeStruct(
            (2 * h + 2, 2 * w + 2 * _MG, cout), out_dtype)]
    else:
        out_specs = [pl.BlockSpec((2 * br, 2 * wb, cb),
                                  lambda i, j, co: (i, j, co), **vm)]
        out_shape = [jax.ShapeDtypeStruct((2 * h, 2 * w, cout), out_dtype)]
    if emit_stats:
        out_specs += [pl.BlockSpec((nc, gcb), lambda i, j, co: (0, 0),
                                   **vm)] * 2
        out_shape += [jax.ShapeDtypeStruct((nc, gcb), jnp.float32)] * 2

    scratch = [
        pltpu.VMEM((2, br + 2, wb + 2 * _MG, cin), x.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if padded_out and not stats_only:
        scratch += [pltpu.VMEM((2, 2 * br, 2 * wb, cb), out_dtype),
                    pltpu.SemaphoreType.DMA((2,))]

    call = pl.pallas_call(
        kern,
        name=f"upconv_{h}x{w}_{cin}to{cout}_br{br}w{wb}"
             + ("_st" if emit_stats else "")
             + ("_statsonly" if stats_only else ""),
        grid=(h // br, nj, nc),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w * cin * cout * 16,
            bytes_accessed=(h * w * cin + (0 if stats_only
                                           else 2 * 4 * h * w * cout))
            * x.dtype.itemsize + 16 * cin * cout * kernel.dtype.itemsize,
            transcendentals=0,
        ),
    )
    outs = call(*operands)
    if stats_only:
        ssum, ssq = outs
        return (ssum.reshape(cout // gs), ssq.reshape(cout // gs))
    if emit_stats:
        y, ssum, ssq = outs
        return y, (ssum.reshape(cout // gs), ssq.reshape(cout // gs))
    return outs[0]


# ---------------------------------------------------------------------------
# Streaming upsample junction: upconv -> GroupNorm+SiLU -> conv3x3 fused
# ---------------------------------------------------------------------------


def _zero_frames2(xs, sl, bi, bj, *, nr, nj, br, wb, cin):
    """`_zero_frames` for the double-row-halo slab [br+4, wb+16, cin]:
    TWO border rows on each side fall outside the image at the first /
    last row block (the streaming kernel's phase grid reaches one
    low-res row past the block on both sides)."""
    wm = wb + 2 * _MG

    @pl.when(bi == 0)
    def _top():
        xs[sl, pl.ds(0, 2)] = jnp.zeros((2, wm, cin), xs.dtype)

    @pl.when(bi == nr - 1)
    def _bot():
        xs[sl, pl.ds(br + 2, 2)] = jnp.zeros((2, wm, cin), xs.dtype)

    @pl.when(bj == 0)
    def _left():
        xs[sl, :, pl.ds(0, _MG)] = jnp.zeros((br + 4, _MG, cin), xs.dtype)

    @pl.when(bj == nj - 1)
    def _right():
        xs[sl, :, pl.ds(wb + _MG, _MG)] = jnp.zeros((br + 4, _MG, cin),
                                                    xs.dtype)


def _upconv_gn_conv_kernel(*refs, br: int, wb: int, cb: int, h: int,
                           w: int, emit: bool, gs: int, nc: int,
                           store_dtype=None, tap_outer: bool = False):
    """One grid step of conv3x3(silu(gn(conv_up(nearest2x(x))))):

    The low-res slab (2-row halo) is upsample-convolved into a
    normalized high-res BAND held in VMEM — rows [2*bi*br - 2,
    +2*br + 4), one low-res row of overlap with the neighboring blocks'
    bands recomputed on each side — and the 3x3 conv reads the band
    directly.  The upsampled map never exists in HBM: at 4096^2 that
    buffer is 8 GB and pushes whole-image decode past HBM capacity
    (PERF_NOTES.md section 5).  Numerics match the unfused pair
    exactly: the band is rounded to the chain storage dtype before the
    GroupNorm affine, reproducing the HBM round trip it replaces.
    """
    it = iter(refs)
    x_hbm = next(it)                 # [h+4, w+16, cin]  ANY
    pk_ref = next(it)                # [2, 2, 2, 2, cin, cm]
    upb_ref = next(it)               # [1, cm]
    g_ref = next(it)                 # [1, cm] f32
    bt_ref = next(it)                # [1, cm] f32
    w1_ref = next(it)                # [3, 3, cm, cout]
    b1_ref = next(it)                # [1, cout]
    o_ref = next(it)                 # padded chain out, ANY
    ssum_ref = next(it) if emit else None
    ssq_ref = next(it) if emit else None
    xs = next(it)                    # (2, br+4, wb+16, cin)
    sems = next(it)
    band = next(it)                  # (2*br+4, 2*wb+4, cm)
    os_ = next(it)                   # (2, 2*br, 2*wb, cb)
    osems = next(it)

    bi = pl.program_id(0)
    bj = pl.program_id(1)
    co = pl.program_id(2)
    nr = pl.num_programs(0)
    nj = pl.num_programs(1)
    bid = bi * nj + bj
    step = bid * nc + co
    total = nr * nj * nc
    sl = bid % 2
    _, _, wm, cin = xs.shape
    cm = band.shape[-1]

    @pl.when(jnp.logical_and(bid == 0, co == 0))
    def _warmup():
        _slab_dma(x_hbm, xs, sems, 0, 0, 0, "start", br=br, wb=wb,
                  rows=br + 4)

    @pl.when(co == 0)
    def _sync():
        _slab_dma(x_hbm, xs, sems, sl, bi, bj, "wait", br=br, wb=wb,
                  rows=br + 4)

        @pl.when(bid + 1 < nr * nj)
        def _prefetch():
            nbj = jnp.where(bj + 1 < nj, bj + 1, 0)
            nbi = jnp.where(bj + 1 < nj, bi, bi + 1)
            _slab_dma(x_hbm, xs, sems, (bid + 1) % 2, nbi, nbj, "start",
                      br=br, wb=wb, rows=br + 4)

        _zero_frames2(xs, sl, bi, bj, nr=nr, nj=nj, br=br, wb=wb,
                      cin=cin)

        # Phase grid: low-res rows [bi*br - 1, +br + 2), cols
        # [bj*wb - 1, +wb + 2) — the block plus ONE low-res halo sample
        # on each side, so the phase planes carry the high-res halo the
        # 3x3 conv needs.  The planes are stored PHASE-PLANAR
        # ([2, 2, br+2, wb+2, cm]): interleaving them into a [2br+4,
        # 2wb+4] band cost 98 ms of sublane shuffles per 4K call
        # (PERF_NOTES section 5) — the follow-up conv reads the planes
        # directly instead.
        slab = xs[sl]
        upb = upb_ref[0].astype(jnp.float32)
        gam = g_ref[0].astype(jnp.float32)
        bet = bt_ref[0].astype(jnp.float32)
        for a in range(2):
            for b in range(2):
                acc = None
                for u in range(2):
                    for v in range(2):
                        patch = slab[a + u:a + u + br + 2,
                                     _MG - 2 + b + v:
                                     _MG - 2 + b + v + wb + 2, :]
                        part = jax.lax.dot_general(
                            patch, pk_ref[a, b, u, v],
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )                      # [br+2, wb+2, cm]
                        acc = part if acc is None else acc + part
                # Round through the chain storage dtype (the HBM round
                # trip this kernel replaces), then the GN prologue.
                z = (acc + upb).astype(store_dtype).astype(jnp.float32)
                z = z * gam[None, None, :] + bet[None, None, :]
                z = z * jax.nn.sigmoid(z)
                band[a, b] = z.astype(band.dtype)

        # Out-of-image halo samples are zeroed AFTER the affine+SiLU
        # (the prologue contract: silu(beta) != 0 must not leak into
        # SAME-conv taps) — conditional border writes instead of a
        # per-block iota/where mask (30 ms/4K-call cheaper).
        @pl.when(bi == 0)
        def _mask_top():
            band[:, :, pl.ds(0, 1)] = jnp.zeros(
                (2, 2, 1, wb + 2, cm), band.dtype)

        @pl.when(bi == nr - 1)
        def _mask_bottom():
            band[:, :, pl.ds(br + 1, 1)] = jnp.zeros(
                (2, 2, 1, wb + 2, cm), band.dtype)

        @pl.when(bj == 0)
        def _mask_left():
            band[:, :, :, pl.ds(0, 1)] = jnp.zeros(
                (2, 2, br + 2, 1, cm), band.dtype)

        @pl.when(bj == nj - 1)
        def _mask_right():
            band[:, :, :, pl.ds(wb + 1, 1)] = jnp.zeros(
                (2, 2, br + 2, 1, cm), band.dtype)

    # Phase-decomposed 3x3 conv over the virtual interleaved map:
    # output phase (u, v) at low-res (i, j) sums tap d in {-1, 0, 1}
    # from plane p = (u+d) % 2 at plane row i + 1 + (u+d-p)//2 (plane
    # row r holds low-res row bi*br - 1 + r).  Same tap products, same
    # accumulation order as the interleaved conv — bit-identical
    # output, no band interleave.
    def _tap(u, d):
        p = (u + d) % 2
        return p, 1 + (u + d - p) // 2

    if tap_outer:
        # Same tap products in the same per-phase order (bit-identical
        # sums), but each of the 9 conv weights is loaded ONCE and
        # reused across the four phase dots (9 MXU weight switches
        # instead of 36) at the cost of four live accumulators (already
        # counted by pick_blocks_upconv_fused's acc2 term).
        outs = [[None, None], [None, None]]
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                wsl = w1_ref[3 * (di + 1) + (dj + 1), :,
                             pl.ds(co * cb, cb)]
                for u in range(2):
                    p, rs = _tap(u, di)
                    for v in range(2):
                        q, cs = _tap(v, dj)
                        patch = band[p, q, rs:rs + br, cs:cs + wb, :]
                        part = jax.lax.dot_general(
                            patch, wsl,
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )                   # [br, wb, cb]
                        outs[u][v] = (part if outs[u][v] is None
                                      else outs[u][v] + part)
    else:
        outs = []
        for u in range(2):
            row_out = []
            for v in range(2):
                acc = None
                for di in (-1, 0, 1):
                    p, rs = _tap(u, di)
                    for dj in (-1, 0, 1):
                        q, cs = _tap(v, dj)
                        patch = band[p, q, rs:rs + br, cs:cs + wb, :]
                        part = jax.lax.dot_general(
                            patch, w1_ref[3 * (di + 1) + (dj + 1), :,
                                          pl.ds(co * cb, cb)],
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )                   # [br, wb, cb]
                        acc = part if acc is None else acc + part
                row_out.append(acc)
            outs.append(row_out)
    bb = b1_ref[0, pl.ds(co * cb, cb)].astype(jnp.float32)
    t0 = jnp.stack([outs[0][0] + bb, outs[0][1] + bb], axis=2)
    t1 = jnp.stack([outs[1][0] + bb, outs[1][1] + bb], axis=2)
    y32 = jnp.stack([t0, t1], axis=1).reshape(2 * br, 2 * wb, cb)

    oslot = step % 2
    fc = nc == 1

    @pl.when(step >= 2)
    def _free():
        _up_out_dma(o_ref, os_, osems, oslot, bi, bj, co, "wait",
                    br=br, wb=wb, cb=cb, full_c=fc)

    y = y32.astype(os_.dtype)
    os_[oslot] = y
    _up_out_dma(o_ref, os_, osems, oslot, bi, bj, co, "start",
                br=br, wb=wb, cb=cb, full_c=fc)

    @pl.when(step == total - 1)
    def _drain():
        _up_out_dma(o_ref, os_, osems, oslot, bi, bj, co, "wait",
                    br=br, wb=wb, cb=cb, full_c=fc)
        if total >= 2:
            _up_out_dma(o_ref, os_, osems, 1 - oslot, bi, bj, co,
                        "wait", br=br, wb=wb, cb=cb, full_c=fc)

    if emit:
        _emit_stats(y, ssum_ref, ssq_ref, bid, co, cb=cb, gs=gs,
                    bounds_ref=None, row_base=2 * bi * br)


def pick_blocks_upconv_fused(h: int, w: int, cin: int, cm: int,
                             cout: int, itemsize: int = 2,
                             cout_block: Optional[int] = None
                             ) -> Tuple[int, int]:
    """VMEM model of `_upconv_gn_conv_kernel` (phase-planar layout):
    double-halo input slab, FULL-channel phase kernels (the planes need
    every mid channel), the f32 phase accumulator pair, the four
    phase-plane stores, the four live conv2 accumulators + chain temp,
    the f32 output interleave + cast, and the output pipeline.
    Calibrated on the 2048^2 256->256->128 junction: br=4/wb=128
    compiles (14.7 MB modeled), br=8 and wb=256 OOM scoped vmem."""
    cb = cout_block or min(cout, 128)

    def fits(br, wb):
        wm = wb + 2 * _MG
        slab = 4 * (br + 4) * wm * cin * itemsize
        pk = 2 * 16 * cin * cm * itemsize
        w1 = 2 * 9 * cm * cout * itemsize
        ph = (br + 2) * (wb + 2) * cm
        phacc = 2 * ph * 4
        phstore = 4 * ph * itemsize
        acc2 = (4 + 2) * br * wb * cb * 4
        yil = 4 * br * wb * cb * (4 + itemsize)
        out = 2 * 4 * br * wb * cb * itemsize
        return (slab + pk + w1 + phacc + phstore
                + acc2 + yil + out <= _VMEM_BUDGET)

    return _best_blocks(h, w, fits)


def upconv_gn_conv3x3(x: jnp.ndarray, up_kernel: jnp.ndarray,
                      up_bias: jnp.ndarray, gamma: jnp.ndarray,
                      beta: jnp.ndarray, kernel: jnp.ndarray,
                      bias: jnp.ndarray, *,
                      emit_stats: bool = True,
                      num_groups: int = 32,
                      out_dtype=None,
                      store_dtype=None,
                      block_rows: Optional[int] = None,
                      block_cols: Optional[int] = None,
                      cout_block: Optional[int] = None,
                      tap_outer: bool = False):
    """conv3x3(silu(gn_affine(conv3x3(nearest2x(x))))) as ONE kernel —
    the streaming upsample junction (pass 2; pass 1 is
    `upsample_conv3x3(stats_only=True)` producing gamma/beta's
    moments).  The [2H, 2W, Cm] upsampled map lives only as per-block
    VMEM bands; whole-image 4096^2 decode would otherwise carry it as
    an 8 GB HBM buffer that does not fit v5e HBM next to the conv
    buffers.

    ``x`` is the DOUBLE-row-padded chain layout [H+4, W+16, Cin]
    (`pad_chain_input` + one extra pad row each side); output is the
    padded chain layout [2H+2, 2W+16, Cout] + the (sum, sumsq) of the
    output.  ``gamma``/``beta`` [Cm] f32: the folded GroupNorm affine
    of the upsampled map; ``store_dtype``: the chain storage dtype the
    band is rounded through for exact parity with the unfused pair.

    Reference parity: computes Upsample -> ResnetBlock.norm1/silu/conv1
    of the decoder's top level (ComfyUI AutoencoderKL semantics,
    traversed by /root/reference/hdr_vae_decode.py:775-803).
    """
    hp, wp, cin = x.shape
    h, w = hp - 4, wp - 2 * _MG
    cm = up_kernel.shape[-1]
    cout = kernel.shape[-1]
    assert up_kernel.shape[:3] == (3, 3, cin)
    assert kernel.shape[:3] == (3, 3, cm)
    out_dtype = out_dtype or x.dtype
    store_dtype = store_dtype or x.dtype
    gs = cout // num_groups if emit_stats else 1
    cb = cout_block or min(cout, 128)
    assert cout % cb == 0 and cb % gs == 0, (cout, cb, gs)
    nc = cout // cb
    gcb = cb // gs

    if block_rows:
        br, wb = block_rows, block_cols or w
    else:
        br, wb = pick_blocks_upconv_fused(h, w, cin, cm, cout,
                                          x.dtype.itemsize, cout_block=cb)
    assert h % br == 0 and w % wb == 0 and wb % 8 == 0, (h, br, w, wb)
    nj = w // wb

    pk = phase_kernels(up_kernel)
    kern = functools.partial(_upconv_gn_conv_kernel, br=br, wb=wb, cb=cb,
                             h=h, w=w, emit=emit_stats, gs=gs, nc=nc,
                             store_dtype=store_dtype, tap_outer=tap_outer)
    vm = dict(memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((2, 2, 2, 2, cin, cm),
                     lambda i, j, co: (0, 0, 0, 0, 0, 0), **vm),
        pl.BlockSpec((1, cm), lambda i, j, co: (0, 0), **vm),
        pl.BlockSpec((1, cm), lambda i, j, co: (0, 0), **vm),
        pl.BlockSpec((1, cm), lambda i, j, co: (0, 0), **vm),
        pl.BlockSpec((9, cm, cout), lambda i, j, co: (0, 0, 0), **vm),
        pl.BlockSpec((1, cout), lambda i, j, co: (0, 0), **vm),
    ]
    operands = [x, pk, up_bias.reshape(1, cm),
                gamma.astype(jnp.float32).reshape(1, cm),
                beta.astype(jnp.float32).reshape(1, cm),
                kernel.reshape(9, cm, cout), bias.reshape(1, cout)]

    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    out_shape = [jax.ShapeDtypeStruct(
        (2 * h + 2, 2 * w + 2 * _MG, cout), out_dtype)]
    if emit_stats:
        out_specs += [pl.BlockSpec((nc, gcb), lambda i, j, co: (0, 0),
                                   **vm)] * 2
        out_shape += [jax.ShapeDtypeStruct((nc, gcb), jnp.float32)] * 2

    scratch = [
        pltpu.VMEM((2, br + 4, wb + 2 * _MG, cin), x.dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.VMEM((2, 2, br + 2, wb + 2, cm), x.dtype),
        pltpu.VMEM((2, 2 * br, 2 * wb, cb), out_dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    call = pl.pallas_call(
        kern,
        name=f"upconvgnconv_{h}x{w}_{cin}to{cm}to{cout}_br{br}w{wb}",
        grid=(h // br, nj, nc),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w * cin * cm * 16
            + 2 * (2 * h) * (2 * w) * cm * cout * 9,
            bytes_accessed=(h * w * cin + 4 * h * w * cout) * 2
            + (16 * cin * cm + 9 * cm * cout) * 2,
            transcendentals=h * w * cm * 4,
        ),
    )
    outs = call(*operands)
    if emit_stats:
        y, ssum, ssq = outs
        return y, (ssum.reshape(cout // gs), ssq.reshape(cout // gs))
    return outs[0]


# ---------------------------------------------------------------------------
# Multi-input ("dense") conv — conv over a channel concat without the concat
# ---------------------------------------------------------------------------


def _halo_specs(br: int, wb: int, h: int, w: int, c: int):
    """BlockSpec halo for sub-128-channel arrays: Mosaic rejects MANUAL
    sliced DMAs whose lane dim is not a 128 multiple (verified
    empirically: 32/64-lane slices fail, BlockSpec pipelines are fine at
    any lane count), so the halo'd slab is assembled from NINE BlockSpec
    operands of the SAME array — center block + row/column/corner
    slivers with shifted, edge-clamped index maps.  At image edges the
    clamped slivers duplicate interior data; the kernel masks/zeroes the
    frame exactly as the padded-chain kernels do.

    Returns the nine BlockSpecs; the kernel assembles with
    `_halo_assemble`."""
    nrb = h // br
    njb = w // 8            # sliver column blocks are 8 wide
    wjb = wb // 8

    def rc(i):              # clamp a row-block index (block height 1)
        return jnp.clip(i, 0, h - 1)

    def cc(j):              # clamp a col-sliver index (block width 8)
        return jnp.clip(j, 0, njb - 1)

    def im(fn):
        def index_map(i, j, *rest):
            return fn(i, j)
        return index_map

    specs = [
        pl.BlockSpec((br, wb, c), im(lambda i, j: (i, j, 0))),
        pl.BlockSpec((1, wb, c), im(lambda i, j: (rc(i * br - 1), j, 0))),
        pl.BlockSpec((1, wb, c),
                     im(lambda i, j: (rc(i * br + br), j, 0))),
        pl.BlockSpec((br, 8, c),
                     im(lambda i, j: (i, cc(j * wjb - 1), 0))),
        pl.BlockSpec((br, 8, c),
                     im(lambda i, j: (i, cc(j * wjb + wjb), 0))),
        pl.BlockSpec((1, 8, c),
                     im(lambda i, j: (rc(i * br - 1), cc(j * wjb - 1), 0))),
        pl.BlockSpec((1, 8, c),
                     im(lambda i, j: (rc(i * br - 1),
                                      cc(j * wjb + wjb), 0))),
        pl.BlockSpec((1, 8, c),
                     im(lambda i, j: (rc(i * br + br),
                                      cc(j * wjb - 1), 0))),
        pl.BlockSpec((1, 8, c),
                     im(lambda i, j: (rc(i * br + br),
                                      cc(j * wjb + wjb), 0))),
    ]
    return specs


def _halo_assemble(center, top, bot, left, right, tl, tr, bl, brr,
                   bi, bj, nr, nj, *, zero_frame: bool = True):
    """[br, wb, c] pieces -> the halo'd slab [br+2, wb+16, c] (stored
    column s = image column bj*wb - 8 + s), with image-boundary frame
    rows/columns zeroed when ``zero_frame`` (the clamped slivers hold
    duplicated interior data there)."""
    if zero_frame:
        top = jnp.where(bi == 0, jnp.zeros_like(top), top)
        tl = jnp.where(jnp.logical_or(bi == 0, bj == 0),
                       jnp.zeros_like(tl), tl)
        tr = jnp.where(jnp.logical_or(bi == 0, bj == nj - 1),
                       jnp.zeros_like(tr), tr)
        bot = jnp.where(bi == nr - 1, jnp.zeros_like(bot), bot)
        bl = jnp.where(jnp.logical_or(bi == nr - 1, bj == 0),
                       jnp.zeros_like(bl), bl)
        brr = jnp.where(jnp.logical_or(bi == nr - 1, bj == nj - 1),
                        jnp.zeros_like(brr), brr)
        left = jnp.where(bj == 0, jnp.zeros_like(left), left)
        right = jnp.where(bj == nj - 1, jnp.zeros_like(right), right)
    top_strip = jnp.concatenate([tl, top, tr], axis=1)
    mid_strip = jnp.concatenate([left, center, right], axis=1)
    bot_strip = jnp.concatenate([bl, bot, brr], axis=1)
    return jnp.concatenate([top_strip, mid_strip, bot_strip], axis=0)


def _dense_conv_kernel(*refs, br: int, wb: int, n_in: int, act,
                       res: bool, res_scale: float):
    """conv3x3 over the channel-concatenation of ``n_in`` inputs
    (computed as a sum of per-input contractions — the concat is never
    materialized), with an optional LeakyReLU epilogue and an optional
    scaled residual: y = r + res_scale * act(conv(concat(xs)) + bias).

    This is ESRGAN's ResidualDenseBlock dataflow
    (`hdr_upscale_with_model.py` runs the spandrel model whose blocks
    torch.cat 2-5 tensors before every conv): on TPU each concat would
    be a full HBM round trip of the combined activation.  Inputs arrive
    as 9 halo slivers each (`_halo_specs`) — sub-128-channel arrays
    cannot use the manual sliced-DMA halo of the decoder kernels."""
    it = iter(refs)
    pieces = [[next(it) for _ in range(9)] for _ in range(n_in)]
    w_ref = next(it)
    b_ref = next(it)
    r_ref = next(it) if res else None
    o_ref = next(it)

    bi = pl.program_id(0)
    bj = pl.program_id(1)
    nr = pl.num_programs(0)
    nj = pl.num_programs(1)

    # Assemble each input's halo slab, then PACK the channel dim in
    # registers: one K=sum(cins) contraction per tap instead of one per
    # input — a 32-channel dot costs the same MXU cycles as a
    # 128-channel one (the systolic array is 128 deep), so unpacked
    # dense blocks waste up to 4x the MXU (measured 27 TF/s on conv5).
    slabs = [_halo_assemble(*[r[...] for r in pc], bi, bj, nr, nj)
             for pc in pieces]
    slab = (slabs[0] if len(slabs) == 1
            else jnp.concatenate(slabs, axis=-1))
    acc = None
    for di in range(3):
        for dj in range(3):
            patch = slab[di:di + br,
                         _MG - 1 + dj:_MG - 1 + dj + wb, :]
            part = jax.lax.dot_general(
                patch, w_ref[di, dj],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part

    acc = acc + b_ref[0, :].astype(jnp.float32)
    if act == "lrelu":
        acc = jnp.where(acc >= 0, acc, 0.2 * acc)
    if res:
        acc = r_ref[...].astype(jnp.float32) + res_scale * acc
    o_ref[...] = acc.astype(o_ref.dtype)


def dense_conv3x3(inputs, kernel: jnp.ndarray, bias: jnp.ndarray, *,
                  act: Optional[str] = None,
                  residual: Optional[jnp.ndarray] = None,
                  res_scale: float = 1.0,
                  out_dtype=None,
                  block_rows: Optional[int] = None,
                  block_cols: Optional[int] = None):
    """y = [residual + res_scale *] act(conv3x3(concat(inputs)) + bias).

    ``inputs``: list of spatially-identical unpadded arrays [H, W, Ci];
    ``kernel`` [3, 3, sum(Ci), Cout] with Cout <= 128 (ESRGAN widths);
    ``act``: None | "lrelu" (slope 0.2).  The concat never materializes
    — the kernel sums per-input MXU contractions; SAME-padding halos
    come from sliver BlockSpecs (`_halo_specs`).
    """
    h, w, _ = inputs[0].shape
    cins = tuple(x.shape[-1] for x in inputs)
    cin = sum(cins)
    assert kernel.shape[:3] == (3, 3, cin), (kernel.shape, cins)
    assert w % 8 == 0, w
    cout = kernel.shape[-1]
    assert cout <= 128, ("dense_conv3x3 keeps all output channels in "
                         "one chunk; widen to co-chunking for", cout)
    for x in inputs[1:]:
        assert x.shape[:2] == (h, w), (x.shape, inputs[0].shape)
    out_dtype = out_dtype or inputs[0].dtype
    res = residual is not None
    cr = residual.shape[-1] if res else 0
    if res:
        assert residual.shape == (h, w, cout), residual.shape

    itemsize = inputs[0].dtype.itemsize
    if block_rows:
        br, wb = block_rows, block_cols or w
    else:
        br, wb = _best_blocks(h, w, functools.partial(
            _dense_fits, cins=cins, cout=cout, cr=cr, itemsize=itemsize))
    assert h % br == 0 and w % wb == 0 and wb % 8 == 0, (h, br, w, wb)
    nj = w // wb

    kern = functools.partial(_dense_conv_kernel, br=br, wb=wb,
                             n_in=len(inputs), act=act, res=res,
                             res_scale=res_scale)

    in_specs = []
    operands = []
    for x in inputs:
        in_specs += _halo_specs(br, wb, h, w, x.shape[-1])
        operands += [x] * 9
    vm = dict(memory_space=pltpu.VMEM)
    in_specs += [
        pl.BlockSpec((3, 3, cin, cout), lambda i, j: (0, 0, 0, 0), **vm),
        pl.BlockSpec((1, cout), lambda i, j: (0, 0), **vm),
    ]
    operands += [kernel, bias.reshape(1, cout)]
    if res:
        in_specs.append(pl.BlockSpec((br, wb, cout),
                                     lambda i, j: (i, j, 0)))
        operands.append(residual)

    call = pl.pallas_call(
        kern,
        name=(f"dconv_{h}x{w}_{'+'.join(map(str, cins))}to{cout}"
              + f"_br{br}w{wb}" + (f"_{act}" if act else "")
              + ("_res" if res else "")),
        grid=(h // br, nj),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((br, wb, cout), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((h, w, cout), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w * cin * cout * 9,
            bytes_accessed=(h * w * cin + 2 * h * w * cout) * itemsize
            + 9 * cin * cout * kernel.dtype.itemsize,
            transcendentals=0,
        ),
    )
    return call(*operands)


def _plane(c: int) -> int:
    """Physical lane footprint of a c-channel minor dim (lane tile 128:
    a [.., .., 3] bf16 block occupies [.., .., 128] of VMEM)."""
    return -(-c // 128) * 128


def _dense_fits(br, wb, *, cins, cout, cr, itemsize):
    wm = wb + 2 * _MG
    # BlockSpec pipeline: 2 slots per operand (center + slivers), plus
    # the assembled register slab per input, the f32 (acc + part) pair,
    # and the output/residual blocks.  All channel dims are counted at
    # their PHYSICAL lane-padded width — sub-128-channel buffers (the
    # whole ESRGAN trunk) occupy full 128-lane tiles.
    blocks = sum(2 * (br * wb + 2 * wb + 2 * br * 8 + 4 * 8) * _plane(ci)
                 * itemsize for ci in cins)
    slabs = sum((br + 2) * wm * _plane(ci) * itemsize for ci in cins)
    weights = 2 * 9 * sum(cins) * _plane(cout) * itemsize
    acc = 2 * br * wb * _plane(cout) * 4
    ycast = br * wb * _plane(cout) * itemsize
    out = 2 * br * wb * _plane(cout) * itemsize
    resid = 2 * br * wb * _plane(cr) * itemsize if cr else 0
    return (blocks + slabs + weights + acc + ycast + out + resid
            <= _VMEM_BUDGET)


# ---------------------------------------------------------------------------
# Block-size selection
# ---------------------------------------------------------------------------


def _col_candidates(w: int):
    """Column-block widths to consider: DIVISORS of w that are multiples
    of 8, from w down to ~128 (w itself is always included, so the
    fallback block is valid for any 8-multiple width — e.g. w=1032 has
    only {1032, 344} as usable candidates)."""
    out = []
    d = 1
    while True:
        if w % d == 0:
            wb = w // d
            if wb % 8 == 0 and (wb >= 128 or not out):
                out.append(wb)
            if wb <= 128:
                break
        d += 1
        if d > w:
            break
    return out or [w]


def _best_blocks(h: int, w: int, fits) -> Tuple[int, int]:
    """Largest-efficiency (br, wb) with ``fits(br, wb)`` true; the
    efficiency metric is useful-block fraction br*wb / ((br+2)*(wb+16))
    — i.e. minimize halo re-read."""
    best = None
    for wb in _col_candidates(w):
        for br in (32, 16, 8, 4, 2, 1):
            if h % br:
                continue
            if fits(br, wb):
                eff = (br * wb) / ((br + 2) * (wb + 2 * _MG))
                if best is None or eff > best[0]:
                    best = (eff, br, wb)
                break
    if best is None:
        return 1, _col_candidates(w)[-1]
    return best[1], best[2]


def pick_blocks(h: int, w: int, cin: int, cout: int,
                itemsize: int = 2, cout_block: Optional[int] = None,
                prologue: bool = False, res_channels: int = 0
                ) -> Tuple[int, int]:
    """(row, col) block whose working set fits VMEM: slab (2 DMA slots +
    the whole-slab register materialization of `xs[sl]`) + resident
    weights + the live f32 (acc + part) pair + 2x output block
    (pipeline).  The prologue runs in place one slab row at a time, so
    its f32 temporaries are bounded by ~2 row-sized vectors regardless
    of br; a residual adds its own double-buffered block."""
    weights = 9 * cin * cout * itemsize
    cb = cout_block or cout

    def fits(br, wb):
        wm = wb + 2 * _MG
        # 4x slab: two DMA slots + ~2 register materializations (the
        # xs[sl] load and the prologue's write-back keep two copies
        # live; calibrated against compiler-reported 18.9M for a config
        # a 3x model put at 15.3M).
        slab = 4 * (br + 2) * wm * cin * itemsize
        acc = 2 * br * wb * cb * 4
        ycast = br * wb * cb * itemsize        # y in storage dtype
        out = 2 * br * wb * cb * itemsize
        total = weights + slab + acc + ycast + out
        if prologue:
            total += 2 * wm * cin * 4
        if res_channels:
            total += 2 * br * wb * res_channels * itemsize
            total += res_channels * cout * itemsize   # rk (if projected)
        return total <= _VMEM_BUDGET

    return _best_blocks(h, w, fits)


def pick_blocks_upsample(h: int, w: int, cin: int, cout: int,
                         itemsize: int = 2,
                         cout_block: Optional[int] = None
                         ) -> Tuple[int, int]:
    """VMEM model of `_upsample_conv_kernel`: input slab (2 DMA slots +
    register materialization) + 2x phase kernels (streamed per cout
    chunk) + four f32 phase accumulators (+ the live part) + the
    interleave temporary + 2x (2br, 2wb, cb) output blocks."""
    cb = cout_block or min(cout, 128)

    def fits(br, wb):
        wm = wb + 2 * _MG
        slab = 4 * (br + 2) * wm * cin * itemsize
        weights = 2 * 16 * cin * cb * itemsize
        accs = 5 * br * wb * cb * 4
        interleave = 4 * br * wb * cb * 4
        ycast = 4 * br * wb * cb * itemsize    # y in storage dtype
        out = 2 * 4 * br * wb * cb * itemsize
        return (slab + weights + accs + interleave + ycast + out
                <= _VMEM_BUDGET)

    return _best_blocks(h, w, fits)


# Back-compat alias (round-2 notes referenced this).
def pick_block_rows(h, w, cin, cout, itemsize=2, cout_block=None,
                    prologue=False, res_channels=0):
    return pick_blocks(h, w, cin, cout, itemsize, cout_block=cout_block,
                       prologue=prologue, res_channels=res_channels)[0]


def conv3x3_pallas(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                   *, out_dtype=None,
                   block_rows: Optional[int] = None,
                   cout_block: Optional[int] = None) -> jnp.ndarray:
    """3x3 SAME conv of one image: x [H, W, Cin] -> [H, W, Cout].

    x and kernel should already be in the MXU compute dtype (bf16 in
    fast mode); accumulation is float32; bias is added in float32 and
    the result cast to ``out_dtype`` (defaults to x.dtype).  Thin
    wrapper over :func:`fused_conv3x3` with no prologue/residual/stats.
    """
    return fused_conv3x3(x, kernel, bias, out_dtype=out_dtype,
                         block_rows=block_rows, cout_block=cout_block)

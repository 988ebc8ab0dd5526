"""Pallas 3x3 SAME convolutions for the decoder up-stack (NHWC, bf16 MXU).

Motivation (PERF_NOTES.md sections 2-3): XLA:TPU's conv emitters run the
decoder's large up-stack convs at ~50% MXU with the GroupNorm statistic
reductions fused into their epilogues; the SAME-padding pre-pads and
nearest-upsample chains between convs add ~15% of device time in pure
data movement.  These kernels own the whole up path so that

  * no XLA conv fusion ever borders a Pallas custom call (the round-1
    layout trap, `kernels/epilogue.py:158-171`): operands/results use
    only default-layout NHWC arrays;
  * SAME padding happens inside the kernel (aligned 8-column VMEM
    margins + boundary-row DMAs), so inputs are the raw unpadded
    activations — no `jnp.pad` copies in the XLA graph;
  * the 2x nearest upsample is fused into the following conv as a
    2x2-phase decomposition (2.25x fewer MACs than conv-on-upsampled,
    and the broadcast/reshape materialization disappears);
  * each conv can apply the previous GroupNorm's affine + SiLU as an
    in-place slab prologue and emit the per-group (sum, sumsq) of its
    output, so no GN reduce->broadcast chain remains in XLA (the b>=2
    layout pathology of PERF_NOTES.md section 1 never arises).

Decomposition: grid (row_blocks, cout_chunks); each row block DMAs a
halo'd slab [BR+2, W+16, Cin] from HBM into VMEM (double-buffered, the
next slab loads while this one multiplies; data at columns [8, 8+W) so
the destination offset stays sublane-aligned) and accumulates the nine
(sixteen, for the upsample form) shifted [BR, W, Cin] x [Cin, CB] MXU
contractions in float32.

Reference behavior being replaced: the torch/cuDNN `F.conv2d` +
`F.interpolate` calls inside the reference's decoder substrate (ComfyUI
VAE; `hdr_vae_decode.py` delegates to `vae.first_stage_model.decoder`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for picking the row-block size.  v5e has 16 MiB of scoped
# VMEM per core; the models below account for every large buffer
# (including the whole-slab register materialization `xs[sl]`), so the
# budget can sit close to the physical limit.  Calibrated against a
# compiler-reported 16.5M allocation for a configuration the model put
# at 15.1M.
_VMEM_BUDGET = 15 * 1024 * 1024

# Left margin of the in-VMEM slab: data lives at columns [8, 8+W) so the
# slab DMA's destination offset is a lane-tile multiple while the three
# tap alignments read at offsets {7, 8, 9}.
_MG = 8


def _slab_dma(x_hbm, xs, sems, slot, blk, op, *, br, h, w):
    """Start (op='start') or wait on (op='wait') the async copy of the
    halo'd row window for block ``blk`` into slab slot ``slot``: rows
    [blk*br - 1, blk*br + br + 1) clamped to [0, h), written at row
    offset 1/0 and column offset `_MG` (sublane-aligned).  The missing
    first/last halo row at the image boundary is NOT written — the
    caller zeroes the frame row (or masks it in the prologue).  DMA
    semaphore waits are byte-counted, so the wait rebuilds the exact
    descriptor the start used (same pl.when branch structure)."""
    n = h // br

    def run(dma):
        dma.start() if op == "start" else dma.wait()

    if n == 1:
        run(pltpu.make_async_copy(
            x_hbm.at[pl.ds(0, h)],
            xs.at[slot, pl.ds(1, h), pl.ds(_MG, w)],
            sems.at[slot]))
        return

    @pl.when(blk == 0)
    def _first():
        run(pltpu.make_async_copy(
            x_hbm.at[pl.ds(0, br + 1)],
            xs.at[slot, pl.ds(1, br + 1), pl.ds(_MG, w)],
            sems.at[slot]))

    @pl.when(blk == n - 1)
    def _last():
        run(pltpu.make_async_copy(
            x_hbm.at[pl.ds(h - br - 1, br + 1)],
            xs.at[slot, pl.ds(0, br + 1), pl.ds(_MG, w)],
            sems.at[slot]))

    if n > 2:
        @pl.when(jnp.logical_and(blk > 0, blk < n - 1))
        def _mid():
            run(pltpu.make_async_copy(
                x_hbm.at[pl.ds(blk * br - 1, br + 2)],
                xs.at[slot, :, pl.ds(_MG, w)],
                sems.at[slot]))


def _fused_conv_kernel(*refs, br: int, w: int, cb: int, h: int,
                       prologue: bool, res: str, emit: bool, gs: int,
                       owned: bool = False):
    """General up-stack conv step on a (row_blocks, cout_chunks) grid:

      y = conv3x3(silu(x * gamma + beta)) [+ r | + r @ rk] (+ bias)

    optionally emitting per-group (sum, sumsq) of y for the NEXT layer's
    GroupNorm.  The prologue is applied to the raw slab IN PLACE one row
    at a time (bounded f32 live set) with image-boundary halo rows
    zeroed, so x is stored UNnormalized — exactly the decoder's
    dataflow, recomputing the halo rows' prologue instead of
    materializing the normalized map in HBM.
    """
    it = iter(refs)
    x_hbm = next(it)
    w_ref = next(it)
    b_ref = next(it)
    if prologue:
        g_ref = next(it)                 # [1, cin] f32
        bt_ref = next(it)                # [1, cin] f32
    if res == "add":
        r_ref = next(it)                 # [br, w, cb] block (pipelined)
    elif res == "proj":
        r_ref = next(it)                 # [br, w, cr] block (pipelined)
        rk_ref = next(it)                # [cr, cout] resident
    bounds_ref = next(it) if owned else None   # [1, 2] int32 SMEM
    o_ref = next(it)
    if emit:
        ssum_ref = next(it)              # [n_chunks, gcb] accumulated
        ssq_ref = next(it)
    xs = next(it)
    sems = next(it)

    i = pl.program_id(0)
    co = pl.program_id(1)
    n = pl.num_programs(0)
    sl = i % 2
    _, _, wm, cin = xs.shape             # wm = w + 2*_MG

    @pl.when(jnp.logical_and(i == 0, co == 0))
    def _warmup():
        # Zero both slots' column margins once; DMAs never write them.
        xs[0, :, pl.ds(0, _MG)] = jnp.zeros((br + 2, _MG, cin), xs.dtype)
        xs[0, :, pl.ds(_MG + w, _MG)] = jnp.zeros((br + 2, _MG, cin),
                                                  xs.dtype)
        xs[1, :, pl.ds(0, _MG)] = jnp.zeros((br + 2, _MG, cin), xs.dtype)
        xs[1, :, pl.ds(_MG + w, _MG)] = jnp.zeros((br + 2, _MG, cin),
                                                  xs.dtype)
        _slab_dma(x_hbm, xs, sems, 0, 0, "start", br=br, h=h, w=w)

    @pl.when(co == 0)
    def _sync():
        _slab_dma(x_hbm, xs, sems, sl, i, "wait", br=br, h=h, w=w)

        @pl.when(i + 1 < n)
        def _prefetch():
            _slab_dma(x_hbm, xs, sems, (i + 1) % 2, i + 1, "start",
                      br=br, h=h, w=w)

        if prologue:
            # Normalize the slab IN PLACE, one row at a time: the f32
            # temporaries stay [1, wm, cin]-sized (Mosaic materializes
            # whole-vector elementwise chains, so a slab-sized f32 chain
            # would cost 2x the slab in VMEM and force tiny row blocks),
            # and the work happens once per row block instead of once
            # per (row, cout-chunk) grid step.  Image-boundary halo rows
            # AND the zero column margins are re-zeroed via the mask:
            # silu(gamma*0 + beta) != 0, so without it the prologue
            # would leak silu(beta) into the border taps.
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, wm, cin), 1)
            colmask = jnp.logical_and(cols >= _MG, cols < _MG + w)

            def _row(r, _):
                grow = i * br - 1 + r
                rowok = jnp.logical_and(grow >= 0, grow < h)
                xr = xs[sl, pl.ds(r, 1)]          # [1, wm, cin]
                z = (xr.astype(jnp.float32) * g_ref[0][None, None, :]
                     + bt_ref[0][None, None, :])
                z = z * jax.nn.sigmoid(z)
                ok = jnp.logical_and(rowok, colmask)
                xs[sl, pl.ds(r, 1)] = jnp.where(ok, z, 0.0).astype(
                    xs.dtype)
                return 0

            jax.lax.fori_loop(0, br + 2, _row, 0, unroll=False)
        else:
            # Zero the frame row the boundary DMAs don't write.
            @pl.when(i == 0)
            def _top():
                xs[sl, pl.ds(0, 1)] = jnp.zeros((1, wm, cin), xs.dtype)

            @pl.when(i == n - 1)
            def _bot():
                xs[sl, pl.ds(br + 1, 1)] = jnp.zeros((1, wm, cin),
                                                     xs.dtype)

    slab = xs[sl]                         # [br+2, wm, cin]
    acc = None
    for di in range(3):
        for dj in range(3):
            patch = slab[di:di + br, _MG - 1 + dj:_MG - 1 + dj + w, :]
            part = jax.lax.dot_general(
                patch, w_ref[di, dj, :, pl.ds(co * cb, cb)],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                              # [br, w, cb]
            acc = part if acc is None else acc + part

    acc = acc + b_ref[0, pl.ds(co * cb, cb)].astype(jnp.float32)
    if res == "add":
        acc = acc + r_ref[...].astype(jnp.float32)
    elif res == "proj":
        acc = acc + jax.lax.dot_general(
            r_ref[...], rk_ref[:, pl.ds(co * cb, cb)],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    y = acc.astype(o_ref.dtype)
    o_ref[...] = y

    if emit:
        _emit_stats(y, ssum_ref, ssq_ref, i, co, cb=cb, gs=gs,
                    bounds_ref=bounds_ref, row_base=i * br)


def _emit_stats(y, ssum_ref, ssq_ref, i, co, *, cb: int, gs: int,
                bounds_ref=None, row_base=None):
    """Accumulate per-group (sum, sumsq) of y [.., .., cb] as STORED
    (post storage-dtype rounding), matching the XLA fast path where GN
    re-reads the bf16 activation.  With ``bounds_ref`` ([1, 2] int32 in
    SMEM: owned [lo, hi) rows at this layer's resolution) only rows this
    shard OWNS contribute — the per-slab partials of an exact
    whole-image statistic under slab sharding (halo rows masked so no
    pixel is counted twice); ``row_base`` is the first output row of
    this grid step."""
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

    @pl.when(i == 0)
    def _init():
        ssum_ref[co, :] = g1[0]
        ssq_ref[co, :] = g2[0]

    @pl.when(i > 0)
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
                  cout_block: Optional[int] = None,
                  owned_rows: Optional[jnp.ndarray] = None):
    """Fused up-stack conv step (see `_fused_conv_kernel`).

    x [H, W, Cin] unpadded (SAME padding happens in-kernel); gamma/beta
    [Cin] f32 enable the GroupNorm-apply + SiLU prologue; residual
    [H, W, Cout] is added, or projected through ``res_kernel``
    [Cr, Cout] first (the ResNet nin_shortcut — fold its bias into
    ``bias``).  With ``emit_stats`` the call also returns (sum, sumsq)
    per GroupNorm group of the OUTPUT, shape [G] each; ``owned_rows``
    (traced int32 [2]: [lo, hi) at this layer's resolution) restricts
    the emitted statistics to the rows this slab shard owns.
    """
    h, w, cin = x.shape
    assert kernel.shape[:3] == (3, 3, cin), (kernel.shape, x.shape)
    assert w % 8 == 0, w
    cout = kernel.shape[-1]
    out_dtype = out_dtype or x.dtype
    prologue = gamma is not None
    res = "none" if residual is None else (
        "proj" if res_kernel is not None else "add")
    gs = cout // num_groups if emit_stats else 1
    cb = cout_block or min(cout, 128)
    assert cout % cb == 0 and cb % gs == 0, (cout, cb, gs)
    nc = cout // cb
    gcb = cb // gs

    br = block_rows or pick_block_rows(
        h, w, cin, cout, x.dtype.itemsize, cout_block=cb,
        prologue=prologue,
        res_channels=(residual.shape[-1] if residual is not None else 0))
    assert h % br == 0, (h, br)

    owned = owned_rows is not None
    kern = functools.partial(_fused_conv_kernel, br=br, w=w, cb=cb, h=h,
                             prologue=prologue, res=res, emit=emit_stats,
                             gs=gs, owned=owned)

    vm = dict(memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((3, 3, cin, cout), lambda i, co: (0, 0, 0, 0), **vm),
        pl.BlockSpec((1, cout), lambda i, co: (0, 0), **vm),
    ]
    operands = [x, kernel, bias.reshape(1, cout)]
    if prologue:
        in_specs += [pl.BlockSpec((1, cin), lambda i, co: (0, 0), **vm),
                     pl.BlockSpec((1, cin), lambda i, co: (0, 0), **vm)]
        operands += [gamma.astype(jnp.float32).reshape(1, cin),
                     beta.astype(jnp.float32).reshape(1, cin)]
    if res == "add":
        assert residual.shape == (h, w, cout), residual.shape
        in_specs.append(pl.BlockSpec((br, w, cb), lambda i, co: (i, 0, co),
                                     **vm))
        operands.append(residual)
    elif res == "proj":
        cr = residual.shape[-1]
        assert residual.shape == (h, w, cr), residual.shape
        assert res_kernel.shape == (cr, cout), res_kernel.shape
        in_specs += [
            pl.BlockSpec((br, w, cr), lambda i, co: (i, 0, 0), **vm),
            pl.BlockSpec((cr, cout), lambda i, co: (0, 0), **vm),
        ]
        operands += [residual, res_kernel]
    if owned:
        in_specs.append(pl.BlockSpec((1, 2), lambda i, co: (0, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(jnp.asarray(owned_rows, jnp.int32).reshape(1, 2))

    out_specs = [pl.BlockSpec((br, w, cb), lambda i, co: (i, 0, co), **vm)]
    out_shape = [jax.ShapeDtypeStruct((h, w, cout), out_dtype)]
    if emit_stats:
        out_specs += [pl.BlockSpec((nc, gcb), lambda i, co: (0, 0), **vm)] * 2
        out_shape += [jax.ShapeDtypeStruct((nc, gcb), jnp.float32)] * 2

    call = pl.pallas_call(
        kern,
        name=(f"fconv_{h}x{w}_{cin}to{cout}_br{br}_{res}"
              + ("_gn" if prologue else "") + ("_st" if emit_stats else "")),
        grid=(h // br, nc),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((2, br + 2, w + 2 * _MG, cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w * cin * cout * 9
            + (2 * h * w * residual.shape[-1] * cout if res == "proj" else 0),
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


def _upsample_conv_kernel(x_hbm, k_ref, b_ref, bounds_ref, o_ref,
                          ssum_ref, ssq_ref, xs, sems, *, br: int,
                          w: int, cb: int, h: int, emit: bool, gs: int):
    """One grid step of the fused upsample+conv: input rows
    [i*br, i*br+br) -> output rows [2*i*br, 2*i*br+2*br), all four
    phases accumulated from the (at most 9) shifted input patches and
    interleaved in-register."""
    i = pl.program_id(0)
    co = pl.program_id(1)
    n = pl.num_programs(0)
    sl = i % 2
    _, _, wm, cin = xs.shape

    @pl.when(jnp.logical_and(i == 0, co == 0))
    def _warmup():
        xs[0, :, pl.ds(0, _MG)] = jnp.zeros((br + 2, _MG, cin), xs.dtype)
        xs[0, :, pl.ds(_MG + w, _MG)] = jnp.zeros((br + 2, _MG, cin),
                                                  xs.dtype)
        xs[1, :, pl.ds(0, _MG)] = jnp.zeros((br + 2, _MG, cin), xs.dtype)
        xs[1, :, pl.ds(_MG + w, _MG)] = jnp.zeros((br + 2, _MG, cin),
                                                  xs.dtype)
        _slab_dma(x_hbm, xs, sems, 0, 0, "start", br=br, h=h, w=w)

    @pl.when(co == 0)
    def _sync():
        _slab_dma(x_hbm, xs, sems, sl, i, "wait", br=br, h=h, w=w)

        @pl.when(i + 1 < n)
        def _prefetch():
            _slab_dma(x_hbm, xs, sems, (i + 1) % 2, i + 1, "start",
                      br=br, h=h, w=w)

        @pl.when(i == 0)
        def _top():
            xs[sl, pl.ds(0, 1)] = jnp.zeros((1, wm, cin), xs.dtype)

        @pl.when(i == n - 1)
        def _bot():
            xs[sl, pl.ds(br + 1, 1)] = jnp.zeros((1, wm, cin), xs.dtype)

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
                                 _MG - 1 + b + v:_MG - 1 + b + v + w, :]
                    part = jax.lax.dot_general(
                        patch, k_ref[a, b, u, v],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                      # [br, w, cb]
                    acc = part if acc is None else acc + part
            row_ph.append(acc + bias)
        phases.append(row_ph)

    # Interleave: out[2i+a, 2j+b] = phases[a][b][i, j].
    t0 = jnp.stack([phases[0][0], phases[0][1]], axis=2)  # [br, w, 2, cb]
    t1 = jnp.stack([phases[1][0], phases[1][1]], axis=2)
    z = jnp.stack([t0, t1], axis=1)                       # [br, 2, w, 2, cb]
    y = z.reshape(2 * br, 2 * w, cb).astype(o_ref.dtype)
    o_ref[...] = y

    if emit:
        _emit_stats(y, ssum_ref, ssq_ref, i, co, cb=cb, gs=gs,
                    bounds_ref=bounds_ref, row_base=2 * i * br)


def upsample_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray,
                     bias: jnp.ndarray, *,
                     emit_stats: bool = False,
                     num_groups: int = 32,
                     out_dtype=None,
                     block_rows: Optional[int] = None,
                     cout_block: Optional[int] = None,
                     owned_rows: Optional[jnp.ndarray] = None):
    """conv3x3(nearest_upsample_2x(x)) + bias as ONE kernel.

    x [H, W, Cin] -> [2H, 2W, Cout].  2.25x fewer MACs than upsampling
    then convolving (16 phase taps over HxW vs 9 taps over 2Hx2W), and
    the upsampled map is never materialized in HBM.  ``kernel`` is the
    plain [3, 3, Cin, Cout] conv kernel; the phase collapse happens
    here.  ``owned_rows`` ([lo, hi) at OUTPUT resolution) restricts the
    emitted statistics to the rows this slab shard owns.
    """
    h, w, cin = x.shape
    assert kernel.shape[:3] == (3, 3, cin), (kernel.shape, x.shape)
    assert w % 8 == 0, w
    cout = kernel.shape[-1]
    out_dtype = out_dtype or x.dtype
    gs = cout // num_groups if emit_stats else 1
    cb = cout_block or min(cout, 128)
    assert cout % cb == 0 and cb % gs == 0, (cout, cb, gs)
    nc = cout // cb
    gcb = cb // gs

    br = block_rows or pick_block_rows_upsample(
        h, w, cin, cout, x.dtype.itemsize, cout_block=cb)
    assert h % br == 0, (h, br)

    pk = phase_kernels(kernel)

    owned = owned_rows is not None
    vm = dict(memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((2, 2, 2, 2, cin, cb),
                     lambda i, co: (0, 0, 0, 0, 0, co), **vm),
        pl.BlockSpec((1, cout), lambda i, co: (0, 0), **vm),
    ]
    operands = [x, pk, bias.reshape(1, cout)]
    if owned:
        in_specs.append(pl.BlockSpec((1, 2), lambda i, co: (0, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(jnp.asarray(owned_rows, jnp.int32).reshape(1, 2))
    out_specs = [pl.BlockSpec((2 * br, 2 * w, cb),
                              lambda i, co: (i, 0, co), **vm)]
    out_shape = [jax.ShapeDtypeStruct((2 * h, 2 * w, cout), out_dtype)]
    if emit_stats:
        out_specs += [pl.BlockSpec((nc, gcb), lambda i, co: (0, 0), **vm)] * 2
        out_shape += [jax.ShapeDtypeStruct((nc, gcb), jnp.float32)] * 2

    def kern_wrap(*refs):
        it = iter(refs)
        x_hbm, k_ref, b_ref = next(it), next(it), next(it)
        bounds = next(it) if owned else None
        o_ref = next(it)
        ssum = next(it) if emit_stats else None
        ssq = next(it) if emit_stats else None
        xs, sems = next(it), next(it)
        return _upsample_conv_kernel(
            x_hbm, k_ref, b_ref, bounds, o_ref, ssum, ssq, xs, sems,
            br=br, w=w, cb=cb, h=h, emit=emit_stats, gs=gs)

    call = pl.pallas_call(
        kern_wrap,
        name=f"upconv_{h}x{w}_{cin}to{cout}_br{br}"
             + ("_st" if emit_stats else ""),
        grid=(h // br, nc),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((2, br + 2, w + 2 * _MG, cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w * cin * cout * 16,
            bytes_accessed=(h * w * cin + 2 * 4 * h * w * cout)
            * x.dtype.itemsize + 16 * cin * cout * kernel.dtype.itemsize,
            transcendentals=0,
        ),
    )
    outs = call(*operands)
    if emit_stats:
        y, ssum, ssq = outs
        return y, (ssum.reshape(cout // gs), ssq.reshape(cout // gs))
    return outs[0]


# ---------------------------------------------------------------------------
# Block-size selection
# ---------------------------------------------------------------------------


def pick_block_rows(h: int, w: int, cin: int, cout: int,
                    itemsize: int = 2, cout_block: Optional[int] = None,
                    prologue: bool = False, res_channels: int = 0) -> int:
    """Largest row-block (divisor of h) whose working set fits VMEM:
    2x slab (double buffer) + resident weights + f32 accumulator +
    2x output block (pipeline).  ``cout_block`` shrinks the accumulator
    and output block to one cout chunk (the (rows, couts) grid variant).
    ``slab`` is counted 3x: two DMA slots plus the whole-slab register
    materialization of `xs[sl]` inside the kernel.  The prologue runs in
    place one slab row at a time, so its f32 temporaries are bounded by
    ~2 row-sized vectors regardless of br; a residual adds its own
    double-buffered block."""
    weights = 9 * cin * cout * itemsize
    wm = w + 2 * _MG
    cb = cout_block or cout
    for br in (32, 16, 8, 4, 2, 1):
        if h % br:
            continue
        slab = 3 * (br + 2) * wm * cin * itemsize
        # 2x: the 9-tap accumulation chain keeps (acc + part) live.
        acc = 2 * br * w * cb * 4
        out = 2 * br * w * cb * itemsize
        total = weights + slab + acc + out
        if prologue:
            total += 2 * wm * cin * 4
        if res_channels:
            total += 2 * br * w * res_channels * itemsize
            total += res_channels * cout * itemsize   # rk (if projected)
        if total <= _VMEM_BUDGET:
            return br
    return 1


def pick_block_rows_upsample(h: int, w: int, cin: int, cout: int,
                             itemsize: int = 2,
                             cout_block: Optional[int] = None) -> int:
    """VMEM model of `_upsample_conv_kernel`: input slab (2 DMA slots +
    register materialization) + 2x phase kernels (streamed per cout
    chunk) + four f32 phase accumulators + the interleave temporary +
    2x (2br, 2w, cb) output blocks."""
    cb = cout_block or min(cout, 128)
    wm = w + 2 * _MG
    for br in (32, 16, 8, 4, 2, 1):
        if h % br:
            continue
        slab = 3 * (br + 2) * wm * cin * itemsize
        weights = 2 * 16 * cin * cb * itemsize
        accs = 5 * br * w * cb * 4       # 4 phases + live (acc + part)
        interleave = 4 * br * w * cb * 4
        out = 2 * 4 * br * w * cb * itemsize
        if slab + weights + accs + interleave + out <= _VMEM_BUDGET:
            return br
    return 1


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

"""Fused SwinIR window-attention kernel: interpret-mode parity.

The kernel path (kernels/swin_attention.py) replaces the XLA einsum
formulation on TPU in fast mode; these tests pin it against that einsum
path — including the shifted-window masks, whose per-window [nW, N, N]
table the kernel decomposes into row-class bias tables plus a
last-column delta (corner windows get row+col masks additively; -200 vs
the reference's -100 is softmax-equivalent, asserted here numerically).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hdrvae.kernels.swin_attention as ska
from hdrvae.core.config import Precision
from hdrvae.models.swinir import (SwinIRConfig, _gather_bias,
                                  _shift_attn_mask, _window_attention,
                                  _window_partition, init_swinir,
                                  swinir_apply)


def _attn_params(key, c, heads, ws):
    k1, k2, k3 = jax.random.split(key, 3)
    n_bias = (2 * ws - 1) ** 2
    return {
        "qkv": {"kernel": jax.random.normal(k1, (c, 3 * c)) * 0.2,
                "bias": jax.random.normal(k2, (3 * c,)) * 0.1},
        "proj": {"kernel": jax.random.normal(k3, (c, c)) * 0.2,
                 "bias": jnp.zeros((c,))},
        "relative_position_bias_table": jax.random.normal(
            jax.random.PRNGKey(9), (n_bias, heads)) * 0.3,
    }


@pytest.mark.parametrize("shift", [0, 4])
@pytest.mark.parametrize("b,hw", [(1, 32), (2, 16)])
def test_kernel_matches_xla_window_attention(shift, b, hw):
    """Window grid with interior/last-row/last-col/corner windows; the
    head dim (30) exercises the 32-pad; batch 2 exercises row-class
    periodicity across images."""
    ws, heads, c = 8, 2, 60
    key = jax.random.PRNGKey(0)
    p = _attn_params(key, c, heads, ws)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, hw, hw, c)) * 0.5
    if shift:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    wins = _window_partition(x, ws)

    prec = Precision()  # f32
    mask = _shift_attn_mask(hw, hw, ws, shift) if shift else None
    ref = _window_attention(wins, p, heads, ws, mask, prec)

    got = ska.swin_window_attention(
        wins, p, heads, ws, (hw, hw), shift, _gather_bias(p, ws),
        precision=prec, interpret=True)
    err = float(jnp.abs(got - ref).max())
    assert err <= 1e-4, f"max-abs {err:.3e}"


def test_band_mask_decomposition_matches_reference_table():
    """mask_row/mask_col reconstruct _shift_attn_mask for every window
    class up to the -100/-200 corner double-count (softmax-equivalent,
    checked in the parity test above; here the -100-support sets must
    match exactly)."""
    hw, ws, shift = 32, 8, 4
    nw = hw // ws
    full = _shift_attn_mask(hw, hw, ws, shift)       # [nW, N, N]
    mrow, mcol = ska._band_masks(ws, shift)
    for i in range(nw):
        for j in range(nw):
            expect = np.zeros_like(mrow)
            if i == nw - 1:
                expect = expect + mrow
            if j == nw - 1:
                expect = expect + mcol
            got_nonzero = expect < 0
            ref_nonzero = full[i * nw + j] < 0
            np.testing.assert_array_equal(got_nonzero, ref_nonzero,
                                          err_msg=f"window ({i},{j})")


@pytest.mark.slow
def test_full_swinir_forward_kernel_vs_xla():
    """End-to-end swinir_apply equivalence with the kernel path forced
    (interpret mode) against the einsum path."""
    cfg = SwinIRConfig(embed_dim=24, depths=(2,), num_heads=(2,),
                       window_size=8, num_feat=8, scale=2,
                       upsampler="pixelshuffledirect")
    params = init_swinir(jax.random.PRNGKey(2), cfg)
    x = np.random.default_rng(0).uniform(
        0, 1, (1, 24, 16, 3)).astype(np.float32)

    ref = np.asarray(swinir_apply(
        params, jnp.asarray(x), cfg,
        precision=Precision(swin_attn="xla")))

    ska._INTERPRET = True
    try:
        got = np.asarray(swinir_apply(
            params, jnp.asarray(x), cfg,
            precision=Precision(swin_attn="pallas")))
    finally:
        ska._INTERPRET = False
    err = float(np.abs(got - ref).max())
    assert err <= 1e-4, f"max-abs {err:.3e}"


def test_pick_bwin_and_gate():
    assert ska.pick_bwin(64) == 8
    assert ska.pick_bwin(12) == 4
    assert ska.pick_bwin(6) == 2
    assert ska.pick_bwin(7) == 0
    # parity mode or odd grids keep the XLA path under "auto"
    assert not ska.use_swin_kernel(Precision(), 64, 64, 8)
    assert not ska.use_swin_kernel(Precision.fast(), 64, 56, 8)
    # token counts that misalign the score-dot lanes (Swin2SR JPEG-CAR
    # window 7: n=49, paired dot 98 lanes) must refuse the kernel even
    # when forced — the XLA einsum path serves them
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        ska.use_swin_kernel(Precision(swin_attn="pallas"), 56, 56, 7)
    assert not ska.use_swin_kernel(Precision.fast(), 56, 56, 7)


def test_padded_head_lanes_are_exact_zero():
    """v's pad lanes are zero, so out's pad lanes are exact zeros (the
    proj row-scatter relies on it)."""
    ws, heads, c = 8, 2, 60
    p = _attn_params(jax.random.PRNGKey(4), c, heads, ws)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 16, c))
    wins = _window_partition(x, ws)
    prec = Precision()
    wq, bq = ska._prep_qkv_weights(p["qkv"], heads, c // heads)
    qkv_r = jnp.einsum("wnc,scd->wsnd", wins, wq) + bq[None]
    tables = ska._block_diag2(_gather_bias(p, ws))[None]
    colmask2 = jnp.zeros((128, 128), jnp.float32)
    out = ska._attn_core(qkv_r, tables, colmask2, heads=heads, n=64,
                         nwh=2, nww=2, bwin=2, shifted=False,
                         interpret=True)
    pads = np.asarray(out)[..., 30:]     # [nwb, heads, 64, 32-pad]
    assert np.abs(pads).max() == 0.0


def test_ocab_gate_rejects_oversized_windows(monkeypatch):
    """A HAT variant with window 32 (nq=1024, nk=2304) would blow the
    scoped-VMEM budget at Mosaic compile time; the gate must fall back
    to XLA (auto) / refuse loudly (forced pallas) instead."""
    import hdrvae.kernels.ocab as ok
    monkeypatch.setattr(ok.jax, "default_backend", lambda: "tpu")
    fast = Precision.fast()
    assert ok.use_ocab_kernel(fast, 30, nq=256, nk=576)
    assert not ok.use_ocab_kernel(fast, 30, nq=1024, nk=2304)
    assert not ok.use_ocab_kernel(fast, 64, nq=256, nk=576)
    forced = Precision(swin_attn="pallas")
    with pytest.raises(AssertionError):
        ok.use_ocab_kernel(forced, 30, nq=1024, nk=2304)


def test_ocab_kernel_vs_einsum():
    """The OCAB cross-attention core (scores resident in VMEM) against
    the XLA einsum path, both shift-free cross shapes: nq=ws^2 queries
    vs nk=wse^2 overlapped keys with the rpi_oca bias."""
    from hdrvae.models.hat import HATConfig, _ocab, init_hat
    cfg = HATConfig(embed_dim=60, depths=(2,), num_heads=(2,),
                    window_size=8, num_feat=16, scale=2)
    params = init_hat(jax.random.PRNGKey(7), cfg)
    p = params["layers"][0]["overlap_attn"]
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 16, 16, 60)) * 0.5
    ref = _ocab(x, p, cfg, 2, Precision(swin_attn="xla"))
    ska._INTERPRET = True
    try:
        got = _ocab(x, p, cfg, 2, Precision(swin_attn="pallas"))
    finally:
        ska._INTERPRET = False
    err = float(jnp.abs(got - ref).max())
    assert err <= 1e-4, f"max-abs {err:.3e}"


@pytest.mark.slow
def test_full_hat_forward_kernel_vs_xla():
    """HAT's HAB attention through the same kernel (shared rpi, window
    16 semantics at the small fixture's window 4)."""
    from hdrvae.models.hat import HATConfig, hat_apply, init_hat
    cfg = HATConfig().with_small()       # window 4, depths (2, 2)
    params = init_hat(jax.random.PRNGKey(3), cfg)
    x = np.random.default_rng(1).uniform(
        0, 1, (1, 16, 16, 3)).astype(np.float32)

    ref = np.asarray(hat_apply(params, jnp.asarray(x), cfg,
                               precision=Precision(swin_attn="xla")))
    ska._INTERPRET = True
    try:
        got = np.asarray(hat_apply(params, jnp.asarray(x), cfg,
                                   precision=Precision(swin_attn="pallas")))
    finally:
        ska._INTERPRET = False
    err = float(np.abs(got - ref).max())
    assert err <= 1e-4, f"max-abs {err:.3e}"


@pytest.mark.parametrize("shift", [0, 8])
def test_fused_block_unpaired_large_window(shift):
    """Windows with n >= 128 tokens run the fused block's UNPAIRED
    core with [n, n] tables (HAT's window 16 — the paired block-diag
    tables would be 4x larger and blow VMEM); pin both shift classes
    against the XLA block."""
    from hdrvae.models.swinir import _swin_block
    ws, heads, c = 16, 2, 60
    h = w = 32                           # 2x2 window grid, bwin=2
    key = jax.random.PRNGKey(11)
    p = {
        "norm1": {"scale": jnp.ones((c,)) * 1.1,
                  "bias": jnp.zeros((c,)) + 0.05},
        "norm2": {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
        "attn": _attn_params(key, c, heads, ws),
        "mlp": {"fc1": {"kernel": jax.random.normal(
                            jax.random.PRNGKey(12), (c, 2 * c)) * 0.1,
                        "bias": jnp.zeros((2 * c,))},
                "fc2": {"kernel": jax.random.normal(
                            jax.random.PRNGKey(13), (2 * c, c)) * 0.1,
                        "bias": jnp.zeros((c,))}},
    }
    x = jax.random.normal(jax.random.PRNGKey(14), (1, h, w, c)) * 0.5
    ref = _swin_block(x, p, heads, ws, shift,
                      Precision(swin_attn="xla"))
    ska._INTERPRET = True
    try:
        got = _swin_block(x, p, heads, ws, shift,
                          Precision(swin_attn="pallas"))
    finally:
        ska._INTERPRET = False
    err = float(jnp.abs(got - ref).max())
    assert err <= 1e-4, f"max-abs {err:.3e}"


def test_image_layout_ln_qkv_and_proj_mlp_match_windows_math():
    """The prologue/epilogue kernels read/write the IMAGE layout with
    the window partition/merge done in-register; pin that contract
    directly against explicit partition + per-slot einsum math (the
    model-level tests cover it only end-to-end)."""
    ws, heads, c, b = 8, 2, 60, 2
    h, w = 16, 32                       # nwh=2, nww=4 -> bwin=4
    n = ws * ws
    key = jax.random.PRNGKey(3)
    p = _attn_params(key, c, heads, ws)
    norm1 = {"scale": jax.random.normal(jax.random.PRNGKey(4), (c,)) * 0.1
             + 1.0, "bias": jax.random.normal(jax.random.PRNGKey(5), (c,))
             * 0.1}
    norm2 = {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}
    mlp = {"fc1": {"kernel": jax.random.normal(
                       jax.random.PRNGKey(6), (c, 2 * c)) * 0.1,
                   "bias": jnp.zeros((2 * c,))},
           "fc2": {"kernel": jax.random.normal(
                       jax.random.PRNGKey(7), (2 * c, c)) * 0.1,
                   "bias": jnp.zeros((c,))}}
    img = jax.random.normal(jax.random.PRNGKey(8), (b, h, w, c)) * 0.5
    prec = Precision()  # f32
    bwin = ska.pick_bwin(w // ws, n)

    qkv = ska.ln_qkv(img, p, norm1, heads, ws=ws, bwin=bwin,
                     precision=prec, interpret=True)
    wins = _window_partition(img, ws)
    xf = wins.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), -1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * norm1["scale"] \
        + norm1["bias"]
    wq, bq = ska._prep_qkv_weights(p["qkv"], heads, c // heads)
    ref_qkv = jnp.einsum("wnc,scd->wsnd", y, wq) + bq[None]
    err = float(jnp.abs(qkv - ref_qkv).max())
    assert err <= 1e-4, f"ln_qkv image layout max-abs {err:.3e}"

    nwb = qkv.shape[0]
    attn_out = jax.random.normal(jax.random.PRNGKey(9),
                                 (nwb, heads, n, 32)) * 0.5
    extra = jax.random.normal(jax.random.PRNGKey(10), (b, h, w, c)) * 0.1
    out = ska.proj_mlp(attn_out, img, p, norm2, mlp, heads, ws=ws,
                       bwin=bwin, precision=prec, extra=extra,
                       interpret=True)
    wp = ska._prep_proj_weights(p["proj"], heads, c // heads)
    proj = jnp.einsum("whnd,hdc->wnc", attn_out, wp)
    x2 = wins + proj + p["proj"]["bias"] + _window_partition(extra, ws)
    y2 = (x2 - x2.mean(-1, keepdims=True)) * jax.lax.rsqrt(
        jnp.mean(jnp.square(x2 - x2.mean(-1, keepdims=True)), -1,
                 keepdims=True) + 1e-5) * norm2["scale"] + norm2["bias"]
    hmid = y2 @ mlp["fc1"]["kernel"] + mlp["fc1"]["bias"]
    hmid = jax.nn.gelu(hmid, approximate=False)
    ref_out = x2 + hmid @ mlp["fc2"]["kernel"] + mlp["fc2"]["bias"]
    from hdrvae.models.swinir import _window_merge
    ref_img = _window_merge(ref_out, ws, h, w)
    err = float(jnp.abs(out - ref_img).max())
    assert err <= 1e-4, f"proj_mlp image layout max-abs {err:.3e}"


def test_erf_poly_accuracy():
    """The in-kernel A&S erf polynomial (Pallas TPU has no erf lowering)
    must stay within 1e-6 of lax.erf over the GELU-relevant range
    (1.5e-7 analytic + f32 evaluation rounding)."""
    x = jnp.linspace(-6.0, 6.0, 4001)
    err = float(jnp.abs(ska._erf_poly(x) - jax.lax.erf(x)).max())
    assert err <= 1e-6, err


def test_full_swin2sr_forward_kernel_vs_xla():
    """End-to-end swin2sr_apply equivalence with the v2 kernel path
    (post_norm + cosine attention + CPB bias tables) forced in
    interpret mode against the einsum path.  24x16 grid covers
    interior/last-row/last-col/corner shift classes at window 8."""
    from hdrvae.models.swin2sr import (Swin2SRConfig, init_swin2sr,
                                       swin2sr_apply)
    cfg = Swin2SRConfig(embed_dim=24, depths=(2,), num_heads=(2,),
                        window_size=8, num_feat=8, scale=2,
                        upsampler="pixelshuffledirect")
    params = init_swin2sr(jax.random.PRNGKey(2), cfg)
    # non-trivial logit scales / cpb weights (init leaves them uniform)
    for blk in params["layers"][0]["blocks"]:
        a = blk["attn"]
        a["logit_scale"] = jax.random.normal(
            jax.random.PRNGKey(11), a["logit_scale"].shape) * 0.5
        a["cpb_fc1"]["bias"] = jax.random.normal(
            jax.random.PRNGKey(12), a["cpb_fc1"]["bias"].shape) * 0.3
    x = np.random.default_rng(0).uniform(
        0, 1, (1, 24, 16, 3)).astype(np.float32)

    ref = np.asarray(swin2sr_apply(
        params, jnp.asarray(x), cfg,
        precision=Precision(swin_attn="xla")))

    ska._INTERPRET = True
    try:
        got = np.asarray(swin2sr_apply(
            params, jnp.asarray(x), cfg,
            precision=Precision(swin_attn="pallas")))
    finally:
        ska._INTERPRET = False
    err = float(np.abs(got - ref).max())
    assert err <= 1e-4, f"max-abs {err:.3e}"

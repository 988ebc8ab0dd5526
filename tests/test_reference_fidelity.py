"""Fidelity against the ACTUAL reference implementation.

Closes the north-star metric from BASELINE.md ("max-abs error <=1e-3 vs
reference EXR output"): loads `/root/reference/hdr_vae_decode.py` and
`/root/reference/linear_exr_export.py` UNMODIFIED (only their missing
third-party imports are dependency-injected via sys.modules), wraps the
torch test oracle decoder in a minimal ComfyUI-style VAE shim carrying the
SAME weights as the hdrvae JAX decoder, and runs the reference node
end-to-end next to `hdrvae.decode.pipeline.hdr_decode`:

  - all four HDR modes through `simple_hdr_decode` (`hdr_vae_decode.py:62`),
  - the bypass/fallback tier (`:1205` simple_bypass via the `:160` cascade),
  - the EXR file written by `LinearEXRExport.export_linear_exr`
    (`linear_exr_export.py:230`).

Unlike tests/test_pipeline.py (a hand-transcribed numpy oracle), a shared
misreading of the reference cannot hide here — the reference's own code
computes the expected values.
"""

import importlib.util
import logging
import os
import sys
import types

import jax
import numpy as np
import pytest
import torch

from hdrvae.core.config import DecoderConfig, ExportConfig, HDRDecodeConfig, Precision
from hdrvae.decode.pipeline import hdr_decode
from hdrvae.io import exr as exr_io
from hdrvae.io.export import export_linear
from hdrvae.models.decoder import init_decoder

from tests.torch_oracle import TorchDecoder, torch_decoder_from_jax

REF_DIR = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference checkout not present")


# ---------------------------------------------------------------------------
# Dependency injection for the reference's third-party imports
# ---------------------------------------------------------------------------


def _install_stubs():
    """Provide the reference's missing imports without touching its code.

    - kornia.core: the reference imports ImageModule/Tensor but never uses
      them (`hdr_vae_decode.py:15-16`).
    - pyexr: backed by hdrvae's own EXR codec, so the reference's PRIMARY
      writer path (`linear_exr_export.py:157-171`) runs for real and its
      read-back verification (`:384-388`) round-trips through actual files.
    cv2 is real in this environment (used by the reference for RGB->BGR).
    """
    if "kornia" not in sys.modules:
        kornia = types.ModuleType("kornia")
        core = types.ModuleType("kornia.core")
        core.ImageModule = torch.nn.Module
        core.Tensor = torch.Tensor
        kornia.core = core
        sys.modules["kornia"] = kornia
        sys.modules["kornia.core"] = core

    if "folder_paths" not in sys.modules:
        # ComfyUI's output-directory registry (`linear_exr_export.py:437`);
        # tests point it at a tmp dir via `sys.modules["folder_paths"].
        # output_directory = ...`.
        fp = types.ModuleType("folder_paths")
        fp.output_directory = "/tmp/hdrvae-ref-fidelity"
        fp.get_output_directory = lambda: fp.output_directory
        sys.modules["folder_paths"] = fp

    if "pyexr" not in sys.modules:
        pyexr = types.ModuleType("pyexr")

        def _write(path, data, compression="zip", **_kw):
            data = np.asarray(data)
            pixel_type = "half" if data.dtype == np.float16 else "float"
            exr_io.write_exr(path, data.astype(np.float32),
                             pixel_type=pixel_type, compression=compression)

        def _read(path):
            return exr_io.read_exr(path)

        class _Open:
            def __init__(self, path):
                img = exr_io.read_exr(path)
                self.height, self.width = img.shape[:2]

        pyexr.write = _write
        pyexr.read = _read
        pyexr.open = _Open
        sys.modules["pyexr"] = pyexr


def comfy_tiled_scale(samples, function, tile_x=512, tile_y=512,
                      overlap=64, upscale_amount=4, pbar=None):
    """ComfyUI ``comfy.utils.tiled_scale``'s published semantics, in torch
    (the function the reference delegates to at
    `hdr_upscale_with_model.py:127-135`): the grid starts every
    ``tile - overlap`` pixels, each start clamped to
    ``max(0, min(size - overlap, start))`` and the tile truncated to the
    image (variable-size edge tiles); every tile is weighted by linear
    edge ramps of value (t+1)/feather with feather =
    round(overlap * upscale_amount); the accumulated image is divided by
    the accumulated weight."""
    import torch as _t
    b, c, h, w = samples.shape
    if h <= tile_y and w <= tile_x:
        # "handle entire input fitting in a single tile": one
        # un-feathered model call per batch element
        out = _t.cat([function(samples[i:i + 1]) for i in range(b)])
        if pbar is not None:
            pbar.update(b)
        return out
    out_h = round(h * upscale_amount)
    out_w = round(w * upscale_amount)
    out = out_div = None
    feather = round(overlap * upscale_amount)
    for y in range(0, h, tile_y - overlap):
        for x in range(0, w, tile_x - overlap):
            y_ = max(0, min(h - overlap, y))
            x_ = max(0, min(w - overlap, x))
            s_in = samples[:, :, y_:y_ + tile_y, x_:x_ + tile_x]
            ps = function(s_in)
            if out is None:
                out = _t.zeros((b, ps.shape[1], out_h, out_w))
                out_div = _t.zeros_like(out)
            mask = _t.ones_like(ps)
            for t in range(feather):
                mask[:, :, t:1 + t, :] *= (1.0 / feather) * (t + 1)
                mask[:, :, mask.shape[2] - 1 - t:mask.shape[2] - t, :] *= \
                    (1.0 / feather) * (t + 1)
                mask[:, :, :, t:1 + t] *= (1.0 / feather) * (t + 1)
                mask[:, :, :, mask.shape[3] - 1 - t:mask.shape[3] - t] *= \
                    (1.0 / feather) * (t + 1)
            ys, xs = round(y_ * upscale_amount), round(x_ * upscale_amount)
            out[:, :, ys:ys + ps.shape[2], xs:xs + ps.shape[3]] += ps * mask
            out_div[:, :, ys:ys + ps.shape[2], xs:xs + ps.shape[3]] += mask
            if pbar is not None:
                pbar.update(1)
    return out / out_div


def comfy_bislerp(samples, width, height):
    """ComfyUI ``comfy.utils.bislerp``'s published semantics, in torch:
    width pass then height pass; per pair of bilinear neighbors the
    channel-vector directions are slerped and magnitudes lerped;
    zero-norm vectors contribute zero direction; nearly-parallel pairs
    (dot > 1-1e-5) COPY the first neighbor; nearly-opposite pairs lerp the
    raw vectors.  Coordinates come from bilinear-interpolating index ramps
    (== half-pixel source coords clamped to [0, n-1])."""
    import torch as _t
    import torch.nn.functional as F

    def slerp(b1, b2, r):
        c = b1.shape[-1]
        b1_norms = _t.norm(b1, dim=-1, keepdim=True)
        b2_norms = _t.norm(b2, dim=-1, keepdim=True)
        b1_normalized = b1 / b1_norms
        b2_normalized = b2 / b2_norms
        b1_normalized[b1_norms.expand(-1, c) == 0.0] = 0.0
        b2_normalized[b2_norms.expand(-1, c) == 0.0] = 0.0
        dot = (b1_normalized * b2_normalized).sum(1)
        omega = _t.acos(dot.clamp(-1.0, 1.0))
        so = _t.sin(omega)
        res = (_t.sin((1.0 - r.squeeze(1)) * omega) / so).unsqueeze(1) * \
            b1_normalized + (_t.sin(r.squeeze(1) * omega) / so
                             ).unsqueeze(1) * b2_normalized
        res *= (b1_norms * (1.0 - r) + b2_norms * r).expand(-1, c)
        res[dot > 1 - 1e-5] = b1[dot > 1 - 1e-5]
        res[dot < 1e-5 - 1] = (b1 * (1.0 - r) + b2 * r)[dot < 1e-5 - 1]
        return res

    def generate_bilinear_data(length_old, length_new):
        coords_1 = _t.arange(length_old, dtype=_t.float32).reshape(
            (1, 1, 1, -1))
        coords_1 = F.interpolate(coords_1, size=(1, length_new),
                                 mode="bilinear")
        ratios = coords_1 - coords_1.floor()
        coords_1 = coords_1.to(_t.int64)
        coords_2 = _t.arange(length_old, dtype=_t.float32).reshape(
            (1, 1, 1, -1)) + 1
        coords_2[:, :, :, -1] -= 1
        coords_2 = F.interpolate(coords_2, size=(1, length_new),
                                 mode="bilinear")
        coords_2 = coords_2.to(_t.int64)
        return ratios, coords_1, coords_2

    orig_dtype = samples.dtype
    samples = samples.float()
    n, c, h, w = samples.shape
    h_new, w_new = height, width

    # width pass
    ratios, coords_1, coords_2 = generate_bilinear_data(w, w_new)
    coords_1 = coords_1.expand((n, c, h, -1))
    coords_2 = coords_2.expand((n, c, h, -1))
    ratios = ratios.expand((n, 1, h, -1))
    pass_1 = samples.gather(-1, coords_1).movedim(1, -1).reshape((-1, c))
    pass_2 = samples.gather(-1, coords_2).movedim(1, -1).reshape((-1, c))
    ratios = ratios.movedim(1, -1).reshape((-1, 1))
    result = slerp(pass_1, pass_2, ratios)
    result = result.reshape(n, h, w_new, c).movedim(-1, 1)

    # height pass
    ratios, coords_1, coords_2 = generate_bilinear_data(h, h_new)
    coords_1 = coords_1.reshape((1, 1, -1, 1)).expand((n, c, -1, w_new))
    coords_2 = coords_2.reshape((1, 1, -1, 1)).expand((n, c, -1, w_new))
    ratios = ratios.reshape((1, 1, -1, 1)).expand((n, 1, -1, w_new))
    pass_1 = result.gather(-2, coords_1).movedim(1, -1).reshape((-1, c))
    pass_2 = result.gather(-2, coords_2).movedim(1, -1).reshape((-1, c))
    ratios = ratios.movedim(1, -1).reshape((-1, 1))
    result = slerp(pass_1, pass_2, ratios)
    result = result.reshape(n, h_new, w_new, c).movedim(-1, 1)
    return result.to(orig_dtype)


def comfy_common_upscale(samples, width, height, upscale_method, crop):
    """ComfyUI ``common_upscale``: bislerp routes to the dedicated
    algorithm; plain modes delegate to
    F.interpolate(samples, size=(h, w), mode=...).  The reference always
    passes crop=False (`hdr_upscale_with_model.py:240`)."""
    import torch.nn.functional as F
    if upscale_method == "bislerp":
        return comfy_bislerp(samples, width, height)
    return F.interpolate(samples, size=(height, width), mode=upscale_method)


def _install_upscale_stubs():
    """Additional injection for `hdr_upscale_with_model.py`'s imports:
    comfy (model_management + utils), spandrel, torchvision.gaussian_blur,
    kornia.color/filters.  Each stub implements the third-party library's
    PUBLISHED semantics (cited inline) — the reference's own code runs
    unmodified on top."""
    import torch.nn.functional as F

    fp = sys.modules["folder_paths"]
    fp.get_full_path = lambda kind, name: name   # tests pass full paths
    fp.get_filename_list = lambda kind: []

    if "comfy" not in sys.modules:
        comfy = types.ModuleType("comfy")
        mm = types.ModuleType("comfy.model_management")
        mm.get_torch_device = lambda: torch.device("cpu")
        mm.module_size = lambda m: sum(p.numel() * p.element_size()
                                       for p in m.parameters())
        mm.free_memory = lambda *a, **k: None

        class _OOM(Exception):
            pass

        mm.OOM_EXCEPTION = _OOM
        ut = types.ModuleType("comfy.utils")
        ut.get_tiled_scale_steps = lambda w, h, tile_x, tile_y, overlap: 1

        class ProgressBar:
            def __init__(self, total):
                self.total = total

            def update(self, n=1):
                pass

        ut.ProgressBar = ProgressBar

        ut.tiled_scale = comfy_tiled_scale
        ut.common_upscale = comfy_common_upscale
        comfy.model_management = mm
        comfy.utils = ut
        sys.modules["comfy"] = comfy
        sys.modules["comfy.model_management"] = mm
        sys.modules["comfy.utils"] = ut

    if "spandrel" not in sys.modules:
        spandrel = types.ModuleType("spandrel")

        class _Arch:
            def __init__(self, name):
                self.name = name

        class _Descriptor:
            def __init__(self, model, name, scale):
                self.model = model
                self.architecture = _Arch(name)
                self.scale = scale

        class ModelLoader:
            def load_from_file(self, path):
                # spandrel detects the architecture from the key schema;
                # mirror that: SwinIR blocks -> TorchSwinIR, else RRDBNet
                sd = torch.load(path, weights_only=True)
                from hdrvae.models.swinir import (is_swinir_state_dict,
                                                  swinir_from_state_dict)
                if is_swinir_state_dict(sd):
                    from tests.torch_oracle import TorchSwinIR
                    _, cfg = swinir_from_state_dict(sd)
                    model = TorchSwinIR(cfg)
                    name = "SwinIR"
                else:
                    from hdrvae.models.rrdbnet import RRDBNetConfig
                    from tests.torch_oracle import TorchRRDBNet
                    cfg = RRDBNetConfig().with_small()
                    model = TorchRRDBNet(cfg)
                    name = "RealESRGAN"
                model.load_state_dict(sd)
                model.eval()
                model.requires_grad_(False)
                return _Descriptor(model, name, cfg.scale)

        spandrel.ModelLoader = ModelLoader
        spandrel.ImageModelDescriptor = _Descriptor
        sys.modules["spandrel"] = spandrel

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        tf = types.ModuleType("torchvision.transforms.functional")

        def gaussian_blur(img, kernel_size, sigma):
            # torchvision semantics: integer-sampled normalized gaussian,
            # separable conv, reflect padding
            ks = (kernel_size if isinstance(kernel_size, int)
                  else kernel_size[0])
            sig = sigma if isinstance(sigma, (int, float)) else sigma[0]
            half = (ks - 1) * 0.5
            xs = torch.linspace(-half, half, steps=ks)
            k1 = torch.exp(-0.5 * (xs / sig) ** 2)
            k1 = k1 / k1.sum()
            kern = torch.outer(k1, k1)[None, None]
            c = img.shape[-3]
            imgp = F.pad(img, (ks // 2,) * 4, mode="reflect")
            return F.conv2d(imgp, kern.expand(c, 1, ks, ks), groups=c)

        tf.gaussian_blur = gaussian_blur
        tv.transforms = tr
        tr.functional = tf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
        sys.modules["torchvision.transforms.functional"] = tf

    if "kornia.color" not in sys.modules:
        color = types.ModuleType("kornia.color")

        def rgb_to_ycbcr(image):
            # kornia BT.601: cb = (b-y)*0.564 + 0.5, cr = (r-y)*0.713 + 0.5
            r, g, b = image[..., 0, :, :], image[..., 1, :, :], \
                image[..., 2, :, :]
            y = 0.299 * r + 0.587 * g + 0.114 * b
            cb = (b - y) * 0.564 + 0.5
            cr = (r - y) * 0.713 + 0.5
            return torch.stack([y, cb, cr], -3)

        color.rgb_to_ycbcr = rgb_to_ycbcr
        filters = types.ModuleType("kornia.filters")

        def median_blur(inp, kernel_size):
            # kornia extracts windows via conv2d(padding=(k-1)//2) ==
            # implicit ZERO padding, then takes the median
            k = (kernel_size if isinstance(kernel_size, int)
                 else kernel_size[0])
            pad = k // 2
            xp = F.pad(inp, (pad,) * 4)
            patches = xp.unfold(2, k, 1).unfold(3, k, 1)
            flat = patches.reshape(*inp.shape, k * k)
            return flat.median(dim=-1).values

        filters.median_blur = median_blur
        kornia = sys.modules["kornia"]
        kornia.color = color
        kornia.filters = filters
        sys.modules["kornia.color"] = color
        sys.modules["kornia.filters"] = filters


def _load_ref_module(stem):
    _install_stubs()
    if stem == "hdr_upscale_with_model":
        _install_upscale_stubs()
    name = f"ref_{stem}"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF_DIR, f"{stem}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    logging.getLogger(name).setLevel(logging.ERROR)
    return mod


# ---------------------------------------------------------------------------
# The ComfyUI-style VAE shim (SURVEY.md section 2.6 surface)
# ---------------------------------------------------------------------------


class _FirstStage:
    def __init__(self, decoder: TorchDecoder):
        self.decoder = decoder


class VAEShim:
    """The minimal surface the reference node touches: ``.decode()``
    returning a ComfyUI-format [B, H, W, 3] image in [0, 1], and
    ``.first_stage_model.decoder`` with conv_in/mid/up/norm_out/conv_out
    (hooked at `hdr_vae_decode.py:855`, traversed at `:443,:1205`)."""

    def __init__(self, decoder: TorchDecoder):
        self.first_stage_model = _FirstStage(decoder)

    def decode(self, latent: torch.Tensor) -> torch.Tensor:
        rgb, _ = self.first_stage_model.decoder(latent)
        return rgb.permute(0, 2, 3, 1).contiguous()


# ---------------------------------------------------------------------------
# Fixtures: same weights on both sides
# ---------------------------------------------------------------------------

# 128 pre-conv_out channels are REQUIRED: the reference's intelligent path
# only collapses 128-channel maps (`hdr_vae_decode.py:1042`); any other
# width crashes its mode math (shape mismatch) and falls through to bypass.
FID_CFG = DecoderConfig(z_channels=4, ch=128, ch_mult=(1, 2),
                        num_res_blocks=1, num_groups=32, attn_mid=True)

# Bypass fixture: single level + no mid attention is the ONE topology where
# the reference's simple_bypass traversal (`:1205`, in-order up blocks,
# attention skipped) is numerically well-defined and equals "decode without
# conv_out".  Multi-level decoders crash both bypasses (wrong block order /
# the synthesized 512->256 reducer at `:637`).
BYP_CFG = DecoderConfig(z_channels=4, ch=128, ch_mult=(1,),
                        num_res_blocks=1, num_groups=32, attn_mid=False,
                        # identity latent preprocessing: the reference bypass
                        # feeds the RAW latent to decoder.conv_in
                        # (`hdr_vae_decode.py:1248`), skipping the host
                        # framework's z/scale+shift — neutralize it so the
                        # comparison isolates the traversal math
                        scale_factor=1.0, shift_factor=0.0)


@pytest.fixture(scope="module")
def ref_hdr():
    return _load_ref_module("hdr_vae_decode")


@pytest.fixture(scope="module")
def ref_exr():
    return _load_ref_module("linear_exr_export")


@pytest.fixture(scope="module")
def fid_params():
    return init_decoder(jax.random.PRNGKey(7), FID_CFG)


@pytest.fixture(scope="module")
def fid_shim(fid_params):
    return VAEShim(torch_decoder_from_jax(fid_params, FID_CFG))


@pytest.fixture(scope="module")
def fid_latent():
    # seed/scale chosen so the decoded image saturates BOTH clamp bounds
    # (post range exactly [0, 1] -> the reference classifies SIGMOID and
    # takes the logit-recovery path, `hdr_vae_decode.py:890-892,1087-1089`)
    # and the pre-conv_out map has HDR data (max ~4.5 > 1).
    rng = np.random.default_rng(1)
    return rng.standard_normal((1, 8, 8, 4)).astype(np.float32) * 5.0


def _to_torch_nchw(latent_nhwc):
    return torch.from_numpy(np.transpose(latent_nhwc, (0, 3, 1, 2)).copy())


def _max_abs(a, b):
    return float(np.abs(np.asarray(a) - np.asarray(b)).max())


# ---------------------------------------------------------------------------
# 1. The four HDR modes through the reference's simple_hdr_decode
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode,ev", [
    ("conservative", 1.0),
    ("conservative", 2.5),       # catches expansion-factor misreadings
    ("exposure", 1.0),
    ("adaptive_recovery", 1.0),
    ("mathematical_recovery", 1.0),
    ("mathematical_recovery", 0.5),
])
def test_mode_fidelity_vs_reference(ref_hdr, fid_params, fid_shim,
                                    fid_latent, mode, ev):
    node = ref_hdr.HDRVAEDecode()
    z_t = _to_torch_nchw(fid_latent)
    (ref_out,) = node.simple_hdr_decode({"samples": z_t}, fid_shim,
                                        hdr_mode=mode,
                                        conservative_ev_multiplier=ev)
    ref_img = ref_out.detach().numpy()

    # sanity: the interesting path ran (SIGMOID classification + HDR data),
    # not a degenerate fallback
    assert node.NORMALIZATION_FUNCTION == "SIGMOID"
    assert (ref_img > 1.0).any() or ref_img.max() > 1.1

    cfg = HDRDecodeConfig(hdr_mode=mode, conservative_ev_multiplier=ev)
    result = hdr_decode(fid_params, fid_latent, FID_CFG, cfg,
                        Precision.parity())
    assert not bool(result.used_fallback)
    got = np.asarray(result.image)
    assert got.shape == ref_img.shape

    scale = max(1.0, float(np.abs(ref_img).max()))
    err = _max_abs(got, ref_img)
    assert err <= 1e-3 * scale, (
        f"mode={mode} ev={ev}: max-abs {err:.3e} vs reference "
        f"(scale {scale:.2f})")


# ---------------------------------------------------------------------------
# 2. The bypass/fallback tier
# ---------------------------------------------------------------------------


def test_fallback_fidelity_vs_reference(ref_hdr):
    params = init_decoder(jax.random.PRNGKey(11), BYP_CFG)
    # Squash norm_out so pre-conv_out never exceeds 1.0: the intelligent
    # result then has no HDR pixels and both implementations take the
    # fallback tier (`hdr_vae_decode.py:106-112` / pipeline acceptance).
    params["norm_out"]["scale"] = params["norm_out"]["scale"] * 0.05
    shim = VAEShim(torch_decoder_from_jax(params, BYP_CFG))

    rng = np.random.default_rng(5)
    latent = rng.standard_normal((1, 8, 8, 4)).astype(np.float32) * 3.0

    node = ref_hdr.HDRVAEDecode()
    (ref_out,) = node.simple_hdr_decode({"samples": _to_torch_nchw(latent)},
                                        shim, hdr_mode="conservative",
                                        conservative_ev_multiplier=2.0)
    ref_img = ref_out.detach().numpy()

    # simple_bypass collapses via eye(3, C) == first 3 channels
    # (`hdr_vae_decode.py:1324-1329`); mirror it with the first3 knob.
    cfg = HDRDecodeConfig(hdr_mode="conservative",
                          conservative_ev_multiplier=2.0,
                          fallback_collapse="first3")
    result = hdr_decode(params, latent, BYP_CFG, cfg, Precision.parity())
    assert bool(result.used_fallback), "hdrvae should also reject"
    got = np.asarray(result.image)
    assert got.shape == ref_img.shape

    scale = max(1.0, float(np.abs(ref_img).max()))
    err = _max_abs(got, ref_img)
    assert err <= 1e-3 * scale, f"fallback tier: max-abs {err:.3e}"


# ---------------------------------------------------------------------------
# 3. EXR files: reference exporter vs hdrvae exporter, pixel for pixel
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bit_depth,comp", [("32bit", "zip"),
                                            ("16bit", "piz")])
def test_exr_export_fidelity_vs_reference(ref_hdr, ref_exr, fid_params,
                                          fid_shim, fid_latent, tmp_path,
                                          bit_depth, comp):
    node = ref_hdr.HDRVAEDecode()
    z_t = _to_torch_nchw(fid_latent)
    (ref_img,) = node.simple_hdr_decode({"samples": z_t}, fid_shim,
                                        hdr_mode="mathematical_recovery",
                                        conservative_ev_multiplier=1.0)

    exporter = ref_exr.LinearEXRExport()
    # a leading "/" means "subdirectory of the host framework's output dir"
    # in BOTH implementations (`linear_exr_export.py:268-273`); point the
    # stubbed folder_paths registry at this test's tmp dir
    sys.modules["folder_paths"].output_directory = str(tmp_path)
    (ref_path,) = exporter.export_linear_exr(
        ref_img, filename_prefix="FID", output_path="/ref",
        versioning=True, format="exr", bit_depth=bit_depth,
        compression=comp)
    assert ref_path.startswith(str(tmp_path))
    assert not ref_path.startswith("ERROR"), ref_path
    assert os.path.basename(ref_path) == "FID_v001.exr"

    result = hdr_decode(fid_params, fid_latent, FID_CFG,
                        HDRDecodeConfig(hdr_mode="mathematical_recovery"),
                        Precision.parity())
    export = export_linear(
        np.asarray(result.image),
        ExportConfig(filename_prefix="FID", output_path="/ours",
                     versioning=True, format="exr", bit_depth=bit_depth,
                     compression=comp),
        default_output_dir=str(tmp_path))
    assert export.error is None
    assert export.last.startswith(str(tmp_path))
    assert os.path.basename(export.last) == "FID_v001.exr"

    ref_pixels = exr_io.read_exr(ref_path)
    our_pixels = exr_io.read_exr(export.last)
    assert ref_pixels.shape == our_pixels.shape

    # the BASELINE.json fidelity contract, measured on actual files
    scale = max(1.0, float(np.abs(ref_pixels).max()))
    err = _max_abs(our_pixels, ref_pixels)
    # half-float storage quantizes both sides identically; the budget is
    # dominated by the decode-path difference
    tol = 1e-3 * scale if bit_depth == "32bit" else 2e-3 * scale
    assert err <= tol, f"EXR pixels: max-abs {err:.3e} (scale {scale:.2f})"


# ---------------------------------------------------------------------------
# 4. The upscaler node (HDRUpscaleWithModel) end to end
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("small_blur,local_fix", [
    (False, False),
    (True, False),
    (False, True),
])
def test_upscaler_fidelity_vs_reference(tmp_path, small_blur, local_fix):
    _upscaler_fidelity_case(tmp_path, small_blur, local_fix, "bilinear",
                            (20, 24))


def test_upscaler_bislerp_localfix_fidelity(tmp_path):
    """local_fix with upscale_method='bislerp' — the node's DEFAULT method
    (`hdr_upscale_with_model.py:65`): exercises hdrvae's bislerp against
    ComfyUI's algorithm through the full node path, where the binary
    dark-area mask makes any interpolation divergence catastrophic rather
    than gradual."""
    _upscaler_fidelity_case(tmp_path, False, True, "bislerp", (20, 24))


@pytest.mark.slow
def test_upscaler_multitile_fidelity_vs_reference(tmp_path):
    """>= 4-tile image (560 > tile stride 448 per axis) through the
    reference node's hardcoded tile=512/overlap=64 grid: validates
    hdrvae's comfy-semantics tiling (variable edge tiles + (t+1)/feather
    masks + weight normalization) against ComfyUI's actual algorithm on
    real model outputs, not an identity function."""
    _upscaler_fidelity_case(tmp_path, False, False, "bilinear", (560, 560))


def _upscaler_fidelity_case(tmp_path, small_blur, local_fix, method, hw):
    """`hdr_upscale_with_model.py` run UNMODIFIED (spandrel/comfy/kornia/
    torchvision injected with their published semantics) on the same
    RRDBNet weights as hdrvae's upscaler: two-pass atanh reversal, YCbCr
    luma/chroma recombination, Y clamp + median, gaussian pre-blur,
    local_fix dark-area blend."""
    ref_up = _load_ref_module("hdr_upscale_with_model")
    from hdrvae.core.config import TilingConfig, UpscaleConfig
    from hdrvae.models.rrdbnet import RRDBNetConfig, load_upscale_model
    from hdrvae.upscale.pipeline import hdr_upscale
    from tests.torch_oracle import TorchRRDBNet
    import jax.numpy as jnp

    model = TorchRRDBNet(RRDBNetConfig().with_small())
    ckpt = str(tmp_path / "RealESRGAN_small.pth")
    torch.save(model.state_dict(), ckpt)

    rng = np.random.default_rng(21)
    # HDR-ish input: mostly [0, 1] with highlights above and a few
    # negatives (the decode pipeline's actual output statistics)
    h, w = hw
    image = rng.standard_normal((1, h, w, 3)).astype(np.float32)
    image = np.abs(image) * 0.6
    image[0, 3:6, 4:8] *= 6.0      # highlight patch
    image[0, 10, 10] = -0.2        # signed range survives the pipeline

    node = ref_up.HDRUpscaleWithModel()
    (ref_out,) = node.upscale(torch.from_numpy(image.copy()), ckpt,
                              small_blur, local_fix, method)
    ref_img = ref_out.detach().numpy()

    params, model_cfg, arch = load_upscale_model(ckpt)
    cfg = UpscaleConfig(small_blur=small_blur, local_fix=local_fix,
                        upscale_method=method,
                        tiling=TilingConfig(tile=512, overlap=64))
    result = hdr_upscale(params, jnp.asarray(image), model_cfg, cfg,
                         architecture=arch)
    got = np.asarray(result.image)
    assert got.shape == ref_img.shape

    scale = max(1.0, float(np.abs(ref_img).max()))
    err = _max_abs(got, ref_img)
    assert err <= 1e-3 * scale, (
        f"upscaler small_blur={small_blur} local_fix={local_fix}: "
        f"max-abs {err:.3e} (scale {scale:.2f})")


# ---------------------------------------------------------------------------
# 5. The formerly-stubbed primitives, head to head with ComfyUI's algorithms
# ---------------------------------------------------------------------------


def test_comfy_tiled_scale_parity():
    """hdrvae ``tiled_apply(mode='comfy')`` vs the torch transcription of
    ComfyUI ``tiled_scale`` on a spatial-context function (3x3 zero-padded
    mean + tanh, then nearest x2), over a grid with full tiles, partial
    edge tiles, and sliver tiles (h=100, w=70, tile=32, overlap=8)."""
    import jax
    import jax.numpy as jnp
    import torch.nn.functional as F
    from hdrvae.tiling.tiled import tiled_apply

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 100, 70, 3)).astype(np.float32)

    def fn_torch(t):
        kern = torch.ones((3, 1, 3, 3)) / 9.0
        y = torch.tanh(F.conv2d(t, kern, padding=1, groups=3))
        return F.interpolate(y, scale_factor=2, mode="nearest")

    def fn_jax(t):  # [B, th, tw, C] -> [B, 2th, 2tw, C]
        kern = jnp.ones((3, 3, 1, 3), jnp.float32) / 9.0
        y = jax.lax.conv_general_dilated(
            t, kern, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=3)
        y = jnp.tanh(y)
        return jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)

    ref = comfy_tiled_scale(torch.from_numpy(
        np.transpose(x, (0, 3, 1, 2)).copy()), fn_torch,
        tile_x=32, tile_y=32, overlap=8, upscale_amount=2)
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))

    got = np.asarray(tiled_apply(fn_jax, jnp.asarray(x), tile=32,
                                 overlap=8, scale=2, mode="comfy"))
    assert got.shape == ref.shape
    assert _max_abs(got, ref) <= 1e-5, _max_abs(got, ref)

    # exact-fit image: ComfyUI's single-tile early-out (one un-feathered
    # model call, NOT a 2x2 grid with sliver tiles)
    x1 = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    calls = {"n": 0}

    def fn_torch_counted(t):
        calls["n"] += 1
        return fn_torch(t)

    ref1 = comfy_tiled_scale(torch.from_numpy(
        np.transpose(x1, (0, 3, 1, 2)).copy()), fn_torch_counted,
        tile_x=32, tile_y=32, overlap=8, upscale_amount=2)
    assert calls["n"] == 1
    ref1 = np.transpose(ref1.numpy(), (0, 2, 3, 1))
    got1 = np.asarray(tiled_apply(fn_jax, jnp.asarray(x1), tile=32,
                                  overlap=8, scale=2, mode="comfy"))
    assert _max_abs(got1, ref1) <= 1e-5, _max_abs(got1, ref1)
    np.testing.assert_allclose(got1, np.asarray(fn_jax(jnp.asarray(x1))),
                               atol=1e-6)


def test_comfy_bislerp_parity():
    """hdrvae ``bislerp`` vs the torch transcription on data that hits
    every slerp branch: generic vectors, zero-norm pixels, duplicated
    (parallel) and negated (antiparallel) neighbors, plus 1-channel input
    (the local_fix luma path, where every same-sign pair is 'parallel'
    and ComfyUI copies the left neighbor)."""
    import jax.numpy as jnp
    from hdrvae.upscale.resize import bislerp

    rng = np.random.default_rng(9)
    x = rng.standard_normal((1, 10, 12, 3)).astype(np.float32)
    x[0, 2, 3] = 0.0                  # zero-norm pixel
    x[0, 4, 5] = x[0, 4, 4]           # parallel neighbors
    x[0, 6, 8] = -x[0, 6, 7]          # antiparallel neighbors
    x[0, 7, 2] = 2.5 * x[0, 7, 1]     # parallel, different magnitude

    for arr, (ho, wo) in [(x, (23, 31)), (x[..., :1], (40, 18))]:
        ref = comfy_bislerp(
            torch.from_numpy(np.transpose(arr, (0, 3, 1, 2)).copy()),
            wo, ho)
        ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
        got = np.asarray(bislerp(jnp.asarray(arr), ho, wo))
        assert got.shape == ref.shape
        assert _max_abs(got, ref) <= 1e-5, \
            f"channels={arr.shape[-1]}: {_max_abs(got, ref):.3e}"


def test_upscaler_swinir_fidelity_vs_reference(tmp_path):
    """A SwinIR checkpoint through the reference node (spandrel stub
    detects the schema and serves the torch oracle) vs hdrvae's
    SwinIR-backed hdr_upscale: the VERDICT round-2 capability gap — the
    zoo used to reject anything but RRDBNet key schemas."""
    ref_up = _load_ref_module("hdr_upscale_with_model")
    import dataclasses
    import jax.numpy as jnp
    from hdrvae.core.config import TilingConfig, UpscaleConfig
    from hdrvae.models.swinir import SwinIRConfig
    from hdrvae.models.zoo import load_upscale_model
    from hdrvae.upscale.pipeline import hdr_upscale
    from tests.torch_oracle import TorchSwinIR

    cfg_m = dataclasses.replace(SwinIRConfig().with_small(),
                                upsampler="nearest+conv", scale=2)
    model = TorchSwinIR(cfg_m)
    gen = torch.Generator().manual_seed(13)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    ckpt = str(tmp_path / "swinir_small.pth")
    torch.save(model.state_dict(), ckpt)

    rng = np.random.default_rng(21)
    image = np.abs(rng.standard_normal((1, 20, 24, 3))).astype(
        np.float32) * 0.6
    image[0, 3:6, 4:8] *= 6.0

    node = ref_up.HDRUpscaleWithModel()
    (ref_out,) = node.upscale(torch.from_numpy(image.copy()), ckpt,
                              False, True, "bislerp")
    ref_img = ref_out.detach().numpy()

    params, model_cfg, arch = load_upscale_model(ckpt)
    assert arch == "SwinIR"
    cfg = UpscaleConfig(local_fix=True, upscale_method="bislerp",
                        tiling=TilingConfig(tile=512, overlap=64))
    result = hdr_upscale(params, jnp.asarray(image), model_cfg, cfg,
                         architecture=arch)
    got = np.asarray(result.image)
    assert got.shape == ref_img.shape

    scale = max(1.0, float(np.abs(ref_img).max()))
    err = _max_abs(got, ref_img)
    assert err <= 1e-3 * scale, f"SwinIR upscaler: max-abs {err:.3e}"


def test_mixed_tier_fidelity_vs_reference(ref_hdr, fid_params, fid_shim,
                                          fid_latent):
    """The FIDELITY-AT-SPEED tier (Precision.mixed(), round 4): the same
    <=1e-3 contract the parity tier carries, asserted against the
    reference's own code for every mode.  On CPU this pins the plumbing
    (f32 activations end to end, no bf16 casts); the on-chip HIGH-dot
    error budget is pinned by `tpu_checks.py mixed` (3e-4 vs parity) and
    the measured PERF_NOTES section 6 sweep."""
    for mode in ("conservative", "exposure", "adaptive_recovery",
                 "mathematical_recovery"):
        node = ref_hdr.HDRVAEDecode()
        z_t = _to_torch_nchw(fid_latent)
        (ref_out,) = node.simple_hdr_decode({"samples": z_t}, fid_shim,
                                            hdr_mode=mode,
                                            conservative_ev_multiplier=1.0)
        ref_img = ref_out.detach().numpy()
        cfg = HDRDecodeConfig(hdr_mode=mode)
        result = hdr_decode(fid_params, fid_latent, FID_CFG, cfg,
                            Precision.mixed())
        got = np.asarray(result.image)
        scale = max(1.0, float(np.abs(ref_img).max()))
        err = _max_abs(got, ref_img)
        assert err <= 1e-3 * scale, (
            f"mixed tier mode={mode}: max-abs {err:.3e} "
            f"(scale {scale:.2f})")

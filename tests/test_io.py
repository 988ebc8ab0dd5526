"""EXR/HDR round-trip and export-pipeline tests (SURVEY.md section 4c)."""

import json
import os

import numpy as np
import pytest

from hdrvae.core.config import ExportConfig
from hdrvae.io import exr, exr_py, hdr
from hdrvae.io.export import (export_linear, export_node_return,
                              get_highest_numbered_file, resolve_output_dir)
from hdrvae.io.native_build import load_native


@pytest.fixture(scope="module")
def hdr_image(rng=None):
    r = np.random.default_rng(42)
    img = (r.standard_normal((21, 37, 3)) * 4).astype(np.float32)
    img[0, 0] = [50.0, -3.5, 0.0]  # HDR + negative extremes
    return img


ALL_COMPRESSIONS = ["none", "rle", "zips", "zip", "pxr24"]


class TestEXRCodec:
    @pytest.mark.parametrize("compression", ALL_COMPRESSIONS)
    @pytest.mark.parametrize("pixel_type", ["half", "float"])
    def test_round_trip(self, tmp_path, hdr_image, compression, pixel_type):
        path = str(tmp_path / "t.exr")
        exr.write_exr(path, hdr_image, pixel_type=pixel_type,
                      compression=compression)
        back = exr.read_exr(path)
        assert back.shape == hdr_image.shape
        if pixel_type == "float" and compression != "pxr24":
            np.testing.assert_array_equal(back, hdr_image)
        elif pixel_type == "half":
            np.testing.assert_array_equal(
                back, hdr_image.astype(np.float16).astype(np.float32))
        else:  # pxr24 float: 15-bit mantissa, lossy by design
            np.testing.assert_allclose(back, hdr_image, rtol=2e-4,
                                       atol=1e-4)

    @pytest.mark.parametrize("compression", ALL_COMPRESSIONS + ["piz"])
    @pytest.mark.parametrize("pixel_type", ["half", "float"])
    def test_float16_input_byte_identical(self, tmp_path, hdr_image,
                                          compression, pixel_type):
        """float16 input (the pipelined exporter's reduced-precision fetch)
        must produce the same file as float32 input carrying the same
        binary16 values — the half-input codec entry skips the per-pixel
        float->half conversion but may not change a byte."""
        img16 = hdr_image.astype(np.float16)
        pa = str(tmp_path / "from32.exr")
        pb = str(tmp_path / "from16.exr")
        exr.write_exr(pa, img16.astype(np.float32), pixel_type=pixel_type,
                      compression=compression)
        exr.write_exr(pb, img16, pixel_type=pixel_type,
                      compression=compression)
        assert open(pa, "rb").read() == open(pb, "rb").read()

    @pytest.mark.parametrize("compression", ALL_COMPRESSIONS)
    def test_native_and_python_are_byte_identical(self, tmp_path, hdr_image,
                                                  compression):
        """Two independent implementations (C++ and numpy) of the format
        must produce identical files — the strongest available format check
        (no external EXR library exists in this environment)."""
        if load_native() is None:
            pytest.skip("native codec unavailable")
        pn = str(tmp_path / "native.exr")
        pp = str(tmp_path / "python.exr")
        exr.write_exr(pn, hdr_image, compression=compression,
                      use_native=True)
        exr_py.write_exr(pp, hdr_image, pixel_type="half",
                         compression=compression)
        assert open(pn, "rb").read() == open(pp, "rb").read()

    def test_cross_implementation_reads(self, tmp_path, hdr_image):
        if load_native() is None:
            pytest.skip("native codec unavailable")
        path = str(tmp_path / "x.exr")
        exr_py.write_exr(path, hdr_image, pixel_type="float",
                         compression="zip")
        native_read = exr.read_exr(path, use_native=True)
        py_read = exr_py.read_exr(path)
        np.testing.assert_array_equal(native_read, py_read)
        np.testing.assert_array_equal(native_read, hdr_image)

    def test_hdr_and_negatives_survive(self, tmp_path, hdr_image):
        """The core contract (`linear_exr_export.py:403-418`): >1.0 and <0
        survive the file."""
        path = str(tmp_path / "t.exr")
        exr.write_exr(path, hdr_image, pixel_type="float")
        back = exr.read_exr(path)
        assert back.max() > 1.0
        assert back.min() < 0.0

    def test_piz_native_round_trip(self, tmp_path, hdr_image):
        """True PIZ (wavelet+Huffman) via the native codec: lossless."""
        if load_native() is None:
            pytest.skip("native codec unavailable")
        path = str(tmp_path / "t.exr")
        exr.write_exr(path, hdr_image, pixel_type="float",
                      compression="piz")
        header = open(path, "rb").read()
        hdr_out, _ = exr_py.read_exr_header(header)
        assert hdr_out["compression"] == "piz"
        np.testing.assert_array_equal(exr.read_exr(path), hdr_image)

    def test_piz_compresses_smooth_data(self, tmp_path):
        """PIZ should beat NONE decisively on smooth gradients."""
        if load_native() is None:
            pytest.skip("native codec unavailable")
        y = np.linspace(0, 4, 64)[:, None, None]
        x = np.linspace(0, 2, 64)[None, :, None]
        img = (y + x * np.ones((1, 1, 3))).astype(np.float32)
        p_piz = str(tmp_path / "p.exr")
        p_none = str(tmp_path / "n.exr")
        exr.write_exr(p_piz, img, compression="piz")
        exr.write_exr(p_none, img, compression="none")
        assert os.path.getsize(p_piz) < 0.6 * os.path.getsize(p_none)
        np.testing.assert_array_equal(
            exr.read_exr(p_piz),
            img.astype(np.float16).astype(np.float32))

    def test_piz_fallback_without_native(self, tmp_path, hdr_image):
        """Pure-Python path substitutes zip for piz (documented)."""
        path = str(tmp_path / "t.exr")
        exr.write_exr(path, hdr_image, compression="piz",
                      use_native=False)
        hdr_out, _ = exr_py.read_exr_header(open(path, "rb").read())
        assert hdr_out["compression"] == "zip"

    def test_header_fields(self, tmp_path, hdr_image):
        path = str(tmp_path / "t.exr")
        exr.write_exr(path, hdr_image, pixel_type="half", compression="zip")
        header, _ = exr_py.read_exr_header(open(path, "rb").read())
        assert header["width"] == 37 and header["height"] == 21
        assert [c[0] for c in header["channels"]] == ["B", "G", "R"]
        assert all(c[1] == exr_py.PIXEL_HALF for c in header["channels"])

    def test_single_channel(self, tmp_path):
        img = np.random.default_rng(0).standard_normal(
            (9, 11)).astype(np.float32)
        path = str(tmp_path / "y.exr")
        exr.write_exr(path, img, pixel_type="float", compression="zip")
        back = exr.read_exr(path)
        np.testing.assert_array_equal(back[..., 0], img)

    def test_odd_sizes_and_chunk_boundaries(self, tmp_path):
        """Heights around the 16-line ZIP chunk boundary."""
        r = np.random.default_rng(1)
        for h in (1, 15, 16, 17, 32, 33):
            img = r.standard_normal((h, 5, 3)).astype(np.float32)
            path = str(tmp_path / f"h{h}.exr")
            exr.write_exr(path, img, pixel_type="float", compression="zip")
            np.testing.assert_array_equal(exr.read_exr(path), img)

    def test_non_exr_rejected(self, tmp_path):
        path = str(tmp_path / "bogus.exr")
        open(path, "wb").write(b"not an exr file at all")
        with pytest.raises(Exception):
            exr_py.read_exr(path)


class TestHDRCodec:
    def test_round_trip_within_rgbe_precision(self, tmp_path):
        r = np.random.default_rng(3)
        img = np.abs(r.standard_normal((19, 33, 3))).astype(np.float32) * 5
        path = str(tmp_path / "t.hdr")
        hdr.write_hdr(path, img)
        back = hdr.read_hdr(path)
        # RGBE: 8-bit mantissa with shared exponent 2^e where
        # 2^e in (maxc, 2*maxc] -> quantization step is at most 2*maxc/256.
        bound = 2.0 * img.max(-1, keepdims=True) / 256.0 + 1e-6
        assert (np.abs(back - img) <= bound).all()

    def test_negative_clamped_to_zero(self, tmp_path):
        """RGBE is unsigned; negatives clamp (same as the cv2 path the
        reference uses)."""
        img = np.full((8, 8, 3), -1.0, np.float32)
        path = str(tmp_path / "neg.hdr")
        hdr.write_hdr(path, img)
        assert (hdr.read_hdr(path) == 0).all()

    def test_flat_narrow_image(self, tmp_path):
        img = np.abs(np.random.default_rng(0).standard_normal(
            (4, 4, 3))).astype(np.float32)
        path = str(tmp_path / "n.hdr")
        hdr.write_hdr(path, img)
        back = hdr.read_hdr(path)
        bound = 2.0 * img.max(-1, keepdims=True) / 256.0 + 1e-6
        assert (np.abs(back - img) <= bound).all()


class TestVersioning:
    def test_scan(self, tmp_path):
        d = str(tmp_path)
        for name in ("x_v001.exr", "x_v012_frame_0001.exr", "x_v3.exr",
                     "other_v099.exr", "x_nonversioned.exr"):
            open(os.path.join(d, name), "w").close()
        assert get_highest_numbered_file(d, "x") == 12
        assert get_highest_numbered_file(d, "other") == 99
        assert get_highest_numbered_file(d, "missing") == 0


class TestResolveOutputDir:
    def test_three_way_rule(self, tmp_path):
        base = str(tmp_path / "out")
        assert resolve_output_dir("", base) == base
        assert resolve_output_dir("  ", base) == base
        assert resolve_output_dir("/HDR", base) == os.path.join(base, "HDR")
        assert resolve_output_dir("relative/custom", base) == "relative/custom"


class TestExportPipeline:
    def test_single_export_with_verify(self, tmp_path, hdr_image):
        cfg = ExportConfig(filename_prefix="test", output_path="",
                           format="exr", bit_depth="32bit",
                           compression="zip")
        res = export_linear(hdr_image, cfg,
                            default_output_dir=str(tmp_path))
        assert res.error is None
        assert res.verified
        assert res.verify_stats["hdr_preserved"]
        assert res.verify_stats["negatives_preserved"]
        assert export_node_return(res) == (res.last,)
        back = exr.read_exr(res.last)
        np.testing.assert_array_equal(back, hdr_image)

    def test_versioned_sequential_saves(self, tmp_path, hdr_image):
        cfg = ExportConfig(filename_prefix="seq", output_path="",
                           versioning=True, format="exr")
        r1 = export_linear(hdr_image, cfg, default_output_dir=str(tmp_path))
        r2 = export_linear(hdr_image, cfg, default_output_dir=str(tmp_path))
        assert os.path.basename(r1.last) == "seq_v001.exr"
        assert os.path.basename(r2.last) == "seq_v002.exr"

    def test_batch_frame_sequence(self, tmp_path, hdr_image):
        batch = np.stack([hdr_image, hdr_image * 2, hdr_image * 3])
        cfg = ExportConfig(filename_prefix="anim", output_path="",
                           start_frame=1001, frame_pad=4, format="exr")
        res = export_linear(batch, cfg, default_output_dir=str(tmp_path))
        names = [os.path.basename(p) for p in res.filepaths]
        assert names == ["anim_frame_1001.exr", "anim_frame_1002.exr",
                         "anim_frame_1003.exr"]

    def test_frame_sequence_flag_single(self, tmp_path, hdr_image):
        cfg = ExportConfig(filename_prefix="f", output_path="",
                           frame_sequence=True, start_frame=5, frame_pad=6)
        res = export_linear(hdr_image, cfg, default_output_dir=str(tmp_path))
        assert os.path.basename(res.last) == "f_frame_000005.exr"

    def test_prefix_subdirectories(self, tmp_path, hdr_image):
        cfg = ExportConfig(filename_prefix="shots/sh010/beauty",
                           output_path="")
        res = export_linear(hdr_image, cfg, default_output_dir=str(tmp_path))
        assert res.error is None
        assert res.last.endswith(os.path.join("shots", "sh010",
                                              "beauty.exr"))

    def test_output_path_subdir_rule(self, tmp_path, hdr_image):
        cfg = ExportConfig(filename_prefix="x", output_path="/HDR")
        res = export_linear(hdr_image, cfg, default_output_dir=str(tmp_path))
        assert os.path.dirname(res.last) == str(tmp_path / "HDR")

    def test_sidecar_workflow(self, tmp_path, hdr_image):
        cfg = ExportConfig(filename_prefix="wf", output_path="",
                           save_workflow=True)
        res = export_linear(hdr_image, cfg, default_output_dir=str(tmp_path),
                            prompt={"node": 1},
                            extra_pnginfo={"workflow": {"nodes": []}})
        sidecar = os.path.splitext(res.last)[0] + ".json"
        data = json.load(open(sidecar))
        assert data["prompt"] == {"node": 1}
        assert data["extra_pnginfo"]["workflow"] == {"nodes": []}

    def test_hdr_format_export(self, tmp_path, hdr_image):
        cfg = ExportConfig(filename_prefix="rad", output_path="",
                           format="hdr")
        res = export_linear(np.abs(hdr_image), cfg,
                            default_output_dir=str(tmp_path))
        assert res.error is None
        assert res.last.endswith(".hdr")
        assert res.verify_stats["hdr_preserved"]

    def test_error_contract(self, tmp_path, hdr_image):
        """Failures return ('ERROR: ...',) — never raise
        (`linear_exr_export.py:366-369`)."""
        cfg = ExportConfig(filename_prefix="e", output_path="",
                           format="exr", compression="bogus")
        res = export_linear(hdr_image, cfg, default_output_dir=str(tmp_path))
        assert res.error is not None
        ret = export_node_return(res)
        assert ret[0].startswith("ERROR:")

    def test_16bit_default_is_half(self, tmp_path, hdr_image):
        cfg = ExportConfig(filename_prefix="h16", output_path="")
        res = export_linear(hdr_image, cfg, default_output_dir=str(tmp_path))
        header, _ = exr_py.read_exr_header(open(res.last, "rb").read())
        assert all(c[1] == exr_py.PIXEL_HALF for c in header["channels"])


class TestPIZFuzz:
    def test_many_shapes_lossless(self, tmp_path):
        """PIZ roundtrip across chunk boundaries (32 lines), odd sizes,
        extreme values, and both pixel types."""
        if load_native() is None:
            pytest.skip("native codec unavailable")
        r = np.random.default_rng(9)
        shapes = [(1, 1, 3), (7, 3, 3), (31, 5, 3), (32, 8, 3),
                  (33, 129, 3), (96, 17, 3), (64, 64, 1)]
        for i, shape in enumerate(shapes):
            img = (r.standard_normal(shape) * (10 ** (i % 4))).astype(
                np.float32)
            img.flat[0] = 65504.0   # half max
            img.flat[-1] = -65504.0
            if img.size > 2:
                img.flat[1] = 0.0
            for ptype in ("half", "float"):
                path = str(tmp_path / f"f{i}{ptype}.exr")
                exr.write_exr(path, img, pixel_type=ptype,
                              compression="piz")
                back = exr.read_exr(path)
                expect = (img.astype(np.float16).astype(np.float32)
                          if ptype == "half" else img)
                np.testing.assert_array_equal(
                    back.reshape(expect.shape), expect,
                    err_msg=f"shape={shape} ptype={ptype}")

    def test_constant_image(self, tmp_path):
        if load_native() is None:
            pytest.skip("native codec unavailable")
        img = np.full((40, 40, 3), 2.5, np.float32)
        path = str(tmp_path / "const.exr")
        exr.write_exr(path, img, compression="piz")
        np.testing.assert_array_equal(exr.read_exr(path), img)
        # constant data compresses to almost nothing
        assert os.path.getsize(path) < 1200


def test_piz_python_fallback_after_native_failure(tmp_path, monkeypatch):
    """If the native writer errors at write time, the python fallback must
    substitute zip for piz instead of raising (review regression)."""
    import hdrvae.io.exr as exr_mod

    class FailingLib:
        def exr_write(self, *a):
            return -5

    monkeypatch.setattr(exr_mod, "load_native", lambda: FailingLib())
    img = np.random.default_rng(0).standard_normal((6, 6, 3)).astype(
        np.float32)
    path = str(tmp_path / "fb.exr")
    exr_mod.write_exr(path, img, compression="piz")  # must not raise
    header, _ = exr_py.read_exr_header(open(path, "rb").read())
    assert header["compression"] == "zip"


def test_piz_cross_implementation_read(tmp_path):
    """The pure-Python PIZ decoder (independent huffman + wavelet + LUT
    implementation) must exactly read files the C++ codec writes — the
    same two-implementation cross-validation the other compressions get."""
    if load_native() is None:
        pytest.skip("native codec unavailable")
    r = np.random.default_rng(4)
    for shape, ptype in [((21, 37, 3), "half"), ((33, 5, 3), "float"),
                         ((64, 64, 1), "half")]:
        img = (r.standard_normal(shape) * 4).astype(np.float32)
        path = str(tmp_path / "x.exr")
        exr.write_exr(path, img, pixel_type=ptype, compression="piz",
                      use_native=True)
        back = exr_py.read_exr(path)   # pure-Python path
        expect = (img.astype(np.float16).astype(np.float32)
                  if ptype == "half" else img)
        np.testing.assert_array_equal(back.reshape(expect.shape), expect)


def test_piz_16bit_wavelet_path(tmp_path):
    """>16384 distinct short values engage the wenc16/wdec16 wavelet
    variant; both implementations must still round-trip exactly."""
    if load_native() is None:
        pytest.skip("native codec unavailable")
    r = np.random.default_rng(8)
    img = (r.standard_normal((128, 128, 3)) * 100).astype(np.float32)
    path = str(tmp_path / "big.exr")
    exr.write_exr(path, img, pixel_type="float", compression="piz",
                  use_native=True)
    np.testing.assert_array_equal(exr.read_exr(path, use_native=True), img)
    np.testing.assert_array_equal(exr_py.read_exr(path), img)


class TestPipelinedExport:
    """export_stream: identical files to the serial exporter, overlap
    mechanics, reduced-precision fetch equivalence (VERDICT round-2 item 1)."""

    def _frames(self, n=4, h=12, w=10):
        rng = np.random.default_rng(33)
        out = []
        for _ in range(n):
            f = rng.standard_normal((h, w, 3)).astype(np.float32) * 1.5
            f[0, 0, 0] = -0.3
            out.append(f)
        return out

    def test_matches_serial_exporter_bitwise(self, tmp_path):
        from hdrvae.io.pipeline import export_stream
        frames = self._frames()
        cfg16 = ExportConfig(filename_prefix="pipe", output_path="",
                             bit_depth="16bit", compression="zip",
                             versioning=True)
        serial = export_linear(np.stack(frames), cfg16,
                               default_output_dir=str(tmp_path / "a"))
        piped = export_stream(frames, cfg16,
                              default_output_dir=str(tmp_path / "b"))
        assert serial.error is None and piped.error is None
        assert len(serial.filepaths) == len(piped.filepaths) == 4
        for a, b in zip(serial.filepaths, piped.filepaths):
            assert os.path.basename(a) == os.path.basename(b)
            with open(a, "rb") as fa, open(b, "rb") as fb:
                assert fa.read() == fb.read(), \
                    f"{os.path.basename(a)} differs"
        assert piped.verified and piped.verify_stats["hdr_preserved"]

    def test_callable_frames_and_jax_arrays(self, tmp_path):
        import jax.numpy as jnp
        from hdrvae.io.pipeline import export_stream
        frames = self._frames(3)
        # mix: numpy, device array, lazy callable dispatching device work
        mixed = [frames[0], jnp.asarray(frames[1]),
                 lambda: jnp.asarray(frames[2]) * 1.0]
        cfg = ExportConfig(filename_prefix="mix", output_path="",
                           bit_depth="32bit", compression="zip")
        res = export_stream(mixed, cfg,
                            default_output_dir=str(tmp_path))
        assert res.error is None
        assert len(res.filepaths) == 3
        for i, f in enumerate(frames):
            back = exr.read_exr(res.filepaths[i])
            np.testing.assert_allclose(back, f, atol=1e-6)

    def test_reduced_precision_fetch_lossless_for_16bit(self, tmp_path):
        """f32 -> f16 (device cast) -> half-EXR equals f32 -> half-EXR:
        binary16 quantization is idempotent, so the fetch optimization is
        bit-exact for 16-bit output."""
        import jax.numpy as jnp
        from hdrvae.io.pipeline import export_stream
        frames = self._frames(2)
        cfg = ExportConfig(filename_prefix="rp", output_path="",
                           bit_depth="16bit", compression="none")
        a = export_stream([jnp.asarray(f) for f in frames], cfg,
                          default_output_dir=str(tmp_path / "half"),
                          reduced_precision_fetch=True)
        b = export_stream([jnp.asarray(f) for f in frames], cfg,
                          default_output_dir=str(tmp_path / "full"),
                          reduced_precision_fetch=False)
        for fa, fb in zip(a.filepaths, b.filepaths):
            with open(fa, "rb") as x, open(fb, "rb") as y:
                assert x.read() == y.read()

    def test_chunked_fetch_matches(self, tmp_path):
        import jax.numpy as jnp
        from hdrvae.io.pipeline import export_stream
        frames = self._frames(2, h=16)
        cfg = ExportConfig(filename_prefix="ck", output_path="",
                           bit_depth="32bit", compression="zip")
        a = export_stream([jnp.asarray(f) for f in frames], cfg,
                          default_output_dir=str(tmp_path / "w1"),
                          fetch_workers=1)
        b = export_stream([jnp.asarray(f) for f in frames], cfg,
                          default_output_dir=str(tmp_path / "w4"),
                          fetch_workers=4)
        for fa, fb in zip(a.filepaths, b.filepaths):
            with open(fa, "rb") as x, open(fb, "rb") as y:
                assert x.read() == y.read()

    def test_error_contract(self, tmp_path):
        from hdrvae.io.pipeline import export_stream
        res = export_stream([], ExportConfig(),
                            default_output_dir=str(tmp_path))
        assert res.error == "ERROR: no frames"
        bad = ExportConfig(format="exr", compression="nope")
        res = export_stream(self._frames(1), bad,
                            default_output_dir=str(tmp_path))
        assert res.error is not None and res.error.startswith("ERROR")

    def test_midstream_failure_reports_written_files(self, tmp_path):
        """A frame failing mid-sequence: earlier frames already on disk
        are reported alongside the error (serial-exporter contract)."""
        import os
        from hdrvae.io.pipeline import export_stream
        frames = self._frames(4)

        def boom():
            raise RuntimeError("device died")

        seq = ExportConfig(filename_prefix="part", frame_sequence=True)
        res = export_stream(frames[:2] + [boom] + frames[3:], seq,
                            default_output_dir=str(tmp_path))
        assert res.error is not None and "device died" in res.error
        assert len(res.filepaths) >= 1          # frame 0 was written
        assert all(os.path.exists(p) for p in res.filepaths)

    def test_write_failure_stops_the_sequence(self, tmp_path):
        """A failed WRITE mid-sequence must stop the stream (the
        reference raises on the first failed save,
        `linear_exr_export.py:344-346`) instead of continuing past a
        hole: frames queued behind the failure are cancelled, not
        silently written."""
        import os
        import hdrvae.io.pipeline as pl
        from hdrvae.io.pipeline import export_stream
        orig_save = pl._save_one
        calls = []

        def failing_save(path, *a, **k):
            calls.append(path)
            if len(calls) == 3:     # third frame's write fails
                raise RuntimeError("disk full")
            return orig_save(path, *a, **k)

        pl._save_one = failing_save
        try:
            seq = ExportConfig(filename_prefix="hole",
                               frame_sequence=True)
            res = export_stream(self._frames(8), seq, depth=2,
                                default_output_dir=str(tmp_path))
        finally:
            pl._save_one = orig_save
        assert res.error is not None and "disk full" in res.error
        # frames before the failure exist; the tail of the sequence was
        # cancelled (bounded lookahead may have a frame or two already
        # in flight, but NOT the whole sequence) — with depth=2 at most
        # depth writes can land beyond the failed frame
        assert len(calls) <= 3 + 2, calls
        assert len(res.filepaths) >= 2
        assert all(os.path.exists(p) for p in res.filepaths)

    def test_verify_failure_is_nonfatal(self, tmp_path):
        """Read-back verification is diagnostic (the reference's
        _verify_save swallows exceptions): a verify error must not turn
        a successful export into an ERROR return."""
        import hdrvae.io.export as ex
        import hdrvae.io.pipeline as pl
        img = np.ones((2, 6, 6, 3), np.float32) * 2.0
        orig = ex.verify_save

        def bad_verify(path):
            raise RuntimeError("reader unavailable")

        ex.verify_save = bad_verify
        pl.verify_save = bad_verify
        try:
            res = ex.export_linear(
                img, ExportConfig(filename_prefix="vf"),
                default_output_dir=str(tmp_path))
            assert res.error is None and len(res.filepaths) == 2
            assert res.verified is False
            res2 = pl.export_stream(
                self._frames(2),
                ExportConfig(filename_prefix="vs", frame_sequence=True),
                default_output_dir=str(tmp_path))
            assert res2.error is None and len(res2.filepaths) == 2
            assert res2.verified is False
        finally:
            ex.verify_save = orig
            pl.verify_save = orig

    def test_sidecar_failure_is_nonfatal(self, tmp_path):
        """An unserializable workflow prompt must not abort an export
        whose frames are already on disk (the reference logs and
        continues, `linear_exr_export.py:134-143`)."""
        from hdrvae.io.export import export_linear
        img = np.ones((1, 6, 6, 3), np.float32)
        res = export_linear(
            img, ExportConfig(filename_prefix="sc", save_workflow=True),
            default_output_dir=str(tmp_path),
            prompt={"bad": {1, 2, 3}})   # sets are not JSON-serializable
        assert res.error is None and len(res.filepaths) == 1
        assert not list(tmp_path.glob("sc*.json"))

    def test_writer_queue_is_bounded(self, tmp_path):
        """With a slow writer, fetched-but-unwritten frames must stay
        bounded by depth (no unbounded write_q growth)."""
        import threading
        import time as _time
        import hdrvae.io.pipeline as pl
        from hdrvae.io.pipeline import export_stream
        state = {"fetched": 0, "written": 0, "max_gap": 0}
        lock = threading.Lock()
        orig_fetch, orig_save = pl._fetch, pl._save_one

        def counting_fetch(*a, **k):
            out = orig_fetch(*a, **k)
            with lock:
                state["fetched"] += 1
                state["max_gap"] = max(state["max_gap"],
                                       state["fetched"]
                                       - state["written"])
            return out

        def slow_save(*a, **k):
            _time.sleep(0.05)
            out = orig_save(*a, **k)
            with lock:
                state["written"] += 1
            return out

        pl._fetch, pl._save_one = counting_fetch, slow_save
        try:
            seq = ExportConfig(filename_prefix="bq", frame_sequence=True)
            res = export_stream(self._frames(10), seq, depth=2,
                                default_output_dir=str(tmp_path))
        finally:
            pl._fetch, pl._save_one = orig_fetch, orig_save
        assert res.error is None, res.error
        assert len(res.filepaths) == 10
        # <= depth in the fetch queue + depth+1 pending writes
        assert state["max_gap"] <= 2 * 2 + 1, state


class TestRobustness:
    def test_versioning_with_glob_metachars(self, tmp_path):
        """A prefix like 'shot[1]' must version correctly, not reset to
        _v001 and overwrite (glob metachars must match literally)."""
        from hdrvae.io.export import export_linear
        img = np.full((4, 4, 3), 2.0, np.float32)[None]
        cfg = ExportConfig(filename_prefix="shot[1]", versioning=True)
        r1 = export_linear(img, cfg, default_output_dir=str(tmp_path))
        r2 = export_linear(img, cfg, default_output_dir=str(tmp_path))
        assert r1.error is None and r2.error is None
        assert r1.filepaths != r2.filepaths, "second export overwrote v001"
        assert "_v001" in r1.filepaths[0] and "_v002" in r2.filepaths[0]

    def test_percent_in_prefix(self, tmp_path):
        """'%' in the prefix must not be consumed as a format directive
        by the frame template (or crash the export)."""
        from hdrvae.io.export import export_linear
        img = np.full((2, 4, 4, 3), 2.0, np.float32)
        cfg = ExportConfig(filename_prefix="100%_render",
                           frame_sequence=True)
        res = export_linear(img, cfg, default_output_dir=str(tmp_path))
        assert res.error is None, res.error
        assert len(res.filepaths) == 2
        assert all("100%_render_frame_" in os.path.basename(p)
                   for p in res.filepaths)
        # un-sequenced: prefix used verbatim
        res1 = export_linear(img[:1], ExportConfig(
            filename_prefix="take%d"), default_output_dir=str(tmp_path))
        assert res1.error is None
        assert os.path.basename(res1.filepaths[0]) == "take%d.exr"

    def test_many_channel_roundtrip_numeric_order(self, tmp_path):
        """12-channel EXR: channel10/channel11 must come back in numeric
        position (zero-padded names; numeric read order), both codecs."""
        from hdrvae.io.exr import read_exr, write_exr
        rng = np.random.default_rng(0)
        img = rng.standard_normal((6, 5, 12)).astype(np.float32)
        for use_native in (True, False):
            p = str(tmp_path / f"multi_{use_native}.exr")
            write_exr(p, img, pixel_type="float", compression="zip",
                      use_native=use_native)
            got = read_exr(p, use_native=use_native)
            np.testing.assert_array_equal(got, img)
        # cross: native-written read by python and vice versa
        got = read_exr(str(tmp_path / "multi_True.exr"), use_native=False)
        np.testing.assert_array_equal(got, img)

    def test_legacy_unpadded_channel_names_read_numerically(
            self, tmp_path, monkeypatch):
        """A file written with UNPADDED channelN names (legacy/external
        writer: channel10 sorts alphabetically before channel2) reads
        back in numeric order on both readers."""
        import hdrvae.io.exr_py as exr_py
        from hdrvae.io.exr import read_exr
        rng = np.random.default_rng(1)
        img = rng.standard_normal((4, 3, 11)).astype(np.float32)
        monkeypatch.setattr(
            exr_py, "_channel_names",
            lambda c: [f"channel{i}" for i in range(c)])
        p = str(tmp_path / "legacy.exr")
        exr_py.write_exr(p, img, pixel_type="float", compression="zip")
        for use_native in (True, False):
            got = read_exr(p, use_native=use_native)
            np.testing.assert_array_equal(got, img, err_msg=str(use_native))

    def test_truncated_exr_errors_cleanly(self, tmp_path):
        """A truncated EXR must raise a Python exception (native codec
        returns an error code; no OOB read / crash)."""
        from hdrvae.io.exr import read_exr, write_exr
        p = str(tmp_path / "t.exr")
        write_exr(p, np.random.default_rng(2).standard_normal(
            (32, 32, 3)).astype(np.float32), compression="zip")
        blob = open(p, "rb").read()
        for cut in (len(blob) - 7, len(blob) // 2):
            pt = str(tmp_path / f"cut{cut}.exr")
            open(pt, "wb").write(blob[:cut])
            with pytest.raises(Exception):
                read_exr(pt)

    def test_corrupt_chunk_size_errors_cleanly(self, tmp_path):
        """A chunk-size field pointing past EOF must not be trusted."""
        from hdrvae.io.exr import read_exr, write_exr
        p = str(tmp_path / "c.exr")
        write_exr(p, np.random.default_rng(3).standard_normal(
            (32, 32, 3)).astype(np.float32), compression="none")
        blob = bytearray(open(p, "rb").read())
        # none-compressed single-line chunks: corrupt the LAST chunk's
        # 4-byte size field (8 bytes before its data = 32*3*2 bytes)
        row_bytes = 32 * 3 * 2
        size_pos = len(blob) - row_bytes - 4
        blob[size_pos:size_pos + 4] = (2 ** 31 - 1).to_bytes(4, "little")
        pc = str(tmp_path / "corrupt.exr")
        open(pc, "wb").write(bytes(blob))
        # the native reader must REJECT the lying size field (no OOB
        # read); the tolerant pure-Python fallback may still recover the
        # pixels (the slice clamps to EOF) — either a clean exception or
        # the true data is acceptable, never a crash or garbage.
        try:
            got = read_exr(pc)
        except Exception:
            got = None
        if got is not None:
            ref = read_exr(p)
            np.testing.assert_array_equal(got, ref)


def test_hdr_rle_component_matches_bytewise_reference():
    """The segment-vectorized Radiance RLE encoder must be byte-identical
    to the per-byte reference algorithm (run cap 127, literal stretches
    cut at 128 from stretch start, <4 run leftovers merged forward)."""
    from hdrvae.io.hdr import _rle_component

    def per_byte(comp):
        out = bytearray()
        w = len(comp)
        i = 0
        while i < w:
            run = 1
            while i + run < w and comp[i + run] == comp[i] and run < 127:
                run += 1
            if run >= 4:
                out.append(128 + run)
                out.append(int(comp[i]))
                i += run
            else:
                start = i
                while i < w and i - start < 128:
                    run = 1
                    while (i + run < w and comp[i + run] == comp[i]
                           and run < 4):
                        run += 1
                    if run >= 4:
                        break
                    i = min(i + run, start + 128)
                out.append(i - start)
                out.extend(comp[start:i].tobytes())
        return bytes(out)

    rng = np.random.default_rng(0)
    cases = [np.zeros(512, np.uint8),
             np.arange(512).astype(np.uint8),
             rng.integers(0, 256, 2048).astype(np.uint8),
             rng.integers(0, 3, 2048).astype(np.uint8),
             np.full(300, 7, np.uint8),
             np.array([1, 1, 1, 1], np.uint8),
             np.array([5], np.uint8)]
    for seed in range(10):
        r = np.random.default_rng(seed)
        n = int(r.integers(1, 800))
        cases.append(np.repeat(r.integers(0, 5, n),
                               r.integers(1, 10, n))[:1500].astype(np.uint8))
    for i, c in enumerate(cases):
        assert _rle_component(c) == per_byte(c), f"case {i}"


def test_export_stream_consumes_generator_lazily(tmp_path):
    """A GENERATOR of frames must be pulled at pipeline pace (bounded
    ahead of the writes), not materialized up front."""
    import threading
    import time as _time
    import hdrvae.io.pipeline as pl
    from hdrvae.io.pipeline import export_stream
    state = {"produced": 0, "written": 0, "max_gap": 0}
    lock = threading.Lock()
    rng = np.random.default_rng(0)
    imgs = [rng.uniform(0, 2, (8, 6, 3)).astype(np.float32)
            for _ in range(10)]

    def gen():
        for img in imgs:
            with lock:
                state["produced"] += 1
                state["max_gap"] = max(state["max_gap"],
                                       state["produced"]
                                       - state["written"])
            yield img

    orig_save = pl._save_one

    def slow_save(*a, **k):
        _time.sleep(0.03)
        out = orig_save(*a, **k)
        with lock:
            state["written"] += 1
        return out

    pl._save_one = slow_save
    try:
        res = export_stream(gen(), ExportConfig(filename_prefix="lazy",
                                                frame_sequence=True),
                            depth=2, default_output_dir=str(tmp_path))
    finally:
        pl._save_one = orig_save
    assert res.error is None, res.error
    assert len(res.filepaths) == 10
    # lookahead(1) + depth fetches + depth+1 pending writes
    assert state["max_gap"] <= 2 * 2 + 2, state


@pytest.mark.slow
def test_rgbe_saturates_extreme_values():
    """Exponent bytes must never wrap: values >= 2^127 (and +inf)
    saturate to the max representable RGBE value instead of silently
    decoding to black; NaN encodes as 0."""
    from hdrvae.io.hdr import rgb_to_rgbe, rgbe_to_rgb

    px = np.array([[[2e38, 1.0, 0.5],
                    [np.inf, 2.0, 0.25],
                    [np.nan, 0.0, 0.0],
                    [1.0, 0.5, 0.25]]], np.float32)
    back = rgbe_to_rgb(rgb_to_rgbe(px))
    assert np.isfinite(back).all()
    assert back[0, 0, 0] > 1e38          # bright pixel stays bright
    assert back[0, 1, 0] > 1e38          # inf saturates, not wraps
    assert back[0, 2, 0] == 0.0          # NaN -> black
    # a moderate pixel in the same image still round-trips to ~1%
    np.testing.assert_allclose(back[0, 3], [1.0, 0.5, 0.25], rtol=0.01)


def test_exr_truncated_none_chunk_rejected(tmp_path):
    """A NONE-compressed chunk whose size field is smaller than its row
    payload is truncation: the native reader must refuse it (no OOB
    read past the declared size), never return garbage."""
    from hdrvae.io.exr import read_exr, write_exr

    p = str(tmp_path / "n.exr")
    write_exr(p, np.random.default_rng(5).standard_normal(
        (16, 16, 3)).astype(np.float32), compression="none")
    blob = bytearray(open(p, "rb").read())
    row_bytes = 16 * 3 * 2
    size_pos = len(blob) - row_bytes - 4
    blob[size_pos:size_pos + 4] = (0).to_bytes(4, "little")
    pc = str(tmp_path / "trunc.exr")
    open(pc, "wb").write(bytes(blob))
    with pytest.raises(Exception):
        read_exr(pc)


@pytest.mark.parametrize("flag", [0x200, 0x800, 0x1000])
def test_exr_nonscanline_layouts_rejected(tmp_path, flag):
    """Tiled / deep / multipart version flags must be refused by BOTH
    readers — parsing those layouts as scanline can decode garbage."""
    from hdrvae.io.exr import read_exr, write_exr

    p = str(tmp_path / "v.exr")
    write_exr(p, np.zeros((8, 8, 3), np.float32), compression="none")
    blob = bytearray(open(p, "rb").read())
    version = int.from_bytes(blob[4:8], "little") | flag
    blob[4:8] = version.to_bytes(4, "little")
    pv = str(tmp_path / "flag.exr")
    open(pv, "wb").write(bytes(blob))
    with pytest.raises(Exception):
        read_exr(pv)                     # native path + python fallback
    with pytest.raises(Exception):
        read_exr(pv, use_native=False)   # pure-python directly


def test_exr_extra_channels_native_python_parity(tmp_path, monkeypatch):
    """A file with R, G, B plus an extra channel (Z/AOV) must read back
    with the SAME plane layout from both readers: RGB first, extras
    after in header order."""
    from hdrvae.io import exr_py
    from hdrvae.io.exr import read_exr

    monkeypatch.setattr(exr_py, "_channel_names",
                        lambda c: ["B", "G", "R", "Z"])
    img = np.random.default_rng(7).standard_normal(
        (12, 12, 4)).astype(np.float32)
    p = str(tmp_path / "rgbz.exr")
    exr_py.write_exr(p, img, pixel_type="float", compression="zip")
    monkeypatch.undo()

    a = read_exr(p)                      # native (if built)
    b = read_exr(p, use_native=False)    # pure python
    assert a.shape == (12, 12, 4) and b.shape == (12, 12, 4)
    np.testing.assert_array_equal(a, b)
    # header order B,G,R,Z -> output planes R,G,B,Z
    np.testing.assert_allclose(a[..., 0], img[..., 2], rtol=0, atol=0)
    np.testing.assert_allclose(a[..., 3], img[..., 3], rtol=0, atol=0)


class TestCraftedCorruption:
    """Targeted regressions for corruptions the random fuzz never hits:
    each was demonstrated to crash/hang/corrupt before the fix (segfault
    via 32-bit tlen wrap, header-parser infinite loop on negative
    attribute size, silent stale-memory output on a lying chunk y)."""

    def _base(self, tmp_path, comp="none", name="c.exr", h=6, w=5):
        rng = np.random.default_rng(1)
        img = rng.standard_normal((h, w, 3)).astype(np.float32)
        p = str(tmp_path / name)
        exr.write_exr(p, img, compression=comp, pixel_type="half")
        return p, bytearray(open(p, "rb").read())

    @staticmethod
    def _attr_size_pos(blob):
        # magic(4) + version(4), then name\0 type\0 <i32 size>
        name_end = blob.index(b"\0", 8)
        type_end = blob.index(b"\0", name_end + 1)
        return type_end + 1

    def test_negative_attribute_size_rejected(self, tmp_path):
        p, blob = self._base(tmp_path)
        pos = self._attr_size_pos(blob)
        import struct
        blob[pos:pos + 4] = struct.pack("<i", -28)
        open(p, "wb").write(bytes(blob))
        with pytest.raises(ValueError, match="out of bounds"):
            exr_py.read_exr_header(bytes(blob))
        with pytest.raises(Exception):
            exr.read_exr(p)   # full dispatch: native reject + py reject

    def test_lying_chunk_y_rejected(self, tmp_path):
        import struct
        p, blob = self._base(tmp_path)
        header, pos = exr_py.read_exr_header(bytes(blob))
        (off0,) = struct.unpack_from("<Q", bytes(blob), pos)
        blob[off0:off0 + 4] = struct.pack("<i", header["y_min"] - 1)
        open(p, "wb").write(bytes(blob))
        with pytest.raises(ValueError, match="scanline"):
            exr_py.read_exr(p)

    def test_duplicate_chunk_y_rejected(self, tmp_path):
        import struct
        p, blob = self._base(tmp_path)          # none: 1 line per chunk
        header, pos = exr_py.read_exr_header(bytes(blob))
        off0, off1 = struct.unpack_from("<2Q", bytes(blob), pos)
        # chunk 1 claims chunk 0's scanline: some row is never written
        blob[off1:off1 + 4] = bytes(blob[off0:off0 + 4])
        open(p, "wb").write(bytes(blob))
        with pytest.raises(ValueError, match="covered by no chunk"):
            exr_py.read_exr(p)

    def test_wild_chunk_offset_rejected(self, tmp_path):
        import struct
        p, blob = self._base(tmp_path)
        header, pos = exr_py.read_exr_header(bytes(blob))
        blob[pos:pos + 8] = struct.pack("<Q", 2 ** 64 - 1)
        open(p, "wb").write(bytes(blob))
        with pytest.raises(Exception):
            exr.read_exr(p)    # native -4 (no OOB read), python raises
        with pytest.raises(ValueError, match="out of bounds"):
            exr_py.read_exr(p)

    def test_piz_huffman_tlen_overflow_rejected(self, tmp_path):
        """tlen = 0xFFFFFFF6 made `20 + tlen` wrap in 32-bit arithmetic,
        bypassing the bound and segfaulting the host."""
        import struct
        # compressible image (noise would be stored as raw chunks)
        img = np.tile(np.linspace(0, 1, 16, dtype=np.float32)[None, :,
                                                              None],
                      (40, 1, 3))
        p = str(tmp_path / "piz.exr")
        exr.write_exr(p, img, compression="piz", pixel_type="half")
        blob = bytearray(open(p, "rb").read())
        header, pos = exr_py.read_exr_header(bytes(blob))
        (off0,) = struct.unpack_from("<Q", bytes(blob), pos)
        (csize,) = struct.unpack_from("<i", bytes(blob), off0 + 4)
        row_bytes = 16 * 2 * 3
        assert csize < 32 * row_bytes, "chunk stored raw; patch useless"
        payload = off0 + 8
        min_nz, max_nz = struct.unpack_from("<HH", bytes(blob), payload)
        count = (max_nz - min_nz + 1) if min_nz <= max_nz else 0
        # payload: minmax(4) + bitmap(count) + hlen(4) + huf block
        # huf block: im(4) iM(4) tlen(4) ...
        tlen_pos = payload + 4 + count + 4 + 8
        blob[tlen_pos:tlen_pos + 4] = struct.pack("<I", 0xFFFFFFF6)
        open(p, "wb").write(bytes(blob))
        with pytest.raises(Exception):
            exr.read_exr(p)    # must be a clean error, not SIGSEGV

    def test_nan_payload_byte_identity(self, tmp_path):
        """Native float->half matches numpy for every NaN payload: all
        65536 half patterns round-tripped f32->half by both writers."""
        patterns = np.arange(65536, dtype=np.uint16)
        img = patterns.view(np.float16).astype(np.float32).reshape(
            256, 256, 1)
        pn = str(tmp_path / "n.exr")
        pp = str(tmp_path / "p.exr")
        exr.write_exr(pn, img, pixel_type="half", compression="none",
                      use_native=True)
        exr_py.write_exr(pp, img, pixel_type="half", compression="none")
        assert open(pn, "rb").read() == open(pp, "rb").read()


def test_native_reader_corruption_fuzz(tmp_path):
    """Deterministic corruption fuzz of the native EXR reader: every
    mutation must yield an error code or a clean Python exception —
    never a crash (the ASan campaign that pinned the bounds fixes ran
    2800 mutations; this keeps a representative regression set)."""
    from hdrvae.io.exr import read_exr, write_exr
    rng = np.random.default_rng(0)
    img = rng.standard_normal((32, 24, 3)).astype(np.float32)
    img12 = rng.standard_normal((12, 12, 12)).astype(np.float32)
    bases = {}
    for comp in ("none", "rle", "zip", "zips", "piz", "pxr24"):
        p = str(tmp_path / f"{comp}.exr")
        write_exr(p, img, compression=comp)
        bases[comp] = open(p, "rb").read()
    p = str(tmp_path / "multi.exr")
    write_exr(p, img12, compression="zip")
    bases["multi"] = open(p, "rb").read()

    pt = str(tmp_path / "fuzz.exr")
    for comp, blob in bases.items():
        for seed in range(40):
            r = np.random.default_rng(hash((comp, seed)) % 2 ** 32)
            b = bytearray(blob)
            mode = seed % 4
            if mode == 0:
                b = bytes(b[:r.integers(8, len(b))])
            elif mode == 1:
                for _ in range(int(r.integers(1, 24))):
                    b[int(r.integers(0, len(b)))] = int(r.integers(0, 256))
            elif mode == 2:
                pos = int(r.integers(0, len(b) - 4))
                b[pos:pos + 4] = int(r.integers(0, 2 ** 32)).to_bytes(
                    4, "little")
            else:
                for _ in range(int(r.integers(1, 8))):
                    pos = int(r.integers(0, min(400, len(b) - 4)))
                    b[pos:pos + 4] = int(r.integers(0, 2 ** 32)).to_bytes(
                        4, "little")
            open(pt, "wb").write(bytes(b))
            try:
                out = read_exr(pt)          # native first, python fallback
                assert np.isfinite(out).any() or out.size >= 0
            except Exception:
                pass                        # clean rejection is fine


@pytest.mark.slow
def test_hdr_reader_corruption_fuzz(tmp_path):
    """Same contract as the EXR fuzz for the Radiance codec: corrupted
    .hdr input must raise a clean Python exception or parse, never hang
    or crash (the reader is pure numpy, so the risk class is unbounded
    allocations / index errors from lying headers)."""
    from hdrvae.io.hdr import read_hdr, write_hdr
    rng = np.random.default_rng(0)
    img = (rng.standard_normal((48, 40, 3)).astype(np.float32) ** 2) * 4
    base = str(tmp_path / "base.hdr")
    write_hdr(base, img)
    blob = open(base, "rb").read()
    pt = str(tmp_path / "fuzz.hdr")
    for seed in range(120):
        r = np.random.default_rng(seed)
        b = bytearray(blob)
        mode = seed % 3
        if mode == 0:
            b = bytes(b[:r.integers(4, len(b))])
        elif mode == 1:
            for _ in range(int(r.integers(1, 24))):
                b[int(r.integers(0, len(b)))] = int(r.integers(0, 256))
        else:  # header-focused: dimensions line and RLE opcodes
            for _ in range(int(r.integers(1, 10))):
                pos = int(r.integers(0, min(160, len(b))))
                b[pos] = int(r.integers(0, 256))
        open(pt, "wb").write(bytes(b))
        try:
            out = read_hdr(pt)
            assert out.size < 10 ** 9   # no unbounded allocation
        except Exception:
            pass                        # clean rejection is fine


class TestBandWriter:
    """Streamed (banded) EXR writing — round-4 export-latency work.

    The contract: any band split x any chunk-thread count produces the
    SAME BYTES as the serial whole-image writer (EXR scanline chunks are
    independent), for both codec implementations.
    """

    @pytest.mark.parametrize("compression", ALL_COMPRESSIONS + ["piz"])
    @pytest.mark.parametrize("pixel_type", ["half", "float"])
    def test_byte_identical_to_serial(self, tmp_path, compression,
                                      pixel_type):
        r = np.random.default_rng(7)
        img = (r.standard_normal((45, 33, 3)) * 4).astype(np.float32)
        ref = tmp_path / "ref.exr"
        exr.write_exr(str(ref), img, pixel_type=pixel_type,
                      compression=compression)
        ref_bytes = ref.read_bytes()
        for band, workers in [(1, 1), (16, 1), (17, 4), (45, 4)]:
            p = tmp_path / f"band{band}w{workers}.exr"
            w = exr.ExrBandWriter(str(p), *img.shape,
                                  pixel_type=pixel_type,
                                  compression=compression, workers=workers)
            rows = w.band_rows(band)
            with w:
                y = 0
                while y < img.shape[0]:
                    w.write_rows(img[y:y + rows])
                    y += rows
            assert p.read_bytes() == ref_bytes, (compression, band, workers)

    def test_python_band_writer_byte_identical(self, tmp_path):
        """The pure-Python band writer too (native dispatch bypassed)."""
        r = np.random.default_rng(8)
        img = (r.standard_normal((40, 20, 3)) * 2).astype(np.float32)
        ref = tmp_path / "ref.exr"
        exr_py.write_exr(str(ref), img, compression="zip", workers=1)
        p = tmp_path / "banded.exr"
        w = exr_py.ExrBandWriter(str(p), *img.shape, compression="zip",
                                 workers=3)
        with w:
            w.write_rows(img[:16])
            w.write_rows(img[16:32])
            w.write_rows(img[32:])
        assert p.read_bytes() == ref.read_bytes()

    def test_partial_band_rejected(self, tmp_path):
        img = np.zeros((40, 8, 3), np.float32)
        w = exr_py.ExrBandWriter(str(tmp_path / "x.exr"), 40, 8, 3,
                                 compression="zip")
        with pytest.raises(ValueError, match="chunk"):
            w.write_rows(img[:10])   # 10 rows is not a 16-line chunk
        w.abort()

    def test_incomplete_close_rejected(self, tmp_path):
        w = exr_py.ExrBandWriter(str(tmp_path / "x.exr"), 32, 8, 3,
                                 compression="zip")
        w.write_rows(np.zeros((16, 8, 3), np.float32))
        with pytest.raises(ValueError, match="rows"):
            w.close()

    def test_f16_band_input_matches_serial(self, tmp_path):
        """The reduced-precision-fetch path: float16 bands through the
        half-input entry point, byte-identical to a whole-frame write."""
        r = np.random.default_rng(9)
        img16 = (r.standard_normal((37, 19, 3)) * 4).astype(np.float16)
        ref = tmp_path / "ref.exr"
        exr.write_exr(str(ref), img16, pixel_type="half",
                      compression="zip")
        p = tmp_path / "banded.exr"
        w = exr.ExrBandWriter(str(p), *img16.shape, pixel_type="half",
                              compression="zip", workers=2)
        with w:
            w.write_rows(img16[:32])
            w.write_rows(img16[32:])
        assert p.read_bytes() == ref.read_bytes()


class TestStreamedFrameExport:
    def test_matches_serial_exporter_bytes(self, tmp_path, hdr_image):
        from hdrvae.io.pipeline import export_frame_streamed
        serial = export_linear(
            hdr_image, ExportConfig(filename_prefix="s", output_path="",
                                    bit_depth="32bit", compression="zip"),
            default_output_dir=str(tmp_path))
        assert serial.error is None
        streamed = export_frame_streamed(
            hdr_image, ExportConfig(filename_prefix="t", output_path="",
                                    bit_depth="32bit", compression="zip"),
            default_output_dir=str(tmp_path), band_rows=16)
        assert streamed.error is None
        assert streamed.verified
        a = open(serial.last, "rb").read()
        b = open(streamed.last, "rb").read()
        assert a == b

    def test_device_frame_16bit(self, tmp_path, hdr_image):
        """A jax device frame streams through the f16 device-cast path and
        matches the serial exporter's half file byte for byte."""
        import jax.numpy as jnp
        from hdrvae.io.pipeline import export_frame_streamed
        serial = export_linear(
            hdr_image.astype(np.float16),
            ExportConfig(filename_prefix="s16", output_path="",
                         bit_depth="16bit", compression="zip"),
            default_output_dir=str(tmp_path))
        streamed = export_frame_streamed(
            jnp.asarray(hdr_image),
            ExportConfig(filename_prefix="t16", output_path="",
                         bit_depth="16bit", compression="zip"),
            default_output_dir=str(tmp_path), band_rows=16)
        assert streamed.error is None
        assert (open(serial.last, "rb").read()
                == open(streamed.last, "rb").read())

    def test_non_exr_falls_back(self, tmp_path, hdr_image):
        from hdrvae.io.pipeline import export_frame_streamed
        res = export_frame_streamed(
            hdr_image, ExportConfig(filename_prefix="h", output_path="",
                                    format="hdr"),
            default_output_dir=str(tmp_path))
        assert res.error is None
        assert res.last.endswith(".hdr")

    def test_error_contract(self, tmp_path, hdr_image):
        from hdrvae.io.pipeline import export_frame_streamed
        res = export_frame_streamed(
            hdr_image, ExportConfig(filename_prefix="e", output_path="",
                                    compression="nope"),
            default_output_dir=str(tmp_path))
        assert res.error is not None and res.error.startswith("ERROR")


class TestInteropPack:
    """The committed EXR conformance pack (tools/interop_pack/) must stay
    in sync with the codecs: regenerating it bitwise-reproduces the
    committed files, and both own readers decode the committed fixtures to
    the committed expected pixels.  External-reader validation runs via
    `python tools/interop_check.py` on any machine with an OpenEXR-capable
    library (it self-skips here — no such library in this image)."""

    def test_pack_is_reproducible_and_decodes(self, tmp_path):
        import importlib.util
        import json
        spec = importlib.util.spec_from_file_location(
            "gen_interop_pack",
            os.path.join(os.path.dirname(__file__), "..", "tools",
                         "gen_interop_pack.py"))
        gen = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(gen)
        committed_dir = gen.PACK_DIR
        manifest = gen.generate(str(tmp_path))
        committed = json.load(
            open(os.path.join(committed_dir, "MANIFEST.json")))
        assert manifest["files"] == committed["files"]
        expected = np.load(os.path.join(committed_dir, "expected.npz"))
        for name in manifest["files"]:
            fresh = (tmp_path / name).read_bytes()
            assert fresh == open(
                os.path.join(committed_dir, name), "rb").read(), name
            for use_native in (True, False):
                got = exr.read_exr(os.path.join(committed_dir, name),
                                   use_native=use_native)
                assert np.array_equal(got, expected[name]), (name,
                                                             use_native)

    def test_check_script_self_skips_or_passes(self):
        import subprocess
        import sys
        r = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "..", "tools",
                          "interop_check.py")],
            capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stdout + r.stderr
        assert ("SKIP" in r.stdout) or ("all fixtures agree" in r.stdout)


def test_native_band_writer_rejects_mismatched_band(tmp_path):
    """The native codec trusts buffer dimensions — the dispatcher must
    validate them or a mismatched band is an out-of-bounds heap read
    (round-4 review finding)."""
    w = exr.ExrBandWriter(str(tmp_path / "x.exr"), 32, 64, 3,
                          compression="zip")
    with pytest.raises(ValueError, match="64x3"):
        w.write_rows(np.zeros((16, 8, 3), np.float32))
    # writer aborted itself; further use is closed-path behavior
    w2 = exr.ExrBandWriter(str(tmp_path / "y.exr"), 32, 8, 3,
                           compression="zip")
    with pytest.raises(ValueError, match="8x3"):
        w2.write_rows(np.zeros((16, 8, 4), np.float32))

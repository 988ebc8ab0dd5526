"""CLI tests (subprocess-free: drive main() in-process on tiny inputs)."""

import json
import os

import numpy as np
import pytest

from hdrvae.cli.main import build_parser, main
from hdrvae.io import exr


def _run(capsys, argv):
    rc = main(argv)
    out = capsys.readouterr().out.strip().splitlines()
    return rc, [json.loads(line) for line in out if line.startswith("{")]


class TestCLI:
    def test_parser_subcommands(self):
        parser = build_parser()
        for cmd in ("decode", "upscale", "export", "convert", "inspect",
                    "bench"):
            assert cmd in parser.format_help()

    def test_export_round_trip(self, tmp_path, monkeypatch, capsys, rng):
        monkeypatch.setenv("HDRVAE_OUTPUT_DIR", str(tmp_path))
        src = tmp_path / "in.exr"
        img = (rng.standard_normal((9, 11, 3)) * 5).astype(np.float32)
        exr.write_exr(str(src), img, pixel_type="float")
        rc, outs = _run(capsys, [
            "export", "--image", str(src), "--prefix", "cli",
            "--bit-depth", "32bit"])
        assert rc == 0
        assert outs[-1]["hdr_preserved"] is True
        np.testing.assert_array_equal(
            exr.read_exr(outs[-1]["filepath"]), img)

    def test_inspect_default(self, capsys):
        rc = main(["inspect"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "flux1-vae-decoder" in out
        assert "49." in out  # ~49.5M params

    def test_inspect_checkpoint(self, tmp_path, capsys):
        torch = pytest.importorskip("torch")
        from hdrvae.models.rrdbnet import RRDBNetConfig
        from tests.torch_oracle import TorchRRDBNet
        path = str(tmp_path / "up.pth")
        torch.save(TorchRRDBNet(RRDBNetConfig().with_small()).state_dict(),
                   path)
        rc = main(["inspect", "--path", path])
        out = capsys.readouterr().out
        assert rc == 0
        assert "esrgan/rrdbnet (new arch)" in out

    def test_convert_upscaler(self, tmp_path, capsys):
        torch = pytest.importorskip("torch")
        from hdrvae.models.rrdbnet import RRDBNetConfig
        from tests.torch_oracle import TorchRRDBNet
        src = str(tmp_path / "up.pth")
        dst = str(tmp_path / "up.safetensors")
        torch.save(TorchRRDBNet(RRDBNetConfig().with_small()).state_dict(),
                   src)
        rc, outs = _run(capsys, ["convert", "upscaler", src, dst])
        assert rc == 0
        assert os.path.exists(dst)
        assert outs[0]["scale"] == 2

    def test_upscale_command(self, tmp_path, monkeypatch, capsys, rng):
        torch = pytest.importorskip("torch")
        from hdrvae.models.rrdbnet import RRDBNetConfig
        from tests.torch_oracle import TorchRRDBNet
        monkeypatch.setenv("HDRVAE_OUTPUT_DIR", str(tmp_path))
        model_path = str(tmp_path / "up.pth")
        torch.save(TorchRRDBNet(RRDBNetConfig().with_small()).state_dict(),
                   model_path)
        src = tmp_path / "in.exr"
        img = np.abs(rng.standard_normal((10, 12, 3))).astype(np.float32)
        exr.write_exr(str(src), img, pixel_type="float")
        rc, outs = _run(capsys, [
            "upscale", "--image", str(src), "--model", model_path,
            "--tile", "8", "--overlap", "2", "--prefix", "up"])
        assert rc == 0
        assert outs[0]["scale"] == 2
        assert outs[0]["out_shape"] == [1, 20, 24, 3]

    def test_bad_latent_format(self, tmp_path):
        with pytest.raises(ValueError, match="unsupported latent format"):
            from hdrvae.cli.main import _load_latent
            _load_latent(str(tmp_path / "x.txt"))


def test_decode_plain(tmp_path, monkeypatch, capsys):
    """Plain `decode`: random latent -> HDR decode -> versioned EXR +
    decode-summary JSON (the config-1 path from one command)."""
    monkeypatch.setenv("HDRVAE_OUTPUT_DIR", str(tmp_path))
    rc, outs = _run(capsys, ["decode", "--size", "32", "--prefix", "one"])
    assert rc == 0
    summary = outs[0]
    assert "used_fallback" in summary and "normalization" in summary
    files = list(tmp_path.glob("one*.exr"))
    assert len(files) == 1
    img = exr.read_exr(str(files[0]))
    assert img.shape == (32, 32, 3)


@pytest.mark.slow
def test_decode_tiled_slab(tmp_path, monkeypatch, capsys):
    """`decode --tiled`: the sharded slab path (exact GN psum) over the
    8-device CPU mesh from the CLI."""
    monkeypatch.setenv("HDRVAE_OUTPUT_DIR", str(tmp_path))
    rc, outs = _run(capsys, ["decode", "--size", "64", "--tiled",
                             "--prefix", "slab"])
    assert rc == 0
    files = list(tmp_path.glob("slab*.exr"))
    assert len(files) == 1
    assert exr.read_exr(str(files[0])).shape == (64, 64, 3)


def test_decode_pipelined_frames(tmp_path, monkeypatch):
    """decode --pipelined: frame-sequence export through the overlapped
    stream (decode || fetch || write), composing with --tiled."""
    monkeypatch.setenv("HDRVAE_OUTPUT_DIR", str(tmp_path))
    from hdrvae.cli.main import main
    rc = main(["decode", "--size", "32", "--batch", "2", "--pipelined",
               "--prefix", "seq", "--bit-depth", "16bit"])
    assert rc == 0
    names = sorted(p.name for p in tmp_path.glob("seq_frame_*.exr"))
    assert len(names) == 2

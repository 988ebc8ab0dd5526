"""Generate the EXR interop conformance pack (tools/interop_pack/).

This environment has no third-party EXR implementation (cv2 5.0 is built
without OpenEXR, imageio has no EXR backend, no pyexr/OpenEXR module), so
external interchange of the owned codec cannot be tested HERE — but it can
be made checkable ANYWHERE in one command: this script writes a set of
small fixture EXRs covering every compression x bit depth the exporter can
produce, together with the exact pixel values a correct reader must
decode, and `tools/interop_check.py` validates them against whatever
OpenEXR-capable reader a machine has (OpenEXR / pyexr / imageio / cv2).

Deterministic: same seed, same bytes (asserted by tests/test_io.py, which
re-generates into a temp dir and compares with the committed pack).

Reference analog: the reference's EXR files are written by pyexr/OpenEXR
itself (`/root/reference/linear_exr_export.py:158-171`), so its interop is
implicit; the owned codec earns it through this pack.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hdrvae.io import exr  # noqa: E402
from hdrvae.io.exr_py import COMPRESSION_IDS  # noqa: E402

PACK_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "interop_pack")

H, W = 20, 13   # odd width exercises chunk / scanline edge paths


def fixture_image() -> np.ndarray:
    """Deterministic HDR test pattern: smooth gradients (compressible),
    noise (incompressibility), >1 highlights, negatives, exact zeros and
    denormal-range values."""
    rng = np.random.default_rng(20260820)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.stack([
        yy / H * 3.0 - 0.5,                    # gradient with negatives
        np.sin(xx * 0.7) * 2.0,                # smooth oscillation
        rng.standard_normal((H, W)).astype(np.float32) * 4.0,  # noise
    ], axis=-1)
    img[0, 0] = [50.0, -3.5, 0.0]              # HDR + negative extremes
    img[1, 1] = [6.1e-5, 5.96e-8, 1.0]         # half denormal range
    img[2, 2] = [0.0, -0.0, 65504.0]           # signed zero + half max
    return img


def generate(pack_dir: str = PACK_DIR) -> dict:
    from hdrvae.io.native_build import load_native
    if load_native() is None:
        # without the native codec the writer would silently substitute
        # ZIP for the PIZ fixtures while the manifest still said "piz" —
        # a mislabeled conformance pack is worse than none
        raise RuntimeError(
            "the native EXR codec is required to generate the pack "
            "(PIZ fixtures); install a C++ toolchain and retry")
    os.makedirs(pack_dir, exist_ok=True)
    img = fixture_image()
    manifest = {
        "format": "OpenEXR scanline, single part, RGB",
        "height": H, "width": W, "channels": 3,
        "writer": "hdrvae owned codec (hdrvae/io/native/exr_codec.cpp; "
                  "byte-identical pure-python mirror hdrvae/io/exr_py.py)",
        "expected": "expected.npz holds, per file, the exact float32 "
                    "pixels a conforming reader must produce (already "
                    "quantized through the file's pixel type and "
                    "compression); lossless files must match bitwise",
        "files": {},
    }
    expected = {}
    for comp in sorted(COMPRESSION_IDS):
        for depth in ("16bit", "32bit"):
            name = f"fixture_{comp}_{depth}.exr"
            path = os.path.join(pack_dir, name)
            ptype = "float" if depth == "32bit" else "half"
            exr.write_exr(path, img, pixel_type=ptype, compression=comp)
            # what a conforming reader must produce — via the OWN reader,
            # which is cross-validated against the independent pure-python
            # implementation (and, for PIZ, an independent in-repo decoder)
            got_native = exr.read_exr(path)
            got_py = exr.read_exr(path, use_native=False)
            assert np.array_equal(got_native, got_py), (comp, depth)
            expected[name] = got_native
            manifest["files"][name] = {
                "compression": comp, "pixel_type": ptype,
                "file_sha256": hashlib.sha256(
                    open(path, "rb").read()).hexdigest(),
                "pixels_sha256": hashlib.sha256(
                    np.ascontiguousarray(got_native).tobytes()).hexdigest(),
                # PXR24's 24-bit float truncation only affects FLOAT
                # pixels; half data passes through losslessly
                "lossless": comp != "pxr24" or ptype == "half",
            }
    np.savez_compressed(os.path.join(pack_dir, "expected.npz"), **expected)
    with open(os.path.join(pack_dir, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


if __name__ == "__main__":
    m = generate()
    print(f"wrote {len(m['files'])} fixtures to {PACK_DIR}")

"""Validate the EXR interop conformance pack against external readers.

Run on ANY machine:

    python tools/interop_check.py

For every fixture in tools/interop_pack/ it tries each available
third-party EXR implementation (OpenEXR, pyexr, imageio, cv2) and asserts
the decoded pixels equal the committed expected values.  If a third-party
writer is available it also round-trips: write the fixture image with the
external library and read it back with hdrvae's own codec.

Exit codes: 0 = all available readers agree (or none available — prints
SKIP and exits 0 so CI without OpenEXR stays green); 1 = a reader
disagreed (a real interop bug).

In the build environment this self-skips (cv2 5.0 without OpenEXR, no
imageio EXR backend, no OpenEXR/pyexr module) — the pack exists precisely
so the check is one command away on any machine that has one.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)
PACK_DIR = os.path.join(REPO, "tools", "interop_pack")

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")


def _readers():
    """Yield (name, read_fn) for every importable external EXR reader.
    read_fn(path) -> float32 [H, W, 3] RGB array."""
    try:
        import OpenEXR
        import Imath

        def read_openexr(path):
            f = OpenEXR.InputFile(path)
            dw = f.header()["dataWindow"]
            h = dw.max.y - dw.min.y + 1
            w = dw.max.x - dw.min.x + 1
            pt = Imath.PixelType(Imath.PixelType.FLOAT)
            chans = [np.frombuffer(f.channel(c, pt), np.float32)
                     .reshape(h, w) for c in ("R", "G", "B")]
            return np.stack(chans, axis=-1)

        yield "OpenEXR", read_openexr
    except ImportError:
        pass
    try:
        import pyexr

        yield "pyexr", lambda p: np.asarray(pyexr.read(p), np.float32)
    except ImportError:
        pass
    try:
        import imageio.v3 as iio

        def read_imageio(path):
            # extension hint: without it imageio probes every plugin and
            # may mis-detect the file (e.g. the SPE reader)
            return np.asarray(iio.imread(path, extension=".exr"),
                              np.float32)

        # probe once: many imageio installs import fine but have no EXR
        # plugin; treat a failed probe as "reader unavailable"
        probe = os.path.join(PACK_DIR, "fixture_none_32bit.exr")
        try:
            read_imageio(probe)
            yield "imageio", read_imageio
        except Exception:
            pass
    except ImportError:
        pass
    try:
        import cv2

        def read_cv2(path):
            a = cv2.imread(path, cv2.IMREAD_UNCHANGED)
            if a is None:
                raise RuntimeError("cv2 EXR decode unavailable")
            return np.asarray(a[:, :, ::-1], np.float32)  # BGR -> RGB

        probe = os.path.join(PACK_DIR, "fixture_none_32bit.exr")
        try:
            read_cv2(probe)
            yield "cv2", read_cv2
        except Exception:
            pass
    except ImportError:
        pass


def main() -> int:
    manifest = json.load(open(os.path.join(PACK_DIR, "MANIFEST.json")))
    expected = np.load(os.path.join(PACK_DIR, "expected.npz"))
    readers = list(_readers())
    if not readers:
        print("SKIP: no external EXR reader available in this environment "
              "(install OpenEXR, pyexr, imageio with an EXR plugin, or an "
              "OpenEXR-enabled cv2 and re-run)")
        return 0

    failures = 0
    for name, meta in sorted(manifest["files"].items()):
        path = os.path.join(PACK_DIR, name)
        want = expected[name]
        for rname, read in readers:
            try:
                got = read(path)
            except Exception as e:
                print(f"FAIL {rname:8s} {name}: decode error: {e}")
                failures += 1
                continue
            if got.shape != want.shape:
                print(f"FAIL {rname:8s} {name}: shape {got.shape} != "
                      f"{want.shape}")
                failures += 1
                continue
            if np.array_equal(got, want):
                print(f"ok   {rname:8s} {name}")
            else:
                err = float(np.abs(got - want).max())
                print(f"FAIL {rname:8s} {name}: max abs diff {err:.3e}")
                failures += 1

    # reverse direction: external writer -> own reader
    try:
        import pyexr  # noqa: F401
        import tempfile
        from tools.gen_interop_pack import fixture_image
        from hdrvae.io import exr as own
        img = fixture_image()
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "reverse.exr")
            pyexr.write(p, img)
            back = own.read_exr(p)
        if np.allclose(back, img, atol=0, rtol=0):
            print("ok   reverse  pyexr-written file read by hdrvae")
        else:
            print("FAIL reverse  pyexr-written file read by hdrvae")
            failures += 1
    except ImportError:
        pass

    if failures:
        print(f"{failures} interop failure(s)")
        return 1
    print(f"all fixtures agree across {len(readers)} external reader(s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""EXR write/read dispatcher: native C++ codec with pure-Python fallback.

Mirrors the reference's writer-cascade intent (`linear_exr_export.py:145-227`:
pyexr -> imageio -> cv2) but with implementations this framework owns: the
native codec (`native/exr_codec.cpp`) and the numpy codec (`exr_py.py`)
produce byte-identical files.

All five of the reference's compression options (`linear_exr_export.py:105`)
are supported.  PIZ (bitmap/LUT + 2D wavelet + canonical Huffman) is
implemented in the native codec only; when the native library is
unavailable, "piz" falls back to "zip" in the pure-Python writer (same
lossless contract) with a one-time warning.
"""

from __future__ import annotations

import ctypes
import logging
import os

import numpy as np

from hdrvae.io import exr_py
from hdrvae.io.native_build import load_native

logger = logging.getLogger(__name__)

_PIZ_WARNED = False


def _resolve_compression(compression: str, have_native: bool) -> str:
    global _PIZ_WARNED
    compression = compression.lower()
    if compression == "piz" and not have_native:
        if not _PIZ_WARNED:
            logger.warning("native codec unavailable: PIZ written as ZIP "
                           "(same lossless contract)")
            _PIZ_WARNED = True
        return "zip"
    if compression not in exr_py.COMPRESSION_IDS:
        raise ValueError(f"unknown EXR compression {compression!r}")
    return compression


def write_exr(path: str, image: np.ndarray, *, pixel_type: str = "half",
              compression: str = "zip", use_native: bool = True,
              zip_level: int = 4) -> None:
    """Write a float image (H, W, C) to a scanline EXR.

    pixel_type: "half" | "float" (the reference's 16bit/32bit,
    `linear_exr_export.py:155`); compression: none/rle/zip/zips/piz/pxr24.
    zip_level: zlib level for zip/zips/pxr24 chunks (modern OpenEXR
    defaults to 4 — near-identical size to zlib's default 6 on
    delta-filtered pixel data, roughly half the encode time).

    float16 input is written through the codec's half-input entry point:
    no upcast round-trip, and with pixel_type="half" the scanline pack is
    a pure 16-bit gather (the hot path of the pipelined exporter's
    reduced-precision fetch).
    """
    image = np.asarray(image)
    half_in = image.dtype == np.float16
    image = np.ascontiguousarray(
        image if half_in else image.astype(np.float32, copy=False))
    if image.ndim == 2:
        image = image[..., None]
    if image.ndim != 3:
        raise ValueError(f"image must be HxWxC, got {image.shape}")

    lib = load_native() if use_native else None
    compression = _resolve_compression(compression, lib is not None)
    if lib is not None:
        h, w, c = image.shape
        ptype = 1 if pixel_type == "half" else 2
        comp_id = exr_py.COMPRESSION_IDS[compression]
        if half_in:
            rc = lib.exr_write_half(
                path.encode(), image.view(np.uint16).ctypes.data_as(
                    ctypes.POINTER(ctypes.c_uint16)),
                h, w, c, ptype, comp_id, zip_level)
        else:
            rc = lib.exr_write(
                path.encode(), image.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_float)),
                h, w, c, ptype, comp_id, zip_level)
        if rc == 0:
            return
        logger.warning("native EXR write returned %d; falling back to "
                       "pure-Python writer", rc)
        # the pure-Python writer has no PIZ: re-resolve for have_native=False
        compression = _resolve_compression(compression, False)
    exr_py.write_exr(path, image, pixel_type=pixel_type,
                     compression=compression, zip_level=zip_level)


class ExrBandWriter:
    """Incremental scanline-EXR writer (native-or-Python dispatch).

    Append scanline bands top to bottom with :meth:`write_rows`; every
    band except the last must cover a whole number of chunks (round with
    :meth:`band_rows`).  The finished file is byte-identical to
    :func:`write_exr` on the same pixels regardless of band split or
    thread count (chunk independence; asserted in tests/test_io.py).
    This is the encode half of the streamed single-frame export
    (`hdrvae.io.pipeline.export_stream` / VERDICT round-3 item 3): encode
    band k on host threads while band k+1 is still in flight from the
    device.
    """

    def __init__(self, path: str, height: int, width: int, channels: int,
                 *, pixel_type: str = "half", compression: str = "zip",
                 zip_level: int = 4, workers: int = 0,
                 use_native: bool = True):
        self._lib = load_native() if use_native else None
        compression = _resolve_compression(compression,
                                           self._lib is not None)
        self._handle = None
        self._py = None
        self._closed = False
        self._h, self._w, self._c = height, width, channels
        if self._lib is not None:
            ptype = 1 if pixel_type == "half" else 2
            comp_id = exr_py.COMPRESSION_IDS[compression]
            self._ptype = ptype
            handle = self._lib.exr_begin(path.encode(), height, width,
                                         channels, ptype, comp_id,
                                         zip_level, workers)
            if handle:
                self._handle = ctypes.c_void_p(handle)
                self._lines = self._lib.exr_lines_per_chunk(comp_id)
                return
            logger.warning("native EXR begin failed; using pure-Python "
                           "band writer")
            compression = _resolve_compression(compression, False)
        self._py = exr_py.ExrBandWriter(
            path, height, width, channels, pixel_type=pixel_type,
            compression=compression, zip_level=zip_level, workers=workers)
        self._lines = self._py._lines

    def band_rows(self, requested: int) -> int:
        """Round a band size up to a whole number of chunks."""
        return max(self._lines,
                   (requested + self._lines - 1) // self._lines
                   * self._lines)

    def write_rows(self, band: np.ndarray) -> None:
        band = np.asarray(band)
        if band.ndim == 2:
            band = band[..., None]
        if band.ndim != 3:
            raise ValueError(f"band must be [rows, W, C], got {band.shape}")
        if self._py is not None:
            self._py.write_rows(band)
            return
        # the native codec trusts the buffer dimensions it is handed —
        # validate here or a mismatched band is an out-of-bounds read
        if (band.shape[1], band.shape[2]) != (self._w, self._c):
            self.abort()
            raise ValueError(f"band is {band.shape[1]}x{band.shape[2]}, "
                             f"file is {self._w}x{self._c}")
        half_in = band.dtype == np.float16
        band = np.ascontiguousarray(
            band if half_in else band.astype(np.float32, copy=False))
        if half_in:
            rc = self._lib.exr_write_rows_half(
                self._handle, band.view(np.uint16).ctypes.data_as(
                    ctypes.POINTER(ctypes.c_uint16)), band.shape[0])
        else:
            rc = self._lib.exr_write_rows(
                self._handle, band.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_float)), band.shape[0])
        if rc != 0:
            self.abort()
            raise ValueError(f"native EXR band write failed (rc={rc})")

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        if self._py is not None:
            self._py.close()
            return
        rc = self._lib.exr_end(self._handle)
        self._handle = None
        if rc != 0:
            raise ValueError(f"native EXR finalize failed (rc={rc})")

    def abort(self) -> None:
        if self._closed:
            return
        self._closed = True
        if self._py is not None:
            self._py.abort()
        elif self._handle is not None:
            self._lib.exr_abort(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *exc):
        if exc_type is None:
            self.close()
        else:
            self.abort()


def read_exr(path: str, *, use_native: bool = True) -> np.ndarray:
    """Read a scanline EXR as float32 (H, W, C), RGB-ordered."""
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    lib = load_native() if use_native else None
    if lib is not None:
        w = ctypes.c_int()
        h = ctypes.c_int()
        c = ctypes.c_int()
        rc = lib.exr_read_header(path.encode(), ctypes.byref(w),
                                 ctypes.byref(h), ctypes.byref(c))
        if rc == 0:
            out = np.empty((h.value, w.value, c.value), np.float32)
            rc = lib.exr_read(path.encode(), out.ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)))
            if rc == 0:
                return out
        logger.warning("native EXR read returned %d; falling back to "
                       "pure-Python reader", rc)
    return exr_py.read_exr(path)

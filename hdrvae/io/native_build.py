"""On-demand build of the native C++ EXR codec.

The shared library is compiled once with g++ (baked into the image) and
cached next to the source; ctypes loads it.  If no compiler is available the
callers fall back to the pure-Python codec (`hdrvae.io.exr_py`) — same file
format, same bytes.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SRC = os.path.join(_NATIVE_DIR, "exr_codec.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libexr_codec.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _compile() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _LIB, "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.warning("native EXR codec build failed (%s); "
                       "using pure-Python codec", e)
        return False


def load_native() -> Optional[ctypes.CDLL]:
    """Return the loaded codec library, building it if necessary."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            if not _compile():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            logger.warning("could not load native EXR codec: %s", e)
            _build_failed = True
            return None

        lib.exr_write.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.exr_write.restype = ctypes.c_int
        lib.exr_write_half.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint16), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.exr_write_half.restype = ctypes.c_int
        lib.exr_read_header.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.exr_read_header.restype = ctypes.c_int
        lib.exr_read.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_float)]
        lib.exr_read.restype = ctypes.c_int
        # streaming (banded) writer API
        lib.exr_lines_per_chunk.argtypes = [ctypes.c_int]
        lib.exr_lines_per_chunk.restype = ctypes.c_int
        lib.exr_begin.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.exr_begin.restype = ctypes.c_void_p
        lib.exr_write_rows.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.exr_write_rows.restype = ctypes.c_int
        lib.exr_write_rows_half.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint16), ctypes.c_int]
        lib.exr_write_rows_half.restype = ctypes.c_int
        lib.exr_end.argtypes = [ctypes.c_void_p]
        lib.exr_end.restype = ctypes.c_int
        lib.exr_abort.argtypes = [ctypes.c_void_p]
        lib.exr_abort.restype = None
        _lib = lib
        return _lib

"""Pure-Python OpenEXR scanline codec (numpy + zlib).

A self-contained implementation of the OpenEXR 2.0 scanline format covering
what the reference's export node produces via pyexr/OpenEXR C++
(`linear_exr_export.py:145-227`): RGB images, HALF/FLOAT pixels, and the
NONE / RLE / ZIPS / ZIP / PXR24 compression schemes.  PIZ (wavelet+Huffman)
is not implemented; the writer substitutes ZIP (see `hdrvae.io.exr`).

This module is both the portable fallback for the native C++ codec
(`hdrvae/io/native/exr_codec.cpp`) and the cross-check oracle in tests:
files written by either implementation must be byte-identical.

Format notes (OpenEXR spec):
  - little-endian throughout; magic 0x01312f76, version 2.
  - header = attribute list, each ``name\\0 type\\0 size data``, ending \\0.
  - channels sorted by name (B, G, R); scanline chunks of 1 line (NONE, RLE,
    ZIPS) or 16 lines (ZIP, PXR24); absolute chunk-offset table.
  - ZIP/ZIPS/RLE pre-filter: byte "reorder" into two planes + delta
    predictor; chunks that do not shrink are stored raw.
"""

from __future__ import annotations

import os
import re
import struct
import zlib
from typing import Dict, List, Tuple

import numpy as np

MAGIC = 0x01312F76
VERSION = 2

# OpenEXR compression ids.
COMPRESSION_IDS = {"none": 0, "rle": 1, "zips": 2, "zip": 3, "piz": 4,
                   "pxr24": 5}
_ID_TO_NAME = {v: k for k, v in COMPRESSION_IDS.items()}
LINES_PER_CHUNK = {0: 1, 1: 1, 2: 1, 3: 16, 4: 32, 5: 16}

PIXEL_UINT, PIXEL_HALF, PIXEL_FLOAT = 0, 1, 2
_PIX_SIZE = {PIXEL_HALF: 2, PIXEL_FLOAT: 4, PIXEL_UINT: 4}
_PIX_DTYPE = {PIXEL_HALF: np.dtype("<f2"), PIXEL_FLOAT: np.dtype("<f4"),
              PIXEL_UINT: np.dtype("<u4")}


# ---------------------------------------------------------------------------
# Pre-filter: byte reorder + delta predictor (shared by RLE/ZIP/ZIPS)
# ---------------------------------------------------------------------------


def _filter_encode(raw: bytes) -> bytes:
    """OpenEXR ZIP/RLE pre-filter: byte reorder into two interleaved halves,
    THEN the delta predictor over the reordered buffer (ImfZip order)."""
    data = np.frombuffer(raw, np.uint8)
    reordered = np.concatenate([data[0::2], data[1::2]])
    delta = np.empty_like(reordered)
    delta[0] = reordered[0]
    delta[1:] = (reordered[1:].astype(np.int16)
                 - reordered[:-1].astype(np.int16) + (128 + 256)) & 0xFF
    return delta.astype(np.uint8).tobytes()


def _filter_decode(filtered: bytes) -> bytes:
    """Inverse: undo predictor (running sum), then merge the two halves."""
    delta = np.frombuffer(filtered, np.uint8)
    acc = (np.cumsum(
        np.concatenate([delta[:1].astype(np.int64),
                        delta[1:].astype(np.int64) - 128 - 256]))) & 0xFF
    merged = acc.astype(np.uint8)
    n = len(merged)
    half = (n + 1) // 2
    out = np.empty(n, np.uint8)
    out[0::2] = merged[:half]
    out[1::2] = merged[half:]
    return out.tobytes()


# ---------------------------------------------------------------------------
# RLE (OpenEXR flavor: signed-count runs over the filtered bytes)
# ---------------------------------------------------------------------------

_MIN_RUN, _MAX_RUN = 3, 127


def _rle_encode(data: bytes) -> bytes:
    out = bytearray()
    d = data
    n = len(d)
    i = 0
    while i < n:
        # measure run
        run = 1
        while i + run < n and d[i + run] == d[i] and run < _MAX_RUN:
            run += 1
        if run >= _MIN_RUN:
            out.append(run - 1)
            out.append(d[i])
            i += run
        else:
            # literal stretch: until the next >=3 run or MAX_RUN bytes
            start = i
            i += 1
            while (i < n and i - start < _MAX_RUN
                   and not (i + 2 < n and d[i] == d[i + 1] == d[i + 2])):
                i += 1
            count = i - start
            out.append((256 - count) & 0xFF)  # negative as signed byte
            out.extend(d[start:i])
    return bytes(out)


def _rle_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        count = struct.unpack_from("b", data, i)[0]
        i += 1
        if count < 0:
            out.extend(data[i:i - count])
            i += -count
        else:
            out.extend(data[i:i + 1] * (count + 1))
            i += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# PXR24 (lossy 24-bit float, per-byte-plane delta + zlib)
# ---------------------------------------------------------------------------


def float_to_float24(f: np.ndarray) -> np.ndarray:
    """float32 array -> uint32 array of 24-bit float bit patterns."""
    bits = f.astype("<f4").view(np.uint32)
    s = bits & 0x80000000
    e = bits & 0x7F800000
    m = bits & 0x007FFFFF
    body = e | m
    # finite: round significand to 15 bits (half-up); overflow to inf clamps
    rounded = (body + 0x80) >> 8
    overflow = (rounded << 8) & 0x7F800000 == 0x7F800000
    rounded = np.where(overflow, body >> 8, rounded)
    # inf/nan: keep exponent, collapse mantissa to 15 bits (nan keeps a bit)
    m15 = m >> 8
    special = (e >> 8) | m15 | np.where((m != 0) & (m15 == 0), 1, 0)
    out24 = np.where(e == 0x7F800000, special, rounded)
    return (s >> 8) | out24


def float24_to_float(i24: np.ndarray) -> np.ndarray:
    return (i24.astype("<u4") << np.uint32(8)).view("<f4").astype(
        np.float32, copy=False)


def _pxr24_pack_rows(rows: List[Tuple[np.ndarray, int]]) -> bytes:
    """rows: list of (row_values, pixel_type); returns plane-packed deltas."""
    parts = []
    for values, ptype in rows:
        if ptype == PIXEL_FLOAT:
            p24 = float_to_float24(values.astype(np.float32))
            diff = np.empty_like(p24)
            diff[0] = p24[0]
            diff[1:] = (p24[1:] - p24[:-1]) & 0xFFFFFF
            parts.append(((diff >> 16) & 0xFF).astype(np.uint8).tobytes())
            parts.append(((diff >> 8) & 0xFF).astype(np.uint8).tobytes())
            parts.append((diff & 0xFF).astype(np.uint8).tobytes())
        elif ptype == PIXEL_HALF:
            h = values.astype("<f2").view(np.uint16).astype(np.uint32)
            diff = np.empty_like(h)
            diff[0] = h[0]
            diff[1:] = (h[1:] - h[:-1]) & 0xFFFF
            parts.append(((diff >> 8) & 0xFF).astype(np.uint8).tobytes())
            parts.append((diff & 0xFF).astype(np.uint8).tobytes())
        else:
            raise ValueError("pxr24 supports half/float only")
    return b"".join(parts)


def _pxr24_unpack_rows(data: bytes, w: int,
                       row_types: List[int]) -> List[np.ndarray]:
    out = []
    pos = 0
    buf = np.frombuffer(data, np.uint8)
    for ptype in row_types:
        if ptype == PIXEL_FLOAT:
            hi = buf[pos:pos + w].astype(np.uint32)
            mid = buf[pos + w:pos + 2 * w].astype(np.uint32)
            lo = buf[pos + 2 * w:pos + 3 * w].astype(np.uint32)
            pos += 3 * w
            diff = (hi << 16) | (mid << 8) | lo
            p24 = np.cumsum(diff.astype(np.uint64)).astype(np.uint32) \
                & 0xFFFFFF
            out.append(float24_to_float(p24))
        else:  # HALF
            hi = buf[pos:pos + w].astype(np.uint32)
            lo = buf[pos + w:pos + 2 * w].astype(np.uint32)
            pos += 2 * w
            diff = (hi << 8) | lo
            h = (np.cumsum(diff.astype(np.uint64)).astype(np.uint32)
                 & 0xFFFF).astype(np.uint16)
            out.append(h.view("<f2").astype(np.float32))
    return out


# ---------------------------------------------------------------------------
# PIZ decoding (pure Python) — an implementation of the PIZ scheme fully
# independent of the C++ codec, used to cross-validate files the native
# writer produces (and to read PIZ without the native library).  Writing
# PIZ stays native-only.
# ---------------------------------------------------------------------------

_PIZ_MAXLEN = 58
_PIZ_SHORT_ZEROCODE = 59
_PIZ_LONG_ZEROCODE = 63
_PIZ_SHORTEST_LONG_RUN = 2 + _PIZ_LONG_ZEROCODE - _PIZ_SHORT_ZEROCODE


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("PIZ: bitstream exhausted")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        val = (self.acc >> self.nbits) & ((1 << n) - 1)
        return val


def _piz_canonical_codes(lengths: Dict[int, int]) -> Dict[int, Tuple[int,
                                                                     int]]:
    """symbol -> (code, length) with the OpenEXR canonical assignment:
    per-length base codes computed longest-first, symbols in index order."""
    n = [0] * (_PIZ_MAXLEN + 1)
    for l in lengths.values():
        n[l] += 1
    c = 0
    base = [0] * (_PIZ_MAXLEN + 1)
    for i in range(_PIZ_MAXLEN, 0, -1):
        nc = (c + n[i]) >> 1
        base[i] = c
        c = nc
    codes = {}
    nxt = list(base)
    for sym in sorted(lengths):
        l = lengths[sym]
        if l > 0:
            codes[sym] = (nxt[l], l)
            nxt[l] += 1
    return codes


_PIZ_TABLE_BITS = 14


def _piz_huf_decode(data: bytes, n_out: int) -> np.ndarray:
    im, iM, tlen, nbits, _ = struct.unpack_from("<IIIII", data, 0)
    table = _BitReader(data[20:20 + tlen])
    lengths: Dict[int, int] = {}
    i = im
    while i <= iM:
        l = table.read(6)
        if l == _PIZ_LONG_ZEROCODE:
            zerun = table.read(8) + _PIZ_SHORTEST_LONG_RUN
            i += zerun
        elif l >= _PIZ_SHORT_ZEROCODE:
            i += l - _PIZ_SHORT_ZEROCODE + 2
        else:
            if l > 0:
                lengths[i] = l
            i += 1
    codes = _piz_canonical_codes(lengths)

    # table-driven decode (the C++ HufDecoder strategy): a 2^14 lookup
    # resolves any code of <= 14 bits in one step; longer codes fall back
    # to a per-(code, length) dict probe.
    tb = _PIZ_TABLE_BITS
    table_sym = np.full(1 << tb, -1, np.int64)
    table_len = np.zeros(1 << tb, np.uint8)
    long_codes: Dict[Tuple[int, int], int] = {}
    for sym, (code, l) in codes.items():
        if l <= tb:
            base = code << (tb - l)
            table_sym[base:base + (1 << (tb - l))] = sym
            table_len[base:base + (1 << (tb - l))] = l
        else:
            long_codes[(code, l)] = sym

    rlc = iM
    stream = data[20 + tlen:]
    out = np.empty(n_out, np.uint16)
    produced = 0
    consumed = 0
    acc = 0
    nacc = 0
    pos = 0
    n_stream = len(stream)
    prev = -1
    while produced < n_out and consumed < nbits:
        # refill so we can peek a full table window (zero-padded at EOS)
        while nacc < tb + 8:
            acc = (acc << 8) | (stream[pos] if pos < n_stream else 0)
            pos += 1
            nacc += 8
        window = (acc >> (nacc - tb)) & ((1 << tb) - 1)
        sym = int(table_sym[window])
        if sym >= 0:
            length = int(table_len[window])
        else:
            # long code: extend bit by bit beyond the table width
            code = window
            length = tb
            sym = None
            while sym is None and length < _PIZ_MAXLEN:
                while nacc < length + 1 + 8:
                    acc = (acc << 8) | (stream[pos] if pos < n_stream else 0)
                    pos += 1
                    nacc += 8
                length += 1
                code = (acc >> (nacc - length)) & ((1 << length) - 1)
                sym = long_codes.get((code, length))
            if sym is None:
                raise ValueError("PIZ: invalid code")
        nacc -= length
        consumed += length
        if sym == rlc:
            while nacc < 8:
                acc = (acc << 8) | (stream[pos] if pos < n_stream else 0)
                pos += 1
                nacc += 8
            n = (acc >> (nacc - 8)) & 0xFF
            nacc -= 8
            consumed += 8
            if prev < 0 or produced + n > n_out:
                raise ValueError("PIZ: bad run")
            out[produced:produced + n] = prev
            produced += n
        else:
            out[produced] = sym
            prev = sym
            produced += 1
        acc &= (1 << nacc) - 1 if nacc else 0
    if produced != n_out:
        raise ValueError("PIZ: short output")
    return out


def _piz_wav_decode(buf: np.ndarray, nx: int, ox: int, ny: int, oy: int,
                    mx: int) -> None:
    """In-place 2D wavelet decode (the inverse of the PIZ encoder's
    wenc14/wenc16 passes), operating on a flat uint16 array."""
    w14 = mx < (1 << 14)

    def wdec14(l, h):
        ls = l.astype(np.int16).astype(np.int32)
        hs = h.astype(np.int16).astype(np.int32)
        ai = ls + (hs & 1) + (hs >> 1)
        return (ai.astype(np.int16).astype(np.uint16),
                (ai - hs).astype(np.int16).astype(np.uint16))

    def wdec16(l, h):
        m = l.astype(np.int64)
        d = h.astype(np.int64)
        bb = (m - (d >> 1)) & 0xFFFF
        aa = (d + bb - 0x8000) & 0xFFFF
        return aa.astype(np.uint16), bb.astype(np.uint16)

    wdec = wdec14 if w14 else wdec16
    n = min(nx, ny)
    p = 1
    while p <= n:
        p <<= 1
    p >>= 1
    p2 = p
    p >>= 1
    while p >= 1:
        ys = np.arange(0, ny - p2 + 1, p2)
        xs = np.arange(0, nx - p2 + 1, p2)
        # aligned 2x2 blocks (vectorized; disjoint from the leftovers)
        yy, xx = np.meshgrid(ys, xs, indexing="ij")
        i00 = (yy * oy + xx * ox).ravel()
        i01 = i00 + p * ox
        i10 = i00 + p * oy
        i11 = i10 + p * ox
        a00, a10 = wdec(buf[i00], buf[i10])
        a01, a11 = wdec(buf[i01], buf[i11])
        b00, b01 = wdec(a00, a01)
        b10, b11 = wdec(a10, a11)
        buf[i00], buf[i01] = b00, b01
        buf[i10], buf[i11] = b10, b11
        # leftover column: first x beyond the aligned loop (encoder mirrors)
        if nx & p:
            x_l = int(xs[-1]) + p2
            if x_l < nx:
                idx0 = ys * oy + x_l * ox
                a, b = wdec(buf[idx0], buf[idx0 + p * oy])
                buf[idx0], buf[idx0 + p * oy] = a, b
        # leftover row
        if ny & p:
            y_l = int(ys[-1]) + p2
            if y_l < ny:
                idx0 = y_l * oy + xs * ox
                a, b = wdec(buf[idx0], buf[idx0 + p * ox])
                buf[idx0], buf[idx0 + p * ox] = a, b
        p2 = p
        p >>= 1


# ---------------------------------------------------------------------------
# Header serialization
# ---------------------------------------------------------------------------


def _attr(name: str, typ: str, payload: bytes) -> bytes:
    return (name.encode() + b"\0" + typ.encode() + b"\0"
            + struct.pack("<i", len(payload)) + payload)


def _channel_list(names: List[str], pixel_type: int) -> bytes:
    out = b""
    for name in sorted(names):
        out += name.encode() + b"\0"
        out += struct.pack("<i", pixel_type)
        out += struct.pack("<BBBB", 0, 0, 0, 0)  # pLinear + reserved
        out += struct.pack("<ii", 1, 1)          # x/y sampling
    return out + b"\0"


def _build_header(w: int, h: int, pixel_type: int, compression_id: int,
                  channel_names: List[str]) -> bytes:
    hdr = b""
    hdr += _attr("channels", "chlist", _channel_list(channel_names,
                                                     pixel_type))
    hdr += _attr("compression", "compression",
                 struct.pack("<B", compression_id))
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    hdr += _attr("dataWindow", "box2i", box)
    hdr += _attr("displayWindow", "box2i", box)
    hdr += _attr("lineOrder", "lineOrder", struct.pack("<B", 0))
    hdr += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    hdr += _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0))
    hdr += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    return hdr + b"\0"


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


def _channel_names(c: int) -> List[str]:
    if c == 3:
        return ["R", "G", "B"]
    if c == 1:
        return ["Y"]
    # zero-padded so alphabetical chlist order == numeric order (the spec
    # stores channels sorted by name; "channel10" would otherwise sort
    # before "channel2" and permute the round trip for c >= 11)
    width = len(str(c - 1))
    return [f"channel{i:0{width}d}" for i in range(c)]


def _encode_chunk(band: np.ndarray, yb0: int, yb1: int, y0_global: int,
                  order: List[int], ptype: int, comp_id: int,
                  zip_level: int) -> bytes:
    """Encode one scanline chunk (rows [yb0, yb1) of ``band``, which sits
    at global row ``y0_global - yb0``... i.e. the chunk's global first row
    is ``y0_global``).  Chunks are independent in every supported EXR
    compression, which is what makes both band streaming and chunk-thread
    parallelism byte-identical to the serial whole-image writer."""
    dtype = _PIX_DTYPE[ptype]
    raw_rows: List[bytes] = []
    for y in range(yb0, yb1):
        for i in order:
            raw_rows.append(np.ascontiguousarray(
                band[y, :, i]).astype(dtype).tobytes())
    raw = b"".join(raw_rows)
    if comp_id == 0:
        data = raw
    elif comp_id == 1:  # RLE
        data = _rle_encode(_filter_encode(raw))
    elif comp_id in (2, 3):  # ZIPS / ZIP
        data = zlib.compress(_filter_encode(raw), zip_level)
    elif comp_id == 5:  # PXR24
        rows = []
        for y in range(yb0, yb1):
            for i in order:
                rows.append((np.asarray(band[y, :, i], np.float32),
                             ptype))
        data = zlib.compress(_pxr24_pack_rows(rows), zip_level)
    else:
        raise NotImplementedError(_ID_TO_NAME.get(comp_id, comp_id))
    if len(data) >= len(raw):
        data = raw
    return struct.pack("<ii", y0_global, len(data)) + data


class ExrBandWriter:
    """Incremental scanline-EXR writer: header + zeroed offset table
    first, chunks appended band by band, table patched on :meth:`close`.

    Built for the streamed single-frame export (io.pipeline): the exporter
    encodes band k while band k+1 is still in flight from the device, so
    single-frame latency is max(fetch, encode) instead of fetch + encode.
    Chunk payloads within a band are compressed on a small thread pool
    (zlib/numpy release the GIL); EXR chunks are independent, so the file
    is IDENTICAL to the serial writer's byte for byte — asserted across
    band splits and worker counts in tests/test_io.py.

    Every band except the last must cover a whole number of chunks
    (``rows %% lines_per_chunk == 0``); :attr:`band_rows` rounds any
    requested band size to a valid one.
    """

    def __init__(self, path: str, height: int, width: int, channels: int,
                 *, pixel_type: str = "half", compression: str = "zip",
                 zip_level: int = 4, workers: int = 0):
        self._comp_id = COMPRESSION_IDS[compression]
        if self._comp_id == COMPRESSION_IDS["piz"]:
            raise NotImplementedError(
                "PIZ writing unsupported in the pure-Python codec; "
                "substitute zip (hdrvae.io.exr does this automatically)")
        self._ptype = PIXEL_HALF if pixel_type == "half" else PIXEL_FLOAT
        self._h, self._w, self._c = height, width, channels
        self._lines = LINES_PER_CHUNK[self._comp_id]
        names = _channel_names(channels)
        self._order = sorted(range(channels), key=lambda i: names[i])
        self._zip_level = zip_level
        if workers <= 0:
            workers = min(8, os.cpu_count() or 1)
        self._workers = workers
        self._pool = None
        if workers > 1:
            import concurrent.futures as cf
            self._pool = cf.ThreadPoolExecutor(workers)

        header = (struct.pack("<I", MAGIC) + struct.pack("<i", VERSION)
                  + _build_header(width, height, self._ptype, self._comp_id,
                                  names))
        self._n_chunks = (height + self._lines - 1) // self._lines
        self._offsets: List[int] = []
        self._closed = False
        self._f = open(path, "wb")
        ok = False
        try:
            self._f.write(header)
            self._table_pos = len(header)
            self._f.write(b"\0" * (8 * self._n_chunks))
            self._pos = len(header) + 8 * self._n_chunks
            self._next_row = 0
            ok = True
        finally:
            if not ok:
                self._f.close()
                if self._pool is not None:
                    self._pool.shutdown(wait=False)

    def band_rows(self, requested: int) -> int:
        """Round a band size up to a whole number of chunks."""
        lines = self._lines
        return max(lines, (requested + lines - 1) // lines * lines)

    def write_rows(self, band: np.ndarray) -> None:
        """Append the next ``band.shape[0]`` scanlines ([rows, W, C])."""
        if band.ndim == 2:
            band = band[..., None]
        rows, w, c = band.shape
        if (w, c) != (self._w, self._c):
            raise ValueError(f"band is {w}x{c}, file is "
                             f"{self._w}x{self._c}")
        y0 = self._next_row
        if y0 + rows > self._h:
            raise ValueError(f"rows {y0}+{rows} beyond height {self._h}")
        if rows % self._lines and y0 + rows != self._h:
            raise ValueError(
                f"band of {rows} rows is not a whole number of "
                f"{self._lines}-line chunks (use band_rows())")
        spans = [(yb0, min(yb0 + self._lines, rows))
                 for yb0 in range(0, rows, self._lines)]

        def enc(span):
            return _encode_chunk(band, span[0], span[1], y0 + span[0],
                                 self._order, self._ptype, self._comp_id,
                                 self._zip_level)

        chunks = (self._pool.map(enc, spans) if self._pool is not None
                  else map(enc, spans))
        for chunk in chunks:      # pool.map preserves order
            self._offsets.append(self._pos)
            self._f.write(chunk)
            self._pos += len(chunk)
        self._next_row = y0 + rows

    def close(self) -> None:
        """Finalize: patch the offset table and close the file.
        Idempotent (a second close/abort is a no-op)."""
        if self._closed:
            return
        self._closed = True
        try:
            if self._next_row != self._h:
                raise ValueError(f"only {self._next_row} of {self._h} "
                                 "rows written")
            self._f.seek(self._table_pos)
            self._f.write(struct.pack(f"<{len(self._offsets)}Q",
                                      *self._offsets))
        finally:
            self._f.close()
            if self._pool is not None:
                self._pool.shutdown(wait=False)

    def abort(self) -> None:
        """Close without finalizing (error path; file is left invalid).
        Idempotent (a no-op after close/abort)."""
        if self._closed:
            return
        self._closed = True
        self._f.close()
        if self._pool is not None:
            self._pool.shutdown(wait=False)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *exc):
        if exc_type is None:
            self.close()
        else:
            self.abort()


def write_exr(path: str, image: np.ndarray, *, pixel_type: str = "half",
              compression: str = "zip", zip_level: int = 4,
              workers: int = 0) -> None:
    """Write an RGB (H, W, 3) or single-channel (H, W) float image.

    pixel_type: "half" | "float"; compression: none/rle/zips/zip/pxr24
    ("piz" must be substituted by the caller — see `hdrvae.io.exr`);
    zip_level: zlib level for zip/zips/pxr24 chunks; workers: chunk-
    compression threads (0 = auto; 1 = serial).  One whole-image band
    through :class:`ExrBandWriter` — same bytes at any worker count.
    """
    image = np.asarray(image)
    if image.dtype != np.float16:   # preserve the f16 fast path bit-exactly
        image = np.asarray(image, np.float32)
    if image.ndim == 2:
        image = image[..., None]
    h, w, c = image.shape
    writer = ExrBandWriter(path, h, w, c, pixel_type=pixel_type,
                           compression=compression, zip_level=zip_level,
                           workers=workers)
    with writer:
        writer.write_rows(image)


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------


def _read_cstr(buf: bytes, pos: int) -> Tuple[str, int]:
    end = buf.index(b"\0", pos)
    return buf[pos:end].decode("latin-1"), end + 1


def read_exr_header(buf: bytes) -> Tuple[Dict, int]:
    magic, version = struct.unpack_from("<Ii", buf, 0)
    if magic != MAGIC:
        raise ValueError("not an EXR file")
    if version & 0x200:
        raise NotImplementedError("tiled EXR not supported")
    if version & (0x800 | 0x1000):
        raise NotImplementedError("deep/multipart EXR not supported")
    pos = 8
    attrs: Dict = {}
    while True:
        if buf[pos] == 0:
            pos += 1
            break
        name, pos = _read_cstr(buf, pos)
        typ, pos = _read_cstr(buf, pos)
        (size,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        # a negative attribute size from a corrupt file would walk pos
        # BACKWARDS (size == -attr_len re-parses the same attribute
        # forever); the native reader rejects these with rc -2 and the
        # dispatch falls back to this reader, so it must reject too
        if size < 0 or pos + size > len(buf):
            raise ValueError(f"corrupt EXR header: attribute {name!r} "
                             f"size {size} out of bounds")
        payload = buf[pos:pos + size]
        pos += size
        attrs[name] = (typ, payload)

    # decode what we need
    ch_payload = attrs["channels"][1]
    channels = []
    cpos = 0
    while ch_payload[cpos] != 0:
        cname, cpos = _read_cstr(ch_payload, cpos)
        (ptype,) = struct.unpack_from("<i", ch_payload, cpos)
        cpos += 4 + 4 + 8  # type + pLinear/reserved + sampling
        channels.append((cname, ptype))
    comp_id = attrs["compression"][1][0]
    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"][1])
    header = {
        "channels": channels,
        "compression": _ID_TO_NAME.get(comp_id, str(comp_id)),
        "compression_id": comp_id,
        "width": x1 - x0 + 1,
        "height": y1 - y0 + 1,
        "y_min": y0,
        "attrs": attrs,
    }
    return header, pos


def read_exr(path: str) -> np.ndarray:
    """Read a scanline EXR into float32 (H, W, C); RGB files return RGB
    order regardless of the alphabetical storage order."""
    with open(path, "rb") as f:
        buf = f.read()
    header, pos = read_exr_header(buf)
    w, h = header["width"], header["height"]
    comp_id = header["compression_id"]
    lines = LINES_PER_CHUNK[comp_id]
    channels = header["channels"]
    c = len(channels)
    n_chunks = -(-h // lines)
    offsets = struct.unpack_from(f"<{n_chunks}Q", buf, pos)

    planes = {name: np.empty((h, w), np.float32) for name, _ in channels}
    row_bytes = sum(w * _PIX_SIZE[pt] for _, pt in channels)
    rows_seen = np.zeros(h, bool)

    for ci, off in enumerate(offsets):
        if off > len(buf) - 8:
            raise ValueError(f"corrupt EXR: chunk offset {off} out of "
                             "bounds")
        y, size = struct.unpack_from("<ii", buf, off)
        y -= header["y_min"]
        # validate the file-supplied scanline base and chunk size like
        # the native reader (rc -4): a lying y would write rows through
        # Python negative indexing into the wrong end of the plane and
        # leave unwritten rows as uninitialized np.empty memory
        if y < 0 or y >= h:
            raise ValueError(f"corrupt EXR: chunk {ci} claims scanline "
                             f"{y + header['y_min']}")
        if size < 0 or off + 8 + size > len(buf):
            raise ValueError(f"corrupt EXR: chunk {ci} size {size} out "
                             "of bounds")
        data = buf[off + 8:off + 8 + size]
        y1 = min(y + lines, h)
        nrows = y1 - y
        rows_seen[y:y1] = True
        raw_size = nrows * row_bytes
        if comp_id == 0 or len(data) >= raw_size:
            # Writers store raw whenever compression does not shrink.
            raw = data
        elif comp_id == COMPRESSION_IDS["piz"]:
            # parse payload: bitmap range, bitmap, huffman block
            min_nz, max_nz = struct.unpack_from("<HH", data, 0)
            ppos = 4
            bitmap = np.zeros(65536 // 8, np.uint8)
            if min_nz <= max_nz:
                count = max_nz - min_nz + 1
                bitmap[min_nz:max_nz + 1] = np.frombuffer(
                    data[ppos:ppos + count], np.uint8)
                ppos += count
            (hlen,) = struct.unpack_from("<i", data, ppos)
            ppos += 4
            total_shorts = raw_size // 2
            shorts = _piz_huf_decode(data[ppos:ppos + hlen], total_shorts)
            # per channel-plane wavelet decode
            bits = np.unpackbits(bitmap, bitorder="little")
            present = np.nonzero(bits)[0]
            rlut = np.zeros(65536, np.uint16)
            vals = np.unique(np.concatenate([[0], present]))
            rlut[:len(vals)] = vals.astype(np.uint16)
            max_value = len(vals) - 1
            plane_pos = 0
            for name, pt in channels:
                nshorts = _PIX_SIZE[pt] // 2
                plane_len = nrows * w * nshorts
                for j in range(nshorts):
                    # in-place over a strided view: short-plane j within the
                    # channel's interleaved buffer (x-stride = nshorts)
                    _piz_wav_decode(
                        shorts[plane_pos + j:plane_pos + plane_len], w,
                        nshorts, nrows, w * nshorts, max_value)
                plane_pos += plane_len
            shorts = rlut[shorts]
            # re-interleave channel-major planes into scanline-major rows
            raw_arr = np.empty(raw_size, np.uint8)
            rpos2 = 0
            plane_base = 0
            plane_offsets = []
            for name, pt in channels:
                plane_offsets.append(plane_base)
                plane_base += nrows * w * (_PIX_SIZE[pt] // 2)
            for yy in range(nrows):
                for (name, pt), poff in zip(channels, plane_offsets):
                    nshorts = _PIX_SIZE[pt] // 2
                    rowvals = shorts[poff + yy * w * nshorts:
                                     poff + (yy + 1) * w * nshorts]
                    rb = rowvals.astype("<u2").tobytes()
                    raw_arr[rpos2:rpos2 + len(rb)] = np.frombuffer(
                        rb, np.uint8)
                    rpos2 += len(rb)
            raw = raw_arr.tobytes()
        elif comp_id == 1:
            raw = _filter_decode(_rle_decode(data, raw_size))
        elif comp_id in (2, 3):
            raw = _filter_decode(zlib.decompress(data))
        elif comp_id == 5:
            row_types = [pt for _ in range(nrows) for _, pt in channels]
            rows = _pxr24_unpack_rows(zlib.decompress(data), w, row_types)
            ri = 0
            for yy in range(y, y1):
                for name, _ in channels:
                    planes[name][yy] = rows[ri]
                    ri += 1
            continue
        else:
            raise NotImplementedError(header["compression"])
        rpos = 0
        for yy in range(y, y1):
            for name, pt in channels:
                nbytes = w * _PIX_SIZE[pt]
                row = np.frombuffer(raw[rpos:rpos + nbytes], _PIX_DTYPE[pt])
                planes[name][yy] = row.astype(np.float32)
                rpos += nbytes

    if not rows_seen.all():
        # duplicated/permuted chunk y values can cover some rows twice
        # and others never — those rows would be uninitialized memory
        missing = np.nonzero(~rows_seen)[0]
        raise ValueError(f"corrupt EXR: {missing.size} scanlines "
                         f"(first {missing[0]}) covered by no chunk")

    names = [name for name, _ in channels]
    if set(names) >= {"R", "G", "B"}:
        # RGB first, then EVERY other channel (A, Z, AOVs...) in header
        # order — the same plane layout the native reader produces, so
        # the two interchangeable readers agree on shape for any file.
        stack = [planes["R"], planes["G"], planes["B"]]
        stack += [planes[n] for n in names if n not in ("R", "G", "B")]
        return np.stack(stack, -1)
    # generic channelN planes: numeric order (legacy unpadded writers
    # stored channel10 alphabetically before channel2)
    ms = [re.match(r"^channel(\d+)$", n) for n in names]
    if len(names) > 1 and all(ms):
        names = [n for _, n in sorted(
            (int(m.group(1)), n) for m, n in zip(ms, names))]
    return np.stack([planes[n] for n in names], -1)

"""Pipelined export: overlap device decode, device->host fetch, and disk
write across a frame sequence.

The reference's export path is fully serial — per frame it syncs the whole
tensor to host, encodes, writes (`linear_exr_export.py:313-353`), so a
decode -> EXR pipeline runs at the SUM of decode + fetch + encode + write
per frame.  This module runs the three resources concurrently:

  device:  decode frame N+1            (async XLA dispatch)
  link:    fetch frame N               (dedicated fetch thread)
  host:    encode + write frame N-1    (dedicated writer thread)

so steady-state throughput is set by the SLOWEST stage, not the sum.  Two
further bandwidth levers:

  - reduced-precision fetch: for 16-bit EXR output the file stores half
    floats anyway, so the frame is cast to float16 ON DEVICE and fetched
    at half the bytes with zero quality loss (the serial exporter fetches
    float32 regardless).
  - chunked parallel fetch (``fetch_workers``): the frame is split into
    row bands fetched by concurrent threads — on transports whose
    per-stream bandwidth is throttled (remote/tunneled devices) this
    multiplies effective fetch bandwidth; on local PCIe it is harmless.

Naming/versioning/sidecar/verify semantics are shared with the serial
exporter (io.export.plan_output / verify_save), so the two paths produce
identical files for identical pixels.
"""

from __future__ import annotations

import concurrent.futures as cf
import logging
from collections import deque
from typing import Any, Callable, Dict, Iterable, Optional, Union

import numpy as np

from hdrvae.core.config import ExportConfig
from hdrvae.io.export import (ExportResult, _save_one, _write_sidecar,
                              plan_output, verify_save)

logger = logging.getLogger(__name__)

Frame = Union[np.ndarray, Any, Callable[[], Any]]


def _fetch(frame, want_half: bool, fetch_workers: int) -> np.ndarray:
    """Device->host transfer of one frame (or pass-through for numpy)."""
    if isinstance(frame, np.ndarray):
        return frame.astype(np.float16) if want_half else frame
    import jax
    import jax.numpy as jnp
    if want_half:
        frame = frame.astype(jnp.float16)   # cast on device: half the bytes
    if fetch_workers > 1 and frame.ndim >= 2 and \
            frame.shape[0] >= fetch_workers:
        bands = np.array_split(np.arange(frame.shape[0]), fetch_workers)
        slices = [frame[b[0]:b[-1] + 1] for b in bands]
        for s in slices:
            if hasattr(s, "copy_to_host_async"):
                s.copy_to_host_async()
        with cf.ThreadPoolExecutor(fetch_workers) as pool:
            parts = list(pool.map(jax.device_get, slices))
        return np.concatenate(parts, axis=0)
    return np.asarray(jax.device_get(frame))


def export_frame_streamed(frame: Frame,
                          cfg: ExportConfig = ExportConfig(),
                          *, default_output_dir: str = "output",
                          prompt: Optional[dict] = None,
                          extra_pnginfo: Optional[dict] = None,
                          band_rows: int = 256,
                          workers: int = 0) -> ExportResult:
    """Single-frame EXR export with INTRA-frame overlap: fetch scanline
    band k+1 from the device while band k is being encoded (threaded
    chunk compression) and written (VERDICT round-3 item 3).

    The serial path pays fetch + encode + write in sequence over the whole
    frame (`io.export.export_linear` after an `np.asarray(image)`); here
    the frame never exists whole on the host and the wall time approaches
    max(total fetch, total encode).  The file is byte-identical to the
    serial exporter's (EXR chunks are independent; `io.exr.ExrBandWriter`).

    frame: one [H, W, C] image — a jax device array (the intended use), a
    numpy array, or a zero-arg callable returning either.  Non-EXR formats
    and invalid configs fall back to the serial exporter (same contract).
    """
    if callable(frame):
        frame = frame()
    if cfg.format != "exr" or getattr(frame, "ndim", 0) != 3:
        import jax
        arr = frame if isinstance(frame, np.ndarray) else np.asarray(
            jax.device_get(frame))
        from hdrvae.io.export import export_linear
        return export_linear(arr, cfg,
                             default_output_dir=default_output_dir,
                             prompt=prompt, extra_pnginfo=extra_pnginfo)

    result = ExportResult()
    try:
        from hdrvae.io.exr import ExrBandWriter
        import os
        h, w, c = frame.shape
        output_dir, template, sequenced = plan_output(
            cfg, default_output_dir, 1)
        filename = template % cfg.start_frame if sequenced else template
        filepath = os.path.join(output_dir, filename)
        pixel_type = "float" if cfg.bit_depth == "32bit" else "half"

        want_half = pixel_type == "half"
        if not isinstance(frame, np.ndarray):
            import jax.numpy as jnp
            if want_half:
                # the file stores halves anyway: cast on device and fetch
                # half the bytes (bit-identical EXR payload)
                frame = frame.astype(jnp.float16)

        writer = ExrBandWriter(filepath, h, w, c, pixel_type=pixel_type,
                               compression=cfg.compression,
                               workers=workers)
        rows = writer.band_rows(band_rows)
        spans = [(y0, min(y0 + rows, h)) for y0 in range(0, h, rows)]
        stats = {"hdr": 0, "neg": 0}

        def fetch(span):
            band = frame[span[0]:span[1]]
            if not isinstance(band, np.ndarray):
                import jax
                band = np.asarray(jax.device_get(band))
            stats["hdr"] += int((band > 1.0).sum())
            stats["neg"] += int((band < 0.0).sum())
            return band

        fetcher = cf.ThreadPoolExecutor(1)
        try:
            with writer:
                fut = fetcher.submit(fetch, spans[0])
                for i in range(len(spans)):
                    band = fut.result()
                    if i + 1 < len(spans):
                        fut = fetcher.submit(fetch, spans[i + 1])
                    writer.write_rows(band)
        finally:
            fetcher.shutdown(wait=True, cancel_futures=True)
        logger.info("export (streamed): %s hdr_pixels=%d negatives=%d",
                    filepath, stats["hdr"], stats["neg"])
        if cfg.save_workflow:
            _write_sidecar(filepath, prompt, extra_pnginfo)
        result.filepaths = [filepath]
        try:
            result.verify_stats = verify_save(filepath)
            result.verified = True
        except Exception as e:   # diagnostic, not gating
            logger.warning("read-back verification failed: %s", e)
        return result
    except Exception as e:  # node contract: report, don't raise
        logger.error("streamed export failed: %s", e, exc_info=True)
        result.error = f"ERROR: {e}"
        return result


def export_stream(frames: Iterable[Frame],
                  cfg: ExportConfig = ExportConfig(),
                  *, default_output_dir: str = "output",
                  prompt: Optional[dict] = None,
                  extra_pnginfo: Optional[dict] = None,
                  pbar=None,
                  depth: int = 2,
                  fetch_workers: int = 1,
                  reduced_precision_fetch: bool = True) -> ExportResult:
    """Export a sequence of frames with decode/fetch/write overlap.

    frames: iterable of per-frame images ([H, W, C]) — jax device arrays,
    numpy arrays, or zero-argument callables returning either.  Callables
    are invoked lazily with at most ``depth`` frames in flight: a callable
    that dispatches a jitted decode starts frame N+1's device work while
    frame N is still being fetched/written, without queueing the whole
    sequence up front.

    Returns the same :class:`ExportResult` contract as
    :func:`hdrvae.io.export.export_linear` (errors reported, not raised;
    last file read back and verified).
    """
    result = ExportResult()
    # consume the iterable LAZILY (one-frame lookahead to learn whether
    # the sequence has > 1 frame): a generator of device arrays must not
    # be fully materialized up front — that would dispatch every decode
    # and hold every full-resolution output buffer on device at once,
    # defeating the depth bound.
    import itertools
    frames_it = iter(frames)
    try:
        first = next(frames_it)
    except StopIteration:
        result.error = "ERROR: no frames"
        return result
    try:
        second = next(frames_it)
        n_hint = 2
        frames_it = itertools.chain([first, second], frames_it)
    except StopIteration:
        n_hint = 1
        frames_it = iter([first])
    want_half = (reduced_precision_fetch and cfg.format == "exr"
                 and cfg.bit_depth == "16bit")
    paths: Dict[int, str] = {}

    try:
        output_dir, template, sequenced = plan_output(
            cfg, default_output_dir, n_hint)
        import os

        def write_one(i: int, image: np.ndarray) -> str:
            frame_number = cfg.start_frame + i
            filename = template % frame_number if sequenced else template
            filepath = os.path.join(output_dir, filename)
            _save_one(filepath, image, cfg.format, cfg.bit_depth,
                      cfg.compression)
            if i == 0 and cfg.save_workflow:
                _write_sidecar(filepath, prompt, extra_pnginfo)
            if pbar is not None:
                pbar.update(1)
            paths[i] = filepath   # recorded on the (single) writer
            return filepath       # thread so failures report partials

        fetcher = cf.ThreadPoolExecutor(1)
        writer = cf.ThreadPoolExecutor(1)
        try:
            fetch_q: deque = deque()
            write_q: deque = deque()

            def drain_write():
                fut = write_q.popleft()[1]
                fut.result()   # propagate write errors in order

            def drain_fetch():
                i, fut = fetch_q.popleft()
                write_q.append((i, writer.submit(write_one, i,
                                                 fut.result())))
                # bound pending writes too: when encode+write is the
                # slowest stage, fetched frames must not pile up in the
                # writer queue (each is a full-resolution host array)
                while len(write_q) > depth:
                    drain_write()

            for i, frame in enumerate(frames_it):
                if callable(frame):
                    frame = frame()   # async dispatch of device work
                fetch_q.append(
                    (i, fetcher.submit(_fetch, frame, want_half,
                                       fetch_workers)))
                while len(fetch_q) >= depth:
                    drain_fetch()
            while fetch_q:
                drain_fetch()
            while write_q:
                drain_write()
        finally:
            # on success both queues are empty; on a write/fetch failure
            # CANCEL queued work instead of letting executor shutdown run
            # it — a frame sequence must stop at its first failed write
            # (the reference raises on the first failed save,
            # `linear_exr_export.py:344-346`), not continue past a hole
            fetcher.shutdown(wait=True, cancel_futures=True)
            writer.shutdown(wait=True, cancel_futures=True)

        result.filepaths = [paths[i] for i in sorted(paths)]
        if result.filepaths:
            try:
                result.verify_stats = verify_save(result.filepaths[-1])
                result.verified = True
            except Exception as e:
                # diagnostic, not gating (matches the serial exporter and
                # the reference's non-fatal _verify_save)
                logger.warning("read-back verification failed: %s", e)
        return result
    except Exception as e:  # node contract: report, don't raise
        logger.error("pipelined export failed: %s", e, exc_info=True)
        result.error = f"ERROR: {e}"
        # frames written before the failure exist on disk — report them
        # (matching the serial exporter, which appends as it writes)
        result.filepaths = [paths[i] for i in sorted(paths)]
        return result

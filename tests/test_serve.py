"""Serving layer: engine semantics (queueing, bucketing, overlap,
backpressure) and the HTTP surface.  Runs on the CPU mesh with the small
decoder fixture; the HTTP tests bind an ephemeral localhost port.

The engine must be EXACT vs a direct ``hdr_decode`` call — serving is a
scheduling layer, not an approximation (SURVEY.md section 7 hard-parts,
"recompilation storms" / shape bucketing).
"""

import http.client
import io
import json
import threading

import numpy as np
import pytest

from hdrvae.core.config import HDRDecodeConfig, Precision
from hdrvae.decode.buckets import BucketPolicy
from hdrvae.decode.pipeline import hdr_decode
from hdrvae.serve.engine import EngineOverloaded, ServeEngine

pytestmark = pytest.mark.filterwarnings("ignore::ResourceWarning")


class _FakeVAE:
    def __init__(self, params, config):
        self.params = params
        self.config = config
        self.precision = Precision.parity()


@pytest.fixture()
def vae(small_params, small_cfg):
    return _FakeVAE(small_params, small_cfg)


def _latent(rng, cfg, b=1, h=6, w=6):
    return (rng.standard_normal((b, h, w, cfg.z_channels))
            .astype(np.float32) * 2)


# --- engine ----------------------------------------------------------------

def test_engine_matches_direct_decode(vae, rng):
    latent = _latent(rng, vae.config)
    direct = hdr_decode(vae.params, latent, vae.config,
                        precision=Precision.parity())
    with ServeEngine(vae, bucket=None) as engine:
        resp = engine.decode_sync(latent)
    np.testing.assert_array_equal(resp.image, np.asarray(direct.image))
    assert resp.summary["normalization"] in ("SIGMOID", "TANH", "CUSTOM")
    assert resp.latency_s > 0
    assert resp.padded_hw == (6, 6)


def test_engine_bucket_policy_exact(vae, rng):
    """A policy-snapped decode pads to the bucket and stays exact."""
    policy = BucketPolicy(edges=(8, 12))
    latent = _latent(rng, vae.config, h=5, w=7)
    direct = hdr_decode(vae.params, latent, vae.config,
                        precision=Precision.parity())
    with ServeEngine(vae, bucket=policy) as engine:
        resp = engine.decode_sync(latent)
    assert resp.padded_hw == (8, 8)
    assert resp.image.shape == np.asarray(direct.image).shape
    scale = max(1.0, float(np.abs(np.asarray(direct.image)).max()))
    err = np.abs(resp.image - np.asarray(direct.image)).max() / scale
    assert err < 1e-3, err


def test_engine_int_bucket_and_stats(vae, rng):
    with ServeEngine(vae, bucket=4) as engine:
        for h, w in [(5, 6), (6, 5), (7, 7)]:   # all snap to 8x8
            engine.decode_sync(_latent(rng, vae.config, h=h, w=w))
        stats = engine.stats()
    assert stats["requests"] == 3
    assert stats["errors"] == 0
    # one compiled latent shape serves all three requests
    assert stats["compiled_latent_shapes"] == {"8x8": 3}
    assert stats["latency_p50_s"] > 0
    assert stats["megapixels"] > 0


def test_engine_concurrent_submits_keep_order_independence(vae, rng):
    """Many in-flight requests resolve, each to ITS OWN decode (no
    cross-request contamination through the overlap pipeline)."""
    latents = [_latent(rng, vae.config) for _ in range(5)]
    with ServeEngine(vae, bucket=None, depth=2) as engine:
        futs = [engine.submit(z) for z in latents]
        images = [f.result().image for f in futs]
    for z, img in zip(latents, images):
        direct = hdr_decode(vae.params, z, vae.config,
                            precision=Precision.parity())
        np.testing.assert_array_equal(img, np.asarray(direct.image))


def test_engine_error_propagates_and_engine_survives(vae, rng):
    with ServeEngine(vae, bucket=None) as engine:
        bad = rng.standard_normal((1, 6, 6, 3)).astype(np.float32)  # 3ch
        with pytest.raises(ValueError):
            engine.decode_sync(bad)
        with pytest.raises(ValueError):
            engine.submit(np.zeros((6, 6), np.float32))   # 2D
        # the worker is still alive and serves the next request
        ok = engine.decode_sync(_latent(rng, vae.config))
        assert ok.image.shape[-1] == 3
        assert engine.stats()["errors"] == 1   # the 2D one never queued


def test_engine_backpressure_and_close(vae, rng):
    engine = ServeEngine(vae, bucket=None, max_pending=1)
    # hold the worker behind one slow decode, then overfill the queue
    gate = threading.Event()
    orig_dispatch = engine._dispatch

    def slow_dispatch(latent, cfg):
        gate.wait(10)
        return orig_dispatch(latent, cfg)

    engine._dispatch = slow_dispatch
    first = engine.submit(_latent(rng, vae.config))     # worker takes it
    import time
    deadline = time.monotonic() + 5
    queued = None
    while time.monotonic() < deadline:
        try:   # fill the 1-slot queue once the worker has popped `first`
            queued = engine.submit(_latent(rng, vae.config), block=False)
            break
        except EngineOverloaded:
            time.sleep(0.01)
    assert queued is not None, "worker never picked up the first request"
    with pytest.raises(EngineOverloaded):
        engine.submit(_latent(rng, vae.config), block=False)
    gate.set()
    assert first.result().image.shape[-1] == 3
    assert queued.result().image.shape[-1] == 3
    engine.close()
    with pytest.raises(RuntimeError):
        engine.submit(_latent(rng, vae.config))


def test_pad_to_exact_multiple_shares_bucketed_program(vae, rng):
    """A latent already AT the bucket size must run the SAME bucketed
    decoder program as padded traffic — otherwise warmup (which submits
    exact-bucket latents) pre-compiles a program general traffic never
    uses, and every bucket shape compiles twice."""
    from hdrvae.decode import pipeline as P
    P._decoder_forward_bucketed.clear_cache()
    with ServeEngine(vae, bucket=8) as engine:
        engine.decode_sync(_latent(rng, vae.config, h=5, w=7))   # padded
        n_padded = P._decoder_forward_bucketed._cache_size()
        engine.decode_sync(_latent(rng, vae.config, h=8, w=8))   # exact
        n_exact = P._decoder_forward_bucketed._cache_size()
    assert n_padded == 1
    assert n_exact == 1   # no second decoder program


def test_ev_multiplier_is_traced_not_static(vae, rng):
    """Distinct conservative_ev_multiplier values must reuse one compiled
    program (the multiplier is one f32 multiply; baking it into the jit
    static key lets clients force unbounded full-decoder recompiles)."""
    from hdrvae.decode import pipeline as P
    latent = _latent(rng, vae.config)
    P._hdr_decode_compiled.clear_cache()
    base = hdr_decode(vae.params, latent, vae.config,
                      HDRDecodeConfig(conservative_ev_multiplier=1.0),
                      Precision.parity())
    n1 = P._hdr_decode_compiled._cache_size()
    scaled = hdr_decode(vae.params, latent, vae.config,
                        HDRDecodeConfig(conservative_ev_multiplier=2.5),
                        Precision.parity())
    assert P._hdr_decode_compiled._cache_size() == n1   # no recompile
    # and the multiplier still applies, bit-exactly
    np.testing.assert_array_equal(
        np.asarray(scaled.image),
        np.asarray(base.image) * np.float32(2.5))


def test_engine_warmup_compiles_shapes(vae):
    with ServeEngine(vae, bucket=None) as engine:
        engine.warmup([(6, 6), (8, 8)])
        shapes = engine.stats()["compiled_latent_shapes"]
    assert shapes == {"6x6": 1, "8x8": 1}


# --- HTTP surface ------------------------------------------------------------

@pytest.fixture()
def server(vae):
    from hdrvae.serve.http import make_server
    engine = ServeEngine(vae, bucket=None)
    srv = make_server(engine, host="127.0.0.1", port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()
    engine.close()


def _request(srv, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1",
                                      srv.server_address[1], timeout=120)
    try:
        conn.request(method, path, body=body)
        r = conn.getresponse()
        return r.status, dict(r.getheaders()), r.read()
    finally:
        conn.close()


def _npy_bytes(arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def test_http_healthz_and_stats(server):
    status, _, body = _request(server, "GET", "/healthz")
    assert status == 200
    health = json.loads(body)
    assert health["ok"] and health["device_count"] >= 1
    status, _, body = _request(server, "GET", "/v1/stats")
    assert status == 200
    assert "requests" in json.loads(body)
    status, _, _ = _request(server, "GET", "/nope")
    assert status == 404


def test_http_decode_exr_roundtrip(server, vae, rng, tmp_path):
    from hdrvae.io.exr import read_exr
    latent = _latent(rng, vae.config)
    status, headers, body = _request(
        server, "POST",
        "/v1/decode?format=exr&bit_depth=32bit&compression=none",
        body=_npy_bytes(latent))
    assert status == 200, body
    assert headers["Content-Type"] == "image/x-exr"
    summary = json.loads(headers["X-HDRVAE-Summary"])
    assert summary["normalization"] in ("SIGMOID", "TANH", "CUSTOM")
    p = tmp_path / "resp.exr"
    p.write_bytes(body)
    got = read_exr(str(p))
    direct = hdr_decode(vae.params, latent, vae.config,
                        precision=Precision.parity())
    np.testing.assert_allclose(got, np.asarray(direct.image)[0],
                               atol=1e-6, rtol=1e-6)


def test_http_decode_npy_batch_and_mode(server, vae, rng):
    latent = _latent(rng, vae.config, b=2)
    status, headers, body = _request(
        server, "POST", "/v1/decode?format=npy&mode=conservative&ev=2.0",
        body=_npy_bytes(latent))
    assert status == 200, body
    got = np.load(io.BytesIO(body))
    direct = hdr_decode(vae.params, latent, vae.config,
                        HDRDecodeConfig(hdr_mode="conservative",
                                        conservative_ev_multiplier=2.0),
                        precision=Precision.parity())
    np.testing.assert_array_equal(got, np.asarray(direct.image))
    # image formats refuse batches
    status, _, body = _request(server, "POST", "/v1/decode?format=exr",
                               body=_npy_bytes(latent))
    assert status == 400 and b"batch" in body


def test_http_bad_requests(server, rng, vae):
    cases = [
        ("/v1/decode", b"not an npy file"),                       # bad body
        ("/v1/decode?mode=nonsense",
         _npy_bytes(_latent(rng, vae.config))),                   # bad mode
        ("/v1/decode?format=gif",
         _npy_bytes(_latent(rng, vae.config))),                   # bad fmt
        ("/v1/decode?bit_depth=8bit",
         _npy_bytes(_latent(rng, vae.config))),                   # bad depth
        ("/v1/decode?compression=lzma",
         _npy_bytes(_latent(rng, vae.config))),                   # bad comp
        ("/v1/decode",
         _npy_bytes(np.zeros((6, 6, 4), np.int32))),              # int dtype
        ("/v1/decode",
         _npy_bytes(np.zeros((1, 6, 6, 3), np.float32))),         # 3ch
    ]
    for path, body in cases:
        status, headers, resp = _request(server, "POST", path, body=body)
        assert status == 400, (path, resp)
        # error replies may leave the request body unread: the connection
        # must close (else leftover bytes poison keep-alive parsing)
        assert headers.get("Connection", "").lower() == "close", path
    status, _, _ = _request(server, "POST", "/v1/other", body=b"x")
    assert status == 404


def test_http_nonfinite_stats_header_is_strict_json(server, vae, rng):
    """A NaN-laden latent yields NaN stats; the summary header must still
    be STRICT JSON (no bare NaN/Infinity tokens)."""
    latent = _latent(rng, vae.config)
    latent[0, 0, 0, 0] = np.nan
    status, headers, _ = _request(server, "POST", "/v1/decode?format=npy",
                                  body=_npy_bytes(latent))
    assert status == 200

    def reject(_):
        raise AssertionError("non-strict JSON constant in summary header")

    summary = json.loads(headers["X-HDRVAE-Summary"],
                         parse_constant=reject)
    assert "input" in summary


# --- round-4 additions: deadline, mesh engine, HTTP hardening ---------------

def test_engine_deadline_drops_queued_requests(vae, rng):
    """A request whose deadline expires while QUEUED fails fast with
    TimeoutError instead of spending the device (VERDICT round-3 item 2:
    a cold-shape compile must not wedge the queue)."""
    import time
    engine = ServeEngine(vae, bucket=None)
    gate = threading.Event()
    orig_dispatch = engine._dispatch

    def slow_dispatch(latent, cfg):
        gate.wait(10)
        return orig_dispatch(latent, cfg)

    engine._dispatch = slow_dispatch
    try:
        first = engine.submit(_latent(rng, vae.config))  # worker blocks here
        time.sleep(0.05)   # let the worker pick `first` up
        doomed = engine.submit(_latent(rng, vae.config), deadline_s=0.01)
        ok = engine.submit(_latent(rng, vae.config))     # no deadline
        time.sleep(0.05)   # doomed's deadline passes while queued
        gate.set()
        assert first.result(30).image.shape[-1] == 3
        with pytest.raises(TimeoutError):
            doomed.result(30)
        assert ok.result(30).image.shape[-1] == 3
        assert engine.stats()["errors"] == 1
    finally:
        gate.set()
        engine.close()


def test_engine_blocking_submit_wakes_without_polling(vae, rng):
    """submit(block=True) parks on the engine condition and completes once
    the worker frees a slot (no EngineOverloaded, no busy-wait timeout)."""
    engine = ServeEngine(vae, bucket=None, max_pending=1)
    gate = threading.Event()
    orig_dispatch = engine._dispatch

    def slow_dispatch(latent, cfg):
        gate.wait(10)
        return orig_dispatch(latent, cfg)

    engine._dispatch = slow_dispatch
    try:
        import time
        first = engine.submit(_latent(rng, vae.config))
        time.sleep(0.05)                                  # worker holds it
        second = engine.submit(_latent(rng, vae.config))  # fills the queue
        results = []

        def blocked_submit():
            results.append(engine.submit(_latent(rng, vae.config),
                                         timeout=20))

        t = threading.Thread(target=blocked_submit)
        t.start()
        time.sleep(0.1)
        assert t.is_alive()          # genuinely blocked on a full queue
        gate.set()                   # worker drains; submitter must wake
        t.join(20)
        assert not t.is_alive()
        assert len(results) == 1
        for f in (first, second, results[0]):
            assert f.result(30).image.shape[-1] == 3
    finally:
        gate.set()
        engine.close()


def test_engine_mesh_matches_single_device(vae, rng):
    """The mesh-routed engine (exact sharded slab path) returns the same
    image as the single-device engine (VERDICT round-3 item 2)."""
    from hdrvae.sharding.mesh import make_mesh
    latent = _latent(rng, vae.config, h=16, w=16)
    with ServeEngine(vae, bucket=None) as engine:
        single = engine.decode_sync(latent)
    with ServeEngine(vae, mesh=make_mesh(num_devices=4)) as engine:
        sharded = engine.decode_sync(latent)
        stats = engine.stats()
    assert stats["requests"] == 1
    signal = max(1.0, float(np.abs(single.image).max()))
    err = np.abs(single.image - sharded.image).max() / signal
    assert err < 1e-3, f"mesh-engine vs single-device error {err:.2e}"
    assert sharded.summary["normalization"] == single.summary["normalization"]


def test_engine_mesh_buckets(vae, rng):
    """Mesh serving BUCKETS since round 5 (SlabPadGNReducer threads
    PadMask semantics through the slab tail): two different off-bucket
    shapes share one compiled slab program and both match the unbucketed
    single-device decode exactly."""
    from hdrvae.sharding.mesh import make_mesh
    shapes = [(13, 11), (10, 14)]
    lats = {hw: _latent(rng, vae.config, h=hw[0], w=hw[1])
            for hw in shapes}
    singles = {}
    with ServeEngine(vae, bucket=None) as engine:
        for hw in shapes:
            singles[hw] = engine.decode_sync(lats[hw])
    with ServeEngine(vae, mesh=make_mesh(num_devices=4),
                     bucket=16) as engine:
        for hw in shapes:
            resp = engine.decode_sync(lats[hw])
            assert resp.padded_hw == (16, 16)
            assert resp.image.shape == singles[hw].image.shape
            signal = max(1.0, float(np.abs(singles[hw].image).max()))
            err = np.abs(singles[hw].image - resp.image).max() / signal
            assert err < 1e-3, f"bucketed mesh-engine error {err:.2e}"
        stats = engine.stats()
    # both shapes landed on the SAME compiled (bucket) shape
    assert stats["compiled_latent_shapes"] == {"16x16": 2}


def test_http_ev_validation(server, vae, rng):
    body = _npy_bytes(_latent(rng, vae.config))
    for ev in ("nan", "inf", "-1", "0", "0.05", "11", "1e30"):
        status, _, resp = _request(
            server, "POST", f"/v1/decode?format=npy&ev={ev}", body=body)
        assert status == 400, (ev, resp)
        assert b"ev must be" in resp, (ev, resp)
    # boundary values are accepted
    for ev in ("0.1", "10.0", "2.5"):
        status, _, _ = _request(
            server, "POST", f"/v1/decode?format=npy&ev={ev}", body=body)
        assert status == 200, ev


def test_http_size_caps(vae, rng):
    """Oversized latents are rejected up front (400), before the engine
    spends device memory or an XLA compile on them (ADVICE round 3)."""
    from hdrvae.serve.http import make_server
    engine = ServeEngine(vae, bucket=None)
    srv = make_server(engine, host="127.0.0.1", port=0,
                      max_latent_pixels=8 * 8, max_batch=2)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        ok = _npy_bytes(_latent(rng, vae.config, h=8, w=8))
        status, _, _ = _request(srv, "POST", "/v1/decode?format=npy",
                                body=ok)
        assert status == 200
        big = _npy_bytes(_latent(rng, vae.config, h=9, w=8))
        status, _, resp = _request(srv, "POST", "/v1/decode?format=npy",
                                   body=big)
        assert status == 400 and b"request cap" in resp
        fat = _npy_bytes(_latent(rng, vae.config, b=3, h=6, w=6))
        status, _, resp = _request(srv, "POST", "/v1/decode?format=npy",
                                   body=fat)
        assert status == 400 and b"batch" in resp
    finally:
        srv.shutdown()
        srv.server_close()
        engine.close()


def test_http_result_timeout_returns_504(vae, rng):
    """A wedged decode cannot hang the connection: the handler's bounded
    fut.result() returns 504 (ADVICE round 3 / VERDICT item 2)."""
    from hdrvae.serve.http import make_server
    engine = ServeEngine(vae, bucket=None)
    gate = threading.Event()
    orig_dispatch = engine._dispatch

    def slow_dispatch(latent, cfg):
        gate.wait(15)
        return orig_dispatch(latent, cfg)

    engine._dispatch = slow_dispatch
    srv = make_server(engine, host="127.0.0.1", port=0,
                      request_timeout_s=0.3)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        status, _, resp = _request(
            srv, "POST", "/v1/decode?format=npy",
            body=_npy_bytes(_latent(rng, vae.config)))
        assert status == 504, resp
        assert b"timed out" in resp
    finally:
        gate.set()
        srv.shutdown()
        srv.server_close()
        engine.close()


def test_engine_fetch_dtype_half(vae, rng):
    """fetch_dtype=float16 returns a half-precision image equal to the
    float32 result rounded to half (the reduced-byte transport path the
    HTTP front end uses for 16-bit EXR responses)."""
    latent = _latent(rng, vae.config)
    with ServeEngine(vae, bucket=None) as engine:
        full = engine.decode_sync(latent)
        half = engine.submit(latent, fetch_dtype=np.float16).result()
    assert half.image.dtype == np.float16
    np.testing.assert_array_equal(half.image,
                                  full.image.astype(np.float16))


def test_http_16bit_exr_uses_half_fetch(server, vae, rng, tmp_path):
    """A 16-bit EXR response through the half-fetch path matches the
    32-bit-fetched pixels to half precision."""
    from hdrvae.io.exr import read_exr
    latent = _latent(rng, vae.config)
    status, _, body = _request(
        server, "POST", "/v1/decode?format=exr&bit_depth=16bit",
        body=_npy_bytes(latent))
    assert status == 200, body
    p = tmp_path / "h.exr"
    p.write_bytes(body)
    got = read_exr(str(p))
    direct = hdr_decode(vae.params, latent, vae.config,
                        precision=Precision.parity())
    want = np.asarray(direct.image)[0].astype(np.float16).astype(
        np.float32)
    np.testing.assert_array_equal(got, want)


def test_http_mesh_bucketed_serving(vae, rng):
    """The OUTERMOST surface of round-5 mesh bucketing: an HTTP decode
    against a ServeEngine(mesh=..., bucket=...) returns the same image
    as the plain single-device engine, and a second off-bucket shape
    reuses the same compiled slab program."""
    import threading

    from hdrvae.serve.http import make_server
    from hdrvae.sharding.mesh import make_mesh

    engine = ServeEngine(vae, mesh=make_mesh(num_devices=4), bucket=16)
    srv = make_server(engine, host="127.0.0.1", port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        for hw in ((13, 11), (10, 14)):
            lat = _latent(rng, vae.config, h=hw[0], w=hw[1])
            status, _, body = _request(
                srv, "POST", "/v1/decode?format=npy",
                body=_npy_bytes(lat))
            assert status == 200, body[:200]
            img = np.load(io.BytesIO(body))
            ref = hdr_decode(vae.params, lat, vae.config,
                             precision=vae.precision)
            scale = max(1.0, float(np.abs(np.asarray(ref.image)).max()))
            err = np.abs(img - np.asarray(ref.image)).max() / scale
            assert err < 1e-3, f"http mesh-bucket error {err:.2e}"
        assert engine.stats()["compiled_latent_shapes"] == {"16x16": 2}
    finally:
        srv.shutdown()
        srv.server_close()
        engine.close()

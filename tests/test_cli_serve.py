"""HTTP serving daemon (cli/serve) over an AOT .tdx bundle."""

from __future__ import annotations

import http.client
import io
import json
import threading

import jax
import numpy as np
import pytest

from transmil_deepgraft_tpu.models import create_model
from transmil_deepgraft_tpu.serving import ServingBundle, export_serving_bundle

DIM = 32


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from transmil_deepgraft_tpu.cli.serve import make_server

    model = create_model("AttMIL", n_classes=3, in_features=DIM)
    x = np.zeros((1, 64, DIM), np.float32)
    variables = jax.device_get(model.init({"params": jax.random.key(0)}, x))
    path = tmp_path_factory.mktemp("bundle") / "head.tdx"
    export_serving_bundle(
        model, variables, path, model_name="AttMIL", in_features=DIM,
        buckets=(64, 128), platforms=("cpu",),
    )
    bundle = ServingBundle.load(path)
    srv = make_server(bundle, "127.0.0.1", 0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1], model, variables
    srv.shutdown()
    srv.server_close()


def _request(port, method, path, body=None, ctype="application/json"):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    headers = {"Content-Type": ctype} if body is not None else {}
    conn.request(method, path, body=body, headers=headers)
    r = conn.getresponse()
    out = json.loads(r.read())
    conn.close()
    return r.status, out


def test_health_and_meta(server):
    port, _, _ = server
    status, doc = _request(port, "GET", "/health")
    assert status == 200 and doc["status"] == "ok" and doc["model"] == "AttMIL"
    status, meta = _request(port, "GET", "/meta")
    assert status == 200 and meta["in_features"] == DIM


def test_predict_json_matches_live_model(server):
    port, model, variables = server
    feats = np.random.default_rng(0).standard_normal((40, DIM)).astype(np.float32)
    status, doc = _request(
        port, "POST", "/predict", body=json.dumps({"features": feats.tolist()})
    )
    assert status == 200
    # server pads 40 -> bucket 64 with zeros, same as eval_pad='bucket'
    padded = np.zeros((1, 64, DIM), np.float32)
    padded[0, :40] = feats
    live = np.asarray(model.apply(variables, padded, deterministic=True))
    np.testing.assert_allclose(np.asarray(doc["logits"]), live, rtol=2e-5, atol=2e-5)
    assert doc["pred"] == [int(np.argmax(live))]
    probs = np.asarray(doc["probs"])
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, rtol=1e-5)


def test_predict_npy_batch(server):
    port, _, _ = server
    feats = np.random.default_rng(1).standard_normal((2, 50, DIM)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, feats)
    status, doc = _request(
        port, "POST", "/predict", body=buf.getvalue(),
        ctype="application/octet-stream",
    )
    assert status == 200
    assert np.asarray(doc["logits"]).shape == (2, 3)


def test_predict_bad_input_is_400(server):
    port, _, _ = server
    status, doc = _request(port, "POST", "/predict", body=b"not json")
    assert status == 400 and "error" in doc
    status, doc = _request(
        port, "POST", "/predict", body=json.dumps({"features": [1.0, 2.0]})
    )
    assert status == 400 and "error" in doc


def test_unknown_path_404(server):
    port, _, _ = server
    status, _ = _request(port, "GET", "/nope")
    assert status == 404


def test_concurrent_predicts_are_consistent(server):
    """8 parallel clients, distinct bags: the device lock must serialize
    execution without mixing up responses between threads."""
    from concurrent.futures import ThreadPoolExecutor

    port, model, variables = server
    rng = np.random.default_rng(3)
    bags = [rng.standard_normal((40 + i, DIM)).astype(np.float32) for i in range(8)]

    def call(feats):
        buf = io.BytesIO()
        np.save(buf, feats)
        return _request(port, "POST", "/predict", body=buf.getvalue(),
                        ctype="application/octet-stream")

    with ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(call, bags))

    fwd = jax.jit(lambda v, x: model.apply(v, x))
    for feats, (status, doc) in zip(bags, results):
        assert status == 200
        padded = np.concatenate(
            [feats, np.zeros((64 - feats.shape[0], DIM), np.float32)]
        )  # bucket-64 zero-pad, same policy as the bundle
        want = np.asarray(fwd(variables, padded[None]))[0]
        np.testing.assert_allclose(np.asarray(doc["logits"])[0], want, atol=1e-4)


def test_predict_slide_endpoint(tmp_path):
    """Slide bundle over HTTP: raw u8 tiles in, slide probabilities out."""
    import jax.numpy as jnp

    from transmil_deepgraft_tpu.cli.serve import make_server, warmup
    from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet
    from transmil_deepgraft_tpu.serving import ServingBundle, export_slide_bundle

    backbone = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
    bv = jax.device_get(backbone.init({"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 3))))
    head = create_model("AttMIL", n_classes=2, in_features=2048, out_features=16)
    hv = head.init({"params": jax.random.key(1)}, jnp.zeros((1, 8, 2048)))
    path = tmp_path / "slide.tdx"
    export_slide_bundle(bv, head, hv, path, model_name="AttMIL", in_features=2048,
                        chunk=4, tile_hw=64, head_buckets=(8,), platforms=("cpu",))
    bundle = ServingBundle.load(path)
    warmup(bundle)  # must warm the embed exports too, not just head buckets

    srv = make_server(bundle, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        tiles = np.random.default_rng(0).integers(0, 256, (6, 64, 64, 3), np.uint8)
        buf = io.BytesIO()
        np.save(buf, tiles)
        status, doc = _request(port, "POST", "/predict_slide", body=buf.getvalue(),
                               ctype="application/octet-stream")
        assert status == 200
        want = bundle.predict_slide(tiles)
        np.testing.assert_allclose(np.asarray(doc["probs"]), want, atol=1e-5)
        assert doc["pred"] == int(np.argmax(want))
        # attention-enabled bundles additionally return top-k tiles, matching
        # the in-process attention scores
        _, scores = bundle.predict_slide_with_attention(tiles)
        assert doc["topk_tiles"] == np.argsort(scores)[::-1][:6].tolist()
        np.testing.assert_allclose(
            doc["topk_scores"], np.sort(scores)[::-1][:6], atol=1e-6
        )
        # feature-bag /predict still works on the same (slide) bundle
        feats = np.asarray(bundle.embed_tiles(tiles))
        status, doc = _request(port, "POST", "/predict",
                               body=json.dumps({"features": feats.tolist()}))
        assert status == 200
        # /predict_slide on garbage input is a 400, not a crash
        status, doc = _request(port, "POST", "/predict_slide",
                               body=json.dumps({"tiles": [1.0]}))
        assert status == 400 and "error" in doc
    finally:
        srv.shutdown()
        srv.server_close()


def test_metrics_endpoint(server):
    """GET /metrics: Prometheus text format with request counters and a
    latency histogram that actually counts the requests made."""
    port, _, _ = server
    feats = np.random.default_rng(7).standard_normal((30, DIM)).astype(np.float32)
    _request(port, "POST", "/predict", body=json.dumps({"features": feats.tolist()}))
    _request(port, "POST", "/predict", body=b"garbage")  # a 400

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/metrics")
    r = conn.getresponse()
    text = r.read().decode()
    conn.close()
    assert r.status == 200 and r.headers["Content-Type"].startswith("text/plain")
    ok = err = 0
    for line in text.splitlines():
        if line.startswith('transmil_requests_total{endpoint="/predict",status="200"}'):
            ok = int(line.rsplit(" ", 1)[1])
        if line.startswith('transmil_requests_total{endpoint="/predict",status="400"}'):
            err = int(line.rsplit(" ", 1)[1])
    assert ok >= 1 and err >= 1
    # histogram invariants: +Inf cumulative count == total count
    inf = [l for l in text.splitlines()
           if l.startswith('transmil_request_seconds_bucket{endpoint="/predict",le="+Inf"}')]
    cnt = [l for l in text.splitlines()
           if l.startswith('transmil_request_seconds_count{endpoint="/predict"}')]
    assert inf and cnt and inf[0].rsplit(" ", 1)[1] == cnt[0].rsplit(" ", 1)[1]
    assert "transmil_uptime_seconds" in text


def test_malformed_content_length_is_400_and_counted(server):
    """A bad Content-Length must produce a 400 (not kill the handler thread)
    and appear in /metrics."""
    import socket

    port, _, _ = server
    with socket.create_connection(("127.0.0.1", port), timeout=30) as s:
        s.sendall(b"POST /predict HTTP/1.1\r\nHost: t\r\n"
                  b"Content-Length: abc\r\nConnection: close\r\n\r\n")
        resp = b""
        while True:
            chunk = s.recv(4096)
            if not chunk:
                break
            resp += chunk
    assert b" 400 " in resp.split(b"\r\n", 1)[0]
    status, _ = _request(port, "GET", "/health")
    assert status == 200  # server alive
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/metrics")
    text = conn.getresponse().read().decode()
    conn.close()
    assert 'transmil_requests_total{endpoint="/predict",status="400"}' in text


def test_microbatcher_coalesces_same_bucket_requests(tmp_path):
    """Bundle exported with batch=4 + 8 concurrent single-bag clients of the
    same bucket: the MicroBatcher must (a) return every client its own
    correct logits, (b) run FEWER device dispatches than clients (coalescing
    is real, not FIFO-with-extra-steps), and (c) keep working for mixed
    buckets without cross-contamination."""
    from concurrent.futures import ThreadPoolExecutor

    from transmil_deepgraft_tpu.serving import MicroBatcher

    model = create_model("AttMIL", n_classes=3, in_features=DIM)
    x = np.zeros((4, 64, DIM), np.float32)
    variables = jax.device_get(model.init({"params": jax.random.key(0)}, x))
    path = tmp_path / "head_b4.tdx"
    export_serving_bundle(
        model, variables, path, model_name="AttMIL", in_features=DIM,
        buckets=(64, 128), platforms=("cpu",), batch=4,
    )
    bundle = ServingBundle.load(path)

    calls = []
    orig = bundle._call_for

    def counting(key):
        fn = orig(key)

        def wrapped(*a):
            calls.append(key)
            return fn(*a)

        return wrapped

    bundle._call_for = counting
    mb = MicroBatcher(bundle, max_wait_ms=25.0)
    try:
        rng = np.random.default_rng(7)
        bags = [rng.standard_normal((30 + i, DIM)).astype(np.float32) for i in range(8)]
        # warm the bucket (compile outside the timed/counted window)
        mb.predict_logits(bags[0])
        calls.clear()

        with ThreadPoolExecutor(max_workers=8) as ex:
            results = list(ex.map(mb.predict_logits, bags))

        fwd = jax.jit(lambda v, x: model.apply(v, x))
        for feats, got in zip(bags, results):
            padded = np.concatenate(
                [feats, np.zeros((64 - feats.shape[0], DIM), np.float32)]
            )
            want = np.asarray(fwd(variables, padded[None]))[0]
            np.testing.assert_allclose(got[0], want, atol=1e-4)
        assert len(calls) < 8, calls  # coalesced: < one dispatch per client

        # mixed padded lengths stay separated (AttMIL exports symbolically,
        # so a 100-tile bag pads to 100, not to a bucket) — no contamination
        calls.clear()
        big = rng.standard_normal((100, DIM)).astype(np.float32)
        with ThreadPoolExecutor(max_workers=4) as ex:
            fut_small = ex.submit(mb.predict_logits, bags[0])
            fut_big = ex.submit(mb.predict_logits, big)
            small_l, big_l = fut_small.result(), fut_big.result()
        target = bundle._pad_target(100)
        pb = np.concatenate([big, np.zeros((target - 100, DIM), np.float32)])
        np.testing.assert_allclose(
            big_l[0], np.asarray(fwd(variables, pb[None]))[0], atol=1e-4
        )
        assert small_l.shape == (1, 3) and np.isfinite(small_l).all()
    finally:
        mb.close()


def test_microbatcher_close_fails_pending_futures(tmp_path):
    """close() must not strand callers: a request deferred to `pending` (its
    bucket differs from the in-flight coalesce group) when _CLOSE arrives gets
    a RuntimeError instead of a Future that never resolves."""
    import time
    from concurrent.futures import ThreadPoolExecutor

    from transmil_deepgraft_tpu.serving import MicroBatcher

    model = create_model("AttMIL", n_classes=3, in_features=DIM)
    x = np.zeros((4, 64, DIM), np.float32)
    variables = jax.device_get(model.init({"params": jax.random.key(0)}, x))
    path = tmp_path / "head_close.tdx"
    export_serving_bundle(
        model, variables, path, model_name="AttMIL", in_features=DIM,
        buckets=(64, 128), platforms=("cpu",), batch=4,
    )
    bundle = ServingBundle.load(path)
    mb = MicroBatcher(bundle, max_wait_ms=1500.0)
    rng = np.random.default_rng(3)
    small = rng.standard_normal((30, DIM)).astype(np.float32)
    big = rng.standard_normal((100, DIM)).astype(np.float32)
    mb.predict_logits(small)  # warm/compile outside the timed window

    with ThreadPoolExecutor(max_workers=2) as ex:
        fut_a = ex.submit(mb.predict_logits, small)  # enters the coalesce wait
        time.sleep(0.25)
        fut_b = ex.submit(mb.predict_logits, big)  # different pad target -> pending
        time.sleep(0.25)
        mb.close()  # dispatcher: dispatch A's group, FAIL B
        out_a = fut_a.result(timeout=30)
        assert out_a.shape == (1, 3) and np.isfinite(out_a).all()
        with pytest.raises(RuntimeError, match="closed before dispatch"):
            fut_b.result(timeout=30)


def test_microbatcher_queue_bound_sheds(tmp_path):
    """Overload back-pressure (VERDICT r4 item 5): with the dispatcher blocked
    (device lock held), admissions beyond max_queue raise QueueFullError
    immediately instead of growing the queue; once the device frees, the
    admitted requests complete, depth returns to 0, and new requests are
    accepted again — bounded latency + clean recovery."""
    from transmil_deepgraft_tpu.serving import MicroBatcher, QueueFullError

    model = create_model("AttMIL", n_classes=3, in_features=DIM)
    x = np.zeros((1, 64, DIM), np.float32)
    variables = jax.device_get(model.init({"params": jax.random.key(0)}, x))
    path = tmp_path / "head_shed.tdx"
    export_serving_bundle(
        model, variables, path, model_name="AttMIL", in_features=DIM,
        buckets=(64,), platforms=("cpu",),
    )
    bundle = ServingBundle.load(path)

    device_lock = threading.Lock()
    mb = MicroBatcher(bundle, max_wait_ms=1.0, device_lock=device_lock,
                      max_queue=2)
    rng = np.random.default_rng(11)
    bag = rng.standard_normal((30, DIM)).astype(np.float32)
    try:
        mb.predict_logits(bag)  # warm/compile before blocking the device
        assert mb.queue_depth == 0

        device_lock.acquire()  # simulate a slow chip: dispatcher blocks
        try:
            f1 = mb._enqueue(bag, None)
            f2 = mb._enqueue(bag, None)
            import time as _t
            deadline = _t.monotonic() + 5
            while mb.queue_depth < 2 and _t.monotonic() < deadline:
                _t.sleep(0.01)
            assert mb.queue_depth == 2
            with pytest.raises(QueueFullError) as ei:
                mb._enqueue(bag, None)
            assert ei.value.retry_after_s > 0
            assert ei.value.max_queue == 2
        finally:
            device_lock.release()
        # the two admitted requests complete with correct shapes
        for f in (f1, f2):
            out = f.result(timeout=30)
            assert out.shape == (3,) and np.isfinite(out).all()
        # slots released: depth drains to 0 and admission works again
        import time as _t
        deadline = _t.monotonic() + 5
        while mb.queue_depth and _t.monotonic() < deadline:
            _t.sleep(0.01)
        assert mb.queue_depth == 0
        out = mb.predict_logits(bag)
        assert out.shape == (1, 3)
    finally:
        mb.close()


def test_server_sheds_503_with_retry_after(tmp_path):
    """HTTP-level overload: with max_queue=1 and a slowed device call,
    concurrent /predict clients get a mix of 200s and 503s (with Retry-After
    + queue_depth), /health reports the live depth fields, and the server
    recovers to all-200 after the burst."""
    from concurrent.futures import ThreadPoolExecutor

    from transmil_deepgraft_tpu.cli.serve import make_server

    model = create_model("AttMIL", n_classes=3, in_features=DIM)
    x = np.zeros((1, 64, DIM), np.float32)
    variables = jax.device_get(model.init({"params": jax.random.key(0)}, x))
    path = tmp_path / "head_shed_http.tdx"
    export_serving_bundle(
        model, variables, path, model_name="AttMIL", in_features=DIM,
        buckets=(64,), platforms=("cpu",),
    )
    bundle = ServingBundle.load(path)
    bundle.predict_logits(np.zeros((30, DIM), np.float32))  # pre-compile

    orig = bundle._call_for

    def slow(key):
        fn = orig(key)

        def wrapped(*a):
            import time as _t
            _t.sleep(0.25)
            return fn(*a)

        return wrapped

    bundle._call_for = slow
    srv = make_server(bundle, "127.0.0.1", 0, max_queue=1)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    port = srv.server_address[1]
    try:
        body = json.dumps(
            {"features": np.zeros((30, DIM), np.float32).tolist()}
        )

        def call(_):
            status, doc, headers = _request_with_headers(port, "POST", "/predict", body)
            return status, doc, headers

        with ThreadPoolExecutor(max_workers=6) as ex:
            results = list(ex.map(call, range(6)))
        statuses = [s for s, _, _ in results]
        assert 200 in statuses, statuses  # admitted work completes
        assert 503 in statuses, statuses  # overload sheds, not queues
        for s, doc, headers in results:
            if s == 503:
                assert "Retry-After" in headers and int(headers["Retry-After"]) >= 1
                assert doc["queue_depth"] >= 1
                assert "retry_after_s" in doc

        # /health exposes the depth fields (VERDICT item 5)
        status, doc = _request(port, "GET", "/health")
        assert status == 200
        assert doc["max_queue"] == 1 and "queue_depth" in doc

        # after the burst drains the server accepts again
        status, doc = _request(port, "POST", "/predict", body)
        assert status == 200 and len(doc["logits"]) == 1
    finally:
        srv.shutdown()
        srv.server_close()


def _request_with_headers(port, method, path, body=None, ctype="application/json"):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    headers = {"Content-Type": ctype} if body is not None else {}
    conn.request(method, path, body=body, headers=headers)
    r = conn.getresponse()
    out = json.loads(r.read())
    hdrs = dict(r.getheaders())
    conn.close()
    return r.status, out, hdrs

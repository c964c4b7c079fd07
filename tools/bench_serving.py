"""Serving-path latency: .tdx bundle predict + HTTP daemon round-trip.

Measures, per bag-length bucket, the ServingBundle.predict_logits device
latency (chained-call methodology is unnecessary here: serving latency is a
host-observed quantity, so wall-clock around a blocking fetch IS the metric
— min over reps to strip relay jitter) and the HTTP daemon's end-to-end
round-trip (JSON and npy bodies) against a localhost server.

  python tools/bench_serving.py [--model TransMIL] [--buckets 1024,4096,16384]
  python tools/bench_serving.py --clients 1 4 8 --duration 5   # sustained QPS
"""

from __future__ import annotations

import argparse
import http.client
import io
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def time_min(fn, reps: int = 5) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="TransMIL")
    p.add_argument("--in_features", type=int, default=2048)
    p.add_argument("--buckets", default="1024,4096,16384")
    p.add_argument("--slide", action="store_true",
                   help="also bench a full-pipeline slide bundle "
                        "(int8 embed exports; slower to build)")
    p.add_argument("--slide_tiles", type=int, default=1024)
    p.add_argument("--out", default=None, help="write the JSON rows here too")
    p.add_argument("--clients", type=int, nargs="*", default=[1, 4, 8, 16],
                   help="concurrent-client counts for the sustained-QPS mode")
    p.add_argument("--duration", type=float, default=5.0,
                   help="seconds per concurrent-load measurement")
    p.add_argument("--batch", type=int, default=4,
                   help="exported batch for the concurrent-load bundle "
                        "(micro-batching headroom)")
    p.add_argument("--overload_clients", type=int, default=16,
                   help="client count for the overload/shed measurement")
    p.add_argument("--overload_queue", type=int, default=2,
                   help="max_queue for the overload measurement (small, so "
                        "the bound trips and 503 shedding is exercised)")
    args = p.parse_args()
    buckets = tuple(int(b) for b in args.buckets.split(","))

    import jax

    from transmil_deepgraft_tpu.cli.serve import make_server
    from transmil_deepgraft_tpu.models import create_model
    from transmil_deepgraft_tpu.serving import ServingBundle, export_serving_bundle
    from transmil_deepgraft_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    model = create_model(args.model, n_classes=2, in_features=args.in_features)
    x = np.zeros((1, buckets[0], args.in_features), np.float32)
    variables = jax.device_get(model.init({"params": jax.random.key(0)}, x))
    path = "/tmp/bench_serving_head.tdx"
    export_serving_bundle(model, variables, path, model_name=args.model,
                          in_features=args.in_features, buckets=buckets)
    bundle = ServingBundle.load(path)

    rng = np.random.default_rng(0)
    rows = []
    for b in buckets:
        feats = rng.standard_normal((b, args.in_features)).astype(np.float32)
        bundle.predict_logits(feats)  # compile + warm this bucket
        ms = time_min(lambda: bundle.predict_logits(feats)) * 1e3
        rows.append({"path": "bundle.predict", "bucket": b, "ms": round(ms, 2)})
        print(json.dumps(rows[-1]), flush=True)

    srv = make_server(bundle, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    b = buckets[0]
    feats = rng.standard_normal((b, args.in_features)).astype(np.float32)

    def http_req(body, ctype):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/predict", body=body, headers={"Content-Type": ctype})
        r = conn.getresponse()
        assert r.status == 200, r.read()[:200]
        r.read()
        conn.close()

    json_body = json.dumps({"features": feats.tolist()})
    buf = io.BytesIO()
    np.save(buf, feats)
    npy_body = buf.getvalue()
    http_req(npy_body, "application/octet-stream")  # warm
    for name, body, ctype in (
        ("http.predict.npy", npy_body, "application/octet-stream"),
        ("http.predict.json", json_body, "application/json"),
    ):
        ms = time_min(lambda: http_req(body, ctype)) * 1e3
        rows.append({"path": name, "bucket": b, "ms": round(ms, 2),
                     "body_bytes": len(body)})
        print(json.dumps(rows[-1]), flush=True)

    srv.shutdown()
    srv.server_close()

    # --- concurrent-load mode: sustained QPS + p50/p99 under N clients -----
    # (VERDICT r3 item 5: the daemon micro-batches same-bucket bags across
    # clients; this measures whether concurrency holds up, vs head-of-line).
    # Uses its own bundle exported with batch=--batch so the MicroBatcher has
    # room to coalesce; single-bag clients ride shared device dispatches.
    bpath = "/tmp/bench_serving_head_batched.tdx"
    export_serving_bundle(model, variables, bpath, model_name=args.model,
                          in_features=args.in_features, buckets=buckets,
                          batch=args.batch)
    srv = make_server(ServingBundle.load(bpath), "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    http_req(npy_body, "application/octet-stream")  # warm the batched program
    for clients in args.clients:
        lat: list[float] = []
        lat_lock = threading.Lock()
        stop_at = time.perf_counter() + args.duration

        def client_loop():
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
            while time.perf_counter() < stop_at:
                t0 = time.perf_counter()
                conn.request("POST", "/predict", body=npy_body,
                             headers={"Content-Type": "application/octet-stream"})
                r = conn.getresponse()
                assert r.status == 200, r.read()[:200]
                r.read()
                dt = time.perf_counter() - t0
                with lat_lock:
                    lat.append(dt)
            conn.close()

        threads = [threading.Thread(target=client_loop) for _ in range(clients)]
        t_start = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t_start
        lat.sort()
        rows.append({
            "path": "http.predict.concurrent", "bucket": b, "clients": clients,
            "qps": round(len(lat) / wall, 1),
            "p50_ms": round(lat[len(lat) // 2] * 1e3, 2),
            "p95_ms": round(lat[int(len(lat) * 0.95)] * 1e3, 2),
            "p99_ms": round(lat[int(len(lat) * 0.99)] * 1e3, 2),
            "requests": len(lat),
        })
        print(json.dumps(rows[-1]), flush=True)
    srv.shutdown()
    srv.server_close()

    # --- overload mode: clients >> queue bound; the server must SHED (503 +
    # Retry-After), keep admitted-request latency bounded, and recover -------
    # (VERDICT r4 item 5: the friendly regime above never exercises the bound.)
    srv = make_server(ServingBundle.load(bpath), "127.0.0.1", 0,
                      max_queue=args.overload_queue)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    http_req(npy_body, "application/octet-stream")  # warm
    ok_lat: list[float] = []
    shed = [0]
    lat_lock = threading.Lock()
    stop_at = time.perf_counter() + args.duration

    def overload_loop():
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        while time.perf_counter() < stop_at:
            t0 = time.perf_counter()
            conn.request("POST", "/predict", body=npy_body,
                         headers={"Content-Type": "application/octet-stream"})
            r = conn.getresponse()
            body = r.read()
            dt = time.perf_counter() - t0
            with lat_lock:
                if r.status == 200:
                    ok_lat.append(dt)
                else:
                    assert r.status == 503, (r.status, body[:200])
                    shed[0] += 1
        conn.close()

    clients = args.overload_clients
    threads = [threading.Thread(target=overload_loop) for _ in range(clients)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    ok_lat.sort()
    rows.append({
        "path": "http.predict.overload", "bucket": b, "clients": clients,
        "max_queue": args.overload_queue,
        "qps_ok": round(len(ok_lat) / wall, 1),
        "shed": shed[0],
        "shed_rate": round(shed[0] / max(1, shed[0] + len(ok_lat)), 3),
        "ok_p50_ms": round(ok_lat[len(ok_lat) // 2] * 1e3, 2) if ok_lat else None,
        "ok_p99_ms": round(ok_lat[int(len(ok_lat) * 0.99)] * 1e3, 2) if ok_lat else None,
    })
    print(json.dumps(rows[-1]), flush=True)
    # recovery: after the burst, a plain request succeeds again
    http_req(npy_body, "application/octet-stream")
    srv.shutdown()
    srv.server_close()

    if args.slide:
        # full-pipeline slide bundle: raw u8 tiles -> slide probs from the
        # artifact (int8 embed exports + bucketed head)
        import jax.numpy as jnp

        from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet
        from transmil_deepgraft_tpu.serving import export_slide_bundle

        backbone = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
        bv = jax.device_get(
            backbone.init({"params": jax.random.key(0)}, jnp.zeros((1, 224, 224, 3)))
        )
        calib = rng.standard_normal((8, 224, 224, 3)).astype(np.float32)
        spath = "/tmp/bench_serving_slide.tdx"
        export_slide_bundle(
            bv, model, variables, spath, model_name=args.model,
            in_features=args.in_features, calib_tiles=calib, chunk=128,
            head_buckets=buckets,
        )
        sb = ServingBundle.load(spath)
        n = args.slide_tiles
        tiles_u8 = rng.integers(0, 256, (n, 224, 224, 3), np.uint8)
        sb.predict_slide(tiles_u8)  # compile embed + head bucket
        ms = time_min(lambda: sb.predict_slide(tiles_u8), reps=3) * 1e3
        rows.append({"path": "slide_bundle.predict_slide_u8", "tiles": n,
                     "ms": round(ms, 2)})
        print(json.dumps(rows[-1]), flush=True)

    if args.out:
        Path(args.out).write_text("\n".join(json.dumps(r) for r in rows))


if __name__ == "__main__":
    main()

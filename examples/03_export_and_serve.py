"""Export a trained head as an AOT serving bundle and serve it over HTTP.

``export_serving_bundle`` writes a ``.tdx`` artifact — StableHLO programs +
weights — that serves WITHOUT any model code (``jax.export`` AOT). The daemon
(`transmil-serve` in production) exposes ``/health``, ``/meta``, ``/predict``,
``/predict_slide`` and Prometheus ``/metrics``.

Run: ``python examples/03_export_and_serve.py [--out /tmp/model.tdx]``
"""

from __future__ import annotations

import argparse
import json
import urllib.request


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="logs/example_serve/transmil.tdx")
    p.add_argument("--in_features", type=int, default=64)
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from transmil_deepgraft_tpu.cli.serve import make_server
    from transmil_deepgraft_tpu.models import create_model
    from transmil_deepgraft_tpu.serving import ServingBundle, export_serving_bundle

    # 1. A trained head — here fresh-initialized; in production load its
    #    checkpoint with utils.checkpoints.load_pytree (or convert a torch
    #    .pth via utils.torch_weights — see MIGRATION.md).
    model = create_model("TransMIL", n_classes=2, in_features=args.in_features, out_features=64)
    bag = np.random.default_rng(0).standard_normal((1, 96, args.in_features), dtype=np.float32)
    variables = model.init({"params": jax.random.key(0)}, bag)

    # 2. Export: one .tdx file, loadable with zero model code.
    from pathlib import Path

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    meta = export_serving_bundle(
        model, variables, args.out, model_name="TransMIL",
        in_features=args.in_features, buckets=(128, 512),
    )

    # 3. Serve it and round-trip one request.
    bundle = ServingBundle.load(args.out)
    srv = make_server(bundle, "127.0.0.1", 0)  # port 0 = ephemeral
    import threading

    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    port = srv.server_address[1]
    try:
        body = json.dumps({"features": bag[0].tolist()}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            doc = json.loads(resp.read())
    finally:
        srv.shutdown()
        srv.server_close()  # shutdown() stops the loop; this releases the socket
        thread.join()

    out = {"bundle": args.out, "mode": meta["mode"], "buckets": meta["buckets"],
           "probs": doc["probs"]}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

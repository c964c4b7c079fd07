"""ONE flow across every subsystem: raw tiles -> offline feature extraction
-> feature-bag training via the CLI -> AOT bundle export from the trained
checkpoint -> HTTP serving -> predictions consistent with the trained model.

Each link has its own tests; this chains them the way a user actually moves
from a tile dump to a serving endpoint (the reference's whole workflow:
feature_extractor.py -> train.py -> test_visualize.py serving)."""

import http.client
import io
import json
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _make_cohort(tmp_path, n_slides=6, n_tiles=6, size=64):
    from PIL import Image

    rng = np.random.default_rng(0)
    blocks = tmp_path / "BLOCKS"
    entries = []
    for s in range(n_slides):
        d = blocks / f"slide{s}"
        d.mkdir(parents=True)
        for t in range(n_tiles):
            arr = rng.integers(0, 255, (size, size, 3)).astype(np.uint8)
            if s % 2:  # class signal in brightness so training can learn
                arr = np.clip(arr.astype(int) + 60, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"tile_({t}-{s}).jpg")
        entries.append([f"slide{s}", s % 2])
    (tmp_path / "tile_labels.json").write_text(
        json.dumps({"train": entries, "test": entries})
    )
    return blocks


def test_tiles_to_serving_endpoint(tmp_path):
    # 1. offline feature extraction over the tile cohort
    from transmil_deepgraft_tpu.data.feature_extractor import extract_cohort
    from transmil_deepgraft_tpu.data.jpg_bags import JPGMILDataset
    from transmil_deepgraft_tpu.models.backbones import SimpleCNN

    root = tmp_path
    _make_cohort(root)
    ds = JPGMILDataset(root, root / "tile_labels.json", "train", 2, tile_size=64)
    backbone = SimpleCNN(out_features=32)
    bv = backbone.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    feats_dir = root / "FEATURES_TEST_32"
    out = extract_cohort(backbone, bv, ds, feats_dir, batch_size=4)
    assert len(out) == 6

    # 2. CLI training on the extracted feature bags
    from transmil_deepgraft_tpu.cli.train import main as train_main

    entries = [[f"slide{s}.h5", s % 2] for s in range(6)]
    (root / "feat_labels.json").write_text(
        json.dumps({"train": entries, "val": entries, "test": entries})
    )
    cfg = f"""
General:
    seed: 1
    epochs: 40
    patience: 50
    log_path: {root}/logs
Data:
    data_dir: {feats_dir}
    label_file: {root}/feat_labels.json
    bag_size: 6
    train_dataloader:
        batch_size: 2
Model:
    name: AttMIL
    n_classes: 2
    in_features: 32
    out_features: 16
Optimizer:
    opt: adam
    lr: 0.01
Loss:
    base_loss: CrossEntropyLoss
"""
    cfg_path = root / "AttMIL_test_norm_rest.yaml"
    cfg_path.write_text(cfg)
    log_dir = root / "run"
    summary = train_main(["--stage", "train", "--config", str(cfg_path),
                          "--log_dir", str(log_dir)])
    assert "test_patient_auroc" in summary
    ckpt = log_dir / "checkpoints" / "last.ckpt"
    assert ckpt.exists()

    # 3. bundle export from the trained checkpoint (CLI)
    from transmil_deepgraft_tpu.cli.export_model import main as export_main

    bundle_path = root / "attmil.tdx"
    export_main(["--model", "AttMIL", "--ckpt", str(ckpt), "--out", str(bundle_path),
                 "--n_classes", "2", "--in_features", "32", "--out_features", "16",
                 "--buckets", "8", "--platforms", "cpu"])

    # 4. serve it and predict the extracted bags over HTTP
    from transmil_deepgraft_tpu.cli.serve import make_server
    from transmil_deepgraft_tpu.serving import ServingBundle

    import h5py

    bundle = ServingBundle.load(bundle_path)
    srv = make_server(bundle, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        port = srv.server_address[1]
        preds = []
        for s in range(6):
            with h5py.File(feats_dir / f"slide{s}.h5", "r") as f:
                feats = np.asarray(f["features"][:], np.float32)
            buf = io.BytesIO()
            np.save(buf, feats)
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            conn.request("POST", "/predict", body=buf.getvalue(),
                         headers={"Content-Type": "application/octet-stream"})
            r = conn.getresponse()
            doc = json.loads(r.read())
            conn.close()
            assert r.status == 200
            preds.append(doc["pred"][0])
            # the served bundle must agree with the in-process bundle
            np.testing.assert_allclose(
                doc["logits"], bundle.predict_logits(feats), atol=1e-5
            )
        # the chain learned the brightness signal end-to-end
        assert preds == [s % 2 for s in range(6)], preds
    finally:
        srv.shutdown()
        srv.server_close()

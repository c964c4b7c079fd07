"""AOT serving bundles (serving.py + cli/export_model.py).

The bundle must reproduce the live model's deterministic eval logits exactly
(same program, same weights), pick the right shape strategy per head, survive
a zip round-trip, and refuse malformed inputs with actionable errors.
"""

import json
import zipfile

import jax
import numpy as np
import pytest

from transmil_deepgraft_tpu.models import create_model
from transmil_deepgraft_tpu.serving import ServingBundle, export_serving_bundle

DIM = 64


def _make(name, **kw):
    model = create_model(name, n_classes=3, in_features=DIM, **kw)
    x = np.zeros((1, 256, DIM), np.float32)
    variables = model.init({"params": jax.random.key(0)}, x)
    return model, jax.device_get(variables)


def _live_logits(model, variables, feats):
    out = model.apply(variables, feats, deterministic=True)
    return np.asarray(out[1] if isinstance(out, tuple) else out)


@pytest.mark.parametrize("name", ["TransMIL", "AttMIL"])
def test_bundle_matches_live_model(tmp_path, name):
    model, variables = _make(name)
    path = tmp_path / "head.tdx"
    meta = export_serving_bundle(
        model, variables, path, model_name=name, in_features=DIM,
        buckets=(256, 512), platforms=("cpu",),
    )
    # AttMIL's forward is length-polymorphic -> one symbolic program;
    # TransMIL's PPEG square grid needs concrete shapes -> bucketed.
    assert meta["mode"] == ("symbolic" if name == "AttMIL" else "bucketed")

    bundle = ServingBundle.load(path)
    rng = np.random.default_rng(7)
    for n in (200, 256, 400):
        feats = rng.standard_normal((1, n, DIM)).astype(np.float32)
        got = bundle.predict_logits(feats)
        # live model on the identically padded bag (bucket policy zero-pads)
        target = max(n, 256) if meta["mode"] == "symbolic" else (256 if n <= 256 else 512)
        padded = np.concatenate(
            [feats, np.zeros((1, target - n, DIM), np.float32)], axis=1
        )
        want = _live_logits(model, variables, padded)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)

    probs = bundle.predict(feats[0])  # 2-D input: single bag
    assert probs.shape == (1, 3)
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-6)


def test_bundle_dtfd_slide_logits(tmp_path):
    model, variables = _make("DTFDMIL")
    path = tmp_path / "dtfd.tdx"
    meta = export_serving_bundle(
        model, variables, path, model_name="DTFDMIL", in_features=DIM,
        buckets=(256,), platforms=("cpu",),
    )
    assert meta["mode"] == "bucketed"  # pseudo-bag split needs concrete n
    bundle = ServingBundle.load(path)
    feats = np.random.default_rng(3).standard_normal((1, 256, DIM)).astype(np.float32)
    np.testing.assert_allclose(
        bundle.predict_logits(feats), _live_logits(model, variables, feats),
        rtol=0, atol=1e-5,
    )


def test_bundle_errors(tmp_path):
    model, variables = _make("AttMIL")
    path = tmp_path / "head.tdx"
    export_serving_bundle(model, variables, path, model_name="AttMIL",
                          in_features=DIM, buckets=(256,), platforms=("cpu",),
                          symbolic=False)
    bundle = ServingBundle.load(path)
    with pytest.raises(ValueError, match="in_features"):
        bundle.predict_logits(np.zeros((1, 10, DIM + 1), np.float32))
    with pytest.raises(ValueError, match="largest exported bucket"):
        bundle.predict_logits(np.zeros((1, 300, DIM), np.float32))
    with pytest.raises(ValueError, match="batch"):
        bundle.predict_logits(np.zeros((2, 10, DIM), np.float32))

    # future-format bundles are refused, not mis-read
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        blobs = {n: z.read(n) for n in z.namelist()}
    meta["format_version"] = 99
    newer = tmp_path / "newer.tdx"
    with zipfile.ZipFile(newer, "w") as z:
        for n, b in blobs.items():
            z.writestr(n, json.dumps(meta) if n == "meta.json" else b)
    with pytest.raises(ValueError, match="newer"):
        ServingBundle.load(newer)


def test_export_cli_roundtrip(tmp_path):
    """CLI path: trainer-style msgpack ckpt -> bundle -> serve."""
    from flax import serialization

    from transmil_deepgraft_tpu.cli.export_model import main as export_main

    model, variables = _make("TransMIL")
    ckpt = tmp_path / "epoch=0.ckpt"
    ckpt.write_bytes(serialization.msgpack_serialize(
        {"params": jax.device_get(variables["params"]), "model_state": {},
         "epoch": 0, "metrics": {}, "hparams": {}}
    ))
    out = tmp_path / "cli.tdx"
    meta = export_main([
        "--model", "TransMIL", "--ckpt", str(ckpt), "--out", str(out),
        "--n_classes", "3", "--in_features", str(DIM),
        "--buckets", "256", "--platforms", "cpu", "--symbolic", "never",
    ])
    assert meta["mode"] == "bucketed" and out.exists()
    bundle = ServingBundle.load(out)
    feats = np.random.default_rng(5).standard_normal((1, 256, DIM)).astype(np.float32)
    np.testing.assert_allclose(
        bundle.predict_logits(feats), _live_logits(model, variables, feats),
        rtol=0, atol=1e-5,
    )

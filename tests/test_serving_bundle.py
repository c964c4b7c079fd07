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


# --------------------------------------------------------------- slide bundles
def test_slide_bundle_matches_pipeline(tmp_path):
    """export_slide_bundle: raw tiles -> probs from the artifact alone, matching
    the live SlideInferencePipeline (int8 backbone) on f32 AND u8 tiles."""
    import jax.numpy as jnp

    from transmil_deepgraft_tpu.inference import SlideInferencePipeline
    from transmil_deepgraft_tpu.models import TransMIL
    from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet
    from transmil_deepgraft_tpu.serving import ServingBundle, export_slide_bundle

    rng = np.random.default_rng(0)
    backbone = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
    bv = jax.device_get(backbone.init({"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 3))))
    head = TransMIL(n_classes=2, in_features=2048, out_features=32)
    hv = head.init({"params": jax.random.key(1)}, jnp.zeros((1, 8, 2048)))
    calib = rng.standard_normal((4, 64, 64, 3)).astype(np.float32)

    path = tmp_path / "slide.tdx"
    export_slide_bundle(
        bv, head, hv, path, model_name="TransMIL", in_features=2048,
        calib_tiles=calib, chunk=4, tile_hw=64, head_buckets=(16, 32),
        platforms=("cpu",),
    )
    bundle = ServingBundle.load(path)
    assert bundle.meta["kind"] == "slide" and bundle.meta["backbone"] == "int8"

    tiles = rng.standard_normal((10, 64, 64, 3)).astype(np.float32)
    live = SlideInferencePipeline(bv, head, hv, calib_tiles=calib, chunk=4)
    # identical embed (same int8 program modulo export round-trip)
    np.testing.assert_allclose(
        np.asarray(bundle.embed_tiles(tiles)), live.embed(tiles), atol=1e-5
    )
    probs = bundle.predict_slide(tiles)
    assert probs.shape == (2,)
    np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-5)
    # head sees a 16-bucket zero-padded bag in both paths
    feats = live.embed(tiles)
    padded = np.concatenate([feats, np.zeros((6, 2048), np.float32)])
    want = np.asarray(
        jax.jit(lambda v, f: head.apply(v, f, deterministic=True))(hv, padded[None])
    )[0]
    np.testing.assert_allclose(bundle.predict_slide_logits(tiles), want, atol=1e-4)

    # u8 raw-tile path: on-device normalization matches host normalization
    raw = rng.integers(0, 256, (6, 64, 64, 3), np.uint8)
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    norm = (raw.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(
        np.asarray(bundle.embed_tiles(raw)),
        np.asarray(bundle.embed_tiles(norm)), atol=1e-4,
    )
    # wider-int raw pixels (e.g. JSON-decoded) route through the u8 path,
    # NOT the f32 export (which expects normalized inputs)
    np.testing.assert_array_equal(
        np.asarray(bundle.embed_tiles(raw.astype(np.int64))),
        np.asarray(bundle.embed_tiles(raw)),
    )
    with pytest.raises(ValueError, match="raw pixels"):
        bundle.embed_tiles(np.full((1, 64, 64, 3), 300, np.int64))
    # oversized bags fail fast (before the embed), naming the bucket cap
    with pytest.raises(ValueError, match="largest exported bucket"):
        bundle.predict_slide_logits(np.zeros((100, 64, 64, 3), np.float32))

    # head-only predict still works on a slide bundle (feature-bag reuse)
    lg = bundle.predict_logits(feats)
    np.testing.assert_allclose(lg[0], want, atol=1e-4)


def test_slide_bundle_bf16_backbone(tmp_path):
    """calib_tiles=None exports the bf16 backbone (flax variable tree leaves)."""
    import jax.numpy as jnp

    from transmil_deepgraft_tpu.models import AttMIL
    from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet
    from transmil_deepgraft_tpu.serving import ServingBundle, export_slide_bundle

    backbone = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
    bv = jax.device_get(backbone.init({"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 3))))
    head = AttMIL(n_classes=3, in_features=2048, out_features=16, attn_dim=8)
    hv = head.init({"params": jax.random.key(1)}, jnp.zeros((1, 8, 2048)))

    path = tmp_path / "slide_bf16.tdx"
    export_slide_bundle(
        bv, head, hv, path, model_name="AttMIL", in_features=2048,
        calib_tiles=None, chunk=4, tile_hw=64, head_buckets=(8,),
        platforms=("cpu",),
    )
    bundle = ServingBundle.load(path)
    assert bundle.meta["backbone"] == "bf16"
    tiles = np.random.default_rng(1).standard_normal((5, 64, 64, 3)).astype(np.float32)
    probs = bundle.predict_slide(tiles)
    assert probs.shape == (3,)
    np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-4)


def test_slide_bundle_rejects_feature_mismatch(tmp_path):
    from transmil_deepgraft_tpu.models import AttMIL
    from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet
    from transmil_deepgraft_tpu.serving import export_slide_bundle
    import jax.numpy as jnp

    backbone = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
    bv = jax.device_get(backbone.init({"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 3))))
    head = AttMIL(n_classes=2, in_features=512, out_features=16, attn_dim=8)
    hv = head.init({"params": jax.random.key(1)}, jnp.zeros((1, 8, 512)))
    with pytest.raises(ValueError, match="in_features"):
        export_slide_bundle(
            bv, head, hv, tmp_path / "bad.tdx", model_name="AttMIL",
            in_features=512, chunk=4, tile_hw=64, platforms=("cpu",),
        )


def test_cli_export_slide_bundle(tmp_path):
    """CLI path: --backbone_ckpt switches to a full-pipeline slide bundle."""
    import jax.numpy as jnp
    from flax import serialization

    from transmil_deepgraft_tpu.cli.export_model import main as export_main
    from transmil_deepgraft_tpu.models import AttMIL
    from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet

    backbone = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
    bv = jax.device_get(backbone.init({"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 3))))
    bpath = tmp_path / "backbone.msgpack"
    bpath.write_bytes(serialization.msgpack_serialize(bv))

    # default attn_dim: the CLI rebuilds the head from --model/--*features only
    head = AttMIL(n_classes=2, in_features=2048, out_features=16)
    hv = jax.device_get(head.init({"params": jax.random.key(1)}, jnp.zeros((1, 8, 2048))))
    hpath = tmp_path / "head.ckpt"
    hpath.write_bytes(serialization.msgpack_serialize(
        {"params": hv["params"], "model_state": {}, "epoch": 0, "metrics": {}, "hparams": {}}
    ))
    calib = np.random.default_rng(0).standard_normal((4, 64, 64, 3)).astype(np.float32)
    np.save(tmp_path / "calib.npy", calib)

    out = tmp_path / "slide_cli.tdx"
    meta = export_main([
        "--model", "AttMIL", "--ckpt", str(hpath), "--out", str(out),
        "--n_classes", "2", "--in_features", "2048", "--out_features", "16",
        "--backbone_ckpt", str(bpath), "--calib_tiles", str(tmp_path / "calib.npy"),
        "--chunk", "4", "--tile_hw", "64", "--buckets", "8", "--platforms", "cpu",
    ])
    assert meta["kind"] == "slide" and meta["backbone"] == "int8" and out.exists()
    bundle = ServingBundle.load(out)
    tiles = np.random.default_rng(1).standard_normal((5, 64, 64, 3)).astype(np.float32)
    probs = bundle.predict_slide(tiles)
    assert probs.shape == (2,)
    np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-5)


def test_bundle_attention_scores_match_live_model(tmp_path):
    """The exported return_attn forward reproduces the live model's per-tile
    scores (the visualize_mil cls-row semantics) — bucketed (TransMIL) and
    symbolic (AttMIL) modes."""
    # TransMIL: bucketed + TransMILAttention.tile_scores()
    model, variables = _make("TransMIL")
    path = tmp_path / "tm_attn.tdx"
    meta = export_serving_bundle(model, variables, path, model_name="TransMIL",
                                 in_features=DIM, buckets=(256,),
                                 platforms=("cpu",), symbolic=False)
    assert meta["attention"] is True
    bundle = ServingBundle.load(path)
    feats = np.random.default_rng(3).standard_normal((200, DIM)).astype(np.float32)
    logits, scores = bundle.predict_logits_with_attention(feats)
    assert scores.shape == (1, 200)
    padded = np.concatenate([feats, np.zeros((56, DIM), np.float32)])[None]
    live_logits, attn = model.apply(variables, padded, deterministic=True,
                                    return_attn=True)
    want = np.asarray(attn.tile_scores().mean(axis=1))[:, :200]
    np.testing.assert_allclose(scores, want, rtol=0, atol=1e-5)
    np.testing.assert_allclose(logits, np.asarray(live_logits), rtol=0, atol=1e-5)

    # AttMIL: symbolic attention export serves every length with one program
    model, variables = _make("AttMIL")
    path = tmp_path / "am_attn.tdx"
    meta = export_serving_bundle(model, variables, path, model_name="AttMIL",
                                 in_features=DIM, buckets=(256,), platforms=("cpu",))
    assert meta["mode"] == "symbolic" and meta["attention"] is True
    bundle = ServingBundle.load(path)
    for n in (256, 300):
        _, scores = bundle.predict_logits_with_attention(
            np.random.default_rng(n).standard_normal((n, DIM)).astype(np.float32))
        assert scores.shape == (1, n)
        np.testing.assert_allclose(float(scores.sum()), 1.0, atol=1e-4)  # softmaxed


def test_slide_bundle_attention(tmp_path):
    """predict_slide_with_attention from the artifact alone."""
    import jax.numpy as jnp

    from transmil_deepgraft_tpu.models import AttMIL
    from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet
    from transmil_deepgraft_tpu.serving import export_slide_bundle

    backbone = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
    bv = jax.device_get(backbone.init({"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 3))))
    head = AttMIL(n_classes=2, in_features=2048, out_features=16)
    hv = head.init({"params": jax.random.key(1)}, jnp.zeros((1, 8, 2048)))
    path = tmp_path / "slide_attn.tdx"
    meta = export_slide_bundle(bv, head, hv, path, model_name="AttMIL",
                               in_features=2048, chunk=4, tile_hw=64,
                               head_buckets=(8,), platforms=("cpu",))
    assert meta["attention"] is True
    bundle = ServingBundle.load(path)
    tiles = np.random.default_rng(0).standard_normal((6, 64, 64, 3)).astype(np.float32)
    probs, scores = bundle.predict_slide_with_attention(tiles)
    assert probs.shape == (2,) and scores.shape == (6,)
    np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-5)
    np.testing.assert_allclose(probs, bundle.predict_slide(tiles), atol=1e-5)


@pytest.mark.parametrize("name,dim", [
    ("TransMIL", 64), ("AttMIL", 64), ("TransformerMIL", 64), ("Chowder", 64),
    ("CLAM_SB", 64), ("CLAM_MB", 64), ("DTFD", 64), ("MDMIL", 1024),
    ("RoFormerMIL", 64), ("DSMIL", 64),
])
def test_every_feature_head_exports(tmp_path, name, dim):
    """Registry-wide: every feature-bag head ships as a .tdx and serves
    correct-shape logits (the 'switch any reference model to artifact
    serving' claim, checked head by head)."""
    model = create_model(name, n_classes=3, in_features=dim)
    x = np.zeros((1, 256, dim), np.float32)
    variables = jax.device_get(model.init({"params": jax.random.key(0)}, x))
    path = tmp_path / f"{name}.tdx"
    meta = export_serving_bundle(model, variables, path, model_name=name,
                                 in_features=dim, buckets=(256,),
                                 platforms=("cpu",))
    bundle = ServingBundle.load(path)
    feats = np.random.default_rng(1).standard_normal((1, 256, dim)).astype(np.float32)
    logits = bundle.predict_logits(feats)
    assert logits.shape == (1, 3) and np.isfinite(logits).all()
    if meta["attention"]:
        lg, scores = bundle.predict_logits_with_attention(feats)
        assert scores.shape == (1, 256) and np.isfinite(scores).all()
        np.testing.assert_allclose(lg, logits, atol=1e-5)


def test_coord_aware_bundle_roundtrip(tmp_path):
    """RoFormerMIL bundles carry the coords input: predict(feats, coords)
    matches the live model with the same coords, differs from the grid
    fallback, and the daemon accepts a JSON 'coords' field."""
    import json as _json

    rng = np.random.default_rng(0)
    dim, n = 48, 200
    model = create_model("RoFormerMIL", n_classes=2, in_features=dim,
                         out_features=32, depth=1, heads=2, dim_head=16, mlp_dim=32)
    x = np.zeros((1, 256, dim), np.float32)
    variables = jax.device_get(model.init({"params": jax.random.key(0)}, x))
    path = tmp_path / "rope.tdx"
    meta = export_serving_bundle(model, variables, path, model_name="RoFormerMIL",
                                 in_features=dim, buckets=(256,), platforms=("cpu",))
    assert meta["coord_aware"]
    bundle = ServingBundle.load(path)

    feats = rng.standard_normal((1, n, dim)).astype(np.float32)
    coords = rng.integers(0, 30, (1, n, 2)).astype(np.float32)
    got = bundle.predict_logits(feats, coords)
    # live model on the SAME bucket-padded inputs
    padded = np.zeros((1, 256, dim), np.float32); padded[:, :n] = feats
    pc = np.zeros((1, 256, 2), np.float32); pc[:, :n] = coords
    live = np.asarray(model.apply(variables, padded, pc, deterministic=True))
    np.testing.assert_allclose(got, live, rtol=2e-5, atol=2e-5)
    # coords matter: fallback-grid answer differs
    fallback = bundle.predict_logits(feats)
    assert np.abs(fallback - got).max() > 1e-4
    if meta["attention"]:
        lg, scores = bundle.predict_logits_with_attention(feats, coords)
        assert scores.shape == (1, n)
        np.testing.assert_allclose(lg, got, atol=1e-5)

    # daemon: JSON body with coords
    import threading
    import urllib.request

    from transmil_deepgraft_tpu.cli.serve import make_server

    srv = make_server(bundle, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        body = _json.dumps({"features": feats[0].tolist(),
                            "coords": coords[0].tolist()}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.server_address[1]}/predict", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            doc = _json.loads(resp.read())
        np.testing.assert_allclose(np.asarray(doc["logits"]), got, rtol=2e-4, atol=2e-4)
    finally:
        srv.shutdown()
        srv.server_close()
        t.join()

"""RoFormerMIL: 2-D rotary position-aware MIL head (beyond-reference family).

The properties under test are the ones rotary embeddings guarantee by
construction: attention depends on (feature, coordinate) PAIRS — so permuting
tokens together with their coords is a no-op, permuting tokens alone is not —
and only on coordinate DIFFERENCES, so translating every coord is a no-op."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transmil_deepgraft_tpu.models import create_model
from transmil_deepgraft_tpu.models.roformer_mil import RoFormerMIL, default_grid_coords

N, D = 48, 64


def _model(**kw):
    return RoFormerMIL(n_classes=3, in_features=D, out_features=64, depth=2,
                       heads=4, dim_head=16, mlp_dim=64, **kw)


def _data(seed=0, n=N):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((1, n, D), dtype=np.float32))
    coords = jnp.asarray(rng.integers(0, 40, (1, n, 2)), jnp.float32)
    return x, coords


def test_forward_shapes_and_registry():
    x, coords = _data()
    model = create_model("RoFormerMIL", n_classes=3, in_features=D, out_features=64,
                         depth=2, heads=4, dim_head=16, mlp_dim=64)
    v = model.init({"params": jax.random.key(0)}, x, coords)
    assert model.apply(v, x, coords).shape == (1, 3)
    # 2-D bag + no coords (square-grid fallback)
    assert model.apply(v, x[0]).shape == (1, 3)


def test_permuting_tokens_with_coords_is_invariant_alone_is_not():
    x, coords = _data()
    model = _model()
    v = model.init({"params": jax.random.key(0)}, x, coords)
    base = model.apply(v, x, coords)
    perm = np.random.default_rng(1).permutation(N)
    together = model.apply(v, x[:, perm], coords[:, perm])
    np.testing.assert_allclose(np.asarray(together), np.asarray(base), atol=2e-5)
    alone = model.apply(v, x[:, perm], coords)
    assert np.abs(np.asarray(alone) - np.asarray(base)).max() > 1e-3


def test_translation_invariance():
    x, coords = _data()
    model = _model()
    v = model.init({"params": jax.random.key(0)}, x, coords)
    base = model.apply(v, x, coords)
    shifted = model.apply(v, x, coords + jnp.asarray([17.0, -5.0]))
    np.testing.assert_allclose(np.asarray(shifted), np.asarray(base), atol=2e-4)


def test_return_attn_tile_scores():
    x, coords = _data()
    model = _model()
    v = model.init({"params": jax.random.key(0)}, x, coords)
    logits, attn = model.apply(v, x, coords, return_attn=True)
    scores = attn.tile_scores()
    assert scores.shape == (1, 4, N)
    # cls-query softmax row: tile scores + the cls self-score sum to 1
    total = np.asarray(attn.row).sum(-1)
    np.testing.assert_allclose(total, 1.0, atol=1e-5)


def test_default_grid_matches_square_layout():
    g = np.asarray(default_grid_coords(10, 2))
    assert g.shape == (2, 10, 2)
    side = 4  # ceil(sqrt(10))
    assert (g[0, :, 0] == np.arange(10) % side).all()
    assert (g[0, :, 1] == np.arange(10) // side).all()


def test_learns_position_dependent_signal():
    """A task permutation-invariant heads cannot represent: the label is
    carried by WHERE the witness features sit (left vs right half of the
    grid), with identical feature marginals either way."""
    rng = np.random.default_rng(0)
    n, n_slides = 32, 24
    xs, cs, ys = [], [], []
    for i in range(n_slides):
        label = i % 2
        feats = rng.standard_normal((n, D)).astype(np.float32)
        witness = rng.random(n) < 0.4
        feats[witness, ::2] += 1.5
        coords = np.stack([rng.integers(0, 8, n), rng.integers(0, 16, n)], -1).astype(np.float32)
        # witnesses live left (x<8) for class 0, right for class 1
        coords[witness, 0] = rng.integers(0, 8, witness.sum()) + (8.0 if label else 0.0)
        coords[~witness, 0] = rng.integers(0, 16, (~witness).sum())
        xs.append(feats); cs.append(coords); ys.append(label)
    x = jnp.asarray(np.stack(xs)); c = jnp.asarray(np.stack(cs))
    y = jax.nn.one_hot(jnp.asarray(ys), 2)

    import optax

    model = RoFormerMIL(n_classes=2, in_features=D, out_features=32, depth=2,
                        heads=2, dim_head=16, mlp_dim=32, dropout=0.0, emb_dropout=0.0)
    v = model.init({"params": jax.random.key(0)}, x[:1], c[:1])
    tx = optax.adam(3e-4)
    state = tx.init(v["params"])

    @jax.jit
    def step(p, s):
        def loss(p):
            logits = model.apply({"params": p}, x, c)
            return optax.softmax_cross_entropy(logits, y).mean()

        l, g = jax.value_and_grad(loss)(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    p = v["params"]
    first = None
    for i in range(120):
        p, state, l = step(p, state)
        first = first if first is not None else float(l)
    acc = (jnp.argmax(model.apply({"params": p}, x, c), -1) == jnp.asarray(ys)).mean()
    assert float(l) < first * 0.5, (first, float(l))
    assert float(acc) >= 0.9, float(acc)


def test_trainer_integration_coord_aware(tmp_path):
    """RoFormerMIL trains/evaluates through the standard Trainer: coords are
    staged from Batch.padded_coords (grid fallback otherwise), test artifacts
    (CSVs + top-k attention tiles) come out like any attention head."""
    from transmil_deepgraft_tpu.data.datamodule import MILDataModule
    from transmil_deepgraft_tpu.train.losses import create_loss
    from transmil_deepgraft_tpu.train.optimizers import create_optimizer
    from transmil_deepgraft_tpu.train.trainer import Trainer, TrainerConfig

    dm = MILDataModule(
        n_classes=2, max_bag_size=16, batch_size=4,
        synthetic={"n_train": 16, "n_val": 8, "n_test": 8, "bag_size": 16,
                   "feature_size": 32, "signal": 2.0},
        seed=0,
    )
    model = RoFormerMIL(n_classes=2, in_features=32, out_features=32, depth=1,
                        heads=2, dim_head=16, mlp_dim=32)
    tx = create_optimizer(opt="adam", lr=1e-3, weight_decay=0.0)
    cfg = TrainerConfig(epochs=2, log_dir=str(tmp_path), task="norm_rest")
    trainer = Trainer(model, tx, dm, n_classes=2, loss_fn=create_loss(), config=cfg,
                      model_name="RoFormerMIL")
    assert trainer.coord_aware
    history = trainer.fit()
    assert np.isfinite(history["loss"])
    summary = trainer.test()
    assert 0.0 <= summary["test_patient_auc"] <= 1.0
    assert (tmp_path / "TEST_RESULT_SLIDE.csv").exists()
    assert list((tmp_path / "topk_tiles").glob("*.csv"))


def test_trainer_coord_aware_on_feature_files(tmp_path):
    """On-disk HDF5 bags: padded_coords stay row-aligned through the train
    path's subsample/pad/shuffle, and a coord-aware head trains on them."""
    import h5py
    import json

    from transmil_deepgraft_tpu.data.datamodule import MILDataModule
    from transmil_deepgraft_tpu.train.losses import create_loss
    from transmil_deepgraft_tpu.train.optimizers import create_optimizer
    from transmil_deepgraft_tpu.train.trainer import Trainer, TrainerConfig

    rng = np.random.default_rng(0)
    feats_dir = tmp_path / "feats"
    feats_dir.mkdir()
    entries = []
    for s in range(8):
        n = int(rng.integers(10, 20))
        with h5py.File(feats_dir / f"s{s}.h5", "w") as f:
            f["features"] = rng.standard_normal((n, 24)).astype(np.float32)
            f["coords"] = rng.integers(0, 30, (n, 2)).astype(np.int32)
        entries.append([f"s{s}.h5", s % 2])
    (tmp_path / "labels.json").write_text(
        json.dumps({"train": entries, "val": entries, "test": entries})
    )
    dm = MILDataModule(data_dir=str(feats_dir), label_path=str(tmp_path / "labels.json"),
                       n_classes=2, max_bag_size=12, batch_size=2, seed=0)
    batch = next(iter(dm.train_batches(0)))
    assert batch.padded_coords is not None
    assert batch.padded_coords.shape == (2, 12, 2)
    # real (nonzero-feature) rows carry their own coords; alignment survives shuffle
    model = RoFormerMIL(n_classes=2, in_features=24, out_features=16, depth=1,
                        heads=2, dim_head=8, mlp_dim=16)
    tx = create_optimizer(opt="adam", lr=1e-3, weight_decay=0.0)
    cfg = TrainerConfig(epochs=1, log_dir=str(tmp_path / "run"), task="norm_rest")
    t = Trainer(model, tx, dm, n_classes=2, loss_fn=create_loss(), config=cfg,
                model_name="RoFormerMIL")
    h = t.fit()
    assert np.isfinite(h["loss"])


def test_cli_fast_dev_run_synthetic_config(tmp_path):
    """The shipped synthetic RoFormerMIL config runs through the CLI surface."""
    from transmil_deepgraft_tpu.cli.train import main as train_main

    cfg = "transmil_deepgraft_tpu/configs/synthetic_roformer_norm_rest.yaml"
    summary = train_main(["--stage", "train", "--config", cfg, "--fast_dev_run",
                          "--log_dir", str(tmp_path)])
    assert "test_patient_auroc" in summary or "val_auc" in summary


def test_visualizer_coord_aware(tmp_path):
    """Visualizer passes the slide's real coords to coord-aware heads."""
    from transmil_deepgraft_tpu.visualize.heatmap import Visualizer

    rng = np.random.default_rng(0)
    n = 25
    bag = rng.standard_normal((n, D)).astype(np.float32)
    coords = rng.integers(0, 12, (n, 2)).astype(np.int32)
    model = _model()
    v = model.init({"params": jax.random.key(0)}, bag[None], jnp.asarray(coords[None], jnp.float32))
    viz = Visualizer(model, v, out_dir=tmp_path)
    result = viz.run_slide(bag, coords, "s0")
    for p in result["paths"]:
        assert p.exists()
    # the attention scores must be the coord-conditioned ones (min-max
    # normalized, visualize_mil.py:585-592 semantics), not the grid fallback
    direct = np.asarray(
        model.apply(v, bag[None], jnp.asarray(coords[None], jnp.float32),
                    return_attn=True)[1].tile_scores().mean(axis=1)[0]
    )
    direct = (direct - direct.min()) / (direct.max() - direct.min() + 1e-12)
    np.testing.assert_allclose(result["attention"], direct, rtol=2e-4, atol=2e-6)


def test_inference_pipeline_coord_aware(tmp_path):
    """SlideInferencePipeline feeds real tile coords to coord-aware heads."""
    from transmil_deepgraft_tpu.inference import SlideInferencePipeline
    from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet

    rng = np.random.default_rng(0)
    backbone = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
    bv = jax.device_get(
        backbone.init({"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 3)))
    )
    head = RoFormerMIL(n_classes=2, in_features=2048, out_features=32, depth=1,
                       heads=2, dim_head=16, mlp_dim=32)
    hv = head.init({"params": jax.random.key(1)}, jnp.zeros((1, 4, 2048)))
    tiles = rng.standard_normal((6, 64, 64, 3)).astype(np.float32)
    coords = rng.integers(0, 10, (6, 2)).astype(np.float32)

    pipe = SlideInferencePipeline(bv, head, hv, chunk=4)  # bf16 embed path
    probs, attn = pipe.predict_slide_with_attention(tiles, coords)
    assert probs.shape == (2,) and attn.shape == (6,)
    np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-5)
    # coord-conditioned: matches direct head apply on the pipeline's features
    feats = pipe.embed(tiles)  # (6, 2048)
    want = np.asarray(jax.nn.softmax(head.apply(
        hv, jnp.asarray(feats[None]), jnp.asarray(coords[None]), deterministic=True
    ), axis=-1))[0]
    np.testing.assert_allclose(probs, want, rtol=2e-4, atol=2e-5)
    # and differs from the coord-less fallback
    fallback = pipe.predict_slide(tiles)
    assert np.abs(fallback - probs).max() > 1e-5
    with pytest.raises(ValueError, match="coords"):
        pipe.predict_slide(tiles, coords[:3])


def test_kfold_ensemble_coord_aware(tmp_path):
    """k-fold + logit-mean ensemble over a coord-aware head: the ensemble
    forward and attention export consume the staged coords."""
    from transmil_deepgraft_tpu.data.datamodule import MILDataModule
    from transmil_deepgraft_tpu.train.kfold import run_kfold
    from transmil_deepgraft_tpu.train.losses import create_loss
    from transmil_deepgraft_tpu.train.optimizers import create_optimizer
    from transmil_deepgraft_tpu.train.trainer import Trainer, TrainerConfig

    dm = MILDataModule(
        n_classes=2, max_bag_size=16, batch_size=4,
        synthetic={"n_train": 12, "n_val": 6, "n_test": 6, "bag_size": 16,
                   "feature_size": 24, "signal": 2.0},
        seed=0,
    )

    def build(fold_dm, log_dir):
        model = RoFormerMIL(n_classes=2, in_features=24, out_features=16, depth=1,
                            heads=2, dim_head=8, mlp_dim=16)
        tx = create_optimizer(opt="adam", lr=1e-3, weight_decay=0.0)
        cfg = TrainerConfig(epochs=1, patience=5, log_dir=log_dir, task="norm_rest")
        return Trainer(model, tx, fold_dm, n_classes=2, loss_fn=create_loss(),
                       config=cfg, model_name="RoFormerMIL")

    result = run_kfold(build, dm, nfold=2, export_dir=tmp_path / "kf", seed=0)
    assert len(result.fold_metrics) == 2
    assert 0.0 <= result.ensemble_metrics["ensemble_auc"] <= 1.0
    assert list((tmp_path / "kf" / "ensemble_topk_tiles").glob("*.csv"))


# ----------------------------------------------------- coords padding contract
def test_normalize_pad_coords_contract():
    """data/coords.py: per-axis min-normalize THEN zero-pad — pad rows coincide
    with the bag min, so translation is removed host-side and the model's
    internal anchoring stays a no-op on padded bags."""
    from transmil_deepgraft_tpu.data.coords import grid_coords, normalize_pad_coords

    c = np.array([[10, 7], [12, 3], [11, 9]], np.float32)
    out = normalize_pad_coords(c, 5)
    assert out.shape == (5, 2)
    np.testing.assert_array_equal(out[:3], c - [10, 3])
    np.testing.assert_array_equal(out[3:], 0.0)
    # translation invariance holds through the contract exactly
    np.testing.assert_array_equal(out, normalize_pad_coords(c + [123, -45], 5))
    # truncation branch + empty input
    assert normalize_pad_coords(c, 2).shape == (2, 2)
    assert normalize_pad_coords(np.zeros((0, 2)), 3).shape == (3, 2)
    g = grid_coords(5, 2)
    assert g.shape == (2, 5, 2) and g[0, 0].tolist() == [0, 0]


def test_synthetic_trainview_coords_row_aligned():
    """_TrainViewSynthetic keeps coords aligned with the bag through its
    subsample/pad/shuffle (review finding: it previously returned the raw
    meta coords while the bag rows were permuted twice)."""
    from transmil_deepgraft_tpu.data.datamodule import _TrainViewSynthetic
    from transmil_deepgraft_tpu.data.synthetic import SyntheticBagDataset

    ds = SyntheticBagDataset(n_slides=4, bag_size=20, feature_size=8,
                             variable_bags=True, seed=0)
    view = _TrainViewSynthetic(ds, max_bag_size=12, mixup=False)
    bag, _, (_, coords, _) = view.get_item(0, np.random.default_rng(1))
    feats0, _, (_, coords0, _) = ds[0]
    nonpad = np.where(bag.any(axis=1))[0]
    orig = [np.where((feats0 == bag[i]).all(axis=1))[0][0] for i in nonpad]
    submin = coords0[orig].min(axis=0)
    for row, j in zip(nonpad, orig):
        np.testing.assert_array_equal(coords[row], coords0[j] - submin)


def test_collate_rejects_placeholder_coords():
    """Full-length all-zero coords (the image-bag loaders' 'no coords'
    convention) must NOT be promoted to padded_coords."""
    from transmil_deepgraft_tpu.data.datamodule import collate

    bag = np.ones((5, 8), np.float32)
    items = [(bag, 0, ("s0", np.zeros((5, 2), np.int32), "p0"))]
    assert collate(items, eval_pad="exact").padded_coords is None
    # degenerate (0, 2) placeholders too
    items = [(bag, 0, ("s0", np.zeros((0, 2), np.int32), "p0"))]
    assert collate(items, eval_pad="exact").padded_coords is None
    # real coords ARE promoted, normalized to per-axis min 0
    real = np.array([[3, 4], [3, 5], [4, 4], [5, 6], [3, 9]], np.int32)
    batch = collate([(bag, 0, ("s0", real, "p0"))], eval_pad="exact")
    np.testing.assert_array_equal(batch.padded_coords[0], (real - [3, 4]).astype(np.float32))


def test_bundle_coordless_fallback_matches_live_model(tmp_path):
    """Coord-less predict from a coord-aware bundle == the live model on the
    identically padded bag with the PADDED-length grid (the trainer/model
    convention — review finding: the bundle previously gridded the real
    length then zero-padded)."""
    from transmil_deepgraft_tpu.data.coords import grid_coords
    from transmil_deepgraft_tpu.serving import ServingBundle, export_serving_bundle

    model = _model()
    x = np.zeros((1, 64, D), np.float32)
    variables = jax.device_get(model.init({"params": jax.random.key(0)}, x))
    path = tmp_path / "r.tdx"
    export_serving_bundle(model, variables, path, model_name="RoFormerMIL",
                          in_features=D, buckets=(64,), platforms=("cpu",))
    bundle = ServingBundle.load(path)
    feats = np.random.default_rng(0).standard_normal((1, 50, D)).astype(np.float32)
    got = bundle.predict_logits(feats)
    padded = np.zeros((1, 64, D), np.float32); padded[:, :50] = feats
    live = np.asarray(model.apply(
        variables, jnp.asarray(padded), jnp.asarray(grid_coords(64, 1)), deterministic=True
    ))
    np.testing.assert_allclose(got, live, rtol=2e-5, atol=2e-5)


def test_slide_bundle_coord_aware(tmp_path):
    """Slide bundles from a coord-aware head carry the coords input end to
    end (tiles + coords -> probs), and non-coord slide bundles refuse coords."""
    from transmil_deepgraft_tpu.models import TransMIL
    from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet
    from transmil_deepgraft_tpu.serving import ServingBundle, export_slide_bundle

    rng = np.random.default_rng(0)
    backbone = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
    bv = jax.device_get(
        backbone.init({"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 3)))
    )
    head = RoFormerMIL(n_classes=2, in_features=2048, out_features=32, depth=1,
                       heads=2, dim_head=16, mlp_dim=32)
    hv = head.init({"params": jax.random.key(1)}, jnp.zeros((1, 4, 2048)))
    path = tmp_path / "rope_slide.tdx"
    meta = export_slide_bundle(bv, head, hv, path, model_name="RoFormerMIL",
                               in_features=2048, chunk=4, tile_hw=64,
                               head_buckets=(8,), platforms=("cpu",))
    assert meta["coord_aware"]
    bundle = ServingBundle.load(path)
    tiles = rng.standard_normal((6, 64, 64, 3)).astype(np.float32)
    coords = rng.integers(0, 9, (6, 2)).astype(np.float32)
    probs = bundle.predict_slide(tiles, coords)
    assert probs.shape == (2,)
    np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-5)
    # coords-conditioned differs from the grid fallback
    assert np.abs(bundle.predict_slide(tiles) - probs).max() > 1e-6
    if meta["attention"]:
        probs2, scores = bundle.predict_slide_with_attention(tiles, coords)
        assert scores.shape == (6,)
        np.testing.assert_allclose(probs2, probs, atol=1e-5)

    # non-coord slide bundles refuse coords loudly
    head2 = TransMIL(n_classes=2, in_features=2048, out_features=32)
    hv2 = head2.init({"params": jax.random.key(2)}, jnp.zeros((1, 8, 2048)))
    path2 = tmp_path / "tm_slide.tdx"
    export_slide_bundle(bv, head2, hv2, path2, model_name="TransMIL",
                        in_features=2048, chunk=4, tile_hw=64,
                        head_buckets=(8,), platforms=("cpu",))
    b2 = ServingBundle.load(path2)
    with pytest.raises(ValueError, match="coord-aware"):
        b2.predict_slide(tiles, coords)


def test_infer_cli_roformer_head(tmp_path):
    """transmil-infer --model RoFormerMIL: the coord-aware branch is reachable
    from the CLI and consumes the tiles' real filename coords (review finding:
    the head used to be hardcoded to TransMIL)."""
    from flax import serialization
    from PIL import Image

    from transmil_deepgraft_tpu.cli.infer import main as infer_main
    from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet

    rng = np.random.default_rng(0)
    root = tmp_path / "BLOCKS"
    d = root / "slideA"
    d.mkdir(parents=True)
    for t in range(4):
        arr = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        Image.fromarray(arr).save(d / f"tile_({t}-1).jpg")

    backbone = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
    bv = jax.device_get(
        backbone.init({"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 3)))
    )
    (tmp_path / "bb.msgpack").write_bytes(serialization.msgpack_serialize(bv))
    head = RoFormerMIL(n_classes=2, in_features=2048, out_features=32)  # CLI-default depth/heads
    hv = jax.device_get(head.init({"params": jax.random.key(1)}, jnp.zeros((1, 4, 2048))))
    (tmp_path / "head.msgpack").write_bytes(serialization.msgpack_serialize(hv))

    results = infer_main([
        "--tiles_root", str(root),
        "--backbone_ckpt", str(tmp_path / "bb.msgpack"),
        "--head_ckpt", str(tmp_path / "head.msgpack"),
        "--model", "RoFormerMIL", "--out_features", "32",
        "--quantize", "bf16", "--chunk", "4", "--tile_size", "64",
        "--out_dir", str(tmp_path / "out"),
    ])
    assert len(results) == 1
    assert abs(sum(results[0]["probs"]) - 1.0) < 1e-4
    assert (tmp_path / "out" / "slideA_topk_tiles.csv").exists()


def test_mesh_training_matches_single_device(tmp_path):
    """Coord-aware training on a dp=4 x sp=2 mesh (coords batch-sharded over
    dp) matches single-device exactly — same guarantee the flagship heads
    carry (tests/test_trainer_mesh.py)."""
    from transmil_deepgraft_tpu.data.datamodule import MILDataModule
    from transmil_deepgraft_tpu.parallel.mesh import make_mesh
    from transmil_deepgraft_tpu.train.losses import create_loss
    from transmil_deepgraft_tpu.train.optimizers import create_optimizer
    from transmil_deepgraft_tpu.train.trainer import Trainer, TrainerConfig

    def build(log_dir, mesh):
        dm = MILDataModule(
            n_classes=2, max_bag_size=32, batch_size=4,
            synthetic={"n_train": 8, "n_val": 8, "n_test": 8, "bag_size": 32,
                       "feature_size": 32, "signal": 2.0},
            seed=0,
        )
        model = RoFormerMIL(n_classes=2, in_features=32, out_features=32, depth=1,
                            heads=2, dim_head=16, mlp_dim=32)
        tx = create_optimizer(opt="adam", lr=1e-3, weight_decay=0.0)
        cfg = TrainerConfig(epochs=1, log_dir=str(log_dir), task="norm_rest")
        return Trainer(model, tx, dm, n_classes=2, loss_fn=create_loss(), config=cfg,
                       mesh=mesh, model_name="RoFormerMIL")

    mesh = make_mesh(jax.devices(), dp=4, sp=2)
    h_mesh = build(tmp_path / "mesh", mesh).fit()
    h_single = build(tmp_path / "single", None).fit()
    assert abs(h_mesh["loss"] - h_single["loss"]) < 1e-4, (h_mesh["loss"], h_single["loss"])
    assert abs(h_mesh["val_auc"] - h_single["val_auc"]) < 1e-6


# ------------------------------------------------------------ rotary Nystrom
def test_nystrom_mode_properties():
    """num_landmarks>0: O(n*m) rotary Nystrom attention keeps the rotary
    invariants — rotations commute with the landmark segment-means, so
    permute-with-coords and translation invariance hold like the exact mode —
    and return_attn yields a usable tile-score row."""
    x, coords = _data()
    model = _model(num_landmarks=8, dropout=0.0, emb_dropout=0.0)
    v = model.init({"params": jax.random.key(0)}, x, coords)
    base = model.apply(v, x, coords)
    assert base.shape == (1, 3) and np.isfinite(np.asarray(base)).all()

    # translation invariance survives the Nystrom approximation exactly
    shifted = model.apply(v, x, coords + jnp.asarray([31.0, -7.0]))
    np.testing.assert_allclose(np.asarray(shifted), np.asarray(base), atol=2e-4)

    logits, attn = model.apply(v, x, coords, return_attn=True)
    scores = attn.tile_scores()
    assert scores.shape == (1, 4, N) and np.isfinite(np.asarray(scores)).all()
    np.testing.assert_allclose(np.asarray(logits), np.asarray(base), atol=1e-5)


def test_nystrom_mode_learns_position_signal():
    """The O(n*m) mode still learns the position-dependent task the exact
    mode learns (test_learns_position_dependent_signal), proving positional
    information flows through the landmark approximation."""
    import optax

    rng = np.random.default_rng(0)
    n, n_slides = 32, 24
    xs, cs, ys = [], [], []
    for i in range(n_slides):
        label = i % 2
        feats = rng.standard_normal((n, D)).astype(np.float32)
        witness = rng.random(n) < 0.4
        feats[witness, ::2] += 1.5
        coords = np.stack([rng.integers(0, 8, n), rng.integers(0, 16, n)], -1).astype(np.float32)
        coords[witness, 0] = rng.integers(0, 8, witness.sum()) + (8.0 if label else 0.0)
        coords[~witness, 0] = rng.integers(0, 16, (~witness).sum())
        xs.append(feats); cs.append(coords); ys.append(label)
    x = jnp.asarray(np.stack(xs)); c = jnp.asarray(np.stack(cs))
    y = jax.nn.one_hot(jnp.asarray(ys), 2)

    model = RoFormerMIL(n_classes=2, in_features=D, out_features=32, depth=2,
                        heads=2, dim_head=16, mlp_dim=32, dropout=0.0,
                        emb_dropout=0.0, num_landmarks=8)
    v = model.init({"params": jax.random.key(0)}, x[:1], c[:1])
    tx = optax.adam(3e-4)
    state = tx.init(v["params"])

    @jax.jit
    def step(p, s):
        def loss(p):
            return optax.softmax_cross_entropy(model.apply({"params": p}, x, c), y).mean()

        l, g = jax.value_and_grad(loss)(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    p = v["params"]
    first = None
    for _ in range(150):
        p, state, l = step(p, state)
        first = first if first is not None else float(l)
    acc = (jnp.argmax(model.apply({"params": p}, x, c), -1) == jnp.asarray(ys)).mean()
    assert float(l) < first * 0.5, (first, float(l))
    assert float(acc) >= 0.85, float(acc)

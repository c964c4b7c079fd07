"""Tests: classic two-level aggregation, transforms, CTMIL/MonaiMIL, local features."""

import jax
import jax.numpy as jnp
import numpy as np

from transmil_deepgraft_tpu.data.transforms import (
    hed_jitter,
    hed_to_rgb,
    imagenet_normalize,
    rgb_to_hed,
    train_augment,
)
from transmil_deepgraft_tpu.models import CTMIL, MonaiMIL, create_model
from transmil_deepgraft_tpu.train.aggregation import aggregate_tiles_to_patients


def test_hed_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(30, 225, (16, 16, 3)).astype(np.uint8)
    back = hed_to_rgb(rgb_to_hed(img))
    np.testing.assert_allclose(back, img, atol=1.5)


def test_hed_jitter_changes_image():
    rng = np.random.default_rng(0)
    img = rng.integers(30, 225, (16, 16, 3)).astype(np.uint8)
    out = hed_jitter(img, 0.1, rng)
    assert out.shape == img.shape and out.dtype == img.dtype
    assert np.abs(out.astype(int) - img.astype(int)).max() > 0


def test_train_augment_pipeline():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    out = train_augment(img, rng)
    assert out.shape == img.shape
    norm = imagenet_normalize(out)
    assert norm.dtype == np.float32 and abs(float(norm.mean())) < 5


def test_tile_aggregation_two_level():
    # patient A / slide s1: one positive tile among negatives -> slide goes positive
    probs = np.array([[0.9, 0.1], [0.3, 0.7], [0.8, 0.2], [0.6, 0.4]])
    targets = np.array([1, 1, 1, 0])
    slides = ["s1", "s1", "s1", "s2"]
    patients = ["A", "A", "A", "B"]
    agg = aggregate_tiles_to_patients(probs, targets, slides, patients, 2)
    assert agg.patients == ["A", "B"]
    np.testing.assert_allclose(agg.scores[0], [0.3, 0.7])  # positive tile only
    np.testing.assert_allclose(agg.scores[1], [0.6, 0.4])


def test_ctmil_forward():
    model = CTMIL(n_classes=2, in_features=64, out_features=32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 20, 20, 64), dtype=np.float32))
    variables = model.init({"params": jax.random.key(0)}, x)
    logits = model.apply(variables, x)
    assert logits.shape == (1, 2)


def test_monai_mil_modes():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 50, 64), dtype=np.float32))
    for mode in ("mean", "max", "att", "att_trans"):
        model = MonaiMIL(n_classes=3, in_features=64, mil_mode=mode, trans_blocks=1)
        variables = model.init({"params": jax.random.key(0)}, x)
        logits = model.apply(variables, x)
        assert logits.shape == (1, 3), mode


def test_registry_new_models():
    assert create_model("CTMIL", n_classes=2, in_features=64, out_features=32).n_classes == 2
    assert create_model("AttTrans", n_classes=2, in_features=64).mil_mode == "att_trans"


def test_local_feature_dataset(tmp_path):
    import h5py, json

    d = tmp_path / "feats"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        with h5py.File(d / f"s{i}.h5", "w") as f:
            n = 200
            f["features"] = rng.standard_normal((n, 16)).astype(np.float32)
            f["coords"] = rng.integers(0, 80, (n, 2)).astype(np.int32)
    labels = {"train": [[f"s{i}.h5", i % 2] for i in range(2)]}
    (tmp_path / "labels.json").write_text(json.dumps(labels))

    from transmil_deepgraft_tpu.data.local_features import LocalFeatureBagDataset

    ds = LocalFeatureBagDataset(d, tmp_path / "labels.json", "train", 2, window=50)
    vol, label, (name, coords, patient) = ds.get_item(0, rng)
    assert vol.shape == (50, 50, 16)
    assert (np.abs(vol).sum(-1) > 0).sum() > 0  # some tiles landed in the window

"""Round-2 surface completeness: lovasz loss, affine/elastic transforms,
export_metrics per-class CIs + multi-run comparison figures."""

import numpy as np
import pytest

import jax.numpy as jnp

from transmil_deepgraft_tpu.data.transforms import random_affine, random_elastic
from transmil_deepgraft_tpu.train.losses import create_loss, lovasz_softmax


def test_lovasz_registered_and_sane():
    fn = create_loss("lovasz")
    assert fn is lovasz_softmax
    # perfect predictions -> ~0 loss
    logits = jnp.asarray([[10.0, -10.0], [-10.0, 10.0], [10.0, -10.0]])
    targets = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
    assert float(lovasz_softmax(logits, targets)) < 1e-3
    # inverted predictions -> high loss
    bad = float(lovasz_softmax(-logits, targets))
    assert bad > 0.9


def test_lovasz_matches_manual_binary():
    """Hand-computed Lovasz extension on a tiny case."""
    p1 = np.array([0.9, 0.4, 0.6])  # class-1 probs
    fg = np.array([1.0, 0.0, 1.0])
    errors = np.abs(fg - p1)
    order = np.argsort(-errors)
    es, fs = errors[order], fg[order]
    gts = fs.sum()
    inter = gts - np.cumsum(fs)
    union = gts + np.cumsum(1 - fs)
    jac = 1.0 - inter / union
    grad = np.concatenate([jac[:1], np.diff(jac)])
    expected_c1 = float(es @ grad)

    p0 = 1.0 - p1
    fg0 = 1.0 - fg
    e0 = np.abs(fg0 - p0)
    o0 = np.argsort(-e0)
    es0, fs0 = e0[o0], fg0[o0]
    g0 = fs0.sum()
    jac0 = 1.0 - (g0 - np.cumsum(fs0)) / (g0 + np.cumsum(1 - fs0))
    grad0 = np.concatenate([jac0[:1], np.diff(jac0)])
    expected = (expected_c1 + float(es0 @ grad0)) / 2

    logits = np.log(np.stack([p0, p1], axis=1))
    targets = np.stack([fg0, fg], axis=1)
    got = float(lovasz_softmax(jnp.asarray(logits), jnp.asarray(targets)))
    assert got == pytest.approx(expected, abs=1e-5)


@pytest.mark.parametrize("fn,kwargs", [
    (random_affine, {"alpha": 0.1}),
    (random_elastic, {"alpha": 2.0, "sigma": 0.06}),
])
def test_geometric_transforms(fn, kwargs, rng):
    img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    out = fn(img, rng=np.random.default_rng(1), **kwargs)
    assert out.shape == img.shape and out.dtype == img.dtype
    assert not np.array_equal(out, img)  # actually warped
    # values come from the source image (nearest-neighbor sampling)
    assert set(np.unique(out)) <= set(np.unique(img))
    # deterministic under the same rng seed
    again = fn(img, rng=np.random.default_rng(1), **kwargs)
    np.testing.assert_array_equal(out, again)


def test_export_combined_figures(tmp_path, rng):
    import pandas as pd

    from transmil_deepgraft_tpu.utils.export_metrics import export_combined

    for run in ("runA", "runB"):
        d = tmp_path / run
        d.mkdir()
        n = 40
        targets = rng.integers(0, 2, n)
        scores = np.clip(targets * 0.4 + rng.random(n) * 0.6, 0, 1)
        pd.DataFrame({
            "PATIENT": [f"p{i}" for i in range(n)],
            "yTrue": targets,
            "class_0": 1 - scores,
            "class_1": scores,
        }).to_csv(d / "TEST_RESULT_PATIENT.csv")

    out_csv = tmp_path / "combined.csv"
    # through the CLI driver (ref export_metrics.py make_parse surface)
    from transmil_deepgraft_tpu.cli.export_metrics import main as export_main

    export_main(["--runs", str(tmp_path / "runA"), str(tmp_path / "runB"),
                 "--n_classes", "2", "--out_csv", str(out_csv)])
    df = pd.read_csv(out_csv)
    assert len(df) == 4  # 2 runs x 2 per-class rows
    assert {"auroc", "ci_low", "ci_high"} <= set(df.columns)
    assert (tmp_path / "combined_roc_comparison.png").exists()
    assert (tmp_path / "combined_auroc_bars.png").exists()
    # ref plot_combined_cm / PR half of plot_combined
    assert (tmp_path / "combined_confusions.png").exists()
    assert (tmp_path / "combined_pr_comparison.png").exists()


def test_mixed_res_training_items(tmp_path, rng):
    """ref feature_dataloader_mixed: extra resolution roots add each slide as
    an additional TRAIN item (same label/patient); eval stays single-res."""
    import h5py

    from transmil_deepgraft_tpu.data.feature_bags import FeatureBagDataset

    for root in ("res224", "res512"):
        d = tmp_path / root
        d.mkdir()
        for slide in ("s0", "s1"):
            with h5py.File(d / f"{slide}.h5", "w") as f:
                f.create_dataset("features", data=rng.random((6, 8)).astype(np.float32))
                f.create_dataset("coords", data=np.zeros((6, 2), np.int64))
    import json as _json

    (tmp_path / "labels.json").write_text(
        _json.dumps({"train": [["s0", 0], ["s1", 1]], "val": [["s0", 0], ["s1", 1]]})
    )

    train = FeatureBagDataset(
        tmp_path / "res224", tmp_path / "labels.json", "train", 2,
        mixed_res_dirs=[tmp_path / "res512"],
    )
    assert len(train) == 4  # 2 slides x 2 resolutions
    assert train.names.count("s0") == 2 and train.labels == [0, 0, 1, 1]

    val = FeatureBagDataset(
        tmp_path / "res224", tmp_path / "labels.json", "val", 2,
        mixed_res_dirs=[tmp_path / "res512"],
    )
    assert len(val) == 2  # eval single-res

"""Feature extraction + sustainability telemetry tests."""

import json

import jax
import numpy as np
import pytest

from transmil_deepgraft_tpu.utils.sustainability import EnergyTracker, benchmark_models


def _make_cohort(tmp_path, n_slides=2, n_tiles=5, size=32):
    from PIL import Image

    rng = np.random.default_rng(0)
    blocks = tmp_path / "BLOCKS"
    entries = []
    for s in range(n_slides):
        d = blocks / f"slide{s}"
        d.mkdir(parents=True)
        for t in range(n_tiles):
            arr = rng.integers(0, 255, (size, size, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"tile_({t}-{s}).jpg")
        entries.append([f"slide{s}", s % 2])
    (tmp_path / "labels.json").write_text(json.dumps({"train": entries, "test": entries}))
    return tmp_path


def test_extract_cohort(tmp_path):
    from transmil_deepgraft_tpu.data.feature_extractor import extract_cohort
    from transmil_deepgraft_tpu.data.jpg_bags import JPGMILDataset
    from transmil_deepgraft_tpu.models.backbones import SimpleCNN

    root = _make_cohort(tmp_path, size=224)
    ds = JPGMILDataset(root, root / "labels.json", "test", 2)
    assert len(ds) == 2

    backbone = SimpleCNN(out_features=16)
    import jax.numpy as jnp

    variables = backbone.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    out = extract_cohort(backbone, variables, ds, tmp_path / "feats", batch_size=3)
    assert len(out) == 2

    import h5py

    with h5py.File(out[0], "r") as f:
        assert f["features"].shape == (5, 16)
        assert f["coords"].shape == (5, 2)
        assert np.isfinite(f["features"][:]).all()

    # round-trip through FeatureBagDataset
    from transmil_deepgraft_tpu.data.feature_bags import FeatureBagDataset

    labels = {"test": [[f"slide{s}.h5", s % 2] for s in range(2)]}
    (tmp_path / "feat_labels.json").write_text(json.dumps(labels))
    fbd = FeatureBagDataset(tmp_path / "feats", tmp_path / "feat_labels.json", "test", 2)
    bag, label, meta = fbd.get_item(0, np.random.default_rng(0))
    assert bag.shape[1] == 16


def test_energy_tracker():
    import time

    with EnergyTracker(chip_watts=100.0) as t:
        time.sleep(0.05)
        t.step(5)
    rep = t.report()
    assert rep.seconds >= 0.05
    assert rep.kwh > 0 and rep.kg_co2 > 0 and rep.steps == 5


def test_benchmark_models_sweep(tmp_path):
    path = benchmark_models(
        tmp_path, model_names=("AttMIL",), bag_sizes=(32,), in_features=32, reps=2
    )
    assert path.exists()
    rows = json.loads((tmp_path / "sustainability_inference.json").read_text())
    assert rows[0]["model"] == "AttMIL" and rows[0]["kwh"] > 0

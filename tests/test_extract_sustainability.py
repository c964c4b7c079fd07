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


def test_regional_impact_and_mortality(tmp_path):
    """Per-region CO2/mortality analysis (ref mortality_cost.ipynb/map_co2.ipynb
    as a library call): rows sorted cleanest-first, linear in kwh and intensity,
    mortality = kgCO2/1000 * Bressler deaths-per-tonne."""
    from transmil_deepgraft_tpu.utils.sustainability import (
        MORTALITY_DEATHS_PER_TCO2,
        REGION_GCO2_PER_KWH,
        plot_regional_impact,
        regional_impact,
        write_regional_impact,
    )

    kwh = 12.5
    rows = regional_impact(kwh)
    assert len(rows) == len(REGION_GCO2_PER_KWH)
    intensities = [r["gco2_per_kwh"] for r in rows]
    assert intensities == sorted(intensities)
    for r in rows:
        assert abs(r["kg_co2"] - kwh * r["gco2_per_kwh"] / 1000.0) < 1e-12
        assert abs(r["deaths"] - r["kg_co2"] / 1000.0 * MORTALITY_DEATHS_PER_TCO2) < 1e-18

    path = write_regional_impact(kwh, tmp_path / "regional.csv")
    assert path.exists() and path.with_suffix(".json").exists()
    png = plot_regional_impact(rows, tmp_path / "regional.png")
    assert png.exists()

    custom = regional_impact(2.0, {"A": 100.0, "B": 50.0})
    assert [r["region"] for r in custom] == ["B", "A"]
    assert custom[1]["kg_co2"] == 0.2


def test_sustainability_cli_regions_and_chip_watts(tmp_path):
    """--chip_watts actually scales the accounted energy (was parsed but
    dropped), and --regions writes the per-region artifacts."""
    import csv

    from transmil_deepgraft_tpu.cli.sustainability import main as sus_main

    common = ["--models", "AttMIL", "--bag_sizes", "16", "--in_features", "8",
              "--reps", "2"]
    p1 = sus_main(common + ["--out_dir", str(tmp_path / "w200"), "--chip_watts", "200"])
    p2 = sus_main(common + ["--out_dir", str(tmp_path / "w400"), "--chip_watts", "400",
                            "--regions"])
    # kwh must equal the row's own measured seconds x the REQUESTED watts
    # (seconds is rounded to 4 decimals in the CSV; tolerate that)
    for path, watts in ((p1, 200.0), (p2, 400.0)):
        with open(path) as f:
            for row in csv.DictReader(f):
                expect = float(row["seconds"]) * watts / 3.6e6
                assert abs(float(row["kwh"]) - expect) <= 1e-4 * watts / 3.6e6 + 1e-12
    assert (tmp_path / "w400" / "regional_impact_inference.csv").exists()
    assert (tmp_path / "w400" / "regional_impact_inference.png").exists()

"""End-to-end CLI: raw-image MIL (backbone in graph) and classic tile pipeline."""

import json

import numpy as np
import pytest


@pytest.fixture
def jpg_cohort(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    entries = []
    for s in range(2):
        d = tmp_path / "BLOCKS" / f"sl{s}"
        d.mkdir(parents=True)
        for t in range(3):
            arr = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
            # put a class signal in the mean brightness
            if s % 2:
                arr = np.clip(arr.astype(int) + 40, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"t_({t}-{s}).jpg")
        entries.append([f"sl{s}", s % 2])
    (tmp_path / "labels.json").write_text(
        json.dumps({"train": entries, "val": entries, "test": entries})
    )
    return tmp_path


def _cfg(tmp_path, variant, backbone, model="AttMIL"):
    text = f"""
General:
    seed: 1
    epochs: 1
    patience: 2
    log_path: {tmp_path}/logs
Data:
    data_dir: {tmp_path}
    label_file: {tmp_path}/labels.json
    variant: {variant}
    tile_size: 64
    bag_size: 3
    train_dataloader: {{batch_size: 1}}
Model:
    name: {model}
    n_classes: 2
    backbone: {backbone}
    in_features: 1024
    out_features: 64
Optimizer: {{opt: adam, lr: 0.001, weight_decay: 0.0}}
Loss: {{base_loss: CrossEntropyLoss}}
"""
    p = tmp_path / f"{model}_{backbone}_norm_rest.yaml"
    p.write_text(text)
    return p


def test_cli_image_mil_with_backbone(jpg_cohort):
    from transmil_deepgraft_tpu.cli.train import main

    cfg = _cfg(jpg_cohort, "images", "simple")
    summary = main(
        ["--stage", "train", "--config", str(cfg), "--log_dir", str(jpg_cohort / "run"),
         "--fast_dev_run"]
    )
    assert np.isfinite(summary["test_auc"])
    assert (jpg_cohort / "run" / "checkpoints" / "last.ckpt").exists()


def test_cli_classic_tiles(jpg_cohort):
    from transmil_deepgraft_tpu.cli.train import main

    cfg = _cfg(jpg_cohort, "tiles", "simple")
    summary = main(
        ["--stage", "train", "--config", str(cfg), "--log_dir", str(jpg_cohort / "run2"),
         "--fast_dev_run"]
    )
    assert np.isfinite(summary["test_auc"])


@pytest.fixture
def hdf5_image_cohort(tmp_path):
    import h5py

    rng = np.random.default_rng(0)
    entries = []
    for s in range(2):
        imgs = rng.integers(0, 255, (3, 64, 64, 3)).astype(np.uint8)
        if s % 2:
            imgs = np.clip(imgs.astype(int) + 40, 0, 255).astype(np.uint8)
        with h5py.File(tmp_path / f"sl{s}.hdf5", "w") as f:
            for t in range(len(imgs)):
                f[f"tile_{t}"] = imgs[t]
        entries.append([f"sl{s}", s % 2])
    (tmp_path / "labels.json").write_text(
        json.dumps({"train": entries, "val": entries, "test": entries})
    )
    return tmp_path


def test_cli_legacy_image_bags(hdf5_image_cohort):
    """variant='image_bags' (legacy HDF5 raw-image bags) trains end to end
    through the CLI with the backbone in the graph."""
    from transmil_deepgraft_tpu.cli.train import main

    cfg = _cfg(hdf5_image_cohort, "image_bags", "simple")
    summary = main(
        ["--stage", "train", "--config", str(cfg),
         "--log_dir", str(hdf5_image_cohort / "run3"), "--fast_dev_run"]
    )
    assert np.isfinite(summary["test_auc"])

"""Camelyon CSV loader, spatial-resnet model, visualize CLI."""

import json

import jax
import jax.numpy as jnp
import numpy as np


def test_camelyon_dataset(tmp_path):
    import pandas as pd
    import torch

    rng = np.random.default_rng(0)
    for name in ("normal_001", "tumor_001", "test_001"):
        torch.save(torch.from_numpy(rng.standard_normal((30, 8)).astype(np.float32)), tmp_path / f"{name}.pt")
    pd.DataFrame(
        {
            "train": ["normal_001"], "train_label": [0],
            "val": ["tumor_001"], "val_label": [1.0],
            "test": ["test_001"], "test_label": [1.0],
        }
    ).to_csv(tmp_path / "fold0.csv")

    from transmil_deepgraft_tpu.data.camelyon import CamelyonDataset

    for mode, name, label in (("train", "normal_001", 0), ("val", "tumor_001", 1), ("test", "test_001", 1)):
        ds = CamelyonDataset(tmp_path, tmp_path, mode, fold=0)
        assert len(ds) == 1
        bag, lab, (n, _, patient) = ds.get_item(0, np.random.default_rng(0))
        assert bag.shape == (30, 8) and lab == label and n == name and patient == name


def test_spatial_resnet_mil():
    from transmil_deepgraft_tpu.models import create_model

    model = create_model("resnet50", n_classes=2, in_features=32)
    x = jnp.zeros((1, 32, 32, 32))
    variables = model.init({"params": jax.random.key(0)}, x)
    logits = model.apply(variables, x)
    assert logits.shape == (1, 2)


def test_visualize_cli(tmp_path):
    """End-to-end: train a tiny synthetic TransMIL, then run the visualize CLI."""
    cfg_text = f"""
General:
    seed: 1
    epochs: 1
    patience: 2
    log_path: {tmp_path}/logs
Data:
    dataset_name: synthetic
    bag_size: 64
    synthetic:
        n_train: 8
        n_val: 4
        n_test: 4
        bag_size: 64
        feature_size: 128
    train_dataloader:
        batch_size: 2
Model:
    name: TransMIL
    n_classes: 2
    backbone: features
    in_features: 128
    out_features: 64
Optimizer:
    opt: adam
    lr: 0.001
    weight_decay: 0.0
Loss:
    base_loss: CrossEntropyLoss
"""
    cfg_path = tmp_path / "TransMIL_feat_norm_rest.yaml"
    cfg_path.write_text(cfg_text)

    from transmil_deepgraft_tpu.cli.train import main as train_main
    from transmil_deepgraft_tpu.cli.visualize import main as viz_main

    run_dir = tmp_path / "run"
    train_main(["--stage", "train", "--config", str(cfg_path), "--log_dir", str(run_dir)])
    ckpt = run_dir / "checkpoints" / "last.ckpt"
    assert ckpt.exists()

    results = viz_main(
        ["--config", str(cfg_path), "--ckpt", str(ckpt), "--log_dir", str(run_dir),
         "--max_slides", "2", "--track_energy"]
    )
    assert len(results) == 2
    index = json.loads((run_dir / "heatmaps" / "heatmap_index.json").read_text())
    assert all((run_dir / "heatmaps").glob("*.jpg"))
    assert len(index) == 2
    # gradcam_sus.py parity: energy accounting around the heatmap loop
    energy = json.loads((run_dir / "heatmaps" / "heatmap_energy.json").read_text())
    assert energy["steps"] == 2 and energy["kwh"] > 0

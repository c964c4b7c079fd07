"""K-fold loop + visualization tests."""

import jax
import numpy as np

from transmil_deepgraft_tpu.data.datamodule import MILDataModule
from transmil_deepgraft_tpu.models import AttMIL, TransMIL
from transmil_deepgraft_tpu.train.kfold import run_kfold
from transmil_deepgraft_tpu.train.losses import create_loss
from transmil_deepgraft_tpu.train.optimizers import create_optimizer
from transmil_deepgraft_tpu.train.trainer import Trainer, TrainerConfig
from transmil_deepgraft_tpu.visualize.heatmap import (
    Visualizer,
    assemble_heatmap,
    attention_tile_scores,
    roi_mask,
)


def test_kfold_with_ensemble(tmp_path):
    dm = MILDataModule(
        n_classes=2, max_bag_size=32, batch_size=4,
        synthetic={"n_train": 24, "n_val": 8, "n_test": 8, "bag_size": 32, "feature_size": 32, "signal": 2.0},
        seed=0,
    )

    def build(fold_dm, log_dir):
        model = AttMIL(n_classes=2, in_features=32, out_features=16, attn_dim=8)
        tx = create_optimizer(opt="adam", lr=1e-3, weight_decay=0.0)
        cfg = TrainerConfig(epochs=2, patience=5, log_dir=log_dir, task="norm_rest")
        t = Trainer(model, tx, fold_dm, n_classes=2, loss_fn=create_loss(), config=cfg, model_name="AttMIL")
        return t

    result = run_kfold(build, dm, nfold=3, export_dir=tmp_path / "kfold", seed=0)
    assert len(result.fold_metrics) == 3
    assert len(result.checkpoint_paths) == 3
    assert all(p.exists() for p in result.checkpoint_paths)
    assert 0.0 <= result.ensemble_metrics["ensemble_auc"] <= 1.0
    assert (tmp_path / "kfold" / "ensemble_metrics.json").exists()


def test_assemble_and_roi():
    coords = np.array([[0, 0], [1, 0], [0, 1], [5, 5]])
    scores = np.array([1.0, 0.5, 0.25, 1.0])
    grid = assemble_heatmap(coords, scores, blur_sigma=0)
    assert grid.shape == (6, 6)
    assert grid[0, 0] == 1.0 and grid[0, 1] == 0.5 and grid[5, 5] == 1.0
    mask = roi_mask(grid, min_size=2, fill_holes=False)
    assert mask[0, 0] and not mask[5, 5]  # isolated tile removed


def test_visualizer_end_to_end(tmp_path):
    n, d = 100, 64
    model = TransMIL(n_classes=2, in_features=d, out_features=64)
    bag = np.random.default_rng(0).standard_normal((n, d)).astype(np.float32)
    side = int(np.ceil(np.sqrt(n)))
    coords = np.stack(np.unravel_index(np.arange(n), (side, side)), 1)[:, ::-1]
    variables = model.init({"params": jax.random.key(0)}, bag[None])

    viz = Visualizer(model, variables, tmp_path, target_class=1)
    result = viz.run_slide(bag, coords, "test_slide")
    assert result["attention"].shape == (n,)
    assert result["gradcam"].shape == (n,)
    assert result["attention"].min() >= 0 and result["attention"].max() <= 1
    for p in result["paths"]:
        assert p.exists() and p.stat().st_size > 0

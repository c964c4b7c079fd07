"""Trainer data-parallel mesh path on the 8-device CPU mesh."""

import jax
import numpy as np

from transmil_deepgraft_tpu.data.datamodule import MILDataModule
from transmil_deepgraft_tpu.models import AttMIL
from transmil_deepgraft_tpu.parallel.mesh import make_mesh
from transmil_deepgraft_tpu.train.losses import create_loss
from transmil_deepgraft_tpu.train.optimizers import create_optimizer
from transmil_deepgraft_tpu.train.trainer import Trainer, TrainerConfig


def _build(tmp_path, mesh):
    dm = MILDataModule(
        n_classes=2, max_bag_size=32, batch_size=8,
        synthetic={"n_train": 16, "n_val": 8, "n_test": 8, "bag_size": 32, "feature_size": 32, "signal": 2.0},
        seed=0,
    )
    model = AttMIL(n_classes=2, in_features=32, out_features=16, attn_dim=8)
    tx = create_optimizer(opt="adam", lr=1e-3, weight_decay=0.0)
    cfg = TrainerConfig(epochs=2, log_dir=str(tmp_path), task="norm_rest")
    return Trainer(model, tx, dm, n_classes=2, loss_fn=create_loss(), config=cfg,
                   mesh=mesh, model_name="AttMIL")


def test_dp8_matches_single_device(tmp_path):
    mesh = make_mesh(jax.devices(), dp=8, sp=1)
    t_mesh = _build(tmp_path / "mesh", mesh)
    h_mesh = t_mesh.fit()
    t_single = _build(tmp_path / "single", None)
    h_single = t_single.fit()
    # same data/seed/optimizer: dp=8 sharded training must match single-device
    assert abs(h_mesh["loss"] - h_single["loss"]) < 1e-4, (h_mesh["loss"], h_single["loss"])
    assert abs(h_mesh["val_auc"] - h_single["val_auc"]) < 1e-6


def test_transmil_dp4_sp2_matches_single_device(tmp_path):
    """Flagship TransMIL trained on a REAL 2-axis mesh (dp=4 x sp=2) matches
    single-device — guards the depthwise-conv GSPMD workaround
    (ops/depthwise.py) and the pinv init-scale stop_gradient (ops/pinv.py):
    before those fixes, PPEG gradients deviated at FULL scale on 2-axis
    meshes."""
    from transmil_deepgraft_tpu.models import TransMIL

    def build(log_dir, mesh):
        dm = MILDataModule(
            n_classes=2, max_bag_size=32, batch_size=4,
            synthetic={"n_train": 8, "n_val": 8, "n_test": 8, "bag_size": 32,
                       "feature_size": 32, "signal": 2.0},
            seed=0,
        )
        model = TransMIL(n_classes=2, in_features=32, out_features=32)
        tx = create_optimizer(opt="adam", lr=1e-3, weight_decay=0.0)
        cfg = TrainerConfig(epochs=1, log_dir=str(log_dir), task="norm_rest")
        return Trainer(model, tx, dm, n_classes=2, loss_fn=create_loss(), config=cfg,
                       mesh=mesh, model_name="TransMIL")

    mesh = make_mesh(jax.devices(), dp=4, sp=2)
    h_mesh = build(tmp_path / "mesh", mesh).fit()
    h_single = build(tmp_path / "single", None).fit()
    assert abs(h_mesh["loss"] - h_single["loss"]) < 5e-4, (h_mesh["loss"], h_single["loss"])
    assert abs(h_mesh["val_loss"] - h_single["val_loss"]) < 5e-4


def test_transmil_learns_synthetic_signal(tmp_path):
    """End-to-end learning sanity: TransMIL driven by the Trainer reaches high
    val AUC on a separable synthetic task (not just a smoke forward)."""
    from transmil_deepgraft_tpu.models import TransMIL

    dm = MILDataModule(
        n_classes=2, max_bag_size=32, batch_size=4,
        synthetic={"n_train": 24, "n_val": 16, "n_test": 8, "bag_size": 32,
                   "feature_size": 32, "signal": 3.0},
        seed=1,
    )
    model = TransMIL(n_classes=2, in_features=32, out_features=32)
    tx = create_optimizer(opt="adam", lr=1e-3, weight_decay=0.0)
    cfg = TrainerConfig(epochs=25, patience=25, log_dir=str(tmp_path), task="norm_rest")
    tr = Trainer(model, tx, dm, n_classes=2, loss_fn=create_loss(), config=cfg,
                 model_name="TransMIL")
    hist = tr.fit()
    assert hist["val_auc"] > 0.9, hist


def test_dtfd_learns_synthetic_signal(tmp_path):
    """DTFD two-tier training (two optimizer groups via multi_transform,
    pseudo-bag decomposition) learns the separable synthetic task."""
    from transmil_deepgraft_tpu.models.dtfd import DTFDMIL
    from transmil_deepgraft_tpu.train.optimizers import create_dtfd_optimizer

    dm = MILDataModule(
        n_classes=2, max_bag_size=32, batch_size=1,
        synthetic={"n_train": 24, "n_val": 16, "n_test": 8, "bag_size": 32,
                   "feature_size": 32, "signal": 3.0},
        seed=2,
    )
    model = DTFDMIL(n_classes=2, in_features=32, m_dim=32)
    tx = create_dtfd_optimizer(steps_per_epoch=24, lr=1e-3)
    cfg = TrainerConfig(epochs=12, patience=12, log_dir=str(tmp_path), task="norm_rest")
    tr = Trainer(model, tx, dm, n_classes=2, loss_fn=create_loss(), config=cfg,
                 model_name="DTFD")
    hist = tr.fit()
    assert hist["val_auc"] > 0.85, hist


def test_clam_learns_synthetic_signal(tmp_path):
    """CLAM_SB with instance-level clustering loss learns the synthetic task
    (exercises the in/out instance-mining path through the Trainer)."""
    from transmil_deepgraft_tpu.models.clam import CLAM_SB

    dm = MILDataModule(
        n_classes=2, max_bag_size=32, batch_size=1,
        synthetic={"n_train": 64, "n_val": 16, "n_test": 8, "bag_size": 32,
                   "feature_size": 32, "signal": 3.0},
        seed=3,
    )
    model = CLAM_SB(n_classes=2, in_features=32)
    tx = create_optimizer(opt="adam", lr=1e-3, weight_decay=0.0)
    cfg = TrainerConfig(epochs=12, patience=12, log_dir=str(tmp_path), task="norm_rest")
    tr = Trainer(model, tx, dm, n_classes=2, loss_fn=create_loss(), config=cfg,
                 model_name="CLAM_SB")
    hist = tr.fit()
    assert hist["val_auc"] > 0.85, hist


def test_monai_att_trans_learns_synthetic_signal(tmp_path):
    """MONAI att_trans head (transformer encoder + gated attention pooling)
    learns the synthetic task through the Trainer."""
    from transmil_deepgraft_tpu.models.monai_mil import MonaiMIL

    dm = MILDataModule(
        n_classes=2, max_bag_size=32, batch_size=4,
        synthetic={"n_train": 32, "n_val": 16, "n_test": 8, "bag_size": 32,
                   "feature_size": 32, "signal": 3.0},
        seed=4,
    )
    model = MonaiMIL(n_classes=2, in_features=32, mil_mode="att_trans")
    tx = create_optimizer(opt="adam", lr=1e-3, weight_decay=0.0)
    cfg = TrainerConfig(epochs=15, patience=15, log_dir=str(tmp_path), task="norm_rest")
    tr = Trainer(model, tx, dm, n_classes=2, loss_fn=create_loss(), config=cfg,
                 model_name="MonaiMIL")
    hist = tr.fit()
    assert hist["val_auc"] > 0.85, hist

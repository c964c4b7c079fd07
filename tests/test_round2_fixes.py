"""Regression tests for the round-2 correctness fixes (VERDICT.md items):

- full resume: optimizer state / epoch counter / early-stop + plateau + lr-scale
  all restored from last.ckpt; a resumed run is bit-identical to straight-through
- DTFD batch>1 guard (the model no longer silently drops slides)
- bagstore fast path applies mixup + the post-pad reshuffle
- kfold: val respects batch_size; ensemble run exports result CSVs + top-k tiles
- multiclass per-class Youden thresholds persisted on val, loaded on test
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transmil_deepgraft_tpu.data.datamodule import MILDataModule
from transmil_deepgraft_tpu.models.attmil import AttMIL
from transmil_deepgraft_tpu.models.dtfd import DTFDMIL
from transmil_deepgraft_tpu.train.losses import create_loss
from transmil_deepgraft_tpu.train.optimizers import create_optimizer
from transmil_deepgraft_tpu.train.trainer import Trainer, TrainerConfig, _get_lr_scale


def _dm(n_classes=2, batch_size=4):
    return MILDataModule(
        n_classes=n_classes,
        max_bag_size=64,
        batch_size=batch_size,
        synthetic={
            "n_train": 16, "n_val": 8, "n_test": 8,
            "bag_size": 64, "feature_size": 64, "signal": 2.0,
        },
        seed=0,
    )


def _trainer(tmp_path, epochs, n_classes=2, subdir="run"):
    dm = _dm(n_classes=n_classes)
    model = AttMIL(n_classes=n_classes, in_features=64, out_features=32, attn_dim=16)
    tx = create_optimizer(opt="adam", lr=1e-3, weight_decay=0.0)
    cfg = TrainerConfig(epochs=epochs, patience=50, log_dir=str(tmp_path / subdir), task="norm_rest")
    return Trainer(model, tx, dm, n_classes=n_classes, loss_fn=create_loss(), config=cfg, model_name="AttMIL")


def test_full_resume_bit_identical(tmp_path):
    # straight-through 4 epochs
    straight = _trainer(tmp_path, epochs=4, subdir="straight")
    straight.fit()

    # 2 epochs, then resume from the full train state for 2 more
    first = _trainer(tmp_path, epochs=2, subdir="resumed")
    first.fit()
    second = _trainer(tmp_path, epochs=4, subdir="resumed2")
    assert second.load_train_state(tmp_path / "resumed" / "checkpoints" / "last.ckpt")
    assert second._resume_fit_state["epoch"] == 2
    second.fit()

    for a, b in zip(jax.tree.leaves(straight.params), jax.tree.leaves(second.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state also matches
    for a, b in zip(jax.tree.leaves(straight.opt_state), jax.tree.leaves(second.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_restores_lr_scale_and_counters(tmp_path):
    tr = _trainer(tmp_path, epochs=2, subdir="lr")
    tr.fit()
    tr.opt_state = jax.tree.map(lambda a: a, tr.opt_state)
    # force a nontrivial fit state + lr scale into the saved checkpoint
    from transmil_deepgraft_tpu.train.trainer import _set_lr_scale
    from transmil_deepgraft_tpu.utils.checkpoints import save_pytree

    tr.opt_state = _set_lr_scale(tr.opt_state, 0.25)
    save_pytree(
        tr.ckpts.last_path(),
        tr._train_state_tree(7, 0.123, 3, 2),
    )
    tr2 = _trainer(tmp_path, epochs=2, subdir="lr2")
    assert tr2.load_train_state(tr.ckpts.last_path())
    assert tr2._resume_fit_state == {
        "epoch": 7, "best_val_loss": pytest.approx(0.123),
        "epochs_since_best": 3, "plateau_since_best": 2,
        "plateau_best": float("inf"),
    }
    assert _get_lr_scale(tr2.opt_state) == pytest.approx(0.25)


def test_load_train_state_falls_back_on_weights_only(tmp_path):
    tr = _trainer(tmp_path, epochs=1, subdir="wo")
    tr.fit()
    from transmil_deepgraft_tpu.utils.checkpoints import save_pytree

    save_pytree(tmp_path / "weights_only.ckpt", {"params": tr.params})
    tr2 = _trainer(tmp_path, epochs=1, subdir="wo2")
    assert tr2.load_train_state(tmp_path / "weights_only.ckpt") is False
    for a, b in zip(jax.tree.leaves(tr.params), jax.tree.leaves(tr2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dtfd_rejects_batch_gt_one(rng):
    model = DTFDMIL(n_classes=2, in_features=32)
    x1 = jnp.asarray(rng.standard_normal((1, 240, 32)).astype(np.float32))
    variables = model.init({"params": jax.random.key(0)}, x1)
    x2 = jnp.asarray(rng.standard_normal((2, 240, 32)).astype(np.float32))
    with pytest.raises(ValueError, match="one slide at a time"):
        model.apply(variables, x2)


def test_bagstore_mixup_and_reshuffle(tmp_path, rng):
    pytest.importorskip("h5py")
    import h5py

    feat_dir = tmp_path / "FEATURES_RETCCL_2048"
    feat_dir.mkdir(parents=True)
    entries = []
    for i in range(6):
        n = int(rng.integers(20, 40))  # shorter than max_bag_size -> zero pad
        with h5py.File(feat_dir / f"s{i}.h5", "w") as f:
            f["features"] = np.abs(rng.standard_normal((n, 16)).astype(np.float32)) + 0.5
            f["coords"] = np.zeros((n, 2), np.int32)
        entries.append([f"FEATURES_RETCCL_2048/s{i}.h5", i % 2])
    (tmp_path / "labels.json").write_text(
        json.dumps({"train": entries, "val": entries, "test": entries})
    )

    def batches(mixup):
        dm = MILDataModule(
            data_dir=str(tmp_path), label_path=str(tmp_path / "labels.json"),
            n_classes=2, max_bag_size=64, batch_size=2, mixup=mixup, seed=1,
        )
        dm.enable_bagstore(path=str(tmp_path / f"store_{mixup}.bags"), rebuild=True)
        return next(iter(dm.train_batches(epoch=0)))

    plain = batches(False)
    mixed = batches(True)

    # without mixup: zero pad rows exist but are NOT a trailing block (reshuffled)
    zero_rows = ~np.any(plain.bags[0] != 0, axis=-1)
    assert zero_rows.sum() > 0
    assert not zero_rows[-zero_rows.sum():].all() or zero_rows.sum() == 0 or (
        zero_rows[: -zero_rows.sum()].any()
    ), "pad rows were left as a trailing block"

    # with mixup: convex combos fill (part of) the pad -> fewer zero rows
    assert (~np.any(mixed.bags[0] != 0, axis=-1)).sum() < zero_rows.sum()


def test_multiclass_thresholds_persist_and_load(tmp_path):
    tr = _trainer(tmp_path, epochs=1, n_classes=3, subdir="mc")
    tr.fit()
    val = tr.evaluate("val")
    assert len(val["thresholds"]) == 3
    csv = tmp_path / "mc" / "val_thresholds.csv"
    assert csv.exists()
    import pandas as pd

    row = pd.read_csv(csv).iloc[0]
    assert all(f"class_{c}" in row for c in range(3))

    # test stage loads the persisted thresholds
    test = tr.evaluate("test")
    assert test["thresholds"] == pytest.approx([float(row[f"class_{c}"]) for c in range(3)])


def test_kfold_val_batching_and_ensemble_exports(tmp_path):
    from transmil_deepgraft_tpu.train.kfold import FoldDataModule, run_kfold

    dm = _dm()
    fold_dm = FoldDataModule(dm, np.arange(12), np.arange(12, 16))
    sizes = [b.bags.shape[0] for b in fold_dm.eval_batches("val", batch_size=3)]
    assert sizes == [3, 1]

    def build(fold_dm, log_dir):
        model = AttMIL(n_classes=2, in_features=64, out_features=32, attn_dim=16)
        tx = create_optimizer(opt="adam", lr=1e-3, weight_decay=0.0)
        cfg = TrainerConfig(epochs=1, patience=5, log_dir=log_dir, task="norm_rest")
        return Trainer(model, tx, fold_dm, n_classes=2, loss_fn=create_loss(), config=cfg)

    result = run_kfold(build, dm, nfold=2, export_dir=tmp_path / "kf", seed=0)
    assert (tmp_path / "kf" / "ensemble_metrics.json").exists()
    # ensemble result CSVs (written into the last fold trainer's log dir)
    assert list((tmp_path / "kf").glob("fold*/ENSEMBLE_RESULT_PATIENT.csv"))
    assert list((tmp_path / "kf").glob("fold*/ensemble_c0_top_patients.csv"))


@pytest.mark.parametrize("autosave_async", [True, False])
def test_autosave_steps_mid_epoch(tmp_path, autosave_async):
    """autosave_steps writes a resumable FULL train state mid-epoch
    (preemption safety the reference lacks: its saves are epoch-granular).
    Covers both the background-thread writer (default) and the inline one."""
    import jax

    from transmil_deepgraft_tpu.data.datamodule import MILDataModule
    from transmil_deepgraft_tpu.models import AttMIL
    from transmil_deepgraft_tpu.train.losses import create_loss
    from transmil_deepgraft_tpu.train.optimizers import create_optimizer
    from transmil_deepgraft_tpu.train.trainer import Trainer, TrainerConfig

    dm = MILDataModule(
        n_classes=2, max_bag_size=16, batch_size=2,
        synthetic={"n_train": 8, "n_val": 4, "n_test": 4, "bag_size": 16,
                   "feature_size": 16, "signal": 2.0},
        seed=0,
    )
    model = AttMIL(n_classes=2, in_features=16, out_features=8, attn_dim=4)
    tx = create_optimizer(opt="adam", lr=1e-3, weight_decay=0.0)
    cfg = TrainerConfig(epochs=1, log_dir=str(tmp_path), task="norm_rest",
                        autosave_steps=2, autosave_async=autosave_async)
    tr = Trainer(model, tx, dm, n_classes=2, loss_fn=create_loss(), config=cfg,
                 model_name="AttMIL")
    tr.fit()
    assert tr.ckpts.last_path().exists()

    # a fresh trainer restores the autosaved full state (params + opt_state)
    tr2 = Trainer(model, tx, dm, n_classes=2, loss_fn=create_loss(), config=cfg,
                  model_name="AttMIL")
    assert tr2.load_train_state(tr.ckpts.last_path())
    for a, b in zip(jax.tree.leaves(tr.params), jax.tree.leaves(tr2.params)):
        import numpy as np

        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

"""Regression tests for the round-3 advisor fixes (ADVICE.md):

- orbax-backed trainer runs can be resumed from their own checkpoints
  (trainer load paths route through load_pytree's backend autodetection)
- orbax restore is structure-aware: >10 positional children and namedtuple
  fields (optax opt_state shapes) land in the right slots instead of being
  zipped in lexicographic flatten order
- mixed_res_dirs candidate resolution matches the primary lookup (shared
  helper) and records misses
"""

import collections

import jax
import numpy as np
import pytest

from transmil_deepgraft_tpu.utils.checkpoints import load_pytree, save_pytree


def test_orbax_restores_positional_structures(tmp_path):
    # 12 positional children: lexicographic key order would visit
    # 0,1,10,11,2,... and scramble a flatten-order zip.
    tup = tuple(np.full((2,), i, np.float32) for i in range(12))
    State = collections.namedtuple("State", ["mu", "nu", "count"])
    nt = State(
        mu=np.full((3,), 7.0, np.float32),
        nu=np.full((3,), 9.0, np.float32),
        count=np.asarray(5),
    )
    tree = {"chain": tup, "adam": nt}
    save_pytree(tmp_path / "ck", tree, backend="orbax")

    target = {
        "chain": tuple(np.zeros((2,), np.float32) for _ in range(12)),
        "adam": State(
            mu=np.zeros((3,), np.float32),
            nu=np.zeros((3,), np.float32),
            count=np.asarray(0),
        ),
    }
    got = load_pytree(tmp_path / "ck", target)
    for i in range(12):
        np.testing.assert_array_equal(got["chain"][i], np.full((2,), i, np.float32))
    np.testing.assert_array_equal(got["adam"].mu, nt.mu)
    np.testing.assert_array_equal(got["adam"].nu, nt.nu)
    np.testing.assert_array_equal(got["adam"].count, nt.count)


def _orbax_trainer(tmp_path, epochs, subdir):
    from transmil_deepgraft_tpu.data.datamodule import MILDataModule
    from transmil_deepgraft_tpu.models.attmil import AttMIL
    from transmil_deepgraft_tpu.train.losses import create_loss
    from transmil_deepgraft_tpu.train.optimizers import create_optimizer
    from transmil_deepgraft_tpu.train.trainer import Trainer, TrainerConfig

    dm = MILDataModule(
        n_classes=2, max_bag_size=32, batch_size=4,
        synthetic={"n_train": 8, "n_val": 4, "n_test": 4,
                   "bag_size": 32, "feature_size": 32, "signal": 2.0},
        seed=0,
    )
    model = AttMIL(n_classes=2, in_features=32, out_features=16, attn_dim=8)
    tx = create_optimizer(opt="adam", lr=1e-3, weight_decay=0.0)
    cfg = TrainerConfig(
        epochs=epochs, patience=50, log_dir=str(tmp_path / subdir),
        task="norm_rest", ckpt_backend="orbax",
    )
    return Trainer(model, tx, dm, n_classes=2, loss_fn=create_loss(),
                   config=cfg, model_name="AttMIL")


def test_orbax_trainer_resume_bit_identical(tmp_path):
    """An orbax-backed run resumes from its own last.ckpt directory
    (round-2 advisor: raw read_bytes raised IsADirectoryError here)."""
    straight = _orbax_trainer(tmp_path, epochs=4, subdir="straight")
    straight.fit()

    first = _orbax_trainer(tmp_path, epochs=2, subdir="resumed")
    first.fit()
    last = tmp_path / "resumed" / "checkpoints" / "last.ckpt"
    assert last.is_dir()  # orbax = directory-per-checkpoint
    second = _orbax_trainer(tmp_path, epochs=4, subdir="resumed2")
    assert second.load_train_state(last)
    assert second._resume_fit_state["epoch"] == 2
    second.fit()

    for a, b in zip(jax.tree.leaves(straight.params), jax.tree.leaves(second.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(straight.opt_state), jax.tree.leaves(second.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_weights_only_eval_load(tmp_path):
    tr = _orbax_trainer(tmp_path, epochs=1, subdir="wo")
    tr.fit()
    best = tr.ckpts.best_path("val_loss") or tr.ckpts.last_path()
    tr2 = _orbax_trainer(tmp_path, epochs=1, subdir="wo2")
    tr2.load_checkpoint(best)
    for a, b in zip(jax.tree.leaves(tr.params), jax.tree.leaves(tr2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mixed_res_shared_resolution_and_miss_record(tmp_path):
    """mixed_res_dirs roots resolve with the same candidate list as the
    primary lookup (incl. the extension-less -> .h5 variant) and record
    misses in mixed_res_missing."""
    import h5py

    from transmil_deepgraft_tpu.data.feature_bags import FeatureBagDataset

    main_root = tmp_path / "res224"
    extra_root = tmp_path / "res1024"
    for root, names in ((main_root, ["a", "b"]), (extra_root, ["a"])):
        root.mkdir()
        for n in names:
            with h5py.File(root / f"{n}.h5", "w") as f:
                f["features"] = np.random.default_rng(0).standard_normal((6, 8)).astype(np.float32)
                f["coords"] = np.zeros((6, 2), np.int32)
    labels = {"train": [["a", 0], ["b", 1]]}
    import json

    (tmp_path / "labels.json").write_text(json.dumps(labels))
    ds = FeatureBagDataset(
        main_root, tmp_path / "labels.json", "train", n_classes=2,
        mixed_res_dirs=[extra_root],
    )
    # a appears twice (main + extra res), b once; extra-res b recorded missing
    assert ds.names.count("a") == 2
    assert ds.names.count("b") == 1
    assert len(ds.mixed_res_missing) == 1 and "b" in ds.mixed_res_missing[0]
    assert ds.missing == []


def test_loss_factory_full_reference_surface():
    """Every name the reference factory resolves builds and yields a finite
    scalar; names it rejects raise with a one-line reason (VERDICT r2 #7).
    Ref: MyLoss/loss_factory.py:21-62."""
    import jax.numpy as jnp

    from transmil_deepgraft_tpu.train.losses import (
        bce_with_logits,
        create_loss,
        dice_log_loss,
        jaccard_loss,
    )

    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((6, 3)).astype(np.float32))
    onehot = jnp.asarray(np.eye(3, dtype=np.float32)[rng.integers(0, 3, 6)])

    names = [
        "CrossEntropyLoss", "BCEWithLogitsLoss", "LabelSmoothingCrossEntropy",
        "MSELoss", "L1Loss", "SmoothL1Loss", "focal", "reduced_focal",
        "polyloss", "dice", "dice_log", "jaccard", "jaccard_log", "lovasz",
        "bce+lovasz", "bce+jaccard", "bce+log_jaccard", "bce+log_dice",
    ]
    for name in names:
        fn = create_loss(name)
        val = float(fn(logits, onehot))
        assert np.isfinite(val), (name, val)

    # joint combos follow the reference JointLoss weights w1=1.0, w2=0.5
    joint = create_loss("bce+log_dice")
    expect = float(bce_with_logits(logits, onehot)) + 0.5 * float(
        dice_log_loss(logits, onehot)
    )
    assert abs(float(joint(logits, onehot)) - expect) < 1e-6

    # ref quirk preserved: jaccard_log IS the plain jaccard loss
    assert create_loss("jaccard_log") is jaccard_loss

    # segmentation-era modules the reference factory also rejects
    for name in ("boundary", "hausdorff", "nd_topk"):
        with pytest.raises(NotImplementedError, match="segmentation-era"):
            create_loss(name)
    with pytest.raises(KeyError, match="unknown loss"):
        create_loss("NoSuchLoss")


def test_loss_torch_parity_mse_smoothl1():
    """nn.* names resolved like the reference (loss(logits, one_hot.float()))."""
    torch = pytest.importorskip("torch")

    import jax.numpy as jnp

    from transmil_deepgraft_tpu.train.losses import create_loss

    rng = np.random.default_rng(5)
    logits = rng.standard_normal((5, 4)).astype(np.float32)
    onehot = np.eye(4, dtype=np.float32)[rng.integers(0, 4, 5)]
    tl, tt = torch.from_numpy(logits), torch.from_numpy(onehot)
    for name, tfn in (
        ("MSELoss", torch.nn.MSELoss()),
        ("L1Loss", torch.nn.L1Loss()),
        ("SmoothL1Loss", torch.nn.SmoothL1Loss()),
    ):
        ours = float(create_loss(name)(jnp.asarray(logits), jnp.asarray(onehot)))
        ref = float(tfn(tl, tt))
        assert abs(ours - ref) < 1e-6, (name, ours, ref)


def test_epoch_figures_rendered(tmp_path):
    """Train-stage figure parity (VERDICT r2 weak #7): val ROC/PR per epoch,
    train confusion at epoch 10 (ref model_interface.py:385-430)."""
    from transmil_deepgraft_tpu.data.datamodule import MILDataModule
    from transmil_deepgraft_tpu.models.attmil import AttMIL
    from transmil_deepgraft_tpu.train.losses import create_loss
    from transmil_deepgraft_tpu.train.optimizers import create_optimizer
    from transmil_deepgraft_tpu.train.trainer import Trainer, TrainerConfig

    dm = MILDataModule(
        n_classes=2, max_bag_size=16, batch_size=4,
        synthetic={"n_train": 8, "n_val": 4, "n_test": 4,
                   "bag_size": 16, "feature_size": 16, "signal": 2.0},
        seed=0,
    )
    model = AttMIL(n_classes=2, in_features=16, out_features=8, attn_dim=4)
    cfg = TrainerConfig(epochs=10, patience=50, log_dir=str(tmp_path / "run"),
                        task="norm_rest")
    tr = Trainer(model, create_optimizer(opt="adam", lr=1e-3, weight_decay=0.0),
                 dm, n_classes=2, loss_fn=create_loss(), config=cfg,
                 model_name="AttMIL")
    tr.fit()
    figs = tmp_path / "run" / "figures"
    assert (figs / "val_patient_roc_epoch000.png").exists()
    assert (figs / "val_patient_pr_epoch009.png").exists()
    assert (figs / "train_confusion_epoch009.png").exists()

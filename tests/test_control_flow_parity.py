"""Multi-epoch control-flow parity vs torch/Lightning semantics (VERDICT r3
item 4).

One deterministic multi-epoch run of the real ``Trainer`` on synthetic data
(tiny train split, larger val split -> the val loss genuinely plateaus), then
the per-epoch ``val_loss`` series recorded by the run is fed to SCRIPTED
oracles with the reference stack's exact semantics:

* ``torch.optim.lr_scheduler.ReduceLROnPlateau`` (the actual torch class, on a
  dummy optimizer) stepped once per ``reduce_lr_every`` epochs, as Lightning's
  ``frequency`` does (ref ``model_interface.py:873``) — the trainer's
  ``lr_scale`` trajectory must change at the SAME epochs by the SAME factors.
* Lightning ``EarlyStopping(monitor=val_loss, min_delta=0, mode=min)``
  wait-count logic (ref ``utils/utils.py:144-151``) — the run must stop after
  the SAME epoch.
* Lightning ``ModelCheckpoint`` incremental top-k retention per monitor
  (val_loss min k=3 / val_auc max k=1 / val_accuracy max k=3, ref
  ``utils/utils.py:195-217``) — the files left in checkpoints/ must be exactly
  the union the oracle retains.

Plus: SWA averaged weights equal the plain mean of the per-epoch parameters
over the SWA window (ref ``StochasticWeightAveraging``; the LR-annealing part
of Lightning's SWA is a pinned deviation — see PARITY.md).
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import numpy as np
import pytest

from transmil_deepgraft_tpu.data.datamodule import MILDataModule
from transmil_deepgraft_tpu.models import create_model
from transmil_deepgraft_tpu.train.losses import create_loss
from transmil_deepgraft_tpu.train.optimizers import create_optimizer
from transmil_deepgraft_tpu.train.trainer import Trainer, TrainerConfig


def _fit(tmp_path, *, epochs, patience, reduce_lr_every, reduce_lr_patience,
         swa=False, swa_start_frac=0.75, subdir="run", keep_all_ckpts=False):
    dm = MILDataModule(
        n_classes=2, max_bag_size=16, batch_size=4,
        synthetic={"n_train": 8, "n_val": 24, "n_test": 8, "bag_size": 16,
                   "feature_size": 24, "signal": 1.0},
        seed=11,
    )
    model = create_model("AttMIL", n_classes=2, in_features=24, out_features=16)
    tx = create_optimizer(opt="adam", lr=5e-3, weight_decay=0.0)
    cfg = TrainerConfig(
        epochs=epochs, patience=patience, log_dir=str(tmp_path / subdir),
        task="norm_rest", reduce_lr_every=reduce_lr_every,
        reduce_lr_patience=reduce_lr_patience, min_lr_scale=1e-6,
        swa=swa, swa_start_frac=swa_start_frac, epoch_figures=False,
    )
    tr = Trainer(model, tx, dm, n_classes=2, loss_fn=create_loss(), config=cfg,
                 model_name="AttMIL")
    if keep_all_ckpts:
        from transmil_deepgraft_tpu.utils.checkpoints import CheckpointManager

        tr.ckpts = CheckpointManager(
            Path(cfg.log_dir) / "checkpoints", monitors=(("val_loss", "min", 1000),)
        )
    tr.fit()
    return tr, Path(cfg.log_dir)


def _epoch_series(log_dir: Path):
    rows = [json.loads(l) for l in (log_dir / "metrics.jsonl").read_text().splitlines()]
    rows = [r for r in rows if "val_loss" in r]
    return rows


def test_plateau_earlystop_checkpoints_vs_torch_oracle(tmp_path):
    torch = pytest.importorskip("torch")

    EPOCHS, PATIENCE, EVERY, SCHED_PATIENCE = 40, 8, 1, 2
    tr, log_dir = _fit(
        tmp_path, epochs=EPOCHS, patience=PATIENCE,
        reduce_lr_every=EVERY, reduce_lr_patience=SCHED_PATIENCE,
    )
    rows = _epoch_series(log_dir)
    val_losses = [r["val_loss"] for r in rows]
    logged_scale = [r["lr_scale"] for r in rows]
    n_run = len(rows)
    assert n_run >= 5

    # --- ReduceLROnPlateau: the REAL torch scheduler as oracle -------------
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=SCHED_PATIENCE
    )
    oracle_scale_after = []
    for e, v in enumerate(val_losses):
        if (e + 1) % EVERY == 0:  # Lightning scheduler dict frequency
            sched.step(v)
        oracle_scale_after.append(opt.param_groups[0]["lr"])
    # trainer logs lr_scale BEFORE that epoch's scheduler step, so the logged
    # series is [1.0, oracle_after_0, oracle_after_1, ...]
    expected = [1.0] + oracle_scale_after[:-1]
    np.testing.assert_allclose(logged_scale, expected, rtol=1e-6)
    assert min(oracle_scale_after) < 1.0, "no LR reduction happened — vacuous run"

    # --- EarlyStopping: Lightning wait-count semantics ---------------------
    best, wait, stop_after = float("inf"), 0, None
    for e, v in enumerate(val_losses + [float("inf")] * EPOCHS):
        if e >= EPOCHS:
            break
        if v < best:
            best, wait = v, 0
        else:
            wait += 1
        if wait >= PATIENCE:
            stop_after = e
            break
    assert stop_after is not None, "early stop never fired — vacuous run"
    assert n_run == stop_after + 1, (n_run, stop_after, val_losses)

    # --- ModelCheckpoint retention: Lightning incremental top-k ------------
    def lightning_topk(series, mode, k):
        """series: [(epoch, value)] in arrival order -> retained epoch set."""
        kept: list[tuple[float, int]] = []  # (value, epoch)
        for e, v in series:
            if len(kept) < k:
                kept.append((v, e))
            else:
                worst = max(kept)[0] if mode == "min" else min(kept)[0]
                better = v < worst if mode == "min" else v > worst
                if better:
                    kept.remove(max(kept) if mode == "min" else min(kept))
                    kept.append((v, e))
        return {e for _, e in kept}

    series_loss = [(r["step"], r["val_loss"]) for r in rows]
    series_auc = [(r["step"], r["val_auc"]) for r in rows]
    series_acc = [(r["step"], r["val_accuracy"]) for r in rows]
    expected_epochs = (
        lightning_topk(series_loss, "min", 3)
        | lightning_topk(series_auc, "max", 1)
        | lightning_topk(series_acc, "max", 3)
    )
    on_disk = {
        int(m.group(1))
        for f in (log_dir / "checkpoints").glob("epoch=*.ckpt")
        if (m := re.match(r"epoch=(\d+)", f.name))
    }
    assert on_disk == expected_epochs, (on_disk, expected_epochs)


def test_swa_average_equals_window_mean(tmp_path):
    import jax

    from transmil_deepgraft_tpu.utils.checkpoints import load_pytree

    EPOCHS = 8
    tr, log_dir = _fit(
        tmp_path, epochs=EPOCHS, patience=100, reduce_lr_every=100,
        reduce_lr_patience=100, swa=True, swa_start_frac=0.5,
        subdir="swa", keep_all_ckpts=True,
    )
    window = range(int(0.5 * EPOCHS), EPOCHS)  # trainer: epoch >= frac * n
    target = {"params": tr.params, "model_state": tr.model_state}
    per_epoch = []
    ckpt_dir = log_dir / "checkpoints"
    for e in window:
        (f,) = [p for p in ckpt_dir.glob(f"epoch={e:02d}-*.ckpt")]
        per_epoch.append(load_pytree(f, target)["params"])
    mean = jax.tree.map(lambda *xs: np.mean(np.stack(xs), axis=0), *per_epoch)
    for a, b in zip(jax.tree.leaves(mean), jax.tree.leaves(tr.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_round3_fullstate_checkpoint_still_resumes(tmp_path):
    """Round-3 full-state last.ckpt layout (fit tree WITHOUT plateau_best)
    must still restore as FULL train state, not fall back to weights-only
    (MIGRATION.md round-4 note)."""
    from transmil_deepgraft_tpu.utils.checkpoints import save_pytree

    tr, log_dir = _fit(tmp_path, epochs=1, patience=10, reduce_lr_every=10,
                       reduce_lr_patience=10, subdir="legacy")
    legacy = tr._legacy_train_state_tree()
    legacy["fit"]["epoch"] = np.int64(5)
    legacy["fit"]["best_val_loss"] = np.float64(0.42)
    legacy["fit"]["epochs_since_best"] = np.int64(2)
    save_pytree(tmp_path / "legacy_last.ckpt", legacy)

    tr2, _ = _fit(tmp_path, epochs=1, patience=10, reduce_lr_every=10,
                  reduce_lr_patience=10, subdir="legacy2")
    assert tr2.load_train_state(tmp_path / "legacy_last.ckpt") is True
    assert tr2._resume_fit_state["epoch"] == 5
    assert tr2._resume_fit_state["best_val_loss"] == pytest.approx(0.42)
    assert "plateau_best" not in tr2._resume_fit_state  # fit loop defaults it

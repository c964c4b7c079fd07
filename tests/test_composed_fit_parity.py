"""Composed fit-vs-fit AUC parity (VERDICT r4 item 1 — the BASELINE.md bar).

BASELINE.md's accuracy claim is "val AUC within 0.005 of the PyTorch reference
per fold/task". Every earlier parity artifact was piecewise (eval path,
optimizer lockstep, control-flow reactions to a GIVEN loss series). This test
composes the whole loop on BOTH sides and compares what the loops *produce*:

  torch oracle loop (this file)              repo Trainer.fit()
  -----------------------------              ------------------
  mil_torch.TransMIL (.eval(), pinv          models.TransMIL
    init-scale detached — PARITY dev. 5)       (train_deterministic=True)
  Lookahead(ReferenceRAdam) k=6 a=0.5        create_optimizer('lookahead_radam')
  REAL torch ReduceLROnPlateau -> lr scale   trainer plateau block -> lr_scale
  Lightning EarlyStopping wait-count         trainer early-stop block
  identical batches: a second MILDataModule  MILDataModule(seed) — sampler,
    constructed with the same seed             max_bag_size subsample, pad,
                                               post-pad shuffle all replayed
  sklearn AUC + independent positive-filter  trainer evaluate(): train/metrics
    patient aggregation                        auroc + aggregate_patients

Same converted initial weights, same cohort, dropout off on both sides (torch
masks cannot be shared with flax; sanctioned by VERDICT r4 item 1). The run is
arranged so BOTH control-flow events fire inside it: at least one LR reduction
and the early stop.

Reference loop being mirrored: ``/root/reference/code/models/model_interface.py
:108-1320`` (training_step/validation_epoch_end) driven by ``train.py:271``
(trainer.fit) with the callbacks from ``utils/utils.py:144-217``.

DTFD variant: the two-optimizer schedule (``model_interface_dtfd.py:594-607``,
two Adams + MultiStepLR) composed through the same fit loop.

Measured deltas are recorded in PARITY.md ("Composed-loop parity").
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.torch_ref import mil_torch  # noqa: E402
from tests.torch_ref.torch_opt import Lookahead, ReferenceRAdam  # noqa: E402
from transmil_deepgraft_tpu.data.datamodule import MILDataModule  # noqa: E402
from transmil_deepgraft_tpu.models import TransMIL  # noqa: E402
from transmil_deepgraft_tpu.models.dtfd import DTFDMIL  # noqa: E402
from transmil_deepgraft_tpu.train.losses import create_loss  # noqa: E402
from transmil_deepgraft_tpu.train.optimizers import (  # noqa: E402
    create_dtfd_optimizer,
    create_optimizer,
)
from transmil_deepgraft_tpu.train.trainer import Trainer, TrainerConfig  # noqa: E402
from transmil_deepgraft_tpu.utils.torch_weights import (  # noqa: E402
    convert_dtfd_state_dict,
    convert_transmil_state_dict,
)

IN_F, OUT_F, N_CLS = 128, 64, 2
LR = 2e-4  # the reference default config's lookahead_radam lr
EPOCHS, PATIENCE = 100, 8
EVERY, SCHED_PATIENCE, FACTOR = 1, 3, 0.5
SEED = 13
AUC_TOL = 0.005  # BASELINE.md: "val AUC within 0.005"


def _make_dm(**overrides):
    """One cohort recipe; constructed twice (same args => bit-identical
    batches, including the imbalanced-sampler draws, the max_bag_size
    subsample, zero-pad and post-pad shuffle)."""
    args = dict(
        n_classes=N_CLS,
        max_bag_size=64,
        batch_size=1,
        use_imbalanced_sampler=True,
        synthetic={
            "n_train": 24, "n_val": 32, "n_test": 8, "bag_size": 96,
            "feature_size": IN_F, "signal": 0.22, "variable_bags": False,
        },
        seed=SEED,
    )
    args.update(overrides)
    return MILDataModule(**args)


def _detached_iter_pinv(mat: torch.Tensor, iters: int = 6) -> torch.Tensor:
    """iter_pinv with the init scale detached — the JAX side's documented
    gradient semantics (ops/pinv.py stop_gradient, PARITY.md deviation 5)."""
    a = torch.abs(mat)
    z = mat.transpose(-1, -2) / (a.sum(-1).max() * a.sum(-2).max()).detach()
    eye = torch.eye(mat.shape[-1], dtype=mat.dtype)
    for _ in range(iters):
        mz = mat @ z
        z = 0.25 * z @ (13 * eye - mz @ (15 * eye - mz @ (7 * eye - mz)))
    return z


def _sk_auc(labels: np.ndarray, pos_scores: np.ndarray) -> float:
    from sklearn.metrics import roc_auc_score

    return float(roc_auc_score(labels, pos_scores))


def _patient_auc(probs: np.ndarray, labels: np.ndarray, patients: list[str]) -> float:
    """Independent reimplementation of the reference's patient aggregation
    (positive-argmax slide filter then mean, ``model_interface.py:519-562``),
    scored with sklearn — deliberately NOT train/aggregation.py."""
    order, per, tgt = [], {}, {}
    for p, pr, t in zip(patients, probs, labels):
        if p not in per:
            per[p] = []
            tgt[p] = int(t)
            order.append(p)
        per[p].append(pr)
    scores, targets = [], []
    for p in order:
        s = np.stack(per[p])
        pos = s.argmax(-1) == 1
        if pos.any():
            s = s[pos]
        scores.append(s.mean(0))
        targets.append(tgt[p])
    return _sk_auc(np.asarray(targets), np.stack(scores)[:, 1])


def _val_metrics_torch(model, dm) -> dict:
    probs_l, logits_l, labels_l, patients = [], [], [], []
    with torch.no_grad():
        for b in dm.eval_batches("val", batch_size=1):
            lg = model(torch.from_numpy(np.ascontiguousarray(b.bags)))
            logits_l.append(lg.numpy())
            labels_l.append(np.asarray(b.labels))
            patients += b.patients
    logits = np.concatenate(logits_l).astype(np.float64)
    labels = np.concatenate(labels_l)
    # identical CE formula to trainer.evaluate (log-softmax, mean over slides)
    mx = logits.max(-1, keepdims=True)
    logp = logits - np.log(np.exp(logits - mx).sum(-1, keepdims=True)) - mx
    loss = float(-np.mean(logp[np.arange(len(labels)), labels]))
    probs = np.exp(logp)
    return {
        "val_loss": loss,
        "val_auc": _sk_auc(labels, probs[:, 1]),
        "val_patient_auc": _patient_auc(probs, labels, patients),
    }


def _torch_oracle_fit(model, dm, step_fn) -> list[dict]:
    """The reference fit loop, composed: train epochs over dm.train_batches,
    REAL torch ReduceLROnPlateau (on a dummy optimizer; its factor scales the
    ReferenceRAdam lr exactly as Lightning scales timm Lookahead's inner
    param_groups), Lightning EarlyStopping wait-count, per-epoch val metrics.

    ``step_fn(batch, lr_scale)`` performs one optimization step and returns
    the train loss (injected so TransMIL and DTFD share this loop)."""
    dummy = torch.nn.Parameter(torch.zeros(1))
    dopt = torch.optim.SGD([dummy], lr=1.0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        dopt, mode="min", factor=FACTOR, patience=SCHED_PATIENCE
    )
    best, wait = float("inf"), 0
    hist: list[dict] = []
    for epoch in range(EPOCHS):
        scale = dopt.param_groups[0]["lr"]
        for batch in dm.train_batches(epoch):
            step_fn(batch, scale)
        row = _val_metrics_torch(model, dm)
        row["lr_scale"] = scale
        hist.append(row)
        # EarlyStopping (ref utils.py:144-151): improvement iff < best - 0
        if row["val_loss"] < best:
            best, wait = row["val_loss"], 0
        else:
            wait += 1
        stop = wait >= PATIENCE
        # scheduler step AFTER the early-stop bookkeeping, like the trainer
        if (epoch + 1) % EVERY == 0:
            sched.step(row["val_loss"])
        if stop:
            break
    return hist


def _jax_fit(tmp_path, dm, tr_params, model, tx, model_name) -> list[dict]:
    cfg = TrainerConfig(
        epochs=EPOCHS, patience=PATIENCE, log_dir=str(tmp_path / "jax_run"),
        task="norm_rest", reduce_lr_every=EVERY,
        reduce_lr_patience=SCHED_PATIENCE, reduce_lr_factor=FACTOR,
        min_lr_scale=1e-9, train_deterministic=True, epoch_figures=False,
        export_topk_tiles=False, seed=SEED,
    )
    tr = Trainer(model, tx, dm, n_classes=N_CLS, loss_fn=create_loss(),
                 config=cfg, model_name=model_name)
    first = next(iter(dm.train_batches(epoch=0)))
    tr.init_params(first)
    tr.params = jax.tree.map(jnp.asarray, tr_params)
    tr.opt_state = tr.tx.init(tr.params)
    tr.fit()
    rows = [
        json.loads(l)
        for l in (Path(cfg.log_dir) / "metrics.jsonl").read_text().splitlines()
    ]
    return [r for r in rows if "val_loss" in r]


def _assert_composed_parity(jax_rows, torch_rows):
    assert len(jax_rows) == len(torch_rows), (
        f"early stop fired after different epochs: jax={len(jax_rows)} "
        f"torch={len(torch_rows)}"
    )
    # the run must exercise both control-flow events, or the test is vacuous
    assert len(jax_rows) < EPOCHS, "early stop never fired — vacuous run"
    scales_j = [r["lr_scale"] for r in jax_rows]
    scales_t = [r["lr_scale"] for r in torch_rows]
    np.testing.assert_allclose(scales_j, scales_t, rtol=1e-6)
    assert min(scales_t) < 1.0, "no LR reduction inside the run — vacuous run"

    vj = np.array([r["val_loss"] for r in jax_rows])
    vt = np.array([r["val_loss"] for r in torch_rows])
    # composed trajectories drift by float accumulation; the claim is the
    # BASELINE AUC bar, the loss curve is reported as supporting evidence
    assert np.abs(vj - vt).max() <= 2e-2, (vj, vt)

    d_auc = abs(jax_rows[-1]["val_auc"] - torch_rows[-1]["val_auc"])
    d_pat = abs(jax_rows[-1]["val_patient_auc"] - torch_rows[-1]["val_patient_auc"])
    assert d_auc <= AUC_TOL, f"final val AUC delta {d_auc} > {AUC_TOL}"
    assert d_pat <= AUC_TOL, f"final patient AUC delta {d_pat} > {AUC_TOL}"
    # and at the best-val-loss epoch (what checkpoint selection would deploy)
    bj, bt = int(np.argmin(vj)), int(np.argmin(vt))
    assert bj == bt, f"best-val-loss epoch differs: {bj} vs {bt}"
    d_best = abs(jax_rows[bj]["val_auc"] - torch_rows[bt]["val_auc"])
    assert d_best <= AUC_TOL, f"best-epoch val AUC delta {d_best} > {AUC_TOL}"
    return {
        "epochs": len(jax_rows),
        "reductions": int(np.log(min(scales_t)) / np.log(FACTOR) + 0.5),
        "max_val_loss_delta": float(np.abs(vj - vt).max()),
        "final_val_auc": (jax_rows[-1]["val_auc"], torch_rows[-1]["val_auc"]),
        "final_patient_auc": (
            jax_rows[-1]["val_patient_auc"], torch_rows[-1]["val_patient_auc"],
        ),
    }


@pytest.mark.slow
def test_composed_fit_parity_transmil(tmp_path):
    torch.manual_seed(0)
    tmodel = mil_torch.TransMIL(N_CLS, IN_F, OUT_F).eval()  # eval: dropout off
    sd0 = {k: v.detach().clone() for k, v in tmodel.state_dict().items()}

    params = [p for p in tmodel.parameters()]
    radam = ReferenceRAdam(params, lr=LR)
    opt = Lookahead(radam, params, k=6, alpha=0.5)

    def step_fn(batch, scale):
        radam.lr = LR * scale
        x = torch.from_numpy(np.ascontiguousarray(batch.bags))
        y = torch.from_numpy(np.asarray(batch.labels, np.int64))
        loss = F.cross_entropy(tmodel(x), y)
        opt.zero_grad()
        loss.backward()
        opt.step()
        return loss.item()

    orig_pinv = mil_torch.iter_pinv
    mil_torch.iter_pinv = _detached_iter_pinv
    try:
        torch_rows = _torch_oracle_fit(tmodel, _make_dm(), step_fn)
    finally:
        mil_torch.iter_pinv = orig_pinv

    variables = convert_transmil_state_dict(sd0, in_features=IN_F)
    jmodel = TransMIL(n_classes=N_CLS, in_features=IN_F, out_features=OUT_F)
    tx = create_optimizer(opt="lookahead_radam", lr=LR, weight_decay=0.0)
    jax_rows = _jax_fit(tmp_path, _make_dm(), variables["params"], jmodel, tx,
                        "TransMIL")

    stats = _assert_composed_parity(jax_rows, torch_rows)
    print("composed TransMIL parity:", stats)


DTFD_IN_F, DTFD_MDIM = 64, 48
DTFD_LR, DTFD_WD, DTFD_GAMMA = 1e-3, 1e-2, 0.2
DTFD_MILESTONE = 10  # LR drop (gamma 0.2) at epoch 10 — inside the run


@pytest.mark.slow
def test_composed_fit_parity_dtfd(tmp_path):
    """The DTFD two-optimizer schedule composed through the same loop: two
    Adams (tier-1 dimreduction/attention/classifier, tier-2 attCls) under
    MultiStepLR(milestones=[6], gamma=0.2), averaged two-tier loss, early
    stopping (ref ``model_interface_dtfd.py:268,594-607``). No plateau — the
    reference DTFD interface configures MultiStepLR, not ReduceLROnPlateau."""
    dm_args = dict(
        max_bag_size=240,
        synthetic={
            "n_train": 20, "n_val": 24, "n_test": 8, "bag_size": 280,
            "feature_size": DTFD_IN_F, "signal": 0.16, "variable_bags": False,
        },
    )
    torch.manual_seed(0)
    tmodel = mil_torch.DTFDMIL(
        n_classes=N_CLS, in_features=DTFD_IN_F, m_dim=DTFD_MDIM
    ).eval()
    sd0 = {k: v.detach().clone() for k, v in tmodel.state_dict().items()}

    tier1 = (
        list(tmodel.dimreduction.parameters())
        + list(tmodel.attention.parameters())
        + list(tmodel.classifier.parameters())
    )
    tier2 = list(tmodel.attCls.parameters())
    opt0 = torch.optim.Adam(tier1, lr=DTFD_LR, weight_decay=DTFD_WD)
    opt1 = torch.optim.Adam(tier2, lr=DTFD_LR, weight_decay=DTFD_WD)
    sch0 = torch.optim.lr_scheduler.MultiStepLR(opt0, [DTFD_MILESTONE], gamma=DTFD_GAMMA)
    sch1 = torch.optim.lr_scheduler.MultiStepLR(opt1, [DTFD_MILESTONE], gamma=DTFD_GAMMA)

    dm_t = _make_dm(**dm_args)
    best, wait = float("inf"), 0
    torch_rows: list[dict] = []
    for epoch in range(EPOCHS):
        for batch in dm_t.train_batches(epoch):
            x = torch.from_numpy(np.ascontiguousarray(batch.bags))
            y = torch.from_numpy(np.asarray(batch.labels, np.int64))
            sub, slide = tmodel(x, deterministic=True)
            loss = (
                F.cross_entropy(slide, y)
                + F.cross_entropy(sub, y.expand(sub.shape[0]))
            ) / 2.0
            opt0.zero_grad()
            opt1.zero_grad()
            loss.backward()
            opt0.step()
            opt1.step()
        row = _val_metrics_torch(
            _SlideOnly(tmodel), dm_t
        )
        torch_rows.append(row)
        if row["val_loss"] < best:
            best, wait = row["val_loss"], 0
        else:
            wait += 1
        sch0.step()
        sch1.step()
        if wait >= PATIENCE:
            break

    variables = convert_dtfd_state_dict(sd0)
    jmodel = DTFDMIL(n_classes=N_CLS, in_features=DTFD_IN_F, m_dim=DTFD_MDIM)
    dm_j = _make_dm(**dm_args)
    steps_per_epoch = dm_j.steps_per_epoch()
    tx = create_dtfd_optimizer(
        lr=DTFD_LR, weight_decay=DTFD_WD, steps_per_epoch=steps_per_epoch,
        milestone_epochs=(DTFD_MILESTONE,), gamma=DTFD_GAMMA,
    )
    cfg = TrainerConfig(
        epochs=EPOCHS, patience=PATIENCE, log_dir=str(tmp_path / "jax_dtfd"),
        task="norm_rest", reduce_lr_every=10_000,  # plateau disabled
        train_deterministic=True, epoch_figures=False, export_topk_tiles=False,
        seed=SEED,
    )
    tr = Trainer(jmodel, tx, dm_j, n_classes=N_CLS, loss_fn=create_loss(),
                 config=cfg, model_name="DTFD")
    first = next(iter(dm_j.train_batches(epoch=0)))
    tr.init_params(first)
    tr.params = jax.tree.map(jnp.asarray, variables["params"])
    tr.opt_state = tr.tx.init(tr.params)
    tr.fit()
    jax_rows = [
        json.loads(l)
        for l in (Path(cfg.log_dir) / "metrics.jsonl").read_text().splitlines()
    ]
    jax_rows = [r for r in jax_rows if "val_loss" in r]

    assert len(jax_rows) == len(torch_rows), (len(jax_rows), len(torch_rows))
    assert len(jax_rows) < EPOCHS, "early stop never fired — vacuous run"
    assert len(jax_rows) > DTFD_MILESTONE, (
        "run ended before the MultiStepLR milestone — schedule not exercised"
    )
    vj = np.array([r["val_loss"] for r in jax_rows])
    vt = np.array([r["val_loss"] for r in torch_rows])
    assert np.abs(vj - vt).max() <= 2e-2, (vj, vt)
    d_auc = abs(jax_rows[-1]["val_auc"] - torch_rows[-1]["val_auc"])
    d_pat = abs(jax_rows[-1]["val_patient_auc"] - torch_rows[-1]["val_patient_auc"])
    assert d_auc <= AUC_TOL, f"final val AUC delta {d_auc} > {AUC_TOL}"
    assert d_pat <= AUC_TOL, f"final patient AUC delta {d_pat} > {AUC_TOL}"
    print("composed DTFD parity:", {
        "epochs": len(jax_rows),
        "max_val_loss_delta": float(np.abs(vj - vt).max()),
        "final_val_auc": (jax_rows[-1]["val_auc"], torch_rows[-1]["val_auc"]),
    })


class _SlideOnly:
    """Adapter: DTFD returns (sub, slide); the shared val-metric helper wants
    logits only (the trainer's eval path uses the slide logits the same way)."""

    def __init__(self, model):
        self.model = model

    def __call__(self, x):
        _, slide = self.model(x, deterministic=True)
        return slide

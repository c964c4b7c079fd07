"""K-fold cross-validation loop + logit-mean ensemble testing.

Equivalent of the reference's custom Lightning loop (``code/train_loop.py:31-495``
+ ``datasets/data_interface.py:358-430``): KFold split over the train set,
per-fold fit + test with weight reset between folds, ``model.{fold}.pt``
exports, and a final EnsembleVotingModel run - mean logits over the fold
checkpoints on the held-out test set.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from transmil_deepgraft_tpu.data.datamodule import Batch, MILDataModule, collate
from transmil_deepgraft_tpu.data.sampler import ImbalancedSampler
from transmil_deepgraft_tpu.train.aggregation import aggregate_patients
from transmil_deepgraft_tpu.train.metrics import auroc, classification_report
from transmil_deepgraft_tpu.utils.checkpoints import load_pytree, save_pytree


class FoldDataModule:
    """View of a base MILDataModule restricted to fold train/val index subsets
    (the reference's ``setup_fold_index`` Subsets, ``data_interface.py:416-419``)."""

    def __init__(self, base: MILDataModule, train_idx: np.ndarray, val_idx: np.ndarray) -> None:
        self.base = base
        self.train_idx = train_idx
        self.val_idx = val_idx
        self.n_classes = base.n_classes
        self.batch_size = base.batch_size
        self.eval_pad = base.eval_pad

    def train_batches(self, epoch: int) -> Iterator[Batch]:
        ds = self.base.dataset("train")
        rng = np.random.default_rng((self.base.seed, epoch))
        labels = [ds.get_labels()[i] for i in self.train_idx]
        if self.base.use_imbalanced_sampler:
            order = self.train_idx[ImbalancedSampler(labels, self.n_classes).sample_epoch(rng)]
        else:
            order = rng.permutation(self.train_idx)
        bs = self.batch_size
        for start in range(0, len(order) - bs + 1, bs):
            items = [self.base._get(ds, int(i), rng) for i in order[start : start + bs]]
            yield collate(items, eval_pad="exact")

    def eval_batches(self, mode: str, batch_size: int = 1) -> Iterator[Batch]:
        if mode == "val":
            ds = self.base.dataset("train")
            rng = np.random.default_rng(0)
            for start in range(0, len(self.val_idx), batch_size):
                items = [
                    self.base._get(ds, int(i), rng)
                    for i in self.val_idx[start : start + batch_size]
                ]
                yield collate(items, eval_pad=self.eval_pad)
        else:
            yield from self.base.eval_batches(mode, batch_size)

    def steps_per_epoch(self) -> int:
        return len(self.train_idx) // self.batch_size

    def dataset(self, mode: str):
        return self.base.dataset(mode)


@dataclass
class KFoldResult:
    fold_metrics: list[dict]
    ensemble_metrics: dict
    checkpoint_paths: list[Path]


class KFoldPreempted(RuntimeError):
    """Raised when a fold's fit was stopped by SIGTERM/SIGINT (graceful
    preemption): the interrupted fold's full train state is in ``fold_dir``;
    completed folds' ``model.{fold}.pt`` exports are already on disk."""

    def __init__(self, fold: int, fold_dir: Path) -> None:
        super().__init__(f"k-fold run preempted during fold {fold} (state in {fold_dir})")
        self.fold = fold
        self.fold_dir = fold_dir


def run_kfold(
    build_trainer: Callable[[object, str], "Trainer"],  # (datamodule, log_dir) -> Trainer
    dm: MILDataModule,
    nfold: int,
    export_dir: str | Path,
    seed: int = 2021,
) -> KFoldResult:
    """Per-fold fit+test, then logit-mean ensemble over fold checkpoints
    (ref ``KFoldLoop`` / ``EnsembleVotingModel``, ``train_loop.py:31-192,413-495``)."""
    from sklearn.model_selection import KFold

    export_dir = Path(export_dir)
    export_dir.mkdir(parents=True, exist_ok=True)
    n = len(dm.dataset("train"))
    splits = list(KFold(n_splits=nfold, shuffle=True, random_state=seed).split(np.arange(n)))

    fold_metrics: list[dict] = []
    ckpt_paths: list[Path] = []
    template_trainer = None
    for fold, (train_idx, val_idx) in enumerate(splits):
        fold_dm = FoldDataModule(dm, np.asarray(train_idx), np.asarray(val_idx))
        trainer = build_trainer(fold_dm, str(export_dir / f"fold{fold}"))
        template_trainer = trainer
        trainer.fit()
        if getattr(trainer, "preempted", False):
            # SIGTERM mid-fold: the fold's train state is saved in its fold
            # dir; testing half-trained weights, exporting them into the
            # ensemble, or starting the next fold would all be wrong
            raise KFoldPreempted(fold, export_dir / f"fold{fold}")
        metrics = trainer.test()
        fold_metrics.append(metrics)
        path = export_dir / f"model.{fold}.pt"
        save_pytree(path, {"params": trainer.params})
        ckpt_paths.append(path)

    # Ensemble: mean logits over fold checkpoints on the test set.
    trainer = template_trainer
    fold_params = [load_pytree(p, {"params": trainer.params})["params"] for p in ckpt_paths]

    def _fwd_args(bags, coords):
        # coord-aware heads (RoFormerMIL) take staged coords positionally
        return (bags, coords) if trainer.coord_aware else (bags,)

    def ensemble_logits(bags: jax.Array, coords=None) -> jax.Array:
        logits = [
            trainer.model.apply({"params": fp}, *_fwd_args(bags, coords), deterministic=True)
            for fp in fold_params
        ]
        logits = [l[1] if isinstance(l, tuple) else l for l in logits]
        return jnp.mean(jnp.stack(logits), axis=0)

    # attention top-k tile export during the ensemble test run (the reference's
    # EnsembleVotingModel exports GradCAM top-k tiles, train_loop.py:67-122);
    # only for heads exposing return_attn (TransMIL family).
    supports_attn = hasattr(trainer.model, "attn_query")
    if supports_attn:
        def attn_rows(params, bags, coords=None):
            _, attn = trainer.model.apply(
                {"params": params}, *_fwd_args(bags, coords),
                deterministic=True, return_attn=True,
            )
            return attn.tile_scores().mean(axis=1)  # (B, n_tokens) mean over heads

        afn = jax.jit(attn_rows)

    efn = jax.jit(ensemble_logits)
    probs_l, labels_l, names, patients = [], [], [], []
    tiles_dir = export_dir / "ensemble_topk_tiles"
    # device-staged batches (trainer prefetch thread): H2D overlaps the
    # previous ensemble dispatch
    for batch, bags, _, coords in trainer._staged_batches(dm.eval_batches("test"), with_labels=False):
        logits = efn(bags, coords)
        probs_l.append(np.asarray(jax.nn.softmax(logits, axis=-1)))
        labels_l.append(batch.labels)
        names += batch.names
        patients += batch.patients
        if supports_attn:
            from transmil_deepgraft_tpu.visualize.heatmap import export_topk_tiles

            # score tiles with the mean attention row across fold checkpoints
            rows = np.mean([np.asarray(afn(fp, bags, coords)) for fp in fold_params], axis=0)
            for j, slide_name in enumerate(batch.names):
                n = int(batch.lengths[j])
                export_topk_tiles(
                    rows[j][:n], batch.coords[j], slide_name,
                    tiles_dir / f"{slide_name}_topk_tiles.csv",
                )
    probs = np.concatenate(probs_l)
    labels = np.concatenate(labels_l)
    agg = aggregate_patients(probs, labels, names, patients, dm.n_classes)
    ensemble = {
        "ensemble_auc": auroc(probs, labels, dm.n_classes),
        "ensemble_patient_auc": auroc(agg.scores, agg.targets, dm.n_classes),
        **classification_report(agg.scores, agg.targets, dm.n_classes).as_dict("ensemble_patient_"),
    }
    (export_dir / "ensemble_metrics.json").write_text(json.dumps(ensemble, indent=2))
    # the ensemble run writes the same result artifacts as a test stage
    trainer._save_results(agg, mode="ensemble")
    trainer._save_topk_patients(agg, [1.0 / dm.n_classes] * dm.n_classes, stage="ensemble")
    return KFoldResult(fold_metrics, ensemble, ckpt_paths)

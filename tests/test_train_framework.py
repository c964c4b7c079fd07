"""Framework tests: losses, optimizers, metrics, aggregation, end-to-end fit."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from transmil_deepgraft_tpu.data.datamodule import MILDataModule
from transmil_deepgraft_tpu.models import AttMIL
from transmil_deepgraft_tpu.train.aggregation import aggregate_patients
from transmil_deepgraft_tpu.train.losses import create_loss, cross_entropy
from transmil_deepgraft_tpu.train.metrics import (
    auroc,
    binary_auroc,
    classification_report,
    youden_j_threshold,
)
from transmil_deepgraft_tpu.train.optimizers import create_optimizer, lookahead_wrap
from transmil_deepgraft_tpu.train.trainer import Trainer, TrainerConfig


def test_cross_entropy_matches_manual():
    logits = jnp.array([[2.0, 0.5], [0.1, 1.0]])
    onehot = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    got = float(cross_entropy(logits, onehot))
    p = np.exp(np.asarray(logits))
    p /= p.sum(-1, keepdims=True)
    want = float(-np.mean(np.log(p[[0, 1], [0, 1]])))
    assert abs(got - want) < 1e-6


def test_loss_factory_names():
    for name in ("CrossEntropyLoss", "focal", "polyloss", "BCEWithLogitsLoss", "dice", "jaccard"):
        fn = create_loss(name, 2)
        out = fn(jnp.ones((2, 2)), jnp.eye(2))
        assert np.isfinite(float(out))
    with pytest.raises(KeyError):
        create_loss("NopeLoss", 2)


@pytest.mark.parametrize("opt", ["adam", "adamw", "radam", "lookahead_radam", "sgd", "novograd", "rmsproptf", "adamp", "nadam"])
def test_optimizer_factory_steps(opt):
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)}
    tx = create_optimizer(opt=opt, lr=1e-2, weight_decay=0.01, params=params)
    state = tx.init(params)
    grads = {"w": jnp.ones((4, 4)), "b": jnp.ones(4)}
    updates, state = tx.update(grads, state, params)
    new_params = optax.apply_updates(params, updates)
    assert float(jnp.abs(new_params["w"] - params["w"]).sum()) > 0


def test_lookahead_sync():
    """After sync_period steps the params must land at slow + alpha*(fast-slow)."""
    inner = optax.sgd(1.0)
    tx = lookahead_wrap(inner, sync_period=2, slow_step_size=0.5)
    params = {"w": jnp.zeros(())}
    state = tx.init(params)
    g = {"w": jnp.ones(())}
    # step1: fast = -1 (no sync)
    u, state = tx.update(g, state, params)
    params = optax.apply_updates(params, u)
    assert params["w"] == -1.0
    # step2: fast would be -2; sync -> slow(0) + 0.5*(-2-0) = -1
    u, state = tx.update(g, state, params)
    params = optax.apply_updates(params, u)
    assert params["w"] == -1.0
    assert float(state.slow_params["w"]) == -1.0


def test_binary_auroc_matches_sklearn(rng):
    from sklearn.metrics import roc_auc_score

    scores = rng.random(200)
    labels = (rng.random(200) > 0.4).astype(int)
    assert abs(binary_auroc(scores, labels) - roc_auc_score(labels, scores)) < 1e-9


def test_multiclass_auroc_matches_sklearn(rng):
    from sklearn.metrics import roc_auc_score

    probs = rng.random((100, 3))
    probs /= probs.sum(-1, keepdims=True)
    labels = rng.integers(0, 3, 100)
    got = auroc(probs, labels, 3)
    want = np.mean(
        [roc_auc_score((labels == c).astype(int), probs[:, c]) for c in range(3)]
    )
    assert abs(got - want) < 1e-9


def test_youden_threshold():
    scores = np.array([0.1, 0.2, 0.8, 0.9])
    labels = np.array([0, 0, 1, 1])
    fpr, tpr, thr = youden_j_threshold(scores, labels)
    assert tpr == 1.0 and fpr == 0.0
    assert 0.2 < thr <= 0.8


def test_classification_report_binary():
    probs = np.array([[0.9, 0.1], [0.2, 0.8], [0.3, 0.7], [0.6, 0.4]])
    labels = np.array([0, 1, 1, 0])
    rep = classification_report(probs, labels, 2)
    assert rep.accuracy == 1.0 and rep.f1 == 1.0 and rep.auroc == 1.0


def test_patient_aggregation_positive_filter():
    # patient A: one positive-argmax slide + one negative slide -> only positive kept
    probs = np.array([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4]])
    targets = np.array([1, 1, 0])
    agg = aggregate_patients(probs, targets, ["s1", "s2", "s3"], ["A", "A", "B"], 2)
    assert agg.patients == ["A", "B"]
    np.testing.assert_allclose(agg.scores[0], [0.2, 0.8])  # only the positive slide
    np.testing.assert_allclose(agg.scores[1], [0.6, 0.4])
    assert list(agg.targets) == [1, 0]


def test_patient_aggregation_multiclass_mean():
    probs = np.array([[0.5, 0.3, 0.2], [0.1, 0.6, 0.3]])
    targets = np.array([1, 1])
    agg = aggregate_patients(probs, targets, ["s1", "s2"], ["A", "A"], 3)
    np.testing.assert_allclose(agg.scores[0], [0.3, 0.45, 0.25])


def _tiny_trainer(tmp_path, epochs=3):
    dm = MILDataModule(
        n_classes=2,
        max_bag_size=64,
        batch_size=4,
        synthetic={"n_train": 16, "n_val": 8, "n_test": 8, "bag_size": 64, "feature_size": 64, "signal": 2.0},
        seed=0,
    )
    model = AttMIL(n_classes=2, in_features=64, out_features=32, attn_dim=16)
    tx = create_optimizer(opt="adam", lr=1e-3, weight_decay=0.0)
    cfg = TrainerConfig(epochs=epochs, patience=10, log_dir=str(tmp_path), task="norm_rest")
    return Trainer(model, tx, dm, n_classes=2, loss_fn=create_loss(), config=cfg, model_name="AttMIL")


def test_end_to_end_fit_and_test(tmp_path):
    trainer = _tiny_trainer(tmp_path, epochs=3)
    history = trainer.fit()
    assert np.isfinite(history["loss"])
    summary = trainer.test()
    assert 0.0 <= summary["test_auc"] <= 1.0
    # artifacts
    assert (tmp_path / "TEST_RESULT_PATIENT.csv").exists()
    assert (tmp_path / "TEST_RESULT_SLIDE.csv").exists()
    assert (tmp_path / "checkpoints" / "last.ckpt").exists()
    assert (tmp_path / "metrics.csv").exists()
    # checkpoint roundtrip
    before = jax.tree.leaves(trainer.params)[0]
    trainer.load_checkpoint(tmp_path / "checkpoints" / "last.ckpt")
    after = jax.tree.leaves(trainer.params)[0]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))


def test_fit_learns_synthetic_signal(tmp_path):
    trainer = _tiny_trainer(tmp_path, epochs=12)
    trainer.fit()
    summary = trainer.test()
    assert summary["test_auc"] > 0.8, summary


def test_topk_minmax_scores():
    from transmil_deepgraft_tpu.ops.pooling import topk_minmax_scores

    scores = jnp.array([[0.3, -1.0, 2.0, 0.0, 1.0]])
    out = np.asarray(topk_minmax_scores(scores, 2))
    # reference order: bottom-R (ascending) then top-R (descending)
    np.testing.assert_allclose(out, [[-1.0, 0.0, 2.0, 1.0]])


def test_lr_scale_plumbing():
    """ReduceLROnPlateau state surgery: find/replace the lr_scale leaf in the
    optimizer state. For lookahead optimizers the scale is embedded INSIDE the
    wrap by create_optimizer (the reference scheduler scales timm Lookahead's
    inner param_groups, never the sync interpolation), so: (a) non-sync updates
    scale linearly, (b) the sync step still lands fast params exactly at
    slow + alpha * (fast - slow) regardless of the scale."""
    from transmil_deepgraft_tpu.train.trainer import _get_lr_scale, _set_lr_scale

    params = {"w": jnp.ones((4, 4))}
    tx = create_optimizer(opt="lookahead_radam", lr=1e-2, weight_decay=0.01, params=params)
    state = tx.init(params)
    assert _get_lr_scale(state) == 1.0
    state = _set_lr_scale(state, 0.25)
    assert _get_lr_scale(state) == 0.25
    g = {"w": jnp.ones((4, 4))}
    u_scaled, _ = tx.update(g, state, params)
    state_full = _set_lr_scale(state, 1.0)
    u_full, _ = tx.update(g, state_full, params)
    # step 1 is not a sync step (k=6): inner update is linear in the scale
    np.testing.assert_allclose(
        np.asarray(u_scaled["w"]), np.asarray(u_full["w"]) * 0.25,
        rtol=1e-5, atol=1e-7,
    )

    # sync-step invariant: run 6 steps at scale 0.25; after the 6th (sync)
    # step, params must equal slow0 + 0.5 * (fast_after_6 - slow0), where
    # fast_after_6 comes from the scaled INNER trajectory — i.e. the
    # interpolation itself is exact, not multiplied by the scale
    rng = np.random.default_rng(3)
    grads = [
        {"w": jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))}
        for _ in range(6)
    ]
    p = {"w": jnp.ones((4, 4))}
    st = _set_lr_scale(tx.init(p), 0.25)
    inner = create_optimizer(opt="radam", lr=1e-2, weight_decay=0.01, params=p)
    st_inner = inner.init(p)
    p_inner = {"w": jnp.ones((4, 4))}
    for gi in grads:
        u, st = tx.update(gi, st, p)
        p = optax.apply_updates(p, u)
        ui, st_inner = inner.update(gi, st_inner, p_inner)
        p_inner = optax.apply_updates(
            p_inner, jax.tree.map(lambda x: x * 0.25, ui)
        )
    expected = 1.0 + 0.5 * (np.asarray(p_inner["w"]) - 1.0)  # slow0 == ones
    np.testing.assert_allclose(np.asarray(p["w"]), expected, rtol=1e-5, atol=1e-7)

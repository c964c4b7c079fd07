"""Full eval-path parity on converted torch weights.

The strongest round-2 parity claim: run the ENTIRE test stage (label JSON ->
HDF5 bags -> deterministic 10% eval draw -> jitted forward -> slide probs ->
patient aggregation with the binary positive-slide filter -> AUCs -> Youden-J
threshold -> CSV artifacts) with a flax TransMIL carrying converted torch
weights, and compare every intermediate against an INDEPENDENT reference
pipeline built in this test from torch + sklearn (sharing no metric/aggregation
code with the framework).

Reference semantics being matched:
  eval 10% draw      code/datasets/feature_dataloader.py:420-431
  patient filter     code/models/model_interface.py:714-760
  AUROC              torchmetrics semantics == sklearn roc_auc_score here
  Youden-J           code/utils/utils.py:257-276
  CSV artifacts      code/models/model_interface.py:896-945
"""

import json
import math
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tests.torch_ref.mil_torch import TransMIL as TorchTransMIL  # noqa: E402
from transmil_deepgraft_tpu.data.datamodule import MILDataModule  # noqa: E402
from transmil_deepgraft_tpu.models import TransMIL  # noqa: E402
from transmil_deepgraft_tpu.train.losses import cross_entropy  # noqa: E402
from transmil_deepgraft_tpu.train.optimizers import create_optimizer  # noqa: E402
from transmil_deepgraft_tpu.train.trainer import Trainer, TrainerConfig  # noqa: E402
from transmil_deepgraft_tpu.utils.torch_weights import convert_transmil_state_dict  # noqa: E402

IN_FEATURES = 384
N_CLASSES = 2


def _make_cohort(root: Path, rng: np.random.Generator):
    """12 test slides over 7 patients (several multi-slide patients so the
    positive-slide filter has real work to do), bag sizes 60-320."""
    import h5py

    feat_dir = root / "FEATURES_RETCCL_2048"
    feat_dir.mkdir(parents=True)
    entries, slide_patient = [], {}
    patients = ["P0", "P1", "P2", "P2", "P3", "P3", "P4", "P4", "P5", "P5", "P6", "P6"]
    for i, patient in enumerate(patients):
        name = f"slide_{i:02d}"
        n = int(rng.integers(60, 320))
        label = i % 2
        feats = rng.standard_normal((n, IN_FEATURES)).astype(np.float32)
        feats += 0.3 * label  # weak signal so AUCs are non-degenerate
        coords = rng.integers(0, 100, (n, 2)).astype(np.int32)
        with h5py.File(feat_dir / f"{name}.h5", "w") as f:
            f["features"] = feats
            f["coords"] = coords
        entries.append([f"FEATURES_RETCCL_2048/{name}.h5", label])
        slide_patient[name] = patient

    labels = {"train": entries[:4], "val": entries, "test": entries}
    (root / "labels.json").write_text(json.dumps(labels))
    (root / "slide_patient.json").write_text(json.dumps(slide_patient))
    return root


def _reference_eval(torch_model, dm: MILDataModule, mode: str):
    """Independent reference pipeline: torch forward on the same deterministic
    draws, reference-style patient aggregation, sklearn metrics."""
    from sklearn.metrics import roc_auc_score, roc_curve

    ds = dm.dataset(mode)
    slide_probs, slide_labels = [], []
    from transmil_deepgraft_tpu.data.feature_bags import load_bag_file

    for i in range(len(ds)):
        feats, _ = load_bag_file(ds.files[i])
        n = feats.shape[0]
        draw = np.random.RandomState(0).choice(n, math.ceil(n * 0.1))
        with torch.no_grad():
            logits = torch_model(torch.from_numpy(feats[draw]))
        slide_probs.append(torch.softmax(logits, dim=-1)[0].numpy())
        slide_labels.append(ds.labels[i])
    slide_probs = np.stack(slide_probs)
    slide_labels = np.asarray(slide_labels)

    # patient aggregation with the binary positive-slide filter
    per_patient: dict[str, list[np.ndarray]] = {}
    patient_label: dict[str, int] = {}
    for prob, label, patient in zip(slide_probs, slide_labels, ds.patients):
        per_patient.setdefault(patient, []).append(prob)
        patient_label.setdefault(patient, int(label))
    patient_scores, patient_targets, patient_names = [], [], []
    for patient, probs in per_patient.items():
        probs = np.stack(probs)
        pos = probs.argmax(-1) == 1
        if pos.any():
            probs = probs[pos]
        patient_scores.append(probs.mean(0))
        patient_targets.append(patient_label[patient])
        patient_names.append(patient)
    patient_scores = np.stack(patient_scores)
    patient_targets = np.asarray(patient_targets)

    slide_auc = roc_auc_score(slide_labels, slide_probs[:, 1])
    patient_auc = roc_auc_score(patient_targets, patient_scores[:, 1])
    fpr, tpr, thr = roc_curve(patient_targets, patient_scores[:, 1])
    youden = float(thr[np.argmax(tpr - fpr)])
    return {
        "slide_probs": slide_probs,
        "slide_names": list(ds.names),
        "patient_scores": patient_scores,
        "patient_names": patient_names,
        "slide_auc": slide_auc,
        "patient_auc": patient_auc,
        "youden": youden,
    }


def test_full_eval_path_parity(tmp_path, rng):
    root = _make_cohort(tmp_path / "cohort", rng)

    torch.manual_seed(11)
    torch_model = TorchTransMIL(n_classes=N_CLASSES, in_features=IN_FEATURES).eval()
    variables = convert_transmil_state_dict(torch_model.state_dict(), in_features=IN_FEATURES)

    dm = MILDataModule(
        data_dir=str(root),
        label_path=str(root / "labels.json"),
        slide_patient_path=str(root / "slide_patient.json"),
        n_classes=N_CLASSES,
        eval_pad="exact",
    )
    model = TransMIL(n_classes=N_CLASSES, in_features=IN_FEATURES)
    trainer = Trainer(
        model,
        create_optimizer("adam", 1e-4),
        dm,
        n_classes=N_CLASSES,
        loss_fn=cross_entropy,
        config=TrainerConfig(log_dir=str(tmp_path / "logs"), task="norm_rest"),
    )
    first = next(iter(dm.eval_batches("test")))
    trainer.init_params(first)
    trainer.params = jnp_tree(variables["params"])  # converted torch weights

    result = trainer.evaluate("test", save_results=True, stage_name="test")
    ref = _reference_eval(torch_model, dm, "test")

    agg = result["aggregate"]
    # per-slide probabilities: framework path vs torch on identical draws
    framework_slide_probs = {}
    for patient in agg.patients:
        for slide_name, score in agg.slide_scores[patient]:
            framework_slide_probs[slide_name] = score
    for slide_name, prob in zip(ref["slide_names"], ref["slide_probs"]):
        np.testing.assert_allclose(
            framework_slide_probs[slide_name], prob, atol=1e-5, rtol=0,
            err_msg=f"slide {slide_name} probs diverge",
        )

    # patient scores and ordering
    assert agg.patients == ref["patient_names"]
    np.testing.assert_allclose(agg.scores, ref["patient_scores"], atol=1e-5, rtol=0)

    # AUCs: independent sklearn vs framework metrics
    assert abs(result["auroc"] - ref["slide_auc"]) < 1e-9
    assert abs(result["patient_auroc"] - ref["patient_auc"]) < 1e-9

    # Youden threshold parity (val stage computes it). With random-init weights
    # the operating point can be the degenerate +inf leading threshold on both
    # sides - treat inf == inf as parity.
    val = trainer.evaluate("val")
    ours, theirs = val["thresholds"][1], ref["youden"]
    assert (np.isinf(ours) and np.isinf(theirs)) or abs(ours - theirs) < 1e-9

    # and a guaranteed non-degenerate Youden check vs sklearn
    from sklearn.metrics import roc_curve

    from transmil_deepgraft_tpu.train.metrics import youden_j_threshold

    scores = np.array([0.1, 0.3, 0.35, 0.6, 0.62, 0.9, 0.15, 0.8])
    targets = np.array([0, 0, 1, 1, 0, 1, 0, 1])
    fpr, tpr, thr = roc_curve(targets, scores)
    sk_thr = float(thr[np.argmax(tpr - fpr)])
    *_, our_thr = youden_j_threshold(scores, targets)
    assert abs(our_thr - sk_thr) < 1e-12

    # CSV artifacts exist and carry the same patient scores
    import pandas as pd

    df = pd.read_csv(tmp_path / "logs" / "TEST_RESULT_PATIENT.csv", index_col=0)
    assert list(df["PATIENT"]) == ref["patient_names"]
    np.testing.assert_allclose(
        df.iloc[:, -1].to_numpy(), ref["patient_scores"][:, 1], atol=1e-5
    )


def jnp_tree(tree):
    import jax

    return jax.tree.map(jnp.asarray, tree)

"""Offline metric export with bootstrapped confidence intervals.

Equivalent of the reference's ``code/utils/export_metrics.py:34-786``: read
``TEST_RESULT_PATIENT.csv`` result tables from run log dirs, bootstrap-resample
patient scores for AUROC confidence intervals, and render combined/per-run
ROC/PR figures + a summary CSV.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from transmil_deepgraft_tpu.train.metrics import auroc
from transmil_deepgraft_tpu.utils.config import LABEL_MAP


def bootstrap_auroc(
    probs: np.ndarray,
    targets: np.ndarray,
    n_classes: int,
    n_boot: int = 1000,
    seed: int = 0,
    ci: float = 0.95,
) -> dict:
    """Percentile bootstrap CI over patients (ref ``export_metrics.py`` bootstrap)."""
    rng = np.random.default_rng(seed)
    probs = np.asarray(probs)
    targets = np.asarray(targets)
    n = len(targets)
    point = auroc(probs, targets, n_classes)
    samples = []
    for _ in range(n_boot):
        idx = rng.integers(0, n, n)
        t = targets[idx]
        if len(np.unique(t)) < 2:
            continue
        samples.append(auroc(probs[idx], t, n_classes))
    lo, hi = (1 - ci) / 2, 1 - (1 - ci) / 2
    arr = np.asarray(samples) if samples else np.array([point])
    return {
        "auroc": point,
        "ci_low": float(np.quantile(arr, lo)),
        "ci_high": float(np.quantile(arr, hi)),
        "n_boot": len(arr),
    }


def read_patient_results(csv_path: str | Path, task: str, n_classes: int) -> tuple[np.ndarray, np.ndarray, list[str]]:
    """Parse a TEST_RESULT_PATIENT.csv back into (probs, targets, patients)."""
    import pandas as pd

    df = pd.read_csv(csv_path)
    lm = LABEL_MAP.get(task, {str(i): f"class_{i}" for i in range(n_classes)})
    cols = [lm[str(i)] for i in range(n_classes)]
    return df[cols].to_numpy(), df["yTrue"].to_numpy(), df["PATIENT"].tolist()


def export_run(
    log_dir: str | Path,
    task: str,
    n_classes: int,
    mode: str = "test",
    n_boot: int = 1000,
) -> dict:
    """Summarize one run dir: bootstrap CI + ROC/PR/confusion figures."""
    from transmil_deepgraft_tpu.utils.plots import (
        plot_confusion_matrix,
        plot_pr_curves,
        plot_roc_curves,
    )

    log_dir = Path(log_dir)
    csv_path = log_dir / f"{mode.upper()}_RESULT_PATIENT.csv"
    probs, targets, _ = read_patient_results(csv_path, task, n_classes)
    summary = bootstrap_auroc(probs, targets, n_classes, n_boot=n_boot)
    plot_roc_curves(probs, targets, n_classes, log_dir / f"{mode}_patient_roc", task)
    plot_pr_curves(probs, targets, n_classes, log_dir / f"{mode}_patient_pr", task)
    plot_confusion_matrix(probs, targets, n_classes, log_dir / f"{mode}_patient_confusion", task)
    (log_dir / f"{mode}_bootstrap.json").write_text(json.dumps(summary, indent=2))
    return summary


def export_combined(run_dirs: list[str | Path], task: str, n_classes: int, out_csv: str | Path) -> None:
    """Summary CSV across runs (ref plot_combined/get_csv)."""
    import pandas as pd

    rows = []
    for d in run_dirs:
        try:
            s = export_run(d, task, n_classes)
            rows.append({"run": str(d), **s})
        except FileNotFoundError:
            continue
    pd.DataFrame(rows).to_csv(out_csv, index=False)

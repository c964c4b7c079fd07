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


def bootstrap_auroc_per_class(
    probs: np.ndarray,
    targets: np.ndarray,
    n_classes: int,
    n_boot: int = 1000,
    seed: int = 0,
    ci: float = 0.95,
) -> list[dict]:
    """Per-class one-vs-rest bootstrap CIs (ref export_metrics per-class rows)."""
    from transmil_deepgraft_tpu.train.metrics import binary_auroc

    rng = np.random.default_rng(seed)
    probs = np.asarray(probs)
    targets = np.asarray(targets)
    n = len(targets)
    out = []
    for c in range(n_classes):
        y = (targets == c).astype(np.int64)
        scores = probs[:, c]
        if y.min() == y.max():
            out.append({"class": c, "auroc": 0.0, "ci_low": 0.0, "ci_high": 0.0})
            continue
        point = binary_auroc(scores, y)
        samples = []
        for _ in range(n_boot):
            idx = rng.integers(0, n, n)
            yy = y[idx]
            if yy.min() == yy.max():
                continue
            samples.append(binary_auroc(scores[idx], yy))
        arr = np.asarray(samples) if samples else np.array([point])
        lo, hi = (1 - ci) / 2, 1 - (1 - ci) / 2
        out.append({
            "class": c, "auroc": point,
            "ci_low": float(np.quantile(arr, lo)),
            "ci_high": float(np.quantile(arr, hi)),
        })
    return out


def plot_runs_comparison(
    results: list[tuple[str, np.ndarray, np.ndarray, dict]],
    n_classes: int,
    out_stem: str | Path,
) -> None:
    """Multi-run comparison figures (ref plot_combined): overlaid patient-level
    ROC curves (one per run, AUC + CI in the legend) and an AUROC bar chart
    with CI whiskers."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from transmil_deepgraft_tpu.train.metrics import _roc_points
    from transmil_deepgraft_tpu.utils.config import COLOR_MAP

    out_stem = Path(out_stem)
    out_stem.parent.mkdir(parents=True, exist_ok=True)

    fig, ax = plt.subplots(figsize=(6, 6))
    for i, (name, probs, targets, summary) in enumerate(results):
        scores = probs[:, 1] if n_classes <= 2 else probs.max(-1)
        y = targets if n_classes <= 2 else (probs.argmax(-1) == targets).astype(int)
        fpr, tpr, _ = _roc_points(np.asarray(scores, np.float64), np.asarray(y))
        ax.plot(
            fpr, tpr, color=COLOR_MAP[i % len(COLOR_MAP)],
            label=f"{name} AUC={summary['auroc']:.3f} "
                  f"[{summary['ci_low']:.3f}, {summary['ci_high']:.3f}]",
        )
    ax.plot([0, 1], [0, 1], "k--", lw=0.5)
    ax.set_xlabel("1 - specificity")
    ax.set_ylabel("sensitivity")
    ax.legend(fontsize=7)
    fig.savefig(f"{out_stem}_roc_comparison.png", dpi=150, bbox_inches="tight")
    plt.close(fig)

    fig, ax = plt.subplots(figsize=(max(4, len(results)), 4))
    names = [r[0] for r in results]
    aucs = [r[3]["auroc"] for r in results]
    err = np.array([
        [r[3]["auroc"] - r[3]["ci_low"] for r in results],
        [r[3]["ci_high"] - r[3]["auroc"] for r in results],
    ])
    ax.bar(range(len(results)), aucs, yerr=err, capsize=4,
           color=[COLOR_MAP[i % len(COLOR_MAP)] for i in range(len(results))])
    ax.set_xticks(range(len(results)))
    ax.set_xticklabels(names, rotation=30, ha="right", fontsize=7)
    ax.set_ylabel("patient AUROC (95% CI)")
    ax.set_ylim(0, 1)
    fig.savefig(f"{out_stem}_auroc_bars.png", dpi=150, bbox_inches="tight")
    plt.close(fig)


def export_combined(run_dirs: list[str | Path], task: str, n_classes: int, out_csv: str | Path) -> None:
    """Summary CSV + multi-run comparison figures across runs
    (ref plot_combined/get_csv, ``export_metrics.py:34-786``)."""
    import pandas as pd

    rows = []
    results = []
    for d in run_dirs:
        try:
            s = export_run(d, task, n_classes)
            probs, targets, _ = read_patient_results(
                Path(d) / "TEST_RESULT_PATIENT.csv", task, n_classes
            )
            for pc in bootstrap_auroc_per_class(probs, targets, n_classes, n_boot=200):
                rows.append({"run": str(d), **s, **{f"class_{pc['class']}_{k}": v
                            for k, v in pc.items() if k != "class"}})
            results.append((Path(d).name, probs, targets, s))
        except FileNotFoundError:
            continue
    pd.DataFrame(rows).to_csv(out_csv, index=False)
    if results:
        plot_runs_comparison(results, n_classes, Path(out_csv).with_suffix(""))

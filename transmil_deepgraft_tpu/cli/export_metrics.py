"""Metric-export CLI: ``python -m transmil_deepgraft_tpu.cli.export_metrics``.

The reference's ``utils/export_metrics.py`` driver surface (``make_parse``,
``export_metrics.py:144-198``): aggregate finished runs into bootstrap-CI
summaries, a combined CSV, and multi-run comparison figures (ROC overlay, AUROC
bars, PR overlay, confusion-matrix grid)."""

from __future__ import annotations

import argparse


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="aggregate run metrics + comparison figures")
    p.add_argument("--runs", nargs="+", required=True,
                   help="run dirs holding TEST_RESULT_PATIENT.csv")
    p.add_argument("--task", default="")
    p.add_argument("--n_classes", type=int, default=2)
    p.add_argument("--out_csv", default="combined_metrics.csv")
    return p


def main(argv: list[str] | None = None) -> None:
    from transmil_deepgraft_tpu.utils.export_metrics import export_combined

    args = make_parser().parse_args(argv)
    export_combined(args.runs, task=args.task, n_classes=args.n_classes,
                    out_csv=args.out_csv)
    print(f"wrote {args.out_csv} (+ comparison figures alongside)")


if __name__ == "__main__":
    main()

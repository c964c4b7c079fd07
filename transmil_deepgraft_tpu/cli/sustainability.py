"""Sustainability CLI: ``python -m transmil_deepgraft_tpu.cli.sustainability``.

Equivalent of the reference's ``sustainability_{train,test}.py`` benchmark
scripts: sweep the model zoo over synthetic bags measuring per-model
inference/training energy (time x chip TDP) and write kWh/CO2 CSVs.
"""

from __future__ import annotations

import argparse
import json


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="energy benchmark sweep")
    p.add_argument("--out_dir", default="logs/sustainability")
    p.add_argument("--models", nargs="+", default=["TransMIL", "AttMIL", "TransformerMIL", "CLAM_SB"])
    p.add_argument("--bag_sizes", nargs="+", type=int, default=[600, 800, 1000])
    p.add_argument("--in_features", type=int, default=2048)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--mode", default="inference", choices=["inference", "train"])
    p.add_argument("--chip_watts", type=float, default=None)
    p.add_argument("--regions", action="store_true",
                   help="also write the per-region CO2/mortality comparison "
                        "(the reference's mortality_cost/map_co2 analysis) "
                        "for the sweep's total kWh")
    return p


def main(argv: list[str] | None = None) -> str:
    from transmil_deepgraft_tpu.utils.compilation_cache import enable_compilation_cache
    from transmil_deepgraft_tpu.utils.sustainability import (
        DEFAULT_CHIP_WATTS,
        benchmark_models,
        plot_regional_impact,
        regional_impact,
        write_regional_impact,
    )

    enable_compilation_cache()
    args = make_parser().parse_args(argv)
    path = benchmark_models(
        args.out_dir,
        model_names=tuple(args.models),
        bag_sizes=tuple(args.bag_sizes),
        in_features=args.in_features,
        reps=args.reps,
        mode=args.mode,
        chip_watts=args.chip_watts if args.chip_watts is not None else DEFAULT_CHIP_WATTS,
    )
    out = {"csv": str(path)}
    if args.regions:
        import csv as _csv
        from pathlib import Path

        with open(path) as f:
            total_kwh = sum(float(r["kwh"]) for r in _csv.DictReader(f))
        rows = regional_impact(total_kwh)
        rpath = Path(args.out_dir) / f"regional_impact_{args.mode}.csv"
        write_regional_impact(total_kwh, rpath, rows=rows)
        plot_regional_impact(rows, rpath.with_suffix(".png"))
        out["regional_csv"] = str(rpath)
    print(json.dumps(out))
    return str(path)


if __name__ == "__main__":
    main()

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
    return p


def main(argv: list[str] | None = None) -> str:
    from transmil_deepgraft_tpu.utils.compilation_cache import enable_compilation_cache
    from transmil_deepgraft_tpu.utils.sustainability import benchmark_models

    enable_compilation_cache()
    args = make_parser().parse_args(argv)
    path = benchmark_models(
        args.out_dir,
        model_names=tuple(args.models),
        bag_sizes=tuple(args.bag_sizes),
        in_features=args.in_features,
        reps=args.reps,
        mode=args.mode,
    )
    print(json.dumps({"csv": str(path)}))
    return str(path)


if __name__ == "__main__":
    main()

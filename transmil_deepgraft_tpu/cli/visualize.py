"""Visualization CLI: ``python -m transmil_deepgraft_tpu.cli.visualize``.

Equivalent of the reference's ``code/visualize_mil.py`` driver: load a trained
checkpoint, select slides (every test slide, or the top-k patients CSV written
by the test stage, ref ``visualize_mil.py:236-241``), run attention + GradCAM
heatmaps per slide and write JPEGs + a per-slide score JSON.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TransMIL attention/GradCAM heatmaps")
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt", required=True, help="checkpoint file (last.ckpt or metric-named)")
    p.add_argument("--log_dir", default=None, help="run dir holding top-k CSVs")
    p.add_argument("--target_label", type=int, default=1)
    p.add_argument("--out_dir", default=None)
    p.add_argument("--topk_csv", default=None, help="restrict to patients in this CSV")
    p.add_argument("--max_slides", type=int, default=0)
    p.add_argument("--track_energy", action="store_true",
                   help="wrap the heatmap loop in the kWh/CO2 tracker and write "
                        "heatmap_energy.json (ref gradcam_sus.py ImpactTracker run)")
    p.add_argument("--cam_method", default="gradcam",
                   help="CAM algorithm for image pipelines (visualize.cam.CAM_METHODS; "
                        "ref visualize_feature.py:21 pytorch_grad_cam surface)")
    return p


def main(argv: list[str] | None = None) -> list[dict]:
    from transmil_deepgraft_tpu.cli.train import build
    from transmil_deepgraft_tpu.utils.compilation_cache import enable_compilation_cache
    from transmil_deepgraft_tpu.utils.config import finalize_config, read_yaml
    from transmil_deepgraft_tpu.visualize.heatmap import Visualizer

    enable_compilation_cache()
    args = make_parser().parse_args(argv)
    cfg = read_yaml(args.config)
    cfg = finalize_config(cfg, config_path=args.config, stage="test")
    trainer = build(cfg, log_dir=args.log_dir)
    trainer.load_checkpoint(args.ckpt)

    out_dir = Path(args.out_dir or (Path(trainer.cfg.log_dir) / "heatmaps"))
    from transmil_deepgraft_tpu.models.backbones import ImageMILModel

    if isinstance(trainer.model, ImageMILModel):
        # raw-tile pipeline: pixel-level CAM through the backbone
        # (ref visualize_feature.py / visualize_classic.py drivers)
        from transmil_deepgraft_tpu.visualize.heatmap import ImageVisualizer

        params = trainer.params
        bs = trainer.model_state.get("batch_stats", {}).get("backbone")
        bv = {"params": params["backbone"]}
        if bs is not None:
            bv["batch_stats"] = bs
        viz = ImageVisualizer(
            trainer.model.backbone, trainer.model.head, bv,
            {"params": params["head"]}, out_dir,
            target_class=args.target_label, cam_method=args.cam_method,
        )
    else:
        viz = Visualizer(
            trainer.model, {"params": trainer.params}, out_dir, target_class=args.target_label
        )

    keep_patients = None
    if args.topk_csv:
        import pandas as pd

        keep_patients = set(pd.read_csv(args.topk_csv)["Patient"].astype(str))

    results = []
    ds = trainer.dm.dataset("test")
    rng = np.random.default_rng(0)
    tracker = None
    if args.track_energy:
        from transmil_deepgraft_tpu.utils.sustainability import EnergyTracker

        tracker = EnergyTracker().__enter__()
    for i in range(len(ds)):
        bag, label, (name, coords, patient) = trainer.dm._get(ds, i, rng)
        if keep_patients is not None and str(patient) not in keep_patients:
            continue
        res = viz.run_slide(np.asarray(bag), np.asarray(coords), name)
        results.append(
            {
                "slide": name,
                "patient": patient,
                "label": int(label),
                "logits": res["logits"].tolist(),
                "paths": [str(p) for p in res["paths"]],
            }
        )
        if args.max_slides and len(results) >= args.max_slides:
            break

    if tracker is not None:
        tracker.step(len(results))
        tracker.__exit__()
        (out_dir / "heatmap_energy.json").write_text(
            json.dumps(tracker.report().as_dict(), indent=2)
        )
    (out_dir / "heatmap_index.json").write_text(json.dumps(results, indent=2))
    print(json.dumps({"slides": len(results), "out_dir": str(out_dir)}))
    return results


if __name__ == "__main__":
    main()

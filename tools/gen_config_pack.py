"""Port the reference's config pack (72 DeepGraft + 1 Camelyon YAMLs).

Reads each reference YAML (hyperparameter VALUES are the facts being ported),
and re-emits it in this repo's canonical formatting under ``transmil_deepgraft_tpu/configs/``. The
schema intentionally matches the reference's (General/Data/Model/Optimizer/
Loss) - that is the framework's config contract (``utils/config.py`` parses
reference trees unchanged). Site-specific absolute paths are rewritten to
relative placeholders.

Regenerate with:  python tools/gen_config_pack.py
Smoke-tested by:  tests/test_config_pack.py (every config through
                  finalize_config + a synthetic fast_dev_run for one per model)
"""

from __future__ import annotations

import sys
from pathlib import Path

import yaml

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")


def _relpath(p: str | None, kind: str) -> str | None:
    """Strip site-specific home prefixes, keep the semantic tail."""
    if not p:
        return p
    s = str(p)
    for marker in ("/data/", "/workspace/"):
        if marker in s:
            s = s.split(marker, 1)[1]
    return s


def port_config(src: Path) -> dict:
    cfg = yaml.safe_load(src.read_text())
    g = cfg.get("General", {}) or {}
    d = cfg.get("Data", {}) or {}
    m = cfg.get("Model", {}) or {}
    o = cfg.get("Optimizer", {}) or {}
    l = cfg.get("Loss", {}) or {}

    out = {
        "General": {
            "comment": g.get("comment"),
            "seed": g.get("seed", 2021),
            "fp16": g.get("fp16", True),
            "precision": g.get("precision", 16),
            "epochs": g.get("epochs", 200),
            "grad_acc": g.get("grad_acc", 2),
            "patience": g.get("patience", 50),
            "server": g.get("server", "train"),
            "log_path": "logs/",
        },
        "Data": {
            "dataset_name": d.get("dataset_name", "custom"),
            "data_shuffle": d.get("data_shuffle", False),
            "data_dir": _relpath(d.get("data_dir"), "data"),
            "label_file": _relpath(d.get("label_file") or d.get("label_dir"), "label"),
            "fold": d.get("fold", 0),
            "nfold": d.get("nfold", 3),
            "cross_val": d.get("cross_val", False),
            "train_dataloader": {
                "batch_size": (d.get("train_dataloader") or {}).get("batch_size", 1),
                "num_workers": (d.get("train_dataloader") or {}).get("num_workers", 4),
            },
            "test_dataloader": {
                "batch_size": (d.get("test_dataloader") or {}).get("batch_size", 1),
                "num_workers": (d.get("test_dataloader") or {}).get("num_workers", 4),
            },
        },
        "Model": {
            "name": m.get("name"),
            "n_classes": m.get("n_classes", 2),
            "backbone": m.get("backbone", "features"),
        },
        "Optimizer": {
            "opt": o.get("opt", "lookahead_radam"),
            "lr": o.get("lr", 2e-4),
            "opt_eps": o.get("opt_eps"),
            "opt_betas": o.get("opt_betas"),
            "momentum": o.get("momentum"),
            "weight_decay": o.get("weight_decay", 0.01),
        },
        "Loss": {"base_loss": l.get("base_loss", "CrossEntropyLoss")},
    }
    # optional fields only when the source sets them
    for key in ("bag_size", "mixup", "aug", "cache", "feature_extractor"):
        if key in d and d[key] is not None:
            out["Data"][key] = d[key]
    for key in ("in_features", "out_features"):
        if key in m and m[key] is not None:
            out["Model"][key] = m[key]
    if "loss_weight" in l and l["loss_weight"] is not None:
        out["Loss"]["loss_weight"] = l["loss_weight"]
    return out


def main() -> None:
    n = 0
    for sub in ("DeepGraft", "Camelyon"):
        out_dir = REPO / "transmil_deepgraft_tpu" / "configs" / sub
        out_dir.mkdir(parents=True, exist_ok=True)
        for src in sorted((REF / sub).glob("*.yaml")):
            ported = port_config(src)
            header = (
                f"# {src.name} - ported reference config (values from the\n"
                f"# reference's {sub}/{src.name}; task derives from this filename)\n"
            )
            (out_dir / src.name).write_text(
                header + yaml.safe_dump(ported, sort_keys=False, default_flow_style=None)
            )
            n += 1
    print(f"wrote {n} configs")


if __name__ == "__main__":
    sys.exit(main())

"""The full production data path: tile JPEGs -> offline feature extraction ->
feature-bag training -> evaluation artifacts.

Mirrors the reference workflow (``feature_extractor.py`` then ``train.py``):

1. a cohort of per-slide tile directories (``BLOCKS/<slide>/tile_(x-y).jpg``),
2. ``extract_cohort`` embeds every tile and writes ``<slide>.h5``
   ``{features, coords}`` files (double-buffered device embed; in production
   pass a RetCCL/ResNet50 backbone and ``quantize='int8'`` for the 19.7k
   tiles/s path — this demo uses a small CNN so it runs anywhere in seconds),
3. the CLI trains a MIL head on the extracted bags and writes the usual
   artifact tree (checkpoints, TEST_RESULT_*.csv, figures).

Run: ``python examples/05_tiles_to_features_to_training.py [--root /tmp/demo_cohort]``
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def make_tile_cohort(root: Path, n_slides: int = 6, n_tiles: int = 8, size: int = 64) -> Path:
    """Write a synthetic tile dump in the reference's BLOCKS layout, with a
    brightness class-signal so training has something to learn."""
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    blocks = root / "BLOCKS"
    entries = []
    for s in range(n_slides):
        d = blocks / f"slide{s}"
        d.mkdir(parents=True, exist_ok=True)
        for t in range(n_tiles):
            arr = rng.integers(0, 255, (size, size, 3)).astype(np.uint8)
            if s % 2:
                arr = np.clip(arr.astype(int) + 60, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"tile_({t}-{s}).jpg")
        entries.append([f"slide{s}", s % 2])
    (root / "tile_labels.json").write_text(json.dumps({"train": entries, "test": entries}))
    return blocks


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default="logs/example_cohort")
    p.add_argument("--epochs", type=int, default=20)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from transmil_deepgraft_tpu.cli.train import main as train_main
    from transmil_deepgraft_tpu.data.feature_extractor import extract_cohort
    from transmil_deepgraft_tpu.data.jpg_bags import JPGMILDataset
    from transmil_deepgraft_tpu.models.backbones import SimpleCNN

    root = Path(args.root)
    root.mkdir(parents=True, exist_ok=True)
    make_tile_cohort(root)

    # --- offline extraction (production: ResNet/RetCCL + quantize='int8') ---
    ds = JPGMILDataset(root, root / "tile_labels.json", "train", 2, tile_size=64)
    backbone = SimpleCNN(out_features=32)
    bv = backbone.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    feats_dir = root / "FEATURES_DEMO_32"
    written = extract_cohort(backbone, bv, ds, feats_dir, batch_size=8)

    # --- feature-bag training via the CLI surface ---------------------------
    entries = [[f"slide{s}.h5", s % 2] for s in range(6)]
    (root / "feat_labels.json").write_text(
        json.dumps({"train": entries, "val": entries, "test": entries})
    )
    cfg_path = root / "AttMIL_demo_norm_rest.yaml"
    cfg_path.write_text(f"""
General:
    seed: 1
    epochs: {args.epochs}
    patience: 50
    log_path: {root}/logs
Data:
    data_dir: {feats_dir}
    label_file: {root}/feat_labels.json
    bag_size: 8
    train_dataloader:
        batch_size: 2
Model:
    name: AttMIL
    n_classes: 2
    in_features: 32
    out_features: 16
Optimizer:
    opt: adam
    lr: 0.01
Loss:
    base_loss: CrossEntropyLoss
""")
    log_dir = root / "run"
    summary = train_main(["--stage", "train", "--config", str(cfg_path),
                          "--log_dir", str(log_dir)])

    out = {"extracted": len(written), "feats_dir": str(feats_dir),
           "test_patient_auroc": round(float(summary["test_patient_auroc"]), 4),
           "artifacts": str(log_dir)}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

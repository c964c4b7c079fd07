"""Camelyon16 dataset: fold CSVs + per-slide ``.pt`` feature tensors.

Equivalent of the reference's ``CamelData`` (``datasets/camel_data.py:10-56``):
``fold{F}.csv`` has train/train_label, val/val_label, test/test_label columns of
slide ids; features live at ``<data_dir>/<slide_id>.pt``. Slides are their own
patients (Camelyon has no patient grouping).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from transmil_deepgraft_tpu.data.feature_bags import load_bag_file


class CamelyonDataset:
    def __init__(
        self,
        data_dir: str | Path,
        csv_dir: str | Path,
        mode: str,
        fold: int = 0,
        *,
        max_bag_size: int = 0,  # 0 -> full bag (the reference uses full bags)
        shuffle: bool = False,
    ) -> None:
        import pandas as pd

        self.data_dir = Path(data_dir)
        self.mode = "val" if mode == "fine_tune" else mode
        self.max_bag_size = max_bag_size
        self.shuffle = shuffle
        df = pd.read_csv(Path(csv_dir) / f"fold{fold}.csv", index_col=0)
        col = {"train": "train", "val": "val", "test": "test"}[self.mode]
        data = df[col].dropna()
        labels = df[f"{col}_label"].dropna()
        self.names = [str(s) for s in data.tolist()]
        self.labels = [int(l) for l in labels.tolist()]

    def __len__(self) -> int:
        return len(self.names)

    def get_labels(self) -> list[int]:
        return list(self.labels)

    def get_item(self, index: int, rng: np.random.Generator):
        name = self.names[index]
        feats, coords = load_bag_file(self.data_dir / f"{name}.pt")
        if self.shuffle:
            order = rng.permutation(feats.shape[0])
            feats, coords = feats[order], coords[order]
        if self.max_bag_size and self.mode == "train":
            idx = rng.permutation(feats.shape[0])[: self.max_bag_size]
            feats, coords = feats[idx], coords[idx]
            if feats.shape[0] < self.max_bag_size:
                pad = np.zeros((self.max_bag_size - feats.shape[0], feats.shape[1]), np.float32)
                feats = np.concatenate([feats, pad])
                # keep coords row-aligned with the padded bag (data/coords.py)
                from transmil_deepgraft_tpu.data.coords import normalize_pad_coords

                coords = normalize_pad_coords(coords, feats.shape[0])
        return feats, self.labels[index], (name, coords, name)

"""Raw-tile JPG datasets: image bags (MIL) and per-tile items (classic).

Equivalents of the reference's ``JPGMILDataloader`` (``datasets/jpg_dataloader.py:
27-360``) and ``JPGBagLoader`` (``datasets/classic_jpg_dataloader.py:28-542``):
slides are directories ``<cohort>/BLOCKS/<slide>/*.jpg|png``, tile grid coords
parsed from the ``(x-y)`` filename suffix, ImageNet normalization, train-time
random subsample + zero-pad to a fixed bag, and for the classic path per-tile
items with labels inherited from the slide plus heavy stain augmentation
(``transforms.train_augment``).
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Optional

import numpy as np

from transmil_deepgraft_tpu.data.transforms import imagenet_normalize, train_augment

COORD_RE = re.compile(r"\((\d+)-(\d+)\)")


def parse_coords(filename: str) -> tuple[int, int]:
    """Tile grid coords from the reference's ``(x-y)`` filename convention
    (ref ``jpg_dataloader.py:246-248``)."""
    m = COORD_RE.search(filename)
    return (int(m.group(1)), int(m.group(2))) if m else (0, 0)


def _load_tile(path: Path, size: int = 224) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if img.size != (size, size):
        img = img.resize((size, size))
    return np.asarray(img, np.uint8)


class JPGMILDataset:
    """Image-bag MIL dataset: one item = all tiles of a slide."""

    def __init__(
        self,
        file_path: str | Path,
        label_path: str | Path,
        mode: str,
        n_classes: int,
        *,
        slide_patient_path: str | Path | None = None,
        max_bag_size: int = 1000,
        tile_size: int = 224,
        slides: Optional[list[str]] = None,
    ) -> None:
        self.root = Path(file_path)
        self.mode = mode
        self.n_classes = n_classes
        self.max_bag_size = max_bag_size
        self.tile_size = tile_size

        self.slide_patient = None
        if slide_patient_path:
            with open(slide_patient_path) as f:
                self.slide_patient = json.load(f)

        with open(label_path) as f:
            label_json = json.load(f)
        entries = (
            list(label_json.get("train", [])) + list(label_json.get("test_mixin", []))
            if mode == "fine_tune"
            else label_json[mode]
        )
        self.slide_dirs: list[Path] = []
        self.labels: list[int] = []
        self.names: list[str] = []
        self.patients: list[str] = []
        for rel, label in entries:
            name = Path(rel).stem
            if slides is not None and name not in slides:
                continue
            candidates = [self.root / "BLOCKS" / name, self.root / name, Path(rel)]
            d = next((c for c in candidates if c.is_dir()), None)
            if d is None:
                continue
            self.slide_dirs.append(d)
            self.labels.append(int(label))
            self.names.append(name)
            self.patients.append(
                self.slide_patient.get(name, name) if self.slide_patient else name
            )

    def __len__(self) -> int:
        return len(self.slide_dirs)

    def get_labels(self) -> list[int]:
        return list(self.labels)

    def tiles_of(self, index: int) -> list[Path]:
        return sorted(
            p for p in self.slide_dirs[index].iterdir() if p.suffix.lower() in (".jpg", ".jpeg", ".png")
        )

    def get_item(self, index: int, rng: np.random.Generator):
        tiles = self.tiles_of(index)
        coords = np.array([parse_coords(p.name) for p in tiles], np.int32)
        if self.mode in ("train", "fine_tune") and len(tiles) > self.max_bag_size:
            keep = rng.permutation(len(tiles))[: self.max_bag_size]
            tiles = [tiles[i] for i in keep]
            coords = coords[keep]
        imgs = np.stack([imagenet_normalize(_load_tile(p, self.tile_size)) for p in tiles])
        if self.mode in ("train", "fine_tune") and len(tiles) < self.max_bag_size:
            pad = np.zeros((self.max_bag_size - len(tiles), *imgs.shape[1:]), np.float32)
            imgs = np.concatenate([imgs, pad])
            # keep coords row-aligned with the padded bag (data/coords.py contract)
            from transmil_deepgraft_tpu.data.coords import normalize_pad_coords

            coords = normalize_pad_coords(coords, imgs.shape[0])
        return imgs, self.labels[index], (self.names[index], coords, self.patients[index])


class JPGTileDataset:
    """Classic per-tile dataset: one item = a single augmented tile, label
    inherited from its slide (ref ``classic_jpg_dataloader.py:68-125``)."""

    def __init__(self, bag_dataset: JPGMILDataset, augment: bool = True) -> None:
        self.bags = bag_dataset
        self.augment = augment and bag_dataset.mode in ("train", "fine_tune")
        self.index: list[tuple[int, Path]] = []
        for si in range(len(bag_dataset)):
            for tile in bag_dataset.tiles_of(si):
                self.index.append((si, tile))

    def __len__(self) -> int:
        return len(self.index)

    def get_labels(self) -> list[int]:
        return [self.bags.labels[si] for si, _ in self.index]

    def get_item(self, i: int, rng: np.random.Generator):
        si, tile_path = self.index[i]
        img = _load_tile(tile_path, self.bags.tile_size)
        if self.augment:
            img = train_augment(img, rng)
        coords = np.array(parse_coords(tile_path.name), np.int32)
        return (
            imagenet_normalize(img),
            self.bags.labels[si],
            (self.bags.names[si], coords, self.bags.patients[si]),
        )

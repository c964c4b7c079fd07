"""Per-slide precomputed-feature bag dataset (the primary data path).

Equivalent of the reference's ``FeatureBagLoader``
(``code/datasets/feature_dataloader.py:26-435``):

- label JSON ``{train/val/test/test_mixin: [[relpath, label], ...]}`` with the
  ``FEATURES_RETCCL_2048`` path segment substituted by the configured extractor
  (``:94-95``); ``fine_tune`` mode = train + test_mixin (``:78-80``).
- slide -> patient map JSON (``:69-71``); slides missing from it are skipped.
- per-slide HDF5 files with ``features [N, D]`` and ``coords [N, 2]`` datasets
  (``:252-255``). ``.pt`` tensor files (Camelyon-style, ``camel_data.py``) load
  via torch(cpu) when available; ``.npy`` loads directly.

Sampling semantics (reproduced exactly; every random draw takes an explicit
``numpy.random.Generator`` so runs are reproducible by construction):
- train/fine_tune: random permutation -> first ``max_bag_size`` -> optional
  bag mixup -> zero-pad to ``max_bag_size`` -> shuffle again (``:335-365``).
- val/test: deterministic 10% draw with replacement, seeded to 0 per slide
  (``np.random.seed(0); np.random.choice(n, ceil(0.1 n))``, ``:420-431``).
"""

from __future__ import annotations

import json
import math
from pathlib import Path
from typing import Any

import numpy as np

DEFAULT_FEATURE_TEMPLATE = "FEATURES_RETCCL_2048"


def load_bag_file(path: str | Path) -> tuple[np.ndarray, np.ndarray]:
    """Read (features, coords) from .h5/.hdf5 (keys features/coords), .npy, or .pt."""
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix in (".h5", ".hdf5", ""):
        import h5py

        with h5py.File(path, "r") as f:
            feats = np.asarray(f["features"][:], dtype=np.float32)
            coords = (
                np.asarray(f["coords"][:]) if "coords" in f else np.zeros((len(feats), 2), np.int32)
            )
        return feats, coords
    if suffix == ".npy":
        feats = np.load(path).astype(np.float32)
        return feats, np.zeros((len(feats), 2), np.int32)
    if suffix == ".pt":
        import torch

        feats = torch.load(path, map_location="cpu", weights_only=True)
        feats = np.asarray(feats, dtype=np.float32)
        return feats, np.zeros((len(feats), 2), np.int32)
    if suffix == ".zarr":
        # zarr group with {data|features, coords} (ref zarr_feature_dataloader);
        # gated: zarr is not part of this image's baked deps.
        try:
            import zarr
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "reading .zarr feature stores requires the optional 'zarr' package"
            ) from e
        g = zarr.open(str(path), mode="r")
        key = "features" if "features" in g else "data"
        feats = np.asarray(g[key][:], np.float32)
        coords = (
            np.asarray(g["coords"][:]) if "coords" in g else np.zeros((len(feats), 2), np.int32)
        )
        return feats, coords
    raise ValueError(f"unsupported bag file type: {path}")


def load_slide_patient(path: str | Path | None) -> dict | None:
    """Slide->patient map; ``None`` falls back to slide name as patient."""
    if path is None:
        return None
    with open(path) as f:
        return json.load(f)


def load_label_entries(label_path: str | Path, mode: str) -> list:
    """Label-JSON ``[[path, label], ...]`` entries for a stage; ``fine_tune``
    merges train + test_mixin (ref train.py fine-tune flow)."""
    with open(label_path) as f:
        label_json = json.load(f)
    if mode == "fine_tune":
        return list(label_json.get("train", [])) + list(label_json.get("test_mixin", []))
    return label_json[mode]


def scan_label_entries(
    entries, slide_patient: dict | None, resolve
) -> tuple[list[Path], list[int], list[str], list[str], list[str]]:
    """Resolve entries -> parallel (files, labels, names, patients, missing).

    The scan shared by the feature- and image-bag datasets (ref
    ``feature_dataloader.py`` / ``custom_dataloader.py:63-70`` both do this):
    entries absent from ``slide_patient`` are dropped, unresolvable paths are
    recorded in ``missing`` rather than raised, and with no patient map the
    slide name doubles as the patient id. ``resolve(rel, name)`` returns the
    on-disk Path or None.
    """
    files: list[Path] = []
    labels: list[int] = []
    names: list[str] = []
    patients: list[str] = []
    missing: list[str] = []
    for rel, label in entries:
        name = Path(rel).stem
        if slide_patient is not None and name not in slide_patient:
            continue
        found = resolve(rel, name)
        if found is None:
            missing.append(str(rel))
            continue
        files.append(found)
        labels.append(int(label))
        names.append(name)
        patients.append(slide_patient[name] if slide_patient is not None else name)
    return files, labels, names, patients, missing


def _resolve_bag_path(path: Path) -> Path | None:
    """Candidate resolution shared by the primary and mixed-res lookups:
    the path itself, a ``.h5`` suffix for extension-less entries, then
    suffix-preserving ``+.h5/.pt/.npy`` variants."""
    cands = [path]
    if not path.suffix:
        cands.append(path.with_suffix(".h5"))
    cands += [Path(str(path) + ext) for ext in (".h5", ".pt", ".npy")]
    for cand in cands:
        if cand.exists() and cand.is_file():
            return cand
    return None


class FeatureBagDataset:
    def __init__(
        self,
        file_path: str | Path,
        label_path: str | Path,
        mode: str,
        n_classes: int,
        *,
        slide_patient_path: str | Path | None = None,
        max_bag_size: int = 1000,
        mixup: bool = False,
        feature_extractor: str | None = None,
        slides: list[str] | None = None,
        cache: bool = False,
        eval_draw_fraction: float = 0.1,
        mixed_res_dirs: list[str | Path] | None = None,
    ) -> None:
        self.file_path = Path(file_path)
        self.mode = mode
        self.n_classes = n_classes
        self.max_bag_size = max_bag_size
        self.mixup = mixup
        self.eval_draw_fraction = eval_draw_fraction
        self.cache = cache
        self._bag_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

        self.slide_patient = load_slide_patient(slide_patient_path)

        entries = load_label_entries(label_path, mode)
        if feature_extractor:
            entries = [
                (rel.replace(DEFAULT_FEATURE_TEMPLATE, feature_extractor), label)
                for rel, label in entries
            ]
        if slides is not None:
            entries = [e for e in entries if Path(e[0]).stem in slides]

        (self.files, self.labels, self.names, self.patients,
         self.missing) = scan_label_entries(
            entries, self.slide_patient,
            lambda rel, name: _resolve_bag_path(self.file_path / rel),
        )
        self.mixed_res_missing: list[str] = []
        # multi-resolution training variants (ref feature_dataloader_mixed
        # FeatureBagLoader: each resolution root adds the slide as an EXTRA
        # train item with the same label/patient; eval stays single-res).
        # Only slides the primary root resolved participate.
        if mixed_res_dirs and mode in ("train", "fine_tune"):
            resolved = set(self.names)
            extra_entries = [e for e in entries if Path(e[0]).stem in resolved]
            extras_by_name: dict[str, list[tuple]] = {}
            for extra_root in mixed_res_dirs:
                files, labels, names, patients, miss = scan_label_entries(
                    extra_entries, self.slide_patient,
                    lambda rel, name, root=Path(extra_root): _resolve_bag_path(root / rel),
                )
                for item in zip(files, labels, names, patients):
                    extras_by_name.setdefault(item[2], []).append(item)
                self.mixed_res_missing += [str(Path(extra_root) / m) for m in miss]
            # slide-major merge (the reference loop order: per slide, the
            # primary resolution then each extra root's variant)
            merged: list[tuple] = []
            for item in zip(self.files, self.labels, self.names, self.patients):
                merged.append(item)
                merged += extras_by_name.get(item[2], [])
            if merged:
                self.files, self.labels, self.names, self.patients = (
                    list(seq) for seq in zip(*merged)
                )

    def __len__(self) -> int:
        return len(self.files)

    def get_labels(self) -> list[int]:
        return list(self.labels)

    def _load(self, index: int) -> tuple[np.ndarray, np.ndarray]:
        if self.cache and index in self._bag_cache:
            return self._bag_cache[index]
        bag = load_bag_file(self.files[index])
        if self.cache:
            self._bag_cache[index] = bag
        return bag

    def _mixup_bag(self, bag: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        """Bag-level mixup (ref ``feature_dataloader.py:303-330``): convex combos of
        random instance pairs appended up to max_bag_size."""
        n = bag.shape[0]
        a = rng.random(n, dtype=np.float32)[:, None]
        x = bag[rng.integers(0, n, n)]
        y = bag[rng.integers(0, n, n)]
        temp = a * x + (1.0 - a) * y
        if n < self.max_bag_size:
            extra = temp[rng.permutation(n)[: self.max_bag_size - n]]
            return np.concatenate([bag, extra], axis=0)
        return temp

    def get_item(self, index: int, rng: np.random.Generator) -> tuple[np.ndarray, int, tuple[str, np.ndarray, str]]:
        feats, coords = self._load(index)
        label = self.labels[index]
        name = self.names[index]
        patient = self.patients[index]
        n = feats.shape[0]

        if self.mode in ("train", "fine_tune"):
            idx = rng.permutation(n)[: self.max_bag_size]
            bag = feats[idx]
            coords = coords[idx]
            if self.mixup:
                bag = self._mixup_bag(bag, rng)
            if bag.shape[0] < self.max_bag_size:
                pad = np.zeros((self.max_bag_size - bag.shape[0], bag.shape[1]), np.float32)
                bag = np.concatenate([bag, pad], axis=0)
            # keep coords row-aligned through the post-pad reshuffle so
            # coord-aware heads can train (min-normalize-then-zero-pad, the
            # data/coords.py contract: pad rows coincide with the bag min);
            # the permutation draw is unchanged, so bags are bit-identical to
            # the reference-semantics path (which never consumes train coords)
            from transmil_deepgraft_tpu.data.coords import normalize_pad_coords

            coords = normalize_pad_coords(coords, bag.shape[0])
            perm = rng.permutation(bag.shape[0])
            return bag[perm], label, (name, coords[perm], patient)

        # val/test: seeded deterministic 10% draw with replacement (ref :420-431).
        draw_rng = np.random.RandomState(0)
        draw = draw_rng.choice(n, math.ceil(n * self.eval_draw_fraction))
        return feats[draw], label, (name, coords[draw], patient)

    def __getitem__(self, index: int):
        return self.get_item(index, np.random.default_rng())

"""Legacy raw-image bag datasets: per-slide .hdf5/.h5, .npy, or .zarr tiles.

Equivalent of the reference's three legacy image-bag loaders, consolidated
behind one storage-gated reader (the ``load_bag_file`` pattern):

- ``HDF5MILDataloader`` (``datasets/custom_dataloader.py:32-271``)
- ``NpyMILDataloader`` (``datasets/custom_npy_dataloader.py``)
- ``ZarrMILDataloader`` (``datasets/custom_zarr_dataloader.py``, gated on the
  optional zarr dep)

Semantics reproduced:

- label JSON ``{mode: [[path, label], ...]}``; slide stem + storage suffix
  resolved under ``file_path``; missing files skipped
  (``custom_dataloader.py:63-70``).
- HDF5 stores ONE uint8 dataset per tile (keys are tile names,
  ``:186-204``); a single consolidated ``images`` dataset is also accepted.
  ``.npy``/``.zarr`` store an ``(N, H, W, 3)`` uint8 array.
- bag assembly: random permutation -> up to ``bag_size`` tiles -> zero-pad
  (``to_fixed_size_bag``, ``:474-488``; pad tiles are black, so they land at
  -1 after normalization).
- train: ONE slide-consistent augmentation draw applied to every tile of the
  bag (the reference's ``iaa.to_deterministic()``, ``:137-151``) using the
  ``data/transforms`` stack (HSV/HED jitter, flips/rot90, gamma via color
  jitter, affine/elastic).
- normalization: ``(img/255 - 0.5) / 0.5`` -> [-1, 1]
  (``RangeNormalization``, ``:27-30`` — the legacy pipeline's choice, NOT
  imagenet stats).
- LRU slide cache (``data_cache_size=10``, ``:230-245``).

Deliberate deviation: the reference fixes the bag draw at cache-fill time (a
side effect of ``to_fixed_size_bag`` running inside ``_load_data``), so a
cached slide repeats the same subsample until evicted. Here train bags are
redrawn per epoch from the caller's rng (the framework's reproducible-stream
convention) and eval draws are seeded per slide.
"""

from __future__ import annotations

import json
from collections import OrderedDict
from pathlib import Path

import numpy as np

_SUFFIXES = (".hdf5", ".h5", ".npy", ".zarr")


def load_image_bag(path: str | Path) -> np.ndarray:
    """Read a (N, H, W, 3) uint8 tile stack from any supported storage."""
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix in (".hdf5", ".h5"):
        import h5py

        with h5py.File(path, "r") as f:
            if "images" in f:  # consolidated layout
                return np.asarray(f["images"][:], np.uint8)
            tiles = [np.asarray(f[k][:], np.uint8) for k in sorted(f.keys())]
        if not tiles:
            raise ValueError(f"empty image-bag container: {path}")
        return np.stack(tiles)
    if suffix == ".npy":
        return np.load(path).astype(np.uint8)
    if suffix == ".zarr":
        try:
            import zarr
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "reading .zarr image bags requires the optional 'zarr' package"
            ) from e
        return np.asarray(zarr.open(str(path), mode="r")[:], np.uint8)
    raise ValueError(f"unsupported image-bag storage: {path}")


def range_normalize(img: np.ndarray) -> np.ndarray:
    """uint8 -> float32 in [-1, 1] (ref RangeNormalization)."""
    return (img.astype(np.float32) / 255.0 - 0.5) / 0.5


class ImageBagDataset:
    # black pad tiles normalize to -1; bucket-padding in collate must match
    # (datamodule reads this attribute) or pad rows become mid-gray content
    pad_value = -1.0

    def __init__(
        self,
        file_path: str | Path,
        label_path: str | Path,
        mode: str,
        n_classes: int,
        *,
        slide_patient_path: str | Path | None = None,
        bag_size: int = 1024,
        augment: bool = True,
        cache_size: int = 10,
    ) -> None:
        self.file_path = Path(file_path)
        self.mode = mode
        self.n_classes = n_classes
        self.bag_size = bag_size
        self.augment = augment
        self.cache_size = cache_size
        self._cache: "OrderedDict[int, np.ndarray]" = OrderedDict()

        from transmil_deepgraft_tpu.data.feature_bags import (
            load_label_entries,
            load_slide_patient,
            scan_label_entries,
        )

        self.slide_patient = load_slide_patient(slide_patient_path)

        def resolve(rel: str, name: str) -> Path | None:
            for suffix in _SUFFIXES:
                cand = self.file_path / f"{name}{suffix}"
                if cand.exists():
                    return cand
            return None

        (self.files, self.labels, self.names, self.patients,
         self.missing) = scan_label_entries(
            load_label_entries(label_path, mode), self.slide_patient, resolve
        )

    def __len__(self) -> int:
        return len(self.files)

    def get_labels(self) -> list[int]:
        return list(self.labels)

    def _load(self, index: int) -> np.ndarray:
        if index in self._cache:
            self._cache.move_to_end(index)
            return self._cache[index]
        bag = load_image_bag(self.files[index])
        self._cache[index] = bag
        while len(self._cache) > self.cache_size:
            self._cache.popitem(last=False)
        return bag

    def get_item(
        self, index: int, rng: np.random.Generator
    ) -> tuple[np.ndarray, int, tuple[str, np.ndarray, str]]:
        tiles = self._load(index)
        label = self.labels[index]
        name = self.names[index]
        patient = self.patients[index]
        n = tiles.shape[0]

        if self.mode in ("train", "fine_tune"):
            idx = rng.permutation(n)[: self.bag_size]
        else:
            idx = np.random.RandomState(0).permutation(n)[: self.bag_size]
        bag = tiles[idx]

        if self.mode in ("train", "fine_tune") and self.augment:
            from transmil_deepgraft_tpu.data.transforms import train_augment

            # slide-consistent draw: every tile gets an IDENTICALLY seeded rng
            # (the reference's iaa.to_deterministic applied bag-wide); runs
            # before padding so pad tiles skip the scipy stack
            tile_seed = int(rng.integers(2**31))
            bag = np.stack(
                [train_augment(t, np.random.default_rng(tile_seed)) for t in bag]
            )

        if bag.shape[0] < self.bag_size:  # zero-pad with BLACK tiles (u8 domain)
            pad = np.zeros((self.bag_size - bag.shape[0], *bag.shape[1:]), np.uint8)
            bag = np.concatenate([bag, pad], axis=0)

        # fixed-size bags: coords (zero placeholders — image bags carry no
        # grid coordinates) must span the PADDED bag so Batch.lengths and
        # per-tile exports stay index-consistent with the rows the model sees
        coords = np.zeros((bag.shape[0], 2), np.int32)
        return range_normalize(bag), label, (name, coords, patient)

    def __getitem__(self, index: int):
        return self.get_item(index, np.random.default_rng())

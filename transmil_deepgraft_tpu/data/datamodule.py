"""MILDataModule: dataset selection + batch iterators with static-shape bucketing.

Equivalent of the reference's ``MILDataModule``
(``code/datasets/data_interface.py:127-309``): picks the dataset class per model/
backbone, builds train/val/test iterators, applies the imbalanced sampler to
train/val, and collates bags into batches.

TPU-specific design: every emitted batch has a *static* shape. Train bags are
already fixed at ``max_bag_size`` (the reference zero-pads the same way). Eval
bags (deterministic 10% draws of varying length) default to ``eval_pad='exact'``
- the reference evaluates UNPADDED bags, and TransMIL's geometry (square grid,
PPEG convs, landmark segments) depends on the bag length, so bucket padding
shifts slide AUC materially (measured 0.22 on a synthetic task). 'exact' costs
one XLA compile per distinct eval length (amortized by the persistent compile
cache); opt into ``eval_pad='bucket'`` for compile-bounded sweeps where exact
parity does not matter.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Iterator, Sequence

import numpy as np

from transmil_deepgraft_tpu.data.feature_bags import FeatureBagDataset
from transmil_deepgraft_tpu.data.sampler import ImbalancedSampler
from transmil_deepgraft_tpu.data.coords import normalize_pad_coords
from transmil_deepgraft_tpu.data.synthetic import SyntheticBagDataset
from transmil_deepgraft_tpu.ops.padding import DEFAULT_BUCKETS, bucket_for_length


@dataclass
class Batch:
    bags: np.ndarray  # (B, N_bucket, D) float32
    labels: np.ndarray  # (B,) int32
    lengths: np.ndarray  # (B,) int32 real bag lengths before padding
    names: list[str]
    patients: list[str]
    coords: list[np.ndarray]
    # (B, N_bucket, 2) float32 tile grid coords aligned with ``bags`` rows, or
    # None when per-item coords are missing/unaligned (e.g. the bagstore train
    # path). Consumed by coord-aware heads (RoFormerMIL) via the trainer.
    padded_coords: np.ndarray | None = None


def _mixup_assembled(bags: np.ndarray, taken: np.ndarray, rng: np.random.Generator) -> None:
    """In-place bag mixup on a bagstore-assembled (B, k, D) batch, replicating
    ``FeatureBagDataset._mixup_bag`` semantics (ref feature_dataloader.py:303-330):
    convex combos of random instance pairs; full-length bags are replaced by the
    combos, short bags get combos appended into the zero pad."""
    k = bags.shape[1]
    for i in range(bags.shape[0]):
        n = int(taken[i])
        if n <= 0:
            continue
        view = bags[i, :n]
        a = rng.random(n, dtype=np.float32)[:, None]
        temp = a * view[rng.integers(0, n, n)] + (1.0 - a) * view[rng.integers(0, n, n)]
        if n < k:
            m = min(n, k - n)
            bags[i, n : n + m] = temp[rng.permutation(n)[:m]]
        else:
            bags[i] = temp


def _pad_to(bag: np.ndarray, n: int, pad_value: float = 0.0) -> np.ndarray:
    if bag.shape[0] >= n:
        return bag[:n]
    pad = np.full((n - bag.shape[0], *bag.shape[1:]), pad_value, bag.dtype)
    return np.concatenate([bag, pad], axis=0)


def collate(
    items: Sequence[tuple],
    eval_pad: str = "bucket",
    buckets=DEFAULT_BUCKETS,
    pad_value: float = 0.0,
) -> Batch:
    """``pad_value`` must match the dataset's own intra-bag padding domain:
    0.0 for feature bags and imagenet-normalized tile bags, -1.0 for the
    legacy image bags whose black pad tiles normalize to -1 — otherwise
    bucket padding would insert mid-gray content tiles."""
    bags = [i[0] for i in items]
    lengths = np.array([b.shape[0] for b in bags], np.int32)
    max_len = int(lengths.max())
    target = max_len if eval_pad == "exact" else bucket_for_length(max_len, buckets)
    coords = [np.asarray(i[2][1]) for i in items]
    # batch-level aligned coords for coord-aware heads: only when every item's
    # coords are row-aligned with its bag AND carry real positions (degenerate
    # (0, 2) placeholders and all-zero full-length placeholders — the
    # image-bag loaders' "no coords" convention — make this None, which
    # routes coord-aware heads to their square-grid fallback). Real coords
    # are min-normalized before zero-padding (data/coords.py contract).
    padded_coords = None
    if all(c.ndim == 2 and c.shape[0] == b.shape[0] and c.shape[1] == 2 and c.any()
           for c, b in zip(coords, bags)):
        padded_coords = np.stack([normalize_pad_coords(c, target) for c in coords])
    bags = np.stack([_pad_to(b, target, pad_value) for b in bags]).astype(np.float32)
    return Batch(
        bags=bags,
        labels=np.array([i[1] for i in items], np.int32),
        lengths=lengths,
        names=[i[2][0] for i in items],
        coords=coords,
        patients=[i[2][2] for i in items],
        padded_coords=padded_coords,
    )


class MILDataModule:
    def __init__(
        self,
        data_dir: str | None = None,
        label_path: str | None = None,
        *,
        n_classes: int = 2,
        max_bag_size: int = 1000,
        batch_size: int = 1,
        mixup: bool = False,
        feature_extractor: str | None = None,
        slide_patient_path: str | None = None,
        use_imbalanced_sampler: bool = True,
        eval_pad: str = "exact",
        seed: int = 2021,
        synthetic: dict | None = None,
        fine_tune: bool = False,
        dataset_name: str = "custom",
        fold: int = 0,
        variant: str = "features",  # features | spatial | images | tiles | image_bags
        mixed_res_dirs: list | None = None,  # extra train-res roots (ref feature_dataloader_mixed)
        tile_size: int = 224,
        resample_val: bool = False,  # reference quirk: ImbalancedSampler on val
    ) -> None:
        self.resample_val = resample_val
        self.tile_size = tile_size
        self.dataset_name = dataset_name
        self.fold = fold
        self.variant = variant
        self.mixed_res_dirs = mixed_res_dirs
        self.data_dir = data_dir
        self.label_path = label_path
        self.n_classes = n_classes
        self.max_bag_size = max_bag_size
        self.batch_size = batch_size
        self.mixup = mixup
        self.feature_extractor = feature_extractor
        self.slide_patient_path = slide_patient_path
        self.use_imbalanced_sampler = use_imbalanced_sampler
        self.eval_pad = eval_pad
        self.seed = seed
        self.synthetic = synthetic
        self.fine_tune = fine_tune
        self._datasets: dict[str, Any] = {}
        self._epoch = 0
        self._bagstore = None
        self._bagstore_labels: list[int] | None = None

    def enable_bagstore(self, path: str | None = None, rebuild: bool = False, n_threads: int = 8) -> None:
        """Switch train batching to the native mmap bag store (built once from
        the train split's HDF5 files): threaded sampling + batch assembly in C++
        instead of h5py-per-item reads. Mixup and the post-pad reshuffle are
        applied host-side on the assembled batch (vectorized numpy), so this
        path keeps the per-item path's training semantics."""
        from pathlib import Path as _P

        from transmil_deepgraft_tpu.data.bagstore import BagStore, write_bagstore

        ds = self.dataset("train")
        store_path = _P(path) if path else _P(self.data_dir) / "train_cohort.bags"
        if rebuild or not store_path.exists():
            from transmil_deepgraft_tpu.data.feature_bags import load_bag_file

            bags, coords = [], []
            for f in ds.files:
                b, c = load_bag_file(f)
                bags.append(b)
                coords.append(c)
            write_bagstore(store_path, bags, coords)
        self._bagstore = BagStore(store_path)
        self._bagstore_labels = ds.get_labels()
        self._bagstore_meta = (list(ds.names), list(ds.patients))
        self._bagstore_threads = n_threads
        self._bagstore_ntiles = np.array(
            [self._bagstore.n_tiles(i) for i in range(self._bagstore.n_slides)], np.int64
        )

    # -- dataset construction -------------------------------------------------
    def _make_dataset(self, mode: str):
        if self.synthetic is not None:
            cfg = dict(self.synthetic)
            n = {"train": cfg.pop("n_train", 32), "val": cfg.pop("n_val", 16), "test": cfg.pop("n_test", 16)}[
                "train" if mode == "fine_tune" else mode
            ]
            seed = {"train": 0, "fine_tune": 0, "val": 1, "test": 2}[mode]
            ds = SyntheticBagDataset(n_slides=n, n_classes=self.n_classes, seed=seed, **cfg)
            if mode in ("train", "fine_tune"):
                return _TrainViewSynthetic(ds, self.max_bag_size, self.mixup)
            return _EvalViewSynthetic(ds)
        if self.dataset_name == "camelyon":
            from transmil_deepgraft_tpu.data.camelyon import CamelyonDataset

            return CamelyonDataset(
                self.data_dir, self.label_path, mode, fold=self.fold,
                max_bag_size=self.max_bag_size,
            )
        actual_mode = "fine_tune" if (mode == "train" and self.fine_tune) else mode
        if self.variant == "spatial":
            # CTMIL / spatial-resnet50 heads (ref data_interface.py:166-177)
            from transmil_deepgraft_tpu.data.local_features import LocalFeatureBagDataset

            return LocalFeatureBagDataset(
                self.data_dir, self.label_path, actual_mode, self.n_classes,
                slide_patient_path=self.slide_patient_path,
                feature_extractor=self.feature_extractor,
            )
        if self.variant == "image_bags":
            # legacy raw-image bags (.hdf5/.npy/.zarr tile stacks, ref
            # custom_dataloader.py / custom_npy_dataloader.py /
            # custom_zarr_dataloader.py)
            from transmil_deepgraft_tpu.data.image_bags import ImageBagDataset

            return ImageBagDataset(
                self.data_dir, self.label_path, actual_mode, self.n_classes,
                slide_patient_path=self.slide_patient_path,
                bag_size=self.max_bag_size,
            )
        if self.variant in ("images", "tiles"):
            from transmil_deepgraft_tpu.data.jpg_bags import JPGMILDataset, JPGTileDataset

            bags = JPGMILDataset(
                self.data_dir, self.label_path, actual_mode, self.n_classes,
                slide_patient_path=self.slide_patient_path,
                max_bag_size=self.max_bag_size,
                tile_size=self.tile_size,
            )
            return JPGTileDataset(bags) if self.variant == "tiles" else bags
        return FeatureBagDataset(
            self.data_dir,
            self.label_path,
            actual_mode,
            self.n_classes,
            slide_patient_path=self.slide_patient_path,
            max_bag_size=self.max_bag_size,
            mixup=self.mixup and mode in ("train", "fine_tune"),
            feature_extractor=self.feature_extractor,
            mixed_res_dirs=self.mixed_res_dirs,
        )

    def dataset(self, mode: str):
        if mode not in self._datasets:
            self._datasets[mode] = self._make_dataset(mode)
        return self._datasets[mode]

    # -- iterators -------------------------------------------------------------
    def train_batches(self, epoch: int) -> Iterator[Batch]:
        ds = self.dataset("train")
        rng = np.random.default_rng((self.seed, epoch))
        if self.use_imbalanced_sampler:
            order = ImbalancedSampler(ds.get_labels(), self.n_classes).sample_epoch(rng)
        else:
            order = rng.permutation(len(ds))
        bs = self.batch_size
        if self._bagstore is not None:
            names, patients = self._bagstore_meta
            labels = np.asarray(self._bagstore_labels, np.int32)
            k = self.max_bag_size
            for start in range(0, len(order) - bs + 1, bs):
                idxs = order[start : start + bs]
                bags = self._bagstore.assemble_batch(
                    idxs, k=k, seed=int(rng.integers(2**31)), n_threads=self._bagstore_threads
                )
                taken = np.minimum(self._bagstore_ntiles[idxs], k).astype(np.int64)
                if self.mixup:
                    _mixup_assembled(bags, taken, rng)
                # post-pad reshuffle (ref feature_dataloader.py:363-365): zero-pad
                # rows must land at random positions - TransMIL's square grid /
                # PPEG make token order meaningful.
                perm = rng.random((bs, k)).argsort(axis=1)
                bags = np.take_along_axis(bags, perm[:, :, None], axis=1)
                yield Batch(
                    bags=bags,
                    labels=labels[idxs],
                    lengths=np.full(bs, k, np.int32),
                    names=[names[i] for i in idxs],
                    patients=[patients[i] for i in idxs],
                    coords=[np.zeros((0, 2), np.int32)] * bs,
                )
            return
        for start in range(0, len(order) - bs + 1, bs):
            items = [self._get(ds, int(i), rng) for i in order[start : start + bs]]
            # train bags are already fixed-size
            yield collate(items, eval_pad="exact", pad_value=getattr(ds, "pad_value", 0.0))

    def eval_batches(self, mode: str, batch_size: int = 1) -> Iterator[Batch]:
        ds = self.dataset(mode)
        rng = np.random.default_rng(0)
        order = np.arange(len(ds))
        if mode == "val" and self.resample_val:
            # reference quirk: the val loader also uses the inverse-frequency
            # sampler-with-replacement (data_interface.py:217-231); off by
            # default here (deterministic full-split validation).
            order = ImbalancedSampler(ds.get_labels(), self.n_classes).sample_epoch(rng)
        for start in range(0, len(order), batch_size):
            items = [self._get(ds, int(i), rng) for i in order[start : start + batch_size]]
            yield collate(items, eval_pad=self.eval_pad, pad_value=getattr(ds, "pad_value", 0.0))

    @staticmethod
    def _get(ds, index: int, rng: np.random.Generator):
        if hasattr(ds, "get_item"):
            return ds.get_item(index, rng)
        return ds[index]

    def steps_per_epoch(self) -> int:
        return len(self.dataset("train")) // self.batch_size


class _TrainViewSynthetic:
    """Applies FeatureBagDataset train sampling semantics to a synthetic dataset."""

    def __init__(self, ds: SyntheticBagDataset, max_bag_size: int, mixup: bool) -> None:
        self.ds = ds
        self.max_bag_size = max_bag_size
        self.mixup = mixup

    def __len__(self) -> int:
        return len(self.ds)

    def get_labels(self):
        return self.ds.get_labels()

    def get_item(self, index: int, rng: np.random.Generator):
        feats, label, (name, coords, patient) = self.ds[index]
        idx = rng.permutation(feats.shape[0])[: self.max_bag_size]
        bag = feats[idx]
        bag = _pad_to(bag, self.max_bag_size)
        # coords stay row-aligned through subsample/pad/shuffle (same rng
        # draws as before, so bags are bit-identical for coord-free heads)
        coords = normalize_pad_coords(np.asarray(coords)[idx], bag.shape[0])
        perm = rng.permutation(bag.shape[0])
        return bag[perm], label, (name, coords[perm], patient)


class _EvalViewSynthetic:
    def __init__(self, ds: SyntheticBagDataset) -> None:
        self.ds = ds

    def __len__(self) -> int:
        return len(self.ds)

    def get_labels(self):
        return self.ds.get_labels()

    def get_item(self, index: int, rng: np.random.Generator):
        return self.ds[index]

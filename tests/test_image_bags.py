"""Legacy raw-image bag loaders (data/image_bags.py) — the last §2.3 rows.

Covers the consolidated storage gate (.hdf5 per-tile datasets, consolidated
'images' HDF5, .npy), reference bag semantics (randperm -> bag_size ->
black-tile zero-pad -> [-1,1] range normalization), slide-consistent train
augmentation, the LRU slide cache, and datamodule routing
(variant='image_bags'). Ref: datasets/custom_dataloader.py:27-271,
custom_npy_dataloader.py, custom_zarr_dataloader.py.
"""

import json

import h5py
import numpy as np
import pytest

from transmil_deepgraft_tpu.data.image_bags import (
    ImageBagDataset,
    load_image_bag,
    range_normalize,
)

TILE = 32


def _write_cohort(root, n_slides=4, tiles_per_slide=(6, 10, 3, 8)):
    rng = np.random.default_rng(0)
    root.mkdir(parents=True, exist_ok=True)
    entries = []
    for i in range(n_slides):
        name = f"slide_{i}"
        imgs = rng.integers(0, 255, (tiles_per_slide[i], TILE, TILE, 3)).astype(np.uint8)
        if i == 0:  # per-tile datasets (the reference layout)
            with h5py.File(root / f"{name}.hdf5", "w") as f:
                for t in range(len(imgs)):
                    f[f"tile_{t:03d}"] = imgs[t]
        elif i == 1:  # consolidated layout
            with h5py.File(root / f"{name}.h5", "w") as f:
                f["images"] = imgs
        else:  # npy storage
            np.save(root / f"{name}.npy", imgs)
        entries.append([name, i % 2])
    entries.append(["missing_slide", 0])
    labels = {"train": entries, "val": entries[:2], "test": entries[:2]}
    label_path = root / "labels.json"
    label_path.write_text(json.dumps(labels))
    return label_path


def test_storage_gate_roundtrip(tmp_path):
    label_path = _write_cohort(tmp_path / "bags")
    for name, n in (("slide_0.hdf5", 6), ("slide_1.h5", 10), ("slide_2.npy", 3)):
        bag = load_image_bag(tmp_path / "bags" / name)
        assert bag.shape == (n, TILE, TILE, 3) and bag.dtype == np.uint8
    with pytest.raises(ValueError, match="unsupported"):
        load_image_bag(tmp_path / "bags" / "labels.json")


def test_train_bag_semantics(tmp_path):
    label_path = _write_cohort(tmp_path / "bags")
    ds = ImageBagDataset(
        tmp_path / "bags", label_path, "train", 2, bag_size=8, augment=False
    )
    assert len(ds) == 4 and ds.missing == ["missing_slide"]
    rng = np.random.default_rng(3)
    bag, label, (name, coords, patient) = ds.get_item(2, rng)  # slide_2: 3 tiles
    assert bag.shape == (8, TILE, TILE, 3) and bag.dtype == np.float32
    assert -1.0 <= bag.min() and bag.max() <= 1.0
    # zero-pad tiles are black -> exactly -1 after range normalization
    np.testing.assert_allclose(bag[3:], -1.0)
    assert label == 0 and name == "slide_2" and patient == "slide_2"


def test_eval_draw_deterministic(tmp_path):
    label_path = _write_cohort(tmp_path / "bags")
    ds = ImageBagDataset(tmp_path / "bags", label_path, "val", 2, bag_size=4)
    a = ds.get_item(1, np.random.default_rng(1))[0]
    b = ds.get_item(1, np.random.default_rng(99))[0]
    np.testing.assert_array_equal(a, b)  # eval: seeded per-slide draw


def test_slide_consistent_augmentation(tmp_path):
    label_path = _write_cohort(tmp_path / "bags")
    ds = ImageBagDataset(
        tmp_path / "bags", label_path, "train", 2, bag_size=4, augment=True
    )
    rng = np.random.default_rng(0)
    bag, _, _ = ds.get_item(1, rng)  # slide_1: 10 tiles
    assert bag.shape == (4, TILE, TILE, 3)
    assert np.isfinite(bag).all()
    # identical tiles augment identically under the slide-consistent draw
    with h5py.File(tmp_path / "bags" / "slide_1.h5", "r+") as f:
        imgs = np.asarray(f["images"][:])
        imgs[1] = imgs[0]
        del f["images"]
        f["images"] = imgs
    ds2 = ImageBagDataset(
        tmp_path / "bags", label_path, "train", 2, bag_size=10, augment=True
    )
    bag2, _, _ = ds2.get_item(1, np.random.default_rng(0))
    perm = np.random.default_rng(0).permutation(10)[:10]
    pos0, pos1 = int(np.where(perm == 0)[0][0]), int(np.where(perm == 1)[0][0])
    np.testing.assert_array_equal(bag2[pos0], bag2[pos1])


def test_lru_cache_bounded(tmp_path):
    label_path = _write_cohort(tmp_path / "bags")
    ds = ImageBagDataset(
        tmp_path / "bags", label_path, "train", 2, bag_size=4,
        augment=False, cache_size=2,
    )
    rng = np.random.default_rng(0)
    for i in range(4):
        ds.get_item(i, rng)
    assert len(ds._cache) == 2


def test_datamodule_routing_and_training(tmp_path):
    """variant='image_bags' plumbs through MILDataModule into collated
    batches a conv model can consume."""
    from transmil_deepgraft_tpu.data.datamodule import MILDataModule

    label_path = _write_cohort(tmp_path / "bags")
    dm = MILDataModule(
        str(tmp_path / "bags"), str(label_path), n_classes=2,
        max_bag_size=4, batch_size=2, variant="image_bags",
        use_imbalanced_sampler=False, seed=0,
    )
    batch = next(iter(dm.train_batches(epoch=0)))
    assert batch.bags.shape == (2, 4, TILE, TILE, 3)
    assert batch.bags.dtype == np.float32
    ev = next(iter(dm.eval_batches("val")))
    assert ev.bags.ndim == 5


def test_augmented_padded_bag_finite(tmp_path):
    """Zero-pad (black) tiles survive the augmentation stack (HED jitter logs
    etc.) without NaN and stay at -1 after normalization."""
    label_path = _write_cohort(tmp_path / "bags")
    ds = ImageBagDataset(
        tmp_path / "bags", label_path, "train", 2, bag_size=8, augment=True
    )
    bag, _, _ = ds.get_item(2, np.random.default_rng(0))  # slide_2: 3 tiles
    assert np.isfinite(bag).all()
    np.testing.assert_allclose(bag[3:], -1.0)


def test_eval_coords_lengths_consistent(tmp_path):
    """Fixed-size image bags must keep Batch.lengths == len(coords) == the
    bag rows the model sees, or test-stage top-k attention export indexes
    coords out of bounds (round-3 review finding)."""
    from transmil_deepgraft_tpu.data.datamodule import MILDataModule

    label_path = _write_cohort(tmp_path / "bags")
    dm = MILDataModule(
        str(tmp_path / "bags"), str(label_path), n_classes=2,
        max_bag_size=8, batch_size=2, variant="image_bags",
        use_imbalanced_sampler=False, seed=0,
    )
    batch = next(iter(dm.eval_batches("val")))
    for j in range(len(batch.names)):
        n = int(batch.lengths[j])
        assert len(batch.coords[j]) == n == batch.bags.shape[1]
        # the exact indexing the trainer's export_topk_tiles path performs
        scores = np.linspace(1.0, 0.0, n, dtype=np.float32)
        order = np.argsort(-scores)[:10]
        _ = batch.coords[j][order]  # must not raise


def test_pad_tiles_not_augmented(tmp_path):
    """Augmentation runs on the real tiles only; black pad tiles skip the
    scipy stack (they provably stay -1, so augmenting them is pure waste)."""
    import transmil_deepgraft_tpu.data.image_bags as ib
    from transmil_deepgraft_tpu.data import transforms

    label_path = _write_cohort(tmp_path / "bags")
    ds = ib.ImageBagDataset(
        tmp_path / "bags", label_path, "train", 2, bag_size=8, augment=True
    )
    calls = []
    orig = transforms.train_augment

    def counting(tile, rng):
        calls.append(1)
        return orig(tile, rng)

    transforms.train_augment = counting
    try:
        ds.get_item(2, np.random.default_rng(0))  # slide_2: 3 real tiles
    finally:
        transforms.train_augment = orig
    assert len(calls) == 3

"""WSI tiling loader, classic tile classifier, bagstore-backed datamodule,
fine-tune data mode."""

import json

import jax
import jax.numpy as jnp
import numpy as np


def test_wsi_grid_patches_and_dataset(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    # build a fake slide: tissue (colored) left half, white background right half
    img = np.full((448, 896, 3), 255, np.uint8)
    img[:, :448] = rng.integers(60, 200, (448, 448, 3)).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "slide_a.png")
    datalist = {"training": [{"image": "slide_a.png", "label": 1}]}
    (tmp_path / "datalist.json").write_text(json.dumps(datalist))

    from transmil_deepgraft_tpu.data.wsi import WSIDataset, open_slide, grid_patches

    reader = open_slide(tmp_path / "slide_a.png")
    assert reader.dimensions == (896, 448)
    patches = list(grid_patches(reader, patch_size=224, min_tissue=0.1))
    # only the tissue half should survive filtering: 2x2 grid of 224 -> left 2 cols
    assert len(patches) == 4
    assert all(xy[0] < 2 for _, xy in patches)

    ds = WSIDataset(tmp_path / "datalist.json", patch_size=224, max_patches=3)
    bag, label, (name, coords, patient) = ds.get_item(0, np.random.default_rng(0))
    assert bag.shape[0] <= 3 and bag.shape[1:] == (224, 224, 3)
    assert label == 1 and name == "slide_a"


def test_classic_tile_classifier():
    from transmil_deepgraft_tpu.models.classic import classic_model

    model = classic_model("simple", n_classes=2)
    x = jnp.zeros((2, 224, 224, 3))
    variables = model.init({"params": jax.random.key(0)}, x)
    assert model.apply(variables, x).shape == (2, 2)


def test_datamodule_bagstore_path(tmp_path):
    import h5py

    rng = np.random.default_rng(0)
    feats_dir = tmp_path / "FEATS"
    feats_dir.mkdir()
    entries = []
    for i in range(6):
        with h5py.File(feats_dir / f"s{i}.h5", "w") as f:
            n = int(rng.integers(20, 60))
            f["features"] = rng.standard_normal((n, 8)).astype(np.float32)
            f["coords"] = np.zeros((n, 2), np.int32)
        entries.append([f"s{i}.h5", i % 2])
    (tmp_path / "labels.json").write_text(json.dumps({"train": entries, "val": entries, "test": entries}))

    from transmil_deepgraft_tpu.data.datamodule import MILDataModule

    dm = MILDataModule(
        data_dir=str(feats_dir), label_path=str(tmp_path / "labels.json"),
        n_classes=2, max_bag_size=32, batch_size=2,
    )
    dm.enable_bagstore()
    batches = list(dm.train_batches(epoch=0))
    assert len(batches) == 3
    b = batches[0]
    assert b.bags.shape == (2, 32, 8) and b.labels.shape == (2,)
    assert all(n.startswith("s") for n in b.names)
    # determinism per epoch seed
    batches2 = list(dm.train_batches(epoch=0))
    np.testing.assert_array_equal(batches[0].bags, batches2[0].bags)


def test_fine_tune_mode_uses_test_mixin(tmp_path):
    import h5py

    rng = np.random.default_rng(0)
    feats_dir = tmp_path / "F"
    feats_dir.mkdir()
    for name in ("tr0", "mix0"):
        with h5py.File(feats_dir / f"{name}.h5", "w") as f:
            f["features"] = rng.standard_normal((10, 4)).astype(np.float32)
            f["coords"] = np.zeros((10, 2), np.int32)
    labels = {"train": [["tr0.h5", 0]], "test_mixin": [["mix0.h5", 1]], "val": [], "test": []}
    (tmp_path / "labels.json").write_text(json.dumps(labels))

    from transmil_deepgraft_tpu.data.feature_bags import FeatureBagDataset

    ds = FeatureBagDataset(feats_dir, tmp_path / "labels.json", "fine_tune", 2)
    assert sorted(ds.names) == ["mix0", "tr0"]  # train + test_mixin (ref :78-80)


def test_resample_val_option():
    from transmil_deepgraft_tpu.data.datamodule import MILDataModule

    kw = dict(
        n_classes=2, max_bag_size=16, batch_size=1,
        synthetic={"n_train": 4, "n_val": 12, "n_test": 4, "bag_size": 16, "feature_size": 8},
    )
    plain = MILDataModule(**kw)
    names_plain = [b.names[0] for b in plain.eval_batches("val")]
    assert names_plain == sorted(set(names_plain))  # deterministic full split

    res = MILDataModule(**kw, resample_val=True)
    names_res = [b.names[0] for b in res.eval_batches("val")]
    assert len(names_res) == len(names_plain)
    assert len(set(names_res)) < len(names_res) or names_res != names_plain

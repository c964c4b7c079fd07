"""Feature-file checker, HDF5 consolidation, DFF, top-k tile export."""

import json

import numpy as np


def test_feature_file_checker(tmp_path):
    import h5py

    rng = np.random.default_rng(0)
    root = tmp_path / "F"
    root.mkdir()
    with h5py.File(root / "good.h5", "w") as f:
        f["features"] = rng.standard_normal((10, 4)).astype(np.float32)
        f["coords"] = np.zeros((10, 2), np.int32)
    with h5py.File(root / "badcoords.h5", "w") as f:
        f["features"] = rng.standard_normal((10, 4)).astype(np.float32)
        f["coords"] = np.zeros((3, 2), np.int32)
    with h5py.File(root / "nan.h5", "w") as f:
        arr = rng.standard_normal((5, 4)).astype(np.float32)
        arr[0, 0] = np.nan
        f["features"] = arr
        f["coords"] = np.zeros((5, 2), np.int32)
    (root / "trash.h5").write_bytes(b"not an hdf5 file")
    labels = {"train": [["good.h5", 0], ["badcoords.h5", 1], ["nan.h5", 0], ["trash.h5", 1], ["missing.h5", 0]]}
    (tmp_path / "labels.json").write_text(json.dumps(labels))

    from transmil_deepgraft_tpu.data.tools import check_feature_files

    rep = check_feature_files(root, tmp_path / "labels.json", splits=("train",))
    s = rep.summary()
    assert s["ok"] == 1 and s["missing"] == 1 and s["corrupt"] == 3
    assert rep.dims == {4: 1}


def test_merge_to_hdf5_dir(tmp_path):
    import torch

    rng = np.random.default_rng(0)
    src = tmp_path / "s0.pt"
    torch.save(torch.from_numpy(rng.standard_normal((6, 3)).astype(np.float32)), src)
    np.save(tmp_path / "s1.npy", rng.standard_normal((4, 3)).astype(np.float32))

    from transmil_deepgraft_tpu.data.tools import merge_to_hdf5_dir

    out = merge_to_hdf5_dir([src, tmp_path / "s1.npy"], tmp_path / "OUT")
    assert [p.name for p in out] == ["s0.h5", "s1.h5"]
    import h5py

    with h5py.File(out[0], "r") as f:
        assert f["features"].shape == (6, 3)


def test_deep_feature_factorization(rng):
    from transmil_deepgraft_tpu.visualize.heatmap import deep_feature_factorization

    # two latent concepts
    basis = rng.random((2, 16))
    weights = rng.random((50, 2))
    feats = weights @ basis
    w, h = deep_feature_factorization(feats, n_concepts=2)
    assert w.shape == (50, 2) and h.shape == (2, 16)
    recon = w @ h
    assert np.abs(recon - (feats - feats.min())).mean() < 0.1


def test_export_topk_tiles(tmp_path):
    import pandas as pd

    from transmil_deepgraft_tpu.visualize.heatmap import export_topk_tiles

    scores = np.array([0.1, 0.9, 0.5, 0.7])
    coords = np.array([[0, 0], [1, 0], [0, 1], [1, 1]])
    path = export_topk_tiles(scores, coords, "s1", tmp_path / "topk.csv", k=2)
    df = pd.read_csv(path)
    assert list(df["score"]) == [0.9, 0.7]
    assert list(df["x"]) == [1, 1]

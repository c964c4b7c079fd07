"""Orbax checkpoint backend option (utils/checkpoints.py backend='orbax')."""

import numpy as np
import pytest

from transmil_deepgraft_tpu.utils.checkpoints import (
    CheckpointManager,
    load_pytree,
    save_pytree,
)


def _tree(seed):
    rng = np.random.default_rng(seed)
    return {
        "params": {"w": rng.standard_normal((4, 3)).astype(np.float32),
                   "b": rng.standard_normal(3).astype(np.float32)},
        "epoch": np.asarray(seed),
    }


def test_orbax_roundtrip_and_autodetect(tmp_path):
    tree = _tree(1)
    save_pytree(tmp_path / "ck", tree, backend="orbax")
    assert (tmp_path / "ck").is_dir()
    got = load_pytree(tmp_path / "ck", _tree(0))  # backend autodetected from dir
    np.testing.assert_array_equal(got["params"]["w"], tree["params"]["w"])
    np.testing.assert_array_equal(got["epoch"], tree["epoch"])

    # msgpack file path still autodetects
    save_pytree(tmp_path / "ck.msgpack", tree)
    got2 = load_pytree(tmp_path / "ck.msgpack", _tree(0))
    np.testing.assert_array_equal(got2["params"]["b"], tree["params"]["b"])


def test_orbax_overwrite(tmp_path):
    save_pytree(tmp_path / "ck", _tree(1), backend="orbax")
    save_pytree(tmp_path / "ck", _tree(2), backend="orbax")
    got = load_pytree(tmp_path / "ck", _tree(0))
    np.testing.assert_array_equal(got["epoch"], 2)


def test_unknown_backend_raises(tmp_path):
    with pytest.raises(ValueError):
        save_pytree(tmp_path / "x", _tree(0), backend="hdf5")


def test_manager_retention_with_orbax(tmp_path):
    mgr = CheckpointManager(
        tmp_path, monitors=(("val_loss", "min", 2),), backend="orbax"
    )
    for epoch, loss in enumerate([0.5, 0.4, 0.6, 0.3]):
        mgr.save_epoch(_tree(epoch), epoch, {"val_loss": loss})
    kept = {f for _, f in mgr.monitors["val_loss"].kept}
    assert len(kept) == 2
    # evicted orbax DIRECTORIES were removed; kept ones restorable
    ckpt_dirs = {p.name for p in tmp_path.iterdir() if p.is_dir() and p.name != "last.ckpt"}
    assert ckpt_dirs == kept
    best = mgr.best_path("val_loss")
    got = load_pytree(best, _tree(0))
    np.testing.assert_array_equal(got["epoch"], 3)  # epoch with loss 0.3
    # last.ckpt also orbax
    assert (tmp_path / "last.ckpt").is_dir()

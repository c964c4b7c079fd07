"""Round-3 review-pass fixes: console-script exit shims, atomic checkpoint
writes, collate pad-value plumbing, packaged config/native data, fused-path
batch validation."""

from __future__ import annotations

import importlib
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent


def test_entry_shims_resolve():
    """Every pyproject console script points at an _entry shim that exists and
    wraps the module's main (exit-0 semantics: the shim returns 0, not main()'s
    programmatic result)."""
    import tomllib

    scripts = tomllib.loads((REPO / "pyproject.toml").read_text())["project"]["scripts"]
    entry = importlib.import_module("transmil_deepgraft_tpu.cli._entry")
    assert len(scripts) >= 7
    for name, target in scripts.items():
        mod, _, fn = target.partition(":")
        assert mod == "transmil_deepgraft_tpu.cli._entry", (name, target)
        assert callable(getattr(entry, fn)), (name, target)


def test_entry_shim_returns_zero(monkeypatch):
    """A shim runs the underlying main() and returns 0 (so sys.exit(shim())
    is a success) even though main() returns a truthy value."""
    from transmil_deepgraft_tpu.cli import _entry, export_metrics

    calls = []
    monkeypatch.setattr(export_metrics, "main", lambda: calls.append(1) or {"truthy": 1})
    assert _entry.export_metrics() == 0
    assert calls == [1]


def test_save_pytree_atomic_msgpack(tmp_path):
    """Re-saving over an existing checkpoint goes through a .tmp sibling and
    leaves no temp file behind; the final file always holds a complete tree."""
    from flax import serialization

    from transmil_deepgraft_tpu.utils.checkpoints import load_pytree, save_pytree

    path = tmp_path / "last.ckpt"
    t1 = {"a": np.arange(4, dtype=np.float32)}
    t2 = {"a": np.arange(4, dtype=np.float32) * 2}
    save_pytree(path, t1)
    save_pytree(path, t2)
    assert not path.with_name(path.name + ".tmp").exists()
    out = load_pytree(path, t1)
    np.testing.assert_array_equal(out["a"], t2["a"])
    # and the bytes are a complete msgpack document
    serialization.msgpack_restore(path.read_bytes())


def test_save_pytree_atomic_orbax(tmp_path):
    ocp = pytest.importorskip("orbax.checkpoint")  # noqa: F841

    from transmil_deepgraft_tpu.utils.checkpoints import load_pytree, save_pytree

    path = tmp_path / "last.ckpt"
    t1 = {"a": np.arange(4, dtype=np.float32)}
    t2 = {"a": np.arange(4, dtype=np.float32) + 7}
    save_pytree(path, t1, backend="orbax")
    save_pytree(path, t2, backend="orbax")
    assert not path.with_name(path.name + ".tmp").exists()
    assert not path.with_name(path.name + ".old").exists()
    out = load_pytree(path, t1)
    np.testing.assert_array_equal(out["a"], t2["a"])


def test_collate_pad_value():
    from transmil_deepgraft_tpu.data.datamodule import collate

    items = [
        (np.full((10, 4), 0.5, np.float32), 1, ("s1", np.zeros((10, 2), np.int32), "p1")),
    ]
    batch = collate(items, eval_pad="bucket", buckets=(16,), pad_value=-1.0)
    assert batch.bags.shape == (1, 16, 4)
    np.testing.assert_array_equal(batch.bags[0, 10:], -1.0)
    # default stays zero-pad (feature bags / imagenet tile bags)
    batch0 = collate(items, eval_pad="bucket", buckets=(16,))
    np.testing.assert_array_equal(batch0.bags[0, 10:], 0.0)


def test_image_bag_dataset_declares_pad_value():
    from transmil_deepgraft_tpu.data.image_bags import ImageBagDataset, range_normalize

    assert ImageBagDataset.pad_value == -1.0
    # black pad tiles land exactly at the declared pad value
    assert float(range_normalize(np.zeros((1, 1, 3), np.uint8)).max()) == -1.0


def test_packaged_configs_and_native_sources():
    """configs/ and native/ live inside the package (shipped via package-data)."""
    pkg = REPO / "transmil_deepgraft_tpu"
    yamls = list((pkg / "configs").rglob("*.yaml"))
    assert len(yamls) >= 75
    assert (pkg / "native" / "bagstore.cpp").exists()
    assert (pkg / "native" / "tileloader.cpp").exists()
    assert (pkg / "native" / "Makefile").exists()


def test_extract_cohort_fused_batch_size_validated(tmp_path):
    """int8_fused rejects an indivisible batch_size up front (before any
    calibration or Pallas work)."""
    jax = pytest.importorskip("jax")  # noqa: F841
    from transmil_deepgraft_tpu.data.feature_extractor import extract_cohort

    # tiny fake jpg cohort: one slide, a few tiles
    from PIL import Image

    slide = tmp_path / "BLOCKS" / "slideA"
    slide.mkdir(parents=True)
    for i in range(3):
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(slide / f"t_({i}-0).jpg")
    import json

    label = tmp_path / "labels.json"
    label.write_text(json.dumps({"train": [["slideA", 0]]}))

    from transmil_deepgraft_tpu.data.jpg_bags import JPGMILDataset
    from transmil_deepgraft_tpu.models.backbones import create_backbone

    ds = JPGMILDataset(tmp_path / "BLOCKS", label, "train", 2)
    backbone, _dim = create_backbone("retccl")  # full 4-stage net
    # the check must fire BEFORE calibration/quantization touches the
    # variables, so an un-initialized backbone is fine here
    with pytest.raises(ValueError, match="does not divide batch_size"):
        extract_cohort(
            backbone, {}, ds, tmp_path / "out",
            batch_size=25, quantize="int8_fused",
        )


def test_check_home_remaps_foreign_roots():
    """ref check_home (train.py:330-350): absolute paths whose first component
    differs from the host's mount root are re-rooted; matching paths and
    relative paths pass through."""
    from transmil_deepgraft_tpu.utils.config import Config, check_home

    cfg = Config({
        "General": {"log_path": "/homeStor1/ylan/logs"},
        "Data": {"data_dir": "/homeStor1/ylan/data", "label_file": "labels.json"},
    })
    out = check_home(cfg, home="home")
    assert out.General.log_path == "/home/ylan/logs"
    assert out.Data.data_dir == "/home/ylan/data"
    assert out.Data.label_file == "labels.json"  # relative: untouched
    # already-matching root: untouched
    cfg2 = Config({"General": {"log_path": "/home/x"}, "Data": {}})
    assert check_home(cfg2, home="home").General.log_path == "/home/x"


def test_graceful_preemption_saves_and_resumes(tmp_path):
    """SIGTERM mid-fit: the trainer finishes the in-flight step, writes the
    full train state to last.ckpt, and returns cleanly; a fresh trainer
    resumes from it (preemptible-VM behavior the reference lacks)."""
    import os
    import signal
    import threading

    import jax

    from transmil_deepgraft_tpu.data.datamodule import MILDataModule
    from transmil_deepgraft_tpu.models import AttMIL
    from transmil_deepgraft_tpu.train.losses import create_loss
    from transmil_deepgraft_tpu.train.optimizers import create_optimizer
    from transmil_deepgraft_tpu.train.trainer import Trainer, TrainerConfig

    dm = MILDataModule(
        n_classes=2, max_bag_size=16, batch_size=2,
        synthetic={"n_train": 8, "n_val": 4, "n_test": 4, "bag_size": 16,
                   "feature_size": 16, "signal": 2.0},
        seed=0,
    )
    model = AttMIL(n_classes=2, in_features=16, out_features=8, attn_dim=4)
    cfg = TrainerConfig(epochs=500, log_dir=str(tmp_path), task="norm_rest")
    tr = Trainer(model, create_optimizer(opt="adam", lr=1e-3), dm, n_classes=2,
                 loss_fn=create_loss(), config=cfg, model_name="AttMIL")

    # deliver SIGTERM shortly after fit starts; the handler must stop the
    # 500-epoch fit early and leave a resumable last.ckpt
    killer = threading.Timer(3.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    killer.start()
    try:
        tr.fit()  # must RETURN (not raise) despite the signal
    finally:
        killer.cancel()
    assert tr.ckpts.last_path().exists()

    tr2 = Trainer(model, create_optimizer(opt="adam", lr=1e-3), dm, n_classes=2,
                  loss_fn=create_loss(), config=cfg, model_name="AttMIL")
    assert tr2.load_train_state(tr.ckpts.last_path())
    for a, b in zip(jax.tree.leaves(tr.params), jax.tree.leaves(tr2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the original SIGTERM disposition is restored after fit
    import signal as _s
    assert _s.getsignal(_s.SIGTERM) in (_s.SIG_DFL, _s.Handlers.SIG_DFL)

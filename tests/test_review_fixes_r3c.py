"""Regression tests for the round-3c review findings (post-428e072 commits):

1. serve --warmup crashed on bundles exported with batch != 1
2. preemption was invisible to callers (kfold kept training, CLI ran test)
3. native auto-build wrote into read-only site-packages
4. orbax atomic-swap crash window left last.ckpt loadable only as .old
5. (trainer) SIGTERM during eval was consumed only at the next train step
6. background autosave failures were silently swallowed
7. tile_parallel convenience cache grew unboundedly
"""

import os
from pathlib import Path

import jax
import numpy as np
import pytest


def _tiny_trainer(tmp_path, **cfg_kw):
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
    cfg_kw.setdefault("epochs", 2)
    cfg = TrainerConfig(log_dir=str(tmp_path), task="norm_rest", **cfg_kw)
    return Trainer(model, create_optimizer(opt="adam", lr=1e-3), dm, n_classes=2,
                   loss_fn=create_loss(), config=cfg, model_name="AttMIL")


def test_serve_warmup_handles_batched_bundle(tmp_path):
    """warmup() must probe each bucket at the bundle's exported batch."""
    from transmil_deepgraft_tpu.cli.serve import warmup
    from transmil_deepgraft_tpu.models import create_model
    from transmil_deepgraft_tpu.serving import ServingBundle, export_serving_bundle

    model = create_model("AttMIL", n_classes=2, in_features=16, out_features=8)
    x = np.zeros((2, 32, 16), np.float32)
    variables = jax.device_get(model.init({"params": jax.random.key(0)}, x))
    path = tmp_path / "b2.tdx"
    export_serving_bundle(model, variables, path, model_name="AttMIL",
                          in_features=16, batch=2, buckets=(32, 64))
    bundle = ServingBundle.load(path)
    warmup(bundle)  # crashed with ValueError("exported for batch=2, got 1")


def test_fit_flags_preemption_in_history(tmp_path):
    """Callers must be able to see that fit() stopped on a signal."""
    import signal
    import threading

    tr = _tiny_trainer(tmp_path, epochs=500)
    threading.Timer(2.0, lambda: os.kill(os.getpid(), signal.SIGTERM)).start()
    history = tr.fit()
    assert history.get("preempted") is True
    assert tr.preempted is True


def test_kfold_stops_on_preempted_fold(tmp_path):
    """run_kfold must not test/export/continue after a preempted fit."""
    from transmil_deepgraft_tpu.data.datamodule import MILDataModule
    from transmil_deepgraft_tpu.train.kfold import KFoldPreempted, run_kfold

    dm = MILDataModule(
        n_classes=2, max_bag_size=8, batch_size=2,
        synthetic={"n_train": 9, "n_val": 3, "n_test": 3, "bag_size": 8,
                   "feature_size": 8, "signal": 2.0},
        seed=0,
    )

    class PreemptedTrainer:
        preempted = True

        def fit(self):
            return {"preempted": True}

        def test(self):  # pragma: no cover - must never be reached
            raise AssertionError("test() ran on a preempted fold")

    with pytest.raises(KFoldPreempted) as e:
        run_kfold(lambda fold_dm, log_dir: PreemptedTrainer(), dm,
                  nfold=3, export_dir=tmp_path / "kf")
    assert e.value.fold == 0


def test_autosave_error_propagates(tmp_path, monkeypatch):
    """A failing background checkpoint write must surface, not vanish."""
    import transmil_deepgraft_tpu.train.trainer as trainer_mod

    tr = _tiny_trainer(tmp_path, autosave_async=True)
    first = next(iter(tr.dm.train_batches(epoch=0)))
    tr.init_params(first)

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(trainer_mod, "save_pytree", boom)
    tr._autosave({"params": tr.params})
    with pytest.raises(RuntimeError, match="no longer preemption-safe"):
        tr._autosave_join()
    # the error is consumed: a later join is clean
    tr._autosave_join()


def test_orbax_old_fallback(tmp_path):
    """A kill between the two renames of the orbax swap leaves only
    last.ckpt.old; load_pytree must recover it transparently."""
    pytest.importorskip("orbax.checkpoint")
    from transmil_deepgraft_tpu.utils.checkpoints import load_pytree, save_pytree

    tree = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    path = tmp_path / "last.ckpt"
    save_pytree(path, tree, backend="orbax")
    os.rename(path, path.with_name(path.name + ".old"))  # simulate the window
    assert not path.exists()
    restored = load_pytree(path, {"w": np.zeros((2, 3), np.float32)})
    np.testing.assert_array_equal(restored["w"], tree["w"])


def test_tile_parallel_cache_bounded():
    from jax.sharding import Mesh

    from transmil_deepgraft_tpu.parallel import tile_parallel as tp

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("dp",))
    tiles = np.ones((4, 3), np.float32)
    tp._RUN_CACHE.clear()
    for i in range(tp._RUN_CACHE_MAX + 5):
        # fresh lambda per call = the pathological caller the LRU bounds
        out = tp.tile_parallel_slide_embed(
            lambda s, x: x * s, np.float32(2.0), tiles, mesh
        )
        np.testing.assert_array_equal(np.asarray(out), tiles * 2.0)
    assert len(tp._RUN_CACHE) <= tp._RUN_CACHE_MAX


def test_native_build_falls_back_to_cache_dir(tmp_path, monkeypatch):
    """Read-only package dir (system install): build lands in the user cache."""
    import shutil

    from transmil_deepgraft_tpu.utils import native_build as nb

    fake_pkg_native = tmp_path / "native"
    fake_pkg_native.mkdir()
    for f in ("bagstore.cpp", "Makefile"):
        shutil.copy2(nb.NATIVE_DIR / f, fake_pkg_native / f)
    monkeypatch.setattr(nb, "NATIVE_DIR", fake_pkg_native)
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "cache"))
    monkeypatch.setattr(os, "access", lambda p, m: False)

    lib = nb.ensure_native_lib("bagstore", ["bagstore.cpp"])
    assert lib.exists()
    assert str(lib).startswith(str(tmp_path / "cache"))
    # second call: reuses the cached build (content hash unchanged)
    assert nb.ensure_native_lib("bagstore", ["bagstore.cpp"]) == lib


def test_cli_train_reports_preemption_and_skips_test(tmp_path):
    """SIGTERM during `transmil-train --stage train`: the CLI returns the
    preemption event, does NOT evaluate half-trained weights, and a
    --resume_training rerun completes normally from last.ckpt."""
    import signal
    import threading

    import yaml

    from transmil_deepgraft_tpu.cli.train import main as train_main

    base = (Path(__file__).parent.parent / "transmil_deepgraft_tpu" / "configs"
            / "synthetic_attmil_norm_rest.yaml")
    cfg = yaml.safe_load(base.read_text())
    cfg["General"]["epochs"] = 10_000  # run "forever" until the signal lands
    cfg_path = tmp_path / "synthetic_attmil_norm_rest.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    log_dir = tmp_path / "run"

    # Benign SIGTERM handler + repeating sender: if a signal lands before the
    # trainer installs its handler (slow startup on a loaded host) it is
    # ignored and the NEXT one triggers the preemption path; everything is
    # torn down in finally so stray signals can't kill later tests.
    prev = signal.signal(signal.SIGTERM, lambda *a: None)
    stop = threading.Event()

    def sender():
        while not stop.wait(8.0):
            os.kill(os.getpid(), signal.SIGTERM)

    threading.Thread(target=sender, daemon=True).start()
    try:
        out = train_main(["--stage", "train", "--config", str(cfg_path),
                          "--log_dir", str(log_dir)])
    finally:
        stop.set()
        signal.signal(signal.SIGTERM, prev)
    assert out.get("event") == "preempted"
    assert (log_dir / "checkpoints" / "last.ckpt").exists()
    # the test stage must not have run on half-trained weights
    assert not list(log_dir.glob("**/TEST_RESULT_*.csv"))

    cfg["General"]["epochs"] = 1
    cfg_path.write_text(yaml.safe_dump(cfg))
    out2 = train_main(["--stage", "train", "--config", str(cfg_path),
                       "--log_dir", str(log_dir), "--resume_training"])
    assert "event" not in out2 and "test_patient_auroc" in out2


def test_init_multihost_single_process_noop():
    """init_multihost in a single-process run: no crash, identity indices,
    and the mesh helpers keep working afterwards."""
    from transmil_deepgraft_tpu.parallel.mesh import init_multihost, make_mesh

    idx, count = init_multihost()
    assert (idx, count) == (0, 1)
    mesh = make_mesh(sp=1)
    assert mesh.shape["dp"] == len(jax.devices())


def test_init_multihost_refuses_late_join(monkeypatch):
    """With a cluster environment detected but the XLA backend already up
    (too late to join), init_multihost must raise — silently running N
    independent single-host jobs is the failure mode this guards."""
    from transmil_deepgraft_tpu.parallel.mesh import init_multihost

    jax.devices()  # ensure the backend is initialized
    monkeypatch.setenv("SLURM_NTASKS", "4")
    with pytest.raises(RuntimeError, match="before any JAX computation"):
        init_multihost()
    # explicit args behave the same
    with pytest.raises(RuntimeError, match="before any JAX computation"):
        init_multihost(coordinator_address="127.0.0.1:1234", num_processes=2,
                       process_id=0)

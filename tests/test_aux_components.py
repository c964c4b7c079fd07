"""Tests: prefetch pipeline, plots, export metrics, profiler, EfficientNet,
SimCLR, ConvMixer."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from transmil_deepgraft_tpu.data.pipeline import device_prefetch, prefetch, shard_for_host


def test_prefetch_order_and_exception():
    out = list(prefetch(iter(range(10)), size=3))
    assert out == list(range(10))

    def boom():
        yield 1
        raise ValueError("boom")

    it = prefetch(boom(), size=2)
    assert next(it) == 1
    try:
        list(it)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_shard_for_host():
    items = list(range(10))
    shards = [shard_for_host(items, h, 3) for h in range(3)]
    assert sum(shards, []) == items


def test_device_prefetch():
    batches = [np.ones((2, 3)) * i for i in range(4)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 4
    assert float(np.asarray(out[3]).mean()) == 3.0


def test_plots_and_export(tmp_path):
    from transmil_deepgraft_tpu.utils.export_metrics import bootstrap_auroc, export_run
    from transmil_deepgraft_tpu.utils.plots import (
        plot_confusion_matrix,
        plot_pr_curves,
        plot_roc_curves,
    )

    rng = np.random.default_rng(0)
    n = 60
    targets = rng.integers(0, 2, n)
    probs = np.stack([1 - (targets * 0.6 + rng.random(n) * 0.4), targets * 0.6 + rng.random(n) * 0.4], 1)

    for fn, name in ((plot_roc_curves, "roc"), (plot_pr_curves, "pr"), (plot_confusion_matrix, "cm")):
        paths = fn(probs, targets, 2, tmp_path / name, task="norm_rest")
        assert all(p.exists() for p in paths)

    boot = bootstrap_auroc(probs, targets, 2, n_boot=100)
    assert boot["ci_low"] <= boot["auroc"] <= boot["ci_high"]

    # export_run over a synthetic result CSV
    import pandas as pd

    pd.DataFrame(
        {"PATIENT": [f"p{i}" for i in range(n)], "yTrue": targets,
         "Normal": probs[:, 0], "Disease": probs[:, 1]}
    ).to_csv(tmp_path / "TEST_RESULT_PATIENT.csv")
    summary = export_run(tmp_path, "norm_rest", 2, n_boot=50)
    assert "auroc" in summary and (tmp_path / "test_bootstrap.json").exists()


def test_step_timer():
    from transmil_deepgraft_tpu.utils.profiling import StepTimer

    t = StepTimer()
    for _ in range(3):
        with t:
            pass
    s = t.summary()
    assert s["steps"] == 3 and s["total_s"] >= 0


def test_efficientnet_b0():
    from transmil_deepgraft_tpu.models.efficientnet import efficientnet_b0

    model = efficientnet_b0()
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x)
    feats = model.apply(variables, x)
    assert feats.shape == (1, 1280)


def test_simclr_loss_decreases_for_aligned_views():
    from transmil_deepgraft_tpu.models.simclr import nt_xent

    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((8, 16), dtype=np.float32))
    aligned = float(nt_xent(z, z + 0.01 * rng.standard_normal((8, 16)).astype(np.float32)))
    random = float(nt_xent(z, jnp.asarray(rng.standard_normal((8, 16), dtype=np.float32))))
    assert aligned < random


def test_convmixer_forward():
    from transmil_deepgraft_tpu.models.convmixer import ConvMixer

    model = ConvMixer(dim=32, depth=2, n_classes=3)
    x = jnp.zeros((1, 56, 56, 3))
    variables = model.init(jax.random.key(0), x)
    assert model.apply(variables, x).shape == (1, 3)


def test_efficientnet_backbone_factory():
    from transmil_deepgraft_tpu.models.backbones import create_backbone

    mdl, dim = create_backbone("efficientnet", out_features=512)
    assert dim == 512
    x = jnp.zeros((1, 64, 64, 3))
    variables = mdl.init(jax.random.key(0), x)
    assert mdl.apply(variables, x).shape == (1, 512)


def test_prefetch_abandoned_consumer_releases_producer():
    """Breaking out of a prefetch loop (fast_dev_run, mid-epoch exception)
    must let the producer thread exit instead of blocking forever on the
    full queue (round-3 review finding)."""
    import threading
    import time

    from transmil_deepgraft_tpu.data.pipeline import prefetch

    n_before = threading.active_count()
    produced = []

    def source():
        for i in range(100):
            produced.append(i)
            yield i

    it = prefetch(source(), size=2)
    assert next(it) == 0
    it.close()  # what GC does when the loop breaks and the ref drops
    deadline = time.time() + 5.0
    while threading.active_count() > n_before and time.time() < deadline:
        time.sleep(0.01)
    assert threading.active_count() <= n_before
    assert len(produced) < 100  # producer stopped early, not drained


def test_jax_platforms_env_is_authoritative():
    """Importing the package makes JAX_PLATFORMS win even when a site plugin
    eagerly registered another PJRT backend (utils/jax_platform.py): with
    JAX_PLATFORMS=cpu a fresh process must come up on CPU without ever
    initializing (or hanging on) the plugin backend."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-c",
         "import transmil_deepgraft_tpu, jax; print(jax.default_backend())"],
        env=env, capture_output=True, text=True, timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().splitlines()[-1] == "cpu"


def test_scan_log_tree_discovery(tmp_path):
    """Log-tree run discovery (the reference get_data surface,
    export_metrics.py:198-260): runs found by walking
    {root}/{project}/{model}/{task}/_{backbone}_{loss}[/fold*], with
    project/model/task filters, and the CLI --log_root path feeds them to
    export_combined."""
    import pandas as pd

    from transmil_deepgraft_tpu.utils.export_metrics import scan_log_tree

    rng = np.random.default_rng(1)

    def make_run(*parts):
        d = tmp_path.joinpath(*parts)
        d.mkdir(parents=True, exist_ok=True)
        t = rng.integers(0, 2, 30)
        pr = t * 0.6 + rng.random(30) * 0.4
        pd.DataFrame({"PATIENT": [f"p{i}" for i in range(30)], "yTrue": t,
                      "Normal": 1 - pr, "Disease": pr}).to_csv(
            d / "TEST_RESULT_PATIENT.csv")
        return d

    r1 = make_run("DeepGraft", "TransMIL", "norm_rest", "_features_CrossEntropyLoss")
    r2 = make_run("DeepGraft", "AttMIL", "norm_rest", "_features_CrossEntropyLoss")
    r3 = make_run("DeepGraft", "TransMIL", "rej_rest", "_features_CrossEntropyLoss", "fold1")
    make_run("Camelyon", "TransMIL", "tumor", "_features_CrossEntropyLoss")

    allr = scan_log_tree(tmp_path)
    assert {r["dir"] for r in allr} >= {str(r1), str(r2), str(r3)}
    tm = scan_log_tree(tmp_path, project="DeepGraft", model="TransMIL")
    assert {r["dir"] for r in tm} == {str(r1), str(r3)}
    assert all(r["model"] == "TransMIL" for r in tm)
    nr = scan_log_tree(tmp_path, task="norm_rest")
    assert {r["dir"] for r in nr} == {str(r1), str(r2)}

    # CLI --log_root end to end
    from transmil_deepgraft_tpu.cli.export_metrics import main

    out = tmp_path / "combined.csv"
    main(["--log_root", str(tmp_path), "--model", "TransMIL",
          "--task", "norm_rest", "--out_csv", str(out)])
    assert out.exists()
    assert len(pd.read_csv(out)) >= 2  # per-class rows across the 2 runs
